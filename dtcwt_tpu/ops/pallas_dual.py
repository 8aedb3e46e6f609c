"""Dual-stream Pallas kernels for separable filter trees.

The 3-D transform (reference ``/root/reference/dtcwt/numpy/transform3d.py``,
analysis tree :208-289, synthesis :385-526) applies BOTH branch filters of
each tree stage to the same intermediate volume and SUMS branch pairs on the
way back.  As independent :mod:`pallas_fb` primitive calls that costs a
second HBM read of every intermediate on analysis and an extra elementwise
pass per merge on synthesis.  The four kernels here fuse each such stage:

``filter2``      one slab DMA -> both non-decimating branch outputs
``dfilt2``       one slab DMA -> both decimate-by-2 branch outputs
``filter2_sum``  two slab DMAs -> one summed non-decimating output
``ifilt2_sum``   two slab DMAs -> one summed interpolate-by-2 output

Kernel geometry (slab/halo/mirror DMA, sublane-axis filtering, trace-time
unrolled taps, banded-MXU column stages for long filters) is identical to
:mod:`pallas_fb` — see that module's docstring for the Mosaic constraints
that shape it.  Semantics match the :mod:`dtcwt_tpu.ops.fb` dual-stream
closed forms bit-for-bit at f32.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dtcwt_tpu.ops.pallas_fb import (
    _LANE, _SUBLANE, _MXU_MIN_TAPS, _as_taps, _banded, _compiler_params,
    _f32win, _flatten_batch, _from_sublane, _fromext_prep, _ifilt_plan,
    _interleave_rows, _interpret, _load_slab, _load_slab_ext,
    _mxu_precision, _phases, _pick_tiles_2d, _round_up, _shift_corr,
    _supported_array, _to_sublane)

__all__ = ["filter2_axis", "dfilt2_axis", "filter2_sum_axis",
           "ifilt2_sum_axis", "filter2_fromext_axis",
           "dfilt2_fromext_axis", "filter2_sum_fromext_axis",
           "ifilt2_sum_fromext_axis"]


# ---------------------------------------------------------------------------
# filter2: one input -> both non-decimating branch outputs
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _build_filter2(B: int, R: int, C: int, h0bytes: bytes, h1bytes: bytes,
                   dtype_str: str, ext_side: int = 0):
    h0 = np.frombuffer(h0bytes, dtype=np.float64)
    h1 = np.frombuffer(h1bytes, dtype=np.float64)
    m0, m1 = h0.size, h1.size
    if m0 % 2 == 0 or m1 % 2 == 0:
        return None           # even-tap outputs are R+1 rows -> XLA path
    p0, p1 = m0 // 2, m1 // 2
    pad = max(p0, p1)
    if ext_side:
        if ext_side % _SUBLANE or ext_side < pad:
            return None
        pad8 = ext_side
    else:
        pad8 = _round_up(max(pad, 1), _SUBLANE)
    dtype = jnp.dtype(dtype_str)
    # Both branches ride the MXU as ONE stacked banded matmul whenever the
    # TOTAL tap count clears the relayout-vs-matmul threshold: each VPU tap
    # costs a sublane-shift relayout of the whole window, so the dual
    # kernel's effective tap count is m0 + m1 even though each branch alone
    # is short (near_sym_a's 5+7 ran the VPU path before r3 and its depth-
    # axis pass dominated the 3-D 256^3 forward at ~3.9 ms per call).
    use_mxu = (m0 + m1) >= _MXU_MIN_TAPS and not _interpret()
    tr, tc = _pick_tiles_2d(R, 1, C, pad8, dtype.itemsize,
                            temp_rows_per_unit=8 if use_mxu else m0 + m1 + 2,
                            n_slabs=2)
    if tr is None or pad8 > R:
        return None
    n_tiles = R // tr
    n_ctiles = C // tc
    total = B * n_tiles * n_ctiles
    h0r = tuple(float(v) for v in h0[::-1])
    h1r = tuple(float(v) for v in h1[::-1])
    off = pad8 - pad          # static slab offset of the compute window
    if use_mxu:
        # stacked operator: rows [0, tr) = h0 branch, [tr, 2tr) = h1 branch
        A01 = _banded(2 * tr, tr + 2 * pad,
                      [(i, (pad - p0) + i + k, h0r[k]) for i in range(tr)
                       for k in range(m0)]
                      + [(tr + i, (pad - p1) + i + k, h1r[k])
                         for i in range(tr) for k in range(m1)])  # f32

    def kernel(x_hbm, *refs):
        o0, o1, scratch, sem = refs[-4], refs[-3], refs[-2], refs[-1]
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        t_lin = (b * n_tiles + i) * n_ctiles + j

        def sched(t, buf, phase):
            """Issue or wait on linear tile *t*'s slab DMA into buffer
            *buf* (double-buffered prefetch: tile t+1's copy is issued
            while tile t computes)."""
            bb = t // (n_tiles * n_ctiles)
            rem = t % (n_tiles * n_ctiles)
            ii = rem // n_ctiles
            jj = rem % n_ctiles
            if ext_side:
                _load_slab_ext(x_hbm, bb, scratch.at[buf], sem.at[buf],
                               tile_idx=ii, t_src=tr, rows=tr + 2 * pad8,
                               lanes=(jj * tc, tc), phase=phase)
            else:
                _load_slab(x_hbm, bb, scratch.at[buf], sem.at[buf],
                           tile_idx=ii, n_tiles=n_tiles, t_in=tr,
                           pad8=pad8, fill=pad, R=R, lanes=(jj * tc, tc),
                           phase=phase)

        def stage(buf):
            @pl.when(t_lin == 0)
            def _():
                sched(t_lin, buf, "start")
            sched(t_lin, buf, "wait")

            @pl.when(t_lin + 1 < total)
            def _():
                sched(t_lin + 1, 1 - buf, "start")
            win = lax.slice_in_dim(scratch[buf], off, off + tr + 2 * pad,
                                   axis=0)
            if use_mxu:
                a_ref = refs[0]
                hp = _mxu_precision(dtype)
                w32 = _f32win(dtype)(win)
                y = jnp.dot(a_ref[:, :], w32, precision=hp,
                            preferred_element_type=jnp.float32
                            ).astype(dtype)
                o0[0] = lax.slice_in_dim(y, 0, tr, axis=0)
                o1[0] = lax.slice_in_dim(y, tr, 2 * tr, axis=0)
            else:
                o0[0] = _shift_corr(win, h0r, tr, offset=pad - p0)
                o1[0] = _shift_corr(win, h1r, tr, offset=pad - p1)

        @pl.when(t_lin % 2 == 0)
        def _():
            stage(0)

        @pl.when(t_lin % 2 == 1)
        def _():
            stage(1)

    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
    if use_mxu:
        in_specs.append(pl.BlockSpec((2 * tr, tr + 2 * pad),
                                     lambda b, i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1, tr, tc), lambda b, i, j: (b, i, j),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(B, n_tiles, n_ctiles),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((B, R, C), dtype),) * 2,
        scratch_shapes=[pltpu.VMEM((2, tr + 2 * pad8, tc), dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=_compiler_params(3),
        interpret=_interpret(),
    )
    if use_mxu:
        return lambda x: call(x, A01)
    return call


def filter2_axis(x, h0, h1, axis: int):
    """Both non-decimating branch filters in one pass; None -> XLA fallback."""
    h0, h1 = _as_taps(h0), _as_taps(h1)
    if not _supported_array(x, axis):
        return None
    x3, lead = _flatten_batch(_to_sublane(x, axis))
    if not _interpret() and x3.shape[-1] % _LANE:
        return None
    call = _build_filter2(x3.shape[0], x3.shape[1], x3.shape[2],
                          h0.tobytes(), h1.tobytes(), str(x3.dtype))
    if call is None:
        return None
    y0, y1 = call(x3)
    unsl = lambda y: _from_sublane(y.reshape(lead + y.shape[-2:]), x.ndim,
                                   axis, trail=x.shape[-2:])
    return unsl(y0), unsl(y1)


# ---------------------------------------------------------------------------
# dfilt2: one input -> both decimate-by-2 branch outputs
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _build_dfilt2(B: int, R: int, C: int, tapbytes, dtype_str: str,
                  ext_side: int = 0):
    ha0, hb0, ha1, hb1 = (np.frombuffer(b, dtype=np.float64)
                          for b in tapbytes)
    m = ha0.size
    if m % 2 or R % 4:
        return None
    if ext_side:
        if ext_side % _SUBLANE or ext_side < m:
            return None
        pad8 = ext_side
    else:
        pad8 = _round_up(m, _SUBLANE)
    dtype = jnp.dtype(dtype_str)
    use_mxu = m >= _MXU_MIN_TAPS and not _interpret()
    n_quads = R // 4
    tq, tc = _pick_tiles_2d(n_quads, 4, C, pad8, dtype.itemsize,
                            temp_rows_per_unit=8 if use_mxu else 4 * m + 8)
    if tq is None or pad8 > R:
        return None
    n_tiles = n_quads // tq
    n_ctiles = C // tc
    off = pad8 - m            # window start: extended index 4*q0 (phase 0)

    pairs = []
    for ha, hb in ((ha0, hb0), (ha1, hb1)):
        har, hbr = ha[::-1], hb[::-1]
        pairs.append(dict(
            ha_e=tuple(float(v) for v in har[0::2]),
            ha_o=tuple(float(v) for v in har[1::2]),
            hb_e=tuple(float(v) for v in hbr[0::2]),
            hb_o=tuple(float(v) for v in hbr[1::2]),
            har=har, hbr=hbr,
            pos=bool(np.sum(ha * hb) > 0)))
    if use_mxu:
        As = []
        for p in pairs:
            ra, rb = (0, 1) if p["pos"] else (1, 0)
            As.append(_banded(
                2 * tq, 4 * tq + 2 * m,
                [(2 * i + ra, 4 * i + 2 + 2 * k, float(p["har"][k]))
                 for i in range(tq) for k in range(m)]
                + [(2 * i + rb, 4 * i + 3 + 2 * k, float(p["hbr"][k]))
                   for i in range(tq) for k in range(m)]))  # f32 operator

    def kernel(x_hbm, *refs):
        o0, o1, scratch, sem = refs[-4], refs[-3], refs[-2], refs[-1]
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        if ext_side:
            _load_slab_ext(x_hbm, b, scratch, sem, tile_idx=i, t_src=4 * tq,
                           rows=4 * tq + 2 * pad8, lanes=(j * tc, tc))
        else:
            _load_slab(x_hbm, b, scratch, sem, tile_idx=i, n_tiles=n_tiles,
                       t_in=4 * tq, pad8=pad8, fill=m, R=R,
                       lanes=(j * tc, tc))
        win = lax.slice_in_dim(scratch[:, :], off, off + 4 * tq + 2 * m,
                               axis=0)
        if use_mxu:
            hp = _mxu_precision(dtype)
            w32 = _f32win(dtype)(win)
            for o_ref, a_ref in ((o0, refs[0]), (o1, refs[1])):
                o_ref[0] = jnp.dot(a_ref[:, :], w32, precision=hp,
                                   preferred_element_type=jnp.float32
                                   ).astype(dtype)
            return
        q = _phases(win, 4)
        for o_ref, p in ((o0, pairs[0]), (o1, pairs[1])):
            ya = (_shift_corr(q[2], p["ha_e"], tq, offset=0)
                  + _shift_corr(q[0], p["ha_o"], tq, offset=1))
            yb = (_shift_corr(q[3], p["hb_e"], tq, offset=0)
                  + _shift_corr(q[1], p["hb_o"], tq, offset=1))
            o_ref[0] = _interleave_rows((ya, yb) if p["pos"] else (yb, ya))

    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
    if use_mxu:
        in_specs += [pl.BlockSpec((2 * tq, 4 * tq + 2 * m),
                                  lambda b, i, j: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2
    out_spec = pl.BlockSpec((1, 2 * tq, tc), lambda b, i, j: (b, i, j),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(B, n_tiles, n_ctiles),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((B, R // 2, C), dtype),) * 2,
        scratch_shapes=[pltpu.VMEM((4 * tq + 2 * pad8, tc), dtype),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=_compiler_params(3),
        interpret=_interpret(),
    )
    if use_mxu:
        return lambda x: call(x, As[0], As[1])
    return call


def dfilt2_axis(x, ha0, hb0, ha1, hb1, axis: int):
    """Both decimate-by-2 branch filters in one pass; None -> XLA fallback."""
    taps = tuple(_as_taps(h) for h in (ha0, hb0, ha1, hb1))
    if not _supported_array(x, axis):
        return None
    x3, lead = _flatten_batch(_to_sublane(x, axis))
    if not _interpret() and x3.shape[-1] % _LANE:
        return None
    call = _build_dfilt2(x3.shape[0], x3.shape[1], x3.shape[2],
                         tuple(h.tobytes() for h in taps), str(x3.dtype))
    if call is None:
        return None
    y0, y1 = call(x3)
    # trail is only consumed by the axis==-3 lane-merge un-reshape, where
    # the trailing two dims are untouched by the (depth-axis) decimation.
    unsl = lambda y: _from_sublane(y.reshape(lead + y.shape[-2:]), x.ndim,
                                  axis, trail=x.shape[-2:])
    return unsl(y0), unsl(y1)


# ---------------------------------------------------------------------------
# filter2_sum: two inputs -> one summed non-decimating output
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _build_filter2_sum(B: int, R: int, C: int, h0bytes: bytes,
                       h1bytes: bytes, dtype_str: str, ext_side: int = 0):
    h0 = np.frombuffer(h0bytes, dtype=np.float64)
    h1 = np.frombuffer(h1bytes, dtype=np.float64)
    m0, m1 = h0.size, h1.size
    if m0 % 2 == 0 or m1 % 2 == 0:
        return None
    p0, p1 = m0 // 2, m1 // 2
    pad = max(p0, p1)
    if ext_side:
        if ext_side % _SUBLANE or ext_side < pad:
            return None
        pad8 = ext_side
    else:
        pad8 = _round_up(max(pad, 1), _SUBLANE)
    dtype = jnp.dtype(dtype_str)
    # MXU gate on the TOTAL tap count, as in _build_filter2: the VPU path
    # pays a sublane-shift relayout per tap across BOTH branch merges.
    use_mxu = (m0 + m1) >= _MXU_MIN_TAPS and not _interpret()
    tr, tc = _pick_tiles_2d(R, 1, C, pad8, dtype.itemsize,
                            temp_rows_per_unit=8 if use_mxu else m0 + m1 + 2,
                            n_slabs=2)
    if tr is None or pad8 > R:
        return None
    n_tiles = R // tr
    n_ctiles = C // tc
    h0r = tuple(float(v) for v in h0[::-1])
    h1r = tuple(float(v) for v in h1[::-1])
    off = pad8 - pad
    if use_mxu:
        A0 = _banded(tr, tr + 2 * pad,
                     ((i, (pad - p0) + i + k, h0r[k]) for i in range(tr)
                      for k in range(m0)))  # stays f32: see _mxu_precision
        A1 = _banded(tr, tr + 2 * pad,
                     ((i, (pad - p1) + i + k, h1r[k]) for i in range(tr)
                      for k in range(m1)))  # stays f32: see _mxu_precision

    def kernel(a_hbm, b_hbm, *refs):
        o_ref, sa, sb, sem = refs[-4], refs[-3], refs[-2], refs[-1]
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        if ext_side:
            _load_slab_ext(a_hbm, b, sa, sem, tile_idx=i, t_src=tr,
                           rows=tr + 2 * pad8, lanes=(j * tc, tc))
            _load_slab_ext(b_hbm, b, sb, sem, tile_idx=i, t_src=tr,
                           rows=tr + 2 * pad8, lanes=(j * tc, tc))
        else:
            _load_slab(a_hbm, b, sa, sem, tile_idx=i, n_tiles=n_tiles,
                       t_in=tr, pad8=pad8, fill=pad, R=R,
                       lanes=(j * tc, tc))
            _load_slab(b_hbm, b, sb, sem, tile_idx=i, n_tiles=n_tiles,
                       t_in=tr, pad8=pad8, fill=pad, R=R,
                       lanes=(j * tc, tc))
        win_a = lax.slice_in_dim(sa[:, :], off, off + tr + 2 * pad, axis=0)
        win_b = lax.slice_in_dim(sb[:, :], off, off + tr + 2 * pad, axis=0)
        if use_mxu:
            a0_ref, a1_ref = refs[0], refs[1]
            hp = _mxu_precision(dtype)
            y = (jnp.dot(a0_ref[:, :], _f32win(dtype)(win_a), precision=hp,
                         preferred_element_type=jnp.float32)
                 + jnp.dot(a1_ref[:, :], _f32win(dtype)(win_b), precision=hp,
                           preferred_element_type=jnp.float32))
            o_ref[0] = y.astype(dtype)
        else:
            o_ref[0] = (_shift_corr(win_a, h0r, tr, offset=pad - p0)
                        + _shift_corr(win_b, h1r, tr, offset=pad - p1))

    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)] * 2
    if use_mxu:
        in_specs += [pl.BlockSpec((tr, tr + 2 * pad), lambda b, i, j: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2
    call = pl.pallas_call(
        kernel,
        grid=(B, n_tiles, n_ctiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tr, tc), lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, C), dtype),
        scratch_shapes=[pltpu.VMEM((tr + 2 * pad8, tc), dtype),
                        pltpu.VMEM((tr + 2 * pad8, tc), dtype),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=_compiler_params(3),
        interpret=_interpret(),
    )
    if use_mxu:
        return lambda a, b: call(a, b, A0, A1)
    return call


def filter2_sum_axis(a, b, h0, h1, axis: int):
    """``filter(a, h0) + filter(b, h1)`` in one pass; None -> XLA fallback."""
    h0, h1 = _as_taps(h0), _as_taps(h1)
    if a.shape != b.shape or a.dtype != b.dtype:
        return None
    if not _supported_array(a, axis):
        return None
    a3, lead = _flatten_batch(_to_sublane(a, axis))
    b3, _ = _flatten_batch(_to_sublane(b, axis))
    if not _interpret() and a3.shape[-1] % _LANE:
        return None
    call = _build_filter2_sum(a3.shape[0], a3.shape[1], a3.shape[2],
                              h0.tobytes(), h1.tobytes(), str(a3.dtype))
    if call is None:
        return None
    y = call(a3, b3)
    return _from_sublane(y.reshape(lead + y.shape[-2:]), a.ndim, axis,
                         trail=a.shape[-2:])


# ---------------------------------------------------------------------------
# ifilt2_sum: two inputs -> one summed interpolate-by-2 output
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _build_ifilt2_sum(B: int, R: int, C: int, tapbytes, dtype_str: str,
                      ext_side: int = 0):
    ha0, hb0, ha1, hb1 = (np.frombuffer(b, dtype=np.float64)
                          for b in tapbytes)
    m = ha0.size
    if m % 2 or R % 2:
        return None
    m2 = m // 2
    if ext_side:
        if ext_side % _SUBLANE or ext_side < m2:
            return None
        pad8 = ext_side
    else:
        pad8 = _round_up(max(m2, 1), _SUBLANE)
    dtype = jnp.dtype(dtype_str)
    use_mxu = m >= _MXU_MIN_TAPS and not _interpret()
    n_quads = R // 2
    tq, tc = _pick_tiles_2d(n_quads, 2, C, pad8, dtype.itemsize,
                            temp_rows_per_unit=8 if use_mxu else 4 * m + 16,
                            n_slabs=2)
    if tq is None or pad8 > R:
        return None
    n_tiles = n_quads // tq
    n_ctiles = C // tc
    off = pad8 - m2
    par_ev, par_od = m2 % 2, (m2 + 1) % 2
    plans = (_ifilt_plan(ha0, hb0), _ifilt_plan(ha1, hb1))
    if use_mxu:
        As = []
        for plan in plans:
            entries = []
            for t, (phase, taps, o) in enumerate(plan):
                par = par_ev if phase == "ev" else par_od
                for i in range(tq):
                    for k, v in enumerate(taps):
                        entries.append((4 * i + t, 2 * (i + o + k) + par,
                                        float(v)))
            As.append(_banded(4 * tq, 2 * tq + 2 * m2, entries))  # f32

    def kernel(a_hbm, b_hbm, *refs):
        o_ref, sa, sb, sem = refs[-4], refs[-3], refs[-2], refs[-1]
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        if ext_side:
            _load_slab_ext(a_hbm, b, sa, sem, tile_idx=i, t_src=2 * tq,
                           rows=2 * tq + 2 * pad8, lanes=(j * tc, tc))
            _load_slab_ext(b_hbm, b, sb, sem, tile_idx=i, t_src=2 * tq,
                           rows=2 * tq + 2 * pad8, lanes=(j * tc, tc))
        else:
            _load_slab(a_hbm, b, sa, sem, tile_idx=i, n_tiles=n_tiles,
                       t_in=2 * tq, pad8=pad8, fill=m2, R=R,
                       lanes=(j * tc, tc))
            _load_slab(b_hbm, b, sb, sem, tile_idx=i, n_tiles=n_tiles,
                       t_in=2 * tq, pad8=pad8, fill=m2, R=R,
                       lanes=(j * tc, tc))
        win_a = lax.slice_in_dim(sa[:, :], off, off + 2 * tq + 2 * m2, axis=0)
        win_b = lax.slice_in_dim(sb[:, :], off, off + 2 * tq + 2 * m2, axis=0)
        if use_mxu:
            aa_ref, ab_ref = refs[0], refs[1]
            hp = _mxu_precision(dtype)
            y = (jnp.dot(aa_ref[:, :], _f32win(dtype)(win_a), precision=hp,
                         preferred_element_type=jnp.float32)
                 + jnp.dot(ab_ref[:, :], _f32win(dtype)(win_b), precision=hp,
                           preferred_element_type=jnp.float32))
            o_ref[0] = y.astype(dtype)
            return
        rows = []
        for win, plan in ((win_a, plans[0]), (win_b, plans[1])):
            ph = _phases(win, 2)
            phases = {"ev": ph[par_ev], "od": ph[par_od]}
            rows.append(tuple(_shift_corr(phases[phase], taps, tq, o)
                              for (phase, taps, o) in plan))
        o_ref[0] = _interleave_rows(tuple(ra + rb
                                          for ra, rb in zip(*rows)))

    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)] * 2
    if use_mxu:
        in_specs += [pl.BlockSpec((4 * tq, 2 * tq + 2 * m2),
                                  lambda b, i, j: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2
    call = pl.pallas_call(
        kernel,
        grid=(B, n_tiles, n_ctiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 4 * tq, tc), lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2 * R, C), dtype),
        scratch_shapes=[pltpu.VMEM((2 * tq + 2 * pad8, tc), dtype),
                        pltpu.VMEM((2 * tq + 2 * pad8, tc), dtype),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=_compiler_params(3),
        interpret=_interpret(),
    )
    if use_mxu:
        return lambda a, b: call(a, b, As[0], As[1])
    return call


def ifilt2_sum_axis(a, b, ha0, hb0, ha1, hb1, axis: int):
    """``ifilt(a, ha0, hb0) + ifilt(b, ha1, hb1)`` in one pass; None ->
    XLA fallback."""
    taps = tuple(_as_taps(h) for h in (ha0, hb0, ha1, hb1))
    if a.shape != b.shape or a.dtype != b.dtype:
        return None
    if not _supported_array(a, axis):
        return None
    a3, lead = _flatten_batch(_to_sublane(a, axis))
    b3, _ = _flatten_batch(_to_sublane(b, axis))
    if not _interpret() and a3.shape[-1] % _LANE:
        return None
    call = _build_ifilt2_sum(a3.shape[0], a3.shape[1], a3.shape[2],
                             tuple(h.tobytes() for h in taps),
                             str(a3.dtype))
    if call is None:
        return None
    y = call(a3, b3)
    return _from_sublane(y.reshape(lead + y.shape[-2:]), a.ndim, axis,
                         trail=a.shape[-2:])


# ---------------------------------------------------------------------------
# from-extension wrappers: the sharded transforms' halo exchange already
# produced the boundary samples (wide, sublane-multiple extension per side),
# so these run the same kernels with plain aligned DMAs and no mirror fills.
# ---------------------------------------------------------------------------

def filter2_fromext_axis(ext, h0, h1, axis: int, side: int):
    """Both non-decimating branch filters on a pre-extended buffer."""
    h0, h1 = _as_taps(h0), _as_taps(h1)
    prep = _fromext_prep(ext, axis, side)
    if prep is None:
        return None
    x3, lead, R = prep
    call = _build_filter2(x3.shape[0], R, x3.shape[2], h0.tobytes(),
                          h1.tobytes(), str(x3.dtype), ext_side=side)
    if call is None:
        return None
    y0, y1 = call(x3)
    unsl = lambda y: _from_sublane(y.reshape(lead + y.shape[-2:]), ext.ndim,
                                   axis, trail=ext.shape[-2:])
    return unsl(y0), unsl(y1)


def dfilt2_fromext_axis(ext, ha0, hb0, ha1, hb1, axis: int, side: int):
    """Both decimate-by-2 branch filters on a pre-extended buffer."""
    taps = tuple(_as_taps(h) for h in (ha0, hb0, ha1, hb1))
    prep = _fromext_prep(ext, axis, side)
    if prep is None:
        return None
    x3, lead, R = prep
    call = _build_dfilt2(x3.shape[0], R, x3.shape[2],
                         tuple(h.tobytes() for h in taps), str(x3.dtype),
                         ext_side=side)
    if call is None:
        return None
    y0, y1 = call(x3)
    unsl = lambda y: _from_sublane(y.reshape(lead + y.shape[-2:]), ext.ndim,
                                   axis, trail=ext.shape[-2:])
    return unsl(y0), unsl(y1)


def filter2_sum_fromext_axis(a, b, h0, h1, axis: int, side: int):
    """``filter(a, h0) + filter(b, h1)`` on pre-extended buffers."""
    h0, h1 = _as_taps(h0), _as_taps(h1)
    if a.shape != b.shape or a.dtype != b.dtype:
        return None
    prep = _fromext_prep(a, axis, side)
    if prep is None:
        return None
    a3, lead, R = prep
    b3, _ = _flatten_batch(_to_sublane(b, axis))
    call = _build_filter2_sum(a3.shape[0], R, a3.shape[2], h0.tobytes(),
                              h1.tobytes(), str(a3.dtype), ext_side=side)
    if call is None:
        return None
    y = call(a3, b3)
    return _from_sublane(y.reshape(lead + y.shape[-2:]), a.ndim, axis,
                         trail=a.shape[-2:])


def ifilt2_sum_fromext_axis(a, b, ha0, hb0, ha1, hb1, axis: int, side: int):
    """``ifilt(a, ha0, hb0) + ifilt(b, ha1, hb1)`` on pre-extended
    buffers."""
    taps = tuple(_as_taps(h) for h in (ha0, hb0, ha1, hb1))
    if a.shape != b.shape or a.dtype != b.dtype:
        return None
    prep = _fromext_prep(a, axis, side)
    if prep is None:
        return None
    a3, lead, R = prep
    b3, _ = _flatten_batch(_to_sublane(b, axis))
    call = _build_ifilt2_sum(a3.shape[0], R, a3.shape[2],
                             tuple(h.tobytes() for h in taps),
                             str(a3.dtype), ext_side=side)
    if call is None:
        return None
    y = call(a3, b3)
    return _from_sublane(y.reshape(lead + y.shape[-2:]), a.ndim, axis,
                         trail=a.shape[-2:])
