"""Fused Pallas kernel for a complete level->=2 2-D DTCWT inverse stage.

One kernel evaluates the whole interpolating level (reference semantics
``/root/reference/dtcwt/numpy/transform2d.py:242-260`` with ``c2q``
:324-350):

    lh,hl,hh = c2q(band pairs)
    y1 = colifilt(Z, g0) + colifilt(lh, g1)
    y2 = colifilt(hl, g0) + colifilt(hh, g1)
    Z' = rowifilt(y1, g0) + rowifilt(y2, g1)

instead of six interpolating passes (each with transposes) plus three c2q
interleaves.  Structural tricks (duals of the forward kernels):

* **c2q never materialises.**  The quad image's four (row-parity x
  col-parity) planes are elementwise combinations of the band pair
  (``lh[2i,2j]=Re p``, ``lh[2i,2j+1]=Im p``, ``lh[2i+1,2j]=Im q``,
  ``lh[2i+1,2j+1]=-Re q``), computed by the wrapper in XLA where they fuse
  with the complex-plane extraction.
* **The interpolator's phase streams are plane selections.**  ``colifilt``
  reads the even/odd phases of the *extended* signal; in (rp, cp) plane
  space those are the parity planes with a static ``m2//2`` shift (and a
  plane swap in the reflected halo).  Its four output streams stay separate
  through the lane stage, so no strided access exists anywhere; the wrapper
  interleaves the final 4x4 (row-stream x lane-stream) planes with two
  reshape passes.
* Rows use the halo-slab DMA + mirror fill pattern; the mirror fill *swaps
  parity planes* (``P0[-u] = P1[u-1]``), so halos copy between slabs.
* A sequential third grid dimension stages the work: step 0 DMAs the 16
  input planes and runs the column (row-direction) stage into scratch;
  steps 1-4 run the lane stage for one output row-stream each.

f32/bf16; identity gain only (a ``gain_mask`` falls back to the unfused
path).  Boundary crop (reference :262-268) stays in the transform.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dtcwt_tpu.ops.pallas_fb import (
    _SUBLANE, _LANE, _flatten_batch, _interpret)

__all__ = ["inv_level2"]

_MARGIN = 64             # boundary columns per side (col-parity plane units)
_PAD = 8                 # row halo per plane (covers m2//2 + 2 for m <= 18)
_TILE_BYTES = 14 * 1024 * 1024


def _sub_taps(h: np.ndarray):
    """(ha_e, ha_o): reversed even/odd-index taps (fb.ifilt_from_ext)."""
    return (tuple(float(v) for v in h[0::2][::-1]),
            tuple(float(v) for v in h[1::2][::-1]))


def _stream_plan(m2: int, pos: bool):
    """The interpolator's four output streams as (phase, tapset, offset)
    triples; phase 0 = the ``ev`` stream (parity-0 plane, shift m2//2),
    phase 1 = ``od`` (parity-1 plane, shift m2//2 + m2%2); tapset 0 = the
    a-filter, 1 = the b-filter; 'e'/'o' pick its even/odd-index taps.
    Mirrors fb.ifilt_from_ext's four parity cases exactly."""
    if m2 % 2 == 0:
        if pos:
            return ((0, 0, "o", 0), (1, 1, "o", 0), (0, 0, "e", 1),
                    (1, 1, "e", 1))
        return ((1, 0, "o", 0), (0, 1, "o", 0), (1, 0, "e", 1),
                (0, 1, "e", 1))
    if pos:
        return ((0, 0, "e", 0), (1, 1, "e", 1), (0, 0, "o", 0),
                (1, 1, "o", 1))
    return ((1, 0, "e", 1), (0, 1, "e", 0), (1, 0, "o", 1), (0, 1, "o", 0))


@functools.lru_cache(maxsize=None)
def _build_ilevel2(B: int, L: int, C2: int, g0abytes: bytes, g0bbytes: bytes,
                   g1abytes: bytes, g1bbytes: bytes, dtype_str: str):
    """L = H/2 plane rows, C2 = W/2 plane cols (multiple of 128 on TPU)."""
    g0a = np.frombuffer(g0abytes, dtype=np.float64)
    g0b = np.frombuffer(g0bbytes, dtype=np.float64)
    g1a = np.frombuffer(g1abytes, dtype=np.float64)
    g1b = np.frombuffer(g1bbytes, dtype=np.float64)
    m = g0a.size
    if m % 2 or g1a.size != m:
        return None
    m2 = m // 2
    if m2 // 2 + 2 > _PAD or _PAD > L:
        return None
    W = C2 + 2 * _MARGIN
    dtype = jnp.dtype(dtype_str)

    # filter parameter bundles: (a_subtaps, b_subtaps, stream plan)
    def bundle(ga, gb):
        # transform calls ifilt(x, ha=g_b, hb=g_a)
        ha, hb = gb, ga
        pos = bool(np.sum(ha * hb) > 0)
        return (_sub_taps(ha), _sub_taps(hb), _stream_plan(m2, pos))

    f0 = bundle(g0a, g0b)      # Z and hl
    f1 = bundle(g1a, g1b)      # lh and hh

    temp_rows = 16 * m + 24
    budget_rows = max(_TILE_BYTES // (W * max(dtype.itemsize, 4)), 1)
    tq = None
    for t in (L, 256, 128, 96, 64, 48, 32, 16, 8):
        if t > L or L % t:
            continue
        if t % _SUBLANE:
            continue
        # 16 slabs + 16 persisted streams + live temporaries
        if 16 * (t + 2 * _PAD) + 16 * t + t * temp_rows <= budget_rows:
            tq = t
            break
    if tq is None:
        return None
    n_tiles = L // tq

    sh_ev = m2 // 2                 # plane shift of the ev phase
    sh_od = m2 // 2 + (m2 % 2)      # plane shift of the od phase

    # Banded row-stage operators (one matmul per (source, cp) replaces the
    # per-tap sublane shifts, which each cost a VMEM relayout): the operand
    # is [P0 slab rows ; P1 slab rows] concatenated, so phase-0 taps index
    # the first block and phase-1 taps the second.
    use_mxu = m >= 9 and not _interpret()
    Lslab = tq + 2 * _PAD

    def _row_matrix(bun):
        (ae, ao), (be, bo), plan = bun
        tapsets = {("a", "e"): ae, ("a", "o"): ao,
                   ("b", "e"): be, ("b", "o"): bo}
        A = np.zeros((4 * tq, 2 * Lslab), np.float32)
        for t, (phase, fil, eo, off) in enumerate(plan):
            shift = sh_ev if phase == 0 else sh_od
            base = phase * Lslab
            taps = tapsets[("a" if fil == 0 else "b", eo)]
            for i in range(tq):
                for kk, tv in enumerate(taps):
                    A[4 * i + t, base + _PAD + off - shift + i + kk] += tv
        return A

    if use_mxu:
        A0 = _row_matrix(f0).astype(dtype)   # Z and hl
        A1 = _row_matrix(f1).astype(dtype)   # lh and hh

    def kernel(x_hbm, *refs):
        if use_mxu:
            a0_ref, a1_ref = refs[0], refs[1]
        out_ref, slabs, streams, sems = refs[-4], refs[-3], refs[-2], refs[-1]
        b = pl.program_id(0)
        i = pl.program_id(1)
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            g0 = i * tq
            # One strided rectangular DMA covers all 16 planes at once —
            # per-plane copies serialize on DMA latency and dominate the
            # kernel at small tiles.
            if n_tiles == 1:
                cp = pltpu.make_async_copy(
                    x_hbm.at[b], slabs.at[:, pl.ds(_PAD, tq), :],
                    sems.at[0])
                cp.start()
                cp.wait()
            else:
                @pl.when(i == 0)
                def _():
                    cp = pltpu.make_async_copy(
                        x_hbm.at[b, :, pl.ds(0, tq + _PAD), :],
                        slabs.at[:, pl.ds(_PAD, tq + _PAD), :],
                        sems.at[0])
                    cp.start()
                    cp.wait()

                src0 = pl.multiple_of(g0 - _PAD, _SUBLANE)

                @pl.when(jnp.logical_and(i > 0, i < n_tiles - 1))
                def _():
                    cp = pltpu.make_async_copy(
                        x_hbm.at[b, :, pl.ds(src0, tq + 2 * _PAD), :],
                        slabs.at[:], sems.at[0])
                    cp.start()
                    cp.wait()

                @pl.when(i == n_tiles - 1)
                def _():
                    cp = pltpu.make_async_copy(
                        x_hbm.at[b, :, pl.ds(src0, tq + _PAD), :],
                        slabs.at[:, pl.ds(0, tq + _PAD), :], sems.at[0])
                    cp.start()
                    cp.wait()

            # Mirror fills: slab[s] holds plane[g0 + s - _PAD]; on the
            # first/last tile the halo rows are the parity-swapped
            # reflection (P0[-u] = P1[u-1], P0[L+u] = P1[L-1-u]).
            @pl.when(i == 0)
            def _():
                for p in range(16):
                    partner = p ^ 2      # flip the rp bit (src*4+rp*2+cp)
                    for s in range(_PAD):
                        # plane[s-_PAD] = partner[_PAD-1-s] at slab pos
                        # (_PAD-1-s)+_PAD  (tile 0: slab[s]=plane[s-_PAD])
                        slabs[p, s, :] = slabs[partner, 2 * _PAD - 1 - s, :]

            @pl.when(i == n_tiles - 1)
            def _():
                for p in range(16):
                    partner = p ^ 2
                    for s in range(tq + _PAD, tq + 2 * _PAD):
                        slabs[p, s, :] = slabs[partner,
                                               2 * (tq + _PAD) - 1 - s, :]

            # Row-direction (column) interpolation stage: for each column
            # parity and each source pair, the four output streams.
            def row_streams(src_idx, bun, cp):
                (ae, ao), (be, bo), plan = bun
                tapsets = {("a", "e"): ae, ("a", "o"): ao,
                           ("b", "e"): be, ("b", "o"): bo}
                outs = []
                for (phase, fil, eo, off) in plan:
                    shift = sh_ev if phase == 0 else sh_od
                    plane = slabs[4 * src_idx + 2 * phase + cp]
                    taps = tapsets[("a" if fil == 0 else "b", eo)]
                    acc = None
                    for kk, tv in enumerate(taps):
                        lo = _PAD + off - shift + kk
                        sl = lax.slice_in_dim(plane, lo, lo + tq, axis=0)
                        term = sl * jnp.asarray(tv, dtype)
                        acc = term if acc is None else acc + term
                    outs.append(acc)
                return outs

            def row_streams_mxu(src_idx, a_ref, cp):
                win = jnp.concatenate(
                    [slabs[4 * src_idx + cp],          # phase-0 (rp 0)
                     slabs[4 * src_idx + 2 + cp]],     # phase-1 (rp 1)
                    axis=0)
                y = jnp.dot(a_ref[:, :], win,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32).astype(dtype)
                y4 = y.reshape(tq, 4, W)
                return [y4[:, t, :] for t in range(4)]

            for cp in range(2):
                if use_mxu:
                    z_s = row_streams_mxu(0, a0_ref, cp)
                    lh_s = row_streams_mxu(1, a1_ref, cp)
                    hl_s = row_streams_mxu(2, a0_ref, cp)
                    hh_s = row_streams_mxu(3, a1_ref, cp)
                else:
                    z_s = row_streams(0, f0, cp)
                    lh_s = row_streams(1, f1, cp)
                    hl_s = row_streams(2, f0, cp)
                    hh_s = row_streams(3, f1, cp)
                for t in range(4):
                    streams[0, 2 * t + cp] = z_s[t] + lh_s[t]     # y1
                    streams[1, 2 * t + cp] = hl_s[t] + hh_s[t]    # y2

        # Lane stage: one output row-stream per grid step.
        for t in range(4):
            @pl.when(k == t + 1)
            def _(t=t):
                def lane_streams(y_idx, bun):
                    (ae, ao), (be, bo), plan = bun
                    tapsets = {("a", "e"): ae, ("a", "o"): ao,
                               ("b", "e"): be, ("b", "o"): bo}
                    outs = []
                    for (phase, fil, eo, off) in plan:
                        shift = sh_ev if phase == 0 else sh_od
                        plane = streams[y_idx, 2 * t + phase]
                        taps = tapsets[("a" if fil == 0 else "b", eo)]
                        acc = None
                        for kk, tv in enumerate(taps):
                            lo = _MARGIN + off - shift + kk
                            sl = lax.slice_in_dim(plane, lo, lo + C2,
                                                  axis=1)
                            term = sl * jnp.asarray(tv, dtype)
                            acc = term if acc is None else acc + term
                        outs.append(acc)
                    return outs

                y1_l = lane_streams(0, f0)
                y2_l = lane_streams(1, f1)
                for s in range(4):
                    out_ref[0, 0, s] = y1_l[s] + y2_l[s]

    in_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    in_specs = [in_spec]
    if use_mxu:
        a_spec = pl.BlockSpec((4 * tq, 2 * Lslab), lambda b, i, k: (0, 0),
                              memory_space=pltpu.VMEM)
        in_specs = [in_spec, a_spec, a_spec]
    out_spec = pl.BlockSpec(
        (1, 1, 4, tq, C2),
        lambda b, i, k: (b, jnp.maximum(k - 1, 0), 0, i, 0),
        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(B, n_tiles, 5),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, 4, 4, L, C2), dtype),
        scratch_shapes=[pltpu.VMEM((16, tq + 2 * _PAD, W), dtype),
                        pltpu.VMEM((2, 8, tq, W), dtype),
                        pltpu.SemaphoreType.DMA((1,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=_interpret(),
    )
    if use_mxu:
        return lambda x: call(x, A0, A1)
    return call


def inv_level2(Z, yh, g0a, g0b, g1a, g1b, planes=None, as_planes=False):
    """Fused level->=2 inverse stage.  *Z* is the ``[..., H, W]`` real
    lowpass, *yh* the ``[..., H/2, W/2, 6]`` complex highpasses of the same
    level; filters follow the transform's call order ``ifilt(x, g0b, g0a)``
    / ``ifilt(x, g1b, g1a)``.  Returns ``Z' [..., 2H, 2W]`` (uncropped) or
    None outside the envelope.

    Consecutive fused inverse levels chain without materialising the
    interleaved image (the 4x4 output-stream -> image transpose plus the
    next level's parity re-split costs more than the kernels themselves):
    *planes* accepts the previous call's ``as_planes=True`` output — the
    ``(p00, p01, p10, p11)`` (row-parity, col-parity) quarter planes of the
    lowpass, each ``[..., H/2, W/2]`` — in place of *Z*.
    """
    g0a = np.asarray(g0a, np.float64).reshape(-1)
    g0b = np.asarray(g0b, np.float64).reshape(-1)
    g1a = np.asarray(g1a, np.float64).reshape(-1)
    g1b = np.asarray(g1b, np.float64).reshape(-1)
    if planes is not None:
        Zp = planes[0]
        H, Wd = 2 * Zp.shape[-2], 2 * Zp.shape[-1]
        zdim, zdtype = Zp.ndim + 1, Zp.dtype
    else:
        Zp = Z
        H, Wd = Z.shape[-2], Z.shape[-1]
        zdim, zdtype = Z.ndim, Z.dtype
    if zdim < 2 or zdtype not in (jnp.float32, jnp.bfloat16):
        return None
    if not jnp.issubdtype(yh.dtype, jnp.complexfloating):
        return None
    if H % 2 or Wd % 2:
        return None
    if yh.shape[-3:] != (H // 2, Wd // 2, 6):
        return None
    L, C2 = H // 2, Wd // 2
    if not _interpret() and C2 % _LANE:
        return None
    if C2 < _MARGIN:
        return None
    if planes is not None:
        p4, lead = zip(*[_flatten_batch(p) for p in planes])
        lead = lead[0]
        B = p4[0].shape[0]
        zdtype = p4[0].dtype
    else:
        z3, lead = _flatten_batch(Z)
        B = z3.shape[0]
        zdtype = z3.dtype
    yh3 = yh.reshape((B,) + yh.shape[-3:])

    call = _build_ilevel2(B, L, C2, g0a.tobytes(), g0b.tobytes(),
                          g1a.tobytes(), g1b.tobytes(), str(zdtype))
    if call is None:
        return None

    s = float(np.sqrt(0.5))   # python float: no dtype promotion

    # One band transpose, then plane arithmetic on contiguous slices
    # (compound two-axis strided slices and minor-axis band indexing lower
    # to gathers ~10x slower than single-axis slices on TPU).
    yhp = jnp.moveaxis(yh3, -1, 1)                 # (B, 6, h, w)
    rep = jnp.real(yhp).astype(zdtype)
    imp = jnp.imag(yhp).astype(zdtype)

    def quad_planes(i0, i1):
        """(rp, cp) planes of c2q(band i0, band i1): Re p, Im p, Im q, -Re q."""
        return ((rep[:, i0] + rep[:, i1]) * s,
                (imp[:, i0] + imp[:, i1]) * s,
                (imp[:, i0] - imp[:, i1]) * s,
                (rep[:, i1] - rep[:, i0]) * s)

    if planes is not None:
        planes = list(p4)
    else:
        ze, zo = z3[:, 0::2], z3[:, 1::2]          # single-axis splits
        planes = [ze[:, :, 0::2], ze[:, :, 1::2],
                  zo[:, :, 0::2], zo[:, :, 1::2]]
    planes += list(quad_planes(0, 5))   # lh
    planes += list(quad_planes(2, 3))   # hl
    planes += list(quad_planes(1, 4))   # hh

    # Column-parity margins: reflection swaps cp within each (src, rp) pair.
    g = _MARGIN
    ext = []
    for idx, p in enumerate(planes):
        q = planes[idx ^ 1]        # cp partner
        ext.append(jnp.concatenate(
            [jnp.flip(q[:, :, :g], axis=2), p, jnp.flip(q[:, :, -g:], axis=2)], axis=2))
    x = jnp.stack(ext, axis=1)     # (B, 16, L, C2 + 2*MARGIN)

    out = call(x)                  # (B, 4, 4, L, C2) [row-stream, lane]
    # Output image row 4i+s, col 4j+t lives at out[:, s, t, i, j].
    if as_planes:
        # Emit the (row-parity, col-parity) quarter planes of the output
        # directly: two half-size stack+reshape interleaves per plane
        # instead of the monolithic 4x4 stream transpose below.
        def col(t, re):
            q = jnp.stack([out[:, re, t], out[:, re + 2, t]], axis=2)
            return q.reshape(B, 2 * L, C2)

        res = []
        for re in (0, 1):
            for ce in (0, 1):
                p = jnp.stack([col(ce, re), col(ce + 2, re)], axis=-1)
                res.append(p.reshape((B, 2 * L, 2 * C2))
                            .reshape(lead + (2 * L, 2 * C2)))
        return tuple(res)
    zp = out.transpose(0, 3, 1, 4, 2).reshape(B, 4 * L, 4 * C2)
    return zp.reshape(lead + zp.shape[-2:])
