"""Fused Pallas kernel for a complete level->=2 2-D DTCWT forward stage.

One kernel evaluates the whole decimating level (reference semantics
``/root/reference/dtcwt/numpy/transform2d.py:132-160``):

    X ──col dfilt h0──► lo ──row dfilt h0──► lolo
        col dfilt h1──► hi ──row dfilt h0──► im05 ─┐
                        lo ──row dfilt h1──► im23 ─┼─ q2c ─► 6 subbands
                        hi ──row dfilt h1──► im14 ─┘

instead of six separate dual-filter passes (each with transposes) plus the
quad pack.  Key structural trick: the dual-tree decimator *produces* its
output interleaved from two separately-computed tree branches (a/b), and the
quad→complex pack *consumes* exactly those row/column parities — so by
keeping the branches separate end-to-end the q2c corners fall out with no
strided access at all:

    a = row-even  col-even  =  row-tree(ev) of col-tree(ev)
    b = row-even  col-odd   =  row-tree(od) of col-tree(ev)   etc.

(which tree is the even one is the static ``sum(ha*hb) > 0`` parity of each
filter pair, reference ``numpy/lowlevel.py:143-148``).

Mosaic-shaped details (see :mod:`pallas_level1` for the general pattern):

* Lanes are pre-split into the four column quarter-phases by the wrapper
  (two stride-2 XLA passes); under symmetric reflection quarter-phases
  mirror-swap ``p <-> 3-p``, which fixes the 64-phase-column margins glued
  onto each plane.
* Rows use the halo-slab DMA + mirror fill of :func:`pallas_fb._load_slab`;
  the row quarter-phases come from a sublane split reshape.
* A sequential third grid dimension stages the work (column stage + lowpass,
  then one band group per step) with the column-stage branches persisted in
  scratch, bounding the scoped-VMEM tap temporaries.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dtcwt_tpu.ops.pallas_fb import (
    _compiler_params, _f32win, _mxu_precision,
    _SUBLANE, _LANE, _flatten_batch, _interpret, _load_slab, _round_up)

__all__ = ["fwd_level2"]

_MARGIN = 64              # boundary columns per side, in quarter-phase units
_TILE_BYTES = 24 * 1024 * 1024


def _split_taps(h: np.ndarray):
    """Reversed even/odd-index taps of a (even-length) dual-tree filter."""
    hr = h[::-1]
    return (tuple(float(v) for v in hr[0::2]),
            tuple(float(v) for v in hr[1::2]))


@functools.lru_cache(maxsize=None)
def _build_level2(B: int, R: int, C4: int, h0abytes: bytes, h0bbytes: bytes,
                  h1abytes: bytes, h1bbytes: bytes, dtype_str: str,
                  h2abytes: bytes = None, h2bbytes: bytes = None):
    """C4 = C // 4 (quarter-phase plane width, a multiple of 128 on TPU).
    *h2abytes*/*h2bbytes* supply the bandpass variant's third dual-filter
    pair (reference ``numpy/transform2d.py:145-157``)."""
    h0a = np.frombuffer(h0abytes, dtype=np.float64)
    h0b = np.frombuffer(h0bbytes, dtype=np.float64)
    h1a = np.frombuffer(h1abytes, dtype=np.float64)
    h1b = np.frombuffer(h1bbytes, dtype=np.float64)
    bp = h2abytes is not None
    h2a = np.frombuffer(h2abytes, dtype=np.float64) if bp else None
    h2b = np.frombuffer(h2bbytes, dtype=np.float64) if bp else None
    m = h0a.size
    if m % 2 or h1a.size != m or R % 4:
        return None
    if bp and (h2a.size != m or h2b.size != m):
        return None
    if m > 2 * _MARGIN:
        return None
    pad8 = _round_up(m, _SUBLANE)
    W = C4 + 2 * _MARGIN
    dtype = jnp.dtype(dtype_str)

    n_quads = R // 4
    n_br = 3 if bp else 2                   # column dual-filter branches
    temp_rows = 12 * m + 24
    budget_rows = max(_TILE_BYTES // (W * max(dtype.itemsize, 4)), 1)
    tq = None
    for t in (n_quads, 256, 128, 96, 64, 48, 32, 16, 8):
        if t > n_quads or n_quads % t:
            continue
        if t % _SUBLANE and t != n_quads:
            continue
        if 4 * t < pad8:
            continue
        # 8 double-buffered slabs + column-branch planes + temporaries
        if (8 * (4 * t + 2 * pad8) + 8 * n_br * t
                + t * temp_rows <= budget_rows):
            tq = t
            break
    if tq is None or pad8 > R or tq % _SUBLANE:
        return None
    n_tiles = n_quads // tq

    # Decimating dual filter along rows, on 4-phase planes (see ops/fb.py
    # dfilt_from_ext): with ext the extended signal and Q_p its quarter
    # phases,
    #   Ya[i] = sum_u rev(ha)[2u] Q2[i+u] + sum_u rev(ha)[2u+1] Q0[i+u+1]
    #   Yb[i] = sum_u rev(hb)[2u] Q3[i+u] + sum_u rev(hb)[2u+1] Q1[i+u+1]
    # The slab starts at ext index 4*q0 (phase 0), so local quarter phases
    # come from a 4-way sublane split of the slab window.
    h0a_e, h0a_o = _split_taps(h0a)
    h0b_e, h0b_o = _split_taps(h0b)
    h1a_e, h1a_o = _split_taps(h1a)
    h1b_e, h1b_o = _split_taps(h1b)
    pos0 = bool(np.sum(h0a * h0b) > 0)    # even-index tree of the h0 pair
    pos1 = bool(np.sum(h1a * h1b) > 0)
    if bp:
        h2a_e, h2a_o = _split_taps(h2a)
        h2b_e, h2b_o = _split_taps(h2b)
        pos2 = bool(np.sum(h2a * h2b) > 0)

    sc = float(np.sqrt(0.5))

    # Column stage as banded MXU matmuls: rows [0,tq) = even-row tree,
    # [tq,2tq) = odd-row tree, taps indexed straight off the slab
    # (Ya[i] = sum_k rev(ha)[k] slab[off + 4i + 2 + 2k], Yb at +3).
    # bf16 slabs cast f32 per dot (_f32win): the r3-era toolchain
    # miscompiled this fused cast here (deterministic first-tile NaNs at
    # the (R=1024, C=1024) build) and forced a whole-slab f32 VMEM staging
    # pass; re-probed 2026-08-20 (r5) the fused cast is exact on the
    # current Mosaic and the staging scratch is gone.
    use_mxu = m >= 6 and not _interpret()
    off_slab = pad8 - m
    slab_rows = 4 * tq + 2 * pad8

    def _col_matrix(ha, hb):
        har, hbr = ha[::-1], hb[::-1]
        pos = bool(np.sum(ha * hb) > 0)
        ra, rb = (0, 1) if pos else (1, 0)
        A = np.zeros((2 * tq, slab_rows), np.float32)
        for i in range(tq):
            for k in range(m):
                A[ra * tq + i, off_slab + 4 * i + 2 + 2 * k] += har[k]
                A[rb * tq + i, off_slab + 4 * i + 3 + 2 * k] += hbr[k]
        return A

    if use_mxu:
        # f32 operators: see pallas_fb._mxu_precision (bf16 matmuls broken)
        Acol0 = _col_matrix(h0a, h0b)
        Acol1 = _col_matrix(h1a, h1b)
        Acol2 = _col_matrix(h2a, h2b) if bp else None

    def col_trees(q, ha_e, ha_o, hb_e, hb_o, pos):
        """Column (sublane) dual filter from row quarter-phases *q* (list of
        4 (n4, W) planes); returns (even-row tree, odd-row tree)."""
        def corr(src, taps, off):
            acc = None
            for k, t in enumerate(taps):
                sl = lax.slice_in_dim(src, off + k, off + k + tq, axis=0)
                term = sl * jnp.asarray(t, src.dtype)
                acc = term if acc is None else acc + term
            return acc
        ya = corr(q[2], ha_e, 0) + corr(q[0], ha_o, 1)
        yb = corr(q[3], hb_e, 0) + corr(q[1], hb_o, 1)
        return (ya, yb) if pos else (yb, ya)

    # The dfilt quarter streams index the *extended* signal (ext[e] =
    # input[e - m]), while the lane planes hold raw input phases.  Since m
    # is even but not necessarily a multiple of 4, ext phase p maps to input
    # phase (p - m) mod 4 with a lane shift:  Q_p[n] = ext[4n + p] =
    # input[4(n - a) + (p - r4)] where m = 4a + r4.
    _a4, _r4 = m // 4, m % 4

    def _qsrc(p: int):
        return (p - _r4) % 4, -_a4 - (1 if p < _r4 else 0)

    def row_trees(planes, ha_e, ha_o, hb_e, hb_o, pos):
        """Row (lane) dual filter from column quarter-phase *planes* (list
        of 4 (tq, W) raw-input-phase planes); returns (even-col tree,
        odd-col tree) over the central C4 lanes."""
        def corr(p: int, taps, off: int):
            sp, d = _qsrc(p)
            src = planes[sp]
            acc = None
            for k, t in enumerate(taps):
                lo = _MARGIN + off + d + k
                sl = lax.slice_in_dim(src, lo, lo + C4, axis=1)
                term = sl * jnp.asarray(t, src.dtype)
                acc = term if acc is None else acc + term
            return acc
        ya = corr(2, ha_e, 0) + corr(0, ha_o, 1)
        yb = corr(3, hb_e, 0) + corr(1, hb_o, 1)
        return (ya, yb) if pos else (yb, ya)

    # Band groups (col source: 0=lo, 1=hi, 2=bp; row filter pair):
    # (hi,h0)->bands(0,5), (hi,h1)->(1,4), (lo,h1)->(2,3); the bp variant
    # takes the diagonal pair (1,4) from the third filter on both axes.
    if bp:
        groups = ((1, (h0a_e, h0a_o, h0b_e, h0b_o), pos0),
                  (2, (h2a_e, h2a_o, h2b_e, h2b_o), pos2),
                  (0, (h1a_e, h1a_o, h1b_e, h1b_o), pos1))
    else:
        groups = ((1, (h0a_e, h0a_o, h0b_e, h0b_o), pos0),
                  (1, (h1a_e, h1a_o, h1b_e, h1b_o), pos1),
                  (0, (h1a_e, h1a_o, h1b_e, h1b_o), pos1))

    total = B * n_tiles
    t_in = 4 * tq

    def _slab_dma(x_hbm, slab, sem, t, start: bool):
        """Start (or wait on) the slab DMA for linear tile *t*; the wait
        replays the issue's branch structure so descriptors match."""
        b = t // n_tiles
        i = t % n_tiles
        g0 = i * t_in

        def op(cp):
            cp.start() if start else cp.wait()

        if n_tiles == 1:
            op(pltpu.make_async_copy(
                x_hbm.at[b], slab.at[pl.ds(pad8, t_in), :], sem))
            return

        @pl.when(i == 0)
        def _():
            op(pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(0, t_in + pad8), :],
                slab.at[pl.ds(pad8, t_in + pad8), :], sem))

        src0 = pl.multiple_of(g0 - pad8, _SUBLANE)

        @pl.when(jnp.logical_and(i > 0, i < n_tiles - 1))
        def _():
            op(pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(src0, t_in + 2 * pad8), :],
                slab.at[:, :], sem))

        @pl.when(i == n_tiles - 1)
        def _():
            op(pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(src0, t_in + pad8), :],
                slab.at[pl.ds(0, t_in + pad8), :], sem))

    def _fills(slab, i):
        @pl.when(i == 0)
        def _():
            for j in range(pad8 - m, pad8):
                slab[j, :] = slab[2 * pad8 - 1 - j, :]
            # Zero the never-DMA'd outer gap rows [0, pad8 - m): the column
            # matmul feeds the WHOLE slab to the MXU relying on zero
            # operator columns, and 0 * NaN-garbage = NaN — uninitialized
            # VMEM leftovers poisoned whole first tiles, composition-
            # dependently (found on chip, r3).
            for j in range(0, pad8 - m):
                slab[j, :] = jnp.zeros_like(slab[0, :])

        @pl.when(i == n_tiles - 1)
        def _():
            for s in range(t_in + pad8, t_in + pad8 + m):
                slab[s, :] = slab[2 * (t_in + pad8) - 1 - s, :]
            for s in range(t_in + pad8 + m, t_in + 2 * pad8):
                slab[s, :] = jnp.zeros_like(slab[0, :])

    def kernel(x0, x1, x2, x3, *refs):
        if use_mxu:
            if bp:
                ac0_ref, ac1_ref, ac2_ref = refs[0], refs[1], refs[2]
                refs = refs[3:]
            else:
                ac0_ref, ac1_ref = refs[0], refs[1]
                refs = refs[2:]
        (lolo_e_ref, lolo_o_ref, re_ref, im_ref,
         s0, s1, s2, s3, cols, sems) = refs
        b = pl.program_id(0)
        i = pl.program_id(1)
        k = pl.program_id(2)
        xs = (x0, x1, x2, x3)
        slabs = (s0, s1, s2, s3)

        @pl.when(k == 0)
        def _():
            t = b * n_tiles + i

            # Double-buffered input slabs (buffer t % 2); tile t+1's DMAs
            # are issued right after the wait to overlap this tile's work.
            def stage(buf):
                @pl.when(t == 0)
                def _():
                    for p in range(4):
                        _slab_dma(xs[p], slabs[p].at[buf],
                                  sems.at[buf, p], t, True)
                for p in range(4):
                    _slab_dma(xs[p], slabs[p].at[buf],
                              sems.at[buf, p], t, False)

                @pl.when(t + 1 < total)
                def _():
                    for p in range(4):
                        _slab_dma(xs[p], slabs[p].at[1 - buf],
                                  sems.at[1 - buf, p], t + 1, True)
                for p in range(4):
                    _fills(slabs[p].at[buf], i)

                if use_mxu:
                    # Column stage: one banded matmul per (plane, pair).
                    for p in range(4):
                        sl = _f32win(dtype)(slabs[p][buf])
                        ylo = jnp.dot(ac0_ref[:, :], sl,
                                      precision=_mxu_precision(dtype),
                                      preferred_element_type=jnp.float32
                                      ).astype(dtype)
                        yhi = jnp.dot(ac1_ref[:, :], sl,
                                      precision=_mxu_precision(dtype),
                                      preferred_element_type=jnp.float32
                                      ).astype(dtype)
                        cols[0, p] = lax.slice_in_dim(ylo, 0, tq, axis=0)
                        cols[1, p] = lax.slice_in_dim(ylo, tq, 2 * tq,
                                                      axis=0)
                        cols[2, p] = lax.slice_in_dim(yhi, 0, tq, axis=0)
                        cols[3, p] = lax.slice_in_dim(yhi, tq, 2 * tq,
                                                      axis=0)
                        if bp:
                            ybp = jnp.dot(
                                ac2_ref[:, :], sl,
                                precision=_mxu_precision(dtype),
                                preferred_element_type=jnp.float32
                            ).astype(dtype)
                            cols[4, p] = lax.slice_in_dim(ybp, 0, tq,
                                                          axis=0)
                            cols[5, p] = lax.slice_in_dim(ybp, tq, 2 * tq,
                                                          axis=0)
                else:
                    # Row quarter-phases of the slab window (starts at ext
                    # row 4*q0) via a sublane split reshape, per lane plane.
                    q_by_plane = []
                    for sl in slabs:
                        win = lax.slice_in_dim(
                            sl[buf], pad8 - m, pad8 - m + 4 * tq + 2 * m,
                            axis=0)
                        w4 = win.reshape(tq + m // 2, 4, W)
                        q_by_plane.append([w4[:, p, :] for p in range(4)])
                    for p in range(4):
                        lo_ev, lo_od = col_trees(q_by_plane[p], h0a_e,
                                                 h0a_o, h0b_e, h0b_o, pos0)
                        hi_ev, hi_od = col_trees(q_by_plane[p], h1a_e,
                                                 h1a_o, h1b_e, h1b_o, pos1)
                        cols[0, p] = lo_ev
                        cols[1, p] = lo_od
                        cols[2, p] = hi_ev
                        cols[3, p] = hi_od
                        if bp:
                            bp_ev, bp_od = col_trees(
                                q_by_plane[p], h2a_e, h2a_o, h2b_e, h2b_o,
                                pos2)
                            cols[4, p] = bp_ev
                            cols[5, p] = bp_od
                # Lowpass: row dual filter of the lo branches; interleave
                # rows in-kernel, columns stay split for the wrapper.
                le_e, le_o = row_trees([cols[0, p] for p in range(4)],
                                       h0a_e, h0a_o, h0b_e, h0b_o, pos0)
                lo_e, lo_o = row_trees([cols[1, p] for p in range(4)],
                                       h0a_e, h0a_o, h0b_e, h0b_o, pos0)
                lolo_e_ref[0] = jnp.stack([le_e, lo_e], axis=1).reshape(
                    2 * tq, C4)
                lolo_o_ref[0] = jnp.stack([le_o, lo_o], axis=1).reshape(
                    2 * tq, C4)

            @pl.when(t % 2 == 0)
            def _():
                stage(0)

            @pl.when(t % 2 == 1)
            def _():
                stage(1)

        for g, (src, taps, pos) in enumerate(groups):
            @pl.when(k == g + 1)
            def _(src=src, taps=taps, pos=pos):
                ev_planes = [cols[2 * src, p] for p in range(4)]
                od_planes = [cols[2 * src + 1, p] for p in range(4)]
                a, bq = row_trees(ev_planes, *taps, pos)
                c, d = row_trees(od_planes, *taps, pos)
                # p = (a + jb)/sqrt2, q = (d - jc)/sqrt2; bands (p-q, p+q).
                # Adjacent band-pair blocks per k-step (see pallas_level1);
                # band order is PLANE_BAND_ORDER = (0,5,1,4,2,3).
                re_ref[0, 0] = (a - d) * sc
                im_ref[0, 0] = (bq + c) * sc
                re_ref[0, 1] = (a + d) * sc
                im_ref[0, 1] = (bq - c) * sc

    in_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    in_specs = [in_spec] * 4
    if use_mxu:
        acol_spec = pl.BlockSpec((2 * tq, slab_rows),
                                 lambda b, i, k: (0, 0),
                                 memory_space=pltpu.VMEM)
        in_specs = in_specs + [acol_spec] * (3 if bp else 2)
    lolo_spec = pl.BlockSpec((1, 2 * tq, C4), lambda b, i, k: (b, i, 0),
                             memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec(
        (1, 2, tq, C4),
        lambda b, i, k: (b, jnp.maximum(k - 1, 0), i, 0),
        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(B, n_tiles, 4),
        in_specs=in_specs,
        out_specs=(lolo_spec, lolo_spec, band_spec, band_spec),
        out_shape=(jax.ShapeDtypeStruct((B, R // 2, C4), dtype),
                   jax.ShapeDtypeStruct((B, R // 2, C4), dtype),
                   jax.ShapeDtypeStruct((B, 6, R // 4, C4), dtype),
                   jax.ShapeDtypeStruct((B, 6, R // 4, C4), dtype)),
        scratch_shapes=[pltpu.VMEM((2, 4 * tq + 2 * pad8, W), dtype),
                        pltpu.VMEM((2, 4 * tq + 2 * pad8, W), dtype),
                        pltpu.VMEM((2, 4 * tq + 2 * pad8, W), dtype),
                        pltpu.VMEM((2, 4 * tq + 2 * pad8, W), dtype),
                        pltpu.VMEM((2 * n_br, 4, tq, W), dtype),
                        pltpu.SemaphoreType.DMA((2, 4))],
        compiler_params=_compiler_params(3),
        interpret=_interpret(),
    )
    if use_mxu:
        if bp:
            return lambda *xs: call(*xs, Acol0, Acol1, Acol2)
        return lambda *xs: call(*xs, Acol0, Acol1)
    return call


def fwd_level2(X, h0a, h0b, h1a, h1b, pair=None, as_split: bool = False,
               h2a=None, h2b=None, as_planes: bool = False
               ) -> Optional[Tuple[object, jnp.ndarray]]:
    """Fused level->=2 forward stage.  *X* is ``[..., R, C]`` real with R, C
    multiples of 4 (C/4 a multiple of 128 on hardware); filter arguments
    follow the transform's call order ``dfilt(x, h0b, h0a)`` /
    ``dfilt(x, h1b, h1a)``.  Returns ``(lolo [..., R/2, C/2],
    Yh [..., R/4, C/4, 6] complex)`` or None outside the envelope.

    *pair* optionally supplies the input as its even/odd column planes (the
    uninterleaved lowpass of an upstream fused level) in place of *X*; with
    ``as_split`` the output lowpass is likewise returned as planes.  With
    ``as_planes`` the subbands come back as the band-major f32 plane pair
    ``(re [..., 6, R/4, C/4], im [...])`` in degree order (plane-layout
    pyramid path — no complex interleave pass).
    """
    h0a = np.asarray(h0a, np.float64).reshape(-1)
    h0b = np.asarray(h0b, np.float64).reshape(-1)
    h1a = np.asarray(h1a, np.float64).reshape(-1)
    h1b = np.asarray(h1b, np.float64).reshape(-1)
    bp = h2a is not None
    if bp:
        h2a = np.asarray(h2a, np.float64).reshape(-1)
        h2b = np.asarray(h2b, np.float64).reshape(-1)
    if pair is not None:
        e, o = pair
        if e.ndim < 2 or e.dtype not in (jnp.float32, jnp.bfloat16):
            return None
        R, C = e.shape[-2], e.shape[-1] * 2
    else:
        if X.ndim < 2 or X.dtype not in (jnp.float32, jnp.bfloat16):
            return None
        R, C = X.shape[-2], X.shape[-1]
    if R % 4 or C % 4:
        return None
    if not _interpret() and (C // 4) % _LANE:
        return None
    if C // 4 < _MARGIN:
        return None
    if pair is not None:
        e3, lead = _flatten_batch(e)
        o3, _ = _flatten_batch(o)
        x3 = None
    else:
        x3, lead = _flatten_batch(X)
    # The transform calls dfilt(x, ha=h_b, hb=h_a): branch a runs the *b*
    # filter (see ops/fb.py dfilt_from_ext).
    B = e3.shape[0] if x3 is None else x3.shape[0]
    dtype_str = str((e3 if x3 is None else x3).dtype)
    call = _build_level2(B, R, C // 4, h0b.tobytes(),
                         h0a.tobytes(), h1b.tobytes(), h1a.tobytes(),
                         dtype_str,
                         h2b.tobytes() if bp else None,
                         h2a.tobytes() if bp else None)
    if call is None:
        return None

    # Quarter-phase lane split (two stride-2 passes) + 64-phase-column
    # reflected margins; reflection mirror-swaps phases p <-> 3-p.
    if x3 is not None:
        e3, o3 = x3[:, :, 0::2], x3[:, :, 1::2]
    ph = [e3[:, :, 0::2], o3[:, :, 0::2], e3[:, :, 1::2], o3[:, :, 1::2]]
    g = _MARGIN
    ext = []
    for p in range(4):
        mirror = ph[3 - p]
        ext.append(jnp.concatenate(
            [jnp.flip(mirror[:, :, :g], axis=2), ph[p], jnp.flip(mirror[:, :, -g:], axis=2)],
            axis=2))

    lolo_e, lolo_o, re, im = call(*ext)

    # (B, 6, R/4, C4) band planes in the kernel's pair order
    # PLANE_BAND_ORDER = (0,5,1,4,2,3) — band pairs (p-q, p+q) adjacent.
    if as_planes:
        yh = (re.reshape(lead + re.shape[-3:]),
              im.reshape(lead + im.shape[-3:]))
    else:
        z = lax.complex(re.astype(jnp.float32), im.astype(jnp.float32))
        # static-slice band reorder (pair order -> degrees): an index-array
        # permutation (z[:, order]) lowers to a slow full-array gather
        yh = jnp.stack([z[:, 0], z[:, 2], z[:, 4], z[:, 5], z[:, 3],
                        z[:, 1]], axis=-1)
        yh = yh.reshape(lead + yh.shape[-3:])
    if as_split:
        return ((lolo_e.reshape(lead + lolo_e.shape[-2:]),
                 lolo_o.reshape(lead + lolo_o.shape[-2:])), yh)
    lolo = jnp.stack([lolo_e, lolo_o], axis=-1).reshape(
        B, R // 2, C // 2)
    return lolo.reshape(lead + lolo.shape[-2:]), yh
