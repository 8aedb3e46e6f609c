"""Fused Pallas kernel for the final (level-1) 2-D DTCWT inverse stage.

One kernel evaluates the reconstruction stage with the odd biorthogonal
synthesis filters (reference ``/root/reference/dtcwt/numpy/transform2d.py``
:275-293 with ``c2q`` :324-350):

    lh,hl,hh = c2q(band pairs of Yh[0])
    y1 = colfilter(Z, g0o) + colfilter(lh, g1o)
    y2 = colfilter(hl, g0o) + colfilter(hh, g1o)
    X  = rowfilter(y1, g0o) + rowfilter(y2, g1o)

This is the most expensive inverse stage (it runs at full resolution).  As
in :mod:`pallas_ilevel2`, c2q never materialises — not even in XLA: the
kernel DMAs the subbands' re/im *band planes* (the one unavoidable band
transpose) plus the lowpass column-parity planes, and builds the quad
images' (row-parity x col-parity) planes with whole-slab VPU combinations
in VMEM.  Reflected lane margins ride a small pre-flipped side strip,
DMA'd into 128-aligned margin lanes (lane reversal does not lower in
Mosaic); the quad combinations commute with the margin substitution
re[A] <- flip(im[5-A]) / im[A] <- flip(re[5-A]).  The non-decimating
convolutions split into two-phase polyphase sums wherever an operand lives
in parity planes, and the only interleaves are a sublane stack in-kernel
(rows) plus one XLA pass (columns).

Identity gains only (the transform pre-scales gain_mask into the
subbands); the bandpass variants run a third synthesis stream.
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
    _compiler_params, _f32win, _mxu_precision,
    _SUBLANE, _LANE, _flatten_batch, _interpret)

__all__ = ["inv_level1"]

_MARGIN = 128            # boundary columns per side (DMA lane alignment)
_PADQ = 8                # halo rows for the half-res quad-plane slabs
# This kernel holds 26 half/full-res slabs + stream planes live at once, so
# it runs out of row budget long before VMEM: 48 MB (tr 32 -> 80 at 4096^2)
# measured 8.78 vs 9.09 ms roundtrip in an alternating same-process A/B;
# 72 MB regressed (10.6 ms).  The other kernels keep 24 MB (their sweet
# spot from the r2 sweep).
_TILE_BYTES = 48 * 1024 * 1024

# band pairs per quad source: lh=(0,5), hl=(2,3), hh=(1,4)
_PAIRS = ((0, 5), (2, 3), (1, 4))
# the same pairs at their PLANE_BAND_ORDER (0,5,1,4,2,3) positions
_PAIRS_PO = ((0, 1), (4, 5), (2, 3))


@functools.lru_cache(maxsize=None)
def _build_ilevel1(B: int, H: int, C2: int, g0bytes: bytes, g1bytes: bytes,
                   dtype_str: str, g2bytes: bytes = None,
                   pair_order: bool = False):
    """H = full rows, C2 = W/2 column-plane width (x128 on TPU).  *g2bytes*
    supplies the bandpass variant's third synthesis filter (reference
    ``numpy/transform2d.py:280-291``)."""
    g0 = np.frombuffer(g0bytes, dtype=np.float64)
    g1 = np.frombuffer(g1bytes, dtype=np.float64)
    bp = g2bytes is not None
    g2 = np.frombuffer(g2bytes, dtype=np.float64) if bp else None
    m0, m1 = g0.size, g1.size
    m2 = g2.size if bp else 0
    if m0 % 2 == 0 or m1 % 2 == 0 or H % 2 or (bp and m2 % 2 == 0):
        return None
    p0, p1 = m0 // 2, m1 // 2
    p2 = m2 // 2
    pmax = max(p0, p1, p2)
    if pmax // 2 + 2 > _PADQ or pmax > _MARGIN:
        return None
    G = _MARGIN
    W = C2 + 2 * G
    dtype = jnp.dtype(dtype_str)
    s_half = float(np.sqrt(0.5))

    n_str = 3 if bp else 2     # stream groups: y1, y2 (, y2bp)
    temp_rows = 2 * (m0 + m1 + m2) + 16
    budget_rows = max(_TILE_BYTES // (W * max(dtype.itemsize, 4)), 1)
    tr = None
    for t in (H, 256, 128, 96, 64, 48, 32, 16):
        if t > H or H % t or t % 16:
            continue
        # 2x16 raw (re/im/lowpass-quarters, double-buffered) + 12 quad
        # half-res slabs + stream planes
        if (44 * (t // 2 + 2 * _PADQ) + 2 * n_str * t
                + t * temp_rows) <= budget_rows:
            tr = t
            break
    if tr is None or _PADQ > H // 2:
        return None
    n_tiles = H // tr

    # Row-stage banded MXU operators: per-tap sublane shifts each cost a
    # VMEM relayout, so the two-phase polyphase convolutions run as
    # matmuls (operand = the concatenated [P0; P1] pair slabs).  The
    # lowpass arrives as its four (rp, cp) quarter planes and rides the
    # SAME polyphase operator as the hl quads (both filter with g0) — the
    # r2-era full-res z slab needed a stacked (B, 2, H, C2) input that
    # cost two XLA relayout passes plus operand copies per call (r5 xprof).
    use_mxu = not _interpret()
    qrows = tr // 2 + 2 * _PADQ
    if use_mxu:
        def _qmat(h, pad_f):
            # Output rows 2j / 2j+1 hold the even/odd row-parity streams:
            # the row interleave is a permutation of the operator rows, so
            # it happens ON THE MXU for free (same trick as pallas_pack3d's
            # parity-scatter layouts) — the r2-era wrapper relayout that
            # interleaved the quarter planes cost ~17 ms when materialised
            # (profiled via tools/xprof.py, r5).
            hr = h[::-1]
            n = tr // 2
            A = np.zeros((2 * n, 2 * qrows), np.float32)
            for idx in range(h.size):
                d = idx - pad_f
                tv = float(hr[idx])
                for j in range(n):
                    if d % 2 == 0:
                        u = d // 2
                        A[2 * j, _PADQ + u + j] += tv
                        A[2 * j + 1, qrows + _PADQ + u + j] += tv
                    else:
                        u = (d - 1) // 2
                        A[2 * j, qrows + _PADQ + u + j] += tv
                        A[2 * j + 1, _PADQ + u + 1 + j] += tv
            return A

        # f32 operators: see pallas_fb._mxu_precision (bf16 matmuls broken)
        Aq0 = _qmat(g0, p0).astype(np.float32)
        Aq1 = _qmat(g1, p1).astype(np.float32)
        Aq2 = _qmat(g2, p2).astype(np.float32) if bp else None

    def conv_planes_rows(p0_ref, p1_ref, h: np.ndarray, pad_f: int):
        """Non-decimating row conv of an interleaved signal held as parity
        plane slabs; returns (even-row, odd-row) output planes (tr//2 each).

        out[2j+rp] = sum_d h_rev[pad_f+d] I[2j+rp+d]; even d stays in the
        same-parity plane, odd d crosses to the other with a +-1 shift.
        """
        hr = h[::-1]
        oe = None
        oo = None
        n = tr // 2
        for idx in range(h.size):
            d = idx - pad_f
            tv = jnp.asarray(float(hr[idx]), dtype)
            if d % 2 == 0:
                u = d // 2
                se = lax.slice_in_dim(p0_ref, _PADQ + u, _PADQ + u + n,
                                      axis=0) * tv
                so = lax.slice_in_dim(p1_ref, _PADQ + u, _PADQ + u + n,
                                      axis=0) * tv
            else:
                u = (d - 1) // 2
                se = lax.slice_in_dim(p1_ref, _PADQ + u, _PADQ + u + n,
                                      axis=0) * tv
                so = lax.slice_in_dim(p0_ref, _PADQ + u + 1,
                                      _PADQ + u + 1 + n, axis=0) * tv
            oe = se if oe is None else oe + se
            oo = so if oo is None else oo + so
        return oe, oo

    def conv_planes_lanes(c0, c1, h: np.ndarray, pad_f: int):
        """Same two-phase polyphase sum along lanes; returns the (even-col,
        odd-col) output planes over the central C2 lanes."""
        hr = h[::-1]
        oe = None
        oo = None
        n = C2
        for idx in range(h.size):
            d = idx - pad_f
            tv = jnp.asarray(float(hr[idx]), dtype)
            if d % 2 == 0:
                u = d // 2
                se = lax.slice_in_dim(c0, G + u, G + u + n, axis=1) * tv
                so = lax.slice_in_dim(c1, G + u, G + u + n, axis=1) * tv
            else:
                u = (d - 1) // 2
                se = lax.slice_in_dim(c1, G + u, G + u + n, axis=1) * tv
                so = lax.slice_in_dim(c0, G + u + 1, G + u + 1 + n,
                                      axis=1) * tv
            oe = se if oe is None else oe + se
            oo = so if oo is None else oo + so
        return oe, oo

    def kernel(zp0, zp1, zp2, zp3, re_hbm, im_hbm, mz_hbm, mq_hbm, *refs):
        if use_mxu:
            aq0_ref, aq1_ref = refs[0], refs[1]
            refs = refs[2:]
            if bp:
                aq2_ref = refs[0]
                refs = refs[1:]
        (out_e, out_o, raw, qslabs, streams, sems) = refs
        b = pl.program_id(0)
        i = pl.program_id(1)
        k = pl.program_id(2)
        zps = (zp0, zp1, zp2, zp3)

        @pl.when(k == 0)
        def _():
            t = b * n_tiles + i
            total = B * n_tiles

            # Double-buffered overlapped DMAs (tile t uses buffer t % 2;
            # tile t+1's copies are issued right after the wait so they
            # overlap this tile's quad build + row stage).  All inputs are
            # half-height (rp, cp) parity planes landing in `raw`:
            # slots 0-5 re, 6-11 im, 12-15 the lowpass quarter planes
            # (slot 12 + 2*rp + cp).  Descriptor: (src, dst slot range,
            # src lane window, dst lane window, semaphore index).
            def _dma_all(t_, buf, start: bool):
                b_ = t_ // n_tiles
                i_ = t_ % n_tiles
                descs = (
                    [(zps[s], (12 + s, 1), None, pl.ds(G, C2), s)
                     for s in range(4)]
                    + [(mz_hbm, (12, 4), pl.ds(0, G), pl.ds(0, G), 4),
                       (mz_hbm, (12, 4), pl.ds(G, G), pl.ds(G + C2, G), 5),
                       (re_hbm, (0, 6), None, pl.ds(G, C2), 6),
                       (im_hbm, (6, 6), None, pl.ds(G, C2), 7),
                       (mq_hbm, (0, 12), pl.ds(0, G), pl.ds(0, G), 8),
                       (mq_hbm, (0, 12), pl.ds(G, G),
                        pl.ds(G + C2, G), 9)])

                def op(row_sel):
                    cps = []
                    for (src, (s0, ns), scol, dcol, sem) in descs:
                        lo, n, dlo = row_sel(tr // 2, _PADQ)
                        rows = pl.ds(lo, n)
                        if src.ndim == 3:       # a single quarter plane
                            sref = (src.at[b_, rows, scol]
                                    if scol is not None
                                    else src.at[b_, rows, :])
                            dref = raw.at[buf, s0, pl.ds(dlo, n), dcol]
                        else:
                            sref = (src.at[b_, :, rows, scol]
                                    if scol is not None
                                    else src.at[b_, :, rows, :])
                            dref = raw.at[buf, pl.ds(s0, ns),
                                          pl.ds(dlo, n), dcol]
                        cps.append(pltpu.make_async_copy(
                            sref, dref, sems.at[buf, sem]))
                    for c in cps:
                        c.start() if start else c.wait()

                if n_tiles == 1:
                    op(lambda tn, p: (0, tn, p))
                    return

                @pl.when(i_ == 0)
                def _():
                    op(lambda tn, p: (0, tn + p, p))

                if n_tiles > 2:
                    @pl.when(jnp.logical_and(i_ > 0, i_ < n_tiles - 1))
                    def _():
                        op(lambda tn, p:
                           (pl.multiple_of(i_ * tn - p, _SUBLANE),
                            tn + 2 * p, 0))

                @pl.when(i_ == n_tiles - 1)
                def _():
                    op(lambda tn, p:
                       (pl.multiple_of(i_ * tn - p, _SUBLANE), tn + p, 0))

            def stage(buf):
                @pl.when(t == 0)
                def _():
                    _dma_all(t, buf, True)
                _dma_all(t, buf, False)

                @pl.when(t + 1 < total)
                def _():
                    _dma_all(t + 1, 1 - buf, True)

                # Quad slabs: whole-slab VPU c2q in parity-plane space.
                sc = jnp.asarray(s_half, dtype)
                for src, (A, Bb) in enumerate(_PAIRS_PO if pair_order
                                              else _PAIRS):
                    reA, reB = raw[buf, A], raw[buf, Bb]
                    imA, imB = raw[buf, 6 + A], raw[buf, 6 + Bb]
                    qslabs[4 * src + 0] = (reA + reB) * sc
                    qslabs[4 * src + 1] = (imA + imB) * sc
                    qslabs[4 * src + 2] = (imA - imB) * sc
                    qslabs[4 * src + 3] = (reB - reA) * sc

                # Mirror fills: row reflection swaps row-parity partners
                # (p ^ 2) for the quad slabs and the raw lowpass quarter
                # planes alike (image row -1-t = row t maps plane
                # rp0[-1-u] = rp1[u] and vice versa).
                @pl.when(i == 0)
                def _():
                    for p in range(12):
                        q = p ^ 2
                        for s_ in range(_PADQ):
                            qslabs[p, s_, :] = qslabs[
                                q, 2 * _PADQ - 1 - s_, :]
                    for p in range(12, 16):
                        q = p ^ 2
                        for s_ in range(_PADQ):
                            raw[buf, p, s_, :] = raw[
                                buf, q, 2 * _PADQ - 1 - s_, :]

                @pl.when(i == n_tiles - 1)
                def _():
                    hq = tr // 2
                    for p in range(12):
                        q = p ^ 2
                        for s_ in range(hq + _PADQ, hq + 2 * _PADQ):
                            qslabs[p, s_, :] = qslabs[
                                q, 2 * (hq + _PADQ) - 1 - s_, :]
                    for p in range(12, 16):
                        q = p ^ 2
                        for s_ in range(hq + _PADQ, hq + 2 * _PADQ):
                            raw[buf, p, s_, :] = raw[
                                buf, q, 2 * (hq + _PADQ) - 1 - s_, :]

                # Row stage per column parity: y = colfilter(Z|hl, g0o) +
                # colfilter(lh|hh, g1o).  The full-res Z correlation is in
                # natural (interleaved) row order, and the quad operators
                # emit their two row-parity streams interleaved (_qmat row
                # permutation), so the stream planes hold full-height
                # interleaved rows — no split, no downstream row relayout.
                # quad slab index: 4*src + 2*rp + cp, sources (lh, hl, hh).
                for cp_ in range(2):
                    if use_mxu:
                        def rowq2(pl0, pl1, a_ref):
                            win = _f32win(dtype)(jnp.concatenate(
                                [pl0, pl1], axis=0))
                            return jnp.dot(a_ref[:, :], win,
                                           precision=_mxu_precision(dtype),
                                           preferred_element_type=jnp.float32
                                           ).astype(dtype)

                        def rowq(base, a_ref, cp_=cp_):
                            return rowq2(qslabs[base + cp_],
                                         qslabs[base + 2 + cp_], a_ref)

                        # the lowpass quarter planes filter with g0 — the
                        # hl operator, reused verbatim
                        yz = rowq2(raw[buf, 12 + cp_], raw[buf, 14 + cp_],
                                   aq0_ref)
                        lh = rowq(0, aq1_ref)
                        hl = rowq(4, aq0_ref)
                        hh = rowq(8, aq2_ref if bp else aq1_ref)
                    else:
                        # interpret-mode (CPU) twin: interleave the parity
                        # streams with a sublane stack (cost irrelevant off
                        # hardware; on TPU the MXU operators own it).
                        def ilv(pair):
                            return jnp.stack(pair, axis=1).reshape(tr, W)
                        yz = ilv(conv_planes_rows(raw[buf, 12 + cp_],
                                                  raw[buf, 14 + cp_],
                                                  g0, p0))
                        lh = ilv(conv_planes_rows(qslabs[0 + cp_],
                                                  qslabs[2 + cp_], g1, p1))
                        hl = ilv(conv_planes_rows(qslabs[4 + cp_],
                                                  qslabs[6 + cp_], g0, p0))
                        hh = ilv(conv_planes_rows(qslabs[8 + cp_],
                                                  qslabs[10 + cp_],
                                                  g2 if bp else g1,
                                                  p2 if bp else p1))
                    streams[2 * 0 + cp_] = yz + lh                  # y1
                    if bp:
                        streams[2 + cp_] = hl                       # y2
                        streams[4 + cp_] = hh                       # y2bp
                    else:
                        streams[2 + cp_] = hl + hh                  # y2

            @pl.when(t % 2 == 0)
            def _():
                stage(0)

            @pl.when(t % 2 == 1)
            def _():
                stage(1)

        # Lane stage: one output column parity per grid step.  The stream
        # planes are full-height (rows interleaved by the MXU operators),
        # so each step emits a complete column-parity plane; the wrapper's
        # only relayout is the single-axis lane interleave (the fast
        # stack+reshape pattern, ~415 GB/s — the r2-era combined row+column
        # relayout lowered ~50x slower when materialised).
        for cp_out in range(2):
            @pl.when(k == cp_out + 1)
            def _(cp_out=cp_out):
                a1 = conv_planes_lanes(streams[0], streams[1],
                                       g0, p0)[cp_out]
                a2 = conv_planes_lanes(streams[2], streams[3],
                                       g1, p1)[cp_out]
                if bp:
                    a3 = conv_planes_lanes(streams[4], streams[5],
                                           g2, p2)[cp_out]
                    a1 = a1 + a3
                (out_e, out_o)[cp_out][0] = a1 + a2

    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    in_specs = [hbm] * 8
    if use_mxu:
        aq_spec = pl.BlockSpec((tr, 2 * qrows), lambda b, i, k: (0, 0),
                               memory_space=pltpu.VMEM)
        in_specs += [aq_spec, aq_spec] + ([aq_spec] if bp else [])
    out_spec = pl.BlockSpec((1, tr, C2), lambda b, i, k: (b, i, 0),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(B, n_tiles, 3),
        in_specs=in_specs,
        out_specs=(out_spec,) * 2,
        out_shape=(jax.ShapeDtypeStruct((B, H, C2), dtype),) * 2,
        scratch_shapes=[pltpu.VMEM((2, 16, tr // 2 + 2 * _PADQ, W), dtype),
                        pltpu.VMEM((12, tr // 2 + 2 * _PADQ, W), dtype),
                        pltpu.VMEM((2 * n_str, tr, W), dtype),
                        pltpu.SemaphoreType.DMA((2, 10))],
        compiler_params=_compiler_params(3),
        interpret=_interpret(),
    )
    if use_mxu:
        mats = (Aq0, Aq1) + ((Aq2,) if bp else ())
        return lambda *xs: call(*xs, *mats)
    return call


def inv_level1(Z, yh, g0o, g1o, planes=None, g2o=None, bands=None
               ) -> Optional[jnp.ndarray]:
    """Fused level-1 inverse.  *Z* is the ``[..., H, W]`` real lowpass, *yh*
    the ``[..., H/2, W/2, 6]`` complex level-1 highpasses; returns the
    reconstructed ``[..., H, W]`` image or None outside the envelope.

    *planes* accepts the previous fused level's ``as_planes=True`` output
    (``(p00, p01, p10, p11)`` (row-parity, col-parity) quarter planes of the
    lowpass) in place of *Z*, skipping the interleaved-image round trip
    between levels (see :func:`pallas_ilevel2.inv_level2`).  *bands*
    accepts the subbands as the plane-layout pair ``(re, im)`` — band-major
    ``[..., 6, H/2, W/2]`` f32 planes in PLANE_BAND_ORDER — in place of
    *yh*, skipping the band transpose."""
    g0 = np.asarray(g0o, np.float64).reshape(-1)
    g1 = np.asarray(g1o, np.float64).reshape(-1)
    g2 = None if g2o is None else np.asarray(g2o, np.float64).reshape(-1)
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
    if bands is not None:
        if bands[0].dtype not in (jnp.float32, jnp.bfloat16):
            return None
        if bands[0].shape[-3:] != (6, H // 2, Wd // 2):
            return None
    else:
        if not jnp.issubdtype(yh.dtype, jnp.complexfloating):
            return None
        if yh.shape[-3:] != (H // 2, Wd // 2, 6):
            return None
    if H % 2 or Wd % 2:
        return None
    C2 = Wd // 2
    if not _interpret() and C2 % _LANE:
        return None
    if C2 < _MARGIN:
        return None
    if planes is not None:
        # The kernel consumes the (rp, cp) quarter planes directly in
        # slot order 2*rp + cp — a chained fused level's planes pass
        # through with NO relayout at all (the r2-era stacked z2 form
        # cost two XLA passes plus operand copies — r5 xprof).
        p4, leads = zip(*[_flatten_batch(p) for p in planes])
        lead = leads[0]
        B = p4[0].shape[0]
        zq = (p4[0], p4[1], p4[2], p4[3])
        zdtype = p4[0].dtype
    else:
        z3, lead = _flatten_batch(Z)
        B = z3.shape[0]
        ze, zo = z3[:, :, 0::2], z3[:, :, 1::2]
        zq = (ze[:, 0::2], zo[:, 0::2], ze[:, 1::2], zo[:, 1::2])
        zdtype = z3.dtype

    call = _build_ilevel1(B, H, C2, g0.tobytes(), g1.tobytes(),
                          str(zdtype),
                          None if g2 is None else g2.tobytes(),
                          pair_order=bands is not None)
    if call is None:
        return None

    L = H // 2
    if bands is not None:
        # Plane-layout input: band planes arrive kernel-ready — no
        # transpose pass.  Margin partners sit adjacent (p ^ 1).
        rep = bands[0].reshape((B, 6, L, C2)).astype(zdtype)
        imp = bands[1].reshape((B, 6, L, C2)).astype(zdtype)

        def partner(a):
            # shape-agnostic in the lane dim: applied to the 2G-col strips
            return jnp.flip(a.reshape(B, 3, 2, L, a.shape[-1]),
                            axis=2).reshape(a.shape)
    else:
        # One band transpose — the only full-size XLA pass.  c2q, margins
        # and the parity-plane stack all happen inside the kernel.
        yh3 = yh.reshape((B,) + yh.shape[-3:])
        yhp = jnp.moveaxis(yh3, -1, 1)             # (B, 6, h, w)
        rep = jnp.real(yhp).astype(zdtype)
        imp = jnp.imag(yhp).astype(zdtype)

        def partner(a):
            return jnp.flip(a, axis=1)             # degree partner 5 - A

    zq = tuple(p.astype(zdtype) for p in zq)

    # Pre-flipped margin strips [left | right]: lane reflection keeps the
    # row parity and swaps column-parity partners (slot s ^ 1); re margins
    # of band A are the flipped im edges of its quad partner (and vice
    # versa) — c2q's quad reflection swaps the re/im roles.  The partner
    # permutations commute with the lane slicing, so they run on the
    # 2G-column strips, never the full planes (a full-plane flip cost
    # 0.27 ms of the 4096^2 roundtrip — r5 xprof).
    G = _MARGIN

    def edges(a):
        return jnp.concatenate([jnp.flip(a[..., :G], axis=-1),
                                jnp.flip(a[..., -G:], axis=-1)], axis=-1)

    mz = jnp.stack([edges(zq[1]), edges(zq[0]),
                    edges(zq[3]), edges(zq[2])], axis=1)
    mq = jnp.concatenate([partner(edges(imp)),
                          partner(edges(rep))], axis=1)

    # The kernel emits full-height column-parity planes (rows interleaved
    # by the MXU operator permutation), so the only wrapper relayout is
    # this single-axis lane interleave — the fast stack+reshape pattern.
    # (The r2-era 4-quarter-plane form left a combined row+column relayout
    # to XLA, which lowered at ~8 GB/s when materialised: 17 ms of the
    # 23 ms standalone 4096^2 roundtrip, found with tools/xprof.py.)
    z_e, z_o = call(*zq, rep, imp, mz, mq)
    out = jnp.stack([z_e, z_o], axis=-1).reshape((B, H, Wd))
    return out.reshape(lead + out.shape[-2:])
