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

* **c2q never materialises — not even in XLA.**  The kernel DMAs the
  subbands' re/im *band planes* (the one unavoidable band transpose) plus
  the four lowpass parity planes, and builds the quad images' (row-parity
  x col-parity) planes with whole-slab VPU combinations in VMEM.  The
  wrapper's only full-size work is that transpose; the r1 pipeline's
  per-plane concat + 16-way stack (two extra HBM passes) is gone.
* **Reflected lane margins ride a small side array.**  Lane reversal does
  not lower in Mosaic, so the wrapper ships a ``[.., 16, L, 2*128]`` strip
  of pre-flipped edge columns, DMA'd into the slabs' (128-aligned) margin
  lanes.  The quad combinations commute with the margin substitution
  re[A] <- flip(im[5-A]) / im[A] <- flip(re[5-A]) (the c2q quad reflection
  swaps the re/im roles of the band pair), so margins need no special
  casing in-kernel.
* **The interpolator's phase streams are plane selections.**  ``colifilt``
  reads the even/odd phases of the *extended* signal; in (rp, cp) plane
  space those are the parity planes with a static ``m2//2`` shift (and a
  plane swap in the reflected halo).  Its four output streams stay separate
  through the lane stage, so no strided access exists anywhere.
* Rows use the halo-slab DMA + mirror fill pattern; the mirror fill *swaps
  parity planes* (``P0[-u] = P1[u-1]``), applied to the computed quad
  slabs and the z slabs.
* A sequential third grid dimension stages the work: step 0 DMAs the
  inputs, builds the quad slabs and runs the column (row-direction) stage
  into scratch; steps 1-4 run the lane stage for one output row-stream
  each.

f32/bf16; identity gain only (the transform pre-scales gain_mask into
the subbands); the bandpass variants run a third synthesis stream.
Boundary crop (reference :262-268) stays in the transform.
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

__all__ = ["inv_level2"]

_MARGIN = 128            # boundary columns per side (DMA lane alignment)
_PAD = 8                 # row halo per plane (covers m2//2 + 2 for m <= 18)
_TILE_BYTES = 24 * 1024 * 1024

# band pairs per quad source: lh=(0,5), hl=(2,3), hh=(1,4)
_PAIRS = ((0, 5), (2, 3), (1, 4))
# the same pairs at their PLANE_BAND_ORDER (0,5,1,4,2,3) positions
_PAIRS_PO = ((0, 1), (4, 5), (2, 3))


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
                   g1abytes: bytes, g1bbytes: bytes, dtype_str: str,
                   g2abytes: bytes = None, g2bbytes: bytes = None,
                   pair_order: bool = False):
    """L = H/2 plane rows, C2 = W/2 plane cols (multiple of 128 on TPU).
    *g2abytes*/*g2bbytes* supply the bandpass variant's third synthesis
    pair (reference ``numpy/transform2d.py:247-258``).  With *pair_order*
    the re/im band planes arrive in the forward kernels' native
    PLANE_BAND_ORDER (0,5,1,4,2,3) instead of degree order, so the quad
    pairs sit at adjacent positions."""
    g0a = np.frombuffer(g0abytes, dtype=np.float64)
    g0b = np.frombuffer(g0bbytes, dtype=np.float64)
    g1a = np.frombuffer(g1abytes, dtype=np.float64)
    g1b = np.frombuffer(g1bbytes, dtype=np.float64)
    bp = g2abytes is not None
    g2a = np.frombuffer(g2abytes, dtype=np.float64) if bp else None
    g2b = np.frombuffer(g2bbytes, dtype=np.float64) if bp else None
    m = g0a.size
    if m % 2 or g1a.size != m:
        return None
    if bp and (g2a.size != m or g2b.size != m):
        return None
    m2 = m // 2
    if m2 // 2 + 2 > _PAD or _PAD > L:
        return None
    G = _MARGIN
    W = C2 + 2 * G
    dtype = jnp.dtype(dtype_str)
    s_half = float(np.sqrt(0.5))

    # filter parameter bundles: (a_subtaps, b_subtaps, stream plan)
    def bundle(ga, gb):
        # transform calls ifilt(x, ha=g_b, hb=g_a)
        ha, hb = gb, ga
        pos = bool(np.sum(ha * hb) > 0)
        return (_sub_taps(ha), _sub_taps(hb), _stream_plan(m2, pos))

    f0 = bundle(g0a, g0b)      # Z and hl
    f1 = bundle(g1a, g1b)      # lh (and hh in the standard families)
    f2 = bundle(g2a, g2b) if bp else None   # hh via the bp filter
    n_str = 3 if bp else 2     # stream groups: y1, y2 (, y2bp)

    temp_rows = 8 * m + 24
    budget_rows = max(_TILE_BYTES // (W * max(dtype.itemsize, 4)), 1)
    tq = None
    for t in (L, 256, 128, 96, 64, 48, 32, 16, 8):
        if t > L or L % t:
            continue
        if t % _SUBLANE:
            continue
        # 2x16 double-buffered raw + 12 quad slabs + streams + temps
        if (44 * (t + 2 * _PAD) + 8 * n_str * t
                + t * temp_rows <= budget_rows):
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
        # f32 operators: see pallas_fb._mxu_precision (bf16 matmuls broken)
        A0 = _row_matrix(f0).astype(np.float32)   # Z and hl
        A1 = _row_matrix(f1).astype(np.float32)   # lh and hh
        A2 = _row_matrix(f2).astype(np.float32) if bp else None

    def kernel(zp0, zp1, zp2, zp3, re_hbm, im_hbm, mg_hbm, *refs):
        if use_mxu:
            if bp:
                a0_ref, a1_ref, a2_ref = refs[0], refs[1], refs[2]
            else:
                a0_ref, a1_ref = refs[0], refs[1]
        out_ref, raw, qs, streams, sems = (refs[-5], refs[-4], refs[-3],
                                           refs[-2], refs[-1])
        b = pl.program_id(0)
        i = pl.program_id(1)
        k = pl.program_id(2)
        zps = (zp0, zp1, zp2, zp3)

        def run_stages(buf):
            def src_plane(src_idx, phase, cp):
                if src_idx == 0:
                    return raw[buf, 2 * phase + cp]
                return qs[4 * (src_idx - 1) + 2 * phase + cp]

            # Row-direction (column) interpolation stage: for each column
            # parity and each source pair, the four output streams.
            def row_streams(src_idx, bun, cp):
                (ae, ao), (be, bo), plan = bun
                tapsets = {("a", "e"): ae, ("a", "o"): ao,
                           ("b", "e"): be, ("b", "o"): bo}
                outs = []
                for (phase, fil, eo, off) in plan:
                    shift = sh_ev if phase == 0 else sh_od
                    plane = src_plane(src_idx, phase, cp)
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
                win = _f32win(dtype)(jnp.concatenate(
                    [src_plane(src_idx, 0, cp),        # phase-0 (rp 0)
                     src_plane(src_idx, 1, cp)],       # phase-1 (rp 1)
                    axis=0))
                y = jnp.dot(a_ref[:, :], win,
                            precision=_mxu_precision(dtype),
                            preferred_element_type=jnp.float32).astype(dtype)
                y4 = y.reshape(tq, 4, W)
                return [y4[:, t, :] for t in range(4)]

            for cp in range(2):
                if use_mxu:
                    z_s = row_streams_mxu(0, a0_ref, cp)
                    lh_s = row_streams_mxu(1, a1_ref, cp)
                    hl_s = row_streams_mxu(2, a0_ref, cp)
                    hh_s = row_streams_mxu(3, a2_ref if bp else a1_ref, cp)
                else:
                    z_s = row_streams(0, f0, cp)
                    lh_s = row_streams(1, f1, cp)
                    hl_s = row_streams(2, f0, cp)
                    hh_s = row_streams(3, f2 if bp else f1, cp)
                for t in range(4):
                    streams[0, 2 * t + cp] = z_s[t] + lh_s[t]     # y1
                    if bp:
                        streams[1, 2 * t + cp] = hl_s[t]          # y2
                        streams[2, 2 * t + cp] = hh_s[t]          # y2bp
                    else:
                        streams[1, 2 * t + cp] = hl_s[t] + hh_s[t]


        @pl.when(k == 0)
        def _():
            t = b * n_tiles + i
            total = B * n_tiles

            # Overlapped rectangular DMAs (z/re/im interiors into the
            # margin-aligned lane window + margin strips), double-buffered:
            # tile t uses raw[t % 2] and issues tile t+1's copies right
            # after its own wait so they overlap this tile's compute.
            def _dma_all(t_, buf, start: bool):
                b_ = t_ // n_tiles
                i_ = t_ % n_tiles

                def op(src_lo, nrows, dst_lo):
                    # the lowpass arrives as four separate (rp, cp) quarter
                    # planes (slot 2*rp + cp) — a chained fused level's
                    # planes pass straight through, no stack pass
                    cps = [
                        pltpu.make_async_copy(
                            zps[s].at[b_, pl.ds(src_lo, nrows), :],
                            raw.at[buf, s, pl.ds(dst_lo, nrows),
                                   pl.ds(G, C2)],
                            sems.at[buf, 5 + s])
                        for s in range(4)
                    ] + [
                        pltpu.make_async_copy(
                            re_hbm.at[b_, :, pl.ds(src_lo, nrows), :],
                            raw.at[buf, pl.ds(4, 6), pl.ds(dst_lo, nrows),
                                   pl.ds(G, C2)],
                            sems.at[buf, 1]),
                        pltpu.make_async_copy(
                            im_hbm.at[b_, :, pl.ds(src_lo, nrows), :],
                            raw.at[buf, pl.ds(10, 6), pl.ds(dst_lo, nrows),
                                   pl.ds(G, C2)],
                            sems.at[buf, 2]),
                        pltpu.make_async_copy(
                            mg_hbm.at[b_, :, pl.ds(src_lo, nrows),
                                      pl.ds(0, G)],
                            raw.at[buf, :, pl.ds(dst_lo, nrows),
                                   pl.ds(0, G)],
                            sems.at[buf, 3]),
                        pltpu.make_async_copy(
                            mg_hbm.at[b_, :, pl.ds(src_lo, nrows),
                                      pl.ds(G, G)],
                            raw.at[buf, :, pl.ds(dst_lo, nrows),
                                   pl.ds(G + C2, G)],
                            sems.at[buf, 4]),
                    ]
                    for c in cps:
                        c.start() if start else c.wait()

                if n_tiles == 1:
                    op(0, tq, _PAD)
                    return

                @pl.when(i_ == 0)
                def _():
                    op(0, tq + _PAD, _PAD)

                src0 = pl.multiple_of(i_ * tq - _PAD, _SUBLANE)

                if n_tiles > 2:
                    @pl.when(jnp.logical_and(i_ > 0, i_ < n_tiles - 1))
                    def _():
                        op(src0, tq + 2 * _PAD, 0)

                @pl.when(i_ == n_tiles - 1)
                def _():
                    op(src0, tq + _PAD, 0)

            def stage(buf):
                @pl.when(t == 0)
                def _():
                    _dma_all(t, buf, True)
                _dma_all(t, buf, False)

                @pl.when(t + 1 < total)
                def _():
                    _dma_all(t + 1, 1 - buf, True)

                # Quad slabs: whole-slab VPU combinations of the re/im band
                # planes (c2q in parity-plane space): for pair (A, B)
                #   (rp0,cp0)=s(reA+reB)  (rp0,cp1)=s(imA+imB)
                #   (rp1,cp0)=s(imA-imB)  (rp1,cp1)=s(reB-reA)
                sc = jnp.asarray(s_half, dtype)
                for src, (A, B) in enumerate(_PAIRS_PO if pair_order
                                             else _PAIRS):
                    reA, reB = raw[buf, 4 + A], raw[buf, 4 + B]
                    imA, imB = raw[buf, 10 + A], raw[buf, 10 + B]
                    qs[4 * src + 0] = (reA + reB) * sc
                    qs[4 * src + 1] = (imA + imB) * sc
                    qs[4 * src + 2] = (imA - imB) * sc
                    qs[4 * src + 3] = (reB - reA) * sc

                # Mirror fills: plane[g0 + s - _PAD] lives at slab row s; on
                # the first/last tile the halo rows are the parity-swapped
                # reflection (P0[-u] = P1[u-1], P0[L+u] = P1[L-1-u]).
                @pl.when(i == 0)
                def _():
                    for p in range(4):
                        for s in range(_PAD):
                            raw[buf, p, s, :] = raw[buf, p ^ 2,
                                                    2 * _PAD - 1 - s, :]
                    for p in range(12):
                        for s in range(_PAD):
                            qs[p, s, :] = qs[p ^ 2, 2 * _PAD - 1 - s, :]

                @pl.when(i == n_tiles - 1)
                def _():
                    for p in range(4):
                        for s in range(tq + _PAD, tq + 2 * _PAD):
                            raw[buf, p, s, :] = raw[
                                buf, p ^ 2, 2 * (tq + _PAD) - 1 - s, :]
                    for p in range(12):
                        for s in range(tq + _PAD, tq + 2 * _PAD):
                            qs[p, s, :] = qs[p ^ 2, 2 * (tq + _PAD) - 1 - s, :]

                run_stages(buf)

            @pl.when(t % 2 == 0)
            def _():
                stage(0)

            @pl.when(t % 2 == 1)
            def _():
                stage(1)

        # Lane stage: one output row-parity per grid step.  The two row
        # streams of that parity (s = rp and s = rp+2) interleave in-kernel
        # via a sublane stack, so the wrapper only interleaves lanes.
        for rp in range(2):
            @pl.when(k == rp + 1)
            def _(rp=rp):
                def lane_streams(y_idx, t, bun):
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
                            lo = G + off - shift + kk
                            sl = lax.slice_in_dim(plane, lo, lo + C2,
                                                  axis=1)
                            term = sl * jnp.asarray(tv, dtype)
                            acc = term if acc is None else acc + term
                        outs.append(acc)
                    return outs

                rows = {}
                for t in (rp, rp + 2):
                    y1_l = lane_streams(0, t, f0)
                    y2_l = lane_streams(1, t, f1)
                    if bp:
                        y3_l = lane_streams(2, t, f2)
                        rows[t] = [y1_l[s] + y2_l[s] + y3_l[s]
                                   for s in range(4)]
                    else:
                        rows[t] = [y1_l[s] + y2_l[s] for s in range(4)]
                for s in range(4):
                    out_ref[0, 0, s] = jnp.stack(
                        [rows[rp][s], rows[rp + 2][s]],
                        axis=1).reshape(2 * tq, C2)

    in_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    in_specs = [in_spec] * 7
    if use_mxu:
        a_spec = pl.BlockSpec((4 * tq, 2 * Lslab), lambda b, i, k: (0, 0),
                              memory_space=pltpu.VMEM)
        in_specs = in_specs + [a_spec] * (3 if bp else 2)
    out_spec = pl.BlockSpec(
        (1, 1, 4, 2 * tq, C2),
        lambda b, i, k: (b, jnp.maximum(k - 1, 0), 0, i, 0),
        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(B, n_tiles, 3),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, 2, 4, 2 * L, C2), dtype),
        scratch_shapes=[pltpu.VMEM((2, 16, tq + 2 * _PAD, W), dtype),
                        pltpu.VMEM((12, tq + 2 * _PAD, W), dtype),
                        pltpu.VMEM((n_str, 8, tq, W), dtype),
                        pltpu.SemaphoreType.DMA((2, 9))],
        compiler_params=_compiler_params(3),
        interpret=_interpret(),
    )
    if use_mxu:
        if bp:
            return lambda *xs: call(*xs, A0, A1, A2)
        return lambda *xs: call(*xs, A0, A1)
    return call


def inv_level2(Z, yh, g0a, g0b, g1a, g1b, planes=None, as_planes=False,
               g2a=None, g2b=None, bands=None):
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

    *bands* accepts the level's subbands as the plane-layout pair
    ``(re, im)`` — band-major ``[..., 6, H/2, W/2]`` f32 planes in
    PLANE_BAND_ORDER — in place of *yh*, skipping the band transpose (the
    wrapper's one full-size XLA pass).
    """
    g0a = np.asarray(g0a, np.float64).reshape(-1)
    g0b = np.asarray(g0b, np.float64).reshape(-1)
    g1a = np.asarray(g1a, np.float64).reshape(-1)
    g1b = np.asarray(g1b, np.float64).reshape(-1)
    bp = g2a is not None
    if bp:
        g2a = np.asarray(g2a, np.float64).reshape(-1)
        g2b = np.asarray(g2b, np.float64).reshape(-1)
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

    call = _build_ilevel2(B, L, C2, g0a.tobytes(), g0b.tobytes(),
                          g1a.tobytes(), g1b.tobytes(), str(zdtype),
                          g2a.tobytes() if bp else None,
                          g2b.tobytes() if bp else None,
                          pair_order=bands is not None)
    if call is None:
        return None

    if bands is not None:
        # Plane-layout input: the band planes arrive kernel-ready — no
        # transpose pass at all.  Margin partners sit adjacent (p ^ 1).
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

    if planes is not None:
        zq = tuple(p4)                             # (rp, cp) slot order
    else:
        ze, zo = z3[:, 0::2], z3[:, 1::2]          # single-axis splits
        zq = (ze[:, :, 0::2], ze[:, :, 1::2],
              zo[:, :, 0::2], zo[:, :, 1::2])

    # Pre-flipped margin strips [left | right], plane order [z, re, im]:
    # z margins swap cp partners; re margins of band A are the flipped im
    # edges of band 5-A (and vice versa) — c2q's quad reflection swaps the
    # re/im roles, and 5-A is the paired band under (0,5),(2,3),(1,4).
    G = _MARGIN

    def edges(a):
        return jnp.concatenate([jnp.flip(a[..., :G], axis=-1),
                                jnp.flip(a[..., -G:], axis=-1)], axis=-1)

    zsw = jnp.stack([edges(zq[1]), edges(zq[0]),
                     edges(zq[3]), edges(zq[2])], axis=1)
    # band-partner permutation applied to the 2G-col strips, not the full
    # planes (edges and partner commute; full-plane flips cost a whole
    # memory pass each — r5 xprof)
    marg = jnp.concatenate(
        [zsw, partner(edges(imp)),
         partner(edges(rep))], axis=1)             # (B, 16, L, 2G)

    # (B, 2, 4, 2L, C2): [row-parity, lane-stream, rows, lanes]; the kernel
    # already interleaved the two row streams of each parity over sublanes,
    # so image row 2r+rp, col 4j+s lives at out[:, rp, s, r, j].
    out = call(*zq, rep, imp, marg)
    if as_planes:
        # One lane interleave per (rp, cp) quarter plane.
        res = []
        for rp in (0, 1):
            for cp in (0, 1):
                p = jnp.stack([out[:, rp, cp], out[:, rp, cp + 2]], axis=-1)
                res.append(p.reshape((B, 2 * L, 2 * C2))
                            .reshape(lead + (2 * L, 2 * C2)))
        return tuple(res)
    zp = out.transpose(0, 3, 1, 4, 2).reshape(B, 4 * L, 4 * C2)
    return zp.reshape(lead + zp.shape[-2:])
