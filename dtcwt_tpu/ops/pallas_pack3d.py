"""Fused level-1 3-D kernels: depth-first tree + per-pair (H, W) MXU pack.

The level-1 3-D analysis is 8:1 redundant, so the order of the separable
stages decides how much data the expensive stages touch.  The r4 design
ran the (H, W) stages first and the depth stage last — on the EXPANDED
data — which left ~84 full-volume elementwise tap operations on the VPU
(~4.5 ms of a 256^3 forward, r5 chip bisect) plus a five-volume HBM
intermediate.  This design runs the stages in the opposite order:

``fb.filter2_axis(axis=-3)``  the depth tree stage FIRST, on the raw
                 volume (the existing dual-stream kernel: one read, both
                 branch volumes out — 12 full-volume tap ops total).

``fwd_pack_pairs``  one kernel pass over depth-slice PAIRS that applies
                 every (H, W) operator product on the MXU and packs the
                 cube2c corners in place.  Per pair: 8 left products
                 (standard row layout), 16 grouped-column right products
                 (+2 standard ones for the LLL), then the eqs. (6)-(9)
                 corner combinations.  Every corner parity is a cheap 2-D
                 extraction: the depth parity IS the slice choice, the H
                 parity a sublane split-reshape (legal and fast on 2-D
                 values), the W parity an aligned lane half of the
                 grouped-column product.  No halos, no manual slab DMA,
                 no 3-D register values anywhere; band writes leave in
                 64 KB-contiguous blocks (the r4 layout wrote 4 KB
                 chunks).

The synthesis mirrors it exactly: ``inv_unpack_pairs`` unpacks the band
planes per depth pair (c2cube combinations), merges the (H, W) stages
with grouped-input synthesis operators + the LLL's standard product, and
the depth stage runs LAST on the two branch volumes via the existing
``fb.filter2_sum_axis`` dual merge.

Reference semantics: ``/root/reference/dtcwt/numpy/transform3d.py``
(``_level1_xfm`` :208-289, ``_level1_ifm`` :385-440, ``cube2c``/``c2cube``
:532-619 — eqs. (6)-(9) of Chen & Kingsbury 2012); separable stages
commute, the f64 oracle path keeps the reference order.
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

from dtcwt_tpu.ops.pallas_fb import (_LANE, _SUBLANE, _as_taps,
                                     _compiler_params, _interpret,
                                     _mxu_precision)
from dtcwt_tpu.ops.pallas_hw import _mats, _MAX_C

__all__ = ["fwd_level1_pack", "inv_level1_pack",
           "fwd_level2_pack", "inv_level2_pack"]

# octant order of the 28 highpass directions — must match
# transform3d._OCTANTS (reference transform3d.py:278-289).  Tuples are
# (i, j, k) = branch of (D, H, W); branch 1 = highpass.
_OCTANTS = (
    (0, 1, 0),   # HLL
    (1, 0, 0),   # LHL
    (1, 1, 0),   # HHL
    (0, 0, 1),   # LLH
    (0, 1, 1),   # HLH
    (1, 0, 1),   # LHH
    (1, 1, 1),   # HHH
)


def _group_perm(n: int) -> np.ndarray:
    """Even indices first, then odd: the parity-grouping permutation."""
    return np.concatenate([np.arange(0, n, 2), np.arange(1, n, 2)])


# ---------------------------------------------------------------------------
# forward: per depth-slice pair, two-sided products + cube2c pack
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _build_pack_pairs(B: int, D: int, H: int, W: int, h0bytes: bytes,
                      h1bytes: bytes, dtype_str: str):
    (A0, A1), (B0, B1) = _mats("filter", (h0bytes,), (h1bytes,), H, W)
    pw = _group_perm(W)
    B0g, B1g = B0[:, pw], B1[:, pw]          # grouped output columns
    H2, W2 = H // 2, W // 2
    dtype = jnp.dtype(dtype_str)
    hp = _mxu_precision(dtype)
    half = 0.5

    def kernel(lo_e, lo_o, hi_e, hi_o, a0, a1, b0, b0g, b1g,
               lll_ref, re_ref, im_ref):
        slices = (lo_e, lo_o, hi_e, hi_o)    # (i-branch, slice parity c)

        # left (H-axis) products, standard row layout, shared by every
        # right product of this pair
        t = {}
        for s in range(4):
            x = slices[s][0].astype(jnp.float32)
            t[(s, 0)] = jnp.dot(a0[:, :], x, precision=hp,
                                preferred_element_type=jnp.float32)
            t[(s, 1)] = jnp.dot(a1[:, :], x, precision=hp,
                                preferred_element_type=jnp.float32)

        # LLL slices: lowpass branch, standard columns
        for c in (0, 1):
            lll_ref[0, c] = jnp.dot(t[(c, 0)], b0[:, :], precision=hp,
                                    preferred_element_type=jnp.float32
                                    ).astype(dtype)

        for n, (ib, jb, kb) in enumerate(_OCTANTS):
            b_ref = (b0g, b1g)[kb]
            # corner (depth parity c, H parity, W parity) pieces: slice
            # choice / sublane split-reshape / aligned lane half
            r = {}
            for c in (0, 1):
                y = jnp.dot(t[(2 * ib + c, jb)], b_ref[:, :], precision=hp,
                            preferred_element_type=jnp.float32)
                y4 = y.reshape(H2, 2, W)
                for hp_ in (0, 1):
                    row = y4[:, hp_, :]
                    r[(c, hp_, 0)] = row[:, :W2]
                    r[(c, hp_, 1)] = row[:, W2:]
            A = r[(0, 0, 0)]
            Bq = r[(0, 1, 0)]
            C = r[(1, 0, 0)]
            Dq = r[(1, 1, 0)]
            E = r[(0, 0, 1)]
            F = r[(0, 1, 1)]
            G = r[(1, 0, 1)]
            Hq = r[(1, 1, 1)]
            # eqs. (6)-(9) combinations (packing._cube_corner_combos)
            ag_m, ag_p = A - G, A + G
            df_p, df_m = Dq + F, Dq - F
            re_ref[4 * n + 0, 0] = ((ag_m - df_p) * half).astype(dtype)
            re_ref[4 * n + 1, 0] = ((ag_m + df_p) * half).astype(dtype)
            re_ref[4 * n + 2, 0] = ((ag_p + df_m) * half).astype(dtype)
            re_ref[4 * n + 3, 0] = ((ag_p - df_m) * half).astype(dtype)
            bh_m, bh_p = Bq - Hq, Bq + Hq
            ce_p, ce_m = C + E, E - C
            im_ref[4 * n + 0, 0] = ((bh_m + ce_p) * half).astype(dtype)
            im_ref[4 * n + 1, 0] = ((ce_p - bh_m) * half).astype(dtype)
            im_ref[4 * n + 2, 0] = ((bh_p + ce_m) * half).astype(dtype)
            im_ref[4 * n + 3, 0] = ((ce_m - bh_p) * half).astype(dtype)

    if D % 2:
        return None
    mat = lambda m: pl.BlockSpec(m.shape, lambda b, u: (0, 0),
                                 memory_space=pltpu.VMEM)
    sl_spec = lambda off: pl.BlockSpec(
        (1, H, W), (lambda off: lambda b, u: (b * D + 2 * u + off, 0, 0)
                    )(off), memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec((28, 1, H2, W2), lambda b, u: (b, u, 0, 0),
                             memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(B, D // 2),
        in_specs=[sl_spec(0), sl_spec(1), sl_spec(0), sl_spec(1),
                  mat(A0), mat(A1), mat(B0), mat(B0g), mat(B1g)],
        out_specs=(pl.BlockSpec((1, 2, H, W), lambda b, u: (b, u, 0, 0),
                                memory_space=pltpu.VMEM),
                   band_spec, band_spec),
        out_shape=(jax.ShapeDtypeStruct((B, D, H, W), dtype),
                   jax.ShapeDtypeStruct((B * 28, D // 2, H2, W2), dtype),
                   jax.ShapeDtypeStruct((B * 28, D // 2, H2, W2), dtype)),
        compiler_params=_compiler_params(2),
        interpret=_interpret(),
    )
    mats = (A0, A1, B0, B0g, B1g)  # numpy: see pallas_hw._build_hw22
    return lambda lo, hi: call(lo, lo, hi, hi,
                               *(jnp.asarray(m) for m in mats))


# ---------------------------------------------------------------------------
# inverse: per depth-slice pair, c2cube unpack + grouped (H, W) merge
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _build_unpack_pairs(B: int, D: int, H: int, W: int, g0bytes: bytes,
                        g1bytes: bytes, dtype_str: str):
    (A0, A1), (B0, B1) = _mats("filter", (g0bytes,), (g1bytes,), H, W)
    ph, pw = _group_perm(H), _group_perm(W)
    A0g, A1g = A0[:, ph], A1[:, ph]          # grouped input rows
    B0g, B1g = B0[pw, :], B1[pw, :]          # grouped input columns
    H2, W2 = H // 2, W // 2
    dtype = jnp.dtype(dtype_str)
    hp = _mxu_precision(dtype)
    half = 0.5

    # octants feeding branch i, keyed (j, k) -> octant index (None for the
    # LLL's (0, 0, 0) slot, handled as a standard-layout product)
    oct_of = {}
    for n, (ib, jb, kb) in enumerate(_OCTANTS):
        oct_of[(ib, jb, kb)] = n

    def kernel(lll, re_hbm, im_hbm, a0, a0g, a1g, b0, b0g, b1g,
               ulo_ref, uhi_ref):
        # c2cube corners per octant: NATIVELY (depth parity, H parity,
        # W parity) split — reference transform3d.py:581-619
        corners = {}
        for n in range(28 // 4):
            pr = re_hbm[4 * n + 0, 0].astype(jnp.float32)
            qr = re_hbm[4 * n + 1, 0].astype(jnp.float32)
            rr = re_hbm[4 * n + 2, 0].astype(jnp.float32)
            sr = re_hbm[4 * n + 3, 0].astype(jnp.float32)
            pi = im_hbm[4 * n + 0, 0].astype(jnp.float32)
            qi = im_hbm[4 * n + 1, 0].astype(jnp.float32)
            ri = im_hbm[4 * n + 2, 0].astype(jnp.float32)
            si = im_hbm[4 * n + 3, 0].astype(jnp.float32)
            corners[(n, 0, 0, 0)] = (pr + qr + rr + sr) * half
            corners[(n, 1, 0, 1)] = (-pr - qr + rr + sr) * half
            corners[(n, 1, 1, 0)] = (-pr + qr + rr - sr) * half
            corners[(n, 0, 1, 1)] = (-pr + qr - rr + sr) * half
            corners[(n, 0, 1, 0)] = (pi - qi + ri - si) * half
            corners[(n, 1, 1, 1)] = (-pi + qi + ri - si) * half
            corners[(n, 1, 0, 0)] = (pi + qi - ri - si) * half
            corners[(n, 0, 0, 1)] = (pi + qi + ri + si) * half

        for i, o_ref in ((0, ulo_ref), (1, uhi_ref)):
            for c in (0, 1):
                # LLL contribution (branch 0 only has it at (j, k) = (0,0))
                acc = None
                if i == 0:
                    tl = jnp.dot(a0[:, :], lll[0, c].astype(jnp.float32),
                                 precision=hp,
                                 preferred_element_type=jnp.float32)
                    acc = jnp.dot(tl, b0[:, :], precision=hp,
                                  preferred_element_type=jnp.float32)
                for j, a_ref in ((0, a0g), (1, a1g)):
                    inner = None
                    for kw, b_ref in ((0, b0g), (1, b1g)):
                        if (i, j, kw) == (0, 0, 0):
                            continue
                        n = oct_of[(i, j, kw)]
                        # grouped (H, W) layout: [He ; Ho] x [We | Wo]
                        y = jnp.concatenate(
                            [jnp.concatenate([corners[(n, c, 0, 0)],
                                              corners[(n, c, 0, 1)]],
                                             axis=1),
                             jnp.concatenate([corners[(n, c, 1, 0)],
                                              corners[(n, c, 1, 1)]],
                                             axis=1)], axis=0)
                        term = jnp.dot(y, b_ref[:, :], precision=hp,
                                       preferred_element_type=jnp.float32)
                        inner = term if inner is None else inner + term
                    # one shared left product per j over the kw-sum
                    term = jnp.dot(a_ref[:, :], inner, precision=hp,
                                   preferred_element_type=jnp.float32)
                    acc = term if acc is None else acc + term
                o_ref[0, c] = acc.astype(dtype)

    if D % 2:
        return None
    mat = lambda m: pl.BlockSpec(m.shape, lambda b, u: (0, 0),
                                 memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec((28, 1, H2, W2), lambda b, u: (b, u, 0, 0),
                             memory_space=pltpu.VMEM)
    pair_spec = pl.BlockSpec((1, 2, H, W), lambda b, u: (b, u, 0, 0),
                             memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(B, D // 2),
        in_specs=[pair_spec, band_spec, band_spec,
                  mat(A0), mat(A0g), mat(A1g), mat(B0), mat(B0g), mat(B1g)],
        out_specs=(pair_spec, pair_spec),
        out_shape=(jax.ShapeDtypeStruct((B, D, H, W), dtype),) * 2,
        compiler_params=_compiler_params(2),
        interpret=_interpret(),
    )
    mats = (A0, A0g, A1g, B0, B0g, B1g)  # numpy: see pallas_hw._build_hw22
    return lambda lll, re, im: call(lll, re, im,
                                    *(jnp.asarray(m) for m in mats))


# ---------------------------------------------------------------------------
# level >= 2 (qshift) twins: decimating analysis / interpolating synthesis.
# Same pair structure — the depth stage (fb dual dfilt/ifilt kernels) runs
# first on analysis / last on synthesis, and one kernel per decimated
# depth-slice pair owns every (H, W) operator product + the cube2c pack.
# The only new wrinkle: at the flagship 256^3 the band grids are 64 lanes
# wide, and 64-lane out blocks write at ~1 GB/s (r5 chip probe), so bands
# move through HBM LANE-PAIRED — rows hold band pairs (4n+2h+p at row
# 2n+h, lane half p) — and one cheap XLA pass splits/merges the public
# band-major layout in the wrapper.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _build_pack_pairs2(B: int, D: int, H: int, W: int, habytes: bytes,
                       hbbytes: bytes, h1abytes: bytes, h1bbytes: bytes,
                       dtype_str: str):
    """D = decimated depth (input volumes are the depth-stage outputs at
    [B*D, H, W]); bands decimate H, W by 2 in-kernel via the dfilt
    operators."""
    (A0, A1), (B0, B1) = _mats("dfilt", (habytes, hbbytes),
                               (h1abytes, h1bbytes), H, W)
    H2, W2 = H // 2, W // 2
    H4, W4 = H // 4, W // 4
    # per-output-column-parity right operators: (W, W/4) each — corner W
    # parity without lane deinterleaves
    Bsp = tuple((Bk[:, 0::2], Bk[:, 1::2]) for Bk in (B0, B1))
    dtype = jnp.dtype(dtype_str)
    hp = _mxu_precision(dtype)
    half = 0.5

    def kernel(lo_e, lo_o, hi_e, hi_o, a0, a1, b0, bpe0, bpo0, bpe1, bpo1,
               lll_ref, re_ref, im_ref):
        slices = (lo_e, lo_o, hi_e, hi_o)
        bsp = ((bpe0, bpo0), (bpe1, bpo1))
        t = {}
        for s in range(4):
            x = slices[s][0].astype(jnp.float32)
            t[(s, 0)] = jnp.dot(a0[:, :], x, precision=hp,
                                preferred_element_type=jnp.float32)
            t[(s, 1)] = jnp.dot(a1[:, :], x, precision=hp,
                                preferred_element_type=jnp.float32)
        for c in (0, 1):
            lll_ref[0, c] = jnp.dot(t[(c, 0)], b0[:, :], precision=hp,
                                    preferred_element_type=jnp.float32
                                    ).astype(dtype)
        for n, (ib, jb, kb) in enumerate(_OCTANTS):
            r = {}
            for c in (0, 1):
                for wp in (0, 1):
                    y = jnp.dot(t[(2 * ib + c, jb)], bsp[kb][wp][:, :],
                                precision=hp,
                                preferred_element_type=jnp.float32)
                    y4 = y.reshape(H4, 2, W4)
                    r[(c, 0, wp)] = y4[:, 0, :]
                    r[(c, 1, wp)] = y4[:, 1, :]
            A = r[(0, 0, 0)]
            Bq = r[(0, 1, 0)]
            C = r[(1, 0, 0)]
            Dq = r[(1, 1, 0)]
            E = r[(0, 0, 1)]
            F = r[(0, 1, 1)]
            G = r[(1, 0, 1)]
            Hq = r[(1, 1, 1)]
            ag_m, ag_p = A - G, A + G
            df_p, df_m = Dq + F, Dq - F
            res = ((ag_m - df_p) * half, (ag_m + df_p) * half,
                   (ag_p + df_m) * half, (ag_p - df_m) * half)
            bh_m, bh_p = Bq - Hq, Bq + Hq
            ce_p, ce_m = C + E, E - C
            ims = ((bh_m + ce_p) * half, (ce_p - bh_m) * half,
                   (bh_p + ce_m) * half, (ce_m - bh_p) * half)
            # partial-lane ref stores: Mosaic rejects lane-concat of
            # offset-carrying sub-tile pieces ("offset mismatch on
            # non-concat dimension"), but sub-range stores lower fine
            for h_ in (0, 1):
                for p_ in (0, 1):
                    re_ref[2 * n + h_, 0, :, p_ * W4:(p_ + 1) * W4] = (
                        res[2 * h_ + p_].astype(dtype))
                    im_ref[2 * n + h_, 0, :, p_ * W4:(p_ + 1) * W4] = (
                        ims[2 * h_ + p_].astype(dtype))

    if D % 2:
        return None
    mat = lambda m: pl.BlockSpec(m.shape, lambda b, u: (0, 0),
                                 memory_space=pltpu.VMEM)
    sl_spec = lambda off: pl.BlockSpec(
        (1, H, W), (lambda off: lambda b, u: (b * D + 2 * u + off, 0, 0)
                    )(off), memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec((14, 1, H4, W2), lambda b, u: (b, u, 0, 0),
                             memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(B, D // 2),
        in_specs=[sl_spec(0), sl_spec(1), sl_spec(0), sl_spec(1),
                  mat(A0), mat(A1), mat(B0),
                  mat(Bsp[0][0]), mat(Bsp[0][1]),
                  mat(Bsp[1][0]), mat(Bsp[1][1])],
        out_specs=(pl.BlockSpec((1, 2, H2, W2), lambda b, u: (b, u, 0, 0),
                                memory_space=pltpu.VMEM),
                   band_spec, band_spec),
        out_shape=(jax.ShapeDtypeStruct((B, D, H2, W2), dtype),
                   jax.ShapeDtypeStruct((B * 14, D // 2, H4, W2), dtype),
                   jax.ShapeDtypeStruct((B * 14, D // 2, H4, W2), dtype)),
        compiler_params=_compiler_params(2),
        interpret=_interpret(),
    )
    mats = (A0, A1, B0, Bsp[0][0], Bsp[0][1], Bsp[1][0], Bsp[1][1])
    return lambda lo, hi: call(lo, lo, hi, hi,
                               *(jnp.asarray(m) for m in mats))


@functools.lru_cache(maxsize=None)
def _build_unpack_pairs2(B: int, D: int, H: int, W: int, gabytes: bytes,
                         gbbytes: bytes, g1abytes: bytes, g1bbytes: bytes,
                         dtype_str: str):
    """D = the level's decimated depth; H, W the RECONSTRUCTED extents
    (the subband grids are H/4, W/4; the outputs U_i are [B, D, H, W])."""
    H2, W2 = H // 2, W // 2
    H4, W4 = H // 4, W // 4
    (A0, A1), (B0, B1) = _mats("ifilt", (gabytes, gbbytes),
                               (g1abytes, g1bbytes), H2, W2)
    ph, pw = _group_perm(H2), _group_perm(W2)
    A0g, A1g = A0[:, ph], A1[:, ph]
    B0g, B1g = B0[pw, :], B1[pw, :]
    dtype = jnp.dtype(dtype_str)
    hp = _mxu_precision(dtype)
    half = 0.5

    oct_of = {}
    for n, (ib, jb, kb) in enumerate(_OCTANTS):
        oct_of[(ib, jb, kb)] = n

    def kernel(lll, re_hbm, im_hbm, a0, a0g, a1g, b0, b0g, b1g,
               ulo_ref, uhi_ref, ygrp):
        def band(ref, idx):
            # lane-paired input: band 4n+m at row 2n + m//2, half m%2
            n, m = idx // 4, idx % 4
            v = ref[2 * n + m // 2, 0].astype(jnp.float32)
            return v[:, :W4] if m % 2 == 0 else v[:, W4:]

        corners = {}
        for n in range(7):
            pr, qr, rr, sr = (band(re_hbm, 4 * n + m) for m in range(4))
            pi, qi, ri, si = (band(im_hbm, 4 * n + m) for m in range(4))
            corners[(n, 0, 0, 0)] = (pr + qr + rr + sr) * half
            corners[(n, 1, 0, 1)] = (-pr - qr + rr + sr) * half
            corners[(n, 1, 1, 0)] = (-pr + qr + rr - sr) * half
            corners[(n, 0, 1, 1)] = (-pr + qr - rr + sr) * half
            corners[(n, 0, 1, 0)] = (pi - qi + ri - si) * half
            corners[(n, 1, 1, 1)] = (-pi + qi + ri - si) * half
            corners[(n, 1, 0, 0)] = (pi + qi - ri - si) * half
            corners[(n, 0, 0, 1)] = (pi + qi + ri + si) * half

        for i, o_ref in ((0, ulo_ref), (1, uhi_ref)):
            for c in (0, 1):
                acc = None
                if i == 0:
                    tl = jnp.dot(a0[:, :], lll[0, c].astype(jnp.float32),
                                 precision=hp,
                                 preferred_element_type=jnp.float32)
                    acc = jnp.dot(tl, b0[:, :], precision=hp,
                                  preferred_element_type=jnp.float32)
                for j, a_ref in ((0, a0g), (1, a1g)):
                    inner = None
                    for kw, b_ref in ((0, b0g), (1, b1g)):
                        if (i, j, kw) == (0, 0, 0):
                            continue
                        n = oct_of[(i, j, kw)]
                        # grouped (H, W) layout: [He ; Ho] x [We | Wo],
                        # assembled via scratch quadrant stores (see the
                        # forward: lane-concat of offset pieces rejects)
                        for hp_ in (0, 1):
                            for wp in (0, 1):
                                ygrp[hp_ * H4:(hp_ + 1) * H4,
                                     wp * W4:(wp + 1) * W4] = (
                                    corners[(n, c, hp_, wp)])
                        term = jnp.dot(ygrp[...], b_ref[:, :], precision=hp,
                                       preferred_element_type=jnp.float32)
                        inner = term if inner is None else inner + term
                    term = jnp.dot(a_ref[:, :], inner, precision=hp,
                                   preferred_element_type=jnp.float32)
                    acc = term if acc is None else acc + term
                o_ref[0, c] = acc.astype(dtype)

    if D % 2:
        return None
    mat = lambda m: pl.BlockSpec(m.shape, lambda b, u: (0, 0),
                                 memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec((14, 1, H4, W2), lambda b, u: (b, u, 0, 0),
                             memory_space=pltpu.VMEM)
    lll_spec = pl.BlockSpec((1, 2, H2, W2), lambda b, u: (b, u, 0, 0),
                            memory_space=pltpu.VMEM)
    pair_spec = pl.BlockSpec((1, 2, H, W), lambda b, u: (b, u, 0, 0),
                             memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(B, D // 2),
        in_specs=[lll_spec, band_spec, band_spec,
                  mat(A0), mat(A0g), mat(A1g), mat(B0), mat(B0g), mat(B1g)],
        out_specs=(pair_spec, pair_spec),
        out_shape=(jax.ShapeDtypeStruct((B, D, H, W), dtype),) * 2,
        scratch_shapes=[pltpu.VMEM((H2, W2), jnp.float32)],
        compiler_params=_compiler_params(2),
        interpret=_interpret(),
    )
    mats = (A0, A0g, A1g, B0, B0g, B1g)
    return lambda lll, re, im: call(lll, re, im,
                                    *(jnp.asarray(m) for m in mats))


def _pair_bands(re, B, D4, H4, W4):
    """[B, 28, D/4, H/4, W/4] -> [B*14, D/4, H/4, W/2] lane-paired (band
    4n+m at row 2n + m//2, lane half m%2) — one fused XLA pass."""
    r6 = re.reshape(B, 14, 2, D4, H4, W4)
    return jnp.concatenate([r6[:, :, 0], r6[:, :, 1]],
                           axis=-1).reshape(B * 14, D4, H4, 2 * W4)


def _unpair_bands(re2, B, D4, H4, W4):
    """Inverse of :func:`_pair_bands`."""
    r = re2.reshape(B, 14, D4, H4, 2 * W4)
    return jnp.stack([r[..., :W4], r[..., W4:]],
                     axis=2).reshape(B, 28, D4, H4, W4)


def fwd_level2_pack(X, pair0, pair1, as_planes: bool = True
                    ) -> Optional[Tuple[jnp.ndarray, object]]:
    """Fused level->=2 3-D forward: ``X [..., D, H, W]`` real f32 (already
    padded to the ext_mode contract by the transform) -> ``(lll
    [..., D/2, H/2, W/2], (re, im) [..., 28, D/4, H/4, W/4])`` band-major
    planes, or band-minor complex with ``as_planes=False``.  *pair0*/
    *pair1* follow the transform's dfilt call order ``(h0b, h0a)`` /
    ``(h1b, h1a)``.  None outside the kernel envelope."""
    from dtcwt_tpu.ops import fb
    ha, hb = (_as_taps(h) for h in pair0)
    h1a, h1b = (_as_taps(h) for h in pair1)
    if not (ha.size == hb.size == h1a.size == h1b.size) or ha.size % 2:
        return None
    if jnp.ndim(X) < 3 or jnp.result_type(X) != jnp.float32:
        return None
    D, H, W = X.shape[-3], X.shape[-2], X.shape[-1]
    if D % 4 or H % 4 or W % 4 or min(D, H, W) < 4:
        return None
    if H > _MAX_C or W > _MAX_C:
        return None
    if not _interpret():
        if H % (4 * _SUBLANE) or (W // 2) % _LANE or (W // 4) % 64:
            return None
    lead = X.shape[:-3]
    x4 = X.reshape((-1, D, H, W))
    B = x4.shape[0]
    pack = _build_pack_pairs2(B, D // 2, H, W, ha.tobytes(), hb.tobytes(),
                              h1a.tobytes(), h1b.tobytes(), str(x4.dtype))
    if pack is None:
        return None
    lo, hi = fb.dfilt2_axis(x4, (ha, hb), (h1a, h1b), -3)
    lll, re2, im2 = pack(lo.reshape(B * (D // 2), H, W),
                         hi.reshape(B * (D // 2), H, W))
    D4, H4, W4 = D // 4, H // 4, W // 4
    re = _unpair_bands(re2, B, D4, H4, W4)
    im = _unpair_bands(im2, B, D4, H4, W4)
    lll = lll.reshape(lead + (D // 2, H // 2, W // 2))
    re = re.reshape(lead + (28, D4, H4, W4))
    im = im.reshape(lead + (28, D4, H4, W4))
    if as_planes:
        return lll, (re, im)
    z = lax.complex(re, im)
    bands = jnp.stack([z[..., n, :, :, :] for n in range(28)], axis=-1)
    return lll, bands


def inv_level2_pack(lll, re, im, pair0, pair1) -> Optional[jnp.ndarray]:
    """Fused level->=2 3-D inverse: the level lowpass ``[..., D, H, W]``
    and band-major plane pairs ``[..., 28, D/2, H/2, W/2]`` back to the
    (uncropped) ``[..., 2D, 2H, 2W]`` volume.  *pair0*/*pair1* follow the
    transform's ifilt call order ``(g0b, g0a)`` / ``(g1b, g1a)``.  None
    outside the kernel envelope."""
    from dtcwt_tpu.ops import fb
    ga, gb = (_as_taps(h) for h in pair0)
    g1a, g1b = (_as_taps(h) for h in pair1)
    if not (ga.size == gb.size == g1a.size == g1b.size) or ga.size % 2:
        return None
    if jnp.ndim(lll) < 3 or jnp.result_type(lll) != jnp.float32:
        return None
    if jnp.result_type(re) != jnp.float32:
        return None
    if im.shape != re.shape or jnp.result_type(im) != jnp.float32:
        return None
    D, H, W = lll.shape[-3], lll.shape[-2], lll.shape[-1]
    if re.shape[-4:] != (28, D // 2, H // 2, W // 2):
        return None
    if D % 2 or H % 2 or W % 2 or min(D, H, W) < 2:
        return None
    if 2 * H > _MAX_C or 2 * W > _MAX_C:
        return None
    if not _interpret():
        if H % (2 * _SUBLANE) or W % _LANE or (W // 2) % 64:
            return None
    lead = lll.shape[:-3]
    l4 = lll.reshape((-1, D, H, W))
    B = l4.shape[0]
    unpack = _build_unpack_pairs2(B, D, 2 * H, 2 * W, ga.tobytes(),
                                  gb.tobytes(), g1a.tobytes(),
                                  g1b.tobytes(), str(l4.dtype))
    if unpack is None:
        return None
    D2, H2, W2 = D // 2, H // 2, W // 2
    re2 = _pair_bands(re.reshape((B, 28, D2, H2, W2)), B, D2, H2, W2)
    im2 = _pair_bands(im.reshape((B, 28, D2, H2, W2)), B, D2, H2, W2)
    ulo, uhi = unpack(l4, re2, im2)
    y = fb.ifilt2_sum_axis(ulo, uhi, (ga, gb), (g1a, g1b), -3)
    return y.reshape(lead + (2 * D, 2 * H, 2 * W))


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------

def _envelope3(D: int, H: int, W: int, pmax: int) -> bool:
    if D % 2 or H % 2 or W % 2 or D < 2 * pmax or min(H, W) < 2 * pmax:
        return False
    if H > _MAX_C or W > _MAX_C:
        return False
    if not _interpret():
        if H % (2 * _SUBLANE) or W % (2 * _LANE):
            return False
    return True


def fwd_level1_pack(X, h0o, h1o, as_planes: bool = True
                    ) -> Optional[Tuple[jnp.ndarray, object]]:
    """Fused level-1 3-D forward: ``X [..., D, H, W]`` real f32 ->
    ``(lll [..., D, H, W], (re, im))`` band-major plane pairs
    ``[..., 28, D/2, H/2, W/2]`` in the reference octant order, or the
    complex band-minor level when ``as_planes=False``.  None outside the
    kernel envelope (caller falls back to the unfused path)."""
    from dtcwt_tpu.ops import fb
    h0 = _as_taps(h0o)
    h1 = _as_taps(h1o)
    if h0.size % 2 == 0 or h1.size % 2 == 0:
        return None
    if jnp.ndim(X) < 3 or jnp.result_type(X) != jnp.float32:
        return None
    D, H, W = X.shape[-3], X.shape[-2], X.shape[-1]
    pmax = max(h0.size // 2, h1.size // 2)
    if not _envelope3(D, H, W, pmax):
        return None
    lead = X.shape[:-3]
    x4 = X.reshape((-1, D, H, W))
    B = x4.shape[0]
    pack = _build_pack_pairs(B, D, H, W, h0.tobytes(), h1.tobytes(),
                             str(x4.dtype))
    if pack is None:
        return None
    # depth tree stage FIRST, on the raw volume (dual-stream kernel)
    lo, hi = fb.filter2_axis(x4, h0, h1, -3)
    lll, re, im = pack(lo.reshape(B * D, H, W), hi.reshape(B * D, H, W))
    lll = lll.reshape(lead + (D, H, W))
    re = re.reshape(lead + (28, D // 2, H // 2, W // 2))
    im = im.reshape(lead + (28, D // 2, H // 2, W // 2))
    if as_planes:
        return lll, (re, im)
    z = lax.complex(re, im)
    # band-major -> band-minor via static slices + stack (one XLA concat
    # pass; an index-array permutation would lower to a gather)
    bands = jnp.stack([z[..., n, :, :, :] for n in range(28)], axis=-1)
    return lll, bands


def inv_level1_pack(lll, re, im, g0o, g1o) -> Optional[jnp.ndarray]:
    """Fused level-1 3-D inverse: the level lowpass ``[..., D, H, W]`` and
    band-major plane pairs ``[..., 28, D/2, H/2, W/2]`` back to the
    reconstructed volume.  None outside the kernel envelope."""
    from dtcwt_tpu.ops import fb
    g0 = _as_taps(g0o)
    g1 = _as_taps(g1o)
    if g0.size % 2 == 0 or g1.size % 2 == 0:
        return None
    if jnp.ndim(lll) < 3 or jnp.result_type(lll) != jnp.float32:
        return None
    if jnp.result_type(re) != jnp.float32:
        return None
    if im.shape != re.shape or jnp.result_type(im) != jnp.float32:
        return None
    D, H, W = lll.shape[-3], lll.shape[-2], lll.shape[-1]
    if re.shape[-4:] != (28, D // 2, H // 2, W // 2):
        return None
    pmax = max(g0.size // 2, g1.size // 2)
    if not _envelope3(D, H, W, pmax):
        return None
    lead = lll.shape[:-3]
    l4 = lll.reshape((-1, D, H, W))
    B = l4.shape[0]
    unpack = _build_unpack_pairs(B, D, H, W, g0.tobytes(), g1.tobytes(),
                                 str(l4.dtype))
    if unpack is None:
        return None
    re4 = re.reshape((B * 28,) + re.shape[-3:])
    im4 = im.reshape((B * 28,) + im.shape[-3:])
    ulo, uhi = unpack(l4, re4, im4)
    # depth merge LAST, on the two branch volumes (dual-sum kernel)
    y = fb.filter2_sum_axis(ulo, uhi, g0, g1, -3)
    return y.reshape(lead + (D, H, W))
