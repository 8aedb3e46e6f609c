"""Kernel-speed adjoints (vector-Jacobian products) of the 2-D transforms.

The default grad route transposes the whole XLA-engine evaluation
(:mod:`ops.linearize`), which runs ~3.5x slower than the fused Pallas
primal.  This module builds the exact adjoint out of the fused kernels
themselves, using two structural facts:

1. **The qshift level->=2 stage is exactly orthogonal** — including the
   symmetric-extension boundary handling.  Verified at matrix level
   (``||A^T A - I||_inf = 8.9e-16`` on a 16x16 stage, r5): the stage is
   square (critically sampled) and an isometry, so its adjoint IS its
   inverse, and the fused inverse kernels compute the analysis adjoint
   (and the fused forward kernels the synthesis adjoint) verbatim.

2. **The level-1 biort stage's adjoint is a zero-extension correlation
   plus a p-wide boundary fold.**  With ``A = V E`` (symmetric extension
   then valid correlation), ``A^T = E^T V^T``: the core of ``E^T V^T y``
   is the same-size correlation of ``y`` with the reversed filter under
   ZERO extension — which rides the existing from-wide-extension Pallas
   kernels — and the extension transpose folds reflected contributions
   back into a ``p``-row border, a pair of tiny triangular matrices
   applied to the edge strips.  The q2c pack is orthogonal (its real
   4x4 blocks satisfy ``M M^T = I``), so its adjoint is ``c2q``.

The reference library has no autodiff at all; this backs the framework's
own ``jax.grad`` composability claim (README).

Complex convention: JAX's transpose of ``lax.complex`` carries a
conjugation (cotangents of holomorphic-looking packers arrive
conjugated), so callers must pass ``conj(band cotangent)`` into
:func:`level1_fwd_adj` and conjugate :func:`level1_inv_adj`'s band
output — verified against ``jax.linear_transpose`` to 4e-16 (r5).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from dtcwt_tpu.ops import fb
from dtcwt_tpu.ops.packing import q2c, c2q

__all__ = ["filter_adj_axis", "level1_fwd_adj", "level1_inv_adj"]


def _border_mats(h: np.ndarray):
    """(Mf, Mb): the boundary-fold matrices of the reflect-repeat
    extension transpose.  front: xbar[t] += sum_i Mf[t, i] y[i];
    back (mirrored indices s = n-1-t, u = n-1-i): Mb[s, u]."""
    m = h.size
    p = m // 2
    revh = h[::-1]
    Mf = np.zeros((p, p))
    Mb = np.zeros((p, p))
    for t in range(p):
        for i in range(0, p - t):
            Mf[t, i] = revh[p - 1 - t - i]
    for s in range(p):
        for u in range(0, p - s):
            Mb[s, u] = revh[p + s + u + 1]
    return Mf, Mb


def _zpad(y, p: int, axis: int):
    cfg = [(0, 0, 0)] * y.ndim
    cfg[axis] = (p, p, 0)
    return lax.pad(y, jnp.asarray(0.0, y.dtype), cfg)


def _strip_apply(M: np.ndarray, strip, axis: int):
    """Contract a (p, p) matrix with *strip* along *axis* (strip extent p)."""
    Mj = jnp.asarray(M, strip.dtype)
    s = jnp.moveaxis(strip, axis, -1)
    out = jnp.tensordot(s, Mj, axes=[[-1], [1]])
    return jnp.moveaxis(out, -1, axis)


def _fold_borders(core, y, h: np.ndarray, axis: int):
    """Add the extension-transpose border fold of (y, h) onto *core*."""
    p = h.size // 2
    if p == 0:
        return core
    Mf, Mb = _border_mats(h)
    n = y.shape[axis]
    a = axis % core.ndim
    front = _strip_apply(Mf, lax.slice_in_dim(y, 0, p, axis=axis), a)
    backs = _strip_apply(Mb, jnp.flip(
        lax.slice_in_dim(y, n - p, n, axis=axis), axis=a), a)
    idx_f = [slice(None)] * core.ndim
    idx_f[a] = slice(0, p)
    idx_b = [slice(None)] * core.ndim
    idx_b[a] = slice(n - p, n)
    core = core.at[tuple(idx_f)].add(front)
    core = core.at[tuple(idx_b)].add(jnp.flip(backs, axis=a))
    return core


def _s8(*hs) -> int:
    """8-aligned zero-extension width so the from-wide-ext Pallas kernels
    engage (their halo DMAs need sublane-multiple sides; zeros are inert)."""
    p = max(h.size // 2 for h in hs)
    return -(-max(p, 1) // 8) * 8


def filter_adj_axis(y, h, axis: int):
    """Adjoint of ``fb.filter_axis(., h, axis)`` (odd-length *h*).

    core: same-size correlation of *y* with ``rev(h)`` under zero
    extension (the from-wide-ext kernels); borders: the extension
    transpose folds a ``p``-row correction onto each edge."""
    h = np.asarray(h, np.float64).reshape(-1)
    axis = axis % y.ndim
    s8 = _s8(h)
    core = fb.filter_from_wide_ext(_zpad(y, s8, axis), s8, h[::-1], axis)
    return _fold_borders(core, y, h, axis)


def filter2_sum_adj_axis(ya, yb, h0, h1, axis: int):
    """Adjoint pair merge: ``filter_adj(ya, h0) + filter_adj(yb, h1)``
    with the cores fused into one dual-stream from-ext kernel pass."""
    h0 = np.asarray(h0, np.float64).reshape(-1)
    h1 = np.asarray(h1, np.float64).reshape(-1)
    axis = axis % ya.ndim
    s8 = _s8(h0, h1)
    core = fb.filter2_sum_from_wide_ext(
        _zpad(ya, s8, axis), _zpad(yb, s8, axis), s8,
        h0[::-1], h1[::-1], axis)
    core = _fold_borders(core, ya, h0, axis)
    return _fold_borders(core, yb, h1, axis)


def level1_fwd_adj_quads(glow, lh, hl, hh, h0o, h1o):
    """Level-1 analysis adjoint from the already-unpacked quad cotangents
    (``c2q`` of the conjugated band cotangents, either layout)."""
    lo_bar = filter2_sum_adj_axis(glow, hl, h0o, h1o, -1)
    hi_bar = filter2_sum_adj_axis(lh, hh, h0o, h1o, -1)
    return filter2_sum_adj_axis(lo_bar, hi_bar, h0o, h1o, -2)


def level1_fwd_adj(glow, ybar, h0o, h1o):
    """Adjoint of the level-1 2-D analysis stage: cotangents of
    ``(lowpass, Yh[0])`` back to the input-image cotangent.

    *glow* is the ``[..., H, W]`` lowpass cotangent (the output of the
    coarser levels' adjoint chain), *ybar* the ``[..., H/2, W/2, 6]``
    complex level-1 band cotangent.  Mirrors ``transform2d._forward_body``
    level 1 with every filter transposed and q2c^T = c2q."""
    lh = c2q(ybar[..., 0], ybar[..., 5], 1.0, 1.0)
    hl = c2q(ybar[..., 2], ybar[..., 3], 1.0, 1.0)
    hh = c2q(ybar[..., 1], ybar[..., 4], 1.0, 1.0)
    return level1_fwd_adj_quads(glow, lh, hl, hh, h0o, h1o)


def filter2_adj_axis(y, h0, h1, axis: int):
    """Both filter adjoints of one cotangent — ``(filter_adj(y, h0),
    filter_adj(y, h1))`` — from a single dual-stream kernel read."""
    h0 = np.asarray(h0, np.float64).reshape(-1)
    h1 = np.asarray(h1, np.float64).reshape(-1)
    axis = axis % y.ndim
    s8 = _s8(h0, h1)
    a, b = fb.filter2_from_wide_ext(_zpad(y, s8, axis), s8,
                                    h0[::-1], h1[::-1], axis)
    return (_fold_borders(a, y, h0, axis), _fold_borders(b, y, h1, axis))


def level1_inv_adj(xbar, g0o, g1o):
    """Adjoint of the level-1 2-D synthesis stage: the reconstruction
    cotangent back to ``(lowpass cotangent, Yh[0] cotangent)``.
    Mirrors ``transform2d._inverse_body`` level 1 transposed; the c2q
    unpack's adjoint is q2c."""
    y1_bar, y2_bar = filter2_adj_axis(xbar, g0o, g1o, -1)
    z_bar, lh_bar = filter2_adj_axis(y1_bar, g0o, g1o, -2)
    hl_bar, hh_bar = filter2_adj_axis(y2_bar, g0o, g1o, -2)
    b05 = q2c(lh_bar)
    b23 = q2c(hl_bar)
    b14 = q2c(hh_bar)
    ybar = jnp.stack([b05[0], b14[0], b23[0], b23[1], b14[1], b05[1]],
                     axis=-1)
    return z_bar, ybar
