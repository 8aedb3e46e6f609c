"""1-D dual-tree complex wavelet transform (forward + inverse).

Behavioral parity surface: ``/root/reference/dtcwt/numpy/transform1d.py``
(forward :26-110, inverse :112-180, c2q1d :186-196).  Follows the reference
layout convention: a 1-D vector, or a 2-D array whose *columns* are
independent signals.  Higher-rank inputs are treated as ``[..., N, C]``
batches over the leading axes.  Signal length must be even; levels >= 2 pad
to a multiple of 4 by repeating edge samples, and the inverse crops
correspondingly (:95-96, :164-166).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from dtcwt_tpu.ops import engine, fb
from dtcwt_tpu.ops.packing import q2c1d, c2q1d
from dtcwt_tpu.transforms.pyramid import Pyramid, pyramid_to_device
from dtcwt_tpu.transforms.transform2d import (
    DEFAULT_BIORT, DEFAULT_QSHIFT, normalize_biort, normalize_qshift,
    _pad_multiple4)

__all__ = ["Transform1d"]


class Transform1d:
    """An n-level 1-D DTCWT parameterised by *biort* / *qshift* wavelets."""

    def __init__(self, biort=DEFAULT_BIORT, qshift=DEFAULT_QSHIFT):
        self.biort = normalize_biort(biort)
        self.qshift = normalize_qshift(qshift)
        if len(self.biort) != 4 or len(self.qshift) != 8:
            raise ValueError("1-D transform does not use bandpass variants")
        self._fwd = jax.jit(self._forward_impl,
                            static_argnames=("nlevels", "include_scale", "ek"))
        self._inv = jax.jit(self._inverse_impl,
                            static_argnames=("ret_flat", "ek"))

    # ------------------------------------------------------------------
    def forward(self, X, nlevels: int = 3, include_scale: bool = False) -> Pyramid:
        """Forward transform of a vector / columns-of-signals array.  The
        signal axis (axis 0 for <=2-D input, axis -2 otherwise) must have
        even length."""
        X = jnp.asarray(X)
        if X.ndim == 1:
            X = X[:, None]
        axis = 0 if X.ndim <= 2 else -2
        if X.shape[axis] % 2 != 0:
            raise ValueError("Size of input X must be a multiple of 2")
        return self._fwd(X, nlevels=nlevels, include_scale=include_scale,
                         ek=engine.trace_key())

    def _forward_impl(self, X, *, nlevels: int, include_scale: bool,
                      ek=None) -> Pyramid:
        impl = lambda x: self._forward_body(x, nlevels=nlevels,
                                            include_scale=include_scale)
        if engine.use_pallas():
            from dtcwt_tpu.ops.linearize import linear_vjp
            spec = jax.ShapeDtypeStruct(X.shape, X.dtype)
            return linear_vjp(impl, spec)(X)
        return impl(X)

    def _forward_body(self, X, *, nlevels: int,
                      include_scale: bool) -> Pyramid:
        h0o, _, h1o, _ = self.biort
        h0a, h0b, _, _, h1a, h1b, _, _ = self.qshift
        axis = 0 if X.ndim <= 2 else -2

        if not jnp.issubdtype(X.dtype, jnp.inexact):
            X = X.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)

        if nlevels == 0:
            return Pyramid(X, (), () if include_scale else None)

        Yh, Yscale = [], []

        hi = fb.filter_axis(X, h1o, axis)
        lo = fb.filter_axis(X, h0o, axis)
        Yh.append(q2c1d(hi, axis))
        if include_scale:
            Yscale.append(lo)

        for _level in range(1, nlevels):
            if lo.shape[axis] % 4 != 0:
                lo = _pad_multiple4(lo, axis)
            hi = fb.dfilt_axis(lo, h1b, h1a, axis)
            lo = fb.dfilt_axis(lo, h0b, h0a, axis)
            Yh.append(q2c1d(hi, axis))
            if include_scale:
                Yscale.append(lo)

        return Pyramid(lo, tuple(Yh), tuple(Yscale) if include_scale else None)

    # ------------------------------------------------------------------
    def forward_channels(self, X, nlevels: int = 3,
                         include_scale: bool = False) -> Pyramid:
        """Forward transform of a 3-D batch of matrices whose *columns* (the
        second dimension) are the signals (reference surface:
        ``tf/transform1d.py:150-215``).  Inputs of 1 or 2 dimensions should
        use :meth:`forward`."""
        X = jnp.asarray(X)
        if X.ndim != 3:
            raise ValueError(
                "Incorrect input shape for the forward_channels method %s. "
                "For inputs of 1 or 2 dimensions, use the forward method."
                % (X.shape,))
        return self.forward(X, nlevels, include_scale)

    def inverse_channels(self, pyramid: Pyramid, gain_mask=None):
        """Inverse of :meth:`forward_channels` on a 3-D pyramid (reference
        surface: ``tf/transform1d.py:293-371``)."""
        low = jnp.asarray(pyramid.lowpass)
        if low.ndim != 3:
            raise ValueError(
                "Incorrect input shape for the inverse_channels method %s. "
                "For inputs of 1 or 2 dimensions, use the inverse method."
                % (low.shape,))
        return self.inverse(pyramid, gain_mask)

    # ------------------------------------------------------------------
    def inverse(self, pyramid: Pyramid, gain_mask=None):
        """Inverse transform.  *gain_mask* is an optional length-``nlevels``
        vector of per-level gains."""
        pyramid = pyramid_to_device(pyramid)
        lowpass = jnp.asarray(pyramid.lowpass)
        ret_flat = lowpass.ndim == 2 and lowpass.shape[-1] == 1
        gm = None if gain_mask is None else jnp.asarray(gain_mask)
        return self._inv(pyramid, gm, ret_flat=ret_flat, ek=engine.trace_key())

    def _inverse_impl(self, pyramid: Pyramid, gain_mask, *, ret_flat: bool,
                      ek=None):
        impl = lambda p: self._inverse_body(p, gain_mask, ret_flat=ret_flat)
        if engine.use_pallas():
            from dtcwt_tpu.ops.linearize import linear_vjp
            spec = jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), pyramid)
            return linear_vjp(impl, spec)(pyramid)
        return impl(pyramid)

    def _inverse_body(self, pyramid: Pyramid, gain_mask, *, ret_flat: bool):
        _, g0o, _, g1o = self.biort
        _, _, g0a, g0b, _, _, g1a, g1b = self.qshift

        Yh = pyramid.highpasses
        lo = jnp.asarray(pyramid.lowpass)
        nlevels = len(Yh)
        axis = 0 if lo.ndim <= 2 else -2
        if nlevels == 0:
            return lo

        def gained(level):
            z = Yh[level]
            if gain_mask is None:
                return z
            return z * gain_mask[level]

        for level in range(nlevels - 1, 0, -1):
            hi = c2q1d(gained(level), axis)
            lo = fb.ifilt_axis(lo, g0b, g0a, axis) + fb.ifilt_axis(hi, g1b, g1a, axis)
            if lo.shape[axis] != 2 * Yh[level - 1].shape[axis]:
                lo = jax.lax.slice_in_dim(lo, 1, lo.shape[axis] - 1, axis=axis)
            if lo.shape[axis] != 2 * Yh[level - 1].shape[axis]:
                raise ValueError("Yh sizes are not valid for the inverse"
                                 " transform")

        hi = c2q1d(gained(0), axis)
        Z = fb.filter_axis(lo, g0o, axis) + fb.filter_axis(hi, g1o, axis)
        if ret_flat:
            return Z[:, 0]
        return Z
