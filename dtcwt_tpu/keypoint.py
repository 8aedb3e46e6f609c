"""Multiscale keypoint detection from DTCWT highpass subbands.

Behavioral parity surface: ``/root/reference/dtcwt/keypoint.py``
(find_keypoints :9-144, energy methods :146-162, _nullspace :164-202,
_kp_energy_maxima :204-260).  Energies: 'fauqueur' (geometric-mean style,
Fauqueur/Kingsbury/Anderson ICIP 2006), 'bendale' (min abs, Bendale/Triggs/
Kingsbury BMVC 2010), 'kingsbury' (cross-product of orthogonal subbands).

TPU-first design: the reference loops over every candidate maximum on the
host, running an SVD per point (``keypoint.py:204-260``).  Here the whole
detector is dense device math — 3x3 neighbourhood maxima, quadratic
sub-pixel refinement via the *closed-form* nullspace of the 2x3 gradient
system (the cross product of its rows), and ``lax.top_k`` selection — so
``find_keypoints`` with ``max_points`` set is one jit-compiled program with
no data-dependent shapes.  Only the final trim of the fixed-size result to
the true detection count happens on the host.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from dtcwt_tpu.sampling import upsample_highpass, upsample

__all__ = ["find_keypoints"]


def _keypoint_energy_fauqueur(subband, alpha, beta, scale):
    prod = jnp.prod(jnp.abs(subband), axis=2)
    return (alpha ** (scale + 1)) * jnp.power(jnp.maximum(0, prod), beta)


def _keypoint_energy_bendale(subband):
    return jnp.min(jnp.abs(subband), axis=2)


def _keypoint_energy_kingsbury(subband, kappa=1.0 / 6.0, epsilon=1e-8):
    abs_Y = jnp.abs(subband)
    A = jnp.sqrt(jnp.sum(abs_Y * abs_Y, axis=2))
    B = jnp.sum(abs_Y[:, :, :3] * abs_Y[:, :, 3:], axis=2)
    return jnp.maximum(0, B / jnp.maximum(epsilon, A) - kappa * A)


def _kp_energy_maxima_dense(X, threshold=None, refine=True):
    """Dense maps of local-maxima candidates of an energy map.

    Returns ``(mask, x_off, y_off, vals)`` — same-shape arrays where *mask*
    marks candidate maxima, *x_off*/*y_off* are the sub-pixel refinement
    offsets and *vals* the (refined) energies.  Vectorized device-side
    equivalent of the reference's host loop (``keypoint.py:204-260``): the
    2x3 gradient system's nullspace is its rows' cross product, so the
    per-point SVD disappears.
    """
    X = jnp.asarray(X)
    h, w = X.shape
    thr = (X.min() - 1) if threshold is None else jnp.asarray(threshold,
                                                              X.dtype)

    # 3x3 neighbourhood max over the same interior window the reference
    # uses (rows/cols 1 .. n-3 inclusive); everything else stays at the
    # threshold sentinel so border pixels never match.
    interior = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            v = X[1 + dy:h - 2 + dy, 1 + dx:w - 2 + dx]
            interior = v if interior is None else jnp.maximum(interior, v)
    interior = jnp.maximum(interior, thr)
    maxima = jnp.full_like(X, thr).at[1:-2, 1:-2].set(interior)
    mask = maxima == X

    if not refine:
        z = jnp.zeros_like(X)
        return mask, z, z, X

    dXdy, dXdx = jnp.gradient(X)
    dX2dxdy, dX2dx2 = jnp.gradient(dXdx)
    dX2dy2, _ = jnp.gradient(dXdy)
    a0, a1, a2 = dX2dx2, dX2dy2, dX2dxdy
    a3, a4, a5 = dXdx, dXdy, X

    # Quadratic fit f(x,y) = a0 x^2 + a1 y^2 + a2 xy + a3 x + a4 y + a5;
    # its stationary point solves the 2x3 homogeneous system
    #   [2*a0  a2  a3] [x]
    #   [ a2 2*a1  a4] [y]  = 0  with the hidden 1 as third coordinate —
    #                  [1]
    # the nullspace direction is the cross product of the two rows.
    v0 = a2 * a4 - 2.0 * a1 * a3
    v1 = a3 * a2 - 2.0 * a0 * a4
    v2 = 4.0 * a0 * a1 - a2 * a2
    safe = jnp.abs(v2) > jnp.asarray(1e-30, X.dtype)
    denom = jnp.where(safe, v2, 1.0)
    x = jnp.where(safe, v0 / denom, jnp.inf)
    y = jnp.where(safe, v1 / denom, jnp.inf)

    # Keep only fits whose maximum lies within half a pixel.
    ok = (jnp.abs(x) <= 0.5) & (jnp.abs(y) <= 0.5)
    x = jnp.where(ok, x, 0.0)
    y = jnp.where(ok, y, 0.0)
    vals = (a0 * x * x + a1 * y * y + a2 * x * y + a3 * x + a4 * y + a5)
    return mask & ok, x, y, vals


def _level_maps(kp_energy, kp_scale, threshold, refine):
    """Flatten one level's candidate maps into (vals, xs, ys, scales)."""
    mask, x_off, y_off, vals = _kp_energy_maxima_dense(
        kp_energy, threshold=threshold, refine=refine)
    h, w = kp_energy.shape
    cols, rows = jnp.meshgrid(jnp.arange(w, dtype=vals.dtype),
                              jnp.arange(h, dtype=vals.dtype))
    # Pixel (0..M-1) extent is (-0.5, M-0.5]; scaling by kp_scale maps
    # x -> kp_scale*(x+0.5) - 0.5.
    xs = (cols + x_off + 0.5) * kp_scale - 0.5
    ys = (rows + y_off + 0.5) * kp_scale - 0.5
    neg_inf = jnp.asarray(-jnp.inf, vals.dtype)
    vals = jnp.where(mask, vals, neg_inf)
    scales = jnp.full_like(vals, kp_scale)
    return (vals.ravel(), xs.ravel(), ys.ravel(), scales.ravel())


@functools.partial(jax.jit, static_argnames=(
    "method", "refine", "skip_levels", "upsample_scale", "uhp", "uke",
    "max_points"))
def _detect(hps, alpha, beta, kappa, threshold, *, method, refine,
            skip_levels, upsample_scale, uhp, uke, max_points):
    """One compiled program for the whole detector (r4 verdict item 5: the
    eager per-level dispatch cost a tunnel round trip per map on TPU).
    ``threshold=None`` participates as an empty pytree, so thresholded and
    unthresholded calls compile separately without retracing per value."""
    parts = []
    for scale, subband in enumerate(hps):
        if uhp is not None:
            subband = upsample_highpass(subband, uhp)
        if method == "fauqueur":
            e = _keypoint_energy_fauqueur(subband, alpha, beta, scale)
        elif method == "bendale":
            e = _keypoint_energy_bendale(subband)
        else:
            e = _keypoint_energy_kingsbury(subband, kappa)
        if uke is not None:
            e = upsample(e, uke)
        kp_scale = 2 ** (scale + 1 + skip_levels) / float(upsample_scale)
        parts.append(_level_maps(e, kp_scale, threshold, refine))

    vals = jnp.concatenate([p[0] for p in parts])
    xs = jnp.concatenate([p[1] for p in parts])
    ys = jnp.concatenate([p[2] for p in parts])
    scales = jnp.concatenate([p[3] for p in parts])

    if max_points is not None:
        # Fixed-size device-side selection: one top_k, then gather.
        k = min(int(max_points), vals.shape[0])
        top_vals, top_idx = lax.top_k(vals, k)
        return jnp.stack((jnp.take(xs, top_idx), jnp.take(ys, top_idx),
                          jnp.take(scales, top_idx), top_vals), axis=-1)
    return vals, xs, ys, scales


def find_keypoints(highpass_highpasses, method=None,
                   alpha=1.0, beta=0.4, kappa=1.0 / 6.0,
                   threshold=None, max_points=None,
                   upsample_keypoint_energy=None, upsample_highpasses=None,
                   refine_positions=True, skip_levels=1):
    """Find multiscale keypoints from a tuple of (NxMx6) highpass levels.

    Returns a (Px4) array of rows ``(x, y, scale, energy)`` sorted by
    decreasing energy.  See the reference docstring for parameter semantics
    (``keypoint.py:9-80``); *threshold* and *max_points* compose, and
    *skip_levels* ignores the noisiest fine scales.  When no candidate
    survives, the result is an empty ``(0, 4)`` array.
    """
    method = method or "fauqueur"
    if method not in ("fauqueur", "bendale", "kingsbury"):
        raise ValueError("Unknown method: {0}".format(method))
    hps = tuple(jnp.asarray(h) for h in highpass_highpasses[skip_levels:])
    if not hps:
        return np.zeros((0, 4))

    upsample_scale = 1
    if upsample_highpasses is not None:
        upsample_scale <<= 1
    if upsample_keypoint_energy is not None:
        upsample_scale <<= 1

    out = _detect(hps, alpha, beta, kappa, threshold, method=method,
                  refine=bool(refine_positions), skip_levels=skip_levels,
                  upsample_scale=upsample_scale, uhp=upsample_highpasses,
                  uke=upsample_keypoint_energy,
                  max_points=None if max_points is None else int(max_points))

    if max_points is not None:
        kps = np.asarray(out)
        return kps[np.isfinite(kps[:, 3])]

    # Unbounded point count: a data-dependent shape, so gather on the host
    # (still no per-point Python work — one nonzero + fancy index).
    vals, xs, ys, scales = (np.asarray(a) for a in out)
    keep = np.flatnonzero(np.isfinite(vals))
    order = keep[np.argsort(vals[keep])[::-1]]
    return np.stack((xs[order], ys[order], scales[order], vals[order]),
                    axis=-1)
