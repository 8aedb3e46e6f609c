"""Multiscale keypoint detection from DTCWT highpass subbands.

Behavioral parity surface: ``/root/reference/dtcwt/keypoint.py``
(find_keypoints :9-144, energy methods :146-162, _nullspace :164-202,
_kp_energy_maxima :204-260).  Energies: 'fauqueur' (geometric-mean style,
Fauqueur/Kingsbury/Anderson ICIP 2006), 'bendale' (min abs, Bendale/Triggs/
Kingsbury BMVC 2010), 'kingsbury' (cross-product of orthogonal subbands).

Split of labour on TPU: the dense per-pixel energy maps (and optional
upsampling) are jnp/device computations; maxima extraction and sub-pixel
quadratic refinement are sparse, data-dependent-size operations and run
host-side on the (small) candidate set.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

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


def find_keypoints(highpass_highpasses, method=None,
                   alpha=1.0, beta=0.4, kappa=1.0 / 6.0,
                   threshold=None, max_points=None,
                   upsample_keypoint_energy=None, upsample_highpasses=None,
                   refine_positions=True, skip_levels=1):
    """Find multiscale keypoints from a tuple of (NxMx6) highpass levels.

    Returns a (Px4) array of rows ``(x, y, scale, energy)`` sorted by
    decreasing energy.  See the reference docstring for parameter semantics
    (``keypoint.py:9-80``); *threshold* and *max_points* compose, and
    *skip_levels* ignores the noisiest fine scales.
    """
    method = method or "fauqueur"
    highpass_highpasses = highpass_highpasses[skip_levels:]

    upsample_scale = 1
    if upsample_highpasses is not None:
        upsample_scale <<= 1
    if upsample_keypoint_energy is not None:
        upsample_scale <<= 1

    kp_energies = []
    for scale, subband in enumerate(highpass_highpasses):
        subband = jnp.asarray(subband)
        if upsample_highpasses is not None:
            subband = upsample_highpass(subband, upsample_highpasses)
        if method == "fauqueur":
            e = _keypoint_energy_fauqueur(subband, alpha, beta, scale)
        elif method == "bendale":
            e = _keypoint_energy_bendale(subband)
        elif method == "kingsbury":
            e = _keypoint_energy_kingsbury(subband, kappa)
        else:
            raise ValueError("Unknown method: {0}".format(method))
        if upsample_keypoint_energy is not None:
            e = upsample(e, upsample_keypoint_energy)
        kp_energies.append(np.asarray(e))

    kps = None
    for level_idx, kp_energy in enumerate(kp_energies):
        kp_scale = 2 ** (level_idx + 1 + skip_levels) / float(upsample_scale)
        kp_rows, kp_cols, kp_vals = _kp_energy_maxima(
            kp_energy, threshold=threshold, refine=refine_positions)
        # Pixel (0..M-1) extent is (-0.5, M-0.5]; scaling by kp_scale maps
        # x -> kp_scale*(x+0.5) - 0.5.
        level_kps = np.array((
            (kp_cols + 0.5) * kp_scale - 0.5,
            (kp_rows + 0.5) * kp_scale - 0.5,
            kp_scale * np.ones(kp_cols.shape[0]),
            kp_vals)).T
        kps = level_kps if kps is None else np.vstack((kps, level_kps))

    kps = kps[np.argsort(kps[:, 3])[::-1], :]
    if max_points is not None:
        kps = kps[:max_points]
    return kps


def _nullspace(A, atol=1e-13, rtol=0):
    """SVD-based approximate nullspace basis of a small matrix."""
    A = np.atleast_2d(A)
    _, s, vh = np.linalg.svd(A)
    tol = max(atol, rtol * s[0])
    nnz = int((s >= tol).sum())
    return vh[nnz:].conj().T


def _kp_energy_maxima(X, threshold=None, refine=True):
    """Local maxima of an energy map, optionally refined to sub-pixel
    accuracy by a quadratic fit solved via the nullspace of the gradient
    system (reference: keypoint.py:204-260)."""
    X = np.asarray(X)
    if threshold is None:
        threshold = X.min() - 1

    maxima = np.ones_like(X) * threshold
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            maxima[1:-2, 1:-2] = np.maximum(
                maxima[1:-2, 1:-2],
                X[1 + dy:X.shape[0] - 2 + dy, 1 + dx:X.shape[1] - 2 + dx])

    lm_rows, lm_cols = np.nonzero(maxima == X)

    if refine:
        dXdy, dXdx = np.gradient(X)
        dX2dxdy, dX2dx2 = np.gradient(dXdx)
        dX2dy2, _ = np.gradient(dXdy)
        a_im = np.dstack((dX2dx2, dX2dy2, dX2dxdy, dXdx, dXdy, X))

    vals, rows, cols = [], [], []
    for r, c in zip(lm_rows, lm_cols):
        if refine:
            a = a_im[r, c, :]
            A = np.array(((2 * a[0], a[2], a[3]), (a[2], 2 * a[1], a[4])))
            ns = _nullspace(A)
            if ns.shape[1] == 0:
                continue
            v = ns[:, 0]
            v = v / v[2]
            # Keep only fits whose maximum lies within half a pixel.
            if np.any(np.abs(v[:2]) > 0.5):
                continue
            x, y = v[:2]
            vals.append(a[0] * x * x + a[1] * y * y + a[2] * x * y
                        + a[3] * x + a[4] * y + a[5])
        else:
            x, y = 0, 0
            vals.append(X[r, c])
        rows.append(r + y)
        cols.append(c + x)

    return np.array(rows), np.array(cols), np.array(vals)
