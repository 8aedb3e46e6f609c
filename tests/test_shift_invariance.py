"""Approximate shift invariance — the DTCWT's defining property.

The dual tree's quadrature pair makes subband *magnitudes* nearly invariant
to small input shifts, unlike the critically-sampled DWT whose coefficients
ring (the reference demonstrates this in ``docs/`` and it is the premise of
the registration/keypoint algorithms built on the transform).  These tests
quantify the property the way the literature does: shift a step edge by one
sample and measure the relative change of the level-3 magnitude envelope —
it must be small for the DTCWT and provably much smaller than the shift
sensitivity of the same filter bank's real (single-tree) part.
"""

import numpy as np

import dtcwt_tpu as dt
from dtcwt_tpu.utils import drawedge


def _mag_envelope(t, img, level=3):
    p = t.forward(img, nlevels=level)
    return np.abs(np.asarray(p.highpasses[level - 1]))


def test_magnitude_shift_invariance_2d():
    t = dt.Transform2d(biort="near_sym_b", qshift="qshift_b")
    img = drawedge(20.0, (64.0, 64.0), 4.0, 128).astype(np.float64)
    base = _mag_envelope(t, img)
    shifted = _mag_envelope(t, np.roll(img, 1, axis=0))
    # Compare away from the wrap-around boundary.
    b = base[2:-2, 2:-2]
    s = shifted[2:-2, 2:-2]
    rel = np.abs(s - b).max() / b.max()
    assert rel < 0.12, rel

    # The real part alone (a critically sampled tree) is far more shift
    # sensitive on the same input: the complex magnitude must beat it by a
    # wide margin.
    pr = np.real(np.asarray(t.forward(img, 3).highpasses[2]))[2:-2, 2:-2]
    ps = np.real(np.asarray(t.forward(np.roll(img, 1, axis=0), 3)
                            .highpasses[2]))[2:-2, 2:-2]
    rel_real = np.abs(ps - pr).max() / np.abs(pr).max()
    assert rel_real > 3 * rel, (rel_real, rel)


def test_magnitude_shift_invariance_1d():
    t = dt.Transform1d(biort="near_sym_b", qshift="qshift_b")
    x = np.zeros(256)
    x[100:] = 1.0                      # step
    base = np.abs(np.asarray(t.forward(x, 4).highpasses[3]))
    x2 = np.zeros(256)
    x2[101:] = 1.0                     # step shifted by one sample
    shifted = np.abs(np.asarray(t.forward(x2, 4).highpasses[3]))
    rel = np.abs(shifted - base).max() / base.max()
    assert rel < 0.1, rel
