"""Dual-stream Pallas kernel parity tests (ops/pallas_dual.py).

The dual-stream primitives fuse one separable-tree stage: both branch
filters from one input read (``filter2``/``dfilt2``) or one summed output
from both branch inputs (``filter2_sum``/``ifilt2_sum``).  The reference has
no such ops (its 3-D tree re-reads every intermediate,
``/root/reference/dtcwt/numpy/transform3d.py:208-289``); correctness is
therefore defined against our own single-stream primitives at f64 (which are
themselves bit-parity-tested against the reference in
``test_fb_vs_reference.py``), at the usual f32 kernel bar.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from dtcwt_tpu.coeffs import biort, qshift
from dtcwt_tpu.ops import fb, pallas_dual

TOL = 1e-4

H0O, G0O, H1O, G1O = biort("near_sym_b")   # 13/19-tap: unequal lengths
Q = qshift("qshift_a")
QD = qshift("qshift_d")


def _err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    assert a.shape == b.shape, (a.shape, b.shape)
    return float(np.abs(a - b).max())


@pytest.mark.parametrize("shape", [(64, 96), (2, 64, 96), (32, 24, 128)])
@pytest.mark.parametrize("axis", [-1, -2, -3])
def test_filter2_matches_singles(shape, axis):
    if axis == -3 and len(shape) < 3:
        pytest.skip("axis -3 needs a 3-D input")
    x = np.random.RandomState(0).randn(*shape).astype(np.float32)
    xd = jnp.asarray(x, jnp.float64)
    got = pallas_dual.filter2_axis(jnp.asarray(x), H0O, H1O, axis)
    if got is None:
        # Axis shorter than the slab halo -> envelope rejection is correct.
        assert x.shape[axis] <= 16
        return
    assert _err(got[0], fb.filter_axis(xd, H0O, axis)) < TOL
    assert _err(got[1], fb.filter_axis(xd, H1O, axis)) < TOL


@pytest.mark.parametrize("shape", [(64, 96), (2, 64, 96), (32, 24, 128)])
@pytest.mark.parametrize("axis", [-1, -2, -3])
@pytest.mark.parametrize("fam", [Q, QD], ids=["qshift_a", "qshift_d"])
def test_dfilt2_matches_singles(shape, axis, fam):
    if axis == -3 and len(shape) < 3:
        pytest.skip("axis -3 needs a 3-D input")
    x = np.random.RandomState(1).randn(*shape).astype(np.float32)
    xd = jnp.asarray(x, jnp.float64)
    h0a, h0b, h1a, h1b = fam[1], fam[0], fam[5], fam[4]
    got = pallas_dual.dfilt2_axis(jnp.asarray(x), h0a, h0b, h1a, h1b, axis)
    if got is None:
        assert x.shape[axis] <= max(24, len(np.asarray(h0a)))
        return
    assert _err(got[0], fb.dfilt_axis(xd, h0a, h0b, axis)) < TOL
    assert _err(got[1], fb.dfilt_axis(xd, h1a, h1b, axis)) < TOL


@pytest.mark.parametrize("shape", [(64, 96), (2, 64, 96), (32, 24, 128)])
@pytest.mark.parametrize("axis", [-1, -2, -3])
def test_filter2_sum_matches_singles(shape, axis):
    if axis == -3 and len(shape) < 3:
        pytest.skip("axis -3 needs a 3-D input")
    rng = np.random.RandomState(2)
    a = rng.randn(*shape).astype(np.float32)
    b = rng.randn(*shape).astype(np.float32)
    ad, bd = jnp.asarray(a, jnp.float64), jnp.asarray(b, jnp.float64)
    got = pallas_dual.filter2_sum_axis(jnp.asarray(a), jnp.asarray(b),
                                       G0O, G1O, axis)
    if got is None:
        assert a.shape[axis] <= 16
        return
    ref = fb.filter_axis(ad, G0O, axis) + fb.filter_axis(bd, G1O, axis)
    assert _err(got, ref) < TOL


@pytest.mark.parametrize("shape", [(64, 96), (2, 64, 96), (32, 24, 128)])
@pytest.mark.parametrize("axis", [-1, -2, -3])
@pytest.mark.parametrize("fam", [Q, QD], ids=["qshift_a", "qshift_d"])
def test_ifilt2_sum_matches_singles(shape, axis, fam):
    if axis == -3 and len(shape) < 3:
        pytest.skip("axis -3 needs a 3-D input")
    rng = np.random.RandomState(3)
    a = rng.randn(*shape).astype(np.float32)
    b = rng.randn(*shape).astype(np.float32)
    ad, bd = jnp.asarray(a, jnp.float64), jnp.asarray(b, jnp.float64)
    g0a, g0b, g1a, g1b = fam[2], fam[3], fam[6], fam[7]
    got = pallas_dual.ifilt2_sum_axis(jnp.asarray(a), jnp.asarray(b),
                                      g0b, g0a, g1b, g1a, axis)
    if got is None:
        assert a.shape[axis] <= max(24, len(np.asarray(g0a)))
        return
    ref = (fb.ifilt_axis(ad, g0b, g0a, axis)
           + fb.ifilt_axis(bd, g1b, g1a, axis))
    assert _err(got, ref) < TOL


def test_dispatch_mixed_lengths_falls_back():
    """fb's dual dispatch degrades to single-stream ops when the four
    filters can't share one extension (mixed lengths/parities)."""
    rng = np.random.RandomState(4)
    x = rng.randn(64, 128).astype(np.float32)
    xd = jnp.asarray(x, jnp.float64)
    # dfilt2: qshift_a (10-tap) against qshift_d (18-tap)
    y0, y1 = fb.dfilt2_axis(x, (Q[1], Q[0]), (QD[5], QD[4]), -2)
    assert _err(y0, fb.dfilt_axis(xd, Q[1], Q[0], -2)) < TOL
    assert _err(y1, fb.dfilt_axis(xd, QD[5], QD[4], -2)) < TOL
    # ifilt2_sum mixed lengths
    s = fb.ifilt2_sum_axis(x, x, (Q[2], Q[3]), (QD[6], QD[7]), -2)
    ref = (fb.ifilt_axis(xd, Q[2], Q[3], -2)
           + fb.ifilt_axis(xd, QD[6], QD[7], -2))
    assert _err(s, ref) < TOL
    # filter2_sum mixed parity: output lengths differ (r vs r+1) -> error
    with pytest.raises(ValueError):
        fb.filter2_sum_axis(x, x, H0O, np.array([0.5, 0.5]), -2)


def test_small_axis_outside_envelope():
    """Axes shorter than the halo are rejected (caller falls back to XLA)."""
    x = jnp.asarray(np.random.RandomState(5).randn(12, 16, 128), jnp.float32)
    assert pallas_dual.filter2_axis(x, H0O, H1O, -3) is None


def test_fb_dual_dispatch_equals_singles_under_engines():
    """The public fb dual ops agree with composed singles on both engines."""
    from dtcwt_tpu.ops import engine
    rng = np.random.RandomState(6)
    x = rng.randn(32, 24, 128).astype(np.float32)
    for eng in ("xla", "pallas"):
        with engine.engine(eng):
            y0, y1 = fb.filter2_axis(x, H0O, H1O, -2)
            r0 = fb.filter_axis(x, H0O, -2)
            r1 = fb.filter_axis(x, H1O, -2)
            assert _err(y0, r0) < TOL and _err(y1, r1) < TOL
            s = fb.ifilt2_sum_axis(x, x, (Q[2], Q[3]), (Q[6], Q[7]), -3)
            ref = (fb.ifilt_axis(x, Q[2], Q[3], -3)
                   + fb.ifilt_axis(x, Q[6], Q[7], -3))
            assert _err(s, ref) < TOL
