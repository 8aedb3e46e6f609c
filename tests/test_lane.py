"""Lane-axis operator-matmul parity tests (ops/lane.py).

The lane route reformulates ``axis=-1`` filtering as a right-multiplication
by an operator matrix built from the f64 semantic reference itself, so
correctness is defined against the single-stream f64 ops (which are
bit-parity-tested against the reference in ``test_fb_vs_reference.py``).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from dtcwt_tpu.coeffs import biort, qshift
from dtcwt_tpu.ops import fb, lane
from dtcwt_tpu.ops import engine

TOL = 1e-4

H0O, G0O, H1O, G1O = biort("near_sym_b")     # 13/19-tap, unequal lengths
H0A, G0A, H1A, G1A = biort("near_sym_a")     # 5/7-tap
Q = qshift("qshift_a")
QD = qshift("qshift_d")                       # 18-tap
HAAR = np.array([1.0, 1.0]) / np.sqrt(2.0)    # even-length odd-filter case


def _err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    assert a.shape == b.shape, (a.shape, b.shape)
    return float(np.abs(a - b).max())


@pytest.mark.parametrize("C", [12, 96, 128, 256, 512])
@pytest.mark.parametrize("h", [H0O, H0A, HAAR], ids=["13tap", "5tap", "haar"])
def test_filter_lane(C, h):
    x = np.random.RandomState(0).randn(24, C).astype(np.float32)
    got = lane.filter_lane(jnp.asarray(x), np.asarray(h, np.float64))
    want = fb.filter_axis(jnp.asarray(x, jnp.float64), h, -1)
    assert _err(got, want) < TOL


@pytest.mark.parametrize("C", [96, 128, 256])
def test_filter2_lane_mixed_lengths(C):
    x = np.random.RandomState(1).randn(3, 8, C).astype(np.float32)
    xd = jnp.asarray(x, jnp.float64)
    y0, y1 = lane.filter2_lane(jnp.asarray(x), np.asarray(H0O, np.float64),
                               np.asarray(H1O, np.float64))
    assert _err(y0, fb.filter_axis(xd, H0O, -1)) < TOL
    assert _err(y1, fb.filter_axis(xd, H1O, -1)) < TOL


@pytest.mark.parametrize("C", [16, 96, 256])
@pytest.mark.parametrize("fam", [Q, QD], ids=["qshift_a", "qshift_d"])
def test_dfilt_lane(C, fam):
    x = np.random.RandomState(2).randn(24, C).astype(np.float32)
    xd = jnp.asarray(x, jnp.float64)
    ha, hb = fam[1], fam[0]
    got = lane.dfilt_lane(jnp.asarray(x), np.asarray(ha, np.float64),
                          np.asarray(hb, np.float64))
    assert _err(got, fb.dfilt_axis(xd, ha, hb, -1)) < TOL
    g0, g1 = lane.dfilt2_lane(jnp.asarray(x),
                              *(np.asarray(h, np.float64)
                                for h in (fam[1], fam[0], fam[5], fam[4])))
    assert _err(g0, fb.dfilt_axis(xd, fam[1], fam[0], -1)) < TOL
    assert _err(g1, fb.dfilt_axis(xd, fam[5], fam[4], -1)) < TOL


@pytest.mark.parametrize("C", [16, 96, 256])
@pytest.mark.parametrize("fam", [Q, QD], ids=["qshift_a", "qshift_d"])
def test_ifilt_lane(C, fam):
    rng = np.random.RandomState(3)
    a = rng.randn(24, C).astype(np.float32)
    b = rng.randn(24, C).astype(np.float32)
    ad, bd = jnp.asarray(a, jnp.float64), jnp.asarray(b, jnp.float64)
    g0a, g0b, g1a, g1b = fam[2], fam[3], fam[6], fam[7]
    got = lane.ifilt_lane(jnp.asarray(a), np.asarray(g0b, np.float64),
                          np.asarray(g0a, np.float64))
    assert _err(got, fb.ifilt_axis(ad, g0b, g0a, -1)) < TOL
    s = lane.ifilt2_sum_lane(jnp.asarray(a), jnp.asarray(b),
                             *(np.asarray(h, np.float64)
                               for h in (g0b, g0a, g1b, g1a)))
    ref = (fb.ifilt_axis(ad, g0b, g0a, -1) + fb.ifilt_axis(bd, g1b, g1a, -1))
    assert _err(s, ref) < TOL


def test_filter2_sum_lane():
    rng = np.random.RandomState(4)
    a = rng.randn(2, 24, 128).astype(np.float32)
    b = rng.randn(2, 24, 128).astype(np.float32)
    got = lane.filter2_sum_lane(jnp.asarray(a), jnp.asarray(b),
                                np.asarray(G0O, np.float64),
                                np.asarray(G1O, np.float64))
    ref = (fb.filter_axis(jnp.asarray(a, jnp.float64), G0O, -1)
           + fb.filter_axis(jnp.asarray(b, jnp.float64), G1O, -1))
    assert _err(got, ref) < TOL


def test_dispatch_routes_and_envelope():
    """The fb wrappers use the lane route for minor-axis f32 work within
    the size cap, and the f64 / large-C / xla-engine paths stay put."""
    x32 = np.random.RandomState(5).randn(16, 128).astype(np.float32)
    assert lane.supported(x32)
    assert not lane.supported(x32.astype(np.float64))
    assert not lane.supported(np.zeros((16, lane._MAX_C + 128), np.float32))
    assert not lane.supported(np.zeros(128, np.float32))
    # engaged under the fast engines: wrapper output == lane output exactly
    with engine.engine("pallas"):
        got = fb.filter_axis(x32, H0A, -1)
    direct = lane.filter_lane(jnp.asarray(x32), np.asarray(H0A, np.float64))
    assert _err(got, direct) == 0.0
    # the pure-XLA engine keeps the transpose formulation (parity oracle)
    with engine.engine("xla"):
        ref = fb.filter_axis(x32, H0A, -1)
    assert _err(got, ref) < TOL


def test_gradient_through_lane_route():
    """The operator matmul is natively differentiable (no custom VJP)."""
    import jax
    x = jnp.asarray(np.random.RandomState(6).randn(16, 128), jnp.float32)
    with engine.engine("pallas"):
        g = jax.grad(lambda a: jnp.sum(fb.filter_axis(a, H0A, -1) ** 2))(x)
    with engine.engine("xla"):
        gr = jax.grad(lambda a: jnp.sum(fb.filter_axis(a, H0A, -1) ** 2))(x)
    assert _err(g, gr) < 1e-3
