"""Two-sided (H, W) stage-pair kernel parity tests (ops/pallas_hw.py).

Correctness is defined against composing the single-stream f64 primitives
stage by stage (which are bit-parity-tested against the reference in
``test_fb_vs_reference.py``), at the usual f32 kernel bar.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from dtcwt_tpu.coeffs import biort, qshift
from dtcwt_tpu.ops import fb, pallas_hw
from dtcwt_tpu.ops import engine

TOL = 1e-4

H0A, G0A, H1A, G1A = biort("near_sym_a")
H0B, G0B, H1B, G1B = biort("near_sym_b")      # 13/19-tap, unequal lengths
Q = qshift("qshift_a")
QD = qshift("qshift_d")


def _err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    assert a.shape == b.shape, (a.shape, b.shape)
    return float(np.abs(a - b).max())


@pytest.mark.parametrize("shape", [(6, 32, 48), (2, 5, 24, 64)])
@pytest.mark.parametrize("fams", [(H0A, H1A), (H0B, H1B)],
                         ids=["near_sym_a", "near_sym_b"])
def test_filter_hw22(shape, fams):
    h0, h1 = fams
    x = np.random.RandomState(0).randn(*shape).astype(np.float32)
    xd = jnp.asarray(x, jnp.float64)
    got = pallas_hw.filter_hw22(jnp.asarray(x), h0, h1)
    assert got is not None
    for j, hj in enumerate((h0, h1)):
        for k, hk in enumerate((h0, h1)):
            want = fb.filter_axis(fb.filter_axis(xd, hk, -1), hj, -2)
            assert _err(got[j][k], want) < TOL, (j, k)


@pytest.mark.parametrize("fam", [Q, QD], ids=["qshift_a", "qshift_d"])
def test_dfilt_hw22(fam):
    x = np.random.RandomState(1).randn(6, 32, 48).astype(np.float32)
    xd = jnp.asarray(x, jnp.float64)
    p0, p1 = (fam[1], fam[0]), (fam[5], fam[4])
    got = pallas_hw.dfilt_hw22(jnp.asarray(x), p0, p1)
    assert got is not None
    for j, pj in enumerate((p0, p1)):
        for k, pk in enumerate((p0, p1)):
            want = fb.dfilt_axis(fb.dfilt_axis(xd, *pk, -1), *pj, -2)
            assert _err(got[j][k], want) < TOL, (j, k)


def test_filter_sum_hw22():
    rng = np.random.RandomState(2)
    vs = [rng.randn(6, 32, 48).astype(np.float32) for _ in range(4)]
    vd = [jnp.asarray(v, jnp.float64) for v in vs]
    got = pallas_hw.filter_sum_hw22(*vs, G0A, G1A)
    assert got is not None
    want = 0
    gs = (G0A, G1A)
    for n, (j, k) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        want = want + fb.filter_axis(fb.filter_axis(vd[n], gs[k], -1),
                                     gs[j], -2)
    assert _err(got, want) < TOL


@pytest.mark.parametrize("fam", [Q, QD], ids=["qshift_a", "qshift_d"])
def test_ifilt_sum_hw22(fam):
    rng = np.random.RandomState(3)
    vs = [rng.randn(6, 16, 24).astype(np.float32) for _ in range(4)]
    vd = [jnp.asarray(v, jnp.float64) for v in vs]
    p0 = (fam[3], fam[2])   # (g0b, g0a)
    p1 = (fam[7], fam[6])
    got = pallas_hw.ifilt_sum_hw22(*vs, p0, p1)
    assert got is not None
    want = 0
    ps = (p0, p1)
    for n, (j, k) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        want = want + fb.ifilt_axis(fb.ifilt_axis(vd[n], *ps[k], -1),
                                    *ps[j], -2)
    assert _err(got, want) < TOL


def test_envelope_rejections():
    x = np.zeros((4, 32, 48), np.float32)
    # even-length level-1 filters change H/W -> rejected
    haar = np.array([1.0, 1.0]) / np.sqrt(2.0)
    assert pallas_hw.filter_hw22(x, haar, haar) is None
    # 2-D input (no depth axis)
    assert pallas_hw.filter_hw22(np.zeros((32, 48), np.float32),
                                 H0A, H1A) is None
    # beyond the operator size cap
    big = np.zeros((2, pallas_hw._MAX_C + 128, 128), np.float32)
    assert pallas_hw.filter_hw22(big, H0A, H1A) is None
    # f64 stays on the exact path
    assert pallas_hw.filter_hw22(x.astype(np.float64), H0A, H1A) is None
    # dfilt divisibility contract (H % 4)
    assert pallas_hw.dfilt_hw22(np.zeros((4, 30, 48), np.float32),
                                (Q[1], Q[0]), (Q[5], Q[4])) is None


def test_transform3d_roundtrip_under_pallas_engine():
    """End-to-end: the 3-D transform dispatches to the hw kernels under the
    fast engines and stays within the f32 bar of the XLA oracle."""
    import dtcwt_tpu as dt
    v = np.random.RandomState(4).rand(16, 32, 32).astype(np.float32)
    t3 = dt.Transform3d()
    with engine.engine("pallas"):
        p = t3.forward(v, 2)
        r = t3.inverse(p)
    with engine.engine("xla"):
        pw = t3.forward(v, 2)
        rw = t3.inverse(pw)
    for lvl, (a, b) in enumerate(zip(p.highpasses, pw.highpasses)):
        assert _err(np.abs(np.asarray(a)), np.abs(np.asarray(b))) < TOL
    assert _err(r, rw) < TOL
    assert _err(r, v) < 1e-3
