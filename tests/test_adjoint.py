"""Kernel-speed adjoint (ops/adjoint.py) == XLA linear transpose.

The custom backward passes are exact adjoints: the qshift stage is
orthogonal to machine precision (so its adjoint is the fused inverse /
forward stage verbatim) and level 1 gets its explicit zero-extension +
border-fold adjoint.  These tests pin both against
``jax.linear_transpose`` of the XLA-engine evaluation.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import dtcwt_tpu as dt
from dtcwt_tpu import Pyramid
from dtcwt_tpu.ops import engine

RNG = np.random.RandomState(11)
TOL = 2e-5


def _rand_cot(p):
    Yh = tuple(jnp.asarray(RNG.randn(*h.shape) + 1j * RNG.randn(*h.shape),
                           jnp.complex64) for h in p.highpasses)
    low = jnp.asarray(RNG.randn(*p.lowpass.shape), jnp.float32)
    return Pyramid(low, Yh, None)


@pytest.mark.parametrize("nlevels", [1, 2, 3])
def test_forward_adjoint_matches_transpose(nlevels):
    t = dt.Transform2d()
    shape = (32, 32)
    adj = t._fwd_adjoint_fn(shape, jnp.float32, nlevels, False,
                            "interleaved")
    assert adj is not None

    def ref(x):
        with engine.engine("xla"):
            return t._forward_body(x, nlevels=nlevels, include_scale=False)

    x0 = jnp.zeros(shape, jnp.float32)
    p = ref(x0)
    cot = _rand_cot(p)
    (want,) = jax.linear_transpose(ref, x0)(cot)
    with engine.engine("pallas"):
        got = adj(cot)
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < TOL


@pytest.mark.parametrize("nlevels", [1, 2, 3])
def test_inverse_adjoint_matches_transpose(nlevels):
    t = dt.Transform2d()
    x = RNG.randn(32, 32).astype(np.float32)
    with engine.engine("xla"):
        p = t._forward_body(jnp.asarray(x), nlevels=nlevels,
                            include_scale=False)
    adj = t._inv_adjoint_fn(p)
    assert adj is not None

    def ref(pp):
        with engine.engine("xla"):
            return t._inverse_body(pp, None)

    spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), p)
    xbar = jnp.asarray(RNG.randn(32, 32), jnp.float32)
    (want,) = jax.linear_transpose(ref, spec)(xbar)
    with engine.engine("pallas"):
        got = adj(xbar)
    assert np.abs(np.asarray(got.lowpass)
                  - np.asarray(want.lowpass)).max() < TOL
    for g, w in zip(got.highpasses, want.highpasses):
        assert np.abs(np.asarray(g) - np.asarray(w)).max() < TOL


def test_adjoint_envelope_declines():
    t = dt.Transform2d()
    # bp variant, plane layout, scales, and pad/crop chains fall back
    tb = dt.Transform2d("near_sym_b_bp", "qshift_b_bp")
    assert tb._fwd_adjoint_fn((32, 32), jnp.float32, 2, False,
                              "interleaved") is None
    assert t._fwd_adjoint_fn((32, 32), jnp.float32, 2, True,
                             "interleaved") is None
    assert t._fwd_adjoint_fn((30, 32), jnp.float32, 3, False,
                             "interleaved") is None


def test_grad_through_custom_adjoint_matches_xla():
    """End to end: jax.grad of a scalar loss through the Pallas engine
    (custom adjoint) equals the XLA-engine grad."""
    t = dt.Transform2d()
    x = jnp.asarray(RNG.randn(32, 32), jnp.float32)

    def loss(a, lay="interleaved"):
        p = t._forward_impl(a, nlevels=3, include_scale=False, layout=lay)
        r = t._inverse_impl(p, None)
        s = sum(jnp.sum(jnp.abs(h) ** 2) for h in p.highpasses)
        return jnp.sum(r * r) + s

    with engine.engine("pallas"):
        g1 = jax.grad(loss)(x)
    with engine.engine("xla"):
        g2 = jax.grad(loss)(x)
    assert np.abs(np.asarray(g1) - np.asarray(g2)).max() < 1e-3


def test_planes_adjoints_match_transpose():
    """Plane-layout forward and inverse adjoints against the transpose."""
    t = dt.Transform2d()
    nlevels = 3
    shape = (32, 32)

    def ref(x):
        with engine.engine("xla"):
            return t._forward_body(x, nlevels=nlevels, include_scale=False,
                                   layout="planes")

    adj = t._fwd_adjoint_fn(shape, jnp.float32, nlevels, False, "planes")
    assert adj is not None
    x0 = jnp.zeros(shape, jnp.float32)
    p = ref(x0)
    cot = type(p)(
        jnp.asarray(RNG.randn(*p.lowpass.shape), jnp.float32),
        tuple(jnp.asarray(RNG.randn(*r.shape), jnp.float32)
              for r in p.highpasses_re),
        tuple(jnp.asarray(RNG.randn(*i.shape), jnp.float32)
              for i in p.highpasses_im), None)
    (want,) = jax.linear_transpose(ref, x0)(cot)
    with engine.engine("pallas"):
        got = adj(cot)
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < TOL

    x = RNG.randn(32, 32).astype(np.float32)
    with engine.engine("xla"):
        pp = t._forward_body(jnp.asarray(x), nlevels=nlevels,
                             include_scale=False, layout="planes")
    iadj = t._inv_adjoint_fn(pp)
    assert iadj is not None

    def iref(q):
        with engine.engine("xla"):
            return t._inverse_body(q, None)

    spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), pp)
    xbar = jnp.asarray(RNG.randn(32, 32), jnp.float32)
    (want_p,) = jax.linear_transpose(iref, spec)(xbar)
    with engine.engine("pallas"):
        got_p = iadj(xbar)
    for g, w in zip(jax.tree_util.tree_leaves(got_p),
                    jax.tree_util.tree_leaves(want_p)):
        assert np.abs(np.asarray(g) - np.asarray(w)).max() < TOL


@pytest.mark.parametrize("layout", ["interleaved", "planes"])
def test_3d_adjoints_match_transpose(layout):
    t = dt.Transform3d()
    nlevels = 2
    shape = (16, 16, 32)

    def ref(x):
        with engine.engine("xla"):
            return t._forward_body(x, nlevels=nlevels, include_scale=False,
                                   discard_level_1=False, layout=layout)

    adj = t._fwd_adjoint_fn(shape, jnp.float32, nlevels, False, False,
                            layout)
    assert adj is not None
    x0 = jnp.zeros(shape, jnp.float32)
    p = ref(x0)
    if layout == "planes":
        cot = type(p)(
            jnp.asarray(RNG.randn(*p.lowpass.shape), jnp.float32),
            tuple(jnp.asarray(RNG.randn(*r.shape), jnp.float32)
                  for r in p.highpasses_re),
            tuple(jnp.asarray(RNG.randn(*i.shape), jnp.float32)
                  for i in p.highpasses_im), None, kind="3d")
    else:
        cot = Pyramid(
            jnp.asarray(RNG.randn(*p.lowpass.shape), jnp.float32),
            tuple(jnp.asarray(RNG.randn(*h.shape)
                              + 1j * RNG.randn(*h.shape), jnp.complex64)
                  for h in p.highpasses), None)
    (want,) = jax.linear_transpose(ref, x0)(cot)
    with engine.engine("pallas"):
        got = adj(cot)
    assert np.abs(np.asarray(got) - np.asarray(want)).max() < TOL

    x = RNG.randn(*shape).astype(np.float32)
    with engine.engine("xla"):
        pp = t._forward_body(jnp.asarray(x), nlevels=nlevels,
                             include_scale=False, discard_level_1=False,
                             layout=layout)
    iadj = t._inv_adjoint_fn(pp)
    assert iadj is not None

    def iref(q):
        with engine.engine("xla"):
            return t._inverse_body(q)

    spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), pp)
    xbar = jnp.asarray(RNG.randn(*shape), jnp.float32)
    (want_p,) = jax.linear_transpose(iref, spec)(xbar)
    with engine.engine("pallas"):
        got_p = iadj(xbar)
    for g, w in zip(jax.tree_util.tree_leaves(got_p),
                    jax.tree_util.tree_leaves(want_p)):
        assert np.abs(np.asarray(g) - np.asarray(w)).max() < TOL
