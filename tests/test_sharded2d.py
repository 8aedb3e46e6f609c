"""Sharded 2-D transform == single-device transform, on a virtual 8-device
CPU mesh (2 data x 4 rows).  This is the multi-chip correctness lever called
for in SURVEY.md §4 ("shard_map tests on a mesh of fake devices, asserting
halo-exchange parity with the single-device path")."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dtcwt_tpu import Transform2d
from dtcwt_tpu.parallel import ShardedTransform2d, make_mesh

RNG = np.random.RandomState(3)


def _mesh(data=2, rows=4):
    devs = jax.devices()
    assert len(devs) >= data * rows
    return make_mesh((data, rows), ("data", "rows"), devs[:data * rows])


@pytest.mark.parametrize("mesh_shape", [(1, 8), (4, 2), (2, 4)])
def test_sharded_determinism_across_mesh_shapes(mesh_shape):
    """Same global result for every mesh factorization — the functional
    replacement for a race-detection suite (SURVEY.md §5)."""
    import dtcwt_tpu as dt
    mesh = _mesh(*mesh_shape)
    st = ShardedTransform2d(mesh)
    x = np.random.RandomState(7).rand(mesh_shape[0] * 2, 64, 64)
    ps = st.forward(x, nlevels=3)
    pr = dt.Transform2d().forward(x, nlevels=3)
    assert np.abs(np.asarray(ps.lowpass) - np.asarray(pr.lowpass)).max() < 1e-12
    for a, b in zip(ps.highpasses, pr.highpasses):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-12


@pytest.mark.parametrize("biort,qshift", [
    ("near_sym_a", "qshift_a"),
    ("near_sym_b_bp", "qshift_b_bp"),
])
def test_sharded_forward_matches_single(biort, qshift):
    mesh = _mesh()
    X = RNG.randn(4, 256, 128)
    st = ShardedTransform2d(mesh, biort=biort, qshift=qshift)
    t = Transform2d(biort=biort, qshift=qshift)
    ps = st.forward(X, nlevels=3)
    p = t.forward(X, nlevels=3)
    np.testing.assert_allclose(np.asarray(ps.lowpass), np.asarray(p.lowpass),
                               rtol=0, atol=1e-12)
    for a, b in zip(ps.highpasses, p.highpasses):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-12)


def test_sharded_roundtrip():
    mesh = _mesh()
    X = RNG.randn(2, 256, 64)
    st = ShardedTransform2d(mesh)
    pyr = st.forward(X, nlevels=3)
    rec = np.asarray(st.inverse(pyr))
    assert np.abs(rec - X).max() < 1e-12


def test_sharded_gather_fallback_on_deep_levels():
    """With 6 levels on 256 rows the coarse levels can't stay sharded over 4
    row-shards; the plan gathers and the result still matches exactly."""
    mesh = _mesh()
    X = RNG.randn(2, 256, 256)
    st = ShardedTransform2d(mesh)
    t = Transform2d()
    ps = st.forward(X, nlevels=6)
    p = t.forward(X, nlevels=6)
    np.testing.assert_allclose(np.asarray(ps.lowpass), np.asarray(p.lowpass),
                               rtol=0, atol=1e-12)
    for a, b in zip(ps.highpasses, p.highpasses):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-12)
    rec = np.asarray(st.inverse(ps))
    assert np.abs(rec - X).max() < 1e-11


def _mesh3(data, rows, cols):
    devs = jax.devices()
    assert len(devs) >= data * rows * cols
    return make_mesh((data, rows, cols), ("data", "rows", "cols"),
                     devs[:data * rows * cols])


@pytest.mark.parametrize("mesh_shape", [(2, 2, 2), (1, 2, 4), (1, 4, 2)])
def test_sharded_2d_spatial_mesh(mesh_shape):
    """Full 2-D spatial decomposition: halos exchanged on BOTH image axes;
    forward + inverse bit-identical to the single-device transform."""
    import dtcwt_tpu as dt
    mesh = _mesh3(*mesh_shape)
    st = ShardedTransform2d(mesh, cols_axis="cols")
    t = dt.Transform2d()
    X = np.random.RandomState(11).rand(mesh_shape[0] * 2, 256, 256)
    ps = st.forward(X, nlevels=3)
    p = t.forward(X, nlevels=3)
    assert np.abs(np.asarray(ps.lowpass) - np.asarray(p.lowpass)).max() < 1e-12
    for a, b in zip(ps.highpasses, p.highpasses):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-12
    rec = np.asarray(st.inverse(ps))
    assert np.abs(rec - np.asarray(t.inverse(p))).max() < 1e-12
    assert np.abs(rec - X).max() < 1e-11


def test_sharded_2d_spatial_bp_and_deep():
    """bp wavelets + enough levels that both spatial axes degrade to
    replicated mid-transform (independent per-axis gathers)."""
    import dtcwt_tpu as dt
    mesh = _mesh3(1, 4, 2)
    st = ShardedTransform2d(mesh, biort="near_sym_b_bp", qshift="qshift_b_bp",
                            cols_axis="cols")
    t = dt.Transform2d(biort="near_sym_b_bp", qshift="qshift_b_bp")
    X = np.random.RandomState(13).rand(1, 256, 128)
    ps = st.forward(X, nlevels=5)
    p = t.forward(X, nlevels=5)
    for a, b in zip(ps.highpasses, p.highpasses):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-12
    assert np.abs(np.asarray(ps.lowpass) - np.asarray(p.lowpass)).max() < 1e-12


def test_sharded_inverse_gain_mask():
    """Sharded inverse accepts gain_mask (r1 VERDICT API asymmetry)."""
    import dtcwt_tpu as dt
    mesh = _mesh(2, 4)
    st = ShardedTransform2d(mesh)
    t = dt.Transform2d()
    X = RNG.randn(2, 256, 128)
    gm = np.linspace(0.0, 1.5, 18).reshape(6, 3)
    ps = st.forward(X, nlevels=3)
    p = t.forward(X, nlevels=3)
    got = np.asarray(st.inverse(ps, gm))
    want = np.asarray(t.inverse(p, gm))
    assert np.abs(got - want).max() < 1e-12


def test_sharded_inverse_with_width_crop():
    """A forward W pad (W=102 -> mult-of-4) forces an inverse-side crop on
    the unsharded cols axis; r1's sharded inverse raised a shape error."""
    import dtcwt_tpu as dt
    mesh = _mesh(2, 4)
    st = ShardedTransform2d(mesh)
    t = dt.Transform2d()
    X = RNG.randn(2, 256, 102)
    ps = st.forward(X, nlevels=3)
    rec = np.asarray(st.inverse(ps))
    want = np.asarray(t.inverse(t.forward(X, nlevels=3)))
    assert np.abs(rec - want).max() < 1e-12


def test_sharded_inverse_resharding_transition():
    """Deep pyramids whose coarse levels cannot shard no longer force a
    fully-replicated inverse: the coarse levels run replicated and the
    lowpass re-shards at the finest shardable level (r1 all-or-nothing)."""
    import dtcwt_tpu as dt
    mesh = _mesh3(2, 2, 2)
    st = ShardedTransform2d(mesh, cols_axis="cols")
    t = dt.Transform2d()
    X = np.random.RandomState(21).rand(2, 256, 256)
    ps = st.forward(X, nlevels=6)     # coarsest level: 8x8 on 2x2 spatial
    rec = np.asarray(st.inverse(ps))
    want = np.asarray(t.inverse(t.forward(X, nlevels=6)))
    assert np.abs(rec - want).max() < 1e-11
    # gain_mask through the transitioning inverse
    gm = np.linspace(0.0, 1.5, 36).reshape(6, 6)
    got = np.asarray(st.inverse(ps, gm))
    want_g = np.asarray(t.inverse(t.forward(X, nlevels=6), gm))
    assert np.abs(got - want_g).max() < 1e-11


def test_sharded_degraded_plan_warns(caplog):
    """Silent loss of parallelism is no longer silent: an unusable mesh axis
    logs a warning (once per built configuration)."""
    import logging
    mesh = _mesh(1, 8)
    st = ShardedTransform2d(mesh)
    X = RNG.randn(1, 100, 64)   # 100 rows not divisible by 8
    with caplog.at_level(logging.WARNING,
                         logger="dtcwt_tpu.parallel.transform2d_dist"):
        st.forward(X, nlevels=2)
    assert any("rows axis" in r.message and "unused" in r.message
               for r in caplog.records)


def test_sharded_grad_flows():
    """AD through the sharded forward (the 'training step' shape)."""
    mesh = _mesh()
    X = RNG.randn(2, 128, 64).astype(np.float64)
    st = ShardedTransform2d(mesh)

    def loss(x):
        p = st._fwd_built(x.shape, x.dtype, 2)(x)
        return sum(jax.numpy.sum(jax.numpy.abs(h) ** 2)
                   for h in p.highpasses) + jax.numpy.sum(p.lowpass ** 2)

    g = jax.grad(loss)(jax.numpy.asarray(X))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_sharded_planes_layout():
    """layout='planes' on the sharded forward matches the interleaved
    pyramid exactly and the single-device plane pyramid to f64; the
    inverse accepts the plane container."""
    import jax.numpy as jnp
    mesh = _mesh()
    st = ShardedTransform2d(mesh)
    x = RNG.rand(4, 128, 128)
    pi = st.forward(x, 3)
    pp = st.forward(x, 3, layout="planes")
    zi = pp.interleaved()
    for a, b in zip(pi.highpasses, zi.highpasses):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-12
    sp = Transform2d().forward(x, 3, layout="planes")
    for a, b in zip(pp.highpasses_re, sp.highpasses_re):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-12
    ri, rp = np.asarray(st.inverse(pi)), np.asarray(st.inverse(pp))
    assert np.abs(ri - rp).max() < 1e-12
    # bf16 planes: storage dtype end-to-end, f32 compute
    xb = jnp.asarray(x.astype(np.float32), jnp.bfloat16)
    pb = st.forward(xb, 3, layout="planes")
    assert pb.lowpass.dtype == jnp.bfloat16
    assert pb.highpasses_re[0].dtype == jnp.bfloat16
    rb = st.inverse(pb)
    assert rb.dtype == jnp.bfloat16
    assert np.abs(np.asarray(rb, np.float64) - x).max() < 0.05


def test_sharded_bf16_plane_bit_parity():
    """bf16 plane pyramids from the sharded forward/inverse are BIT-identical
    to the single-device ones: the sharded paths requantize the inter-level
    lowpass to the storage dtype per level exactly like Transform2d
    (r2 review finding: the cast was skipped, so level>=2 subbands drifted
    by a bf16 ulp everywhere)."""
    mesh = _mesh()
    st = ShardedTransform2d(mesh)
    t = Transform2d()
    x = RNG.rand(4, 128, 128).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)
    ps = st.forward(xb, 3, layout="planes")
    p1 = t.forward(xb, 3, layout="planes")
    assert np.array_equal(np.asarray(ps.lowpass, np.float32),
                          np.asarray(p1.lowpass, np.float32))
    for a, b in zip(ps.highpasses_re + ps.highpasses_im,
                    p1.highpasses_re + p1.highpasses_im):
        assert np.array_equal(np.asarray(a, np.float32),
                              np.asarray(b, np.float32))
    assert np.array_equal(np.asarray(st.inverse(ps), np.float32),
                          np.asarray(t.inverse(p1), np.float32))


def test_sharded_planes_inverse_gain_mask():
    """gain_mask through the sharded PLANE-layout inverse matches the
    single-device interleaved result (plane/degree permutation of the
    gain rows)."""
    mesh = _mesh()
    st = ShardedTransform2d(mesh)
    t = Transform2d()
    X = RNG.randn(2, 256, 128)
    gm = np.linspace(0.0, 1.5, 18).reshape(6, 3)
    pp = st.forward(X, nlevels=3, layout="planes")
    p = t.forward(X, nlevels=3)
    got = np.asarray(st.inverse(pp, gm))
    want = np.asarray(t.inverse(p, gm))
    assert np.abs(got - want).max() < 1e-12


def test_sharded_forward_include_scale():
    """include_scale on the sharded forward matches the single-device
    per-level lowpasses."""
    mesh = _mesh()
    st = ShardedTransform2d(mesh)
    t = Transform2d()
    X = RNG.randn(2, 256, 128)
    ps = st.forward(X, nlevels=3, include_scale=True)
    p = t.forward(X, nlevels=3, include_scale=True)
    assert len(ps.scales) == 3
    for a, b in zip(ps.scales, p.scales):
        assert a.shape == b.shape
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-12
    # planes layout carries scales too
    pp = st.forward(X, nlevels=3, layout="planes", include_scale=True)
    for a, b in zip(pp.scales, p.scales):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-12


def test_sharded_nlevels0():
    """nlevels=0 returns the single-device empty pyramid (dtype rules +
    odd-size pad applied) instead of a bare IndexError."""
    mesh = _mesh()
    st = ShardedTransform2d(mesh)
    x = RNG.rand(2, 64, 64)
    p = st.forward(x, nlevels=0)
    assert p.highpasses == ()
    assert np.abs(np.asarray(p.lowpass) - x).max() == 0.0
    assert np.abs(np.asarray(st.inverse(p)) - x).max() == 0.0
