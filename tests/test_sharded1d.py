"""Signal-axis-sharded 1-D DTCWT vs the single-device transform on a
virtual 8-device CPU mesh (sequence-parallelism determinism gate; the
reference has no distributed path at all)."""

import numpy as np
import pytest
import jax

import dtcwt_tpu as dt
from dtcwt_tpu.parallel import make_mesh
from dtcwt_tpu.parallel.transform1d_dist import ShardedTransform1d


def _mesh(data=2, rows=4):
    devs = jax.devices()
    if len(devs) < data * rows:
        pytest.skip("needs %d virtual devices" % (data * rows))
    return make_mesh((data, rows), ("data", "rows"), devs[:data * rows])


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8), (4, 2)])
def test_sharded1d_matches_single(mesh_shape):
    mesh = _mesh(*mesh_shape)
    st = ShardedTransform1d(mesh)
    t = dt.Transform1d()
    x = np.random.RandomState(0).rand(mesh_shape[0] * 2, 256, 3)
    ps = st.forward(x, nlevels=4)
    pr = t.forward(x, nlevels=4)
    assert np.abs(np.asarray(ps.lowpass) - np.asarray(pr.lowpass)).max() < 1e-12
    for a, b in zip(ps.highpasses, pr.highpasses):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-12


def test_sharded1d_roundtrip_and_deep_levels():
    mesh = _mesh()
    st = ShardedTransform1d(mesh, biort="near_sym_b", qshift="qshift_b")
    x = np.random.RandomState(1).rand(2, 512, 2)
    # 6 levels: the coarse ones fall off the sharded plan (local length
    # below the filter support) and run replicated after an all_gather.
    p = st.forward(x, nlevels=6)
    r = st.inverse(p)
    assert np.abs(np.asarray(r) - x).max() < 1e-12
    pr = dt.Transform1d(biort="near_sym_b", qshift="qshift_b").forward(x, 6)
    for a, b in zip(p.highpasses, pr.highpasses):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-12


def test_sharded1d_nonmult4_pad_levels():
    # A signal whose decimated lengths go non-multiple-of-4 (pad + crop
    # path, forced replication mid-pyramid).
    mesh = _mesh()
    st = ShardedTransform1d(mesh)
    x = np.random.RandomState(2).rand(2, 328, 2)   # 328/8=41 odd local len
    p = st.forward(x, nlevels=3)
    r = st.inverse(p)
    assert np.abs(np.asarray(r) - x).max() < 1e-12
    pr = dt.Transform1d().forward(x, 3)
    for a, b in zip(p.highpasses, pr.highpasses):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-12


def test_sharded1d_lane_folded(monkeypatch):
    """Lane folding inside each shard (segments-as-lanes with ppermute'd
    shard-edge halos) must be bit-identical to the flat sharded path and
    to the single-device transform."""
    from dtcwt_tpu.transforms import transform1d as t1m
    mesh = _mesh()
    x = np.random.RandomState(3).rand(2, 2048, 1)

    monkeypatch.setattr(t1m, "_FOLD_MIN_N", 1 << 60)   # flat everywhere
    st_flat = ShardedTransform1d(mesh, biort="near_sym_b",
                                 qshift="qshift_b")
    t_flat = dt.Transform1d(biort="near_sym_b", qshift="qshift_b")
    p_flat = st_flat.forward(x, nlevels=5)
    p_single = t_flat.forward(x, nlevels=5)

    monkeypatch.setattr(t1m, "_FOLD_MIN_N", 64)        # force folding
    st_fold = ShardedTransform1d(mesh, biort="near_sym_b",
                                 qshift="qshift_b")
    # the plan must actually fold (local len 2048/4 = 512 >= 64)
    assert t1m._fold_plan(512, 1, 5, 9, 19) is not None
    p_fold = st_fold.forward(x, nlevels=5)
    r_fold = st_fold.inverse(p_fold)

    for a, b in zip(p_fold.highpasses, p_flat.highpasses):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-12
    for a, b in zip(p_fold.highpasses, p_single.highpasses):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-12
    assert np.abs(np.asarray(p_fold.lowpass)
                  - np.asarray(p_flat.lowpass)).max() < 1e-12
    assert np.abs(np.asarray(r_fold) - x).max() < 1e-10


def test_sharded1d_inverse_gain_mask():
    """Sharded 1-D inverse accepts a per-level gain_mask and matches the
    single-device result."""
    mesh = _mesh()
    st = ShardedTransform1d(mesh)
    t = dt.Transform1d()
    X = np.random.RandomState(17).randn(2, 512, 4)
    gm = np.linspace(0.25, 1.5, 3)
    ps = st.forward(X, nlevels=3)
    p = t.forward(X, nlevels=3)
    got = np.asarray(st.inverse(ps, gm))
    want = np.asarray(t.inverse(p, gm))
    assert np.abs(got - want).max() < 1e-12


def test_sharded1d_planes_layout():
    """layout='planes' on the sharded 1-D forward matches the interleaved
    pyramid and the single-device plane pyramid; the inverse accepts the
    plane container; bf16 planes stay bf16 and are bit-identical to the
    single-device bf16 plane pyramid."""
    import jax.numpy as jnp
    mesh = _mesh()
    st = ShardedTransform1d(mesh)
    t = dt.Transform1d()
    x = np.random.RandomState(23).rand(2, 512, 4)
    pi = st.forward(x, nlevels=3)
    pp = st.forward(x, nlevels=3, layout="planes")
    zi = pp.interleaved()
    for a, b in zip(pi.highpasses, zi.highpasses):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-12
    sp = t.forward(x, 3, layout="planes")
    for a, b in zip(pp.highpasses_re + pp.highpasses_im,
                    sp.highpasses_re + sp.highpasses_im):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-12
    ri, rp = np.asarray(st.inverse(pi)), np.asarray(st.inverse(pp))
    assert np.abs(ri - rp).max() < 1e-12
    # gain_mask through the plane container
    gm = np.linspace(0.25, 1.5, 3)
    got = np.asarray(st.inverse(pp, gm))
    want = np.asarray(t.inverse(t.forward(x, 3), gm))
    assert np.abs(got - want).max() < 1e-12
    # bf16 planes: storage dtype end-to-end, bit parity with single-device
    xb = jnp.asarray(x.astype(np.float32), jnp.bfloat16)
    pb = st.forward(xb, 3, layout="planes")
    assert pb.lowpass.dtype == jnp.bfloat16
    assert pb.highpasses_re[0].dtype == jnp.bfloat16
    sb = t.forward(xb, 3, layout="planes")
    assert np.array_equal(np.asarray(pb.lowpass, np.float32),
                          np.asarray(sb.lowpass, np.float32))
    for a, b in zip(pb.highpasses_re + pb.highpasses_im,
                    sb.highpasses_re + sb.highpasses_im):
        assert np.array_equal(np.asarray(a, np.float32),
                              np.asarray(b, np.float32))
    rb = st.inverse(pb)
    assert rb.dtype == jnp.bfloat16
    assert np.array_equal(np.asarray(rb, np.float32),
                          np.asarray(t.inverse(sb), np.float32))


def test_sharded1d_lane_folded_planes(monkeypatch):
    """The lane-folded planes branches (folded re/im unfold in the forward,
    folded hi_of + gain in the inverse) are bit-identical to the flat
    sharded planes path."""
    from dtcwt_tpu.transforms import transform1d as t1m
    mesh = _mesh()
    x = np.random.RandomState(29).rand(2, 2048, 1)
    gm = np.linspace(0.25, 1.5, 5)

    monkeypatch.setattr(t1m, "_FOLD_MIN_N", 1 << 60)   # flat everywhere
    st_flat = ShardedTransform1d(mesh)
    p_flat = st_flat.forward(x, nlevels=5, layout="planes")
    r_flat = st_flat.inverse(p_flat, gm)

    monkeypatch.setattr(t1m, "_FOLD_MIN_N", 64)        # force folding
    st_fold = ShardedTransform1d(mesh)
    p_fold = st_fold.forward(x, nlevels=5, layout="planes")
    for a, b in zip(p_fold.highpasses_re + p_fold.highpasses_im,
                    p_flat.highpasses_re + p_flat.highpasses_im):
        assert np.abs(np.asarray(a) - np.asarray(b)).max() == 0.0
    assert np.abs(np.asarray(p_fold.lowpass)
                  - np.asarray(p_flat.lowpass)).max() == 0.0
    r_fold = st_fold.inverse(p_fold, gm)
    assert np.abs(np.asarray(r_fold) - np.asarray(r_flat)).max() == 0.0


def test_sharded1d_nlevels0():
    """nlevels=0 returns the single-device empty pyramid instead of a bare
    IndexError; the inverse is the identity."""
    mesh = _mesh()
    st = ShardedTransform1d(mesh)
    x = np.random.RandomState(31).rand(2, 64, 2)
    p = st.forward(x, nlevels=0)
    assert p.highpasses == ()
    assert np.abs(np.asarray(p.lowpass) - x).max() == 0.0
    assert np.abs(np.asarray(st.inverse(p)) - x).max() == 0.0
