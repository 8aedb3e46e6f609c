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
