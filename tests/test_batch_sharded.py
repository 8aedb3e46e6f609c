"""Batch data-parallelism over a virtual 8-device mesh.

The sharded result must equal the single-device transform exactly for
1-D/2-D/3-D — the multi-device determinism gate (SURVEY.md §4: the
cross-backend equivalence suite's replacement)."""

import numpy as np
import pytest
import jax

import dtcwt_tpu as dt
from dtcwt_tpu.parallel import make_mesh
from dtcwt_tpu.parallel.batch import BatchSharded, shard_batch


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return make_mesh((8,), ("data",))


def test_batch_sharded_2d(mesh):
    t = dt.Transform2d()
    bt = BatchSharded(t, mesh)
    x = np.random.RandomState(0).rand(16, 64, 96)
    ps = bt.forward(x, nlevels=3, include_scale=True)
    pr = t.forward(x, nlevels=3, include_scale=True)
    for a, b in zip(jax.tree_util.tree_leaves(ps),
                    jax.tree_util.tree_leaves(pr)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    rs = bt.inverse(ps)
    assert np.abs(np.asarray(rs) - x).max() < 1e-12
    # outputs stay sharded over the mesh
    assert len(ps.lowpass.sharding.device_set) == 8


def test_batch_sharded_1d_3d(mesh):
    t1 = BatchSharded(dt.Transform1d(), mesh)
    x1 = np.random.RandomState(1).rand(8, 64, 2)
    p1 = t1.forward(x1, nlevels=3)
    assert np.abs(np.asarray(t1.inverse(p1)) - x1).max() < 1e-12

    t3 = BatchSharded(dt.Transform3d(), mesh)
    x3 = np.random.RandomState(2).rand(8, 16, 16, 16)
    p3 = t3.forward(x3, nlevels=2)
    assert np.abs(np.asarray(t3.inverse(p3)) - x3).max() < 1e-12


def test_batch_divisibility_error(mesh):
    bt = BatchSharded(dt.Transform2d(), mesh)
    with pytest.raises(ValueError):
        bt.forward(np.zeros((3, 32, 32)), nlevels=2)


def test_shard_batch_pytree(mesh):
    t = dt.Transform2d()
    p = t.forward(np.random.RandomState(3).rand(8, 32, 32), nlevels=2)
    sp = shard_batch(p, mesh)
    assert len(sp.lowpass.sharding.device_set) == 8
    assert len(sp.highpasses[0].sharding.device_set) == 8
