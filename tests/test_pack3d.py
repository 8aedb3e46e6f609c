"""Fused level-1 3-D kernel parity tests (ops/pallas_pack3d.py).

Correctness is defined against composing the dual-stream f32 XLA
primitives (``fb.filter2_axis`` per axis) with ``packing.cube2c_planes``
per octant — the same stage order the unfused path runs — plus the
perfect-reconstruction property of the biort level-1 pair.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from dtcwt_tpu.coeffs import biort
from dtcwt_tpu.ops import engine, fb, pallas_pack3d
from dtcwt_tpu.ops.packing import cube2c_planes

TOL = 1e-4

_OCT = pallas_pack3d._OCTANTS


def _err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    assert a.shape == b.shape, (a.shape, b.shape)
    return float(np.abs(a - b).max())


def _oracle_fwd(x, h0, h1):
    with engine.engine("xla"):
        lo_w, hi_w = fb.filter2_axis(jnp.asarray(x), h0, h1, -1)
        t21 = {}
        for k, v in ((0, lo_w), (1, hi_w)):
            t21[(0, k)], t21[(1, k)] = fb.filter2_axis(v, h0, h1, -2)
        octs = {}
        for (j, k), v in t21.items():
            octs[(0, j, k)], octs[(1, j, k)] = fb.filter2_axis(
                v, h0, h1, -3)
        parts = [cube2c_planes(octs[o]) for o in _OCT]
        re = jnp.concatenate([r for r, _ in parts], axis=-4)
        im = jnp.concatenate([i for _, i in parts], axis=-4)
        return octs[(0, 0, 0)], re, im


def _oracle_inv(lll, re, im, g0, g1):
    from dtcwt_tpu.ops.packing import c2cube_planes
    with engine.engine("xla"):
        octs = {}
        for n, o in enumerate(_OCT):
            octs[o] = c2cube_planes(
                jnp.asarray(re)[..., 4 * n:4 * n + 4, :, :, :],
                jnp.asarray(im)[..., 4 * n:4 * n + 4, :, :, :])
        octs[(0, 0, 0)] = jnp.asarray(lll)
        V = {}
        for j in range(2):
            for k in range(2):
                V[(j, k)] = fb.filter2_sum_axis(
                    octs[(0, j, k)], octs[(1, j, k)], g0, g1, -3)
        u0 = fb.filter2_sum_axis(V[(0, 0)], V[(1, 0)], g0, g1, -2)
        u1 = fb.filter2_sum_axis(V[(0, 1)], V[(1, 1)], g0, g1, -2)
        return fb.filter2_sum_axis(u0, u1, g0, g1, -1)


@pytest.mark.parametrize("fam,shape", [("near_sym_a", (16, 16, 32)),
                                       ("near_sym_a", (2, 12, 16, 32)),
                                       ("near_sym_b", (20, 32, 32)),
                                       ("near_sym_b", (2, 20, 32, 32))])
def test_fwd_parity(fam, shape):
    h0, _g0, h1, _g1 = biort(fam)
    x = np.random.RandomState(0).randn(*shape).astype(np.float32)
    out = pallas_pack3d.fwd_level1_pack(jnp.asarray(x), h0, h1)
    assert out is not None
    lll, (re, im) = out
    wl, wre, wim = _oracle_fwd(x, h0, h1)
    assert _err(lll, wl) < TOL
    assert _err(re, wre) < TOL
    assert _err(im, wim) < TOL


def test_fwd_complex_route():
    h0, _g0, h1, _g1 = biort("near_sym_a")
    x = np.random.RandomState(1).randn(16, 16, 32).astype(np.float32)
    lll, bands = pallas_pack3d.fwd_level1_pack(jnp.asarray(x), h0, h1,
                                               as_planes=False)
    _wl, wre, wim = _oracle_fwd(x, h0, h1)
    z = np.moveaxis(np.asarray(bands), -1, 0)
    assert _err(z.real, np.asarray(wre)) < TOL
    assert _err(z.imag, np.asarray(wim)) < TOL


@pytest.mark.parametrize("fam,shape", [("near_sym_a", (16, 16, 32)),
                                       ("near_sym_a", (2, 12, 16, 32)),
                                       ("near_sym_b", (20, 32, 32))])
def test_inv_parity_and_pr(fam, shape):
    h0, g0, h1, g1 = biort(fam)
    rs = np.random.RandomState(0)
    D, H, W = shape[-3:]
    bshape = shape[:-3] + (28, D // 2, H // 2, W // 2)
    lll = rs.randn(*shape).astype(np.float32)
    re = rs.randn(*bshape).astype(np.float32)
    im = rs.randn(*bshape).astype(np.float32)
    y = pallas_pack3d.inv_level1_pack(jnp.asarray(lll), jnp.asarray(re),
                                      jnp.asarray(im), g0, g1)
    assert y is not None
    assert _err(y, _oracle_inv(lll, re, im, g0, g1)) < TOL

    x = rs.randn(*shape).astype(np.float32)
    l1, (r1, i1) = pallas_pack3d.fwd_level1_pack(jnp.asarray(x), h0, h1)
    xr = pallas_pack3d.inv_level1_pack(l1, r1, i1, g0, g1)
    assert _err(xr, x) < TOL


def test_declines_off_envelope():
    h0, _g0, h1, _g1 = biort("near_sym_a")
    x = jnp.zeros((7, 16, 32), jnp.float32)       # odd depth
    assert pallas_pack3d.fwd_level1_pack(x, h0, h1) is None
    xb = jnp.zeros((16, 16, 32), jnp.bfloat16)    # storage dtype
    assert pallas_pack3d.fwd_level1_pack(xb, h0, h1) is None
    q = np.zeros(10)                               # even-length filter
    assert pallas_pack3d.fwd_level1_pack(
        jnp.zeros((16, 16, 32), jnp.float32), q, q) is None


def test_transform3d_routes_through_pack(monkeypatch):
    """The Transform3d level-1 forward and inverse dispatch into the fused
    kernels inside their envelope (and bit-match the declared fallback)."""
    import dtcwt_tpu as dt
    calls = {"fwd": 0, "inv": 0}
    orig_f, orig_i = (pallas_pack3d.fwd_level1_pack,
                      pallas_pack3d.inv_level1_pack)

    def spy_f(*a, **k):
        out = orig_f(*a, **k)
        calls["fwd"] += out is not None
        return out

    def spy_i(*a, **k):
        out = orig_i(*a, **k)
        calls["inv"] += out is not None
        return out

    monkeypatch.setattr(pallas_pack3d, "fwd_level1_pack", spy_f)
    monkeypatch.setattr(pallas_pack3d, "inv_level1_pack", spy_i)
    t3 = dt.Transform3d()
    v = np.random.RandomState(2).rand(16, 16, 32).astype(np.float32)
    with engine.engine("pallas"):
        for layout in ("interleaved", "planes"):
            p = t3.forward(v, 2, layout=layout)
            r = t3.inverse(p)
            assert _err(r, v) < 1e-3
    assert calls["fwd"] >= 2 and calls["inv"] >= 2


def _oracle_fwd2(x, q):
    h0a, h0b, h1a, h1b = q[0], q[1], q[4], q[5]
    with engine.engine("xla"):
        lo_w, hi_w = fb.dfilt2_axis(jnp.asarray(x), (h0b, h0a),
                                    (h1b, h1a), -1)
        t21 = {}
        for k, v in ((0, lo_w), (1, hi_w)):
            t21[(0, k)], t21[(1, k)] = fb.dfilt2_axis(v, (h0b, h0a),
                                                      (h1b, h1a), -2)
        octs = {}
        for (j, k), v in t21.items():
            octs[(0, j, k)], octs[(1, j, k)] = fb.dfilt2_axis(
                v, (h0b, h0a), (h1b, h1a), -3)
        parts = [cube2c_planes(octs[o]) for o in _OCT]
        re = jnp.concatenate([r for r, _ in parts], axis=-4)
        im = jnp.concatenate([i for _, i in parts], axis=-4)
        return octs[(0, 0, 0)], re, im


@pytest.mark.parametrize("shape", [(16, 16, 32), (2, 16, 16, 32)])
def test_fwd2_parity(shape):
    from dtcwt_tpu.coeffs import qshift
    q = qshift("qshift_a")
    x = np.random.RandomState(0).randn(*shape).astype(np.float32)
    out = pallas_pack3d.fwd_level2_pack(jnp.asarray(x), (q[1], q[0]),
                                        (q[5], q[4]))
    assert out is not None
    lll, (re, im) = out
    wl, wre, wim = _oracle_fwd2(x, q)
    assert _err(lll, wl) < TOL
    assert _err(re, wre) < TOL
    assert _err(im, wim) < TOL


def test_inv2_parity_and_pr():
    from dtcwt_tpu.coeffs import qshift
    from dtcwt_tpu.ops.packing import c2cube_planes
    q = qshift("qshift_a")
    rs = np.random.RandomState(0)
    shape = (16, 16, 32)
    x = rs.randn(*shape).astype(np.float32)
    lll, (re, im) = pallas_pack3d.fwd_level2_pack(
        jnp.asarray(x), (q[1], q[0]), (q[5], q[4]))
    y = pallas_pack3d.inv_level2_pack(lll, re, im, (q[3], q[2]),
                                      (q[7], q[6]))
    assert y is not None
    # oracle inverse: c2cube + per-axis dual-sum interpolating merges
    with engine.engine("xla"):
        octs = {}
        for n, o in enumerate(_OCT):
            octs[o] = c2cube_planes(
                jnp.asarray(re)[..., 4 * n:4 * n + 4, :, :, :],
                jnp.asarray(im)[..., 4 * n:4 * n + 4, :, :, :])
        octs[(0, 0, 0)] = jnp.asarray(lll)
        V = {}
        for j in range(2):
            for k in range(2):
                V[(j, k)] = fb.ifilt2_sum_axis(
                    octs[(0, j, k)], octs[(1, j, k)],
                    (q[3], q[2]), (q[7], q[6]), -3)
        u0 = fb.ifilt2_sum_axis(V[(0, 0)], V[(1, 0)],
                                (q[3], q[2]), (q[7], q[6]), -2)
        u1 = fb.ifilt2_sum_axis(V[(0, 1)], V[(1, 1)],
                                (q[3], q[2]), (q[7], q[6]), -2)
        want = fb.ifilt2_sum_axis(u0, u1, (q[3], q[2]), (q[7], q[6]), -1)
    assert _err(y, want) < TOL
    # perfect reconstruction through the fused level-2 pair
    assert _err(y, x) < 1e-3


def test_transform3d_routes_through_pack2(monkeypatch):
    import dtcwt_tpu as dt
    calls = {"fwd": 0, "inv": 0}
    orig_f, orig_i = (pallas_pack3d.fwd_level2_pack,
                      pallas_pack3d.inv_level2_pack)

    def spy_f(*a, **k):
        out = orig_f(*a, **k)
        calls["fwd"] += out is not None
        return out

    def spy_i(*a, **k):
        out = orig_i(*a, **k)
        calls["inv"] += out is not None
        return out

    monkeypatch.setattr(pallas_pack3d, "fwd_level2_pack", spy_f)
    monkeypatch.setattr(pallas_pack3d, "inv_level2_pack", spy_i)
    t3 = dt.Transform3d()
    v = np.random.RandomState(2).rand(16, 16, 32).astype(np.float32)
    with engine.engine("pallas"):
        for layout in ("interleaved", "planes"):
            p = t3.forward(v, 2, layout=layout)
            r = t3.inverse(p)
            assert _err(r, v) < 1e-3
    assert calls["fwd"] >= 2 and calls["inv"] >= 2
