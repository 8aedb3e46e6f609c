"""3-D dual-tree complex wavelet transform (forward + inverse).

Behavioral parity surface: ``/root/reference/dtcwt/numpy/transform3d.py``
(forward :37-131, inverse :133-206, _level1_xfm :208-289, _level2_xfm
:317-383, _level1_ifm :385-440, _level2_ifm :460-526, no-highpass variants
:291-315/:442-458), including ``ext_mode`` 4/8 divisibility + edge-repeat
padding, ``discard_level_1`` (28 directional subbands -> 1:1 redundancy) and
the inverse-side crop rules.

TPU-first redesign: the reference loops over 2-D planes in Python, calling
column filters per slice (its hottest code path).  Here each level is three
whole-volume separable axis passes over ``[..., D, H, W]`` (the filter
primitives are axis-parameterised and batched), so one jit-compiled program
covers any batch with no Python-level plane loops.  The reference's "work
array" double-size scratch is dropped: its even-filter padding turns out to
be vestigial (the padded samples are never consumed by later passes), so the
transform is a pure separable filter tree plus the octet<->complex packing.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp

from dtcwt_tpu.ops import engine, fb
from dtcwt_tpu.ops.packing import (cube2c, c2cube, cube2c_planes,
                                   c2cube_planes)
from dtcwt_tpu.transforms.pyramid import (Pyramid, PlanePyramid,
                                          pyramid_to_device)
from dtcwt_tpu.transforms.transform2d import (
    DEFAULT_BIORT, DEFAULT_QSHIFT, normalize_biort, normalize_qshift)
from dtcwt_tpu.utils import compute_view as _comp

__all__ = ["Transform3d"]

# octant order of the 28 highpass directions (reference transform3d.py:
# :278-289).  Letters index (dim-2 half, dim-3 half, dim-1 half) as in the
# reference comment; tuples are (i, j, k) = halves of (dim-3, dim-2, dim-1).
_OCTANTS = (
    (0, 1, 0),   # HLL
    (1, 0, 0),   # LHL
    (1, 1, 0),   # HHL
    (0, 0, 1),   # LLH
    (0, 1, 1),   # HLH
    (1, 0, 1),   # LHH
    (1, 1, 1),   # HHH
)


def _repeat_edges(x, axis: int, n: int):
    """Append *n* copies of the first/last sample at each end of *axis*."""
    first = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    last = jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)
    parts = [first] * n + [x] + [last] * n
    return jnp.concatenate(parts, axis=axis)


def _crop(x, axis: int, n: int):
    return jax.lax.slice_in_dim(x, n, x.shape[axis] - n, axis=axis)


class Transform3d:
    """An n-level 3-D DTCWT with 28 directional subbands per level.

    :param ext_mode: 4 or 8 — the divisibility contract / edge-repeat
        padding mode (see reference docstring, ``transform3d.py:60-67``).
    """

    def __init__(self, biort=DEFAULT_BIORT, qshift=DEFAULT_QSHIFT,
                 ext_mode: int = 4):
        self.biort = normalize_biort(biort)
        self.qshift = normalize_qshift(qshift)
        if ext_mode not in (4, 8):
            raise ValueError("ext_mode must be one of 4 or 8")
        self.ext_mode = ext_mode
        self._fwd = jax.jit(self._forward_impl,
                            static_argnames=("nlevels", "include_scale",
                                             "discard_level_1", "layout",
                                             "ek"))
        self._inv = jax.jit(self._inverse_impl, static_argnames=("ek",))

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------
    def forward(self, X, nlevels: int = 3, include_scale: bool = False,
                discard_level_1: bool = False,
                layout: str = "interleaved") -> Pyramid:
        """Forward transform of a ``[..., D, H, W]`` real volume.  Each
        highpass level is ``[..., D', H', W', 28]`` complex; with
        ``discard_level_1`` the first entry is ``None`` (1:1 redundancy).

        ``layout='planes'`` returns a :class:`PlanePyramid` (``kind='3d'``)
        holding each level as band-major re/im f32 planes
        ``[..., 28, D', H', W']`` in the reference's octant band order —
        no complex packing on the forward and no band re-split on the
        inverse (``inverse`` accepts either container)."""
        X = jnp.asarray(X)
        if X.ndim < 3:
            raise ValueError("Transform3d.forward needs at least a 3-D input")
        if layout not in ("interleaved", "planes"):
            raise ValueError("layout must be 'interleaved' or 'planes'")
        div = 2 if self.ext_mode == 4 else 4
        for d in (-3, -2, -1):
            if X.shape[d] % div != 0:
                raise ValueError(
                    "Input shape should be a multiple of %d in each direction"
                    " when ext_mode == %d" % (div, self.ext_mode))
        return self._fwd(X, nlevels=nlevels, include_scale=include_scale,
                         discard_level_1=discard_level_1, layout=layout,
                         ek=engine.trace_key())

    def _forward_impl(self, X, *, nlevels, include_scale, discard_level_1,
                      layout="interleaved", ek=None):
        impl = lambda x: self._forward_body(
            x, nlevels=nlevels, include_scale=include_scale,
            discard_level_1=discard_level_1, layout=layout)
        if engine.use_pallas():
            from dtcwt_tpu.ops.linearize import linear_vjp
            spec = jax.ShapeDtypeStruct(X.shape, X.dtype)
            adj = self._fwd_adjoint_fn(X.shape, X.dtype, nlevels,
                                       include_scale, discard_level_1,
                                       layout)
            return linear_vjp(impl, spec, adjoint=adj)(X)
        return impl(X)

    # ------------------------------------------------------------------
    # kernel-speed adjoints (ops/adjoint.py; same structure as the 2-D
    # ones): the orthogonal qshift stage's analysis adjoint is the fused
    # inverse stage (and vice versa), cube2c is orthogonal (its adjoint
    # is c2cube), and the redundant level-1 biort stage gets the explicit
    # zero-extension + border-fold adjoint along each axis.
    # ------------------------------------------------------------------
    def _adjoint_shapes_ok(self, spatial, nlevels: int) -> bool:
        """Crop/pad-free level chain: every level divides exactly."""
        pw = nlevels + (1 if self.ext_mode == 8 else 0)
        return not any(s % (2 ** max(pw, 1)) for s in spatial)

    def _fwd_adjoint_fn(self, shape, dtype, nlevels, include_scale,
                        discard_level_1, layout):
        if (len(self.biort) != 4 or len(self.qshift) != 8
                or include_scale or discard_level_1 or nlevels < 1):
            return None
        if jnp.dtype(dtype) != jnp.float32:
            return None
        if self.biort[0].size % 2 == 0:   # even filters trim shapes
            return None
        if not self._adjoint_shapes_ok(shape[-3:], nlevels):
            return None
        planes = layout == "planes"
        h0o, h1o = self.biort[0], self.biort[2]
        q = self.qshift
        g0a, g0b, g1a, g1b = q[2], q[3], q[6], q[7]

        def adj(cot):
            from dtcwt_tpu.ops import adjoint as adjops
            if planes:
                # real plane cotangents: no complex conjugation convention
                bands = tuple((_comp(r), _comp(i)) for r, i in
                              zip(cot.highpasses_re, cot.highpasses_im))
                oct_of = lambda lvl: self._octants_planes(*bands[lvl])
            else:
                bands = tuple(jnp.conj(h) for h in cot.highpasses)
                oct_of = lambda lvl: self._octants(bands[lvl])
            Yl = _comp(jnp.asarray(cot.lowpass))
            for level in range(nlevels - 1, 0, -1):
                curr = tuple(s // 2 for s in Yl.shape[-3:])
                prev = tuple(Yl.shape[-3:])   # crop-free: prev == 2*curr
                lvl_b = bands[level]
                fused = self._level2_inv_fused(Yl, lvl_b, curr, prev)
                if fused is not None:
                    Yl = fused
                else:
                    Yl = self._level2_inv(Yl, oct_of(level), curr,
                                          g0a, g0b, g1a, g1b, prev)
            oc = oct_of(0)
            oc[(0, 0, 0)] = Yl
            V = {}
            for j in range(2):
                for k in range(2):
                    V[(j, k)] = adjops.filter2_sum_adj_axis(
                        oc[(0, j, k)], oc[(1, j, k)], h0o, h1o, -3)
            u0 = adjops.filter2_sum_adj_axis(V[(0, 0)], V[(1, 0)],
                                             h0o, h1o, -2)
            u1 = adjops.filter2_sum_adj_axis(V[(0, 1)], V[(1, 1)],
                                             h0o, h1o, -2)
            return adjops.filter2_sum_adj_axis(u0, u1, h0o, h1o, -1)
        return adj

    def _inv_adjoint_fn(self, pyramid):
        planes = isinstance(pyramid, PlanePyramid)
        if not planes and not isinstance(pyramid, Pyramid):
            return None
        if len(self.biort) != 4 or len(self.qshift) != 8:
            return None
        if pyramid.scales is not None:
            return None
        if self.biort[0].size % 2 == 0:
            return None
        if planes:
            if pyramid.kind != "3d":
                return None
            if any(r is None for r in pyramid.highpasses_re):
                return None
            shapes = [tuple(r.shape[-3:]) for r in pyramid.highpasses_re]
            if any(jnp.result_type(r) != jnp.float32
                   for r in pyramid.highpasses_re):
                return None
        else:
            if any(h is None for h in pyramid.highpasses):
                return None
            shapes = [tuple(h.shape[-4:-1]) for h in pyramid.highpasses]
        nlevels = len(shapes)
        if nlevels < 1:
            return None
        if jnp.result_type(pyramid.lowpass) != jnp.float32:
            return None
        for lvl in range(1, nlevels):
            if shapes[lvl - 1] != tuple(2 * s for s in shapes[lvl]):
                return None
        if tuple(pyramid.lowpass.shape[-3:]) != tuple(
                2 * s for s in shapes[-1]):
            return None
        if not self._adjoint_shapes_ok(
                tuple(2 * s for s in shapes[0]), nlevels):
            return None
        g0o, g1o = self.biort[1], self.biort[3]
        q = self.qshift
        h0a, h0b, h1a, h1b = q[0], q[1], q[4], q[5]

        def adj(xbar):
            from dtcwt_tpu.ops import adjoint as adjops
            u0b, u1b = adjops.filter2_adj_axis(jnp.asarray(xbar),
                                               g0o, g1o, -1)
            V00b, V10b = adjops.filter2_adj_axis(u0b, g0o, g1o, -2)
            V01b, V11b = adjops.filter2_adj_axis(u1b, g0o, g1o, -2)
            octb = {}
            for (j, k), vb in (((0, 0), V00b), ((1, 0), V10b),
                               ((0, 1), V01b), ((1, 1), V11b)):
                octb[(0, j, k)], octb[(1, j, k)] = adjops.filter2_adj_axis(
                    vb, g0o, g1o, -3)
            glll = octb[(0, 0, 0)]
            hp1 = self._pack_octants([octb[o] for o in _OCTANTS], planes,
                                     dtype=jnp.float32)
            if planes:
                res, ims = [hp1[0]], [hp1[1]]
            else:
                Yh_cot = [jnp.conj(hp1)]
            for level in range(1, nlevels):
                glll, hp = self._level2_fwd(glll, h0a, h0b, h1a, h1b,
                                            planes=planes)
                if planes:
                    res.append(hp[0])
                    ims.append(hp[1])
                else:
                    Yh_cot.append(jnp.conj(hp))
            if planes:
                return PlanePyramid(glll, tuple(res), tuple(ims), None,
                                    kind="3d")
            return Pyramid(glll, tuple(Yh_cot), None)
        return adj

    def _forward_body(self, X, *, nlevels, include_scale, discard_level_1,
                      layout="interleaved"):
        planes = layout == "planes"
        b = self.biort
        h0o, h1o = b[0], b[2]
        q = self.qshift
        h0a, h0b, h1a, h1b = q[0], q[1], q[4], q[5]

        if not jnp.issubdtype(X.dtype, jnp.inexact):
            X = X.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
        if X.dtype == jnp.bfloat16 and not planes:
            # No bfloat16 complex dtype exists; only the plane layout can
            # store bf16 subbands.
            X = X.astype(jnp.float32)

        Yl = X
        Yh = []
        Yscale = []
        for level in range(nlevels):
            if level == 0 and discard_level_1:
                Yl = self._level1_lowpass_only(Yl, h0o)
                Yh.append((None, None) if planes else None)
            elif level == 0:
                Yl, hp = self._level1_fwd(Yl, h0o, h1o, planes=planes)
                Yh.append(hp)
            else:
                Yl, hp = self._level2_fwd(Yl, h0a, h0b, h1a, h1b,
                                          planes=planes)
                Yh.append(hp)
            if include_scale:
                Yscale.append(Yl)
        scales = tuple(Yscale) if include_scale else None
        if planes:
            return PlanePyramid(Yl, tuple(r for r, _ in Yh),
                                tuple(i for _, i in Yh), scales, kind="3d")
        return Pyramid(Yl, tuple(Yh), scales)

    @staticmethod
    def _pack_octants(octs, planes: bool, dtype=None):
        """Concatenate the 7 octant packs into the 28-band level: trailing
        band axis (interleaved complex) or leading band-major plane axis.
        *dtype* downcasts plane output back to the storage dtype (bf16)."""
        if planes:
            parts = [cube2c_planes(v) for v in octs]
            re = jnp.concatenate([r for r, _ in parts], axis=-4)
            im = jnp.concatenate([i for _, i in parts], axis=-4)
            if dtype is not None:
                re, im = re.astype(dtype), im.astype(dtype)
            return re, im
        return jnp.concatenate([cube2c(v) for v in octs], axis=-1)

    @staticmethod
    def _level1_fwd(X, h0o, h1o, planes: bool = False):
        # Separable tree along dims (-1, -2, -3); branch index 0 = lowpass.
        # (The reference's double-size work array and its even-filter edge
        # pads are not needed: the padded samples are never consumed.)
        # Each stage emits BOTH branches from one read of its input
        # (fb.filter2_axis), halving the tree's HBM read traffic; in the
        # two-sided kernel envelope the whole (W, H) stage pair runs as one
        # pass per depth slice (ops/pallas_hw.py: 1 read -> 4 writes).
        sdt = X.dtype
        t21 = None
        if engine.use_pallas():
            from dtcwt_tpu.ops import pallas_hw, pallas_pack3d
            # fully fused level 1: (H, W) MXU stage pair + depth filter +
            # in-kernel cube2c packing (f32; bf16/even filters decline)
            out = pallas_pack3d.fwd_level1_pack(X, h0o, h1o,
                                                as_planes=planes)
            if out is not None:
                return out
            hw = pallas_hw.filter_hw22(X, h0o, h1o)  # bf16 in/out, f32 MXU
            if hw is not None:
                t21 = [[_comp(hw[0][k]), _comp(hw[1][k])] for k in range(2)]
        if t21 is None:
            t2 = fb.filter2_axis(_comp(X), h0o, h1o, -1)
            t21 = [fb.filter2_axis(v, h0o, h1o, -2) for v in t2]
        oct_ = {}
        for j in range(2):          # dim -2 half
            for k in range(2):      # dim -1 half
                v = t21[k][j]
                oct_[(0, j, k)], oct_[(1, j, k)] = fb.filter2_axis(
                    v, h0o, h1o, -3)

        even = h0o.size % 2 == 0
        lll = oct_[(0, 0, 0)]
        if even:
            # highpass octants drop the extra trailing sample the even-length
            # filters produce (reference keeps the x-ranges only,
            # transform3d.py:236-241,278-289); the lowpass keeps it.
            def trim(v):
                for ax in (-3, -2, -1):
                    v = jax.lax.slice_in_dim(v, 0, v.shape[ax] - 1, axis=ax)
                return v
        else:
            def trim(v):
                return v
        hp = Transform3d._pack_octants([trim(oct_[o]) for o in _OCTANTS],
                                       planes, dtype=sdt)
        return lll.astype(sdt), hp

    @staticmethod
    def _level1_lowpass_only(X, h0o):
        if h0o.size % 2 == 0:
            raise ValueError("discard_level_1 requires odd-length level-1"
                             " filters")
        # reference order: dims 2, 1, 0 (transform3d.py:304-313)
        out = fb.filter_axis(_comp(X), h0o, -1)
        out = fb.filter_axis(out, h0o, -2)
        out = fb.filter_axis(out, h0o, -3)
        return out.astype(X.dtype)

    def _level2_fwd(self, X, h0a, h0b, h1a, h1b, planes: bool = False):
        div = self.ext_mode
        rep = 1 if div == 4 else 2
        for ax in (-3, -2, -1):
            if X.shape[ax] % div != 0:
                X = _repeat_edges(X, ax, rep)
        sdt = X.dtype
        t21 = None
        if engine.use_pallas():
            from dtcwt_tpu.ops import pallas_hw, pallas_pack3d
            # fully fused level >= 2: depth dfilt stage + one per-pair
            # (H, W) MXU pack kernel (f32; bf16/off-envelope declines)
            out = pallas_pack3d.fwd_level2_pack(
                _comp(X), (h0b, h0a), (h1b, h1a), as_planes=planes)
            if out is not None:
                lll, hp = out
                if planes and sdt != lll.dtype:
                    hp = (hp[0].astype(sdt), hp[1].astype(sdt))
                return lll.astype(sdt), hp
            hw = pallas_hw.dfilt_hw22(X, (h0b, h0a), (h1b, h1a))
            if hw is not None:
                t21 = [[_comp(hw[0][k]), _comp(hw[1][k])] for k in range(2)]
        if t21 is None:
            t2 = fb.dfilt2_axis(_comp(X), (h0b, h0a), (h1b, h1a), -1)
            t21 = [fb.dfilt2_axis(v, (h0b, h0a), (h1b, h1a), -2) for v in t2]
        oct_ = {}
        for j in range(2):
            for k in range(2):
                v = t21[k][j]
                oct_[(0, j, k)], oct_[(1, j, k)] = fb.dfilt2_axis(
                    v, (h0b, h0a), (h1b, h1a), -3)
        lll = oct_[(0, 0, 0)]
        hp = self._pack_octants([oct_[o] for o in _OCTANTS], planes,
                                dtype=sdt)
        return lll.astype(sdt), hp

    # ------------------------------------------------------------------
    # inverse
    # ------------------------------------------------------------------
    def inverse(self, pyramid: Pyramid):
        """Inverse transform of a :class:`Pyramid` or 3-D
        :class:`PlanePyramid`.  A ``None`` first highpass entry (from
        ``discard_level_1``) is treated as zero."""
        pyramid = pyramid_to_device(pyramid)
        return self._inv(pyramid, ek=engine.trace_key())

    def _inverse_impl(self, pyramid: Pyramid, *, ek=None):
        impl = lambda p: self._inverse_body(p)
        if engine.use_pallas():
            from dtcwt_tpu.ops.linearize import linear_vjp
            spec = jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), pyramid)
            return linear_vjp(impl, spec,
                              adjoint=self._inv_adjoint_fn(pyramid))(pyramid)
        return impl(pyramid)

    def _inverse_body(self, pyramid: Pyramid):
        b = self.biort
        g0o, g1o = b[1], b[3]
        q = self.qshift
        g0a, g0b, g1a, g1b = q[2], q[3], q[6], q[7]

        if isinstance(pyramid, PlanePyramid):
            Yb = tuple(zip(pyramid.highpasses_re, pyramid.highpasses_im))
            has = lambda lvl: Yb[lvl][0] is not None
            spatial = lambda lvl: Yb[lvl][0].shape[-3:]
            oct_at = lambda lvl: self._octants_planes(*Yb[lvl])
            nlevels = len(Yb)
        else:
            Yh = pyramid.highpasses
            has = lambda lvl: Yh[lvl] is not None
            spatial = lambda lvl: Yh[lvl].shape[-4:-1]
            oct_at = lambda lvl: self._octants(Yh[lvl])
            nlevels = len(Yh)
        Yl = jnp.asarray(pyramid.lowpass)

        for level in range(nlevels - 1, 0, -1):
            if has(level - 1):
                prev_shape = spatial(level - 1)
            else:
                prev_shape = tuple(2 * s for s in spatial(level))
            fused = None
            if engine.use_pallas():
                lvl = (Yb[level] if isinstance(pyramid, PlanePyramid)
                       else Yh[level])
                fused = self._level2_inv_fused(Yl, lvl, spatial(level),
                                               prev_shape)
            if fused is not None:
                Yl = fused.astype(Yl.dtype)
                continue
            Yl = self._level2_inv(Yl, oct_at(level), spatial(level),
                                  g0a, g0b, g1a, g1b, prev_shape)
        if nlevels >= 1:
            if not has(0):
                Yl = self._level1_inv_lowpass_only(Yl, g0o)
            else:
                fused = None
                if engine.use_pallas():
                    level0 = (Yb[0] if isinstance(pyramid, PlanePyramid)
                              else Yh[0])
                    fused = self._level1_inv_fused(Yl, level0, g0o, g1o)
                Yl = (fused if fused is not None
                      else self._level1_inv(Yl, oct_at(0), g0o, g1o))
        return Yl

    def _level2_inv_fused(self, Yl, level_bands, curr, prev_shape):
        """Fused level->=2 inverse (per-pair unpack kernel + dual-sum depth
        merge, ops/pallas_pack3d.py) with the reference crop rule applied;
        None off-envelope."""
        from dtcwt_tpu.ops import pallas_pack3d
        q = self.qshift
        g0a, g0b, g1a, g1b = q[2], q[3], q[6], q[7]
        if isinstance(level_bands, tuple):
            re, im = _comp(level_bands[0]), _comp(level_bands[1])
        else:
            re = jnp.stack([jnp.real(level_bands[..., n])
                            for n in range(28)], axis=-4)
            im = jnp.stack([jnp.imag(level_bands[..., n])
                            for n in range(28)], axis=-4)
        out = pallas_pack3d.inv_level2_pack(_comp(Yl), re, im,
                                            (g0b, g0a), (g1b, g1a))
        if out is None:
            return None
        crop = 1 if self.ext_mode == 4 else 2
        for d, ax in enumerate((-3, -2, -1)):
            if 2 * curr[d] != prev_shape[d]:
                out = _crop(out, ax, crop)
        return out

    @staticmethod
    def _level1_inv_fused(Yl, level0, g0o, g1o):
        """Fused level-1 inverse (unpack + depth merge + two-sided (H, W)
        merge in two kernels, ops/pallas_pack3d.py); None off-envelope."""
        from dtcwt_tpu.ops import pallas_pack3d
        if isinstance(level0, tuple):
            re, im = level0
        else:
            # band-minor complex -> band-major planes via static slices
            # (an index permutation would lower to a gather)
            re = jnp.stack([jnp.real(level0[..., n]) for n in range(28)],
                           axis=-4)
            im = jnp.stack([jnp.imag(level0[..., n]) for n in range(28)],
                           axis=-4)
        return pallas_pack3d.inv_level1_pack(Yl, re, im, g0o, g1o)

    @staticmethod
    def _octants(Yh):
        """Split a 28-band level into the 7 real octet volumes."""
        out = {}
        for n, o in enumerate(_OCTANTS):
            out[o] = c2cube(Yh[..., 4 * n:4 * n + 4])
        return out

    @staticmethod
    def _octants_planes(re, im):
        """Octet volumes from band-major plane-layout re/im arrays
        (``[..., 28, P, Q, R]``) — no complex ops.  bf16 planes are
        storage: the corner combinations (three chained additions each)
        run at f32 like every other arithmetic stage."""
        re, im = _comp(re), _comp(im)
        out = {}
        for n, o in enumerate(_OCTANTS):
            out[o] = c2cube_planes(re[..., 4 * n:4 * n + 4, :, :, :],
                                   im[..., 4 * n:4 * n + 4, :, :, :])
        return out

    @staticmethod
    def _synth(oct_, merge, hw_sum=None):
        """Separable synthesis.  *merge(a, b, ax)* fuses one stage's branch
        pair (lowpass-synth of *a* + highpass-synth of *b*) in a single pass
        (fb dual-stream sum primitives).

        Without *hw_sum* this runs the reference pass order (-2, -3, -1)
        (transform3d.py:425-435, :485-495).  With *hw_sum* (a
        :mod:`ops.pallas_hw` two-sided merge, or None-returning outside its
        envelope) the depth stage runs first and the (H, W) stage pair
        fuses into one kernel pass — the axis order is immaterial for a
        separable linear map, and the f64 oracle path never takes this
        branch (hw_sum is gated on the fast engines)."""
        if hw_sum is not None:
            V = {}
            for j in range(2):
                for k in range(2):
                    V[(j, k)] = merge(oct_[(0, j, k)], oct_[(1, j, k)], -3)
            out = hw_sum(V[(0, 0)], V[(0, 1)], V[(1, 0)], V[(1, 1)])
            if out is None:
                out = merge(merge(V[(0, 0)], V[(1, 0)], -2),
                            merge(V[(0, 1)], V[(1, 1)], -2), -1)
            return out
        U = {}
        for i in range(2):
            for k in range(2):
                U[(i, k)] = merge(oct_[(i, 0, k)], oct_[(i, 1, k)], -2)
        V = {}
        for k in range(2):
            V[k] = merge(U[(0, k)], U[(1, k)], -3)
        return merge(V[0], V[1], -1)

    def _level2_inv(self, Yl, oct_, curr, g0a, g0b, g1a, g1b, prev_shape):
        sdt = Yl.dtype
        hw_sum = None
        if engine.use_pallas():
            from dtcwt_tpu.ops import pallas_hw
            hw_sum = lambda *v: pallas_hw.ifilt_sum_hw22(
                *v, (g0b, g0a), (g1b, g1a))
        # bf16 is storage: the synthesis stages (kernel or fb fallback)
        # run at f32 — _octants_planes already promoted the octants, and
        # the lowpass must match or the hw22 dtype gate would decline.
        Yl = _comp(Yl)
        oct_ = {k: _comp(v) for k, v in oct_.items()}
        oct_[(0, 0, 0)] = Yl

        def merge(a, b, ax):
            return fb.ifilt2_sum_axis(a, b, (g0b, g0a), (g1b, g1a), ax)

        out = self._synth(oct_, merge, hw_sum)

        crop = 1 if self.ext_mode == 4 else 2
        for d, ax in enumerate((-3, -2, -1)):
            if 2 * curr[d] != prev_shape[d]:
                out = _crop(out, ax, crop)
        return out.astype(sdt)

    @staticmethod
    def _level1_inv(Yl, oct_, g0o, g1o):
        sdt = Yl.dtype
        even = g0o.size % 2 == 0
        if even:
            # drop the lowpass's extra trailing sample per dim (reference
            # x-ranges, transform3d.py:408-413)
            for ax in (-3, -2, -1):
                Yl = jax.lax.slice_in_dim(Yl, 0, Yl.shape[ax] - 1, axis=ax)
        hw_sum = None
        if engine.use_pallas():
            from dtcwt_tpu.ops import pallas_hw
            hw_sum = lambda *v: pallas_hw.filter_sum_hw22(*v, g0o, g1o)
        Yl = _comp(Yl)
        oct_ = {k: _comp(v) for k, v in oct_.items()}
        oct_[(0, 0, 0)] = Yl

        def merge(a, b, ax):
            return fb.filter2_sum_axis(a, b, g0o, g1o, ax)

        out = Transform3d._synth(oct_, merge, hw_sum)
        if even:
            for ax in (-3, -2, -1):
                out = jax.lax.slice_in_dim(out, 1, out.shape[ax], axis=ax)
        return out.astype(sdt)

    @staticmethod
    def _level1_inv_lowpass_only(Yl, g0o):
        # Reference order: dims 1, 0, 2 (transform3d.py:450-457).  Note the
        # reference has a missing transpose in its third pass (:456 assigns
        # a [dim2, dim0] result into a [dim0, dim2] slot, silently
        # transposing each slice on cube-shaped volumes); we implement the
        # mathematically correct separable synthesis — its own behavioral
        # gate (median recon error < 1e-3, test_xfm3.py:152-159) passes
        # either way.
        out = fb.filter_axis(_comp(Yl), g0o, -2)
        out = fb.filter_axis(out, g0o, -3)
        out = fb.filter_axis(out, g0o, -1)
        return out.astype(Yl.dtype)
