"""Multi-chip 2-D DTCWT: batch data-parallel + spatial row-sharding.

The global transform is numerically IDENTICAL to
:class:`dtcwt_tpu.transforms.transform2d.Transform2d` (same boundary rules,
same subband packing); tests assert bit-level equality between the sharded
and single-device paths on a virtual CPU mesh.  Design (SURVEY.md §2
parallelism table, §7 step 5):

* mesh ``('data', 'rows')`` — batch over ``data``, image rows over ``rows``;
* before each level's column pass, shards exchange filter-support halos
  (width = biort ``len(h)//2`` at level 1, qshift ``len(h)`` at levels >= 2)
  with ``lax.ppermute`` over ICI; only the physical top/bottom shards apply
  the reflect boundary rule;
* row (width-axis) passes are shard-local;
* once the decimated lowpass becomes too small to shard cleanly (local rows
  not a multiple of 4, smaller than the halo, or a global mult-of-4 pad is
  required), the rows axis is ``all_gather``-ed and the remaining coarse
  levels run replicated — they are tiny.

Alignment argument: each shard's local column computation equals the global
one because local row counts stay multiples of 4 while sharded, so every
shard's polyphase/quarter-phase grids coincide with the global grids.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from dtcwt_tpu.ops import fb
from dtcwt_tpu.ops.packing import q2c, c2q
from dtcwt_tpu.parallel.halo import halo_exchange
from dtcwt_tpu.transforms.pyramid import Pyramid
from dtcwt_tpu.transforms.transform2d import (
    DEFAULT_BIORT, DEFAULT_QSHIFT, Transform2d, normalize_biort,
    normalize_qshift)

__all__ = ["ShardedTransform2d"]


def _sliced_ext(ext, halo: int, need: int, axis: int):
    """Trim a halo-extended buffer to extension width *need* per side."""
    if halo == need:
        return ext
    n = ext.shape[axis]
    return lax.slice_in_dim(ext, halo - need, n - (halo - need), axis=axis)


class ShardedTransform2d:
    """An n-level 2-D DTCWT over a device mesh.

    :param mesh: a :class:`jax.sharding.Mesh` with a batch axis and a row
        axis (default names ``'data'`` and ``'rows'``).
    :param biort, qshift: wavelets, as for :class:`Transform2d`.

    ``forward``/``inverse`` accept and produce global ``[B, H, W]`` arrays /
    Pyramids; per-device layout is managed internally via ``shard_map``.
    """

    def __init__(self, mesh, biort=DEFAULT_BIORT, qshift=DEFAULT_QSHIFT,
                 data_axis: str = "data", rows_axis: str = "rows"):
        self.mesh = mesh
        self.biort = normalize_biort(biort)
        self.qshift = normalize_qshift(qshift)
        self.data_axis = data_axis
        self.rows_axis = rows_axis
        if data_axis not in mesh.axis_names or rows_axis not in mesh.axis_names:
            raise ValueError("mesh must define axes %r and %r"
                             % (data_axis, rows_axis))
        self._nrows = mesh.shape[rows_axis]
        # Reference single-device implementation used for the replicated
        # coarse-level fallback (same filters).
        self._single = Transform2d(self.biort, self.qshift)

    # ------------------------------------------------------------------
    # static planning: which levels stay row-sharded?
    # ------------------------------------------------------------------
    def _plan(self, H: int, W: int, nlevels: int) -> List[bool]:
        """For each level (1-indexed level i at plan[i-1]) decide whether its
        column pass runs row-sharded, by simulating the shape evolution."""
        R = self._nrows
        b = self.biort
        q = self.qshift
        halo1 = max(v.size // 2 for v in b)
        halo2 = max(v.size for v in q)
        plan = []
        h = H + (H % 2)
        w = W + (W % 2)
        sharded = True
        for level in range(nlevels):
            if level == 0:
                sharded = sharded and h % R == 0 and (h // R) % 2 == 0 \
                    and (h // R) >= halo1
                plan.append(sharded)
                h, w = h >> 1, w >> 1  # subband grid; lowpass stays full
                hl, wl = 2 * h, 2 * w
            else:
                # global mult-of-4 pad must not be needed while sharded
                need_pad = hl % 4 != 0
                sharded = sharded and not need_pad and hl % R == 0 \
                    and (hl // R) % 4 == 0 and (hl // R) >= halo2
                plan.append(sharded)
                if hl % 4 != 0:
                    hl += 2
                if wl % 4 != 0:
                    wl += 2
                hl, wl = hl >> 1, wl >> 1
        return plan

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------
    def forward(self, X, nlevels: int = 3) -> Pyramid:
        X = jnp.asarray(X)
        if X.ndim != 3:
            raise ValueError("ShardedTransform2d.forward expects [B, H, W]")
        return self._fwd_built(X.shape, X.dtype, nlevels)(X)

    @functools.lru_cache(maxsize=None)
    def _fwd_built(self, shape, dtype, nlevels: int):
        B, H, W = shape
        plan = self._plan(H, W, nlevels)
        da, ra = self.data_axis, self.rows_axis
        R = self._nrows
        b = self.biort
        h0o, h1o = b[0], b[2]
        h2o = b[4] if len(b) == 6 else None
        qs = self.qshift
        h0a, h0b, h1a, h1b = qs[0], qs[1], qs[4], qs[5]
        h2a, h2b = (qs[8], qs[9]) if len(qs) == 12 else (None, None)
        halo1 = max(v.size // 2 for v in (h0o, h1o) + ((h2o,) if h2o is not None else ()))
        halo2 = max(v.size for v in (h0a, h1a) + ((h2a,) if h2a is not None else ()))

        sharded_spec = P(da, ra, None)
        repl_spec = P(da, None, None)

        def spec_for(level_sharded, extra_dims=1):
            base = sharded_spec if level_sharded else repl_spec
            return P(*(tuple(base) + (None,) * extra_dims))

        out_specs = (
            sharded_spec if plan[-1] else repl_spec,            # lowpass
            tuple(spec_for(s) for s in plan),                   # highpasses
        )

        def local_fwd(x):
            # x: [B/d, H/r, W] (rows locally sharded)
            if not jnp.issubdtype(x.dtype, jnp.inexact):
                x = x.astype(jnp.float32)
            Yh = []
            cur = x
            cur_sharded = True
            for level in range(nlevels):
                if plan[level] != cur_sharded:
                    # gather rows; remaining levels run replicated
                    cur = lax.all_gather(cur, ra, axis=1, tiled=True)
                    cur_sharded = False
                if level == 0:
                    if cur.shape[-1] % 2 != 0:
                        last = cur[..., -1:]
                        cur = jnp.concatenate([cur, last], axis=-1)
                    # (odd global H with sharding is rejected by _plan)
                    if not cur_sharded and cur.shape[-2] % 2 != 0:
                        cur = jnp.concatenate([cur, cur[..., -1:, :]], axis=-2)
                    if cur_sharded:
                        ext = halo_exchange(cur, halo1, ra, R, axis=-2)
                    else:
                        ext = fb.symmetric_extend(cur, halo1, -2)
                    lo = fb.filter_from_ext(
                        _sliced_ext(ext, halo1, h0o.size // 2, -2), h0o, -2)
                    hi = fb.filter_from_ext(
                        _sliced_ext(ext, halo1, h1o.size // 2, -2), h1o, -2)
                    lolo = fb.filter_axis(lo, h0o, -1)
                    band05 = q2c(fb.filter_axis(hi, h0o, -1))
                    band23 = q2c(fb.filter_axis(lo, h1o, -1))
                    if h2o is not None:
                        ba = fb.filter_from_ext(
                            _sliced_ext(ext, halo1, h2o.size // 2, -2), h2o, -2)
                        band14 = q2c(fb.filter_axis(ba, h2o, -1))
                    else:
                        band14 = q2c(fb.filter_axis(hi, h1o, -1))
                else:
                    if not cur_sharded:
                        if cur.shape[-2] % 4 != 0:
                            cur = jnp.concatenate(
                                [cur[..., :1, :], cur, cur[..., -1:, :]], axis=-2)
                    if cur.shape[-1] % 4 != 0:
                        cur = jnp.concatenate(
                            [cur[..., :, :1], cur, cur[..., :, -1:]], axis=-1)
                    if cur_sharded:
                        ext = halo_exchange(cur, halo2, ra, R, axis=-2)
                    else:
                        ext = fb.symmetric_extend(cur, halo2, -2)
                    lo = fb.dfilt_from_ext(
                        _sliced_ext(ext, halo2, h0a.size, -2), h0b, h0a, -2)
                    hi = fb.dfilt_from_ext(
                        _sliced_ext(ext, halo2, h1a.size, -2), h1b, h1a, -2)
                    if h2b is not None:
                        ba = fb.dfilt_from_ext(
                            _sliced_ext(ext, halo2, h2a.size, -2), h2b, h2a, -2)
                    lolo = fb.dfilt_axis(lo, h0b, h0a, -1)
                    band05 = q2c(fb.dfilt_axis(hi, h0b, h0a, -1))
                    band23 = q2c(fb.dfilt_axis(lo, h1b, h1a, -1))
                    if h2b is not None:
                        band14 = q2c(fb.dfilt_axis(ba, h2b, h2a, -1))
                    else:
                        band14 = q2c(fb.dfilt_axis(hi, h1b, h1a, -1))
                Yh.append(jnp.stack([band05[0], band14[0], band23[0],
                                     band23[1], band14[1], band05[1]], axis=-1))
                cur = lolo
            return (cur, tuple(Yh))

        # check_vma=False: coarse levels after the rows all_gather are
        # replicated by construction, but the static checker cannot see
        # through the inner-jitted filter primitives to infer it.
        shmapped = jax.shard_map(
            local_fwd, mesh=self.mesh,
            in_specs=(sharded_spec,), out_specs=out_specs, check_vma=False)

        @jax.jit
        def run(X):
            lowpass, Yh = shmapped(X)
            return Pyramid(lowpass, Yh)

        return run

    # ------------------------------------------------------------------
    # inverse
    # ------------------------------------------------------------------
    def inverse(self, pyramid: Pyramid):
        nlevels = len(pyramid.highpasses)
        shapes = tuple(tuple(h.shape) for h in pyramid.highpasses)
        return self._inv_built(tuple(pyramid.lowpass.shape), shapes,
                               pyramid.lowpass.dtype, nlevels)(pyramid)

    @functools.lru_cache(maxsize=None)
    def _inv_built(self, low_shape, hp_shapes, dtype, nlevels: int):
        da, ra = self.data_axis, self.rows_axis
        R = self._nrows
        b = self.biort
        g0o, g1o = b[1], b[3]
        g2o = b[5] if len(b) == 6 else None
        qs = self.qshift
        g0a, g0b, g1a, g1b = qs[2], qs[3], qs[6], qs[7]
        g2a, g2b = (qs[10], qs[11]) if len(qs) == 12 else (None, None)
        halo2 = max(v.size // 2 for v in (g0a, g1a) + ((g2a,) if g2a is not None else ()))
        halo1 = max(v.size // 2 for v in (g0o, g1o) + ((g2o,) if g2o is not None else ()))

        # The sharded inverse requires: no crops (shapes exactly double each
        # level) and local rows stay shardable.  Otherwise run replicated.
        ok = True
        for level in range(nlevels - 1, 0, -1):
            hr = hp_shapes[level][-3]
            want = hp_shapes[level - 1][-3]
            ok = ok and (2 * hr == want)
            ok = ok and (2 * hr) % R == 0 and ((2 * hr) // R) % 2 == 0
        if nlevels >= 1:
            ok = ok and (2 * hp_shapes[0][-3]) % R == 0
        lowr = low_shape[-2]
        ok = ok and lowr % R == 0 and (lowr // R) % 2 == 0 \
            and (lowr // R) >= halo2

        sharded_spec = P(da, ra, None)
        if not ok:
            # Replicated rows fallback: correctness first for awkward shapes.
            single = self._single

            @jax.jit
            def run_repl(pyr):
                return single.inverse(pyr)
            return run_repl

        hp_specs = tuple(P(da, ra, None, None) for _ in range(nlevels))

        def local_inv(lowpass, *Yh):
            Z = lowpass
            for level in range(nlevels - 1, 0, -1):
                yh = Yh[level]
                lh = c2q(yh[..., 0], yh[..., 5])
                hl = c2q(yh[..., 2], yh[..., 3])
                hh = c2q(yh[..., 1], yh[..., 4])

                def colifilt_sh(v, ga, gb):
                    ext = halo_exchange(v, ga.size // 2, ra, R, axis=-2)
                    return fb.ifilt_from_ext(ext, ga, gb, -2)

                y1 = colifilt_sh(Z, g0b, g0a) + colifilt_sh(lh, g1b, g1a)
                if g2b is not None:
                    y2 = colifilt_sh(hl, g0b, g0a)
                    y2bp = colifilt_sh(hh, g2b, g2a)
                    Z = (fb.ifilt_axis(y1, g0b, g0a, -1)
                         + fb.ifilt_axis(y2, g1b, g1a, -1)
                         + fb.ifilt_axis(y2bp, g2b, g2a, -1))
                else:
                    y2 = colifilt_sh(hl, g0b, g0a) + colifilt_sh(hh, g1b, g1a)
                    Z = (fb.ifilt_axis(y1, g0b, g0a, -1)
                         + fb.ifilt_axis(y2, g1b, g1a, -1))
            yh = Yh[0]
            lh = c2q(yh[..., 0], yh[..., 5])
            hl = c2q(yh[..., 2], yh[..., 3])
            hh = c2q(yh[..., 1], yh[..., 4])

            def colfilter_sh(v, g):
                ext = halo_exchange(v, g.size // 2, ra, R, axis=-2)
                return fb.filter_from_ext(ext, g, -2)

            y1 = colfilter_sh(Z, g0o) + colfilter_sh(lh, g1o)
            if g2o is not None:
                y2 = colfilter_sh(hl, g0o)
                y2bp = colfilter_sh(hh, g2o)
                Z = (fb.filter_axis(y1, g0o, -1)
                     + fb.filter_axis(y2, g1o, -1)
                     + fb.filter_axis(y2bp, g2o, -1))
            else:
                y2 = colfilter_sh(hl, g0o) + colfilter_sh(hh, g1o)
                Z = fb.filter_axis(y1, g0o, -1) + fb.filter_axis(y2, g1o, -1)
            return Z

        shmapped = jax.shard_map(
            local_inv, mesh=self.mesh,
            in_specs=(sharded_spec,) + hp_specs,
            out_specs=sharded_spec)

        @jax.jit
        def run(pyr):
            return shmapped(pyr.lowpass, *pyr.highpasses)

        return run
