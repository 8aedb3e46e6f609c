"""Multi-chip 1-D DTCWT: batch data-parallel + signal-axis sharding.

Long 1-D signals shard their *sample* axis across the mesh — the DTCWT
analogue of sequence/context parallelism.  Before each level's filter pass
the shards exchange only filter-support halos (<= 18 samples) via
``lax.ppermute`` ring neighbours over ICI; the reflect boundary rule applies
only on the physical first/last shard.  Once the decimated signal becomes
too short to shard cleanly it is ``all_gather``-ed and the coarse levels run
replicated (they are tiny).

The result is numerically identical to
:class:`dtcwt_tpu.transforms.transform1d.Transform1d`; tests assert equality
on a virtual CPU mesh.  (The reference library has no distributed execution
at all — SURVEY.md §2 parallelism table, "ring/sequence parallel" row.)
"""

from __future__ import annotations

import functools
from typing import List

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from dtcwt_tpu.ops import fb
from dtcwt_tpu.ops.packing import q2c1d, c2q1d
from dtcwt_tpu.parallel.halo import halo_exchange
from dtcwt_tpu.transforms.pyramid import Pyramid
from dtcwt_tpu.transforms.transform2d import (
    DEFAULT_BIORT, DEFAULT_QSHIFT, normalize_biort, normalize_qshift)

__all__ = ["ShardedTransform1d"]


def _sliced_ext(ext, halo: int, need: int, axis: int):
    if halo == need:
        return ext
    n = ext.shape[axis]
    return lax.slice_in_dim(ext, halo - need, n - (halo - need), axis=axis)


class ShardedTransform1d:
    """An n-level 1-D DTCWT over a device mesh.

    ``forward``/``inverse`` take and return global ``[B, N, C]`` arrays /
    Pyramids (signals along axis -2, as in :class:`Transform1d` for 3-D
    inputs); the signal axis is sharded over ``rows_axis``.
    """

    def __init__(self, mesh, biort=DEFAULT_BIORT, qshift=DEFAULT_QSHIFT,
                 data_axis: str = "data", rows_axis: str = "rows"):
        self.mesh = mesh
        self.biort = normalize_biort(biort)
        self.qshift = normalize_qshift(qshift)
        if len(self.biort) != 4 or len(self.qshift) != 8:
            raise ValueError("1-D transform does not use bandpass variants")
        self.data_axis = data_axis
        self.rows_axis = rows_axis
        self._nrows = mesh.shape[rows_axis]

    def _plan(self, N: int, nlevels: int) -> List[bool]:
        """Per level: does its filter pass run signal-sharded?"""
        R = self._nrows
        halo1 = max(v.size // 2 for v in self.biort)
        halo2 = max(v.size for v in self.qshift)
        plan = []
        n = N
        sharded = True
        for level in range(nlevels):
            if level == 0:
                sharded = (sharded and n % R == 0 and (n // R) % 2 == 0
                           and (n // R) >= halo1)
            else:
                need_pad = n % 4 != 0
                sharded = (sharded and not need_pad and n % R == 0
                           and (n // R) % 4 == 0 and (n // R) >= halo2)
                if need_pad:
                    n += 2
                n >>= 1
            plan.append(sharded)
        return plan

    # ------------------------------------------------------------------
    def forward(self, X, nlevels: int = 3) -> Pyramid:
        X = jnp.asarray(X)
        if X.ndim != 3:
            raise ValueError("ShardedTransform1d.forward expects [B, N, C]")
        if X.shape[-2] % 2 != 0:
            raise ValueError("Size of input X must be a multiple of 2")
        return self._fwd_built(X.shape, X.dtype, nlevels)(X)

    @functools.lru_cache(maxsize=None)
    def _fwd_built(self, shape, dtype, nlevels: int):
        B, N, C = shape
        plan = self._plan(N, nlevels)
        da, ra = self.data_axis, self.rows_axis
        R = self._nrows
        h0o, _, h1o, _ = self.biort
        h0a, h0b, _, _, h1a, h1b, _, _ = self.qshift
        halo1 = max(h0o.size // 2, h1o.size // 2)
        halo2 = max(h0a.size, h1a.size)

        sharded_spec = P(da, ra, None)
        repl_spec = P(da, None, None)
        out_specs = (sharded_spec if plan[-1] else repl_spec,
                     tuple(sharded_spec if s else repl_spec for s in plan))

        def local_fwd(x):
            if not jnp.issubdtype(x.dtype, jnp.inexact):
                x = x.astype(jnp.float32)
            Yh = []
            cur = x
            cur_sharded = True
            for level in range(nlevels):
                if plan[level] != cur_sharded:
                    cur = lax.all_gather(cur, ra, axis=1, tiled=True)
                    cur_sharded = False
                if level == 0:
                    if cur_sharded:
                        ext = halo_exchange(cur, halo1, ra, R, axis=-2)
                    else:
                        ext = fb.symmetric_extend(cur, halo1, -2)
                    hi = fb.filter_from_ext(
                        _sliced_ext(ext, halo1, h1o.size // 2, -2), h1o, -2)
                    lo = fb.filter_from_ext(
                        _sliced_ext(ext, halo1, h0o.size // 2, -2), h0o, -2)
                else:
                    if not cur_sharded and cur.shape[-2] % 4 != 0:
                        cur = jnp.concatenate(
                            [cur[..., :1, :], cur, cur[..., -1:, :]], axis=-2)
                    if cur_sharded:
                        ext = halo_exchange(cur, halo2, ra, R, axis=-2)
                    else:
                        ext = fb.symmetric_extend(cur, halo2, -2)
                    hi = fb.dfilt_from_ext(
                        _sliced_ext(ext, halo2, h1a.size, -2), h1b, h1a, -2)
                    lo = fb.dfilt_from_ext(
                        _sliced_ext(ext, halo2, h0a.size, -2), h0b, h0a, -2)
                Yh.append(q2c1d(hi, -2))
                cur = lo
            return (cur, tuple(Yh))

        shmapped = jax.shard_map(
            local_fwd, mesh=self.mesh,
            in_specs=(sharded_spec,), out_specs=out_specs, check_vma=False)

        @jax.jit
        def run(X):
            lowpass, Yh = shmapped(X)
            return Pyramid(lowpass, Yh)

        return run

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
        N = hp_shapes[0][1] * 2
        plan = self._plan(N, nlevels)
        _, g0o, _, g1o = self.biort
        _, _, g0a, g0b, _, _, g1a, g1b = self.qshift
        halo_i = max(g0a.size // 2, g1a.size // 2)
        halo_f = max(g0o.size // 2, g1o.size // 2)

        sharded_spec = P(da, ra, None)
        repl_spec = P(da, None, None)
        in_specs = ((sharded_spec if plan[-1] else repl_spec),) + tuple(
            sharded_spec if s else repl_spec for s in plan)

        def local_inv(lowpass, *Yh):
            lo = lowpass
            # Sharding in the forward plan is monotone (a sharded prefix of
            # fine levels, replicated coarse tail), so the inverse walks
            # replicated -> sharded with at most one re-shard transition.
            cur_sharded = plan[nlevels - 1]
            for level in range(nlevels - 1, 0, -1):
                hi = c2q1d(Yh[level], -2)
                if cur_sharded:
                    ext_lo = halo_exchange(lo, halo_i, ra, R, axis=-2)
                    ext_hi = halo_exchange(hi, halo_i, ra, R, axis=-2)
                else:
                    ext_lo = fb.symmetric_extend(lo, halo_i, -2)
                    ext_hi = fb.symmetric_extend(hi, halo_i, -2)
                lo = (fb.ifilt_from_ext(
                          _sliced_ext(ext_lo, halo_i, g0a.size // 2, -2),
                          g0b, g0a, -2)
                      + fb.ifilt_from_ext(
                          _sliced_ext(ext_hi, halo_i, g1a.size // 2, -2),
                          g1b, g1a, -2))
                if cur_sharded:
                    # plan is a monotone sharded prefix, so the finer level
                    # is also sharded; a forward pad (=> crop here) would
                    # have forced this level replicated.
                    if lo.shape[-2] != 2 * Yh[level - 1].shape[-2]:
                        raise ValueError("Yh sizes are not valid for the"
                                         " sharded inverse transform")
                else:
                    want = 2 * Yh[level - 1].shape[-2] * (
                        R if plan[level - 1] else 1)
                    if lo.shape[-2] != want:
                        lo = lo[..., 1:-1, :]   # undo the forward's pad
                    if lo.shape[-2] != want:
                        raise ValueError("Yh sizes are not valid for the"
                                         " inverse transform")
                    if plan[level - 1]:
                        # Re-shard: keep this shard's slice.
                        nloc = lo.shape[-2] // R
                        idx = lax.axis_index(ra)
                        lo = lax.dynamic_slice_in_dim(lo, idx * nloc, nloc,
                                                      axis=-2)
                        cur_sharded = True
            hi = c2q1d(Yh[0], -2)
            if cur_sharded:
                ext_lo = halo_exchange(lo, halo_f, ra, R, axis=-2)
                ext_hi = halo_exchange(hi, halo_f, ra, R, axis=-2)
            else:
                ext_lo = fb.symmetric_extend(lo, halo_f, -2)
                ext_hi = fb.symmetric_extend(hi, halo_f, -2)
            return (fb.filter_from_ext(
                        _sliced_ext(ext_lo, halo_f, g0o.size // 2, -2),
                        g0o, -2)
                    + fb.filter_from_ext(
                        _sliced_ext(ext_hi, halo_f, g1o.size // 2, -2),
                        g1o, -2))

        out_spec = sharded_spec if plan[0] else repl_spec
        shmapped = jax.shard_map(
            local_inv, mesh=self.mesh,
            in_specs=in_specs, out_specs=out_spec, check_vma=False)

        @jax.jit
        def run(pyr):
            return shmapped(pyr.lowpass, *pyr.highpasses)

        return run
