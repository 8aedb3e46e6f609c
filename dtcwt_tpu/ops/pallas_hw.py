"""Two-sided operator kernels: a whole (H, W) tree-stage pair per pass.

The 3-D separable tree filters one axis at a time, so even with the
dual-stream kernels (:mod:`pallas_dual`) the H- and W-axis stages of a
level cost two full HBM round trips.  But both stages are linear maps with
small extents, so applying BOTH to a depth slice is just a two-sided matrix
product — per slice ``d``::

    analysis   U[j][k] = A_j @ X[d] @ B_k          (1 read  -> 4 writes)
    synthesis  Y[d]    = sum_jk Ai_j @ V[j][k][d] @ Bi_k   (4 reads -> 1 write)

with the H-side operators ``A_j`` applied from the left (sublane axis) and
the W-side operators ``B_k`` from the right (lane axis).  The operator
matrices come from :func:`dtcwt_tpu.ops.lane._op_matrix` — built by running
the exact f64 filter semantics on an identity matrix, so symmetric
reflection, the decimator's parity interleave and the interpolator's phase
table are baked in and the kernel needs **no halos, no manual DMA and no
boundary masks**: it is a plain grid-pipelined pair of MXU matmuls per
depth slice (the lowest-risk Mosaic shape there is).

Against independent stages this replaces ``read X, write 2, read 2,
write 4`` with ``read X, write 4`` on analysis (and the mirror saving on
synthesis), on top of removing the inter-stage XLA glue.

Reference semantics: the per-axis passes of
``/root/reference/dtcwt/numpy/transform3d.py:208-383`` (analysis) and
``:385-526`` (synthesis).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dtcwt_tpu.ops.lane import _op_matrix
from dtcwt_tpu.ops.pallas_fb import (_LANE, _SUBLANE, _as_taps,
                                     _compiler_params, _f32win, _interpret,
                                     _mxu_precision)

__all__ = ["filter_hw22", "dfilt_hw22", "filter_sum_hw22", "ifilt_sum_hw22"]

# Two-sided matmuls do ~2(H+W) FLOPs per element; beyond this extent the
# HIGHEST-precision f32 product leaves the memory-bound regime.
_MAX_C = 512

_DTYPES = (jnp.float32, jnp.bfloat16)


def _envelope(x, mult: int) -> bool:
    """Shared gate: [..., D, H, W] f32/bf16 with H, W inside the operator
    envelope (*mult* = the op's divisibility contract per axis)."""
    if jnp.ndim(x) < 3 or jnp.result_type(x) not in _DTYPES:
        return False
    H, W = jnp.shape(x)[-2], jnp.shape(x)[-1]
    if H > _MAX_C or W > _MAX_C or H % mult or W % mult:
        return False
    if not _interpret() and (H % _SUBLANE or W % _LANE):
        return False
    return True


def _flatten3(x):
    """[..., D, H, W] -> [N, H, W] plus the lead shape to restore."""
    lead = x.shape[:-2]
    return x.reshape((-1,) + x.shape[-2:]), lead


def _mats(kind: str, taps0, taps1, H: int, W: int):
    """((A0, A1), (B0, B1)) operator matrices: A_j (HO, H) applied from the
    left along sublanes, B_k (W, WO) from the right along lanes."""
    A = tuple(np.ascontiguousarray(_op_matrix(kind, t, H).T) for t in
              (taps0, taps1))
    B = tuple(_op_matrix(kind, t, W) for t in (taps0, taps1))
    return A, B


def _slice_batch(N: int) -> int:
    """Depth slices per grid step.  One-slice steps dominate these kernels
    with per-step overhead (a 256^3 level-1 stage spent ~half its time on
    256 single-slice steps — r5 chip bisect); batching 8 slices per step
    amortises it while keeping blocks comfortably inside VMEM."""
    for s in (8, 4, 2):
        if N % s == 0:
            return s
    return 1


@functools.lru_cache(maxsize=None)
def _build_hw22(N: int, H: int, W: int, kind: str, taps0, taps1,
                dtype_str: str):
    (A0, A1), (B0, B1) = _mats(kind, taps0, taps1, H, W)
    HO, WO = A0.shape[0], B0.shape[1]
    dtype = jnp.dtype(dtype_str)
    hp = _mxu_precision(dtype)
    S = _slice_batch(N)

    def kernel(x_ref, a0, a1, b0, b1, o00, o01, o10, o11):
        for s in range(S):
            x = _f32win(dtype)(x_ref[s])
            for a_ref, outs in ((a0, (o00, o01)), (a1, (o10, o11))):
                t = jnp.dot(a_ref[:, :], x, precision=hp,
                            preferred_element_type=jnp.float32)
                for b_ref, o_ref in zip((b0, b1), outs):
                    o_ref[s] = jnp.dot(t, b_ref[:, :], precision=hp,
                                       preferred_element_type=jnp.float32
                                       ).astype(dtype)

    mat = lambda m: pl.BlockSpec(m.shape, lambda d: (0, 0),
                                 memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((S, HO, WO), lambda d: (d, 0, 0),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(N // S,),
        in_specs=[pl.BlockSpec((S, H, W), lambda d: (d, 0, 0),
                               memory_space=pltpu.VMEM),
                  mat(A0), mat(A1), mat(B0), mat(B1)],
        out_specs=(out_spec,) * 4,
        out_shape=(jax.ShapeDtypeStruct((N, HO, WO), dtype),) * 4,
        compiler_params=_compiler_params(1),
        interpret=_interpret(),
    )
    # Keep the operators as NUMPY in the cached closure: jnp.asarray inside
    # an active jit trace stages the constant as a tracer, and an lru_cache
    # holding that tracer leaks it into later traces (UnexpectedTracerError).
    mats = (A0, A1, B0, B1)
    return lambda x: call(x, *(jnp.asarray(m) for m in mats))


def _hw22(x, kind: str, taps0, taps1):
    x3, lead = _flatten3(x)
    call = _build_hw22(x3.shape[0], x3.shape[1], x3.shape[2], kind,
                       taps0, taps1, str(x3.dtype))
    y = call(x3)
    un = lambda v: v.reshape(lead + v.shape[-2:])
    return [[un(y[0]), un(y[1])], [un(y[2]), un(y[3])]]


def filter_hw22(x, h0, h1):
    """Both non-decimating branch filters along H *and* W in one pass:
    ``out[j][k] = filter_h(filter_w(x, h_k), h_j)``; None -> caller's
    two-stage path.  Odd-length filters only (even ones change H/W)."""
    h0, h1 = _as_taps(h0), _as_taps(h1)
    if h0.size % 2 == 0 or h1.size % 2 == 0 or not _envelope(x, 1):
        return None
    return _hw22(jnp.asarray(x), "filter", (h0.tobytes(),), (h1.tobytes(),))


def dfilt_hw22(x, pair0, pair1):
    """Both decimate-by-2 branch filters along H and W in one pass:
    ``out[j][k] = dfilt_h(dfilt_w(x, *pair_k), *pair_j)``."""
    ha0, hb0 = (_as_taps(h) for h in pair0)
    ha1, hb1 = (_as_taps(h) for h in pair1)
    if not (ha0.size == hb0.size == ha1.size == hb1.size):
        return None
    if ha0.size % 2 or not _envelope(x, 4):
        return None
    return _hw22(jnp.asarray(x), "dfilt", (ha0.tobytes(), hb0.tobytes()),
                 (ha1.tobytes(), hb1.tobytes()))


@functools.lru_cache(maxsize=None)
def _build_sum_hw22(N: int, H: int, W: int, kind: str, taps0, taps1,
                    dtype_str: str):
    (A0, A1), (B0, B1) = _mats(kind, taps0, taps1, H, W)
    HO, WO = A0.shape[0], B0.shape[1]
    dtype = jnp.dtype(dtype_str)
    hp = _mxu_precision(dtype)
    S = _slice_batch(N)

    def kernel(v00, v01, v10, v11, a0, a1, b0, b1, o_ref):
        for s in range(S):
            acc = None
            for a_ref, (vj0, vj1) in ((a0, (v00, v01)), (a1, (v10, v11))):
                inner = (jnp.dot(_f32win(dtype)(vj0[s]), b0[:, :],
                                 precision=hp,
                                 preferred_element_type=jnp.float32)
                         + jnp.dot(_f32win(dtype)(vj1[s]), b1[:, :],
                                   precision=hp,
                                   preferred_element_type=jnp.float32))
                term = jnp.dot(a_ref[:, :], inner, precision=hp,
                               preferred_element_type=jnp.float32)
                acc = term if acc is None else acc + term
            o_ref[s] = acc.astype(dtype)

    mat = lambda m: pl.BlockSpec(m.shape, lambda d: (0, 0),
                                 memory_space=pltpu.VMEM)
    in_spec = pl.BlockSpec((S, H, W), lambda d: (d, 0, 0),
                           memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(N // S,),
        in_specs=[in_spec] * 4 + [mat(A0), mat(A1), mat(B0), mat(B1)],
        out_specs=pl.BlockSpec((S, HO, WO), lambda d: (d, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, HO, WO), dtype),
        compiler_params=_compiler_params(1),
        interpret=_interpret(),
    )
    mats = (A0, A1, B0, B1)  # numpy, not jnp: see _build_hw22
    return lambda *v: call(*v, *(jnp.asarray(m) for m in mats))


def _sum_hw22(vs, kind: str, taps0, taps1):
    v3 = []
    lead = vs[0].shape[:-2]
    for v in vs:
        if v.shape != vs[0].shape or v.dtype != vs[0].dtype:
            return None
        v3.append(_flatten3(v)[0])
    call = _build_sum_hw22(v3[0].shape[0], v3[0].shape[1], v3[0].shape[2],
                           kind, taps0, taps1, str(v3[0].dtype))
    y = call(*v3)
    return y.reshape(lead + y.shape[-2:])


def filter_sum_hw22(v00, v01, v10, v11, g0, g1):
    """One fused synthesis (H, W) stage pair:
    ``sum_jk filter_h(filter_w(v[j][k], g_k), g_j)`` — the level-1 inverse
    merge with the branch sums kept on-chip."""
    g0, g1 = _as_taps(g0), _as_taps(g1)
    if g0.size % 2 == 0 or g1.size % 2 == 0 or not _envelope(v00, 1):
        return None
    return _sum_hw22((v00, v01, v10, v11), "filter",
                     (g0.tobytes(),), (g1.tobytes(),))


def ifilt_sum_hw22(v00, v01, v10, v11, pair0, pair1):
    """One fused synthesis (H, W) stage pair with interpolate-by-2:
    ``sum_jk ifilt_h(ifilt_w(v[j][k], *pair_k), *pair_j)``."""
    ga0, gb0 = (_as_taps(h) for h in pair0)
    ga1, gb1 = (_as_taps(h) for h in pair1)
    if not (ga0.size == gb0.size == ga1.size == gb1.size):
        return None
    if ga0.size % 2 or not _envelope(v00, 2):
        return None
    return _sum_hw22((v00, v01, v10, v11), "ifilt",
                     (ga0.tobytes(), gb0.tobytes()),
                     (ga1.tobytes(), gb1.tobytes()))
