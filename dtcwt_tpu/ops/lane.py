"""Lane-axis filtering as dense-operator matmuls on the MXU.

Filtering the minor (lane) axis is the one case the kernel stack handles
badly on TPU: per-tap strided access along lanes doesn't vectorize, so both
engines route ``axis=-1`` work through an explicit transpose pair
(``fb._dfilt_impl``, ``pallas_fb._to_sublane``) — two full relayout passes
per call at the ~480 GB/s elementwise ceiling.

For small lane extents there is a better formulation: every primitive here
is linear along the filtered axis, so filtering C lanes is exactly a
right-multiplication by a C x C_out operator matrix — an MXU matmul with no
relayout at all.  The matrix is built ONCE per (op, taps, C) by evaluating
the exact f64 semantic reference (:mod:`dtcwt_tpu.ops.fb`) on an identity
matrix, which bakes in the symmetric reflection, the ``ha.hb`` parity
interleave of the decimator, and the four-phase offset table of the
interpolator with zero re-derivation (reference semantics:
``/root/reference/dtcwt/numpy/lowlevel.py:47-260``).

Cost model: the matmul does 2C FLOPs per output element.  Against the
~240 f32-FLOP/byte roofline of a v5e this is a clear win for C <= 512 —
which covers the 3-D transform (volumes enter at C <= 512 and the tree
halves C per level) — while large 2-D images (C = 4096) stay on the
transpose path.  Dispatch is gated on the fast engines (``use_pallas``);
the pure-XLA engine keeps the transpose formulation so engine-parity tests
and the on-chip sweep (tools/chipcheck.py) independently validate these
operators' numerics.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "supported", "filter_lane", "filter2_lane", "filter2_sum_lane",
    "dfilt_lane", "dfilt2_lane", "ifilt_lane", "ifilt2_sum_lane",
]

# Beyond this lane extent the 2C-FLOP/element matmul leaves the memory-bound
# regime (HIGHEST-precision f32 runs as multi-pass bf16) and the transpose
# formulation wins again.
_MAX_C = 512

_DTYPES = (jnp.float32, jnp.bfloat16)


def supported(x) -> bool:
    """True when the last axis of *x* is in the operator-matmul envelope.
    (Divisibility contracts — multiple-of-4 for the decimator, even for the
    interpolator — are enforced by the fb wrappers before dispatch.)"""
    if jnp.ndim(x) < 2 or jnp.shape(x)[-1] > _MAX_C:
        return False
    return jnp.result_type(x) in _DTYPES


@functools.lru_cache(maxsize=None)
def _op_matrix(kind: str, tapbytes: tuple, C: int):
    """(C, C_out) f32 operator for *kind* applied along an axis of length
    C, built by running the f64 semantic reference on an identity matrix.
    Runs eagerly on the CPU backend even when called mid-trace (f64 is
    unsupported on the TPU, and the result must be a trace-time constant)."""
    from dtcwt_tpu.ops import fb
    taps = [np.frombuffer(b, dtype=np.float64) for b in tapbytes]
    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    with jax.ensure_compile_time_eval(), \
            jax.default_device(jax.devices("cpu")[0]):
        eye = jnp.eye(C, dtype=dt)
        if kind == "filter":
            (h,) = taps
            Y = fb.filter_from_ext(
                fb.symmetric_extend(eye, h.size // 2, 0), h, 0)
        elif kind == "dfilt":
            ha, hb = taps
            Y = fb.dfilt_from_ext(
                fb.symmetric_extend(eye, ha.size, 0), ha, hb, 0)
        else:  # "ifilt"
            ha, hb = taps
            Y = fb.ifilt_from_ext(
                fb.symmetric_extend(eye, ha.size // 2, 0), ha, hb, 0)
        # Y[i, j] = op(e_j)[i]  ->  x @ M with M = Y^T
        M = np.asarray(jax.device_get(Y)).T
    return np.ascontiguousarray(M, dtype=np.float32)


def _matmul(x, M: np.ndarray):
    y = jnp.matmul(x, jnp.asarray(M, x.dtype if x.dtype == jnp.float32
                                   else jnp.float32),
                   precision=lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def _split2(y, d0: int):
    return (lax.slice_in_dim(y, 0, d0, axis=-1),
            lax.slice_in_dim(y, d0, y.shape[-1], axis=-1))


# -- non-decimating ---------------------------------------------------------

def filter_lane(x, h: np.ndarray):
    M = _op_matrix("filter", (h.tobytes(),), x.shape[-1])
    return _matmul(x, M)


def filter2_lane(x, h0: np.ndarray, h1: np.ndarray):
    C = x.shape[-1]
    M0 = _op_matrix("filter", (h0.tobytes(),), C)
    M1 = _op_matrix("filter", (h1.tobytes(),), C)
    y = _matmul(x, np.concatenate([M0, M1], axis=1))
    return _split2(y, M0.shape[1])


def filter2_sum_lane(a, b, h0: np.ndarray, h1: np.ndarray):
    C = a.shape[-1]
    return (_matmul(a, _op_matrix("filter", (h0.tobytes(),), C))
            + _matmul(b, _op_matrix("filter", (h1.tobytes(),), C)))


# -- decimate-by-2 ----------------------------------------------------------

def dfilt_lane(x, ha: np.ndarray, hb: np.ndarray):
    M = _op_matrix("dfilt", (ha.tobytes(), hb.tobytes()), x.shape[-1])
    return _matmul(x, M)


def dfilt2_lane(x, ha0, hb0, ha1, hb1):
    C = x.shape[-1]
    M0 = _op_matrix("dfilt", (ha0.tobytes(), hb0.tobytes()), C)
    M1 = _op_matrix("dfilt", (ha1.tobytes(), hb1.tobytes()), C)
    y = _matmul(x, np.concatenate([M0, M1], axis=1))
    return _split2(y, M0.shape[1])


# -- interpolate-by-2 -------------------------------------------------------

def ifilt_lane(x, ha: np.ndarray, hb: np.ndarray):
    M = _op_matrix("ifilt", (ha.tobytes(), hb.tobytes()), x.shape[-1])
    return _matmul(x, M)


def ifilt2_sum_lane(a, b, ha0, hb0, ha1, hb1):
    C = a.shape[-1]
    return (_matmul(a, _op_matrix("ifilt", (ha0.tobytes(), hb0.tobytes()), C))
            + _matmul(b, _op_matrix("ifilt", (ha1.tobytes(), hb1.tobytes()),
                                    C)))
