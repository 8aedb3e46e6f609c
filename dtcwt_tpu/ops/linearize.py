"""Exact gradients through the Pallas engine for linear transforms.

``pallas_call`` has no autodiff rule, so differentiating a transform that
dispatched to the hand-written kernels would fail.  Every DTCWT forward and
inverse is *linear* in its array operand, so the vector-Jacobian product is
simply the transpose of the map — which JAX can derive mechanically from the
XLA implementation with :func:`jax.linear_transpose`.

:func:`linear_vjp` wraps an implementation (which may dispatch to Pallas)
with a ``custom_vjp`` whose backward pass transposes the *XLA-engine*
evaluation of the same math: the primal runs at kernel speed, the cotangent
runs through the portable path, and both are exact (the two engines agree to
f32 roundoff).  The pattern is the standard Pallas custom-VJP idiom
specialised to linear maps, so no residuals are saved at all.
"""

from __future__ import annotations

import jax

from dtcwt_tpu.ops import engine

__all__ = ["linear_vjp"]


def linear_vjp(impl, spec, adjoint=None):
    """Wrap linear *impl* (a single-pytree-argument function) so it
    differentiates via the linear transpose of its XLA-engine evaluation.

    :param impl: the implementation; may dispatch to Pallas kernels.  It is
        re-traced under the ``xla`` engine inside the backward pass, so the
        transposed jaxpr never contains a kernel call.
    :param spec: a pytree of ``jax.ShapeDtypeStruct`` describing the operand
        (the shapes are static at trace time).
    :param adjoint: optional explicit adjoint (cotangent -> operand
        cotangent).  When given, the backward pass runs it instead of the
        XLA transpose — the transforms supply kernel-speed adjoints built
        from the fused kernels themselves (:mod:`ops.adjoint`), exact to
        f32 roundoff against the XLA transpose.
    """
    def ref(operand):
        with engine.engine("xla"):
            return impl(operand)

    @jax.custom_vjp
    def f(operand):
        return impl(operand)

    def fwd(operand):
        return impl(operand), None

    def bwd(_, cotangent):
        if adjoint is not None:
            return (adjoint(cotangent),)
        transpose = jax.linear_transpose(ref, spec)
        (grad,) = transpose(cotangent)
        return (grad,)

    f.defvjp(fwd, bwd)
    return f
