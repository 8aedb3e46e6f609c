"""Compute-engine selection: XLA-fused ops vs hand-written Pallas kernels.

The reference library exposes a *backend stack* (numpy/opencl/tf,
``/root/reference/dtcwt/__init__.py:50-143``) because each backend had its
own transform classes.  Here there is one functional code path; the only real
choice is how the three filter-bank primitives lower to the TPU:

* ``"xla"``    — pure jax.numpy polyphase ops (:mod:`dtcwt_tpu.ops.fb`),
  fused by XLA.  Works on every backend and every dtype (incl. the f64
  verification path).
* ``"pallas"`` — hand-written Pallas kernels (:mod:`dtcwt_tpu.ops.pallas_fb`)
  with explicit VMEM slabs and in-kernel symmetric extension, the TPU-native
  equivalent of the reference's OpenCL kernels.  f32/bf16 only; shapes
  outside the kernels' envelope silently fall back to XLA.
* ``"auto"``   — pallas on TPU, XLA elsewhere (the default).

Selection: env var ``DTCWT_TPU_ENGINE`` at import, :func:`set_engine`, or the
:func:`engine` context manager.  The switch is trace-time only — it changes
which program is staged, never what it computes.
"""

from __future__ import annotations

import contextlib
import os

import jax

__all__ = ["get_engine", "set_engine", "engine", "use_pallas",
           "trace_key"]

_VALID = ("auto", "xla", "pallas")
_engine = os.environ.get("DTCWT_TPU_ENGINE", "auto").lower()
if _engine not in _VALID:
    raise ValueError("DTCWT_TPU_ENGINE must be one of %s, got %r"
                     % (_VALID, _engine))


def get_engine() -> str:
    return _engine


def set_engine(name: str) -> None:
    global _engine
    name = name.lower()
    if name not in _VALID:
        raise ValueError("engine must be one of %s, got %r" % (_VALID, name))
    _engine = name


@contextlib.contextmanager
def engine(name: str):
    """Temporarily select a compute engine (exception-safe, mirroring the
    reference's ``preserve_backend_stack``)."""
    prev = get_engine()
    set_engine(name)
    try:
        yield
    finally:
        set_engine(prev)


def trace_key():
    """Hashable token capturing everything the engine decision depends on;
    passed as a static jit argument so switching engines re-traces instead of
    reusing a stale cached program."""
    return (_engine, jax.default_backend())


def use_pallas() -> bool:
    """Trace-time decision: should the Pallas filter kernels be attempted?"""
    if _engine == "pallas":
        return True
    if _engine == "xla":
        return False
    return jax.default_backend() == "tpu"

