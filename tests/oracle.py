"""Import the reference library (/root/reference) as a *test oracle*.

The reference targets numpy<2 and python2-era APIs; this module installs the
minimal compatibility shims (np.asfarray / np.int / np.issubsctype) before
importing it.  The oracle is used only inside tests, to assert bit-level
parity of the new TPU-native implementation with the reference semantics.
"""

import sys

import numpy as np

REFERENCE_PATH = "/root/reference"


def _install_numpy_shims():
    if not hasattr(np, "asfarray"):
        def asfarray(a, dtype=np.float64):
            dt = np.dtype(dtype)
            if not np.issubdtype(dt, np.inexact):
                dt = np.dtype(np.float64)
            return np.asarray(a, dtype=dt)
        np.asfarray = asfarray
    if not hasattr(np, "int"):
        np.int = int
    if not hasattr(np, "float"):
        np.float = float
    if not hasattr(np, "issubsctype"):
        np.issubsctype = np.issubdtype


def load_reference():
    """Return the reference ``dtcwt`` package, importing it on first use."""
    _install_numpy_shims()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import dtcwt as ref_dtcwt  # noqa: F401
    import dtcwt.numpy.lowlevel  # noqa: F401
    import dtcwt.numpy  # noqa: F401
    return ref_dtcwt


def mandrill():
    """The 512x512 float64 mandrill test image in [0, 1]."""
    with np.load(REFERENCE_PATH + "/tests/mandrill.npz") as f:
        return f["mandrill"].astype(np.float64)


def qbgn():
    """The 128^3 quantized band-limited Gaussian noise test volume."""
    with np.load(REFERENCE_PATH + "/tests/qbgn.npz") as f:
        return f["qbgn"].astype(np.float64)
