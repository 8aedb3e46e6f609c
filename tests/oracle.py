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

    # numpy 2 changed batched linalg.solve semantics: solve(A, b) with
    # b.ndim == A.ndim - 1 is no longer "stack of vectors".  The reference's
    # solvetransform relies on the old behaviour; restore it (identical
    # math) so the oracle still runs.
    import dtcwt.registration as _rreg

    def _solvetransform(Qtilde_vec):
        Q = np.zeros(Qtilde_vec.shape[:-1] + (36,))
        Q[..., _rreg.Q_TRIU_FLAT_INDICES] = Qtilde_vec[..., :21]
        q = Qtilde_vec[..., -6:]
        Q = np.reshape(Q, Qtilde_vec.shape[:-1] + (6, 6))
        return np.linalg.solve(Q, -q[..., None])[..., 0]

    _rreg.solvetransform = _solvetransform

    # numpy 2 requires tuple (not list) multi-axis indices; the reference's
    # _boxfilter indexes with a list (registration.py:433-442).  Same math.
    import dtcwt.utils as _rutils

    def _boxfilter(X, kernel_size):
        if kernel_size % 2 == 0:
            raise ValueError("Kernel size must be odd")
        for axis_idx in range(2):
            slices = [slice(None)] * len(X.shape)
            out = X
            for delta in range(1, 1 + (kernel_size - 1) // 2):
                for sgn in (1, -1):
                    slices[axis_idx] = _rutils.reflect(
                        np.arange(X.shape[axis_idx]) + sgn * delta,
                        -0.5, X.shape[axis_idx] - 0.5).astype(int)
                    out = out + X[tuple(slices)]
            X = out / kernel_size
        return X

    _rreg._boxfilter = _boxfilter
    return ref_dtcwt


def summarise_mat(M, apron=8):
    """Summary matrix: keep the four apron-sized corners exactly, replace
    edge strips by their means along the interior axis and the interior by
    its scalar mean — the MATLAB-verification storage scheme (behavioural
    port of reference ``tests/util.py:47-60``; rationale comment at
    ``tests/test_againstmatlab.py:15-35``)."""
    M = np.asarray(M)
    c = M[apron:-apron, apron:-apron, ...]
    centre = c.mean(axis=0, keepdims=True).mean(axis=1, keepdims=True)[0, 0]
    top = M[:apron, apron:-apron, ...].mean(axis=1)
    bot = M[-apron:, apron:-apron, ...].mean(axis=1)
    left = M[apron:-apron, :apron, ...].mean(axis=0)
    right = M[apron:-apron, -apron:, ...].mean(axis=0)
    return np.vstack((
        np.hstack((M[:apron, :apron, ...], top[:, None, ...],
                   M[:apron, -apron:, ...])),
        np.hstack((left[None, :, ...], centre[None, None, ...],
                   right[None, :, ...])),
        np.hstack((M[-apron:, :apron, ...], bot[:, None, ...],
                   M[-apron:, -apron:, ...])),
    ))


def summarise_cube(M, apron=4):
    """Per-plane :func:`summarise_mat` over the third axis (reference
    ``tests/util.py:62-66``)."""
    M = np.asarray(M)
    return np.dstack([summarise_mat(M[:, :, i, ...], apron)
                      for i in range(M.shape[2])])


def mandrill():
    """The 512x512 float64 mandrill test image in [0, 1]."""
    with np.load(REFERENCE_PATH + "/tests/mandrill.npz") as f:
        return f["mandrill"].astype(np.float64)


def qbgn():
    """The 128^3 quantized band-limited Gaussian noise test volume."""
    with np.load(REFERENCE_PATH + "/tests/qbgn.npz") as f:
        return f["qbgn"].astype(np.float64)
