"""Plotting smoke test (parity surface: reference ``dtcwt/plotting.py`` and
its usage in ``examples/``); runs headless on the Agg backend."""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")

import dtcwt_tpu as dt
from dtcwt_tpu.plotting import overlay_quiver


def test_overlay_quiver_runs():
    import matplotlib.pyplot as plt

    rng = np.random.RandomState(0)
    img = rng.rand(64, 64) * 255.0
    pyr = dt.Transform2d().forward(img.astype(np.float32) / 255.0, nlevels=3)
    hp = np.asarray(pyr.highpasses[2].real) + 1j * np.asarray(
        pyr.highpasses[2].imag)
    fig = plt.figure()
    try:
        hq = overlay_quiver(img, hp, level=3, offset=0.5)
        assert hq is not None
    finally:
        plt.close(fig)
