#!/usr/bin/env python
"""Benchmark phase-based registration on the tennis frame pair.

Counterpart of the reference ``scripts/benchmark_registration.py:14-40``
(6-level transform of the tennis frames + repeated ``estimatereg``).
"""

import time

import os
import sys

# Allow running straight from a checkout (reference scripts do the
# same, scripts/benchmark_registration.py:8-11).
sys.path.insert(0, os.path.realpath(
    os.path.join(os.path.dirname(__file__), '..')))

import numpy as np


def main():
    import dtcwt_tpu as dt
    import dtcwt_tpu.registration as reg

    print("Loading datasets...")
    with np.load("/root/reference/tests/tennis.npz") as f:
        keys = sorted(f.keys())
        f1, f2 = (f[k].astype(np.float32) for k in keys[:2])

    print("Transforming datasets...")
    transform = dt.Transform2d()
    t1 = transform.forward(f1, nlevels=6)
    t2 = transform.forward(f2, nlevels=6)

    print("Registering datasets...")
    np.asarray(reg.estimatereg(t1, t2))   # warm-up / compile

    number = 20
    t0 = time.perf_counter()
    for _ in range(number):
        np.asarray(reg.estimatereg(t1, t2))
    secs = time.perf_counter() - t0
    print("%.2fs for %d iterations => %.3fs/iteration"
          % (secs, number, secs / number))


if __name__ == "__main__":
    main()
