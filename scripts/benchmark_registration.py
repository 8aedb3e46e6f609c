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

    # Per-call host loop (includes dispatch/readback overhead — on remote
    # device tunnels this is dominated by round-trip latency):
    t0 = time.perf_counter()
    for _ in range(number):
        np.asarray(reg.estimatereg(t1, t2))
    secs = time.perf_counter() - t0
    print("host loop:   %.2fs for %d iterations => %.1f ms/iteration"
          % (secs, number, 1e3 * secs / number))

    # Device-resident timing: iterations chained inside one jitted scan
    # with a data dependence (the same methodology as bench.py).
    import jax
    import jax.numpy as jnp

    avecs_shape = tuple(np.asarray(t1.highpasses[3].shape[:2])) + (6,)
    levels = tuple(tuple(int(l) for l in lv)
                   for lv in reg._default_levels(len(t1.highpasses)))
    impl = reg._estimatereg_impl(avecs_shape, levels)

    @jax.jit
    def run(low, p1, p2):
        def body(c, _):
            p1c = dt.Pyramid(p1.lowpass + 0.0 * c[0, 0], p1.highpasses)
            av = impl(p1c, p2)
            return c + 0.0 * av[:1, :1, 0], jnp.sum(av)
        return jax.lax.scan(body, low, None, length=number)[1].sum()

    seed = jnp.zeros((1, 1), jnp.float32)
    float(run(seed, t1, t2))
    t0 = time.perf_counter()
    float(run(seed, t1, t2))
    print("device scan: %.1f ms/iteration"
          % (1e3 * (time.perf_counter() - t0) / number))


if __name__ == "__main__":
    main()
