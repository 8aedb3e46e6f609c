#!/usr/bin/env python
"""Capture a jax.profiler trace of the 2-D forward/inverse transform.

The reference has no in-library tracing (SURVEY.md §5); this is the TPU
build's observability harness: it writes a TensorBoard-loadable trace
(``tensorboard --logdir <outdir>`` → Profile tab) covering one warm forward
and one warm inverse.

Usage: python scripts/profile_transform.py [outdir] [--size 4096]
"""

import argparse
import time

import os
import sys

sys.path.insert(0, os.path.realpath(
    os.path.join(os.path.dirname(__file__), '..')))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("outdir", nargs="?", default="/tmp/dtcwt_tpu_trace")
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--nlevels", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import dtcwt_tpu as dt

    t = dt.Transform2d()
    x = jnp.asarray(np.random.RandomState(0)
                    .rand(args.size, args.size).astype(np.float32))

    # Warm up (compile) outside the trace.
    pyr = t.forward(x, args.nlevels)
    rec = t.inverse(pyr)
    jax.block_until_ready(rec)

    with jax.profiler.trace(args.outdir):
        with jax.profiler.TraceAnnotation("dtcwt2d_forward"):
            pyr = t.forward(x, args.nlevels)
            jax.block_until_ready(pyr.lowpass)
        with jax.profiler.TraceAnnotation("dtcwt2d_inverse"):
            rec = t.inverse(pyr)
            jax.block_until_ready(rec)
    print("trace written to", args.outdir)


if __name__ == "__main__":
    main()
