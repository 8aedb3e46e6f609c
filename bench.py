"""North-star benchmark: 4096x4096 2-D 3-level forward DTCWT, frames/s/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference NumPy backend measures 57.3 ms for a 512x512 3-level
forward on a Xeon E5-2660 (reference `tests/Speed Tests.ipynb`, `large_np`
cell); NumPy cost scales ~linearly in pixels, giving ~3.667 s/frame at
4096^2, i.e. 0.2727 frames/s (BASELINE.md).  vs_baseline is our frames/s
divided by that.

Timing methodology: this environment's async dispatch makes
block_until_ready unreliable through the device tunnel, so iterations are
chained inside a single jitted lax.scan (true data dependence) and the clock
stops on a host readback of the reduced result.
"""

import json
import time

import numpy as np

BASELINE_FPS = 0.2727  # reference NumPy backend, 4096^2 3-level (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp
    import dtcwt_tpu as dt

    t = dt.Transform2d()  # near_sym_a / qshift_a, as in the reference bench
    x = jnp.asarray(np.random.RandomState(0).rand(4096, 4096).astype(np.float32))
    float(x.sum())  # materialize on device

    iters = 20

    @jax.jit
    def run(a):
        def body(c, _):
            p = t._forward_impl(c, nlevels=3, include_scale=False)
            s = sum(jnp.sum(h.real) + jnp.sum(h.imag) for h in p.highpasses)
            s = s + jnp.sum(p.lowpass)
            # keep the carry alive without changing it meaningfully
            return c + s * 0.0, s
        return jax.lax.scan(body, a, None, length=iters)[1].sum()

    float(run(x))  # compile + warm
    t0 = time.time()
    float(run(x))  # host readback forces completion
    per_frame = (time.time() - t0) / iters

    # subtract the scan-carry update cost (~one 4096^2 elementwise pass),
    # measured with an identity body
    @jax.jit
    def run_carry(a):
        def body(c, _):
            s = jnp.sum(c) * 1e-9
            return c + s * 0.0, s
        return jax.lax.scan(body, a, None, length=iters)[1].sum()

    float(run_carry(x))
    t0 = time.time()
    float(run_carry(x))
    carry_cost = (time.time() - t0) / iters

    frame_s = max(per_frame - carry_cost, 1e-9)
    fps = 1.0 / frame_s
    print(json.dumps({
        "metric": "dtcwt2d_fwd_4096x4096_3level_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 1),
    }))


if __name__ == "__main__":
    main()
