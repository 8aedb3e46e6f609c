#!/usr/bin/env python
"""Real-hardware kernel validation sweep.

The Pallas CPU interpreter accepts programs Mosaic rejects (strided vector
slices, unaligned DMA offsets, scoped-VMEM overflows all pass CPU tests and
fail on the chip), so CI greenness does not prove the kernels lower.  This
script is the automated version of the post-change discipline: run every
fused/primitive kernel configuration the library dispatches to, on the real
device, and compare against the XLA engine.

Exit code 0 = every configuration matched; prints one line per check.

Usage: python tools/chipcheck.py [--sections 2d,bf16,bench,...]
       (needs the TPU visible to JAX)

Sections: 2d planes gain 1d 3d hw22 bf16 bench sharded grad.  Default runs
all of them; a full sweep is slow (one remote compile per configuration),
so a targeted change can revalidate just its own envelope — but run the
full sweep before shipping a kernel change (CLAUDE.md discipline).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.realpath(
    os.path.join(os.path.dirname(__file__), '..')))

import numpy as np

TOL = 1e-3   # f32 engine-parity bar (reference's own OpenCL bar, 1e-3)

ALL_SECTIONS = ("2d", "planes", "gain", "1d", "3d", "hw22", "bf16",
                "bench", "sharded", "grad")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sections", default=",".join(ALL_SECTIONS),
                    help="comma-separated subset of: %s" %
                    " ".join(ALL_SECTIONS))
    args = ap.parse_args()
    sections = set(s.strip() for s in args.sections.split(",") if s.strip())
    unknown = sections - set(ALL_SECTIONS)
    if unknown:
        ap.error("unknown sections: %s" % sorted(unknown))

    import jax
    import jax.numpy as jnp
    import dtcwt_tpu as dt
    from dtcwt_tpu.ops import engine

    if jax.default_backend() == "cpu":
        print("WARNING: running on CPU — this only exercises the "
              "interpreter, not Mosaic. Run with the TPU visible.")

    failures = []

    def check(name, got, want, tol=TOL):
        err = float(np.abs(np.asarray(got) - np.asarray(want)).max())
        status = "ok" if err < tol else "FAIL"
        print("%-52s %s  (err %.2e)" % (name, status, err), flush=True)
        if err >= tol:
            failures.append(name)

    def split(z):
        re, im = jax.jit(lambda a: (a.real, a.imag))(z)
        return np.asarray(re) + 1j * np.asarray(im)

    rng = np.random.RandomState(0)

    def sec_2d():
        # 2-D: every family class x representative shapes, fwd + inv
        cases = [
            ("near_sym_a", "qshift_a"), ("near_sym_b", "qshift_b"),
            ("near_sym_b_bp", "qshift_b_bp"), ("antonini", "qshift_c"),
            ("legall", "qshift_d"),
        ]
        shapes = [(512, 512), (4, 256, 384), (130, 256)]
        for biort, qshift in cases:
            t = dt.Transform2d(biort, qshift)
            for shape in shapes:
                x = rng.rand(*shape).astype(np.float32)
                p = t.forward(x, 3)
                with engine.engine("xla"):
                    pw = t.forward(x, 3)
                    rw = t.inverse(pw)
                for lvl, (a, b) in enumerate(zip(p.highpasses,
                                                 pw.highpasses)):
                    check("2d %s %s fwd L%d" % (biort, shape, lvl),
                          split(a), split(b))
                check("2d %s %s inv" % (biort, shape), t.inverse(p), rw)

    def sec_planes():
        # plane-layout (band-major) path: fused kernels emit/consume natively
        t = dt.Transform2d()
        x = rng.rand(512, 512).astype(np.float32)
        pp = t.forward(x, 3, layout="planes")
        with engine.engine("xla"):
            want_p = t.forward(x, 3)
            want_r = t.inverse(want_p)
        for lvl, (re, im, w) in enumerate(zip(pp.highpasses_re,
                                              pp.highpasses_im,
                                              want_p.highpasses)):
            got = np.asarray(re) + 1j * np.asarray(im)
            wantb = np.stack([split(w[..., d]) for d in
                              (0, 5, 1, 4, 2, 3)], axis=-3)
            check("2d planes fwd L%d" % lvl, got.real, wantb.real)
            check("2d planes fwd L%d im" % lvl, got.imag, wantb.imag)
        check("2d planes inv", t.inverse(pp), want_r)

    def sec_gain():
        # gain_mask through the fused inverse
        t = dt.Transform2d()
        x = rng.rand(512, 512).astype(np.float32)
        gm = np.linspace(0.0, 1.5, 18).reshape(6, 3).astype(np.float32)
        p = t.forward(x, 3)
        with engine.engine("xla"):
            want = t.inverse(p, gm)
        check("2d gain_mask inv", t.inverse(p, gm), want)

    def sec_1d():
        # 1-D incl. lane folding at r == halo (16-tap qshift_c)
        for fam, N in [("qshift_a", 1 << 16), ("qshift_c", 16384)]:
            t1 = dt.Transform1d("near_sym_a", fam)
            s = rng.rand(N).astype(np.float32)
            p1 = t1.forward(s, 5)
            with engine.engine("xla"):
                w1 = t1.inverse(t1.forward(s, 5))
            check("1d %s N=%d roundtrip" % (fam, N), t1.inverse(p1), w1)

    def sec_3d():
        # 3-D whole-volume path (dual-stream tree kernels: filter2/dfilt2
        # on analysis, filter2_sum/ifilt2_sum on synthesis).  near_sym_a =
        # short filters (VPU shift path), near_sym_b = 13/19-tap (banded-
        # MXU path).  H and W must be >= 128 so the -1/-2-axis kernel
        # routes stay inside the 128-lane envelope on hardware (at 64 they
        # silently fall back to XLA and the sweep would not exercise them).
        for biort3, qshift3, ext in [("near_sym_a", "qshift_a", 4),
                                     ("near_sym_b", "qshift_b", 4),
                                     ("near_sym_a", "qshift_a", 8)]:
            t3 = dt.Transform3d(biort3, qshift3, ext_mode=ext)
            v = rng.rand(64, 128, 128).astype(np.float32)
            p3 = t3.forward(v, 3)
            with engine.engine("xla"):
                pw3 = t3.forward(v, 3)
                w3 = t3.inverse(pw3)
            for lvl, (a, b) in enumerate(zip(p3.highpasses,
                                             pw3.highpasses)):
                check("3d %s ext%d fwd L%d" % (biort3, ext, lvl),
                      split(a), split(b))
            check("3d %s ext%d roundtrip" % (biort3, ext),
                  t3.inverse(p3), w3)
        # fused level-1 pack kernels (ops/pallas_pack3d.py) need W a
        # 256-multiple, which the 128-wide sweep above never reaches.
        for biort3, qshift3 in [("near_sym_a", "qshift_a"),
                                ("near_sym_b", "qshift_b")]:
            t3 = dt.Transform3d(biort3, qshift3)
            v = rng.rand(64, 64, 256).astype(np.float32)
            for layout in (None, "planes"):
                kw = {} if layout is None else {"layout": layout}
                p3 = t3.forward(v, 2, **kw)
                with engine.engine("xla"):
                    pw3 = t3.forward(v, 2, **kw)
                    w3 = t3.inverse(pw3)
                if layout is None:
                    for lvl, (a, b) in enumerate(zip(p3.highpasses,
                                                     pw3.highpasses)):
                        check("3d pack %s fwd L%d" % (biort3, lvl),
                              split(a), split(b))
                check("3d pack %s %s roundtrip"
                      % (biort3, layout or "cplx"), t3.inverse(p3), w3)

    def sec_hw22():
        # two-sided (H, W) stage-pair kernels at level >= 2: the
        # dfilt/ifilt hw22 routes need >= 128 lanes AFTER the first
        # halving, which the (64,128,128) sweep above never reaches.
        t3 = dt.Transform3d("near_sym_b", "qshift_b")
        v = rng.rand(32, 256, 256).astype(np.float32)
        p3 = t3.forward(v, 2)
        with engine.engine("xla"):
            pw3 = t3.forward(v, 2)
            w3 = t3.inverse(pw3)
        for lvl, (a, b) in enumerate(zip(p3.highpasses, pw3.highpasses)):
            check("3d hw22 256 fwd L%d" % lvl, split(a), split(b))
        check("3d hw22 256 roundtrip", t3.inverse(p3), w3)

    def sec_bf16():
        # bf16 storage path: Mosaic tiles bf16 as (16, 128) vs f32's
        # (8, 128), so the kernels' slab plans must re-prove themselves at
        # this dtype.  Oracle = the f32 XLA engine; bar = bf16 resolution.
        t = dt.Transform2d()
        xb = rng.rand(512, 512).astype(np.float32)
        with engine.engine("xla"):
            wb = t.inverse(t.forward(xb, 3))
        pb = t.forward(jnp.asarray(xb, jnp.bfloat16), 3, layout="planes")
        rb = np.asarray(t.inverse(pb).astype(jnp.float32))
        check("2d bf16 planes roundtrip", rb, np.asarray(wb), tol=0.08)
        t3 = dt.Transform3d()
        vb = rng.rand(64, 128, 128).astype(np.float32)
        with engine.engine("xla"):
            w3b = t3.inverse(t3.forward(vb, 2))
        p3b = t3.forward(jnp.asarray(vb, jnp.bfloat16), 2, layout="planes")
        r3b = np.asarray(t3.inverse(p3b).astype(jnp.float32))
        check("3d bf16 planes roundtrip", r3b, np.asarray(w3b), tol=0.12)

    def sec_bench():
        # Bench-envelope shapes: exactly the cases bench.py times (r2
        # verdict: chipcheck swept 32x256x256 while the bench ran 256^3,
        # and the 256^3 dfilt2 call OOMed Mosaic's scoped VMEM at compile
        # time — a regression the sweep never saw).  Parity at these sizes
        # is expensive, so gate on the forward+inverse round trip against
        # the input instead; the smaller sweeps above already pin the
        # kernels' math against the XLA engine.
        t = dt.Transform2d()
        xL = rng.rand(4096, 4096).astype(np.float32)
        check("bench 4096^2 f32 roundtrip",
              np.asarray(t.inverse(t.forward(xL, 3))), xL)
        pLb = t.forward(jnp.asarray(xL, jnp.bfloat16), 3, layout="planes")
        rLb = np.asarray(t.inverse(pLb).astype(jnp.float32))
        check("bench 4096^2 bf16 planes roundtrip", rLb, xL, tol=0.08)
        t3 = dt.Transform3d()
        vL = rng.rand(256, 256, 256).astype(np.float32)
        check("bench 256^3 f32 roundtrip",
              np.asarray(t3.inverse(t3.forward(vL, 3))), vL)
        xB = rng.rand(100, 512, 512).astype(np.float32)
        check("bench 100x512^2 roundtrip",
              np.asarray(t.inverse(t.forward(xB, 3))), xB)

    def sec_sharded():
        # Sharded transforms on a degenerate 1-device mesh: exercises the
        # from-extension kernel route (halo exchange -> _load_slab_ext) on
        # real hardware — the multi-chip compute path, minus the
        # collectives (r2 verdict item 3: the sharded paths ran XLA-only).
        from dtcwt_tpu.parallel import (make_mesh, ShardedTransform1d,
                                        ShardedTransform2d,
                                        ShardedTransform3d)
        mesh1 = make_mesh((1, 1), ("data", "rows"), jax.devices()[:1])
        ts = ShardedTransform2d(mesh1)
        xs2 = rng.rand(1, 2048, 2048).astype(np.float32)
        ps = ts.forward(xs2, 3)
        with engine.engine("xla"):
            psw = ts.forward(xs2, 3)
            rsw = ts.inverse(psw)
        for lvl, (a, b) in enumerate(zip(ps.highpasses, psw.highpasses)):
            check("sharded2d mesh1 fwd L%d" % lvl, split(a), split(b))
        check("sharded2d mesh1 inv", ts.inverse(ps), rsw)
        t1s = ShardedTransform1d(mesh1)
        xs1 = rng.rand(1, 1 << 15, 4).astype(np.float32)
        p1s = t1s.forward(xs1, 4)
        with engine.engine("xla"):
            w1s = t1s.inverse(t1s.forward(xs1, 4))
        check("sharded1d mesh1 roundtrip", t1s.inverse(p1s), w1s)
        mesh3 = make_mesh((1, 1), ("data", "depth"), jax.devices()[:1])
        t3s = ShardedTransform3d(mesh3)
        vs = rng.rand(1, 64, 128, 128).astype(np.float32)
        p3s = t3s.forward(vs, 2)
        with engine.engine("xla"):
            w3s = t3s.inverse(t3s.forward(vs, 2))
        check("sharded3d mesh1 roundtrip", t3s.inverse(p3s), w3s)

    def sec_grad():
        # gradient through the Pallas dispatch: the fused custom adjoints
        # (ops/adjoint.py) against the XLA engine's mechanical transpose.
        # Must run under jit — eager complex intermediates hit the axon
        # tunnel's unimplemented complex-transfer path (CLAUDE.md).
        t = dt.Transform2d()
        t3 = dt.Transform3d()
        x = rng.rand(512, 512).astype(np.float32)
        v = rng.rand(32, 32, 256).astype(np.float32)

        def loss2(a):
            return jnp.sum(t._inverse_impl(
                t._forward_impl(a, nlevels=2, include_scale=False),
                None) ** 2)

        def loss3(a):
            return jnp.sum(t3._inverse_impl(t3._forward_impl(
                a, nlevels=2, include_scale=False,
                discard_level_1=False)) ** 2)

        for name, loss, arg in (("grad 2d fwd+inv", loss2, x),
                                ("grad 3d fwd+inv", loss3, v)):
            g1 = jax.jit(jax.grad(loss))(jnp.asarray(arg))
            with engine.engine("xla"):
                g2 = jax.jit(jax.grad(loss))(jnp.asarray(arg))
            rel = float(np.abs(np.asarray(g1) - np.asarray(g2)).max()
                        / max(np.abs(np.asarray(g2)).max(), 1e-30))
            ok = np.isfinite(np.asarray(g1)).all() and rel < 5e-3
            print("%-52s %s  (rel %.2e)" % (name, "ok" if ok else "FAIL",
                                            rel), flush=True)
            if not ok:
                failures.append(name)

    runners = {"2d": sec_2d, "planes": sec_planes, "gain": sec_gain,
               "1d": sec_1d, "3d": sec_3d, "hw22": sec_hw22,
               "bf16": sec_bf16, "bench": sec_bench,
               "sharded": sec_sharded, "grad": sec_grad}
    for name in ALL_SECTIONS:
        if name in sections:
            runners[name]()

    if failures:
        print("\n%d FAILURES: %s" % (len(failures), failures))
        return 1
    print("\nall kernel configurations match the XLA engine on %s"
          % jax.default_backend())
    return 0


if __name__ == "__main__":
    sys.exit(main())
