"""Fused level-1 3-D kernels: depth filtering + cube2c packing in one pass.

The unfused 3-D level-1 analysis costs three passes per level — the
two-sided (H, W) operator pair (:mod:`pallas_hw`), four depth-axis
dual-stream passes (:mod:`pallas_dual`) and an XLA ``cube2c`` relayout per
octant — ~2.1 GB of HBM traffic for a 256³ volume where ~0.6 GB is
mandatory (profiled at ~9.4 ms of the 11.7 ms 3-level forward on a v5e).
The pair of kernels here cuts that to ~1.3 GB:

``filter_hw5``   the :func:`pallas_hw.filter_hw22` MXU stage, emitting the
                 branch-(0,0) volume in standard layout *plus* all four
                 branch volumes in **parity-grouped (H, W) layout** (even
                 rows/columns first).  Grouping is a permutation of the
                 operator matrices, so it costs nothing on the MXU — and it
                 turns every corner extraction downstream into a static
                 aligned block slice (lane/sublane *deinterleaves* do not
                 lower inside Mosaic kernels, but aligned half-slices do).

``fwd_dpack``    one fused pass over the five volumes that runs the depth
                 tree stage AND the cube2c corner packing per octant,
                 emitting the level lowpass and all 28 directional subbands
                 as band-major re/im planes.  Tiled over grouped H rows so
                 the FULL depth axis sits in VMEM: depth taps are register
                 shifts along dim 0 (no sublane relayouts), the depth
                 mirror extension is an in-kernel static concat, and the
                 D/H/W corner parities are dim-0 reshapes / slab choice /
                 aligned lane halves.

An earlier single-kernel attempt (whole tree in one pass, depth merged
into the sublane axis) was chip-validated correct but 3× SLOWER than the
unfused path: every depth/H tap was an unaligned sublane shift of a tall
``(S, 128)`` value and Mosaic lowers each as a full-value relayout.  The
two-kernel split keeps the H/W stages on the MXU and gives the depth
stage the one layout where its taps are free.

Reference semantics: ``/root/reference/dtcwt/numpy/transform3d.py``
(``_level1_xfm`` :208-289, ``cube2c`` :532-579 — eqs. (6)-(9) of Chen &
Kingsbury 2012); equivalent to ``pallas_hw.filter_hw22`` + two
``fb.filter2_axis(axis=-3)`` calls + ``packing.cube2c_planes`` per octant.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dtcwt_tpu.ops.pallas_fb import (_LANE, _SUBLANE, _as_taps,
                                     _compiler_params, _interpret,
                                     _mxu_precision, _round_up)
from dtcwt_tpu.ops.pallas_hw import _mats, _MAX_C

__all__ = ["fwd_level1_pack", "inv_level1_pack"]

# octant order of the 28 highpass directions — must match
# transform3d._OCTANTS (reference transform3d.py:278-289).  Tuples are
# (i, j, k) = branch of (D, H, W); branch 1 = highpass.
_OCTANTS = (
    (0, 1, 0),   # HLL
    (1, 0, 0),   # LHL
    (1, 1, 0),   # HHL
    (0, 0, 1),   # LLH
    (0, 1, 1),   # HLH
    (1, 0, 1),   # LHH
    (1, 1, 1),   # HHH
)

_BUDGET = 80 * 1024 * 1024   # planner bound (scoped-VMEM hard cap is 100 MB)


def _group_perm(n: int) -> np.ndarray:
    """Even indices first, then odd: the parity-grouping permutation."""
    return np.concatenate([np.arange(0, n, 2), np.arange(1, n, 2)])


# ---------------------------------------------------------------------------
# stage 1: two-sided MXU kernel, standard (0,0) + four grouped outputs
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _build_hw5(N: int, H: int, W: int, taps0, taps1, dtype_str: str):
    (A0, A1), (B0, B1) = _mats("filter", taps0, taps1, H, W)
    ph, pw = _group_perm(H), _group_perm(W)
    A0g, A1g = A0[ph, :], A1[ph, :]          # grouped output rows
    B0g, B1g = B0[:, pw], B1[:, pw]          # grouped output columns
    dtype = jnp.dtype(dtype_str)
    hp = _mxu_precision(dtype)

    # Only TWO left matmuls: the branch-(0,0) volume is emitted with rows
    # grouped but columns standard (t0g @ B0) — the dpack LLL step
    # re-interleaves its rows in-kernel, so the standard-row left product
    # (a 25% MXU surcharge at H=W) is never materialised.
    def kernel(x_ref, a0g, a1g, b0, b0g, b1g, o00, g00, g01, g10, g11):
        x = x_ref[0].astype(jnp.float32)
        for a_ref, outs in ((a0g, ((b0, o00), (b0g, g00), (b1g, g01))),
                            (a1g, ((b0g, g10), (b1g, g11)))):
            t = jnp.dot(a_ref[:, :], x, precision=hp,
                        preferred_element_type=jnp.float32)
            for b_ref, o_ref in outs:
                o_ref[0] = jnp.dot(t, b_ref[:, :], precision=hp,
                                   preferred_element_type=jnp.float32
                                   ).astype(dtype)

    if N % 2:
        return None
    mat = lambda m: pl.BlockSpec(m.shape, lambda d: (0, 0),
                                 memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, H, W), lambda d: (d, 0, 0),
                            memory_space=pltpu.VMEM)
    # The four grouped outputs scatter their depth slices parity-major
    # ([..., 2, D/2, H, W] semantics): slice n lands at block
    # (n - n%2)/2 + (n%2)*N/2.  A free permutation — same writes, different
    # destinations — that makes the depth-parity corner extraction
    # downstream a plain slab choice instead of a (slow) register select.
    par_spec = pl.BlockSpec(
        (1, H, W), lambda d: ((d - d % 2) // 2 + (d % 2) * (N // 2), 0, 0),
        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[pl.BlockSpec((1, H, W), lambda d: (d, 0, 0),
                               memory_space=pltpu.VMEM),
                  mat(A0g), mat(A1g), mat(B0), mat(B0g), mat(B1g)],
        out_specs=(out_spec,) + (par_spec,) * 4,
        out_shape=(jax.ShapeDtypeStruct((N, H, W), dtype),) * 5,
        compiler_params=_compiler_params(1),
        interpret=_interpret(),
    )
    mats = (A0g, A1g, B0, B0g, B1g)  # numpy: see pallas_hw._build_hw22
    return lambda x: call(x, *(jnp.asarray(m) for m in mats))


# ---------------------------------------------------------------------------
# stage 2: fused depth filter + cube2c pack
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _build_dpack(B: int, D: int, H: int, W: int, h0bytes: bytes,
                 h1bytes: bytes, dtype_str: str):
    h0 = np.frombuffer(h0bytes, dtype=np.float64)
    h1 = np.frombuffer(h1bytes, dtype=np.float64)
    m0, m1 = h0.size, h1.size
    p0, p1 = m0 // 2, m1 // 2
    pmax = max(p0, p1)
    dtype = jnp.dtype(dtype_str)
    H2, W2 = H // 2, W // 2

    # --- grouped-H tile planner -----------------------------------------
    t2 = None
    for t in (32, 16, 8) if not _interpret() else (8, 4, 2, 1):
        if t > H2 or H2 % t:
            continue
        slab = D * t * W * 4                    # one grouped slab (f32)
        est = (20 * slab                        # double-buffered slab sets
               + 8 * slab                       # live ext/conv temporaries
               + 4 * D * 2 * t * W * 4          # double-buffered out blocks
               )
        if est <= _BUDGET:
            t2 = t
            break
    if t2 is None:
        return None
    tH = 2 * t2
    n_ht = H2 // t2
    De = D + 2 * pmax

    taps = {}
    for i, h in ((0, h0), (1, h1)):
        hr = tuple(float(v) for v in h[::-1])
        taps[i] = (hr, h.size // 2)
    D2 = D // 2
    # depth-parity scratch paddings: the number of even/odd extended
    # indices below 0 and at/above D (the grouped inputs arrive
    # parity-split from _build_hw5's scatter index maps)
    pe_lo, pe_hi = pmax // 2, (pmax + 1) // 2
    po_lo, po_hi = (pmax + 1) // 2, pmax // 2
    Se = pe_lo + D2 + pe_hi
    So = po_lo + D2 + po_hi

    def d_conv(ext, branch: int, scale: float):
        """Non-decimating depth correlation as dim-0 register shifts of a
        pre-extended (De, r, W) value: out[d] = sum_u h_rev[u] *
        ext[d + pmax - p + u]."""
        hr, p = taps[branch]
        acc = None
        for u, t in enumerate(hr):
            term = (lax.slice_in_dim(ext, pmax - p + u,
                                     pmax - p + u + D, axis=0)
                    * jnp.asarray(t * scale, jnp.float32))
            acc = term if acc is None else acc + term
        return acc

    def kernel(s00, g00, g01, g10, g11, lll_ref, re_ref, im_ref,
               ss, sge, sgo, sem):
        b = pl.program_id(0)
        i = pl.program_id(1)
        k = pl.program_id(2)
        grp = (g00, g01, g10, g11)
        n_ht_total = H2 // t2

        def sched(tile, buf, phase):
            """Issue or await H-tile *tile*'s 18 slab copies into buffer
            *buf* (double-buffered: tile i+1 prefetches while tile i's
            eight compute steps run).  The s00 volume is depth-unsplit
            (rows-grouped, cols-standard); the four grouped volumes arrive
            depth-parity-major ([2, B, D/2, H, W]) and land at the parity
            scratches' main regions, whose cross-parity mirror rows are
            filled in-kernel."""
            rows = {0: pl.ds(tile * t2, t2), 1: pl.ds(H2 + tile * t2, t2)}
            for hp in (0, 1):
                getattr(pltpu.make_async_copy(
                    s00.at[b, :, rows[hp], :],
                    ss.at[2 * buf + hp, pl.ds(pmax, D)],
                    sem.at[buf, 8]), phase)()
                for jk in range(4):
                    slot = 8 * buf + 4 * hp + jk
                    getattr(pltpu.make_async_copy(
                        grp[jk].at[0, b, :, rows[hp], :],
                        sge.at[slot, pl.ds(pe_lo, D2)],
                        sem.at[buf, jk + 4 * hp]), phase)()
                    getattr(pltpu.make_async_copy(
                        grp[jk].at[1, b, :, rows[hp], :],
                        sgo.at[slot, pl.ds(po_lo, D2)],
                        sem.at[buf, jk + 4 * hp]), phase)()

        def mirror_fill(slot):
            # half-sample symmetry ext[-1-t] = v[t] crosses depth parity:
            # the even extension rows mirror the odd main rows and vice
            # versa (cf. the W-parity swap in pallas_level1's wrapper).
            for j in range(pe_lo):
                sge[slot, pe_lo - 1 - j] = sgo[slot, po_lo + j]
            for j in range(po_lo):
                sgo[slot, po_lo - 1 - j] = sge[slot, pe_lo + j]
            for j in range(pe_hi):
                sge[slot, pe_lo + D2 + j] = sgo[slot, po_lo + D2 - 1 - j]
            for j in range(po_hi):
                sgo[slot, po_lo + D2 + j] = sge[slot, pe_lo + D2 - 1 - j]

        def d_conv_dec(slot, branch: int, c: int, scale: float):
            """Decimated depth correlation straight off the parity
            scratches: y_c[u] = sum_t h_rev[t] * x_ext[2u + c - p + t] —
            every tap a free leading-dim slice of the source parity slab,
            so the corner extraction needs no register selects at all."""
            hr, p = taps[branch]
            acc = None
            for t, v in enumerate(hr):
                g = c - p + t            # source offset relative to 2u
                q = g % 2
                base = (g - q) // 2
                src, lo = (sge, pe_lo) if q == 0 else (sgo, po_lo)
                term = (src[slot, pl.ds(lo + base, D2)]
                        .astype(jnp.float32)
                        * jnp.asarray(v * scale, jnp.float32))
                acc = term if acc is None else acc + term
            return acc

        buf = i % 2

        @pl.when(k == 0)
        def _():
            @pl.when(i == 0)
            def _():
                sched(i, buf, "start")
            sched(i, buf, "wait")

            @pl.when(i + 1 < n_ht_total)
            def _():
                sched(i + 1, 1 - buf, "start")
            for slot in range(8):
                mirror_fill(8 * buf + slot)
            # the s00 depth extension stays interleaved: mirror rows are
            # plain row copies, and the conv is free leading-dim shifts
            for j in range(2):
                for e in range(pmax):
                    ss[2 * buf + j, e] = ss[2 * buf + j, 2 * pmax - 1 - e]
                    ss[2 * buf + j, pmax + D + e] = \
                        ss[2 * buf + j, pmax + D - 1 - e]
            # branch-(0,0) rows arrive grouped (see _build_hw5); the LLL
            # block re-interleaves them with a free leading-dim reshape.
            y_he = d_conv(ss[2 * buf].astype(jnp.float32), 0, 1.0)
            y_ho = d_conv(ss[2 * buf + 1].astype(jnp.float32), 0, 1.0)
            lll_ref[0] = (jnp.stack([y_he, y_ho], axis=2)
                          .reshape(D, tH, W).astype(dtype))

        for n, (ib, jb, kb) in enumerate(_OCTANTS):
            @pl.when(k == n + 1)
            def _(ib=ib, jb=jb, kb=kb):
                s_he = 8 * buf + 2 * jb + kb
                s_ho = s_he + 4
                # corners: (D-parity, H-parity, W-parity) = (conv phase,
                # slab choice, aligned lane half); eqs. (6)-(9) combos
                # (packing._cube_corner_combos) with the 0.5 scale riding
                # the depth taps.
                y_he_e = d_conv_dec(s_he, ib, 0, 0.5)
                y_he_o = d_conv_dec(s_he, ib, 1, 0.5)
                y_ho_e = d_conv_dec(s_ho, ib, 0, 0.5)
                y_ho_o = d_conv_dec(s_ho, ib, 1, 0.5)
                A, E = y_he_e[..., :W2], y_he_e[..., W2:]
                C, G = y_he_o[..., :W2], y_he_o[..., W2:]
                Bq, F = y_ho_e[..., :W2], y_ho_e[..., W2:]
                Dq, Hq = y_ho_o[..., :W2], y_ho_o[..., W2:]
                ag_m, ag_p = A - G, A + G
                df_p, df_m = Dq + F, Dq - F
                re_ref[0] = (ag_m - df_p).astype(dtype)
                re_ref[1] = (ag_m + df_p).astype(dtype)
                re_ref[2] = (ag_p + df_m).astype(dtype)
                re_ref[3] = (ag_p - df_m).astype(dtype)
                bh_m, bh_p = Bq - Hq, Bq + Hq
                ce_p, ce_m = C + E, E - C
                im_ref[0] = (bh_m + ce_p).astype(dtype)
                im_ref[1] = (ce_p - bh_m).astype(dtype)
                im_ref[2] = (bh_p + ce_m).astype(dtype)
                im_ref[3] = (ce_m - bh_p).astype(dtype)

    lll_spec = pl.BlockSpec((1, D, tH, W), lambda b, i, k: (b, 0, i, 0),
                            memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec(
        (4, D // 2, t2, W2),
        lambda b, i, k: (b * 7 + jnp.maximum(k - 1, 0), 0, i, 0),
        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(B, n_ht, 8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 5,
        out_specs=(lll_spec, band_spec, band_spec),
        out_shape=(jax.ShapeDtypeStruct((B, D, H, W), dtype),
                   jax.ShapeDtypeStruct((B * 28, D // 2, H2, W2), dtype),
                   jax.ShapeDtypeStruct((B * 28, D // 2, H2, W2), dtype)),
        scratch_shapes=[pltpu.VMEM((4, De, t2, W), dtype),
                        pltpu.VMEM((16, Se, t2, W), dtype),
                        pltpu.VMEM((16, So, t2, W), dtype),
                        pltpu.SemaphoreType.DMA((2, 9))],
        compiler_params=_compiler_params(3),
        interpret=_interpret(),
    )
    return call


# ---------------------------------------------------------------------------
# inverse: unpack + depth synthesis, then grouped-input (H, W) merge
# ---------------------------------------------------------------------------

# octants contributing to each (j, k) branch of the synthesis depth merge:
# branch index 2j+k -> list of (depth branch i, index into _OCTANTS).
# Branch (0, 0)'s depth-lowpass contribution is the LLL volume itself.
_BRANCH_OCTS = (
    ((1, 1),),            # (0,0): LHL (1,0,0)
    ((0, 3), (1, 5)),     # (0,1): LLH (0,0,1), LHH (1,0,1)
    ((0, 0), (1, 2)),     # (1,0): HLL (0,1,0), HHL (1,1,0)
    ((0, 4), (1, 6)),     # (1,1): HLH (0,1,1), HHH (1,1,1)
)


@functools.lru_cache(maxsize=None)
def _build_idpack(B: int, D: int, H: int, W: int, g0bytes: bytes,
                  g1bytes: bytes, dtype_str: str):
    g0 = np.frombuffer(g0bytes, dtype=np.float64)
    g1 = np.frombuffer(g1bytes, dtype=np.float64)
    p0, p1 = g0.size // 2, g1.size // 2
    pmax = max(p0, p1)
    dtype = jnp.dtype(dtype_str)
    H2, W2 = H // 2, W // 2
    D2 = D // 2

    t2 = None
    for t in (32, 16, 8) if not _interpret() else (8, 4, 2, 1):
        if t > H2 or H2 % t:
            continue
        slab = D * t * W * 4
        est = (6 * slab      # band/lll slabs (bands are half-volume each)
               + 10 * slab   # corner pieces + conv temporaries
               + 8 * slab)   # double-buffered V out blocks (4 refs)
        if est <= _BUDGET:
            t2 = t
            break
    if t2 is None:
        return None

    taps = {}
    for i, g in ((0, g0), (1, g1)):
        gr = tuple(float(v) for v in g[::-1])
        taps[i] = (gr, g.size // 2)
    pe_lo, pe_hi = pmax // 2, (pmax + 1) // 2
    po_lo, po_hi = (pmax + 1) // 2, pmax // 2
    Se = pe_lo + D2 + pe_hi
    So = po_lo + D2 + po_hi

    def kernel(lll_g, re_hbm, im_hbm, vee, veo, voe, voo,
               sb_re, sb_im, sle, slo, sce, sco, sem):
        # sb_re/sb_im: double-buffered band slabs (slot 8*buf + 4*n + r);
        # sle/slo: double-buffered LLL parity slabs (slot 2*buf + hp);
        # sce/sco: per-octant staging (slot = hp), reused within a step.
        b = pl.program_id(0)
        i = pl.program_id(1)
        k = pl.program_id(2)
        n_ht_total = H2 // t2

        def mirror_fill(se, so, hp):
            for j in range(pe_lo):
                se[hp, pe_lo - 1 - j] = so[hp, po_lo + j]
            for j in range(po_lo):
                so[hp, po_lo - 1 - j] = se[hp, pe_lo + j]
            for j in range(pe_hi):
                se[hp, pe_lo + D2 + j] = so[hp, po_lo + D2 - 1 - j]
            for j in range(po_hi):
                so[hp, po_lo + D2 + j] = se[hp, pe_lo + D2 - 1 - j]

        def d_conv_up(se, so, hp, branch: int, c: int):
            """Full-rate depth synthesis row parity *c* straight off the
            parity scratches: V_c[u] = sum_t g_rev[t] *
            oct_ext[2u + c - p + t] — free leading-dim slices."""
            gr, p = taps[branch]
            acc = None
            for t, v in enumerate(gr):
                g = c - p + t
                q = g % 2
                base = (g - q) // 2
                src, lo = (se, pe_lo) if q == 0 else (so, po_lo)
                term = (src[hp, pl.ds(lo + base, D2)].astype(jnp.float32)
                        * jnp.asarray(v, jnp.float32))
                acc = term if acc is None else acc + term
            return acc

        def sched(tile, jk, buf, phase):
            """Issue or await step (tile, branch jk)'s slab copies into
            buffer *buf* — the next step prefetches while the current one
            runs its depth synthesis."""
            plan = []
            if jk == 0:
                for hp, rows in ((0, pl.ds(tile * t2, t2)),
                                 (1, pl.ds(H2 + tile * t2, t2))):
                    plan.append((lll_g.at[0, b, :, rows, :],
                                 sle.at[2 * buf + hp, pl.ds(pe_lo, D2)],
                                 4 + hp))
                    plan.append((lll_g.at[1, b, :, rows, :],
                                 slo.at[2 * buf + hp, pl.ds(po_lo, D2)],
                                 4 + hp))
            for n, (_ib, o) in enumerate(_BRANCH_OCTS[jk]):
                row0 = b * 28 + 4 * o
                plan.append((re_hbm.at[pl.ds(row0, 4), :,
                                       pl.ds(tile * t2, t2), :],
                             sb_re.at[pl.ds(8 * buf + 4 * n, 4)], 2 * n))
                plan.append((im_hbm.at[pl.ds(row0, 4), :,
                                       pl.ds(tile * t2, t2), :],
                             sb_im.at[pl.ds(8 * buf + 4 * n, 4)],
                             2 * n + 1))
            for src, dst, s in plan:
                getattr(pltpu.make_async_copy(src, dst,
                                              sem.at[buf, s]), phase)()

        for jk, octs in enumerate(_BRANCH_OCTS):
            @pl.when(k == jk)
            def _(jk=jk, octs=octs):
                # within this branch k == jk statically, so the buffer
                # parity and the next step's branch index are static:
                # buf = (4*i + jk) % 2 = jk % 2.
                buf = jk % 2
                if jk == 0:
                    @pl.when(i == 0)
                    def _():
                        sched(i, 0, 0, "start")
                sched(i, jk, buf, "wait")
                if jk < 3:
                    sched(i, jk + 1, 1 - buf, "start")
                else:
                    @pl.when(i + 1 < n_ht_total)
                    def _():
                        sched(i + 1, 0, 1 - buf, "start")
                acc = {}
                if jk == 0:
                    mirror_fill(sle, slo, 2 * buf)
                    mirror_fill(sle, slo, 2 * buf + 1)
                    for hp in (0, 1):
                        for c in (0, 1):
                            acc[(hp, c)] = d_conv_up(sle, slo,
                                                     2 * buf + hp, 0, c)
                for n, (ib, _o) in enumerate(octs):
                    s_re = sb_re.at[pl.ds(8 * buf + 4 * n, 4)]
                    s_im = sb_im.at[pl.ds(8 * buf + 4 * n, 4)]
                    pr, qr, rr, sr = (s_re[m].astype(jnp.float32)
                                      for m in range(4))
                    pi, qi, ri, si = (s_im[m].astype(jnp.float32)
                                      for m in range(4))
                    half = jnp.asarray(0.5, jnp.float32)
                    # c2cube corners (packing._c2cube_parts; reference
                    # transform3d.py:581-619) are NATIVELY depth-parity
                    # split — each lands in its parity scratch with a lane
                    # concat, no interleave anywhere.
                    c000 = (pr + qr + rr + sr) * half
                    c101 = (-pr - qr + rr + sr) * half
                    c110 = (-pr + qr + rr - sr) * half
                    c011 = (-pr + qr - rr + sr) * half
                    c010 = (pi - qi + ri - si) * half
                    c111 = (-pi + qi + ri - si) * half
                    c100 = (pi + qi - ri - si) * half
                    c001 = (pi + qi + ri + si) * half
                    cat = lambda a, bb: jnp.concatenate([a, bb], axis=-1)
                    sce[0, pl.ds(pe_lo, D2)] = cat(c000, c001)
                    sco[0, pl.ds(po_lo, D2)] = cat(c100, c101)
                    sce[1, pl.ds(pe_lo, D2)] = cat(c010, c011)
                    sco[1, pl.ds(po_lo, D2)] = cat(c110, c111)
                    mirror_fill(sce, sco, 0)
                    mirror_fill(sce, sco, 1)
                    for hp in (0, 1):
                        for c in (0, 1):
                            term = d_conv_up(sce, sco, hp, ib, c)
                            acc[(hp, c)] = (term if (hp, c) not in acc
                                            else acc[(hp, c)] + term)
                vee[0] = acc[(0, 0)].astype(dtype)
                veo[0] = acc[(0, 1)].astype(dtype)
                voe[0] = acc[(1, 0)].astype(dtype)
                voo[0] = acc[(1, 1)].astype(dtype)

    v_spec = pl.BlockSpec((1, D2, t2, W),
                          lambda b, i, k: (b * 4 + k, 0, i, 0),
                          memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(B, H2 // t2, 4),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 3,
        out_specs=(v_spec,) * 4,
        out_shape=(jax.ShapeDtypeStruct((B * 4, D2, H2, W), dtype),) * 4,
        scratch_shapes=[pltpu.VMEM((16, D2, t2, W2), dtype),
                        pltpu.VMEM((16, D2, t2, W2), dtype),
                        pltpu.VMEM((4, Se, t2, W), dtype),
                        pltpu.VMEM((4, So, t2, W), dtype),
                        pltpu.VMEM((2, Se, t2, W), dtype),
                        pltpu.VMEM((2, So, t2, W), dtype),
                        pltpu.SemaphoreType.DMA((2, 6))],
        compiler_params=_compiler_params(3),
        interpret=_interpret(),
    )
    return call, t2


@functools.lru_cache(maxsize=None)
def _build_hwsum_grouped(B: int, D: int, H: int, W: int, taps0, taps1,
                         dtype_str: str):
    """Synthesis (H, W) stage-pair merge on grouped-layout branch volumes
    split into He/Ho × depth-parity quarters (the :func:`_build_idpack`
    output form): ``Y[d] = sum_jk Ai_j[:, permH] @ V'[jk][d] @
    Bi_k[permW, :]`` — the grouping permutations fold into the operator
    matrices for free (cf. pallas_hw._build_sum_hw22).  Each grid step
    reconstructs one even/odd depth-slice PAIR so the depth parity never
    needs a data-dependent select."""
    (A0, A1), (B0, B1) = _mats("filter", taps0, taps1, H, W)
    ph, pw = _group_perm(H), _group_perm(W)
    A0g, A1g = A0[:, ph], A1[:, ph]
    B0g, B1g = B0[pw, :], B1[pw, :]
    dtype = jnp.dtype(dtype_str)
    hp = _mxu_precision(dtype)

    def kernel(*refs):
        vs = refs[:16]          # (hp, c, jk) -> vs[8*hp + 4*c + jk]
        a0, a1, b0, b1 = refs[16:20]
        o_ref = refs[20]
        for c in (0, 1):
            acc = None
            for j, a_ref in ((0, a0), (1, a1)):
                inner = None
                for kw, b_ref in ((0, b0), (1, b1)):
                    jk = 2 * j + kw
                    x = jnp.concatenate(
                        [vs[4 * c + jk][0, 0].astype(jnp.float32),
                         vs[8 + 4 * c + jk][0, 0].astype(jnp.float32)],
                        axis=0)
                    term = jnp.dot(x, b_ref[:, :], precision=hp,
                                   preferred_element_type=jnp.float32)
                    inner = term if inner is None else inner + term
                term = jnp.dot(a_ref[:, :], inner, precision=hp,
                               preferred_element_type=jnp.float32)
                acc = term if acc is None else acc + term
            o_ref[0, c] = acc.astype(dtype)

    mat = lambda m: pl.BlockSpec(m.shape, lambda b, u: (0, 0),
                                 memory_space=pltpu.VMEM)
    # all sixteen V inputs are views of the same four stacked (B*4, ...)
    # arrays; the per-position index maps select branch jk's block.
    in_specs = [pl.BlockSpec((1, 1, H // 2, W),
                             (lambda jk: lambda b, u: (b * 4 + jk, u, 0, 0)
                              )(jk), memory_space=pltpu.VMEM)
                for jk in range(4)]
    call = pl.pallas_call(
        kernel,
        grid=(B, D // 2),
        in_specs=in_specs * 4 + [mat(A0g), mat(A1g), mat(B0g), mat(B1g)],
        out_specs=pl.BlockSpec((1, 2, H, W), lambda b, u: (b, u, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D, H, W), dtype),
        compiler_params=_compiler_params(2),
        interpret=_interpret(),
    )
    mats = (A0g, A1g, B0g, B1g)  # numpy: see pallas_hw._build_hw22
    return lambda *v: call(*v, *(jnp.asarray(m) for m in mats))


def _group_lowpass(x):
    """[B, D, H, W] -> [2, B, D/2, H, W] with H/W parity-grouped (even
    rows/cols first) and depth split by parity — the idpack input form.
    Single-axis strided slices only (fast tiled copies, never gathers);
    XLA fuses the whole relayout into one pass."""
    x = jnp.concatenate([x[..., 0::2, :], x[..., 1::2, :]], axis=-2)
    x = jnp.concatenate([x[..., 0::2], x[..., 1::2]], axis=-1)
    return jnp.stack([x[:, 0::2], x[:, 1::2]], axis=0)


def inv_level1_pack(lll, re, im, g0o, g1o) -> Optional[jnp.ndarray]:
    """Fused level-1 3-D inverse: the level lowpass ``[..., D, H, W]`` and
    band-major plane pairs ``[..., 28, D/2, H/2, W/2]`` back to the
    reconstructed volume.  None outside the kernel envelope."""
    g0 = _as_taps(g0o)
    g1 = _as_taps(g1o)
    if g0.size % 2 == 0 or g1.size % 2 == 0:
        return None
    if jnp.ndim(lll) < 3 or jnp.result_type(lll) != jnp.float32:
        return None
    if jnp.result_type(re) != jnp.float32:
        return None
    if im.shape != re.shape or jnp.result_type(im) != jnp.float32:
        return None
    D, H, W = lll.shape[-3], lll.shape[-2], lll.shape[-1]
    if re.shape[-4:] != (28, D // 2, H // 2, W // 2):
        return None
    pmax = max(g0.size // 2, g1.size // 2)
    if D % 2 or H % 2 or W % 2 or D < 2 * pmax or min(H, W) < 2 * pmax:
        return None
    if H > _MAX_C or W > _MAX_C:
        return None
    if not _interpret():
        if H % (2 * _SUBLANE) or W % (2 * _LANE):
            return None
    lead = lll.shape[:-3]
    l4 = lll.reshape((-1, D, H, W))
    B = l4.shape[0]
    built = _build_idpack(B, D, H, W, g0.tobytes(), g1.tobytes(),
                          str(l4.dtype))
    if built is None:
        return None
    idpack, _t2 = built
    hwsum = _build_hwsum_grouped(B, D, H, W, (g0.tobytes(),),
                                 (g1.tobytes(),), str(l4.dtype))
    re4 = re.reshape((B * 28,) + re.shape[-3:])
    im4 = im.reshape((B * 28,) + im.shape[-3:])
    vee, veo, voe, voo = idpack(_group_lowpass(l4), re4, im4)
    y = hwsum(*([vee] * 4 + [veo] * 4 + [voe] * 4 + [voo] * 4))
    return y.reshape(lead + (D, H, W))


def fwd_level1_pack(X, h0o, h1o, as_planes: bool = True
                    ) -> Optional[Tuple[jnp.ndarray, object]]:
    """Fused level-1 3-D forward: ``X [..., D, H, W]`` real f32 ->
    ``(lll [..., D, H, W], (re, im))`` band-major plane pairs
    ``[..., 28, D/2, H/2, W/2]`` in the reference octant order, or the
    complex band-minor level when ``as_planes=False``.  None outside the
    kernel envelope (caller falls back to the unfused path)."""
    h0 = _as_taps(h0o)
    h1 = _as_taps(h1o)
    if h0.size % 2 == 0 or h1.size % 2 == 0:
        return None
    if jnp.ndim(X) < 3 or jnp.result_type(X) != jnp.float32:
        return None
    D, H, W = X.shape[-3], X.shape[-2], X.shape[-1]
    pmax = max(h0.size // 2, h1.size // 2)
    if D % 2 or H % 2 or W % 2 or D < 2 * pmax or min(H, W) < 2 * pmax:
        return None
    if H > _MAX_C or W > _MAX_C:
        return None
    if not _interpret():
        if H % (2 * _SUBLANE) or W % (2 * _LANE):
            return None
    x4 = X.reshape((-1,) + X.shape[-3:])
    lead = X.shape[:-3]
    B = x4.shape[0]
    dpack = _build_dpack(B, D, H, W, h0.tobytes(), h1.tobytes(),
                         str(x4.dtype))
    if dpack is None:
        return None
    hw5 = _build_hw5(B * D, H, W, (h0.tobytes(),), (h1.tobytes(),),
                     str(x4.dtype))
    if hw5 is None:
        return None
    o00, g00, g01, g10, g11 = hw5(x4.reshape(B * D, H, W))
    o00 = o00.reshape((B, D, H, W))
    # the grouped outputs were scattered depth-parity-major by the output
    # index maps (free): reshape to [2, B, D/2, H, W] views
    g00, g01, g10, g11 = (
        v.reshape((2, B, D // 2, H, W)) for v in (g00, g01, g10, g11))
    lll, re, im = dpack(o00, g00, g01, g10, g11)
    lll = lll.reshape(lead + (D, H, W))
    re = re.reshape(lead + (28, D // 2, H // 2, W // 2))
    im = im.reshape(lead + (28, D // 2, H // 2, W // 2))
    if as_planes:
        return lll, (re, im)
    z = lax.complex(re, im)
    # band-major -> band-minor via static slices + stack (one XLA concat
    # pass; an index-array permutation would lower to a gather)
    bands = jnp.stack([z[..., n, :, :, :] for n in range(28)], axis=-1)
    return lll, bands
