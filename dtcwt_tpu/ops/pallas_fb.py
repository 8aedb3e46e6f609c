"""Pallas TPU kernels for the DTCWT filter-bank primitives.

These are the TPU-native equivalents of the reference's four embedded OpenCL
kernels (``/root/reference/dtcwt/opencl/lowlevel.py:384-654``):

==================  =========================================================
OpenCL kernel       Pallas equivalent here
==================  =========================================================
``CONVOLVE_KERNEL`` :func:`filter_axis` — non-decimating convolution with the
                    symmetric-reflect boundary computed *in kernel* on the
                    VMEM slab (no materialized padding in HBM), reference
                    semantics ``opencl/lowlevel.py:411-442``.
``DFILTER_KERNEL``  :func:`dfilt_axis` — decimate-by-2 dual filter; the
                    reference's per-thread (a,b) output interleave and the
                    ``ha·hb`` parity flip (``opencl/lowlevel.py:507-509``)
                    resolve at trace time because filters are static.
``IFILTER_KERNEL``  :func:`ifilt_axis` — interpolate-by-2 dual filter; the
                    reference's 4-outputs-per-thread odd/even tap split
                    (``opencl/lowlevel.py:543-585``) becomes a 4-way phase
                    interleave of whole row blocks.
``Q2C_KERNEL``      subsumed by the fused level kernels
                    (:mod:`pallas_level1`/:mod:`pallas_level2` pack the six
                    subbands in-kernel with the 1/sqrt(2) scale,
                    ``opencl/lowlevel.py:589-654``); a standalone Pallas
                    pack kernel measured slower than XLA's fused layout
                    ops and was removed (r1 verdict: near-dead code).
==================  =========================================================

Kernel design (one shape family, all three filter ops):

* The filtered axis is the **sublane** axis (second-to-minor).  Leading batch
  dimensions are flattened and become the first grid dimension.
* The input stays in ``pltpu.ANY`` (compiler-placed, HBM for large arrays).
  Each grid step DMAs exactly the rows its output tile needs — the tile body
  plus a halo each side — into a VMEM slab, so the input is read from HBM
  once per tile with no re-reads per filter tap.
* Boundary tiles fill their out-of-range halo rows by mirroring rows already
  resident in the slab (symmetric extension with repeated end samples,
  reference ``dtcwt/utils.py:136-153``); interior tiles take a single
  contiguous DMA.  This reproduces the in-register ``reflect()`` of the
  OpenCL kernels (``opencl/lowlevel.py:384-409``) at tile granularity.
* The tap loop is unrolled at trace time (filters are static npz constants),
  so each output tile is a straight-line sum of shifted slab slices on the
  VPU — no gathers, no strided vector ops.

Mosaic lowering constraints shape three details (probed on v5e):

* VMEM DMA destinations must start at sublane-tile multiples — the slab halo
  is rounded up to 8 rows and the compute window is a static in-register
  slice at the (arbitrary, static) misalignment offset.
* Strided vector slices don't lower, so polyphase streams are extracted by a
  ``(L, C) -> (L/k, k, C)`` reshape + middle-axis index instead of
  ``ext[p::k]``.
* Lane-axis deinterleaves don't lower either; the Q2C kernel takes its
  inputs pre-split by column parity (a single fast stride-2 slice each in
  XLA) and handles only the row parity + arithmetic in kernel.

f32/bf16 only (the MXU/VPU datapath); the f64 verification path stays on the
XLA engine in :mod:`dtcwt_tpu.ops.fb`.  On non-TPU backends the kernels run
through the Pallas interpreter so the full test suite exercises them on CPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["filter_axis", "dfilt_axis", "ifilt_axis",
           "supported"]

# Per-tile VMEM budget covering the input slab PLUS the unrolled tap
# temporaries (Mosaic allocates vector temporaries on a scoped VMEM stack
# with little reuse, so every live shifted slice counts).  The pallas
# pipeline double-buffers the output blocks on top of this; the shared
# _compiler_params scoped-VMEM ceiling is 100 MB, and 24 MB matches the
# fused level kernels' measured sweet spot (80 MB thrashes — see
# pallas_level1).  Raised from 8 MB in r3 so _pick_tiles_2d can afford
# MXU-filling (t >= 64) row tiles at wide lane extents.
_TILE_BYTES = 24 * 1024 * 1024

# Hard Mosaic scoped-VMEM ceiling shared by EVERY pallas_call in this
# package.  The slab planners above are estimates; Mosaic's actual scoped
# allocation (vector temporaries, relayouts, double-buffered output blocks)
# can exceed them, and the compiler default limit is only 16 MB out of the
# 128 MB/core a v5e has.  Round 2's bench crash was exactly this: the fused
# level kernels set a 100 MB limit while the primitive/dual-stream modules
# compiled with no compiler_params at all and the 3-D 256^3 dfilt2 call
# OOMed at compile time (17.84 MB scoped vs 16 MB default).  One policy,
# one place, applied to every kernel in ops/.
_VMEM_LIMIT_BYTES = 100 * 1024 * 1024

_SUBLANE = 8   # f32 sublane tile; DMA row offsets must be multiples of this
_LANE = 128    # lane width; manual-DMA kernels need 128-multiple columns


def _compiler_params(n_grid: int) -> "pltpu.CompilerParams":
    """Uniform compiler params for all kernel modules (grid dims are all
    data-independent tile loops -> 'arbitrary')."""
    return pltpu.CompilerParams(
        dimension_semantics=("arbitrary",) * n_grid,
        vmem_limit_bytes=_VMEM_LIMIT_BYTES)


def _mxu_precision(dtype):
    """Matmul precision for the in-kernel MXU dots: always a true fp32
    contract.  The banded operator matrices stay f32 even in bf16 kernels
    and the bf16 slab window is cast explicitly via :func:`_f32win`,
    because direct bf16 tpu.matmuls are broken on this toolchain both ways:
    HIGHEST is rejected at chip compile time ("Bad lhs type") and DEFAULT
    bf16 x bf16 was observed to MISCOMPILE at some tile plans (deterministic
    NaNs in the first tile of pallas_level2 at pair R=1024, jit-context-
    dependent) — the CPU interpreter accepts both.  bf16 stays the storage
    dtype for slabs and outputs, which is where the HBM-traffic win lives;
    the in-VMEM f32 widening only grows MXU operand temporaries."""
    del dtype
    return lax.Precision.HIGHEST


def _f32win(dtype):
    """Explicit f32 cast for the slab-side operand of in-kernel MXU dots in
    bf16 kernels — Mosaic rejects mixed f32 x bf16 tpu.matmuls as well
    ("Bad rhs type"), so jnp promotion alone is not enough; identity for
    f32.  See :func:`_mxu_precision` for why bf16 matmuls are avoided."""
    if jnp.dtype(dtype) == jnp.bfloat16:
        return lambda v: v.astype(jnp.float32)
    return lambda v: v


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _as_taps(h) -> np.ndarray:
    return np.asarray(h, dtype=np.float64).reshape(-1)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _flatten_batch(x) -> Tuple[jnp.ndarray, Tuple[int, ...]]:
    """[..., R, C] -> [B, R, C] plus the original leading shape."""
    lead = x.shape[:-2]
    B = int(np.prod(lead, dtype=np.int64)) if lead else 1
    return x.reshape((B,) + x.shape[-2:]), lead


def _pick_tile(n_units: int, rows_per_unit: int, C: int, pad8: int,
               itemsize: int, temp_rows_per_unit: int,
               n_slabs: int = 1) -> Optional[int]:
    """Largest tile size (in output units) dividing *n_units* whose input
    slab(s) plus live compute temporaries fit the VMEM budget and whose row
    count covers the halo; None if no valid tile exists (caller falls back
    to XLA).  *temp_rows_per_unit* estimates the unrolled-tap temporary rows
    per output unit (~the total sub-filter tap count); *n_slabs* is the
    number of same-shape input slabs resident at once (dual-stream kernels
    hold two)."""
    strict = not _interpret()
    budget_rows = max(_TILE_BYTES // max(C * max(itemsize, 4), 1), 1)
    best = None
    for t in (n_units, 512, 384, 256, 192, 128, 96, 64, 48, 32, 16, 8, 4, 2, 1):
        if t < 1 or t > n_units or n_units % t:
            continue
        t_in = t * rows_per_unit
        if t_in < pad8:
            continue
        if (strict or t < n_units) and t_in % _SUBLANE:
            # DMA slice sizes (not just offsets) must be sublane-aligned:
            # Mosaic rejects e.g. a 130-row HBM->VMEM copy even at offset 0
            # ("slice shape along dimension 1 must be aligned to tiling"),
            # including the single-tile whole-axis copy.  The interpreter
            # has no such limit — stay loose there so CPU tests keep their
            # coverage of the in-kernel mirror fills at awkward sizes.
            continue
        if (n_slabs * (t_in + 2 * pad8) + t * temp_rows_per_unit
                <= budget_rows):
            best = t if best is None else max(best, t)
            if t == n_units:
                return t
    return best


def _pick_tiles_2d(n_units: int, rows_per_unit: int, C: int, pad8: int,
                   itemsize: int, temp_rows_per_unit: int,
                   n_slabs: int = 1):
    """(tile_units, lane_tile) for a sublane kernel: the widest lane tile
    whose row tile still FILLS the compute units, else the tallest tile
    found (lane tiles must divide C and stay 128-aligned); None if nothing
    fits.

    Width alone is the wrong objective: at 256^3 the depth pass got
    (t=8, tc=16384) tiles whose 16-row stacked matmuls ran the MXU at 1/8
    occupancy — preferring t >= 64 (>= 128 stacked output rows) at a
    narrower tc more than doubled the 3-D forward's MXU throughput (r3).
    DMA efficiency is insensitive to the trade: even tc=2048 keeps 8 KB
    contiguous row segments.
    """
    cands = [C] + [c for c in (32768, 16384, 8192, 4096, 2048, 1024, 512,
                               256, 128)
                   if c < C and C % c == 0]
    best = None
    for tc in cands:
        if tc % _LANE and tc != C:
            continue
        t = _pick_tile(n_units, rows_per_unit, tc, pad8, itemsize,
                       temp_rows_per_unit, n_slabs)
        if t is None:
            continue
        if t == n_units or t >= 64:
            return t, tc
        if best is None or t > best[0]:
            best = (t, tc)
    if best is not None:
        return best
    return None, None


def _load_slab(x_hbm, b, scratch, sem, *, tile_idx, n_tiles: int,
               t_in: int, pad8: int, fill: int, R: int, lanes=None,
               phase=None):
    """DMA the rows tile *tile_idx* needs from ``x_hbm[b]`` into *scratch*
    (shape ``(t_in + 2*pad8, C)``) and mirror-fill out-of-range halo rows.

    Slab row ``s`` holds input row ``tile_idx*t_in + s - pad8`` with
    symmetric reflection (repeated end samples) where that index falls
    outside [0, R).  *pad8* is a multiple of 8 so every DMA destination is
    sublane-aligned; only *fill* (<= pad8) halo rows nearest the body are
    mirror-filled, since compute reads just those.  Requires
    ``pad8 <= t_in <= R``.

    *phase* splits the call for double-buffered prefetch: ``"start"``
    issues the copy only, ``"wait"`` waits on it (replaying the same
    descriptor branch structure so the semaphore byte counts match) and
    runs the mirror fills; ``None`` does both inline.
    """
    g0 = tile_idx * t_in
    do_fill = fill and phase != "start"

    def op(cp):
        if phase is None:
            cp.start()
            cp.wait()
        elif phase == "start":
            cp.start()
        else:
            cp.wait()

    def fill_front():
        for j in range(pad8 - fill, pad8):
            scratch[j, :] = scratch[2 * pad8 - 1 - j, :]

    def fill_back():
        for s in range(t_in + pad8, t_in + pad8 + fill):
            scratch[s, :] = scratch[2 * (t_in + pad8) - 1 - s, :]

    csl = slice(None) if lanes is None else pl.ds(lanes[0], lanes[1])

    if n_tiles == 1:
        op(pltpu.make_async_copy(
            x_hbm.at[b, :, csl], scratch.at[pl.ds(pad8, t_in), :], sem))
        if do_fill:
            fill_front()
            fill_back()
        return

    @pl.when(tile_idx == 0)
    def _():
        op(pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(0, t_in + pad8), csl],
            scratch.at[pl.ds(pad8, t_in + pad8), :], sem))
        if do_fill:
            fill_front()

    # t_in and pad8 are multiples of 8 whenever n_tiles > 1 (_pick_tile), so
    # hint Mosaic that the dynamic source offset is sublane-aligned.
    src0 = pl.multiple_of(g0 - pad8, _SUBLANE)

    if n_tiles > 2:
        # Interior tiles exist only for n_tiles >= 3; with exactly two tiles
        # this branch is dead but would still TRACE a full-slab copy larger
        # than the input axis (t_in + 2*pad8 > R), a static shape error.
        @pl.when(jnp.logical_and(tile_idx > 0, tile_idx < n_tiles - 1))
        def _():
            op(pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(src0, t_in + 2 * pad8), csl],
                scratch.at[:, :], sem))

    @pl.when(tile_idx == n_tiles - 1)
    def _():
        op(pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(src0, t_in + pad8), csl],
            scratch.at[pl.ds(0, t_in + pad8), :], sem))
        if do_fill:
            fill_back()


def _load_slab_ext(x_hbm, b, scratch, sem, *, tile_idx, t_src: int,
                   rows: int, lanes=None, phase=None):
    """DMA rows ``[tile_idx*t_src, tile_idx*t_src + rows)`` of a
    PRE-EXTENDED input into ``scratch[0:rows]`` — the from-extension twin of
    :func:`_load_slab` used by the sharded transforms, whose halo exchange
    (``parallel/halo.py``) already produced the boundary samples.  No mirror
    fills, no first/last-tile branches: every tile is one contiguous copy.
    Alignment holds by construction (t_src is a sublane multiple and the
    wide extension is a sublane multiple per side).  *phase* as in
    :func:`_load_slab`."""
    csl = slice(None) if lanes is None else pl.ds(lanes[0], lanes[1])
    src0 = pl.multiple_of(tile_idx * t_src, _SUBLANE)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(src0, rows), csl],
        scratch.at[pl.ds(0, rows), :], sem)
    if phase is None:
        cp.start()
        cp.wait()
    elif phase == "start":
        cp.start()
    else:
        cp.wait()


def _shift_corr(ext, taps: Sequence[float], n_out: int, offset: int = 0):
    """``Y[i] = sum_k taps[k] * ext[i + offset + k, :]`` as a trace-time-
    unrolled sum of contiguous shifted slices of the VMEM-resident value."""
    acc = None
    for k, t in enumerate(taps):
        lo = offset + k
        sl = lax.slice_in_dim(ext, lo, lo + n_out, axis=0)
        term = sl * jnp.asarray(t, ext.dtype)
        acc = term if acc is None else acc + term
    return acc


def _interleave_rows(parts):
    """out[len(parts)*i + q] = parts[q][i] along axis 0 (VMEM shuffle)."""
    n, c = parts[0].shape
    return jnp.stack(parts, axis=1).reshape(n * len(parts), c)


def _phases(win, k: int):
    """Polyphase streams of a 4/2-aligned window: returns ``[win[p::k]]`` as
    middle-axis views of a split reshape (strided slices don't lower)."""
    L, C = win.shape
    w = win.reshape(L // k, k, C)
    return [w[:, p, :] for p in range(k)]


# ---------------------------------------------------------------------------
# CONVOLVE: non-decimating filter along the sublane axis
# ---------------------------------------------------------------------------

# Filters with at least this many taps route their sublane correlation
# through the MXU as a banded-matrix matmul: per-tap sublane shifts cost a
# VMEM relayout each, so shift-accumulate scales linearly with taps while
# the banded matmul is ~flat (measured 3.3 -> 1.6 ms for a 13-tap colfilter
# at 4096^2 on v5e).
_MXU_MIN_TAPS = 9


def _pick_nb(B: int, slab_rows: int, tc: int, itemsize: int) -> int:
    """Items per program when one tile covers the whole row axis: small
    images in large batches otherwise leave each program with a tiny tile
    (per-program DMA/pipeline overhead dominates).  Pick the largest NB
    dividing B whose NB slabs fit ~half the tile budget."""
    budget = _TILE_BYTES // 2
    per_item = slab_rows * tc * max(itemsize, 4)
    nb = 1
    for cand in (16, 8, 4, 2):
        if B % cand == 0 and cand * per_item <= budget:
            nb = cand
            break
    return nb


def _banded(rows: int, cols: int, entries) -> np.ndarray:
    """Dense banded operator: entries is an iterable of (row, col, value)."""
    A = np.zeros((rows, cols), np.float32)
    for r, c, v in entries:
        A[r, c] += v
    return A


@functools.lru_cache(maxsize=None)
def _build_filter(B: int, R: int, C: int, hbytes: bytes, dtype_str: str,
                  ext_side: int = 0):
    """*ext_side* > 0 selects from-extension mode: the input already carries
    ``ext_side`` extension rows per side (a sublane multiple, produced by
    the sharded transforms' halo exchange), R is the OUTPUT row count, and
    the kernel runs no mirror fills — every tile is one aligned DMA."""
    h = np.frombuffer(hbytes, dtype=np.float64)
    m = h.size
    if m % 2 == 0:
        return None           # even-tap colfilter (R+1 outputs) -> XLA path
    pad = m // 2
    if ext_side:
        if ext_side % _SUBLANE or ext_side < pad:
            return None
        pad8 = ext_side
    else:
        pad8 = _round_up(max(pad, 1), _SUBLANE)
    dtype = jnp.dtype(dtype_str)
    use_mxu = m >= _MXU_MIN_TAPS and not _interpret()
    tr, tc = _pick_tiles_2d(R, 1, C, pad8, dtype.itemsize,
                            temp_rows_per_unit=4 if use_mxu else m + 2)
    if tr is None or pad8 > R:
        return None
    n_tiles = R // tr
    n_ctiles = C // tc
    nb = (_pick_nb(B, tr + 2 * pad8, tc, dtype.itemsize)
          if n_tiles == 1 and not ext_side else 1)
    hrev = tuple(float(v) for v in h[::-1])
    off = pad8 - pad          # static slab offset of the compute window
    if use_mxu:
        # out[i] = sum_k hrev[k] * win[i + k], win = slab[off : off+tr+2pad]
        A = _banded(tr, tr + 2 * pad,
                    ((i, i + k, hrev[k]) for i in range(tr)
                     for k in range(m)))  # stays f32: see _mxu_precision

    def kernel(x_hbm, *refs):
        a_ref = refs[0] if use_mxu else None
        o_ref, scratch, sem = refs[-3], refs[-2], refs[-1]
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        if nb == 1:
            if ext_side:
                _load_slab_ext(x_hbm, b, scratch, sem, tile_idx=i, t_src=tr,
                               rows=tr + 2 * pad8, lanes=(j * tc, tc))
            else:
                _load_slab(x_hbm, b, scratch, sem, tile_idx=i,
                           n_tiles=n_tiles, t_in=tr, pad8=pad8, fill=pad,
                           R=R, lanes=(j * tc, tc))
        else:
            # NB whole items per program: one 3-D DMA, per-item mirrors.
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(b * nb, nb),
                         :, pl.ds(j * tc, tc)],
                scratch.at[:, pl.ds(pad8, tr), :], sem)
            cp.start()
            cp.wait()
            for it in range(nb):
                for r_ in range(pad8 - pad, pad8):
                    scratch[it, r_, :] = scratch[it, 2 * pad8 - 1 - r_, :]
                for r_ in range(tr + pad8, tr + pad8 + pad):
                    scratch[it, r_, :] = scratch[
                        it, 2 * (tr + pad8) - 1 - r_, :]
        for it in range(nb):
            ext = lax.slice_in_dim(
                scratch[:, :] if nb == 1 else scratch[it],
                off, off + tr + 2 * pad, axis=0)
            if use_mxu:
                y = jnp.dot(a_ref[:, :], _f32win(dtype)(ext),
                            precision=_mxu_precision(dtype),
                            preferred_element_type=jnp.float32).astype(dtype)
            else:
                y = _shift_corr(ext, hrev, tr)
            if nb == 1:
                o_ref[0] = y
            else:
                o_ref[it] = y

    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
    if use_mxu:
        in_specs.append(pl.BlockSpec((tr, tr + 2 * pad),
                                     lambda b, i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
    scratch_shape = ((tr + 2 * pad8, tc) if nb == 1
                     else (nb, tr + 2 * pad8, tc))
    call = pl.pallas_call(
        kernel,
        grid=(B // nb, n_tiles, n_ctiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nb, tr, tc), lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, C), dtype),
        scratch_shapes=[pltpu.VMEM(scratch_shape, dtype),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=_compiler_params(3),
        interpret=_interpret(),
    )
    if use_mxu:
        return lambda x: call(x, A)
    return call


def filter_axis(x, h, axis: int):
    """Pallas non-decimating filter along *axis*; returns None if this shape
    or filter is outside the kernel's envelope (caller falls back to XLA)."""
    h = _as_taps(h)
    if not _supported_array(x, axis):
        return None
    x3, lead = _flatten_batch(_to_sublane(x, axis))
    if not _interpret() and x3.shape[-1] % _LANE:
        return None
    call = _build_filter(x3.shape[0], x3.shape[1], x3.shape[2],
                         h.tobytes(), str(x3.dtype))
    if call is None:
        return None
    y = call(x3)
    return _from_sublane(y.reshape(lead + y.shape[-2:]), x.ndim, axis,
                         trail=x.shape[-2:])


def _fromext_prep(ext, axis: int, side: int):
    """Shared envelope check + sublane routing for the from-extension
    wrappers; returns (x3, lead, R_out_axis_len) or None."""
    if side % _SUBLANE or side <= 0 or not _supported_array(ext, axis):
        return None
    x3, lead = _flatten_batch(_to_sublane(ext, axis))
    if not _interpret() and x3.shape[-1] % _LANE:
        return None
    R = x3.shape[1] - 2 * side
    if R < 1:
        return None
    return x3, lead, R


def filter_fromext_axis(ext, h, axis: int, side: int):
    """Pallas non-decimating filter on a PRE-EXTENDED buffer: *side*
    extension samples per side of *axis* (a sublane multiple >= len(h)//2 —
    the sharded transforms' halo exchange provides exactly this).  The
    kernel runs no mirror fills; every tile is one aligned DMA.  None ->
    caller's XLA path."""
    h = _as_taps(h)
    prep = _fromext_prep(ext, axis, side)
    if prep is None:
        return None
    x3, lead, R = prep
    call = _build_filter(x3.shape[0], R, x3.shape[2], h.tobytes(),
                         str(x3.dtype), ext_side=side)
    if call is None:
        return None
    y = call(x3)
    return _from_sublane(y.reshape(lead + y.shape[-2:]), ext.ndim, axis,
                         trail=ext.shape[-2:])


# ---------------------------------------------------------------------------
# DFILTER: decimate-by-2 dual filter along the sublane axis
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _build_dfilt(B: int, R: int, C: int, habytes: bytes, hbbytes: bytes,
                 dtype_str: str, ext_side: int = 0):
    ha = np.frombuffer(habytes, dtype=np.float64)
    hb = np.frombuffer(hbbytes, dtype=np.float64)
    m = ha.size
    if m % 2 or R % 4:
        return None
    if ext_side:
        if ext_side % _SUBLANE or ext_side < m:
            return None
        pad8 = ext_side
    else:
        pad8 = _round_up(m, _SUBLANE)
    dtype = jnp.dtype(dtype_str)
    use_mxu = m >= _MXU_MIN_TAPS and not _interpret()
    n_quads = R // 4            # output pairs; 4 input rows per output pair
    tq, tc = _pick_tiles_2d(n_quads, 4, C, pad8, dtype.itemsize,
                            temp_rows_per_unit=4 if use_mxu else 2 * m + 4)
    if tq is None or pad8 > R:
        return None
    n_tiles = n_quads // tq
    n_ctiles = C // tc
    har, hbr = ha[::-1], hb[::-1]
    ha_e = tuple(float(v) for v in har[0::2])
    ha_o = tuple(float(v) for v in har[1::2])
    hb_e = tuple(float(v) for v in hbr[0::2])
    hb_o = tuple(float(v) for v in hbr[1::2])
    pos = bool(np.sum(ha * hb) > 0)
    off = pad8 - m            # window start: extended index 4*q0 (phase 0)
    if use_mxu:
        # Interleaved rows of the banded decimator over the window (which
        # starts at extended index 4*q0):  Ya[i] = sum_k rev(ha)[k] *
        # win[4i + 2 + 2k],  Yb[i] = sum_k rev(hb)[k] * win[4i + 3 + 2k].
        ra, rb = (0, 1) if pos else (1, 0)
        A = _banded(2 * tq, 4 * tq + 2 * m,
                    [(2 * i + ra, 4 * i + 2 + 2 * k, float(har[k]))
                     for i in range(tq) for k in range(m)]
                    + [(2 * i + rb, 4 * i + 3 + 2 * k, float(hbr[k]))
                       for i in range(tq) for k in range(m)])  # stays f32: see _mxu_precision

    def kernel(x_hbm, *refs):
        a_ref = refs[0] if use_mxu else None
        o_ref, scratch, sem = refs[-3], refs[-2], refs[-1]
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        if ext_side:
            _load_slab_ext(x_hbm, b, scratch, sem, tile_idx=i, t_src=4 * tq,
                           rows=4 * tq + 2 * pad8, lanes=(j * tc, tc))
        else:
            _load_slab(x_hbm, b, scratch, sem, tile_idx=i, n_tiles=n_tiles,
                       t_in=4 * tq, pad8=pad8, fill=m, R=R,
                       lanes=(j * tc, tc))
        win = lax.slice_in_dim(scratch[:, :], off, off + 4 * tq + 2 * m,
                               axis=0)
        if use_mxu:
            o_ref[0] = jnp.dot(a_ref[:, :], _f32win(dtype)(win),
                               precision=_mxu_precision(dtype),
                               preferred_element_type=jnp.float32
                               ).astype(dtype)
            return
        # Quarter-phase streams of the extended signal (see ops/fb.py):
        #   Ya[i] = sum_u rev(ha)[2u] Q2[i+u] + sum_u rev(ha)[2u+1] Q0[i+u+1]
        #   Yb[i] = sum_u rev(hb)[2u] Q3[i+u] + sum_u rev(hb)[2u+1] Q1[i+u+1]
        q = _phases(win, 4)
        ya = (_shift_corr(q[2], ha_e, tq, offset=0)
              + _shift_corr(q[0], ha_o, tq, offset=1))
        yb = (_shift_corr(q[3], hb_e, tq, offset=0)
              + _shift_corr(q[1], hb_o, tq, offset=1))
        o_ref[0] = _interleave_rows((ya, yb) if pos else (yb, ya))

    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
    if use_mxu:
        in_specs.append(pl.BlockSpec((2 * tq, 4 * tq + 2 * m),
                                     lambda b, i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
    call = pl.pallas_call(
        kernel,
        grid=(B, n_tiles, n_ctiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 2 * tq, tc), lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R // 2, C), dtype),
        scratch_shapes=[pltpu.VMEM((4 * tq + 2 * pad8, tc), dtype),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=_compiler_params(3),
        interpret=_interpret(),
    )
    if use_mxu:
        return lambda x: call(x, A)
    return call


def dfilt_axis(x, ha, hb, axis: int):
    """Pallas decimate-by-2 dual filter along *axis* (None -> XLA fallback)."""
    ha, hb = _as_taps(ha), _as_taps(hb)
    if not _supported_array(x, axis):
        return None
    x3, lead = _flatten_batch(_to_sublane(x, axis))
    if not _interpret() and x3.shape[-1] % _LANE:
        return None
    call = _build_dfilt(x3.shape[0], x3.shape[1], x3.shape[2],
                        ha.tobytes(), hb.tobytes(), str(x3.dtype))
    if call is None:
        return None
    y = call(x3)
    return _from_sublane(y.reshape(lead + y.shape[-2:]), x.ndim, axis,
                         trail=x.shape[-2:])


def dfilt_fromext_axis(ext, ha, hb, axis: int, side: int):
    """Pallas decimate-by-2 dual filter on a pre-extended buffer (*side*
    >= len(ha) per side, a sublane multiple); None -> XLA path."""
    ha, hb = _as_taps(ha), _as_taps(hb)
    prep = _fromext_prep(ext, axis, side)
    if prep is None:
        return None
    x3, lead, R = prep
    call = _build_dfilt(x3.shape[0], R, x3.shape[2], ha.tobytes(),
                        hb.tobytes(), str(x3.dtype), ext_side=side)
    if call is None:
        return None
    y = call(x3)
    return _from_sublane(y.reshape(lead + y.shape[-2:]), ext.ndim, axis,
                         trail=ext.shape[-2:])


# ---------------------------------------------------------------------------
# IFILTER: interpolate-by-2 dual filter along the sublane axis
# ---------------------------------------------------------------------------

def _ifilt_plan(ha: np.ndarray, hb: np.ndarray):
    """(phase, taps, offset) per output row stream t (out[4i+t]) — the four
    parity cases of fb.ifilt_from_ext, shared by the single-stream kernel
    below and the dual-stream ``ifilt2_sum`` kernel (pallas_dual)."""
    m2 = ha.size // 2
    ha_e = tuple(float(v) for v in ha[0::2][::-1])
    ha_o = tuple(float(v) for v in ha[1::2][::-1])
    hb_e = tuple(float(v) for v in hb[0::2][::-1])
    hb_o = tuple(float(v) for v in hb[1::2][::-1])
    pos = bool(np.sum(ha * hb) > 0)
    if m2 % 2 == 0:
        if pos:
            return (("ev", ha_o, 0), ("od", hb_o, 0),
                    ("ev", ha_e, 1), ("od", hb_e, 1))
        return (("od", ha_o, 0), ("ev", hb_o, 0),
                ("od", ha_e, 1), ("ev", hb_e, 1))
    if pos:
        return (("ev", ha_e, 0), ("od", hb_e, 1),
                ("ev", ha_o, 0), ("od", hb_o, 1))
    return (("od", ha_e, 1), ("ev", hb_e, 0),
            ("od", ha_o, 1), ("ev", hb_o, 0))


@functools.lru_cache(maxsize=None)
def _build_ifilt(B: int, R: int, C: int, habytes: bytes, hbbytes: bytes,
                 dtype_str: str, ext_side: int = 0):
    ha = np.frombuffer(habytes, dtype=np.float64)
    hb = np.frombuffer(hbbytes, dtype=np.float64)
    m = ha.size
    if m % 2 or R % 2:
        return None
    m2 = m // 2
    if ext_side:
        if ext_side % _SUBLANE or ext_side < m2:
            return None
        pad8 = ext_side
    else:
        pad8 = _round_up(max(m2, 1), _SUBLANE)
    dtype = jnp.dtype(dtype_str)
    use_mxu = m >= _MXU_MIN_TAPS and not _interpret()
    n_quads = R // 2            # output quads; 2 input rows per output quad
    tq, tc = _pick_tiles_2d(n_quads, 2, C, pad8, dtype.itemsize,
                            temp_rows_per_unit=4 if use_mxu else 2 * m + 8)
    if tq is None or pad8 > R:
        return None
    n_tiles = n_quads // tq
    n_ctiles = C // tc
    off = pad8 - m2           # window start: extended index 2*q0 (phase 0)
    par_ev, par_od = m2 % 2, (m2 + 1) % 2
    plan = _ifilt_plan(ha, hb)
    if use_mxu:
        # out[4i+t] = sum_k taps[k] * win[2(i + o + k) + par(phase)]
        entries = []
        for t, (phase, taps, o) in enumerate(plan):
            par = par_ev if phase == "ev" else par_od
            for i in range(tq):
                for k, v in enumerate(taps):
                    entries.append((4 * i + t, 2 * (i + o + k) + par,
                                    float(v)))
        A = _banded(4 * tq, 2 * tq + 2 * m2, entries)  # stays f32: see _mxu_precision

    def kernel(x_hbm, *refs):
        a_ref = refs[0] if use_mxu else None
        o_ref, scratch, sem = refs[-3], refs[-2], refs[-1]
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        if ext_side:
            _load_slab_ext(x_hbm, b, scratch, sem, tile_idx=i, t_src=2 * tq,
                           rows=2 * tq + 2 * pad8, lanes=(j * tc, tc))
        else:
            _load_slab(x_hbm, b, scratch, sem, tile_idx=i, n_tiles=n_tiles,
                       t_in=2 * tq, pad8=pad8, fill=m2, R=R,
                       lanes=(j * tc, tc))
        win = lax.slice_in_dim(scratch[:, :], off, off + 2 * tq + 2 * m2,
                               axis=0)
        if use_mxu:
            o_ref[0] = jnp.dot(a_ref[:, :], _f32win(dtype)(win),
                               precision=_mxu_precision(dtype),
                               preferred_element_type=jnp.float32
                               ).astype(dtype)
            return
        # Phases holding even / odd *extended* indices (see ops/fb.py):
        ph = _phases(win, 2)
        phases = {"ev": ph[par_ev], "od": ph[par_od]}
        rows = tuple(_shift_corr(phases[phase], taps, tq, o)
                     for (phase, taps, o) in plan)
        o_ref[0] = _interleave_rows(rows)

    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
    if use_mxu:
        in_specs.append(pl.BlockSpec((4 * tq, 2 * tq + 2 * m2),
                                     lambda b, i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
    call = pl.pallas_call(
        kernel,
        grid=(B, n_tiles, n_ctiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 4 * tq, tc), lambda b, i, j: (b, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2 * R, C), dtype),
        scratch_shapes=[pltpu.VMEM((2 * tq + 2 * pad8, tc), dtype),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=_compiler_params(3),
        interpret=_interpret(),
    )
    if use_mxu:
        return lambda x: call(x, A)
    return call


def ifilt_axis(x, ha, hb, axis: int):
    """Pallas interpolate-by-2 dual filter along *axis* (None -> fallback)."""
    ha, hb = _as_taps(ha), _as_taps(hb)
    if not _supported_array(x, axis):
        return None
    x3, lead = _flatten_batch(_to_sublane(x, axis))
    if not _interpret() and x3.shape[-1] % _LANE:
        return None
    call = _build_ifilt(x3.shape[0], x3.shape[1], x3.shape[2],
                        ha.tobytes(), hb.tobytes(), str(x3.dtype))
    if call is None:
        return None
    y = call(x3)
    return _from_sublane(y.reshape(lead + y.shape[-2:]), x.ndim, axis,
                         trail=x.shape[-2:])


def ifilt_fromext_axis(ext, ha, hb, axis: int, side: int):
    """Pallas interpolate-by-2 dual filter on a pre-extended buffer (*side*
    >= len(ha)//2 per side, a sublane multiple); None -> XLA path."""
    ha, hb = _as_taps(ha), _as_taps(hb)
    prep = _fromext_prep(ext, axis, side)
    if prep is None:
        return None
    x3, lead, R = prep
    call = _build_ifilt(x3.shape[0], R, x3.shape[2], ha.tobytes(),
                        hb.tobytes(), str(x3.dtype), ext_side=side)
    if call is None:
        return None
    y = call(x3)
    return _from_sublane(y.reshape(lead + y.shape[-2:]), ext.ndim, axis,
                         trail=ext.shape[-2:])


# ---------------------------------------------------------------------------
# envelope checks + axis routing
# ---------------------------------------------------------------------------

def _supported_array(x, axis: int) -> bool:
    if x.ndim < 2:
        return False
    axis = axis if axis >= 0 else axis + x.ndim
    if axis == x.ndim - 3:
        return x.dtype in (jnp.float32, jnp.bfloat16)
    if axis not in (x.ndim - 2, x.ndim - 1):
        return False
    if x.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return True


def _to_sublane(x, axis: int):
    # Route the filtered axis onto the sublane axis: -2 is a no-op, -1 a
    # transpose, -3 a free merge of the two trailing dims (the filter acts
    # per (row, col) pair, so [..., D, H, W] -> [..., D, H*W]).
    axis = axis if axis >= 0 else axis + x.ndim
    if axis == x.ndim - 2:
        return x
    if axis == x.ndim - 3:
        return x.reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))
    return jnp.swapaxes(x, -1, -2)


def _from_sublane(y, ndim: int, axis: int, trail=None):
    axis = axis if axis >= 0 else axis + ndim
    if axis == ndim - 2:
        return y
    if axis == ndim - 3:
        return y.reshape(y.shape[:-1] + trail)
    return jnp.swapaxes(y, -1, -2)


def supported(x, axis: int) -> bool:
    """Cheap static check used by the dispatch layer."""
    return _supported_array(jnp.asarray(x), axis)
