"""Fused Pallas kernel for the whole level-1 2-D DTCWT forward stage.

The unfused path runs level 1 as seven separate passes (three column
filters, four row filters — each with transposes — plus the quad→complex
pack), every one a full HBM round trip.  This kernel reads the input once
per tile and emits the level-1 lowpass and all six oriented subbands in a
single pass:

    X ──col h0o──► lo ──row h0o──► lolo           (kept full-resolution)
        col h1o──► hi ──row h0o──► im05 ─┐
                   lo ──row h1o──► im23 ─┼─ q2c ─► 6 complex subbands
                   hi ──row h1o──► im14 ─┘

(reference semantics: ``/root/reference/dtcwt/numpy/transform2d.py:112-130``
with ``q2c`` :301-322; the standard 4-filter biorthogonal families only —
the bandpass variants take the unfused path).

Mosaic-shaped design decisions:

* Everything is computed in **column-parity split space**: the wrapper
  splits the image into even/odd column planes (one fast XLA stride-2 pass)
  because lane-axis deinterleaves do not lower inside kernels.  Row
  convolutions become two-phase polyphase sums over the split planes, and
  the q2c quad corners fall out directly as (row-parity × plane) selections.
* The wrapper also pre-extends 64 reflected boundary columns onto each side
  of each plane (``lax.rev`` does not lower in kernels, and manual-DMA lane
  offsets must stay 128-aligned).  Under column-parity splitting the
  symmetric reflection *swaps planes*: the even plane's margins come from
  the odd plane reversed, and vice versa.
* Rows are tiled with the same halo-slab DMA + in-kernel mirror fill as
  :mod:`dtcwt_tpu.ops.pallas_fb`.
* Mosaic allocates every unrolled tap temporary on its scoped VMEM stack,
  which caps the tile height.  To keep tiles big the work is staged over a
  third ("arbitrary", sequential) grid dimension: step 0 DMAs the slabs,
  runs the column filters into persistent scratch and emits the lowpass;
  steps 1-3 each run one row-filter band group + quad pack from that
  scratch, so only one group's tap temporaries are ever live.
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

from dtcwt_tpu.ops.pallas_fb import (
    _compiler_params, _f32win, _mxu_precision,
    _SUBLANE, _LANE, _flatten_batch, _interpret, _round_up)

__all__ = ["fwd_level1"]

_MARGIN = 64              # reflected boundary columns per side (split units)
_TILE_BYTES = 24 * 1024 * 1024
# Total column-stage taps at which the banded-MXU matmul beats the per-tap
# sublane shift chains (each shift is a VMEM relayout).
_MXU_MIN_TAPS = 16


def _corr_rows(ext, taps, n_out: int, offset: int):
    """Valid correlation along the sublane axis at static offset."""
    acc = None
    for k, t in enumerate(taps):
        sl = lax.slice_in_dim(ext, offset + k, offset + k + n_out, axis=0)
        term = sl * jnp.asarray(t, ext.dtype)
        acc = term if acc is None else acc + term
    return acc


@functools.lru_cache(maxsize=None)
def _build_level1(B: int, R: int, C2: int, h0bytes: bytes, h1bytes: bytes,
                  dtype_str: str, h2bytes: bytes = None):
    """C2 = C // 2 (split-plane width, a multiple of 128).  *h2bytes*
    supplies the bandpass variant's third (diagonal) filter (reference
    ``numpy/transform2d.py:116-125``)."""
    h0 = np.frombuffer(h0bytes, dtype=np.float64)
    h1 = np.frombuffer(h1bytes, dtype=np.float64)
    h2 = None if h2bytes is None else np.frombuffer(h2bytes,
                                                   dtype=np.float64)
    m0, m1 = h0.size, h1.size
    m2 = 0 if h2 is None else h2.size
    if m0 % 2 == 0 or m1 % 2 == 0 or (h2 is not None and m2 % 2 == 0):
        return None
    p0, p1 = m0 // 2, m1 // 2
    p2 = m2 // 2
    if max(p0, p1, p2) > _MARGIN:
        return None
    pad_r = max(p0, p1, p2)
    pad8 = _round_up(pad_r, _SUBLANE)
    W = C2 + 2 * _MARGIN                    # buffer width (multiple of 128)
    dtype = jnp.dtype(dtype_str)

    # Tile rows: scoped-VMEM stack = 2 slabs + 4 persistent column-filter
    # planes + the live tap temporaries of the busiest stage.
    n_br = 2 if h2 is None else 3          # column-filter branches
    temp_rows = 2 * (m0 + m1 + m2) + 2 * max(m0, m1, m2) + 8
    budget_rows = max(_TILE_BYTES // (W * max(dtype.itemsize, 4)), 1)
    tr = None
    # tr//2 is a block sublane dim, so tr must be a multiple of 16 (or R).
    for t in (R, 512, 256, 128, 96, 64, 48, 32, 16):
        if t > R or R % t:
            continue
        if t % 16 and not (t == R and (t // 2) % _SUBLANE == 0):
            continue
        if t < pad8:
            continue
        # 2x double-buffered slabs + 2*n_br persistent col planes + temps
        if (4 + 2 * n_br) * t + 8 * pad8 + t * temp_rows <= budget_rows:
            tr = t
            break
    if tr is None or pad8 > R:
        return None
    n_tiles = R // tr

    h0r = tuple(float(v) for v in h0[::-1])
    h1r = tuple(float(v) for v in h1[::-1])
    h2r = None if h2 is None else tuple(float(v) for v in h2[::-1])
    sc = float(np.sqrt(0.5))

    # Column stage as one stacked banded matmul per plane: rows [0,tr) = lo
    # branch, [tr,2tr) = hi branch, taps indexed straight off the slab.
    use_mxu = (m0 + m1 + m2) >= _MXU_MIN_TAPS and not _interpret()
    slab_rows = tr + 2 * pad8
    if use_mxu:
        ent = [(i, (pad8 - p0) + i + k, h0r[k])
               for i in range(tr) for k in range(m0)]
        ent += [(tr + i, (pad8 - p1) + i + k, h1r[k])
                for i in range(tr) for k in range(m1)]
        if h2 is not None:
            ent += [(2 * tr + i, (pad8 - p2) + i + k, h2r[k])
                    for i in range(tr) for k in range(m2)]
        Acol = np.zeros((n_br * tr, slab_rows), np.float32)
        for r_, c_, v_ in ent:
            Acol[r_, c_] += v_
        Acol = Acol.astype(np.float32)  # f32 operator: see pallas_fb._mxu_precision

    def row_conv_split(y_e, y_o, h: np.ndarray, pad_c: int):
        """Polyphase lane convolution of the interleaved signal represented
        by split planes (y_e, y_o), returning the (even, odd) output-column
        planes over the central C2 lanes.

        With ext[c] the lane-extended interleaved row and hr = h reversed:
            Y[c]   = sum_d hr[pad_c + d] * ext[c + d]
            Y_e[j] = Y[2j]:   d=2u -> y_e[j+u],  d=2u+1 -> y_o[j+u]
            Y_o[j] = Y[2j+1]: d=2u -> y_o[j+u],  d=2u+1 -> y_e[j+u+1]
        (buffer lane j+u sits at position j + MARGIN + u).
        """
        hr = h[::-1]
        out_e = None
        out_o = None
        n = C2
        for idx in range(h.size):
            d = idx - pad_c
            t = jnp.asarray(float(hr[idx]), y_e.dtype)
            if d % 2 == 0:
                u = d // 2
                se = lax.slice_in_dim(y_e, _MARGIN + u, _MARGIN + u + n,
                                      axis=1) * t
                so = lax.slice_in_dim(y_o, _MARGIN + u, _MARGIN + u + n,
                                      axis=1) * t
            else:
                u = (d - 1) // 2
                se = lax.slice_in_dim(y_o, _MARGIN + u, _MARGIN + u + n,
                                      axis=1) * t
                so = lax.slice_in_dim(y_e, _MARGIN + u + 1,
                                      _MARGIN + u + 1 + n, axis=1) * t
            out_e = se if out_e is None else out_e + se
            out_o = so if out_o is None else out_o + so
        return out_e, out_o

    # Band groups: (column-filter source plane pair, row filter), producing
    # the band pairs (0,5), (1,4), (2,3) in that order; the bp variant's
    # diagonal pair (1,4) comes from the third filter on both axes.
    if h2 is None:
        groups = ((1, h0, p0), (1, h1, p1), (0, h1, p1))  # (src, h, pad)
    else:
        groups = ((1, h0, p0), (2, h2, p2), (0, h1, p1))

    total = B * n_tiles

    def _slab_dma(x_hbm, slab, sem, t, start: bool):
        """Start (or wait on) the slab DMA for linear tile *t* into *slab*.
        The wait replays the same branch structure so the copy descriptors
        (and hence the semaphore byte counts) match the issue exactly."""
        b = t // n_tiles
        i = t % n_tiles
        g0 = i * tr

        def op(cp):
            cp.start() if start else cp.wait()

        if n_tiles == 1:
            op(pltpu.make_async_copy(
                x_hbm.at[b], slab.at[pl.ds(pad8, tr), :], sem))
            return

        @pl.when(i == 0)
        def _():
            op(pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(0, tr + pad8), :],
                slab.at[pl.ds(pad8, tr + pad8), :], sem))

        src0 = pl.multiple_of(g0 - pad8, _SUBLANE)

        @pl.when(jnp.logical_and(i > 0, i < n_tiles - 1))
        def _():
            op(pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(src0, tr + 2 * pad8), :],
                slab.at[:, :], sem))

        @pl.when(i == n_tiles - 1)
        def _():
            op(pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(src0, tr + pad8), :],
                slab.at[pl.ds(0, tr + pad8), :], sem))

    def _fills(slab, i):
        """Mirror-fill the out-of-range halo rows of a landed slab, and
        ZERO the never-DMA'd outer gap rows beyond them: the column matmul
        feeds the whole slab to the MXU relying on zero operator columns,
        and 0 * NaN-garbage = NaN (uninitialized-VMEM poisoning found on
        chip, r3 — see pallas_level2._fills)."""
        @pl.when(i == 0)
        def _():
            for j in range(pad8 - pad_r, pad8):
                slab[j, :] = slab[2 * pad8 - 1 - j, :]
            for j in range(0, pad8 - pad_r):
                slab[j, :] = jnp.zeros_like(slab[0, :])

        @pl.when(i == n_tiles - 1)
        def _():
            for s in range(tr + pad8, tr + pad8 + pad_r):
                slab[s, :] = slab[2 * (tr + pad8) - 1 - s, :]
            for s in range(tr + pad8 + pad_r, tr + 2 * pad8):
                slab[s, :] = jnp.zeros_like(slab[0, :])

    def kernel(xe_hbm, xo_hbm, *refs):
        if use_mxu:
            acol_ref = refs[0]
            refs = refs[1:]
        (lolo_e_ref, lolo_o_ref, re_ref, im_ref, se, so, cols, sems) = refs
        b = pl.program_id(0)
        i = pl.program_id(1)
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _():
            t = b * n_tiles + i

            # Double-buffered input slabs: tile t uses buffer t % 2; its DMA
            # was issued during tile t-1 (tile 0 issues its own here), and
            # tile t+1's DMA is issued right after the wait so it overlaps
            # this tile's column stage and band steps.
            def stage(buf):
                @pl.when(t == 0)
                def _():
                    _slab_dma(xe_hbm, se.at[buf], sems.at[buf, 0], t, True)
                    _slab_dma(xo_hbm, so.at[buf], sems.at[buf, 1], t, True)
                _slab_dma(xe_hbm, se.at[buf], sems.at[buf, 0], t, False)
                _slab_dma(xo_hbm, so.at[buf], sems.at[buf, 1], t, False)

                @pl.when(t + 1 < total)
                def _():
                    _slab_dma(xe_hbm, se.at[1 - buf],
                              sems.at[1 - buf, 0], t + 1, True)
                    _slab_dma(xo_hbm, so.at[1 - buf],
                              sems.at[1 - buf, 1], t + 1, True)
                _fills(se.at[buf], i)
                _fills(so.at[buf], i)

                if use_mxu:
                    ye = jnp.dot(acol_ref[:, :], _f32win(dtype)(se[buf]),
                                 precision=_mxu_precision(dtype),
                                 preferred_element_type=jnp.float32
                                 ).astype(dtype)
                    yo = jnp.dot(acol_ref[:, :], _f32win(dtype)(so[buf]),
                                 precision=_mxu_precision(dtype),
                                 preferred_element_type=jnp.float32
                                 ).astype(dtype)
                    cols[0] = lax.slice_in_dim(ye, 0, tr, axis=0)   # lo_e
                    cols[1] = lax.slice_in_dim(yo, 0, tr, axis=0)   # lo_o
                    cols[2] = lax.slice_in_dim(ye, tr, 2 * tr, axis=0)
                    cols[3] = lax.slice_in_dim(yo, tr, 2 * tr, axis=0)
                    if h2 is not None:
                        cols[4] = lax.slice_in_dim(ye, 2 * tr, 3 * tr,
                                                   axis=0)
                        cols[5] = lax.slice_in_dim(yo, 2 * tr, 3 * tr,
                                                   axis=0)
                else:
                    exte = lax.slice_in_dim(se[buf], pad8 - pad_r,
                                            pad8 + pad_r + tr, axis=0)
                    exto = lax.slice_in_dim(so[buf], pad8 - pad_r,
                                            pad8 + pad_r + tr, axis=0)
                    # Column filters into persistent scratch; offsets align
                    # shorter filters inside the max-halo window.
                    cols[0] = _corr_rows(exte, h0r, tr, pad_r - p0)  # lo_e
                    cols[1] = _corr_rows(exto, h0r, tr, pad_r - p0)  # lo_o
                    cols[2] = _corr_rows(exte, h1r, tr, pad_r - p1)  # hi_e
                    cols[3] = _corr_rows(exto, h1r, tr, pad_r - p1)  # hi_o
                    if h2 is not None:
                        cols[4] = _corr_rows(exte, h2r, tr, pad_r - p2)
                        cols[5] = _corr_rows(exto, h2r, tr, pad_r - p2)
                ll_e, ll_o = row_conv_split(cols[0], cols[1], h0, p0)
                lolo_e_ref[0] = ll_e
                lolo_o_ref[0] = ll_o

            @pl.when(t % 2 == 0)
            def _():
                stage(0)

            @pl.when(t % 2 == 1)
            def _():
                stage(1)

        for g, (src, h, pc) in enumerate(groups):
            @pl.when(k == g + 1)
            def _(src=src, h=h, pc=pc, g=g):
                y_e, y_o = row_conv_split(cols[2 * src], cols[2 * src + 1],
                                          h, pc)
                # Row-parity split via a sublane split reshape: quad corners
                # a = even/even, b = even/odd, c = odd/even, d = odd/odd.
                ye2 = y_e.reshape(tr // 2, 2, C2)
                yo2 = y_o.reshape(tr // 2, 2, C2)
                a, c = ye2[:, 0, :], ye2[:, 1, :]
                bq, d = yo2[:, 0, :], yo2[:, 1, :]
                # p = (a + jb)/sqrt2, q = (d - jc)/sqrt2; bands (p-q, p+q).
                # Each k-step writes one adjacent band-pair block (positions
                # 2g, 2g+1 of the 6-band dim) so write-backs overlap the
                # next step's compute; the resulting band order is the
                # pair order PLANE_BAND_ORDER = (0,5,1,4,2,3).
                re_ref[0, 0] = (a - d) * sc
                im_ref[0, 0] = (bq + c) * sc
                re_ref[0, 1] = (a + d) * sc
                im_ref[0, 1] = (bq - c) * sc

    in_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    in_specs = [in_spec, in_spec]
    if use_mxu:
        in_specs.append(pl.BlockSpec((n_br * tr, slab_rows),
                                     lambda b, i, k: (0, 0),
                                     memory_space=pltpu.VMEM))
    lolo_spec = pl.BlockSpec((1, tr, C2), lambda b, i, k: (b, i, 0),
                             memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec(
        (1, 2, tr // 2, C2),
        lambda b, i, k: (b, jnp.maximum(k - 1, 0), i, 0),
        memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(B, n_tiles, 4),
        in_specs=in_specs,
        out_specs=(lolo_spec, lolo_spec, band_spec, band_spec),
        out_shape=(jax.ShapeDtypeStruct((B, R, C2), dtype),
                   jax.ShapeDtypeStruct((B, R, C2), dtype),
                   jax.ShapeDtypeStruct((B, 6, R // 2, C2), dtype),
                   jax.ShapeDtypeStruct((B, 6, R // 2, C2), dtype)),
        scratch_shapes=[pltpu.VMEM((2, tr + 2 * pad8, W), dtype),
                        pltpu.VMEM((2, tr + 2 * pad8, W), dtype),
                        pltpu.VMEM((2 * n_br, tr, W), dtype),
                        pltpu.SemaphoreType.DMA((2, 2))],
        compiler_params=_compiler_params(3),
        interpret=_interpret(),
    )
    if use_mxu:
        return lambda xe, xo: call(xe, xo, Acol)
    return call


def fwd_level1(X, h0o, h1o, as_split: bool = False, h2o=None,
               as_planes: bool = False
               ) -> Optional[Tuple[object, jnp.ndarray]]:
    """Fused level-1 forward.  *X* is ``[..., R, C]`` real (R, C even; C/2 a
    multiple of 128 on hardware so the split planes stay lane-aligned);
    returns ``(lolo [..., R, C], Yh1 [..., R/2, C/2, 6] complex)`` or None
    when the shape/filters are outside the kernel envelope.

    With ``as_split`` the lowpass is returned as its even/odd column planes
    ``(lolo_e, lolo_o)`` uninterleaved, so a following fused decimating level
    can consume it without the interleave + re-split round trip.  With
    ``as_planes`` the subbands come back as the kernel's native band-major
    f32 plane pair ``(re [..., 6, R/2, C/2], im [...])`` in degree order,
    skipping the complex ``[..., 6]`` interleave pass entirely (the
    plane-layout pyramid path).
    """
    h0 = np.asarray(h0o, np.float64).reshape(-1)
    h1 = np.asarray(h1o, np.float64).reshape(-1)
    h2 = None if h2o is None else np.asarray(h2o, np.float64).reshape(-1)
    if X.ndim < 2 or X.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    R, C = X.shape[-2], X.shape[-1]
    if R % 2 or C % 2:
        return None
    if not _interpret() and (C // 2) % _LANE:
        return None
    if C // 2 < _MARGIN * 2:
        return None
    x3, lead = _flatten_batch(X)
    call = _build_level1(x3.shape[0], R, C // 2, h0.tobytes(), h1.tobytes(),
                         str(x3.dtype),
                         None if h2 is None else h2.tobytes())
    if call is None:
        return None

    # Column-parity split + 64-column reflected margins (planes swap under
    # reflection: X[-1]=X[0] is even-index, landing in the odd plane's
    # margin and vice versa).
    xe, xo = x3[:, :, 0::2], x3[:, :, 1::2]
    xe_ext = jnp.concatenate([jnp.flip(xo[:, :, :_MARGIN], axis=2), xe,
                              jnp.flip(xo[:, :, -_MARGIN:], axis=2)], axis=2)
    xo_ext = jnp.concatenate([jnp.flip(xe[:, :, :_MARGIN], axis=2), xo,
                              jnp.flip(xe[:, :, -_MARGIN:], axis=2)], axis=2)

    lolo_e, lolo_o, re, im = call(xe_ext, xo_ext)

    # (B, 6, R/2, C2) band planes in the kernel's pair order
    # PLANE_BAND_ORDER = (0,5,1,4,2,3) — band pairs (p-q, p+q) adjacent.
    if as_planes:
        yh1 = (re.reshape(lead + re.shape[-3:]),
               im.reshape(lead + im.shape[-3:]))
    else:
        z = lax.complex(re.astype(jnp.float32), im.astype(jnp.float32))
        # static-slice band reorder (pair order -> degrees): an index-array
        # permutation (z[:, order]) lowers to a slow full-array gather
        yh1 = jnp.stack([z[:, 0], z[:, 2], z[:, 4], z[:, 5], z[:, 3],
                         z[:, 1]], axis=-1)   # (B, R/2, C/2, 6)
        yh1 = yh1.reshape(lead + yh1.shape[-3:])
    if as_split:
        return ((lolo_e.reshape(lead + lolo_e.shape[-2:]),
                 lolo_o.reshape(lead + lolo_o.shape[-2:])), yh1)
    lolo = jnp.stack([lolo_e, lolo_o], axis=-1).reshape(x3.shape)
    return lolo.reshape(lead + lolo.shape[-2:]), yh1
