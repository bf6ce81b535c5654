"""Fused Pallas TPU kernels for first-order signature Gram matrices.

The hot loop of the whole framework (SURVEY.md §3.2).  The XLA blocked path
(`ops/gram.py`) is bandwidth-bound: every level of the recursion round-trips
the (B, B, L, L) tile through HBM (~2.4 TB of traffic at the north-star
scale).  These kernels keep everything in VMEM.

Forward, for each grid cell (i, j) — a (BI x BJ) block of example pairs:
  loop a over the BI row examples:
    1. increment Gram M_full (L, BJ*L) via a cancellation-free formulation
       (below), one VPU pass over all BJ column examples;
    2. the level recursion runs ROW-WIDE on the full 2-D (L, BJ*L) tile:
       R <- M * (A_lower @ R @ A_seg), where the lane-axis cumsum's chunked
       carry resets at example boundaries (`_make_cumsums(seg=L)`), so one
       full-width MXU sweep per level covers all BJ independent pairs.
       Both exclusive cumsums are plain 2-D triangular-ones matmuls — the
       tile never changes rank, so Mosaic never relayouts it, and the wide
       (128, BJ*L) matmuls keep the MXU streaming (the round-2 kernel ran
       BJ separate (L, L) recursions: same FLOPs at ~38% MXU efficiency,
       plus a per-pair unroll of small ops);
    3. the per-level tile sums (M+1, BJ) are placed at lane offset j*BJ of a
       full-width output row block via a tiny expansion matmul (TPU vector
       stores can't hit unaligned lane offsets; a matmul can) and
       accumulated — the output block's index map ignores j, so Pallas
       keeps it VMEM-resident across the whole j sweep.

Increment-Gram numerics: the reference forms
``k(s+1,t+1)+k(s,t)-k(s,t+1)-k(s+1,t)`` (`signature_algs.py:26`), whose
signal is O(1/L) of the Gram magnitude — catastrophic cancellation in f32.
Here the cancellation is done in algebra instead:

* linear: one matmul of the pre-differenced inputs (exact).
* RBF: with A(x,y) = -|x-y|^2/2 evaluated as a dot of norm-augmented
  vectors [x; -|x|^2/2; 1].[y; 1; -|y|^2/2], the second difference is
      M = exp(A00) * (expm1(d01 + d10 + dxx) - expm1(d01) - expm1(d10))
  where d01 = dA over the y step, d10 = dA over the x step and
  dxx = <dx, dy> are *small* values computed directly from precomputed
  difference vectors (no big-minus-big anywhere), and expm1 uses a Taylor
  branch for small arguments.  This removes both the second-difference
  cancellation and the sensitivity to the VPU's exp accuracy.

Repeat-last time padding makes tail increments exactly zero, so padding L
to a multiple of 128 is exact and needs no masks (`preprocessing.py:23-25`).

Differentiation: ``fused_first_order_levels`` carries a custom VJP whose
backward pass is a second Pallas kernel (same triangular-matmul structure,
transposed: the adjoint of the double exclusive cumsum is the reversed
double exclusive cumsum).  The reference trains through this recursion
(`gpsig/models.py:39-59` -> `signature_algs.py:8-35`), so the fast path must
be differentiable to be the training path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gram import (exp_accurate, mat12_cross_from_dots,
                   mat12_onesided_from_dots, mat12_plain_from_dots)

# bases with an in-kernel cancellation-free increment algebra; the
# dispatch layer (`kernels.SignatureKernel._fused_supported`) keys off
# this, so extending the kernels automatically extends the public API's
# fast path.  matern12 rides the same norm-augmented dots as rbf plus
# per-step norms (triangle-inequality floors) computed in-kernel; its
# increment algebra is the dots-level `gram.mat12_cross_from_dots`.
SUPPORTED_BASES = ("rbf", "linear", "matern12")


def _expm1(x):
    """exp(x) - 1 with a Taylor branch for small |x| (Mosaic's exp is only
    ~4e-6-accurate; the Taylor branch keeps the error *relative* to x).
    The large-|x| branch keeps the native exp: there |expm1| >= 0.28, so the
    native ~4e-6 absolute error is ~1e-5 *relative* — fine for entries that
    large, and native exp is much cheaper than the ldexp-accurate one."""
    p = x / 6.0
    for k in (5.0, 4.0, 3.0, 2.0):
        p = (1.0 + p) * x / k
    taylor = (1.0 + p) * x
    return jnp.where(jnp.abs(x) < 0.25, taylor, jnp.exp(x) - 1.0)


def _recursion_precision(fast_math):
    """Map the fast_math knob to an MXU mode for the level recursion.

    True -> one-pass bf16 (DEFAULT; ~0.4% relative on R, which the
    normalized kernel can amplify ~1e3x at ill-conditioned entries),
    'high' -> one-sided bf16x3 split (the triangular-ones operand is exact
    in bf16, so splitting only the data operand into three bf16 pieces
    recovers ~f32 accuracy in 3 MXU passes — half the cost of HIGHEST),
    False -> six-pass HIGHEST (full f32).
    """
    if fast_math is True:
        return lax.Precision.DEFAULT
    if fast_math == "high":
        return "split3"
    return lax.Precision.HIGHEST


def _split3(R):
    """Three bf16 pieces summing to R (~24 mantissa bits captured)."""
    r1 = R.astype(jnp.bfloat16)
    R1 = r1.astype(jnp.float32)
    r2 = (R - R1).astype(jnp.bfloat16)
    R2 = r2.astype(jnp.float32)
    r3 = (R - R1 - R2).astype(jnp.bfloat16)
    return r1, r2, r3


def _chunks(n, c=128):
    out, lo = [], 0
    while lo < n:
        out.append((lo, min(c, n - lo)))
        lo += c
    return out


def _make_cumsums(precision, seg=None):
    """(cum_rows, cum_lanes): exclusive cumulative sums over the sublane /
    lane axis of a 2-D tile, evaluated as *chunked* triangular-ones matmuls.

    Chunking at 128 exploits that every below-(above-)diagonal block of the
    triangular-ones matrix is all-ones, i.e. rank degenerate: its
    contribution is a column-(row-)sum carry, computed exactly on the VPU.
    That halves the MXU FLOPs of the naive (L, L) sandwich and, in 'split3'
    mode, the carry path bypasses the bf16 splitting entirely.

    precision: lax.Precision (both operands at that precision) or 'split3'
    (one-sided bf16x3: the ones-triangle is exact in bf16, the data operand
    is split into three bf16 pieces -> ~f32 accuracy in 3 passes).

    seg: optional lane-segment width for cum_lanes.  The carry resets at
    every multiple of ``seg`` (which must be a multiple of the 128 chunk),
    so one full-width (Ls, BJ*seg) tile runs BJ *independent* per-example
    cumsums in a single sweep — this is what lets the kernels process a
    whole row block's column examples per MXU pass instead of one (Ls, L)
    tile per pair (row-wide recursion).

    ``reverse=True`` computes the adjoint (reversed exclusive cumsum), i.e.
    multiplication by the transposed triangle.
    """
    f32 = jnp.float32

    def dot(a, b):
        return lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32,
            precision=None if precision == "split3" else precision,
        )

    if precision == "split3":
        def dot_l(T, R):  # T exact in bf16
            Tb = T.astype(jnp.bfloat16)
            r1, r2, r3 = _split3(R)
            return dot(Tb, r1) + dot(Tb, r2) + dot(Tb, r3)

        def dot_r(S, T):
            Tb = T.astype(jnp.bfloat16)
            s1, s2, s3 = _split3(S)
            return dot(s1, Tb) + dot(s2, Tb) + dot(s3, Tb)
    else:
        dot_l = dot_r = dot

    def tri(n, upper):
        r = lax.broadcasted_iota(jnp.int32, (n, n), 0)
        c = lax.broadcasted_iota(jnp.int32, (n, n), 1)
        return ((r < c) if upper else (r > c)).astype(f32)

    def cum_rows(R, reverse=False):
        """out[s, :] = sum_{s' < s} R[s', :] (reverse: s' > s)."""
        n, w = R.shape
        chunks = _chunks(n)
        if reverse:
            chunks = chunks[::-1]
        carry = jnp.zeros((1, w), f32)
        outs = {}
        for lo, c in chunks:
            Rc = R[lo:lo + c, :]
            outs[lo] = dot_l(tri(c, upper=reverse), Rc) + carry
            carry = carry + jnp.sum(Rc, axis=0, keepdims=True)
        return jnp.concatenate([outs[lo] for lo, _ in _chunks(n)], axis=0)

    def cum_lanes(S, reverse=False):
        """out[:, t] = sum_{t' < t} S[:, t'] (reverse: t' > t), per
        ``seg``-wide lane segment when seg is set."""
        n, w = S.shape
        chunks = _chunks(w)
        if reverse:
            chunks = chunks[::-1]
        carry = jnp.zeros((n, 1), f32)
        outs = {}
        for lo, c in chunks:
            if seg is not None and (
                (lo + c) % seg == 0 if reverse else lo % seg == 0
            ):
                carry = jnp.zeros((n, 1), f32)
            Sc = S[:, lo:lo + c]
            outs[lo] = dot_r(Sc, tri(c, upper=not reverse)) + carry
            carry = carry + jnp.sum(Sc, axis=1, keepdims=True)
        return jnp.concatenate([outs[lo] for lo, _ in _chunks(w)], axis=1)

    return cum_rows, cum_lanes


def _aug_mask(arr):
    """(d_aug, 1) mask selecting the TRUE feature sublanes (the last two
    are norm-augmentation channels)."""
    d_aug = arr.shape[0]
    return (lax.broadcasted_iota(jnp.int32, (d_aug, 1), 0)
            < d_aug - 2).astype(arr.dtype)


def _norm_chain_col(dl, W_nx, ndx):
    """Chain a step-norm cotangent into the difference tile, column side:
    ``g_dl[c, b] += dl_true[c, b] * W_nx[b] / max(ndx[b], tiny)`` (since
    d|v|/dv = v/|v|); the per-column scale is applied as a diagonal matmul
    because (n, 1) -> (1, n) transposes are relayouts Mosaic need not pay."""
    w = W_nx / jnp.maximum(ndx, 1e-30)  # (n, 1)
    n = dl.shape[1]
    r = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    D = jnp.where(r == c, jnp.broadcast_to(w, (n, n)), 0.0)
    return lax.dot_general(
        dl * _aug_mask(dl), D, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


def _norm_chain_row(dr, W_ny, ndy):
    """Row-side step-norm chain: ``g_dr += dr_true * W_ny / max(ndy, tiny)``
    with W_ny/ndy lane-oriented (1, n)."""
    return (dr * _aug_mask(dr)) * (W_ny / jnp.maximum(ndy, 1e-30))


def _step_norms(dxa, dxj):
    """Per-step euclidean norms of the TRUE feature channels of the
    augmented difference tiles: ndx (Ls, 1) via a masked-ones matmul (lane
    -> sublane orientation without a relayout), ndy (1, BJL) via a masked
    row reduction.  The last two sublanes are the norm-augmentation
    channels (dn; 0) and are excluded."""
    mrow = _aug_mask(dxa)
    ndx2 = lax.dot_general(
        dxa * dxa, mrow, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )  # (Ls, 1)
    ndy2 = jnp.sum((dxj * dxj) * mrow, axis=0, keepdims=True)  # (1, BJL)
    return jnp.sqrt(ndx2), jnp.sqrt(ndy2)


def _increment_gram_row(xa, dxa, xj, dxj, base, difference, tail_mask, hdot):
    """(L, BJ*L) increment (or plain, if not difference) Gram for one row
    example against all BJ column examples; cancellation-free (see module
    docstring)."""
    if base == "linear":
        if difference:
            return hdot(dxa, dxj)  # exact increment Gram, one matmul
        return hdot(xa, xj) * tail_mask
    # rbf/matern12 on norm-augmented inputs
    A00 = hdot(xa, xj)  # = -|x_s - y_t|^2 / 2
    if base == "matern12":
        if not difference:
            return mat12_plain_from_dots(A00, exp=exp_accurate) * tail_mask
        d01 = hdot(xa, dxj)
        d10 = hdot(dxa, xj)
        dxx = hdot(dxa, dxj)
        ndx, ndy = _step_norms(dxa, dxj)
        return mat12_cross_from_dots(A00, d01, d10, dxx, ndx, ndy,
                                     exp=exp_accurate, expm1=_expm1)
    if not difference:
        return exp_accurate(A00) * tail_mask
    d01 = hdot(xa, dxj)   # A(x, y') - A(x, y)
    d10 = hdot(dxa, xj)   # A(x', y) - A(x, y)
    dxx = hdot(dxa, dxj)  # <dx, dy>
    return exp_accurate(A00) * (
        _expm1(d01 + d10 + dxx) - _expm1(d01) - _expm1(d10)
    )


def _pair_levels_fwd(M, num_levels, order, cum_rows, cum_lanes, seg_sum):
    """Level sums for levels 1..M on a row-wide 2-D tile.

    M is the (Ls, BJ*L) increment Gram of one row example against ALL BJ
    column examples; cum_lanes is segment-aware (seg=L), so every level of
    the recursion runs as ONE full-width MXU sweep covering the BJ
    independent pairs.  ``seg_sum`` reduces a tile to its per-example
    (1, BJ) level sums (column-sum + segment-indicator matmul).

    order == 1: R <- M * cumsum_excl_s(cumsum_excl_t(R)).
    order > 1: the (order x order) grid of partial tensors with 1/j, 1/k
    scalings (`signature_algs.py:60-72`), all tiles kept 2-D so both
    cumsums stay relayout-free matmuls.
    """
    sums = [seg_sum(M)]
    if order == 1:
        R = M
        for _ in range(2, num_levels + 1):
            R = M * cum_lanes(cum_rows(R))
            sums.append(seg_sum(R))
        return sums
    R = {(0, 0): M}
    for i in range(2, num_levels + 1):
        d = min(i, order)
        Rn = {}
        R_sum = sum(R.values())
        Rn[(0, 0)] = M * cum_lanes(cum_rows(R_sum))
        for j in range(2, d + 1):
            row_sum = sum(R[(a, j - 2)] for a in range(d) if (a, j - 2) in R)
            col_sum = sum(R[(j - 2, b)] for b in range(d) if (j - 2, b) in R)
            Rn[(0, j - 1)] = (1.0 / j) * M * cum_rows(row_sum)
            Rn[(j - 1, 0)] = (1.0 / j) * M * cum_lanes(col_sum)
            for k2 in range(2, d + 1):
                Rn[(j - 1, k2 - 1)] = (
                    (1.0 / (j * k2)) * M * R[(j - 2, k2 - 2)]
                )
        R = Rn
        sums.append(seg_sum(sum(R.values())))
    return sums


def _pair_forward_to(M, upto, order, cum_rows, cum_lanes):
    """Recompute the higher-order tile grid R^(upto) (upto >= 1)."""
    R = {(0, 0): M}
    for i in range(2, upto + 1):
        d = min(i, order)
        Rn = {}
        R_sum = sum(R.values())
        Rn[(0, 0)] = M * cum_lanes(cum_rows(R_sum))
        for j in range(2, d + 1):
            row_sum = sum(R[(a, j - 2)] for a in range(d) if (a, j - 2) in R)
            col_sum = sum(R[(j - 2, b)] for b in range(d) if (j - 2, b) in R)
            Rn[(0, j - 1)] = (1.0 / j) * M * cum_rows(row_sum)
            Rn[(j - 1, 0)] = (1.0 / j) * M * cum_lanes(col_sum)
            for k2 in range(2, d + 1):
                Rn[(j - 1, k2 - 1)] = (
                    (1.0 / (j * k2)) * M * R[(j - 2, k2 - 2)]
                )
        R = Rn
    return R


def _pair_levels_bwd(M, gb, num_levels, order, cum_rows, cum_lanes):
    """Row-wide Mbar from level-sum cotangents gb[m] — (1, BJ*L) rows with
    each example's scalar cotangent broadcast across its lane segment — for
    any order.

    order == 1 mirrors the first-order reverse sweep; order > 1 runs the
    grid recursion's adjoint with per-level forward recompute (the tile
    grids are too large to stash across the whole sweep)."""
    f32 = jnp.float32
    shape = M.shape

    def bcast(g):
        return jnp.broadcast_to(g, shape)

    if order == 1:
        Cs = []
        R = M
        for _ in range(2, num_levels + 1):
            C = cum_lanes(cum_rows(R))
            Cs.append(C)
            R = M * C
        Rbar = bcast(gb[num_levels])
        Mbar = jnp.zeros(shape, f32)
        for m in range(num_levels - 1, 0, -1):
            Mbar = Mbar + Cs[m - 1] * Rbar
            Rbar = gb[m] + cum_lanes(
                cum_rows(M * Rbar, reverse=True), reverse=True
            )
        return Mbar + Rbar

    Mbar = jnp.zeros(shape, f32)
    # cotangent grid for the CURRENT level i (initialized at i = M)
    Rbar = {key: bcast(gb[num_levels])
            for key in _grid_keys(num_levels, order)}
    for i in range(num_levels, 1, -1):
        d = min(i, order)
        Rprev = _pair_forward_to(M, i - 1, order, cum_rows, cum_lanes)
        Rbar_prev = {key: bcast(gb[i - 1])
                     for key in _grid_keys(i - 1, order)}
        # Rn[(0,0)] = M * cum_lanes(cum_rows(sum Rprev))
        C00 = cum_lanes(cum_rows(sum(Rprev.values())))
        Mbar = Mbar + Rbar[(0, 0)] * C00
        Sbar = cum_rows(cum_lanes(M * Rbar[(0, 0)], reverse=True),
                        reverse=True)
        for key in Rbar_prev:
            Rbar_prev[key] = Rbar_prev[key] + Sbar
        for j in range(2, d + 1):
            row_keys = [(a, j - 2) for a in range(d) if (a, j - 2) in Rprev]
            col_keys = [(j - 2, b) for b in range(d) if (j - 2, b) in Rprev]
            # Rn[(0, j-1)] = (1/j) M * cum_rows(sum row_keys)
            row_sum = sum(Rprev[k2] for k2 in row_keys)
            Mbar = Mbar + (1.0 / j) * Rbar[(0, j - 1)] * cum_rows(row_sum)
            Tbar = (1.0 / j) * cum_rows(M * Rbar[(0, j - 1)], reverse=True)
            for k2 in row_keys:
                Rbar_prev[k2] = Rbar_prev[k2] + Tbar
            # Rn[(j-1, 0)] = (1/j) M * cum_lanes(sum col_keys)
            col_sum = sum(Rprev[k2] for k2 in col_keys)
            Mbar = Mbar + (1.0 / j) * Rbar[(j - 1, 0)] * cum_lanes(col_sum)
            Ubar = (1.0 / j) * cum_lanes(M * Rbar[(j - 1, 0)], reverse=True)
            for k2 in col_keys:
                Rbar_prev[k2] = Rbar_prev[k2] + Ubar
            for k2 in range(2, d + 1):
                src = (j - 2, k2 - 2)
                if src in Rprev:
                    w = 1.0 / (j * k2)
                    Mbar = Mbar + w * Rbar[(j - 1, k2 - 1)] * Rprev[src]
                    Rbar_prev[src] = (
                        Rbar_prev[src] + w * M * Rbar[(j - 1, k2 - 1)]
                    )
        Rbar = Rbar_prev
    # level 1: R^(1) = {(0,0): M}
    return Mbar + Rbar[(0, 0)]


def _grid_keys(level, order):
    """Tile-grid keys present in R^(level) (level >= 1)."""
    if level == 1:
        return [(0, 0)]
    d = min(level, order)
    keys = {(0, 0)}
    for j in range(2, d + 1):
        keys.add((0, j - 1))
        keys.add((j - 1, 0))
        for k2 in range(2, d + 1):
            keys.add((j - 1, k2 - 1))
    return sorted(keys)


def _kernel_fwd(xi_ref, dxi_ref, xj_ref, dxj_ref, out_ref, *, BI: int,
                BJ: int, L: int, L_true: int, L2_true: int, d: int, num_levels: int,
                order: int, base: str, difference: bool, symmetric: bool,
                precision):
    f32 = jnp.float32
    BJL = BJ * L
    W = out_ref.shape[-1]  # padded full output width (multiple of 128)
    # active row count: repeat-padding makes rows >= L_true all-zero
    # increments, so cropping the sublane axis to an 8-multiple >= L_true is
    # exact and cuts VPU transcendentals + matmul rows by L/Ls
    Ls = L if not difference else min(L, -(-L_true // 8) * 8)

    i = pl.program_id(0)
    j = pl.program_id(1)

    # expansion matrix placing this cell's BJ columns at lane offset j*BJ of
    # the full-width accumulator (lane-offset vector stores aren't legal on
    # TPU; a tiny matmul is)
    erow = lax.broadcasted_iota(jnp.int32, (BJ, W), 0)
    ecol = lax.broadcasted_iota(jnp.int32, (BJ, W), 1)
    expand = (ecol == erow + j * BJ).astype(f32)

    if difference:
        tail_mask = None
    else:
        cig = lax.broadcasted_iota(jnp.int32, (Ls, BJL), 1) % L
        rix = lax.broadcasted_iota(jnp.int32, (Ls, BJL), 0)
        tail_mask = ((rix < L_true) & (cig < L2_true)).astype(f32)

    def hdot(xa2, xj2):
        """(d, Ls) x (d, BJL) -> (Ls, BJL), full-f32 (signal can be O(1/L)
        of operand magnitudes; bf16 inputs would drown it)."""
        return lax.dot_general(
            xa2, xj2, (((0,), (0,)), ((), ())), preferred_element_type=f32,
            precision=lax.Precision.HIGHEST,
        )

    # segment-aware cumsums (seg=L): the lane-axis cumsum resets at example
    # boundaries, so the whole (Ls, BJ*L) row tile runs the recursion for
    # all BJ column examples in ONE full-width MXU sweep per level — wide
    # matmuls instead of BJ narrow (Ls, L) ones, and no per-pair unroll
    cum_rows, cum_lanes = _make_cumsums(precision, seg=L)

    # per-example level-sum reduction: column-sum then a (BJL, BJ)
    # segment-indicator matmul
    srow = lax.broadcasted_iota(jnp.int32, (BJL, BJ), 0)
    scol = lax.broadcasted_iota(jnp.int32, (BJL, BJ), 1)
    seg_ind = (srow // L == scol).astype(f32)

    def seg_sum(R):
        v = jnp.sum(R, axis=0, keepdims=True)  # (1, BJL)
        return lax.dot_general(
            v, seg_ind, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=lax.Precision.HIGHEST,
        )  # (1, BJ)

    def body():
        xj = xj_ref[:]  # (d, BJL)
        dxj = dxj_ref[:]

        def pair_row(a, carry):
            xa = xi_ref[:, pl.ds(a * L, Ls)]  # (d, Ls)
            dxa = dxi_ref[:, pl.ds(a * L, Ls)]

            M_full = _increment_gram_row(
                xa, dxa, xj, dxj, base, difference, tail_mask, hdot
            )  # (Ls, BJL)

            sums = [jnp.ones((1, BJ), f32)] + _pair_levels_fwd(
                M_full, num_levels, order, cum_rows, cum_lanes, seg_sum
            )
            levels2d = jnp.concatenate(sums, axis=0)  # (M+1, BJ)

            placed = lax.dot_general(
                levels2d, expand, (((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=lax.Precision.HIGHEST,
            )  # (M+1, W) with this cell's columns at j*BJ
            first = j == (i if symmetric else 0)
            prev = out_ref[:, a, :]
            out_ref[:, a, :] = jnp.where(first, placed, prev + placed)
            return carry

        # one rolled loop over the row examples.  Partial unrolling was
        # measured on-chip (v5e, round 3) and does NOT help: rolled 1.711s,
        # x2 1.803s, x4 1.721s at the headline scale — the scheduler won't
        # overlap one row's VPU work with another's MXU matmuls here — and
        # x8 faults the TPU worker (instruction-memory blowup).
        lax.fori_loop(0, BI, pair_row, None)

    if symmetric:
        # upper-triangular cells only (requires BI == BJ); the public
        # wrapper mirrors the result.  Skipped cells only zero-fill the row
        # block on its first visit (j == 0 < i implies the row's real data
        # lands at j >= i).
        @pl.when(j >= i)
        def _():
            body()

        @pl.when(jnp.logical_and(j == 0, i > 0))
        def _():
            out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
    else:
        body()


def _pad_time_repeat(X, L_pad: int):
    """(N, L, d) -> (N, L_pad, d) repeating the last observation (signature-
    invariant padding)."""
    N, L, d = X.shape
    if L == L_pad:
        return X
    tail = jnp.repeat(X[:, -1:, :], L_pad - L, axis=1)
    return jnp.concatenate([X, tail], axis=1)


def _pad_examples_repeat(X, n_pad: int):
    """Pad the example axis by repeating the first example (results cropped)."""
    if n_pad == 0:
        return X
    return jnp.concatenate(
        [X, jnp.broadcast_to(X[:1], (n_pad,) + X.shape[1:])], axis=0
    )


def _flat_time_minor(X):
    """(N, L, d) -> (d, N*L) time-minor layout (lane axis L-packed)."""
    d = X.shape[-1]
    return jnp.transpose(X, (2, 0, 1)).reshape(d, -1).astype(jnp.float32)


def _prep_inputs(X, base: str, difference: bool, lhs: bool):
    """Host/XLA-side input prep: (value array, difference array), each
    (d_k, N*L) time-minor.

    RBF uses norm-augmented vectors so that in-kernel dots evaluate
    -|x-y|^2/2 and its exact per-step differences:
      lhs form [x; -|x|^2/2; 1], rhs form [x; 1; -|x|^2/2];
      difference rows use d(|x|^2) = <x'+x, dx> (cancellation-free).
    """
    Xn = jnp.concatenate([X[:, 1:], X[:, -1:]], axis=1)  # x_next
    dX = Xn - X
    if base == "linear":
        return _flat_time_minor(X), _flat_time_minor(dX)
    # rbf augmentation
    n = -0.5 * jnp.sum(jnp.square(X), axis=-1, keepdims=True)
    dn = -0.5 * jnp.sum((Xn + X) * dX, axis=-1, keepdims=True)
    ones = jnp.ones_like(n)
    zeros = jnp.zeros_like(n)
    if lhs:
        Xa = jnp.concatenate([X, n, ones], axis=-1)
        dXa = jnp.concatenate([dX, dn, zeros], axis=-1)
    else:
        Xa = jnp.concatenate([X, ones, n], axis=-1)
        dXa = jnp.concatenate([dX, zeros, dn], axis=-1)
    return _flat_time_minor(Xa), _flat_time_minor(dXa)


def _fwd_call(Xf, dXf, X2f, dX2f, *, nb1: int, nb2: int, BI: int, BJ: int,
              vmem_limit: int,
              L_pad: int, L_true: int, L2_true: int, num_levels: int, order: int,
              base: str, difference: bool, symmetric: bool, fast_math,
              interpret: bool):
    d_k = Xf.shape[0]
    W = max(128, -(-(nb2 * BJ) // 128) * 128)

    kernel = functools.partial(
        _kernel_fwd, BI=BI, BJ=BJ, L=L_pad, L_true=L_true, L2_true=L2_true,
        d=d_k,
        num_levels=num_levels, order=order, base=base,
        difference=difference, symmetric=symmetric,
        precision=_recursion_precision(fast_math),
    )

    in_spec_i = pl.BlockSpec((d_k, BI * L_pad), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM)
    in_spec_j = pl.BlockSpec((d_k, BJ * L_pad), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(nb1, nb2),
        in_specs=[in_spec_i, in_spec_i, in_spec_j, in_spec_j],
        out_specs=pl.BlockSpec(
            # full-width row block, revisited across the j sweep (the block
            # index ignores j, so it stays VMEM-resident for accumulation)
            (num_levels + 1, BI, W), lambda i, j: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (num_levels + 1, nb1 * BI, W), jnp.float32
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )(Xf, dXf, X2f, dX2f)


_TOTAL_VMEM = 120 * 1024 * 1024  # headroom under the chip's 128 MB VMEM

# feature-width ceiling for the fused kernels: beyond this, Mosaic's
# register allocator spills the (d_aug, B*L) input values into scoped VMEM
# at a scale no block-size model predicts (measured: d=963 PEMS shapes
# spill 81 MB of register slots on top of a 52 MB modeled working set).
# Wide inputs take the XLA/blocked path instead — their base-Gram matmuls
# are K=d-deep and MXU-efficient there.
_MAX_FUSED_FEATURES = 128


def _vmem_plan(L_pad: int, d_aug: int, order: int, bi: int, bj: int):
    """(io_bytes, work_bytes): pipelined input blocks vs the kernel's
    scoped working set.  io = two (d_aug, B*L_pad) f32 arrays per side,
    double-buffered across grid steps (dominant for wide inputs, e.g.
    PEMS d=963); work = ~LIVE concurrent (L, BJ*L_pad) recursion tiles
    (grid of order^2 for higher orders) plus in-kernel input copies."""
    live = (6 + 2 * max(1, order * order)) * (2 if order > 1 else 1)
    io = 2 * 2 * d_aug * (bi + bj) * L_pad * 4
    work = live * L_pad * (bj * L_pad) * 4
    work += 4 * d_aug * (bj * L_pad + L_pad) * 4
    return io, work


def _pick_blocks(L_pad: int, d_aug: int, order: int, bi: int, bj: int):
    """Largest (BI, BJ, scoped_vmem_limit) fitting total VMEM, or None.
    Shrinks BI first (io-dominant for wide d), then BJ."""
    bi = max(8, (bi // 8) * 8)
    while True:
        io, work = _vmem_plan(L_pad, d_aug, order, bi, bj)
        limit = min(100 * 1024 * 1024, _TOTAL_VMEM - io)
        if limit > 0 and work <= int(0.9 * limit):
            return bi, bj, limit
        if bi > 8:
            bi = max(8, bi // 2)
        elif bj > 1:
            bj //= 2
        else:
            return None


def fused_shape_ok(L: int, d: int, order: int = 1,
                   base: str = "rbf") -> bool:
    """Whether the fused kernel's VMEM plan fits at this sequence length /
    feature width even at the smallest blocks.  Dispatch sites use this to
    fall back to the XLA path instead of OOM-ing the Mosaic allocators."""
    L_pad = max(128, -(-L // 128) * 128)
    d_aug = d + (2 if base != "linear" else 0)
    if d_aug > _MAX_FUSED_FEATURES:
        return False
    return _pick_blocks(L_pad, d_aug, order, 16, 8) is not None


def fused_first_order_levels(X, X2=None, *, num_levels: int,
                             order: int = 1, base: str = "rbf",
                             difference: bool = True,
                             block_i: int = 16, block_j: int = 8,
                             fast_math=True,
                             interpret: bool = False):
    """(num_levels+1, N1, N2) per-level signature kernels, fully fused.

    Args:
      X: (N1, L, d) scaled sequences (float32); X2: (N2, L, d) or None.
      base: 'rbf' | 'linear' (the benchmark-relevant state-space embeddings;
        other bases use the XLA path).
      fast_math: bf16 MXU inputs for the level-recursion matmuls (f32
        accumulation; the increment Gram is always full-f32).

    Differentiable: a custom VJP runs the backward pass as a second fused
    Pallas kernel (see ``_bwd_call``).
    """
    if base not in SUPPORTED_BASES:
        raise ValueError(f"unsupported base {base!r} for the fused kernel")
    symmetric = X2 is None
    if X2 is None:
        X2 = X
    N1, L, d = X.shape
    N2 = X2.shape[0]
    # pad BOTH sides' time axes to a common 128-multiple (repeat-padding is
    # signature-exact, so a longer X2 just zero-increments past its end)
    L_pad = max(128, -(-max(L, X2.shape[1]) // 128) * 128)
    BI, BJ = block_i, block_j
    # VMEM guard (see _vmem_plan/_pick_blocks): total VMEM must hold both
    # the pipelined input blocks and the kernel's scoped working set —
    # without this, L >~ 400 or d in the hundreds OOMs the Mosaic
    # allocators at the default blocks instead of shrinking or falling
    # back.
    d_aug = d + (2 if base != "linear" else 0)
    picked = _pick_blocks(L_pad, d_aug, order, BI, BJ)
    if picked is None:
        raise ValueError(
            f"sequences too long/wide (L={L}, d={d}) for the fused "
            "kernel's VMEM working set even at the smallest blocks; use "
            "K_blocked(method='xla') or the sequence-parallel path"
        )
    BI, BJ, vmem_limit = picked
    if symmetric:
        if BJ >= 8:
            BI = BJ = min(BI, BJ)  # upper-tri cell skip needs square cells
        else:
            # VMEM forced BJ below the sublane granule: compute the full
            # grid (no triangular skip) with a legal BI instead
            symmetric = False

    nb1 = -(-N1 // BI)
    nb2 = -(-N2 // BJ)

    core = _make_fused_core(
        num_levels, order, base, difference, symmetric, nb1, nb2, BI, BJ,
        L_pad, L, X2.shape[1], vmem_limit, fast_math, interpret,
    )
    out = core(X, X2)
    out = out[:, :N1, :N2]
    if symmetric:
        # only upper-triangular (block) cells were computed; mirror the
        # off-diagonal blocks (diagonal cells are computed in full)
        blk_r = jnp.arange(N1)[:, None] // BI
        blk_c = jnp.arange(N2)[None, :] // BJ
        offdiag = (blk_r != blk_c).astype(out.dtype)
        out = out + jnp.swapaxes(out, 1, 2) * offdiag[None]
    if difference:
        # telescoped exact level 1 from endpoints (see
        # gram.level1_exact_cross); jnp-level, so its adjoint is automatic
        from . import gram as gram_ops

        inc_cross, _ = gram_ops.increment_gram_fns(base)
        out = out.at[1].set(gram_ops.level1_exact_cross(
            inc_cross, X, X2, lax.Precision.HIGHEST
        ))
    return out


def _prep_all(X, X2, base, difference, nb1, nb2, BI, BJ, L_pad):
    """Differentiable jnp-side prep: pad time+examples, augment, flatten."""
    N1, N2 = X.shape[0], X2.shape[0]
    Xp = _pad_examples_repeat(_pad_time_repeat(X, L_pad), nb1 * BI - N1)
    X2p = _pad_examples_repeat(_pad_time_repeat(X2, L_pad), nb2 * BJ - N2)
    Xf, dXf = _prep_inputs(Xp, base, difference, lhs=True)
    X2f, dX2f = _prep_inputs(X2p, base, difference, lhs=False)
    return Xf, dXf, X2f, dX2f


@functools.lru_cache(maxsize=None)
def _make_fused_core(num_levels, order, base, difference, symmetric, nb1,
                     nb2, BI, BJ, L_pad, L_true, L2_true, vmem_limit,
                     fast_math, interpret):
    """Custom-VJP core (per static config): (X, X2) -> padded level stack.

    X/X2 are the raw (N, L, d) sequences; padding and input prep happen
    inside so their adjoints ride jax.vjp of the jnp-side prep while the
    heavy recursion adjoint runs in the fused backward kernel.
    """

    def prep(X, X2):
        return _prep_all(X, X2, base, difference, nb1, nb2, BI, BJ, L_pad)

    def fwd(X, X2):
        Xf, dXf, X2f, dX2f = prep(X, X2)
        out = _fwd_call(
            Xf, dXf, X2f, dX2f, nb1=nb1, nb2=nb2, BI=BI, BJ=BJ,
            vmem_limit=vmem_limit,
            L_pad=L_pad, L_true=L_true, L2_true=L2_true,
            num_levels=num_levels, order=order,
            base=base, difference=difference, symmetric=symmetric,
            fast_math=fast_math, interpret=interpret,
        )
        return out, (X, X2)

    @jax.custom_vjp
    def core(X, X2):
        return fwd(X, X2)[0]

    def bwd(res, ct):
        X, X2 = res
        flats, pullback = jax.vjp(prep, X, X2)
        Xf, dXf, X2f, dX2f = flats
        gXf, gdXf, gX2f, gdX2f = _bwd_call(
            Xf, dXf, X2f, dX2f, ct.astype(jnp.float32), nb1=nb1, nb2=nb2,
            vmem_limit=vmem_limit,
            BI=BI, BJ=BJ, L_pad=L_pad, L_true=L_true, L2_true=L2_true,
            num_levels=num_levels, order=order, base=base,
            difference=difference, symmetric=symmetric,
            fast_math=fast_math, interpret=interpret,
        )
        gX, gX2 = pullback((gXf.astype(Xf.dtype), gdXf.astype(dXf.dtype),
                            gX2f.astype(X2f.dtype),
                            gdX2f.astype(dX2f.dtype)))
        return gX, gX2

    core.defvjp(fwd, bwd)
    return core


def _kernel_bwd(xi_ref, dxi_ref, xj_ref, dxj_ref, ct_ref, gxi_ref, gdxi_ref,
                gxj_ref, gdxj_ref, *, BI: int, BJ: int, L: int, L_true: int,
                L2_true: int,
                num_levels: int, order: int, base: str, difference: bool,
                symmetric: bool, precision):
    """Backward kernel for one (i, j) grid cell.

    Per pair (a, b) the forward is R_1 = M; R_m = M * (A R_{m-1} B);
    K_m = sum(R_m).  With level cotangents g_m the reverse sweep is

        Rbar_M = g_M * 1
        Rbar_m = g_m * 1 + A^T (M * Rbar_{m+1}) B^T      (m = M-1 .. 1)
        Mbar   = Rbar_1 + sum_{m>=2} C_m * Rbar_m

    (C_m = A R_{m-1} B recomputed forward) — the adjoint of the exclusive
    double cumsum is the reversed exclusive double cumsum, i.e. the same
    triangular-ones matmuls transposed.  Mbar then pulls back through the
    cancellation-free increment algebra into the flat inputs.

    Outputs: gxi/gdxi (BI, d, L) per row block (accumulated over the j
    sweep in VMEM); gxj/gdxj (nb2, d, BJ*L) full-width (accumulated over
    the whole grid in VMEM; initialized at i == j == 0).
    """
    f32 = jnp.float32
    BJL = BJ * L
    Ls = L if not difference else min(L, -(-L_true // 8) * 8)

    # row-pad matmul: (d, Ls) grads -> (d, L) for full-width stores
    prow = lax.broadcasted_iota(jnp.int32, (Ls, L), 0)
    pcol = lax.broadcasted_iota(jnp.int32, (Ls, L), 1)
    rowpad = (prow == pcol).astype(f32)

    i = pl.program_id(0)
    j = pl.program_id(1)

    if difference:
        tail_mask = None
    else:
        cig = lax.broadcasted_iota(jnp.int32, (Ls, BJL), 1) % L
        rix = lax.broadcasted_iota(jnp.int32, (Ls, BJL), 0)
        tail_mask = ((rix < L_true) & (cig < L2_true)).astype(f32)

    def hdot(xa2, xj2):
        return lax.dot_general(
            xa2, xj2, (((0,), (0,)), ((), ())), preferred_element_type=f32,
            precision=lax.Precision.HIGHEST,
        )

    # segment-aware cumsums: see _kernel_fwd — one full-width sweep covers
    # all BJ column examples per level of the adjoint recursion
    cum_rows, cum_lanes = _make_cumsums(precision, seg=L)

    def mm_hi(a, b):
        return lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32,
            precision=lax.Precision.HIGHEST,
        )

    # contraction selector: (M+1, W) ct rows -> (M+1, BJ) for this cell
    W = ct_ref.shape[-1]
    srow = lax.broadcasted_iota(jnp.int32, (W, BJ), 0)
    scol = lax.broadcasted_iota(jnp.int32, (W, BJ), 1)
    select = (srow == scol + j * BJ).astype(f32)

    # lane expansion: (M+1, BJ) cell cotangents -> (M+1, BJL) with each
    # example's scalar broadcast across its L-lane segment
    erow = lax.broadcasted_iota(jnp.int32, (BJ, BJL), 0)
    ecol = lax.broadcasted_iota(jnp.int32, (BJ, BJL), 1)
    seg_expand = (ecol // L == erow).astype(f32)

    def body():
        xj = xj_ref[:]
        dxj = dxj_ref[:]

        def pair_row(a, carry):
            xa = xi_ref[:, pl.ds(a * L, Ls)]
            dxa = dxi_ref[:, pl.ds(a * L, Ls)]

            # recompute the increment Gram row and per-term weights
            es = e01 = e10 = eA00 = dots_vjp = ndx = ndy = None
            if base == "linear":
                if difference:
                    M_full = hdot(dxa, dxj)
                else:
                    M_full = hdot(xa, xj) * tail_mask
            elif base == "matern12":
                # weight tiles via jax.vjp of the dots-level closed form —
                # pure elementwise, so the transpose traces into the same
                # VPU ops; the step norms are vjp primals whose cotangents
                # chain back into the difference tiles (d|v|/dv = v/|v|)
                A00 = hdot(xa, xj)
                if difference:
                    d01 = hdot(xa, dxj)
                    d10 = hdot(dxa, xj)
                    dxx = hdot(dxa, dxj)
                    ndx, ndy = _step_norms(dxa, dxj)

                    def _m12(args):
                        return mat12_cross_from_dots(
                            *args, exp=exp_accurate, expm1=_expm1)

                    M_full, dots_vjp = jax.vjp(
                        _m12, (A00, d01, d10, dxx, ndx, ndy))
                else:
                    def _m12p(a00):
                        return mat12_plain_from_dots(
                            a00, exp=exp_accurate) * tail_mask

                    M_full, dots_vjp = jax.vjp(_m12p, A00)
            else:
                A00 = hdot(xa, xj)
                eA00 = exp_accurate(A00)
                if difference:
                    d01 = hdot(xa, dxj)
                    d10 = hdot(dxa, xj)
                    dxx = hdot(dxa, dxj)
                    s = d01 + d10 + dxx
                    es, e01, e10 = _expm1(s), _expm1(d01), _expm1(d10)
                    M_full = eA00 * (es - e01 - e10)
                else:
                    M_full = eA00 * tail_mask

            g = lax.dot_general(
                ct_ref[:, a, :], select, (((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=lax.Precision.HIGHEST,
            )  # (M+1, BJ) level cotangents: this row vs cell columns
            g_lanes = lax.dot_general(
                g, seg_expand, (((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=lax.Precision.HIGHEST,
            )  # (M+1, BJL): per-example cotangents segment-broadcast
            gb = [g_lanes[m:m + 1, :] for m in range(num_levels + 1)]
            Mbar_full = _pair_levels_bwd(
                M_full, gb, num_levels, order, cum_rows, cum_lanes
            )  # (Ls, BJL)

            # pull Mbar back through the increment algebra into flat inputs.
            # Each dot term T = lhs^T rhs (hdot) with weight W_T gives
            # g_lhs += rhs @ W_T^T  and  g_rhs += lhs @ W_T.
            def lhs_grad(rhs_arr, Wt):
                # (d, BJL) x (Ls, BJL) -> (d, Ls) -> row-pad to (d, L)
                gl = lax.dot_general(
                    rhs_arr, Wt, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32,
                    precision=lax.Precision.HIGHEST,
                )
                return mm_hi(gl, rowpad)

            def rhs_grad(lhs_arr, Wt):
                # (d, Ls) x (Ls, BJL) -> (d, BJL)
                return lax.dot_general(
                    lhs_arr, Wt, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                    precision=lax.Precision.HIGHEST,
                )

            zrow = jnp.zeros((xa.shape[0], L), f32)
            zcol = jnp.zeros_like(xj)
            if base == "linear":
                if difference:
                    g_xa, g_dxa = zrow, lhs_grad(dxj, Mbar_full)
                    g_xj, g_dxj = zcol, rhs_grad(dxa, Mbar_full)
                else:
                    g_xa, g_dxa = lhs_grad(xj, Mbar_full * tail_mask), zrow
                    g_xj, g_dxj = rhs_grad(xa, Mbar_full * tail_mask), zcol
            elif base == "matern12":
                if difference:
                    # zero-length steps (repeat padding, duplicated
                    # observations) have M ≡ 0 *identically* under the
                    # padded parameterization, so their net gradient
                    # contribution is exactly zero — but the 1/tiny-guarded
                    # branches of the radius-gap algebra evaluate the two
                    # pad-adjoint partials (+c into y_{t+1}, -c into y_t)
                    # through different tile paths and the O(1/tiny)-scale
                    # c leaves O(1) f32 residue at the boundary (round-5
                    # symmetric-mode self-pair finding).  Masking the
                    # cotangent at dead steps zeroes all six weight tiles
                    # at once; it is also the symmetric subgradient at the
                    # |.|-kink for genuinely repeated observations.
                    live = ((ndx > 0.0).astype(f32)
                            * (ndy > 0.0).astype(f32))
                    (W_A00, W_d01, W_d10, W_dxx,
                     W_nx, W_ny), = dots_vjp(Mbar_full * live)
                    g_xa = lhs_grad(xj, W_A00) + lhs_grad(dxj, W_d01)
                    g_dxa = (lhs_grad(xj, W_d10) + lhs_grad(dxj, W_dxx)
                             + mm_hi(_norm_chain_col(dxa, W_nx, ndx),
                                     rowpad))
                    g_xj = rhs_grad(xa, W_A00) + rhs_grad(dxa, W_d10)
                    g_dxj = (rhs_grad(xa, W_d01) + rhs_grad(dxa, W_dxx)
                             + _norm_chain_row(dxj, W_ny, ndy))
                else:
                    W_A00, = dots_vjp(Mbar_full)
                    g_xa, g_dxa = lhs_grad(xj, W_A00), zrow
                    g_xj, g_dxj = rhs_grad(xa, W_A00), zcol
            else:
                if difference:
                    W_A00 = Mbar_full * M_full  # dM/dA00 = M
                    es1, e011, e101 = es + 1.0, e01 + 1.0, e10 + 1.0
                    W_d01 = Mbar_full * (eA00 * (es1 - e011))
                    W_d10 = Mbar_full * (eA00 * (es1 - e101))
                    W_dxx = Mbar_full * (eA00 * es1)
                    g_xa = lhs_grad(xj, W_A00) + lhs_grad(dxj, W_d01)
                    g_dxa = lhs_grad(xj, W_d10) + lhs_grad(dxj, W_dxx)
                    g_xj = rhs_grad(xa, W_A00) + rhs_grad(dxa, W_d10)
                    g_dxj = rhs_grad(xa, W_d01) + rhs_grad(dxa, W_dxx)
                else:
                    W_A00 = Mbar_full * M_full
                    g_xa, g_dxa = lhs_grad(xj, W_A00), zrow
                    g_xj, g_dxj = rhs_grad(xa, W_A00), zcol

            # row grads: (BI, d, L) block, accumulated across the j sweep
            # (in symmetric mode the row's first computed cell is j == i)
            first = j == (i if symmetric else 0)
            prev_x = gxi_ref[a]
            prev_dx = gdxi_ref[a]
            gxi_ref[a] = jnp.where(first, g_xa, prev_x + g_xa)
            gdxi_ref[a] = jnp.where(first, g_dxa, prev_dx + g_dxa)
            acc_xj, acc_dxj = carry
            return (acc_xj + g_xj, acc_dxj + g_dxj)

        zero_j = jnp.zeros((xj.shape[0], BJL), f32)
        g_xj_tot, g_dxj_tot = lax.fori_loop(
            0, BI, pair_row, (zero_j, zero_j)
        )

        prev_xj = gxj_ref[j]
        prev_dxj = gdxj_ref[j]
        gxj_ref[j] = jnp.where(i == 0, g_xj_tot, prev_xj + g_xj_tot)
        gdxj_ref[j] = jnp.where(i == 0, g_dxj_tot, prev_dxj + g_dxj_tot)

    if symmetric:
        @pl.when(j >= i)
        def _():
            body()

        # skipped cells still own the first visit of this row's gxi blocks
        @pl.when(jnp.logical_and(j == 0, i > 0))
        def _():
            gxi_ref[...] = jnp.zeros(gxi_ref.shape, gxi_ref.dtype)
            gdxi_ref[...] = jnp.zeros(gdxi_ref.shape, gdxi_ref.dtype)
    else:
        body()


def _bwd_call(Xf, dXf, X2f, dX2f, ct, *, nb1: int, nb2: int, BI: int,
              vmem_limit: int,
              BJ: int, L_pad: int, L_true: int, L2_true: int, num_levels: int,
              order: int, base: str, difference: bool, symmetric: bool,
              fast_math, interpret: bool):
    """Pallas backward: grads w.r.t. the four flat (d, N*L) inputs."""
    d_k = Xf.shape[0]

    kernel = functools.partial(
        _kernel_bwd, BI=BI, BJ=BJ, L=L_pad, L_true=L_true, L2_true=L2_true,
        num_levels=num_levels, order=order, base=base,
        difference=difference, symmetric=symmetric,
        precision=_recursion_precision(fast_math),
    )

    in_spec_i = pl.BlockSpec((d_k, BI * L_pad), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM)
    in_spec_j = pl.BlockSpec((d_k, BJ * L_pad), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM)
    W = ct.shape[-1]
    ct_spec = pl.BlockSpec((num_levels + 1, BI, W), lambda i, j: (0, i, 0),
                           memory_space=pltpu.VMEM)

    gxi, gdxi, gxj, gdxj = pl.pallas_call(
        kernel,
        grid=(nb1, nb2),
        in_specs=[in_spec_i, in_spec_i, in_spec_j, in_spec_j, ct_spec],
        out_specs=[
            pl.BlockSpec((BI, d_k, L_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BI, d_k, L_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # full-array col grads: VMEM-resident across the whole grid
            pl.BlockSpec((nb2, d_k, BJ * L_pad), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb2, d_k, BJ * L_pad), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb1 * BI, d_k, L_pad), jnp.float32),
            jax.ShapeDtypeStruct((nb1 * BI, d_k, L_pad), jnp.float32),
            jax.ShapeDtypeStruct((nb2, d_k, BJ * L_pad), jnp.float32),
            jax.ShapeDtypeStruct((nb2, d_k, BJ * L_pad), jnp.float32),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,
        ),
        interpret=interpret,
    )(Xf, dXf, X2f, dX2f, ct)

    # back to the (d, N*L) flat layout
    def row_flat(g):  # (N, d, L) -> (d, N*L)
        return jnp.transpose(g, (1, 0, 2)).reshape(d_k, -1)

    def col_flat(g):  # (nb2, d, BJ*L) -> (d, nb2*BJ*L)
        return jnp.transpose(g, (1, 0, 2)).reshape(d_k, -1)

    return row_flat(gxi), row_flat(gdxi), col_flat(gxj), col_flat(gdxj)


