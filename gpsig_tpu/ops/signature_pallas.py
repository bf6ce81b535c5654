"""Fused Pallas TPU kernel for first-order signature Gram matrices.

The hot loop of the whole framework (SURVEY.md §3.2).  The XLA blocked path
(`ops/gram.py`) is bandwidth-bound: every level of the recursion round-trips
the (B, B, L, L) tile through HBM (~2.4 TB of traffic at the north-star
scale).  This kernel keeps everything in VMEM:

for each grid cell (i, j) — a (BI x BJ) block of example pairs:
  loop a over the BI row examples:
    1. base Gram  G = x_a^T @ X_j    (one (L, d) x (d, BJ*L) MXU matmul,
       RBF/linear evaluated pointwise on the VPU)
    2. increment Gram via rolled second differences (masked at roll wraps)
    3. per level m = 2..M:
         col-exclusive-cumsum: log-shift ladder on the VPU with group masks
         row-exclusive-cumsum: strictly-lower-triangular ones matmul (MXU)
         R <- M_inc * T;  K_m = group-sum (two tiny MXU matmuls)
    4. place the (M+1, BJ) level sums at lane offset j*BJ of a full-width
       output row block via a tiny expansion matmul (TPU vector stores
       can't hit unaligned lane offsets; a matmul can) and accumulate —
       the output block's index map ignores j, so Pallas keeps it
       VMEM-resident across the whole j sweep.

HBM traffic: X blocks in, (M+1) scalars per pair out.  The (N, L, N, L)
intermediate never exists.

Layout notes:
* sequences are passed time-minor as (d, N*L) so the lane axis is L-packed
  (a (N, L, d) layout would waste 128/d of every lane);
* L is padded to a multiple of 128 by repeating the last observation —
  exactly signature-invariant (`preprocessing.py:23-25`);
* the output is produced as (N1, M+1, N2) and transposed outside (cheap).

Differentiation: use the XLA path for training (autodiff); this kernel is
the inference/Gram fast path.  A custom VJP is planned.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll(x, shift: int, axis: int, interpret: bool):
    if interpret:
        return jnp.roll(x, shift, axis=axis)
    # pltpu.roll is cyclic but requires a non-negative shift
    return pltpu.roll(x, shift % x.shape[axis], axis=axis)


def _kernel(xi_ref, xj_ref, out_ref, *, BI: int, BJ: int,
            L: int, L_true: int, d: int, num_levels: int, base: str,
            difference: bool, interpret: bool, precision):
    f32 = jnp.float32
    BJL = BJ * L
    W = out_ref.shape[-1]  # padded full output width (multiple of 128)

    # constants (generated in-register, no HBM traffic)
    row = lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col = lax.broadcasted_iota(jnp.int32, (L, L), 1)
    A_lower = (row > col).astype(f32)  # strictly-lower ones: row-excl-cumsum
    A_upper = (row < col).astype(f32)  # strictly-upper ones: col-excl-cumsum

    cig = lax.broadcasted_iota(jnp.int32, (L, BJL), 1) % L  # col-in-group
    rix = lax.broadcasted_iota(jnp.int32, (L, BJL), 0)  # row index

    # group-sum matrix: (BJL, BJ), S[c, b] = 1 iff c // L == b
    gcol = lax.broadcasted_iota(jnp.int32, (BJL, BJ), 0) // L
    gsel = lax.broadcasted_iota(jnp.int32, (BJL, BJ), 1)
    S = (gcol == gsel).astype(f32)

    j = pl.program_id(1)

    # expansion matrix placing this cell's BJ columns at lane offset j*BJ of
    # the full-width accumulator (lane-offset vector stores aren't legal on
    # TPU; a tiny matmul is)
    erow = lax.broadcasted_iota(jnp.int32, (BJ, W), 0)
    ecol = lax.broadcasted_iota(jnp.int32, (BJ, W), 1)
    expand = (ecol == erow + j * BJ).astype(f32)

    xj = xj_ref[:]  # (d, BJL)
    if base == "rbf":
        nj = jnp.sum(jnp.square(xj), axis=0, keepdims=True)  # (1, BJL)

    def group_sum(R):
        return lax.dot_general(
            jnp.sum(R, axis=0, keepdims=True), S,
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        )  # (1, BJ)

    def pair_row(a, carry):
        xa = xi_ref[:, pl.ds(a * L, L)]  # (d, L)
        G = lax.dot_general(
            xa, xj, (((0,), (0,)), ((), ())), preferred_element_type=f32,
            precision=precision,
        )  # (L, BJL)
        if base == "rbf":
            na = jnp.sum(jnp.square(xa), axis=0)[:, None]  # (L, 1)
            G = jnp.exp(-(na + nj - 2.0 * G) * 0.5)

        if difference:
            Gc = _roll(G, -1, 1, interpret)  # G[s, t+1]
            Gr = _roll(G, -1, 0, interpret)  # G[s+1, t]
            Grc = _roll(Gc, -1, 0, interpret)  # G[s+1, t+1]
            valid = ((rix < L - 1) & (cig < L - 1)).astype(f32)
            M = (Grc + G - Gc - Gr) * valid
        else:
            # integrated-path mode has no padding invariance: mask the
            # repeated tail explicitly
            valid = ((rix < L_true) & (cig < L_true)).astype(f32)
            M = G * valid

        levels = [jnp.ones((1, BJ), f32), group_sum(M)]

        R = M
        for _ in range(2, num_levels + 1):
            # BOTH exclusive cumsums are triangular-ones matmuls on the MXU:
            # viewing the (L, BJ*L) tile as rank-3 (L, BJ, T), the xa-time
            # cumsum contracts the major dim (a plain (L,L)@(L,BJ*L) matmul
            # on the 2-D view) and the xb-time cumsum contracts the lane dim
            # per group (a batched matmul with the strictly-upper ones).
            # No masks, no ladder — one MXU pass each.
            E = lax.dot_general(
                A_lower, R, (((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=precision,
            )  # (L, BJL): exclusive cumsum over xa time
            E3 = E.reshape(L, BJ, L)
            T3 = lax.dot_general(
                E3, A_upper, (((2,), (0,)), ((), ())),
                preferred_element_type=f32, precision=precision,
            )  # (L, BJ, T): exclusive cumsum over xb time within groups
            R = M * T3.reshape(L, BJL)
            levels.append(group_sum(R))

        levels2d = jnp.concatenate(levels, axis=0)  # (M+1, BJ)
        placed = lax.dot_general(
            levels2d, expand, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (M+1, W) with this cell's columns at j*BJ
        prev = out_ref[:, a, :]
        out_ref[:, a, :] = jnp.where(j == 0, placed, prev + placed)
        return carry

    lax.fori_loop(0, BI, pair_row, None)


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


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_levels", "base", "difference", "block_i", "block_j",
        "fast_math", "interpret"
    ),
)
def fused_first_order_levels(X, X2=None, *, num_levels: int,
                             base: str = "rbf", difference: bool = True,
                             block_i: int = 16, block_j: int = 8,
                             fast_math: bool = False,
                             interpret: bool = False):
    """(num_levels+1, N1, N2) per-level signature kernels, fully fused.

    Args:
      X: (N1, L, d) scaled sequences (float32); X2: (N2, L, d) or None.
      base: 'rbf' | 'linear' (the benchmark-relevant state-space embeddings;
        other bases use the XLA path).
    """
    if base not in ("rbf", "linear"):
        raise ValueError(f"unsupported base {base!r} for the fused kernel")
    if X2 is None:
        X2 = X
    N1, L, d = X.shape
    N2 = X2.shape[0]
    L_pad = max(128, -(-L // 128) * 128)
    BI, BJ = block_i, block_j

    X = _pad_time_repeat(X, L_pad)
    X2 = _pad_time_repeat(X2, L_pad)
    nb1 = -(-N1 // BI)
    nb2 = -(-N2 // BJ)
    X = _pad_examples_repeat(X, nb1 * BI - N1)
    X2 = _pad_examples_repeat(X2, nb2 * BJ - N2)
    # full accumulator width, 128-aligned for the VMEM->HBM DMA
    W = max(128, -(-(nb2 * BJ) // 128) * 128)

    # time-minor flat layout: (d, N*L)
    Xf = jnp.transpose(X, (2, 0, 1)).reshape(d, nb1 * BI * L_pad)
    X2f = jnp.transpose(X2, (2, 0, 1)).reshape(d, nb2 * BJ * L_pad)
    Xf = Xf.astype(jnp.float32)
    X2f = X2f.astype(jnp.float32)

    kernel = functools.partial(
        _kernel, BI=BI, BJ=BJ, L=L_pad, L_true=L, d=d,
        num_levels=num_levels, base=base, difference=difference,
        interpret=interpret,
        precision=(lax.Precision.DEFAULT if fast_math
                   else lax.Precision.HIGHEST),
    )

    out = pl.pallas_call(
        kernel,
        grid=(nb1, nb2),
        in_specs=[
            pl.BlockSpec((d, BI * L_pad), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, BJ * L_pad), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            # full-width row block, revisited across the j sweep (the block
            # index ignores j, so it stays VMEM-resident for accumulation)
            (num_levels + 1, BI, W), lambda i, j: (0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (num_levels + 1, nb1 * BI, W), jnp.float32
        ),
        interpret=interpret,
    )(Xf, X2f)

    return out[:, :N1, :N2]
