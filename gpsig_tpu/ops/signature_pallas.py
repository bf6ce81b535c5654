"""Fused Pallas TPU kernel for first-order signature Gram matrices.

The hot loop of the whole framework (SURVEY.md §3.2).  The XLA blocked path
(`ops/gram.py`) is bandwidth-bound: every level of the recursion round-trips
the (B, B, L, L) tile through HBM (~2.4 TB of traffic at the north-star
scale).  This kernel keeps everything in VMEM:

for each grid cell (i, j) — a (BI x BJ) block of example pairs:
  loop a over the BI row examples:
    1. increment Gram M via a cancellation-free formulation (below)
    2. per level m = 2..M, both exclusive cumsums are triangular-ones
       matmuls on the MXU: viewing the (L, BJ*L) tile as rank-3 (L, BJ, T),
       the xa-time cumsum contracts the major dim (a plain (L,L)@(L,BJ*L)
       matmul on the 2-D view) and the xb-time cumsum contracts the lane
       dim per group (a batched matmul with the strictly-upper ones).
    3. the (M+1, BJ) level sums are placed at lane offset j*BJ of a
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


def _expm1(x):
    """exp(x) - 1 with a Taylor branch for small |x| (Mosaic's exp is only
    ~1e-6-accurate; the Taylor branch keeps the error *relative* to x)."""
    p = x / 6.0
    for k in (5.0, 4.0, 3.0, 2.0):
        p = (1.0 + p) * x / k
    taylor = (1.0 + p) * x
    return jnp.where(jnp.abs(x) < 0.25, taylor, jnp.exp(x) - 1.0)


def _kernel(xi_ref, dxi_ref, xj_ref, dxj_ref, out_ref, *, BI: int, BJ: int,
            L: int, L_true: int, d: int, num_levels: int, base: str,
            difference: bool, precision):
    f32 = jnp.float32
    BJL = BJ * L
    W = out_ref.shape[-1]  # padded full output width (multiple of 128)

    # constants (generated in-register, no HBM traffic)
    row = lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col = lax.broadcasted_iota(jnp.int32, (L, L), 1)
    A_lower = (row > col).astype(f32)  # strictly-lower ones: row-excl-cumsum
    A_upper = (row < col).astype(f32)  # strictly-upper ones: col-excl-cumsum

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
    dxj = dxj_ref[:]

    if not difference:
        cig = lax.broadcasted_iota(jnp.int32, (L, BJL), 1) % L
        rix = lax.broadcasted_iota(jnp.int32, (L, BJL), 0)
        tail_mask = ((rix < L_true) & (cig < L_true)).astype(f32)

    def hdot(xa2, xj2):
        """(d, L) x (d, BJL) -> (L, BJL), full-f32 (signal can be O(1/L) of
        operand magnitudes; bf16 inputs would drown it)."""
        return lax.dot_general(
            xa2, xj2, (((0,), (0,)), ((), ())), preferred_element_type=f32,
            precision=lax.Precision.HIGHEST,
        )

    def group_sum(R):
        # HIGHEST: a bf16 pass here would round the *result* kernel values
        return lax.dot_general(
            jnp.sum(R, axis=0, keepdims=True), S,
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
            precision=lax.Precision.HIGHEST,
        )  # (1, BJ)

    def pair_row(a, carry):
        xa = xi_ref[:, pl.ds(a * L, L)]  # (d, L)
        dxa = dxi_ref[:, pl.ds(a * L, L)]

        if base == "linear":
            if difference:
                M = hdot(dxa, dxj)  # exact increment Gram, one matmul
            else:
                M = hdot(xa, xj) * tail_mask
        else:  # rbf on norm-augmented inputs
            A00 = hdot(xa, xj)  # = -|x_s - y_t|^2 / 2
            if difference:
                d01 = hdot(xa, dxj)   # A(x, y') - A(x, y)
                d10 = hdot(dxa, xj)   # A(x', y) - A(x, y)
                dxx = hdot(dxa, dxj)  # <dx, dy>
                M = jnp.exp(A00) * (
                    _expm1(d01 + d10 + dxx) - _expm1(d01) - _expm1(d10)
                )
            else:
                M = jnp.exp(A00) * tail_mask

        levels = [jnp.ones((1, BJ), f32), group_sum(M)]

        R = M
        for _ in range(2, num_levels + 1):
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
            preferred_element_type=f32, precision=lax.Precision.HIGHEST,
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


def fused_first_order_levels(X, X2=None, *, num_levels: int,
                             base: str = "rbf", difference: bool = True,
                             block_i: int = 16, block_j: int = 8,
                             fast_math: bool = True,
                             interpret: bool = False):
    """(num_levels+1, N1, N2) per-level signature kernels, fully fused.

    Args:
      X: (N1, L, d) scaled sequences (float32); X2: (N2, L, d) or None.
      base: 'rbf' | 'linear' (the benchmark-relevant state-space embeddings;
        other bases use the XLA path).
      fast_math: bf16 MXU inputs for the level-recursion matmuls (f32
        accumulation; the increment Gram is always full-f32).
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
    # full accumulator width, 128-aligned
    W = max(128, -(-(nb2 * BJ) // 128) * 128)

    Xf, dXf = _prep_inputs(X, base, difference, lhs=True)
    X2f, dX2f = _prep_inputs(X2, base, difference, lhs=False)
    d_k = Xf.shape[0]

    kernel = functools.partial(
        _kernel, BI=BI, BJ=BJ, L=L_pad, L_true=L, d=d_k,
        num_levels=num_levels, base=base, difference=difference,
        precision=(lax.Precision.DEFAULT if fast_math
                   else lax.Precision.HIGHEST),
    )

    in_spec_i = pl.BlockSpec((d_k, BI * L_pad), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM)
    in_spec_j = pl.BlockSpec((d_k, BJ * L_pad), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM)

    out = pl.pallas_call(
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
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(Xf, dXf, X2f, dX2f)

    return out[:, :N1, :N2]
