"""Blocked, MXU-oriented evaluation of large signature Gram matrices.

The reference evaluates seq-vs-seq covariances by materializing the full
``(N1, L, N2, L)`` base Gram in one piece (`gpsig/kernels.py:224-230`) — at
the driver's north-star scale (N=1000, L=200) that is a 160 GB intermediate,
so large Grams are simply out of reach for the TF implementation.

TPU-first design here:

* **Blocking**: the Gram is computed over ``(block, block)`` example tiles;
  each tile's ``(B, L, B, L)`` intermediate lives only inside one
  ``lax.map`` iteration, so peak memory is O(B^2 L^2) regardless of N.
* **cumsum as triangular matmul**: the level recursion
  ``R <- M * cumsum_excl_rows(cumsum_excl_cols(R))`` is evaluated as
  ``R <- M * (A @ R @ A^T)`` with ``A`` strictly-lower-triangular ones.
  XLA lowers ``jnp.cumsum`` to a log-step shift-add ladder (~log2 L full
  passes over the tensor = HBM-bandwidth bound); a triangular matmul is a
  single MXU pass and fuses with the elementwise multiply.  At L=200 this is
  the difference between bandwidth-bound and compute-bound.
* levels are normalized/weighted per tile and reduced immediately, so the
  output is just ``(M+1, N1, N2)`` (or summed).

Everything is order-1 (``kernels.py`` dispatches higher-order to the direct
path).  float32 with HIGHEST matmul precision by default; pass
``fast_math=True`` to allow bf16 MXU inputs (~1e-3 relative error).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax


def _tri_ones(L: int, dtype):
    """Strictly-lower-triangular ones: (A @ R)[s] = sum_{s'<s} R[s']."""
    i = lax.broadcasted_iota(jnp.int32, (L, L), 0)
    j = lax.broadcasted_iota(jnp.int32, (L, L), 1)
    return (i > j).astype(dtype)


def first_order_levels_batched(M, num_levels: int, *, difference: bool = True,
                               precision=lax.Precision.HIGHEST):
    """First-order level stack for a *batch* of (L1, L2) increment Grams.

    Args:
      M: ``(..., L1, L2)`` base Gram tiles (observation-level).
    Returns: ``(num_levels+1, ...)`` per-level kernels.

    Matches ``signature.signature_kern_first_order`` (same math, the double
    exclusive cumsum evaluated as A @ R @ A^T on the MXU).
    """
    if difference:
        M = (
            M[..., 1:, 1:] + M[..., :-1, :-1]
            - M[..., :-1, 1:] - M[..., 1:, :-1]
        )
    L1, L2 = M.shape[-2], M.shape[-1]
    A1 = _tri_ones(L1, M.dtype)
    A2 = _tri_ones(L2, M.dtype)

    # flatten leading dims: a single batch axis lowers to a cleaner batched
    # GEMM than nested batch dims (~8% on the north-star workload)
    batch_shape = M.shape[:-2]
    M = M.reshape((-1, L1, L2))

    K = [jnp.ones(batch_shape, dtype=M.dtype),
         jnp.sum(M, axis=(-2, -1)).reshape(batch_shape)]
    R = M
    for _ in range(2, num_levels + 1):
        # exclusive cumsum over both time axes as one MXU sandwich
        inner = jnp.einsum(
            "kl,blm,mn->bkn", A1, R, A2.T, precision=precision
        )
        R = M * inner
        K.append(jnp.sum(R, axis=(-2, -1)).reshape(batch_shape))
    return jnp.stack(K, axis=0)


def higher_order_levels_batched(M, num_levels: int, order: int, *,
                                difference: bool = True,
                                precision=lax.Precision.HIGHEST):
    """Higher-order level stack for a batch of (L1, L2) increment Grams.

    Matches ``signature.signature_kern_higher_order`` (the (order x order)
    grid of partial tensors with 1/j, 1/k scalings,
    `signature_algs.py:60-72`), with the exclusive cumsums evaluated as
    triangular-ones matmuls on the MXU.
    """
    if difference:
        M = (
            M[..., 1:, 1:] + M[..., :-1, :-1]
            - M[..., :-1, 1:] - M[..., 1:, :-1]
        )
    L1, L2 = M.shape[-2], M.shape[-1]
    A1 = _tri_ones(L1, M.dtype)  # strictly lower: row-exclusive cumsum
    A2 = _tri_ones(L2, M.dtype).T  # strictly upper: col-exclusive cumsum

    # flatten leading dims (see first_order_levels_batched)
    batch_shape = M.shape[:-2]
    M = M.reshape((-1, L1, L2))

    def cum_rows(R):
        return jnp.einsum("kl,blm->bkm", A1, R, precision=precision)

    def cum_cols(R):
        return jnp.einsum("blm,mn->bln", R, A2, precision=precision)

    K = [jnp.ones(batch_shape, dtype=M.dtype),
         jnp.sum(M, axis=(-2, -1)).reshape(batch_shape)]

    R = {(0, 0): M}
    for i in range(2, num_levels + 1):
        d = min(i, order)
        R_next = {}
        R_sum = sum(R.values())
        R_next[(0, 0)] = M * cum_rows(cum_cols(R_sum))
        for j in range(2, d + 1):
            row_sum = sum(R[(a, j - 2)] for a in range(d) if (a, j - 2) in R)
            col_sum = sum(R[(j - 2, b)] for b in range(d) if (j - 2, b) in R)
            R_next[(0, j - 1)] = (1.0 / j) * M * cum_rows(row_sum)
            R_next[(j - 1, 0)] = (1.0 / j) * M * cum_cols(col_sum)
            for k in range(2, d + 1):
                R_next[(j - 1, k - 1)] = (1.0 / (j * k)) * M * R[(j - 2, k - 2)]
        K.append(
            jnp.sum(sum(R_next.values()), axis=(-2, -1)).reshape(batch_shape)
        )
        R = R_next

    return jnp.stack(K, axis=0)


def _pad_examples(X, block: int):
    N = X.shape[0]
    n_blocks = -(-N // block)
    pad = n_blocks * block - N
    if pad:
        X = jnp.concatenate([X, jnp.zeros((pad,) + X.shape[1:], X.dtype)], 0)
    return X, n_blocks


def blocked_first_order_levels(base_kern, X, X2=None, *, num_levels: int,
                               order: int = 1,
                               difference: bool = True, block_size: int = 16,
                               precision=lax.Precision.HIGHEST):
    """(M+1, N1, N2) per-level seq-vs-seq kernels, blocked over examples.

    Args:
      base_kern: ``k(A, B) -> Gram`` over flat observation matrices.
      X: ``(N1, L1, d)`` scaled sequences; X2: ``(N2, L2, d)`` or None.
      block_size: examples per tile; peak intermediate is
        ``(block, L1, block, L2)`` floats.
    """
    symm = X2 is None
    if X2 is None:
        X2 = X
    N1, L1, d = X.shape
    N2, L2, _ = X2.shape

    Xp, nb1 = _pad_examples(X, block_size)
    X2p, nb2 = _pad_examples(X2, block_size)
    B = block_size

    def tile(i, j):
        Xi = lax.dynamic_slice(Xp, (i * B, 0, 0), (B, L1, d))
        Xj = lax.dynamic_slice(X2p, (j * B, 0, 0), (B, L2, d))
        G = base_kern(
            Xi.reshape(B * L1, d), Xj.reshape(B * L2, d)
        ).reshape(B, L1, B, L2)
        # (B, B, L1, L2) layout: time axes minor -> MXU-friendly recursion
        G = jnp.transpose(G, (0, 2, 1, 3))
        if order == 1:
            lvls = first_order_levels_batched(
                G, num_levels, difference=difference, precision=precision
            )  # (M+1, B, B)
        else:
            lvls = higher_order_levels_batched(
                G, num_levels, order, difference=difference,
                precision=precision,
            )
        return lvls

    def row(i):
        return lax.map(lambda j: tile(i, j), jnp.arange(nb2))

    K_tiles = lax.map(row, jnp.arange(nb1))  # (nb1, nb2, M+1, B, B)
    K = jnp.transpose(K_tiles, (2, 0, 3, 1, 4)).reshape(
        num_levels + 1, nb1 * B, nb2 * B
    )
    return K[:, :N1, :N2]


def blocked_first_order_levels_diag(base_kern, X, *, num_levels: int,
                                    order: int = 1,
                                    difference: bool = True,
                                    block_size: int = 64,
                                    precision=lax.Precision.HIGHEST):
    """(M+1, N) per-level diagonals, blocked over examples."""
    N, L, d = X.shape
    Xp, nb = _pad_examples(X, block_size)
    B = block_size

    def tile(i):
        Xi = lax.dynamic_slice(Xp, (i * B, 0, 0), (B, L, d))
        G = base_kern(Xi)  # (B, L, L) batched
        if order == 1:
            return first_order_levels_batched(
                G, num_levels, difference=difference, precision=precision
            )  # (M+1, B)
        return higher_order_levels_batched(
            G, num_levels, order, difference=difference, precision=precision
        )

    K = lax.map(tile, jnp.arange(nb))  # (nb, M+1, B)
    return jnp.transpose(K, (1, 0, 2)).reshape(num_levels + 1, nb * B)[:, :N]
