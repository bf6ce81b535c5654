"""Sequence parallelism: exact chunked-time signature recursions.

The reference handles long sequences only by host-side mean-pooling to
``max_len`` (`benchmarks/utils/datasets.py:39-46`) or by the approximate
low-rank path.  Here the time axis itself is sharded (SURVEY.md §2.4): the
signature recursions are associative scans over time, so an L-chunked
evaluation only needs small per-level carry states exchanged between chunks.

Key identity (first-order tensor-vs-seq, `signature_algs.py:101-127`): with
time split into chunks c = 0..C-1 and ``R_j`` the slot-j running tensor,

    R_j(t) = M_j(t) * ( carry_{j-1,c} + local_cumsum_excl(R_{j-1})(t) ),
    carry_{j-1,c} = sum of R_{j-1} over all chunks before c,

and the carry for slot j only depends on slot j-1 — so the evaluation is
j-major: for each slot, every chunk computes locally in parallel, then one
small exclusive prefix over the per-chunk sums (an ``all_gather`` of
(num_tensors, N)-sized partials over ICI) provides the carries.  Total
communication: num_slots small collectives, independent of L.

The same structure applies to the seq-vs-seq diagonal (per-example (L, L)
Grams chunked over both time axes is quadratic in chunks; here we shard the
*flattened observation axis* of the Kxx-diag path instead, which is the
training bottleneck for long L).

Implemented with ``shard_map`` over a 1-D ('seq',) mesh axis; collectives
are XLA ``all_gather``/``psum`` riding ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at the top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops.signature import cumsum_exclusive


def _local_tens_vs_seq_levels(M_local, num_levels: int, axis_name: str,
                              order: int = 1):
    """Per-device slice of the tens-vs-seq recursion with carry exchange.

    Any discretization order (VERDICT r4 item 5): the order>1 recursion
    (`signature_algs.py:129-160`) keeps a depth-``min(j+1, order)`` list of
    running partial tensors per slot, but ONLY the leading
    ``cumsum_exclusive(sum(R))`` term couples time chunks — every deeper
    partial is an elementwise product at the same time index, so it stays
    chunk-local.  Communication is therefore identical to order 1: one
    (nT, N)-sized all_gather per slot step, independent of order and L.

    Args:
      M_local: (len_tensors, num_tensors, N, L_local) local *increment*
        Gram slice (already differenced).
    Returns: (num_levels+1, num_tensors, N) — identical on every device.
    """
    nT, Nx = M_local.shape[1], M_local.shape[2]
    dtype = M_local.dtype

    K = [jnp.ones((nT, Nx), dtype=dtype)]
    k = 0
    for i in range(1, num_levels + 1):
        R = [M_local[k]]
        k += 1
        for j in range(1, i):
            dep = min(j + 1, order)
            S = sum(R)
            # exclusive chunk prefix of the previous slot's running sum
            carry = _excl_chunk_prefix(jnp.sum(S, axis=-1), axis_name)
            R_next = [
                M_local[k] * (carry[..., None] + cumsum_exclusive(S, axis=-1))
            ]
            for l in range(1, dep):
                # same-time-index partials: chunk-local, no exchange
                R_next.append((1.0 / (l + 1)) * M_local[k] * R[l - 1])
            R = R_next
            k += 1
        K.append(lax.psum(jnp.sum(sum(R), axis=-1), axis_name))
    return jnp.stack(K, axis=0)


def tens_vs_seq_levels_seq_parallel(mesh: Mesh, M_inc, num_levels: int, *,
                                    axis: str = "seq", order: int = 1):
    """Exact (num_levels+1, nT, N) levels with the time axis sharded.

    Args:
      mesh: mesh containing the ``axis`` dimension (time chunks).
      M_inc: (len_tensors, num_tensors, N, L-1) increment Gram, already
        differenced along time (cf. `signature_algs.py:114`); its last axis
        is sharded over ``axis``.
      order: discretization order (`signature_algs.py:129-160` for >1).
    """
    fn = shard_map(
        functools.partial(
            _local_tens_vs_seq_levels, num_levels=num_levels, axis_name=axis,
            order=order,
        ),
        mesh=mesh,
        in_specs=P(None, None, None, axis),
        out_specs=P(),  # replicated result
    )
    return fn(M_inc)


def _seq_diag_recursion(M_local, num_levels: int, axis_name: str,
                        order: int = 1):
    """Carry-based seq-diag level recursion over a (N, L_s, Lc_t) local
    increment-Gram stripe (s axis full, t axis chunked over ``axis_name``).

    The 2-D recursion needs cumsums over both time axes; the s-axis is local
    (full), the t-axis is chunked with the carry trick, where the carry per
    level is a (N, L) vector (sum over previous chunks' t-columns for every
    s).  ``order`` > 1 runs the (order x order) partial-tensor grid
    (`signature_algs.py:37-74`) with the same per-t-cumsum carry — up to
    ``min(i, order)`` carries per level instead of one."""
    dtype = M_local.dtype
    N = M_local.shape[0]

    def cum_t(A):
        # exclusive cumsum over the chunked t axis: local + chunk carry
        carry = _excl_chunk_prefix(jnp.sum(A, axis=2), axis_name)  # (N, L)
        return carry[:, :, None] + cumsum_exclusive(A, axis=2)

    def cum_s(A):
        return cumsum_exclusive(A, axis=1)  # s axis is full: local

    K = [jnp.ones((N,), dtype=dtype),
         lax.psum(jnp.sum(M_local, axis=(1, 2)), axis_name)]
    # (order x order) grid of running partial tensors with 1/j, 1/k
    # scalings (`signature_algs.py:60-72`); at order 1 the grid is the
    # single (0, 0) cell and this reduces to the original recursion.
    # Only the cum_t legs couple chunks; the elementwise grid interior
    # and the cum_s legs stay local.
    R = {(0, 0): M_local}
    for i in range(2, num_levels + 1):
        d = min(i, order)
        R_sum = sum(R.values())
        R_next = {(0, 0): M_local * cum_s(cum_t(R_sum))}
        for j in range(2, d + 1):
            row_sum = sum(R[(a, j - 2)] for a in range(d) if (a, j - 2) in R)
            col_sum = sum(R[(j - 2, b)] for b in range(d) if (j - 2, b) in R)
            R_next[(0, j - 1)] = (1.0 / j) * M_local * cum_s(row_sum)
            R_next[(j - 1, 0)] = (1.0 / j) * M_local * cum_t(col_sum)
            for k in range(2, d + 1):
                R_next[(j - 1, k - 1)] = (
                    (1.0 / (j * k)) * M_local * R[(j - 2, k - 2)]
                )
        K.append(
            lax.psum(jnp.sum(sum(R_next.values()), axis=(1, 2)), axis_name)
        )
        R = R_next
    return jnp.stack(K, axis=0)


def _local_seq_diag_levels(M_local, num_levels: int, axis_name: str,
                           order: int = 1):
    """Per-device slice of the seq-diag recursion over a pre-materialized
    *increment* Gram stripe (see :func:`_seq_diag_recursion`)."""
    return _seq_diag_recursion(M_local, num_levels, axis_name, order=order)


def seq_diag_levels_seq_parallel(mesh: Mesh, M_inc, num_levels: int, *,
                                 axis: str = "seq", order: int = 1):
    """Exact (num_levels+1, N) per-level diagonals with the second time axis
    sharded over the mesh.

    Args:
      M_inc: (N, L-1, L-1) per-example increment Grams (differenced); the
      LAST axis is sharded over ``axis``.
      order: discretization order (`signature_algs.py:37-74` for >1).
    """
    fn = shard_map(
        functools.partial(
            _local_seq_diag_levels, num_levels=num_levels, axis_name=axis,
            order=order,
        ),
        mesh=mesh,
        in_specs=P(None, None, axis),
        out_specs=P(),
    )
    return fn(M_inc)


def _excl_chunk_prefix(chunk_sum, axis_name: str):
    """Exclusive prefix over mesh chunks of per-chunk partial sums.

    chunk_sum: this device's partial (any shape); returns the sum of the
    partials of all chunks *before* this one along ``axis_name`` (an
    ``all_gather`` of the small partials over ICI + a masked reduce)."""
    idx = lax.axis_index(axis_name)
    n_chunks = lax.axis_size(axis_name)
    gathered = lax.all_gather(chunk_sum, axis_name)  # (C, ...)
    mask = (jnp.arange(n_chunks) < idx).astype(chunk_sum.dtype)
    mask = mask.reshape((n_chunks,) + (1,) * chunk_sum.ndim)
    return jnp.sum(gathered * mask, axis=0)


def _local_seq_cross_levels(M_local, num_levels: int, ax_s: str, ax_t: str,
                            order: int = 1):
    """Per-device block of the full seq-vs-seq cross-Gram recursion with
    BOTH time axes chunked (the §3.2 hot loop, `signature_algs.py:8-35`).

    M_local: (N1, Ls_loc, N2, Lt_loc) block of the *increment* Gram; device
    (a, b) on the ('ax_s', 'ax_t') mesh owns s-chunk a and t-chunk b.

    Per level the exclusive cumsums decompose into local cumsums plus
    carry states:

      * carry_t: (N1, Ls_loc, N2) exclusive prefix (over t-chunks) of the
        t-sums of R — exchanged along ``ax_t``;
      * carry_s: (N1, N2, Lt_loc) exclusive prefix (over s-chunks) of the
        s-sums — exchanged along ``ax_s``.

    Both carries are L-chunk-local slabs, so communication per level is a
    handful of small all_gathers + the final psum — independent of the full
    L1*L2.  ``order`` > 1 runs the (order x order) partial-tensor grid
    (`signature_algs.py:60-72`); the grid interior is elementwise at the
    same (s, t) index so it adds no communication, and the single-axis
    cumsum legs carry along their one chunked axis only.
    """
    dtype = M_local.dtype
    N1, _, N2, _ = M_local.shape

    def cum_t(A):
        carry = _excl_chunk_prefix(jnp.sum(A, axis=3), ax_t)
        return carry[..., None] + cumsum_exclusive(A, axis=3)

    def cum_s(A):
        carry = _excl_chunk_prefix(jnp.sum(A, axis=1), ax_s)
        return carry[:, None, :, :] + cumsum_exclusive(A, axis=1)

    K = [jnp.ones((N1, N2), dtype=dtype),
         lax.psum(jnp.sum(M_local, axis=(1, 3)), (ax_s, ax_t))]
    R = {(0, 0): M_local}
    for i in range(2, num_levels + 1):
        d = min(i, order)
        R_sum = sum(R.values())
        R_next = {(0, 0): M_local * cum_s(cum_t(R_sum))}
        for j in range(2, d + 1):
            row_sum = sum(R[(a, j - 2)] for a in range(d) if (a, j - 2) in R)
            col_sum = sum(R[(j - 2, b)] for b in range(d) if (j - 2, b) in R)
            R_next[(0, j - 1)] = (1.0 / j) * M_local * cum_s(row_sum)
            R_next[(j - 1, 0)] = (1.0 / j) * M_local * cum_t(col_sum)
            for k in range(2, d + 1):
                R_next[(j - 1, k - 1)] = (
                    (1.0 / (j * k)) * M_local * R[(j - 2, k - 2)]
                )
        K.append(
            lax.psum(jnp.sum(sum(R_next.values()), axis=(1, 3)),
                     (ax_s, ax_t))
        )
        R = R_next
    return jnp.stack(K, axis=0)


def seq_cross_levels_seq_parallel(mesh: Mesh, M_inc, num_levels: int, *,
                                  axes: tuple[str, str] = ("seq1", "seq2"),
                                  order: int = 1):
    """Exact (num_levels+1, N1, N2) seq-vs-seq per-level kernels with both
    time axes sharded over a 2-D mesh (SURVEY §2.4 SP row: the time-axis
    cumsum recursion is an associative scan; chunk L across devices and
    carry per-chunk prefix states over ICI — exact, not approximate).

    Args:
      mesh: mesh containing both ``axes`` dimensions.
      M_inc: (N1, L1-1, N2, L2-1) increment Gram (already differenced,
        `signature_algs.py:26`); axes 1 and 3 sharded over ``axes``.
      order: discretization order (`signature_algs.py:37-74` for >1).
    """
    ax_s, ax_t = axes
    fn = shard_map(
        functools.partial(
            _local_seq_cross_levels, num_levels=num_levels,
            ax_s=ax_s, ax_t=ax_t, order=order,
        ),
        mesh=mesh,
        in_specs=P(None, ax_s, None, ax_t),
        out_specs=P(),
    )
    return fn(M_inc)


# ---------------------------------------------------------------------------
# sequences-in sequence parallelism (no global Gram is ever materialized)
#
# The entry points above take pre-materialized increment Grams — useful for
# testing the carry algebra, but the memory story of SP (L beyond one chip's
# HBM) needs each device to build its own Gram *stripe* locally from
# time-sharded sequences.  The functions below take ``(N, L, d)`` sequences
# whose time axis is sharded over the mesh; inside ``shard_map`` each device
#
#   1. all_gathers the (tiny, O(N L d)) sequences along its time axis,
#   2. repeat-pads the last observation (signature-invariant: zero
#      increments, `preprocessing.py:23-25` trick),
#   3. slices its own (Lc+1)-point window and computes the increment-Gram
#      stripe with the cancellation-free closed forms
#      (``ops/gram.increment_gram_pair_fn``) or a generic base kernel,
#   4. runs the carry recursions — so no device ever holds more than its
#      L/C stripe of any Gram.
#
# Requires difference=True (the reference benchmarks' default); any
# discretization order (the order>1 recursions add only chunk-local work).
# ---------------------------------------------------------------------------


def _pad_last(X):
    """Repeat the last observation once: (N, L, d) -> (N, L+1, d)."""
    return jnp.concatenate([X, X[:, -1:]], axis=1)


def pad_sequences_to_chunks(X, n_chunks: int):
    """Host/jit helper: repeat-last pad the time axis to a multiple of
    ``n_chunks`` (exactly signature-invariant)."""
    L = X.shape[1]
    target = -(-L // n_chunks) * n_chunks
    if target == L:
        return X
    return jnp.concatenate(
        [X, jnp.repeat(X[:, -1:], target - L, axis=1)], axis=1
    )


def make_pair_increment_fn(base: str, base_kern=None,
                           precision=None, params=None):
    """``f(Xa_pts, Xb_pts) -> (N, La-1, Lb-1)`` per-example increment Grams.

    Uses the cancellation-free closed form when ``base`` has one
    (`ops/gram.py`; ``params`` — the constrained dict — unlocks the
    param-dependent mix/poly forms), otherwise falls back to evaluating
    ``base_kern`` on the points and second-differencing (exact in f64)."""
    from ..ops import gram as gram_ops

    precision = precision or lax.Precision.HIGHEST
    pf = gram_ops.increment_gram_pair_fn(base, params)
    if pf is not None:
        return functools.partial(pf, precision=precision)
    if base_kern is None:
        raise ValueError(
            f"base {base!r} has no closed-form increment Gram; pass "
            "base_kern for the generic second-difference fallback"
        )

    def generic(Xa, Xb):
        M = base_kern(Xa, Xb)  # (N, La, Lb), batched over examples
        return (
            M[:, 1:, 1:] + M[:, :-1, :-1] - M[:, :-1, 1:] - M[:, 1:, :-1]
        )

    return generic


def make_pair_cross_fn(base: str, base_kern=None, precision=None,
                       params=None):
    """``f(Xa_pts, Xb_pts) -> (N1, N2, La-1, Lb-1)`` outer increment Grams
    (the cross-example analogue of :func:`make_pair_increment_fn`): the
    cancellation-free closed form when ``base`` has one, else second
    differences of ``base_kern`` over broadcast example axes."""
    from ..ops import gram as gram_ops

    precision = precision or lax.Precision.HIGHEST
    cross_fn, _ = gram_ops.increment_gram_fns(base, params)
    if cross_fn is not None:
        return functools.partial(cross_fn, precision=precision)
    if base_kern is None:
        raise ValueError(
            f"base {base!r} has no closed-form increment Gram; pass "
            "base_kern for the generic second-difference fallback"
        )

    def generic(Xa, Xb):
        M = base_kern(Xa[:, None], Xb[None, :])  # (N1, N2, La, Lb)
        return (
            M[..., 1:, 1:] + M[..., :-1, :-1]
            - M[..., :-1, 1:] - M[..., 1:, :-1]
        )

    return generic


def _local_window(X_local, axis_name: str):
    """All-gather the time-sharded sequences and slice this device's
    (Lc+1)-point window (its Lc increments, incl. the bridge to the next
    chunk; the global last increment is the zero repeat-pad).

    Returns (X_pad, pts): the full repeat-padded (N, L+1, d) sequences and
    the local (N, Lc+1, d) window."""
    idx = lax.axis_index(axis_name)
    Lc = X_local.shape[1]
    X_full = lax.all_gather(X_local, axis_name, axis=1, tiled=True)
    X_pad = _pad_last(X_full)  # (N, L+1, d)
    pts = lax.dynamic_slice_in_dim(X_pad, idx * Lc, Lc + 1, axis=1)
    return X_pad, pts


def seq_diag_levels_from_sequences(mesh: Mesh, X, num_levels: int, *,
                                   pair_fn, axis: str = "seq",
                                   order: int = 1):
    """Exact (num_levels+1, N) per-level diagonals from time-sharded
    sequences; no device materializes more than a (N, L, L/C) Gram stripe.

    Args:
      X: (N, L, d) scaled sequences, time axis sharded over ``axis``
        (L must be a multiple of the axis size; use
        :func:`pad_sequences_to_chunks`).
      pair_fn: from :func:`make_pair_increment_fn`.
      order: discretization order.
    """

    def local(X_local):
        X_pad, pts = _local_window(X_local, axis)
        # (N, L, Lc) stripe: full s-increments x local t-increments
        M_local = pair_fn(X_pad, pts)
        return _seq_diag_recursion(M_local, num_levels, axis, order=order)

    return shard_map(
        local, mesh=mesh, in_specs=P(None, axis, None), out_specs=P()
    )(X)


def seq_cross_levels_from_sequences(mesh: Mesh, X, X2, num_levels: int, *,
                                    pair_cross_fn,
                                    axes: tuple[str, str] = ("seq1", "seq2"),
                                    order: int = 1):
    """Exact (num_levels+1, N1, N2) seq-vs-seq per-level kernels from
    sequences with both time axes sharded over a 2-D time mesh; device
    (a, b) builds only its (N1, L1/C1, N2, L2/C2) increment-Gram block.

    Args:
      X: (N1, L1, d) sharded over ``axes[0]``; X2: (N2, L2, d) over
        ``axes[1]`` (lengths multiples of the respective axis sizes).
      pair_cross_fn: ``f(Xa_pts, Xb_pts) -> (N1, N2, La-1, Lb-1)`` outer
        increment Gram (``ops.gram.increment_gram_fns(base)[0]`` closed
        form, or a generic base-kernel fallback).
    """
    ax_s, ax_t = axes

    def local(X_local, X2_local):
        _, pts1 = _local_window(X_local, ax_s)
        _, pts2 = _local_window(X2_local, ax_t)
        M_block = pair_cross_fn(pts1, pts2)  # (N1, N2, Ls, Lt)
        M_local = jnp.transpose(M_block, (0, 2, 1, 3))
        return _local_seq_cross_levels(
            M_local, num_levels=num_levels, ax_s=ax_s, ax_t=ax_t, order=order
        )

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, ax_s, None), P(None, ax_t, None)),
        out_specs=P(),
    )(X, X2)


def seq_vs_seq_covs_from_sequences(mesh: Mesh, Z, X, num_levels: int, *,
                                   pair_cross_fn, diag_pair_fn,
                                   axes: tuple[str, str],
                                   batch_axis: str | None = None,
                                   order: int = 1):
    """One-sided SP covariances for inducing *sequences*: short Z sequences
    (time axis on the size-1 ``axes[0]`` mesh axis — effectively local) vs
    long X sequences time-sharded over ``axes[1]``, plus X's per-level
    diagonals, sharing ONE gathered copy of X per device.

    ``batch_axis`` optionally shards X's example axis too (DP x SP for the
    sequences family): each data shard runs the time-carry collectives
    along ``axes[1]`` independently and the outputs stay example-sharded.

    Returns (Kzx_lvls (M+1, N1, N2), Kxx_diag_lvls (M+1, N2))."""
    ax_s, ax_t = axes

    def local(Z_loc, X_local):
        _, pts1 = _local_window(Z_loc, ax_s)   # identity gather (size 1)
        X_pad, pts2 = _local_window(X_local, ax_t)
        M_block = pair_cross_fn(pts1, pts2)    # (N1, N2, lz, Lc)
        M_local = jnp.transpose(M_block, (0, 2, 1, 3))
        cross = _local_seq_cross_levels(
            M_local, num_levels=num_levels, ax_s=ax_s, ax_t=ax_t, order=order
        )
        M_diag = diag_pair_fn(X_pad, pts2)     # (N2, L, Lc)
        diag = _seq_diag_recursion(M_diag, num_levels, ax_t, order=order)
        return cross, diag

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, ax_s, None), P(batch_axis, ax_t, None)),
        out_specs=(P(None, None, batch_axis), P(None, batch_axis)),
    )(Z, X)


def tens_n_seq_levels_from_sequences(mesh: Mesh, base_kern, Z, X,
                                     num_levels: int, *,
                                     increments: bool, diag_pair_fn=None,
                                     axis: str = "seq",
                                     batch_axis: str | None = None,
                                     z_axis: str | None = None,
                                     order: int = 1):
    """Fused SP evaluation of the SVGP hot path from time-sharded sequences:
    (Kzx_lvls (M+1, nT, N), Kxx_diag_lvls (M+1, N)) — the two covariances
    `K_tens_n_seq_covs` needs (`kernels.py:590-671`), sharing one gathered
    copy of the sequences, with every Gram built stripe-locally.

    Args:
      base_kern: ``k(A, B) -> Gram`` over flat/batched observation arrays.
      Z: (len_tensors, nT, [2,] d) scaled inducing tensors (replicated).
      X: (N, L, d) scaled sequences, time axis sharded over ``axis``.
      increments: Z carries (pre, post) pairs whose difference is used.
      diag_pair_fn: from :func:`make_pair_increment_fn`; None skips the
        diagonal leg (returns None in its place).
      batch_axis: optional mesh axis carrying the example (N) dimension —
        the DP x SP composition (VERDICT r3 item 4): each device computes
        its N/|batch| stripe of Kzx / Kxx-diag, the time-carry collectives
        run per data-shard along ``axis``, and the outputs stay sharded
        over ``batch_axis`` for the downstream (GSPMD) conditional.
      z_axis: optional mesh axis carrying the inducing (nT) dimension —
        the TP leg of the full DP x TP x SP composition (VERDICT r4
        item 6): each device computes its nT/|model| stripe of Kzx against
        its time stripe (the slot recursion is independent across tensors,
        so no collectives are added; time carries still run along
        ``axis`` per (data, model) shard) and Kzx stays inducing-sharded
        for the downstream whitened conditional.
    """
    lt, nT = Z.shape[0], Z.shape[1]
    d = Z.shape[-1]

    def local(Z_loc, X_local):
        N = X_local.shape[0]
        nT_loc = Z_loc.shape[1]
        X_pad, pts = _local_window(X_local, axis)
        Lp = pts.shape[1]  # Lc + 1
        flat = pts.reshape(N * Lp, d)
        if increments:
            M = base_kern(
                Z_loc.reshape(lt * nT_loc * 2, d), flat
            ).reshape(lt, nT_loc, 2, N, Lp)
            M = M[:, :, 1] - M[:, :, 0]
        else:
            M = base_kern(
                Z_loc.reshape(lt * nT_loc, d), flat
            ).reshape(lt, nT_loc, N, Lp)
        M = M[..., 1:] - M[..., :-1]  # t-difference: (lt, nT_loc, N, Lc)
        Kzx = _local_tens_vs_seq_levels(M, num_levels=num_levels,
                                        axis_name=axis, order=order)
        if diag_pair_fn is None:
            return Kzx
        M_diag = diag_pair_fn(X_pad, pts)  # (N, L, Lc)
        Kxx = _seq_diag_recursion(M_diag, num_levels, axis, order=order)
        return Kzx, Kxx

    z_spec = P(*([None, z_axis] + [None] * (Z.ndim - 2)))
    zx_spec = P(None, z_axis, batch_axis)
    diag_spec = P(None, batch_axis)
    out_specs = zx_spec if diag_pair_fn is None else (zx_spec, diag_spec)
    return shard_map(
        local, mesh=mesh,
        in_specs=(z_spec, P(batch_axis, axis, None)), out_specs=out_specs,
    )(Z, X)


# ---------------------------------------------------------------------------
# kernel / model layer wiring (long-L Kdiag / K / SVGP covariances over SP)
# ---------------------------------------------------------------------------


def _check_sp_kernel(kern):
    # any order is supported (VERDICT r4 item 5): the order>1 partial-
    # tensor grids/lists add only chunk-local elementwise work — the
    # cross-chunk carry structure (one small all_gather per cumsum leg)
    # is unchanged, so the comm cost stays independent of order.
    if not kern.difference:
        raise NotImplementedError("sequence parallelism requires difference")
    if kern.low_rank:
        raise NotImplementedError(
            "use the low-rank path directly for approximate long-L"
        )
    # num_lags IS supported: lag interpolation is a per-time-point feature
    # map applied by `_scale_sequences` OUTSIDE shard_map, where GSPMD
    # inserts the (tiny, O(N L d)) cross-chunk gather automatically — the
    # carry recursions then see an ordinary (N, L, (lags+1)d) sequence.
    # This unlocks the reference's flagship config (num_lags=1,
    # `benchmarks/run_gpsig_benchmarks.py:32-33`) on the long-L path
    # (VERDICT r3 item 3).


def kernel_seq_diag_sp(kern, params, mesh, X, *, axis: str = "seq",
                       return_levels: bool = False):
    """SP evaluation of the *unnormalized* per-level diagonals
    (`SignatureKernel._K_seq_diag`) from time-sharded sequences, scaled by
    sigma * variances — the long-L ``Kdiag(normalization=False)``."""
    _check_sp_kernel(kern)
    cp = kern.constrain(params)
    Xs = kern._scale_sequences(cp, X)
    pair_fn = make_pair_increment_fn(kern.base, kern._base_kern(cp),
                                     params=cp)
    lvls = seq_diag_levels_from_sequences(
        mesh, Xs, kern.num_levels, pair_fn=pair_fn, axis=axis,
        order=kern.order,
    )
    lvls = kern._level_scale(cp, lvls)
    return lvls if return_levels else jnp.sum(lvls, axis=0)


def kernel_K_sp(kern, params, mesh, X, X2=None, *,
                axes: tuple[str, str] = ("seq1", "seq2"),
                return_levels: bool = False):
    """SP evaluation of the full normalized Gram ``SignatureKernel.K`` with
    both time axes sharded over a 2-D time mesh — the §3.2 hot loop at L
    beyond one chip's HBM (each device only ever holds its
    (N1, L1/C1, N2, L2/C2) increment-Gram block)."""
    from .. import config as cfg

    _check_sp_kernel(kern)
    cp = kern.constrain(params)
    jitter = cfg.jitter()
    Xs = kern._scale_sequences(cp, X)
    base_kern = kern._base_kern(cp)
    pair_cross = make_pair_cross_fn(kern.base, base_kern, params=cp)

    symm = X2 is None
    X2s = Xs if symm else kern._scale_sequences(cp, X2)
    K_lvls = seq_cross_levels_from_sequences(
        mesh, Xs, X2s, kern.num_levels, pair_cross_fn=pair_cross, axes=axes,
        order=kern.order,
    )
    if kern.normalization:
        if symm:
            K_lvls = K_lvls + jitter * jnp.eye(
                K_lvls.shape[1], dtype=K_lvls.dtype
            )[None]
            d1s = jnp.sqrt(jnp.diagonal(K_lvls, axis1=-2, axis2=-1))
            d2s = d1s
        else:
            pair_fn = make_pair_increment_fn(kern.base, base_kern,
                                             params=cp)
            d1 = seq_diag_levels_from_sequences(
                mesh, Xs, kern.num_levels, pair_fn=pair_fn, axis=axes[0],
                order=kern.order,
            )
            d2 = seq_diag_levels_from_sequences(
                mesh, X2s, kern.num_levels, pair_fn=pair_fn, axis=axes[1],
                order=kern.order,
            )
            d1s = jnp.sqrt(d1 + jitter)
            d2s = jnp.sqrt(d2 + jitter)
        K_lvls = K_lvls / (d1s[:, :, None] * d2s[:, None, :])
    K_lvls = kern._level_scale(cp, K_lvls)
    return K_lvls if return_levels else jnp.sum(K_lvls, axis=0)


def kernel_tens_n_seq_covs_sp(kern, params, mesh, Z, X, *,
                              increments: bool = False, axis: str = "seq",
                              batch_axis: str | None = None,
                              z_axis: str | None = None,
                              full_X_cov: bool = False,
                              return_levels: bool = False):
    """SP equivalent of ``SignatureKernel.K_tens_n_seq_covs``:
    (Kzz_lvls, Kzx_lvls, Kxx_lvls) with X time-sharded and every
    sequence-sized Gram built stripe-locally inside shard_map.

    ``batch_axis`` additionally shards the example axis (DP x SP);
    ``full_X_cov`` returns the full (N, N) normalized Kxx per level
    (mirroring `kernels.py` `K_tens_n_seq_covs(full_X_cov=True)`) computed
    over an internal (1, C) time mesh — mutually exclusive with
    ``batch_axis`` (the full posterior covariance is an O(N^2) object one
    asks for at prediction time, not on a DP training step)."""
    from .. import config as cfg

    _check_sp_kernel(kern)
    if full_X_cov and batch_axis is not None:
        raise NotImplementedError("full_X_cov with a sharded example axis")
    cp = kern.constrain(params)
    jitter = cfg.jitter()
    Z = kern._scale_tensors(cp, jnp.asarray(Z), increments)
    Xs = kern._scale_sequences(cp, X)
    base_kern = kern._base_kern(cp)
    N = X.shape[0]

    Kzz_lvls = kern._K_tens(cp, Z, increments)
    sig_var = cp["sigma"] * cp["variances"]

    if full_X_cov:
        Kzx_lvls = tens_n_seq_levels_from_sequences(
            mesh, base_kern, Z, Xs, kern.num_levels,
            increments=increments, diag_pair_fn=None, axis=axis,
            order=kern.order,
        )
        # full (N, N) per-level Gram, stripe-local over a (1, C) time mesh
        # (the s-side copy of X gathers fully; blocks are (N, L, N, L/C))
        mesh2 = Mesh(mesh.devices.reshape(1, -1), ("_xs", axis))
        Kxx_lvls = seq_cross_levels_from_sequences(
            mesh2, Xs, Xs, kern.num_levels,
            pair_cross_fn=make_pair_cross_fn(kern.base, base_kern,
                                             params=cp),
            axes=("_xs", axis), order=kern.order,
        )
        if kern.normalization:
            Kxx_lvls = Kxx_lvls + jitter * jnp.eye(
                N, dtype=Kxx_lvls.dtype
            )[None]
            diag_sqrt = jnp.sqrt(jnp.diagonal(Kxx_lvls, axis1=-2, axis2=-1))
            Kxx_lvls = Kxx_lvls / (
                diag_sqrt[:, :, None] * diag_sqrt[:, None, :]
            )
            Kzx_lvls = Kzx_lvls / diag_sqrt[:, None, :]
        out = (
            kern._level_scale(cp, Kzz_lvls),
            kern._level_scale(cp, Kzx_lvls),
            kern._level_scale(cp, Kxx_lvls),
        )
        if return_levels:
            return out
        return tuple(jnp.sum(o, axis=0) for o in out)

    # the diag leg rides the same gathered sequences / increment stripes as
    # Kzx in BOTH branches: normalized runs need it for the rsqrt coupling,
    # unnormalized runs return it level-scaled — never a second shard_map
    Kzx_lvls, Kxx_diag = tens_n_seq_levels_from_sequences(
        mesh, base_kern, Z, Xs, kern.num_levels,
        increments=increments,
        diag_pair_fn=make_pair_increment_fn(kern.base, base_kern,
                                            params=cp),
        axis=axis, batch_axis=batch_axis, z_axis=z_axis,
        order=kern.order,
    )

    if kern.normalization:
        diag_sqrt = jnp.sqrt(Kxx_diag + jitter)
        Kzx_lvls = Kzx_lvls / diag_sqrt[:, None, :]
        Kxx_diag = jnp.tile(sig_var[:, None].astype(Kzx_lvls.dtype), (1, N))
    else:
        Kxx_diag = kern._level_scale(cp, Kxx_diag)
    out = (
        kern._level_scale(cp, Kzz_lvls),
        kern._level_scale(cp, Kzx_lvls),
        Kxx_diag,
    )
    if return_levels:
        return out
    return tuple(jnp.sum(o, axis=0) for o in out)


def kernel_seq_n_seq_covs_sp(kern, params, mesh, Z, X, *,
                             axis: str = "seq",
                             batch_axis: str | None = None,
                             full_X2_cov: bool = False,
                             return_levels: bool = False):
    """SP equivalent of ``SignatureKernel.K_seq_n_seq_covs`` (diag Kxx leg):
    (Kzz_lvls, Kzx_lvls, Kxx_diag_lvls) for inducing *sequences* Z with the
    data sequences X time-sharded.  Z is short (the reference's
    ``len_inducing`` ~ 5-20, `inducing_variables.py:89-98`) and evaluates
    locally; only X-sized work is distributed — the Kzx recursion carries
    prefix states over X's chunks on an internal (1, C) time mesh built
    from ``mesh``'s devices."""
    from .. import config as cfg

    _check_sp_kernel(kern)
    if full_X2_cov and batch_axis is not None:
        raise NotImplementedError("full_X2_cov with a sharded example axis")
    cp = kern.constrain(params)
    jitter = cfg.jitter()
    Zs = kern._scale_sequences(cp, jnp.asarray(Z))
    Xs = kern._scale_sequences(cp, X)
    base_kern = kern._base_kern(cp)
    N1, N2 = Zs.shape[0], Xs.shape[0]

    pair_cross = make_pair_cross_fn(kern.base, base_kern, params=cp)
    if batch_axis is None:
        mesh2 = Mesh(mesh.devices.reshape(1, -1), ("_zt", axis))
    else:
        # DP x SP: keep the caller's ('data', 'seq') layout and stack the
        # size-1 Z-time axis in front of it
        mesh2 = Mesh(
            mesh.devices.reshape((1,) + mesh.devices.shape),
            ("_zt",) + tuple(mesh.axis_names),
        )
    Kzx_lvls, Kxx_diag = seq_vs_seq_covs_from_sequences(
        mesh2, Zs, Xs, kern.num_levels, pair_cross_fn=pair_cross,
        diag_pair_fn=make_pair_increment_fn(kern.base, base_kern,
                                            params=cp),
        axes=("_zt", axis), batch_axis=batch_axis, order=kern.order,
    )

    Kzz_lvls = kern._K_seq(cp, Zs)
    sig_var = cp["sigma"] * cp["variances"]
    if kern.normalization:
        # mirrors `K_seq_n_seq_covs` (`kernels.py:848-879`): Z side gets
        # the +jitter*I diagonal semantics, X side the diag+jitter rsqrt
        Kzz_lvls = Kzz_lvls + jitter * jnp.eye(N1, dtype=Kzz_lvls.dtype)[None]
        dz = jnp.sqrt(jnp.diagonal(Kzz_lvls, axis1=-2, axis2=-1))
        Kzz_lvls = Kzz_lvls / (dz[:, :, None] * dz[:, None, :])
        Kzx_lvls = Kzx_lvls / dz[:, :, None]

    if full_X2_cov:
        # full (N2, N2) per-level Gram of the long sequences, stripe-local
        # over the same (1, C) time mesh (reference `kernels.py:877-891`'s
        # full_X2_cov branch — broken upstream, correct here)
        Kx2_lvls = seq_cross_levels_from_sequences(
            mesh2, Xs, Xs, kern.num_levels, pair_cross_fn=pair_cross,
            axes=("_zt", axis), order=kern.order,
        )
        if kern.normalization:
            Kx2_lvls = Kx2_lvls + jitter * jnp.eye(
                N2, dtype=Kx2_lvls.dtype
            )[None]
            dx = jnp.sqrt(jnp.diagonal(Kx2_lvls, axis1=-2, axis2=-1))
            Kx2_lvls = Kx2_lvls / (dx[:, :, None] * dx[:, None, :])
            Kzx_lvls = Kzx_lvls / dx[:, None, :]
        out = (
            kern._level_scale(cp, Kzz_lvls),
            kern._level_scale(cp, Kzx_lvls),
            kern._level_scale(cp, Kx2_lvls),
        )
        if return_levels:
            return out
        return tuple(jnp.sum(o, axis=0) for o in out)

    if kern.normalization:
        dx = jnp.sqrt(Kxx_diag + jitter)
        Kzx_lvls = Kzx_lvls / dx[:, None, :]
        Kxx_diag = jnp.tile(sig_var[:, None].astype(Kzx_lvls.dtype), (1, N2))
    else:
        Kxx_diag = kern._level_scale(cp, Kxx_diag)
    out = (
        kern._level_scale(cp, Kzz_lvls),
        kern._level_scale(cp, Kzx_lvls),
        Kxx_diag,
    )
    if return_levels:
        return out
    return tuple(jnp.sum(o, axis=0) for o in out)


class _SPInducing:
    """Shared SP inducing-variable wrapper: metadata delegates to the
    wrapped single-device object; ``Kuu_Kuf_Kff`` runs the subclass's SP
    covariance call and applies the same learn_weights mixing / jitter
    postlude as `gpsig_tpu/inducing.py`'s fused calls."""

    def __init__(self, base, mesh: Mesh, axis: str):
        self._base = base
        self.mesh = mesh
        self.axis = axis
        self.num_levels = base.num_levels
        self.learn_weights = base.learn_weights

    def __len__(self):
        return len(self._base)

    def init_params(self, dtype=None) -> dict:
        return self._base.init_params(dtype=dtype)

    def Kuu(self, ind_params, kern, kern_params, *, jitter=0.0, key=None):
        return self._base.Kuu(
            ind_params, kern, kern_params, jitter=jitter, key=key
        )

    def _sp_cov_levels(self, ind_params, kern, kern_params, X,
                       full_f_cov: bool = False):
        raise NotImplementedError

    def Kuu_Kuf_Kff(self, ind_params, kern, kern_params, X, *, jitter=0.0,
                    full_f_cov: bool = False, key=None):
        from ..inducing import _mix_cross, _mix_gram

        Kzz_lvls, Kzx_lvls, Kxx_lvls = self._sp_cov_levels(
            ind_params, kern, kern_params, X, full_f_cov
        )
        if self.learn_weights:
            Kzz = _mix_gram(ind_params["W"], Kzz_lvls)
            Kzx = _mix_cross(ind_params["W"], Kzx_lvls)
        else:
            Kzz = jnp.sum(Kzz_lvls, axis=0)
            Kzx = jnp.sum(Kzx_lvls, axis=0)
        Kxx = jnp.sum(Kxx_lvls, axis=0)
        Kzz = Kzz + jitter * jnp.eye(len(self), dtype=Kzz.dtype)
        if full_f_cov:
            Kxx = Kxx + jitter * jnp.eye(Kxx.shape[-1], dtype=Kxx.dtype)
        else:
            Kxx = Kxx + jitter
        return Kzz, Kzx, Kxx


class SPInducingTensors(_SPInducing):
    """Drop-in ``InducingTensors`` replacement whose fused covariance call
    runs the sequences-in sequence-parallel path — plugging long-L training
    into the unchanged :class:`gpsig_tpu.models.SVGP` (feed it X sharded
    ``P(None, axis, None)`` over ``mesh``).

    VERDICT round-2 item 1: "route long-L Kdiag/K and the SVGP Kxx-diag
    path through [sequences-in SP]".
    """

    def __init__(self, Z, num_levels: int, mesh: Mesh, *,
                 increments: bool = False, learn_weights: bool = False,
                 axis: str = "seq", batch_axis: str | None = None,
                 z_axis: str | None = None):
        from ..inducing import InducingTensors

        super().__init__(
            InducingTensors(Z, num_levels, increments=increments,
                            learn_weights=learn_weights),
            mesh, axis,
        )
        self.increments = self._base.increments
        # DP x SP: the mesh axis carrying the example dimension (the
        # training step is batch sharded AND time sharded)
        self.batch_axis = batch_axis
        # DP x TP x SP: the mesh axis carrying the inducing dimension
        # (shard Z/q_mu rows over it via `parallel.param_shardings`)
        self.z_axis = z_axis

    def _sp_cov_levels(self, ind_params, kern, kern_params, X,
                       full_f_cov: bool = False):
        return kernel_tens_n_seq_covs_sp(
            kern, kern_params, self.mesh, ind_params["Z"], X,
            increments=self.increments, axis=self.axis,
            batch_axis=self.batch_axis, z_axis=self.z_axis,
            full_X_cov=full_f_cov,
            return_levels=True,
        )


class SPInducingSequences(_SPInducing):
    """Drop-in ``InducingSequences`` replacement for long-L training: the
    Kzx/Kff covariances run the sequences-in sequence-parallel path
    (:func:`kernel_seq_n_seq_covs_sp`) while the short inducing sequences
    evaluate locally.  Feed :class:`gpsig_tpu.models.SVGP` X sharded
    ``P(None, axis, None)`` over ``mesh``."""

    def __init__(self, Z, num_levels: int, mesh: Mesh, *,
                 learn_weights: bool = False, axis: str = "seq",
                 batch_axis: str | None = None):
        from ..inducing import InducingSequences

        super().__init__(
            InducingSequences(Z, num_levels, learn_weights=learn_weights),
            mesh, axis,
        )
        self.len_inducing = self._base.len_inducing
        # DP x SP: the mesh axis carrying the example dimension
        self.batch_axis = batch_axis

    def _sp_cov_levels(self, ind_params, kern, kern_params, X,
                       full_f_cov: bool = False):
        return kernel_seq_n_seq_covs_sp(
            kern, kern_params, self.mesh, ind_params["Z"], X,
            axis=self.axis, batch_axis=self.batch_axis,
            full_X2_cov=full_f_cov, return_levels=True,
        )
