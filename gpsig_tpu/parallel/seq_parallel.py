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


def _local_tens_vs_seq_levels(M_local, num_levels: int, axis_name: str):
    """Per-device slice of the tens-vs-seq recursion with carry exchange.

    Args:
      M_local: (len_tensors, num_tensors, N, L_local) local *increment*
        Gram slice (already differenced).
    Returns: (num_levels+1, num_tensors, N) — identical on every device.
    """
    nT, Nx = M_local.shape[1], M_local.shape[2]
    dtype = M_local.dtype
    idx = lax.axis_index(axis_name)
    n_chunks = lax.axis_size(axis_name)

    K = [jnp.ones((nT, Nx), dtype=dtype)]
    k = 0
    for i in range(1, num_levels + 1):
        R = M_local[k]
        k += 1
        for _ in range(1, i):
            # chunk sums of the previous slot's running tensor
            local_sum = jnp.sum(R, axis=-1)  # (nT, N)
            all_sums = lax.all_gather(local_sum, axis_name)  # (C, nT, N)
            mask = (
                jnp.arange(n_chunks) < idx
            ).astype(dtype)[:, None, None]
            carry = jnp.sum(all_sums * mask, axis=0)  # exclusive prefix
            R = M_local[k] * (carry[..., None] + cumsum_exclusive(R, axis=-1))
            k += 1
        K.append(lax.psum(jnp.sum(R, axis=-1), axis_name))
    return jnp.stack(K, axis=0)


def tens_vs_seq_levels_seq_parallel(mesh: Mesh, M_inc, num_levels: int, *,
                                    axis: str = "seq"):
    """Exact (num_levels+1, nT, N) levels with the time axis sharded.

    Args:
      mesh: mesh containing the ``axis`` dimension (time chunks).
      M_inc: (len_tensors, num_tensors, N, L-1) increment Gram, already
        differenced along time (cf. `signature_algs.py:114`); its last axis
        is sharded over ``axis``.
    """
    fn = shard_map(
        functools.partial(
            _local_tens_vs_seq_levels, num_levels=num_levels, axis_name=axis
        ),
        mesh=mesh,
        in_specs=P(None, None, None, axis),
        out_specs=P(),  # replicated result
    )
    return fn(M_inc)


def _local_seq_diag_levels(M_local, num_levels: int, axis_name: str,
                           difference: bool):
    """Per-device slice of the seq-diag recursion, time sharded on the LAST
    axis only (each device holds (N, L, L_local) stripes of the per-example
    square Grams).

    The 2-D recursion needs cumsums over both time axes; the s-axis is local
    (full), the t-axis is chunked with the same carry trick as above, where
    now the carry per level is a (N, L) vector (sum over previous chunks'
    t-columns for every s).
    """
    # M_local: (N, L, Lc)
    dtype = M_local.dtype
    idx = lax.axis_index(axis_name)
    n_chunks = lax.axis_size(axis_name)
    N = M_local.shape[0]

    def excl_prefix(chunk_sums):
        # chunk_sums: local (N, L); returns sum over chunks before idx
        all_sums = lax.all_gather(chunk_sums, axis_name)  # (C, N, L)
        mask = (jnp.arange(n_chunks) < idx).astype(dtype)[:, None, None]
        return jnp.sum(all_sums * mask, axis=0)

    K = [jnp.ones((N,), dtype=dtype),
         lax.psum(jnp.sum(M_local, axis=(1, 2)), axis_name)]
    R = M_local
    for _ in range(2, num_levels + 1):
        inner_s = cumsum_exclusive(R, axis=1)  # local: s axis is full
        carry_t = excl_prefix(jnp.sum(inner_s, axis=2))  # (N, L)
        inner = carry_t[:, :, None] + cumsum_exclusive(inner_s, axis=2)
        R = M_local * inner
        K.append(lax.psum(jnp.sum(R, axis=(1, 2)), axis_name))
    return jnp.stack(K, axis=0)


def seq_diag_levels_seq_parallel(mesh: Mesh, M_inc, num_levels: int, *,
                                 axis: str = "seq"):
    """Exact (num_levels+1, N) per-level diagonals with the second time axis
    sharded over the mesh.

    Args:
      M_inc: (N, L-1, L-1) per-example increment Grams (differenced); the
        LAST axis is sharded over ``axis``.
    """
    fn = shard_map(
        functools.partial(
            _local_seq_diag_levels, num_levels=num_levels, axis_name=axis,
            difference=True,
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


def _local_seq_cross_levels(M_local, num_levels: int, ax_s: str, ax_t: str):
    """Per-device block of the full seq-vs-seq cross-Gram recursion with
    BOTH time axes chunked (the §3.2 hot loop, `signature_algs.py:8-35`).

    M_local: (N1, Ls_loc, N2, Lt_loc) block of the *increment* Gram; device
    (a, b) on the ('ax_s', 'ax_t') mesh owns s-chunk a and t-chunk b.

    Per level the double exclusive cumsum decomposes into local cumsums plus
    two carry states:

      * carry_t: (N1, Ls_loc, N2) exclusive prefix (over t-chunks) of the
        t-sums of R — exchanged along ``ax_t``;
      * carry_s: (N1, N2, Lt_loc) exclusive prefix (over s-chunks) of the
        s-sums of (carry_t + local t-cumsum) — exchanged along ``ax_s``.

    Both carries are L-chunk-local slabs, so communication per level is two
    small all_gathers + the final psum — independent of the full L1*L2.
    """
    dtype = M_local.dtype
    N1, _, N2, _ = M_local.shape

    K = [jnp.ones((N1, N2), dtype=dtype),
         lax.psum(jnp.sum(M_local, axis=(1, 3)), (ax_s, ax_t))]
    R = M_local
    for _ in range(2, num_levels + 1):
        # exclusive cumsum over the t axis (3): local + cross-chunk carry
        carry_t = _excl_chunk_prefix(jnp.sum(R, axis=3), ax_t)
        inner_t = carry_t[..., None] + cumsum_exclusive(R, axis=3)
        # exclusive cumsum over the s axis (1): local + cross-chunk carry
        carry_s = _excl_chunk_prefix(jnp.sum(inner_t, axis=1), ax_s)
        inner = carry_s[:, None, :, :] + cumsum_exclusive(inner_t, axis=1)
        R = M_local * inner
        K.append(lax.psum(jnp.sum(R, axis=(1, 3)), (ax_s, ax_t)))
    return jnp.stack(K, axis=0)


def seq_cross_levels_seq_parallel(mesh: Mesh, M_inc, num_levels: int, *,
                                  axes: tuple[str, str] = ("seq1", "seq2")):
    """Exact (num_levels+1, N1, N2) seq-vs-seq per-level kernels with both
    time axes sharded over a 2-D mesh (SURVEY §2.4 SP row: the time-axis
    cumsum recursion is an associative scan; chunk L across devices and
    carry per-chunk prefix states over ICI — exact, not approximate).

    Args:
      mesh: mesh containing both ``axes`` dimensions.
      M_inc: (N1, L1-1, N2, L2-1) increment Gram (already differenced,
        `signature_algs.py:26`); axes 1 and 3 sharded over ``axes``.
    """
    ax_s, ax_t = axes
    fn = shard_map(
        functools.partial(
            _local_seq_cross_levels, num_levels=num_levels,
            ax_s=ax_s, ax_t=ax_t,
        ),
        mesh=mesh,
        in_specs=P(None, ax_s, None, ax_t),
        out_specs=P(),
    )
    return fn(M_inc)
