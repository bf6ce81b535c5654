"""Example-sharded distributed Grams: ``K(X, X2)`` block-partitioned over a
2-D device mesh.

Complements the time-axis sequence parallelism (`seq_parallel.py`, long L)
with the other scale axis: large *N*.  The reference materializes the whole
(N1, N2) kernel matrix on one device (`gpsig/kernels.py:400-476` under a
single TF graph); here the Gram's row blocks shard over one mesh axis and
its column blocks over the other, each device computing only its
(N1/P, N2/Q) tile with the single-device machinery (including the fused
Pallas path on TPU — dispatch happens per device inside ``shard_map``), so
a Gram that exceeds one chip's HBM computes and *stays* distributed: the
result is a global ``jax.Array`` sharded over ('data', 'model') that
downstream per-block consumers (kernel-ridge solves, nearest-neighbour
scans, further `shard_map` stages) can use without ever gathering.

Normalization mirrors ``SignatureKernel.K``: per-level diagonals are
computed per stripe inside the same ``shard_map`` (duplicated across the
orthogonal mesh axis — O(N L^2) work vs the block's O(N^2 L^2)), and the
symmetric case reproduces ``K()``'s ``+ jitter * I`` semantics (diagonal
entries exactly 1 per level before the variance weighting).  Algebraically
identical to ``K()``; note the symmetric case normalizes by
``_K_seq_diag`` (the cancellation-free blocked path) where single-device
``K()`` uses the diagonal of the full level stack, so on the TPU f32 fused
path individual entries can differ from ``K()`` by small float noise
(f64 agreement is ~1e-12; don't diff the two paths at tighter than ~1e-4
in f32).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at the top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _pad_rows(X, n_pad):
    """Repeat the last example ``n_pad`` times (valid data — padded rows are
    sliced away from the output, and repeating keeps every block's
    numerics/NaN story identical to real rows)."""
    if n_pad == 0:
        return X
    return jnp.concatenate([X, jnp.repeat(X[-1:], n_pad, axis=0)], axis=0)


def kernel_K_dp(kern, params, mesh: Mesh, X, X2=None, *,
                axes: tuple[str, str] = ("data", "model"),
                return_levels: bool = False):
    """``SignatureKernel.K`` with example blocks distributed over ``mesh``.

    Rows of the Gram shard over ``axes[0]``, columns over ``axes[1]``; the
    returned global array is sharded ``P(axes[0], axes[1])`` (levels axis
    replicated under ``return_levels``).  Each device holds only its
    (ceil(N1/P), ceil(N2/Q)) tile at any point.  Supports every
    single-device ``K`` configuration except ``low_rank`` (whose features
    are already O(N) — shard those with plain data parallelism).
    """
    if kern.low_rank:
        raise NotImplementedError(
            "low-rank K is feature-based (O(N) memory); use the feature "
            "path under plain data parallelism instead"
        )
    from .. import config as cfg

    cp = kern.constrain(params)
    jitter = cfg.jitter()
    Pn, Qn = mesh.shape[axes[0]], mesh.shape[axes[1]]

    Xs = kern._scale_sequences(cp, X)
    symm = X2 is None
    X2s = Xs if symm else kern._scale_sequences(cp, X2)
    N1, N2 = Xs.shape[0], X2s.shape[0]
    n1b = -(-N1 // Pn)
    n2b = -(-N2 // Qn)
    Xp = _pad_rows(Xs, n1b * Pn - N1)
    X2p = _pad_rows(X2s, n2b * Qn - N2)

    def block(xr, xc):
        lv = kern._K_seq(cp, xr, xc)  # (M+1, n1b, n2b)
        if kern.normalization:
            d1 = kern._K_seq_diag(cp, xr)
            d2 = kern._K_seq_diag(cp, xc)
            lv = lv / (
                jnp.sqrt(d1 + jitter)[:, :, None]
                * jnp.sqrt(d2 + jitter)[:, None, :]
            )
            if symm:
                # K()'s X2=None branch adds jitter*I *before* taking the
                # normalization diagonal: global-diagonal entries are
                # exactly 1 per level
                rows = lax.axis_index(axes[0]) * n1b + jnp.arange(n1b)
                cols = lax.axis_index(axes[1]) * n2b + jnp.arange(n2b)
                on_diag = rows[:, None] == cols[None, :]
                lv = jnp.where(on_diag[None], jnp.ones((), lv.dtype), lv)
        lv = kern._level_scale(cp, lv)
        return lv if return_levels else jnp.sum(lv, axis=0)

    out_spec = (P(None, axes[0], axes[1]) if return_levels
                else P(axes[0], axes[1]))
    # check_vma=False: the per-device block dispatches into pallas_call on
    # TPU (the fused Gram path), and jax>=0.9's varying-manifest check
    # rejects pallas_call bodies under shard_map ("vma on ShapeDtypeStruct
    # must not be None"; jax's own guidance is check_vma=False).  The body
    # is collective-free, so the check buys nothing here.  Pinned by
    # tests/test_gram_parallel_pallas.py and the bench.py --selftest lane.
    Kp = shard_map(
        block, mesh=mesh,
        in_specs=(P(axes[0], None, None), P(axes[1], None, None)),
        out_specs=out_spec,
        check_vma=False,
    )(Xp, X2p)
    return Kp[..., :N1, :N2]
