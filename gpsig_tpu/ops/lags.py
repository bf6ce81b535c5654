"""Lag augmentation of sequences via vectorized linear interpolation.

TPU-native equivalent of the reference's `gpsig/lags.py`: each sequence is
augmented with ``num_lags`` time-lagged copies of itself, where fractional
lags are evaluated by piecewise-linear interpolation on a normalized [0, 1]
time grid.  The reference finds the left bracketing index by an
argmax-over-masked-distances trick (`gpsig/lags.py:22`); here we compute it
with a closed form on the uniform grid (``floor(t * (L-1))``), which is both
exact and cheaper (no (L x L) pairwise tensor).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lin_interp(X, times, query_times):
    """Piecewise-linear interpolation at arbitrary (sorted) sample times.

    General-time counterpart of :func:`lin_interp_uniform`, matching the
    reference utility `gpsig/lags.py:7-38` — but the left bracketing index
    comes from ``searchsorted`` instead of the reference's argmax over an
    (L x L) masked pairwise-distance tensor.

    Args:
      X: ``(N, L, d)`` sequence values.
      times: ``(L,)`` or ``(N, L)`` increasing sample times.
      query_times: ``(Q,)`` or ``(N, Q)`` query times (clamped to the sample
        range, matching the reference's boundary behavior).

    Returns: ``(N, Q, d)`` interpolated values.
    """
    X = jnp.asarray(X)
    N, L, d = X.shape
    times = jnp.broadcast_to(jnp.asarray(times, X.dtype), (N, L))
    query_times = jnp.asarray(query_times, X.dtype)
    if query_times.ndim == 1:
        query_times = jnp.broadcast_to(query_times[None], (N, query_times.shape[0]))

    def one(xv, tv, qv):
        left = jnp.clip(
            jnp.searchsorted(tv, qv, side="right") - 1, 0, L - 2
        )
        t0 = tv[left]
        t1 = tv[left + 1]
        frac = jnp.clip((qv - t0) / jnp.maximum(t1 - t0, 1e-30), 0.0, 1.0)
        return xv[left] + frac[:, None] * (xv[left + 1] - xv[left])

    return jax.vmap(one)(X, times, query_times)


def lin_interp_uniform(X, time_query):
    """Linearly interpolate sequences sampled on a uniform [0, 1] grid.

    Args:
      X: ``(N, L, d)`` sequence values at times ``t_k = k / (L-1)``.
      time_query: ``(L, num_lags)`` query times in [0, 1].

    Returns: ``(N, L, num_lags, d)`` interpolated values.
    """
    L = X.shape[-2]
    pos = time_query * (L - 1)  # fractional index
    left = jnp.clip(jnp.floor(pos), 0, L - 2).astype(jnp.int32)
    frac = (pos - left).astype(X.dtype)  # in [0, 1]
    X_left = X[:, left, :]  # (N, L, num_lags, d)
    X_right = X[:, left + 1, :]
    return X_left + frac[None, :, :, None] * (X_right - X_left)


def add_lags_to_sequences(X, lags):
    """Append lagged copies of each sequence as extra channel groups.

    Args:
      X: ``(N, L, d)`` sequences.
      lags: ``(num_lags,)`` lag values in (0, 1).

    Returns: ``(N, L, num_lags + 1, d)`` — original + lagged copies stacked
    on a new axis (cf. `gpsig/lags.py:41-63`; the caller flattens the last
    two axes and applies per-group scaling `gpsig/kernels.py:352-363`).
    """
    L = X.shape[-2]
    time = jnp.arange(L, dtype=X.dtype) / (L - 1)
    time_lags = jnp.maximum(time[:, None] - lags[None, :], 0.0)
    X_lags = lin_interp_uniform(X, time_lags)
    return jnp.concatenate((X[:, :, None, :], X_lags), axis=2)
