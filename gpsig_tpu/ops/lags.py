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

import jax.numpy as jnp


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
