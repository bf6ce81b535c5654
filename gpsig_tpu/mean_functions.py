"""Mean functions for the SVGP predictive mean.

The reference adds ``self.mean_function(X_new)`` to the conditional mean
(`gpsig/models.py:67`; GPflow mean functions, Zero by default in every
benchmark recipe).  Here a mean function is a static config with
``init_params(dtype) -> dict`` and ``__call__(params, X) -> (N, P)`` —
pure functions over the parameter pytree like everything else.

``X`` arrives as sequences ``(N, L, d)`` (or GPflow-style flattened
``(N, L*d)``); Linear/Constant act on the flattened representation, which is
what stock GPflow does with this model's 2-D inputs.
"""

from __future__ import annotations

import jax.numpy as jnp


def _flat(X):
    X = jnp.asarray(X)
    return X.reshape(X.shape[0], -1) if X.ndim == 3 else X


class Zero:
    """No-op mean (the reference benchmarks' default)."""

    def __init__(self, num_latent: int = 1):
        self.num_latent = int(num_latent)

    def init_params(self, dtype=None) -> dict:
        return {}

    def __call__(self, params: dict, X):
        N = jnp.asarray(X).shape[0]
        return jnp.zeros((N, self.num_latent))


class Constant:
    """Trainable constant mean c (broadcast over examples)."""

    def __init__(self, num_latent: int = 1, value: float = 0.0):
        self.num_latent = int(num_latent)
        self.value = float(value)

    def init_params(self, dtype=None) -> dict:
        return {"c": jnp.full((self.num_latent,), self.value, dtype=dtype)}

    def __call__(self, params: dict, X):
        N = jnp.asarray(X).shape[0]
        return jnp.broadcast_to(params["c"][None, :], (N, self.num_latent))


class Linear:
    """Trainable affine mean A^T x + b over the flattened input."""

    def __init__(self, input_dim: int, num_latent: int = 1):
        self.input_dim = int(input_dim)
        self.num_latent = int(num_latent)

    def init_params(self, dtype=None) -> dict:
        return {
            "A": jnp.zeros((self.input_dim, self.num_latent), dtype=dtype),
            "b": jnp.zeros((self.num_latent,), dtype=dtype),
        }

    def __call__(self, params: dict, X):
        return _flat(X) @ params["A"] + params["b"][None, :]
