"""Encoder + SVGP hybrids (GPSigRNN / GPRNN model families).

The reference splices a Keras RNN's symbolic output into a GPflow SVGP and
trains jointly through a hand-built ``K.function`` loop
(`benchmarks/models/train_gpsigrnn.py:68-95`, `benchmarks/utils/training.py`).
TPU-native version: the encoder is a flax module, the composite parameter
pytree is ``{"enc": ..., "svgp": {...}}``, and the joint ELBO is one pure
function — optax differentiates through encoder and GP together, and the
whole step jits/shards like any other.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .svgp import SVGP


class EncoderSVGP:
    """SVGP over the outputs of a feature encoder.

    Args:
      encoder: a flax module mapping raw input batches to kernel inputs
        (e.g. ``MaskedRNN(return_sequences=True)`` -> (N, L, H) hidden-state
        sequences for GPSigRNN, or ``return_sequences=False`` -> (N, H) for
        GPRNN).
      svgp: a configured :class:`gpsig_tpu.models.SVGP` over encoder outputs.
    """

    def __init__(self, encoder, svgp: SVGP):
        self.encoder = encoder
        self.svgp = svgp

    def init_params(self, key, X_example, dtype=None) -> dict:
        k_enc, k_gp = jax.random.split(key)
        enc_vars = self.encoder.init(k_enc, jnp.asarray(X_example))
        return {
            "enc": enc_vars["params"],
            "svgp": self.svgp.init_params(k_gp, dtype=dtype),
        }

    def encode(self, params: dict, X, *, key=None):
        """Encoder forward pass; a ``key`` enables dropout (training mode,
        `train_gpsigrnn.py:54-60` semantics), None is deterministic (eval)."""
        if key is not None:
            return self.encoder.apply(
                {"params": params["enc"]}, jnp.asarray(X),
                deterministic=False, rngs={"dropout": key},
            )
        return self.encoder.apply({"params": params["enc"]}, jnp.asarray(X))

    def elbo(self, params: dict, X, Y, *, key=None):
        """Joint ELBO; ``key`` (if given) drives encoder dropout and any
        stochastic kernel features."""
        if key is not None:
            k_enc, key = jax.random.split(key)
        else:
            k_enc = None
        return self.svgp.elbo(params["svgp"],
                              self.encode(params, X, key=k_enc), Y, key=key)

    def loss(self, params: dict, X, Y, *, key=None):
        return -self.elbo(params, X, Y, key=key)

    def predict_f(self, params: dict, X, **kw):
        return self.svgp.predict_f(params["svgp"], self.encode(params, X), **kw)

    def predict_y(self, params: dict, X, **kw):
        return self.svgp.predict_y(params["svgp"], self.encode(params, X), **kw)

    def predict_log_density(self, params: dict, X, Y, **kw):
        return self.svgp.predict_log_density(
            params["svgp"], self.encode(params, X), Y, **kw
        )
