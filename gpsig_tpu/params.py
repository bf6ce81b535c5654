"""Constrained-parameter machinery (bijectors over raw pytree leaves).

The reference stores constrained parameters through GPflow's `Parameter` +
`transforms.positive` / `transforms.Logistic` machinery
(`gpsig/kernels.py:65-88`).  The TPU-native equivalent is a plain pytree of
*unconstrained* (raw) arrays plus per-leaf bijectors applied functionally at
use sites — this keeps parameters jit/grad/pjit-friendly with no framework
magic.

Conventions used throughout gpsig_tpu:

* a module's parameters live in a flat dict ``{name: raw_array}``;
* the module's config knows which bijector each name uses;
* optimizers (optax) act on the raw values; bijectors are applied inside the
  loss, so gradients flow through the reparameterization exactly like
  GPflow's transformed-variable training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Softplus with a lower bound, matching GPflow's ``transforms.positive``
# (softplus with ~1e-6 shift is GPflow's default positive transform).
_POSITIVE_LOWER = 1e-12


def positive(raw):
    """raw (unconstrained) -> positive."""
    return jax.nn.softplus(raw) + _POSITIVE_LOWER


def positive_inverse(value):
    """positive -> raw, inverse of :func:`positive` (host-side, numpy ok)."""
    value = jnp.asarray(value)
    x = jnp.maximum(value - _POSITIVE_LOWER, 1e-20)
    # softplus^{-1}(x) = x + log(1 - exp(-x)), stable for both tails
    return x + jnp.log(-jnp.expm1(-x))


def sigmoid(raw):
    """raw -> (0, 1); GPflow ``transforms.Logistic()`` analogue."""
    return jax.nn.sigmoid(raw)


def sigmoid_inverse(value):
    value = jnp.asarray(value)
    value = jnp.clip(value, 1e-12, 1.0 - 1e-12)
    return jnp.log(value) - jnp.log1p(-value)


def identity(raw):
    return raw


def identity_inverse(value):
    return jnp.asarray(value)


BIJECTORS = {
    "positive": (positive, positive_inverse),
    "sigmoid": (sigmoid, sigmoid_inverse),
    "identity": (identity, identity_inverse),
}


def raw_init(value, bijector: str, dtype=None):
    """Build the raw (unconstrained) initial value for a constrained param."""
    _, inv = BIJECTORS[bijector]
    value = jnp.asarray(value, dtype=dtype)
    return inv(value).astype(value.dtype)


def constrain(raw, bijector: str):
    fwd, _ = BIJECTORS[bijector]
    return fwd(raw)
