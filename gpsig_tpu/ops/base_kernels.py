"""Static (state-space embedding) base kernels as pure functions.

The reference implements these as methods on ``SignatureKernel`` subclasses
(`gpsig/kernels.py:786-994`): linear, cosine, poly, RBF, mix (convex
RBF+linear), spectral-mixture, and Matern 1/2, 3/2, 5/2.  Here each is a pure
function ``k(params, X, X2) -> Gram`` over arbitrary leading batch dims, so
they vmap/shard trivially and XLA maps the inner products onto the MXU.

All kernels accept ``X: (..., n, d)`` and ``X2: (..., m, d)`` (or None for
the symmetric case) and return ``(..., n, m)``.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .. import params as pm

# TPU MXU note: jnp.matmul defaults to bfloat16 inputs on TPU, which loses
# ~3 decimal digits on the base Gram and propagates through the signature
# recursion into Cholesky factorizations downstream.  GP numerics want the
# full-f32 (3-pass bf16) MXU mode, so all base-kernel contractions pin
# precision=HIGHEST; the throughput-oriented Pallas path manages its own
# accumulation precision explicitly.
_PRECISION = lax.Precision.HIGHEST


def _inner(X, X2):
    return jnp.matmul(
        X,
        jnp.swapaxes(X2, -1, -2),
        precision=_PRECISION,
        preferred_element_type=X.dtype,
    )


def square_dist(X, X2=None):
    """Pairwise squared Euclidean distance (cf. `gpsig/kernels.py:765-776`)."""
    Xs = jnp.sum(jnp.square(X), axis=-1)
    if X2 is None:
        inner = _inner(X, X)
        d = Xs[..., :, None] + Xs[..., None, :] - 2.0 * inner
    else:
        X2s = jnp.sum(jnp.square(X2), axis=-1)
        d = Xs[..., :, None] + X2s[..., None, :] - 2.0 * _inner(X, X2)
    return jnp.maximum(d, 0.0)


def euclid_dist(X, X2=None):
    # the sqrt guard must be a NORMAL f32 (min normal 1.18e-38): 1e-40 is
    # subnormal and flushes to zero on the TPU VPU, so sqrt's VJP at
    # coincident points becomes inf and gradients NaN (caught by the
    # round-4 matern12 selftest bwd lane)
    r2 = square_dist(X, X2)
    return jnp.sqrt(jnp.maximum(r2, 1e-36))


# ---------------------------------------------------------------------------
# individual base kernels; `params` is the kernel's constrained-param dict
# (already bijected), so these stay oblivious to the raw/constrained split.
# ---------------------------------------------------------------------------


def linear(params, X, X2=None):
    return _inner(X, X if X2 is None else X2)


def cosine(params, X, X2=None):
    # norm guards in the f32-normal range (like euclid_dist's): sqrt's VJP
    # and the division are NaN/inf at an exactly-zero point otherwise
    Xn = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(X), axis=-1), 1e-36))
    if X2 is None:
        X2, X2n = X, Xn
    else:
        X2n = jnp.sqrt(
            jnp.maximum(jnp.sum(jnp.square(X2), axis=-1), 1e-36))
    return _inner(X, X2) / (Xn[..., :, None] * X2n[..., None, :])


def poly(params, X, X2=None):
    # trainable offset `gamma`, fixed `degree` (`gpsig/kernels.py:835-848`)
    return (_inner(X, X if X2 is None else X2) + params["poly_gamma"]) ** params["poly_degree"]


def rbf(params, X, X2=None):
    return jnp.exp(-square_dist(X, X2) / 2.0)


def mix(params, X, X2=None):
    # convex combination of RBF and linear with trainable `mixing`
    # (`gpsig/kernels.py:870-892`)
    inner = _inner(X, X if X2 is None else X2)
    ds = square_dist(X, X2)
    mixing = params["mixing"]
    return mixing * jnp.exp(-ds / 2.0) + (1.0 - mixing) * inner


def matern12(params, X, X2=None):
    return jnp.exp(-euclid_dist(X, X2))


def matern32(params, X, X2=None):
    r = euclid_dist(X, X2)
    s3 = math.sqrt(3.0)
    return (1.0 + s3 * r) * jnp.exp(-s3 * r)


def matern52(params, X, X2=None):
    r = euclid_dist(X, X2)
    s5 = math.sqrt(5.0)
    return (1.0 + s5 * r + (5.0 / 3.0) * jnp.square(r)) * jnp.exp(-s5 * r)


def spectral(params, X, X2=None, *, family: str = "rbf"):
    """Spectral-mixture base kernel (`gpsig/kernels.py:894-942`).

    params: ``alpha (Q,)``, ``omega (Q, d)``, ``spec_gamma (Q, d)``.
    family: 'rbf' | 'exp' | 'mixed'.
    """
    if X2 is None:
        X2 = X
    alpha, omega, gamma = params["alpha"], params["omega"], params["spec_gamma"]
    Q = alpha.shape[0]
    diff = X[..., None, :, None, :] - X2[..., None, None, :, :]  # (..., 1, n, m, d)
    diffq = diff * gamma[:, None, None, :]  # (..., Q, n, m, d)
    sq = jnp.sum(jnp.square(diffq), axis=-1)  # (..., Q, n, m)
    spectral_term = jnp.cos(
        2.0 * math.pi * jnp.sum(diff * omega[:, None, None, :], axis=-1)
    )
    if family == "exp":
        kern_term = jnp.exp(-jnp.sqrt(jnp.maximum(sq, 1e-36)) / 2.0)
    elif family == "rbf":
        kern_term = jnp.exp(-sq / 2.0)
    elif family == "mixed":
        Q1 = Q // 2
        rbf_term = jnp.exp(-sq[..., :Q1, :, :] / 2.0)
        exp_term = jnp.exp(-jnp.sqrt(jnp.maximum(sq[..., Q1:, :, :], 1e-36)) / 2.0)
        kern_term = jnp.concatenate([rbf_term, exp_term], axis=-3)
    else:
        raise ValueError(f"Unrecognized spectral family: {family}")
    return jnp.sum(kern_term * spectral_term * alpha[:, None, None], axis=-3)


BASE_KERNELS = {
    "linear": linear,
    "cosine": cosine,
    "poly": poly,
    "rbf": rbf,
    "mix": mix,
    "matern12": matern12,
    "matern32": matern32,
    "matern52": matern52,
    "spectral_rbf": partial(spectral, family="rbf"),
    "spectral_exp": partial(spectral, family="exp"),
    "spectral_mixed": partial(spectral, family="mixed"),
}


def get(name: str):
    try:
        return BASE_KERNELS[name]
    except KeyError:
        raise ValueError(
            f"Unknown base kernel {name!r}; available: {sorted(BASE_KERNELS)}"
        ) from None


def init_params(name: str, key=None, *, num_features: int | None = None,
                poly_gamma: float = 1.0, poly_degree: float = 3.0,
                Q: int = 5, dtype=None):
    """Raw (unconstrained) parameter dict for a base kernel, with bijector map.

    Returns (raw_params, bijectors) where bijectors maps name -> bijector id.
    """
    if name == "poly":
        # `degree` is static configuration, NOT a trainable leaf — the
        # reference pins it with trainable=False (`gpsig/kernels.py:838`);
        # it is injected at constrain time via :func:`static_params` so a
        # full-pytree optimize() can never nudge the exponent (a
        # non-integer degree over a negative inner+gamma is NaN).
        raw = {"poly_gamma": pm.raw_init(poly_gamma, "positive", dtype)}
        bij = {"poly_gamma": "positive"}
    elif name == "mix":
        raw = {"mixing": pm.raw_init(0.5, "positive", dtype)}
        bij = {"mixing": "positive"}
    elif name.startswith("spectral"):
        assert num_features is not None
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        raw = {
            "alpha": pm.raw_init(jnp.exp(jax.random.normal(k1, (Q,), dtype=dtype)), "positive", dtype),
            "omega": pm.raw_init(jnp.exp(jax.random.normal(k2, (Q, num_features), dtype=dtype)), "positive", dtype),
            "spec_gamma": pm.raw_init(jnp.exp(jax.random.normal(k3, (Q, num_features), dtype=dtype)), "positive", dtype),
        }
        bij = {"alpha": "positive", "omega": "positive", "spec_gamma": "positive"}
    else:
        raw, bij = {}, {}
    return raw, bij


def static_params(name: str, *, poly_degree: float = 3.0, **_unused) -> dict:
    """Non-trainable base-kernel configuration injected into constrained
    param dicts at use time (kept out of the raw pytree so optimizers never
    touch it).  Mirrors the reference's ``trainable=False`` degree
    (`gpsig/kernels.py:838`)."""
    if name == "poly":
        return {"poly_degree": float(poly_degree)}
    return {}
