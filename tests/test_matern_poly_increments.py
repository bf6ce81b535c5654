"""Cancellation-free matern32/52 increment algebra (round-4 extension of
VERDICT r3 item 6 beyond exp(-r)).

Both kernels are polynomial-times-exponential in the distance (reference
`gpsig/kernels.py:974-979` / `:991-997`); the second difference factors
through exp(-s*r00) with each polynomial monomial's own expm1
factorization (`ops/gram._matern_poly_increment_core`).  The suite runs
f64, where the naive second difference (reference `signature_algs.py:26`)
is exact — the oracle for every comparison here.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import pytest

from gpsig_tpu import kernels
from gpsig_tpu.ops import base_kernels, gram as gram_ops

RNG = np.random.RandomState(23)
HI = lax.Precision.HIGHEST

BASES = ("matern32", "matern52")


def _naive_cross(name, X, Y):
    kf = base_kernels.get(name)
    A, L1, d = X.shape
    B, L2, _ = Y.shape
    G = kf({}, X.reshape(A * L1, d), Y.reshape(B * L2, d)).reshape(
        A, L1, B, L2).transpose(0, 2, 1, 3)
    return (G[:, :, 1:, 1:] + G[:, :, :-1, :-1]
            - G[:, :, :-1, 1:] - G[:, :, 1:, :-1])


@pytest.mark.parametrize("base", BASES)
def test_cross_matches_naive_second_difference_f64(base):
    X = jnp.asarray(RNG.randn(3, 40, 2).cumsum(axis=1) / np.sqrt(40.0))
    Y = jnp.asarray(RNG.randn(4, 24, 2).cumsum(axis=1) / np.sqrt(24.0))
    cross, _, _ = gram_ops.INCREMENT_GRAMS[base]
    ours = cross(X, Y, HI)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(_naive_cross(base, X, Y)),
        rtol=1e-10, atol=1e-13,
    )


@pytest.mark.parametrize("base", BASES)
def test_diag_matches_naive_and_grads_finite(base):
    """Same-path entries have coincident/near-coincident corners where
    r00 = sqrt(-2*A00) cannot beat the rounding already inside A00:
    accuracy there is sqrt(eps)-limited (~1e-8 abs at f64) like the
    matern12 core — the tolerance pins that characterization."""
    X = jnp.asarray(RNG.randn(3, 32, 2).cumsum(axis=1) / np.sqrt(32.0))
    _, diag, _ = gram_ops.INCREMENT_GRAMS[base]
    ours = diag(X, HI)
    naive = jax.vmap(
        lambda x: _naive_cross(base, x[None], x[None])[0, 0]
    )(X)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(naive),
                               rtol=1e-6, atol=2e-7)
    g = jax.grad(lambda x: jnp.sum(diag(x, HI)))(X)
    assert bool(jnp.all(jnp.isfinite(g)))


@pytest.mark.parametrize("base", BASES)
def test_pair_fn_registered_for_sp(base):
    pf = gram_ops.increment_gram_pair_fn(base)
    assert pf is not None
    Xa = jnp.asarray(RNG.randn(2, 10, 3) / 3.0)
    Xb = jnp.asarray(RNG.randn(2, 7, 3) / 3.0)
    got = pf(Xa, Xb, HI)
    want = jax.vmap(
        lambda a, b: _naive_cross(base, a[None], b[None])[0, 0]
    )(Xa, Xb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-10, atol=1e-13)


@pytest.mark.parametrize(
    "base,cls",
    [("matern32", kernels.SignatureMatern32),
     ("matern52", kernels.SignatureMatern52)],
)
def test_blocked_gram_cross_and_grad(base, cls):
    """K_blocked (closed-form increments) == K (naive graph, f64-exact),
    normalized, through the public kernel API — fwd and bwd."""
    X, X2 = RNG.randn(6, 10, 2), RNG.randn(5, 8, 2)
    k = cls(2, 3, normalization=True)
    p = k.init_params()
    K_direct = k.K(p, jnp.asarray(X), jnp.asarray(X2))
    K_blocked = k.K_blocked(p, jnp.asarray(X), jnp.asarray(X2), block_size=4)
    np.testing.assert_allclose(np.asarray(K_blocked), np.asarray(K_direct),
                               rtol=1e-6)
    g = jax.grad(
        lambda x: jnp.sum(k.K_blocked(p, x, jnp.asarray(X2), block_size=4))
    )(jnp.asarray(X))
    gd = jax.grad(
        lambda x: jnp.sum(k.K(p, x, jnp.asarray(X2)))
    )(jnp.asarray(X))
    # atol floor: near-coincident corner pairs put ~sqrt(eps)-scale
    # absolute noise (~1e-7 f64) into the gradient through r00 = sqrt(.)
    # (`_radius_gaps` docstring) — entries whose true gradient is small
    # see it as relative error above rtol
    np.testing.assert_allclose(np.asarray(g), np.asarray(gd),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("base", BASES)
def test_f32_cross_accuracy_at_long_L(base):
    """f32 cross-entry accuracy pin at L=512 vs the f64 oracle (same
    regime as the matern12 core — see PERF.md's per-base table)."""
    L = 512
    X64 = jnp.asarray(RNG.randn(2, L, 2).cumsum(axis=1) / np.sqrt(L))
    Y64 = jnp.asarray(RNG.randn(2, L, 2).cumsum(axis=1) / np.sqrt(L))
    cross, _, _ = gram_ops.INCREMENT_GRAMS[base]
    oracle = cross(X64, Y64, HI)
    ours32 = cross(jnp.asarray(X64, jnp.float32),
                   jnp.asarray(Y64, jnp.float32), HI)
    err = float(jnp.max(jnp.abs(ours32 - oracle)))
    assert err < 5e-5, err


@pytest.mark.parametrize("base", BASES)
def test_repeat_padding_increments_exactly_zero(base):
    """Repeat-last padding (the repo's static-shape convention) must
    contribute exactly-zero increments: every `_radius_gaps` numerator is
    an inner product with a zero step."""
    X = jnp.asarray(RNG.randn(2, 6, 2))
    Xp = jnp.concatenate([X, jnp.repeat(X[:, -1:], 3, axis=1)], axis=1)
    cross, _, _ = gram_ops.INCREMENT_GRAMS[base]
    M = cross(Xp, Xp, HI)
    assert float(jnp.max(jnp.abs(M[:, :, 5:, :]))) == 0.0
    assert float(jnp.max(jnp.abs(M[:, :, :, 5:]))) == 0.0
