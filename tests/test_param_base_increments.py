"""Cancellation-free cosine / mix / poly increment algebra (round-4
closure of the remaining INCREMENT_GRAMS gaps — after this, only the
spectral family second-differences naively).

- cosine telescopes exactly to the *linear* increment Gram of the
  unit-normalized observations (`ops/gram._unit_steps`), with the steps
  themselves formed cancellation-free.
- mix = mixing*rbf + (1-mixing)*linear is linear in the base Gram, so its
  increment Gram is the same convex combination of the two closed forms.
- poly ((<x,y>+gamma)^p, reference `gpsig/kernels.py:828-845`) expands the
  second difference binomially around the base corner; the two
  first-order monomials are exactly the ones the subtracted corners
  cancel, so every surviving term is a product of >= 2 small factors.
  Needs a static integer degree — the non-integer / missing-params gates
  fall back to naive differencing (None).

The suite runs f64, where the naive second difference (reference
`signature_algs.py:26`) is exact — the oracle for every comparison.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

import pytest

from gpsig_tpu import kernels
from gpsig_tpu.ops import base_kernels, gram as gram_ops

RNG = np.random.RandomState(41)
HI = lax.Precision.HIGHEST

# (base, constrained-params dict for both the oracle and the closed form)
CASES = [
    ("cosine", {}),
    ("mix", {"mixing": jnp.asarray(0.3)}),
    ("poly", {"poly_gamma": jnp.asarray(1.2), "poly_degree": 3.0}),
]
IDS = [c[0] for c in CASES]


def _naive_cross(name, params, X, Y):
    kf = base_kernels.get(name)
    A, L1, d = X.shape
    B, L2, _ = Y.shape
    G = kf(params, X.reshape(A * L1, d), Y.reshape(B * L2, d)).reshape(
        A, L1, B, L2).transpose(0, 2, 1, 3)
    return (G[:, :, 1:, 1:] + G[:, :, :-1, :-1]
            - G[:, :, :-1, 1:] - G[:, :, 1:, :-1])


def _paths(n, L, d, shift=0.5):
    # offset random walks: keeps cosine away from the zero-vector guard
    return jnp.asarray(RNG.randn(n, L, d).cumsum(axis=1) / np.sqrt(L)
                       + shift)


@pytest.mark.parametrize("base,params", CASES, ids=IDS)
def test_cross_matches_naive_second_difference_f64(base, params):
    X, Y = _paths(3, 40, 3), _paths(4, 24, 3, shift=-0.4)
    cross, _ = gram_ops.increment_gram_fns(base, params)
    assert cross is not None
    np.testing.assert_allclose(
        np.asarray(cross(X, Y, HI)),
        np.asarray(_naive_cross(base, params, X, Y)),
        rtol=1e-9, atol=1e-11,
    )


@pytest.mark.parametrize("base,params", CASES, ids=IDS)
def test_pair_fn_and_diag_match_and_grads_finite(base, params):
    X = _paths(3, 16, 2)
    Y = _paths(3, 12, 2, shift=-0.3)
    pf = gram_ops.increment_gram_pair_fn(base, params)
    assert pf is not None
    got = pf(X, Y, HI)
    want = jax.vmap(
        lambda a, b: _naive_cross(base, params, a[None], b[None])[0, 0]
    )(X, Y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-9, atol=1e-11)
    _, diag = gram_ops.increment_gram_fns(base, params)
    g = jax.grad(lambda x: jnp.sum(diag(x, HI)))(X)
    assert bool(jnp.all(jnp.isfinite(g)))


@pytest.mark.parametrize("base,params", CASES, ids=IDS)
def test_f32_cross_beats_naive_at_long_L(base, params):
    """The point of the closed forms: f32 accuracy at long L vs the f64
    oracle (measured ~1.2e-8 cosine / ~1e-5 poly3 at L=512, vs naive
    5.2e-7 / 3.1e-3 — PERF.md)."""
    L = 512
    X64, Y64 = _paths(2, L, 3, shift=1.0), _paths(2, L, 3, shift=1.0)
    cross, _ = gram_ops.increment_gram_fns(base, params)
    oracle = cross(X64, Y64, HI)
    p32 = jax.tree.map(
        lambda v: jnp.asarray(v, jnp.float32)
        if isinstance(v, jnp.ndarray) else v, params)
    cross32, _ = gram_ops.increment_gram_fns(base, p32)
    ours = cross32(X64.astype(jnp.float32), Y64.astype(jnp.float32), HI)
    naive = _naive_cross(base, p32, X64.astype(jnp.float32),
                         Y64.astype(jnp.float32))
    err = float(jnp.max(jnp.abs(ours - oracle)))
    err_naive = float(jnp.max(jnp.abs(naive - oracle)))
    assert err < 5e-5, err
    assert err < err_naive, (err, err_naive)


@pytest.mark.parametrize("base,params", CASES, ids=IDS)
def test_repeat_padding_increments_exactly_zero(base, params):
    """Repeat-last padding (the repo's static-shape convention) must
    contribute exactly-zero increments."""
    X = _paths(2, 6, 2)
    Xp = jnp.concatenate([X, jnp.repeat(X[:, -1:], 3, axis=1)], axis=1)
    cross, _ = gram_ops.increment_gram_fns(base, params)
    M = cross(Xp, Xp, HI)
    assert float(jnp.max(jnp.abs(M[:, :, 5:, :]))) == 0.0
    assert float(jnp.max(jnp.abs(M[:, :, :, 5:]))) == 0.0


def test_poly_gates_fall_back_to_naive():
    """Non-integer / out-of-range / missing degree -> (None, None): the
    callers' naive-differencing fallback (exact in f64) stays in charge."""
    assert gram_ops.increment_gram_fns("poly") == (None, None)
    assert gram_ops.increment_gram_fns(
        "poly", {"poly_gamma": 1.0, "poly_degree": 2.5}) == (None, None)
    assert gram_ops.increment_gram_fns(
        "poly", {"poly_gamma": 1.0, "poly_degree": 40.0}) == (None, None)
    assert gram_ops.increment_gram_pair_fn(
        "poly", {"poly_gamma": 1.0, "poly_degree": 2.5}) is None
    # degree-1 poly == linear + gamma: second difference drops gamma
    fns = gram_ops.increment_gram_fns(
        "poly", {"poly_gamma": jnp.asarray(2.0), "poly_degree": 1.0})
    X, Y = _paths(2, 8, 2), _paths(2, 6, 2)
    lin = gram_ops.INCREMENT_GRAMS["linear"][0](X, Y, HI)
    np.testing.assert_allclose(np.asarray(fns[0](X, Y, HI)),
                               np.asarray(lin), rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize(
    "cls,kwargs",
    [(kernels.SignatureCosine, {}),
     (kernels.SignatureMix, {}),
     (kernels.SignaturePoly, {"gamma": 1.1, "degree": 3})],
    ids=["cosine", "mix", "poly"],
)
def test_blocked_gram_cross_and_grad_public_api(cls, kwargs):
    """K_blocked (closed-form increments via `increment_gram_fns(base,
    cp)`) == K (naive graph, f64-exact), normalized, through the public
    kernel API — fwd and bwd."""
    X = RNG.randn(6, 10, 2) + 0.5
    X2 = RNG.randn(5, 8, 2) + 0.5
    k = cls(2, 3, normalization=True, **kwargs)
    p = k.init_params()
    K_direct = k.K(p, jnp.asarray(X), jnp.asarray(X2))
    K_blocked = k.K_blocked(p, jnp.asarray(X), jnp.asarray(X2),
                            block_size=4)
    np.testing.assert_allclose(np.asarray(K_blocked), np.asarray(K_direct),
                               rtol=1e-6)
    g = jax.grad(
        lambda x: jnp.sum(k.K_blocked(p, x, jnp.asarray(X2), block_size=4))
    )(jnp.asarray(X))
    gd = jax.grad(
        lambda x: jnp.sum(k.K(p, x, jnp.asarray(X2)))
    )(jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(g), np.asarray(gd),
                               rtol=1e-5, atol=1e-7)
