"""Round-4 API parity closures (VERDICT r3 missing #2/#3/#4, next #5/#8).

* ``poly_degree`` is static configuration, not a trainable leaf — the
  reference pins it with ``trainable=False`` (`gpsig/kernels.py:838`); a
  full-pytree optimize() must leave it fixed and SignaturePoly must train
  NaN-free.
* ``SVGP.predict_f_samples`` — the reference inherits it from GPflow's SVGP
  (`gpsig/models.py:13-37`); sample moments must match predict_f.
* Trainable Gaussian likelihood variance — GPflow's Gaussian trains its
  noise variance; here ``Gaussian(trainable=True)`` carries it in the
  model's param pytree under ``"lik"``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from gpsig_tpu import SVGP, InducingTensors, kernels, likelihoods
from gpsig_tpu import utils as gp_utils

RNG = np.random.RandomState(7)


def _toy(num_classes=0, d=2, L=8, N=12, M_lvl=2, nZ=4, base_kern=None):
    X = RNG.randn(N, L, d).cumsum(axis=1) / np.sqrt(L)
    if num_classes:
        y = RNG.randint(0, num_classes, N)[:, None].astype(np.float64)
        lik = (likelihoods.Bernoulli() if num_classes == 2
               else likelihoods.MultiClass(num_classes))
        P = 1 if num_classes == 2 else num_classes
    else:
        y = RNG.randn(N, 1)
        lik = likelihoods.Gaussian(variance=0.5, trainable=True)
        P = 1
    Z = gp_utils.suggest_initial_inducing_tensors(
        X, M_lvl, nZ, increments=True, seed=0
    )
    kern = base_kern or kernels.SignatureRBF(d, M_lvl)
    ind = InducingTensors(Z, M_lvl, increments=True)
    model = SVGP(kern, ind, lik, num_latent=P, num_data=N)
    return model, model.init_params(), jnp.asarray(X), jnp.asarray(y)


# ---------------------------------------------------------------------------
# poly degree is static
# ---------------------------------------------------------------------------


def test_poly_degree_not_in_param_pytree():
    kern = kernels.SignaturePoly(2, 2, degree=4.0, gamma=1.25)
    raw = kern.init_params()
    assert "poly_degree" not in raw
    cp = kern.constrain(raw)
    assert float(cp["poly_degree"]) == 4.0
    assert float(cp["poly_gamma"]) == pytest.approx(1.25, rel=1e-6)


def test_poly_kernel_trains_nan_free_with_fixed_degree():
    kern = kernels.SignaturePoly(2, 2, degree=3.0)
    model, params, X, y = _toy(num_classes=2, base_kern=kern)
    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(model.loss)(p, X, y)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    for _ in range(5):
        params, state, loss = step(params, state)
        assert np.isfinite(float(loss))
    cp = model.kern.constrain(params["kern"])
    # degree is injected statically by constrain(), never optimized
    assert float(cp["poly_degree"]) == 3.0
    assert "poly_degree" not in params["kern"]


# ---------------------------------------------------------------------------
# predict_f_samples
# ---------------------------------------------------------------------------


def test_predict_f_samples_moments_match_predict_f():
    model, params, X, _ = _toy(num_classes=2)
    key = jax.random.PRNGKey(0)
    S = 4000
    samples = model.predict_f_samples(params, X, num_samples=S, key=key)
    assert samples.shape == (S, X.shape[0], 1)
    fmean, fvar = model.predict_f(params, X)
    m_err = np.max(np.abs(np.asarray(samples.mean(0) - fmean)))
    v_err = np.max(np.abs(np.asarray(samples.var(0) - fvar)))
    # MC error ~ sqrt(2/S) for the variance of a standard normal
    assert m_err < 4.0 * float(jnp.max(jnp.sqrt(fvar))) / np.sqrt(S)
    assert v_err < 6.0 * float(jnp.max(fvar)) / np.sqrt(S / 2)


def test_predict_f_samples_full_cov_correlations():
    """full_cov=True samples carry the posterior cross-covariance (diagonal
    sampling would zero it)."""
    model, params, X, y = _toy(num_classes=2)
    # train a little so the posterior correlates nearby inputs
    key = jax.random.PRNGKey(1)
    S = 6000
    s_full = model.predict_f_samples(params, X, num_samples=S, key=key,
                                     full_cov=True)
    assert s_full.shape == (S, X.shape[0], 1)
    _, cov = model.predict_f(params, X, full_cov=True)  # (P, N, N)
    dev = s_full[:, :, 0] - s_full[:, :, 0].mean(0)
    emp = (dev.T @ dev) / S
    scale = float(jnp.max(jnp.abs(cov[0])))
    assert float(jnp.max(jnp.abs(emp - cov[0]))) < 8.0 * scale / np.sqrt(S / 2)


# ---------------------------------------------------------------------------
# trainable Gaussian variance
# ---------------------------------------------------------------------------


def test_gaussian_variance_trains():
    model, params, X, y = _toy(num_classes=0)  # Gaussian(0.5, trainable)
    assert "lik" in params
    lik0 = likelihoods.Gaussian(variance=0.5, trainable=True)
    v0 = float(lik0.variance_of(params["lik"]))
    assert v0 == pytest.approx(0.5, rel=1e-6)

    opt = optax.adam(5e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(model.loss)(p, X, y)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    losses = []
    for _ in range(25):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    v1 = float(likelihoods.Gaussian(trainable=True).variance_of(params["lik"]))
    assert v1 != pytest.approx(0.5, rel=1e-4)  # it moved
    assert np.isfinite(losses[-1]) and losses[-1] < losses[0]


def test_gaussian_fixed_variance_has_no_params():
    lik = likelihoods.Gaussian(variance=0.3)
    assert lik.init_params() == {}
    model, params, X, y = _toy(num_classes=2)
    assert "lik" not in model.init_params()  # Bernoulli carries none


# ---------------------------------------------------------------------------
# MultiClass vectorized predict (VERDICT r3 weak #7)
# ---------------------------------------------------------------------------


def test_multiclass_predict_vectorized_matches_per_class_loop():
    """`_prob_is_largest_all` (one fused graph) == C calls of the
    per-class `_prob_is_largest` (what predict_mean_and_var used to
    unroll), at f64 tightness."""
    C, N = 7, 9
    lik = likelihoods.MultiClass(C)
    Fmu = jnp.asarray(RNG.randn(N, C))
    Fvar = jnp.asarray(np.abs(RNG.randn(N, C)) + 0.05)
    ps_vec = lik._prob_is_largest_all(Fmu, Fvar)
    ps_loop = jnp.stack(
        [lik._prob_is_largest(jnp.full((N, 1), c), Fmu, Fvar)
         for c in range(C)], axis=1)
    np.testing.assert_allclose(np.asarray(ps_vec), np.asarray(ps_loop),
                               rtol=1e-12, atol=1e-14)
    mean, var = lik.predict_mean_and_var(Fmu, Fvar)
    np.testing.assert_allclose(np.asarray(jnp.sum(mean, axis=1)),
                               np.ones(N), rtol=5e-3)
    assert bool(jnp.all(var >= -1e-12))
