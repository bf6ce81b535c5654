"""Round-2 parity closures: mean functions, per-snapshot history, general
lin_interp (VERDICT round-1 items 4, 5, 7)."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from gpsig_tpu import (
    InducingTensors,
    SVGP,
    kernels,
    likelihoods,
    mean_functions,
    training,
    utils as gp_utils,
)
from gpsig_tpu.ops import lags

RNG = np.random.RandomState(17)


def test_lin_interp_general_times_matches_numpy():
    X = RNG.randn(3, 10, 2)
    t = np.sort(RNG.rand(10))
    q = np.linspace(t.min(), t.max(), 7)
    out = np.asarray(lags.lin_interp(X, t, q))
    ref = np.stack([
        np.stack([np.interp(q, t, X[n, :, k]) for k in range(2)], axis=1)
        for n in range(3)
    ])
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-12)


def test_lin_interp_per_sequence_times_and_clamping():
    X = RNG.randn(2, 6, 1)
    t = np.sort(RNG.rand(2, 6), axis=1)
    q = np.array([[-1.0, 0.5, 2.0], [-1.0, 0.5, 2.0]])
    out = np.asarray(lags.lin_interp(X, t, q))
    for n in range(2):
        ref = np.interp(np.clip(q[n], t[n, 0], t[n, -1]), t[n], X[n, :, 0])
        np.testing.assert_allclose(out[n, :, 0], ref, rtol=1e-12)


def test_lin_interp_uniform_consistency():
    X = RNG.randn(2, 9, 2)
    t = np.linspace(0.0, 1.0, 9)
    q = np.array([0.1, 0.45, 0.99])
    general = np.asarray(lags.lin_interp(X, t, q))
    uniform = np.asarray(
        lags.lin_interp_uniform(jnp.asarray(X), jnp.asarray(q[:, None]))
    )[:, :, 0, :]
    np.testing.assert_allclose(general, uniform, rtol=1e-10)


def _toy(n=10, L=8, d=2):
    X = RNG.randn(n, L, d)
    y = RNG.randint(0, 2, n)
    return X, y


def test_svgp_mean_function_shifts_predictive_mean():
    X, y = _toy()
    Z = gp_utils.suggest_initial_inducing_tensors(X, 2, 6, seed=0)
    kern = kernels.SignatureRBF(2, 2)
    m0 = SVGP(kern, InducingTensors(Z, 2), likelihoods.Bernoulli(),
              num_latent=1, num_data=len(y))
    mc = SVGP(kern, InducingTensors(Z, 2), likelihoods.Bernoulli(),
              num_latent=1, num_data=len(y),
              mean_function=mean_functions.Constant(1, value=0.7))
    p0, pc = m0.init_params(), mc.init_params()
    f0, v0 = m0.predict_f(p0, jnp.asarray(X))
    fc, vc = mc.predict_f(pc, jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(fc - f0), 0.7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(vc), np.asarray(v0), rtol=1e-12)


def test_svgp_linear_mean_function_trains():
    X, y = _toy()
    Z = gp_utils.suggest_initial_inducing_tensors(X, 2, 6, seed=1)
    kern = kernels.SignatureRBF(2, 2)
    mf = mean_functions.Linear(X.shape[1] * X.shape[2], 1)
    m = SVGP(kern, InducingTensors(Z, 2), likelihoods.Bernoulli(),
             num_latent=1, num_data=len(y), mean_function=mf)
    p = m.init_params()
    assert "mean" in p
    Yj = jnp.asarray(y[:, None].astype(np.float64))
    g = jax.grad(lambda pp: m.loss(pp, jnp.asarray(X), Yj))(p)
    leaves = jax.tree.leaves(g["mean"])
    assert all(np.all(np.isfinite(np.asarray(v))) for v in leaves)


def test_optimize_save_params_history():
    X, y = _toy()
    Z = gp_utils.suggest_initial_inducing_tensors(X, 2, 4, seed=2)
    kern = kernels.SignatureRBF(2, 2)
    m = SVGP(kern, InducingTensors(Z, 2), likelihoods.Bernoulli(),
             num_latent=1, num_data=len(y))
    p = m.init_params()
    Xj, Yj = jnp.asarray(X), jnp.asarray(y[:, None].astype(np.float64))
    hist = training.optimize(
        lambda pp, a, b: m.loss(pp, a, b), p, optax.nadam(1e-2), max_iter=4,
        data_iter=iter(lambda: (Xj, Yj), None), save_freq=2, print_freq=100,
        save_params_history=True,
    )
    for it in (2, 4):
        assert "params" in hist[it]
        assert set(hist[it]["params"].keys()) == set(p.keys())
    # default: no params in snapshots
    hist2 = training.optimize(
        lambda pp, a, b: m.loss(pp, a, b), p, optax.nadam(1e-2), max_iter=2,
        data_iter=iter(lambda: (Xj, Yj), None), save_freq=2, print_freq=100,
    )
    assert "params" not in hist2[2]


def test_multiclass_gh100_vs_gh20_nlpp_delta_bounded():
    """Quantitative bound on the documented GH-grid divergence
    (`likelihoods.py:106-113`): the nlpp / variational-expectation deltas
    between our 100-point default and GPflow's 20-point grid are far below
    the reference tables' reported stds (~1e-2)."""
    rng = np.random.RandomState(11)
    N, C = 200, 10
    Fmu = jnp.asarray(rng.randn(N, C))
    Fvar = jnp.asarray(np.exp(rng.randn(N, C)))  # heteroscedastic, wide
    Y = jnp.asarray(rng.randint(0, C, (N, 1)).astype(np.float64))
    lik100 = likelihoods.MultiClass(C)  # default num_gh=100
    lik20 = likelihoods.MultiClass(C, num_gh=20)
    assert lik100.num_gh == 100

    ve100 = np.asarray(lik100.variational_expectations(Fmu, Fvar, Y))
    ve20 = np.asarray(lik20.variational_expectations(Fmu, Fvar, Y))
    # per-point, GH-20 can be off by ~1e-1 in log space on wide
    # heteroscedastic variances (measured 0.11 on this draw) — exactly the
    # failure mode the 100-point default removes; the *mean* delta (what
    # enters a dataset nlpp) stays ~1e-3
    assert np.max(np.abs(ve100 - ve20)) < 0.3
    assert np.mean(np.abs(ve100 - ve20)) < 5e-3

    ld100 = np.asarray(lik100.predict_log_density(Fmu, Fvar, Y))
    ld20 = np.asarray(lik20.predict_log_density(Fmu, Fvar, Y))
    # nlpp is the mean of -log density: the dataset-level quantity compared
    # against the published tables moves by far less than their ±std (~1e-2)
    assert abs(np.mean(ld100) - np.mean(ld20)) < 5e-3
    assert np.max(np.abs(ld100 - ld20)) < 0.3


def test_multi_optimizer_var_list_phases():
    """Reference `training.py:141-164`: a list of (optimizer, var_list)
    pairs runs in ONE phase, each optimizer updating its own subset;
    unmatched parameters stay frozen."""
    rng = np.random.RandomState(3)
    X = rng.randn(10, 6, 2)
    y = (X[:, :, 0].mean(axis=1) > 0).astype(np.float64)
    Z = gp_utils.suggest_initial_inducing_tensors(X, 2, 4, seed=2)
    kern = kernels.SignatureRBF(2, 2)
    m = SVGP(kern, InducingTensors(Z, 2), likelihoods.Bernoulli(),
             num_latent=1, num_data=len(y))
    p0 = m.init_params()
    Xj, Yj = jnp.asarray(X), jnp.asarray(y[:, None].astype(np.float64))
    pairs = [
        (optax.nadam(1e-2), lambda n: n.startswith("q_")),      # variational
        (optax.sgd(1e-3), lambda n: n.startswith("kern")),      # kernel
        # everything else (inducing Z) unmatched -> frozen
    ]
    hist = training.optimize(
        lambda pp, a, b: m.loss(pp, a, b), p0, pairs, max_iter=5,
        data_iter=iter(lambda: (Xj, Yj), None), save_freq=5, print_freq=100,
    )
    pf = hist["final_params"]

    def moved(a, b):
        return any(
            float(jnp.max(jnp.abs(x - y))) > 0
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    assert moved(pf["q_mu"], p0["q_mu"])
    assert moved(pf["kern"], p0["kern"])
    assert not moved(pf["ind"], p0["ind"])  # unmatched -> frozen


def test_lr_hadamard_dense_variants_unbiased():
    """Dense Rademacher / Gaussian JL samplers
    (`low_rank_calculations.py:92-149`): implied Grams are unbiased
    estimates of the exact Hadamard-product Gram."""
    from gpsig_tpu.ops import low_rank

    rng = np.random.RandomState(0)
    A = jnp.asarray(rng.randn(12, 6))
    B = jnp.asarray(rng.randn(12, 5))
    exact = low_rank.lr_hadamard_prod(A, B)
    G_exact = np.asarray(exact @ exact.T)
    for dist in ("rademacher", "gauss"):
        samples = []
        for s in range(200):
            Phi = low_rank.lr_hadamard_prod_rand(
                jax.random.PRNGKey(s), A, B, 30, dist
            )
            samples.append(np.asarray(Phi @ Phi.T))
        G_mc = np.mean(samples, axis=0)
        scale = np.abs(G_exact).max()
        err = np.abs(G_mc - G_exact).max() / scale
        assert err < 0.15, (dist, err)
    # and the kernel ctor accepts the new sparsity modes
    kernels.SignatureRBF(2, 2, low_rank=True, num_components=8,
                         sparsity="rademacher")
    kernels.SignatureRBF(2, 2, low_rank=True, num_components=8,
                         sparsity="gauss")
