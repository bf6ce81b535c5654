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
