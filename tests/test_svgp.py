"""SVGP model layer: linalg, likelihoods, ELBO training end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpsig_tpu import (
    InducingSequences,
    InducingTensors,
    SVGP,
    kernels,
    likelihoods,
    linalg,
    training,
    utils as gp_utils,
)

RNG = np.random.RandomState(11)


class TestLinalg:
    def test_base_conditional_against_naive_gp(self):
        M, N, P = 6, 5, 2
        A = RNG.randn(M, M)
        Kmm = A @ A.T + 1e-6 * np.eye(M)
        Kmn = RNG.randn(M, N)
        Knn = np.abs(RNG.randn(N)) + 5.0
        f = RNG.randn(M, P)

        mean, var = linalg.base_conditional(
            jnp.asarray(Kmn), jnp.asarray(Kmm), jnp.asarray(Knn),
            jnp.asarray(f), white=False,
        )
        expect_mean = Kmn.T @ np.linalg.solve(Kmm, f)
        expect_var = Knn - np.einsum(
            "mn,mn->n", Kmn, np.linalg.solve(Kmm, Kmn)
        )
        np.testing.assert_allclose(np.asarray(mean), expect_mean, rtol=1e-8)
        np.testing.assert_allclose(
            np.asarray(var), np.tile(expect_var[:, None], (1, P)), rtol=1e-8
        )

    def test_base_conditional_white_with_qsqrt(self):
        M, N, P = 4, 3, 1
        A = RNG.randn(M, M)
        Kmm = A @ A.T + 1e-6 * np.eye(M)
        Kmn = RNG.randn(M, N)
        Knn = np.abs(RNG.randn(N)) + 5.0
        f = RNG.randn(M, P)
        q_sqrt = np.tril(RNG.randn(P, M, M))

        mean, var = linalg.base_conditional(
            jnp.asarray(Kmn), jnp.asarray(Kmm), jnp.asarray(Knn),
            jnp.asarray(f), q_sqrt=jnp.asarray(q_sqrt), white=True,
        )
        L = np.linalg.cholesky(Kmm)
        A_ = np.linalg.solve(L, Kmn)
        expect_mean = A_.T @ f
        S = q_sqrt[0] @ q_sqrt[0].T
        expect_var = Knn - np.einsum("mn,mn->n", A_, A_) + np.einsum(
            "mn,mk,kn->n", A_, S, A_
        )
        np.testing.assert_allclose(np.asarray(mean), expect_mean, rtol=1e-8)
        np.testing.assert_allclose(np.asarray(var)[:, 0], expect_var, rtol=1e-8)

    def test_gauss_kl_white_vs_naive(self):
        M, P = 5, 3
        q_mu = RNG.randn(M, P)
        q_sqrt = np.tril(RNG.randn(P, M, M) + 2 * np.eye(M))
        kl = float(linalg.gauss_kl(jnp.asarray(q_mu), jnp.asarray(q_sqrt)))
        expect = 0.0
        for p in range(P):
            S = q_sqrt[p] @ q_sqrt[p].T
            expect += 0.5 * (
                q_mu[:, p] @ q_mu[:, p] + np.trace(S) - M
                - np.linalg.slogdet(S)[1]
            )
        np.testing.assert_allclose(kl, expect, rtol=1e-9)

    def test_gauss_kl_nonwhite_vs_naive(self):
        M, P = 5, 2
        q_mu = RNG.randn(M, P)
        q_sqrt = np.tril(RNG.randn(P, M, M) + 2 * np.eye(M))
        A = RNG.randn(M, M)
        K = A @ A.T + M * np.eye(M)
        kl = float(
            linalg.gauss_kl(jnp.asarray(q_mu), jnp.asarray(q_sqrt),
                            K=jnp.asarray(K))
        )
        Kinv = np.linalg.inv(K)
        expect = 0.0
        for p in range(P):
            S = q_sqrt[p] @ q_sqrt[p].T
            expect += 0.5 * (
                q_mu[:, p] @ Kinv @ q_mu[:, p] + np.trace(Kinv @ S) - M
                - np.linalg.slogdet(S)[1] + np.linalg.slogdet(K)[1]
            )
        np.testing.assert_allclose(kl, expect, rtol=1e-8)

    def test_gauss_kl_diag_matches_full(self):
        M, P = 4, 2
        q_mu = RNG.randn(M, P)
        d = np.abs(RNG.randn(M, P)) + 0.5
        kl_diag = float(linalg.gauss_kl(jnp.asarray(q_mu), jnp.asarray(d)))
        q_full = np.zeros((P, M, M))
        for p in range(P):
            q_full[p] = np.diag(d[:, p])
        kl_full = float(linalg.gauss_kl(jnp.asarray(q_mu), jnp.asarray(q_full)))
        np.testing.assert_allclose(kl_diag, kl_full, rtol=1e-10)


class TestLikelihoods:
    def test_bernoulli_ve_vs_monte_carlo(self):
        lik = likelihoods.Bernoulli(num_gh=50)
        Fmu = jnp.asarray([[0.3], [-1.2]])
        Fvar = jnp.asarray([[0.5], [2.0]])
        Y = jnp.asarray([[1.0], [0.0]])
        ve = np.asarray(lik.variational_expectations(Fmu, Fvar, Y))
        from scipy.special import erf

        f = np.asarray(Fmu)[:, :, None] + np.sqrt(np.asarray(Fvar))[:, :, None] \
            * RNG.randn(2, 1, 400000)
        p = 0.5 * (1 + erf(f / np.sqrt(2))) * (1 - 2e-3) + 1e-3
        lp = np.where(np.asarray(Y)[:, :, None] > 0.5, np.log(p), np.log1p(-p))
        mc = lp.mean(axis=-1)
        np.testing.assert_allclose(ve, mc, atol=5e-3)

    def test_bernoulli_predict_density_consistent(self):
        lik = likelihoods.Bernoulli()
        Fmu, Fvar = jnp.asarray([[0.7]]), jnp.asarray([[1.3]])
        p1 = float(jnp.exp(lik.predict_log_density(Fmu, Fvar, jnp.asarray([[1.0]])))[0])
        p0 = float(jnp.exp(lik.predict_log_density(Fmu, Fvar, jnp.asarray([[0.0]])))[0])
        np.testing.assert_allclose(p0 + p1, 1.0, rtol=1e-6)

    def test_multiclass_probs_sum_to_one(self):
        C = 4
        lik = likelihoods.MultiClass(C)
        Fmu = jnp.asarray(RNG.randn(6, C))
        Fvar = jnp.asarray(np.abs(RNG.randn(6, C)) + 0.1)
        mean, var = lik.predict_mean_and_var(Fmu, Fvar)
        np.testing.assert_allclose(np.asarray(mean).sum(axis=1), 1.0, atol=2e-3)
        assert np.all(np.asarray(var) >= -1e-9)

    def test_multiclass_ve_bounds(self):
        C = 3
        lik = likelihoods.MultiClass(C)
        Fmu = jnp.asarray(RNG.randn(5, C))
        Fvar = jnp.asarray(np.abs(RNG.randn(5, C)) + 0.1)
        Y = jnp.asarray(RNG.randint(0, C, size=(5, 1)).astype(np.float64))
        ve = np.asarray(lik.variational_expectations(Fmu, Fvar, Y))
        lo = np.log(lik.epsilon / (C - 1))
        hi = np.log(1 - lik.epsilon)
        assert np.all(ve >= lo - 1e-9) and np.all(ve <= hi + 1e-9)

    def test_multiclass_confident_prediction(self):
        C = 3
        lik = likelihoods.MultiClass(C)
        Fmu = jnp.asarray([[10.0, 0.0, 0.0]])
        Fvar = jnp.asarray([[0.01, 0.01, 0.01]])
        mean, _ = lik.predict_mean_and_var(Fmu, Fvar)
        assert float(mean[0, 0]) > 0.99

    def test_multiclass_gh_grid_divergence_bounded(self):
        """Quantify the documented GH=100-vs-20 divergence (VERDICT round-2
        item 9): the rebuild defaults to 100 GH points where GPflow uses 20
        (`likelihoods.py` MultiClass docstring).  Bound the nlpp delta
        between the two grids.  Measured facts this test pins (CPU f64):
        in the well-conditioned regime GH=100 is converged to ~6e-8 while
        GH=20 is off by up to 1.6e-2 per-example; in the adversarial regime
        (selected latent's variance dwarfs the others', integrand
        degenerates toward a step) *no* GH grid converges fast, but the
        aggregate nlpp — what the benchmark tables report — moves by <1e-2
        between the grids."""
        C = 5
        rng = np.random.RandomState(3)
        N = 64
        Fmu = rng.randn(N, C)
        Fvar = np.abs(rng.randn(N, C)) * 0.5 + 0.05
        # adversarial tail: selected latent much wider than the rest
        Fvar[: N // 4, 0] = 25.0
        Y = np.zeros((N, 1))
        Fmu_j, Fvar_j, Y_j = map(jnp.asarray, (Fmu, Fvar, Y))

        ld = {
            g: np.asarray(
                likelihoods.MultiClass(C, num_gh=g).predict_log_density(
                    Fmu_j, Fvar_j, Y_j)
            )
            for g in (20, 100, 180)
        }
        well = slice(N // 4, N)  # rows without the inflated variance
        # well-conditioned: 100 points is converged to float noise...
        assert np.max(np.abs(ld[100][well] - ld[180][well])) < 1e-6
        # ...while the GPflow-default 20-point grid is visibly off — the
        # documented divergence, pinned so it can't silently grow
        delta20 = np.max(np.abs(ld[20][well] - ld[180][well]))
        assert 1e-4 < delta20 < 5e-2, delta20
        # degenerate-step regime: quadrature converges slowly for any grid;
        # bound the worst per-example 20-vs-100 disagreement
        assert np.max(np.abs(ld[20] - ld[100])) < 0.3
        # aggregate nlpp (what the benchmark tables report) moves by <1e-2
        assert abs(ld[20].mean() - ld[100].mean()) < 1e-2


def _toy_classification(n_per_class=20, L=20, d=2, seed=0):
    """Two classes of noisy paths: sinusoid vs straight line."""
    rng = np.random.RandomState(seed)
    t = np.linspace(0, 1, L)
    X0 = np.stack(
        [np.stack([t, np.sin(4 * t + rng.randn() * 0.3)], axis=1)
         + 0.05 * rng.randn(L, d) for _ in range(n_per_class)]
    )
    X1 = np.stack(
        [np.stack([t, t * (1 + 0.2 * rng.randn())], axis=1)
         + 0.05 * rng.randn(L, d) for _ in range(n_per_class)]
    )
    X = np.concatenate([X0, X1]).astype(np.float64)
    y = np.concatenate([np.zeros(n_per_class), np.ones(n_per_class)])
    perm = rng.permutation(len(y))
    return X[perm], y[perm]


class TestSVGPEndToEnd:
    def test_elbo_increases_and_classifies(self):
        X, y = _toy_classification()
        num_levels, num_inducing = 3, 16
        Z = gp_utils.suggest_initial_inducing_tensors(
            X, num_levels, num_inducing, labels=y.astype(int),
            increments=True, seed=0,
        )
        ls = gp_utils.suggest_initial_lengthscales(X)
        kern = kernels.SignatureRBF(2, num_levels, lengthscales=ls)
        ind = InducingTensors(Z, num_levels, increments=True)
        lik = likelihoods.Bernoulli()
        model = SVGP(kern, ind, lik, num_latent=1, num_data=len(y))

        params = model.init_params(jax.random.PRNGKey(0))
        Xj, Yj = jnp.asarray(X), jnp.asarray(y[:, None])

        elbo0 = float(model.elbo(params, Xj, Yj))

        import optax

        hist = training.optimize(
            lambda p, x, yy: model.loss(p, x, yy),
            params, optax.nadam(1e-2), max_iter=120,
            data_iter=iter(lambda: (Xj, Yj), None),
            print_freq=1000, save_freq=60,
        )
        params = hist["final_params"]
        elbo1 = float(model.elbo(params, Xj, Yj))
        assert elbo1 > elbo0 + 10.0, (elbo0, elbo1)

        pmean, _ = model.predict_y(params, Xj)
        acc = np.mean((np.asarray(pmean)[:, 0] > 0.5) == y)
        assert acc >= 0.9, acc

        # log-density is finite and reasonable
        lds = model.predict_log_density(params, Xj, Yj)
        assert np.all(np.isfinite(np.asarray(lds)))

    def test_multiclass_and_inducing_sequences(self):
        X, y = _toy_classification(n_per_class=8, L=12)
        y3 = y.copy()
        y3[:8] = 2  # make a (noisy) third class for shape coverage
        num_levels = 3
        Z = gp_utils.suggest_initial_inducing_sequences(X, 8, 5, seed=1)
        kern = kernels.SignatureRBF(2, num_levels)
        ind = InducingSequences(Z, num_levels)
        lik = likelihoods.MultiClass(3)
        model = SVGP(kern, ind, lik, num_latent=3, num_data=len(y3))
        params = model.init_params()
        Xj, Yj = jnp.asarray(X), jnp.asarray(y3[:, None])
        e = float(model.elbo(params, Xj, Yj))
        assert np.isfinite(e)
        g = jax.grad(lambda p: model.loss(p, Xj, Yj))(params)
        assert all(np.all(np.isfinite(np.asarray(v))) for v in jax.tree.leaves(g))

    def test_trainable_mask_freezes_kernel(self):
        X, y = _toy_classification(n_per_class=6, L=8)
        num_levels = 2
        Z = gp_utils.suggest_initial_inducing_tensors(X, num_levels, 6, seed=2)
        kern = kernels.SignatureRBF(2, num_levels)
        ind = InducingTensors(Z, num_levels)
        model = SVGP(kern, ind, likelihoods.Bernoulli(), num_latent=1,
                     num_data=len(y))
        params = model.init_params()
        Xj, Yj = jnp.asarray(X), jnp.asarray(y[:, None])

        import optax

        hist = training.optimize(
            lambda p, x, yy: model.loss(p, x, yy),
            params, optax.nadam(1e-2), max_iter=5,
            data_iter=iter(lambda: (Xj, Yj), None),
            trainable=lambda name: not name.startswith("kern"),
            print_freq=1000, save_freq=5,
        )
        p1 = hist["final_params"]
        for name, v0 in params["kern"].items():
            np.testing.assert_array_equal(np.asarray(p1["kern"][name]),
                                          np.asarray(v0))
        assert not np.allclose(np.asarray(p1["q_mu"]), np.asarray(params["q_mu"]))

    def test_learn_weights_path(self):
        X, y = _toy_classification(n_per_class=6, L=8)
        num_levels = 2
        Z = gp_utils.suggest_initial_inducing_tensors(X, num_levels, 6, seed=3)
        kern = kernels.SignatureRBF(2, num_levels)
        ind = InducingTensors(Z, num_levels, learn_weights=True)
        model = SVGP(kern, ind, likelihoods.Bernoulli(), num_latent=1,
                     num_data=len(y))
        params = model.init_params()
        assert "W" in params["ind"]
        e = float(model.elbo(params, jnp.asarray(X), jnp.asarray(y[:, None])))
        assert np.isfinite(e)
        # with W = identity, matches the unweighted model
        ind0 = InducingTensors(Z, num_levels)
        model0 = SVGP(kern, ind0, likelihoods.Bernoulli(), num_latent=1,
                      num_data=len(y))
        p0 = dict(params)
        p0["ind"] = {"Z": params["ind"]["Z"]}
        e0 = float(model0.elbo(p0, jnp.asarray(X), jnp.asarray(y[:, None])))
        np.testing.assert_allclose(e, e0, rtol=1e-9)
