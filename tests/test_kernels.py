"""SignatureKernel orchestration tests (float64, CPU).

The order=num_levels / SignatureLinear / normalization=False cases reproduce
the reference's esig cross-validation (`notebooks/signature_kernel.ipynb`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpsig_tpu import kernels

import oracles

RNG = np.random.RandomState(7)


def _paths(n, l, d):
    return RNG.randn(n, l, d) / np.sqrt(l)


class TestSequenceKernel:
    def test_linear_exact_vs_signature_oracle(self):
        # `signature_kernel.ipynb` cell 13 equivalent
        M, N, L, d = 4, 5, 9, 3
        X = _paths(N, L, d)
        k = kernels.SignatureLinear(
            d, M, order=M, normalization=False, lengthscales=None
        )
        params = k.init_params()
        K_lvls = k.K(params, jnp.asarray(X), return_levels=True)
        expect = oracles.signature_gram(X, M)
        np.testing.assert_allclose(
            np.asarray(K_lvls), expect, rtol=1e-8, atol=1e-12
        )

    def test_flattened_input_equivalent(self):
        X = _paths(4, 6, 2)
        k = kernels.SignatureRBF(2, 3, normalization=False)
        params = k.init_params()
        K3 = k.K(params, jnp.asarray(X))
        K2 = k.K(params, jnp.asarray(X.reshape(4, -1)))
        np.testing.assert_allclose(np.asarray(K3), np.asarray(K2), rtol=1e-12)

    def test_cross_matches_joint_blocks(self):
        X, X2 = _paths(3, 7, 2), _paths(4, 7, 2)
        k = kernels.SignatureRBF(2, 3, normalization=True)
        params = k.init_params()
        Kx = k.K(params, jnp.asarray(X), jnp.asarray(X2))
        K_all = k.K(params, jnp.asarray(np.concatenate([X, X2], axis=0)))
        np.testing.assert_allclose(
            np.asarray(Kx), np.asarray(K_all)[:3, 3:], rtol=1e-7
        )

    def test_normalized_diag_is_sigma_variances(self):
        X = _paths(4, 6, 2)
        k = kernels.SignatureRBF(2, 3, normalization=True, variances=2.0)
        params = k.init_params()
        Kd = k.Kdiag(params, jnp.asarray(X))
        cp = k.constrain(params)
        expect = float(cp["sigma"] * jnp.sum(cp["variances"]))
        np.testing.assert_allclose(np.asarray(Kd), expect, rtol=1e-9)
        # and the full-K diagonal agrees
        K = k.K(params, jnp.asarray(X))
        np.testing.assert_allclose(np.diag(np.asarray(K)), expect, rtol=1e-5)

    def test_unnormalized_kdiag_matches_k_diag(self):
        X = _paths(4, 6, 2)
        k = kernels.SignatureMatern32(2, 3, normalization=False)
        params = k.init_params()
        K = k.K(params, jnp.asarray(X))
        Kd = k.Kdiag(params, jnp.asarray(X))
        np.testing.assert_allclose(np.diag(np.asarray(K)), np.asarray(Kd), rtol=1e-10)

    @pytest.mark.parametrize(
        "ctor",
        [
            kernels.SignatureLinear,
            kernels.SignatureCosine,
            kernels.SignaturePoly,
            kernels.SignatureRBF,
            kernels.SignatureMix,
            kernels.SignatureMatern12,
            kernels.SignatureMatern32,
            kernels.SignatureMatern52,
        ],
    )
    def test_all_base_kernels_psd_and_symmetric(self, ctor):
        X = _paths(5, 6, 2)
        k = ctor(2, 3)
        params = k.init_params()
        K = np.asarray(k.K(params, jnp.asarray(X)))
        np.testing.assert_allclose(K, K.T, rtol=1e-9)
        evals = np.linalg.eigvalsh(K)
        assert evals.min() > -1e-8

    def test_spectral_kernel_runs(self):
        X = _paths(3, 5, 2)
        for family in ("rbf", "exp", "mixed"):
            k = kernels.SignatureSpectral(2, 3, family=family, Q=4)
            params = k.init_params(jax.random.PRNGKey(0))
            K = np.asarray(k.K(params, jnp.asarray(X)))
            np.testing.assert_allclose(K, K.T, rtol=1e-8)

    def test_lengthscale_scaling_equals_prescaled_input(self):
        X = _paths(3, 6, 2)
        ls = np.array([0.5, 2.0])
        k = kernels.SignatureRBF(2, 3, normalization=False, lengthscales=ls)
        k0 = kernels.SignatureRBF(2, 3, normalization=False, lengthscales=None)
        p, p0 = k.init_params(), k0.init_params()
        K = k.K(p, jnp.asarray(X))
        K0 = k0.K(p0, jnp.asarray(X / ls))
        np.testing.assert_allclose(np.asarray(K), np.asarray(K0), rtol=1e-9)

    def test_lags_run_and_change_result(self):
        X = _paths(3, 8, 2)
        k = kernels.SignatureRBF(2, 3, num_lags=1)
        k0 = kernels.SignatureRBF(2, 3)
        K = np.asarray(k.K(k.init_params(), jnp.asarray(X)))
        K0 = np.asarray(k0.K(k0.init_params(), jnp.asarray(X)))
        assert K.shape == K0.shape
        assert not np.allclose(K, K0)

    def test_grad_flows(self):
        X = jnp.asarray(_paths(3, 6, 2))
        k = kernels.SignatureRBF(2, 3)
        params = k.init_params()
        g = jax.grad(lambda p: jnp.sum(k.K(p, X)))(params)
        for name, val in g.items():
            assert np.all(np.isfinite(np.asarray(val))), name
        assert float(jnp.sum(jnp.abs(g["lengthscales"]))) > 0


class TestTensorKernels:
    def _packed_tensors(self, M, nT, d, increments=False):
        len_tensors = M * (M + 1) // 2
        if increments:
            return RNG.randn(len_tensors, nT, 2, d)
        return RNG.randn(len_tensors, nT, d)

    def test_k_tens_vs_oracle(self):
        M, nT, d = 4, 5, 3
        Z = self._packed_tensors(M, nT, d)
        k = kernels.SignatureLinear(d, M, order=M, normalization=False,
                                    lengthscales=None)
        params = k.init_params()
        K = k.K_tens(params, jnp.asarray(Z), return_levels=True)
        expect = oracles.tensor_vs_tensor(Z, M)
        np.testing.assert_allclose(np.asarray(K), expect, rtol=1e-9)

    def test_k_tens_increments_vs_oracle(self):
        M, nT, d = 3, 4, 2
        Z = self._packed_tensors(M, nT, d, increments=True)
        k = kernels.SignatureLinear(d, M, order=M, normalization=False,
                                    lengthscales=None)
        params = k.init_params()
        K = k.K_tens(params, jnp.asarray(Z), increments=True, return_levels=True)
        expect = oracles.tensor_vs_tensor(Z, M, increments=True)
        np.testing.assert_allclose(np.asarray(K), expect, rtol=1e-9)

    def test_k_tens_vs_seq_exact_oracle(self):
        # `signature_kernel.ipynb` cells 18-23 equivalent
        M, nT, d, N, L = 4, 3, 2, 3, 8
        Z = self._packed_tensors(M, nT, d)
        X = _paths(N, L, d)
        k = kernels.SignatureLinear(d, M, order=M, normalization=False,
                                    lengthscales=None)
        params = k.init_params()
        K = k.K_tens_vs_seq(params, jnp.asarray(Z), jnp.asarray(X),
                            return_levels=True)
        expect = oracles.tensor_vs_signature(Z, X, M)
        np.testing.assert_allclose(np.asarray(K), expect, rtol=1e-8, atol=1e-12)

    def test_k_tens_vs_seq_increments_oracle(self):
        M, nT, d, N, L = 3, 3, 2, 2, 7
        Z = self._packed_tensors(M, nT, d, increments=True)
        X = _paths(N, L, d)
        k = kernels.SignatureLinear(d, M, order=M, normalization=False,
                                    lengthscales=None)
        params = k.init_params()
        K = k.K_tens_vs_seq(params, jnp.asarray(Z), jnp.asarray(X),
                            increments=True, return_levels=True)
        expect = oracles.tensor_vs_signature(Z, X, M, increments=True)
        np.testing.assert_allclose(np.asarray(K), expect, rtol=1e-8, atol=1e-12)

    def test_fused_covs_match_individual_calls(self):
        M, nT, d, N, L = 3, 4, 2, 3, 6
        Z = self._packed_tensors(M, nT, d)
        X = _paths(N, L, d)
        k = kernels.SignatureRBF(d, M, normalization=True)
        params = k.init_params()
        Kzz, Kzx, Kxx = k.K_tens_n_seq_covs(params, jnp.asarray(Z), jnp.asarray(X))
        np.testing.assert_allclose(
            np.asarray(Kzz), np.asarray(k.K_tens(params, jnp.asarray(Z))), rtol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(Kzx),
            np.asarray(k.K_tens_vs_seq(params, jnp.asarray(Z), jnp.asarray(X))),
            rtol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(Kxx), np.asarray(k.Kdiag(params, jnp.asarray(X))), rtol=1e-10
        )

    def test_fused_covs_full_x_cov(self):
        M, nT, d, N, L = 3, 4, 2, 3, 6
        Z = self._packed_tensors(M, nT, d)
        X = _paths(N, L, d)
        k = kernels.SignatureRBF(d, M, normalization=True)
        params = k.init_params()
        Kzz, Kzx, Kxx = k.K_tens_n_seq_covs(
            params, jnp.asarray(Z), jnp.asarray(X), full_X_cov=True
        )
        np.testing.assert_allclose(
            np.asarray(Kxx), np.asarray(k.K(params, jnp.asarray(X))), rtol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(Kzx),
            np.asarray(k.K_tens_vs_seq(params, jnp.asarray(Z), jnp.asarray(X))),
            rtol=1e-10,
        )

    def test_seq_n_seq_covs(self):
        d, M = 2, 3
        Zs = _paths(4, 5, d)  # inducing sequences
        X = _paths(3, 6, d)
        k = kernels.SignatureRBF(d, M, normalization=True)
        params = k.init_params()
        Kzz, Kzx, Kxx = k.K_seq_n_seq_covs(params, jnp.asarray(Zs), jnp.asarray(X))
        np.testing.assert_allclose(
            np.asarray(Kzz), np.asarray(k.K(params, jnp.asarray(Zs))), rtol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(Kzx),
            np.asarray(k.K(params, jnp.asarray(Zs), jnp.asarray(X))),
            rtol=1e-10,
        )
        np.testing.assert_allclose(
            np.asarray(Kxx), np.asarray(k.Kdiag(params, jnp.asarray(X))), rtol=1e-10
        )
        # full_X2_cov branch (broken in the reference, fixed here)
        Kzz2, Kzx2, Kxx2 = k.K_seq_n_seq_covs(
            params, jnp.asarray(Zs), jnp.asarray(X), full_X2_cov=True
        )
        np.testing.assert_allclose(
            np.asarray(Kxx2), np.asarray(k.K(params, jnp.asarray(X))), rtol=1e-10
        )


class TestLowRank:
    def test_exact_low_rank_matches_full(self):
        # full-component Nystrom + exact Hadamard == full-rank kernel
        # (up to Nystrom's random diagonal jitter ~1e-6 and relative
        # spectral truncation, hence the loose tolerance)
        N, L, d, M = 3, 4, 2, 3
        X = np.random.RandomState(123).randn(N, L, d)
        k_full = kernels.SignatureRBF(d, M, normalization=True)
        k_lr = kernels.SignatureRBF(
            d, M, normalization=True, low_rank=True,
            num_components=N * L, sparsity="exact",
        )
        p = k_full.init_params()
        K_full = k_full.K(p, jnp.asarray(X))
        K_lr = k_lr.K(p, jnp.asarray(X), key=jax.random.PRNGKey(3))
        np.testing.assert_allclose(np.asarray(K_lr), np.asarray(K_full), rtol=2e-4)

    def test_sparse_low_rank_runs_and_is_consistent(self):
        N, L, d, M = 6, 5, 2, 3
        X = _paths(N, L, d)
        k_lr = kernels.SignatureRBF(
            d, M, normalization=True, low_rank=True,
            num_components=20, rank_bound=30, sparsity="sqrt",
        )
        p = k_lr.init_params()
        key = jax.random.PRNGKey(0)
        K = np.asarray(k_lr.K(p, jnp.asarray(X), key=key))
        np.testing.assert_allclose(K, K.T, rtol=1e-8)
        # cross-covariance consistency: K(X, X) with shared key ~ K(X)
        Kx = np.asarray(k_lr.K(p, jnp.asarray(X), jnp.asarray(X), key=key))
        assert np.all(np.isfinite(Kx))

    def test_low_rank_tens_vs_seq_runs(self):
        M, nT, d, N, L = 3, 4, 2, 3, 5
        len_tensors = M * (M + 1) // 2
        Z = RNG.randn(len_tensors, nT, d)
        X = _paths(N, L, d)
        k_lr = kernels.SignatureRBF(
            d, M, normalization=True, low_rank=True,
            num_components=10, rank_bound=15,
        )
        p = k_lr.init_params()
        Kzz, Kzx, Kxx = k_lr.K_tens_n_seq_covs(
            p, jnp.asarray(Z), jnp.asarray(X), key=jax.random.PRNGKey(1)
        )
        assert np.all(np.isfinite(np.asarray(Kzx)))
        assert Kzx.shape == (nT, N)


class TestFusedDispatchControl:
    """Public fused-dispatch knob (`fused='auto'|'on'|'off'`) replacing the
    former _fused_tens_ok monkeypatch in bench.py."""

    def test_ctor_validates_knob(self):
        with pytest.raises(ValueError, match="fused"):
            kernels.SignatureRBF(2, 3, fused="sometimes")

    def test_off_never_dispatches_even_when_supported(self, monkeypatch):
        k = kernels.SignatureRBF(2, 3, fused="off")
        # fake a supported configuration (TPU backend, f32 regime)
        monkeypatch.setattr(kernels.jax, "default_backend", lambda: "tpu")
        jax.config.update("jax_enable_x64", False)
        try:
            assert k._fused_supported()
            assert not k._fused_tens_ok()
        finally:
            jax.config.update("jax_enable_x64", True)

    def test_auto_dispatches_only_when_supported(self, monkeypatch):
        k = kernels.SignatureRBF(2, 3, fused="auto")
        # tests run on CPU/f64: unsupported -> XLA path
        assert not k._fused_tens_ok()
        monkeypatch.setattr(kernels.jax, "default_backend", lambda: "tpu")
        jax.config.update("jax_enable_x64", False)
        try:
            assert k._fused_tens_ok()
        finally:
            jax.config.update("jax_enable_x64", True)

    def test_on_raises_when_unsupported(self):
        k = kernels.SignatureRBF(2, 3, fused="on")
        # CPU/f64 test regime does not support the fused kernels
        with pytest.raises(ValueError, match="fused='on'"):
            k._fused_tens_ok()

    def test_fast_math_knob_stored_and_threaded(self):
        k = kernels.SignatureRBF(2, 3, fast_math=False)
        assert k.fast_math is False
        assert kernels.SignatureRBF(2, 3).fast_math == "high"
