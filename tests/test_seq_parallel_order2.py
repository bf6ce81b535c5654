"""Sequence parallelism at discretization order > 1 (VERDICT r4 item 5).

The order>1 recursions (`signature_algs.py:37-74` grid, `:129-160` dep
list) add only chunk-local elementwise partial tensors on top of the
order-1 carry structure — these tests pin exact (f64) equality between the
carry implementations on an 8-virtual-device 'seq' mesh and the direct
single-device recursions, at the raw-recursion, kernel-API, and SVGP-step
levels."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import pytest

from gpsig_tpu.ops import signature as sig_ops
from gpsig_tpu.parallel import seq_parallel

RNG = np.random.RandomState(37)


def _seq_mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), axis_names=("seq",))


class TestRawRecursionsHigherOrder:
    @pytest.mark.parametrize("order", [2, 3])
    def test_tens_vs_seq(self, order):
        M_lvls, nT, N, L = 4, 5, 6, 33  # L-1 = 32, 8 chunks of 4
        len_tensors = M_lvls * (M_lvls + 1) // 2
        Z = RNG.randn(len_tensors, nT, 2)
        X = RNG.randn(N, L, 2) / np.sqrt(L)
        M_pts = jnp.asarray(np.einsum("kid,nld->kinl", Z, X))
        ref = sig_ops.signature_kern_tens_vs_seq_higher_order(
            M_pts, M_lvls, order=order
        )

        M_inc = M_pts[..., 1:] - M_pts[..., :-1]
        mesh = _seq_mesh()
        M_inc_s = jax.device_put(
            M_inc, NamedSharding(mesh, P(None, None, None, "seq"))
        )
        out = seq_parallel.tens_vs_seq_levels_seq_parallel(
            mesh, M_inc_s, M_lvls, order=order
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-10)

    @pytest.mark.parametrize("order", [2, 3])
    def test_seq_diag(self, order):
        M_lvls, N, L = 4, 5, 25  # L-1 = 24, 8 chunks of 3
        X = RNG.randn(N, L, 3) / np.sqrt(L)
        M3 = jnp.asarray(np.einsum("nld,nsd->nls", X, X))
        ref = sig_ops.signature_kern_higher_order(M3, M_lvls, order=order)

        M_inc = (
            M3[:, 1:, 1:] + M3[:, :-1, :-1] - M3[:, :-1, 1:] - M3[:, 1:, :-1]
        )
        mesh = _seq_mesh()
        M_inc_s = jax.device_put(
            M_inc, NamedSharding(mesh, P(None, None, "seq"))
        )
        out = seq_parallel.seq_diag_levels_seq_parallel(
            mesh, M_inc_s, M_lvls, order=order
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-10)

    def test_seq_cross_2d_mesh(self):
        M_lvls, order, N1, N2, L1, L2 = 4, 2, 4, 3, 17, 33
        X = RNG.randn(N1, L1, 2) / np.sqrt(L1)
        X2 = RNG.randn(N2, L2, 2) / np.sqrt(L2)
        M4 = jnp.asarray(np.einsum("nld,msd->nlms", X, X2))
        ref = sig_ops.signature_kern_higher_order(M4, M_lvls, order=order)

        M_inc = (
            M4[:, 1:, :, 1:] + M4[:, :-1, :, :-1]
            - M4[:, :-1, :, 1:] - M4[:, 1:, :, :-1]
        )
        devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devs, axis_names=("seq1", "seq2"))
        M_inc_s = jax.device_put(
            M_inc, NamedSharding(mesh, P(None, "seq1", None, "seq2"))
        )
        out = seq_parallel.seq_cross_levels_seq_parallel(
            mesh, M_inc_s, M_lvls, order=order
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-10)


class TestKernelAPIOrder2:
    def test_kernel_K_sp_matches_K(self):
        from gpsig_tpu import kernels
        M_lvls, N1, N2, L1, L2, d = 4, 4, 3, 16, 8, 2
        X = RNG.randn(N1, L1, d) / np.sqrt(L1)
        X2 = RNG.randn(N2, L2, d) / np.sqrt(L2)
        kern = kernels.SignatureRBF(d, M_lvls, order=2,
                                    lengthscales=[0.9, 1.3])
        p = kern.init_params()
        devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devs, axis_names=("seq1", "seq2"))
        Xs = jax.device_put(jnp.asarray(X),
                            NamedSharding(mesh, P(None, "seq1", None)))
        K_sp = seq_parallel.kernel_K_sp(kern, p, mesh, Xs)
        K_ref = kern.K(p, jnp.asarray(X))
        np.testing.assert_allclose(np.asarray(K_sp), np.asarray(K_ref),
                                   rtol=1e-8, atol=1e-10)
        X2s = jax.device_put(jnp.asarray(X2),
                             NamedSharding(mesh, P(None, "seq2", None)))
        K_sp2 = seq_parallel.kernel_K_sp(kern, p, mesh, Xs, X2s)
        K_ref2 = kern.K(p, jnp.asarray(X), jnp.asarray(X2))
        np.testing.assert_allclose(np.asarray(K_sp2), np.asarray(K_ref2),
                                   rtol=1e-8, atol=1e-10)

    def test_tens_covs_sp_matches_fused_call(self):
        from gpsig_tpu import kernels, utils as gp_utils
        M_lvls, N, L, d, nT = 4, 5, 24, 2, 4
        X = RNG.randn(N, L, d) / np.sqrt(L)
        Z = gp_utils.suggest_initial_inducing_tensors(
            X, M_lvls, nT, increments=True, seed=0
        )
        kern = kernels.SignatureRBF(d, M_lvls, order=2)
        p = kern.init_params()
        mesh = _seq_mesh()
        Xs = jax.device_put(jnp.asarray(X),
                            NamedSharding(mesh, P(None, "seq", None)))
        out_sp = seq_parallel.kernel_tens_n_seq_covs_sp(
            kern, p, mesh, jnp.asarray(Z), Xs, increments=True
        )
        out_r = kern.K_tens_n_seq_covs(
            p, jnp.asarray(Z), jnp.asarray(X), increments=True
        )
        for a, b in zip(out_sp, out_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-8, atol=1e-10)

    def test_seq_covs_sp_matches_fused_call(self):
        from gpsig_tpu import kernels, utils as gp_utils
        M_lvls, N, L, d, nZ, lz = 4, 5, 24, 2, 4, 6
        X = RNG.randn(N, L, d) / np.sqrt(L)
        Z = gp_utils.suggest_initial_inducing_sequences(X, nZ, lz, seed=0)
        mesh = _seq_mesh()
        Xs = jax.device_put(jnp.asarray(X),
                            NamedSharding(mesh, P(None, "seq", None)))
        kern = kernels.SignatureRBF(d, M_lvls, order=2)
        p = kern.init_params()
        out_sp = seq_parallel.kernel_seq_n_seq_covs_sp(
            kern, p, mesh, jnp.asarray(Z), Xs
        )
        out_r = kern.K_seq_n_seq_covs(p, jnp.asarray(Z), jnp.asarray(X))
        for a, b in zip(out_sp, out_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-8, atol=1e-10)


class TestSVGPStepOrder2:
    def test_elbo_sp_matches_single_device(self):
        """End-to-end: an order-2 SVGP ELBO + gradient over SP matches the
        single-device fused call at f64."""
        import jax.flatten_util
        from gpsig_tpu import (
            SVGP, InducingTensors, kernels, likelihoods, utils as gp_utils,
        )

        M_lvls, N, L, d, nT = 3, 6, 24, 2, 4
        X = RNG.randn(N, L, d) / np.sqrt(L)
        y = RNG.randn(N, 1)
        Z = gp_utils.suggest_initial_inducing_tensors(
            X, M_lvls, nT, increments=True, seed=0
        )
        mesh = _seq_mesh()

        kern = kernels.SignatureRBF(d, M_lvls, order=2)
        lik = likelihoods.Gaussian()
        ind_ref = InducingTensors(Z, M_lvls, increments=True)
        ind_sp = seq_parallel.SPInducingTensors(
            Z, M_lvls, mesh, increments=True
        )

        m_ref = SVGP(kern, ind_ref, lik, num_latent=1, num_data=N)
        m_sp = SVGP(kern, ind_sp, lik, num_latent=1, num_data=N)
        params = m_ref.init_params()
        params["q_mu"] = jnp.asarray(RNG.randn(*params["q_mu"].shape))

        Xs = jax.device_put(jnp.asarray(X),
                            NamedSharding(mesh, P(None, "seq", None)))
        yj = jnp.asarray(y)

        def loss_ref(p):
            return -m_ref.elbo(p, jnp.asarray(X), yj)

        def loss_sp(p):
            return -m_sp.elbo(p, Xs, yj)

        l_ref, g_ref = jax.value_and_grad(loss_ref)(params)
        l_sp, g_sp = jax.value_and_grad(loss_sp)(params)
        np.testing.assert_allclose(float(l_sp), float(l_ref), rtol=1e-9)
        flat_r, _ = jax.flatten_util.ravel_pytree(g_ref)
        flat_s, _ = jax.flatten_util.ravel_pytree(g_sp)
        np.testing.assert_allclose(np.asarray(flat_s), np.asarray(flat_r),
                                   rtol=1e-7, atol=1e-9)
