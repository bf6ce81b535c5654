"""Signature recursion correctness vs brute-force oracles (float64).

Mirrors the reference's esig cross-validation regime
(`notebooks/signature_kernel.ipynb`): linear base kernel, order=num_levels,
no normalization -> exact truncated-signature inner products.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpsig_tpu.ops import signature as sig_ops

import oracles

RNG = np.random.RandomState(42)


def _paths(n, l, d):
    return RNG.randn(n, l, d) / np.sqrt(l)


def _seq_gram(X, X2=None):
    """(N1, L1, N2, L2) linear base Gram between observation points."""
    X2 = X if X2 is None else X2
    return np.einsum("ald,bsd->albs", X, X2)


class TestFirstOrderSeq:
    def test_vs_bruteforce_sums(self):
        # independent literal-sum check of the recursion (small L)
        X, Y = _paths(1, 6, 2)[0], _paths(1, 7, 2)[0]
        M_pts = np.einsum("ld,sd->ls", X, Y)[None, :, None, :]
        K = sig_ops.signature_kern_first_order(jnp.asarray(M_pts), 4)
        M_inc = np.einsum("ld,sd->ls", np.diff(X, axis=0), np.diff(Y, axis=0))
        expect = oracles.first_order_seq_kernel_bruteforce(M_inc, 4)
        np.testing.assert_allclose(np.asarray(K)[:, 0, 0], expect, rtol=1e-10)

    def test_diag_mode_matches_full(self):
        X = _paths(4, 10, 3)
        M4 = jnp.asarray(_seq_gram(X))
        K_full = sig_ops.signature_kern_first_order(M4, 5)
        M3 = jnp.asarray(np.einsum("nld,nsd->nls", X, X))
        K_diag = sig_ops.signature_kern_first_order(M3, 5)
        np.testing.assert_allclose(
            np.asarray(K_diag),
            np.einsum("mnn->mn", np.asarray(K_full)),
            rtol=1e-12,
        )

    def test_no_difference_mode(self):
        # difference=False == signature recursion applied to the raw Gram
        X = _paths(2, 5, 2)
        M = jnp.asarray(_seq_gram(X))
        K = sig_ops.signature_kern_first_order(M, 3, difference=False)
        M_np = np.asarray(M)
        expect = np.zeros((4, 2, 2))
        for i in range(2):
            for j in range(2):
                expect[:, i, j] = oracles.first_order_seq_kernel_bruteforce(
                    M_np[i, :, j, :], 3
                )
        np.testing.assert_allclose(np.asarray(K), expect, rtol=1e-10)


class TestHigherOrderSeq:
    @pytest.mark.parametrize("num_levels", [3, 5])
    def test_exact_signature_gram(self, num_levels):
        # order == num_levels -> exact signature inner products (Chen oracle);
        # this is the esig check at `signature_kernel.ipynb` cell 13.
        X = _paths(5, 12, 3)
        M = jnp.asarray(_seq_gram(X))
        K = sig_ops.signature_kern_higher_order(M, num_levels, order=num_levels)
        expect = oracles.signature_gram(X, num_levels)
        np.testing.assert_allclose(np.asarray(K), expect, rtol=1e-8, atol=1e-12)

    def test_order1_equals_first_order(self):
        X = _paths(3, 8, 2)
        M = jnp.asarray(_seq_gram(X))
        K1 = sig_ops.signature_kern_first_order(M, 4)
        Kh = sig_ops.signature_kern_higher_order(M, 4, order=1)
        np.testing.assert_allclose(np.asarray(K1), np.asarray(Kh), rtol=1e-12)

    def test_intermediate_order_between(self):
        # sanity: order-2 result differs from both ends but matches shapes
        X = _paths(3, 8, 2)
        M = jnp.asarray(_seq_gram(X))
        K2 = sig_ops.signature_kern_higher_order(M, 4, order=2)
        assert K2.shape == (5, 3, 3)
        K2 = np.asarray(K2)
        assert np.all(np.isfinite(K2))

    def test_diag_mode(self):
        X = _paths(3, 9, 2)
        M4 = jnp.asarray(_seq_gram(X))
        M3 = jnp.asarray(np.einsum("nld,nsd->nls", X, X))
        K_full = sig_ops.signature_kern_higher_order(M4, 4, order=3)
        K_diag = sig_ops.signature_kern_higher_order(M3, 4, order=3)
        np.testing.assert_allclose(
            np.asarray(K_diag), np.einsum("mnn->mn", np.asarray(K_full)), rtol=1e-12
        )


class TestTensorKern:
    def test_vs_oracle(self):
        M_lvls, nT, d = 4, 6, 3
        len_tensors = M_lvls * (M_lvls + 1) // 2
        Z = RNG.randn(len_tensors, nT, d)
        M = jnp.asarray(np.einsum("kid,kjd->kij", Z, Z))
        K = sig_ops.tensor_kern(M, M_lvls)
        expect = oracles.tensor_vs_tensor(Z, M_lvls)
        np.testing.assert_allclose(np.asarray(K), expect, rtol=1e-10)


class TestTensVsSeq:
    def test_first_order_vs_bruteforce(self):
        M_lvls, nT, d, L = 4, 3, 2, 7
        len_tensors = M_lvls * (M_lvls + 1) // 2
        Z = RNG.randn(len_tensors, nT, d)
        X = _paths(2, L, d)
        M_pts = np.einsum("kid,nld->kinl", Z, X)
        K = sig_ops.signature_kern_tens_vs_seq_first_order(jnp.asarray(M_pts), M_lvls)
        M_inc = np.einsum("kid,nld->kinl", Z, np.diff(X, axis=1))
        for t in range(nT):
            for n in range(2):
                expect = oracles.first_order_tens_vs_seq_bruteforce(
                    M_inc[:, t, n, :], M_lvls
                )
                np.testing.assert_allclose(np.asarray(K)[:, t, n], expect, rtol=1e-10)

    @pytest.mark.parametrize("num_levels", [3, 5])
    def test_higher_order_exact_vs_signature(self, num_levels):
        # order == num_levels -> exact <z, S(x)>; this is the esig check at
        # `signature_kernel.ipynb` cells 18-23.
        nT, d, L = 4, 3, 10
        len_tensors = num_levels * (num_levels + 1) // 2
        Z = RNG.randn(len_tensors, nT, d)
        X = _paths(3, L, d)
        M_pts = np.einsum("kid,nld->kinl", Z, X)
        K = sig_ops.signature_kern_tens_vs_seq_higher_order(
            jnp.asarray(M_pts), num_levels, order=num_levels
        )
        expect = oracles.tensor_vs_signature(Z, X, num_levels)
        np.testing.assert_allclose(np.asarray(K), expect, rtol=1e-8, atol=1e-12)

    def test_higher_order1_equals_first_order(self):
        M_lvls, nT, d, L = 4, 3, 2, 8
        len_tensors = M_lvls * (M_lvls + 1) // 2
        Z = RNG.randn(len_tensors, nT, d)
        X = _paths(2, L, d)
        M_pts = jnp.asarray(np.einsum("kid,nld->kinl", Z, X))
        K1 = sig_ops.signature_kern_tens_vs_seq_first_order(M_pts, M_lvls)
        Kh = sig_ops.signature_kern_tens_vs_seq_higher_order(M_pts, M_lvls, order=1)
        np.testing.assert_allclose(np.asarray(K1), np.asarray(Kh), rtol=1e-12)


class TestInvariances:
    def test_repeat_last_padding_invariance(self):
        # constant-path concatenation leaves signatures unchanged
        # (`preprocessing.py:23-25`) -> padded and unpadded Grams agree.
        X = _paths(3, 8, 2)
        X_pad = np.concatenate([X, np.repeat(X[:, -1:, :], 4, axis=1)], axis=1)
        K = sig_ops.signature_kern_first_order(jnp.asarray(_seq_gram(X)), 4)
        K_pad = sig_ops.signature_kern_first_order(jnp.asarray(_seq_gram(X_pad)), 4)
        np.testing.assert_allclose(np.asarray(K), np.asarray(K_pad), rtol=1e-10)

    def test_jit_matches_eager(self):
        X = _paths(3, 8, 2)
        M = jnp.asarray(_seq_gram(X))
        f = jax.jit(lambda m: sig_ops.signature_kern_first_order(m, 4))
        np.testing.assert_allclose(
            np.asarray(f(M)),
            np.asarray(sig_ops.signature_kern_first_order(M, 4)),
            rtol=1e-12,
        )
