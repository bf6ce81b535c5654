"""Blocked MXU Gram path == direct path."""

import numpy as np

import jax
import jax.numpy as jnp

from gpsig_tpu import kernels
from gpsig_tpu.ops import gram as gram_ops
from gpsig_tpu.ops import signature as sig_ops

RNG = np.random.RandomState(3)


def test_matmul_cumsum_matches_cumsum():
    M4 = jnp.asarray(RNG.randn(3, 7, 4, 6))
    direct = sig_ops.signature_kern_first_order(M4, 4)
    batched = gram_ops.first_order_levels_batched(
        jnp.transpose(M4, (0, 2, 1, 3)), 4
    )
    np.testing.assert_allclose(np.asarray(batched), np.asarray(direct), rtol=1e-10)


def test_blocked_matches_direct_symmetric():
    X = RNG.randn(13, 9, 2)  # N not a multiple of block
    k = kernels.SignatureRBF(2, 4, normalization=True)
    p = k.init_params()
    K_direct = k.K(p, jnp.asarray(X))
    K_blocked = k.K_blocked(p, jnp.asarray(X), block_size=4)
    np.testing.assert_allclose(
        np.asarray(K_blocked), np.asarray(K_direct), rtol=1e-9
    )


def test_blocked_matches_direct_cross():
    X, X2 = RNG.randn(9, 8, 3), RNG.randn(6, 8, 3)
    k = kernels.SignatureRBF(3, 3, normalization=True)
    p = k.init_params()
    K_direct = k.K(p, jnp.asarray(X), jnp.asarray(X2))
    K_blocked = k.K_blocked(p, jnp.asarray(X), jnp.asarray(X2), block_size=4)
    np.testing.assert_allclose(
        np.asarray(K_blocked), np.asarray(K_direct), rtol=1e-9
    )


def test_blocked_levels_unnormalized():
    X = RNG.randn(5, 7, 2)
    k = kernels.SignatureLinear(2, 3, normalization=False, lengthscales=None)
    p = k.init_params()
    K_direct = k.K(p, jnp.asarray(X), return_levels=True)
    K_blocked = k.K_blocked(p, jnp.asarray(X), block_size=2, return_levels=True)
    np.testing.assert_allclose(
        np.asarray(K_blocked), np.asarray(K_direct), rtol=1e-9
    )


def test_blocked_jits():
    X = jnp.asarray(RNG.randn(8, 6, 2))
    k = kernels.SignatureRBF(2, 3)
    p = k.init_params()
    f = jax.jit(lambda pp, xx: k.K_blocked(pp, xx, block_size=4))
    np.testing.assert_allclose(
        np.asarray(f(p, X)), np.asarray(k.K(p, X)), rtol=1e-8
    )


def test_blocked_higher_order_matches_direct():
    X = RNG.randn(6, 8, 2)
    for order in (2, 3):
        k = kernels.SignatureRBF(2, 3, order=order, normalization=True)
        p = k.init_params()
        K_direct = k.K(p, jnp.asarray(X))
        K_blocked = k.K_blocked(p, jnp.asarray(X), block_size=2)
        np.testing.assert_allclose(
            np.asarray(K_blocked), np.asarray(K_direct), rtol=1e-8,
            err_msg=f"order={order}",
        )


def test_blocked_higher_order_cross():
    X, X2 = RNG.randn(5, 7, 2), RNG.randn(4, 7, 2)
    k = kernels.SignatureLinear(2, 4, order=4, normalization=False,
                                lengthscales=None)
    p = k.init_params()
    K_direct = k.K(p, jnp.asarray(X), jnp.asarray(X2))
    K_blocked = k.K_blocked(p, jnp.asarray(X), jnp.asarray(X2), block_size=2)
    np.testing.assert_allclose(
        np.asarray(K_blocked), np.asarray(K_direct), rtol=1e-8
    )


def test_blocked_higher_order_cross_normalized():
    """Regression: the normalization diagonals of a higher-order cross Gram
    must be computed at the same order (round-1 bug: K_blocked normalized
    order>1 columns by order-1 diagonals, max err 0.163)."""
    X, X2 = RNG.randn(5, 7, 2), RNG.randn(4, 7, 2)
    for order in (2, 3):
        k = kernels.SignatureRBF(2, 3, order=order, normalization=True)
        p = k.init_params()
        K_direct = k.K(p, jnp.asarray(X), jnp.asarray(X2))
        K_blocked = k.K_blocked(p, jnp.asarray(X), jnp.asarray(X2),
                                block_size=2)
        np.testing.assert_allclose(
            np.asarray(K_blocked), np.asarray(K_direct), rtol=1e-8,
            err_msg=f"order={order}",
        )
