"""Cancellation-free matern12 increment algebra (VERDICT r3 item 6).

exp(-r) factorizes like rbf's second difference:
``M = exp(-r00) * (expm1(-(r11-r00)) - expm1(-(r01-r00)) - expm1(-(r10-r00)))``
with each distance gap evaluated by the conjugate quotient
``(r_ij^2 - r00^2)/(r_ij + r00)`` over the same small inner-product terms
the rbf core uses (`ops/gram.py:_matern12_increment_core`).  The suite runs
f64, where the naive second difference (reference `signature_algs.py:26`)
is exact — the oracle for every comparison here.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from gpsig_tpu import kernels
from gpsig_tpu.ops import base_kernels, gram as gram_ops
from gpsig_tpu.ops import signature as sig_ops

RNG = np.random.RandomState(17)
HI = lax.Precision.HIGHEST


def _naive_cross(X, Y):
    kf = base_kernels.get("matern12")
    A, L1, d = X.shape
    B, L2, _ = Y.shape
    G = kf({}, X.reshape(A * L1, d), Y.reshape(B * L2, d)).reshape(
        A, L1, B, L2).transpose(0, 2, 1, 3)
    return (G[:, :, 1:, 1:] + G[:, :, :-1, :-1]
            - G[:, :, :-1, 1:] - G[:, :, 1:, :-1])


def test_cross_matches_naive_second_difference_f64():
    X = jnp.asarray(RNG.randn(3, 40, 2).cumsum(axis=1) / np.sqrt(40.0))
    Y = jnp.asarray(RNG.randn(4, 24, 2).cumsum(axis=1) / np.sqrt(24.0))
    ours = gram_ops._matern12_increment_cross(X, Y, HI)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(_naive_cross(X, Y)),
        rtol=1e-11, atol=1e-13,
    )


def test_diag_matches_naive_and_grads_finite():
    """Same-path entries have coincident/near-coincident corners where
    r00 = sqrt(-2*A00) cannot beat the rounding already inside A00
    (|x|^2-style dots): accuracy there is sqrt(eps)-limited (~1e-8 abs at
    f64) — unlike the cross path's ~1e-14.  Documented in the core's
    docstring; the tolerance here pins that characterization."""
    X = jnp.asarray(RNG.randn(3, 32, 2).cumsum(axis=1) / np.sqrt(32.0))
    ours = gram_ops._matern12_increment_diag(X, HI)
    naive = jax.vmap(
        lambda x: _naive_cross(x[None], x[None])[0, 0]
    )(X)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(naive),
                               rtol=1e-6, atol=2e-7)
    g = jax.grad(
        lambda x: jnp.sum(gram_ops._matern12_increment_diag(x, HI))
    )(X)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_pair_fn_registered_for_sp():
    pf = gram_ops.increment_gram_pair_fn("matern12")
    assert pf is not None
    Xa = jnp.asarray(RNG.randn(2, 10, 3) / 3.0)
    Xb = jnp.asarray(RNG.randn(2, 7, 3) / 3.0)
    got = pf(Xa, Xb, HI)
    want = jax.vmap(
        lambda a, b: _naive_cross(a[None], b[None])[0, 0]
    )(Xa, Xb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-11, atol=1e-13)


def test_blocked_gram_matches_direct_matern12():
    """K_blocked (closed-form increments) == K (naive graph, f64-exact),
    normalized, through the public kernel API."""
    X = RNG.randn(9, 12, 2)
    k = kernels.SignatureMatern12(2, 3, normalization=True)
    p = k.init_params()
    K_direct = k.K(p, jnp.asarray(X))
    K_blocked = k.K_blocked(p, jnp.asarray(X), block_size=4)
    # rtol reflects the sqrt(eps) same-path corner limit (see
    # test_diag_matches_naive_and_grads_finite), not generic looseness
    np.testing.assert_allclose(np.asarray(K_blocked), np.asarray(K_direct),
                               rtol=1e-6)


def test_blocked_gram_cross_and_grad_matern12():
    X, X2 = RNG.randn(6, 10, 2), RNG.randn(5, 8, 2)
    k = kernels.SignatureMatern12(2, 3, normalization=True)
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
    np.testing.assert_allclose(np.asarray(g), np.asarray(gd),
                               rtol=1e-5, atol=1e-8)


def test_f32_cross_accuracy_at_long_L():
    """f32 cross-entry accuracy pin at L=512: ~1e-5 absolute of an f64
    oracle.  (A beats-naive assertion does not belong here: on CPU the
    naive path rides an accurate libm exp and is competitive; the closed
    form's TPU advantage is over the VPU exp's ~4e-6 *systematic* noise,
    measured on-chip — see PERF.md's per-base accuracy table and the
    matern12 selftest lane.)"""
    L = 512
    X64 = jnp.asarray(RNG.randn(2, L, 2).cumsum(axis=1) / np.sqrt(L))
    Y64 = jnp.asarray(RNG.randn(2, L, 2).cumsum(axis=1) / np.sqrt(L))
    oracle = gram_ops._matern12_increment_cross(X64, Y64, HI)
    X32 = jnp.asarray(X64, jnp.float32)
    Y32 = jnp.asarray(Y64, jnp.float32)
    ours32 = gram_ops._matern12_increment_cross(X32, Y32, HI)
    err_ours = float(jnp.max(jnp.abs(ours32 - oracle)))
    assert err_ours < 5e-5, err_ours


def test_base_kernel_grads_finite_at_coincident_and_zero_points():
    """Guard regression pins (round 4): euclid_dist/cosine sqrt guards must
    be NORMAL f32 values — 1e-40 is subnormal, flushes to zero on the TPU
    VPU, and makes gradients NaN at coincident/zero points (caught by the
    on-chip matern12 selftest bwd lane)."""
    X = jnp.asarray(np.concatenate(
        [np.zeros((1, 3)), RNG.randn(4, 3), RNG.randn(1, 3)]
    ), jnp.float32)
    X = X.at[5].set(X[1])  # duplicate row -> coincident pair
    for name in ("matern12", "matern32", "matern52"):
        kf = base_kernels.get(name)
        g = jax.grad(lambda x: jnp.sum(kf({}, x, x)))(X)
        assert bool(jnp.all(jnp.isfinite(g))), name
    # cosine similarity of an exactly-zero vector has no limit, so its
    # gradient there is out of scope; coincident NONZERO points must be
    # finite though
    kf = base_kernels.get("cosine")
    g = jax.grad(lambda x: jnp.sum(kf({}, x, x)))(X[1:])
    assert bool(jnp.all(jnp.isfinite(g))), "cosine"
