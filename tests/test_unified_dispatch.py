"""Capability-based base-kernel dispatch (VERDICT r4 item 2).

The reference runs every base kernel through the same hot loops
(`gpsig/kernels.py:786-994` x `signature_algs.py:8-160`).  Here the public
API must do the same through the FAST paths: fused Pallas where
implemented, blocked-MXU closed-form increment Grams otherwise, the naive
reference-shaped graph only for the f64 validation regime / ``fused='off'``
— and never materialize the (N1, L, N2, L) base Gram at order 1 in f32.

Routing is asserted with call-recording monkeypatches (cheap — no big
compiles on this 1-core box); numerical agreement of the routed f32 paths
against the f64 oracle is pinned for representative bases at tiny shapes,
and the full 9-base sweep through the public API runs in the on-chip
selftest (``bench.py --selftest``).
"""

import numpy as np

import jax
import jax.numpy as jnp

import pytest

from gpsig_tpu import kernels
from gpsig_tpu.ops import gram as gram_ops
from gpsig_tpu.ops import signature as sig_ops

RNG = np.random.RandomState(7)

ALL_BASES = [
    ("rbf", kernels.SignatureRBF, {}),
    ("linear", kernels.SignatureLinear, {}),
    ("matern12", kernels.SignatureMatern12, {}),
    ("matern32", kernels.SignatureMatern32, {}),
    ("matern52", kernels.SignatureMatern52, {}),
    ("cosine", kernels.SignatureCosine, {}),
    ("mix", kernels.SignatureMix, {}),
    ("poly", kernels.SignaturePoly, {"gamma": 1.0, "degree": 3}),
    ("spectral", kernels.SignatureSpectral, {"family": "mixed", "Q": 4}),
]


def _data(N=4, L=10, d=2, shift=0.0):
    X = RNG.randn(N, L, d).cumsum(axis=1) / np.sqrt(L) + shift
    return jnp.asarray(X)


def _tensors(d=2, M=3, nZ=3, shift=0.0):
    lt = M * (M + 1) // 2
    Z = RNG.randn(lt, nZ, 2, d) * 0.3 + shift
    return jnp.asarray(Z)


class _Spy:
    """Wraps a module function, recording calls and delegating."""

    def __init__(self, monkeypatch, module, name):
        self.calls = 0
        orig = getattr(module, name)

        def wrapped(*a, **kw):
            self.calls += 1
            return orig(*a, **kw)

        monkeypatch.setattr(module, name, wrapped)


@pytest.mark.parametrize("name,cls,kw", ALL_BASES)
def test_routing_all_bases_f32_closed_form(name, cls, kw, monkeypatch):
    """In the f32 regime every base routes K/Kzz/Kzx/diag through the
    closed-form fast paths from the PUBLIC API; f64 keeps the naive
    reference-shaped graph; fused='off' pins naive at any dtype."""
    d, M = 2, 3
    shift = 0.5 if name == "cosine" else 0.0
    X = _data(shift=shift)
    Z = _tensors(shift=shift)
    k = cls(d, M, **kw)
    p = k.init_params(jax.random.PRNGKey(0))
    p32 = jax.tree.map(lambda v: jnp.asarray(v, jnp.float32), p)
    X32 = jnp.asarray(X, jnp.float32)
    Z32 = jnp.asarray(Z, jnp.float32)

    spy_blocked = _Spy(monkeypatch, gram_ops, "blocked_first_order_levels")
    spy_slots = _Spy(monkeypatch, gram_ops, "tens_vs_seq_slot_grams")
    spy_zz = _Spy(monkeypatch, gram_ops, "tens_slot_grams")
    spy_diag = _Spy(monkeypatch, gram_ops, "first_order_levels_batched")

    # f32: closed-form fast paths (public API, K materializes no
    # (N1, L, N2, L) Gram — blocked tiles only)
    k.K(p32, X32, X32[:2])
    assert spy_blocked.calls == 1
    assert spy_diag.calls >= 1  # normalization diagonals, blocked MXU
    k.K_tens_vs_seq(p32, Z32, X32, increments=True)
    assert spy_slots.calls == 1
    k.K_tens(p32, Z32, increments=True)
    # Kzz slot Grams: closed form except for the oscillatory spectral
    # family, where it measured ~80x worse than the naive graph against an
    # f64 oracle at learned-increment pair geometry
    # (`gram.tens_closed_form_ok`, round-5 adjudication)
    expect_zz = 1 if gram_ops.tens_closed_form_ok(k.base) else 0
    assert spy_zz.calls == expect_zz

    # f64 (the validation regime): naive reference-shaped graphs
    n0 = (spy_blocked.calls, spy_slots.calls, spy_zz.calls)
    k.K(p, X, X[:2])
    k.K_tens_vs_seq(p, Z, X, increments=True)
    k.K_tens(p, Z, increments=True)
    assert (spy_blocked.calls, spy_slots.calls, spy_zz.calls) == n0

    # fused='off': naive even in f32 (the bench baseline leg)
    k_off = cls(d, M, fused="off", **kw)
    k_off.init_params(jax.random.PRNGKey(0))
    k_off.K(p32, X32, X32[:2])
    k_off.K_tens_vs_seq(p32, Z32, X32, increments=True)
    k_off.K_tens(p32, Z32, increments=True)
    assert (spy_blocked.calls, spy_slots.calls, spy_zz.calls) == n0


def test_routing_order2_and_nonincrement_fallbacks(monkeypatch):
    """order>1 Kzx routes through the closed-form slot Grams + MXU
    recursion (VERDICT r4 item 5); increments=False (no closed form for
    the one-sided z-difference) falls back to the naive graph."""
    d, M = 2, 3
    X32 = jnp.asarray(_data(), jnp.float32)
    Z32 = jnp.asarray(_tensors(), jnp.float32)
    spy_slots = _Spy(monkeypatch, gram_ops, "tens_vs_seq_slot_grams")

    k2 = kernels.SignatureMatern12(d, M, order=2)
    p2 = jax.tree.map(lambda v: jnp.asarray(v, jnp.float32),
                      k2.init_params())
    k2.K_tens_vs_seq(p2, Z32, X32, increments=True)
    assert spy_slots.calls == 1
    # plain (non-incremental) tensors: Z slots are single points
    Zp = Z32[:, :, 0, :]
    k2.K_tens_vs_seq(p2, Zp, X32, increments=False)
    assert spy_slots.calls == 1  # unchanged: naive fallback


def test_tens_vs_seq_levels_mxu_matches_reference_recursion():
    """The MXU triangular-matmul recursion == the cumsum reference
    (`signature_algs.py:101-160`), orders 1 and 3, f64-exact."""
    lt, nZ, N, Lm = 6, 3, 4, 7  # M=3 -> lt=6
    M_ = jnp.asarray(RNG.randn(lt, nZ, N, Lm))
    for order in (1, 3):
        got = gram_ops.tens_vs_seq_levels_mxu(M_, 3, order=order)
        if order == 1:
            want = sig_ops.signature_kern_tens_vs_seq_first_order(
                M_, 3, difference=False)
        else:
            want = sig_ops.signature_kern_tens_vs_seq_higher_order(
                M_, 3, order=order, difference=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("name,cls,kw", [ALL_BASES[2], ALL_BASES[6],
                                         ALL_BASES[8]])
def test_f32_public_api_matches_f64_oracle(name, cls, kw):
    """Routed f32 fast paths vs the f64 naive oracle through the public
    API (representative bases; the full sweep runs on-chip).  Tolerance is
    the f32 normalization floor (PERF.md) at these tiny shapes."""
    d, M = 2, 3
    X = _data(N=5, L=12)
    X2 = _data(N=4, L=9)
    Z = _tensors()
    k = cls(d, M, **kw)
    p = k.init_params(jax.random.PRNGKey(1))
    p32 = jax.tree.map(lambda v: jnp.asarray(v, jnp.float32), p)
    to32 = lambda a: jnp.asarray(a, jnp.float32)

    K64 = k.K(p, X, X2)
    K32 = k.K(p32, to32(X), to32(X2))
    np.testing.assert_allclose(np.asarray(K32), np.asarray(K64),
                               rtol=2e-3, atol=5e-4)

    covs64 = k.K_tens_n_seq_covs(p, Z, X, increments=True)
    covs32 = k.K_tens_n_seq_covs(p32, to32(Z), to32(X), increments=True)
    for a32, a64 in zip(covs32, covs64):
        np.testing.assert_allclose(np.asarray(a32), np.asarray(a64),
                                   rtol=2e-3, atol=5e-4)

    # gradients through the routed paths stay finite
    g = jax.grad(lambda x: jnp.sum(
        k.K_tens_n_seq_covs(p32, to32(Z), x, increments=True)[1]))(to32(X))
    assert bool(jnp.all(jnp.isfinite(g)))


@pytest.mark.parametrize("name,cls,kw", ALL_BASES)
def test_constrain_is_instance_independent(name, cls, kw):
    """``constrain`` must be correct on a fresh twin instance that never
    ran ``init_params`` (the A/B pattern: a fused='off' twin evaluating
    another instance's params).  Regression: base-kernel bijectors were
    registered in init_params, so a twin silently constrained mixing /
    spectral alpha/omega/gamma / poly gamma with 'identity'."""
    k = cls(2, 3, **kw)
    twin = cls(2, 3, fused="off", **kw)
    p = k.init_params(jax.random.PRNGKey(3))
    c1, c2 = k.constrain(p), twin.constrain(p)
    assert set(c1) == set(c2)
    for n in c1:
        np.testing.assert_array_equal(np.asarray(c1[n]), np.asarray(c2[n]))


def test_order2_closed_form_matches_f64_naive():
    """Higher-order Kzx through the closed-form path == the f64 naive
    recursion (VERDICT r4 item 5's blocked-MXU equivalent)."""
    d, M = 2, 3
    X = _data(N=4, L=10)
    Z = _tensors()
    k = kernels.SignatureRBF(d, M, order=2)
    p = k.init_params()
    p32 = jax.tree.map(lambda v: jnp.asarray(v, jnp.float32), p)
    want = k.K_tens_vs_seq(p, Z, X, increments=True)
    got = k.K_tens_vs_seq(
        p32, jnp.asarray(Z, jnp.float32), jnp.asarray(X, jnp.float32),
        increments=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=5e-4)
