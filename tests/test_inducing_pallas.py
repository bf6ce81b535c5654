"""Fused inducing-covariance kernels (Kzz/Kzx) vs the XLA reference path
(interpret mode; the real dispatch is TPU-only)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpsig_tpu.ops import base_kernels
from gpsig_tpu.ops import inducing_pallas as ip
from gpsig_tpu.ops import signature as sig_ops

RNG = np.random.RandomState(13)

M_LVL = 3
LT = M_LVL * (M_LVL + 1) // 2


def _weigh(o):
    return jnp.sum(o * jnp.cos(
        jnp.arange(o.size, dtype=jnp.float32).reshape(o.shape)
    ))


def _ref_tens(Z, base, inc, nZ, d):
    kf = base_kernels.get(base)
    if inc:
        G = kf({}, Z.reshape(LT, 2 * nZ, d)).reshape(LT, nZ, 2, nZ, 2)
        Mm = (G[:, :, 1, :, 1] + G[:, :, 0, :, 0]
              - G[:, :, 1, :, 0] - G[:, :, 0, :, 1])
    else:
        Mm = kf({}, Z)
    return sig_ops.tensor_kern(Mm, M_LVL)


@pytest.mark.parametrize("base,inc", [("rbf", True), ("rbf", False),
                                      ("linear", True),
                                      ("matern12", True),
                                      ("matern12", False)])
def test_fused_tensor_levels_fwd_and_grad(base, inc):
    nZ, d = 9, 2
    shape = (LT, nZ, 2, d) if inc else (LT, nZ, d)
    Z = jnp.asarray(RNG.randn(*shape).astype(np.float32) * 0.5)
    out = ip.fused_tensor_levels(Z, num_levels=M_LVL, base=base,
                                 increments=inc, interpret=True)
    ref = _ref_tens(Z, base, inc, nZ, d)
    scale = float(jnp.max(jnp.abs(ref)))
    # matern12's Kzz diagonal rides the |.|-kink at coincident corners
    # (z_i vs z_i), where the f32 conditioning of closed-vs-naive is ~1e-3
    # (both finite; f64 closed == f64 naive to 1e-16 — see PERF.md)
    ftol = 2e-3 if base == "matern12" else 1e-4
    gtol = 5e-3 if base == "matern12" else 1e-3
    assert float(jnp.max(jnp.abs(out - ref))) < ftol * max(scale, 1)

    g1 = jax.grad(lambda z: _weigh(ip.fused_tensor_levels(
        z, num_levels=M_LVL, base=base, increments=inc, interpret=True)))(Z)
    g2 = jax.grad(lambda z: _weigh(_ref_tens(z, base, inc, nZ, d)))(Z)
    gs = float(jnp.max(jnp.abs(g2)))
    assert float(jnp.max(jnp.abs(g1 - g2))) < gtol * max(gs, 1)


def _ref_zx(Z, X, base, inc, diff, nZ, N, L, d):
    kf = base_kernels.get(base)
    Xf = X.reshape(N * L, d)
    if inc:
        G = kf({}, Z.reshape(LT * nZ * 2, d), Xf).reshape(LT, nZ, 2, N, L)
        Mm = G[:, :, 1] - G[:, :, 0]
    else:
        Mm = kf({}, Z.reshape(LT * nZ, d), Xf).reshape(LT, nZ, N, L)
    return sig_ops.signature_kern_tens_vs_seq_first_order(
        Mm, M_LVL, difference=diff
    )


@pytest.mark.parametrize("base,inc,diff", [
    ("rbf", True, True),       # the benchmark configuration
    ("rbf", False, False),
    ("linear", True, True),
    ("matern12", True, True),
    ("matern12", True, False),
    ("matern12", False, True),
    ("matern12", False, False),
])
def test_fused_tens_vs_seq_fwd_and_grad(base, inc, diff):
    nZ, N, L, d = 7, 3, 18, 2
    shape = (LT, nZ, 2, d) if inc else (LT, nZ, d)
    Z = jnp.asarray(RNG.randn(*shape).astype(np.float32) * 0.5)
    X = jnp.asarray((RNG.randn(N, L, d) / np.sqrt(L)).astype(np.float32))
    out = ip.fused_tens_vs_seq_levels(
        Z, X, num_levels=M_LVL, base=base, increments=inc, difference=diff,
        fast_math=False, interpret=True,
    )
    ref = _ref_zx(Z, X, base, inc, diff, nZ, N, L, d)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4 * max(scale, 1)

    g1 = jax.grad(
        lambda z, x: _weigh(ip.fused_tens_vs_seq_levels(
            z, x, num_levels=M_LVL, base=base, increments=inc,
            difference=diff, fast_math=False, interpret=True)),
        argnums=(0, 1),
    )(Z, X)
    g2 = jax.grad(
        lambda z, x: _weigh(_ref_zx(z, x, base, inc, diff, nZ, N, L, d)),
        argnums=(0, 1),
    )(Z, X)
    for a, b in zip(g1, g2):
        gs = float(jnp.max(jnp.abs(b)))
        assert float(jnp.max(jnp.abs(a - b))) < 2e-3 * max(gs, 1)


def test_dispatch_is_off_on_cpu():
    """The TPU-only fused dispatch must not fire in this CPU test env."""
    from gpsig_tpu import kernels

    k = kernels.SignatureRBF(2, 2)
    assert not k._fused_tens_ok()


def test_fused_tens_shape_guard():
    """Shape-level dispatch for the fused inducing kernels: the reference
    benchmark configuration fits, wide-d (PEMS d=963) and huge lt*nZ*d
    working sets decline, and fused='on' turns the shape fallback into an
    error instead of a silent XLA detour."""
    # reference config: M=4 (lt=10), 500 incremental tensors, d=15 w/ time
    assert ip.fused_tens_shapes_ok(10, 500, 15, 4)
    assert ip.fused_tens_shapes_ok(10, 500, 15, 4, L=93)
    # PEMS: d=963 declines (register spills scale with feature width)
    assert not ip.fused_tens_shapes_ok(10, 500, 963, 4)
    assert not ip.fused_tens_shapes_ok(10, 500, 963, 4, L=144)
    # VMEM-resident (lt, d2, nZp) arrays outgrow the budget at huge nZ
    assert ip.fused_tens_shapes_ok(10, 10_000, 15, 4)
    assert not ip.fused_tens_shapes_ok(10, 80_000, 15, 4)

    from gpsig_tpu import kernels

    k = kernels.SignatureRBF(963, 4, fused="on")
    k._fused_supported = lambda: True  # pretend we're on the chip
    p = k.constrain(k.init_params())
    Z = jnp.zeros((10, 8, 2, 963), jnp.float32)
    X = jnp.zeros((4, 20, 963), jnp.float32)
    with pytest.raises(ValueError, match="VMEM working set"):
        k._K_tens(p, Z, True)
    with pytest.raises(ValueError, match="VMEM working set"):
        k._K_tens_vs_seq(p, Z, X, True)
    with pytest.raises(ValueError, match="VMEM working set"):
        k._K_seq(p, X)
    # fused='auto' falls back to the XLA graph and computes
    k2 = kernels.SignatureRBF(963, 2)
    k2._fused_supported = lambda: True
    p2 = k2.constrain(k2.init_params())
    out = k2._K_tens_vs_seq(p2, jnp.zeros((3, 4, 2, 963)), X[:2, :6], True)
    assert out.shape == (3, 4, 2)
    # order>1 Kzx has no fused kernel: fused='on' errors (never a silent
    # XLA detour), fused='auto' computes via the XLA graph
    k3 = kernels.SignatureRBF(3, 3, order=2, fused="on")
    k3._fused_supported = lambda: True
    p3 = k3.constrain(k3.init_params())
    Z3, X3 = jnp.zeros((6, 4, 2, 3)), jnp.zeros((2, 10, 3))
    with pytest.raises(ValueError, match="order=1 only"):
        k3._K_tens_vs_seq(p3, Z3, X3, True)
    k4 = kernels.SignatureRBF(3, 3, order=2)
    k4._fused_supported = lambda: True
    out4 = k4._K_tens_vs_seq(k4.constrain(k4.init_params()), Z3, X3, True)
    assert out4.shape == (4, 4, 2)  # (levels, n_Z, N)
