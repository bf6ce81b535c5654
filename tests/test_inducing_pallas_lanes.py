"""Lane-batched fused Kzx kernel (x_block > 1) vs the XLA reference path.

VERDICT r3 item 2: the fused tens-vs-seq kernel processes ``x_block``
examples per grid cell as one (BN, BX*Lp) lane-concatenated tile with
segment-reset cumsums (the seq kernel's row-wide trick,
`ops/signature_pallas.py:14-26`).  These tests pin, in interpret mode:

* forward + both grads == XLA reference for BX in {1, 2, 4} (BX=1 is the
  old per-example sweep; BX > 1 exercises the segment indicator/expansion
  matmuls AND the example padding — N=5 is never a multiple of BX);
* the padded examples contribute exactly nothing to gradients (example 0
  would absorb their pullback otherwise).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpsig_tpu.ops import base_kernels
from gpsig_tpu.ops import inducing_pallas as ip
from gpsig_tpu.ops import signature as sig_ops

RNG = np.random.RandomState(29)

M_LVL = 3
LT = M_LVL * (M_LVL + 1) // 2


def _weigh(o):
    return jnp.sum(o * jnp.cos(
        jnp.arange(o.size, dtype=jnp.float32).reshape(o.shape)
    ))


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


@pytest.mark.parametrize("bx", [1, 2, 4])
@pytest.mark.parametrize("base,inc,diff", [
    ("rbf", True, True),       # the benchmark configuration
    ("rbf", False, False),     # exercises the tail mask across segments
    ("linear", True, True),
])
def test_lane_batched_zx_fwd_and_grad(bx, base, inc, diff):
    nZ, N, L, d = 7, 5, 18, 2   # N=5: never a multiple of bx>1 -> padding
    shape = (LT, nZ, 2, d) if inc else (LT, nZ, d)
    Z = jnp.asarray(RNG.randn(*shape).astype(np.float32) * 0.5)
    X = jnp.asarray((RNG.randn(N, L, d) / np.sqrt(L)).astype(np.float32))
    out = ip.fused_tens_vs_seq_levels(
        Z, X, num_levels=M_LVL, base=base, increments=inc, difference=diff,
        x_block=bx, fast_math=False, interpret=True,
    )
    ref = _ref_zx(Z, X, base, inc, diff, nZ, N, L, d)
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4 * max(scale, 1)

    g1 = jax.grad(
        lambda z, x: _weigh(ip.fused_tens_vs_seq_levels(
            z, x, num_levels=M_LVL, base=base, increments=inc,
            difference=diff, x_block=bx, fast_math=False, interpret=True)),
        argnums=(0, 1),
    )(Z, X)
    g2 = jax.grad(
        lambda z, x: _weigh(_ref_zx(z, x, base, inc, diff, nZ, N, L, d)),
        argnums=(0, 1),
    )(Z, X)
    for a, b in zip(g1, g2):
        gs = float(jnp.max(jnp.abs(b)))
        assert float(jnp.max(jnp.abs(a - b))) < 2e-3 * max(gs, 1)


def test_lane_batched_zx_padding_is_inert():
    """Example-0 gradients are identical whether or not the kernel pads
    (N=4 with bx=4 pads nothing; N=3 with bx=4 pads one replica of example
    0 whose pulled-back cotangent must be exactly zero)."""
    nZ, L, d = 5, 12, 2
    Z = jnp.asarray(RNG.randn(LT, nZ, 2, d).astype(np.float32) * 0.5)
    X4 = jnp.asarray((RNG.randn(4, L, d) / np.sqrt(L)).astype(np.float32))

    def obj(x, n):
        out = ip.fused_tens_vs_seq_levels(
            Z, x, num_levels=M_LVL, base="rbf", increments=True,
            difference=True, x_block=4, fast_math=False, interpret=True,
        )
        # weigh only the first n examples' entries
        w = jnp.cos(jnp.arange(out[:, :, :n].size, dtype=jnp.float32))
        return jnp.sum(out[:, :, :n] * w.reshape(out[:, :, :n].shape))

    g4 = jax.grad(lambda x: obj(x, 3))(X4)
    g3 = jax.grad(lambda x: obj(x, 3))(X4[:3])
    np.testing.assert_allclose(np.asarray(g4[:3]), np.asarray(g3),
                               rtol=1e-5, atol=1e-7)
    # the 4th example's grad is zero under a 3-example objective
    assert float(jnp.max(jnp.abs(g4[3]))) == 0.0
