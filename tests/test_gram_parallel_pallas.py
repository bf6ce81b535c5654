"""Regression: Pallas kernels must be dispatchable INSIDE `kernel_K_dp`'s
shard_map body.

On the real chip the per-device block function routes through the fused
Pallas path; jax >= 0.9 defaults `shard_map(check_vma=True)`, under which a
`pallas_call` in the body fails to trace ("vma on jax.ShapeDtypeStruct must
not be None" — jax's own recommendation is `check_vma=False`, which
`gram_parallel.py` now sets).  CPU tests exercise the XLA path only, so
this test injects an interpret-mode pallas identity into the block's level
computation to pin the trace-time behavior the TPU selftest hit
(`bench.py --selftest`, "kernel_K_dp (shard_map+fused) vs K" lane).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.sharding import Mesh

from gpsig_tpu import kernels
from gpsig_tpu.parallel import gram_parallel

RNG = np.random.RandomState(3)


class _PallasWrappedRBF(kernels.SignatureKernel):
    """rbf-based SignatureKernel whose seq-Gram levels pass through an
    interpret-mode pallas identity — a stand-in for the fused TPU dispatch
    inside the distributed-Gram block function.  (`kernels.SignatureRBF` is a
    factory *function*, so we subclass the class it wraps.)"""

    def __init__(self, num_features, num_levels):
        super().__init__(num_features, num_levels, base="rbf")

    def _K_seq(self, cp, X, X2=None):
        lv = super()._K_seq(cp, X, X2)

        def ident(x_ref, o_ref):
            o_ref[...] = x_ref[...]

        return pl.pallas_call(
            ident,
            out_shape=jax.ShapeDtypeStruct(lv.shape, lv.dtype),
            interpret=True,
        )(lv)


def test_kernel_K_dp_accepts_pallas_in_block():
    d, M = 2, 2
    X = jnp.asarray(RNG.randn(8, 6, d).cumsum(axis=1))
    kern = _PallasWrappedRBF(d, M)
    params = kern.init_params()

    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("data", "model"))
    K_dp = jax.jit(
        lambda x: gram_parallel.kernel_K_dp(kern, params, mesh, x)
    )(X)

    K_ref = kernels.SignatureRBF(d, M).K(params, X)
    np.testing.assert_allclose(np.asarray(K_dp), np.asarray(K_ref),
                               rtol=1e-10, atol=1e-12)
