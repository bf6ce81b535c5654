"""Worked example 5: kernel ridge regression on a distributed signature Gram.

The reference can only use its kernel inside the GPflow SVGP; a plain
kernel-machine workflow (ridge / SVM / GP regression on the full Gram) dies
at the (N, N) matrix for large N.  Here the Gram computes block-distributed
over the ('data', 'model') mesh (`parallel.kernel_K_dp` — each device holds
one (N/P, N/Q) tile) and the ridge solve runs conjugate gradients directly
on the sharded matrix: `jnp.dot(K, v)` with K block-sharded is a local
tile-matvec plus an XLA `psum` over ICI — no hand-written collectives, and
the full Gram never exists on any one device.

Run (CPU mesh): JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    PYTHONPATH=. python examples/distributed_gram_kernel_ridge.py
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from gpsig_tpu import kernels, parallel


def main():
    rng = np.random.RandomState(0)
    N, N_test, L, d = 320, 48, 20, 3
    mesh = parallel.make_mesh(8)  # ('data': 4, 'model': 2)

    # a smooth regression target on random paths
    def make(n):
        X = rng.randn(n, L, d) / np.sqrt(L)
        # smooth functional of the path: tanh of the channel-0 displacement
        # (a level-1 signature feature) + a curvature term
        disp = X[:, :, 0].sum(axis=1)
        curv = (np.diff(X[:, :, 1], axis=1) ** 2).sum(axis=1)
        y = np.tanh(disp) + 0.5 * curv + 0.02 * rng.randn(n)
        return jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32)

    X, y = make(N)
    Xt, yt = make(N_test)

    from gpsig_tpu import utils as gp_utils

    kern = kernels.SignatureRBF(
        d, num_levels=4,
        lengthscales=gp_utils.suggest_initial_lengthscales(np.asarray(X)),
    )
    params = kern.init_params()
    lam = 1e-3

    # (N, N) train Gram, block-sharded over the mesh: P('data', 'model')
    K = parallel.kernel_K_dp(kern, params, mesh, X)

    def matvec(v):
        # local tile matvec + psum over the column axis (XLA inserts it)
        return jnp.dot(K, v) + lam * v

    alpha, info = jax.scipy.sparse.linalg.cg(matvec, y, tol=1e-8,
                                             maxiter=500)
    del info

    # cross Gram test x train, rows over 'data', cols over 'model'
    Kx = parallel.kernel_K_dp(kern, params, mesh, Xt, X)
    pred = jnp.dot(Kx, alpha)

    resid = float(jnp.sqrt(jnp.mean((jnp.dot(K, alpha) + lam * alpha - y)
                                    ** 2)))
    rmse = float(jnp.sqrt(jnp.mean((pred - yt) ** 2)))
    base = float(jnp.sqrt(jnp.mean((yt - jnp.mean(y)) ** 2)))
    print(f"CG solve residual: {resid:.2e}")
    print(f"test RMSE {rmse:.3f} vs predict-the-mean {base:.3f}")
    assert resid < 1e-4
    assert rmse < 0.6 * base

    # sanity: the Gram really is distributed (each device holds one tile)
    shards = {s.data.shape for s in K.addressable_shards}
    print(f"K sharding: {len(K.addressable_shards)} tiles of {shards}")


if __name__ == "__main__":
    main()
