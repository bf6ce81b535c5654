"""Multi-device sharding on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from gpsig_tpu import (
    SVGP, InducingSequences, InducingTensors, kernels, likelihoods, parallel,
    utils as gp_utils,
)


def _setup(num_data=32, L=12, d=2, M=3, n_ind=16, increments=True):
    rng = np.random.RandomState(0)
    X = rng.randn(num_data, L, d)
    y = rng.randint(0, 2, size=num_data)
    Z = gp_utils.suggest_initial_inducing_tensors(
        X, M, n_ind, increments=increments, seed=0
    )
    kern = kernels.SignatureRBF(d, M)
    ind = InducingTensors(Z, M, increments=increments)
    model = SVGP(kern, ind, likelihoods.Bernoulli(), num_latent=1,
                 num_data=num_data)
    params = model.init_params()
    return model, params, jnp.asarray(X), jnp.asarray(y[:, None], X.dtype)


def test_eight_devices_available():
    assert jax.device_count() == 8


def test_mesh_shapes():
    mesh = parallel.make_mesh(8)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = parallel.make_mesh(8, data=8, model=1)
    assert mesh.shape == {"data": 8, "model": 1}
    with pytest.raises(ValueError):
        parallel.make_mesh(8, data=3, model=3)


def test_sharded_step_matches_single_device():
    model, params, X, Y = _setup()
    opt = optax.nadam(1e-2)
    step = parallel.make_train_step(model, opt)

    # single device reference
    p1, s1, loss1 = step(params, opt.init(params), X, Y)

    # 4x2 mesh
    mesh = parallel.make_mesh(8)
    params_s = parallel.shard_params(mesh, model, params)
    Xs, Ys = parallel.shard_batch(mesh, X, Y)
    opt_state = jax.device_put(opt.init(params_s))
    with mesh:
        p2, s2, loss2 = step(params_s, opt_state, Xs, Ys)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-9)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8)


def test_shardings_actually_applied():
    model, params, X, Y = _setup()
    mesh = parallel.make_mesh(8)
    params_s = parallel.shard_params(mesh, model, params)
    Xs, _ = parallel.shard_batch(mesh, X, Y)
    # X sharded over 'data' (4-way): each shard holds N/4 examples
    assert len(Xs.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in Xs.addressable_shards}
    assert shard_shapes == {(X.shape[0] // 4, X.shape[1], X.shape[2])}
    # inducing Z sharded over 'model' (2-way) on the n_Z axis
    Zs = params_s["ind"]["Z"]
    z_shapes = {s.data.shape for s in Zs.addressable_shards}
    n_Z = Zs.shape[1]
    assert all(shape[1] == n_Z // 2 for shape in z_shapes)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))
    ge.dryrun_multichip(8)


def test_inducing_sequences_sharding():
    rng = np.random.RandomState(1)
    num_data, L, d, M = 16, 10, 2, 2
    X = rng.randn(num_data, L, d)
    y = rng.randint(0, 2, size=num_data)
    Z = gp_utils.suggest_initial_inducing_sequences(X, 8, 4, seed=0)
    kern = kernels.SignatureRBF(d, M)
    ind = InducingSequences(Z, M)
    model = SVGP(kern, ind, likelihoods.Bernoulli(), num_latent=1,
                 num_data=num_data)
    params = model.init_params()
    mesh = parallel.make_mesh(8)
    params_s = parallel.shard_params(mesh, model, params)
    Xs, Ys = parallel.shard_batch(mesh, jnp.asarray(X),
                                  jnp.asarray(y[:, None], X.dtype))
    opt = optax.nadam(1e-3)
    step = parallel.make_train_step(model, opt)
    with mesh:
        p, s, loss = step(params_s, jax.device_put(opt.init(params_s)), Xs, Ys)
    assert np.isfinite(float(loss))


class TestDistributedGram:
    """Example-sharded K blocks over the ('data','model') mesh
    (`parallel/gram_parallel.py`): each device computes and holds only its
    (N1/P, N2/Q) tile; values match single-device `SignatureKernel.K`."""

    def _xs(self, n1=17, n2=11, L=9, d=2, seed=5):
        rng = np.random.RandomState(seed)
        return (jnp.asarray(rng.randn(n1, L, d)),
                jnp.asarray(rng.randn(n2, L + 3, d)))

    def test_symmetric_matches_K(self):
        X, _ = self._xs()
        kern = kernels.SignatureRBF(2, 3)
        p = kern.init_params()
        mesh = parallel.make_mesh(8)  # data=4, model=2; 17 ragged over both
        Kd = parallel.kernel_K_dp(kern, p, mesh, X)
        Kref = kern.K(p, X)
        assert Kd.shape == (17, 17)
        np.testing.assert_allclose(np.asarray(Kd), np.asarray(Kref),
                                   rtol=1e-9, atol=1e-11)

    def test_cross_and_unnormalized_and_levels(self):
        X, X2 = self._xs()
        mesh = parallel.make_mesh(8)
        for norm in (True, False):
            kern = kernels.SignatureRBF(2, 2, normalization=norm)
            p = kern.init_params()
            Kd = parallel.kernel_K_dp(kern, p, mesh, X, X2)
            Kref = kern.K(p, X, X2)
            np.testing.assert_allclose(np.asarray(Kd), np.asarray(Kref),
                                       rtol=1e-9, atol=1e-11)
        kern = kernels.SignatureRBF(2, 2)
        p = kern.init_params()
        Kl = parallel.kernel_K_dp(kern, p, mesh, X, X2, return_levels=True)
        np.testing.assert_allclose(
            np.asarray(jnp.sum(Kl, axis=0)),
            np.asarray(kern.K(p, X, X2)), rtol=1e-9, atol=1e-11)

    def test_higher_order_and_lags(self):
        # no order/lag restriction (unlike time-axis SP: lags interpolate
        # across time chunks, but example blocks keep whole sequences)
        X, X2 = self._xs(n1=8, n2=8)
        mesh = parallel.make_mesh(8, data=2, model=4)
        kern = kernels.SignatureRBF(2, 3, order=2, num_lags=1)
        p = kern.init_params()
        Kd = parallel.kernel_K_dp(kern, p, mesh, X, X2,
                                  axes=("data", "model"))
        np.testing.assert_allclose(np.asarray(Kd), np.asarray(kern.K(p, X, X2)),
                                   rtol=1e-9, atol=1e-11)

    def test_blocks_stay_distributed(self):
        # each device's shard is exactly its (ceil(N1/P), ceil(N2/Q)) tile
        X, X2 = self._xs(n1=16, n2=16)
        mesh = parallel.make_mesh(8)  # 4 x 2
        kern = kernels.SignatureRBF(2, 2)
        p = kern.init_params()
        Kd = jax.jit(
            lambda x, x2: parallel.kernel_K_dp(kern, p, mesh, x, x2)
        )(X, X2)
        shard_shapes = {s.data.shape for s in Kd.addressable_shards}
        assert shard_shapes == {(4, 8)}
        assert len(Kd.addressable_shards) == 8

    def test_low_rank_rejected(self):
        X, _ = self._xs(n1=8)
        kern = kernels.SignatureRBF(2, 2, low_rank=True, num_components=8)
        with pytest.raises(NotImplementedError, match="low-rank"):
            parallel.kernel_K_dp(kern, kern.init_params(),
                                 parallel.make_mesh(8), X)

    def test_no_device_holds_full_gram(self):
        """Static jaxpr proof: inside the shard_map body every intermediate
        is tile-sized — the (N, N) Gram never exists on one device."""
        from tests.test_seq_parallel import _max_intermediate_size

        N, L = 32, 6
        X = jnp.asarray(np.random.RandomState(0).randn(N, L, 2))
        mesh = parallel.make_mesh(8)  # 4 x 2 -> (8, 16) tiles
        kern = kernels.SignatureRBF(2, 2)
        p = kern.init_params()

        def fn(x):
            return parallel.kernel_K_dp(kern, p, mesh, x)

        max_size = _max_intermediate_size(fn, X)
        # the largest per-device object is the tile's (n1b*L, n2b*L) base
        # Gram from _K_seq, far below the full (N*L, N*L) one
        full = (N * L) ** 2
        tile = (N // 4 * L) * (N // 2 * L)
        assert max_size <= tile, (max_size, tile)
        assert max_size < full / 4
