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
