"""Full 3-axis ('data', 'model', 'seq') mesh composition (VERDICT r4
item 6): one SVGP training step batch-, inducing-, AND time-sharded at
once, matching single-device.  The deployment shape for large-N /
large-nZ / long-L: DP over examples, TP over inducing tensors (Z rows +
q_mu via `parallel.param_shardings`), SP over time inside the fused
covariance shard_map (`seq_parallel.tens_n_seq_levels_from_sequences`'s
``z_axis`` leg)."""

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpsig_tpu import SVGP, InducingTensors, kernels, likelihoods
from gpsig_tpu import utils as gp_utils
from gpsig_tpu.parallel import seq_parallel, sharding

RNG = np.random.RandomState(55)


def _mesh3(data=2, model=2, seq=2):
    devs = np.asarray(jax.devices()[: data * model * seq]).reshape(
        data, model, seq)
    return Mesh(devs, axis_names=("data", "model", "seq"))


def test_training_step_on_data_model_seq_mesh():
    M_lvls, N, L, d, nT = 2, 4, 16, 2, 4
    X = RNG.randn(N, L, d) / np.sqrt(L)
    y = RNG.randint(0, 2, N).astype(np.float64)
    Z = gp_utils.suggest_initial_inducing_tensors(
        X, M_lvls, nT, increments=True, seed=0
    )
    kern = kernels.SignatureRBF(d, M_lvls)
    mesh = _mesh3()
    ind_sp = seq_parallel.SPInducingTensors(
        Z, M_lvls, mesh, increments=True, batch_axis="data",
        z_axis="model",
    )
    ind_ref = InducingTensors(Z, M_lvls, increments=True)
    lik = likelihoods.Bernoulli()
    m_sp = SVGP(kern, ind_sp, lik, num_latent=1, num_data=N)
    m_ref = SVGP(kern, ind_ref, lik, num_latent=1, num_data=N)
    params = m_ref.init_params()
    params["q_mu"] = jnp.asarray(RNG.randn(*params["q_mu"].shape))
    Y = jnp.asarray(y[:, None])

    # all three shardings at once: params TP over 'model', X DP x SP
    p_sharded = sharding.shard_params(mesh, m_sp, params)
    Xs = jax.device_put(jnp.asarray(X),
                        NamedSharding(mesh, P("data", "seq", None)))
    Ys = jax.device_put(Y, NamedSharding(mesh, P("data", None)))

    opt = optax.nadam(1e-3)

    def step(p, s, x, yy, m):
        loss, g = jax.value_and_grad(m.loss)(p, x, yy)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    st = opt.init(params)
    p_sp, _, l_sp = jax.jit(
        lambda p, s: step(p, s, Xs, Ys, m_sp))(p_sharded, st)
    p_ref, _, l_ref = step(params, st, jnp.asarray(X), Y, m_ref)
    np.testing.assert_allclose(float(l_sp), float(l_ref), rtol=1e-8)
    for a, b in zip(jax.tree.leaves(p_sp), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9)


def test_param_shardings_unwrap_sp_inducing():
    """`param_shardings` must see through the SP drop-in wrapper: packed
    tensors shard n_Z on axis 1 (regression: the wrapper was not an
    InducingTensors instance, so Z was sharded on axis 0 = len_tensors)."""
    mesh = _mesh3()
    Z = RNG.randn(3, 4, 2, 2)
    ind_sp = seq_parallel.SPInducingTensors(
        Z, 2, mesh, increments=True, batch_axis="data", z_axis="model")
    m = SVGP(kernels.SignatureRBF(2, 2), ind_sp, likelihoods.Bernoulli(),
             num_latent=1, num_data=8)
    params = m.init_params()
    sh = sharding.param_shardings(mesh, m, params)
    assert sh["ind"]["Z"].spec == P(None, "model", None, None)
    assert sh["q_mu"].spec == P("model", None)
