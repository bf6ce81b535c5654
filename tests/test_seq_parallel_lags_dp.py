"""Round-4 SP extensions (VERDICT r3 items 3/4 + weak #4):

* ``num_lags`` under sequence parallelism — lag interpolation reaches
  across time chunks, so it runs on the gathered full sequences inside
  ``shard_map`` (`seq_parallel._local_window`); the reference's flagship
  GPSig benchmark config is ``num_lags=1``
  (`benchmarks/run_gpsig_benchmarks.py:32-33`), which this unlocks for the
  long-L path.
* DP x SP composition — one SVGP training step on a ('data', 'seq') mesh,
  batch sharded AND time sharded, matching single-device.
* ``full_f_cov`` under SP (was NotImplementedError).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpsig_tpu import SVGP, InducingTensors, kernels, likelihoods
from gpsig_tpu import utils as gp_utils
from gpsig_tpu.parallel import seq_parallel

RNG = np.random.RandomState(33)


def _seq_mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), axis_names=("seq",))


def _dp_sp_mesh(data=2, seq=4):
    devs = np.asarray(jax.devices()[: data * seq]).reshape(data, seq)
    return Mesh(devs, axis_names=("data", "seq"))


class TestLagsUnderSP:
    def test_kdiag_with_lags_matches_single_device(self):
        M_lvls, N, L, d = 3, 5, 32, 2
        X = RNG.randn(N, L, d).cumsum(axis=1) / np.sqrt(L)
        kern = kernels.SignatureRBF(d, M_lvls, num_lags=1,
                                    normalization=False)
        params = kern.init_params()
        mesh = _seq_mesh()
        Xs = jax.device_put(jnp.asarray(X),
                            NamedSharding(mesh, P(None, "seq", None)))
        sp = seq_parallel.kernel_seq_diag_sp(kern, params, mesh, Xs)
        ref = kern.Kdiag(params, jnp.asarray(X))
        np.testing.assert_allclose(np.asarray(sp), np.asarray(ref),
                                   rtol=1e-10)

    def test_kernel_K_sp_with_lags_matches_K(self):
        M_lvls, d = 2, 2
        Xa = RNG.randn(3, 16, d) / 4.0
        Xb = RNG.randn(4, 8, d) / 4.0
        kern = kernels.SignatureRBF(d, M_lvls, num_lags=2)
        params = kern.init_params()
        devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
        mesh = Mesh(devs, axis_names=("seq1", "seq2"))
        Xa_s = jax.device_put(jnp.asarray(Xa),
                              NamedSharding(mesh, P(None, "seq1", None)))
        Xb_s = jax.device_put(jnp.asarray(Xb),
                              NamedSharding(mesh, P(None, "seq2", None)))
        K_sp = seq_parallel.kernel_K_sp(kern, params, mesh, Xa_s, Xb_s)
        K_ref = kern.K(params, jnp.asarray(Xa), jnp.asarray(Xb))
        np.testing.assert_allclose(np.asarray(K_sp), np.asarray(K_ref),
                                   rtol=1e-10, atol=1e-12)

    def test_flagship_config_svgp_elbo_and_grads(self):
        """The reference's canonical GPSig config (num_lags=1, normalized,
        incremental inducing tensors) as an SP SVGP step."""
        M_lvls, N, L, d, nT = 2, 6, 24, 2, 4
        X = RNG.randn(N, L, d) / np.sqrt(L)
        y = RNG.randint(0, 2, N).astype(np.float64)
        Z = gp_utils.suggest_initial_inducing_tensors(
            X, M_lvls, nT, increments=True, num_lags=1, seed=0
        )
        kern = kernels.SignatureRBF(d, M_lvls, num_lags=1)
        mesh = _seq_mesh()
        ind_sp = seq_parallel.SPInducingTensors(Z, M_lvls, mesh,
                                                increments=True)
        ind_ref = InducingTensors(Z, M_lvls, increments=True)
        lik = likelihoods.Bernoulli()
        m_sp = SVGP(kern, ind_sp, lik, num_latent=1, num_data=N)
        m_ref = SVGP(kern, ind_ref, lik, num_latent=1, num_data=N)
        params = m_ref.init_params()
        params["q_mu"] = jnp.asarray(RNG.randn(*params["q_mu"].shape))
        Y = jnp.asarray(y[:, None])
        Xs = jax.device_put(jnp.asarray(X),
                            NamedSharding(mesh, P(None, "seq", None)))
        e_sp = float(jax.jit(m_sp.elbo)(params, Xs, Y))
        e_ref = float(m_ref.elbo(params, jnp.asarray(X), Y))
        np.testing.assert_allclose(e_sp, e_ref, rtol=1e-8)
        # grads under jit: the eager shard_map transpose corrupts the
        # glibc heap in this jax/XLA-CPU build (free(): corrupted unsorted
        # chunks → SIGABRT); jit is also the only production path
        g_sp = jax.jit(jax.grad(lambda p: m_sp.elbo(p, Xs, Y)))(params)
        g_ref = jax.jit(
            jax.grad(lambda p: m_ref.elbo(p, jnp.asarray(X), Y)))(params)
        for a, b in zip(jax.tree.leaves(g_sp), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-9)
        # the lag parameter's gradient is live through the SP path
        np.testing.assert_array_less(0.0, np.max(np.abs(np.asarray(
            g_sp["kern"]["lags"]))))

    def test_inducing_sequences_with_lags_under_sp(self):
        M_lvls, N, L, d, nZ, lz = 2, 5, 16, 2, 3, 4
        X = RNG.randn(N, L, d) / np.sqrt(L)
        Zseq = RNG.randn(nZ, lz, d) / np.sqrt(lz)
        kern = kernels.SignatureRBF(d, M_lvls, num_lags=1)
        mesh = _seq_mesh()
        ind_sp = seq_parallel.SPInducingSequences(Zseq, M_lvls, mesh)
        from gpsig_tpu.inducing import InducingSequences
        ind_ref = InducingSequences(Zseq, M_lvls)
        ip = ind_ref.init_params()
        kp = kern.init_params()
        Xs = jax.device_put(jnp.asarray(X),
                            NamedSharding(mesh, P(None, "seq", None)))
        sp = jax.jit(lambda i, k, x: ind_sp.Kuu_Kuf_Kff(
            i, kern, k, x, jitter=1e-8))(ip, kp, Xs)
        ref = ind_ref.Kuu_Kuf_Kff(ip, kern, kp, jnp.asarray(X), jitter=1e-8)
        for a, b in zip(sp, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-9, atol=1e-11)


class TestFullFCovUnderSP:
    def test_full_f_cov_matches_fused_call(self):
        M_lvls, N, L, d, nT = 2, 5, 16, 2, 4
        X = RNG.randn(N, L, d) / np.sqrt(L)
        Z = gp_utils.suggest_initial_inducing_tensors(
            X, M_lvls, nT, increments=True, seed=0
        )
        kern = kernels.SignatureRBF(d, M_lvls)
        mesh = _seq_mesh()
        ind_sp = seq_parallel.SPInducingTensors(Z, M_lvls, mesh,
                                                increments=True)
        ind_ref = InducingTensors(Z, M_lvls, increments=True)
        ip = ind_ref.init_params()
        kp = kern.init_params()
        Xs = jax.device_put(jnp.asarray(X),
                            NamedSharding(mesh, P(None, "seq", None)))
        sp = jax.jit(lambda i, k, x: ind_sp.Kuu_Kuf_Kff(
            i, kern, k, x, jitter=1e-8, full_f_cov=True))(ip, kp, Xs)
        ref = ind_ref.Kuu_Kuf_Kff(ip, kern, kp, jnp.asarray(X),
                                  jitter=1e-8, full_f_cov=True)
        assert sp[2].shape == (N, N)
        for a, b in zip(sp, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-9, atol=1e-11)


class TestDPxSP:
    def test_training_step_on_data_seq_mesh(self):
        """One full SVGP training step, batch sharded over 'data' AND time
        sharded over 'seq', == single-device (the large-N long-L deployment
        shape; VERDICT r3 item 4)."""
        import optax

        M_lvls, N, L, d, nT = 2, 8, 16, 2, 4
        X = RNG.randn(N, L, d) / np.sqrt(L)
        y = RNG.randint(0, 2, N).astype(np.float64)
        Z = gp_utils.suggest_initial_inducing_tensors(
            X, M_lvls, nT, increments=True, seed=0
        )
        kern = kernels.SignatureRBF(d, M_lvls)
        mesh = _dp_sp_mesh(data=2, seq=4)
        ind_sp = seq_parallel.SPInducingTensors(
            Z, M_lvls, mesh, increments=True, batch_axis="data"
        )
        ind_ref = InducingTensors(Z, M_lvls, increments=True)
        lik = likelihoods.Bernoulli()
        m_sp = SVGP(kern, ind_sp, lik, num_latent=1, num_data=N)
        m_ref = SVGP(kern, ind_ref, lik, num_latent=1, num_data=N)
        params = m_ref.init_params()
        params["q_mu"] = jnp.asarray(RNG.randn(*params["q_mu"].shape))
        Y = jnp.asarray(y[:, None])
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
            lambda p, s: step(p, s, Xs, Ys, m_sp))(params, st)
        p_ref, _, l_ref = step(params, st, jnp.asarray(X), Y, m_ref)
        np.testing.assert_allclose(float(l_sp), float(l_ref), rtol=1e-8)
        for a, b in zip(jax.tree.leaves(p_sp), jax.tree.leaves(p_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-9)

    def test_inducing_sequences_on_data_seq_mesh(self):
        """DP x SP for the sequences inducing family: batch AND time
        sharded ELBO == single-device."""
        M_lvls, N, L, d, nZ, lz = 2, 4, 16, 2, 3, 4
        X = RNG.randn(N, L, d) / np.sqrt(L)
        y = RNG.randint(0, 2, N).astype(np.float64)
        Zseq = RNG.randn(nZ, lz, d) / np.sqrt(lz)
        kern = kernels.SignatureRBF(d, M_lvls)
        mesh = _dp_sp_mesh(data=2, seq=4)
        ind_sp = seq_parallel.SPInducingSequences(
            Zseq, M_lvls, mesh, batch_axis="data")
        from gpsig_tpu.inducing import InducingSequences
        ind_ref = InducingSequences(Zseq, M_lvls)
        m_sp = SVGP(kern, ind_sp, likelihoods.Bernoulli(), num_latent=1,
                    num_data=N)
        m_ref = SVGP(kern, ind_ref, likelihoods.Bernoulli(), num_latent=1,
                     num_data=N)
        params = m_ref.init_params()
        params["q_mu"] = jnp.asarray(RNG.randn(*params["q_mu"].shape))
        Y = jnp.asarray(y[:, None])
        Xs = jax.device_put(jnp.asarray(X),
                            NamedSharding(mesh, P("data", "seq", None)))
        e_sp = float(jax.jit(m_sp.elbo)(params, Xs, Y))
        e_ref = float(m_ref.elbo(params, jnp.asarray(X), Y))
        np.testing.assert_allclose(e_sp, e_ref, rtol=1e-8)
        g_sp = jax.jit(jax.grad(lambda p: m_sp.elbo(p, Xs, Y)))(params)
        g_ref = jax.jit(
            jax.grad(lambda p: m_ref.elbo(p, jnp.asarray(X), Y)))(params)
        for a, b in zip(jax.tree.leaves(g_sp), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-9)

    def test_dp_sp_with_lags(self):
        """The flagship config (lags) on the combined mesh."""
        M_lvls, N, L, d, nT = 2, 4, 8, 2, 3
        X = RNG.randn(N, L, d) / np.sqrt(L)
        y = RNG.randint(0, 2, N).astype(np.float64)
        Z = gp_utils.suggest_initial_inducing_tensors(
            X, M_lvls, nT, increments=True, num_lags=1, seed=0
        )
        kern = kernels.SignatureRBF(d, M_lvls, num_lags=1)
        mesh = _dp_sp_mesh(data=2, seq=4)
        ind_sp = seq_parallel.SPInducingTensors(
            Z, M_lvls, mesh, increments=True, batch_axis="data"
        )
        ind_ref = InducingTensors(Z, M_lvls, increments=True)
        m_sp = SVGP(kern, ind_sp, likelihoods.Bernoulli(), num_latent=1,
                    num_data=N)
        m_ref = SVGP(kern, ind_ref, likelihoods.Bernoulli(), num_latent=1,
                     num_data=N)
        params = m_ref.init_params()
        Y = jnp.asarray(y[:, None])
        Xs = jax.device_put(jnp.asarray(X),
                            NamedSharding(mesh, P("data", "seq", None)))
        e_sp = float(jax.jit(m_sp.elbo)(params, Xs, Y))
        e_ref = float(m_ref.elbo(params, jnp.asarray(X), Y))
        np.testing.assert_allclose(e_sp, e_ref, rtol=1e-8)
