"""Sequence parallelism: chunked-time recursions == single-device results."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpsig_tpu.ops import signature as sig_ops
from gpsig_tpu.parallel import seq_parallel

RNG = np.random.RandomState(21)


def _seq_mesh(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), axis_names=("seq",))


class TestTensVsSeqSP:
    def test_matches_single_device(self):
        M_lvls, nT, N, L = 4, 5, 6, 33  # L-1 = 32, divisible by 8 chunks
        len_tensors = M_lvls * (M_lvls + 1) // 2
        Z = RNG.randn(len_tensors, nT, 2)
        X = RNG.randn(N, L, 2) / np.sqrt(L)
        M_pts = jnp.asarray(np.einsum("kid,nld->kinl", Z, X))
        ref = sig_ops.signature_kern_tens_vs_seq_first_order(M_pts, M_lvls)

        M_inc = M_pts[..., 1:] - M_pts[..., :-1]
        mesh = _seq_mesh()
        M_inc_sharded = jax.device_put(
            M_inc, NamedSharding(mesh, P(None, None, None, "seq"))
        )
        out = seq_parallel.tens_vs_seq_levels_seq_parallel(
            mesh, M_inc_sharded, M_lvls
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-10)

    def test_jits_under_mesh(self):
        M_lvls, nT, N, L = 3, 4, 5, 17  # L-1 = 16
        len_tensors = M_lvls * (M_lvls + 1) // 2
        Z = RNG.randn(len_tensors, nT, 2)
        X = RNG.randn(N, L, 2)
        M_pts = jnp.asarray(np.einsum("kid,nld->kinl", Z, X))
        M_inc = M_pts[..., 1:] - M_pts[..., :-1]
        mesh = _seq_mesh()
        M_inc_s = jax.device_put(
            M_inc, NamedSharding(mesh, P(None, None, None, "seq"))
        )
        f = jax.jit(
            lambda m: seq_parallel.tens_vs_seq_levels_seq_parallel(
                mesh, m, M_lvls
            )
        )
        ref = sig_ops.signature_kern_tens_vs_seq_first_order(M_pts, M_lvls)
        np.testing.assert_allclose(np.asarray(f(M_inc_s)), np.asarray(ref),
                                   rtol=1e-10)


class TestSeqDiagSP:
    def test_matches_single_device(self):
        M_lvls, N, L = 4, 5, 25  # L-1 = 24, 8 chunks of 3
        X = RNG.randn(N, L, 3) / np.sqrt(L)
        M3 = jnp.asarray(np.einsum("nld,nsd->nls", X, X))
        ref = sig_ops.signature_kern_first_order(M3, M_lvls)

        M_inc = (
            M3[:, 1:, 1:] + M3[:, :-1, :-1] - M3[:, :-1, 1:] - M3[:, 1:, :-1]
        )
        mesh = _seq_mesh()
        M_inc_s = jax.device_put(
            M_inc, NamedSharding(mesh, P(None, None, "seq"))
        )
        out = seq_parallel.seq_diag_levels_seq_parallel(mesh, M_inc_s, M_lvls)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-10)

    def test_long_sequence_memory_split(self):
        # each device only holds an L/8 stripe of the (L, L) Grams
        M_lvls, N, L = 3, 2, 65
        X = RNG.randn(N, L, 2) / np.sqrt(L)
        M3 = jnp.asarray(np.einsum("nld,nsd->nls", X, X))
        ref = sig_ops.signature_kern_first_order(M3, M_lvls)
        M_inc = (
            M3[:, 1:, 1:] + M3[:, :-1, :-1] - M3[:, :-1, 1:] - M3[:, 1:, :-1]
        )
        mesh = _seq_mesh()
        M_inc_s = jax.device_put(
            M_inc, NamedSharding(mesh, P(None, None, "seq"))
        )
        shard_shapes = {s.data.shape for s in M_inc_s.addressable_shards}
        assert shard_shapes == {(N, L - 1, (L - 1) // 8)}
        out = seq_parallel.seq_diag_levels_seq_parallel(mesh, M_inc_s, M_lvls)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-10)


class TestSeqCrossSP:
    """Full (L1, L2) cross-Gram recursion with BOTH time axes chunked."""

    def _mesh2d(self, shape=(2, 4)):
        devs = np.asarray(jax.devices()[: shape[0] * shape[1]]).reshape(shape)
        return Mesh(devs, axis_names=("seq1", "seq2"))

    def _case(self, M_lvls, N1, N2, L1, L2, mesh_shape=(2, 4)):
        X = RNG.randn(N1, L1, 2) / np.sqrt(L1)
        X2 = RNG.randn(N2, L2, 2) / np.sqrt(L2)
        M4 = jnp.asarray(np.einsum("nld,msd->nlms", X, X2))
        ref = sig_ops.signature_kern_first_order(M4, M_lvls)
        M_inc = (
            M4[:, 1:, :, 1:] + M4[:, :-1, :, :-1]
            - M4[:, :-1, :, 1:] - M4[:, 1:, :, :-1]
        )
        mesh = self._mesh2d(mesh_shape)
        M_inc_s = jax.device_put(
            M_inc, NamedSharding(mesh, P(None, "seq1", None, "seq2"))
        )
        out = seq_parallel.seq_cross_levels_seq_parallel(
            mesh, M_inc_s, M_lvls
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-10)
        return mesh, M_inc_s

    def test_matches_single_device(self):
        self._case(M_lvls=4, N1=4, N2=3, L1=17, L2=33)  # chunks 8 and 8

    def test_uneven_axes_and_jit(self):
        M_lvls, N1, N2, L1, L2 = 3, 3, 2, 9, 13  # L-1 = 8, 12 over (4, 2)
        X = RNG.randn(N1, L1, 2)
        X2 = RNG.randn(N2, L2, 2)
        M4 = jnp.asarray(np.einsum("nld,msd->nlms", X, X2))
        ref = sig_ops.signature_kern_first_order(M4, M_lvls)
        M_inc = (
            M4[:, 1:, :, 1:] + M4[:, :-1, :, :-1]
            - M4[:, :-1, :, 1:] - M4[:, 1:, :, :-1]
        )
        mesh = self._mesh2d((4, 2))
        M_inc_s = jax.device_put(
            M_inc, NamedSharding(mesh, P(None, "seq1", None, "seq2"))
        )
        f = jax.jit(
            lambda m: seq_parallel.seq_cross_levels_seq_parallel(
                mesh, m, M_lvls
            )
        )
        np.testing.assert_allclose(np.asarray(f(M_inc_s)), np.asarray(ref),
                                   rtol=1e-10)

    def test_blocks_are_distributed(self):
        mesh, M_inc_s = self._case(M_lvls=2, N1=2, N2=2, L1=17, L2=17,
                                   mesh_shape=(2, 4))
        shard_shapes = {s.data.shape for s in M_inc_s.addressable_shards}
        assert shard_shapes == {(2, 8, 2, 4)}


def _max_intermediate_size(fn, *args):
    """Largest intermediate array (elements) anywhere in fn's jaxpr,
    including inside shard_map bodies (whose avals are LOCAL shapes) —
    a static proof that no device materializes more than its Gram stripe."""
    sizes = [0]

    def walk(jaxpr):
        for eqn in jaxpr.eqns:
            for v in eqn.outvars:
                aval = getattr(v, "aval", None)
                if aval is not None and hasattr(aval, "size"):
                    sizes.append(int(aval.size))
            for val in eqn.params.values():
                for sub in _subjaxprs(val):
                    walk(sub)

    def _subjaxprs(val):
        if hasattr(val, "jaxpr"):  # ClosedJaxpr
            return [val.jaxpr]
        if hasattr(val, "eqns"):  # Jaxpr
            return [val]
        if isinstance(val, (tuple, list)):
            return [j for v in val for j in _subjaxprs(v)]
        return []

    walk(jax.make_jaxpr(fn)(*args).jaxpr)
    return max(sizes)


class TestSequencesInSP:
    """Sequences-in sequence parallelism: each device builds its own
    increment-Gram stripe from time-sharded sequences inside shard_map —
    the global Gram is never materialized (VERDICT round-2 item 1)."""

    def _rbf_gram(self, Xa, Xb=None):
        from gpsig_tpu.ops import base_kernels
        return base_kernels.rbf({}, jnp.asarray(Xa),
                                None if Xb is None else jnp.asarray(Xb))

    def test_diag_from_sequences_rbf(self):
        M_lvls, N, L = 4, 5, 24  # 8 chunks of 3
        X = jnp.asarray(RNG.randn(N, L, 3) / np.sqrt(L))
        mesh = _seq_mesh()
        pair_fn = seq_parallel.make_pair_increment_fn("rbf")
        Xs = jax.device_put(X, NamedSharding(mesh, P(None, "seq", None)))
        out = seq_parallel.seq_diag_levels_from_sequences(
            mesh, Xs, M_lvls, pair_fn=pair_fn
        )
        ref = sig_ops.signature_kern_first_order(self._rbf_gram(X), M_lvls)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-9, atol=1e-12)

    def test_diag_from_sequences_generic_base(self):
        # non-integer-degree poly has no closed-form increment algebra
        # (`ops/gram._poly_increment_maker` gate) -> generic fallback
        from gpsig_tpu.ops import base_kernels
        M_lvls, N, L = 3, 4, 16
        X = jnp.asarray(RNG.randn(N, L, 2) / np.sqrt(L))
        mesh = _seq_mesh()
        pp = {"poly_gamma": 1.0, "poly_degree": 2.5}
        kern_fn = lambda A, B=None: base_kernels.poly(pp, A, B)
        pair_fn = seq_parallel.make_pair_increment_fn("poly", kern_fn,
                                                      params=pp)
        Xs = jax.device_put(X, NamedSharding(mesh, P(None, "seq", None)))
        out = seq_parallel.seq_diag_levels_from_sequences(
            mesh, Xs, M_lvls, pair_fn=pair_fn
        )
        ref = sig_ops.signature_kern_first_order(kern_fn(X), M_lvls)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-8, atol=1e-12)

    def test_cross_from_sequences(self):
        from gpsig_tpu.ops import gram as gram_ops
        import functools
        from jax import lax
        M_lvls, N1, N2, L1, L2 = 4, 4, 3, 16, 8  # (2, 4) time mesh
        X = jnp.asarray(RNG.randn(N1, L1, 2) / np.sqrt(L1))
        X2 = jnp.asarray(RNG.randn(N2, L2, 2) / np.sqrt(L2))
        devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devs, axis_names=("seq1", "seq2"))
        cross_fn, _ = gram_ops.increment_gram_fns("rbf")
        pair_cross = functools.partial(
            cross_fn, precision=lax.Precision.HIGHEST
        )
        Xs = jax.device_put(X, NamedSharding(mesh, P(None, "seq1", None)))
        X2s = jax.device_put(X2, NamedSharding(mesh, P(None, "seq2", None)))
        out = seq_parallel.seq_cross_levels_from_sequences(
            mesh, Xs, X2s, M_lvls, pair_cross_fn=pair_cross
        )
        flat = self._rbf_gram(
            np.asarray(X).reshape(N1 * L1, 2), np.asarray(X2).reshape(N2 * L2, 2)
        ).reshape(N1, L1, N2, L2)
        ref = sig_ops.signature_kern_first_order(flat, M_lvls)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-9, atol=1e-12)

    def test_kernel_K_sp_matches_K(self):
        from gpsig_tpu import kernels
        M_lvls, N1, N2, L1, L2, d = 3, 4, 3, 16, 8, 2
        X = RNG.randn(N1, L1, d) / np.sqrt(L1)
        X2 = RNG.randn(N2, L2, d) / np.sqrt(L2)
        kern = kernels.SignatureRBF(d, M_lvls, lengthscales=[0.9, 1.3])
        p = kern.init_params()
        devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devs, axis_names=("seq1", "seq2"))
        Xs = jax.device_put(jnp.asarray(X),
                            NamedSharding(mesh, P(None, "seq1", None)))
        # symmetric
        K_sp = seq_parallel.kernel_K_sp(kern, p, mesh, Xs)
        K_ref = kern.K(p, jnp.asarray(X))
        np.testing.assert_allclose(np.asarray(K_sp), np.asarray(K_ref),
                                   rtol=1e-8, atol=1e-10)
        # cross
        X2s = jax.device_put(jnp.asarray(X2),
                             NamedSharding(mesh, P(None, "seq2", None)))
        K_sp2 = seq_parallel.kernel_K_sp(kern, p, mesh, Xs, X2s)
        K_ref2 = kern.K(p, jnp.asarray(X), jnp.asarray(X2))
        np.testing.assert_allclose(np.asarray(K_sp2), np.asarray(K_ref2),
                                   rtol=1e-8, atol=1e-10)

    def test_tens_covs_sp_matches_fused_call(self):
        from gpsig_tpu import kernels, utils as gp_utils
        M_lvls, N, L, d, nT = 3, 5, 24, 2, 4
        X = RNG.randn(N, L, d) / np.sqrt(L)
        Z = gp_utils.suggest_initial_inducing_tensors(
            X, M_lvls, nT, increments=True, seed=0
        )
        kern = kernels.SignatureRBF(d, M_lvls)
        p = kern.init_params()
        mesh = _seq_mesh()
        Xs = jax.device_put(jnp.asarray(X),
                            NamedSharding(mesh, P(None, "seq", None)))
        Kzz, Kzx, Kxx = seq_parallel.kernel_tens_n_seq_covs_sp(
            kern, p, mesh, jnp.asarray(Z), Xs, increments=True
        )
        Kzz_r, Kzx_r, Kxx_r = kern.K_tens_n_seq_covs(
            p, jnp.asarray(Z), jnp.asarray(X), increments=True
        )
        np.testing.assert_allclose(np.asarray(Kzz), np.asarray(Kzz_r),
                                   rtol=1e-9)
        np.testing.assert_allclose(np.asarray(Kzx), np.asarray(Kzx_r),
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(Kxx), np.asarray(Kxx_r),
                                   rtol=1e-9)
        # unnormalized branch (level-scaled raw diag, single shard_map)
        kern_u = kernels.SignatureRBF(d, M_lvls, normalization=False)
        p_u = kern_u.init_params()
        out_u = seq_parallel.kernel_tens_n_seq_covs_sp(
            kern_u, p_u, mesh, jnp.asarray(Z), Xs, increments=True
        )
        out_r = kern_u.K_tens_n_seq_covs(
            p_u, jnp.asarray(Z), jnp.asarray(X), increments=True
        )
        for a, b in zip(out_u, out_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-8, atol=1e-10)

    def test_seq_covs_sp_matches_fused_call(self):
        from gpsig_tpu import kernels, utils as gp_utils
        M_lvls, N, L, d, nZ, lz = 3, 5, 24, 2, 4, 6
        X = RNG.randn(N, L, d) / np.sqrt(L)
        Z = gp_utils.suggest_initial_inducing_sequences(X, nZ, lz, seed=0)
        mesh = _seq_mesh()
        Xs = jax.device_put(jnp.asarray(X),
                            NamedSharding(mesh, P(None, "seq", None)))
        for norm in (True, False):
            kern = kernels.SignatureRBF(d, M_lvls, normalization=norm)
            p = kern.init_params()
            out_sp = seq_parallel.kernel_seq_n_seq_covs_sp(
                kern, p, mesh, jnp.asarray(Z), Xs
            )
            out_r = kern.K_seq_n_seq_covs(p, jnp.asarray(Z), jnp.asarray(X))
            for a, b in zip(out_sp, out_r):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-8, atol=1e-10)

    def test_svgp_inducing_sequences_sp_matches_single_device(self):
        from gpsig_tpu import SVGP, InducingSequences, kernels, likelihoods
        from gpsig_tpu import utils as gp_utils
        M_lvls, N, L, d, nZ, lz = 2, 8, 32, 2, 5, 4
        X = RNG.randn(N, L, d) / np.sqrt(L)
        y = RNG.randint(0, 2, N).astype(np.float64)
        Z = gp_utils.suggest_initial_inducing_sequences(X, nZ, lz, seed=0)
        kern = kernels.SignatureRBF(d, M_lvls)
        lik = likelihoods.Bernoulli()
        mesh = _seq_mesh()
        ind_sp = seq_parallel.SPInducingSequences(Z, M_lvls, mesh)
        ind_ref = InducingSequences(Z, M_lvls)
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
        g_sp = jax.grad(lambda p: m_sp.elbo(p, Xs, Y))(params)
        g_ref = jax.grad(lambda p: m_ref.elbo(p, jnp.asarray(X), Y))(params)
        for a, b in zip(jax.tree.leaves(g_sp), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-9)

    def test_svgp_elbo_sp_matches_single_device(self):
        from gpsig_tpu import SVGP, InducingTensors, kernels, likelihoods
        from gpsig_tpu import utils as gp_utils
        M_lvls, N, L, d, nT = 2, 8, 32, 2, 4
        X = RNG.randn(N, L, d) / np.sqrt(L)
        y = RNG.randint(0, 2, N).astype(np.float64)
        Z = gp_utils.suggest_initial_inducing_tensors(
            X, M_lvls, nT, increments=True, seed=0
        )
        kern = kernels.SignatureRBF(d, M_lvls)
        lik = likelihoods.Bernoulli()
        mesh = _seq_mesh()
        ind_sp = seq_parallel.SPInducingTensors(
            Z, M_lvls, mesh, increments=True
        )
        ind_ref = InducingTensors(Z, M_lvls, increments=True)
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
        # gradients flow through the SP covariances identically
        g_sp = jax.grad(lambda p: m_sp.elbo(p, Xs, Y))(params)
        g_ref = jax.grad(lambda p: m_ref.elbo(p, jnp.asarray(X), Y))(params)
        for a, b in zip(jax.tree.leaves(g_sp), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-9)

    def test_gpsigrnn_hybrid_over_sp(self):
        """GPSigRNN at long L: the RNN encoder's (N, L, H) hidden states
        flow into the time-sharded SP SVGP — GSPMD reshards the encoder
        output onto the ('seq',) mesh; loss matches the single-device
        hybrid and gradients flow through encoder + SP covariances."""
        from gpsig_tpu import SVGP, InducingTensors, kernels, likelihoods
        from gpsig_tpu import utils as gp_utils
        from gpsig_tpu.models import EncoderSVGP, MaskedRNN

        N, L, d, H, M_lvls = 4, 16, 2, 3, 2
        X = RNG.randn(N, L, d) / np.sqrt(L)
        y = RNG.randint(0, 2, N).astype(np.float64)
        enc = MaskedRNN(hidden_dim=H, cell_type="lstm",
                        return_sequences=True)
        v = enc.init(jax.random.PRNGKey(0), jnp.asarray(X))
        feats = np.asarray(enc.apply(v, jnp.asarray(X)))
        Z = gp_utils.suggest_initial_inducing_tensors(
            feats, M_lvls, 4, increments=True, seed=0)
        mesh = _seq_mesh()
        kern = kernels.SignatureRBF(H, M_lvls)
        ind_sp = seq_parallel.SPInducingTensors(Z, M_lvls, mesh,
                                                increments=True)
        ind_1d = InducingTensors(Z, M_lvls, increments=True)
        m_sp = EncoderSVGP(enc, SVGP(kern, ind_sp, likelihoods.Bernoulli(),
                                     num_latent=1, num_data=N))
        m_1d = EncoderSVGP(enc, SVGP(kern, ind_1d, likelihoods.Bernoulli(),
                                     num_latent=1, num_data=N))
        p = m_1d.init_params(jax.random.PRNGKey(1), X[:2])
        p["svgp"]["q_mu"] = jnp.asarray(RNG.randn(*p["svgp"]["q_mu"].shape))
        Xj, Yj = jnp.asarray(X), jnp.asarray(y[:, None])
        l_sp = float(jax.jit(m_sp.loss)(p, Xj, Yj))
        l_1d = float(m_1d.loss(p, Xj, Yj))
        np.testing.assert_allclose(l_sp, l_1d, rtol=1e-8)
        g = jax.grad(m_sp.loss)(p, Xj, Yj)
        assert all(np.all(np.isfinite(np.asarray(x)))
                   for x in jax.tree.leaves(g))
        # encoder gradients actually flow through the SP covariances
        assert max(float(jnp.max(jnp.abs(x)))
                   for x in jax.tree.leaves(g["enc"])) > 0

    def test_no_device_holds_more_than_its_stripe(self):
        """Static proof from the jaxpr: inside the shard_map body every
        intermediate is stripe-sized — the (N, L, L) Gram never exists."""
        M_lvls, N, L = 3, 4, 64  # 8 chunks of 8
        mesh = _seq_mesh()
        pair_fn = seq_parallel.make_pair_increment_fn("rbf")
        X = jnp.asarray(RNG.randn(N, L, 2))
        Xs = jax.device_put(X, NamedSharding(mesh, P(None, "seq", None)))

        def fn(x):
            return seq_parallel.seq_diag_levels_from_sequences(
                mesh, x, M_lvls, pair_fn=pair_fn
            )

        max_size = _max_intermediate_size(fn, Xs)
        full_gram = N * L * L
        stripe = N * (L + 1) * (L // 8)
        assert max_size < full_gram / 2, (max_size, full_gram)
        # the largest thing anywhere is the per-device stripe itself
        # (plus its zero-padded bridge column)
        assert max_size <= 2 * stripe, (max_size, stripe)
        # and the math still matches the single-device reference
        out = fn(Xs)
        ref = sig_ops.signature_kern_first_order(self._rbf_gram(X), M_lvls)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-9, atol=1e-11)
