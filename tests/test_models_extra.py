"""Vector kernels, Conv1D kernel, masked RNN, hybrid models."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from gpsig_tpu import SVGP, kconv, kernels, likelihoods, vector_kernels
from gpsig_tpu.models import EncoderSVGP, MaskedRNN
from gpsig_tpu.inducing import InducingTensors
from gpsig_tpu import utils as gp_utils

RNG = np.random.RandomState(5)


class TestVectorKernel:
    def test_rbf_matches_formula(self):
        X = RNG.randn(6, 3)
        k = vector_kernels.VectorKernel(3, base="rbf", lengthscales=[1.0, 2.0, 0.5])
        p = k.init_params()
        K = np.asarray(k.K(p, jnp.asarray(X)))
        ls = np.array([1.0, 2.0, 0.5])
        Xs = X / ls
        d2 = ((Xs[:, None, :] - Xs[None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(K, np.exp(-d2 / 2), rtol=1e-8)
        Kd = np.asarray(k.Kdiag(p, jnp.asarray(X)))
        np.testing.assert_allclose(Kd, np.diag(K), rtol=1e-8)

    def test_svgp_with_inducing_points(self):
        X = RNG.randn(20, 4)
        y = (X[:, 0] > 0).astype(np.float64)
        k = vector_kernels.VectorKernel(4)
        ind = vector_kernels.InducingPoints(RNG.randn(8, 4))
        m = SVGP(k, ind, likelihoods.Bernoulli(), num_latent=1, num_data=20)
        params = m.init_params()
        e0 = float(m.elbo(params, jnp.asarray(X), jnp.asarray(y[:, None])))
        assert np.isfinite(e0)
        g = jax.grad(lambda p: m.loss(p, jnp.asarray(X), jnp.asarray(y[:, None])))(params)
        assert all(np.all(np.isfinite(np.asarray(v))) for v in jax.tree.leaves(g))


class TestConv1D:
    def test_basic_properties(self):
        X = RNG.randn(5, 12, 2)
        k = kconv.Conv1DKernel(2, 4)
        p = k.init_params()
        K = np.asarray(k.K(p, jnp.asarray(X)))
        np.testing.assert_allclose(K, K.T, rtol=1e-9)
        np.testing.assert_allclose(np.diag(K), 1.0, rtol=1e-9)  # normalized
        Kd = np.asarray(k.Kdiag(p, jnp.asarray(X)))
        np.testing.assert_allclose(Kd, 1.0, rtol=1e-9)

    def test_nan_padding_ignored(self):
        # NaN-padded sequence == truncated sequence
        X = RNG.randn(3, 10, 2)
        Xp = np.concatenate([X, np.full((3, 4, 2), np.nan)], axis=1)
        k = kconv.Conv1DKernel(2, 3)
        kp = kconv.Conv1DKernel(2, 3)
        K = np.asarray(k.K(k.init_params(), jnp.asarray(X)))
        Kp = np.asarray(kp.K(kp.init_params(), jnp.asarray(Xp)))
        np.testing.assert_allclose(K, Kp, rtol=1e-9)

    def test_inducing_windows_svgp(self):
        X = RNG.randn(8, 8, 2)
        y = RNG.randint(0, 2, 8).astype(np.float64)
        w = 3
        k = kconv.Conv1DKernel(2, w)
        Z = RNG.randn(5, w, 2)
        ind = kconv.InducingWindows(Z)
        m = SVGP(k, ind, likelihoods.Bernoulli(), num_latent=1, num_data=8)
        params = m.init_params()
        e = float(m.elbo(params, jnp.asarray(X), jnp.asarray(y[:, None])))
        assert np.isfinite(e)
        g = jax.grad(lambda p: m.loss(p, jnp.asarray(X), jnp.asarray(y[:, None])))(params)
        assert all(np.all(np.isfinite(np.asarray(v))) for v in jax.tree.leaves(g))


class TestMaskedRNN:
    def test_masking_semantics(self):
        # zero-padded prefix steps must not affect the carried state
        X = RNG.randn(4, 8, 3)
        Xpad = np.concatenate([np.zeros((4, 3, 3)), X], axis=1)
        enc = MaskedRNN(hidden_dim=5, cell_type="lstm", return_sequences=False)
        v = enc.init(jax.random.PRNGKey(0), jnp.asarray(Xpad))
        h_pad = enc.apply(v, jnp.asarray(Xpad))
        h = enc.apply(v, jnp.asarray(X))
        np.testing.assert_allclose(np.asarray(h_pad), np.asarray(h), rtol=1e-6)

    @pytest.mark.parametrize("cell", ["lstm", "gru"])
    def test_sequences_shape(self, cell):
        X = jnp.asarray(RNG.randn(3, 7, 2))
        enc = MaskedRNN(hidden_dim=4, cell_type=cell, return_sequences=True)
        v = enc.init(jax.random.PRNGKey(0), X)
        h = enc.apply(v, X)
        assert h.shape == (3, 7, 4)


class TestHybrids:
    def test_gpsigrnn_trains(self):
        # tiny GPSigRNN: masked LSTM -> signature SVGP, joint ELBO step
        N, L, d, H, M = 16, 10, 2, 4, 2
        X = RNG.randn(N, L, d)
        y = RNG.randint(0, 2, N).astype(np.float64)
        enc = MaskedRNN(hidden_dim=H, cell_type="lstm", return_sequences=True)
        # init inducing tensors from encoded samples
        v = enc.init(jax.random.PRNGKey(0), jnp.asarray(X))
        feats = np.asarray(enc.apply(v, jnp.asarray(X)))
        Z = gp_utils.suggest_initial_inducing_tensors(feats, M, 6, seed=0)
        kern = kernels.SignatureRBF(H, M)
        ind = InducingTensors(Z, M)
        svgp = SVGP(kern, ind, likelihoods.Bernoulli(), num_latent=1, num_data=N)
        model = EncoderSVGP(enc, svgp)
        params = model.init_params(jax.random.PRNGKey(1), X[:2])
        Xj, Yj = jnp.asarray(X), jnp.asarray(y[:, None])

        opt = optax.adam(1e-2)
        state = opt.init(params)

        @jax.jit
        def step(p, s):
            loss, g = jax.value_and_grad(model.loss)(p, Xj, Yj)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s, loss

        p, s, l0 = step(params, state)
        for _ in range(10):
            p, s, loss = step(p, s)
        assert float(loss) < float(l0)
        # encoder params actually move
        moved = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), params["enc"], p["enc"]
        )
        assert max(jax.tree.leaves(moved)) > 0

    def test_gprnn_predicts(self):
        # GPRNN: final hidden state -> vector RBF SVGP
        N, L, d, H = 12, 8, 2, 4
        X = RNG.randn(N, L, d)
        y = RNG.randint(0, 2, N).astype(np.float64)
        enc = MaskedRNN(hidden_dim=H, cell_type="gru", return_sequences=False)
        v = enc.init(jax.random.PRNGKey(0), jnp.asarray(X))
        feats = np.asarray(enc.apply(v, jnp.asarray(X)))
        kern = vector_kernels.VectorKernel(H)
        ind = vector_kernels.InducingPoints(feats[:6])
        svgp = SVGP(kern, ind, likelihoods.Bernoulli(), num_latent=1, num_data=N)
        model = EncoderSVGP(enc, svgp)
        params = model.init_params(jax.random.PRNGKey(1), X[:2])
        pm, pv = model.predict_y(params, jnp.asarray(X))
        assert pm.shape == (N, 1)
        assert np.all(np.asarray(pv) >= 0)
        ld = model.predict_log_density(params, jnp.asarray(X), jnp.asarray(y[:, None]))
        assert np.all(np.isfinite(np.asarray(ld)))


class TestRNNDropout:
    """Keras-parity dropout in the RNN hybrids (VERDICT round-2 item 2:
    `train_gpsigrnn.py:54-60` input 0.25 / recurrent 0.05)."""

    def _enc(self, **kw):
        return MaskedRNN(hidden_dim=4, cell_type="lstm",
                         return_sequences=True, **kw)

    def test_deterministic_ignores_dropout_config(self):
        # eval mode: a dropout-carrying module == the dropout-free module
        X = jnp.asarray(RNG.randn(3, 6, 2))
        enc0 = self._enc()
        encd = self._enc(dropout=0.5, recurrent_dropout=0.25)
        v = enc0.init(jax.random.PRNGKey(0), X)
        h0 = enc0.apply(v, X)
        hd = encd.apply(v, X)  # deterministic=True default
        np.testing.assert_allclose(np.asarray(h0), np.asarray(hd), rtol=1e-7)

    def test_training_mode_changes_outputs_per_key(self):
        X = jnp.asarray(RNG.randn(5, 6, 2))
        enc = self._enc(dropout=0.5, recurrent_dropout=0.25)
        v = enc.init(jax.random.PRNGKey(0), X)
        h0 = enc.apply(v, X)
        h1 = enc.apply(v, X, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(1)})
        h2 = enc.apply(v, X, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(2)})
        h1b = enc.apply(v, X, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
        assert not np.allclose(np.asarray(h0), np.asarray(h1))
        assert not np.allclose(np.asarray(h1), np.asarray(h2))
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h1b))

    def test_zero_rates_are_noop_even_with_key(self):
        X = jnp.asarray(RNG.randn(3, 6, 2))
        enc = self._enc(dropout=0.0, recurrent_dropout=0.0)
        v = enc.init(jax.random.PRNGKey(0), X)
        h0 = enc.apply(v, X)
        h1 = enc.apply(v, X, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(3)})
        np.testing.assert_allclose(np.asarray(h0), np.asarray(h1))

    def test_masking_still_holds_under_dropout(self):
        # zero-padded prefix steps must not affect the carried state, with
        # the SAME dropout masks (per-sequence, constant over time)
        X = RNG.randn(4, 8, 3)
        Xpad = np.concatenate([np.zeros((4, 3, 3)), X], axis=1)
        enc = MaskedRNN(hidden_dim=5, cell_type="lstm",
                        return_sequences=False, dropout=0.4,
                        recurrent_dropout=0.2)
        v = enc.init(jax.random.PRNGKey(0), jnp.asarray(Xpad))
        key = {"dropout": jax.random.PRNGKey(7)}
        h_pad = enc.apply(v, jnp.asarray(Xpad), deterministic=False, rngs=key)
        h = enc.apply(v, jnp.asarray(X), deterministic=False, rngs=key)
        np.testing.assert_allclose(np.asarray(h_pad), np.asarray(h),
                                   rtol=1e-6, atol=1e-8)

    def test_hybrid_loss_stochastic_in_train_deterministic_in_eval(self):
        N, L, d, H, M = 8, 6, 2, 4, 2
        X = RNG.randn(N, L, d)
        y = RNG.randint(0, 2, N).astype(np.float64)
        enc = self._enc(dropout=0.3, recurrent_dropout=0.1)
        v = enc.init(jax.random.PRNGKey(0), jnp.asarray(X))
        feats = np.asarray(enc.apply(v, jnp.asarray(X)))
        Z = gp_utils.suggest_initial_inducing_tensors(feats, M, 4, seed=0)
        svgp = SVGP(kernels.SignatureRBF(H, M), InducingTensors(Z, M),
                    likelihoods.Bernoulli(), num_latent=1, num_data=N)
        model = EncoderSVGP(enc, svgp)
        params = model.init_params(jax.random.PRNGKey(1), X[:2])
        # at the zero-init variational posterior (q_mu=0, q_sqrt=I,
        # whitened) the ELBO is provably encoding-independent — perturb
        # q_mu so dropout noise actually reaches the loss
        params["svgp"]["q_mu"] = jnp.asarray(
            RNG.randn(*params["svgp"]["q_mu"].shape)
        )
        Xj, Yj = jnp.asarray(X), jnp.asarray(y[:, None])
        l1 = float(model.loss(params, Xj, Yj, key=jax.random.PRNGKey(1)))
        l2 = float(model.loss(params, Xj, Yj, key=jax.random.PRNGKey(2)))
        assert l1 != l2  # dropout != 0 changes training losses
        # eval (no key) is deterministic regardless of dropout config
        e1 = float(model.loss(params, Xj, Yj))
        e2 = float(model.loss(params, Xj, Yj))
        assert e1 == e2

    def test_per_gate_masks_are_independent(self):
        from gpsig_tpu.models.rnn import _gate_masks

        m = _gate_masks(jax.random.PRNGKey(0), 0.5, 4, 64, 16, jnp.float64)
        assert m.shape == (4, 64, 16)
        # Keras implementation=1: each gate draws its OWN mask
        for a in range(4):
            for b in range(a + 1, 4):
                assert not np.array_equal(np.asarray(m[a]), np.asarray(m[b]))
        assert _gate_masks(jax.random.PRNGKey(0), 0.0, 4, 8, 3,
                           jnp.float64) is None


class TestRNNOracle:
    """The fused-gate cells against plain numpy Keras-layout recurrences
    (gate order LSTM i|f|c|o with unit forget bias, GRU z|r|h with
    reset_after=False candidate gating)."""

    def _np_forward(self, cell, X, W, U, b, H):
        N, L, d = X.shape
        sig = lambda v: 1.0 / (1.0 + np.exp(-v))
        h = np.zeros((N, H))
        c = np.zeros((N, H))
        for t in range(L):
            x = X[:, t]
            if cell == "lstm":
                z = x @ W + h @ U + b
                i, f = sig(z[:, :H]), sig(z[:, H:2 * H])
                g, o = np.tanh(z[:, 2 * H:3 * H]), sig(z[:, 3 * H:])
                c = f * c + i * g
                h = o * np.tanh(c)
            else:
                xp = x @ W + b
                rec = h @ U
                zg = sig(xp[:, :H] + rec[:, :H])
                r = sig(xp[:, H:2 * H] + rec[:, H:2 * H])
                hh = np.tanh(xp[:, 2 * H:] + (r * h) @ U[:, 2 * H:])
                h = zg * h + (1.0 - zg) * hh
        return h

    @pytest.mark.parametrize("cell", ["lstm", "gru"])
    def test_matches_numpy_recurrence(self, cell):
        N, L, d, H = 3, 6, 2, 4
        X = RNG.randn(N, L, d) + 0.5  # keep away from the mask value 0
        enc = MaskedRNN(hidden_dim=H, cell_type=cell, return_sequences=False)
        v = enc.init(jax.random.PRNGKey(0), jnp.asarray(X))
        p = v["params"]
        W, U, b = (np.asarray(p["kernel"]), np.asarray(p["recurrent_kernel"]),
                   np.asarray(p["bias"]))
        if cell == "lstm":  # unit forget bias baked into init
            np.testing.assert_array_equal(b[H:2 * H], np.ones(H))
        h_ref = self._np_forward(cell, X, W, U, b, H)
        h = enc.apply(v, jnp.asarray(X))
        np.testing.assert_allclose(np.asarray(h), h_ref, rtol=1e-9,
                                   atol=1e-12)
