"""Serving layer: AOT bucket compilation, exact shape padding, jax.export
artifacts.

The padding claims are load-bearing (module docstring of
`gpsig_tpu/serving.py`): repeat-last time padding must be *exactly*
signature-invariant and batch padding must be sliced away exactly, so the
comparisons here are at f64 tightness, not "close enough" tolerances.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpsig_tpu import (
    InducingTensors,
    SVGP,
    kernels,
    likelihoods,
    serving,
    utils as gp_utils,
)

RNG = np.random.RandomState(7)


def _small_model(C=3, d=2, num_levels=2, num_inducing=8):
    X = RNG.randn(12, 7, d).cumsum(axis=1)
    y = np.arange(12) % C
    Z = gp_utils.suggest_initial_inducing_tensors(
        X, num_levels, num_inducing, labels=y, increments=True, seed=0
    )
    kern = kernels.SignatureRBF(
        d, num_levels, lengthscales=gp_utils.suggest_initial_lengthscales(X)
    )
    ind = InducingTensors(Z, num_levels, increments=True)
    model = SVGP(kern, ind, likelihoods.MultiClass(C), num_latent=C,
                 num_data=len(y))
    params = model.init_params(jax.random.PRNGKey(0))
    # non-trivial posterior so predictions differentiate examples
    params["q_mu"] = jnp.asarray(RNG.randn(num_inducing, C) * 0.5)
    return model, params, X


class TestPredictor:
    def test_matches_direct_on_ragged_batch(self):
        model, params, X = _small_model()
        pred = serving.Predictor(model, params, max_len=10,
                                 batch_buckets=(4, 16))
        Xq = X[:3]  # n=3 -> bucket 4; l=7 -> repeat-padded to 10
        mean, var = pred.predict_y(Xq)
        ref_mean, ref_var = model.predict_y(params, jnp.asarray(Xq))
        np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean),
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(var), np.asarray(ref_var),
                                   rtol=1e-10, atol=1e-12)
        assert mean.shape == (3, 3)

    def test_predict_f_leg(self):
        model, params, X = _small_model()
        pred = serving.Predictor(model, params, max_len=7,
                                 batch_buckets=(4,))
        fmean, fvar = pred.predict_f(X[:2])
        ref_fmean, ref_fvar = model.predict_f(params, jnp.asarray(X[:2]))
        np.testing.assert_allclose(np.asarray(fmean), np.asarray(ref_fmean),
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(fvar), np.asarray(ref_fvar),
                                   rtol=1e-10, atol=1e-12)

    def test_compile_cache_and_warmup(self):
        model, params, X = _small_model()
        pred = serving.Predictor(model, params, max_len=8,
                                 batch_buckets=(2, 4))
        pred.predict_y(X[:1])
        pred.predict_y(X[:2])  # same bucket (2): no new compile
        assert pred.num_compiled == 1
        pred.predict_y(X[:3])  # bucket 4
        assert pred.num_compiled == 2
        pred.warmup(num_features=X.shape[2])  # both already compiled
        assert pred.num_compiled == 2

    def test_predict_classes_is_argmax(self):
        model, params, X = _small_model()
        pred = serving.Predictor(model, params, max_len=7,
                                 batch_buckets=(8,))
        cls = pred.predict_classes(X[:5])
        pmean, _ = model.predict_y(params, jnp.asarray(X[:5]))
        np.testing.assert_array_equal(cls, np.argmax(np.asarray(pmean), 1))

    def test_shape_guards(self):
        model, params, X = _small_model()
        pred = serving.Predictor(model, params, max_len=7,
                                 batch_buckets=(2,))
        with pytest.raises(ValueError, match="exceeds the largest"):
            pred.predict_y(X[:5])
        with pytest.raises(ValueError, match="exceeds the largest"):
            long = np.concatenate([X[:1]] * 3, axis=1)  # l=21 > 7
            pred.predict_y(long)

    def test_length_buckets_exact_across_two_buckets(self):
        """Ragged lengths spanning two length buckets (VERDICT r3 item 9):
        a short request runs on the small (cheap) bucket, a long one on
        the large bucket, both exactly matching direct prediction."""
        model, params, X = _small_model()
        pred = serving.Predictor(model, params, len_buckets=(5, 10),
                                 batch_buckets=(4,))
        for l in (4, 7):  # -> buckets 5 and 10
            Xq = X[:3, :l]
            mean, var = pred.predict_y(Xq)
            ref_mean, ref_var = model.predict_y(params, jnp.asarray(Xq))
            np.testing.assert_allclose(
                np.asarray(mean), np.asarray(ref_mean),
                rtol=1e-10, atol=1e-12)
            np.testing.assert_allclose(
                np.asarray(var), np.asarray(ref_var),
                rtol=1e-10, atol=1e-12)
        # distinct (len, batch) shapes compiled once each
        assert pred.num_compiled == 2
        pred.warmup(num_features=X.shape[2])  # fills the full 2x1 grid
        assert pred.num_compiled == 2


class TestExport:
    def test_roundtrip_matches_direct(self, tmp_path):
        model, params, X = _small_model()
        exp = serving.export_predict(
            model, params, batch_size=4, seq_len=7, num_features=X.shape[2]
        )
        path = str(tmp_path / "predict_y.stablehlo")
        serving.save_exported(exp, path)
        loaded = serving.load_exported(path)

        Xq = jnp.asarray(X[:4])
        mean, var = loaded.call(params, Xq)
        ref_mean, ref_var = model.predict_y(params, Xq)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean),
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(var), np.asarray(ref_var),
                                   rtol=1e-10, atol=1e-12)

    def test_artifact_callable_under_jit(self, tmp_path):
        model, params, X = _small_model()
        exp = serving.export_predict(
            model, params, batch_size=2, seq_len=7,
            num_features=X.shape[2], what="f",
        )
        Xq = jnp.asarray(X[:2])
        mean, _ = jax.jit(lambda p, x: exp.call(p, x))(params, Xq)
        ref_mean, _ = model.predict_f(params, Xq)
        np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean),
                                   rtol=1e-10, atol=1e-12)
