"""Direct coverage for the observability helpers (metrics.py, profiling.py)
— exercised indirectly by the recipe goldens, pinned directly here."""

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from gpsig_tpu import (
    SVGP, InducingTensors, kernels, likelihoods, metrics, profiling,
    utils as gp_utils,
)

RNG = np.random.RandomState(11)


def _model(n=13, L=8, d=2, M=2, C=3):
    X = RNG.randn(n, L, d)
    y = RNG.randint(0, C, n)
    Z = gp_utils.suggest_initial_inducing_tensors(X, M, 6, labels=y, seed=0)
    model = SVGP(kernels.SignatureRBF(d, M), InducingTensors(Z, M),
                 likelihoods.MultiClass(C), num_latent=C, num_data=n)
    return model, model.init_params(), X, y


def test_batched_prediction_matches_unbatched():
    model, params, X, y = _model()
    # batch_size=5 over n=13: exercises the ragged tail batch
    pred_b = metrics.batch_predict_classes(model, params, X, batch_size=5)
    pmean, _ = model.predict_y(params, jnp.asarray(X))
    np.testing.assert_array_equal(pred_b, np.argmax(np.asarray(pmean), 1))
    ld_b = metrics.batch_predict_log_density(model, params, X, y,
                                             batch_size=5)
    ld = np.asarray(model.predict_log_density(
        params, jnp.asarray(X), jnp.asarray(y[:, None].astype(np.float64))))
    np.testing.assert_allclose(ld_b, ld, rtol=1e-9)
    acc = metrics.accuracy(model, params, X, y, batch_size=5)
    assert 0.0 <= acc <= 1.0
    assert abs(metrics.nlpp(model, params, X, y, batch_size=5)
               + float(np.mean(ld))) < 1e-9


def test_jsonl_logger(tmp_path):
    path = str(tmp_path / "log.jsonl")
    lg = metrics.JsonlLogger(path, echo=False)
    lg.log(iter=1, elbo=-12.5)
    lg.log(iter=2, elbo=-11.0, val_acc=0.8)
    recs = [json.loads(line) for line in open(path)]
    assert [r["iter"] for r in recs] == [1, 2]
    assert recs[1]["val_acc"] == 0.8
    assert all("wall_time" in r for r in recs)


def test_device_time_and_annotate():
    f = jax.jit(lambda x: jnp.sum(x * x))
    dt = profiling.device_time(f, jnp.arange(128.0), reps=2)
    assert dt > 0.0
    with profiling.annotate("hot-op"):
        float(f(jnp.arange(8.0)))


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "trace")
    with profiling.trace(d):
        float(jax.jit(lambda x: jnp.sum(x * 2))(jnp.ones(4)))
    found = any(files for _, _, files in os.walk(d))
    assert found, "no trace artifacts written"
