"""Metrics, batched prediction helpers, and structured logging.

The reference's observability is stdout prints plus the pickled history
dict (`gpsig/training.py:30-51`, SURVEY.md §5).  Here: the same quantities
(elbo, val acc, val nlpp, wall time) as a structured JSONL stream plus
classification helpers matching `benchmarks/models/train_gpsig.py:71-101`.
"""

from __future__ import annotations

import json
import time

import numpy as np


def batch_predict_classes(model, params, X, *, batch_size: int = 50):
    """Hard class predictions in minibatches (host loop; device compute)."""
    import jax.numpy as jnp

    n = X.shape[0]
    out = np.zeros(n)
    for i in range(0, n, batch_size):
        xb = jnp.asarray(X[i:i + batch_size])
        pmean, _ = model.predict_y(params, xb)
        pmean = np.asarray(pmean)
        if pmean.shape[1] == 1:
            out[i:i + batch_size] = (pmean[:, 0] > 0.5).astype(np.float64)
        else:
            out[i:i + batch_size] = np.argmax(pmean, axis=1)
    return out


def batch_predict_log_density(model, params, X, y, *, batch_size: int = 50):
    import jax.numpy as jnp

    n = X.shape[0]
    out = np.zeros(n)
    y = np.asarray(y).reshape(n, -1)
    for i in range(0, n, batch_size):
        xb = jnp.asarray(X[i:i + batch_size])
        yb = jnp.asarray(y[i:i + batch_size])
        out[i:i + batch_size] = np.asarray(
            model.predict_log_density(params, xb, yb)
        )
    return out


def accuracy(model, params, X, y, *, batch_size: int = 50) -> float:
    pred = batch_predict_classes(model, params, X, batch_size=batch_size)
    return float(np.mean(pred == np.asarray(y)))


def nlpp(model, params, X, y, *, batch_size: int = 50) -> float:
    """Negative log predictive probability (mean)."""
    ld = batch_predict_log_density(model, params, X, y, batch_size=batch_size)
    return float(-np.mean(ld))


class JsonlLogger:
    """Append-only JSONL metric stream (one record per event)."""

    def __init__(self, path: str | None = None, *, echo: bool = True):
        self.path = path
        self.echo = echo
        self._t0 = time.time()

    def log(self, **record):
        record.setdefault("wall_time", round(time.time() - self._t0, 3))
        line = json.dumps(record)
        if self.path:
            with open(self.path, "a") as f:
                f.write(line + "\n")
        if self.echo:
            print(line)
