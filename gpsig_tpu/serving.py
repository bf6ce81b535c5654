"""Production serving: AOT-compiled fixed-shape predictors + exported
StableHLO artifacts.

The reference has no serving story — inference reuses the training graph
with feed dicts (`gpsig/models.py:61-73` under a live TF session).  On TPU
the production path is different: every distinct input shape is a fresh XLA
compile (~seconds), so a server must (1) quantize incoming request shapes
onto a small set of padded buckets and (2) compile each bucket once,
ahead of time.  This module provides both, plus `jax.export`-based
serialization so a trained model can ship as a self-contained StableHLO
artifact and run in a process that never imports this package's Python.

Shape policy (why padding is exact, not approximate):

* **Time axis** — repeat-last padding appends zero *increments*, which the
  signature recursions ignore exactly (same invariance the preprocessing
  layer relies on, `gpsig_tpu/preprocessing.py`; cf. the reference's edge
  padding in `benchmarks/utils/datasets.py:48-55`).  Predictions on a
  padded batch equal predictions on the raw one to float precision.
* **Batch axis** — SVGP prediction is row-independent (`predict_f` is a
  per-example conditional), so padding with copies of the last example and
  slicing the outputs is exact.

Caveat for exported artifacts: the fused Pallas kernel dispatch is decided
at *trace* time (`SignatureKernel._fused_tens_ok` checks
``jax.default_backend()``), so an artifact exported from a CPU host bakes
the pure-XLA covariance graph even when targeting TPU — correct everywhere,
but to ship the Pallas fast path the export must run in a TPU-backed
process.  Verified on chip (SERVING_r05.txt, driven by
`benchmarks/serving_export_drive.py`): the TPU-process export's StableHLO
contains the Mosaic custom call, round-trips through serialize/deserialize
bit-identically to the on-chip Predictor, and runs 1.25x faster than the
pure-XLA-graph artifact at the same shapes.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export

from . import config as cfg


def _pad_batch(X: np.ndarray, batch: int, seq_len: int) -> np.ndarray:
    """Pad (n, l, d) observations to (batch, seq_len, d).

    Time axis: repeat the last observation (zero increments — exactly
    signature-invariant).  Batch axis: repeat the last example (sliced away
    from the outputs)."""
    n, l = X.shape[0], X.shape[1]
    if l > seq_len:
        raise ValueError(f"sequence length {l} exceeds bucket {seq_len}")
    if n > batch:
        raise ValueError(f"batch {n} exceeds bucket {batch}")
    if l < seq_len:
        X = np.concatenate(
            [X, np.repeat(X[:, -1:], seq_len - l, axis=1)], axis=1
        )
    if n < batch:
        X = np.concatenate([X, np.repeat(X[-1:], batch - n, axis=0)], axis=0)
    return X


def _pick_bucket(n: int, buckets, kind: str = "batch") -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(
        f"{kind} {n} exceeds the largest serving bucket {max(buckets)}; "
        "split the request or construct the Predictor with larger buckets"
    )


class Predictor:
    """Fixed-shape, ahead-of-time-compiled predictor over an SVGP model.

    Wraps ``(model, params)``: parameters are placed on device once at
    construction; each (batch-bucket, seq_len) shape is AOT-compiled on
    first use (or eagerly via :meth:`warmup`) and cached, so steady-state
    serving never traces or compiles.

    Args:
      model: an :class:`gpsig_tpu.models.SVGP` (or API-compatible object
        with ``predict_y``/``predict_f``).
      params: trained parameter pytree (e.g. restored via
        `gpsig_tpu.checkpoint.restore`).
      max_len: serving sequence length; shorthand for a single-entry
        ``len_buckets=(max_len,)``.
      len_buckets: ascending padded sequence lengths; a request of length
        l runs on the smallest bucket >= l (repeat-padded — exact, see
        module docstring), longer-than-max rejected.  Short requests thus
        avoid paying the longest bucket's O(L^2) recursion cost.
      batch_buckets: ascending padded batch sizes; a request of n rows
        runs on the smallest bucket >= n.
    """

    def __init__(self, model, params, *, max_len: int | None = None,
                 len_buckets=None, batch_buckets=(1, 8, 32), dtype=None):
        if len_buckets is None:
            if max_len is None:
                raise ValueError("pass max_len or len_buckets")
            len_buckets = (max_len,)
        self.model = model
        self.len_buckets = tuple(sorted(int(x) for x in len_buckets))
        self.max_len = self.len_buckets[-1]
        self.batch_buckets = tuple(sorted(int(b) for b in batch_buckets))
        self.dtype = dtype or cfg.default_float()
        self.params = jax.device_put(params)
        self._param_spec = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
            self.params,
        )
        self._jit_y = jax.jit(lambda p, x: self.model.predict_y(p, x))
        self._jit_f = jax.jit(lambda p, x: self.model.predict_f(p, x))
        self._compiled: dict = {}

    # -- compilation ----------------------------------------------------

    def _get_compiled(self, what: str, batch: int, seq_len: int, d: int):
        key = (what, batch, seq_len, d)
        hit = self._compiled.get(key)
        if hit is None:
            fn = self._jit_y if what == "y" else self._jit_f
            xspec = jax.ShapeDtypeStruct((batch, seq_len, d), self.dtype)
            hit = fn.lower(self._param_spec, xspec).compile()
            self._compiled[key] = hit
        return hit

    def warmup(self, num_features: int, *, what: str = "y") -> None:
        """Eagerly compile the full (len, batch) bucket grid (call before
        taking traffic)."""
        for lb in self.len_buckets:
            for b in self.batch_buckets:
                self._get_compiled(what, b, lb, int(num_features))

    @property
    def num_compiled(self) -> int:
        return len(self._compiled)

    # -- inference ------------------------------------------------------

    def _run(self, what: str, X):
        X = np.asarray(X, dtype=self.dtype)
        n, l, d = X.shape[0], X.shape[1], X.shape[2]
        b = _pick_bucket(n, self.batch_buckets)
        lb = _pick_bucket(l, self.len_buckets, kind="sequence length")
        Xp = _pad_batch(X, b, lb)
        out = self._get_compiled(what, b, lb, d)(
            self.params, jnp.asarray(Xp))
        return jax.tree.map(lambda a: a[:n], out)

    def predict_y(self, X):
        """Predictive mean/variance of observables, shapes (n, P)."""
        return self._run("y", X)

    def predict_f(self, X):
        """Latent q(f*) mean/variance, shapes (n, P)."""
        return self._run("f", X)

    def predict_classes(self, X) -> np.ndarray:
        """Argmax class ids under the predictive mean, shape (n,)."""
        pmean, _ = self.predict_y(X)
        return np.asarray(jnp.argmax(pmean, axis=1))


# ---------------------------------------------------------------------------
# jax.export: self-contained StableHLO artifacts
# ---------------------------------------------------------------------------


def export_predict(model, params, *, batch_size: int, seq_len: int,
                   num_features: int, what: str = "y", dtype=None,
                   platforms=None) -> jax_export.Exported:
    """Export ``model.predict_{y,f}`` at a fixed shape as StableHLO.

    The artifact takes ``(params, X)`` — parameters stay external (ship
    them as a `gpsig_tpu.checkpoint` msgpack next to the artifact), so one
    artifact serves every fine-tune of the same architecture.

    Args:
      platforms: lowering targets, e.g. ``('cpu', 'tpu')``; None uses the
        current default backend.
    """
    dtype = dtype or cfg.default_float()
    fn = (lambda p, x: model.predict_y(p, x)) if what == "y" else (
        lambda p, x: model.predict_f(p, x))
    pspec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype),
        params,
    )
    xspec = jax.ShapeDtypeStruct((batch_size, seq_len, num_features), dtype)
    kw = {"platforms": tuple(platforms)} if platforms else {}
    return jax_export.export(jax.jit(fn), **kw)(pspec, xspec)


def save_exported(exported: jax_export.Exported, path: str) -> None:
    """Serialize an exported artifact to disk (atomic write)."""
    import os
    data = exported.serialize()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(data))
    os.replace(tmp, path)


def load_exported(path: str) -> jax_export.Exported:
    """Load a serialized artifact; invoke via ``loaded.call(params, X)``
    (re-stages into the running JAX, including under jit)."""
    with open(path, "rb") as f:
        return jax_export.deserialize(bytearray(f.read()))
