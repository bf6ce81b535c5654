"""Training loop: optax optimization with history, best-on-val, patience.

TPU-native equivalent of the reference's `gpsig/training.py` (GPflow
actions-based loop with tf.contrib optimizers).  Differences by design:

* tf.contrib.opt auto-registration -> plain ``optax`` transforms; the
  benchmarks' NadamOptimizer (`train_gpsig.py:106`) maps to ``optax.nadam``.
* per-phase trainability (``m.kern.set_trainable(False)`` etc.) -> a
  ``trainable`` predicate over parameter paths, implemented as a gradient
  mask inside the jitted step — same semantics, no graph surgery.
* the resumable ``history`` dict keyed by iteration, periodic snapshots,
  best-checkpoint-on-validation tracking and patience-based early stopping
  mirror `training.py:53-137`.

The step function is jit-compiled once per phase; minibatches are sliced on
host from a device-resident dataset (or passed in by an outside data
pipeline) and the model's ``loss`` runs fully on device.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax


def path_mask(params, predicate: Callable[[str], bool]):
    """Boolean pytree from a predicate over '/'-joined parameter paths."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def _name(path):
        return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)

    names = {_name(path) for path, _ in flat}

    def build(path, leaf):
        return bool(predicate(_name(path)))

    return jax.tree_util.tree_map_with_path(build, params)


def masked_optimizer(opt: optax.GradientTransformation, mask):
    """Apply ``opt`` only where mask is True; frozen leaves get zero updates."""
    return optax.chain(
        optax.masked(opt, mask),
        optax.masked(optax.set_to_zero(), jax.tree.map(lambda m: not m, mask)),
    )


def nadam(learning_rate: float = 1e-3) -> optax.GradientTransformation:
    """The reference benchmarks' optimizer (`train_gpsig.py:106`)."""
    return optax.nadam(learning_rate)


def multi_optimizer(pairs, params) -> optax.GradientTransformation:
    """Partition parameters among several optimizers run in one phase.

    TPU-native equivalent of the reference's ``optimize([(opt1, var_list1),
    (opt2, var_list2), ...])`` (`gpsig/training.py:141-164`): each parameter
    goes to the FIRST pair whose predicate matches its '/'-joined path;
    unmatched parameters are frozen.

    Args:
      pairs: list of ``(optax transform, predicate(path) -> bool)``.
      params: the parameter pytree (labels are built from its structure).
    """
    preds = [pred for _, pred in pairs]

    def label(path, _leaf):
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        for i, pred in enumerate(preds):
            if pred(name):
                return str(i)
        return "frozen"

    labels = jax.tree_util.tree_map_with_path(label, params)
    transforms = {str(i): opt for i, (opt, _) in enumerate(pairs)}
    transforms["frozen"] = optax.set_to_zero()
    return optax.multi_transform(transforms, labels)


def minibatch_indices(rng: np.random.RandomState, num_data: int,
                      batch_size: int):
    """Host-side shuffled minibatch index stream (epoch reshuffling),
    mirroring GPflow's ``Minibatch`` feed (`models.py:28`)."""
    while True:
        perm = rng.permutation(num_data)
        for i in range(0, num_data - batch_size + 1, batch_size):
            yield perm[i:i + batch_size]


class MinibatchStream:
    """Checkpointable shuffled minibatch index stream.

    Same draw sequence as :func:`minibatch_indices`, but with an explicit
    ``state()``/``set_state()`` pair so a crashed run resumes at the exact
    position in the exact permutation (SURVEY §5: checkpoints carry
    "params + opt state + RNG + iter" — this is the RNG/data-stream leg).
    """

    def __init__(self, num_data: int, batch_size: int, seed_or_rng=0):
        self.num_data = int(num_data)
        self.batch_size = int(batch_size)
        if isinstance(seed_or_rng, np.random.RandomState):
            self.rng = seed_or_rng
        else:
            self.rng = np.random.RandomState(seed_or_rng)
        self._perm = None
        self._pos = 0

    def __iter__(self):
        return self

    def __next__(self):
        if (
            self._perm is None
            or self._pos + self.batch_size > self.num_data
        ):
            self._perm = self.rng.permutation(self.num_data)
            self._pos = 0
        idx = self._perm[self._pos:self._pos + self.batch_size]
        self._pos += self.batch_size
        return idx

    def state(self) -> dict:
        """Serializable pytree-of-arrays snapshot of the stream."""
        name, keys, pos, has_gauss, gauss = self.rng.get_state()
        assert name == "MT19937"
        perm = self._perm if self._perm is not None else np.zeros(0, np.int64)
        return {
            "mt_keys": np.asarray(keys, np.uint32),
            "mt_pos": np.asarray(pos, np.int64),
            "has_gauss": np.asarray(has_gauss, np.int64),
            "gauss": np.asarray(gauss, np.float64),
            "perm": np.asarray(perm, np.int64),
            "pos": np.asarray(self._pos, np.int64),
        }

    def set_state(self, state: dict) -> None:
        self.rng.set_state((
            "MT19937", np.asarray(state["mt_keys"], np.uint32),
            int(state["mt_pos"]), int(state["has_gauss"]),
            float(state["gauss"]),
        ))
        perm = np.asarray(state["perm"], np.int64)
        self._perm = perm if perm.size else None
        self._pos = int(state["pos"])


class BatchIterator:
    """Minibatch tuples ``(arr[idx] for arr in arrays)`` from a
    :class:`MinibatchStream`, forwarding its checkpoint state so
    :func:`optimize` can save/restore the data-stream position.

    ``batch_fn`` (optional) post-processes the index array into the batch
    tuple instead (e.g. to append a per-step dropout key counter).
    """

    def __init__(self, stream: MinibatchStream, *arrays, batch_fn=None):
        self.stream = stream
        self.arrays = arrays
        self.batch_fn = batch_fn

    def __iter__(self):
        return self

    def __next__(self):
        idx = next(self.stream)
        if self.batch_fn is not None:
            return self.batch_fn(idx)
        return tuple(a[idx] for a in self.arrays)

    def state(self):
        return self.stream.state()

    def set_state(self, state):
        self.stream.set_state(state)


def optimize(loss_fn, params, opt, *, max_iter: int,
             data_iter=None,
             trainable: Callable[[str], bool] | None = None,
             val_scorer=None, lower_is_better: bool = False,
             history: dict | None = None,
             save_best_params: bool = False, patience: int | None = None,
             print_freq: int = 50, save_freq: int = 50,
             save_params_history: bool = False,
             checkpoint_path: str | None = None,
             checkpoint_extra: dict | None = None,
             resume_from: str | None = None,
             log_fn=print) -> dict:
    """Run an optimization phase.

    Args:
      loss_fn: ``loss_fn(params, *batch) -> scalar`` (pure, jittable).
      params: parameter pytree (raw values).
      opt: an ``optax.GradientTransformation``, or a list of
        ``(transform, predicate)`` pairs partitioning the parameters among
        several optimizers run in one phase (first match wins, unmatched
        params frozen — the reference's multi-optimizer ``var_list``
        feature, `gpsig/training.py:141-164`).
      max_iter: number of steps in this phase.
      data_iter: iterator yielding batch tuples passed to loss_fn; if None,
        loss_fn is called with params only (full-batch).  A
        :class:`MinibatchStream` (anything with ``state()``/``set_state()``)
        additionally gets its position checkpointed and restored.
      trainable: predicate over parameter paths; False leaves are frozen.
      val_scorer: callable(params) -> score or list of scores (last one used
        for best/patience tracking), evaluated every ``save_freq`` steps.
      history: resumable history dict (`training.py:166-183` semantics).
      save_params_history: record the (constrained-on-use raw) parameter
        pytree at every snapshot, mirroring the reference's per-snapshot
        ``history[iter]['params']`` (`training.py:74-78`); off by default
        to keep long runs' histories small.
      checkpoint_path: optional file; the full training state — params,
        optimizer state, iteration, data-stream position, best-on-val
        snapshot + early-stop flag, and ``checkpoint_extra`` (e.g. a phase
        id) — is saved there atomically every ``save_freq`` steps and on
        phase end (SURVEY.md §5 checkpoint/resume: "params + opt state +
        RNG + iter").
      checkpoint_extra: small static pytree stored alongside (phase id etc.).
      resume_from: checkpoint file written by a previous (killed) run of
        this same phase; restores params, optimizer moments, the
        data-stream position, the best-on-validation snapshot and the
        patience/early-stop state, then continues to the phase's original
        end — the resumed trajectory (including ``history['best']`` and any
        early stop) is bit-identical to the uninterrupted run.

    Returns the updated history; ``history['final_params']`` holds the last
    params and ``history['best']['params']`` the best-on-validation ones.
    """
    if history is None:
        history = {}
    numeric_iters = [k for k in history if isinstance(k, int)]
    start_iter = max(numeric_iters) if numeric_iters else 0
    start_time = history[start_iter]["time"] if start_iter else 0.0

    if isinstance(opt, list):
        # reference-style multi-optimizer phase: [(opt, var_predicate), ...]
        # (a list, specifically: optax transforms are themselves NamedTuples)
        opt = multi_optimizer(opt, params)
    if trainable is None:
        mask = jax.tree.map(lambda _: True, params)
    else:
        mask = path_mask(params, trainable)
    opt = masked_optimizer(opt, mask)
    opt_state = opt.init(params)

    has_stream_state = data_iter is not None and hasattr(data_iter, "state")
    best = history.get("best")
    stopped_early = False

    def _best_state():
        """best-on-validation as a fixed-structure array pytree (params-
        shaped placeholder when no best exists yet, so the checkpoint
        template is shape-stable across the whole run)."""
        if best is None:
            return {
                "has_best": np.asarray(0), "iter": np.asarray(0),
                "time": np.asarray(0.0), "elbo": np.asarray(0.0),
                "val_score": np.asarray(0.0),
                "val": np.zeros(0, np.float64),
                "val_is_seq": np.asarray(0),
                "params": params,
            }
        scores = best["val"]
        is_seq = isinstance(scores, (list, tuple))
        return {
            "has_best": np.asarray(1), "iter": np.asarray(best["iter"]),
            "time": np.asarray(float(best["time"])),
            "elbo": np.asarray(float(best["elbo"])),
            "val_score": np.asarray(float(best["val_score"])),
            "val": np.asarray(scores if is_seq else [scores], np.float64),
            "val_is_seq": np.asarray(int(is_seq)),
            "params": best["params"],
        }

    def _ckpt_state(it):
        state = {
            "params": params, "opt_state": opt_state, "iter": np.asarray(it),
            # phase start survives a lost history dict: on resume, the
            # phase still ends at phase_start + max_iter
            "phase_start": np.asarray(start_iter),
            # best-on-val + early-stop state: a resumed run must pick the
            # same restore_best() snapshot and respect an already-tripped
            # patience stop, not just replay params/opt/data
            "best": _best_state(),
            "stopped_early": np.asarray(int(stopped_early)),
        }
        if has_stream_state:
            state["data_state"] = data_iter.state()
        if checkpoint_extra is not None:
            state["extra"] = checkpoint_extra
        return state

    resume_iter = start_iter
    if resume_from is not None:
        from . import checkpoint as ckpt

        if ckpt.exists(resume_from):
            try:
                # fill_missing: files from an older build without the
                # best/early-stop fields resume with those at defaults
                restored = ckpt.restore(resume_from, like=_ckpt_state(0),
                                        fill_missing=True)
            except (ValueError, KeyError, TypeError) as e:
                raise ValueError(
                    f"checkpoint {resume_from} is incompatible with this "
                    "build (its state tree does not match the current "
                    "model/optimizer structure); delete it to start the "
                    f"phase fresh. Underlying error: {e}"
                ) from e
            params = restored["params"]
            opt_state = restored["opt_state"]
            resume_iter = int(restored["iter"])
            start_iter = int(restored["phase_start"])
            if has_stream_state:
                data_iter.set_state(restored["data_state"])
            rb = restored["best"]
            if int(rb["has_best"]):
                scores = [float(v) for v in np.asarray(rb["val"])]
                best = {
                    "iter": int(rb["iter"]), "time": float(rb["time"]),
                    "elbo": float(rb["elbo"]),
                    "val": scores if int(rb["val_is_seq"]) else scores[0],
                    "val_score": float(rb["val_score"]),
                    "params": jax.tree.map(np.asarray, rb["params"]),
                }
                history["best"] = best
            if bool(int(restored["stopped_early"])):
                # the killed run had already early-stopped: do not train on
                stopped_early = True
                resume_iter = start_iter + max_iter
            log_fn(f"resumed from {resume_from} at iter {resume_iter}")

    @jax.jit
    def step(params, opt_state, *batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, *batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    t0 = time.time()

    for it in range(resume_iter + 1, start_iter + max_iter + 1):
        batch = next(data_iter) if data_iter is not None else ()
        params, opt_state, loss = step(params, opt_state, *batch)

        now = time.time() - t0 + start_time
        if it % print_freq == 0:
            log_fn(f"iter {it} | time {now:.1f}s | loss {float(loss):.4f}")

        if it % save_freq == 0 or it == start_iter + max_iter:
            rec: dict[str, Any] = {"time": now, "loss": float(loss),
                                   "elbo": -float(loss)}
            if save_params_history:
                rec["params"] = jax.tree.map(np.asarray, params)
            if val_scorer is not None:
                scores = val_scorer(params)
                rec["val"] = scores
                score = scores[-1] if isinstance(scores, (list, tuple)) else scores
                log_fn(f"iter {it} | val {scores}")
                if save_best_params:
                    improved = (
                        best is None
                        or (lower_is_better and score <= best["val_score"])
                        or (not lower_is_better and score >= best["val_score"])
                    )
                    if improved:
                        best = {
                            "iter": it, "time": now, "elbo": -float(loss),
                            "val": scores, "val_score": score,
                            "params": jax.tree.map(np.asarray, params),
                        }
                        history["best"] = best
                if patience is not None and best is not None:
                    if it - best["iter"] > patience:
                        log_fn(
                            f"no val improvement for {patience} iters: "
                            "stopping early"
                        )
                        stopped_early = True
            history[it] = rec
            # save AFTER best/patience updates so the checkpoint at the
            # stopping iteration carries the tripped stop and the new best
            if checkpoint_path is not None:
                from . import checkpoint as ckpt

                ckpt.save(checkpoint_path, _ckpt_state(it))
        if stopped_early:
            break

    history["final_params"] = params
    return history


def restore_best(model_params, history):
    """Return best-on-validation params if tracked, else the final ones
    (`train_gpsig.py:124` semantics)."""
    if "best" in history and "params" in history["best"]:
        dtypes = jax.tree.map(lambda x: x.dtype, model_params)
        return jax.tree.map(
            lambda x, dt: jnp.asarray(x, dtype=dt),
            history["best"]["params"], dtypes,
        )
    return history.get("final_params", model_params)
