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


def minibatch_indices(rng: np.random.RandomState, num_data: int,
                      batch_size: int):
    """Host-side shuffled minibatch index stream (epoch reshuffling),
    mirroring GPflow's ``Minibatch`` feed (`models.py:28`)."""
    while True:
        perm = rng.permutation(num_data)
        for i in range(0, num_data - batch_size + 1, batch_size):
            yield perm[i:i + batch_size]


def optimize(loss_fn, params, opt, *, max_iter: int,
             data_iter=None,
             trainable: Callable[[str], bool] | None = None,
             val_scorer=None, lower_is_better: bool = False,
             history: dict | None = None,
             save_best_params: bool = False, patience: int | None = None,
             print_freq: int = 50, save_freq: int = 50,
             save_params_history: bool = False,
             checkpoint_path: str | None = None,
             log_fn=print) -> dict:
    """Run an optimization phase.

    Args:
      loss_fn: ``loss_fn(params, *batch) -> scalar`` (pure, jittable).
      params: parameter pytree (raw values).
      opt: an ``optax.GradientTransformation``.
      max_iter: number of steps in this phase.
      data_iter: iterator yielding batch tuples passed to loss_fn; if None,
        loss_fn is called with params only (full-batch).
      trainable: predicate over parameter paths; False leaves are frozen.
      val_scorer: callable(params) -> score or list of scores (last one used
        for best/patience tracking), evaluated every ``save_freq`` steps.
      history: resumable history dict (`training.py:166-183` semantics).
      save_params_history: record the (constrained-on-use raw) parameter
        pytree at every snapshot, mirroring the reference's per-snapshot
        ``history[iter]['params']`` (`training.py:74-78`); off by default
        to keep long runs' histories small.
      checkpoint_path: optional file; params (+ iteration) are saved there
        atomically every ``save_freq`` steps and on phase end, so crashed
        runs restart from disk (SURVEY.md §5 checkpoint/resume).

    Returns the updated history; ``history['final_params']`` holds the last
    params and ``history['best']['params']`` the best-on-validation ones.
    """
    if history is None:
        history = {}
    numeric_iters = [k for k in history if isinstance(k, int)]
    start_iter = max(numeric_iters) if numeric_iters else 0
    start_time = history[start_iter]["time"] if start_iter else 0.0

    if trainable is None:
        mask = jax.tree.map(lambda _: True, params)
    else:
        mask = path_mask(params, trainable)
    opt = masked_optimizer(opt, mask)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, *batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, *batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    t0 = time.time()
    best = history.get("best")
    stopped_early = False

    for it in range(start_iter + 1, start_iter + max_iter + 1):
        batch = next(data_iter) if data_iter is not None else ()
        params, opt_state, loss = step(params, opt_state, *batch)

        now = time.time() - t0 + start_time
        if it % print_freq == 0:
            log_fn(f"iter {it} | time {now:.1f}s | loss {float(loss):.4f}")

        if it % save_freq == 0 or it == start_iter + max_iter:
            if checkpoint_path is not None:
                from . import checkpoint as ckpt

                ckpt.save(checkpoint_path,
                          {"params": params, "iter": np.asarray(it)})
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
