"""Canonical GPSig training recipe (signature-kernel SVGP classifier).

TPU-native re-design of the reference's end-to-end recipe
(`benchmarks/models/train_gpsig.py:20-189`), with the same structure:

  load -> init inducing tensors + lengthscales -> SVGP ->
  4-phase schedule:
    1. variational distribution only (kernel frozen)
    2. + kernel hyperparameters except per-level variances (early stop on
       validation nlpp)
    3. + per-level variances
    4. kernel frozen, validation data folded into train, assimilate
  -> test metrics -> results on disk.

Differences by design: optax/nadam instead of tf.contrib, gradient masks
instead of set_trainable, jit-compiled minibatch steps, and JSONL metrics +
pytree checkpoints instead of pickled session dumps.
"""

from __future__ import annotations

import json
import os
import pickle

import numpy as np

import jax
import jax.numpy as jnp

from gpsig_tpu import (
    SVGP, InducingSequences, InducingTensors, datasets, kernels, likelihoods,
    metrics, training, utils as gp_utils,
)


def train_gpsig_classifier(
    dataset: str, *, num_levels: int = 4, num_inducing: int = 500,
    normalize_data: bool = True, minibatch_size: int = 50,
    max_len: int = 400, increments: bool = True, learn_weights: bool = False,
    num_lags: int | None = None, low_rank: bool = False,
    val_split=None, test_split=None, experiment_idx=None,
    use_tensors: bool = True, save_dir: str = "./GPSig/",
    epochs_cap: int | None = None, data_dir: str | None = None, seed: int = 0,
    checkpoint_dir: str | None = None, resume: bool = False,
):
    """Train and evaluate one GPSig classifier; returns the results dict.

    ``epochs_cap`` optionally scales down the reference's very long phase
    budgets (patience = max(500 epochs, 5000 iters), `train_gpsig.py:112`)
    for smoke runs.

    ``checkpoint_dir`` enables on-disk phase checkpoints (params + optimizer
    moments + data-stream position); with ``resume=True`` a killed run
    restarts from the last checkpoint of whatever phase it died in and
    continues the exact same trajectory (SURVEY.md §5 checkpoint/resume).
    """
    print(f"==== GPSig on {dataset} ====")
    X_train, y_train, X_val, y_val, X_test, y_test = datasets.load_dataset(
        dataset, val_split=val_split, test_split=test_split,
        normalize_data=normalize_data, add_time=True, for_model="sig",
        max_len=max_len, data_dir=data_dir, seed=seed,
    )

    num_train, len_ex, num_features = X_train.shape
    num_classes = np.unique(y_train).size

    # initialization heuristics (class-stratified)
    if use_tensors:
        Z = gp_utils.suggest_initial_inducing_tensors(
            X_train, num_levels, num_inducing, labels=y_train,
            increments=increments, num_lags=num_lags, seed=seed,
        )
        ind = InducingTensors(Z, num_levels, increments=increments,
                              learn_weights=learn_weights)
    else:
        Z = gp_utils.suggest_initial_inducing_sequences(
            X_train, num_inducing, num_levels + 1, labels=y_train, seed=seed
        )
        ind = InducingSequences(Z, num_levels, learn_weights=learn_weights)

    l_init = gp_utils.suggest_initial_lengthscales(
        X_train, num_samples=1000, seed=seed
    )
    kern = kernels.SignatureRBF(
        num_features, num_levels, lengthscales=l_init, num_lags=num_lags,
        low_rank=low_rank,
    )

    if num_classes == 2:
        lik = likelihoods.Bernoulli()
        num_latent = 1
    else:
        lik = likelihoods.MultiClass(num_classes)
        num_latent = num_classes

    model = SVGP(kern, ind, lik, num_latent=num_latent, num_data=num_train)
    params = model.init_params(jax.random.PRNGKey(seed))
    params = jax.tree.map(lambda v: jnp.asarray(v, jnp.float32), params)

    dtype = np.float32
    Xd = jnp.asarray(X_train, dtype)
    Yd = jnp.asarray(y_train[:, None], dtype)

    batch = min(minibatch_size, num_train)
    stream = training.MinibatchStream(num_train, batch, seed_or_rng=seed)

    def data_iter():
        return training.BatchIterator(
            stream, batch_fn=lambda idx: (Xd[idx], Yd[idx])
        )

    def loss_fn(p, xb, yb):
        return model.loss(p, xb, yb)

    def ckpt_kw(phase: int):
        """Per-phase checkpoint/resume wiring for optimize()."""
        if checkpoint_dir is None:
            return {}
        name_ = dataset if experiment_idx is None \
            else f"{dataset}_{experiment_idx}"
        path = os.path.join(checkpoint_dir, f"{name_}_phase{phase}.ckpt")
        kw = {"checkpoint_path": path,
              "checkpoint_extra": {"phase": np.asarray(phase)}}
        if resume:
            kw["resume_from"] = path
        return kw

    val_scorer = None
    if X_val is not None:
        def val_scorer(p):
            return [
                metrics.accuracy(model, p, X_val.astype(dtype), y_val,
                                 batch_size=batch),
                metrics.nlpp(model, p, X_val.astype(dtype), y_val,
                             batch_size=batch),
            ]

    iters_per_epoch = max(1, num_train // batch)
    patience = max(500 * iters_per_epoch, 5000)
    if epochs_cap is not None:
        patience = min(patience, epochs_cap * iters_per_epoch)
    phase2_iters = 5000 * iters_per_epoch
    if epochs_cap is not None:
        phase2_iters = min(phase2_iters, epochs_cap * iters_per_epoch)
    save_freq = min(iters_per_epoch, 50)

    opt = training.nadam(1e-3)

    # phase 1: q(u) only
    hist = training.optimize(
        loss_fn, params, opt, max_iter=patience, data_iter=data_iter(),
        trainable=lambda n: not n.startswith("kern"),
        val_scorer=val_scorer, save_best_params=X_val is not None,
        lower_is_better=True, save_freq=save_freq, print_freq=save_freq * 5,
        **ckpt_kw(1),
    )
    params = hist["final_params"]

    # phase 2: + kernel except per-level variances, early stopping
    hist = training.optimize(
        loss_fn, params, opt, max_iter=phase2_iters, data_iter=data_iter(),
        trainable=lambda n: n != "kern/variances",
        val_scorer=val_scorer, save_best_params=X_val is not None,
        lower_is_better=True, patience=patience, history=hist,
        save_freq=save_freq, print_freq=save_freq * 5,
        **ckpt_kw(2),
    )
    params = training.restore_best(params, hist)

    # phase 3: everything
    hist = training.optimize(
        loss_fn, params, opt, max_iter=phase2_iters, data_iter=data_iter(),
        val_scorer=val_scorer, save_best_params=X_val is not None,
        lower_is_better=True, patience=patience, history=hist,
        save_freq=save_freq, print_freq=save_freq * 5,
        **ckpt_kw(3),
    )
    params = training.restore_best(params, hist)

    results = {}
    if X_val is not None:
        results["val_acc"] = metrics.accuracy(
            model, params, X_val.astype(dtype), y_val, batch_size=batch
        )
        results["val_nlpp"] = metrics.nlpp(
            model, params, X_val.astype(dtype), y_val, batch_size=batch
        )
        print(f"val acc {results['val_acc']:.4f} nlpp {results['val_nlpp']:.4f}")

        # phase 4: freeze kernel, fold val into train, assimilate q(u)
        X_all = np.concatenate([X_train, X_val], axis=0)
        y_all = np.concatenate([y_train, y_val], axis=0)
        num_train = len(y_all)
        model = SVGP(kern, ind, lik, num_latent=num_latent,
                     num_data=num_train)
        Xd = jnp.asarray(X_all, dtype)
        Yd = jnp.asarray(y_all[:, None], dtype)
        stream = training.MinibatchStream(num_train, batch,
                                          seed_or_rng=seed + 1)
        hist = training.optimize(
            loss_fn, params, opt, max_iter=patience, data_iter=data_iter(),
            trainable=lambda n: not n.startswith("kern"), history=hist,
            save_freq=save_freq, print_freq=save_freq * 5,
            **ckpt_kw(4),
        )
        params = hist["final_params"]

    results["test_acc"] = metrics.accuracy(
        model, params, X_test.astype(dtype), y_test, batch_size=batch
    )
    results["test_nlpp"] = metrics.nlpp(
        model, params, X_test.astype(dtype), y_test, batch_size=batch
    )
    print(f"test acc {results['test_acc']:.4f} nlpp {results['test_nlpp']:.4f}")

    os.makedirs(save_dir, exist_ok=True)
    name = dataset if experiment_idx is None else f"{dataset}_{experiment_idx}"
    hist["results"] = results
    hist.pop("final_params", None)
    hist.pop("best", None)
    with open(os.path.join(save_dir, name + ".pkl"), "wb") as f:
        pickle.dump(hist, f)
    with open(os.path.join(save_dir, name + ".json"), "w") as f:
        json.dump(results, f, indent=2)
    return results
