"""GPSigRNN: masked LSTM/GRU hidden-state sequences -> signature SVGP.

TPU-native re-design of `benchmarks/models/train_gpsigrnn.py`: the encoder
and GP train jointly through one ELBO (the reference splices Keras graphs
and hand-rolls a K.function loop).  Inducing tensors and lengthscales are
initialized from encoded samples (`train_gpsigrnn.py:137-147`); the 3-phase
schedule is kept.
"""

from __future__ import annotations

import json
import os
import pickle

import numpy as np

import jax
import jax.numpy as jnp

from gpsig_tpu import (
    SVGP, InducingTensors, datasets, kernels, likelihoods, metrics, training,
    utils as gp_utils,
)
from gpsig_tpu.models import EncoderSVGP, MaskedRNN


def train_gpsigrnn_classifier(
    dataset: str, *, num_levels: int = 4, num_inducing: int = 500,
    num_hidden: int = 32, rnn_type: str = "lstm", dropout: float = 0.0,
    recurrent_dropout: float | None = None,
    normalize_data: bool = True, minibatch_size: int = 50,
    max_len: int = 400, increments: bool = True,
    val_split=None, test_split=None, experiment_idx=None,
    save_dir: str = "./GPSigRNN/", epochs_cap: int | None = None,
    data_dir: str | None = None, seed: int = 0,
):
    # the reference couples the two rates behind one `use_dropout` flag
    # (input 0.25 + recurrent 0.05, `train_gpsigrnn.py:54-56`); here
    # `dropout` is the input rate and recurrent_dropout defaults to the
    # reference's companion value whenever input dropout is on
    if recurrent_dropout is None:
        recurrent_dropout = 0.05 if dropout > 0.0 else 0.0
    print(f"==== GPSigRNN({rnn_type}, H={num_hidden}, D={dropout}) "
          f"on {dataset} ====")
    X_train, y_train, X_val, y_val, X_test, y_test = datasets.load_dataset(
        dataset, val_split=val_split, test_split=test_split,
        normalize_data=normalize_data, add_time=False, for_model="nn",
        max_len=max_len, data_dir=data_dir, seed=seed,
    )
    num_train, len_ex, num_features = X_train.shape
    num_classes = np.unique(y_train).size
    dtype = np.float32

    encoder = MaskedRNN(hidden_dim=num_hidden, cell_type=rnn_type,
                        return_sequences=True, dropout=dropout,
                        recurrent_dropout=recurrent_dropout)
    key = jax.random.PRNGKey(seed)
    enc_vars = encoder.init(key, jnp.asarray(X_train[:2], dtype))
    feats = np.asarray(
        encoder.apply(enc_vars, jnp.asarray(X_train[:256], dtype))
    )

    Z = gp_utils.suggest_initial_inducing_tensors(
        feats, num_levels, num_inducing, labels=y_train[:feats.shape[0]],
        increments=increments, seed=seed,
    )
    l_init = gp_utils.suggest_initial_lengthscales(feats, num_samples=1000,
                                                   seed=seed)
    kern = kernels.SignatureRBF(num_hidden, num_levels, lengthscales=l_init)
    ind = InducingTensors(Z, num_levels, increments=increments)

    if num_classes == 2:
        lik, num_latent = likelihoods.Bernoulli(), 1
    else:
        lik, num_latent = likelihoods.MultiClass(num_classes), num_classes

    svgp = SVGP(kern, ind, lik, num_latent=num_latent, num_data=num_train)
    model = EncoderSVGP(encoder, svgp)
    params = model.init_params(key, X_train[:2].astype(dtype))
    params["enc"] = enc_vars["params"]
    params = jax.tree.map(lambda v: jnp.asarray(v, jnp.float32), params)

    return _run_phases(
        model, params, X_train, y_train, X_val, y_val, X_test, y_test,
        minibatch_size=minibatch_size, epochs_cap=epochs_cap,
        save_dir=save_dir, dataset=dataset, experiment_idx=experiment_idx,
        seed=seed, freeze_prefixes=("svgp/kern", "enc"),
    )


def _run_phases(model, params, X_train, y_train, X_val, y_val, X_test,
                y_test, *, minibatch_size, epochs_cap, save_dir, dataset,
                experiment_idx, seed, freeze_prefixes):
    """Shared 3-phase hybrid schedule (`train_gpsigrnn.py:152-183`):
    (1) variational only, (2) everything with early stopping, (3) assimilate
    with feature/kernel params frozen after folding in validation data."""
    dtype = np.float32
    num_train = len(y_train)
    batch = min(minibatch_size, num_train)
    rng = np.random.RandomState(seed)
    Xd = jnp.asarray(X_train, dtype)
    Yd = jnp.asarray(y_train[:, None], dtype)
    idx_stream = training.minibatch_indices(rng, num_train, batch)

    # per-step PRNG for encoder dropout: a step counter is folded into a
    # fixed base key inside the jitted loss (train mode); eval/metrics call
    # the model without a key -> deterministic (Keras train/eval semantics)
    base_key = jax.random.PRNGKey(seed + 17)
    step_counter = iter(range(1, 1 << 31))

    def data_iter():
        while True:
            idx = next(idx_stream)
            yield Xd[idx], Yd[idx], jnp.uint32(next(step_counter))

    def loss_fn(p, xb, yb, step):
        return model.loss(p, xb, yb, key=jax.random.fold_in(base_key, step))

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
    patience = max(100 * iters_per_epoch, 1000)
    budget = 2000 * iters_per_epoch
    if epochs_cap is not None:
        patience = min(patience, epochs_cap * iters_per_epoch)
        budget = min(budget, epochs_cap * iters_per_epoch)
    save_freq = min(iters_per_epoch, 50)
    opt = training.nadam(1e-3)

    def is_variational(n):
        return not any(n.startswith(p) for p in freeze_prefixes)

    hist = training.optimize(
        loss_fn, params, opt, max_iter=patience, data_iter=data_iter(),
        trainable=is_variational, val_scorer=val_scorer,
        save_best_params=X_val is not None, lower_is_better=True,
        save_freq=save_freq, print_freq=save_freq * 5,
    )
    params = hist["final_params"]

    hist = training.optimize(
        loss_fn, params, opt, max_iter=budget, data_iter=data_iter(),
        val_scorer=val_scorer, save_best_params=X_val is not None,
        lower_is_better=True, patience=patience, history=hist,
        save_freq=save_freq, print_freq=save_freq * 5,
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
        X_all = np.concatenate([X_train, X_val], axis=0)
        y_all = np.concatenate([y_train, y_val], axis=0)
        num_train = len(y_all)
        model.svgp.num_data = num_train
        Xd = jnp.asarray(X_all, dtype)
        Yd = jnp.asarray(y_all[:, None], dtype)
        idx_stream = training.minibatch_indices(rng, num_train, batch)
        hist = training.optimize(
            loss_fn, params, opt, max_iter=patience, data_iter=data_iter(),
            trainable=is_variational, history=hist,
            save_freq=save_freq, print_freq=save_freq * 5,
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
