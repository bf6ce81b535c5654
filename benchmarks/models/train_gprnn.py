"""GPRNN baseline: masked LSTM/GRU final state -> vector RBF SVGP.

TPU-native re-design of `benchmarks/models/train_gprnn.py:55-75` (Keras RNN
final hidden state into a stock RBF SVGP), same phased recipe as GPSigRNN.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from gpsig_tpu import (
    SVGP, datasets, likelihoods, utils as gp_utils, vector_kernels,
)
from gpsig_tpu.models import EncoderSVGP, MaskedRNN

from .train_gpsigrnn import _run_phases


def train_gprnn_classifier(
    dataset: str, *, num_inducing: int = 100, num_hidden: int = 32,
    rnn_type: str = "lstm", dropout: float = 0.0,
    recurrent_dropout: float | None = None,
    normalize_data: bool = True,
    minibatch_size: int = 50, max_len: int = 400,
    val_split=None, test_split=None, experiment_idx=None,
    save_dir: str = "./GPRNN/", epochs_cap: int | None = None,
    data_dir: str | None = None, seed: int = 0,
):
    # same use_dropout coupling as GPSigRNN (`train_gprnn.py` mirrors
    # `train_gpsigrnn.py:54-56`): input 0.25 implies recurrent 0.05
    if recurrent_dropout is None:
        recurrent_dropout = 0.05 if dropout > 0.0 else 0.0
    print(f"==== GPRNN({rnn_type}, H={num_hidden}, D={dropout}) "
          f"on {dataset} ====")
    X_train, y_train, X_val, y_val, X_test, y_test = datasets.load_dataset(
        dataset, val_split=val_split, test_split=test_split,
        normalize_data=normalize_data, add_time=False, for_model="nn",
        max_len=max_len, data_dir=data_dir, seed=seed,
    )
    num_train = len(y_train)
    num_classes = np.unique(y_train).size
    dtype = np.float32

    encoder = MaskedRNN(hidden_dim=num_hidden, cell_type=rnn_type,
                        return_sequences=False, dropout=dropout,
                        recurrent_dropout=recurrent_dropout)
    key = jax.random.PRNGKey(seed)
    enc_vars = encoder.init(key, jnp.asarray(X_train[:2], dtype))

    # inducing points = RNN images of RANDOM examples + 0.4*N(0,1) jitter,
    # lengthscales from a feature sample (`train_gprnn.py:99-106`).  The
    # jitter is load-bearing: without it, same-class examples give
    # near-duplicate rows and the f32 Kzz Cholesky degenerates to NaN.
    rng0 = np.random.RandomState(seed)
    sel = rng0.choice(num_train, size=num_inducing)
    Z0 = np.asarray(encoder.apply(enc_vars, jnp.asarray(X_train[sel], dtype)))
    Z0 = Z0 + 0.4 * rng0.randn(*Z0.shape)
    sample = rng0.choice(num_train, size=min(1000, num_train), replace=False)
    feats = np.asarray(
        encoder.apply(enc_vars, jnp.asarray(X_train[sample], dtype))
    )
    kern = vector_kernels.VectorKernel(
        num_hidden, base="rbf",
        lengthscales=gp_utils.suggest_initial_lengthscales(feats),
    )
    ind = vector_kernels.InducingPoints(Z0)

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
