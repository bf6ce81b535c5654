"""GPKConv1D baseline: 1-D convolutional GP kernel SVGP.

TPU-native re-design of `benchmarks/models/train_gpkconv1d.py`: NaN-padded
sequences, Conv1D mean-of-window-pairs kernel with inducing windows,
the same phased schedule as GPSig.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from gpsig_tpu import SVGP, datasets, kconv, likelihoods, utils as gp_utils

from .train_gpsigrnn import _run_phases


def _sample_inducing_windows(X, num_inducing, len_windows, rng):
    """Random NaN-free windows from training sequences."""
    N, L, d = X.shape
    Z = np.zeros((num_inducing, len_windows, d))
    for i in range(num_inducing):
        for _ in range(100):
            n = rng.randint(N)
            t = rng.randint(L - len_windows + 1)
            w = X[n, t:t + len_windows]
            if not np.any(np.isnan(w)):
                Z[i] = w
                break
    return Z + 0.4 * rng.randn(*Z.shape)


def train_gpkconv1d_classifier(
    dataset: str, *, num_inducing: int = 500, len_windows: int | None = None,
    normalize_data: bool = True, minibatch_size: int = 50,
    max_len: int = 400, val_split=None, test_split=None, experiment_idx=None,
    save_dir: str = "./GPKConv1D/", epochs_cap: int | None = None,
    data_dir: str | None = None, seed: int = 0,
):
    print(f"==== GPKConv1D on {dataset} ====")
    out = datasets.load_dataset(
        dataset, val_split=val_split, test_split=test_split,
        normalize_data=normalize_data, add_time=False, for_model="kconv",
        max_len=max_len, data_dir=data_dir, seed=seed, return_min_len=True,
    )
    X_train, y_train, X_val, y_val, X_test, y_test, len_min = out
    num_train, L, num_features = X_train.shape
    num_classes = np.unique(y_train).size

    if len_windows is None:
        # reference heuristic: window length tied to the shortest sequence
        len_windows = max(2, min(len_min // 2, 10))

    rng = np.random.RandomState(seed)
    Z = _sample_inducing_windows(X_train, num_inducing, len_windows, rng)

    l_init = gp_utils.suggest_initial_lengthscales(
        X_train.reshape(-1, num_features), num_samples=1000, seed=seed
    )
    ls = np.tile(l_init, len_windows)

    kern = kconv.Conv1DKernel(num_features, len_windows, lengthscales=ls)
    ind = kconv.InducingWindows(Z)

    if num_classes == 2:
        lik, num_latent = likelihoods.Bernoulli(), 1
    else:
        lik, num_latent = likelihoods.MultiClass(num_classes), num_classes

    model = SVGP(kern, ind, lik, num_latent=num_latent, num_data=num_train)
    params = model.init_params(jax.random.PRNGKey(seed))
    params = jax.tree.map(lambda v: jnp.asarray(v, jnp.float32), params)

    class _Plain:
        """Adapter so the shared phase runner sees the hybrid interface."""

        def __init__(self, m):
            self.svgp = m
            self._m = m

        def loss(self, p, x, y, key=None):
            # `key` feeds encoder dropout in the hybrids; the plain SVGP
            # model is deterministic, so it is accepted and ignored
            return self._m.loss(p, x, y)

        def predict_y(self, p, x, **kw):
            return self._m.predict_y(p, x, **kw)

        def predict_log_density(self, p, x, y, **kw):
            return self._m.predict_log_density(p, x, y, **kw)

    return _run_phases(
        _Plain(model), params, X_train, y_train, X_val, y_val, X_test,
        y_test, minibatch_size=minibatch_size, epochs_cap=epochs_cap,
        save_dir=save_dir, dataset=dataset, experiment_idx=experiment_idx,
        seed=seed, freeze_prefixes=("kern",),
    )
