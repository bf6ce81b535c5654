"""Worked example 2: end-to-end time-series classification.

Script equivalent of the reference's `notebooks/ts_classification.ipynb`
(LIBRAS, M=4, 200 inducing tensors, increments, 3-phase training).  If the
UEA archive is not available locally, a synthetic multivariate 3-class
dataset with LIBRAS-like shape stands in, exercising the identical pipeline:

  preprocess (time channel, repeat-pad) -> init heuristics -> SVGP
  -> phase 1 (variational), phase 2 (+kernel, early stop), phase 3 (+variances)
  -> test accuracy / nlpp.

Run: PYTHONPATH=.:/root/.axon_site python examples/ts_classification.py [--dataset LIBRAS]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np


def synthetic_libras_like(rng, n_per_class=24, L=45, num_classes=3):
    X, y = [], []
    for c in range(num_classes):
        for _ in range(n_per_class):
            t = np.linspace(0, 2 * np.pi, L)
            phase, amp = rng.rand() * np.pi, 0.7 + 0.6 * rng.rand()
            x1 = amp * np.sin((c + 1) * t + phase) + 0.08 * rng.randn(L)
            x2 = amp * np.cos((c + 2) * t - phase) + 0.08 * rng.randn(L)
            X.append(np.stack([x1, x2], axis=1))
            y.append(c)
    X, y = np.stack(X), np.asarray(y)
    perm = rng.permutation(len(y))
    return X[perm], y[perm]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default=None,
                    help="UEA dataset name (default: synthetic stand-in)")
    ap.add_argument("--iters", type=int, default=400)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from gpsig_tpu import (
        SVGP, InducingTensors, kernels, likelihoods, metrics,
        preprocessing, training, utils as gp_utils,
    )

    rng = np.random.RandomState(0)
    if args.dataset:
        from gpsig_tpu import datasets

        X_train, y_train, _, _, X_test, y_test = datasets.load_dataset(
            args.dataset, normalize_data=True, add_time=True, for_model="sig"
        )
    else:
        X, y = synthetic_libras_like(rng)
        n_tr = int(0.7 * len(y))
        X_train, y_train, X_test, y_test = X[:n_tr], y[:n_tr], X[n_tr:], y[n_tr:]
        # add the normalized-time channel, as the notebook does
        X_train = preprocessing.add_time_to_table(X_train)
        X_test = preprocessing.add_time_to_table(X_test)

    X_train = X_train.astype(np.float32)
    X_test = X_test.astype(np.float32)
    num_classes = np.unique(y_train).size
    num_levels, num_inducing = 4, 200

    print(f"train {X_train.shape}, test {X_test.shape}, C={num_classes}")

    Z = gp_utils.suggest_initial_inducing_tensors(
        X_train, num_levels, num_inducing, labels=y_train, increments=True,
        seed=0,
    )
    ls = gp_utils.suggest_initial_lengthscales(X_train)
    kern = kernels.SignatureRBF(X_train.shape[-1], num_levels, lengthscales=ls)
    ind = InducingTensors(Z, num_levels, increments=True)
    lik = likelihoods.MultiClass(num_classes) if num_classes > 2 \
        else likelihoods.Bernoulli()
    model = SVGP(kern, ind, lik,
                 num_latent=num_classes if num_classes > 2 else 1,
                 num_data=len(y_train))
    params = model.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda v: jnp.asarray(v, jnp.float32), params)

    Xd = jnp.asarray(X_train)
    Yd = jnp.asarray(y_train[:, None], jnp.float32)
    batch = min(50, len(y_train))
    stream = training.minibatch_indices(np.random.RandomState(0),
                                        len(y_train), batch)

    def data_iter():
        while True:
            idx = next(stream)
            yield Xd[idx], Yd[idx]

    opt = training.nadam(1e-3)
    loss = lambda p, xb, yb: model.loss(p, xb, yb)

    # phase 1: variational only; phase 2: + kernel; phase 3: + variances
    hist = training.optimize(loss, params, opt, max_iter=args.iters // 4,
                             data_iter=data_iter(),
                             trainable=lambda n: not n.startswith("kern"),
                             print_freq=100, save_freq=100)
    hist = training.optimize(loss, hist["final_params"], opt,
                             max_iter=args.iters // 2, data_iter=data_iter(),
                             trainable=lambda n: n != "kern/variances",
                             history=hist, print_freq=100, save_freq=100)
    hist = training.optimize(loss, hist["final_params"], opt,
                             max_iter=args.iters // 4, data_iter=data_iter(),
                             history=hist, print_freq=100, save_freq=100)
    params = hist["final_params"]

    acc = metrics.accuracy(model, params, X_test, y_test, batch_size=batch)
    nl = metrics.nlpp(model, params, X_test, y_test, batch_size=batch)
    print(f"test accuracy {acc:.3f} | test nlpp {nl:.3f}")
    print("(reference notebook on LIBRAS: acc 0.917 / nlpp 0.303, "
          "`ts_classification.ipynb` cell 43)")


if __name__ == "__main__":
    main()
