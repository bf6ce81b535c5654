"""Mesh-sharded SVGP training (DP over examples x TP over inducing points).

The reference has no distributed computation at all (single GPU selected via
CUDA_VISIBLE_DEVICES, `benchmarks/run_gpsig_benchmarks.py:7-9`).  This module
is the scale-out layer the TPU rebuild adds (SURVEY.md §2.4):

* **data axis**: the minibatch/example axis of X, Y is sharded; the per-level
  Kxx diagonals, Kzx columns and variational-expectation terms are computed
  per-shard and the ELBO reduction becomes an XLA ``psum`` over ICI.
* **model axis**: the inducing-variable axis (rows of Z / q_mu / Kzx) is
  sharded; the n_Z x (N L) base-Gram matmul — the hot MXU op in training
  (SURVEY.md §3.1) — is block-distributed.  Kzz's Cholesky is small
  (n_Z x n_Z) and is gathered/replicated by the partitioner.

Everything rides jax.sharding + jit (GSPMD): we annotate placements with
NamedSharding and let XLA insert all_gather/psum/reduce_scatter over ICI —
no hand-written collectives on this path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, *, data: int | None = None,
              model: int | None = None, devices=None) -> Mesh:
    """2-D ('data', 'model') device mesh.

    By default uses all devices on the data axis; pass ``data``/``model``
    to shape it (data * model must equal n_devices).
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if data is None and model is None:
        # favor DP; give TP a factor of 2 when available
        model = 2 if n_devices % 2 == 0 and n_devices >= 4 else 1
        data = n_devices // model
    elif data is None:
        data = n_devices // model
    elif model is None:
        model = n_devices // data
    if data * model != n_devices:
        raise ValueError(f"data*model={data*model} != n_devices={n_devices}")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, X, Y):
    """Place a batch with the example axis sharded over 'data'."""
    xs = NamedSharding(mesh, P("data", *([None] * (X.ndim - 1))))
    ys = NamedSharding(mesh, P("data", *([None] * (Y.ndim - 1))))
    return jax.device_put(X, xs), jax.device_put(Y, ys)


def param_shardings(mesh: Mesh, model, params) -> dict:
    """NamedSharding pytree for an SVGP param pytree.

    Inducing locations and the variational mean are sharded over 'model' on
    the inducing axis; q_sqrt and kernel hyperparameters are replicated
    (they feed the n_Z x n_Z Cholesky, which stays local).
    """
    from ..inducing import InducingTensors

    repl = NamedSharding(mesh, P())
    ind = getattr(model.ind, "_base", model.ind)  # unwrap SP drop-ins
    z_axis = 1 if isinstance(ind, InducingTensors) else 0

    def spec_for(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if name == "ind/Z":
            # packed tensors: (len_tensors, n_Z, [2,] d) -> shard n_Z (axis 1)
            # inducing sequences: (n_Z, l, d) -> shard n_Z (axis 0)
            spec = [None] * leaf.ndim
            spec[z_axis] = "model"
            return NamedSharding(mesh, P(*spec))
        if name == "q_mu":
            return NamedSharding(mesh, P("model", None))
        return repl

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(mesh: Mesh, model, params):
    return jax.device_put(params, param_shardings(mesh, model, params))


def make_train_step(model, opt: optax.GradientTransformation):
    """Jitted SVGP train step; sharding follows the placed inputs (GSPMD)."""

    @jax.jit
    def step(params, opt_state, X, Y):
        loss, grads = jax.value_and_grad(model.loss)(params, X, Y)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))
