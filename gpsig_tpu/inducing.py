"""Inter-domain inducing variables for signature-kernel sparse GPs.

TPU-native re-design of the reference's `gpsig/inducing_variables.py`:
instead of GPflow's multiple-dispatch ``Kuu``/``Kuf``/``Kuu_Kuf_Kff``
functions over Parameter-holding feature objects, each inducing class here is
a *static configuration* whose covariance methods are pure functions of
``(inducing_params, kernel, kernel_params, X)``.

* ``InducingTensors``: sparse rank-1 elements of the tensor algebra
  (<- `inducing_variables.py:28-87`).  Z is packed
  ``(num_levels*(num_levels+1)/2, num_tensors, [2,] d_aug)``; with
  ``increments`` each slot holds a pair whose kernel-feature difference is
  used.
* ``InducingSequences``: short sequences as inducing locations
  (<- `inducing_variables.py:89-137`).
* ``learn_weights``: optional per-level mixing matrix W applied to levels
  1..M while level 0 passes through (<- `inducing_variables.py:51-66`).

The reference's dead-branch NameErrors (`inducing_variables.py:63,134`) are
implemented correctly here.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import config as cfg


def _mix_gram(W, K_lvls):
    """K[0] + sum_m W_m K_lvls[m] W_mᵀ (both-sided mixing)."""
    mixed = jnp.einsum("mij,mjk,mlk->il", W, K_lvls[1:], W)
    return K_lvls[0] + mixed


def _mix_cross(W, K_lvls):
    """K[0] + sum_m W_m K_lvls[m] (left mixing)."""
    return K_lvls[0] + jnp.einsum("mij,mjn->in", W, K_lvls[1:])


class _SignatureInducing:
    def __init__(self, Z, num_levels: int, learn_weights: bool = False):
        self.num_levels = int(num_levels)
        self.learn_weights = bool(learn_weights)
        self._Z_init = np.asarray(Z)

    def init_params(self, dtype=None) -> dict:
        dtype = dtype or cfg.default_float()
        params = {"Z": jnp.asarray(self._Z_init, dtype=dtype)}
        if self.learn_weights:
            params["W"] = jnp.tile(
                jnp.eye(len(self), dtype=dtype)[None], (self.num_levels, 1, 1)
            )
        return params


class InducingTensors(_SignatureInducing):
    """Sparse inducing tensors (inter-domain features in the tensor algebra).

    Args:
      Z: ``(len_tensors, num_tensors, d_aug)`` or, with ``increments``,
        ``(len_tensors, num_tensors, 2, d_aug)`` where
        ``len_tensors = num_levels*(num_levels+1)/2``.
    """

    def __init__(self, Z, num_levels: int, increments: bool = False,
                 learn_weights: bool = False):
        len_tensors = num_levels * (num_levels + 1) // 2
        Z = np.asarray(Z)
        if Z.shape[0] != len_tensors:
            raise ValueError(
                f"Z.shape[0]={Z.shape[0]} != num_levels(num_levels+1)/2="
                f"{len_tensors}"
            )
        if increments and (Z.ndim != 4 or Z.shape[2] != 2):
            raise ValueError(
                "with increments=True, Z must be (len_tensors, num_tensors, 2, d)"
            )
        super().__init__(Z, num_levels, learn_weights)
        self.len_tensors = len_tensors
        self.increments = bool(increments)

    def __len__(self):
        return self._Z_init.shape[1]

    def Kuu(self, ind_params, kern, kern_params, *, jitter=0.0, key=None):
        Kzz_lvls = kern.K_tens(
            kern_params, ind_params["Z"], increments=self.increments,
            return_levels=True, key=key,
        )
        if self.learn_weights:
            Kzz = _mix_gram(ind_params["W"], Kzz_lvls)
        else:
            Kzz = jnp.sum(Kzz_lvls, axis=0)
        return Kzz + jitter * jnp.eye(len(self), dtype=Kzz.dtype)

    def Kuf(self, ind_params, kern, kern_params, X, *, key=None):
        Kzx_lvls = kern.K_tens_vs_seq(
            kern_params, ind_params["Z"], X, increments=self.increments,
            return_levels=True, key=key,
        )
        if self.learn_weights:
            return _mix_cross(ind_params["W"], Kzx_lvls)
        return jnp.sum(Kzx_lvls, axis=0)

    def Kuu_Kuf_Kff(self, ind_params, kern, kern_params, X, *, jitter=0.0,
                    full_f_cov: bool = False, key=None):
        """Fused Kzz, Kzx, Kxx(-diag) (<- `inducing_variables.py:51-66`)."""
        Kzz_lvls, Kzx_lvls, Kxx_lvls = kern.K_tens_n_seq_covs(
            kern_params, ind_params["Z"], X, full_X_cov=full_f_cov,
            increments=self.increments, return_levels=True, key=key,
        )
        if self.learn_weights:
            Kzz = _mix_gram(ind_params["W"], Kzz_lvls)
            Kzx = _mix_cross(ind_params["W"], Kzx_lvls)
        else:
            Kzz = jnp.sum(Kzz_lvls, axis=0)
            Kzx = jnp.sum(Kzx_lvls, axis=0)
        Kxx = jnp.sum(Kxx_lvls, axis=0)
        Kzz = Kzz + jitter * jnp.eye(len(self), dtype=Kzz.dtype)
        if full_f_cov:
            Kxx = Kxx + jitter * jnp.eye(Kxx.shape[-1], dtype=Kxx.dtype)
        else:
            Kxx = Kxx + jitter
        return Kzz, Kzx, Kxx


class InducingSequences(_SignatureInducing):
    """Inducing sequences (standard SVGP features over short sequences).

    Args: Z: ``(num_inducing, len_inducing, d)``.
    """

    def __init__(self, Z, num_levels: int, learn_weights: bool = False):
        Z = np.asarray(Z)
        if Z.ndim != 3:
            raise ValueError("Z must be (num_inducing, len_inducing, d)")
        super().__init__(Z, num_levels, learn_weights)
        self.len_inducing = Z.shape[1]

    def __len__(self):
        return self._Z_init.shape[0]

    def Kuu(self, ind_params, kern, kern_params, *, jitter=0.0, key=None):
        Kzz_lvls = kern.K(
            kern_params, ind_params["Z"], return_levels=True, key=key
        )
        if self.learn_weights:
            Kzz = _mix_gram(ind_params["W"], Kzz_lvls)
        else:
            Kzz = jnp.sum(Kzz_lvls, axis=0)
        return Kzz + jitter * jnp.eye(len(self), dtype=Kzz.dtype)

    def Kuf(self, ind_params, kern, kern_params, X, *, key=None):
        Kzx_lvls = kern.K(
            kern_params, ind_params["Z"], X, return_levels=True, key=key
        )
        if self.learn_weights:
            return _mix_cross(ind_params["W"], Kzx_lvls)
        return jnp.sum(Kzx_lvls, axis=0)

    def Kuu_Kuf_Kff(self, ind_params, kern, kern_params, X, *, jitter=0.0,
                    full_f_cov: bool = False, key=None):
        """Fused evaluation (<- `inducing_variables.py:122-137`)."""
        Kzz_lvls, Kzx_lvls, Kxx_lvls = kern.K_seq_n_seq_covs(
            kern_params, ind_params["Z"], X, full_X2_cov=full_f_cov,
            return_levels=True, key=key,
        )
        if self.learn_weights:
            Kzz = _mix_gram(ind_params["W"], Kzz_lvls)
            Kzx = _mix_cross(ind_params["W"], Kzx_lvls)
        else:
            Kzz = jnp.sum(Kzz_lvls, axis=0)
            Kzx = jnp.sum(Kzx_lvls, axis=0)
        Kxx = jnp.sum(Kxx_lvls, axis=0)
        Kzz = Kzz + jitter * jnp.eye(len(self), dtype=Kzz.dtype)
        if full_f_cov:
            Kxx = Kxx + jitter * jnp.eye(Kxx.shape[-1], dtype=Kxx.dtype)
        else:
            Kxx = Kxx + jitter
        return Kzz, Kzx, Kxx
