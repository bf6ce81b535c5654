"""Standard vector-input GP kernels + inducing points.

The reference's GPRNN baseline uses a stock GPflow RBF SVGP on the RNN's
final hidden state (`benchmarks/models/train_gprnn.py:55-75`), and the
GPKConv1D baseline needs plain inducing points over window space.  This
module provides the minimal TPU-native equivalents, with the same pure
``(params, arrays)`` calling convention as ``SignatureKernel`` so
``gpsig_tpu.models.SVGP`` works unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import config as cfg
from . import params as pm
from .ops import base_kernels


class VectorKernel:
    """ARD kernel over plain feature vectors: k(x, y) with lengthscale and
    variance parameters; base in {'rbf', 'matern12', 'matern32', 'matern52',
    'linear', 'poly', 'cosine'}."""

    def __init__(self, num_features: int, *, base: str = "rbf",
                 variance: float = 1.0, lengthscales=1.0,
                 base_options: dict | None = None):
        self.num_features = int(num_features)
        self.base = base
        self.base_options = dict(base_options or {})
        self._init_variance = float(variance)
        if lengthscales is None:
            self._init_lengthscales = None
        else:
            self._init_lengthscales = np.broadcast_to(
                np.asarray(lengthscales, dtype=np.float64),
                (self.num_features,),
            ).copy()
        self.bijectors = {"variance": "positive"}
        if self._init_lengthscales is not None:
            self.bijectors["lengthscales"] = "positive"

    def init_params(self, key=None, dtype=None) -> dict:
        dtype = dtype or cfg.default_float()
        raw = {"variance": pm.raw_init(self._init_variance, "positive", dtype)}
        if self._init_lengthscales is not None:
            raw["lengthscales"] = pm.raw_init(
                self._init_lengthscales, "positive", dtype
            )
        base_raw, base_bij = base_kernels.init_params(
            self.base, key, num_features=self.num_features, dtype=dtype,
            **self.base_options,
        )
        raw.update(base_raw)
        self.bijectors.update(base_bij)
        return raw

    def constrain(self, raw: dict) -> dict:
        cp = {
            k: pm.constrain(v, self.bijectors.get(k, "identity"))
            for k, v in raw.items()
        }
        cp.update(base_kernels.static_params(self.base, **self.base_options))
        return cp

    def _scale(self, cp, X):
        if "lengthscales" in cp:
            return X / cp["lengthscales"].astype(X.dtype)
        return X

    def K(self, params: dict, X, X2=None):
        cp = self.constrain(params)
        fn = base_kernels.get(self.base)
        Xs = self._scale(cp, X)
        X2s = None if X2 is None else self._scale(cp, X2)
        return cp["variance"].astype(X.dtype) * fn(cp, Xs, X2s)

    def Kdiag(self, params: dict, X):
        cp = self.constrain(params)
        fn = base_kernels.get(self.base)
        Xs = self._scale(cp, X)
        # diagonal via a batched 1-point Gram: (N, 1, 1)
        diag = fn(cp, Xs[:, None, :])[:, 0, 0]
        return cp["variance"].astype(X.dtype) * diag


class InducingPoints:
    """Plain inducing points in input space (GPflow ``InducingPoints``
    analogue), compatible with ``gpsig_tpu.models.SVGP``."""

    def __init__(self, Z):
        self._Z_init = np.asarray(Z)

    def __len__(self):
        return self._Z_init.shape[0]

    def init_params(self, dtype=None) -> dict:
        dtype = dtype or cfg.default_float()
        return {"Z": jnp.asarray(self._Z_init, dtype=dtype)}

    def Kuu(self, ind_params, kern, kern_params, *, jitter=0.0, key=None):
        Z = ind_params["Z"]
        Kzz = kern.K(kern_params, Z)
        return Kzz + jitter * jnp.eye(len(self), dtype=Kzz.dtype)

    def Kuf(self, ind_params, kern, kern_params, X, *, key=None):
        return kern.K(kern_params, ind_params["Z"], X)

    def Kuu_Kuf_Kff(self, ind_params, kern, kern_params, X, *, jitter=0.0,
                    full_f_cov: bool = False, key=None):
        Z = ind_params["Z"]
        Kzz = kern.K(kern_params, Z) + jitter * jnp.eye(
            len(self), dtype=Z.dtype
        )
        Kzx = kern.K(kern_params, Z, X)
        if full_f_cov:
            Kxx = kern.K(kern_params, X) + jitter * jnp.eye(
                X.shape[0], dtype=Z.dtype
            )
        else:
            Kxx = kern.Kdiag(kern_params, X) + jitter
        return Kzz, Kzx, Kxx
