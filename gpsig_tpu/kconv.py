"""1-D convolutional GP kernel (the GPKConv1D baseline family).

TPU-native re-design of the reference's `benchmarks/models/gp_kconv1d.py`:
a sequence kernel defined as the NaN-masked mean of base-kernel evaluations
over all sliding-window pairs, with an optional normalized variant, plus
``InducingWindows`` features.  Windows are extracted with a gather (static
shapes) instead of ``tf.extract_image_patches``; NaN masking is performed
with ``where`` so everything stays jit/grad-safe.

Variable-length sequences are NaN-padded (`benchmarks/utils/datasets.py:104`);
windows touching NaNs are excluded from the mean.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import config as cfg
from . import params as pm
from .ops import base_kernels


class Conv1DKernel:
    """Mean-of-window-pairs kernel (cf. `gp_kconv1d.py:16-122`).

    Args:
      num_features: channel count d.
      len_windows: window length w; windows are (w*d)-vectors.
      base: base kernel over window vectors.
      normalized: normalize to unit diagonal (`gp_kconv1d.py:97-112`).
      lengthscales: optional ARD lengthscales over the w*d window dims.
    """

    def __init__(self, num_features: int, len_windows: int, *,
                 base: str = "rbf", normalized: bool = True,
                 variance: float = 1.0, lengthscales=1.0,
                 base_options: dict | None = None):
        self.num_features = int(num_features)
        self.len_windows = int(len_windows)
        self.window_dim = self.num_features * self.len_windows
        self.base = base
        self.base_options = dict(base_options or {})
        self.normalized = bool(normalized)
        self._init_variance = float(variance)
        if lengthscales is None:
            self._init_lengthscales = None
        else:
            self._init_lengthscales = np.broadcast_to(
                np.asarray(lengthscales, np.float64), (self.window_dim,)
            ).copy()
        self.bijectors = {"variance": "positive"}
        if self._init_lengthscales is not None:
            self.bijectors["lengthscales"] = "positive"

    # ------------------------------------------------------------------

    def init_params(self, key=None, dtype=None) -> dict:
        dtype = dtype or cfg.default_float()
        raw = {"variance": pm.raw_init(self._init_variance, "positive", dtype)}
        if self._init_lengthscales is not None:
            raw["lengthscales"] = pm.raw_init(
                self._init_lengthscales, "positive", dtype
            )
        base_raw, base_bij = base_kernels.init_params(
            self.base, key, num_features=self.window_dim, dtype=dtype,
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

    # ------------------------------------------------------------------

    def get_windows(self, X):
        """(N, L, d) or (N, L*d) -> (N, L-w+1, w*d) sliding windows."""
        X = jnp.asarray(X)
        if X.ndim == 2:
            X = X.reshape(X.shape[0], -1, self.num_features)
        N, L, d = X.shape
        w = self.len_windows
        idx = jnp.arange(L - w + 1)[:, None] + jnp.arange(w)[None, :]
        Xw = X[:, idx, :]  # (N, num_win, w, d)
        return Xw.reshape(N, L - w + 1, w * d)

    @staticmethod
    def _clean_windows(Xw):
        """Zero-fill NaNs; return (clean windows, per-window invalid mask)."""
        nan_mask = jnp.isnan(Xw)
        Xw = jnp.where(nan_mask, 0.0, Xw)
        return Xw, jnp.any(nan_mask, axis=2)  # (N, num_win)

    def _scale(self, cp, Xw):
        if "lengthscales" in cp:
            return Xw / cp["lengthscales"].astype(Xw.dtype)
        return Xw

    def _masked_mean_gram(self, cp, Xw, bad, X2w=None, bad2=None):
        """NaN-masked mean of base-kernel evals over window pairs
        (cf. `gp_kconv1d.py:52-80`)."""
        fn = base_kernels.get(self.base)
        N, W1, D = Xw.shape
        if X2w is None:
            X2w, bad2 = Xw, bad
        N2, W2 = X2w.shape[0], X2w.shape[1]
        M = fn(
            cp, Xw.reshape(N * W1, D), X2w.reshape(N2 * W2, D)
        ).reshape(N, W1, N2, W2)
        ok = (~bad[:, :, None, None]) & (~bad2[None, None, :, :])
        okf = ok.astype(M.dtype)
        return jnp.sum(M * okf, axis=(1, 3)) / jnp.sum(okf, axis=(1, 3))

    def _masked_mean_gram_diag(self, cp, Xw, bad):
        fn = base_kernels.get(self.base)
        M = fn(cp, Xw)  # (N, W, W) batched
        ok = (~bad[:, :, None]) & (~bad[:, None, :])
        okf = ok.astype(M.dtype)
        return jnp.sum(M * okf, axis=(1, 2)) / jnp.sum(okf, axis=(1, 2))

    # ------------------------------------------------------------------

    def K(self, params: dict, X, X2=None, *, key=None):
        cp = self.constrain(params)
        jitter = cfg.jitter()
        Xw, bad = self._clean_windows(self.get_windows(X))
        Xw = self._scale(cp, Xw)
        if X2 is None:
            K = self._masked_mean_gram(cp, Xw, bad)
            K = K + jitter * jnp.eye(K.shape[0], dtype=K.dtype)
            if self.normalized:
                nrm = jnp.sqrt(jnp.diagonal(K))
                K = K / (nrm[:, None] * nrm[None, :])
        else:
            X2w, bad2 = self._clean_windows(self.get_windows(X2))
            X2w = self._scale(cp, X2w)
            K = self._masked_mean_gram(cp, Xw, bad, X2w, bad2)
            if self.normalized:
                n1 = jnp.sqrt(self._masked_mean_gram_diag(cp, Xw, bad) + jitter)
                n2 = jnp.sqrt(self._masked_mean_gram_diag(cp, X2w, bad2) + jitter)
                K = K / (n1[:, None] * n2[None, :])
        return cp["variance"].astype(K.dtype) * K

    def Kdiag(self, params: dict, X, *, key=None):
        cp = self.constrain(params)
        N = jnp.asarray(X).shape[0]
        if self.normalized:
            return jnp.full((N,), cp["variance"])
        Xw, bad = self._clean_windows(self.get_windows(X))
        Xw = self._scale(cp, Xw)
        return cp["variance"] * (
            self._masked_mean_gram_diag(cp, Xw, bad) + cfg.jitter()
        )


class InducingWindows:
    """Inducing windows: each inducing point is a length-w window sequence
    (cf. `gp_kconv1d.py:128-148`), compatible with ``gpsig_tpu.models.SVGP``."""

    def __init__(self, Z):
        Z = np.asarray(Z)
        if Z.ndim != 3:
            raise ValueError("Z must be (num_inducing, len_windows, d)")
        self._Z_init = Z

    def __len__(self):
        return self._Z_init.shape[0]

    def init_params(self, dtype=None) -> dict:
        dtype = dtype or cfg.default_float()
        return {"Z": jnp.asarray(self._Z_init, dtype=dtype)}

    def Kuu(self, ind_params, kern, kern_params, *, jitter=0.0, key=None):
        Kzz = kern.K(kern_params, ind_params["Z"])
        return Kzz + jitter * jnp.eye(len(self), dtype=Kzz.dtype)

    def Kuf(self, ind_params, kern, kern_params, X, *, key=None):
        return kern.K(kern_params, ind_params["Z"], X)

    def Kuu_Kuf_Kff(self, ind_params, kern, kern_params, X, *, jitter=0.0,
                    full_f_cov: bool = False, key=None):
        Kzz = self.Kuu(ind_params, kern, kern_params, jitter=jitter)
        Kzx = self.Kuf(ind_params, kern, kern_params, X)
        if full_f_cov:
            Kxx = kern.K(kern_params, X) + jitter * jnp.eye(
                jnp.asarray(X).shape[0], dtype=Kzz.dtype
            )
        else:
            Kxx = kern.Kdiag(kern_params, X) + jitter
        return Kzz, Kzx, Kxx
