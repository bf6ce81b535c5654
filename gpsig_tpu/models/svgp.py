"""Sparse variational GP with signature covariances.

TPU-native re-design of the reference's `gpsig/models.py` (GPflow-SVGP
subclass with DataHolder/Minibatch feeds).  Here the model is a static
configuration over (kernel, inducing variables, likelihood); the ELBO and
prediction are pure jit/grad/pjit-able functions of a parameter pytree and a
data batch — minibatching is the caller's slicing, device placement is
jax.sharding, and the "single fused covariance call" efficiency trick
(`models.py:61-73`) is kept via ``Kuu_Kuf_Kff``.

Parameter pytree layout::

    {"kern": {...},            # raw kernel params (bijector-transformed)
     "ind":  {"Z": ..., ["W"]},# inducing locations (+ optional mixing)
     "q_mu": (M, P),
     "q_sqrt": (P, M, M)}      # lower-triangular used via tril
                               # or (M, P) if q_diag
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfg
from ..linalg import base_conditional, gauss_kl


class SVGP:
    """Sparse variational GP (whitened by default, like the reference
    `train_gpsig.py:68`)."""

    def __init__(self, kern, ind, likelihood, *, num_latent: int,
                 num_data: int | None = None, whiten: bool = True,
                 q_diag: bool = False, mean_function=None):
        self.kern = kern
        self.ind = ind
        self.likelihood = likelihood
        self.num_latent = int(num_latent)
        self.num_data = num_data
        self.whiten = bool(whiten)
        self.q_diag = bool(q_diag)
        # reference adds mean_function(X_new) to the conditional mean
        # (`models.py:67`); None keeps the benchmarks' Zero default
        self.mean_function = mean_function

    # ------------------------------------------------------------------

    def init_params(self, key=None, dtype=None) -> dict:
        dtype = dtype or cfg.default_float()
        M, P = len(self.ind), self.num_latent
        params = {
            "kern": self.kern.init_params(key, dtype=dtype),
            "ind": self.ind.init_params(dtype=dtype),
            "q_mu": jnp.zeros((M, P), dtype=dtype),
        }
        if self.mean_function is not None:
            mf = self.mean_function.init_params(dtype=dtype)
            if mf:
                params["mean"] = mf
        # trainable-likelihood parameters (e.g. Gaussian noise variance —
        # GPflow's Gaussian trains it; reference `gpsig/models.py:13-37`)
        lik_init = getattr(self.likelihood, "init_params", None)
        if lik_init is not None:
            lp = lik_init(dtype=dtype)
            if lp:
                params["lik"] = lp
        if self.q_diag:
            params["q_sqrt"] = jnp.ones((M, P), dtype=dtype)
        else:
            params["q_sqrt"] = jnp.tile(
                jnp.eye(M, dtype=dtype)[None], (P, 1, 1)
            )
        return params

    def _q_sqrt(self, params):
        q = params["q_sqrt"]
        return q if self.q_diag else jnp.tril(q)

    def _lik(self, params):
        """Likelihood with any trainable parameters bound from the pytree."""
        bind = getattr(self.likelihood, "bind", None)
        if bind is not None and "lik" in params:
            return bind(params["lik"])
        return self.likelihood

    # ------------------------------------------------------------------

    def predict_f(self, params: dict, X, *, full_cov: bool = False,
                  return_Kzz: bool = False, key=None):
        """q(f*) at new sequences (<- `models.py:61-73`)."""
        Kzz, Kzx, Kxx = self.ind.Kuu_Kuf_Kff(
            params["ind"], self.kern, params["kern"], X,
            jitter=cfg.jitter(), full_f_cov=full_cov, key=key,
        )
        fmean, fvar = base_conditional(
            Kzx, Kzz, Kxx, params["q_mu"],
            q_sqrt=self._q_sqrt(params), white=self.whiten,
            full_cov=full_cov,
        )
        if self.mean_function is not None:
            fmean = fmean + jnp.asarray(
                self.mean_function(params.get("mean", {}), X), fmean.dtype
            )
        if return_Kzz:
            return fmean, fvar, Kzz
        return fmean, fvar

    def elbo(self, params: dict, X, Y, *, key=None):
        """Evidence lower bound on a (mini)batch (<- `models.py:39-59`).

        ``num_data`` (total N) scales the expected-likelihood term for
        minibatching; defaults to the batch size.
        """
        batch = X.shape[0]
        if self.whiten:
            fmean, fvar = self.predict_f(params, X, key=key)
            KL = gauss_kl(params["q_mu"], self._q_sqrt(params))
        else:
            fmean, fvar, Kzz = self.predict_f(
                params, X, return_Kzz=True, key=key
            )
            KL = gauss_kl(params["q_mu"], self._q_sqrt(params), K=Kzz)
        var_exp = self._lik(params).variational_expectations(fmean, fvar, Y)
        num_data = self.num_data if self.num_data is not None else batch
        scale = jnp.asarray(num_data, fmean.dtype) / batch
        return jnp.sum(var_exp) * scale - KL

    def loss(self, params: dict, X, Y, *, key=None):
        return -self.elbo(params, X, Y, key=key)

    def predict_f_samples(self, params: dict, X, *, num_samples: int = 1,
                          key=None, full_cov: bool = False):
        """Draw ``num_samples`` samples from q(f*) at new sequences.

        Parity surface for GPflow's ``predict_f_samples``, which the
        reference inherits via its SVGP subclass
        (`gpsig/models.py:13-37`).  Returns ``(S, N, P)``.  With
        ``full_cov=True`` samples carry the posterior cross-covariance
        (per-latent Cholesky of the (P, N, N) covariance); the default
        samples the marginal diagonal like GPflow's ``full_cov=False``.
        """
        if key is None:
            raise ValueError("predict_f_samples requires an explicit PRNG key")
        if full_cov:
            fmean, fcov = self.predict_f(params, X, full_cov=True)
            N = fcov.shape[-1]
            chol = jnp.linalg.cholesky(
                fcov + cfg.jitter() * jnp.eye(N, dtype=fcov.dtype)
            )  # (P, N, N)
            eps = jax.random.normal(
                key, (num_samples, self.num_latent, N), fcov.dtype
            )
            samples = jnp.einsum("pnm,spm->spn", chol, eps)
            return jnp.transpose(samples, (0, 2, 1)) + fmean[None]
        fmean, fvar = self.predict_f(params, X)
        eps = jax.random.normal(key, (num_samples,) + fmean.shape, fmean.dtype)
        return fmean[None] + jnp.sqrt(jnp.clip(fvar, 0.0, None))[None] * eps

    def predict_y(self, params: dict, X, *, key=None):
        """Predictive mean/variance of observables."""
        fmean, fvar = self.predict_f(params, X, key=key)
        return self._lik(params).predict_mean_and_var(fmean, fvar)

    def predict_log_density(self, params: dict, X, Y, *, key=None):
        """log p(Y*|X*) under the predictive (nlpp = -mean of this)."""
        fmean, fvar = self.predict_f(params, X, key=key)
        return self._lik(params).predict_log_density(fmean, fvar, Y)
