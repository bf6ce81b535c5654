"""GP linear algebra: whitened conditionals and Gaussian KL.

Re-derivations of the two GPflow routines the reference's SVGP leans on
(`gpsig/models.py:49-66`): ``base_conditional`` (Cholesky + triangular
solves) and ``gauss_kl``.  XLA lowers ``cholesky``/``solve_triangular`` to
TPU-native kernels; everything here is jit/grad-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cholesky, solve_triangular


def base_conditional(Kmn, Kmm, Knn, f, *, q_sqrt=None, white: bool = False,
                     full_cov: bool = False):
    """Sparse GP conditional q(f*) given inducing outputs u ~ N(f, q_sqrt²).

    Args:
      Kmn: (M, N) inducing-vs-data covariance.
      Kmm: (M, M) inducing covariance (jitter already added by caller).
      Knn: (N,) diag or (N, N) full data covariance.
      f: (M, P) variational means (whitened if ``white``).
      q_sqrt: None, (M, P) diagonal factors, or (P, M, M) lower factors.
      white: whitened parameterization (u = L v).

    Returns: mean (N, P), var (N, P) or (P, N, N) if full_cov.
    """
    Lm = cholesky(Kmm, lower=True)
    A = solve_triangular(Lm, Kmn, lower=True)  # (M, N)

    if full_cov:
        fvar = Knn - A.T @ A  # (N, N)
    else:
        fvar = Knn - jnp.sum(jnp.square(A), axis=0)  # (N,)

    if not white:
        A = solve_triangular(Lm.T, A, lower=False)  # Kmm^{-1/2}-free form

    fmean = A.T @ f  # (N, P)
    P = f.shape[-1]

    if q_sqrt is not None:
        if q_sqrt.ndim == 2:  # (M, P) diagonal
            LTA = q_sqrt.T[:, :, None] * A[None, :, :]  # (P, M, N)
        elif q_sqrt.ndim == 3:  # (P, M, M) lower-triangular
            L = jnp.tril(q_sqrt)
            LTA = jnp.matmul(jnp.swapaxes(L, -1, -2), A[None])  # (P, M, N)
        else:
            raise ValueError("q_sqrt must have rank 2 or 3")
        if full_cov:
            fvar = fvar[None] + jnp.matmul(jnp.swapaxes(LTA, -1, -2), LTA)
        else:
            fvar = fvar[None] + jnp.sum(jnp.square(LTA), axis=1)  # (P, N)

    if full_cov:
        if fvar.ndim == 2:
            fvar = jnp.broadcast_to(fvar[None], (P,) + fvar.shape)
    else:
        if fvar.ndim == 1:
            fvar = jnp.broadcast_to(fvar[:, None], fvar.shape + (P,))
        else:
            fvar = fvar.T  # (N, P)
    return fmean, fvar


def gauss_kl(q_mu, q_sqrt, K=None):
    """KL[q(u) || p(u)] for q = N(q_mu, q_sqrt q_sqrtᵀ).

    p(u) = N(0, I) if K is None (whitened case, `models.py:49`), else
    N(0, K) (`models.py:52`).

    Args:
      q_mu: (M, P); q_sqrt: (M, P) diagonal or (P, M, M) lower.
    """
    M, P = q_mu.shape
    diag = q_sqrt.ndim == 2

    if K is None:
        alpha = q_mu
        mahalanobis = jnp.sum(jnp.square(alpha))
        if diag:
            logdet_q = jnp.sum(jnp.log(jnp.square(q_sqrt)))
            trace = jnp.sum(jnp.square(q_sqrt))
        else:
            Lq = jnp.tril(q_sqrt)
            logdet_q = 2.0 * jnp.sum(
                jnp.log(jnp.abs(jnp.diagonal(Lq, axis1=-2, axis2=-1)))
            )
            trace = jnp.sum(jnp.square(Lq))
        return 0.5 * (mahalanobis + trace - M * P - logdet_q)

    L = cholesky(K, lower=True)
    alpha = solve_triangular(L, q_mu, lower=True)  # (M, P)
    mahalanobis = jnp.sum(jnp.square(alpha))
    logdet_p = 2.0 * P * jnp.sum(jnp.log(jnp.diagonal(L)))
    if diag:
        Linv = solve_triangular(L, jnp.eye(M, dtype=K.dtype), lower=True)
        trace = jnp.sum(
            jnp.square(q_sqrt) * jnp.sum(jnp.square(Linv), axis=0)[:, None]
        )
        logdet_q = jnp.sum(jnp.log(jnp.square(q_sqrt)))
    else:
        Lq = jnp.tril(q_sqrt)
        LiLq = jax.vmap(lambda lq: solve_triangular(L, lq, lower=True))(Lq)
        trace = jnp.sum(jnp.square(LiLq))
        logdet_q = 2.0 * jnp.sum(
            jnp.log(jnp.abs(jnp.diagonal(Lq, axis1=-2, axis2=-1)))
        )
    return 0.5 * (mahalanobis + trace - M * P - logdet_q + logdet_p)
