"""Low-rank machinery: Nystrom features and randomized Hadamard products.

TPU-native equivalent of the reference's `gpsig/low_rank_calculations.py`:

* ``nystrom_map``       <- `low_rank_calculations.py:26-61`
* ``lr_hadamard_prod``  <- `low_rank_calculations.py:64-74` (exact)
* ``lr_hadamard_prod_rand`` <- `low_rank_calculations.py:76-90` dispatcher
* sparse variant: Very Sparse Johnson-Lindenstrauss with N(0,1) entries
  (`low_rank_calculations.py:152-193`).

Design divergences (deliberate, TPU-first):

* explicit ``jax.random`` keys replace ``tf.contrib.stateless`` seeds — the
  reference's seed-pairs map one-to-one onto key splitting.
* the sparse-JL projection is applied as a single dense (D, C) matmul on the
  MXU instead of the reference's boolean-mask + gather of nonzero rows: with
  the default sparsity ~64% of rows are nonzero anyway, dynamic shapes are
  hostile to XLA, and the MXU eats the dense matmul.  Numerically identical
  in distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def draw_indices(key, n: int, l: int):
    """Draw ``l`` indices from 0..n-1 without replacement
    (cf. `low_rank_calculations.py:12-23`)."""
    perm = jax.random.permutation(key, n)
    return perm[:l], perm[l:]


def nystrom_map(key, X, kern_fn, nys_samples=None, num_components=None,
                jitter: float = 1e-6):
    """Nystrom features with uniform landmark sampling.

    Args:
      key: PRNG key (used for landmark sampling and the random diagonal
        jitter the reference adds to dodge degenerate eig gradients,
        `low_rank_calculations.py:52`).
      X: ``(num_samples, d)`` observations.
      kern_fn: ``kern_fn(X1, X2) -> Gram`` base kernel.
      nys_samples: optional explicit ``(C, d)`` landmarks (wins over
        num_components).
      num_components: rank C of the approximation.

    Returns: ``(num_samples, C)`` features with ``Phi Phi^T ~= kern(X, X)``.
    """
    kidx, kjit = jax.random.split(key)
    if nys_samples is None:
        if num_components is None:
            raise ValueError("One of num_components or nys_samples is required")
        idx, _ = draw_indices(kidx, X.shape[0], num_components)
        nys_samples = jnp.take(X, idx, axis=-2)
    C = nys_samples.shape[0]
    W = kern_fn(nys_samples, nys_samples)
    W = W + jnp.diag(jitter * jax.random.uniform(kjit, (C,), dtype=X.dtype))
    S, U = jnp.linalg.eigh(W)
    # PSD Gram eigenvalues can come out slightly negative or numerically zero
    # (especially f32 on TPU).  The reference adds absolute jitter
    # (`low_rank_calculations.py:56`); in f32 that amplifies eig-floor noise
    # by 1/sqrt(jitter), so instead we spectrally truncate: directions whose
    # eigenvalue is below a relative floor contribute nothing.
    rel_eps = 1e-6 if S.dtype == jnp.float32 else 1e-12
    floor = jnp.maximum(jnp.max(S) * rel_eps, jitter)
    inv_sqrt = jnp.where(S > floor, 1.0 / jnp.sqrt(jnp.maximum(S, floor)), 0.0)
    Kxy = kern_fn(X, nys_samples)
    return jnp.matmul(Kxy, U) * inv_sqrt[None, :]


def lr_hadamard_prod(A, B):
    """Exact low-rank Hadamard product: feature outer product.

    A: ``(..., k1)``, B: ``(..., k2)`` -> ``(..., k1*k2)`` such that the
    implied Gram is the elementwise product of the two implied Grams.
    """
    C = A[..., :, None] * B[..., None, :]
    return C.reshape(*C.shape[:-2], C.shape[-2] * C.shape[-1])


def _sparse_gaussian_matrix(key, D: int, num_components: int, s, dtype):
    """(D, C) Very-Sparse-JL matrix: entries N(0,1) w.p. 1/s else 0."""
    ku, kn = jax.random.split(key)
    mask = jax.random.uniform(ku, (D, num_components), dtype=dtype) <= (1.0 / s)
    vals = jax.random.normal(kn, (D, num_components), dtype=dtype)
    return jnp.where(mask, vals, 0.0)


def lr_hadamard_prod_sparse(key, A, B, num_components: int,
                            sparsity: str = "sqrt", *,
                            chunk_rows: int = 1 << 15):
    """Randomized Hadamard product via Very Sparse JL projection.

    A: ``(..., k1)``, B: ``(..., k2)`` -> ``(..., num_components)``.

    The (batch, k1*k2) outer-product intermediate is built in row chunks of
    ``chunk_rows`` (one MXU matmul each), so memory stays bounded for
    long-sequence / large-N batches (the N*L batch axis easily reaches 1e7
    at the low-rank path's target scale).
    """
    k1, k2 = A.shape[-1], B.shape[-1]
    D = k1 * k2
    if sparsity == "log":
        s = D / jnp.log(float(D))
    elif sparsity == "sqrt":
        s = jnp.sqrt(float(D))
    else:
        raise ValueError(f"Unknown sparsity {sparsity!r}")
    s = jnp.asarray(s, dtype=A.dtype)
    R = _sparse_gaussian_matrix(key, D, num_components, s, A.dtype)
    scale = jnp.sqrt(s / num_components)

    batch_shape = A.shape[:-1]
    Af = A.reshape(-1, k1)
    Bf = B.reshape(-1, k2)
    n = Af.shape[0]

    def project(a_rows, b_rows):
        E = (a_rows[:, :, None] * b_rows[:, None, :]).reshape(-1, D)
        return jnp.matmul(E, R, preferred_element_type=A.dtype)

    if n <= chunk_rows:
        C = project(Af, Bf)
    else:
        n_chunks = -(-n // chunk_rows)
        pad = n_chunks * chunk_rows - n
        Af = jnp.concatenate([Af, jnp.zeros((pad, k1), A.dtype)], axis=0)
        Bf = jnp.concatenate([Bf, jnp.zeros((pad, k2), B.dtype)], axis=0)
        C = jax.lax.map(
            lambda ab: project(*ab),
            (Af.reshape(n_chunks, chunk_rows, k1),
             Bf.reshape(n_chunks, chunk_rows, k2)),
        ).reshape(n_chunks * chunk_rows, num_components)[:n]
    return scale * C.reshape(*batch_shape, num_components)


def lr_hadamard_prod_dense(key, A, B, num_components: int,
                           distribution: str = "rademacher", *,
                           chunk_rows: int = 1 << 15):
    """Randomized Hadamard product via a DENSE JL projection with
    Rademacher (+-1) or Gaussian N(0,1) entries — the reference's dense
    sampler variants (`low_rank_calculations.py:92-103,129-149`).

    Distribution-equivalent alternatives to the sparse default; the sparse
    mode is cheaper to sample and identical in expectation, so these exist
    for parity/ablation."""
    k1, k2 = A.shape[-1], B.shape[-1]
    D = k1 * k2
    if distribution == "rademacher":
        R = jnp.where(
            jax.random.uniform(key, (D, num_components), dtype=A.dtype)
            <= 0.5, 1.0, -1.0
        ).astype(A.dtype)
    elif distribution == "gauss":
        R = jax.random.normal(key, (D, num_components), dtype=A.dtype)
    else:
        raise ValueError(f"Unknown distribution {distribution!r}")
    scale = 1.0 / jnp.sqrt(jnp.asarray(float(num_components), A.dtype))

    batch_shape = A.shape[:-1]
    Af = A.reshape(-1, k1)
    Bf = B.reshape(-1, k2)
    n = Af.shape[0]

    def project(a_rows, b_rows):
        E = (a_rows[:, :, None] * b_rows[:, None, :]).reshape(-1, D)
        return jnp.matmul(E, R, preferred_element_type=A.dtype)

    if n <= chunk_rows:
        C = project(Af, Bf)
    else:
        n_chunks = -(-n // chunk_rows)
        pad = n_chunks * chunk_rows - n
        Af = jnp.concatenate([Af, jnp.zeros((pad, k1), A.dtype)], axis=0)
        Bf = jnp.concatenate([Bf, jnp.zeros((pad, k2), B.dtype)], axis=0)
        C = jax.lax.map(
            lambda ab: project(*ab),
            (Af.reshape(n_chunks, chunk_rows, k1),
             Bf.reshape(n_chunks, chunk_rows, k2)),
        ).reshape(n_chunks * chunk_rows, num_components)[:n]
    return scale * C.reshape(*batch_shape, num_components)


def lr_hadamard_prod_subsample(key, A, B, num_components: int):
    """Randomized Hadamard product by index-pair subsampling + Rademacher
    signs (the 'lin' sparsity mode, `low_rank_calculations.py:104-127`)."""
    k1, k2 = A.shape[-1], B.shape[-1]
    D = k1 * k2
    kp, kr = jax.random.split(key)
    sel = jax.random.permutation(kp, D)[:num_components]
    idx1, idx2 = sel // k2, sel % k2
    C = jnp.take(A, idx1, axis=-1) * jnp.take(B, idx2, axis=-1)
    signs = jnp.where(
        jax.random.uniform(kr, (num_components,), dtype=A.dtype) <= 0.5, 1.0, -1.0
    ).astype(A.dtype)
    return C * signs


def lr_hadamard_prod_rand(key, A, B, rank_bound: int, sparsity: str = "sqrt"):
    """Dispatcher matching `low_rank_calculations.py:76-90`; 'exact' added
    for testing (no randomness, full k1*k2 features); 'rademacher'/'gauss'
    are the reference's dense sampler variants."""
    if sparsity == "exact":
        return lr_hadamard_prod(A, B)
    if sparsity == "lin":
        return lr_hadamard_prod_subsample(key, A, B, rank_bound)
    if sparsity in ("rademacher", "gauss"):
        return lr_hadamard_prod_dense(key, A, B, rank_bound, sparsity)
    return lr_hadamard_prod_sparse(key, A, B, rank_bound, sparsity)


# ---------------------------------------------------------------------------
# low-rank signature feature maps (cf. `signature_algs.py:162-222`)
# ---------------------------------------------------------------------------


def signature_kern_lr_feature(key, U, num_levels: int, rank_bound: int,
                              sparsity: str = "sqrt", difference: bool = True):
    """Low-rank feature maps for first-order sequence signatures.

    Args:
      U: ``(N, L, C)`` low-rank (e.g. Nystrom) features of the embedded
        sequence observations.

    Returns: list of ``num_levels+1`` arrays ``(N, C_m)``; level-m features
    satisfy ``Phi_m Phi_m^T ~= K_m``.

    NOTE: fixes the reference bug at `signature_algs.py:191`, which appends
    ``sum_t U`` (a constant) for every level >= 2 instead of ``sum_t P``;
    levels >= 2 of the reference's low-rank sequence features are wrong.
    """
    from .signature import cumsum_exclusive

    N = U.shape[0]
    Phi = [jnp.ones((N, 1), dtype=U.dtype)]

    if difference:
        U = U[:, 1:, :] - U[:, :-1, :]

    Phi.append(jnp.sum(U, axis=1))

    keys = jax.random.split(key, max(num_levels - 1, 1))
    P = U
    for i in range(2, num_levels + 1):
        P = cumsum_exclusive(P, axis=1)
        P = lr_hadamard_prod_rand(keys[i - 2], U, P, rank_bound, sparsity)
        Phi.append(jnp.sum(P, axis=1))
    return Phi


def tensor_kern_lr_feature(key, U, num_levels: int, rank_bound: int,
                           sparsity: str = "sqrt"):
    """Low-rank feature maps for rank-1 inducing tensors
    (cf. `signature_algs.py:194-222`).

    Args:
      U: ``(num_levels*(num_levels+1)/2, num_tensors, C)`` features of the
        packed tensor slots.

    Returns: list of ``num_levels+1`` arrays ``(num_tensors, C_m)``.
    """
    num_tensors = U.shape[1]
    Phi = [jnp.ones((num_tensors, 1), dtype=U.dtype)]

    keys = jax.random.split(key, max(num_levels - 1, 1))
    k = 0
    for i in range(1, num_levels + 1):
        R = U[k]
        k += 1
        for j in range(1, i):
            # the reference reuses seed index j-1 across levels
            # (`signature_algs.py:219`), tying the projection used at slot
            # depth j; we keep that so cross-covariances stay consistent.
            R = lr_hadamard_prod_rand(keys[j - 1], U[k], R, rank_bound, sparsity)
            k += 1
        Phi.append(R)
    return Phi
