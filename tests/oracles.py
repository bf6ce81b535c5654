"""Brute-force numerical oracles for signature kernels (numpy, float64).

The reference validates its recursions against the independent C++ `esig`
package (`notebooks/signature_kernel.ipynb`, errors ~1e-8 Frobenius).  `esig`
is not available here, so we re-derive the same ground truth from first
principles:

* the truncated signature of a piecewise-linear path is computed exactly via
  Chen's identity: the signature of a linear segment with increment Delta has
  level-m term Delta^{(x) m} / m!, and signatures concatenate by graded tensor
  products.  This reproduces exactly what `esig.tosig.stream2sig` computes.
* the *first-order approximation* kernels are additionally validated against
  literal sum-over-increasing-index-tuples evaluations (itertools), which is
  an independent restatement of the defining sums.

Everything here is deliberately slow, simple numpy.
"""

from __future__ import annotations

import itertools

import numpy as np


def segment_signature(delta: np.ndarray, num_levels: int) -> list[np.ndarray]:
    """Signature (levels 0..M) of a linear path with increment ``delta``."""
    sig = [np.ones(())]
    term = np.ones(())
    for m in range(1, num_levels + 1):
        term = np.multiply.outer(term, delta) / m
        sig.append(term)
    return sig


def chen_product(sig1: list[np.ndarray], sig2: list[np.ndarray]) -> list[np.ndarray]:
    """Chen's identity: signature of the concatenated path."""
    M = len(sig1) - 1
    out = []
    for m in range(M + 1):
        acc = np.zeros(sig1[m].shape) if m > 0 else np.zeros(())
        for i in range(m + 1):
            acc = acc + np.multiply.outer(sig1[i], sig2[m - i])
        out.append(acc)
    return out


def path_signature(x: np.ndarray, num_levels: int) -> list[np.ndarray]:
    """Exact truncated signature of the piecewise-linear path through rows
    of ``x`` (shape (L, d)); matches ``esig.tosig.stream2sig``."""
    x = np.asarray(x, dtype=np.float64)
    sig = segment_signature(x[1] - x[0], num_levels)
    for t in range(1, x.shape[0] - 1):
        sig = chen_product(sig, segment_signature(x[t + 1] - x[t], num_levels))
    return sig


def sig_inner_products(sig_x, sig_y) -> np.ndarray:
    """Per-level inner products <S_m(x), S_m(y)>, shape (M+1,)."""
    return np.array([np.sum(sx * sy) for sx, sy in zip(sig_x, sig_y)])


def signature_gram(X: np.ndarray, num_levels: int) -> np.ndarray:
    """(M+1, N, N) per-level exact signature Gram over paths X (N, L, d)."""
    sigs = [path_signature(x, num_levels) for x in X]
    N = len(sigs)
    K = np.zeros((num_levels + 1, N, N))
    for i in range(N):
        for j in range(N):
            K[:, i, j] = sig_inner_products(sigs[i], sigs[j])
    return K


def rank1_tensor(vectors: list[np.ndarray]) -> np.ndarray:
    """v_1 (x) v_2 (x) ... (x) v_m."""
    out = np.ones(())
    for v in vectors:
        out = np.multiply.outer(out, v)
    return out


def tensor_vs_signature(Z: np.ndarray, X: np.ndarray, num_levels: int,
                        increments: bool = False) -> np.ndarray:
    """Exact <z, S(x)> per level for packed rank-1 tensors vs paths.

    Z: (len_tensors, num_tensors, d) or (len_tensors, num_tensors, 2, d) with
    increments (factor = z[...,1,:] - z[...,0,:]); packing: level m uses slots
    m(m-1)/2 .. m(m-1)/2 + m - 1 (cf. `inducing_variables.py:32-43`).
    Returns (num_levels+1, num_tensors, N).
    """
    if increments:
        Z = Z[..., 1, :] - Z[..., 0, :]
    num_tensors = Z.shape[1]
    N = X.shape[0]
    sigs = [path_signature(x, num_levels) for x in X]
    K = np.zeros((num_levels + 1, num_tensors, N))
    K[0] = 1.0
    k = 0
    for m in range(1, num_levels + 1):
        slots = Z[k:k + m]  # (m, num_tensors, d)
        k += m
        for t in range(num_tensors):
            z_tens = rank1_tensor([slots[j, t] for j in range(m)])
            for n in range(N):
                K[m, t, n] = np.sum(z_tens * sigs[n][m])
    return K


def tensor_vs_tensor(Z: np.ndarray, num_levels: int,
                     increments: bool = False) -> np.ndarray:
    """Exact <z, z'> per level for packed rank-1 tensors.

    Returns (num_levels+1, num_tensors, num_tensors).
    """
    if increments:
        Z = Z[..., 1, :] - Z[..., 0, :]
    num_tensors = Z.shape[1]
    K = np.ones((num_levels + 1, num_tensors, num_tensors))
    k = 0
    for m in range(1, num_levels + 1):
        slots = Z[k:k + m]  # (m, nT, d)
        k += m
        K[m] = np.prod(
            np.einsum("mid,mjd->mij", slots, slots), axis=0
        )
    return K


# ---------------------------------------------------------------------------
# independent literal-sum oracles for the *first-order* approximation
# ---------------------------------------------------------------------------


def first_order_seq_kernel_bruteforce(M: np.ndarray, num_levels: int) -> np.ndarray:
    """Literal sum over strictly increasing index tuples.

    M: (L1, L2) *increment* Gram for one pair of paths.  Level m:
    sum over s_1<...<s_m, t_1<...<t_m of prod_k M[s_k, t_k].
    Returns (num_levels+1,).
    """
    L1, L2 = M.shape
    out = np.zeros(num_levels + 1)
    out[0] = 1.0
    for m in range(1, num_levels + 1):
        total = 0.0
        for ss in itertools.combinations(range(L1), m):
            for ts in itertools.combinations(range(L2), m):
                total += np.prod([M[s, t] for s, t in zip(ss, ts)])
        out[m] = total
    return out


def first_order_tens_vs_seq_bruteforce(M: np.ndarray, num_levels: int) -> np.ndarray:
    """Literal sum for tensor-vs-seq first order.

    M: (len_tensors, L) increment Gram for one tensor vs one path.  Level m
    uses slots k_m..k_m+m-1: sum over t_1<...<t_m of prod_j M[k_m+j, t_j].
    Returns (num_levels+1,).
    """
    L = M.shape[1]
    out = np.zeros(num_levels + 1)
    out[0] = 1.0
    k = 0
    for m in range(1, num_levels + 1):
        total = 0.0
        for ts in itertools.combinations(range(L), m):
            total += np.prod([M[k + j, t] for j, t in enumerate(ts)])
        out[m] = total
        k += m
    return out
