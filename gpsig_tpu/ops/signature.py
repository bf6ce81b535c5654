"""Truncated-signature kernel recursions (the hot compute path).

These are the TPU-native equivalents of the reference's
`gpsig/signature_algs.py`: kernel-trick evaluation of truncated signature
inner products from a base-kernel Gram matrix via iterated
elementwise-multiply + exclusive-cumsum recursions.

Reference semantics (validated against explicit-signature oracles in
``tests/oracles.py``):

* ``signature_kern_first_order``   <- `signature_algs.py:8-35`
* ``signature_kern_higher_order``  <- `signature_algs.py:37-74`
* ``tensor_kern``                  <- `signature_algs.py:76-99`
* ``signature_kern_tens_vs_seq_*`` <- `signature_algs.py:101-160`

Design notes (TPU):

* level loops are static Python loops -> fully unrolled under ``jit``; the
  level count is small (<= ~6) so XLA fuses each level's multiply+cumsum
  chain into a handful of elementwise/scan kernels.
* everything is shape-polymorphic over leading batch dims and works in any
  float dtype (f64 for validation, f32/bf16-with-f32-accum for speed).
* the fused Pallas fast path (``gpsig_tpu/ops/signature_pallas.py``) computes
  the same quantities without materializing the (N1,L1,N2,L2) intermediate
  in HBM; this module is the reference implementation and the autodiff path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cumsum_exclusive(x, axis: int):
    """Exclusive cumulative sum along ``axis`` (TF ``cumsum(exclusive=True)``)."""
    out = jnp.cumsum(x, axis=axis)
    out = jnp.roll(out, 1, axis=axis)
    # zero the first slice along `axis`
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(0, 1)
    return out.at[tuple(idx)].set(0.0)


def second_order_difference(M):
    """Square "difference" of a seq-vs-seq base Gram.

    M[..., s, ..., t] -> <k(x_{s+1}) - k(x_s), k(y_{t+1}) - k(y_t)> evaluated
    through the kernel trick; axes 1 and -1 are the two time axes
    (cf. `signature_algs.py:26`).
    """
    return (
        M[:, 1:, ..., 1:]
        + M[:, :-1, ..., :-1]
        - M[:, :-1, ..., 1:]
        - M[:, 1:, ..., :-1]
    )


def signature_kern_first_order(M, num_levels: int, difference: bool = True):
    """First-order signature kernel from a base Gram.

    Args:
      M: ``(N1, L1, N2, L2)`` cross Gram or ``(N, L, L)`` batch of per-example
        square Grams (the diagonal mode used by ``Kdiag``).
      num_levels: truncation level (levels ``0..num_levels`` are returned).
      difference: if True, second-order-difference M first (signatures of the
        paths); if False, signatures of the integrated paths.

    Returns:
      ``(num_levels+1, N1, N2)`` or ``(num_levels+1, N)`` stacked per-level
      kernels; level 0 is identically 1.
    """
    if M.ndim == 4:
        batch_shape = (M.shape[0], M.shape[2])
    else:
        batch_shape = (M.shape[0],)

    if difference:
        M = second_order_difference(M)

    K = [jnp.ones(batch_shape, dtype=M.dtype), jnp.sum(M, axis=(1, -1))]

    R = M
    for _ in range(2, num_levels + 1):
        R = M * cumsum_exclusive(cumsum_exclusive(R, axis=1), axis=-1)
        K.append(jnp.sum(R, axis=(1, -1)))

    return jnp.stack(K, axis=0)


def signature_kern_higher_order(M, num_levels: int, order: int = 2,
                                difference: bool = True):
    """Higher-order signature kernel from a base Gram.

    Maintains an ``(order x order)`` grid of running partial tensors with
    ``1/j``, ``1/k`` scalings (cf. `signature_algs.py:60-72`); the grid size
    is static so the loop unrolls cleanly under jit.
    """
    if M.ndim == 4:
        batch_shape = (M.shape[0], M.shape[2])
    else:
        batch_shape = (M.shape[0],)

    if difference:
        M = second_order_difference(M)

    K = [jnp.ones(batch_shape, dtype=M.dtype), jnp.sum(M, axis=(1, -1))]

    R = {(0, 0): M}
    for i in range(2, num_levels + 1):
        d = min(i, order)
        R_next = {}
        R_sum = sum(R.values())
        R_next[(0, 0)] = M * cumsum_exclusive(
            cumsum_exclusive(R_sum, axis=1), axis=-1
        )
        for j in range(2, d + 1):
            row_sum = sum(R[(a, j - 2)] for a in range(d) if (a, j - 2) in R)
            col_sum = sum(R[(j - 2, b)] for b in range(d) if (j - 2, b) in R)
            R_next[(0, j - 1)] = (1.0 / j) * M * cumsum_exclusive(row_sum, axis=1)
            R_next[(j - 1, 0)] = (1.0 / j) * M * cumsum_exclusive(col_sum, axis=-1)
            for k in range(2, d + 1):
                R_next[(j - 1, k - 1)] = (1.0 / (j * k)) * M * R[(j - 2, k - 2)]
        K.append(jnp.sum(sum(R_next.values()), axis=(1, -1)))
        R = R_next

    return jnp.stack(K, axis=0)


def tensor_kern(M, num_levels: int):
    """Gram matrix between rank-1 inducing tensors.

    Args:
      M: ``(num_levels*(num_levels+1)/2, n1, n2)`` base-kernel evaluations
        between the packed tensor slots (triangular packing: level m uses
        slots ``m(m-1)/2 .. m(m-1)/2+m-1``, cf. `signature_algs.py:90-97`).

    Returns: ``(num_levels+1, n1, n2)``.
    """
    n1, n2 = M.shape[1], M.shape[2]
    K = [jnp.ones((n1, n2), dtype=M.dtype)]
    k = 0
    for i in range(1, num_levels + 1):
        R = M[k]
        k += 1
        for _ in range(1, i):
            R = M[k] * R
            k += 1
        K.append(R)
    return jnp.stack(K, axis=0)


def signature_kern_tens_vs_seq_first_order(M, num_levels: int,
                                           difference: bool = True):
    """Inducing tensors vs first-order sequence signatures.

    Args:
      M: ``(num_levels*(num_levels+1)/2, num_tensors, N, L)`` base-kernel
        evaluations between packed tensor slots and sequence observations.

    Returns: ``(num_levels+1, num_tensors, N)``
    (cf. `signature_algs.py:101-127`).
    """
    num_tensors, num_examples = M.shape[1], M.shape[2]

    if difference:
        M = M[..., 1:] - M[..., :-1]

    K = [jnp.ones((num_tensors, num_examples), dtype=M.dtype)]
    k = 0
    for i in range(1, num_levels + 1):
        R = M[k]
        k += 1
        for _ in range(1, i):
            R = M[k] * cumsum_exclusive(R, axis=2)
            k += 1
        K.append(jnp.sum(R, axis=2))
    return jnp.stack(K, axis=0)


def signature_kern_tens_vs_seq_higher_order(M, num_levels: int, order: int = 2,
                                            difference: bool = True):
    """Inducing tensors vs higher-order sequence signatures
    (cf. `signature_algs.py:129-160`)."""
    num_tensors, num_examples = M.shape[1], M.shape[2]

    if difference:
        M = M[..., 1:] - M[..., :-1]

    K = [jnp.ones((num_tensors, num_examples), dtype=M.dtype)]
    k = 0
    for i in range(1, num_levels + 1):
        R = [M[k]]
        k += 1
        for j in range(1, i):
            d = min(j + 1, order)
            R_next = [M[k] * cumsum_exclusive(sum(R), axis=2)]
            for l in range(1, d):
                R_next.append((1.0 / (l + 1)) * M[k] * R[l - 1])
            R = R_next
            k += 1
        K.append(jnp.sum(sum(R), axis=2))
    return jnp.stack(K, axis=0)
