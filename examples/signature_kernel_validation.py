"""Worked example 1: signature-kernel numerical validation.

Script equivalent of the reference's `notebooks/signature_kernel.ipynb`:
random paths, exact truncated signatures (Chen's identity, our in-repo
replacement for the esig C++ oracle), and cross-validation of

  (a) seq x seq    signature Gram        (compute_K_symm analogue)
  (b) tensor x seq cross-covariances     (compute_K_tens_vs_seq analogue)
  (c) tensor x tensor covariances        (compute_K_tens analogue)

Run: PYTHONPATH=. JAX_PLATFORMS=cpu python examples/signature_kernel_validation.py
(float64 on CPU, matching the reference's validation regime)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir, "tests"))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import oracles
from gpsig_tpu import kernels


def main():
    rng = np.random.RandomState(0)
    num_examples, len_examples, num_features = 20, 30, 3
    num_levels = 5

    X = rng.randn(num_examples, len_examples, num_features) / np.sqrt(len_examples)

    # the exact signature kernel = SignatureLinear with order == num_levels
    kern = kernels.SignatureLinear(
        num_features, num_levels, order=num_levels, normalization=False,
        lengthscales=None,
    )
    params = kern.init_params()

    # (a) sequence-vs-sequence Gram
    K = np.asarray(kern.K(params, jnp.asarray(X)))
    sigs = [oracles.path_signature(x, num_levels) for x in X]
    K_exact = np.array(
        [[oracles.sig_inner_products(si, sj).sum() for sj in sigs] for si in sigs]
    )
    err_a = np.linalg.norm(K - K_exact)
    print(f"(a) seq x seq     Frobenius error vs exact signatures: {err_a:.3e}")

    # (b) tensor-vs-sequence
    num_tensors = 8
    len_tensors = num_levels * (num_levels + 1) // 2
    Z = rng.randn(len_tensors, num_tensors, num_features)
    Kzx = np.asarray(kern.K_tens_vs_seq(params, jnp.asarray(Z), jnp.asarray(X)))
    Kzx_exact = oracles.tensor_vs_signature(Z, X, num_levels).sum(0)
    err_b = np.linalg.norm(Kzx - Kzx_exact)
    print(f"(b) tensor x seq  Frobenius error vs exact signatures: {err_b:.3e}")

    # (c) tensor-vs-tensor
    Kzz = np.asarray(kern.K_tens(params, jnp.asarray(Z)))
    Kzz_exact = oracles.tensor_vs_tensor(Z, num_levels).sum(0)
    err_c = np.linalg.norm(Kzz - Kzz_exact)
    print(f"(c) tensor x tens Frobenius error vs exact signatures: {err_c:.3e}")

    assert err_a < 1e-8 and err_b < 1e-8 and err_c < 1e-8
    print("all three match the exact-signature oracle (reference: "
          "`signature_kernel.ipynb` reports 1.1e-8 / 5.5e-11 / 1.5e-12 vs esig)")


if __name__ == "__main__":
    main()
