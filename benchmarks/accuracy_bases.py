"""Per-base f32 accuracy of the signature-kernel Gram at long L.

VERDICT r3 item 6 (second half): bases without a closed-form
cancellation-free increment Gram fall back to naive second differencing
(reference `signature_algs.py:26`), which in f32 loses ~3 digits at
L=512 to catastrophic cancellation.  This harness measures, per base,
the worst-entry error of the **f32 normalized Gram** against an f64
oracle built through the same public API, and prints the markdown table
recorded in PERF.md.

Run on CPU (needs f64 for the oracle):
    PYTHONPATH=. JAX_PLATFORMS=cpu python benchmarks/accuracy_bases.py \
        [--L 512] [--N 6] [--levels 4]
"""

import argparse

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from gpsig_tpu import kernels  # noqa: E402
from gpsig_tpu.ops import gram as gram_ops  # noqa: E402

BASES = [
    "linear", "rbf", "matern12", "cosine", "poly", "mix",
    "matern32", "matern52", "spectral_exp", "spectral_rbf",
    "spectral_mixed",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=512)
    ap.add_argument("--N", type=int, default=6)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--d", type=int, default=3)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    X = rng.randn(args.N, args.L, args.d).cumsum(axis=1) / np.sqrt(args.L)

    print(f"| base | closed form | f32 max abs err (L={args.L}, "
          f"normalized Gram) |")
    print("|---|---|---|")
    for base in BASES:
        opts = {"Q": 2} if base.startswith("spectral") else {}
        kern = kernels.SignatureKernel(
            args.d, args.levels, base=base, base_options=opts,
            normalization=True, fused="off",
        )
        p64 = kern.init_params()
        K64 = kern.K(p64, jnp.asarray(X))
        p32 = jax.tree.map(lambda v: jnp.asarray(v, jnp.float32), p64)
        X32 = jnp.asarray(X, jnp.float32)
        closed = gram_ops.increment_gram_fns(base)[0] is not None
        if closed:
            K32 = kern.K_blocked(p32, X32, block_size=max(8, args.N))
        else:
            K32 = kern.K(p32, X32)
        err = float(jnp.max(jnp.abs(K32.astype(jnp.float64) - K64)))
        print(f"| {base} | {'yes' if closed else 'no (naive fallback)'} "
              f"| {err:.1e} |")


if __name__ == "__main__":
    main()
