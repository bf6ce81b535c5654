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

The CPU numbers flatter the naive fallback: the host libm's exp is
~1-ulp, while the TPU VPU's f32 exp carries ~4e-6 *systematic* error
that the naive second difference accumulates across the (L-1)^2 level
sums.  For the table that reflects the production target, run the f32
legs on the chip (f64 oracle stays on the host CPU backend):
    PYTHONPATH=.:/root/.axon_site JAX_PLATFORMS=axon,cpu \
        python benchmarks/accuracy_bases.py --f32-backend tpu
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
    ap.add_argument("--f32-backend", choices=("default", "tpu"),
                    default="default")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    X = rng.randn(args.N, args.L, args.d).cumsum(axis=1) / np.sqrt(args.L)

    cpu = jax.devices("cpu")[0]
    f32_dev = jax.devices("tpu")[0] if args.f32_backend == "tpu" else cpu
    tag = "TPU" if args.f32_backend == "tpu" else "CPU"

    print(f"| base | closed form | f32-on-{tag} max abs err (L={args.L}, "
          f"normalized Gram) |")
    print("|---|---|---|")
    for base in BASES:
        opts = {"Q": 2} if base.startswith("spectral") else {}
        kern = kernels.SignatureKernel(
            args.d, args.levels, base=base, base_options=opts,
            normalization=True, fused="off",
        )
        p64 = kern.init_params()
        with jax.default_device(cpu):
            K64 = np.asarray(kern.K(p64, jax.device_put(jnp.asarray(X), cpu)))
        p32 = jax.device_put(
            jax.tree.map(lambda v: jnp.asarray(v, jnp.float32), p64), f32_dev)
        X32 = jax.device_put(jnp.asarray(X, jnp.float32), f32_dev)
        closed = gram_ops.increment_gram_fns(
            base, kern.constrain(p64))[0] is not None
        if closed:
            K32 = jax.jit(lambda p, x, k=kern: k.K_blocked(
                p, x, block_size=max(8, args.N)))(p32, X32)
        else:
            K32 = jax.jit(lambda p, x, k=kern: k.K(p, x))(p32, X32)
        err = float(np.max(np.abs(np.asarray(K32).astype(np.float64) - K64)))
        print(f"| {base} | {'yes' if closed else 'no (naive fallback)'} "
              f"| {err:.1e} |")


if __name__ == "__main__":
    main()
