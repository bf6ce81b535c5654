"""Per-base f32 accuracy of the signature-kernel Gram: fast path vs naive.

VERDICT r4 item 3: the earlier version of this harness measured every base
at 3.3e-4 — the shared normalization floor — because its inputs (unit-scale
increments, unit lengthscales) never reached the catastrophic-cancellation
regime the closed-form increment algebra exists for.  This version drives
both dispatch paths **through the public ``K()`` API** (post r4 item 2 the
capability-based dispatch routes every closed-form base to the blocked
cancellation-free path; ``fused='off'`` pins the reference-shaped graph,
naive second differences of a monolithic base Gram,
`signature_algs.py:26`) in the regime the README's 8.7e-3 warning
describes: data-scaled random-walk paths (coordinates grow like sqrt(t),
increments stay O(1) — exactly what `preprocessing.tabulate` feeds the
flagship benchmarks) with *suggested* lengthscales
(`utils.suggest_initial_lengthscales`, the reference's
`benchmarks/models/train_gpsig.py:63` heuristic), L >= 512.

There the base-Gram entries sit near the top of their range while adjacent
columns differ by O(increment/path-scale) — the second difference loses
the ~3 digits that separate the two paths.

Run on CPU (needs f64 for the oracle):
    PYTHONPATH=. JAX_PLATFORMS=cpu python benchmarks/accuracy_bases.py \
        [--L 512] [--N 6] [--levels 4] [--regime flagship|smooth]

For the production-target table, run the f32 legs on the chip (f64 oracle
stays on the host CPU backend):
    PYTHONPATH=.:/root/.axon_site JAX_PLATFORMS=axon,cpu \
        python benchmarks/accuracy_bases.py --f32-backend tpu
"""

import argparse

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from gpsig_tpu import kernels, utils as gp_utils  # noqa: E402
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
    ap.add_argument("--regime", choices=("flagship", "smooth"),
                    default="flagship",
                    help="flagship: data-scaled random walks + suggested "
                         "lengthscales (the catastrophic regime); smooth: "
                         "unit-scale paths (the old table's floor regime)")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    walk = rng.randn(args.N, args.L, args.d).cumsum(axis=1)
    if args.regime == "flagship":
        # raw random-walk scale: coordinates ~ sqrt(L), increments ~ 1 —
        # the shape/scale `preprocessing.tabulate` + benchmark streams have
        X = walk
        ls = gp_utils.suggest_initial_lengthscales(
            X.astype(np.float32), 1000
        )
    else:
        X = walk / np.sqrt(args.L)
        ls = np.ones(args.d)

    cpu = jax.devices("cpu")[0]
    f32_dev = jax.devices("tpu")[0] if args.f32_backend == "tpu" else cpu
    tag = "TPU" if args.f32_backend == "tpu" else "CPU"

    print(f"regime={args.regime}  lengthscales={np.round(ls, 3)}")
    print(f"| base | closed form | f32-on-{tag} fast path | f32-on-{tag} "
          f"naive (fused='off') | naive/fast |")
    print("|---|---|---|---|---|")
    for base in BASES:
        opts = {"Q": 2} if base.startswith("spectral") else {}
        kern = kernels.SignatureKernel(
            args.d, args.levels, base=base, base_options=opts,
            normalization=True, lengthscales=ls,
        )
        kern_naive = kernels.SignatureKernel(
            args.d, args.levels, base=base, base_options=opts,
            normalization=True, lengthscales=ls, fused="off",
        )
        p64 = kern.init_params()
        with jax.default_device(cpu):
            K64 = np.asarray(kern_naive.K(
                p64, jax.device_put(jnp.asarray(X), cpu)
            ))
        p32 = jax.device_put(
            jax.tree.map(lambda v: jnp.asarray(v, jnp.float32), p64), f32_dev)
        X32 = jax.device_put(jnp.asarray(X, jnp.float32), f32_dev)
        closed = gram_ops.increment_gram_fns(
            base, kern.constrain(p64))[0] is not None
        # PUBLIC API both legs: default dispatch (capability-based fast
        # path) vs the fused='off' reference-shaped graph
        K32_fast = jax.jit(lambda p, x, k=kern: k.K(p, x))(p32, X32)
        K32_naive = jax.jit(lambda p, x, k=kern_naive: k.K(p, x))(p32, X32)
        e_fast = float(np.max(np.abs(
            np.asarray(K32_fast).astype(np.float64) - K64)))
        e_naive = float(np.max(np.abs(
            np.asarray(K32_naive).astype(np.float64) - K64)))
        ratio = e_naive / max(e_fast, 1e-300)
        print(f"| {base} | {'yes' if closed else 'no (naive fallback)'} "
              f"| {e_fast:.1e} | {e_naive:.1e} | {ratio:.1f}x |")


if __name__ == "__main__":
    main()
