"""Flagship benchmark: 1k x 1k level-4 signature Gram over L=200 paths.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value          = Gram entries/sec of the normalized level-4 signature kernel
                 (SignatureRBF, d=3 + time channel semantics, f32, HIGHEST
                 matmul precision) via the blocked MXU path on one chip.
vs_baseline    = speedup over a reference-equivalent implementation measured
                 on the SAME chip: the reference's exact algorithmic shape
                 (monolithic (N,L,N,L) base Gram + per-level
                 multiply/exclusive-cumsum graph, `gpsig/signature_algs.py:8-35`)
                 run on a subset sized to fit memory, extrapolated per-entry.
                 The reference publishes no throughput numbers (BASELINE.md),
                 so same-chip reference-equivalent is the only measurable
                 baseline.  CONSERVATIVE by construction: the leg runs in f32
                 (the reference is f64 TF1-graph — strictly slower on any
                 hardware; TPU-emulated f64 would inflate the ratio ~100x),
                 and it benefits from XLA fusion the TF1 graph never had.
                 Numerical agreement with an f64 run is reported inline.

Usage: python bench.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small shapes (CI smoke), not the headline number")
    ap.add_argument("--block-size", type=int, default=16)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)  # for the f64 baseline leg

    import jax.numpy as jnp

    from gpsig_tpu import kernels

    if args.quick:
        N, L, d, M, reps = 64, 50, 3, 4, 2
        N_ref = 32
    else:
        N, L, d, M, reps = 1000, 200, 3, 4, 3
        N_ref = 64

    rng = np.random.RandomState(0)
    X = jnp.asarray((rng.randn(N, L, d) / np.sqrt(L)).astype(np.float32))

    kern = kernels.SignatureRBF(d, M, lengthscales=np.ones(d))
    params = kern.init_params()

    # Timing notes for this environment (axon tunnel to the chip):
    # - each jit dispatch carries ~0.5s tunnel overhead and identical inputs
    #   are memoized, so reps run INSIDE one jit over eps-shifted inputs;
    # - block_until_ready does not synchronize through the tunnel; a scalar
    #   checksum transfer is the sync point.
    def timed(fn, x, n_entries, reps):
        def body(eps):
            out = fn(x + eps)
            return jnp.sum(out), jnp.any(~jnp.isfinite(out))

        run = jax.jit(
            lambda xs: jax.lax.map(lambda e: body(e), xs)
        )
        eps = jnp.asarray(
            np.linspace(0, 1e-6, reps, dtype=np.float32)
        )
        sums, bad = run(eps)  # compile
        float(sums[0])
        t0 = time.perf_counter()
        sums, bad = run(eps + np.float32(3e-6))
        checks = np.asarray(sums)
        t = (time.perf_counter() - t0) / reps
        assert not bool(np.any(np.asarray(bad))), "non-finite Gram"
        assert np.all(np.isfinite(checks))
        return n_entries / t

    entries_per_sec = timed(
        lambda x: kern.K_blocked(params, x, block_size=args.block_size),
        X, N * N, reps,
    )

    # --- reference-equivalent baseline (same chip, f32, unblocked graph) ---
    X_ref = X[:N_ref]
    ref_entries_per_sec = timed(
        lambda x: kern.K(params, x), X_ref, N_ref * N_ref, 2
    )
    K = jax.jit(lambda x: kern.K_blocked(params, x,
                                         block_size=args.block_size))(X)

    # numerical agreement of the fast path vs an f64 run of the same subset
    X64 = jnp.asarray(np.asarray(X_ref, dtype=np.float64))
    params64 = jax.tree.map(lambda v: jnp.asarray(v, jnp.float64), params)
    max_err = float(
        jax.jit(
            lambda p, x: jnp.max(
                jnp.abs(K[:N_ref, :N_ref] - kern.K(p, x).astype(jnp.float32))
            )
        )(params64, X64)
    )

    result = {
        "metric": f"sig-gram entries/sec (N={N}, L={L}, M={M}, f32, 1 chip; "
                  f"fast-vs-ref max|err|={max_err:.1e})",
        "value": round(entries_per_sec, 1),
        "unit": "entries/sec",
        "vs_baseline": round(entries_per_sec / ref_entries_per_sec, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
