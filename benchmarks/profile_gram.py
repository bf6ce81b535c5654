"""Ablation profile of the fused signature-Gram kernel on the real chip.

Produces the headline-kernel decomposition recorded in the round-3 commit
messages and memory notes (run on TPU: ``python benchmarks/profile_gram.py``).
All variants are timed in ONE process with reps unrolled inside one jit
dispatch (the relay memoizes identical dispatches; separate processes
drift +10-30%).

Variants and what subtracting them isolates (N=1000, L=200, M=4 headline
shapes; measured round 3 on v5e):

  full_high     1.711 s  the production headline (rbf, split3)
  bf16_single   1.25 s   -> split3's two extra MXU pass-sets: ~0.48 s
  linear        1.07 s   -> rbf transcendentals + 3 extra hdots: ~0.66 s
  levels1       0.96 s   -> the whole level recursion: ~0.77 s
  lv1_linear    0.28 s   overhead + one K=5 hdot
  lv1_rbf_nodiff 0.40 s  + exp_accurate: ~0.13 s

Conclusions (see signature_pallas.py comments): the recursion is
dependency-bound (row-widening/unrolling don't help), the hdots are
output-area-bound at K=5, and the transcendental VPU work is near its
floor — the kernel is close to its structural limit on this hardware.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from gpsig_tpu.ops import signature_pallas as sp

N, L, d, M = 1000, 200, 3, 4
rng = np.random.RandomState(0)
X = jnp.asarray((rng.randn(N, L, d) / np.sqrt(L)).astype(np.float32))
reps = 3


def timed(name, fn):
    def body(eps_vec):
        return jnp.stack([jnp.sum(fn(X + e)) for e in eps_vec])

    run = jax.jit(body)
    eps = tuple(np.linspace(0, 1e-6, reps, dtype=np.float32))
    s = run(eps)
    float(s[0])
    best = np.inf
    for k in range(3):
        t0 = time.perf_counter()
        s = run(tuple(e + np.float32(3e-6) * (k + 1) for e in eps))
        np.asarray(s)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:16s} {best:7.3f} s  ({N * N / best / 1e3:7.1f}k entries/s)",
          flush=True)
    return best


def f(base="rbf", fm="high", lv=M, diff=True, bi=8):
    return lambda x: sp.fused_first_order_levels(
        x, num_levels=lv, base=base, difference=diff,
        block_i=bi, block_j=bi, fast_math=fm,
    )


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", "profile on the chip"
    t_full = timed("full_high", f())
    t_bf16 = timed("bf16_single", f(fm=True))
    t_lin = timed("linear", f(base="linear"))
    t_lv1 = timed("levels1", f(lv=1))
    timed("lv1_linear", f(base="linear", lv=1))
    timed("lv1_rbf_nodiff", f(lv=1, diff=False))
    print(f"split3 extra (full-bf16):      {t_full - t_bf16:6.3f} s")
    print(f"transcendental (full-linear):  {t_full - t_lin:6.3f} s")
    print(f"recursion (full-levels1):      {t_full - t_lv1:6.3f} s")
