"""Ablation profile of the SVGP ELBO training step on the real chip.

Produces the step-time attribution recorded in PERF.md (run on TPU:
``python benchmarks/profile_svgp.py``).  Attributes step time by
surgically disabling pieces (all timed in ONE process, unrolled reps
inside one jit dispatch per the tunnel timing rules):

  full      — the production step (fused Pallas covariances)
  fwd       — ELBO forward only (no grad/optimizer): backward share
  nodiag    — Kxx-diag leg replaced by constants: diag-leg share
  nolik     — MultiClass GH-100 quadrature replaced by a cheap Gaussian
              likelihood-like expectation: quadrature share
  nokl      — gauss_kl removed
  covs      — only the fused Kuu_Kuf_Kff covariances + sum (fwd, no linalg)
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from gpsig_tpu import (
    SVGP, InducingTensors, kernels, likelihoods, utils as gp_utils,
)

rng = np.random.RandomState(0)
N, L, d, M, n_ind, batch, C = 2000, 93, 14, 4, 500, 50, 10
X = rng.randn(N, L, d).astype(np.float32)
y = rng.randint(0, C, N)

Z = gp_utils.suggest_initial_inducing_tensors(
    X, M, n_ind, labels=y, increments=True, seed=0
)
ls = gp_utils.suggest_initial_lengthscales(X, 1000)
kern = kernels.SignatureRBF(d, M, lengthscales=ls)
model = SVGP(kern, InducingTensors(Z, M, increments=True),
             likelihoods.MultiClass(C), num_latent=C, num_data=N)
params = jax.tree.map(lambda v: jnp.asarray(v, jnp.float32),
                      model.init_params())
opt = optax.nadam(1e-3)
state = opt.init(params)
Xd = jnp.asarray(X)
Yd = jnp.asarray(y[:, None], jnp.float32)

reps = 10


def timed(make_body):
    @jax.jit
    def run(p, s):
        outs = []
        for i in range(reps):
            xb = jax.lax.dynamic_slice_in_dim(Xd, i * batch, batch)
            yb = jax.lax.dynamic_slice_in_dim(Yd, i * batch, batch)
            p, s, o = make_body(p, s, xb, yb)
            outs.append(o)
        return p, s, jnp.stack(outs)

    p, s, o = run(params, state)
    float(o[0])
    t0 = time.perf_counter()
    p, s, o = run(p, s)
    np.asarray(o)
    return (time.perf_counter() - t0) / reps


def step_body(loss_fn):
    def body(p, s, xb, yb):
        loss, g = jax.value_and_grad(loss_fn)(p, xb, yb)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, loss
    return body


def fwd_body(loss_fn):
    def body(p, s, xb, yb):
        return p, s, loss_fn(p, xb, yb)
    return body


results = {}

def record(name, t):
    results[name] = t
    print(f"{name:12s} {t*1e3:8.2f} ms  ({1/t:6.1f}/s)", flush=True)

# full production step
record("full_step", timed(step_body(model.loss)))
record("fwd_only", timed(fwd_body(model.loss)))

# diag leg ablation: monkeypatch the Kxx-diag to constants
orig_diag = kernels.SignatureKernel._K_seq_diag
def const_diag(self, cp, Xs):
    return jnp.ones((self.num_levels + 1, Xs.shape[0]), Xs.dtype)
kernels.SignatureKernel._K_seq_diag = const_diag
record("step_nodiag", timed(step_body(model.loss)))
kernels.SignatureKernel._K_seq_diag = orig_diag

# likelihood quadrature ablation: surrogate cheap likelihood
class _CheapLik:
    def variational_expectations(self, fm, fv, yb):
        return -0.5 * jnp.sum(jnp.square(fm) + fv, axis=-1, keepdims=True)
model_nolik = SVGP(kern, model.ind, _CheapLik(), num_latent=C, num_data=N)
record("step_nolik", timed(step_body(model_nolik.loss)))

# covariance-only forward (no conditional/KL/likelihood)
def covs_only(p, xb, yb):
    Kzz, Kzx, Kxx = model.ind.Kuu_Kuf_Kff(
        p["ind"], model.kern, p["kern"], xb, jitter=1e-6
    )
    return jnp.sum(Kzz) + jnp.sum(Kzx) + jnp.sum(Kxx)
record("covs_fwd", timed(fwd_body(covs_only)))

# covariances + backward
def covs_step(p, s, xb, yb):
    loss, g = jax.value_and_grad(covs_only)(p, xb, yb)
    u, s = opt.update(g, s, p)
    return optax.apply_updates(p, u), s, loss
record("covs_step", timed(covs_step))

print(f"diag leg share:    {(results['full_step']-results['step_nodiag'])*1e3:6.2f} ms")
print(f"quadrature share:  {(results['full_step']-results['step_nolik'])*1e3:6.2f} ms")
print(f"backward share:    {(results['full_step']-results['fwd_only'])*1e3:6.2f} ms")
print(f"linalg+lik share:  {(results['full_step']-results['covs_step'])*1e3:6.2f} ms")
