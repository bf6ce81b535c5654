"""VERDICT r4 item 8: prove the TPU-exported serving artifact embeds the
fused Pallas path and matches the on-chip Predictor."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from gpsig_tpu import (
    SVGP, InducingTensors, kernels, likelihoods, serving,
    utils as gp_utils,
)

print("backend:", jax.default_backend(), flush=True)
assert jax.default_backend() == "tpu"

rng = np.random.RandomState(0)
N, L, d, M, nT, C = 64, 40, 6, 4, 100, 3
X = rng.randn(N, L, d).astype(np.float32)
y = rng.randint(0, C, N)
Z = gp_utils.suggest_initial_inducing_tensors(
    X, M, nT, labels=y, increments=True, seed=0
)
kern = kernels.SignatureRBF(d, M)
ind = InducingTensors(Z, M, increments=True)
model = SVGP(kern, ind, likelihoods.MultiClass(C), num_latent=C, num_data=N)
params = jax.tree.map(lambda v: jnp.asarray(v, jnp.float32),
                      model.init_params())

# 1) export from THIS TPU-backed process
exp = serving.export_predict(
    model, params, batch_size=16, seq_len=L, num_features=d, what="y",
)
mlir = exp.mlir_module()
has_custom = ("tpu_custom_call" in mlir) or ("mosaic" in mlir)
print("exported platforms:", exp.platforms, flush=True)
print("stablehlo contains mosaic/tpu_custom_call:", has_custom, flush=True)

# 2) round-trip through bytes
serving.save_exported(exp, "/tmp/gpsig_artifact.bin")
loaded = serving.load_exported("/tmp/gpsig_artifact.bin")

Xq = X[:16]
mu_art, var_art = loaded.call(params, jnp.asarray(Xq))

# 3) on-chip Predictor on the same request
pred = serving.Predictor(model, params, batch_buckets=[16], max_len=L)
mu_p, var_p = pred.predict_y(Xq)

err_mu = float(np.max(np.abs(np.asarray(mu_art) - np.asarray(mu_p))))
err_var = float(np.max(np.abs(np.asarray(var_art) - np.asarray(var_p))))
print(f"artifact vs Predictor: max|dmu|={err_mu:.3e} max|dvar|={err_var:.3e}",
      flush=True)
assert err_mu < 1e-6 and err_var < 1e-6

# 4) CPU-exported artifact for comparison: bakes the pure-XLA graph
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    # trace-time dispatch checks jax.default_backend(), still 'tpu' here;
    # force the XLA graph via the public knob instead
    kern_off = kernels.SignatureRBF(d, M, fused="off")
    model_off = SVGP(kern_off, ind, likelihoods.MultiClass(C),
                     num_latent=C, num_data=N)
    exp_off = serving.export_predict(
        model_off, params, batch_size=16, seq_len=L, num_features=d,
        what="y",
    )
has_custom_off = ("tpu_custom_call" in exp_off.mlir_module()
                  or "mosaic" in exp_off.mlir_module())
print("fused='off' artifact contains custom call:", has_custom_off,
      flush=True)
mu_off, var_off = exp_off.call(params, jnp.asarray(Xq))
err_off = float(np.max(np.abs(np.asarray(mu_off) - np.asarray(mu_p))))
print(f"XLA-graph artifact vs Predictor: max|dmu|={err_off:.3e}", flush=True)

# 5) latency A/B in ONE process (axon: eps-shift inputs, min-of-5)
def timed(fn, x):
    fn(params, x)  # warm
    best = np.inf
    for i in range(5):
        xi = x + np.float32(1e-6) * (i + 1)
        t0 = time.perf_counter()
        out = fn(params, xi)
        float(jnp.sum(out[0]))  # tunnel sync point
        best = min(best, time.perf_counter() - t0)
    return best

t_fused = timed(jax.jit(loaded.call), jnp.asarray(Xq))
t_off = timed(jax.jit(exp_off.call), jnp.asarray(Xq))
print(f"latency: fused artifact {t_fused*1e3:.1f} ms, "
      f"XLA-graph artifact {t_off*1e3:.1f} ms, "
      f"speedup {t_off/t_fused:.2f}x", flush=True)
print("PASS" if (has_custom and err_mu < 1e-6) else "FAIL")
