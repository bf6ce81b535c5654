"""Sequences-in sequence parallelism for long time series.

The third long-L strategy (next to host mean-pooling and the low-rank
feature path, cf. SURVEY §2.4/§5): shard the TIME axis of the sequences
over a device mesh and let each device build only its own stripe of every
increment Gram inside ``shard_map`` — the (L, L) Gram never exists on any
single device, and the level recursion carries exact per-chunk prefix
states across the mesh (XLA collectives over ICI on real hardware).

The reference has no distributed anything (SURVEY §2.4); this is the
rebuild's flagship new capability.  Runs here on a virtual 8-device CPU
mesh; on TPU pods the same code spans real chips.

Run: python examples/seq_parallel_long_sequences.py
"""

import os
import sys

# force the CPU platform BEFORE jax initializes (the ambient environment
# may pin a single-chip TPU platform, under which no 8-device mesh exists)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

import jax

# the env var alone is not enough when the interpreter pre-imports jax
# (site customization); the config API always wins
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpsig_tpu import SVGP, kernels, likelihoods, utils as gp_utils
from gpsig_tpu.parallel import seq_parallel


def main():
    avail = jax.devices("cpu")
    # largest power of two <= available: the demo's L (256) then always
    # divides evenly into the time chunks
    C = 1 << (len(avail[:8]).bit_length() - 1)
    devices = np.asarray(avail[:C])
    print(f"time mesh over {C} devices")

    # long sequences sharded across the time mesh (sized for the CPU-mesh
    # demo; on a pod, L scales with chips x per-chip HBM)
    N, L, d = 8, 256, 3
    rng = np.random.RandomState(0)
    X = np.cumsum(rng.randn(N, L, d).astype(np.float32), axis=1) / np.sqrt(L)
    y = rng.randint(0, 2, N)

    kern = kernels.SignatureRBF(
        d, 3, lengthscales=gp_utils.suggest_initial_lengthscales(X)
    )
    params = kern.init_params()

    # ---- Kdiag / K from time-sharded sequences --------------------------
    seq_mesh = Mesh(devices, ("seq",))
    X_sh = jax.device_put(
        jnp.asarray(X), NamedSharding(seq_mesh, P(None, "seq", None))
    )
    shard_L = X_sh.addressable_shards[0].data.shape[1]
    print(f"each device holds an (N, {shard_L}, {d}) time stripe of X")

    diag = seq_parallel.kernel_seq_diag_sp(
        kernels.SignatureRBF(d, 3, normalization=False), params,
        seq_mesh, X_sh,
    )
    print("SP Kdiag (unnormalized):", np.asarray(diag[:4]).round(4), "...")

    # full normalized Gram with BOTH time axes chunked on a 2-D time mesh
    # adapt the 2-D time mesh to however many devices actually exist
    # (a pre-set host_platform_device_count or pre-initialized backend can
    # leave fewer than 8)
    rows = 2 if C % 2 == 0 and C >= 4 else 1
    mesh2 = Mesh(devices.reshape(rows, C // rows), ("seq1", "seq2"))
    Xa = jax.device_put(
        jnp.asarray(X), NamedSharding(mesh2, P(None, "seq1", None))
    )
    K_sp = seq_parallel.kernel_K_sp(kern, params, mesh2, Xa)
    K_ref = kern.K(params, jnp.asarray(X))  # single-device check
    err = float(jnp.max(jnp.abs(K_sp - K_ref)))
    print(f"SP K == single-device K: max|err| {err:.2e}")
    assert err < 1e-4

    # ---- long-L SVGP training over the ('seq',) mesh --------------------
    Z = gp_utils.suggest_initial_inducing_tensors(
        X, 3, 8, labels=y, increments=True, seed=0
    )
    ind = seq_parallel.SPInducingTensors(Z, 3, seq_mesh, increments=True)
    model = SVGP(kern, ind, likelihoods.Bernoulli(), num_latent=1,
                 num_data=N)
    mp = jax.tree.map(lambda v: jnp.asarray(v, jnp.float32),
                      model.init_params())
    Y = jnp.asarray(y[:, None], jnp.float32)
    opt = optax.nadam(1e-2)
    state = opt.init(mp)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(model.loss)(p, X_sh, Y)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    for it in range(6):
        mp, state, loss = step(mp, state)
        if it % 2 == 0:
            print(f"  SP ELBO step {it}: loss {float(loss):.4f}")
    print("long-L SVGP training over the time mesh: OK")

    # ---- same thing with inducing SEQUENCES ----------------------------
    Zs = gp_utils.suggest_initial_inducing_sequences(X, 8, 6, seed=0)
    ind_seq = seq_parallel.SPInducingSequences(Zs, 3, seq_mesh)
    model_seq = SVGP(kern, ind_seq, likelihoods.Bernoulli(), num_latent=1,
                     num_data=N)
    mp2 = jax.tree.map(lambda v: jnp.asarray(v, jnp.float32),
                       model_seq.init_params())
    loss_seq = float(jax.jit(model_seq.loss)(mp2, X_sh, Y))
    print(f"SPInducingSequences ELBO at init: {-loss_seq:.4f} "
          "(short Z local, Kzx carried over the time chunks)")


if __name__ == "__main__":
    main()
