"""Masked LSTM/GRU sequence encoders (flax) for the GP-RNN hybrids.

The reference feeds Keras ``Masking -> LSTM/GRU`` hidden-state sequences into
a signature-kernel SVGP (`benchmarks/models/train_gpsigrnn.py:47-92`) or the
final hidden state into an RBF SVGP (`benchmarks/models/train_gprnn.py`).
TPU-native version: explicit fused gate weights with the *input projections
for every timestep hoisted out of the scan* — one (N*L, d) @ (d, G*H) MXU
matmul instead of L small per-step ones — then a `nn.scan` over time with
explicit masking (timesteps whose features are all equal to the mask value
are skipped: the carry passes through unchanged, exactly Keras ``Masking``
semantics), jit/pjit friendly with static shapes.

Dropout follows Keras recurrent-layer ``implementation=1`` semantics
(`train_gpsigrnn.py:54-60`: input dropout 0.25, recurrent dropout 0.05 when
``use_dropout``; Keras forces implementation=1 whenever recurrent dropout is
active): G *independent* inverted-dropout masks — one per gate (4 for LSTM's
i/f/c/o, 3 for GRU's z/r/h) — are sampled per *sequence* per call for the
inputs and another G for the recurrent state, each reused at every timestep.
``dropout`` masks the step inputs entering each gate's kernel,
``recurrent_dropout`` masks the hidden state entering each gate's recurrent
kernel (the stored carry itself stays unmasked).  Deterministic (no-op)
unless called with ``deterministic=False`` and a ``'dropout'`` rng.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _gate_masks(key, rate: float, n_gates: int, N: int, width: int, dtype):
    """(G, N, width) inverted-dropout masks, one independent mask per gate
    (Keras implementation=1), or None at rate 0."""
    if rate <= 0.0:
        return None
    keep = 1.0 - rate
    m = jax.random.bernoulli(key, keep, (n_gates, N, width))
    return m.astype(dtype) / keep


class MaskedRNN(nn.Module):
    """Recurrent encoder over (N, L, d) zero-padded sequences.

    Attributes:
      hidden_dim: state size H.
      cell_type: 'lstm' | 'gru'.
      return_sequences: if True, returns (N, L, H) hidden-state sequences
        (masked steps carry the previous state); else the last valid state
        (N, H).
      mask_value: timesteps where all features equal this are masked.
      dropout: input-dropout rate (per-gate per-sequence masks, constant
        over time).
      recurrent_dropout: dropout rate on the recurrent state entering each
        gate (per-gate per-sequence masks, constant over time).

    Weight layout mirrors Keras: fused ``kernel`` (d, G*H), orthogonal
    ``recurrent_kernel`` (H, G*H), ``bias`` (G*H) with the LSTM forget-gate
    slice initialized to 1 (unit_forget_bias).  Gate order: LSTM i|f|c|o,
    GRU z|r|h (reset_after=False recurrences: r gates the *state* entering
    the candidate's recurrent kernel, which is what per-gate recurrent
    dropout composes with).
    """

    hidden_dim: int
    cell_type: str = "lstm"
    return_sequences: bool = True
    mask_value: float = 0.0
    dropout: float = 0.0
    recurrent_dropout: float = 0.0

    @nn.compact
    def __call__(self, X, *, deterministic: bool = True):
        N, L, d = X.shape
        H = self.hidden_dim
        if self.cell_type == "lstm":
            G = 4
        elif self.cell_type == "gru":
            G = 3
        else:
            raise ValueError(f"unknown cell_type {self.cell_type!r}")

        def bias_init(key, shape, dtype=jnp.float32):
            b = jnp.zeros(shape, dtype)
            if self.cell_type == "lstm":  # unit forget bias (gate slot 1)
                b = b.at[H:2 * H].set(1.0)
            return b

        W = self.param("kernel", nn.initializers.xavier_uniform(), (d, G * H))
        U = self.param("recurrent_kernel", nn.initializers.orthogonal(),
                       (H, G * H))
        b = self.param("bias", bias_init, (G * H,))
        dt = jnp.promote_types(X.dtype, W.dtype)
        X = X.astype(dt)
        W, U, b = W.astype(dt), U.astype(dt), b.astype(dt)

        # padding mask from the RAW inputs (before dropout zeroes entries)
        mask = jnp.any(X != self.mask_value, axis=-1)  # (N, L)

        use_dropout = not deterministic and (
            self.dropout > 0.0 or self.recurrent_dropout > 0.0
        )
        in_masks = rec_masks = None
        if use_dropout:
            k_in, k_rec = jax.random.split(self.make_rng("dropout"))
            in_masks = _gate_masks(k_in, self.dropout, G, N, d, dt)
            rec_masks = _gate_masks(k_rec, self.recurrent_dropout, G, N, H, dt)

        # hoisted input projections: (N, L, G*H) in one MXU matmul (or G
        # gate-sized ones under per-gate input dropout)
        Wg = W.reshape(d, G, H)
        if in_masks is None:
            xp = jnp.einsum("nld,dgh->nlgh", X, Wg)
        else:
            xp = jnp.einsum("gnld,dgh->nlgh", X[None] * in_masks[:, :, None, :],
                            Wg)
        xp = xp + b.reshape(G, H)

        Ug = U.reshape(H, G, H)

        def recurrent(h, gates):
            """(N, H) -> (N, |gates|, H) per-gate recurrent projections,
            with per-gate recurrent-dropout masks on the state entering
            each gate's slice of the recurrent kernel."""
            Usel = Ug[:, gates]
            if rec_masks is None:
                return jnp.einsum("nh,hgo->ngo", h, Usel)
            return jnp.einsum("gnh,hgo->ngo", h[None] * rec_masks[gates],
                              Usel)

        if self.cell_type == "lstm":
            def cell_step(carry, xp_t):
                c, h = carry
                z = xp_t + recurrent(h, slice(0, 4))  # (N, 4, H)
                i = jax.nn.sigmoid(z[:, 0])
                f = jax.nn.sigmoid(z[:, 1])
                g = jnp.tanh(z[:, 2])
                o = jax.nn.sigmoid(z[:, 3])
                c_new = f * c + i * g
                h_new = o * jnp.tanh(c_new)
                return (c_new, h_new)

            carry0 = (jnp.zeros((N, H), dt), jnp.zeros((N, H), dt))
        else:
            def cell_step(carry, xp_t):
                h = carry
                rec = recurrent(h, slice(0, 2))  # (N, 2, H) for z, r
                zg = jax.nn.sigmoid(xp_t[:, 0] + rec[:, 0])
                r = jax.nn.sigmoid(xp_t[:, 1] + rec[:, 1])
                # candidate: r gates the (dropout-masked) state entering
                # the recurrent kernel (Keras reset_after=False, impl=1)
                h_h = h if rec_masks is None else h * rec_masks[2]
                rec_h = jnp.einsum("nh,ho->no", r * h_h, Ug[:, 2])
                hh = jnp.tanh(xp_t[:, 2] + rec_h)
                return zg * h + (1.0 - zg) * hh

            carry0 = jnp.zeros((N, H), dt)

        def step(carry, xs):
            xp_t, m_t = xs  # (N, G, H), (N,)
            new_carry = cell_step(carry, xp_t)
            m = m_t[:, None]

            def keep(new, old):
                return jnp.where(m, new, old)

            carry = jax.tree.map(keep, new_carry, carry)
            # masked steps repeat the previous output (the carried hidden
            # state is exactly the masked y for both cell types) ->
            # signature-invariant padding for the downstream sig kernel
            y = carry[1] if isinstance(carry, tuple) else carry
            return carry, y

        _, hs = jax.lax.scan(step, carry0,
                             (jnp.swapaxes(xp, 0, 1), mask.T))
        hs = jnp.swapaxes(hs, 0, 1)  # (N, L, H)
        if self.return_sequences:
            return hs
        # last valid state: hs holds the carried state at every step, so
        # the final step already carries the last unmasked output
        return hs[:, -1, :]
