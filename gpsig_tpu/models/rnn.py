"""Masked LSTM/GRU sequence encoders (flax) for the GP-RNN hybrids.

The reference feeds Keras ``Masking -> LSTM/GRU`` hidden-state sequences into
a signature-kernel SVGP (`benchmarks/models/train_gpsigrnn.py:47-92`) or the
final hidden state into an RBF SVGP (`benchmarks/models/train_gprnn.py`).
TPU-native version: a flax scan over time with explicit masking (timesteps
whose features are all equal to the mask value are skipped — the carry
passes through unchanged, exactly Keras ``Masking`` semantics), jit/pjit
friendly with static shapes.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedRNN(nn.Module):
    """Recurrent encoder over (N, L, d) zero-padded sequences.

    Attributes:
      hidden_dim: state size H.
      cell_type: 'lstm' | 'gru'.
      return_sequences: if True, returns (N, L, H) hidden-state sequences
        (masked steps carry the previous state); else the last valid state
        (N, H).
      mask_value: timesteps where all features equal this are masked.
    """

    hidden_dim: int
    cell_type: str = "lstm"
    return_sequences: bool = True
    mask_value: float = 0.0

    @nn.compact
    def __call__(self, X):
        N, L, d = X.shape
        if self.cell_type == "lstm":
            cell = nn.OptimizedLSTMCell(self.hidden_dim)
        elif self.cell_type == "gru":
            cell = nn.GRUCell(self.hidden_dim)
        else:
            raise ValueError(f"unknown cell_type {self.cell_type!r}")

        mask = jnp.any(X != self.mask_value, axis=-1)  # (N, L)

        scan = nn.scan(
            lambda c, carry, xs: _masked_step(c, carry, xs),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1, out_axes=1,
        )
        carry = cell.initialize_carry(jax.random.PRNGKey(0), (N, d))
        # carry dtype must match the promoted step dtype (e.g. f64 inputs)
        carry = jax.tree.map(lambda c: c.astype(X.dtype), carry)
        carry, hs = scan(cell, carry, (X, mask))
        if self.return_sequences:
            return hs  # (N, L, H)
        # last valid state: hs holds the carried state at every step, so the
        # final step already carries the last unmasked output
        return hs[:, -1, :]


def _masked_step(cell, carry, xs):
    x_t, m_t = xs  # (N, d), (N,)
    new_carry, y = cell(carry, x_t)
    m = m_t[:, None]

    def keep(new, old):
        return jnp.where(m, new, old)

    carry = jax.tree.map(keep, new_carry, carry)
    # masked steps repeat the previous output (the carried hidden state is
    # exactly the masked y for both cell types) -> signature-invariant
    # padding for the downstream signature kernel
    y = carry[1] if isinstance(carry, tuple) else carry
    return carry, y
