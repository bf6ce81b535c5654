"""Masked LSTM/GRU sequence encoders (flax) for the GP-RNN hybrids.

The reference feeds Keras ``Masking -> LSTM/GRU`` hidden-state sequences into
a signature-kernel SVGP (`benchmarks/models/train_gpsigrnn.py:47-92`) or the
final hidden state into an RBF SVGP (`benchmarks/models/train_gprnn.py`).
TPU-native version: a flax scan over time with explicit masking (timesteps
whose features are all equal to the mask value are skipped — the carry
passes through unchanged, exactly Keras ``Masking`` semantics), jit/pjit
friendly with static shapes.

Dropout follows Keras recurrent-layer semantics
(`train_gpsigrnn.py:54-60`: input dropout 0.25, recurrent dropout 0.05 when
``use_dropout``): one inverted-dropout mask is sampled per *sequence* per
call and reused at every timestep — ``dropout`` masks the step inputs,
``recurrent_dropout`` masks the hidden state fed into the cell's recurrent
connections (the stored carry itself stays unmasked).  Deterministic (no-op)
unless called with ``deterministic=False`` and a ``'dropout'`` rng.
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
      dropout: input-dropout rate (per-sequence mask, constant over time).
      recurrent_dropout: dropout rate on the recurrent state entering the
        cell (per-sequence mask, constant over time).
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
        if self.cell_type == "lstm":
            cell = nn.OptimizedLSTMCell(self.hidden_dim)
        elif self.cell_type == "gru":
            cell = nn.GRUCell(self.hidden_dim)
        else:
            raise ValueError(f"unknown cell_type {self.cell_type!r}")

        # padding mask from the RAW inputs (before dropout zeroes entries)
        mask = jnp.any(X != self.mask_value, axis=-1)  # (N, L)

        use_dropout = not deterministic and (
            self.dropout > 0.0 or self.recurrent_dropout > 0.0
        )
        rec_mask = None
        if use_dropout:
            key = self.make_rng("dropout")
            k_in, k_rec = jax.random.split(key)
            if self.dropout > 0.0:
                keep = 1.0 - self.dropout
                in_mask = jax.random.bernoulli(
                    k_in, keep, (N, d)
                ).astype(X.dtype) / keep
                X = X * in_mask[:, None, :]
            if self.recurrent_dropout > 0.0:
                keep_r = 1.0 - self.recurrent_dropout
                rec_mask = jax.random.bernoulli(
                    k_rec, keep_r, (N, self.hidden_dim)
                ).astype(X.dtype) / keep_r

        scan = nn.scan(
            lambda c, carry, xs: _masked_step(c, carry, xs, rec_mask),
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


def _masked_step(cell, carry, xs, rec_mask=None):
    x_t, m_t = xs  # (N, d), (N,)
    if rec_mask is None:
        cell_in = carry
    elif isinstance(carry, tuple):
        # LSTM carry (c, h): recurrent dropout masks the h entering the
        # gates (Keras semantics); the cell state c is untouched
        cell_in = (carry[0], carry[1] * rec_mask)
    else:
        cell_in = carry * rec_mask
    new_carry, y = cell(cell_in, x_t)
    m = m_t[:, None]

    def keep(new, old):
        return jnp.where(m, new, old)

    carry = jax.tree.map(keep, new_carry, carry)
    # masked steps repeat the previous output (the carried hidden state is
    # exactly the masked y for both cell types) -> signature-invariant
    # padding for the downstream signature kernel
    y = carry[1] if isinstance(carry, tuple) else carry
    return carry, y
