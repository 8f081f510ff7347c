"""NN building blocks for the GLAMR CVAEs (flax.linen).

Parametrizations deliberately mirror the reference's torch modules
(lib/models/mlp.py, rnn.py, pos_encoding.py and torch's post-LN
TransformerEncoder/DecoderLayer) so that reference Lightning checkpoints
can be ported weight-for-weight, while the execution is TPU-native:

  * batch-first [B, T, D] layout (no time-major transposes)
  * LSTMs as lax.scan over an optimized cell (bi-dir = two scans), not a
    Python per-timestep loop (the reference's hot loop B)
  * attention masking is "True = masked out" (torch key_padding_mask
    semantics), with an all-masked-row guard so padded windows can't NaN
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = jnp.dtype


class MLP(nn.Module):
    """Plain MLP with configurable activation (reference: mlp.py:9-41)."""

    hidden_dims: Sequence[int]
    activation: str = "relu"

    @property
    def out_dim(self) -> int:
        return self.hidden_dims[-1]

    @nn.compact
    def __call__(self, x):
        act = {"relu": nn.relu, "tanh": jnp.tanh, "sigmoid": nn.sigmoid}[self.activation]
        for i, h in enumerate(self.hidden_dims):
            x = nn.Dense(h, name=f"fc{i}")(x)
            x = act(x)
        return x


class PositionalEncoding(nn.Module):
    """Sinusoidal ('original') or fourier PE with concat-fc or additive
    combination and optional learned per-position residual
    (reference: pos_encoding.py:6-82)."""

    enc_dim: int
    in_dim: Optional[int] = None
    enc_type: str = "original"
    max_freq: float = 10.0
    freq_scale: float = 0.1
    concat: bool = True
    learnable_pos_index: Optional[tuple] = None

    def pe_table(self, positions: jax.Array) -> jax.Array:
        """(T,) positions -> (T, enc_dim), interleaved sin/cos pairs."""
        pos = positions.astype(jnp.float32)[:, None]
        if self.enc_type == "original":
            mul = jnp.exp(
                jnp.arange(0, self.enc_dim, 2) * (-np.log(10000.0) / self.enc_dim)
            )
        elif self.enc_type == "fourier":
            num_freq = self.enc_dim // 2
            mul = jnp.exp(jnp.arange(num_freq) * (np.log(self.max_freq) / num_freq))
            mul = mul * self.freq_scale
        else:
            raise ValueError(f"unknown enc_type {self.enc_type}")
        pe = jnp.stack([jnp.sin(pos * mul), jnp.cos(pos * mul)], axis=-1)
        return pe.reshape(-1, self.enc_dim)

    @nn.compact
    def __call__(self, x: jax.Array, pos_offset: int = 0) -> jax.Array:
        """x: (B, T, D). Returns (B, T, enc_dim)."""
        T = x.shape[-2]
        pe = self.pe_table(jnp.arange(T) + pos_offset)
        if self.learnable_pos_index is not None:
            idx = jnp.asarray(self.learnable_pos_index, jnp.int32)
            res = self.param(
                "learned_pe_res", nn.initializers.zeros, (len(self.learnable_pos_index), self.enc_dim)
            )
            pe = pe.at[idx].add(res)
        pe = jnp.broadcast_to(pe, x.shape[:-1] + (self.enc_dim,))
        if self.concat:
            return nn.Dense(self.enc_dim, name="fc")(jnp.concatenate([x, pe], axis=-1))
        return x + pe


# ---------------------------------------------------------------------------
# attention / transformer (torch-compatible post-LN layers)
# ---------------------------------------------------------------------------

def _masked_softmax(logits: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """Softmax over the last axis with True=masked-out semantics and a guard:
    rows where every key is masked fall back to uniform attention instead of
    NaN (occurs only on fully-padded windows whose output is discarded)."""
    if mask is None:
        return jax.nn.softmax(logits, axis=-1)
    neg = jnp.finfo(logits.dtype).min
    masked = jnp.where(mask, neg, logits)
    all_masked = jnp.all(mask, axis=-1, keepdims=True)
    masked = jnp.where(all_masked, jnp.zeros_like(logits), masked)
    return jax.nn.softmax(masked, axis=-1)


class MultiHeadAttention(nn.Module):
    """Multi-head attention with torch-style joint head dims.

    key_padding_mask: (B, S) boolean, True = do not attend to that key.
    """

    d_model: int
    nhead: int

    @nn.compact
    def __call__(self, q, k, v, key_padding_mask=None):
        B, Tq, _ = q.shape
        S = k.shape[1]
        H = self.nhead
        hd = self.d_model // H

        def proj(x, name):
            return nn.Dense(self.d_model, name=name)(x).reshape(
                x.shape[0], x.shape[1], H, hd
            )

        qh = proj(q, "q_proj")
        kh = proj(k, "k_proj")
        vh = proj(v, "v_proj")
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(hd).astype(q.dtype)
        mask = None
        if key_padding_mask is not None:
            mask = key_padding_mask[:, None, None, :]  # (B, 1, 1, S)
            mask = jnp.broadcast_to(mask, (B, H, Tq, S))
        attn = _masked_softmax(logits, mask)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(B, Tq, self.d_model)
        return nn.Dense(self.d_model, name="out_proj")(out)


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer, torch nn.TransformerEncoderLayer semantics
    (self-attn -> add&norm -> FFN(relu) -> add&norm); dropout omitted at
    inference, applied stochastically in training via flax Dropout."""

    d_model: int
    nhead: int
    ff_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True):
        a = MultiHeadAttention(self.d_model, self.nhead, name="self_attn")(
            x, x, x, key_padding_mask
        )
        a = nn.Dropout(self.dropout)(a, deterministic=deterministic)
        x = nn.LayerNorm(name="norm1")(x + a)
        f = nn.Dense(self.ff_dim, name="linear1")(x)
        f = nn.relu(f)
        f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
        f = nn.Dense(self.d_model, name="linear2")(f)
        f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
        return nn.LayerNorm(name="norm2")(x + f)


class TransformerDecoderLayer(nn.Module):
    """Post-LN decoder layer: self-attn -> cross-attn(memory) -> FFN,
    each with add&norm. memory_key_padding_mask masks memory keys."""

    d_model: int
    nhead: int
    ff_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, memory, memory_key_padding_mask=None, deterministic=True):
        a = MultiHeadAttention(self.d_model, self.nhead, name="self_attn")(x, x, x)
        a = nn.Dropout(self.dropout)(a, deterministic=deterministic)
        x = nn.LayerNorm(name="norm1")(x + a)
        c = MultiHeadAttention(self.d_model, self.nhead, name="cross_attn")(
            x, memory, memory, memory_key_padding_mask
        )
        c = nn.Dropout(self.dropout)(c, deterministic=deterministic)
        x = nn.LayerNorm(name="norm2")(x + c)
        f = nn.Dense(self.ff_dim, name="linear1")(x)
        f = nn.relu(f)
        f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
        f = nn.Dense(self.d_model, name="linear2")(f)
        f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
        return nn.LayerNorm(name="norm3")(x + f)


class TransformerEncoder(nn.Module):
    d_model: int
    nhead: int
    ff_dim: int
    nlayer: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True):
        for i in range(self.nlayer):
            x = TransformerEncoderLayer(
                self.d_model, self.nhead, self.ff_dim, self.dropout, name=f"layer{i}"
            )(x, key_padding_mask, deterministic)
        return x


class TransformerDecoder(nn.Module):
    d_model: int
    nhead: int
    ff_dim: int
    nlayer: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, memory, memory_key_padding_mask=None, deterministic=True):
        for i in range(self.nlayer):
            x = TransformerDecoderLayer(
                self.d_model, self.nhead, self.ff_dim, self.dropout, name=f"layer{i}"
            )(x, memory, memory_key_padding_mask, deterministic)
        return x


# ---------------------------------------------------------------------------
# recurrent nets as scans (replaces the reference's per-timestep Python loop)
# ---------------------------------------------------------------------------

class LSTM(nn.Module):
    """(Bi-directional) LSTM over (B, T, D) via lax.scan.

    bi_dir splits out_dim across forward/backward passes like the
    reference RNN (rnn.py:5-61).

    lengths (B,) — optional true sequence lengths for ragged batches: the
    backward pass flips only the valid segment (flax seq_lengths), so
    outputs at valid frames are bit-identical to running each sequence at
    its own length (pad frames never leak through the backward state).
    Outputs at pad frames are unspecified; consumers mask them.
    """

    out_dim: int
    bi_dir: bool = True

    @nn.compact
    def __call__(self, x, lengths=None):
        hidden = self.out_dim // 2 if self.bi_dir else self.out_dim
        fwd = nn.RNN(nn.OptimizedLSTMCell(hidden, name="cell_f"), name="rnn_f")(
            x, seq_lengths=lengths)
        if not self.bi_dir:
            return fwd
        bwd = nn.RNN(nn.OptimizedLSTMCell(hidden, name="cell_b"), name="rnn_b")(
            x, reverse=True, keep_order=True, seq_lengths=lengths
        )
        return jnp.concatenate([fwd, bwd], axis=-1)


class GRU(nn.Module):
    out_dim: int
    bi_dir: bool = True

    @nn.compact
    def __call__(self, x, lengths=None):
        hidden = self.out_dim // 2 if self.bi_dir else self.out_dim
        fwd = nn.RNN(nn.GRUCell(hidden, name="cell_f"), name="rnn_f")(
            x, seq_lengths=lengths)
        if not self.bi_dir:
            return fwd
        bwd = nn.RNN(nn.GRUCell(hidden, name="cell_b"), name="rnn_b")(
            x, reverse=True, keep_order=True, seq_lengths=lengths)
        return jnp.concatenate([fwd, bwd], axis=-1)


def make_rnn(cell_type: str, out_dim: int, bi_dir: bool, name: str):
    cls = {"lstm": LSTM, "gru": GRU}[cell_type]
    return cls(out_dim, bi_dir, name=name)
