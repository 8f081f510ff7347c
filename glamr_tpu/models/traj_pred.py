"""Trajectory predictor: LSTM CVAE mapping local body motion to global
root trajectory in the 11-D local heading representation.

Reference: traj_pred/models/traj_pred_vae.py. Architecture (demo config):

  context encoder  C = MLP -> 2x bi-LSTM -> MLP over joint positions
  data encoder     q(z | traj, C): traj in init-heading coords -> bi-LSTMs,
                   late context fusion, mean-pool
  learned prior    p(z | C) = MLP(mean-pool C)
  data decoder     per-frame MLP([z, C_t]) -> 11-D local traj, then
                   first-frame init injection and cumsum integration

TPU-native notes:
  * batch-first [B, T, D]; LSTMs are lax.scan'd cells
  * the reference's sequential seq_len-chunked multi-step inference
    (traj_pred_vae.py:508-519) is re-derived as a *parallel* batched
    decode: chunks only interact through a first-frame heading re-seed
    that depends on the previous chunk's raw output — which is itself
    chunk-local — so all chunks run batched and the seam fix is a
    vectorized post-step. Sequential loop eliminated entirely.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..transforms.heading import get_heading, heading_to_vec
from ..transforms.rotation import (
    quat_to_rot6d,
    quaternion_to_angle_axis,
    rot6d_to_quat,
)
from ..transforms.traj import (
    convert_traj_world2heading,
    traj_global2local_heading,
    traj_local2global_heading,
)
from .configs import TrajPredConfig
from .dist import Normal
from .nn import MLP, make_rnn


class TPContextEncoder(nn.Module):
    cfg: TrajPredConfig

    @nn.compact
    def __call__(self, joint_pos: jax.Array, lengths=None) -> jax.Array:
        """joint_pos: (B, T, 69) root-relative joints -> context (B, T, D).

        lengths (B,) — optional true lengths for ragged batches (stage-4
        span-rolled decode): the bi-LSTMs flip only the valid segment, so
        pad frames never leak into valid context (nn.LSTM lengths)."""
        c = self.cfg
        x = joint_pos
        if c.ctx_in_mlp is not None:
            x = MLP(c.ctx_in_mlp, c.mlp_htype, name="in_mlp")(x)
        for i in range(c.ctx_rnn_layers):
            x = make_rnn(c.ctx_rnn_type, c.ctx_rnn_hdim, c.ctx_rnn_bi_dir,
                         f"rnn{i}")(x, lengths)
        if c.ctx_out_mlp is not None:
            x = MLP(c.ctx_out_mlp, c.mlp_htype, name="out_mlp")(x)
        if c.ctx_fc is not None:
            x = nn.Dense(c.ctx_fc, name="fc")(x)
        return x


class TPDataEncoder(nn.Module):
    cfg: TrajPredConfig

    @nn.compact
    def __call__(self, traj_input: jax.Array, context: jax.Array) -> Normal:
        """traj_input: (B, T, Din) trajectory in the configured input rep."""
        c = self.cfg
        x = traj_input
        if c.enc_append_context == "early":
            x = jnp.concatenate([x, context], axis=-1)
        if c.enc_in_mlp is not None:
            x = MLP(c.enc_in_mlp, c.mlp_htype, name="in_mlp")(x)
        for i in range(c.enc_rnn_layers):
            x = make_rnn(c.enc_rnn_type, c.enc_rnn_hdim, c.enc_rnn_bi_dir, f"rnn{i}")(x)
        if c.enc_out_mlp is not None:
            x = MLP(c.enc_out_mlp, c.mlp_htype, name="out_mlp")(x)
        if c.enc_append_context == "late":
            x = jnp.concatenate([x, context], axis=-1)
            x = MLP(c.enc_fusion_mlp, c.mlp_htype, name="fusion_mlp")(x)
        x = jnp.mean(x, axis=1) if c.enc_pooling == "mean" else jnp.max(x, axis=1)
        params = nn.Dense(2 * c.nz, name="q_z_net")(x)
        return Normal.from_params(params)


class TPDataDecoder(nn.Module):
    cfg: TrajPredConfig

    @nn.compact
    def __call__(self, z: jax.Array, context: jax.Array, lengths=None) -> jax.Array:
        """z: (B, nz), context: (B, T, D) -> raw local traj (B, T, 11)."""
        c = self.cfg
        T = context.shape[1]
        z_tiled = jnp.broadcast_to(z[:, None, :], (z.shape[0], T, z.shape[-1]))
        x = jnp.concatenate([z_tiled, context], axis=-1)
        if c.dec_in_mlp is not None:
            x = MLP(c.dec_in_mlp, c.mlp_htype, name="in_mlp")(x)
        for i in range(c.dec_rnn_layers):
            x = make_rnn(c.dec_rnn_type, c.dec_rnn_hdim, c.dec_rnn_bi_dir,
                         f"rnn{i}")(x, lengths)
        if c.dec_out_mlp is not None:
            x = MLP(c.dec_out_mlp, c.mlp_htype, name="out_mlp")(x)
        return nn.Dense(c.traj_dim, name="out_fc")(x)


class TPPrior(nn.Module):
    cfg: TrajPredConfig

    @nn.compact
    def __call__(self, context: jax.Array, lengths=None) -> Normal:
        c = self.cfg
        if lengths is None:
            h = (jnp.mean(context, axis=1) if c.dec_pooling == "mean"
                 else jnp.max(context, axis=1))
        else:
            # masked pooling over the valid segment only
            m = (jnp.arange(context.shape[1])[None] < lengths[:, None])
            m = m[..., None].astype(context.dtype)
            if c.dec_pooling == "mean":
                h = (context * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
            else:
                neg = jnp.finfo(context.dtype).min
                h = jnp.where(m > 0, context, neg).max(1)
        if c.dec_prior_mlp is not None:
            h = MLP(c.dec_prior_mlp, c.mlp_htype, name="prior_mlp")(h)
        return Normal.from_params(nn.Dense(2 * c.nz, name="p_z_net")(h))


def apply_init_injection(
    raw: jax.Array,
    init_xy: Optional[jax.Array],
    init_heading: Optional[jax.Array],
) -> jax.Array:
    """Overwrite frame 0's absolute xy / heading-vec channels.

    raw: (B, T, 11). Defaults (when inits are None) follow the reference:
    xy = 0, heading vec = (0, 1) i.e. heading pi/2
    (traj_pred_vae.py:318-329)."""
    if init_xy is None:
        init_xy = jnp.zeros_like(raw[:, 0, :2])
    if init_heading is None:
        init_hv = jnp.broadcast_to(
            jnp.array([0.0, 1.0], raw.dtype), raw[:, 0, -2:].shape
        )
    else:
        init_hv = heading_to_vec(init_heading)
    first = jnp.concatenate(
        [init_xy, raw[:, 0, 2:-2], init_hv], axis=-1
    )
    return jnp.concatenate([first[:, None], raw[:, 1:]], axis=1)


class TrajPredVAE(nn.Module):
    """Top-level trajectory predictor CVAE."""

    cfg: TrajPredConfig

    def setup(self):
        self.context_encoder = TPContextEncoder(self.cfg)
        self.data_encoder = TPDataEncoder(self.cfg)
        self.data_decoder = TPDataDecoder(self.cfg)
        self.prior = TPPrior(self.cfg) if self.cfg.dec_learn_prior else None

    def _prior(self, context, lengths=None) -> Normal:
        if self.prior is not None:
            return self.prior(context, lengths)
        zeros = jnp.zeros((context.shape[0], self.cfg.nz), context.dtype)
        return Normal(mu=zeros, logvar=zeros)

    def encoder_input(self, trans, orient_q, local_traj):
        """Build the data-encoder input for the configured rep
        (traj_pred_vae.py:160-173)."""
        c = self.cfg
        if c.enc_input == "global_traj":
            orient = {
                "axis_angle": quaternion_to_angle_axis(orient_q),
                "6d": quat_to_rot6d(orient_q),
                "quat": orient_q,
            }[c.enc_orient_type]
            return jnp.concatenate([trans, orient], axis=-1)
        if c.enc_input == "init_heading_coord":
            oh, th = convert_traj_world2heading(orient_q, trans)
            orient = {
                "axis_angle": quaternion_to_angle_axis(oh),
                "6d": quat_to_rot6d(oh),
                "quat": oh,
            }[c.enc_orient_type]
            return jnp.concatenate([th, orient], axis=-1)
        # 'local_traj': frame 0 stores absolutes; copy frame 1's relative vals
        first = jnp.concatenate(
            [local_traj[:, 1, :2], local_traj[:, 0, 2:-2], local_traj[:, 1, -2:]],
            axis=-1,
        )
        return jnp.concatenate([first[:, None], local_traj[:, 1:]], axis=1)

    def __call__(self, joint_pos, trans, orient_q, rng=None) -> dict:
        """Training forward. joint_pos (B,T,69); trans (B,T,3); orient_q (B,T,4)."""
        c = self.cfg
        local_traj = traj_global2local_heading(
            trans, orient_q, local_orient_type=c.local_orient_type
        )
        context = self.context_encoder(joint_pos)
        q_dist = self.data_encoder(
            self.encoder_input(trans, orient_q, local_traj), context
        )
        p_dist = self._prior(context)
        if rng is not None:
            z = q_dist.sample(jax.random.normal(rng, q_dist.mu.shape, q_dist.mu.dtype))
        else:
            z = q_dist.mode()
        raw = self.data_decoder(z, context)
        # during training the GT local traj provides frame-0 absolutes
        first = jnp.concatenate(
            [local_traj[:, 0, :2], raw[:, 0, 2:-2], local_traj[:, 0, -2:]], axis=-1
        )
        out_local = jnp.concatenate([first[:, None], raw[:, 1:]], axis=1)
        out_trans, out_orient_q = traj_local2global_heading(
            out_local, local_orient_type=c.local_orient_type,
            deheading_local=c.deheading_local,
        )
        return {
            "out_local_traj": out_local,
            "out_raw": raw,
            "out_trans": out_trans,
            "out_orient_q": out_orient_q,
            "gt_local_traj": local_traj,
            "q_z_dist": q_dist,
            "p_z_dist": p_dist,
        }

    def decode(self, joint_pos, eps, init_xy=None, init_heading=None,
               lengths=None) -> dict:
        """Inference: prior sample (eps injection) -> decode -> integrate.

        joint_pos: (B, T, 69). eps: (B, nz) or (1, nz) broadcastable.
        lengths: (B,) optional true lengths — with ragged batches, valid
        frames decode exactly as if each sequence ran at its own length
        (the reference runs persons separately; this keeps the batched
        stage-4 decode equivalent)."""
        c = self.cfg
        context = self.context_encoder(joint_pos, lengths)
        p_dist = self._prior(context, lengths)
        z = p_dist.sample(jnp.broadcast_to(eps, p_dist.mu.shape))
        raw = self.data_decoder(z, context, lengths)
        out_local = apply_init_injection(raw, init_xy, init_heading)
        out_trans, out_orient_q = traj_local2global_heading(
            out_local, local_orient_type=c.local_orient_type,
            deheading_local=c.deheading_local,
        )
        return {
            "out_local_traj": out_local,
            "out_raw": raw,
            "out_trans": out_trans,
            "out_orient_q": out_orient_q,
        }

    def recon(self, joint_pos, trans, orient_q) -> dict:
        """Posterior-mode reconstruction (evaluation aid)."""
        out = self.__call__(joint_pos, trans, orient_q, rng=None)
        return out


# ---------------------------------------------------------------------------
# multi-step (chunked) inference — parallel across chunks
# ---------------------------------------------------------------------------

def predict_multi_step(
    model: TrajPredVAE,
    params,
    joint_pos: jax.Array,   # (B, T, 69)
    eps: jax.Array,         # (B, nz) latent injection (per sequence)
    init_xy: Optional[jax.Array] = None,
    init_heading: Optional[jax.Array] = None,
) -> dict:
    """Chunked decode with seam heading re-seed, batched over chunks.

    Equivalent to the reference's sequential chunk loop
    (traj_pred_vae.py:500-519): chunk boundaries only need the previous
    chunk's final local-orient heading, which is chunk-local — so chunks
    are decoded in one batched call and the seam fix is vectorized.
    """
    cfg = model.cfg
    B, T, D = joint_pos.shape
    L = cfg.seq_len
    nchunk = max(1, math.ceil(T / L))
    pad = nchunk * L - T
    jp = jnp.pad(joint_pos, ((0, 0), (0, pad), (0, 0)))
    chunks = jp.reshape(B * nchunk, L, D)
    eps_rep = jnp.repeat(jnp.broadcast_to(eps, (B, eps.shape[-1])), nchunk, axis=0)
    out = model.apply(params, chunks, eps_rep, method=TrajPredVAE.decode)
    raw = out["out_raw"].reshape(B, nchunk, L, -1)

    # chunk 0 frame 0: init injection; chunk c>0 frame 0: keep raw values but
    # re-seed d_heading from the previous chunk's last local-orient heading
    first0 = apply_init_injection(raw[:, 0], init_xy, init_heading)[:, 0]  # (B, 11)
    if nchunk > 1:
        prev_last_orient = raw[:, :-1, -1, 3:-2]                     # (B, nchunk-1, 6)
        seam_heading = get_heading(rot6d_to_quat(prev_last_orient))  # (B, nchunk-1)
        seam_vec = heading_to_vec(seam_heading)
        firsts = jnp.concatenate([raw[:, 1:, 0, :-2], seam_vec], axis=-1)
        first_frames = jnp.concatenate([first0[:, None], firsts], axis=1)  # (B, nchunk, 11)
    else:
        first_frames = first0[:, None]
    local = jnp.concatenate([first_frames[:, :, None, :], raw[:, :, 1:]], axis=2)
    local = local.reshape(B, nchunk * L, -1)[:, :T]
    out_trans, out_orient_q = traj_local2global_heading(
        local, local_orient_type=cfg.local_orient_type,
        deheading_local=cfg.deheading_local,
    )
    return {
        "out_local_traj": local,
        "out_trans": out_trans,
        "out_orient_q": out_orient_q,
    }
