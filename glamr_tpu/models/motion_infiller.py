"""Motion infiller: transformer CVAE over masked SMPL body-pose sequences.

Given a pose sequence with occluded (masked) frames, samples plausible
complete motion. Architecture and semantics follow the reference CVAE
(motion_infiller/models/motion_infiller_vae.py):

  context encoder  C = TfEnc(in_pose)            masked self-attention
  data encoder     q(z | X, C)                   mu/logvar attention tokens
  learned prior    p(z | C)                      mu/logvar attention tokens
  data decoder     X' = TfDec(PE(z), C)          z tiled over the cur window

TPU-native differences:
  * batch-first [B, T, D]; no time-major transposes
  * long sequences: the sliding-window autoregressive loop
    (reference inference_multi_step, :618-632) is a lax.scan over window
    index with static shapes — one compiled program for any padded length
  * explicit PRNG keys; latent injection for stage-4 optimization is a
    (num_windows, nz) eps array threaded through the scan
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..transforms.rotation import angle_axis_to_rot6d, rot6d_to_angle_axis
from .configs import MotionInfillerConfig, TransformerSpec
from .dist import Normal
from .nn import MLP, PositionalEncoding, TransformerDecoder, TransformerEncoder


def _pe(spec: TransformerSpec, name: str, learnable_index=None) -> PositionalEncoding:
    return PositionalEncoding(
        enc_dim=spec.model_dim,
        enc_type=spec.pe_type,
        max_freq=spec.pe_max_freq,
        freq_scale=spec.pe_freq_scale,
        concat=spec.pe_concat,
        learnable_pos_index=learnable_index,
        name=name,
    )


class MFContextEncoder(nn.Module):
    """Encodes the (masked) input motion into per-frame context features
    (reference ContextEncoder: motion_infiller_vae.py:22-123)."""

    cfg: MotionInfillerConfig

    @nn.compact
    def __call__(self, in_pose: jax.Array, pad_mask: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        """in_pose: (B, T, pose_dim); pad_mask: (B, T) True = invisible."""
        c = self.cfg
        x = in_pose
        if c.rot_type == "6d":
            aa = x.reshape(x.shape[:-1] + (-1, 3))
            x = angle_axis_to_rot6d(aa).reshape(x.shape[:-1] + (-1,))
        if c.ctx_in_mlp is not None:
            x = MLP(c.ctx_in_mlp, c.mlp_htype, name="in_mlp")(x)
        if c.ctx_in_fc is not None:
            x = nn.Dense(c.ctx_in_fc, name="in_fc")(x)
        x = _pe(c.ctx_transformer, "pos_enc")(x)
        x = TransformerEncoder(
            c.ctx_transformer.model_dim, c.ctx_transformer.nhead,
            c.ctx_transformer.ff_dim, c.ctx_transformer.nlayer,
            c.ctx_transformer.dropout, name="temporal_net",
        )(x, pad_mask, deterministic)
        return x


class MFDataEncoder(nn.Module):
    """Posterior q(z | X, C) with attention pooling onto learned mu/logvar
    query tokens (reference DataEncoder: motion_infiller_vae.py:126-249)."""

    cfg: MotionInfillerConfig

    @nn.compact
    def __call__(self, gt_pose_cur: jax.Array, context: jax.Array,
                 pad_mask: jax.Array, deterministic: bool = True) -> Normal:
        """gt_pose_cur: (B, T_cur, pose_dim) — GT pose on the cur window."""
        c = self.cfg
        spec = c.enc_transformer
        x = gt_pose_cur
        if c.rot_type == "6d":
            aa = x.reshape(x.shape[:-1] + (-1, 3))
            x = angle_axis_to_rot6d(aa).reshape(x.shape[:-1] + (-1,))
        x = nn.Dense(spec.model_dim, name="in_fc")(x)

        B = x.shape[0]
        mu_tok = self.param("mu_token", nn.initializers.normal(0.01), (spec.model_dim,))
        lv_tok = self.param("logvar_token", nn.initializers.normal(0.01), (spec.model_dim,))
        tokens = jnp.broadcast_to(
            jnp.stack([mu_tok, lv_tok])[None], (B, 2, spec.model_dim)
        )
        x = jnp.concatenate([tokens, x], axis=1)
        x = _pe(spec, "pos_enc")(x)
        x = TransformerDecoder(
            spec.model_dim, spec.nhead, spec.ff_dim, spec.nlayer, spec.dropout,
            name="temporal_net",
        )(x, context, pad_mask, deterministic)
        mu = nn.Dense(c.nz, name="q_z_mu_net")(x[:, 0])
        logvar = nn.Dense(c.nz, name="q_z_logvar_net")(x[:, 1])
        return Normal(mu=mu, logvar=logvar)


class MFPrior(nn.Module):
    """Learned prior p(z | C): a small transformer decoder pooling context
    onto mu/logvar tokens (reference DataDecoder prior branch :314-342)."""

    cfg: MotionInfillerConfig

    @nn.compact
    def __call__(self, context: jax.Array, pad_mask: jax.Array,
                 deterministic: bool = True) -> Normal:
        c = self.cfg
        spec = c.prior_transformer
        B = context.shape[0]
        mu_tok = self.param("mu_token", nn.initializers.normal(0.01), (spec.model_dim,))
        lv_tok = self.param("logvar_token", nn.initializers.normal(0.01), (spec.model_dim,))
        x = jnp.broadcast_to(jnp.stack([mu_tok, lv_tok])[None], (B, 2, spec.model_dim))
        x = _pe(spec, "pos_enc")(x)
        x = TransformerDecoder(
            spec.model_dim, spec.nhead, spec.ff_dim, spec.nlayer, spec.dropout,
            name="temporal_net",
        )(x, context, pad_mask, deterministic)
        mu = nn.Dense(c.nz, name="p_z_mu_net")(x[:, 0])
        logvar = nn.Dense(c.nz, name="p_z_logvar_net")(x[:, 1])
        return Normal(mu=mu, logvar=logvar)


class MFDataDecoder(nn.Module):
    """Likelihood decoder: z tiled over the cur window, cross-attending
    context (reference DataDecoder :345-434, minus the prior branch which
    lives in MFPrior)."""

    cfg: MotionInfillerConfig

    @nn.compact
    def __call__(self, z: jax.Array, context: jax.Array, pad_mask: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        """z: (B, nz) -> body pose deltas (B, cur_nframe, pose_dim)."""
        c = self.cfg
        spec = c.dec_transformer
        z_in = jnp.broadcast_to(z[:, None, :], (z.shape[0], c.cur_nframe, c.nz))
        pe = _pe(spec, "pos_enc")(
            z_in, pos_offset=c.past_nframe if c.dec_use_pos_offset else 0
        )
        x_ctx = context
        if context.shape[-1] != spec.model_dim:
            x_ctx = nn.Dense(spec.model_dim, name="in_fc")(context)
        x = TransformerDecoder(
            spec.model_dim, spec.nhead, spec.ff_dim, spec.nlayer, spec.dropout,
            name="temporal_net",
        )(pe, x_ctx, pad_mask, deterministic)
        if c.dec_out_mlp is not None:
            x = MLP(c.dec_out_mlp, c.mlp_htype, name="out_mlp")(x)
        return nn.Dense(c.pose_dim, name="out_fc")(x)


class MotionInfillerVAE(nn.Module):
    """Top-level module. Methods (selected via `method=` in .apply):

      __call__   training forward: returns dict with decoder output and
                 q/p distributions (losses live in train/losses.py)
      infer_step one window: context -> prior -> decode with given eps
      recon_step one window: context -> posterior mode -> decode
    """

    cfg: MotionInfillerConfig

    def setup(self):
        self.context_encoder = MFContextEncoder(self.cfg)
        self.data_encoder = MFDataEncoder(self.cfg)
        self.prior = MFPrior(self.cfg) if self.cfg.dec_learn_prior else None
        self.data_decoder = MFDataDecoder(self.cfg)

    def _out_body_pose(self, raw: jax.Array) -> jax.Array:
        """Decoder raw output -> axis-angle body pose (B, T_cur, 69)."""
        c = self.cfg
        x = raw
        if c.rot_type == "6d":
            sixd = x.reshape(x.shape[:-1] + (-1, 6))
            x = rot6d_to_angle_axis(sixd).reshape(x.shape[:-1] + (-1,))
        if c.pose_rep != "body":
            x = x[..., 3:]
        return x

    def _prior(self, context, pad_mask, deterministic=True) -> Normal:
        if self.prior is not None:
            return self.prior(context, pad_mask, deterministic)
        B = context.shape[0]
        zeros = jnp.zeros((B, self.cfg.nz), context.dtype)
        return Normal(mu=zeros, logvar=zeros)

    def __call__(self, in_body_pose, gt_body_pose, frame_mask, rng=None,
                 deterministic: bool = True) -> dict:
        """Training/recon forward over one full window (B, T=window_len, 69).

        frame_mask: (B, T) 1 = visible. Returns decoder output on the
        past+cur region with past frames passed through unchanged
        (reference :397-398)."""
        c = self.cfg
        pad_mask = frame_mask == 0  # True = invisible/masked
        context = self.context_encoder(in_body_pose, pad_mask, deterministic)
        q_dist = self.data_encoder(
            gt_body_pose[:, c.past_nframe: c.past_nframe + c.cur_nframe],
            context, pad_mask, deterministic,
        )
        p_dist = self._prior(context, pad_mask, deterministic)
        if rng is not None:
            z = q_dist.sample(jax.random.normal(rng, q_dist.mu.shape, q_dist.mu.dtype))
        else:
            z = q_dist.mode()
        raw = self.data_decoder(z, context, pad_mask, deterministic)
        out_cur = self._out_body_pose(raw)
        out = jnp.concatenate([in_body_pose[:, : c.past_nframe], out_cur], axis=1)
        return {
            "out_body_pose": out,          # (B, past+cur, 69)
            "out_raw": raw,                # decoder-space output on cur
            "q_z_dist": q_dist,
            "p_z_dist": p_dist,
        }

    def infer_step(self, in_body_pose, frame_mask, eps) -> jax.Array:
        """One sliding-window inference step: sample prior with given eps.

        in_body_pose: (B, W, 69) where W = window_len; frame_mask (B, W).
        Returns (B, past+cur, 69)."""
        c = self.cfg
        pad_mask = frame_mask == 0
        context = self.context_encoder(in_body_pose, pad_mask)
        p_dist = self._prior(context, pad_mask)
        z = p_dist.sample(eps)
        raw = self.data_decoder(z, context, pad_mask)
        out_cur = self._out_body_pose(raw)
        return jnp.concatenate([in_body_pose[:, : c.past_nframe], out_cur], axis=1)

    def recon_step(self, in_body_pose, gt_body_pose, frame_mask) -> jax.Array:
        """One window reconstruction (posterior mode)."""
        c = self.cfg
        pad_mask = frame_mask == 0
        context = self.context_encoder(in_body_pose, pad_mask)
        q_dist = self.data_encoder(
            gt_body_pose[:, c.past_nframe: c.past_nframe + c.cur_nframe],
            context, pad_mask,
        )
        raw = self.data_decoder(q_dist.mode(), context, pad_mask)
        out_cur = self._out_body_pose(raw)
        return jnp.concatenate([in_body_pose[:, : c.past_nframe], out_cur], axis=1)


# ---------------------------------------------------------------------------
# multi-window inference driver (pure function, jit-able)
# ---------------------------------------------------------------------------

def num_windows(cfg: MotionInfillerConfig, seq_len: int) -> int:
    return max(1, math.ceil((seq_len - cfg.past_nframe) / cfg.cur_nframe))


def num_latents(cfg: MotionInfillerConfig, seq_len: int) -> int:
    """Latent rows needed for a sequence — the shape of the motion latent
    optimized in stage 4 (reference get_latent :613-616)."""
    return num_windows(cfg, seq_len)


def infill_multi_step(
    model: MotionInfillerVAE,
    params,
    in_body_pose: jax.Array,    # (B, T, 69) masked input pose
    frame_mask: jax.Array,      # (B, T) 1 = visible
    eps: jax.Array,             # (num_windows, B, nz) latent injection
) -> jax.Array:
    """Sliding-window autoregressive infill as a lax.scan.

    Window i covers frames [i*cur, i*cur + window_len); its decoded
    past+cur block overwrites the input buffer so later windows condition
    on already-infilled motion; past frames of each window are forced
    visible (reference inference_multi_step :618-632). The final buffer
    *is* the stitched output (each frame is produced by exactly one
    window's cur region or passed through from the original past).
    """
    cfg = model.cfg
    B, T, D = in_body_pose.shape
    W = cfg.window_len
    nwin = num_windows(cfg, T)
    # pad so every window slice/update has static shape
    pad_to = cfg.past_nframe + nwin * cfg.cur_nframe + cfg.fut_nframe
    buf = jnp.pad(in_body_pose, ((0, 0), (0, pad_to - T), (0, 0)))
    mask = jnp.pad(frame_mask, ((0, 0), (0, pad_to - T)))  # padded frames invisible

    def step(carry, xs):
        buf = carry
        i, eps_i = xs
        sind = i * cfg.cur_nframe
        win = jax.lax.dynamic_slice_in_dim(buf, sind, W, axis=1)
        win_mask = jax.lax.dynamic_slice_in_dim(mask, sind, W, axis=1)
        # past frames condition on previously generated output: force visible
        forced = jnp.concatenate(
            [jnp.ones_like(win_mask[:, : cfg.past_nframe]),
             win_mask[:, cfg.past_nframe:]], axis=1,
        )
        out = model.apply(params, win, forced, eps_i, method=MotionInfillerVAE.infer_step)
        buf = jax.lax.dynamic_update_slice_in_dim(buf, out, sind, axis=1)
        return buf, None

    xs = (jnp.arange(nwin), eps)
    buf, _ = jax.lax.scan(step, buf, xs)
    return buf[:, :T]


def recon_multi_step(
    model: MotionInfillerVAE,
    params,
    in_body_pose: jax.Array,    # (B, T, 69) masked input pose
    gt_body_pose: jax.Array,    # (B, T, 69) ground truth
    frame_mask: jax.Array,      # (B, T)
) -> jax.Array:
    """Sliding-window posterior-mode reconstruction (the reference's
    inference(recon=True) multi-step path, motion_infiller_vae.py:643-667
    with recon mode) — same stitching scheme as infill_multi_step but
    each window decodes the posterior mode conditioned on GT."""
    cfg = model.cfg
    B, T, D = in_body_pose.shape
    W = cfg.window_len
    nwin = num_windows(cfg, T)
    pad_to = cfg.past_nframe + nwin * cfg.cur_nframe + cfg.fut_nframe
    buf = jnp.pad(in_body_pose, ((0, 0), (0, pad_to - T), (0, 0)))
    gt = jnp.pad(gt_body_pose, ((0, 0), (0, pad_to - T), (0, 0)))
    mask = jnp.pad(frame_mask, ((0, 0), (0, pad_to - T)))

    def step(carry, i):
        buf = carry
        sind = i * cfg.cur_nframe
        win = jax.lax.dynamic_slice_in_dim(buf, sind, W, axis=1)
        gt_win = jax.lax.dynamic_slice_in_dim(gt, sind, W, axis=1)
        win_mask = jax.lax.dynamic_slice_in_dim(mask, sind, W, axis=1)
        forced = jnp.concatenate(
            [jnp.ones_like(win_mask[:, : cfg.past_nframe]),
             win_mask[:, cfg.past_nframe:]], axis=1,
        )
        out = model.apply(params, win, gt_win, forced,
                          method=MotionInfillerVAE.recon_step)
        buf = jax.lax.dynamic_update_slice_in_dim(buf, out, sind, axis=1)
        return buf, None

    buf, _ = jax.lax.scan(step, buf, jnp.arange(nwin))
    return buf[:, :T]
