"""Reference (PyTorch-Lightning) checkpoint -> flax parameter porting.

The flax modules were parametrized to mirror the reference architecture
1:1 (models/nn.py docstring), so porting is a pure renaming + transpose:

  torch nn.Linear  W (out,in), b         -> Dense {kernel=W.T, bias=b}
  torch MHA in_proj_weight (3E,E)        -> q/k/v Dense kernels (row-split)
  torch TransformerEncoder layers.{i}    -> layer{i} (post-LN, same order)
  torch TransformerDecoderLayer
        self_attn / multihead_attn       -> self_attn / cross_attn
  torch LSTMCell weight_ih (4H,in) rows
        [i,f,g,o], bias_ih+bias_hh       -> OptimizedLSTMCell i*/h* gates
  reference MLP affine_layers.{i}        -> fc{i}
  reference RNN rnn_f / rnn_b            -> rnn_f/rnn_b {cell: ...}

Reference module name sources: motion_infiller/models/motion_infiller_vae.py
(ContextEncoder :22, DataEncoder :126, DataDecoder :252 incl. the prior
branch :314-342 which lives in our separate MFPrior) and
traj_pred/models/traj_pred_vae.py (ContextEncoder :20, DataEncoder :95,
DataDecoder :202 incl. prior :265).
"""
from __future__ import annotations

import numpy as np

from .checkpoint import load_torch_state_dict, port_layernorm, port_linear


def port_mlp(sd: dict, prefix: str) -> dict:
    out = {}
    i = 0
    while f"{prefix}.affine_layers.{i}.weight" in sd:
        out[f"fc{i}"] = port_linear(sd, f"{prefix}.affine_layers.{i}")
        i += 1
    if i == 0:
        raise KeyError(f"no MLP layers under {prefix}")
    return out


def port_attention(sd: dict, prefix: str, d_model: int) -> dict:
    w = sd[f"{prefix}.in_proj_weight"]          # (3E, E)
    b = sd.get(f"{prefix}.in_proj_bias")
    qw, kw, vw = w[:d_model], w[d_model:2 * d_model], w[2 * d_model:]
    out = {}
    for name, wk in [("q_proj", qw), ("k_proj", kw), ("v_proj", vw)]:
        out[name] = {"kernel": np.ascontiguousarray(wk.T)}
    if b is not None:
        qb, kb, vb = b[:d_model], b[d_model:2 * d_model], b[2 * d_model:]
        out["q_proj"]["bias"] = qb
        out["k_proj"]["bias"] = kb
        out["v_proj"]["bias"] = vb
    out["out_proj"] = port_linear(sd, f"{prefix}.out_proj")
    return out


def port_encoder_layer(sd: dict, prefix: str, d_model: int) -> dict:
    return {
        "self_attn": port_attention(sd, f"{prefix}.self_attn", d_model),
        "linear1": port_linear(sd, f"{prefix}.linear1"),
        "linear2": port_linear(sd, f"{prefix}.linear2"),
        "norm1": port_layernorm(sd, f"{prefix}.norm1"),
        "norm2": port_layernorm(sd, f"{prefix}.norm2"),
    }


def port_decoder_layer(sd: dict, prefix: str, d_model: int) -> dict:
    return {
        "self_attn": port_attention(sd, f"{prefix}.self_attn", d_model),
        "cross_attn": port_attention(sd, f"{prefix}.multihead_attn", d_model),
        "linear1": port_linear(sd, f"{prefix}.linear1"),
        "linear2": port_linear(sd, f"{prefix}.linear2"),
        "norm1": port_layernorm(sd, f"{prefix}.norm1"),
        "norm2": port_layernorm(sd, f"{prefix}.norm2"),
        "norm3": port_layernorm(sd, f"{prefix}.norm3"),
    }


def port_transformer(sd: dict, prefix: str, nlayer: int, d_model: int,
                     decoder: bool = False) -> dict:
    port = port_decoder_layer if decoder else port_encoder_layer
    return {f"layer{i}": port(sd, f"{prefix}.layers.{i}", d_model)
            for i in range(nlayer)}


def port_lstm_cell(sd: dict, prefix: str) -> dict:
    """torch nn.LSTMCell -> flax OptimizedLSTMCell param dict."""
    w_ih = sd[f"{prefix}.weight_ih"]           # (4H, in), gate order i,f,g,o
    w_hh = sd[f"{prefix}.weight_hh"]           # (4H, H)
    b = sd[f"{prefix}.bias_ih"] + sd[f"{prefix}.bias_hh"]
    H = w_hh.shape[1]
    out = {}
    for gi, g in enumerate("ifgo"):
        s = slice(gi * H, (gi + 1) * H)
        out[f"i{g}"] = {"kernel": np.ascontiguousarray(w_ih[s].T)}
        out[f"h{g}"] = {"kernel": np.ascontiguousarray(w_hh[s].T), "bias": b[s]}
    return out


def port_gru_cell(sd: dict, prefix: str) -> dict:
    """torch nn.GRUCell -> flax GRUCell param dict.

    torch gate row order is (r, z, n); both use
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn)), so the mapping is
    exact: ir/iz/in get b_ih slices, hn gets b_hh's n slice, hr/hz have
    no bias in flax so b_hh's r/z slices are folded into b_ih (valid
    because r = sigma(W_ir x + b_ir + W_hr h + b_hr) is a plain sum).
    """
    w_ih = sd[f"{prefix}.weight_ih"]           # (3H, in)
    w_hh = sd[f"{prefix}.weight_hh"]           # (3H, H)
    b_ih = sd[f"{prefix}.bias_ih"]
    b_hh = sd[f"{prefix}.bias_hh"]
    H = w_hh.shape[1]
    out = {}
    for gi, g in enumerate("rzn"):
        s = slice(gi * H, (gi + 1) * H)
        i_bias = b_ih[s] if g == "n" else b_ih[s] + b_hh[s]
        out[f"i{g}"] = {"kernel": np.ascontiguousarray(w_ih[s].T),
                        "bias": i_bias}
        h = {"kernel": np.ascontiguousarray(w_hh[s].T)}
        if g == "n":
            h["bias"] = b_hh[s]
        out[f"h{g}"] = h
    return out


def port_rnn(sd: dict, prefix: str, bi_dir: bool = True) -> dict:
    cell_port = (port_lstm_cell if f"{prefix}.rnn_f.weight_ih" in sd and
                 sd[f"{prefix}.rnn_f.weight_ih"].shape[0] % 4 == 0 and
                 f"{prefix}.rnn_f.weight_hh" in sd and
                 sd[f"{prefix}.rnn_f.weight_ih"].shape[0]
                 == 4 * sd[f"{prefix}.rnn_f.weight_hh"].shape[1]
                 else port_gru_cell)
    out = {"cell_f": cell_port(sd, f"{prefix}.rnn_f")}
    if bi_dir:
        out["cell_b"] = cell_port(sd, f"{prefix}.rnn_b")
    return out


def _pe_params(sd: dict, prefix: str) -> dict:
    out = {"fc": port_linear(sd, f"{prefix}.fc")}
    if f"{prefix}.learned_pe_res" in sd:
        out["learned_pe_res"] = sd[f"{prefix}.learned_pe_res"]
    return out


# ---------------------------------------------------------------- infiller

def port_motion_infiller(sd: dict, cfg) -> dict:
    """Reference MotionInfillerVAE state_dict -> flax params for
    models.MotionInfillerVAE (same architecture config)."""
    ce = {}
    if any(k.startswith("context_encoder.in_mlp.") for k in sd):
        ce["in_mlp"] = port_mlp(sd, "context_encoder.in_mlp")
    if "context_encoder.in_fc.weight" in sd:
        ce["in_fc"] = port_linear(sd, "context_encoder.in_fc")
    ce["pos_enc"] = _pe_params(sd, "context_encoder.pos_enc")
    ce["temporal_net"] = port_transformer(
        sd, "context_encoder.temporal_net", cfg.ctx_transformer.nlayer,
        cfg.ctx_transformer.model_dim)

    de = {
        "in_fc": port_linear(sd, "data_encoder.in_fc"),
        "pos_enc": _pe_params(sd, "data_encoder.pos_enc"),
        "temporal_net": port_transformer(
            sd, "data_encoder.temporal_net", cfg.enc_transformer.nlayer,
            cfg.enc_transformer.model_dim, decoder=True),
        "mu_token": sd["data_encoder.mu_token"],
        "logvar_token": sd["data_encoder.logvar_token"],
        "q_z_mu_net": port_linear(sd, "data_encoder.q_z_mu_net"),
        "q_z_logvar_net": port_linear(sd, "data_encoder.q_z_logvar_net"),
    }

    prior = {
        "pos_enc": _pe_params(sd, "data_decoder.prior_pos_enc"),
        "temporal_net": port_transformer(
            sd, "data_decoder.prior_temporal_net", cfg.prior_transformer.nlayer,
            cfg.prior_transformer.model_dim, decoder=True),
        "mu_token": sd["data_decoder.mu_token"],
        "logvar_token": sd["data_decoder.logvar_token"],
        "p_z_mu_net": port_linear(sd, "data_decoder.p_z_mu_net"),
        "p_z_logvar_net": port_linear(sd, "data_decoder.p_z_logvar_net"),
    }

    dd = {
        "pos_enc": _pe_params(sd, "data_decoder.pos_enc"),
        "temporal_net": port_transformer(
            sd, "data_decoder.temporal_net", cfg.dec_transformer.nlayer,
            cfg.dec_transformer.model_dim, decoder=True),
        "out_fc": port_linear(sd, "data_decoder.out_fc"),
    }
    if any(k.startswith("data_decoder.out_mlp.") for k in sd):
        dd["out_mlp"] = port_mlp(sd, "data_decoder.out_mlp")
    if "data_decoder.in_fc.weight" in sd:
        dd["in_fc"] = port_linear(sd, "data_decoder.in_fc")

    params = {"context_encoder": ce, "data_encoder": de, "prior": prior,
              "data_decoder": dd}
    import jax

    return {"params": jax.tree.map(np.asarray, params)}


# --------------------------------------------------------------- traj pred

def _port_rnn_stack(sd: dict, prefix: str, nlayers: int, bi_dir: bool) -> dict:
    return {f"rnn{i}": port_rnn(sd, f"{prefix}.{i}", bi_dir)
            for i in range(nlayers)}


def port_traj_pred(sd: dict, cfg) -> dict:
    """Reference TrajPredVAE state_dict -> flax params for
    models.TrajPredVAE."""
    ce = {}
    if any(k.startswith("context_encoder.in_mlp.") for k in sd):
        ce["in_mlp"] = port_mlp(sd, "context_encoder.in_mlp")
    ce.update(_port_rnn_stack(sd, "context_encoder.temporal_net",
                              cfg.ctx_rnn_layers, cfg.ctx_rnn_bi_dir))
    if any(k.startswith("context_encoder.out_mlp.") for k in sd):
        ce["out_mlp"] = port_mlp(sd, "context_encoder.out_mlp")
    if "context_encoder.fc.weight" in sd:
        ce["fc"] = port_linear(sd, "context_encoder.fc")

    de = {}
    if any(k.startswith("data_encoder.in_mlp.") for k in sd):
        de["in_mlp"] = port_mlp(sd, "data_encoder.in_mlp")
    de.update(_port_rnn_stack(sd, "data_encoder.temporal_net",
                              cfg.enc_rnn_layers, cfg.enc_rnn_bi_dir))
    if any(k.startswith("data_encoder.out_mlp.") for k in sd):
        de["out_mlp"] = port_mlp(sd, "data_encoder.out_mlp")
    if any(k.startswith("data_encoder.fusion_mlp.") for k in sd):
        de["fusion_mlp"] = port_mlp(sd, "data_encoder.fusion_mlp")
    de["q_z_net"] = port_linear(sd, "data_encoder.q_z_net")

    dd = {}
    if any(k.startswith("data_decoder.in_mlp.") for k in sd):
        dd["in_mlp"] = port_mlp(sd, "data_decoder.in_mlp")
    dd.update(_port_rnn_stack(sd, "data_decoder.temporal_net",
                              cfg.dec_rnn_layers, cfg.dec_rnn_bi_dir))
    if any(k.startswith("data_decoder.out_mlp.") for k in sd):
        dd["out_mlp"] = port_mlp(sd, "data_decoder.out_mlp")
    dd["out_fc"] = port_linear(sd, "data_decoder.out_fc")

    prior = {"p_z_net": port_linear(sd, "data_decoder.p_z_net")}
    if any(k.startswith("data_decoder.prior_mlp.") for k in sd):
        prior["prior_mlp"] = port_mlp(sd, "data_decoder.prior_mlp")

    params = {"context_encoder": ce, "data_encoder": de,
              "data_decoder": dd, "prior": prior}
    import jax

    return {"params": jax.tree.map(np.asarray, params)}


def port_checkpoint(ckpt_path: str, model_kind: str, cfg) -> dict:
    """Load a reference .ckpt and port it (model_kind: 'motion_infiller'
    or 'traj_pred')."""
    sd = load_torch_state_dict(ckpt_path)
    if model_kind == "motion_infiller":
        return port_motion_infiller(sd, cfg)
    if model_kind == "traj_pred":
        return port_traj_pred(sd, cfg)
    raise ValueError(model_kind)
