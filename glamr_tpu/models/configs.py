"""Typed, hashable model configs for the CVAEs.

Frozen dataclasses (usable as static flax module attributes) built from the
same YAML schema the reference uses (motion_infiller/cfg/*.yml,
traj_pred/cfg/*.yml) so existing config files drive the rebuild unchanged.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class TransformerSpec:
    nlayer: int = 2
    model_dim: int = 256
    nhead: int = 8
    ff_dim: int = 512
    dropout: float = 0.1
    pe_type: str = "original"
    pe_max_freq: float = 10.0
    pe_freq_scale: float = 0.1
    pe_concat: bool = True
    pe_learnable_pos_index: Optional[Tuple[int, ...]] = None

    @classmethod
    def from_dict(cls, d: dict) -> "TransformerSpec":
        pe = d.get("positional_encoding", {})
        lpi = pe.get("learnable_pos_index")
        return cls(
            nlayer=d.get("nlayer", 2),
            model_dim=d.get("model_dim", 256),
            nhead=d.get("nhead", 8),
            ff_dim=d.get("ff_dim", 512),
            dropout=d.get("dropout", 0.1),
            pe_type=pe.get("enc_type", "original"),
            pe_max_freq=pe.get("max_freq", 10),
            pe_freq_scale=pe.get("freq_scale", 0.1),
            pe_concat=pe.get("concat", True),
            pe_learnable_pos_index=tuple(lpi) if lpi is not None else None,
        )


@dataclass(frozen=True)
class MotionInfillerConfig:
    """Schema of motion_infiller_demo.yml model_specs
    (reference: motion_infiller/models/motion_infiller_vae.py:440-476)."""

    nz: int = 128
    past_nframe: int = 10
    cur_nframe: int = 30
    fut_nframe: int = 10
    pose_rep: str = "body"          # 'body' (69-D) or 'full' (72-D)
    rot_type: str = "axis_angle"    # or '6d'
    mlp_htype: str = "relu"
    pose_dropout: float = 0.0
    ctx_in_fc: Optional[int] = 256
    ctx_in_mlp: Optional[Tuple[int, ...]] = None
    ctx_transformer: TransformerSpec = field(default_factory=TransformerSpec)
    enc_transformer: TransformerSpec = field(default_factory=TransformerSpec)
    enc_pooling: str = "attn"
    dec_transformer: TransformerSpec = field(default_factory=TransformerSpec)
    dec_out_mlp: Optional[Tuple[int, ...]] = (512, 256)
    dec_learn_prior: bool = True
    dec_use_pos_offset: bool = True
    prior_transformer: TransformerSpec = field(
        default_factory=lambda: TransformerSpec(nlayer=1)
    )

    @property
    def window_len(self) -> int:
        return self.past_nframe + self.cur_nframe + self.fut_nframe

    @property
    def pose_dim(self) -> int:
        base = 69 if self.pose_rep == "body" else 72
        return base * (2 if self.rot_type == "6d" else 1)

    @classmethod
    def from_dict(cls, specs: dict) -> "MotionInfillerConfig":
        ce = specs.get("context_encoder", {})
        de = specs.get("data_encoder", {})
        dd = specs.get("data_decoder", {})
        return cls(
            nz=specs.get("nz", 128),
            past_nframe=specs.get("past_nframe", 10),
            cur_nframe=specs.get("cur_nframe", 30),
            fut_nframe=specs.get("fut_nframe", 10),
            pose_rep=specs.get("pose_rep", "full"),
            rot_type=ce.get("rot_type", "axis_angle"),
            mlp_htype=specs.get("mlp_htype", "relu"),
            pose_dropout=specs.get("pose_dropout", 0.0),
            ctx_in_fc=ce.get("in_fc"),
            ctx_in_mlp=tuple(ce["in_mlp"]["hdim"]) if "in_mlp" in ce else None,
            ctx_transformer=TransformerSpec.from_dict(ce.get("transformer", {})),
            enc_transformer=TransformerSpec.from_dict(de.get("transformer", {})),
            enc_pooling=de.get("pooling", "attn"),
            dec_transformer=TransformerSpec.from_dict(dd.get("transformer", {})),
            dec_out_mlp=tuple(dd["out_mlp"]["hdim"]) if "out_mlp" in dd else None,
            dec_learn_prior=dd.get("learn_prior", True),
            dec_use_pos_offset=dd.get("use_pos_offset", True),
            prior_transformer=TransformerSpec.from_dict(dd.get("prior_transformer", {})),
        )


@dataclass(frozen=True)
class TrajPredConfig:
    """Schema of traj_pred_demo.yml model_specs
    (reference: traj_pred/models/traj_pred_vae.py:341-376)."""

    nz: int = 128
    mlp_htype: str = "relu"
    local_orient_type: str = "6d"
    deheading_local: bool = False
    seq_len: int = 100
    joint_dropout: float = 0.0
    in_joint_pos_only: bool = False
    # context encoder
    ctx_in_mlp: Optional[Tuple[int, ...]] = (512, 256)
    ctx_rnn_layers: int = 2
    ctx_rnn_hdim: int = 256
    ctx_rnn_type: str = "lstm"
    ctx_rnn_bi_dir: bool = True
    ctx_out_mlp: Optional[Tuple[int, ...]] = (512, 256)
    ctx_fc: Optional[int] = None
    # data encoder
    enc_input: str = "init_heading_coord"
    enc_orient_type: str = "axis_angle"
    enc_pooling: str = "mean"
    enc_append_context: str = "late"
    enc_in_mlp: Optional[Tuple[int, ...]] = (512, 256)
    enc_rnn_layers: int = 2
    enc_rnn_hdim: int = 256
    enc_rnn_type: str = "lstm"
    enc_rnn_bi_dir: bool = True
    enc_out_mlp: Optional[Tuple[int, ...]] = (512, 256)
    enc_fusion_mlp: Optional[Tuple[int, ...]] = (512, 256)
    # data decoder
    dec_pooling: str = "mean"
    dec_learn_prior: bool = True
    dec_in_mlp: Optional[Tuple[int, ...]] = None
    dec_rnn_layers: int = 0
    dec_rnn_hdim: int = 256
    dec_rnn_type: str = "lstm"
    dec_rnn_bi_dir: bool = True
    dec_out_mlp: Optional[Tuple[int, ...]] = (512, 256)
    dec_prior_mlp: Optional[Tuple[int, ...]] = (512, 256)

    @property
    def traj_dim(self) -> int:
        return 11 if self.local_orient_type == "6d" else 8

    @classmethod
    def from_dict(cls, specs: dict, seq_len: int = 100) -> "TrajPredConfig":
        ce = specs.get("context_encoder", {})
        de = specs.get("data_encoder", {})
        dd = specs.get("data_decoder", {})

        def mlp(d, key):
            return tuple(d[key]["hdim"]) if key in d else None

        ce_t = ce.get("temporal_net", {})
        de_t = de.get("temporal_net", {})
        dd_t = dd.get("temporal_net", {})
        return cls(
            nz=specs.get("nz", 128),
            mlp_htype=specs.get("mlp_htype", "relu"),
            local_orient_type=specs.get("local_orient_type", "6d"),
            deheading_local=specs.get("deheading_local", False),
            seq_len=seq_len,
            joint_dropout=specs.get("joint_dropout", 0.0),
            in_joint_pos_only=specs.get("in_joint_pos_only", False),
            ctx_in_mlp=mlp(ce, "in_mlp"),
            ctx_rnn_layers=ce_t.get("num_layers", 1) if ce_t else 0,
            ctx_rnn_hdim=ce_t.get("hdim", 256),
            ctx_rnn_type=ce_t.get("type", "lstm"),
            ctx_rnn_bi_dir=ce_t.get("bi_dir", True),
            ctx_out_mlp=mlp(ce, "out_mlp"),
            ctx_fc=ce.get("context_dim"),
            enc_input=de.get("input", "init_heading_coord"),
            enc_orient_type=de.get("orient_type", "axis_angle"),
            enc_pooling=de.get("pooling", "mean"),
            enc_append_context=de.get("append_context", "late"),
            enc_in_mlp=mlp(de, "in_mlp"),
            enc_rnn_layers=de_t.get("num_layers", 1) if de_t else 0,
            enc_rnn_hdim=de_t.get("hdim", 256),
            enc_rnn_type=de_t.get("type", "lstm"),
            enc_rnn_bi_dir=de_t.get("bi_dir", True),
            enc_out_mlp=mlp(de, "out_mlp"),
            enc_fusion_mlp=mlp(de, "fusion_mlp"),
            dec_pooling=dd.get("pooling", "mean"),
            dec_learn_prior=dd.get("learn_prior", True),
            dec_in_mlp=mlp(dd, "in_mlp"),
            dec_rnn_layers=dd_t.get("num_layers", 1) if dd_t else 0,
            dec_rnn_hdim=dd_t.get("hdim", 256),
            dec_rnn_type=dd_t.get("type", "lstm"),
            dec_rnn_bi_dir=dd_t.get("bi_dir", True),
            dec_out_mlp=mlp(dd, "out_mlp"),
            dec_prior_mlp=mlp(dd, "prior_mlp"),
        )
