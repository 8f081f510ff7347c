"""Port reference PyTorch-Lightning checkpoints to native checkpoints.

Usage:
  python -m glamr_tpu.cli.port_checkpoint \
      --model motion_infiller --ckpt results_ref/.../model-xxx.ckpt \
      [--cfg motion_infiller_demo] [--out <path>]

Writes a {'params': ...} checkpoint to
<results_root_dir>/<cfg>/version_N/checkpoints/best.pkl (or --out), where
models.load_joint_model picks it up — the parity path from released
reference weights to this framework (activation parity is covered by
tests/test_parity.py).
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True,
                        choices=["motion_infiller", "traj_pred"])
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--cfg", default=None)
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)

    from ..models.configs import MotionInfillerConfig, TrajPredConfig
    from ..utils import Config, create_logger
    from ..utils.checkpoint import save_checkpoint
    from ..utils.port_weights import port_checkpoint
    from ..utils.tools import find_last_version

    log = create_logger()
    cfg = Config(args.cfg or (
        "motion_infiller_demo" if args.model == "motion_infiller"
        else "traj_pred_demo"))
    mcfg = (MotionInfillerConfig.from_dict(cfg.model_specs)
            if args.model == "motion_infiller"
            else TrajPredConfig.from_dict(cfg.model_specs,
                                          seq_len=cfg.get("seq_len", 100)))
    params = port_checkpoint(args.ckpt, args.model, mcfg)

    if args.out:
        out = args.out
    else:
        base = os.path.join(cfg.get("results_root_dir", "results"), cfg.id)
        version = max(find_last_version(base), 0)
        out = os.path.join(base, f"version_{version}", "checkpoints", "best.pkl")
    save_checkpoint(out, {"params": params})
    log.info(f"ported {args.ckpt} -> {out}")


if __name__ == "__main__":
    main()
