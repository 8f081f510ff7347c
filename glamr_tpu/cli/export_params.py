"""Export trained model params as committed release artifacts.

The reference ships pretrained checkpoints as a first-class artifact
(/root/reference/README.md:58-64 — a gdown'd results/ tree). The rebuild's
analog: small params-only pickles under checkpoints/<cfg_id>.params.pkl at
the repo root, written from the latest trained results/ version. Every
loader (models/joint_model.py load_joint_model, pose_est/estimator.py
load_lifter/load_detector) falls back to these when no trained results/
version exists — so a fresh clone runs `run_demo --detect` out of the box.

Usage:
    glamr-export-params                 # all four demo models
    glamr-export-params --models traj_pred_demo,kp_lifter_demo
"""
from __future__ import annotations

import argparse
import os
import pickle

DEMO_CFGS = ["motion_infiller_demo", "traj_pred_demo", "kp_lifter_demo",
             "kp_detector_demo"]


def export_one(cfg_id: str, out_dir: str, cp: str = "best") -> str | None:
    import numpy as np

    from ..utils import Config
    from ..utils.checkpoint import extract_params, load_checkpoint
    from ..utils.tools import (find_checkpoint_across_versions,
                               resolve_results_dir)

    cfg = Config(cfg_id)
    base = os.path.join(
        resolve_results_dir(cfg.get("results_root_dir", "results")), cfg.id)
    cp_path = find_checkpoint_across_versions(base, cp)
    if cp_path is None:
        return None
    params = extract_params(load_checkpoint(cp_path))

    def to_np(tree):
        if isinstance(tree, dict):
            return {k: to_np(x) for k, x in tree.items()}
        a = np.asarray(tree)
        # float16 storage halves the committed artifact; extract_params
        # casts release params back to float32 at load time
        return a.astype(np.float16) if a.dtype.kind == "f" else a

    host = to_np(params)
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{cfg_id}.params.pkl")
    with open(out, "wb") as f:
        pickle.dump({"format": "glamr_tpu.params.v1", "cfg_id": cfg_id,
                     "dtype": "float16",
                     "source": os.path.relpath(cp_path), "params": host}, f)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--models", default=",".join(DEMO_CFGS),
                        help="comma-separated model cfg ids")
    parser.add_argument("--out_dir", default=None,
                        help="default: <repo_root>/checkpoints")
    parser.add_argument("--cp", default="best")
    args = parser.parse_args(argv)

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    out_dir = args.out_dir or os.path.join(repo_root, "checkpoints")
    for cfg_id in args.models.split(","):
        out = export_one(cfg_id.strip(), out_dir, args.cp)
        if out is None:
            print(f"{cfg_id}: no trained checkpoint found — skipped")
        else:
            mb = os.path.getsize(out) / 1e6
            print(f"{cfg_id}: wrote {out} ({mb:.1f} MB)")


if __name__ == "__main__":
    main()
