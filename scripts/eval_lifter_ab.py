"""Controlled lifter depth-prior A/B (RESULTS.md stage-1 section).

Evaluates two lifter checkpoints on IDENTICAL held-out procedural
windows so the depth-prior contribution is attributable: the r03
release artifact (free depth head; pass --old_params, e.g. extracted
with `git show 5037c6d:checkpoints/kp_lifter_demo.params.pkl`) vs the
current checkpoint (log-depth residual about the visible-keypoint-
spread anchor — the bbox-scale cue the reference uses to pin absolute
monocular depth, pose_est/hybrik_demo/demo.py:175-199).

Usage:
    git show 5037c6d:checkpoints/kp_lifter_demo.params.pkl > /tmp/old.pkl
    python scripts/eval_lifter_ab.py --old_params /tmp/old.pkl
"""
import argparse
import dataclasses
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--old_params", required=True,
                   help="params-only pickle of a depth_prior=False lifter")
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--num_lift", type=int, default=64)
    args = p.parse_args()

    from glamr_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    from eval_stage1 import eval_lifter

    from glamr_tpu.body.smpl import get_smpl
    from glamr_tpu.data import procedural_amass_data
    from glamr_tpu.pose_est.estimator import load_lifter
    from glamr_tpu.utils.checkpoint import extract_params

    smpl = get_smpl("body26fk", synthetic=True)
    data, _, _, _ = procedural_amass_data(16, seed=args.seed)
    model, new_params, _ = load_lifter("kp_lifter_demo")
    old_model = type(model)(dataclasses.replace(model.cfg,
                                                depth_prior=False))
    with open(args.old_params, "rb") as f:
        old_params = extract_params(pickle.load(f))
    for name, m, params in [("no_prior", old_model, old_params),
                            ("depth_prior", model, new_params)]:
        rng = np.random.default_rng(args.seed)
        res = eval_lifter(m, params, smpl, data, rng, args.num_lift)
        print(name, json.dumps(res))


if __name__ == "__main__":
    main()
