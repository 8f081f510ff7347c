"""Controlled CVAE-contribution ablation (GLAMR's core claim).

The reference's named contribution is the generative motion infiller +
trajectory predictor completing occluded spans and regularizing the
global trajectory (reference: global_recon/models/global_recon_model.py
:353-445, traj_pred/models/traj_pred_vae.py:508-519). This harness
isolates that contribution: IDENTICAL sequences and degradations through
the full run_dataset -> eval_dataset loop under four arms

  input_floor    the degraded estimate itself, expressed in the z-up
                 world with known camera extrinsics, occluded spans
                 linearly interpolated, NO optimization — the error the
                 optimizer starts from
  no_cvae        full global optimization, est-derived trajectory
                 (--joint_model none)
  random_cvae    full optimization with randomly-initialized CVAEs
                 (--joint_model random) — untrained-prior control
  trained_cvae   full optimization with the trained checkpoints

so any metric gap between no_cvae and trained_cvae is attributable to
the trained prior alone, and random_cvae separates "having latent DoF"
from "having a LEARNED prior".

Usage:
    python scripts/eval_ablation.py --cfg glamr_3dpw \
        --num_seqs 6 --seq_len 300 --seeds 1,2,3 \
        --out benchmarks/cvae_ablation.json
"""
import argparse
import json
import os
import pickle
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from eval_synthetic_sweep import (generate_dataset,  # noqa: E402
                                  swap_gt_to_camconv)

ARMS = {
    # the full-prior arms force --traj_prior on: the shipped cfg default
    # is the hybrid operating point, but these arms measure the complete
    # reference behavior (traj-CVAE trajectory base)
    "no_cvae": ["--joint_model", "none"],
    "random_cvae": ["--joint_model", "random", "--traj_prior", "on"],
    "trained_cvae": ["--joint_model", "auto", "--traj_prior", "on"],
    # hybrid: trained motion infiller completes occluded pose, but the
    # trajectory BASE stays est-derived (flag_use_traj_prior off) — the
    # measured best operating point while the traj prior trains on
    # procedural (non-mocap) data; see RESULTS.md
    "hybrid_no_traj_prior": ["--joint_model", "auto", "--traj_prior", "off"],
}


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="glamr_3dpw")
    p.add_argument("--num_seqs", type=int, default=6)
    p.add_argument("--seq_len", type=int, default=300)
    p.add_argument("--seeds", default="1,2,3")
    p.add_argument("--data_seed", type=int, default=77)
    p.add_argument("--kp_noise_px", type=float, default=2.0)
    p.add_argument("--pose_noise", type=float, default=0.05)
    p.add_argument("--depth_noise", type=float, default=0.02)
    p.add_argument("--occl_frac", type=float, default=0.15)
    p.add_argument("--arms", default=",".join(ARMS),
                   help="comma-separated subset of arms to run")
    p.add_argument("--workdir", default="out/glamr_tpu/cvae_ablation")
    p.add_argument("--out", default="out/glamr_tpu/cvae_ablation.json")
    return p.parse_args()


def interp_occluded(arr, exist):
    """Linear interpolation over exist==0 spans (the no-prior way to
    complete occluded frames). arr: (T, ...) float."""
    out = arr.copy()
    t = np.arange(len(arr), dtype=np.float32)
    vis = exist > 0.5
    flat = out.reshape(len(arr), -1)
    for c in range(flat.shape[1]):
        flat[~vis, c] = np.interp(t[~vis], t[vis], flat[vis, c])
    return flat.reshape(arr.shape)




def score_input_floor(floors, workdir, cfg_id, seq_names):
    """Score the unoptimized degraded input with the production
    Evaluator: out_dict assembled directly from the floor arrays."""
    from glamr_tpu.eval import Evaluator

    evaluator = Evaluator(algo=f"{cfg_id}_input_floor", dataset="3DPW",
                          compute_sample=False)
    gt_dir = os.path.join(workdir, "datasets", "3DPW", "processed_v1",
                          "pose")
    for seq in seq_names:
        with open(os.path.join(gt_dir, f"{seq}.pkl"), "rb") as f:
            gt_pkl = pickle.load(f)
        fl = floors[seq]
        exist = fl["exist"]
        T = len(exist)
        out_dict = {
            "seq_len": T,
            "person_data": {0: {
                "exist_frames": np.ones(T, bool),
                "visible_orig": exist.astype(np.int64),
                "smpl_orient_world": interp_occluded(
                    fl["orient_world"], exist),
                "smpl_pose": interp_occluded(fl["pose_body"], exist),
                "smpl_beta": fl["beta"],
                "root_trans_world": interp_occluded(
                    fl["trans_world"], exist),
            }},
            "gt": gt_pkl["person_data"],
        }
        md = evaluator.compute_sequence_metrics(out_dict, name=seq)
        evaluator.print_metrics(md, prefix=f"floor {seq} | ",
                                print_accum=False)
    return {k: float(np.mean(v.avg))
            for k, v in evaluator.acc_metrics_dict["metrics"].items()}


def main():
    args = parse_args()
    from glamr_tpu.cli import eval_dataset, run_dataset
    from glamr_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    workdir = os.path.abspath(args.workdir)
    if os.path.isdir(workdir):
        shutil.rmtree(workdir)
    # one shared degraded dataset; pose_est caches copied per arm
    cache_dir = os.path.join(workdir, "pose_est_cache")
    seq_names, occl_info, floors = generate_dataset(workdir, cache_dir, args)

    results = {}
    arm_list = [a for a in args.arms.split(",") if a]
    cwd = os.getcwd()
    os.chdir(workdir)  # run_dataset resolves datasets/ relative to cwd
    try:
        results["input_floor"] = score_input_floor(
            floors, workdir, args.cfg, seq_names)
        for arm in arm_list:
            out_dir = os.path.join(workdir, f"out_{arm}")
            shutil.copytree(os.path.join(cache_dir, "pose_est"),
                            os.path.join(out_dir, "pose_est"))
            t0 = time.time()
            run_dataset.main([
                "--dataset", "3dpw", "--cfg", args.cfg,
                "--out_dir", out_dir,
                "--sequences", ",".join(seq_names), "--seeds", args.seeds,
            ] + ARMS[arm])
            wall = time.time() - t0
            if arm in ("no_cvae", "hybrid_no_traj_prior"):
                # score the cam-anchored arms in their own gauge (the
                # hybrid arm's trajectory base is the same est-derived,
                # identity-camera-anchored world as no_cvae)
                swap_gt_to_camconv(out_dir, floors, seq_names, args.seeds)
            acc = eval_dataset.main([
                "--dataset", "3dpw", "--cfg", args.cfg,
                "--out_dir", out_dir,
                "--sequences", ",".join(seq_names),
                "--seeds", args.seeds,
            ])
            results[arm] = {k: float(np.mean(v.avg))
                            for k, v in acc["metrics"].items()}
            results[arm]["recon_wall_s"] = round(wall, 2)
    finally:
        os.chdir(cwd)

    out = {
        "protocol": "identical degraded synthetic-GT sequences through "
                    "run_dataset -> eval_dataset per arm; input_floor = "
                    "degraded input scored directly (occluded spans "
                    "linearly interpolated, no optimization)",
        "workload": {
            "cfg": args.cfg, "num_seqs": args.num_seqs,
            "seq_len": args.seq_len, "seeds": args.seeds,
            "data_seed": args.data_seed,
            "kp_noise_px": args.kp_noise_px,
            "pose_noise": args.pose_noise,
            "depth_noise": args.depth_noise, "occl_frac": args.occl_frac,
            "occluded_spans": occl_info,
        },
        "arms": results,
        "reproduce": "python scripts/eval_ablation.py --cfg "
                     f"{args.cfg} --num_seqs {args.num_seqs} --seq_len "
                     f"{args.seq_len} --seeds {args.seeds}",
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({a: {k: round(v, 2) for k, v in m.items()}
                      for a, m in results.items()}, indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
