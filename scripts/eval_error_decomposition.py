"""Decompose the synthetic-sweep G-MPJPE: how does global error scale
with input depth drift, and how much of it is already present in the
UNOPTIMIZED degraded input?

For each depth-random-walk amplitude (cm over the whole sequence,
matching eval_synthetic_sweep's --depth_noise), the same held-out
sequences are (a) scored directly as the input floor (no optimization,
occluded spans linearly interpolated) and (b) driven through the full
run_dataset -> eval_dataset loop with the trained CVAEs. The reference's
chunked 250-frame alignment (global_recon/utils/evaluator.py:202-216 —
rebuild parity: glamr_tpu/eval/evaluator.py aligned_orient_trans) is
applied identically in both arms.

Usage:
    python scripts/eval_error_decomposition.py \
        --depths 0,0.005,0.01,0.02 --out benchmarks/error_decomposition.json
"""
import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from eval_ablation import score_input_floor  # noqa: E402
from eval_synthetic_sweep import generate_dataset  # noqa: E402


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="glamr_3dpw")
    p.add_argument("--num_seqs", type=int, default=4)
    p.add_argument("--seq_len", type=int, default=300)
    p.add_argument("--seeds", default="1")
    p.add_argument("--data_seed", type=int, default=77)
    p.add_argument("--kp_noise_px", type=float, default=2.0)
    p.add_argument("--pose_noise", type=float, default=0.05)
    p.add_argument("--depths", default="0,0.005,0.01,0.02",
                   help="comma-separated depth random-walk amplitudes (m)")
    p.add_argument("--occl_frac", type=float, default=0.15)
    p.add_argument("--workdir", default="out/glamr_tpu/error_decomp")
    p.add_argument("--out", default="out/glamr_tpu/error_decomposition.json")
    return p.parse_args()


def main():
    args = parse_args()
    from glamr_tpu.cli import eval_dataset, run_dataset
    from glamr_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    root = os.path.abspath(args.workdir)
    if os.path.isdir(root):
        shutil.rmtree(root)

    depths = [float(d) for d in args.depths.split(",")]
    per_depth = {}
    cwd = os.getcwd()
    for depth in depths:
        workdir = os.path.join(root, f"depth_{depth:g}")
        out_dir = os.path.join(workdir, "out")
        args.depth_noise = depth  # generate_dataset reads the namespace
        seq_names, _, floors = generate_dataset(workdir, out_dir, args)
        os.chdir(workdir)
        try:
            floor = score_input_floor(floors, workdir, args.cfg, seq_names)
            t0 = time.time()
            run_dataset.main([
                "--dataset", "3dpw", "--cfg", args.cfg,
                "--out_dir", out_dir,
                "--sequences", ",".join(seq_names), "--seeds", args.seeds,
            ])
            wall = time.time() - t0
            acc = eval_dataset.main([
                "--dataset", "3dpw", "--cfg", args.cfg,
                "--out_dir", out_dir,
                "--sequences", ",".join(seq_names), "--seeds", args.seeds,
            ])
        finally:
            os.chdir(cwd)
        opt = {k: float(np.mean(v.avg)) for k, v in acc["metrics"].items()}
        per_depth[f"{depth:g}"] = {
            "input_floor": floor,
            "optimized": opt,
            "recon_wall_s": round(wall, 2),
        }
        print(f"depth {depth:g} m: floor G-MPJPE "
              f"{floor.get('G-MPJPE', float('nan')):.1f} -> optimized "
              f"{opt.get('G-MPJPE', float('nan')):.1f}")

    out = {
        "protocol": "per depth-walk amplitude: input floor (degraded "
                    "input scored directly, occluded spans interpolated, "
                    "no optimization) vs full optimization with trained "
                    "CVAEs; identical sequences and all other "
                    "degradations fixed",
        "workload": {
            "cfg": args.cfg, "num_seqs": args.num_seqs,
            "seq_len": args.seq_len, "seeds": args.seeds,
            "data_seed": args.data_seed,
            "kp_noise_px": args.kp_noise_px,
            "pose_noise": args.pose_noise, "occl_frac": args.occl_frac,
        },
        "per_depth": per_depth,
        "reproduce": "python scripts/eval_error_decomposition.py "
                     f"--depths {args.depths} --num_seqs {args.num_seqs} "
                     f"--seq_len {args.seq_len} --seeds {args.seeds}",
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
