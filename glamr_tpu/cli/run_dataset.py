"""Benchmark sweep: run global recon over 3DPW / Dynamic-H36M test
sequences x seeds (reference: global_recon/run_dataset.py — note the
rebuild iterates ALL sequences; the reference snapshot had leftover debug
slicing at :67/:41).

Expects preprocessed datasets (see glamr_tpu.preprocess):
  datasets/3DPW/processed_v1/pose/<seq>.pkl     (gt person_data + meta)
  <image_dir> per sequence for pose estimation (or cached pose.pkl).
"""
from __future__ import annotations

import argparse
import os
import pickle

# the benchmark sequence lists are part of the eval contract
# (reference run_dataset.py:18-24)
TEST_SEQUENCES = {
    "3dpw": [
        "downtown_arguing_00", "downtown_bar_00", "downtown_bus_00",
        "downtown_cafe_00", "downtown_car_00", "downtown_crossStreets_00",
        "downtown_downstairs_00", "downtown_enterShop_00",
        "downtown_rampAndStairs_00", "downtown_runForBus_00",
        "downtown_runForBus_01", "downtown_sitOnStairs_00",
        "downtown_stairs_00", "downtown_upstairs_00", "downtown_walkBridge_01",
        "downtown_walkUphill_00", "downtown_walking_00", "downtown_warmWelcome_00",
        "downtown_weeklyMarket_00", "downtown_windowShopping_00",
        "flat_guitar_01", "flat_packBags_00", "office_phoneCall_00",
        "outdoors_fencing_01",
    ],
    "h36m": [f"s_09_act_{a:02d}_subact_{sa:02d}_ca_01"
             for a in range(2, 17) for sa in [1, 2]] +
            [f"s_11_act_{a:02d}_subact_{sa:02d}_ca_01"
             for a in range(2, 17) for sa in [1, 2]],
}

DATASET_DIRS = {
    "3dpw": {"root": "datasets/3DPW", "gt": "processed_v1/pose",
             "bbox": "processed_v1/bbox", "images": "imageFiles"},
    "h36m": {"root": "datasets/H36M/occluded_v2", "gt": "pose",
             "bbox": "bbox", "images": "images"},
}


def main(argv=None):
    from ..utils.cache import enable_compile_cache
    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="3dpw", choices=["3dpw", "h36m"])
    parser.add_argument("--cfg", default=None)
    parser.add_argument("--out_dir", default=None)
    parser.add_argument("--seeds", default="1")
    parser.add_argument("--sequences", default=None,
                        help="comma-separated subset; default = full test set")
    parser.add_argument("--data_root", default=None,
                        help="dataset root override (default: the "
                             "conventional datasets/ layout, see "
                             "DATASET_DIRS)")
    parser.add_argument("--cached", type=int, default=1)
    parser.add_argument("--batch_sequences", type=int, default=0,
                        help="batch this many sequences (same person count, "
                             "bucketed lengths) through one vmapped program; "
                             "0 = per-sequence")
    parser.add_argument("--vmap_seeds", type=int, default=1,
                        help="run all seeds of a sequence as ONE vmapped "
                             "program (S seeds ~ cost of 1); 0 = serial")
    parser.add_argument("--block_per_stage", action="store_true",
                        help="debug timing: force each stage program to "
                             "completion so per-stage log lines show true "
                             "device time (default: async dispatch)")
    parser.add_argument("--pad_to", type=int, default=0,
                        help="bucket sequence lengths up to multiples of "
                             "this (reuses compiled stage programs across "
                             "sequences; 0 = exact shapes)")
    parser.add_argument("--joint_model", default="auto",
                        choices=["auto", "none", "random"],
                        help="CVAE ablation arm: auto = load trained "
                             "checkpoints when the cfg asks for them; "
                             "none = est-derived trajectory (no CVAE "
                             "prior); random = randomly initialized "
                             "CVAEs (untrained-prior control)")
    parser.add_argument("--traj_prior", default="cfg",
                        choices=["cfg", "on", "off"],
                        help="override flag_use_traj_prior: off = hybrid "
                             "mode (motion infiller completes occluded "
                             "pose, trajectory base stays est-derived); "
                             "cfg = use the config's setting")
    args = parser.parse_args(argv)

    import numpy as np

    from ..models import load_joint_model
    from ..pose_est import load_pose_pkl, run_pose_est_on_video
    from ..recon import GlobalReconOptimizer
    from ..utils import Config, create_logger

    cfg_id = args.cfg or f"glamr_{args.dataset}"
    out_dir = args.out_dir or f"out/glamr_tpu/{cfg_id}"
    cfg = Config(cfg_id, out_dir=out_dir, create_dirs=True)
    log = create_logger(os.path.join(out_dir, "log.txt"))
    seeds = [int(s) for s in str(args.seeds).split(",")]
    seqs = (args.sequences.split(",") if args.sequences
            else TEST_SEQUENCES[args.dataset])
    dirs = dict(DATASET_DIRS[args.dataset])
    if args.data_root:
        dirs["root"] = args.data_root

    joint_model = None
    specs = cfg.get("grecon_model_specs", {})
    if args.traj_prior != "cfg":
        specs["flag_use_traj_prior"] = args.traj_prior == "on"
        log.info(f"traj prior override: flag_use_traj_prior="
                 f"{specs['flag_use_traj_prior']}")
    if (specs.get("flag_infer_motion_traj") and "motion_traj_cfg" in specs
            and args.joint_model != "none"):
        try:
            joint_model = load_joint_model(
                Config(specs["motion_traj_cfg"]),
                random_init=args.joint_model == "random")
        except FileNotFoundError as e:
            log.info(f"joint model unavailable ({e}); using est-derived traj")
    if args.joint_model == "none":
        log.info("joint model disabled (--joint_model none); "
                 "est-derived trajectory")
    grecon = GlobalReconOptimizer(cfg, joint_model=joint_model, log=log,
                                  block_per_stage=args.block_per_stage)

    def dump(seq, seed, out_dict):
        out_file = os.path.join(out_dir, f"{seq}_seed{seed}.pkl")
        with open(out_file, "wb") as f:
            pickle.dump(out_dict, f)
        log.info(f"{seq} seed {seed}: wrote {out_file}")

    pending = []  # (in_dict, seed, P) jobs for cross-sequence batching

    def flush_pending(force=False):
        # group by person count; batch within each group
        while pending:
            P0 = pending[0][2]
            group = [j for j in pending if j[2] == P0]
            if len(group) < args.batch_sequences and not force:
                return
            take = group[: args.batch_sequences] if not force else group
            for j in take:
                pending.remove(j)
            jobs = [(ind, s) for ind, s, _ in take]
            outs = grecon.optimize_many(jobs, pad_to=args.pad_to or 100)
            for (ind, s), out_dict in zip(jobs, outs):
                dump(ind["seq_name"], s, out_dict)
            if not force:
                return

    for seq in seqs:
        gt_file = os.path.join(dirs["root"], dirs["gt"], f"{seq}.pkl")
        if not os.path.isfile(gt_file):
            log.info(f"skip {seq}: missing {gt_file}")
            continue
        with open(gt_file, "rb") as f:
            gt_data = pickle.load(f)
        pose_est_dir = os.path.join(out_dir, "pose_est", seq)
        pose_pkl = os.path.join(pose_est_dir, "pose.pkl")
        if not os.path.isfile(pose_pkl):
            bbox_file = os.path.join(dirs["root"], dirs["bbox"], f"{seq}.pkl")
            image_dir = os.path.join(dirs["root"], dirs["images"], seq)
            pose_pkl = run_pose_est_on_video(
                None, image_dir, pose_est_dir,
                bbox_file=bbox_file if os.path.isfile(bbox_file) else None,
                cached=bool(args.cached))
        est = load_pose_pkl(pose_pkl)
        in_dict = {"est": est, "gt": gt_data["person_data"],
                   "gt_meta": gt_data.get("meta", {}), "seq_name": seq}
        T_seq = len(next(iter(est.values()))["bboxes_dict"]["exist"])
        pad = (-(-T_seq // args.pad_to) * args.pad_to) if args.pad_to else 0
        todo = [s for s in seeds if not (
            args.cached and os.path.isfile(
                os.path.join(out_dir, f"{seq}_seed{s}.pkl")))]
        if not todo:
            continue
        if args.batch_sequences:
            for s in todo:
                pending.append((in_dict, s, len(est)))
            flush_pending()
        elif args.vmap_seeds and len(todo) > 1:
            outs = grecon.optimize_multi_seed(in_dict, todo, pad_to=pad)
            for seed, out_dict in outs.items():
                dump(seq, seed, out_dict)
        else:
            for s in todo:
                dump(seq, s, grecon.optimize(in_dict, seed=s, pad_to=pad))
    if args.batch_sequences:
        flush_pending(force=True)


if __name__ == "__main__":
    main()
