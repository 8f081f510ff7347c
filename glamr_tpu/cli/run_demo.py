"""End-to-end video demo: pose est -> global recon -> videos.

Reference flow: global_recon/run_demo.py:20-120 (config glob, pose-est
subprocess, GlobalReconOptimizer.optimize per seed, pickle caching,
GReconVisualizer renders).
"""
from __future__ import annotations

import argparse
import os
import pickle


def main(argv=None):
    from ..utils.cache import enable_compile_cache
    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", default="glamr_static")
    parser.add_argument("--video_path", default=None)
    parser.add_argument("--out_dir", default="out/glamr_tpu/demo")
    parser.add_argument("--pose_est_dir", default=None)
    parser.add_argument("--seeds", default="1", help="comma-separated")
    parser.add_argument("--cached", type=int, default=1)
    parser.add_argument("--vis", type=int, default=1)
    parser.add_argument("--html", action="store_true",
                        help="also export interactive HTML viewers")
    parser.add_argument("--multi", action="store_true")
    parser.add_argument("--synthetic_pose_est", action="store_true",
                        help="generate a synthetic pose.pkl (no HybrIK needed)")
    parser.add_argument("--kp_file", default=None,
                        help="2D keypoint tracks pickle "
                             "{pid: {kp_2d (Tv,24,2), frames, conf?}, "
                             "'cam_K', 'num_fr'} — runs the in-framework "
                             "lifter estimator (pose_est/estimator.py) "
                             "instead of the HybrIK subprocess")
    parser.add_argument("--detect", action="store_true",
                        help="run the fully in-framework stage 1 on "
                             "--video_path: conv detector -> tracker -> "
                             "lifter -> pose.pkl (pose_est/estimator.py "
                             "video_pose_est) — no HybrIK, no external "
                             "detector")
    parser.add_argument("--block_per_stage", action="store_true",
                        help="debug timing: force each stage program to "
                             "completion so per-stage log lines show true "
                             "device time (default: async dispatch)")
    parser.add_argument("--num_fr", type=int, default=150,
                        help="frames for --synthetic_pose_est without video")
    parser.add_argument("--traj_prior", default="cfg",
                        choices=["cfg", "on", "off"],
                        help="override flag_use_traj_prior: off = hybrid "
                             "mode (motion infiller completes occluded "
                             "pose, trajectory base stays est-derived); "
                             "cfg = use the config's setting")
    args = parser.parse_args(argv)

    import numpy as np

    from ..models import load_joint_model
    from ..pose_est import load_pose_pkl, run_pose_est_on_video, synthetic_pose_est
    from ..recon import GlobalReconOptimizer
    from ..utils import Config, create_logger

    cfg = Config(args.cfg, out_dir=args.out_dir, create_dirs=True)
    log = create_logger(os.path.join(args.out_dir, "log.txt"))
    seeds = [int(s) for s in str(args.seeds).split(",")]

    seq_name = (os.path.splitext(os.path.basename(args.video_path))[0]
                if args.video_path else "synthetic")
    pose_est_dir = args.pose_est_dir or os.path.join(args.out_dir, "pose_est", seq_name)

    pose_pkl = os.path.join(pose_est_dir, "pose.pkl")
    if args.cached and os.path.isfile(pose_pkl):
        est = load_pose_pkl(pose_pkl)
    elif args.synthetic_pose_est:
        est = synthetic_pose_est(args.num_fr, num_persons=2 if args.multi else 1,
                                 pose_est_dir=pose_est_dir)
    elif args.detect:
        from ..pose_est.estimator import video_pose_est
        from ..vis.video import _read_video

        frames, _ = _read_video(args.video_path)
        est = video_pose_est(frames, pose_est_dir=pose_est_dir)
    elif args.kp_file:
        from ..pose_est.estimator import run_lifter_on_tracks

        with open(args.kp_file, "rb") as f:
            kp_data = pickle.load(f)
        cam_K = np.asarray(kp_data.pop("cam_K"))
        num_fr = int(kp_data.pop("num_fr"))
        est = run_lifter_on_tracks(kp_data, cam_K, num_fr,
                                   pose_est_dir=pose_est_dir)
    else:
        pose_pkl = run_pose_est_on_video(
            args.video_path, os.path.join(pose_est_dir, "frames"),
            pose_est_dir, cached=bool(args.cached), multi=args.multi)
        est = load_pose_pkl(pose_pkl)

    joint_model = None
    if args.traj_prior != "cfg":
        cfg.get("grecon_model_specs", {})["flag_use_traj_prior"] = \
            args.traj_prior == "on"
        log.info(f"traj prior override: flag_use_traj_prior="
                 f"{args.traj_prior == 'on'}")
    if cfg.get("grecon_model_specs", {}).get("flag_infer_motion_traj") and \
            "motion_traj_cfg" in cfg.get("grecon_model_specs", {}):
        try:
            joint_model = load_joint_model(
                Config(cfg.grecon_model_specs["motion_traj_cfg"]))
        except FileNotFoundError as e:
            log.info(f"joint model unavailable ({e}); using est-derived traj")

    grecon = GlobalReconOptimizer(cfg, joint_model=joint_model, log=log,
                                  block_per_stage=args.block_per_stage)
    in_dict = {"est": est, "gt": {}, "gt_meta": {}, "seq_name": seq_name}

    outs = {}
    for seed in seeds:
        out_file = os.path.join(args.out_dir, f"{seq_name}_seed{seed}.pkl")
        if args.cached and os.path.isfile(out_file):
            with open(out_file, "rb") as f:
                outs[seed] = pickle.load(f)
            continue
        out_dict = grecon.optimize(in_dict, seed=seed)
        with open(out_file, "wb") as f:
            pickle.dump(out_dict, f)
        outs[seed] = out_dict
        log.info(f"seed {seed}: wrote {out_file}")

    if args.vis:
        from ..vis import GReconVisualizer
        from ..vis.vis_cfg import get_render_spec

        out_dict = outs[seeds[0]]
        spec = get_render_spec(seq_name) or {}
        for coord in ["world", "cam_in_world"]:
            v = GReconVisualizer(out_dict, smpl=grecon.smpl, coord=coord,
                                 background_video=args.video_path, **spec)
            path = os.path.join(args.out_dir, f"{seq_name}_{coord}.mp4")
            v.save_animation_as_video(path)
            log.info(f"wrote {path}")
            if args.html and coord == "world":
                h = v.save_interactive_html(path[:-4] + ".html")
                log.info(f"wrote {h}")
    return outs


if __name__ == "__main__":
    main()
