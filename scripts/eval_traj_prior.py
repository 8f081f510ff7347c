"""Standalone trajectory-prior calibration diagnostic.

GLAMR's dynamic-camera global trajectory comes almost entirely from the
trajectory predictor (reference traj_pred/models/traj_pred_vae.py:500-519
conditioned on joint positions; global_recon_model.py:353-445 keeps it as
the base the optimizer perturbs) — with a person-derived camera, 2D
evidence cannot see a common-mode trajectory error, so the PRIOR'S OWN
CALIBRATION bounds G-MPJPE. This harness measures that calibration
directly, per motion family, with no optimizer in the loop:

  phantom_walk_m   predicted total xy displacement on STATIONARY
                   families (idle/march/gesture/crouch/turn-in-place) —
                   the measured round-4 failure was 1.9 m of spurious
                   walk on a stationary sequence
  final_disp_err   | pred - gt | final xy displacement, locomotion
  path_rmse        xy RMSE over time vs GT
  speed_corr       per-frame speed correlation (pose -> velocity
                   readability; ~0 when the decoder leans on its latent)

Decodes at the prior mean (eps=0) and at K prior samples (the optimizer
starts from prior samples, reference get_latent :613-616).

Usage (CPU-safe; does not touch the TPU claim):
    JAX_PLATFORMS=cpu python scripts/eval_traj_prior.py \
        --out benchmarks/traj_prior_calibration.json
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STATIONARY = ("idle", "march", "gesture", "crouch", "turn")


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--num_seqs", type=int, default=64)
    p.add_argument("--seq_len", type=int, default=200)
    p.add_argument("--data_seed", type=int, default=999,
                   help="held-out seed (training uses a different one)")
    p.add_argument("--eps_samples", type=int, default=3)
    p.add_argument("--trajpred_ckpt", default=None,
                   help="explicit trajpred checkpoint path (a results "
                        "best.pkl or a release .params.pkl); default = "
                        "newest trained version (which may be a live run)")
    p.add_argument("--out", default=None)
    return p.parse_args()


def main():
    args = parse_args()
    from glamr_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from glamr_tpu.body.smpl import get_smpl
    from glamr_tpu.data.procedural import procedural_motions
    from glamr_tpu.models.joint_model import load_joint_model
    from glamr_tpu.models.traj_pred import predict_multi_step
    from glamr_tpu.transforms import angle_axis_to_quaternion, get_heading
    from glamr_tpu.utils.config import Config

    smpl = get_smpl("body26fk", synthetic=True)
    jm = load_joint_model(Config("joint_motion_traj_demo"), smpl=smpl,
                          require_checkpoints=True)
    if args.trajpred_ckpt:
        from glamr_tpu.utils.checkpoint import (extract_params,
                                                load_checkpoint)
        jm.trajpred_params = extract_params(
            load_checkpoint(args.trajpred_ckpt))
        print("trajpred params overridden from", args.trajpred_ckpt)

    motions = procedural_motions(args.num_seqs, args.seq_len, args.seq_len,
                                 seed=args.data_seed)
    kinds = [m["name"].split("_")[1] for m in motions]
    poses = np.stack([m["poses"] for m in motions])      # (B, T, 72)
    trans = np.stack([m["trans"] for m in motions])      # (B, T, 3)

    body_pose = jnp.asarray(poses[:, :, 3:])
    joint_pos = jm.smpl.joint_pos_from_body_pose(body_pose)
    orient_q = angle_axis_to_quaternion(jnp.asarray(poses[:, :, :3]))
    init_heading = get_heading(orient_q[:, 0])
    init_xy = jnp.asarray(trans[:, 0, :2])

    B = poses.shape[0]
    nz = jm.trajpred.cfg.nz
    rng = np.random.default_rng(0)
    eps_list = [np.zeros((B, nz), np.float32)] + [
        rng.standard_normal((B, nz)).astype(np.float32)
        for _ in range(args.eps_samples)
    ]

    gt_xy = trans[:, :, :2]
    gt_speed = np.linalg.norm(np.diff(gt_xy, axis=1), axis=-1) * 30.0

    per_eps = []
    for ei, eps in enumerate(eps_list):
        out = predict_multi_step(jm.trajpred, jm.trajpred_params,
                                 joint_pos, jnp.asarray(eps),
                                 init_xy=init_xy, init_heading=init_heading)
        pred_xy = np.asarray(out["out_trans"][:, :, :2])
        pred_speed = np.linalg.norm(np.diff(pred_xy, axis=1), axis=-1) * 30.0
        rows = []
        for b in range(B):
            gt_disp = float(np.linalg.norm(gt_xy[b, -1] - gt_xy[b, 0]))
            pr_disp = float(np.linalg.norm(pred_xy[b, -1] - pred_xy[b, 0]))
            sc = np.corrcoef(gt_speed[b], pred_speed[b])[0, 1] \
                if gt_speed[b].std() > 1e-4 else np.nan
            rows.append({
                "kind": kinds[b],
                "gt_disp_m": gt_disp,
                "pred_disp_m": pr_disp,
                "final_err_m": float(np.linalg.norm(
                    pred_xy[b, -1] - gt_xy[b, -1])),
                "path_rmse_m": float(np.sqrt(
                    ((pred_xy[b] - gt_xy[b]) ** 2).sum(-1).mean())),
                "speed_corr": None if np.isnan(sc) else float(sc),
            })
        per_eps.append(rows)

    def agg(rows, key, sel=None):
        v = [r[key] for r in rows
             if (sel is None or sel(r)) and r[key] is not None]
        return round(float(np.mean(v)), 4) if v else None

    summary = {"families": {}, "eps0_is_prior_mean": True,
               "num_seqs": B, "seq_len": args.seq_len,
               "data_seed": args.data_seed}
    fam_names = sorted(set(kinds))
    for fam in fam_names:
        sel = lambda r, f=fam: r["kind"] == f
        summary["families"][fam] = {
            "n": kinds.count(fam),
            "prior_mean": {
                "pred_disp_m": agg(per_eps[0], "pred_disp_m", sel),
                "gt_disp_m": agg(per_eps[0], "gt_disp_m", sel),
                "final_err_m": agg(per_eps[0], "final_err_m", sel),
                "path_rmse_m": agg(per_eps[0], "path_rmse_m", sel),
                "speed_corr": agg(per_eps[0], "speed_corr", sel),
            },
            "prior_samples_final_err_m": round(float(np.mean([
                agg(rows, "final_err_m", sel) for rows in per_eps[1:]
            ])), 4) if len(per_eps) > 1 else None,
        }
    stationary_rows = [r for r in per_eps[0] if r["kind"] in STATIONARY]
    loco_rows = [r for r in per_eps[0]
                 if r["kind"] not in STATIONARY]
    summary["headline"] = {
        "phantom_walk_m_stationary": agg(stationary_rows, "pred_disp_m"),
        "path_rmse_m_locomotion": agg(loco_rows, "path_rmse_m"),
        "final_err_m_locomotion": agg(loco_rows, "final_err_m"),
        "speed_corr_locomotion": agg(loco_rows, "speed_corr"),
    }
    print(json.dumps(summary["headline"], indent=1))
    for fam in fam_names:
        f = summary["families"][fam]["prior_mean"]
        print(f"{fam:10s} n={summary['families'][fam]['n']:2d} "
              f"pred_disp {f['pred_disp_m']} gt_disp {f['gt_disp_m']} "
              f"final_err {f['final_err_m']} speed_corr {f['speed_corr']}")
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as fh:
            json.dump(summary, fh, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
