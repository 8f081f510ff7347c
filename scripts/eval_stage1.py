"""Quantify the in-framework stage 1 (detector -> tracker -> lifter -> IK)
on held-out synthetic data, plus the end-to-end --detect -> recon metric.

The reference delegates stage 1 to an external HybrIK conda env
(pose_est/run_pose_est_demo.py:25-28, hybrik_demo/demo.py:170-234); the
rebuild replaces it with in-framework jit-compiled models. This script
produces the accuracy numbers that make that replacement a measured
claim rather than a capability claim:

  1. detector:  person recall/precision + keypoint PCK@0.05 on held-out
     synthetic renders (normalization: 0.05 * max bbox side, the standard
     PCK convention)
  2. lifter:    root-relative 3D MPJPE (mm, all/visible/occluded frames)
     + root depth error on held-out keypoint tracks
  3. IK:        analytic twist-swing IK reconstruction error (mm) from GT
     joints (with GT twists and with zero twists)
  4. e2e:       rendered video -> video_pose_est -> GlobalReconOptimizer
     -> Evaluator (PA-MPJPE / G-MPJPE / ACCEL vs the synthetic GT)

Usage (after `glamr-train --model detector` / `--model lifter`):
    python scripts/eval_stage1.py --out out/stage1_metrics.json
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--seed", type=int, default=123,
                   help="held-out seed (training uses seed 1 data)")
    p.add_argument("--num_det", type=int, default=64,
                   help="detector eval images")
    p.add_argument("--num_lift", type=int, default=64,
                   help="lifter eval windows")
    p.add_argument("--num_ik", type=int, default=256,
                   help="IK eval frames")
    p.add_argument("--e2e_frames", type=int, default=120)
    p.add_argument("--out", default="out/glamr_tpu/stage1_metrics.json")
    p.add_argument("--detector_cfg", default="kp_detector_demo")
    p.add_argument("--lifter_cfg", default="kp_lifter_demo")
    p.add_argument("--recon_cfg", default="glamr_static")
    p.add_argument("--skip_e2e", action="store_true")
    return p.parse_args()


def eval_detector(model, params, dcfg, smpl, data, rng, num_imgs):
    """Recall / precision / PCK@0.05 over held-out rendered scenes."""
    import jax
    import jax.numpy as jnp

    from glamr_tpu.pose_est.detector import decode_detections
    from glamr_tpu.pose_est.synth_images import DetectorDataGen

    gen = DetectorDataGen(data, smpl, cfg=dcfg)
    fwd = jax.jit(lambda imgs: model.apply(params, imgs))
    n_gt = n_det = n_match = 0
    pck_hits = pck_tot = 0
    for _ in range(num_imgs):
        s = gen.sample(rng)
        out = fwd(jnp.asarray(s["images"][None]))
        det = decode_detections(
            {k: np.asarray(v) for k, v in out.items()}, dcfg,
            score_thresh=0.3)  # spawn-level: per-image detector quality at the track-spawn gate
        valid = det["valid"][0].astype(bool)
        det_kp = det["kp_2d"][0][valid]                  # (D, K, 2) pixels
        det_ctr = det["centers"][0][valid]               # (D, 2) x,y pixels
        n_det += int(valid.sum())

        gt_mask = s["gt_person_mask"].astype(bool)
        used = np.zeros(valid.sum(), bool)
        for p in np.where(gt_mask)[0]:
            n_gt += 1
            kp_gt = s["gt_kp_2d"][p]                     # (K, 2), 0 if invis
            vis = s["gt_kp_vis"][p].astype(bool)
            if not vis.any():
                continue
            bbox_side = max((kp_gt[vis].max(0) - kp_gt[vis].min(0)).max(),
                            1.0)
            ctr_gt = kp_gt[0]                            # pelvis
            if det_ctr.shape[0] == 0:
                continue
            d = np.linalg.norm(det_ctr - ctr_gt, axis=-1)
            d[used] = np.inf
            j = int(np.argmin(d))
            if d[j] > 0.5 * bbox_side:                   # unmatched person
                continue
            used[j] = True
            n_match += 1
            err = np.linalg.norm(det_kp[j][vis] - kp_gt[vis], axis=-1)
            pck_hits += int((err < 0.05 * bbox_side).sum())
            pck_tot += int(vis.sum())
    return {
        "recall": n_match / max(n_gt, 1),
        "precision": n_match / max(n_det, 1),
        "PCK@0.05": pck_hits / max(pck_tot, 1),
        "num_images": num_imgs, "num_gt_persons": n_gt,
    }


def eval_lifter(model, params, smpl, data, rng, num_windows, seq_len=32):
    """Root-relative 3D MPJPE (mm) split by frame visibility + root depth."""
    import jax
    import jax.numpy as jnp

    from glamr_tpu.pose_est.synth import LifterDataGen

    gen = LifterDataGen(data, smpl, seq_len=seq_len)
    fwd = jax.jit(lambda kp, vis: model.apply(params, kp, vis))
    errs_all, errs_vis, errs_invis, root_err = [], [], [], []
    B = 16
    n_eval = max(num_windows // B, 1) * B
    for _ in range(max(num_windows // B, 1)):
        b = gen.batch(rng, B)
        out = fwd(jnp.asarray(b["kp_2d"]), jnp.asarray(b["vis"]))
        jp = np.asarray(out["jpos_rel"])                 # (B, S, 24, 3)
        gt = b["gt_jpos_rel"]
        e = np.linalg.norm(jp - gt, axis=-1).mean(-1)    # (B, S) m
        frame_vis = b["vis"].mean(-1) > 0.5              # (B, S)
        errs_all.append(e.ravel())
        errs_vis.append(e[frame_vis])
        errs_invis.append(e[~frame_vis])
        root = np.asarray(out["root_trans"])
        root_err.append(
            np.linalg.norm(root - b["gt_root_trans"], axis=-1).ravel())
    cat = lambda xs: (np.concatenate([x for x in xs if x.size])
                      if any(x.size for x in xs) else np.array([np.nan]))
    return {
        "MPJPE_mm": float(cat(errs_all).mean() * 1000),
        "MPJPE_vis_mm": float(cat(errs_vis).mean() * 1000),
        "MPJPE_occluded_mm": float(cat(errs_invis).mean() * 1000),
        "root_err_mm": float(cat(root_err).mean() * 1000),
        "num_windows": n_eval, "seq_len": seq_len,
    }


def eval_ik(smpl, data, rng, num_frames):
    """Analytic twist-swing IK: GT joints -> pose -> FK joints (mm), and
    geodesic pose error, with GT twists vs zero twists."""
    import jax.numpy as jnp

    from glamr_tpu.body.lbs import lbs
    from glamr_tpu.pose_est.ik import hybrik, twist_angles

    flat = np.concatenate(list(data.values()))
    idx = rng.choice(flat.shape[0], size=num_frames, replace=False)
    theta = flat[idx]
    pose = jnp.asarray(theta[:, 3:75])
    beta = jnp.asarray(theta[:, 75:85])
    _, j_gt = lbs(smpl.model, beta, pose, want_verts=False)
    tw_gt = twist_angles(smpl.model, pose, beta)

    res = {}
    for name, tw in [("gt_twist", tw_gt),
                     ("zero_twist", jnp.zeros_like(tw_gt))]:
        pose_ik = hybrik(smpl.model, j_gt, tw, beta)
        _, j_ik = lbs(smpl.model, beta, pose_ik, want_verts=False)
        jerr = float(jnp.linalg.norm(j_ik - j_gt, axis=-1).mean() * 1000)
        # geodesic angle between GT and IK per-joint rotations
        from glamr_tpu.transforms import angle_axis_to_rotation_matrix
        R1 = angle_axis_to_rotation_matrix(pose.reshape(-1, 24, 3))
        R2 = angle_axis_to_rotation_matrix(pose_ik.reshape(-1, 24, 3))
        tr = jnp.einsum("...ij,...ij->...", R1, R2)
        ang = jnp.arccos(jnp.clip((tr - 1) / 2, -1, 1))
        res[name] = {"joint_err_mm": jerr,
                     "pose_geodesic_deg": float(jnp.degrees(ang).mean())}
    res["num_frames"] = num_frames
    return res


def eval_e2e(det_model, det_params, dcfg, lift_model, lift_params,
             smpl, data, rng, num_fr, recon_cfg_id):
    """Rendered video -> in-framework stage 1 -> recon -> Evaluator."""
    import jax.numpy as jnp

    from glamr_tpu.body.lbs import lbs
    from glamr_tpu.eval import Evaluator
    from glamr_tpu.pose_est.estimator import video_pose_est
    from glamr_tpu.pose_est.synth import lookat_cam
    from glamr_tpu.pose_est.synth_images import render_mesh_image
    from glamr_tpu.recon import GlobalReconOptimizer
    from glamr_tpu.transforms import (angle_axis_to_rotation_matrix,
                                      rotation_matrix_to_angle_axis)
    from glamr_tpu.utils import Config

    # one held-out walking sequence, fixed LEVEL camera (so the camera
    # frame maps to z-up by a constant x-rotation, applied to BOTH est
    # and GT before global metrics)
    theta = list(data.values())[0][:num_fr]
    T = theta.shape[0]
    verts, joints = lbs(smpl.model, jnp.asarray(theta[:, 75:85]),
                        jnp.asarray(theta[:, 3:75]))
    verts = np.asarray(verts) + theta[:, None, :3]
    joints = np.asarray(joints) + theta[:, None, :3]
    center = joints[:, 0].mean(axis=0)
    eye = center + np.array([3.8, 0.6, 0.0])
    eye[2] = center[2]                                  # level camera
    R, cpos = lookat_cam(eye, center)
    size = dcfg.img_size
    f = size * 1.15
    K = np.array([[f, 0, size / 2], [0, f, size / 2], [0, 0, 1]], np.float32)
    frames = np.stack([
        (render_mesh_image([verts[t]], smpl.faces, R, cpos, K, size, rng)
         * 255).astype(np.uint8) for t in range(T)])

    est = video_pose_est(frames, cam_K=K,
                         detector=det_model, detector_params=det_params,
                         lifter=lift_model, lifter_params=lift_params,
                         smpl=smpl)
    if not est:
        return {"error": "no person track detected"}
    # single-person scene: score the dominant track (the GT dict has one
    # person); any survivors beyond it are reported, not scored
    extra_tracks = len(est) - 1
    if extra_tracks:
        est = [max(est, key=lambda e: e["frames"].shape[0])]

    # stage-1-level root decomposition (pre-recon): est root vs GT pelvis
    # in the camera frame, split into depth (the weakly-observed
    # dimension) and in-image xy — isolates how much of the e2e G-MPJPE
    # stage 1 itself contributes vs the recon/trajectory layer
    fr = np.asarray(est[0]["frames"], np.int64)
    gt_root_cam = np.einsum("ij,tj->ti", R, joints[:, 0] - cpos)
    er = np.asarray(est[0]["root_trans"], np.float32)
    gr = gt_root_cam[fr]
    gaps = np.setdiff1d(np.arange(T), fr)
    stage1_root = {
        "root_err_mm": float(np.linalg.norm(er - gr, axis=-1).mean() * 1000),
        "root_err_max_mm": float(np.linalg.norm(er - gr, axis=-1).max() * 1000),
        "depth_err_mm": float(np.abs(er[:, 2] - gr[:, 2]).mean() * 1000),
        "xy_err_mm": float(
            np.linalg.norm(er[:, :2] - gr[:, :2], axis=-1).mean() * 1000),
        "track_span": [int(fr[0]), int(fr[-1])],
        "untracked_frames": [int(g) for g in gaps[:50]],
    }

    # GT in the camera frame (world == camera for the static-cam config)
    Rj = jnp.asarray(R, jnp.float32)
    gt_orient_w = angle_axis_to_rotation_matrix(jnp.asarray(theta[:, 3:6]))
    gt_orient_c = rotation_matrix_to_angle_axis(Rj[None] @ gt_orient_w)
    # pelvis joint (not trans) is the evaluator's root convention here:
    # root_trans of the GT dict feeds SMPL root re-anchoring, so pass the
    # same quantity the estimate carries (pelvis position in cam frame)
    gt_root_c = np.einsum("ij,tj->ti", R, joints[:, 0] - cpos)
    gt_pose = np.concatenate([np.asarray(gt_orient_c), theta[:, 6:75]], -1)
    gt = {0: {"pose": gt_pose.astype(np.float32),
              "shape": theta[:, 75:85].astype(np.float32),
              "root_trans": gt_root_c.astype(np.float32)}}

    cfg = Config(recon_cfg_id)
    # full flagship graph: the joint CVAE model (trained checkpoints when
    # present) infills occluded motion and predicts the global trajectory
    # inside the optimize, matching the run_demo pipeline scope
    from glamr_tpu.models import load_joint_model
    jm = load_joint_model(Config(cfg.grecon_model_specs["motion_traj_cfg"]),
                          smpl=smpl)
    opt = GlobalReconOptimizer(cfg, joint_model=jm, smpl=smpl)
    t0 = time.time()
    out = opt.optimize({"est": est, "gt": gt, "gt_meta": {},
                        "seq_name": "stage1_e2e"})
    wall = time.time() - t0

    # recon-level root error in the shared cam-anchored gauge (hybrid
    # default: world == identity camera), before any rotation/alignment
    pd0 = list(out["person_data"].values())[0]
    rw = np.asarray(pd0["root_trans_world"], np.float32)
    if len(rw) == len(gt_root_c):
        ge = np.asarray(pd0.get("exist_frames",
                                np.ones(len(rw), bool))).astype(bool)
        recon_root_err_mm = float(np.linalg.norm(
            rw[ge] - gt_root_c[ge], axis=-1).mean() * 1000)
    else:
        recon_root_err_mm = float("nan")

    # rotate BOTH est and GT from the (level) camera frame to z-up: the
    # camera's -y axis is world up, so Rx(-90deg) maps y-down -> z-up
    rot = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float32)
    rj = jnp.asarray(rot)

    def rot_person(pd):
        o = angle_axis_to_rotation_matrix(
            jnp.asarray(np.asarray(pd["smpl_orient_world"], np.float32)))
        pd["smpl_orient_world"] = np.asarray(
            rotation_matrix_to_angle_axis(rj[None] @ o))
        pd["root_trans_world"] = np.asarray(pd["root_trans_world"]) @ rot.T

    for pd in out["person_data"].values():
        rot_person(pd)
    for g in out["gt"].values():
        og = angle_axis_to_rotation_matrix(jnp.asarray(g["pose"][:, :3]))
        g["pose"] = np.concatenate([
            np.asarray(rotation_matrix_to_angle_axis(rj[None] @ og)),
            g["pose"][:, 3:]], -1)
        g["root_trans"] = g["root_trans"] @ rot.T
    # sanity: up must now be +z for the GT (pelvis height positive; a
    # sign/axis error in the camera->world mapping would flip this)
    assert out["gt"][0]["root_trans"][:, 2].mean() > 0

    ev = Evaluator(algo="glamr_tpu", dataset="", smpl=smpl)
    md = ev.compute_sequence_metrics(out, accumulate=False)
    # some metrics accumulate arrays (per-seed sample metrics); report means
    metrics = {k: float(np.mean(v.avg)) for k, v in md["metrics"].items()}
    metrics.update({"stage1_root": stage1_root,
                    "recon_root_err_mm": recon_root_err_mm})
    metrics.update({"recon_wall_s": wall, "num_fr": T,
                    "tracked_frames": int(est[0]["frames"].shape[0]),
                    "extra_tracks": extra_tracks})
    return metrics


def main():
    args = parse_args()
    import jax

    from glamr_tpu.body.smpl import get_smpl
    from glamr_tpu.data import procedural_amass_data
    from glamr_tpu.pose_est.estimator import load_detector, load_lifter
    from glamr_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    smpl = get_smpl("body26fk", synthetic=True)
    # held-out motions: a different procedural seed than training (seed 1)
    data, _, _, _ = procedural_amass_data(16, seed=args.seed)
    rng = np.random.default_rng(args.seed)

    det_model, det_params, det_cfg = load_detector(args.detector_cfg)
    lift_model, lift_params, _ = load_lifter(args.lifter_cfg)
    from glamr_tpu.pose_est.detector import DetectorConfig
    dcfg = DetectorConfig.from_dict(det_cfg.model_specs)

    results = {"seed": args.seed}
    print("== detector ==")
    results["detector"] = eval_detector(det_model, det_params, dcfg, smpl,
                                        data, rng, args.num_det)
    print(json.dumps(results["detector"], indent=2))
    print("== lifter ==")
    results["lifter"] = eval_lifter(lift_model, lift_params, smpl, data,
                                    rng, args.num_lift)
    print(json.dumps(results["lifter"], indent=2))
    print("== analytic IK ==")
    results["ik"] = eval_ik(smpl, data, rng, args.num_ik)
    print(json.dumps(results["ik"], indent=2))
    if not args.skip_e2e:
        print("== end-to-end (detect -> recon -> metrics) ==")
        results["e2e"] = eval_e2e(det_model, det_params, dcfg, lift_model,
                                  lift_params, smpl, data, rng,
                                  args.e2e_frames, args.recon_cfg)
        print(json.dumps(results["e2e"], indent=2))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
