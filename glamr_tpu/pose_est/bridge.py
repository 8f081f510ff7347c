"""Stage-1 bridge: video -> per-frame 3D pose estimates (pose.pkl).

The reference runs HybrIK as a separate conda env + subprocess with the
filesystem as the protocol (pose_est/run_pose_est_demo.py:12-28,
pose_est/hybrik_demo/demo.py emits pose.pkl). HybrIK is torch/CUDA and
stays an external subprocess here too — the bridge:

  * extracts frames (cv2, no ffmpeg binary needed),
  * invokes the HybrIK demo via the env vars HYBRIK_PYTHON / HYBRIK_DIR
    (mirroring the reference's hard-coded conda env at :25-28),
  * caches on pose.pkl existence (:13-14),
  * validates the emitted schema,
  * and offers an explicit *synthetic* estimator so the full pipeline is
    runnable without HybrIK (demo/testing only — clearly opt-in).

pose.pkl schema (per person id; reference demo.py:200-234,316-345):
  smpl_pose_quat_wroot (Tv, 24, 3, 3) rotation matrices
  smpl_beta (Tv, 10) | root_trans (Tv, 3) | kp_2d (Tv, >=24, 2)
  cam_K (Tv, 3, 3) | frames (Tv,) | bboxes_dict {exist (T,), bbox, ...}
"""
from __future__ import annotations

import os
import pickle
import subprocess
from typing import Optional

import numpy as np

POSE_PKL_SCHEMA = {
    "smpl_pose_quat_wroot": 4,  # ndim
    "smpl_beta": 2,
    "root_trans": 2,
    "kp_2d": 3,
    "cam_K": 3,
}


def validate_pose_dict(est: dict) -> None:
    for pid, pd in est.items():
        if "bboxes_dict" not in pd or "exist" not in pd["bboxes_dict"]:
            raise ValueError(f"person {pid}: missing bboxes_dict.exist")
        tv = int(np.asarray(pd["bboxes_dict"]["exist"]).sum())
        for key, ndim in POSE_PKL_SCHEMA.items():
            if key not in pd:
                raise ValueError(f"person {pid}: missing '{key}'")
            arr = np.asarray(pd[key])
            if arr.ndim != ndim or arr.shape[0] != tv:
                raise ValueError(
                    f"person {pid}: '{key}' shape {arr.shape} inconsistent "
                    f"with {tv} visible frames (want ndim {ndim})")


def load_pose_pkl(path: str) -> dict:
    with open(path, "rb") as f:
        est = pickle.load(f)
    validate_pose_dict(est)
    return est


def run_pose_est_on_video(video_path: str, image_dir: str, pose_est_dir: str,
                          pose_est_cfg: Optional[str] = None,
                          bbox_file: Optional[str] = None,
                          cached: bool = True,
                          multi: bool = False) -> str:
    """Extract frames + run HybrIK; returns the pose.pkl path.

    Reference: run_pose_est_on_video (run_pose_est_demo.py:12-28). The
    HybrIK installation is located via $HYBRIK_PYTHON (interpreter in the
    hybrik env) and $HYBRIK_DIR (repo checkout); absent those, raises
    with instructions (or use synthetic_pose_est explicitly).
    """
    from ..vis.video import video_to_frames

    pose_pkl = os.path.join(pose_est_dir, "pose.pkl")
    if cached and os.path.isfile(pose_pkl):
        return pose_pkl
    os.makedirs(pose_est_dir, exist_ok=True)
    if not os.path.isdir(image_dir) or not os.listdir(image_dir):
        video_to_frames(video_path, image_dir)

    hybrik_python = os.environ.get("HYBRIK_PYTHON")
    hybrik_dir = os.environ.get("HYBRIK_DIR")
    if not hybrik_python or not hybrik_dir:
        raise RuntimeError(
            "HybrIK not configured: set HYBRIK_PYTHON (interpreter of the "
            "hybrik env) and HYBRIK_DIR (HybrIK checkout), or pass a "
            "precomputed pose.pkl, or use synthetic_pose_est for demos.")
    script = "demo_dataset.py" if bbox_file else "demo.py"
    cmd = [hybrik_python, os.path.join("pose_est", "hybrik_demo", script),
           "--img_dir", os.path.abspath(image_dir),
           "--out_dir", os.path.abspath(pose_est_dir)]
    if bbox_file:
        cmd += ["--bbox_file", os.path.abspath(bbox_file)]
    if multi:
        cmd += ["--multi"]
    subprocess.run(cmd, cwd=hybrik_dir, check=True)
    return pose_pkl


def synthetic_pose_est(num_fr: int, num_persons: int = 1, seed: int = 0,
                       img_w: int = 1920, img_h: int = 1080,
                       pose_est_dir: Optional[str] = None) -> dict:
    """Generate a schema-valid synthetic pose.pkl (demo/testing without
    HybrIK). Persons stand ~3m from the camera with smooth random motion;
    kp_2d is the projection of the generated joints, so downstream
    optimization is self-consistent. Focal length fixed at 1000 with the
    principal point at the image center, like the reference demo
    (demo.py:175-199)."""
    import jax
    import jax.numpy as jnp

    from ..body.smpl import get_smpl
    from ..body.constants import smpl_to_body26fk_map
    from ..transforms import angle_axis_to_rotation_matrix

    # data generation runs on the CPU backend (tiny ops; avoid remote-TPU
    # compile round-trips)
    from ..utils.cache import host_prep_scope
    with host_prep_scope():
        return _synthetic_pose_est_impl(
            num_fr, num_persons, seed, img_w, img_h, pose_est_dir)


def _synthetic_pose_est_impl(num_fr, num_persons, seed, img_w, img_h,
                             pose_est_dir):
    import jax.numpy as jnp

    from ..body.smpl import get_smpl
    from ..body.constants import smpl_to_body26fk_map
    from ..transforms import angle_axis_to_rotation_matrix

    rng = np.random.default_rng(seed)
    smpl = get_smpl("body26fk")
    K = np.array([[1000.0, 0, img_w / 2], [0, 1000.0, img_h / 2], [0, 0, 1]],
                 np.float32)
    m = smpl_to_body26fk_map()
    est = {}
    for pid in range(num_persons):
        exist = np.ones(num_fr, np.float32)
        if pid > 0:  # later persons get an occlusion gap
            a = num_fr // 3
            exist[a: a + max(num_fr // 6, 1)] = 0
        tv = int(exist.sum())
        orient = np.array([1.2092, 1.2092, 1.2092], np.float32)[None] + \
            np.cumsum(rng.normal(0, 0.004, (tv, 3)), 0).astype(np.float32)
        body = np.cumsum(rng.normal(0, 0.006, (tv, 69)), 0).astype(np.float32)
        beta = np.tile(rng.normal(0, 0.3, (1, 10)).astype(np.float32), (tv, 1))
        drift = np.cumsum(rng.normal(0, 0.008, (tv, 3)), 0)
        root = (np.array([0.8 * pid - 0.4, 0.1, 3.5]) + drift).astype(np.float32)
        joints = np.asarray(smpl.joints_fast(
            jnp.asarray(orient), jnp.asarray(body), jnp.asarray(beta),
            root_trans=jnp.asarray(root)))
        kp26 = np.einsum("ij,tnj->tni", K, joints / joints[..., 2:3])[..., :2]
        kp24 = np.zeros((tv, 24, 2), np.float32)
        kp24[:, m[:, 1]] = kp26[:, m[:, 0]]
        rotmats = np.asarray(angle_axis_to_rotation_matrix(jnp.asarray(
            np.concatenate([orient[:, None], body.reshape(tv, 23, 3)], 1))))
        frames = np.where(exist)[0]
        est[pid] = {
            "smpl_pose_quat_wroot": rotmats.astype(np.float32),
            "smpl_beta": beta, "root_trans": root,
            "kp_2d": kp24, "cam_K": np.tile(K, (tv, 1, 1)),
            "frames": frames,
            "frame2ind": {int(f): i for i, f in enumerate(frames)},
            "bboxes_dict": {"exist": exist},
        }
    validate_pose_dict(est)
    if pose_est_dir is not None:
        os.makedirs(pose_est_dir, exist_ok=True)
        with open(os.path.join(pose_est_dir, "pose.pkl"), "wb") as f:
            pickle.dump(est, f)
    return est
