"""H36M conversion + Dynamic-H36M synthetic dynamic-camera occlusion.

Reference: preprocess/preprocess_h36m.py (convert_h36m :71 — SMPL fits at
50 fps subsampled to 25 fps, per-camera world->cam conversion, same
per-person schema as the 3DPW converter) and
preprocess/preprocess_h36m_occluded.py — a crop window follows a
sinusoidal trajectory around the person (gen_sinusoidal_traj :20-24);
keypoint visibility and bboxes are recomputed against the crop, cropped
images are written, and the updated pose/bbox pickles form the
Dynamic-H36M benchmark (docs/prepare_dynamic_h36m.md). The occlusion
synthesis is data-level fault injection and a product feature
(SURVEY.md §5.3).
"""
from __future__ import annotations

import argparse
import glob
import os
import pickle
from typing import Optional

import numpy as np

# subject gender map (reference preprocess_h36m.py:23-31)
H36M_GENDERS = {1: "f", 5: "f", 6: "m", 7: "f", 8: "m", 9: "m", 11: "m"}


def convert_h36m_sequence(pose: np.ndarray, shape: np.ndarray, trans: np.ndarray,
                          cam_R: np.ndarray, cam_t: np.ndarray, cam_K: np.ndarray,
                          smpl=None, image_size=(1000, 1000),
                          gt_jpos_world: Optional[np.ndarray] = None,
                          subsample: int = 2) -> tuple[dict, dict]:
    """One H36M sequence + one camera -> (pose_pkl dict, bbox dict).

    pose (T, 72) / shape (T, 10) / trans (T, 3): world-frame SMPL fits at
    50 fps; subsampled ::subsample to 25 fps like the reference (:125-150).
    Output schema matches the 3DPW converter (j3d/j2d/pose_cam/bbox/...).
    """
    import jax.numpy as jnp

    from ..body.smpl import get_smpl
    from ..transforms import (angle_axis_to_rotation_matrix,
                              rotation_matrix_to_angle_axis)
    from ..vis.video import resize_bbox

    smpl = smpl or get_smpl("body30")
    pose = np.asarray(pose, np.float32)[::subsample]
    shape = np.asarray(shape, np.float32)[::subsample]
    trans = np.asarray(trans, np.float32)[::subsample]
    T = pose.shape[0]
    width, height = image_size
    cam_pose = np.eye(4, dtype=np.float32)
    cam_pose[:3, :3] = cam_R
    cam_pose[:3, 3] = cam_t

    out = smpl.forward(jnp.asarray(pose[:, :3]), jnp.asarray(pose[:, 3:]),
                       jnp.asarray(shape), root_trans=jnp.asarray(trans))
    j3d_w = np.asarray(out.joints)
    root_trans = np.asarray(out.joints24)[:, 0]

    def to_cam(pts):
        h = np.concatenate([pts, np.ones_like(pts[..., :1])], -1)
        return np.einsum("ij,tnj->tni", cam_pose, h)[..., :3]

    j3d = to_cam(j3d_w)
    root_trans_cam = to_cam(root_trans[:, None])[:, 0]
    j2d_h = np.einsum("ij,tnj->tni", cam_K, j3d)
    j2d = j2d_h[..., :2] / j2d_h[..., 2:]

    R = np.asarray(angle_axis_to_rotation_matrix(jnp.asarray(pose[:, :3])))
    R_cam = np.einsum("ij,tjk->tik", cam_pose[:3, :3], R)
    pose_cam = pose.copy()
    pose_cam[:, :3] = np.asarray(rotation_matrix_to_angle_axis(jnp.asarray(R_cam)))

    visible = np.ones(T, np.int64)
    bbox = np.stack([
        np.array([max(j2d[i, :, 0].min(), 0), max(j2d[i, :, 1].min(), 0),
                  min(j2d[i, :, 0].max(), width), min(j2d[i, :, 1].max(), height)])
        for i in range(T)])
    bbox = np.stack([resize_bbox(b, 1.2) for b in bbox]).astype(np.float32)

    pd = {
        "pose": pose, "shape": shape[0], "trans": trans,
        "root_trans": root_trans.astype(np.float32),
        "pose_cam": pose_cam, "root_trans_cam": root_trans_cam.astype(np.float32),
        "j3d": j3d.astype(np.float32), "j2d": j2d.astype(np.float32),
        "visible": visible, "bbox": bbox,
    }
    if gt_jpos_world is not None:
        gt = np.asarray(gt_jpos_world, np.float32)[::subsample]
        pd["j3d_h36m"] = to_cam(gt).astype(np.float32)
        pd["j3d_h36m_world"] = gt
    find = np.where(visible)[0]
    bb = {"id": 0, "bbox": bbox, "exist": visible,
          "score": visible.astype(np.float32),
          "start": int(find[0]), "end": int(find[-1]),
          "num_frames": int(visible.sum()), "exist_frames": find}
    pose_pkl = {"person_data": {0: pd},
                "meta": {"cam_pose": cam_pose[None].repeat(T, 0),
                         "cam_K": np.asarray(cam_K, np.float32),
                         "image_h": height, "image_w": width}}
    return pose_pkl, {0: bb}


def convert_h36m(h36m_folder: str, out_folder: str, subject_id: int,
                 smpl_fit_data: dict, smpl=None, image_size=(1000, 1000)):
    """Driver over the Human36M annotation layout (reference :71-230):
    cameras from annotations/Human36M_subject<k>_camera.json, SMPL fits
    from a consolidated dict {'S<k>-<action>': {'pose','shape','trans'}},
    sequences s_<k>_act_<a>_subact_<s>_ca_<c>."""
    import json

    pose_path = os.path.join(out_folder, "pose")
    bbox_path = os.path.join(out_folder, "bbox")
    os.makedirs(pose_path, exist_ok=True)
    os.makedirs(bbox_path, exist_ok=True)
    cam_file = os.path.join(h36m_folder, "annotations",
                            f"Human36M_subject{subject_id}_camera.json")
    with open(cam_file) as f:
        cams = json.load(f)

    for seq_key, fit in smpl_fit_data.items():
        if not seq_key.startswith(f"S{subject_id}-") and \
                not seq_key.startswith(f"s_{subject_id:02d}"):
            continue
        for cam_id in range(1, 5):
            cam = cams[str(cam_id)]
            R = np.asarray(cam["R"], np.float32)
            t = np.asarray(cam["t"], np.float32) * 0.001
            K = np.eye(3, dtype=np.float32)
            K[[0, 1], [0, 1]] = np.asarray(cam["f"], np.float32).ravel()[:2]
            K[:2, 2] = np.asarray(cam["c"], np.float32).ravel()[:2]
            pose_pkl, bb = convert_h36m_sequence(
                fit["pose"], fit["shape"], fit["trans"], R, t, K,
                smpl=smpl, image_size=image_size,
                gt_jpos_world=fit.get("gt_jpos"))
            name = f"{seq_key}_ca_{cam_id:02d}"
            with open(os.path.join(pose_path, f"{name}.pkl"), "wb") as f:
                pickle.dump(pose_pkl, f)
            with open(os.path.join(bbox_path, f"{name}.pkl"), "wb") as f:
                pickle.dump(bb, f)
            print(f"converted {name}")


DEFAULT_SPECS = {
    "crop_w": 1000, "crop_h": 1000,
    "magnitude": [450, 20], "period": 300,
    "kp_margin": 20, "min_vis_kp": 6,
}


def gen_sinusoidal_traj(orig_traj: np.ndarray, magnitude, period) -> np.ndarray:
    """Sinusoidal offset around a base trajectory (reference :20-24)."""
    t = np.arange(orig_traj.shape[0]).astype(float)
    offset = np.sin(t * (2 * np.pi / period))[:, None] * np.asarray(magnitude, float)
    return orig_traj + offset


def create_occluded_scene(pose_path: str, bbox_path: str, img_path: Optional[str],
                          save_path: str, seq_name: str,
                          specs: Optional[dict] = None) -> dict:
    """One sequence -> occluded scene (reference :27-151).

    Works image-free too (img_path=None): geometry (crop window, updated
    kp/visibility/bboxes/intrinsics) is always produced; cropped images
    are written only when the source frames exist.
    """
    import cv2

    specs = {**DEFAULT_SPECS, **(specs or {})}
    img_size = np.array([specs["crop_w"], specs["crop_h"]], float)
    hsize = img_size * 0.5
    with open(os.path.join(pose_path, f"{seq_name}.pkl"), "rb") as f:
        scene = pickle.load(f)
    with open(os.path.join(bbox_path, f"{seq_name}.pkl"), "rb") as f:
        bbox_dict = pickle.load(f)
    pose_dict = scene["person_data"]
    pid = 0  # single-person benchmark
    orig_size = np.array([scene["meta"]["image_w"], scene["meta"]["image_h"]], float)

    # crop-window center follows a sinusoid around the person bbox center,
    # clamped inside the original image
    bbox = np.asarray(bbox_dict[pid]["bbox"], float)
    center = (bbox[:, :2] + bbox[:, 2:]) * 0.5
    new_center = np.round(gen_sinusoidal_traj(center, specs["magnitude"],
                                              specs["period"]))
    new_center = np.maximum(hsize[None], new_center)
    new_center = np.minimum((orig_size - hsize)[None], new_center)
    img_ul = new_center - hsize
    img_bbox = np.concatenate([img_ul, new_center + hsize], axis=-1)

    # shift 2D keypoints into crop coordinates, recompute visibility
    pd = pose_dict[pid]
    for key in ["j2d", "j2d_body26fk", "j2d_coco"]:
        if key in pd:
            kp = np.asarray(pd[key], float).copy()
            kp[..., :2] -= img_ul[:, None, :]
            pd[key] = kp.astype(np.float32)
    kp = pd["j2d"]
    m = specs["kp_margin"]
    inside = ((kp[..., 0] > -m) & (kp[..., 0] < img_size[0] + m) &
              (kp[..., 1] > -m) & (kp[..., 1] < img_size[1] + m))
    visible = (inside.sum(-1) >= specs["min_vis_kp"]).astype(np.int64)
    pd["visible"] = visible

    # clip person bbox to the crop
    pb = np.asarray(pd["bbox"], float).copy()
    pb[:, 0::2] -= img_ul[:, :1]
    pb[:, 1::2] -= img_ul[:, 1:]
    pb[:, 0::2] = pb[:, 0::2].clip(0, img_size[0])
    pb[:, 1::2] = pb[:, 1::2].clip(0, img_size[1])
    pd["bbox"] = pb.astype(np.float32)

    # principal point shifts with the crop
    K = np.asarray(scene["meta"]["cam_K"], float).copy()
    if K.ndim == 2:
        K = np.tile(K, (len(img_ul), 1, 1))
    K[:, 0, 2] -= img_ul[:, 0]
    K[:, 1, 2] -= img_ul[:, 1]
    scene["meta"]["cam_K"] = K.astype(np.float32)
    scene["meta"]["image_w"] = int(img_size[0])
    scene["meta"]["image_h"] = int(img_size[1])
    scene["meta"]["crop_bbox"] = img_bbox.astype(np.float32)

    find = np.where(visible)[0]
    bbox_dict[pid].update(
        bbox=pd["bbox"], exist=visible, score=visible.astype(np.float32),
        start=int(find[0]) if find.size else 0,
        end=int(find[-1]) if find.size else 0,
        num_frames=int(visible.sum()), exist_frames=find)

    os.makedirs(os.path.join(save_path, "pose"), exist_ok=True)
    os.makedirs(os.path.join(save_path, "bbox"), exist_ok=True)
    with open(os.path.join(save_path, "pose", f"{seq_name}.pkl"), "wb") as f:
        pickle.dump(scene, f)
    with open(os.path.join(save_path, "bbox", f"{seq_name}.pkl"), "wb") as f:
        pickle.dump(bbox_dict, f)

    if img_path is not None:
        img_files = sorted(glob.glob(os.path.join(img_path, seq_name, "*.jpg")))
        if img_files:
            out_dir = os.path.join(save_path, "images", seq_name)
            os.makedirs(out_dir, exist_ok=True)
            for i, f in enumerate(img_files[: len(img_ul)]):
                img = cv2.imread(f)
                x0, y0 = img_ul[i].astype(int)
                crop = img[y0: y0 + int(img_size[1]), x0: x0 + int(img_size[0])]
                cv2.imwrite(os.path.join(out_dir, os.path.basename(f)), crop)
    return scene


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--processed_path", default="datasets/H36M/processed_v1")
    parser.add_argument("--img_path", default=None)
    parser.add_argument("--save_path", default="datasets/H36M/occluded_v2")
    parser.add_argument("--sequences", default=None)
    args = parser.parse_args(argv)
    pose_path = os.path.join(args.processed_path, "pose")
    bbox_path = os.path.join(args.processed_path, "bbox")
    seqs = (args.sequences.split(",") if args.sequences else
            [os.path.splitext(os.path.basename(f))[0]
             for f in sorted(glob.glob(os.path.join(pose_path, "*.pkl")))])
    for seq in seqs:
        create_occluded_scene(pose_path, bbox_path, args.img_path,
                              args.save_path, seq)
        print(f"occluded scene written for {seq}")


if __name__ == "__main__":
    main()
