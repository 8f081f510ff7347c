"""3DPW preprocessing: sequenceFiles pkls -> GLAMR gt pose/bbox pickles.

Reference: preprocess/preprocess_3dpw.py:17-153. Per person:
{pose, shape, trans, root_trans, pose_cam, root_trans_cam, j3d, j2d,
 j3d_body26fk, j2d_body26fk, j2d_coco, visible, bbox}; meta holds
cam_pose/cam_K/campose_valid/image size. Visibility = >=6 confident
COCO keypoints AND valid campose (:65-67). Gendered SMPL when the model
files exist; neutral otherwise.
"""
from __future__ import annotations

import argparse
import glob
import os
import pickle
from collections import defaultdict
from typing import Optional

import numpy as np


def _coco_to_body26fk_map():
    from ..body.constants import get_joints_info

    src = get_joints_info("coco")
    dst = get_joints_info("body26fk")
    dst_by_name = {v: k for k, v in dst.name.items()}
    return np.array(sorted(
        (dst_by_name[v], k) for k, v in src.name.items() if v in dst_by_name),
        np.int64)


def _bbox_from_parts(parts, width, height):
    return np.array([max(parts[:, 0].min(), 0), max(parts[:, 1].min(), 0),
                     min(parts[:, 0].max(), width), min(parts[:, 1].max(), height)])


def convert_3dpw(data_path: str, output_path: str, split: str = "all",
                 j2d_conf_thresh: float = 0.3, smpl=None,
                 image_size: Optional[tuple] = None):
    """Convert every sequence pkl under data_path/sequenceFiles/<split>."""
    import cv2
    import jax.numpy as jnp

    from ..body.smpl import get_smpl
    from ..transforms import (angle_axis_to_rotation_matrix,
                              rotation_matrix_to_angle_axis)
    from ..vis.video import resize_bbox

    pose_path = os.path.join(output_path, "pose")
    bbox_path = os.path.join(output_path, "bbox")
    os.makedirs(pose_path, exist_ok=True)
    os.makedirs(bbox_path, exist_ok=True)
    files = sorted(glob.glob(os.path.join(data_path, "sequenceFiles", split, "*.pkl")))
    smpl30 = smpl or get_smpl("body30")
    coco_map = _coco_to_body26fk_map()

    for filename in files:
        with open(filename, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        seq_name = os.path.splitext(os.path.basename(filename))[0]
        if image_size is not None:
            width, height = image_size
        else:
            img0 = glob.glob(os.path.join(data_path, "imageFiles", seq_name, "*.jpg"))
            if img0:
                height, width = cv2.imread(sorted(img0)[0]).shape[:2]
            else:
                width, height = 1920, 1080
        K = np.asarray(data["cam_intrinsics"], np.float32)
        cam_pose = np.asarray(data["cam_poses"], np.float32)  # (T, 4, 4)
        num_people = len(data["poses"])
        num_frames = cam_pose.shape[0]

        output_dict, bbox_dict = defaultdict(dict), defaultdict(dict)
        for pid in range(num_people):
            pose = np.asarray(data["poses"][pid], np.float32)          # (T, 72)
            shape = np.asarray(data["betas"][pid][:10], np.float32)
            trans = np.asarray(data["trans"][pid], np.float32)
            j2d_coco = np.asarray(data["poses2d"][pid], np.float32).transpose(0, 2, 1)

            valid_cam = np.asarray(data["campose_valid"][pid]).astype(bool)
            valid_pose = ((j2d_coco[..., -1] > j2d_conf_thresh).sum(-1) >= 6)
            visible = (valid_pose & valid_cam).astype(np.int64)

            shape_t = np.tile(shape[None], (pose.shape[0], 1))
            out = smpl30.forward(
                jnp.asarray(pose[:, :3]), jnp.asarray(pose[:, 3:]),
                jnp.asarray(shape_t))
            # world joints; smplx applies transl additively
            j3d_w = np.asarray(out.joints) + trans[:, None, :]
            root_trans = np.asarray(out.joints24)[:, 0] + trans

            def to_cam(pts):
                h = np.concatenate([pts, np.ones_like(pts[..., :1])], -1)
                return np.einsum("tij,tnj->tni", cam_pose, h)[..., :3]

            j3d = to_cam(j3d_w)
            root_trans_cam = to_cam(root_trans[:, None])[:, 0]
            j2d_h = np.einsum("ij,tnj->tni", K, j3d)
            j2d = j2d_h[..., :2] / j2d_h[..., 2:]

            # camera-frame pose (orientation composed with cam rotation)
            R = np.asarray(angle_axis_to_rotation_matrix(jnp.asarray(pose[:, :3])))
            R_cam = np.einsum("tij,tjk->tik", cam_pose[:, :3, :3], R)
            orient_cam = np.asarray(
                rotation_matrix_to_angle_axis(jnp.asarray(R_cam)))
            pose_cam = pose.copy()
            pose_cam[:, :3] = orient_cam

            j2d_26 = np.zeros((num_frames, 26, 3), np.float32)
            j2d_26[:, coco_map[:, 0]] = j2d_coco[:, coco_map[:, 1]]

            bbox = np.stack([
                _bbox_from_parts(
                    np.concatenate([j2d[i],
                                    j2d_coco[i][j2d_coco[i][:, 2] > 0, :2]], 0),
                    width, height)
                for i in range(num_frames)])
            bbox = np.stack([resize_bbox(b, 1.2) for b in bbox])

            pd = {
                "pose": pose, "shape": shape, "trans": trans,
                "root_trans": root_trans.astype(np.float32),
                "pose_cam": pose_cam, "root_trans_cam": root_trans_cam.astype(np.float32),
                "j3d": j3d.astype(np.float32), "j2d": j2d.astype(np.float32),
                "j2d_body26fk": j2d_26, "j2d_coco": j2d_coco,
                "visible": visible, "bbox": bbox.astype(np.float32),
            }
            output_dict[pid] = pd
            find = np.where(visible)[0]
            bbox_dict[pid] = {
                "id": pid, "bbox": bbox, "exist": visible,
                "score": visible.astype(np.float32),
                "start": int(find[0]) if find.size else 0,
                "end": int(find[-1]) if find.size else 0,
                "num_frames": int(visible.sum()), "exist_frames": find,
            }

        out_dict = {"person_data": dict(output_dict),
                    "meta": {"cam_pose": cam_pose, "cam_K": K,
                             "campose_valid": data["campose_valid"],
                             "image_h": height, "image_w": width}}
        with open(os.path.join(pose_path, f"{seq_name}.pkl"), "wb") as f:
            pickle.dump(out_dict, f)
        with open(os.path.join(bbox_path, f"{seq_name}.pkl"), "wb") as f:
            pickle.dump(dict(bbox_dict), f)
        print(f"converted {seq_name}: {num_people} persons, {num_frames} frames")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", default="datasets/3DPW")
    parser.add_argument("--output_path", default="datasets/3DPW/processed_v1")
    parser.add_argument("--split", default="all")
    args = parser.parse_args(argv)
    convert_3dpw(args.data_path, args.output_path, args.split)


if __name__ == "__main__":
    main()
