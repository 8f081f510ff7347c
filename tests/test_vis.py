"""Visualization smoke tests: renderer produces frames, video round-trips,
grecon visualizer consumes an optimize() out_dict."""
import os
import numpy as np
import pytest

from glamr_tpu.body import get_smpl
from glamr_tpu.vis import (
    GReconVisualizer,
    SMPLVisualizer,
    frames_to_video,
    video_to_frames,
)
from glamr_tpu.vis.renderer import Camera, Visualizer3D


class TestVideo:
    def test_roundtrip(self, tmp_path):
        frames = (np.random.default_rng(0).integers(0, 255, (5, 64, 96, 3))
                  .astype(np.uint8))
        out = frames_to_video(frames, str(tmp_path / "t.mp4"), fps=10)
        assert os.path.getsize(out) > 0
        n = video_to_frames(out, str(tmp_path / "frames"))
        assert n == 5


class TestRenderer:
    def test_render_mesh_and_lines(self):
        class V(Visualizer3D):
            def update_scene(self, fr):
                verts = np.array([[0, 0, 1], [1, 0, 1], [0, 1, 1.0]])
                self.add_mesh(verts, np.array([[0, 1, 2]]), (200, 50, 50))
                self.add_lines(np.zeros((1, 3)), np.ones((1, 3)))
                self.add_points(np.array([[0.5, 0.5, 1.0]]))

        v = V(width=160, height=120)
        v.camera = Camera.lookat(eye=(3, -3, 2), target=(0, 0, 1),
                                 width=160, height=120)
        img = v.render_frame(0)
        assert img.shape == (120, 160, 3)
        # something was drawn (not all background)
        assert (img != img[0, 0]).any()

    def test_zbuffer_occlusion(self):
        """A near triangle must hide a far one behind it (z-buffer), and
        a translucent near triangle must blend with, not replace, it."""

        def tri_at(dist, half=1.5):
            # camera looks down +y from (0, -5, 1) -> triangle faces it
            return np.array([[-half, dist, 1 - half],
                             [half, dist, 1 - half],
                             [0.0, dist, 1 + half]])

        class V(Visualizer3D):
            opacity_near = 1.0

            def update_scene(self, fr):
                self.add_mesh(tri_at(2.0), np.array([[0, 1, 2]]),
                              (0, 0, 255), 1.0)          # far: blue
                self.add_mesh(tri_at(0.0, half=0.6), np.array([[0, 1, 2]]),
                              (255, 0, 0), self.opacity_near)  # near: red

        v = V(width=160, height=120, show_ground=False)
        v.camera = Camera.lookat(eye=(0, -5, 1), target=(0, 0, 1),
                                 width=160, height=120)
        img = v.render_frame(0)
        c = img[60, 80].astype(int)
        # center pixel: near red wins over far blue
        assert c[0] > 150 and c[2] < 100, c
        # far triangle still visible outside the near one's silhouette
        left = img[74, 62].astype(int)
        assert left[2] > 150 and left[0] < 100, left

        v.opacity_near = 0.5
        img2 = v.render_frame(0)
        c2 = img2[60, 80].astype(int)
        # translucent near blends red with blue behind it
        assert c2[0] > 60 and c2[2] > 60, c2


class TestSMPLVisualizer:
    def test_side_by_side(self, tmp_path):
        smpl = get_smpl("body26fk", synthetic=True)
        rng = np.random.default_rng(0)
        T = 4
        motion = {
            "orient": rng.normal(0, 0.1, (T, 3)).astype(np.float32),
            "body_pose": rng.normal(0, 0.1, (T, 69)).astype(np.float32),
            "betas": np.zeros((T, 10), np.float32),
            "trans": np.tile(np.array([0, 0, 0.9], np.float32), (T, 1)),
            "visible": np.array([1, 1, 0, 1], np.float32),
        }
        v = SMPLVisualizer(smpl=smpl, width=160, height=120)
        v.set_motions([motion, motion])
        out = v.save_animation_as_video(str(tmp_path / "smpl.mp4"), num_fr=T)
        assert os.path.getsize(out) > 0


class TestGReconVisualizer:
    def test_world_and_cam_views(self, tmp_path):
        smpl = get_smpl("body26fk", synthetic=True)
        T = 4
        rng = np.random.default_rng(0)
        pd = {
            "smpl_orient_world": rng.normal(0, 0.1, (T, 3)).astype(np.float32),
            "smpl_pose": rng.normal(0, 0.1, (T, 69)).astype(np.float32),
            "smpl_beta": np.zeros((T, 10), np.float32),
            "root_trans_world": np.tile(np.array([0, 0, 0.9], np.float32), (T, 1)),
            "visible": np.ones(T, np.float32),
            "cam_K": np.tile(np.array([[500.0, 0, 80], [0, 500, 60], [0, 0, 1]],
                                      np.float32), (T, 1, 1)),
        }
        eye4 = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
        data = {"seq_len": T, "person_data": {0: pd},
                "cam_pose": eye4, "cam_pose_inv": eye4}
        for coord in ["world", "cam_in_world"]:
            v = GReconVisualizer(data, smpl=smpl, coord=coord,
                                 width=160, height=120)
            out = v.save_animation_as_video(str(tmp_path / f"{coord}.mp4"))
            assert os.path.getsize(out) > 0

    def test_pinned_render_camera(self, tmp_path):
        """Per-sequence render specs (reference vis_cfg.py): a pinned
        cam_pos/cam_focus overrides auto-framing in world view."""
        from glamr_tpu.vis.vis_cfg import get_render_spec

        assert get_render_spec("unknown_sequence") is None
        smpl = get_smpl("body26fk", synthetic=True)
        T = 2
        pd = {
            "smpl_orient_world": np.zeros((T, 3), np.float32),
            "smpl_pose": np.zeros((T, 69), np.float32),
            "smpl_beta": np.zeros((T, 10), np.float32),
            "root_trans_world": np.tile(np.array([0, 0, 0.9], np.float32), (T, 1)),
            "visible": np.ones(T, np.float32),
            "cam_K": np.tile(np.eye(3, dtype=np.float32), (T, 1, 1)),
        }
        eye4 = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
        data = {"seq_len": T, "person_data": {0: pd},
                "cam_pose": eye4, "cam_pose_inv": eye4}
        v = GReconVisualizer(data, smpl=smpl, coord="world",
                             cam_pos=(6.0, 0.1, 1.2), cam_focus=(0, 0, 0.8),
                             width=160, height=120)
        out = v.save_animation_as_video(str(tmp_path / "pinned.mp4"))
        assert os.path.getsize(out) > 0
        # the camera sits exactly at the pinned position
        eye = -v.camera.pose[:3, :3].T @ v.camera.pose[:3, 3]
        np.testing.assert_allclose(eye, [6.0, 0.1, 1.2], atol=1e-6)
