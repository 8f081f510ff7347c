"""Offscreen 3D animation renderer (reference: lib/utils/visualizer3d.py,
a pyvista/VTK window loop). This implementation renders with a software
painter's-algorithm rasterizer on top of an intrinsics-matched pinhole
camera — no GL/X dependency — and writes videos via cv2. The public
surface mirrors the reference: subclass, override update_scene(frame),
call save_animation_as_video().
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import cv2
import numpy as np

from .video import frames_to_video


@dataclass
class Camera:
    """Pinhole render camera: 4x4 world->cam pose + intrinsics."""

    pose: np.ndarray           # (4, 4) world -> camera
    K: np.ndarray              # (3, 3)
    width: int = 960
    height: int = 540

    @classmethod
    def lookat(cls, eye, target, up=(0, 0, 1), fov_deg: float = 50.0,
               width: int = 960, height: int = 540) -> "Camera":
        eye = np.asarray(eye, np.float64)
        target = np.asarray(target, np.float64)
        fwd = target - eye
        fwd /= np.linalg.norm(fwd) + 1e-9
        right = np.cross(fwd, np.asarray(up, np.float64))
        right /= np.linalg.norm(right) + 1e-9
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd])          # world -> cam rows
        t = -R @ eye
        pose = np.eye(4)
        pose[:3, :3], pose[:3, 3] = R, t
        f = 0.5 * height / np.tan(np.radians(fov_deg) / 2)
        K = np.array([[f, 0, width / 2], [0, f, height / 2], [0, 0, 1]])
        return cls(pose=pose, K=K, width=width, height=height)

    @classmethod
    def from_intrinsics(cls, K: np.ndarray, pose: np.ndarray, width: int,
                        height: int) -> "Camera":
        """Match the video camera exactly (reference
        set_camera_instrinsics, visualizer3d.py:57-73)."""
        return cls(pose=np.asarray(pose, np.float64),
                   K=np.asarray(K, np.float64), width=width, height=height)

    def project(self, pts: np.ndarray):
        """(N, 3) world -> ((N, 2) pixels, (N,) depth)."""
        p = pts @ self.pose[:3, :3].T + self.pose[:3, 3]
        z = p[:, 2]
        z_safe = np.where(np.abs(z) < 1e-9, 1e-9, z)
        uv = (p / z_safe[:, None]) @ self.K.T
        return uv[:, :2], z


class Visualizer3D:
    """Painter's-algorithm scene renderer.

    Per frame, actors submit triangles / line segments / points; the
    renderer depth-sorts triangles and draws back-to-front. Subclasses
    override update_scene(fr) and use add_mesh/add_lines/add_points.
    """

    def __init__(self, width: int = 960, height: int = 540,
                 background=(28, 28, 34), show_ground: bool = True,
                 ground_z: float = 0.0):
        self.width, self.height = width, height
        self.background = np.array(background, np.uint8)
        self.show_ground = show_ground
        self.ground_z = ground_z
        self.camera: Optional[Camera] = None
        self.background_img: Optional[np.ndarray] = None
        self._tris: list = []
        self._lines: list = []
        self._points: list = []

    # ------------------------------------------------------------ scene API

    def add_mesh(self, verts: np.ndarray, faces: np.ndarray, color=(180, 180, 200),
                 opacity: float = 1.0):
        self._tris.append((np.asarray(verts, np.float64), np.asarray(faces),
                           np.asarray(color, np.float64), float(opacity)))

    def add_lines(self, starts: np.ndarray, ends: np.ndarray, color=(255, 80, 80),
                  thickness: int = 2):
        self._lines.append((np.asarray(starts, np.float64),
                            np.asarray(ends, np.float64), color, thickness))

    def add_points(self, pts: np.ndarray, color=(80, 255, 80), radius: int = 3):
        self._points.append((np.asarray(pts, np.float64), color, radius))

    def update_scene(self, fr: int):  # override
        raise NotImplementedError

    # ------------------------------------------------------------ rendering

    def _render_ground(self, img):
        """Checkerboard ground plane (the reference renders a checkerboard
        floor texture, lib/utils/vis.py checkerboard + vis_grecon ground)."""
        cam = self.camera
        n, ext = 10, 10.0
        step = 2 * ext / n
        shades = [(70, 70, 78), (95, 95, 105)]
        for i in range(n):
            for j in range(n):
                x0, y0 = -ext + i * step, -ext + j * step
                quad = np.array([
                    [x0, y0, self.ground_z], [x0 + step, y0, self.ground_z],
                    [x0 + step, y0 + step, self.ground_z],
                    [x0, y0 + step, self.ground_z]])
                uv, z = cam.project(quad)
                if (z <= 0.05).any():
                    continue
                cv2.fillConvexPoly(img, uv.astype(np.int32),
                                   shades[(i + j) % 2], cv2.LINE_AA)

    def _draw_segment(self, img, a, b, color, thickness):
        cam = self.camera
        uv, z = cam.project(np.stack([a, b]))
        if (z <= 0.05).any():
            return
        p0, p1 = uv.astype(int)
        cv2.line(img, tuple(p0), tuple(p1), color, thickness, cv2.LINE_AA)

    def render_frame(self, fr: int) -> np.ndarray:
        self._tris, self._lines, self._points = [], [], []
        self.update_scene(fr)
        cam = self.camera
        if self.background_img is not None:
            img = cv2.resize(self.background_img, (self.width, self.height)).copy()
        else:
            img = np.tile(self.background, (self.height, self.width, 1))
        img = np.ascontiguousarray(img)
        if self.show_ground and self.background_img is None:
            self._render_ground(img)

        # gather all triangles, depth sort, paint back to front
        polys = []
        for verts, faces, color, opacity in self._tris:
            uv, z = cam.project(verts)
            tz = z[faces].mean(axis=1)
            vis = (z[faces] > 0.05).all(axis=1)
            # simple lambert shade from face normal vs view dir
            v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
            nrm = np.cross(v1 - v0, v2 - v0)
            nrm /= np.linalg.norm(nrm, axis=1, keepdims=True) + 1e-9
            view = cam.pose[2, :3]
            shade = 0.4 + 0.6 * np.abs(nrm @ view)
            for f_idx in np.where(vis)[0]:
                polys.append((tz[f_idx], uv[faces[f_idx]].astype(np.int32),
                              tuple((color * shade[f_idx]).clip(0, 255)), opacity))
        polys.sort(key=lambda p: -p[0])
        for _, tri, color, opacity in polys:
            if opacity >= 1.0:
                cv2.fillConvexPoly(img, tri, color, cv2.LINE_AA)
            else:
                overlay = img.copy()
                cv2.fillConvexPoly(overlay, tri, color, cv2.LINE_AA)
                img = cv2.addWeighted(overlay, opacity, img, 1 - opacity, 0)

        for starts, ends, color, thickness in self._lines:
            for a, b in zip(starts, ends):
                self._draw_segment(img, a, b, color, thickness)
        for pts, color, radius in self._points:
            uv, z = cam.project(pts)
            for (u, v), zz in zip(uv, z):
                if zz > 0.05:
                    cv2.circle(img, (int(u), int(v)), radius, color, -1, cv2.LINE_AA)
        return img

    def save_animation_as_video(self, out_path: str, num_fr: int,
                                fps: float = 30.0, verbose: bool = False) -> str:
        """Render all frames and encode (reference
        save_animation_as_video, visualizer3d.py:241-262 — xvfb+ffmpeg
        there, pure software here)."""
        if self.camera is None:
            self.camera = Camera.lookat(eye=(4, -4, 2.5), target=(0, 0, 0.8),
                                        width=self.width, height=self.height)
        frames = []
        for fr in range(num_fr):
            frames.append(self.render_frame(fr))
            if verbose and fr % 50 == 0:
                print(f"rendered {fr}/{num_fr}")
        return frames_to_video(np.stack(frames), out_path, fps)
