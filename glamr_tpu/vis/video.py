"""Video / image-sequence utilities (reference: lib/utils/vis.py, which
shells out to ffmpeg; this uses cv2 so no external binary is needed).
"""
from __future__ import annotations

import glob
import os
from typing import Optional, Sequence

import cv2
import numpy as np


def video_to_frames(video_path: str, frame_dir: str, fps: Optional[float] = None,
                    verbose: bool = False) -> int:
    """Extract frames to frame_dir/%06d.jpg (reference vis.py video_to_images).
    Returns the number of frames written."""
    os.makedirs(frame_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {video_path}")
    src_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    step = 1.0 if fps is None else src_fps / fps
    n_out, acc, i = 0, 0.0, 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i >= acc:
            cv2.imwrite(os.path.join(frame_dir, f"{n_out:06d}.jpg"), frame)
            n_out += 1
            acc += step
        i += 1
    cap.release()
    if verbose:
        print(f"wrote {n_out} frames to {frame_dir}")
    return n_out


def frames_to_video(frames, out_path: str, fps: float = 30.0) -> str:
    """frames: directory of images, list of paths, or (T, H, W, 3) uint8
    RGB array -> mp4 (reference vis.py images_to_video)."""
    if isinstance(frames, str):
        frames = sorted(glob.glob(os.path.join(frames, "*.jpg"))) + \
            sorted(glob.glob(os.path.join(frames, "*.png")))
    if isinstance(frames, (list, tuple)):
        imgs = [cv2.imread(f) for f in frames]          # BGR
        imgs = [cv2.cvtColor(im, cv2.COLOR_BGR2RGB) for im in imgs]
    else:
        imgs = list(np.asarray(frames))
    if not imgs:
        raise ValueError("no frames to encode")
    h, w = imgs[0].shape[:2]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    vw = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for im in imgs:
        vw.write(cv2.cvtColor(im.astype(np.uint8), cv2.COLOR_RGB2BGR))
    vw.release()
    return out_path


def _read_video(path: str) -> tuple[np.ndarray, float]:
    cap = cv2.VideoCapture(path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    cap.release()
    return np.stack(frames) if frames else np.zeros((0, 1, 1, 3), np.uint8), fps


def _stack_videos(paths: Sequence[str], out_path: str, axis: int,
                  labels: Optional[Sequence[str]] = None) -> str:
    """hstack/vstack with optional drawtext labels (reference vis.py:70-130)."""
    vids, fps = zip(*[_read_video(p) for p in paths])
    T = min(v.shape[0] for v in vids)
    H = min(v.shape[1] for v in vids)
    W = min(v.shape[2] for v in vids)
    vids = [np.stack([cv2.resize(f, (W, H)) for f in v[:T]]) for v in vids]
    if labels:
        for v, lab in zip(vids, labels):
            for f in v:
                draw_text(f, lab)
    out = np.concatenate(vids, axis=2 if axis == 1 else 1)
    return frames_to_video(out, out_path, fps[0])


def hstack_videos(paths, out_path, labels=None):
    return _stack_videos(paths, out_path, axis=1, labels=labels)


def vstack_videos(paths, out_path, labels=None):
    return _stack_videos(paths, out_path, axis=0, labels=labels)


def draw_text(img: np.ndarray, text: str, pos=(8, 24), scale: float = 0.7,
              color=(255, 255, 255)):
    cv2.putText(img, text, pos, cv2.FONT_HERSHEY_SIMPLEX, scale, (0, 0, 0), 3,
                cv2.LINE_AA)
    cv2.putText(img, text, pos, cv2.FONT_HERSHEY_SIMPLEX, scale, color, 1,
                cv2.LINE_AA)
    return img


def draw_bbox(img: np.ndarray, bbox, color=(0, 255, 0), thickness: int = 2):
    x0, y0, x1, y1 = [int(v) for v in bbox]
    cv2.rectangle(img, (x0, y0), (x1, y1), color, thickness)
    return img


def resize_bbox(bbox, scale: float):
    """Scale a bbox about its center (reference vis.py)."""
    x0, y0, x1, y1 = bbox
    cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
    w, h = (x1 - x0) * scale / 2, (y1 - y0) * scale / 2
    return [cx - w, cy - h, cx + w, cy + h]


def checkerboard_texture(n: int = 8, size: int = 64) -> np.ndarray:
    """Checkerboard ground texture (reference vis.py)."""
    tile = np.indices((n, n)).sum(0) % 2
    img = np.kron(tile, np.ones((size, size)))[..., None]
    return (img * 80 + 150).astype(np.uint8).repeat(3, axis=-1)
