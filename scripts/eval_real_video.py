"""Quantify the in-framework detector + tracker on REAL footage.

The synthetic-render training domain is only a means; the product claim
is "run_demo --detect works on the reference's own demo videos"
(reference flagship flow: global_recon/run_demo.py:52-120, which assumes
HybrIK-quality per-frame pose from pose_est/hybrik_demo/demo.py:170-234).
Real footage has no keypoint GT in this image, so this harness reports
the measurable proxies that separate "detector fires on people" from
"detector fires on noise":

  per-threshold detection rate   fraction of frames with >=1 detection
  person-count accuracy          fraction of frames with exactly the
                                 expected person count (--expect)
  score distribution             mean/median top-1 detection score
  track stability                identity count + coverage of the top-K
                                 tracks after tracker merging (a stable
                                 2-person clip should yield ~2 tracks
                                 covering most frames)

plus overlay contact sheets (detections drawn on real frames) under
--out_dir for qualitative spot-checks.

Usage:
    JAX_PLATFORMS=cpu python scripts/eval_real_video.py \
        --video /root/reference/assets/static/basketball.mp4 --expect 2
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--video", required=True)
    p.add_argument("--expect", type=int, default=None,
                   help="expected person count (known for the demo clips)")
    p.add_argument("--max_frames", type=int, default=240)
    p.add_argument("--stride", type=int, default=1,
                   help="frame subsampling stride")
    p.add_argument("--score_thresh", type=float, default=0.3,
               help="track SPAWN threshold (two-stage tracker); "
                    "detections are kept down to a 0.12 floor")
    p.add_argument("--detector_cfg", default="kp_detector_demo")
    p.add_argument("--out", default=None, help="metrics JSON path")
    p.add_argument("--out_dir", default="out/glamr_tpu/real_video_eval")
    p.add_argument("--sheet_frames", type=int, default=12)
    return p.parse_args()


def load_frames(path: str, max_frames: int, stride: int) -> np.ndarray:
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    i = 0
    while len(frames) < max_frames:
        ok, fr = cap.read()
        if not ok:
            break
        if i % stride == 0:
            frames.append(cv2.cvtColor(fr, cv2.COLOR_BGR2RGB))
        i += 1
    cap.release()
    if not frames:
        raise SystemExit(f"no frames decoded from {path}")
    return np.stack(frames)


def overlay_sheet(frames, dets, tracks, idxs, path, thresh):
    """Contact sheet of frames with detections (green dots + score) and
    track ids (colored pelvis markers)."""
    import cv2

    track_color = {}
    rng = np.random.default_rng(0)
    for pid in tracks:
        track_color[pid] = tuple(int(c) for c in rng.integers(60, 255, 3))
    tiles = []
    for t in idxs:
        img = frames[t].copy()
        d = dets[t]
        for i in range(len(d["scores"])):
            if not d["valid"][i] or d["scores"][i] < thresh:
                continue
            for (x, y) in d["kp_2d"][i]:
                cv2.circle(img, (int(x), int(y)), 3, (0, 255, 0), -1)
            cx, cy = d["centers"][i]
            cv2.putText(img, f"{d['scores'][i]:.2f}",
                        (int(cx), max(int(cy) - 8, 12)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.6, (255, 255, 0), 2)
        for pid, tr in tracks.items():
            w = np.where(np.asarray(tr["frames"]) == t)[0]
            if len(w):
                x, y = tr["kp_2d"][int(w[0]), 0]
                cv2.circle(img, (int(x), int(y)), 9, track_color[pid], 3)
        cv2.putText(img, f"t={t}", (8, 24), cv2.FONT_HERSHEY_SIMPLEX,
                    0.8, (255, 255, 255), 2)
        tiles.append(img)
    cols = 4
    rows = -(-len(tiles) // cols)
    h, w = tiles[0].shape[:2]
    sheet = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, tile in enumerate(tiles):
        r, c = divmod(i, cols)
        sheet[r * h:(r + 1) * h, c * w:(c + 1) * w] = tile
    cv2.imwrite(path, cv2.cvtColor(sheet, cv2.COLOR_RGB2BGR))


def main():
    args = parse_args()
    frames = load_frames(args.video, args.max_frames, args.stride)
    T, H, W = frames.shape[:3]
    print(f"{os.path.basename(args.video)}: {T} frames @ {W}x{H}")

    from glamr_tpu.pose_est.estimator import detect_video, load_detector
    from glamr_tpu.pose_est.tracker import track_detections
    from glamr_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    detector, params, cfg = load_detector(args.detector_cfg)
    print(f"detector cfg: {cfg.id}")

    # decode at a low floor so per-threshold sweeps see the full score
    # distribution; thresholds are applied below on the host
    dets = detect_video(frames, detector, params, score_thresh=0.05)

    top1 = np.array([
        float(d["scores"][d["valid"].astype(bool)].max())
        if d["valid"].any() else 0.0 for d in dets])
    metrics = {
        "video": os.path.basename(args.video),
        "frames": int(T),
        "resolution": [int(W), int(H)],
        "top1_score_mean": float(top1.mean()),
        "top1_score_median": float(np.median(top1)),
        "thresholds": {},
    }
    for th in (0.1, 0.2, 0.3, 0.5):
        counts = np.array([
            int(((d["scores"] >= th) & d["valid"].astype(bool)).sum())
            for d in dets])
        entry = {
            "det_rate": float((counts > 0).mean()),
            "mean_count": float(counts.mean()),
        }
        if args.expect is not None:
            entry["count_acc"] = float((counts == args.expect).mean())
        metrics["thresholds"][f"{th:.1f}"] = entry

    # product-shaped tracking: validity floor for recall, spawn gate for
    # precision (two-stage association, tracker.GreedyTracker)
    import inspect

    from glamr_tpu.pose_est.estimator import filter_person_tracks, video_pose_est

    floor = min(inspect.signature(video_pose_est)
                .parameters["det_floor"].default, args.score_thresh)
    tracks = track_detections(
        [{k: (v if k != "valid" else
              (v.astype(bool) & (d["scores"] >= floor)))
          for k, v in d.items()} for d in dets],
        spawn_score=args.score_thresh)
    lens = sorted((len(tr["frames"]) for tr in tracks.values()),
                  reverse=True)
    k = args.expect or min(len(lens), 2)
    metrics["tracks"] = {
        "num_tracks": len(lens),
        "track_lengths": lens[:8],
        f"top{k}_coverage": float(sum(lens[:k]) / (k * T)) if lens else 0.0,
        "score_thresh": args.score_thresh,
        "det_floor": floor,
    }

    # the PRODUCT operating point: what run_demo --detect actually emits
    # (video_pose_est = two-stage tracking + keypoint-evidence person
    # gate). det_rate/count here are per-frame over FILTERED tracks —
    # the identities the recon optimizer will see.
    filt = filter_person_tracks(tracks)
    cover = np.zeros((max(len(filt), 1), T), bool)
    for i, tr in enumerate(filt.values()):
        cover[i, np.asarray(tr["frames"], np.int64)] = True
    counts_tr = cover.sum(axis=0)
    flens = sorted((len(tr["frames"]) for tr in filt.values()), reverse=True)
    metrics["product"] = {
        "num_person_tracks": len(filt),
        "track_lengths": flens[:8],
        f"top{k}_coverage": (float(sum(flens[:k]) / (k * T))
                             if flens else 0.0),
        "det_rate": float((counts_tr > 0).mean()),
        "mean_kp_conf": [round(float(np.asarray(tr["conf"]).mean()), 3)
                         for tr in filt.values()],
    }
    if args.expect is not None:
        metrics["product"]["count_acc"] = float(
            (counts_tr == args.expect).mean())
    if args.expect is not None:
        metrics["expected_persons"] = args.expect

    os.makedirs(args.out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.video))[0]
    sheet_path = os.path.join(args.out_dir, f"{stem}_overlay.jpg")
    idxs = np.linspace(0, T - 1, min(args.sheet_frames, T)).astype(int)
    overlay_sheet(frames, dets, tracks, idxs, sheet_path, args.score_thresh)
    metrics["overlay_sheet"] = sheet_path

    out = args.out or os.path.join(args.out_dir, f"{stem}_metrics.json")
    with open(out, "w") as fh:
        json.dump(metrics, fh, indent=2)
    print(json.dumps(metrics, indent=2))
    print(f"wrote {out} and {sheet_path}")


if __name__ == "__main__":
    main()
