"""Greedy multi-person track association.

The reference tracks people with an external YOLOv3 + MPT tracker
(hybrik_demo/demo.py:114-142) and carries identities via bboxes_dict.
Here detections come from the in-framework detector (pose_est/
detector.py); association is greedy nearest-center matching with a
pixel gate and a miss tolerance — simple, deterministic, and sufficient
for the smooth trajectories the detector produces. Output is the
`tracks` dict consumed by pose_est.estimator.run_lifter_on_tracks.
"""
from __future__ import annotations

import numpy as np


class GreedyTracker:
    """Frame-by-frame greedy association by center distance, two-stage.

    Two-stage (ByteTrack-style) association: high-score detections
    (score >= spawn_score) are matched to active tracks first and may
    SPAWN new tracks; low-score detections are matched second, to the
    tracks still unmatched, and may only EXTEND existing tracks — never
    start one. This decouples recall (detect_video can run at a low
    threshold so established tracks survive weak frames) from precision
    (clutter below spawn_score cannot create identities, so the dominant
    track is never fragmented by low-score false positives — the
    measured failure when the raw threshold alone was lowered).

    max_dist: matching gate in pixels (scaled by image size / 128).
    max_miss: frames a track survives without a detection.
    min_len:  tracks shorter than this are dropped at finalize().
    spawn_score: minimum detection score to START a new track.
    """

    def __init__(self, max_dist: float = 48.0, max_miss: int = 10,
                 min_len: int = 5, spawn_score: float = 0.3):
        self.max_dist = max_dist
        self.max_miss = max_miss
        self.min_len = min_len
        self.spawn_score = spawn_score
        self._tracks: list[dict] = []
        self._next_id = 0

    def _greedy_match(self, frame_idx, active, used_tr, det_ids, centers,
                      kp_2d, kp_conf, scores, used_det):
        """Greedy closest-pair matching of `active` tracks (not yet
        used_tr) against detections det_ids (not yet used_det)."""
        cand = [d for d in det_ids if not used_det[d]]
        if not active or not cand:
            return
        tc = np.stack([t["last_center"] for t in active])       # (A, 2)
        dist = np.linalg.norm(tc[:, None] - centers[None, cand], axis=-1)
        local_used = np.zeros(len(cand), bool)
        while True:
            a, j = np.unravel_index(np.argmin(
                np.where(used_tr[:, None] | local_used[None], np.inf, dist)
            ), dist.shape)
            if used_tr[a] or local_used[j] or dist[a, j] > self.max_dist:
                break
            d = cand[j]
            t = active[a]
            t["frames"].append(frame_idx)
            t["kp_2d"].append(np.asarray(kp_2d[d], np.float32))
            t["conf"].append(np.asarray(kp_conf[d], np.float32))
            t["scores"].append(float(scores[d]))
            t["last_center"] = centers[d]
            t["last_frame"] = frame_idx
            used_tr[a] = local_used[j] = used_det[d] = True
            if used_tr.all() or local_used.all():
                break

    def update(self, frame_idx: int, centers, kp_2d, kp_conf, scores):
        """centers (D, 2), kp_2d (D, K, 2), kp_conf (D, K), scores (D,) —
        valid detections of one frame."""
        centers = np.asarray(centers, np.float32)
        scores = np.asarray(scores, np.float32)
        D = centers.shape[0]
        active = [t for t in self._tracks
                  if frame_idx - t["last_frame"] <= self.max_miss]
        used_det = np.zeros(D, bool)
        used_tr = np.zeros(len(active), bool)

        high = [d for d in range(D) if scores[d] >= self.spawn_score]
        low = [d for d in range(D) if scores[d] < self.spawn_score]
        # stage 1: confident detections against all active tracks
        self._greedy_match(frame_idx, active, used_tr, high, centers,
                           kp_2d, kp_conf, scores, used_det)
        # stage 2: weak detections may extend still-unmatched tracks
        self._greedy_match(frame_idx, active, used_tr, low, centers,
                           kp_2d, kp_conf, scores, used_det)

        for d in high:
            if used_det[d]:
                continue
            self._tracks.append({
                "id": self._next_id,
                "frames": [frame_idx],
                "kp_2d": [np.asarray(kp_2d[d], np.float32)],
                "conf": [np.asarray(kp_conf[d], np.float32)],
                "scores": [float(scores[d])],
                "last_center": centers[d],
                "last_frame": frame_idx,
            })
            self._next_id += 1

    def finalize(self) -> dict:
        """-> {person_id: {'frames' (Tv,), 'kp_2d' (Tv, K, 2),
        'conf' (Tv, K)}} with ids renumbered by track start."""
        tracks = [t for t in self._tracks if len(t["frames"]) >= self.min_len]
        tracks.sort(key=lambda t: (t["frames"][0], t["id"]))
        return {
            pid: {
                "frames": np.asarray(t["frames"], np.int64),
                "kp_2d": np.stack(t["kp_2d"]),
                "conf": np.stack(t["conf"]),
                "scores": np.asarray(t["scores"], np.float32),
            }
            for pid, t in enumerate(tracks)
        }


def merge_tracks(tracks: dict, merge_dist: float = 96.0, max_gap: int = 90,
                 overlap_tol: int = 10) -> dict:
    """Chain track fragments of the same person across detection gaps.

    When the detector loses a person for longer than the tracker's
    max_miss (occlusion, pose the detector was not trained on), the
    track restarts under a NEW id even though the person barely moved.
    Downstream this matters twice over: the global recon optimizer
    treats every id as a distinct person, and the motion infiller
    exists precisely to fill in-track gaps (reference carries stable
    identities across misses via its MPT tracker,
    hybrik_demo/demo.py:114-142 — gaps inside a track become the
    invisible frames the infiller completes, global_recon_model.py:353).

    Greedy chronological chaining: fragments sorted by start frame; a
    later fragment joins an earlier chain when its start lies within
    max_gap frames after the chain's end (temporal overlaps up to
    overlap_tol (default 10: double-detection handoffs measured on the
    basketball demo overlap the old fragment by ~6 frames before the
    ghost dies) are resolved by dropping the overlapping head of the
    later fragment) and the chain-end / fragment-start keypoint centers
    are within merge_dist pixels. Among eligible chains the nearest by
    center wins, so two people standing apart never cross-merge.
    """
    frags = sorted(tracks.values(),
                   key=lambda t: (int(t["frames"][0]), int(t["frames"][-1])))
    chains: list[dict] = []
    for f in frags:
        frames = np.asarray(f["frames"], np.int64)
        kp = np.asarray(f["kp_2d"], np.float32)
        conf = np.asarray(f["conf"], np.float32)
        scores = np.asarray(f.get("scores", np.ones(len(frames))),
                            np.float32)
        start_c = kp[0].mean(axis=0)
        best, best_d = None, np.inf
        for ch in chains:
            gap = int(frames[0]) - int(ch["frames"][-1])
            if gap > max_gap or gap < -overlap_tol:
                continue
            d = float(np.linalg.norm(ch["kp_2d"][-1].mean(axis=0) - start_c))
            if d <= merge_dist and d < best_d:
                best, best_d = ch, d
        if best is None:
            chains.append({"frames": frames, "kp_2d": kp, "conf": conf,
                           "scores": scores})
            continue
        keep = frames > best["frames"][-1]
        best["frames"] = np.concatenate([best["frames"], frames[keep]])
        best["kp_2d"] = np.concatenate([best["kp_2d"], kp[keep]])
        best["conf"] = np.concatenate([best["conf"], conf[keep]])
        best["scores"] = np.concatenate([best["scores"], scores[keep]])
    chains.sort(key=lambda ch: int(ch["frames"][0]))
    return {pid: ch for pid, ch in enumerate(chains)}


def _absorb_track(kt: dict, tr: dict) -> dict:
    """Fold tr's frames NOT covered by kt into kt (kt wins on common
    frames), keeping rows frame-sorted and aligned."""
    fr_k = {int(f) for f in kt["frames"]}
    keep = np.array([int(f) not in fr_k for f in tr["frames"]], bool)
    frames = np.concatenate([np.asarray(kt["frames"], np.int64),
                             np.asarray(tr["frames"], np.int64)[keep]])
    order = np.argsort(frames, kind="stable")
    out = {"frames": frames[order]}
    for key in ("kp_2d", "conf", "scores"):
        if key in kt and key in tr:
            merged = np.concatenate([np.asarray(kt[key]),
                                     np.asarray(tr[key])[keep]])
            out[key] = merged[order]
        elif key in kt:
            out[key] = kt[key]
    return out


def suppress_duplicate_tracks(tracks: dict, dup_dist: float = 96.0,
                              min_overlap: int = 4) -> dict:
    """Fold concurrent duplicate ("ghost") tracks of one person into the
    strongest track of that person.

    Frame-level NMS can still pass two detections of one person (offset
    center, slightly different keypoints); the tracker then carries a
    parallel ghost track — usually INTERLEAVED with the real one (the
    greedy match flip-flops), so the two rarely co-occur and
    merge_tracks' span-gap gate never fires. Measured on the reference
    basketball demo: the dribbling player splits into 157- and 78-frame
    concurrent tracks with 6 co-detected frames at median center
    distance 71 px; downstream the recon would treat them as two people.

    A ghost has >= min_overlap co-detected frames with a stronger track
    and median keypoint-center distance < dup_dist px on those frames;
    stronger = higher (mean kp conf x length), the evidence ordering
    filter_person_tracks gates on. INTERLEAVED ghosts — detections that
    alternate with the keeper's, so the two tracks barely co-occur
    (measured on the basketball demo: a 37-frame ghost of the dribbler
    sharing ONE co-detected frame) — are caught by a fallback test
    against the keeper's centers INTERPOLATED at the ghost's frames.
    The ghost's uniquely-detected frames are ABSORBED into the keeper
    (coverage is preserved; identity is unified). Two real people who
    merely cross are safe: the MEDIAN over the ghost's whole span stays
    large when they are apart most of the time.
    """
    order = sorted(
        tracks.values(),
        key=lambda tr: -(float(np.asarray(tr["conf"]).mean())
                         * len(tr["frames"])))
    kept: list[dict] = []
    for tr in order:
        fr = {int(f): i for i, f in enumerate(tr["frames"])}
        frames_t = np.asarray(tr["frames"], np.int64)
        ctr = np.asarray(tr["kp_2d"], np.float32).mean(axis=1)
        absorbed = False
        for ki, kt in enumerate(kept):
            kfr = np.asarray(kt["frames"], np.int64)
            kctr = np.asarray(kt["kp_2d"], np.float32).mean(axis=1)
            common = [(fr[int(f)], j) for j, f in enumerate(kfr)
                      if int(f) in fr]
            if len(common) >= min_overlap:
                ia, ib = map(list, zip(*common))
                d = np.linalg.norm(ctr[ia] - kctr[ib], axis=-1)
            else:
                # interleaved-ghost fallback: compare the ghost's centers
                # to the keeper's trajectory interpolated at those frames
                inspan = (frames_t >= kfr[0]) & (frames_t <= kfr[-1])
                if int(inspan.sum()) < min_overlap:
                    continue
                ik = np.stack([np.interp(frames_t[inspan], kfr, kctr[:, c])
                               for c in range(2)], axis=-1)
                d = np.linalg.norm(ctr[inspan] - ik, axis=-1)
            if float(np.median(d)) < dup_dist:
                kept[ki] = _absorb_track(kt, tr)
                absorbed = True
                break
        if not absorbed:
            kept.append(tr)
    kept.sort(key=lambda t: int(t["frames"][0]))
    return {pid: t for pid, t in enumerate(kept)}


def extend_tracks_bidirectional(tracks: dict, dets_per_frame,
                                max_dist: float = 48.0, max_miss: int = 10,
                                floor: float = 0.05) -> dict:
    """Offline bidirectional track extension over leftover detections.

    The live two-stage tracker only extends tracks FORWARD from their
    spawn frame, so a person who enters the clip weakly (edge entry,
    small scale — scores below spawn_score until they are fully in
    frame) loses their first frames even when low-score detections
    exist there. With the whole clip available (the reference's MPT
    tracker is likewise offline over the video, hybrik_demo/demo.py
    :114-142), walk each track's head BACKWARD (and its tail FORWARD)
    through the unclaimed detections: at each step the nearest unclaimed
    detection >= floor within max_dist of the current end extends the
    track; up to max_miss consecutive frames may have no match before
    the walk stops. Spawn semantics are unchanged — extension can only
    grow tracks that already earned their identity.

    Measured motivation (stage-1 e2e, benchmarks/stage1_metrics.json):
    the evaluator's chunked alignment anchors at each chunk's FIRST
    frame (reference protocol), so missing frames at the clip start put
    the anchor on clamp-held pose and the anchoring error rotates the
    whole chunk.
    """
    # detections already claimed by any track: (frame, approx center)
    claimed: dict[int, list] = {}
    for tr in tracks.values():
        ctr = np.asarray(tr["kp_2d"], np.float32).mean(axis=1)
        for f, c in zip(tr["frames"], ctr):
            claimed.setdefault(int(f), []).append(c)

    def unclaimed(fi):
        det = dets_per_frame[fi]
        v = np.asarray(det["valid"], bool)
        cs = np.asarray(det["centers"], np.float32)[v]
        sc = np.asarray(det["scores"], np.float32)[v]
        kp = np.asarray(det["kp_2d"], np.float32)[v]
        kc = np.asarray(det["kp_conf"], np.float32)[v]
        keep = sc >= floor
        if fi in claimed and keep.any():
            cl = np.stack(claimed[fi])
            dmin = np.linalg.norm(
                cs[:, None] - cl[None], axis=-1).min(axis=1)
            keep &= dmin > 1.0
        return cs[keep], kp[keep], kc[keep], sc[keep]

    T = len(dets_per_frame)
    out = {}
    for pid, tr in tracks.items():
        frames = list(np.asarray(tr["frames"], np.int64))
        kp = list(np.asarray(tr["kp_2d"], np.float32))
        conf = list(np.asarray(tr["conf"], np.float32))
        scores = list(np.asarray(tr.get("scores",
                                        np.ones(len(frames))), np.float32))
        for direction in (-1, +1):
            end_i = 0 if direction < 0 else len(frames) - 1
            cur = kp[end_i].mean(axis=0)
            fi = int(frames[end_i]) + direction
            miss = 0
            while 0 <= fi < T and miss <= max_miss:
                cs, kpd, kcd, scd = unclaimed(fi)
                if len(cs):
                    d = np.linalg.norm(cs - cur, axis=-1)
                    j = int(np.argmin(d))
                    if d[j] <= max_dist:
                        if direction < 0:
                            frames.insert(0, fi); kp.insert(0, kpd[j])
                            conf.insert(0, kcd[j])
                            scores.insert(0, float(scd[j]))
                        else:
                            frames.append(fi); kp.append(kpd[j])
                            conf.append(kcd[j])
                            scores.append(float(scd[j]))
                        claimed.setdefault(fi, []).append(cs[j])
                        cur = kpd[j].mean(axis=0)
                        miss = 0
                        fi += direction
                        continue
                miss += 1
                fi += direction
        out[pid] = {"frames": np.asarray(frames, np.int64),
                    "kp_2d": np.stack(kp), "conf": np.stack(conf),
                    "scores": np.asarray(scores, np.float32)}
    return out


def track_detections(dets_per_frame, merge: bool = True,
                     merge_dist: float = 96.0, max_gap: int = 90,
                     dedup: bool = True, dup_dist: float = 96.0,
                     extend: bool = True, extend_floor: float = 0.05,
                     **kwargs) -> dict:
    """Convenience: list of per-frame decode_detections outputs (host
    numpy, one dict per frame with 'centers', 'kp_2d', 'kp_conf',
    'scores', 'valid') -> tracks dict (fragment-merged, ghost-suppressed
    and bidirectionally extended by default)."""
    tr = GreedyTracker(**kwargs)
    for fi, det in enumerate(dets_per_frame):
        v = np.asarray(det["valid"], bool)
        tr.update(fi, np.asarray(det["centers"])[v],
                  np.asarray(det["kp_2d"])[v],
                  np.asarray(det["kp_conf"])[v],
                  np.asarray(det["scores"])[v])
    tracks = tr.finalize()
    if merge:
        tracks = merge_tracks(tracks, merge_dist=merge_dist, max_gap=max_gap)
    if dedup:
        tracks = suppress_duplicate_tracks(tracks, dup_dist=dup_dist)
    if extend:
        tracks = extend_tracks_bidirectional(
            tracks, dets_per_frame,
            max_dist=kwargs.get("max_dist", 48.0),
            max_miss=kwargs.get("max_miss", 10), floor=extend_floor)
    return tracks
