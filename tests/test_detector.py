"""In-framework 2D person+keypoint detector (pose_est/detector.py),
synthetic render data (synth_images.py) and the greedy tracker
(tracker.py) — the TPU-native replacement for the reference's external
FasterRCNN / YOLO+MPT detection stack (hybrik_demo/demo.py:114-142,
238-265)."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_cfg():
    from glamr_tpu.pose_est.detector import DetectorConfig

    return DetectorConfig(img_size=64, base_ch=8, num_blocks=1, max_people=3)


@pytest.fixture(scope="module")
def datagen(tiny_cfg):
    from glamr_tpu.body.smpl import get_smpl
    from glamr_tpu.data import procedural_amass_data
    from glamr_tpu.pose_est.synth_images import DetectorDataGen

    smpl = get_smpl("body26fk", synthetic=True)
    data, _, _, _ = procedural_amass_data(2, seed=0)
    return DetectorDataGen(data, smpl, cfg=tiny_cfg)


def test_datagen_targets(datagen, tiny_cfg):
    rng = np.random.default_rng(0)
    b = datagen.batch(rng, 2)
    c = tiny_cfg
    hm = c.hm_size
    assert b["images"].shape == (2, c.img_size, c.img_size, 3)
    assert b["images"].min() >= 0 and b["images"].max() <= 1
    assert b["gt_center_hm"].shape == (2, hm, hm)
    assert b["gt_kp_hm"].shape == (2, hm, hm, c.num_kp)
    # every present person splats an exact-1 peak at its center cell
    for i in range(2):
        for p in range(c.max_people):
            if b["gt_person_mask"][i, p] > 0:
                cy, cx = b["gt_center_idx"][i, p]
                assert b["gt_center_hm"][i, cy, cx] > 0.99
    # offsets bounded by heatmap extent
    assert np.abs(b["gt_kp_offset"]).max() < hm


def test_detector_forward_and_decode(tiny_cfg):
    import jax
    import jax.numpy as jnp

    from glamr_tpu.pose_est.detector import (PersonKeypointDetector,
                                             decode_detections)

    model = PersonKeypointDetector(tiny_cfg)
    img = jnp.zeros((2, tiny_cfg.img_size, tiny_cfg.img_size, 3))
    params = model.init(jax.random.PRNGKey(0), img)
    out = jax.jit(lambda p, x: model.apply(p, x))(params, img)
    hm = tiny_cfg.hm_size
    assert out["center_hm"].shape == (2, hm, hm)
    assert out["kp_offset"].shape == (2, hm, hm, tiny_cfg.num_kp, 2)
    assert out["kp_hm"].shape == (2, hm, hm, tiny_cfg.num_kp)
    assert (out["center_hm"] >= 0).all() and (out["center_hm"] <= 1).all()

    dec = jax.jit(lambda o: decode_detections(o, tiny_cfg))(out)
    M = tiny_cfg.max_people
    assert dec["centers"].shape == (2, M, 2)
    assert dec["kp_2d"].shape == (2, M, tiny_cfg.num_kp, 2)
    assert np.isfinite(np.asarray(dec["kp_2d"])).all()


def test_decode_finds_planted_peak(tiny_cfg):
    """Hand-crafted heads: one hot center, known offsets -> decoded
    keypoints land exactly at center*stride + stride/2 + offset*stride."""
    import jax.numpy as jnp

    from glamr_tpu.pose_est.detector import decode_detections

    c = tiny_cfg
    hm = c.hm_size
    center = np.zeros((1, hm, hm), np.float32)
    cy, cx = 5, 9
    center[0, cy, cx] = 0.9
    off = np.zeros((1, hm, hm, c.num_kp, 2), np.float32)
    off[0, cy, cx, :, 0] = 1.5   # x offset in cells
    off[0, cy, cx, :, 1] = -0.5
    out = {"center_hm": jnp.asarray(center),
           "kp_offset": jnp.asarray(off),
           "kp_hm": jnp.ones((1, hm, hm, c.num_kp), jnp.float32) * 0.8}
    dec = decode_detections(out, c, score_thresh=0.5)
    assert bool(dec["valid"][0, 0])
    assert not bool(dec["valid"][0, 1])  # only one real peak
    s = c.out_stride
    np.testing.assert_allclose(dec["centers"][0, 0],
                               [cx * s + s / 2, cy * s + s / 2])
    np.testing.assert_allclose(dec["kp_2d"][0, 0, 0],
                               [(cx + 1.5) * s + s / 2, (cy - 0.5) * s + s / 2])


def test_decode_snap_to_kp_heatmap(tiny_cfg):
    """snap_kp=True moves a regressed keypoint onto a nearby kp-heatmap
    peak (sub-cell, via the 3x3 centroid); keypoints with no evidence in
    the window keep the regressed coordinate."""
    import jax.numpy as jnp

    from glamr_tpu.pose_est.detector import decode_detections

    c = tiny_cfg
    hm = c.hm_size
    center = np.zeros((1, hm, hm), np.float32)
    cy, cx = 5, 9
    center[0, cy, cx] = 0.9
    off = np.zeros((1, hm, hm, c.num_kp, 2), np.float32)
    # regression says keypoint 0 sits at the center cell...
    kp_hm = np.zeros((1, hm, hm, c.num_kp), np.float32)
    # ...but the heatmap evidence for kp 0 peaks 2 cells right of it
    kp_hm[0, cy, cx + 2, 0] = 0.9
    # kp 1 has NO evidence anywhere -> regressed coordinate kept
    out = {"center_hm": jnp.asarray(center),
           "kp_offset": jnp.asarray(off),
           "kp_hm": jnp.asarray(kp_hm)}
    s = c.out_stride
    dec_off = decode_detections(out, c, score_thresh=0.5, snap_kp=False)
    dec_on = decode_detections(out, c, score_thresh=0.5, snap_kp=True)
    # snap moved kp 0 to the peak cell (isolated peak -> centroid exact)
    np.testing.assert_allclose(
        dec_on["kp_2d"][0, 0, 0],
        [(cx + 2) * s + s / 2, cy * s + s / 2], atol=1e-4)
    # kp 1 unchanged vs the regression-only decode
    np.testing.assert_allclose(dec_on["kp_2d"][0, 0, 1],
                               dec_off["kp_2d"][0, 0, 1], atol=1e-6)


def test_focal_loss_decreases_with_better_pred():
    from glamr_tpu.pose_est.detector import focal_heatmap_loss

    gt = np.zeros((8, 8), np.float32)
    gt[3, 3] = 1.0
    bad = np.full((8, 8), 0.5, np.float32)
    good = np.where(gt > 0.5, 0.9, 0.05).astype(np.float32)
    assert float(focal_heatmap_loss(good, gt)) < float(focal_heatmap_loss(bad, gt))


def test_detector_train_step_reduces_loss(datagen, tiny_cfg):
    """A few dozen steps on one fixed batch must cut the loss (overfit
    smoke — full training lives in the CLI)."""
    import jax
    import jax.numpy as jnp

    from glamr_tpu.pose_est.detector import (DEFAULT_DETECTOR_LOSS_CFG,
                                             PersonKeypointDetector,
                                             init_detector)
    from glamr_tpu.train.trainer import make_detector_train_step, make_tx

    rng = np.random.default_rng(1)
    batch = datagen.batch(rng, 4)
    keys = ("images", "gt_center_hm", "gt_kp_hm", "gt_center_idx",
            "gt_kp_offset", "gt_kp_vis", "gt_person_mask")
    tb = {k: jnp.asarray(batch[k]) for k in keys}

    model = PersonKeypointDetector(tiny_cfg)
    tx = make_tx(2e-3)
    state = init_detector(model, tx, jax.random.PRNGKey(0))
    step = make_detector_train_step(model, tx, DEFAULT_DETECTOR_LOSS_CFG)
    first = None
    for i in range(30):
        state, m = step(state, tb, jax.random.PRNGKey(i))
        if first is None:
            first = float(m["loss"])
    last = float(m["loss"])
    assert np.isfinite(last)
    assert last < first


def test_tracker_crossing_tracks():
    """Two persons moving horizontally in opposite directions keep their
    identities through the crossing (greedy nearest-center with gate)."""
    from glamr_tpu.pose_est.tracker import GreedyTracker

    T, K = 30, 24
    tr = GreedyTracker(max_dist=20.0, min_len=5)
    for t in range(T):
        xa = 10.0 + 4 * t          # person A: left -> right
        xb = 130.0 - 4 * t         # person B: right -> left
        centers = np.array([[xa, 50.0], [xb, 60.0]], np.float32)
        kp = np.tile(centers[:, None], (1, K, 1))
        conf = np.ones((2, K), np.float32)
        tr.update(t, centers, kp, conf, np.array([0.9, 0.9]))
    tracks = tr.finalize()
    assert len(tracks) == 2
    for pid, t in tracks.items():
        assert t["frames"].shape[0] == T
        xs = t["kp_2d"][:, 0, 0]
        d = np.diff(xs)
        # monotone motion throughout => identity held through the crossing
        assert (d > 0).all() or (d < 0).all()


def test_tracker_two_stage_spawn_and_extend():
    """Low-score detections EXTEND an established track through weak
    frames but can never SPAWN a track (ByteTrack-style two-stage
    association): a person whose score dips below spawn_score keeps one
    unbroken identity, while persistent low-score clutter produces no
    track at all."""
    from glamr_tpu.pose_est.tracker import GreedyTracker

    T, K = 30, 24
    tr = GreedyTracker(max_dist=20.0, min_len=5, spawn_score=0.3)
    for t in range(T):
        # person walking right; score dips to 0.15 in the middle third
        score_p = 0.8 if (t < 10 or t >= 20) else 0.15
        centers = np.array([[10.0 + 3 * t, 50.0], [200.0, 200.0]],
                           np.float32)
        kp = np.tile(centers[:, None], (1, K, 1))
        conf = np.ones((2, K), np.float32)
        # clutter at a fixed spot scores 0.2 every frame: above a naive
        # 0.12 floor, below the spawn gate
        tr.update(t, centers, kp, conf, np.array([score_p, 0.2]))
    tracks = tr.finalize()
    assert len(tracks) == 1, f"clutter spawned a track: {len(tracks)}"
    (only,) = tracks.values()
    assert only["frames"].shape[0] == T, "weak frames broke the track"
    assert (np.diff(only["kp_2d"][:, 0, 0]) > 0).all()


def _det_frame(centers, scores, K=24):
    centers = np.asarray(centers, np.float32).reshape(-1, 2)
    D = len(centers)
    return {"centers": centers,
            "kp_2d": np.tile(centers[:, None], (1, K, 1)),
            "kp_conf": np.ones((D, K), np.float32),
            "scores": np.asarray(scores, np.float32),
            "valid": np.ones(D, bool)}


def test_extend_tracks_backward_recovers_weak_entry():
    """A person entering the clip below spawn_score loses their first
    frames to the live tracker; the offline bidirectional pass walks the
    track head backward through the unclaimed low-score detections
    (measured motivation: the stage-1 e2e clip loses frames 0-19 to a
    weak edge entry, and the evaluator anchors alignment at frame 0)."""
    from glamr_tpu.pose_est.tracker import track_detections

    T = 30
    dets = []
    for t in range(T):
        x = 10.0 + 3 * t
        # weak for the first 10 frames (entering), confident after
        s = 0.15 if t < 10 else 0.8
        dets.append(_det_frame([[x, 50.0]], [s]))
    t_off = track_detections(dets, extend=False, max_dist=20.0, min_len=5)
    t_on = track_detections(dets, extend=True, max_dist=20.0, min_len=5)
    assert int(t_off[0]["frames"][0]) == 10
    assert int(t_on[0]["frames"][0]) == 0
    assert len(t_on[0]["frames"]) == T
    # rows stay frame-sorted and aligned
    assert (np.diff(t_on[0]["frames"]) > 0).all()
    assert np.allclose(t_on[0]["kp_2d"][:, 0, 0], 10.0 + 3 * np.arange(T))


def test_extend_tracks_forward_recovers_weak_tail():
    from glamr_tpu.pose_est.tracker import track_detections

    T = 30
    dets = []
    for t in range(T):
        x = 10.0 + 3 * t
        s = 0.8 if t < 20 else 0.15   # weak exit after a miss streak
        dets.append(_det_frame([[x, 50.0]], [s]))
    # with max_miss below the weak-tail length, the live track dies at 19
    t_off = track_detections(dets, extend=False, max_dist=20.0, min_len=5,
                             max_miss=3)
    # the live two-stage association already extends through weak frames
    # while the track is alive, so this baseline keeps the tail too; the
    # offline pass must at minimum not disturb it
    t_on = track_detections(dets, extend=True, max_dist=20.0, min_len=5,
                            max_miss=3)
    assert int(t_on[0]["frames"][-1]) == T - 1
    assert len(t_on[0]["frames"]) >= len(t_off[0]["frames"])


def test_extend_tracks_gate_and_claims():
    """Extension never attaches clutter beyond max_dist and never steals
    detections already claimed by another track."""
    from glamr_tpu.pose_est.tracker import extend_tracks_bidirectional

    T = 20
    dets = []
    for t in range(T):
        rows, scores = [], []
        if t >= 5:
            rows.append([50.0 + t, 50.0]); scores.append(0.8)  # person A
        rows.append([300.0, 300.0]); scores.append(0.2)        # far clutter
        if t < 5:
            rows.append([58.0, 52.0]); scores.append(0.15)     # A entering
        dets.append(_det_frame(rows, scores))
    tracks = {0: {"frames": np.arange(5, T),
                  "kp_2d": np.tile(np.array(
                      [[50.0 + t, 50.0] for t in range(5, T)],
                      np.float32)[:, None], (1, 24, 1)),
                  "conf": np.ones((T - 5, 24), np.float32),
                  "scores": np.full(T - 5, 0.8, np.float32)}}
    out = extend_tracks_bidirectional(tracks, dets, max_dist=20.0,
                                      max_miss=5, floor=0.05)
    fr = out[0]["frames"]
    assert int(fr[0]) == 0                       # entering frames claimed
    # clutter at (300,300) never attached: every center stays near A
    assert np.abs(out[0]["kp_2d"][:, 0, 0] - 55.0).max() < 25.0

    # a second track already claiming the entering detections blocks them
    tracks2 = {
        0: tracks[0],
        1: {"frames": np.arange(0, 5),
            "kp_2d": np.tile(np.array([[58.0, 52.0]], np.float32),
                             (5, 24, 1)).reshape(5, 24, 2),
            "conf": np.ones((5, 24), np.float32),
            "scores": np.full(5, 0.15, np.float32)},
    }
    out2 = extend_tracks_bidirectional(tracks2, dets, max_dist=20.0,
                                       max_miss=5, floor=0.05)
    assert int(out2[0]["frames"][0]) == 5        # nothing left to claim


def test_tracker_miss_tolerance_and_min_len():
    from glamr_tpu.pose_est.tracker import GreedyTracker

    tr = GreedyTracker(max_dist=20.0, max_miss=3, min_len=5)
    K = 24
    for t in range(12):
        if t in (4, 5):  # two-frame dropout, within max_miss
            continue
        c = np.array([[50.0 + t, 50.0]], np.float32)
        tr.update(t, c, np.tile(c[:, None], (1, K, 1)),
                  np.ones((1, K), np.float32), np.array([0.9]))
    # a 2-frame flicker track that should be dropped by min_len
    for t in (20, 21):
        c = np.array([[200.0, 200.0]], np.float32)
        tr.update(t, c, np.tile(c[:, None], (1, K, 1)),
                  np.ones((1, K), np.float32), np.array([0.9]))
    tracks = tr.finalize()
    assert len(tracks) == 1
    assert tracks[0]["frames"].shape[0] == 10  # survived the dropout


def _frag(frames, center, K=24):
    frames = np.asarray(frames, np.int64)
    c = np.asarray(center, np.float32)
    kp = np.tile(c[None, None], (len(frames), K, 1))
    return {"frames": frames, "kp_2d": kp,
            "conf": np.ones((len(frames), K), np.float32)}


def test_merge_tracks_rejoins_gap_fragments():
    """A detection gap longer than max_miss restarts the track under a
    new id; merge_tracks chains the fragments back into one identity
    (two people, both fragmented, as observed on the reference
    basketball.mp4 demo video)."""
    from glamr_tpu.pose_est.tracker import merge_tracks

    tracks = {
        0: _frag(range(4, 69), (840, 596)),      # person A, leg 1
        1: _frag(range(51, 78), (320, 526)),     # person B, leg 1
        2: _frag(range(81, 299), (837, 597)),    # person A after 13-fr gap
        3: _frag(range(151, 192), (318, 524)),   # person B after 73-fr gap
    }
    merged = merge_tracks(tracks)
    assert len(merged) == 2
    a = merged[0] if merged[0]["frames"][0] == 4 else merged[1]
    b = merged[1] if a is merged[0] else merged[0]
    assert a["frames"][0] == 4 and a["frames"][-1] == 298
    assert b["frames"][0] == 51 and b["frames"][-1] == 191
    # strictly increasing frames, kp rows aligned
    for t in merged.values():
        assert (np.diff(t["frames"]) > 0).all()
        assert t["kp_2d"].shape[0] == t["frames"].shape[0]
        assert t["conf"].shape[0] == t["frames"].shape[0]


def test_merge_tracks_respects_distance_and_gap_gates():
    """Fragments far apart in space or beyond max_gap in time stay
    separate identities."""
    from glamr_tpu.pose_est.tracker import merge_tracks

    # far apart in space, adjacent in time -> no merge
    far = merge_tracks({0: _frag(range(0, 30), (100, 100)),
                        1: _frag(range(40, 70), (600, 500))})
    assert len(far) == 2
    # same spot but a gap beyond max_gap -> no merge
    late = merge_tracks({0: _frag(range(0, 30), (100, 100)),
                         1: _frag(range(200, 230), (100, 100))},
                        max_gap=90)
    assert len(late) == 2


def test_merge_tracks_trims_small_overlap():
    """A fragment overlapping the chain tail by <= overlap_tol frames is
    merged with its overlapping head dropped (no duplicate frames)."""
    from glamr_tpu.pose_est.tracker import merge_tracks

    tracks = {0: _frag(range(0, 50), (100, 100)),
              1: _frag(range(47, 90), (104, 100))}
    merged = merge_tracks(tracks, overlap_tol=5)
    assert len(merged) == 1
    fr = merged[0]["frames"]
    assert fr[0] == 0 and fr[-1] == 89
    assert (np.diff(fr) > 0).all()
    assert len(fr) == 90
    # default overlap_tol covers the measured ~6-frame double-detection
    # handoff (basketball demo: player fragments overlapped 6 frames)
    handoff = {0: _frag(range(0, 144), (860, 550)),
               1: _frag(range(138, 240), (858, 552))}
    merged = merge_tracks(handoff)
    assert len(merged) == 1
    assert merged[0]["frames"][-1] == 239 and len(merged[0]["frames"]) == 240


def test_suppress_duplicate_tracks_drops_concurrent_ghost():
    """A ghost track (double detection of the same person surviving
    frame NMS: concurrent frames, small center offset) is suppressed in
    favor of the stronger track; a second REAL person nearby in a few
    frames but apart in most survives (median gate)."""
    from glamr_tpu.pose_est.tracker import suppress_duplicate_tracks

    person = _frag(range(0, 200), (400, 300))
    ghost = _frag(range(40, 160), (412, 306))          # 12-px offset copy
    ghost["conf"] *= 0.5                                # weaker evidence
    other = _frag(range(0, 200), (800, 300))            # real second person
    # they cross briefly: 15 frames where `other` walks through (410, 300)
    other["kp_2d"][90:105] = np.tile(
        np.asarray([410.0, 300.0], np.float32), (15, other["kp_2d"].shape[1], 1))

    kept = suppress_duplicate_tracks({0: person, 1: ghost, 2: other})
    assert len(kept) == 2
    centers = sorted(float(t["kp_2d"][0, 0, 0]) for t in kept.values())
    assert centers == [400.0, 800.0]                    # ghost folded in


def test_suppress_duplicate_tracks_absorbs_interleaved_fragments():
    """The measured basketball failure: the greedy match flip-flops
    between two concurrent tracks of ONE person, so they rarely
    co-occur (span overlap large, co-detected frames few) and
    merge_tracks' span-gap gate never fires. The ghost's unique frames
    must be ABSORBED so coverage is preserved under one identity."""
    from glamr_tpu.pose_est.tracker import suppress_duplicate_tracks

    a_frames = [f for f in range(0, 224) if f % 3 != 2]      # sparse
    b_frames = [f for f in range(138, 240) if f % 3 != 1]    # interleaved
    a = _frag(a_frames, (860, 550))
    b = _frag(b_frames, (858, 552))
    b["conf"] *= 0.9
    kept = suppress_duplicate_tracks({0: a, 1: b})
    assert len(kept) == 1
    fr = kept[0]["frames"]
    merged = sorted(set(a_frames) | set(b_frames))
    assert fr.tolist() == merged                        # union coverage
    assert kept[0]["kp_2d"].shape[0] == len(merged)     # rows aligned


def test_suppress_duplicate_tracks_interpolation_fallback():
    """A ghost whose detections NEVER co-occur with the keeper's (it
    fires exactly on the keeper's missed frames — the measured v3
    basketball demo ghost shared ONE frame of 37) is caught by the
    interpolated-center fallback; a DISTANT sparse person inside the
    keeper's span is not absorbed."""
    from glamr_tpu.pose_est.tracker import suppress_duplicate_tracks

    a = _frag([f for f in range(0, 300) if f % 4 != 2], (835, 527))
    ghost = _frag([f for f in range(96, 196) if f % 4 == 2], (829, 525))
    ghost["conf"] *= 0.8
    far = _frag([f for f in range(50, 250) if f % 4 == 2], (200, 400))
    kept = suppress_duplicate_tracks({0: a, 1: ghost, 2: far})
    assert len(kept) == 2
    lens = sorted(len(t["frames"]) for t in kept.values())
    # ghost's 25 unique frames absorbed into the keeper
    assert lens[1] == len(a["frames"]) + len(ghost["frames"])
    # the far person survives untouched
    assert lens[0] == len(far["frames"])


def test_detect_video_shapes(tiny_cfg):
    """detect_video letterboxes arbitrary frame sizes and maps keypoints
    back to original pixels."""
    import jax

    from glamr_tpu.pose_est.detector import PersonKeypointDetector, init_detector
    from glamr_tpu.pose_est.estimator import detect_video
    from glamr_tpu.train.trainer import make_tx

    model = PersonKeypointDetector(tiny_cfg)
    state = init_detector(model, make_tx(1e-3), jax.random.PRNGKey(0))
    frames = (np.random.default_rng(0).uniform(
        0, 255, (5, 120, 160, 3))).astype(np.uint8)
    dets = detect_video(frames, model, state.params, score_thresh=2.0)
    assert len(dets) == 5
    assert dets[0]["kp_2d"].shape == (tiny_cfg.max_people, tiny_cfg.num_kp, 2)
    assert not dets[0]["valid"].any()  # threshold 2.0 rejects everything


def test_detector_pool_fused_epoch(datagen, tiny_cfg):
    """Device-resident pooled training: build_detector_pool renders once
    (uint8-quantized), make_detector_pool_sampler re-diversifies draws
    on-device, and a fused epoch over the pool cuts the loss."""
    import jax

    from glamr_tpu.pose_est.detector import (DEFAULT_DETECTOR_LOSS_CFG,
                                             PersonKeypointDetector,
                                             init_detector)
    from glamr_tpu.pose_est.synth_images import build_detector_pool
    from glamr_tpu.train.trainer import (detector_step_core,
                                         make_detector_pool_sampler,
                                         make_fused_epoch, make_tx)

    pool = build_detector_pool(datagen, np.random.default_rng(0), 8,
                               workers=2)
    assert pool["images"].dtype == np.uint8
    assert pool["images"].shape[0] == 8
    assert pool["gt_kp_hm"].dtype == np.uint8

    sample, dev_pool, n = make_detector_pool_sampler(pool, batch_size=4)
    assert n == 8
    b = jax.jit(sample)(dev_pool, jax.random.PRNGKey(0))
    assert b["images"].shape == (4, tiny_cfg.img_size, tiny_cfg.img_size, 3)
    assert b["images"].dtype.name == "float32"
    assert float(b["gt_center_hm"].max()) <= 1.0

    model = PersonKeypointDetector(tiny_cfg)
    tx = make_tx(2e-3)
    state = init_detector(model, tx, jax.random.PRNGKey(0))
    core = detector_step_core(model, tx, DEFAULT_DETECTOR_LOSS_CFG)
    epoch = make_fused_epoch(core, sample, K=20, data=dev_pool)
    state, metrics = epoch(state, jax.random.PRNGKey(1))
    losses = np.asarray(metrics["loss"])
    assert losses.shape == (20,)
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_filter_person_tracks_gates_on_keypoint_evidence():
    """A long high-kp-confidence track survives; a person-shaped
    STRUCTURE (detector center fires, keypoint heads find no limbs —
    the basketball-hoop false positive measured on the reference demo
    clip) and short flickers are dropped."""
    from glamr_tpu.pose_est.estimator import filter_person_tracks

    K = 24

    def mk(n, conf_level):
        return {
            "frames": np.arange(n, dtype=np.int64),
            "kp_2d": np.zeros((n, K, 2), np.float32),
            "conf": np.full((n, K), conf_level, np.float32),
            "scores": np.full(n, 0.8, np.float32),
        }

    tracks = {0: mk(100, 0.6),   # person
              1: mk(100, 0.12),  # structure FP: confident center, no kps
              2: mk(5, 0.9)}     # flicker
    kept = filter_person_tracks(tracks, min_kp_conf=0.30, min_len=15)
    assert len(kept) == 1
    assert kept[0]["conf"].mean() > 0.5
