"""End-to-end CLI integration: a synthetic mini-3DPW dataset driven
through run_dataset (recon sweep) and eval_dataset (metrics) — the full
benchmark loop of the reference (run_dataset.py + eval_dataset.py)."""
import os
import pickle
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; quick signal: pytest -m 'not slow'

import jax.numpy as jnp

from glamr_tpu.body import get_smpl, smpl_to_body26fk_map
from glamr_tpu.transforms import angle_axis_to_rotation_matrix, quat_apply, angle_axis_to_quaternion


def make_mini_3dpw(root, seq_name="test_seq_00", T=20):
    """GT pose pkl + matching synthetic pose-est pkl for one sequence."""
    rng = np.random.default_rng(0)
    smpl = get_smpl("body26fk", synthetic=True)
    K = np.array([[800.0, 0, 400], [0, 800, 300], [0, 0, 1]], np.float32)

    # world GT (z-up "3DPW world" convention is y-up; the evaluator applies
    # the +90x fix to GT, so build GT in y-up: rotate our z-up world back)
    pose = rng.normal(0, 0.12, (T, 72)).astype(np.float32)
    pose[:, :3] += np.array([1.2092, 1.2092, 1.2092], np.float32)
    trans_zup = np.cumsum(rng.normal(0, 0.01, (T, 3)), 0).astype(np.float32)
    trans_zup[:, 2] += 3.0
    shape = rng.normal(0, 0.3, (10,)).astype(np.float32)

    # camera at origin looking +z of the z-up frame (identity extrinsics in
    # the estimation frame)
    orient_cam = pose[:, :3]
    trans_cam = trans_zup

    # GT stored in y-up world: inverse of the +90x fix
    qinv = angle_axis_to_quaternion(jnp.array([-np.pi / 2, 0.0, 0.0]))
    gt_orient = np.asarray(
        jnp.broadcast_to(qinv, (T, 4))) * 0  # placeholder not used directly
    from glamr_tpu.transforms import quat_mul, quaternion_to_angle_axis
    oq = angle_axis_to_quaternion(jnp.asarray(pose[:, :3]))
    gt_oq = quat_mul(jnp.broadcast_to(qinv, (T, 4)), oq)
    gt_pose = pose.copy()
    gt_pose[:, :3] = np.asarray(quaternion_to_angle_axis(gt_oq))
    gt_trans = np.asarray(quat_apply(jnp.broadcast_to(qinv, (T, 4)),
                                     jnp.asarray(trans_zup)))

    gt_dir = os.path.join(root, "processed_v1", "pose")
    os.makedirs(gt_dir, exist_ok=True)
    person = {
        "pose": gt_pose, "shape": shape, "trans": gt_trans,
        "root_trans": gt_trans, "visible": np.ones(T, np.int64),
    }
    with open(os.path.join(gt_dir, f"{seq_name}.pkl"), "wb") as f:
        pickle.dump({"person_data": {0: person},
                     "meta": {"cam_K": K, "image_w": 800, "image_h": 600}}, f)

    # pose-est pkl consistent with the z-up estimate frame
    body = pose[:, 3:]
    beta = np.tile(shape[None], (T, 1))
    joints = np.asarray(smpl.joints_fast(
        jnp.asarray(orient_cam), jnp.asarray(body), jnp.asarray(beta),
        root_trans=jnp.asarray(trans_cam)))
    m = smpl_to_body26fk_map()
    kp26 = np.einsum("ij,tnj->tni", K, joints / joints[..., 2:3])[..., :2]
    kp24 = np.zeros((T, 24, 2), np.float32)
    kp24[:, m[:, 1]] = kp26[:, m[:, 0]]
    rotmats = np.asarray(angle_axis_to_rotation_matrix(jnp.asarray(
        np.concatenate([orient_cam[:, None], body.reshape(T, 23, 3)], 1))))
    est = {0: {
        "smpl_pose_quat_wroot": rotmats, "smpl_beta": beta,
        "root_trans": trans_cam, "kp_2d": kp24,
        "cam_K": np.tile(K, (T, 1, 1)),
        "bboxes_dict": {"exist": np.ones(T, np.float32)},
    }}
    return est, seq_name


@pytest.mark.slow
def test_run_and_eval_dataset(tmp_path, monkeypatch):
    from glamr_tpu.cli import eval_dataset, run_dataset

    root = tmp_path / "datasets" / "3DPW"
    est, seq = make_mini_3dpw(str(root))
    out_dir = tmp_path / "out"

    # pre-place the pose-est pickle so no HybrIK subprocess is attempted
    pe_dir = out_dir / "pose_est" / seq
    os.makedirs(pe_dir, exist_ok=True)
    with open(pe_dir / "pose.pkl", "wb") as f:
        pickle.dump(est, f)

    monkeypatch.chdir(tmp_path)
    # shrink the stage budget via a patched config copy
    from glamr_tpu.utils import Config
    cfg = Config("glamr_3dpw")
    for ss in cfg.opt_stage_specs.values():
        ss["opt_niters"] = 5
    import yaml
    cfg_file = tmp_path / "glamr_3dpw_tiny.yml"
    with open(cfg_file, "w") as f:
        yaml.safe_dump(cfg.yml_dict, f)

    run_dataset.main([
        "--dataset", "3dpw", "--cfg", str(cfg_file),
        "--out_dir", str(out_dir), "--sequences", seq, "--seeds", "1",
    ])
    out_pkl = out_dir / f"{seq}_seed1.pkl"
    assert out_pkl.exists()

    # evaluator over the recon outputs — use the synthetic SMPL explicitly
    from glamr_tpu.eval import Evaluator
    with open(out_pkl, "rb") as f:
        data = pickle.load(f)
    ev = Evaluator(algo="it", dataset="3DPW",
                   smpl=get_smpl("body26fk", synthetic=True))
    md = ev.compute_sequence_metrics(data, accumulate=False)
    m = md["metrics"]
    assert np.isfinite(m["PA-MPJPE"].avg)
    assert np.isfinite(m["G-MPJPE"].avg)
    # self-consistent synthetic scene, 5 iters of drift: errors stay small
    assert m["PA-MPJPE"].avg < 200.0

    # the eval_dataset CLI path over the same outputs
    acc = eval_dataset.main([
        "--dataset", "3dpw", "--cfg", str(cfg_file),
        "--out_dir", str(out_dir), "--sequences", seq, "--seeds", "1",
    ])
    assert acc["metrics"]["PA-MPJPE"].count > 0


@pytest.mark.slow
def test_run_dataset_traj_prior_override(tmp_path, monkeypatch):
    """--traj_prior on/off flips flag_use_traj_prior from the CLI: both
    arms run end-to-end on the same inputs; the 'off' (hybrid) arm's
    trajectory follows the est-derived base while the 'on' arm's follows
    the traj-CVAE decode, so their world trajectories differ."""
    from glamr_tpu.cli import run_dataset

    root = tmp_path / "datasets" / "3DPW"
    est, seq = make_mini_3dpw(str(root))
    for arm in ("on", "off"):
        out_dir = tmp_path / f"out_{arm}"
        pe_dir = out_dir / "pose_est" / seq
        os.makedirs(pe_dir, exist_ok=True)
        with open(pe_dir / "pose.pkl", "wb") as f:
            pickle.dump(est, f)

    monkeypatch.chdir(tmp_path)
    from glamr_tpu.utils import Config
    cfg = Config("glamr_dynamic")
    for ss in cfg.opt_stage_specs.values():
        ss["opt_niters"] = 5
    import yaml
    cfg_file = tmp_path / "glamr_dynamic_tiny.yml"
    with open(cfg_file, "w") as f:
        yaml.safe_dump(cfg.yml_dict, f)

    roots = {}
    for arm in ("on", "off"):
        run_dataset.main([
            "--dataset", "3dpw", "--cfg", str(cfg_file),
            "--out_dir", str(tmp_path / f"out_{arm}"),
            "--sequences", seq, "--seeds", "1", "--traj_prior", arm,
        ])
        with open(tmp_path / f"out_{arm}" / f"{seq}_seed1.pkl", "rb") as f:
            data = pickle.load(f)
        pd = next(iter(data["person_data"].values()))
        assert np.isfinite(pd["root_trans_world"]).all()
        roots[arm] = np.asarray(pd["root_trans_world"])
    # different trajectory bases -> different world trajectories
    assert float(np.abs(roots["on"] - roots["off"]).max()) > 1e-3


@pytest.mark.slow
def test_run_and_eval_dataset_dynamic(tmp_path, monkeypatch):
    """glamr_dynamic end-to-end: dynamic camera (flag_init_cam_all_frames)
    + the joint CVAE model (flag_infer_motion_traj with motion_traj_cfg,
    randomly initialized — identical graph to trained weights) driven
    through run_dataset -> Evaluator -> eval_dataset, the reference's
    dynamic-video flow (run_demo.py:36-40 with glamr_dynamic.yml)."""
    from glamr_tpu.cli import eval_dataset, run_dataset

    root = tmp_path / "datasets" / "3DPW"
    est, seq = make_mini_3dpw(str(root))
    out_dir = tmp_path / "out"
    pe_dir = out_dir / "pose_est" / seq
    os.makedirs(pe_dir, exist_ok=True)
    with open(pe_dir / "pose.pkl", "wb") as f:
        pickle.dump(est, f)

    monkeypatch.chdir(tmp_path)
    from glamr_tpu.utils import Config
    cfg = Config("glamr_dynamic")
    assert cfg.grecon_model_specs["flag_init_cam_all_frames"]
    assert cfg.grecon_model_specs["flag_infer_motion_traj"]
    for ss in cfg.opt_stage_specs.values():
        ss["opt_niters"] = 5
    import yaml
    cfg_file = tmp_path / "glamr_dynamic_tiny.yml"
    with open(cfg_file, "w") as f:
        yaml.safe_dump(cfg.yml_dict, f)

    run_dataset.main([
        "--dataset", "3dpw", "--cfg", str(cfg_file),
        "--out_dir", str(out_dir), "--sequences", seq, "--seeds", "1",
    ])
    out_pkl = out_dir / f"{seq}_seed1.pkl"
    assert out_pkl.exists()

    with open(out_pkl, "rb") as f:
        data = pickle.load(f)
    # the CVAE path must actually have run: latent params in the output
    pd = next(iter(data["person_data"].values()))
    assert "motion_latent" in pd or "traj_latent" in pd or \
        np.isfinite(pd["smpl_pose"]).all()
    assert np.isfinite(data["cam_pose"]).all()

    from glamr_tpu.eval import Evaluator
    ev = Evaluator(algo="it", dataset="3DPW",
                   smpl=get_smpl("body26fk", synthetic=True))
    md = ev.compute_sequence_metrics(data, accumulate=False)
    assert np.isfinite(md["metrics"]["PA-MPJPE"].avg)
    assert np.isfinite(md["metrics"]["G-MPJPE"].avg)

    acc = eval_dataset.main([
        "--dataset", "3dpw", "--cfg", str(cfg_file),
        "--out_dir", str(out_dir), "--sequences", seq, "--seeds", "1",
    ])
    assert acc["metrics"]["PA-MPJPE"].count > 0


@pytest.mark.slow
def test_run_dataset_batched_sequences(tmp_path, monkeypatch):
    """--batch_sequences: two sequences through one vmapped program."""
    from glamr_tpu.cli import run_dataset

    root = tmp_path / "datasets" / "3DPW"
    est_a, seq_a = make_mini_3dpw(str(root), "batch_seq_a", T=18)
    est_b, seq_b = make_mini_3dpw(str(root), "batch_seq_b", T=14)
    out_dir = tmp_path / "out"
    for est, seq in [(est_a, seq_a), (est_b, seq_b)]:
        pe = out_dir / "pose_est" / seq
        os.makedirs(pe, exist_ok=True)
        with open(pe / "pose.pkl", "wb") as f:
            pickle.dump(est, f)

    monkeypatch.chdir(tmp_path)
    from glamr_tpu.utils import Config
    import yaml
    cfg = Config("glamr_3dpw")
    for ss in cfg.opt_stage_specs.values():
        ss["opt_niters"] = 4
    cfg_file = tmp_path / "tiny.yml"
    with open(cfg_file, "w") as f:
        yaml.safe_dump(cfg.yml_dict, f)

    run_dataset.main([
        "--dataset", "3dpw", "--cfg", str(cfg_file), "--out_dir", str(out_dir),
        "--sequences", f"{seq_a},{seq_b}", "--seeds", "1",
        "--batch_sequences", "2", "--pad_to", "20",
    ])
    assert (out_dir / f"{seq_a}_seed1.pkl").exists()
    assert (out_dir / f"{seq_b}_seed1.pkl").exists()


@pytest.mark.slow
def test_eval_dataset_multi_seed(tmp_path, monkeypatch):
    """eval_dataset aggregates multiple seeds (min/mean rules) through the
    CLI path, including the sample_PA-MPJPE-invis metric."""
    from glamr_tpu.cli import eval_dataset, run_dataset

    root = tmp_path / "datasets" / "3DPW"
    est, seq = make_mini_3dpw(str(root), "ms_seq", T=16)
    out_dir = tmp_path / "out"
    pe = out_dir / "pose_est" / seq
    os.makedirs(pe, exist_ok=True)
    # add an occlusion gap so invis metrics have data
    est[0]["bboxes_dict"]["exist"][6:9] = 0.0
    vis = est[0]["bboxes_dict"]["exist"] > 0
    for k in ["smpl_pose_quat_wroot", "smpl_beta", "root_trans", "kp_2d", "cam_K"]:
        est[0][k] = est[0][k][vis]
    with open(pe / "pose.pkl", "wb") as f:
        pickle.dump(est, f)

    monkeypatch.chdir(tmp_path)
    from glamr_tpu.utils import Config
    import yaml
    cfg = Config("glamr_3dpw")
    for ss in cfg.opt_stage_specs.values():
        ss["opt_niters"] = 3
    cfg_file = tmp_path / "tiny.yml"
    with open(cfg_file, "w") as f:
        yaml.safe_dump(cfg.yml_dict, f)

    run_dataset.main([
        "--dataset", "3dpw", "--cfg", str(cfg_file), "--out_dir", str(out_dir),
        "--sequences", seq, "--seeds", "1,2",
    ])
    acc = eval_dataset.main([
        "--dataset", "3dpw", "--cfg", str(cfg_file), "--out_dir", str(out_dir),
        "--sequences", seq, "--seeds", "1,2",
    ])
    m = acc["metrics"]
    assert m["PA-MPJPE"].count > 0
    assert np.isfinite(m["PA-MPJPE-invis"].avg)
    assert (out_dir / "metrics.yml").exists()


@pytest.mark.slow
def test_run_demo_lifter_kp_file(tmp_path, monkeypatch):
    """The in-framework stage 1: train the keypoint lifter briefly, feed
    2D keypoint tracks through run_demo --kp_file (lifter + twist-swing IK
    -> pose.pkl -> global recon), no HybrIK involved."""
    monkeypatch.chdir(tmp_path)
    import yaml

    from glamr_tpu.cli import run_demo, train as train_cli
    from glamr_tpu.data.procedural import procedural_amass_data
    from glamr_tpu.pose_est.synth import LifterDataGen
    from glamr_tpu.utils import Config

    train_cli.main([
        "--model", "lifter", "--synthetic_data", "--synthetic_kind",
        "procedural", "--synthetic_num_seqs", "6", "--epochs", "1",
        "--steps_per_epoch", "2", "--batch_size", "4", "--ndevices", "1",
    ])

    # pixel-space keypoint tracks from a procedural clip + synthetic camera
    smpl = get_smpl("body26fk", synthetic=True)
    data, _, _, _ = procedural_amass_data(num_seqs=4, min_len=40,
                                          max_len=50, seed=3, smpl=smpl)
    T = 24
    gen = LifterDataGen(data, smpl, seq_len=T)
    s = gen.sample(np.random.default_rng(0))
    K = np.array([[1000.0, 0, 960], [0, 1000.0, 540], [0, 0, 1]], np.float32)
    kp_px = s["kp_2d"] * np.array([1000.0, 1000.0]) + np.array([960.0, 540.0])
    kp_file = tmp_path / "tracks.pkl"
    with open(kp_file, "wb") as f:
        pickle.dump({0: {"kp_2d": kp_px.astype(np.float32),
                         "frames": np.arange(T), "conf": s["vis"]},
                     "cam_K": K, "num_fr": T}, f)

    cfg = Config("glamr_static")
    for ss in cfg.opt_stage_specs.values():
        ss["opt_niters"] = 3
    cfg_file = tmp_path / "tiny_demo.yml"
    with open(cfg_file, "w") as f:
        yaml.safe_dump(cfg.yml_dict, f)

    outs = run_demo.main([
        "--cfg", str(cfg_file), "--kp_file", str(kp_file),
        "--out_dir", str(tmp_path / "demo_out"), "--vis", "0",
        "--cached", "0",
    ])
    out = outs[1]
    assert np.isfinite(np.asarray(out["person_data"][0]["root_trans_world"])).all()
    assert (tmp_path / "demo_out" / "pose_est" / "synthetic" / "pose.pkl").exists()


def test_warmup_cli(tmp_path):
    """Warmup CLI populates the persistent compile cache for a config +
    shape bucket (tiny niters override — smoke path only). Runs in a
    subprocess, as in production: jax's persistent-cache dir cannot be
    reliably re-pointed once the in-process cache singleton has been
    initialized by earlier compiles."""
    import subprocess
    import sys

    cache = tmp_path / "xla_cache"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    res = subprocess.run(
        [sys.executable, "-m", "glamr_tpu.cli.warmup",
         "--cfg", "glamr_static", "--num_fr", "20", "--persons", "1",
         "--opt_niters", "2", "--cache_dir", str(cache)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stderr[-2000:]
    cached = [f for _, _, fs in os.walk(cache) for f in fs]
    assert cached, "no compiled programs written to the cache"


@pytest.mark.slow
def test_run_and_eval_dataset_h36m(tmp_path, monkeypatch):
    """glamr_h36m end-to-end on a synthetic Dynamic-H36M sequence built
    through the production preprocessing (convert_h36m_sequence ->
    create_occluded_scene dynamic-camera sinusoidal crop), driven through
    run_dataset -> eval_dataset with the shipped glamr_h36m cfg — the
    reference's Dynamic-H36M protocol (preprocess_h36m_occluded.py:27-151
    + global_recon/eval_dataset.py) with synthetic stand-in data."""
    import yaml

    from glamr_tpu.cli import eval_dataset, run_dataset
    from glamr_tpu.preprocess.h36m import (convert_h36m_sequence,
                                           create_occluded_scene)

    rng = np.random.default_rng(0)
    smpl = get_smpl("body26fk", synthetic=True)
    T2 = 48  # pre-subsample frames -> 24 after the ::2 subsample
    pose = rng.normal(0, 0.1, (T2, 72)).astype(np.float32)
    pose[:, :3] += np.array([1.2092, 1.2092, 1.2092], np.float32)
    trans = np.zeros((T2, 3), np.float32)
    trans[:, 0] = np.linspace(-0.5, 0.5, T2)  # walk so the crop follows
    trans[:, 2] = 0.9
    shape = np.tile(rng.normal(0, 0.3, (1, 10)).astype(np.float32), (T2, 1))

    # camera 4 m back on -y, looking +y (z-up world): rows = cam axes
    cam_R = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32)
    cam_t = -cam_R @ np.array([0, -4.0, 0.9], np.float32)
    cam_K = np.array([[900.0, 0, 500], [0, 900, 500], [0, 0, 1]], np.float32)

    pose_pkl, bb = convert_h36m_sequence(pose, shape, trans, cam_R, cam_t,
                                         cam_K, smpl=smpl,
                                         image_size=(1000, 1000))
    seq = "s_09_act_02_subact_01_ca_01"
    proc = tmp_path / "datasets" / "H36M" / "processed_v1"
    for sub in ["pose", "bbox"]:
        os.makedirs(proc / sub, exist_ok=True)
    with open(proc / "pose" / f"{seq}.pkl", "wb") as f:
        pickle.dump(pose_pkl, f)
    with open(proc / "bbox" / f"{seq}.pkl", "wb") as f:
        pickle.dump(bb, f)

    # dynamic-camera occlusion crop (image-free): small window + fast
    # sinusoid so visibility actually drops at this tiny T
    occ = tmp_path / "datasets" / "H36M" / "occluded_v2"
    scene = create_occluded_scene(
        str(proc / "pose"), str(proc / "bbox"), None, str(occ), seq,
        specs={"crop_w": 420, "crop_h": 420, "magnitude": [260, 15],
               "period": 12, "min_vis_kp": 6})
    pd = scene["person_data"][0]
    visible = np.asarray(pd["visible"], bool)
    assert 0 < visible.sum() < len(visible), \
        "the crop must create real occlusion"

    # pose-est pkl from the occluded-scene geometry: cam-frame pose +
    # keypoints projected with the crop-shifted intrinsics
    Tn = len(visible)
    orient_cam = np.asarray(pd["pose_cam"][:, :3], np.float32)
    body = np.asarray(pd["pose_cam"][:, 3:], np.float32)
    beta = np.tile(np.asarray(pd["shape"], np.float32)[None], (Tn, 1))
    root_cam = np.asarray(pd["root_trans_cam"], np.float32)
    joints = np.asarray(smpl.joints_fast(
        jnp.asarray(orient_cam), jnp.asarray(body), jnp.asarray(beta),
        root_trans=jnp.asarray(root_cam)))
    Kc = np.asarray(scene["meta"]["cam_K"], np.float32)  # (Tn, 3, 3)
    m = smpl_to_body26fk_map()
    kp26 = np.einsum("tij,tnj->tni", Kc,
                     joints / joints[..., 2:3])[..., :2]
    kp24 = np.zeros((Tn, 24, 2), np.float32)
    kp24[:, m[:, 1]] = kp26[:, m[:, 0]]
    rotmats = np.asarray(angle_axis_to_rotation_matrix(jnp.asarray(
        np.concatenate([orient_cam[:, None], body.reshape(Tn, 23, 3)], 1))))
    est = {0: {
        "smpl_pose_quat_wroot": rotmats[visible],
        "smpl_beta": beta[visible],
        "root_trans": root_cam[visible],
        "kp_2d": kp24[visible],
        "cam_K": Kc[visible],
        "bboxes_dict": {"exist": visible.astype(np.float32)},
    }}
    out_dir = tmp_path / "out"
    pe = out_dir / "pose_est" / seq
    os.makedirs(pe, exist_ok=True)
    with open(pe / "pose.pkl", "wb") as f:
        pickle.dump(est, f)

    monkeypatch.chdir(tmp_path)
    from glamr_tpu.utils import Config
    cfg = Config("glamr_h36m")
    assert cfg.dataset == "h36m"
    assert cfg.grecon_model_specs["flag_infer_motion_traj"]
    for ss in cfg.opt_stage_specs.values():
        ss["opt_niters"] = 5
    cfg_file = tmp_path / "glamr_h36m_tiny.yml"
    with open(cfg_file, "w") as f:
        yaml.safe_dump(cfg.yml_dict, f)

    run_dataset.main([
        "--dataset", "h36m", "--cfg", str(cfg_file),
        "--out_dir", str(out_dir), "--sequences", seq, "--seeds", "1",
    ])
    out_pkl = out_dir / f"{seq}_seed1.pkl"
    assert out_pkl.exists()

    acc = eval_dataset.main([
        "--dataset", "h36m", "--cfg", str(cfg_file),
        "--out_dir", str(out_dir), "--sequences", seq, "--seeds", "1",
    ])
    m = acc["metrics"]
    assert m["PA-MPJPE"].count > 0
    assert np.isfinite(m["PA-MPJPE"].avg)
    assert np.isfinite(m["G-MPJPE"].avg)
    assert np.isfinite(m["PA-MPJPE-invis"].avg)  # occluded frames scored


# pure-numpy stub standing in for HybrIK's pose_est/hybrik_demo/demo.py:
# parses the bridge's arg protocol, reads the extracted frames, emits a
# schema-valid pose.pkl, and appends to calls.txt so the test can count
# subprocess invocations (cache behavior).
_FAKE_HYBRIK_DEMO = '''
import argparse, os, pickle
import numpy as np

p = argparse.ArgumentParser()
p.add_argument("--img_dir", required=True)
p.add_argument("--out_dir", required=True)
p.add_argument("--bbox_file", default=None)
p.add_argument("--multi", action="store_true")
a = p.parse_args()

frames = sorted(f for f in os.listdir(a.img_dir)
                if f.lower().endswith((".jpg", ".png")))
T = len(frames)
assert T > 0, "bridge must extract frames before invoking HybrIK"

def rodrigues(aa):
    th = np.linalg.norm(aa)
    k = aa / max(th, 1e-8)
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)

rot = np.tile(np.eye(3, dtype=np.float32), (T, 24, 1, 1))
rot[:, 0] = rodrigues(np.array([1.2092, 1.2092, 1.2092])).astype(np.float32)
K = np.array([[1000.0, 0, 480], [0, 1000.0, 270], [0, 0, 1]], np.float32)
rng = np.random.default_rng(0)
kp = (np.array([480.0, 270.0]) +
      rng.normal(0, 40, (T, 24, 2))).astype(np.float32)
est = {0: {
    "smpl_pose_quat_wroot": rot,
    "smpl_beta": np.zeros((T, 10), np.float32),
    "root_trans": np.tile(np.array([0, 0.1, 3.5], np.float32), (T, 1)),
    "kp_2d": kp,
    "cam_K": np.tile(K, (T, 1, 1)),
    "frames": np.arange(T),
    "frame2ind": {int(f): i for i, f in enumerate(np.arange(T))},
    "bboxes_dict": {"exist": np.ones(T, np.float32)},
}}
os.makedirs(a.out_dir, exist_ok=True)
with open(os.path.join(a.out_dir, "pose.pkl"), "wb") as f:
    pickle.dump(est, f)
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "..", "calls.txt"), "a") as f:
    f.write(f"{a.img_dir} multi={a.multi}\\n")
'''


def _install_fake_hybrik(root, monkeypatch):
    """Stub 'HybrIK checkout': the demo script the bridge launches, at the
    path the reference hard-codes (pose_est/hybrik_demo/demo.py)."""
    import sys

    demo_dir = root / "pose_est" / "hybrik_demo"
    demo_dir.mkdir(parents=True)
    (demo_dir / "demo.py").write_text(_FAKE_HYBRIK_DEMO)
    (demo_dir / "demo_dataset.py").write_text(_FAKE_HYBRIK_DEMO)
    monkeypatch.setenv("HYBRIK_PYTHON", sys.executable)
    monkeypatch.setenv("HYBRIK_DIR", str(root))
    return root / "calls.txt"


@pytest.mark.slow
def test_hybrik_bridge_subprocess(tmp_path, monkeypatch):
    """Live-fire of the HybrIK subprocess bridge (pose_est/bridge.py):
    env resolution (HYBRIK_PYTHON/HYBRIK_DIR), frame extraction, cwd and
    arg protocol, pose.pkl schema validation, and caching — against a
    stub HybrIK install (reference: pose_est/run_pose_est_demo.py:12-28,
    which shells out to a conda env the same way)."""
    from glamr_tpu.pose_est import load_pose_pkl, run_pose_est_on_video
    from glamr_tpu.pose_est.bridge import run_pose_est_on_video as bridge_fn
    from glamr_tpu.vis.video import frames_to_video

    # 12-frame tiny video for the bridge to decompose
    T = 12
    frames = (np.random.default_rng(0).integers(0, 255, (T, 64, 96, 3))
              .astype(np.uint8))
    video = str(tmp_path / "clip.mp4")
    frames_to_video(frames, video, fps=10)

    calls = _install_fake_hybrik(tmp_path / "fake_hybrik", monkeypatch)
    pe_dir = tmp_path / "pose_est_out"
    img_dir = pe_dir / "frames"

    pkl = run_pose_est_on_video(video, str(img_dir), str(pe_dir))
    assert os.path.isfile(pkl)
    est = load_pose_pkl(pkl)  # schema validation
    assert est[0]["smpl_pose_quat_wroot"].shape == (T, 24, 3, 3)
    n_imgs = len([f for f in os.listdir(img_dir) if f.endswith(".jpg")])
    assert n_imgs == T, "bridge must extract every frame"
    assert calls.read_text().count("\n") == 1

    # cache hit: pose.pkl exists -> no second subprocess launch
    pkl2 = run_pose_est_on_video(video, str(img_dir), str(pe_dir))
    assert pkl2 == pkl and calls.read_text().count("\n") == 1

    # cached=False forces a re-run (bbox_file selects demo_dataset.py)
    bbox = tmp_path / "bboxes.pkl"
    bbox.write_bytes(pickle.dumps({}))
    run_pose_est_on_video(video, str(img_dir), str(pe_dir), cached=False,
                          bbox_file=str(bbox), multi=True)
    lines = calls.read_text().strip().splitlines()
    assert len(lines) == 2 and "multi=True" in lines[1]
    assert bridge_fn is run_pose_est_on_video  # package re-export intact


@pytest.mark.slow
def test_run_demo_via_hybrik_bridge(tmp_path, monkeypatch):
    """run_demo driven end-to-end through the subprocess bridge (no
    --synthetic_pose_est / --detect / --kp_file): video -> stub HybrIK ->
    pose.pkl -> global recon. Covers the one stage-1 entry path the other
    CLI tests never fire (reference flow: global_recon/run_demo.py
    calling run_pose_est_on_video)."""
    monkeypatch.chdir(tmp_path)
    import yaml

    from glamr_tpu.cli import run_demo
    from glamr_tpu.utils import Config
    from glamr_tpu.vis.video import frames_to_video

    T = 10
    frames = (np.random.default_rng(1).integers(0, 255, (T, 64, 96, 3))
              .astype(np.uint8))
    video = str(tmp_path / "bridgeclip.mp4")
    frames_to_video(frames, video, fps=10)
    _install_fake_hybrik(tmp_path / "fake_hybrik", monkeypatch)

    cfg = Config("glamr_static")
    for ss in cfg.opt_stage_specs.values():
        ss["opt_niters"] = 2
    cfg_file = tmp_path / "tiny_bridge.yml"
    with open(cfg_file, "w") as f:
        yaml.safe_dump(cfg.yml_dict, f)

    outs = run_demo.main([
        "--cfg", str(cfg_file), "--video_path", video,
        "--out_dir", str(tmp_path / "demo_out"), "--vis", "0",
    ])
    out = outs[1]
    rt = np.asarray(out["person_data"][0]["root_trans_world"])
    assert rt.shape[0] == T and np.isfinite(rt).all()
    assert (tmp_path / "demo_out" / "pose_est" / "bridgeclip" /
            "pose.pkl").exists()


@pytest.mark.slow
def test_real_data_pipeline_smoke(tmp_path, monkeypatch):
    """The executable real-data runbook (scripts/real_data_pipeline.py)
    against fabricated stand-in assets: raw AMASS npz tree + raw 3DPW
    sequenceFiles + fabricated reference Lightning ckpts -> preprocess,
    port, release-freeze, recon sweep, eval — one unattended command, so
    day-one real-asset onboarding needs no new code (runbook sections
    1-5)."""
    import sys

    torch = pytest.importorskip("torch")
    _here = os.path.dirname(os.path.abspath(__file__))
    for _p in (_here, os.path.join(os.path.dirname(_here), "scripts")):
        if _p not in sys.path:
            sys.path.insert(0, _p)
    from refutil import ensure_ref

    if not ensure_ref():
        pytest.skip("reference not available")
    from test_port_cli import RefCfg, fabricate_lightning_ckpt
    from test_preprocess import make_fake_3dpw_seq

    import real_data_pipeline

    rng = np.random.default_rng(0)

    # raw 3DPW (official sequenceFiles layout)
    tdpw_root = make_fake_3dpw_seq(tmp_path / "3dpw_raw", T=12, persons=2)

    # raw AMASS npz tree
    amass_root = tmp_path / "amass_raw" / "CMU" / "01"
    amass_root.mkdir(parents=True)
    np.savez(amass_root / "walk_poses.npz",
             poses=rng.normal(0, 0.1, (240, 156)).astype(np.float32),
             trans=rng.normal(0, 0.1, (240, 3)).astype(np.float32),
             betas=rng.normal(0, 0.3, (16,)).astype(np.float32),
             mocap_framerate=np.float64(60.0))

    monkeypatch.chdir(tmp_path)
    # fabricated reference release ckpts (reference TrajPredVAE reads
    # data/J_regressor_extra.npy relative to CWD at construction)
    os.makedirs("data", exist_ok=True)
    np.save("data/J_regressor_extra.npy", np.zeros((9, 24), np.float32))
    from motion_infiller.models.motion_infiller_vae import (
        MotionInfillerVAE as RefMF,
    )
    from traj_pred.models.traj_pred_vae import TrajPredVAE as RefTP

    torch.manual_seed(7)
    mf_ckpt = str(tmp_path / "model-mf.ckpt")
    tp_ckpt = str(tmp_path / "model-tp.ckpt")
    fabricate_lightning_ckpt(RefMF(RefCfg(
        "/root/reference/motion_infiller/cfg/motion_infiller_demo.yml"
    )).eval(), mf_ckpt)
    fabricate_lightning_ckpt(RefTP(RefCfg(
        "/root/reference/traj_pred/cfg/traj_pred_demo.yml")).eval(), tp_ckpt)

    # pre-place a schema-valid pose estimate so the sweep needs no HybrIK
    from glamr_tpu.pose_est import synthetic_pose_est

    pe_dir = tmp_path / "sweep_out" / "3dpw" / "pose_est" / "test_seq_00"
    synthetic_pose_est(12, num_persons=2, pose_est_dir=str(pe_dir))

    summary = real_data_pipeline.main([
        "--threedpw_dir", tdpw_root,
        "--amass_raw_dir", str(tmp_path / "amass_raw"),
        "--mf_ckpt", mf_ckpt, "--tp_ckpt", tp_ckpt,
        "--results_out", str(tmp_path / "sweep_out"),
        "--sequences", "test_seq_00", "--seeds", "1", "--opt_niters", "2",
        "--out", str(tmp_path / "summary.json"),
    ])

    assert set(summary["stages_run"]) >= {"amass", "threedpw", "port",
                                          "sweep"}
    # port stage ran -> auto mode selects the FULL traj prior (mocap-
    # trained reference weights drive the trajectory, reference behavior)
    assert summary["traj_prior_mode"] == "on"
    # preprocessed artifacts at the conventional paths
    assert os.path.isfile("datasets/amass_processed/v1/amass_train.pkl")
    assert os.path.isfile("datasets/3DPW/processed_v1/pose/test_seq_00.pkl")
    # ported + frozen release params
    assert os.path.isfile("checkpoints/motion_infiller_demo.params.pkl")
    assert os.path.isfile("checkpoints/traj_pred_demo.params.pkl")
    # sweep produced finite metrics
    m = summary["sweep"]["3dpw"]["metrics"]
    assert np.isfinite(m["PA-MPJPE"]["avg"]) and m["PA-MPJPE"]["count"] > 0
    assert np.isfinite(m["G-MPJPE"]["avg"])
    assert os.path.isfile(str(tmp_path / "summary.json"))
