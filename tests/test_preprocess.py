"""Preprocessing tests on synthetic inputs: AMASS resample/convert, 3DPW
sequence conversion schema, Dynamic-H36M occlusion generation."""
import os
import pickle
import numpy as np
import pytest

from glamr_tpu.body import get_smpl
from glamr_tpu.preprocess import (
    convert_3dpw,
    create_occluded_scene,
    gen_sinusoidal_traj,
    process_amass,
    resample_sequence,
    smplh_to_smpl_pose,
)


class TestAMASS:
    def test_resample(self):
        x = np.arange(60, dtype=np.float32)[:, None]
        y = resample_sequence(x, 60.0, 30.0)
        assert y.shape[0] == 30
        np.testing.assert_allclose(y[0], 0, atol=1e-5)
        np.testing.assert_allclose(y[-1], 59, atol=1e-5)

    def test_smplh_subset(self):
        poses = np.tile(np.arange(156, dtype=np.float32), (3, 1))
        out = smplh_to_smpl_pose(poses)
        assert out.shape == (3, 72)
        # first 23 joints map straight through
        np.testing.assert_array_equal(out[0, :69], poses[0, :69])
        # last joint is SMPL-H joint 37
        np.testing.assert_array_equal(out[0, 69:], poses[0, 37 * 3: 37 * 3 + 3])

    def test_process(self):
        rng = np.random.default_rng(0)
        motions = [
            {"poses": rng.normal(0, 0.1, (150, 156)).astype(np.float32),
             "trans": rng.normal(0, 0.1, (150, 3)).astype(np.float32),
             "betas": rng.normal(0, 0.3, (16,)).astype(np.float32),
             "mocap_framerate": 60.0}
            for _ in range(4)
        ]
        smpl = get_smpl("body26fk", synthetic=True)
        train, test, tj, sj = process_amass(motions, smpl=smpl, train_ratio=0.75)
        assert len(train) == 3 and len(test) == 1
        theta = next(iter(train.values()))
        assert theta.shape[1] == 85 and theta.shape[0] == 75  # 60->30 fps
        jp, jp_ns = next(iter(tj.values()))
        assert jp.shape == (75, 24, 3) and jp_ns.shape == (75, 24, 3)
        # shaped and unshaped joints differ (betas nonzero)
        assert np.abs(jp - jp_ns).max() > 1e-4

    def test_read_raw_amass(self, tmp_path):
        """Raw-npz ingestion (reference amass_utils.py:149 read_data):
        <root>/<dataset>/<subject>/<action>.npz with SMPL-H poses at
        mocap_framerate, shape.npz files skipped, integer-stride
        decimation to 30 fps; output feeds process_amass unchanged."""
        from glamr_tpu.preprocess.amass import read_raw_amass

        rng = np.random.default_rng(1)
        root = tmp_path / "amass_raw"
        for ds, subj, n_act in [("CMU", "01", 2), ("CMU", "02", 1),
                                ("BMLmovi", "s1", 1)]:
            d = root / ds / subj
            d.mkdir(parents=True, exist_ok=True)
            for k in range(n_act):
                T = 240 + 60 * k
                np.savez(d / f"act{k}_poses.npz",
                         poses=rng.normal(0, 0.1, (T, 156)).astype(np.float32),
                         trans=rng.normal(0, 0.1, (T, 3)).astype(np.float32),
                         betas=rng.normal(0, 0.3, (16,)).astype(np.float32),
                         mocap_framerate=np.float64(60.0))
            np.savez(d / "shape.npz", betas=np.zeros(16))  # must be skipped
            np.savez(d / "meta_poses.npz", gender="male")  # no poses: skipped

        motions = read_raw_amass(str(root))
        assert len(motions) == 4
        names = sorted(m["name"] for m in motions)
        assert names[0] == "BMLmovi_s1_act0_poses"
        m0 = next(m for m in motions if m["name"] == "CMU_01_act0_poses")
        # 240 frames @60 fps -> stride 2 -> 120 frames @30
        assert m0["poses"].shape == (120, 156)
        assert m0["trans"].shape == (120, 3)
        assert m0["mocap_framerate"] == 30.0

        # --sequences filter selects dataset subdirs
        only = read_raw_amass(str(root), sequences=["BMLmovi"])
        assert [m["name"] for m in only] == ["BMLmovi_s1_act0_poses"]

        # feeds process_amass directly (no double resampling: already 30)
        smpl = get_smpl("body26fk", synthetic=True)
        train, test, tj, sj = process_amass(motions, smpl=smpl,
                                            train_ratio=0.75)
        assert len(train) + len(test) == 4
        theta = dict(train, **test)["CMU_01_act0_poses"]
        assert theta.shape == (120, 85)


def make_fake_3dpw_seq(tmp_path, T=12, persons=2):
    rng = np.random.default_rng(0)
    seq_dir = tmp_path / "sequenceFiles" / "all"
    seq_dir.mkdir(parents=True)
    cam_poses = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
    cam_poses[:, 2, 3] = 0.5
    data = {
        "poses": [rng.normal(0, 0.1, (T, 72)).astype(np.float32)
                  for _ in range(persons)],
        "betas": [rng.normal(0, 0.3, (10,)).astype(np.float32)
                  for _ in range(persons)],
        "trans": [np.tile(np.array([0.3 * p, 0.2, 3.0], np.float32), (T, 1))
                  for p in range(persons)],
        "poses2d": [rng.uniform(0, 500, (T, 3, 18)).astype(np.float32)
                    for _ in range(persons)],
        "campose_valid": [np.ones(T) for _ in range(persons)],
        "cam_poses": cam_poses,
        "cam_intrinsics": np.array([[800.0, 0, 400], [0, 800, 300], [0, 0, 1]]),
    }
    with open(seq_dir / "test_seq_00.pkl", "wb") as f:
        pickle.dump(data, f)
    return str(tmp_path)


class Test3DPW:
    def test_convert_schema(self, tmp_path):
        data_path = make_fake_3dpw_seq(tmp_path)
        out_path = str(tmp_path / "processed")
        smpl = get_smpl("body30", synthetic=True)
        convert_3dpw(data_path, out_path, smpl=smpl, image_size=(800, 600))
        with open(os.path.join(out_path, "pose", "test_seq_00.pkl"), "rb") as f:
            out = pickle.load(f)
        pd = out["person_data"][0]
        for key in ["pose", "shape", "trans", "root_trans", "pose_cam",
                    "root_trans_cam", "j3d", "j2d", "j2d_body26fk", "j2d_coco",
                    "visible", "bbox"]:
            assert key in pd, key
        assert pd["pose"].shape == (12, 72)
        assert pd["j2d_body26fk"].shape == (12, 26, 3)
        assert out["meta"]["cam_K"].shape == (3, 3)
        with open(os.path.join(out_path, "bbox", "test_seq_00.pkl"), "rb") as f:
            bb = pickle.load(f)
        assert set(bb[0]) >= {"id", "bbox", "exist", "start", "end",
                              "num_frames", "exist_frames"}


class TestH36MOccluded:
    def test_sinusoid(self):
        base = np.zeros((100, 2))
        traj = gen_sinusoidal_traj(base, [50, 10], 50)
        assert np.abs(traj[:, 0]).max() == pytest.approx(50, abs=1.0)
        assert np.abs(traj).min() == 0

    def test_create_occluded(self, tmp_path):
        T = 60
        rng = np.random.default_rng(0)
        pose_dir = tmp_path / "pose"; pose_dir.mkdir()
        bbox_dir = tmp_path / "bbox"; bbox_dir.mkdir()
        kp = rng.uniform(300, 900, (T, 26, 2)).astype(np.float32)
        pd = {
            "pose": rng.normal(0, 0.1, (T, 72)).astype(np.float32),
            "j2d": kp.copy(), "j2d_body26fk": np.dstack([kp, np.ones((T, 26, 1))]),
            "visible": np.ones(T, np.int64),
            "bbox": np.tile(np.array([350, 350, 850, 850], np.float32), (T, 1)),
        }
        scene = {"person_data": {0: pd},
                 "meta": {"cam_K": np.array([[1000.0, 0, 600], [0, 1000, 600],
                                             [0, 0, 1]]),
                          "image_w": 1200, "image_h": 1200}}
        bbox = {0: {"id": 0, "bbox": pd["bbox"], "exist": np.ones(T, np.int64)}}
        with open(pose_dir / "s.pkl", "wb") as f:
            pickle.dump(scene, f)
        with open(bbox_dir / "s.pkl", "wb") as f:
            pickle.dump(bbox, f)
        out = create_occluded_scene(str(pose_dir), str(bbox_dir), None,
                                    str(tmp_path / "occ"), "s",
                                    {"crop_w": 400, "crop_h": 400,
                                     "magnitude": [400, 0], "period": 40})
        pd2 = out["person_data"][0]
        # the moving crop must occlude the person at some frames
        assert pd2["visible"].sum() < T
        assert pd2["visible"].sum() > 0
        assert out["meta"]["image_w"] == 400
        # principal point follows the crop
        assert out["meta"]["cam_K"].shape == (T, 3, 3)


class TestH36MConvert:
    def test_sequence_schema(self):
        rng = np.random.default_rng(0)
        T = 20
        smpl = get_smpl("body30", synthetic=True)
        from glamr_tpu.preprocess import convert_h36m_sequence
        pose_pkl, bb = convert_h36m_sequence(
            pose=rng.normal(0, 0.1, (T, 72)).astype(np.float32),
            shape=np.tile(rng.normal(0, 0.3, (1, 10)), (T, 1)).astype(np.float32),
            trans=np.tile(np.array([0, 0, 3.0], np.float32), (T, 1)),
            cam_R=np.eye(3, dtype=np.float32),
            cam_t=np.zeros(3, np.float32),
            cam_K=np.array([[1000.0, 0, 500], [0, 1000, 500], [0, 0, 1]],
                           np.float32),
            smpl=smpl, subsample=2,
        )
        pd = pose_pkl["person_data"][0]
        assert pd["pose"].shape == (10, 72)  # 50 -> 25 fps
        for key in ["pose", "trans", "root_trans", "pose_cam",
                    "root_trans_cam", "j3d", "j2d", "visible", "bbox"]:
            assert key in pd, key
        assert bb[0]["num_frames"] == 10
