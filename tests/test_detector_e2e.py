"""End-to-end in-framework stage 1: rendered video -> conv detector ->
greedy tracker -> keypoint lifter -> analytic IK -> pose.pkl -> global
recon. The reference needs FasterRCNN/YOLO + MPT + HybrIK in a separate
conda env for this path (pose_est/run_pose_est_demo.py:25-28); here every
stage is jit-compiled in this process."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; quick signal: pytest -m 'not slow'


@pytest.mark.slow
def test_video_pose_est_to_recon(tmp_path):
    import jax
    import jax.numpy as jnp

    from glamr_tpu.body.smpl import get_smpl
    from glamr_tpu.data import procedural_amass_data
    from glamr_tpu.pose_est.detector import (DEFAULT_DETECTOR_LOSS_CFG,
                                             DetectorConfig,
                                             PersonKeypointDetector,
                                             init_detector)
    from glamr_tpu.pose_est.estimator import video_pose_est
    from glamr_tpu.pose_est.lifter import (DEFAULT_LIFTER_LOSS_CFG,
                                           KeypointLifter, LifterConfig,
                                           init_lifter)
    from glamr_tpu.pose_est.synth import LifterDataGen, lookat_cam
    from glamr_tpu.pose_est.synth_images import (DetectorDataGen,
                                                 render_mesh_image)
    from glamr_tpu.train.trainer import (make_detector_train_step,
                                         make_lifter_train_step, make_tx)

    smpl = get_smpl("body26fk", synthetic=True)
    data, _, _, _ = procedural_amass_data(2, seed=0)
    cfg = DetectorConfig(img_size=64, base_ch=8, num_blocks=1, max_people=3)

    # ---- render a T-frame video of one procedural walk, fixed camera ----
    from glamr_tpu.body.lbs import lbs

    T = 16
    theta = list(data.values())[0][:T]
    verts, joints = lbs(smpl.model, jnp.asarray(theta[:, 75:85]),
                        jnp.asarray(theta[:, 3:75]))
    verts = np.asarray(verts) + theta[:, None, :3]
    joints = np.asarray(joints) + theta[:, None, :3]
    center = joints[:, 0].mean(axis=0)
    R, cpos = lookat_cam(center + np.array([3.5, 0.5, 1.4]), center)
    size = cfg.img_size
    f = size * 1.1
    K = np.array([[f, 0, size / 2], [0, f, size / 2], [0, 0, 1]], np.float32)
    rng = np.random.default_rng(0)
    frames = np.stack([
        (render_mesh_image([verts[t]], smpl.faces, R, cpos, K, size, rng)
         * 255).astype(np.uint8)
        for t in range(T)
    ])

    # ---- overfit the detector on exactly these frames (targets from the
    # known projection), the integration analog of the training CLI ----
    jc = np.einsum("ij,tnj->tni", R, joints - cpos)
    kp = np.einsum("ij,tnj->tni", K, jc / jc[..., 2:])[..., :2]
    hm, s = cfg.hm_size, cfg.out_stride
    from glamr_tpu.pose_est.detector import splat_gaussian

    Kn = cfg.num_kp
    M = cfg.max_people
    batch = {
        "images": frames.astype(np.float32) / 255.0,
        "gt_center_hm": np.zeros((T, hm, hm), np.float32),
        "gt_kp_hm": np.zeros((T, hm, hm, Kn), np.float32),
        "gt_center_idx": np.zeros((T, M, 2), np.int32),
        "gt_kp_offset": np.zeros((T, M, Kn, 2), np.float32),
        "gt_kp_vis": np.zeros((T, M, Kn), np.float32),
        "gt_person_mask": np.zeros((T, M), np.float32),
    }
    sigma = max(hm / 24.0, 1.0)
    for t in range(T):
        cy, cx = int(kp[t, 0, 1] / s), int(kp[t, 0, 0] / s)
        batch["gt_center_hm"][t] = splat_gaussian(hm, [(cy, cx)], sigma)
        batch["gt_center_idx"][t, 0] = (cy, cx)
        batch["gt_person_mask"][t, 0] = 1.0
        batch["gt_kp_vis"][t, 0] = 1.0
        batch["gt_kp_offset"][t, 0] = kp[t] / s - np.array([cx, cy])
        kc = np.round(kp[t] / s)
        yy, xx = np.mgrid[0:hm, 0:hm].astype(np.float32)
        d2 = (yy[None] - kc[:, 1, None, None]) ** 2 \
            + (xx[None] - kc[:, 0, None, None]) ** 2
        batch["gt_kp_hm"][t] = np.exp(-d2 / (2 * sigma ** 2)).transpose(1, 2, 0)

    model = PersonKeypointDetector(cfg)
    tx = make_tx(3e-3)
    state = init_detector(model, tx, jax.random.PRNGKey(0))
    step = make_detector_train_step(model, tx, DEFAULT_DETECTOR_LOSS_CFG)
    tb = {k: jnp.asarray(v) for k, v in batch.items()}
    for i in range(150):
        state, m = step(state, tb, jax.random.PRNGKey(i))
    assert np.isfinite(float(m["loss"]))

    # ---- a briefly-trained lifter (integration only; quality untested) ----
    lcfg = LifterConfig(d_model=64, nhead=4, ff_dim=128, nlayer=1)
    lifter = KeypointLifter(lcfg)
    ltx = make_tx(1e-3)
    lstate = init_lifter(lifter, ltx, jax.random.PRNGKey(0), seq_len=T)
    lstep = make_lifter_train_step(lifter, ltx, DEFAULT_LIFTER_LOSS_CFG)
    lgen = LifterDataGen(data, smpl, seq_len=T)
    lrng = np.random.default_rng(0)
    for i in range(3):
        lb = lgen.batch(lrng, 4)
        lstate, _ = lstep(lstate, {k: jnp.asarray(v) for k, v in lb.items()},
                          jax.random.PRNGKey(i))

    # ---- full video -> pose.pkl ----
    est = video_pose_est(
        frames, cam_K=K,
        detector=model, detector_params=state.params,
        lifter=lifter, lifter_params=lstate.params, smpl=smpl,
        score_thresh=0.25, pose_est_dir=str(tmp_path / "pose_est"))
    assert len(est) >= 1, "detector+tracker found no person track"
    p0 = est[0]
    Tv = p0["frames"].shape[0]
    assert Tv >= T - 4  # tracked through (nearly) the whole clip
    assert p0["smpl_pose_quat_wroot"].shape == (Tv, 24, 3, 3)
    # detector keypoints close to the projected GT on tracked frames
    kp_err = np.abs(p0["kp_2d"] - kp[p0["frames"]]).mean()
    assert kp_err < 4.0, f"detector kp err {kp_err:.2f}px"
    assert (tmp_path / "pose_est" / "pose.pkl").exists()

    # ---- recon consumes the in-framework estimate ----
    from glamr_tpu.recon import GlobalReconOptimizer
    from glamr_tpu.utils import Config

    rcfg = Config("glamr_static")
    for ss in rcfg.opt_stage_specs.values():
        ss["opt_niters"] = 3
    opt = GlobalReconOptimizer(rcfg, smpl=smpl)
    out = opt.optimize({"est": est, "gt": {}, "gt_meta": {},
                        "seq_name": "detector_e2e"})
    assert np.isfinite(
        np.asarray(out["person_data"][0]["root_trans_world"])).all()
