"""CVAE model tests: shapes, finiteness, masking and stitching semantics."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from glamr_tpu.models import (
    JointModel,
    MotionInfillerConfig,
    MotionInfillerVAE,
    Normal,
    TrajPredConfig,
    TrajPredVAE,
    infill_multi_step,
    num_windows,
    predict_multi_step,
)
from glamr_tpu.body import get_smpl
from glamr_tpu.models.configs import TransformerSpec


def tiny_mf_cfg():
    ts = TransformerSpec(nlayer=1, model_dim=32, nhead=4, ff_dim=64, dropout=0.0)
    return MotionInfillerConfig(
        nz=8, past_nframe=4, cur_nframe=6, fut_nframe=2,
        ctx_in_fc=32, ctx_transformer=ts, enc_transformer=ts,
        dec_transformer=ts, dec_out_mlp=(32,), prior_transformer=ts,
    )


def tiny_tp_cfg():
    return TrajPredConfig(
        nz=8, seq_len=10,
        ctx_in_mlp=(32,), ctx_rnn_layers=1, ctx_rnn_hdim=32, ctx_out_mlp=(32,),
        enc_in_mlp=(32,), enc_rnn_layers=1, enc_rnn_hdim=32, enc_out_mlp=(32,),
        enc_fusion_mlp=(32,), dec_out_mlp=(32,), dec_prior_mlp=(32,),
    )


@pytest.fixture(scope="module")
def mf():
    cfg = tiny_mf_cfg()
    model = MotionInfillerVAE(cfg)
    T = cfg.window_len
    pose = jnp.zeros((2, T, 69))
    mask = jnp.ones((2, T))
    params = model.init(jax.random.PRNGKey(0), pose, pose, mask)
    return model, params


@pytest.fixture(scope="module")
def tp():
    cfg = tiny_tp_cfg()
    model = TrajPredVAE(cfg)
    jp = jnp.zeros((2, cfg.seq_len, 69))
    trans = jnp.zeros((2, cfg.seq_len, 3))
    q = jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, cfg.seq_len, 1))
    params = model.init(jax.random.PRNGKey(0), jp, trans, q)
    return model, params


class TestNormal:
    def test_kl_standard_prior(self):
        d = Normal(mu=jnp.zeros((3, 4)), logvar=jnp.zeros((3, 4)))
        np.testing.assert_allclose(np.asarray(d.kl()), 0.0, atol=1e-6)

    def test_kl_closed_form(self):
        q = Normal(mu=jnp.ones((2,)), logvar=jnp.zeros((2,)))
        p = Normal(mu=jnp.zeros((2,)), logvar=jnp.zeros((2,)))
        np.testing.assert_allclose(np.asarray(q.kl(p)), 0.5, atol=1e-5)

    def test_sample_eps_injection(self):
        d = Normal(mu=jnp.ones((2, 3)), logvar=jnp.zeros((2, 3)))
        s = d.sample(jnp.zeros((2, 3)))
        np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-6)


class TestMotionInfiller:
    def test_train_forward_shapes(self, mf, rng):
        model, params = mf
        cfg = model.cfg
        T = cfg.window_len
        pose = jnp.asarray(rng.normal(size=(2, T, 69)).astype(np.float32) * 0.2)
        mask = jnp.ones((2, T))
        out = model.apply(params, pose, pose, mask, rng=jax.random.PRNGKey(1))
        assert out["out_body_pose"].shape == (2, cfg.past_nframe + cfg.cur_nframe, 69)
        assert np.isfinite(np.asarray(out["out_body_pose"])).all()
        assert out["q_z_dist"].mu.shape == (2, cfg.nz)
        assert out["p_z_dist"].mu.shape == (2, cfg.nz)

    def test_past_frames_passthrough(self, mf, rng):
        model, params = mf
        cfg = model.cfg
        T = cfg.window_len
        pose = jnp.asarray(rng.normal(size=(1, T, 69)).astype(np.float32))
        mask = jnp.ones((1, T))
        out = model.apply(params, pose, mask, jnp.zeros((1, cfg.nz)),
                          method=MotionInfillerVAE.infer_step)
        np.testing.assert_allclose(
            np.asarray(out[:, : cfg.past_nframe]),
            np.asarray(pose[:, : cfg.past_nframe]), atol=1e-6,
        )

    def test_masking_changes_output(self, mf, rng):
        """An occluded frame's input must not influence the context."""
        model, params = mf
        cfg = model.cfg
        T = cfg.window_len
        pose = jnp.asarray(rng.normal(size=(1, T, 69)).astype(np.float32))
        mask = np.ones((1, T), np.float32)
        mask[0, 6:10] = 0.0
        # change pose content on masked frames: output must be invariant
        pose2 = np.asarray(pose).copy()
        pose2[0, 6:10] += 100.0
        # masked input frames are zeroed by convention before entering
        pose_a = np.asarray(pose).copy()
        pose_a[0, 6:10] = 0.0
        out_a = model.apply(params, jnp.asarray(pose_a), jnp.asarray(mask),
                            jnp.zeros((1, cfg.nz)), method=MotionInfillerVAE.infer_step)
        # attention-level invariance: masked frames attend nothing, but their
        # (zeroed) values still enter via values? No: key padding masks them.
        pose_b = np.asarray(pose).copy()
        pose_b[0, 6:10] = 0.0
        out_b = model.apply(params, jnp.asarray(pose_b), jnp.asarray(mask),
                            jnp.zeros((1, cfg.nz)), method=MotionInfillerVAE.infer_step)
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)

    def test_multi_step_stitching(self, mf, rng):
        model, params = mf
        cfg = model.cfg
        T = 25  # forces 4 windows with cur=6
        pose = jnp.asarray(rng.normal(size=(1, T, 69)).astype(np.float32) * 0.2)
        mask = np.ones((1, T), np.float32)
        mask[0, 8:16] = 0.0
        nwin = num_windows(cfg, T)
        eps = jnp.zeros((nwin, 1, cfg.nz))
        out = infill_multi_step(model, params, pose, jnp.asarray(mask), eps)
        assert out.shape == (1, T, 69)
        assert np.isfinite(np.asarray(out)).all()
        # first past_nframe frames pass through unchanged
        np.testing.assert_allclose(
            np.asarray(out[:, : cfg.past_nframe]),
            np.asarray(pose[:, : cfg.past_nframe]), atol=1e-6,
        )

    def test_multi_step_differentiable_wrt_eps(self, mf, rng):
        model, params = mf
        cfg = model.cfg
        T = 16
        pose = jnp.asarray(rng.normal(size=(1, T, 69)).astype(np.float32) * 0.2)
        mask = jnp.ones((1, T))
        nwin = num_windows(cfg, T)

        def loss(eps):
            out = infill_multi_step(model, params, pose, mask, eps)
            return jnp.sum(out**2)

        g = jax.grad(loss)(jnp.ones((nwin, 1, cfg.nz)) * 0.1)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


class TestTrajPred:
    def test_train_forward(self, tp, rng):
        model, params = tp
        cfg = model.cfg
        T = cfg.seq_len
        jp = jnp.asarray(rng.normal(size=(2, T, 69)).astype(np.float32) * 0.3)
        trans = jnp.asarray(np.cumsum(rng.normal(size=(2, T, 3)), axis=1).astype(np.float32) * 0.02)
        from glamr_tpu.transforms import angle_axis_to_quaternion
        q = angle_axis_to_quaternion(jnp.asarray(rng.normal(size=(2, T, 3)).astype(np.float32) * 0.3))
        out = model.apply(params, jp, trans, q, rng=jax.random.PRNGKey(2))
        assert out["out_local_traj"].shape == (2, T, 11)
        assert out["out_trans"].shape == (2, T, 3)
        assert out["out_orient_q"].shape == (2, T, 4)
        assert np.isfinite(np.asarray(out["out_trans"])).all()
        # frame-0 absolutes come from GT
        np.testing.assert_allclose(
            np.asarray(out["out_local_traj"][:, 0, :2]),
            np.asarray(out["gt_local_traj"][:, 0, :2]), atol=1e-5,
        )

    def test_decode_with_init(self, tp, rng):
        model, params = tp
        cfg = model.cfg
        jp = jnp.asarray(rng.normal(size=(1, cfg.seq_len, 69)).astype(np.float32))
        eps = jnp.zeros((1, cfg.nz))
        init_xy = jnp.asarray([[2.0, -1.0]])
        init_heading = jnp.asarray([0.7])
        out = model.apply(params, jp, eps, init_xy, init_heading,
                          method=TrajPredVAE.decode)
        np.testing.assert_allclose(np.asarray(out["out_local_traj"][0, 0, :2]),
                                   [2.0, -1.0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["out_trans"][0, 0, :2]),
                                   [2.0, -1.0], atol=1e-5)

    def test_multi_step_matches_shapes(self, tp, rng):
        model, params = tp
        cfg = model.cfg
        T = 23  # 3 chunks of 10
        jp = jnp.asarray(rng.normal(size=(2, T, 69)).astype(np.float32))
        out = predict_multi_step(model, params, jp, jnp.zeros((1, cfg.nz)))
        assert out["out_local_traj"].shape == (2, T, 11)
        assert out["out_trans"].shape == (2, T, 3)
        assert np.isfinite(np.asarray(out["out_trans"])).all()


class TestJointModel:
    def test_end_to_end(self, mf, tp, rng):
        mfm, mfp = mf
        tpm, tpp = tp
        smpl = get_smpl("body26fk", synthetic=True)
        jm = JointModel(mfm, mfp, tpm, tpp, smpl)
        T = 20
        pose = jnp.asarray(rng.normal(size=(1, T, 69)).astype(np.float32) * 0.2)
        mask = np.ones((1, T), np.float32)
        mask[0, 8:14] = 0.0
        meps = jnp.zeros(jm.motion_latent_shape(T))[:, None, :]
        teps = jnp.zeros((1, tpm.cfg.nz))
        out = jm.infer(pose, jnp.asarray(mask), meps, teps)
        assert out["body_pose"].shape == (1, T, 69)
        assert out["trans"].shape == (1, T, 3)
        assert out["local_traj"].shape == (1, T, 11)
        assert np.isfinite(np.asarray(out["trans"])).all()


class TestJointModelSamples:
    def test_infer_samples_shapes(self):
        """Multi-sample inference returns a leading (S, ...) axis with
        distinct samples per draw."""
        import jax
        import jax.numpy as jnp
        from glamr_tpu.body import get_smpl
        from glamr_tpu.models import JointModel, MotionInfillerVAE, TrajPredVAE
        from glamr_tpu.models.configs import (MotionInfillerConfig,
                                              TrajPredConfig, TransformerSpec)

        tf = TransformerSpec(nlayer=1, model_dim=32, nhead=2, ff_dim=64,
                             dropout=0.0)
        mcfg = MotionInfillerConfig(nz=4, past_nframe=2, cur_nframe=5,
                                    fut_nframe=2, ctx_in_fc=32,
                                    ctx_transformer=tf, enc_transformer=tf,
                                    dec_transformer=tf, prior_transformer=tf,
                                    dec_out_mlp=(32,))
        tcfg = TrajPredConfig(nz=4, seq_len=8, ctx_in_mlp=(32,), ctx_rnn_hdim=32,
                              ctx_rnn_layers=1, ctx_out_mlp=(32,),
                              enc_in_mlp=(32,), enc_rnn_hdim=32,
                              enc_rnn_layers=1, enc_out_mlp=(32,),
                              enc_fusion_mlp=(32,), dec_out_mlp=(32,),
                              dec_prior_mlp=(32,))
        mf, tp = MotionInfillerVAE(mcfg), TrajPredVAE(tcfg)
        rng = jax.random.PRNGKey(0)
        W = mcfg.window_len
        mfp = mf.init(rng, jnp.zeros((1, W, 69)), jnp.zeros((1, W, 69)),
                      jnp.ones((1, W)))
        q0 = jnp.tile(jnp.array([1.0, 0, 0, 0]), (1, 8, 1))
        tpp = tp.init(rng, jnp.zeros((1, 8, 69)), jnp.zeros((1, 8, 3)), q0)
        jm = JointModel(mfiller=mf, mfiller_params=mfp, trajpred=tp,
                        trajpred_params=tpp,
                        smpl=get_smpl("body26fk", synthetic=True))
        T, B, S = 16, 2, 3
        out = jm.infer_samples(jnp.zeros((B, T, 69)), jnp.ones((B, T)),
                               jax.random.PRNGKey(1), sample_num=S)
        assert out["body_pose"].shape == (S, B, T, 69)
        assert out["trans"].shape == (S, B, T, 3)
        # samples differ
        assert np.abs(np.asarray(out["trans"][0] - out["trans"][1])).max() > 1e-6


def test_recon_multi_step_matches_gt_when_trained_identity():
    """recon_multi_step runs the sliding-window recon path; shape + the
    pass-through property (initial past frames preserved)."""
    import jax
    import jax.numpy as jnp
    from glamr_tpu.models import MotionInfillerVAE, recon_multi_step
    from glamr_tpu.models.configs import MotionInfillerConfig, TransformerSpec

    tf = TransformerSpec(nlayer=1, model_dim=32, nhead=2, ff_dim=64, dropout=0.0)
    cfg = MotionInfillerConfig(nz=4, past_nframe=2, cur_nframe=5, fut_nframe=2,
                               ctx_in_fc=32, ctx_transformer=tf,
                               enc_transformer=tf, dec_transformer=tf,
                               prior_transformer=tf, dec_out_mlp=(32,))
    model = MotionInfillerVAE(cfg)
    W = cfg.window_len
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, W, 69)), jnp.zeros((1, W, 69)),
                        jnp.ones((1, W)))
    B, T = 2, 19
    gt = jax.random.normal(rng, (B, T, 69)) * 0.2
    mask = jnp.ones((B, T)).at[:, 6:10].set(0.0)
    in_pose = gt * mask[..., None]
    out = recon_multi_step(model, params, in_pose, gt, mask)
    assert out.shape == (B, T, 69)
    # the first past_nframe frames pass through unchanged
    np.testing.assert_allclose(np.asarray(out[:, :cfg.past_nframe]),
                               np.asarray(in_pose[:, :cfg.past_nframe]),
                               atol=1e-6)
