"""Training subsystem tests: AMASS sampler, loss registries, DP train
steps on the virtual 8-device mesh (loss decreases over a few steps)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from glamr_tpu.data import AMASSDataset, synthetic_amass_data
from glamr_tpu.models import MotionInfillerConfig, MotionInfillerVAE, TrajPredConfig, TrajPredVAE
from glamr_tpu.models.configs import TransformerSpec
from glamr_tpu.parallel import get_mesh, replicate, shard_batch
from glamr_tpu.train import (
    init_infiller,
    init_trajpred,
    make_infiller_train_step,
    make_trajpred_train_step,
)
from glamr_tpu.train.trainer import make_tx

TINY_TF = TransformerSpec(nlayer=1, model_dim=32, nhead=2, ff_dim=64, dropout=0.0)
MCFG = MotionInfillerConfig(
    nz=8, past_nframe=2, cur_nframe=4, fut_nframe=2, ctx_in_fc=32,
    ctx_transformer=TINY_TF, enc_transformer=TINY_TF, dec_transformer=TINY_TF,
    prior_transformer=TINY_TF, dec_out_mlp=(32,),
)


class TestAMASS:
    def test_sample_shapes(self):
        data, jpos = synthetic_amass_data(4)
        ds = AMASSDataset(data, jpos, seq_len=50,
                          data_mask_methods={"drop_frames": {
                              "preserve_first_n": 10, "min_drop_len": 10,
                              "max_drop_len": 40}})
        s = ds.sample(np.random.default_rng(0))
        assert s["pose"].shape == (50, 72)
        assert s["in_body_pose"].shape == (50, 69)
        assert s["frame_mask"].shape == (50,)
        # occlusion: some frames dropped, first 10 preserved
        assert s["frame_mask"].sum() < 50
        assert (s["frame_mask"][:10] == 1).all()
        # masked frames are zeroed in the input
        dropped = s["frame_mask"] == 0
        assert np.abs(s["in_body_pose"][dropped]).sum() == 0

    def test_short_seq_padding(self):
        data, jpos = synthetic_amass_data(2, min_len=30, max_len=40)
        ds = AMASSDataset(data, jpos, seq_len=64)
        s = ds.sample(np.random.default_rng(1))
        assert s["pose"].shape == (64, 72)
        assert s["frame_loss_mask"].sum() == s["eff_seq_len"]

    def test_batch(self):
        data, jpos = synthetic_amass_data(4)
        ds = AMASSDataset(data, jpos, seq_len=16)
        b = ds.batch(np.random.default_rng(0), 4)
        assert b["pose"].shape == (4, 16, 72)
        assert b["gt_body_pose"].shape == (4, 16, 69)

    def test_deterministic_given_rng(self):
        data, jpos = synthetic_amass_data(4)
        ds = AMASSDataset(data, jpos, seq_len=16)
        a = ds.sample(np.random.default_rng(7))
        b = ds.sample(np.random.default_rng(7))
        np.testing.assert_array_equal(a["pose"], b["pose"])


class TestTrainSteps:
    def test_infiller_loss_decreases(self, mesh8):
        model = MotionInfillerVAE(MCFG)
        tx = make_tx(1e-3)
        rng = jax.random.PRNGKey(0)
        state = replicate(init_infiller(model, tx, rng), mesh8)
        step = make_infiller_train_step(
            model, tx,
            {"mse": {"weight": 1.0}, "vae_z_kld": {"weight": 1e-3, "min_clip": 0.0}},
            mesh8,
        )
        B, W = 16, MCFG.window_len
        gt = np.random.default_rng(0).normal(0, 0.3, (B, W, 69)).astype(np.float32)
        batch = shard_batch({
            "in_body_pose": gt.copy(), "gt_body_pose": gt,
            "frame_mask": np.ones((B, W), np.float32),
        }, mesh8)
        losses = []
        for i in range(8):
            state, metrics = step(state, batch, replicate(jax.random.PRNGKey(i), mesh8))
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_trajpred_step_runs(self, mesh8):
        tcfg = TrajPredConfig(
            nz=8, seq_len=8, ctx_in_mlp=(32,), ctx_rnn_hdim=32, ctx_rnn_layers=1,
            ctx_out_mlp=(32,), enc_in_mlp=(32,), enc_rnn_hdim=32, enc_rnn_layers=1,
            enc_out_mlp=(32,), enc_fusion_mlp=(32,), dec_out_mlp=(32,),
            dec_prior_mlp=(32,),
        )
        model = TrajPredVAE(tcfg)
        tx = make_tx(1e-4)
        rng = jax.random.PRNGKey(0)
        state = replicate(init_trajpred(model, tx, rng, seq_len=8), mesh8)
        step = make_trajpred_train_step(
            model, tx,
            {"trans_mse": {"weight": 1.0}, "orient_angle": {"weight": 1.0},
             "vae_z_kld": {"weight": 1e-3, "min_clip": 0.0},
             "dheading": {"weight": 0.1}},
            mesh8,
        )
        B = 16
        q = np.tile(np.array([1.0, 0, 0, 0], np.float32), (B, 8, 1))
        batch = shard_batch({
            "joint_pos": np.random.randn(B, 8, 69).astype(np.float32),
            "trans": np.random.randn(B, 8, 3).astype(np.float32),
            "orient_q": q,
        }, mesh8)
        state, metrics = step(state, batch, replicate(rng, mesh8))
        assert np.isfinite(float(metrics["loss"]))


class TestNativeSampler:
    def test_native_matches_semantics(self):
        from glamr_tpu.data.native_sampler import NativeSampler
        data, _ = synthetic_amass_data(6, min_len=80, max_len=200)
        ns = NativeSampler(data)
        if not ns.available:
            pytest.skip("no C toolchain")
        b = ns.batch(seed=7, batch_size=32, seq_len=50,
                     mask_spec={"preserve_first_n": 10, "min_drop_len": 10,
                                "max_drop_len": 40})
        assert b["pose"].shape == (32, 50, 72)
        assert b["in_body_pose"].shape == (32, 50, 69)
        # first 10 frames preserved; some frames dropped in each row
        assert (b["frame_mask"][:, :10] == 1).all()
        dropped = (b["frame_mask"] == 0)
        assert dropped.any(axis=1).all()
        # masked input zeroed exactly where dropped
        assert np.abs(b["in_body_pose"][dropped]).sum() == 0
        vis = b["frame_mask"] == 1
        np.testing.assert_array_equal(
            b["in_body_pose"][vis], b["gt_body_pose"][vis])
        # deterministic given seed
        b2 = ns.batch(seed=7, batch_size=32, seq_len=50,
                      mask_spec={"preserve_first_n": 10, "min_drop_len": 10,
                                 "max_drop_len": 40})
        np.testing.assert_array_equal(b["pose"], b2["pose"])

    def test_dataset_batch_uses_native(self):
        data, _ = synthetic_amass_data(4)
        ds = AMASSDataset(data, None, seq_len=30,
                          data_mask_methods={"drop_frames": {
                              "preserve_first_n": 5, "min_drop_len": 5,
                              "max_drop_len": 10}})
        b = ds.batch(np.random.default_rng(0), 8)
        assert b["pose"].shape == (8, 30, 72)
        assert np.isfinite(b["pose"]).all()

    def test_short_seq_edge_pad(self):
        from glamr_tpu.data.native_sampler import NativeSampler
        data, _ = synthetic_amass_data(2, min_len=20, max_len=25)
        ns = NativeSampler(data)
        if not ns.available:
            pytest.skip("no C toolchain")
        b = ns.batch(seed=3, batch_size=4, seq_len=40, mask_spec=None)
        lm = b["frame_loss_mask"][..., 0]
        assert (lm.sum(1) <= 25).all() and (lm.sum(1) >= 20).all()
        # padded frames replicate the last real frame
        for i in range(4):
            eff = int(lm[i].sum())
            assert np.abs(b["pose"][i, eff:] - b["pose"][i, eff - 1]).max() == 0


class TestTrainCLI:
    @pytest.mark.slow
    def test_train_and_resume(self, tmp_path, monkeypatch):
        """Train CLI end-to-end on synthetic data, then resume from the
        written checkpoint (reference --resume, train.py:32-34,111)."""
        monkeypatch.chdir(tmp_path)
        from glamr_tpu.cli import train as train_cli

        argv = ["--model", "motion_infiller", "--synthetic_data",
                "--epochs", "1", "--steps_per_epoch", "1", "--batch_size", "8"]
        train_cli.main(argv)
        import glob
        cps = glob.glob(str(tmp_path / "results" / "**" / "checkpoints" / "*.pkl"),
                        recursive=True)
        assert cps, "no checkpoint written"
        train_cli.main(argv + ["--resume", cps[0]])
