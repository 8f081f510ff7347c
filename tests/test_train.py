"""Training subsystem tests: AMASS sampler, loss registries, DP train
steps on the virtual 8-device mesh (loss decreases over a few steps)."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; quick signal: pytest -m 'not slow'
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

    def test_infiller_bf16_mixed_precision(self, mesh8):
        """bf16 compute policy: training still converges, and the first-step
        loss matches f32 to bf16 resolution (master params/losses are f32)."""
        model = MotionInfillerVAE(MCFG)
        tx = make_tx(1e-3)
        loss_cfg = {"mse": {"weight": 1.0},
                    "vae_z_kld": {"weight": 1e-3, "min_clip": 0.0}}
        rng = jax.random.PRNGKey(0)
        B, W = 16, MCFG.window_len
        gt = np.random.default_rng(0).normal(0, 0.3, (B, W, 69)).astype(np.float32)
        batch = shard_batch({
            "in_body_pose": gt.copy(), "gt_body_pose": gt,
            "frame_mask": np.ones((B, W), np.float32),
        }, mesh8)

        losses = {}
        for name, cdtype in [("f32", None), ("bf16", jnp.bfloat16)]:
            state = replicate(init_infiller(model, tx, rng), mesh8)
            step = make_infiller_train_step(model, tx, loss_cfg, mesh8,
                                            compute_dtype=cdtype)
            ls = []
            for i in range(8):
                state, metrics = step(
                    state, batch, replicate(jax.random.PRNGKey(i), mesh8))
                ls.append(float(metrics["loss"]))
            losses[name] = ls
            # params stay f32 regardless of compute dtype
            leaf = jax.tree.leaves(state.params)[0]
            assert leaf.dtype == jnp.float32
        assert all(np.isfinite(losses["bf16"]))
        assert losses["bf16"][-1] < losses["bf16"][0]
        # same init, same data: first-step losses agree to bf16 tolerance
        assert abs(losses["bf16"][0] - losses["f32"][0]) < 0.05 * max(
            1.0, abs(losses["f32"][0]))


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
        # TensorBoard event files written per run (reference logger stack,
        # train.py:73-89)
        evs = glob.glob(str(tmp_path / "results" / "**" / "tb" / "events.*"),
                        recursive=True)
        assert evs, "no tensorboard events written"


class TestMultistep:
    def test_multistep_matches_sequential(self):
        """K fused steps == K sequential steps (same batches, same rng
        folding)."""
        from glamr_tpu.train.trainer import make_infiller_multistep

        model = MotionInfillerVAE(MCFG)
        tx = make_tx(1e-3)
        rng = jax.random.PRNGKey(0)
        state_a = init_infiller(model, tx, rng)
        state_b = jax.tree.map(lambda x: x.copy(), state_a)
        loss_cfg = {"mse": {"weight": 1.0},
                    "vae_z_kld": {"weight": 1e-3, "min_clip": 0.0}}
        K, B, W = 3, 4, MCFG.window_len
        npr = np.random.default_rng(0)
        gt = npr.normal(0, 0.3, (K, B, W, 69)).astype(np.float32)
        batches = {"in_body_pose": gt.copy(), "gt_body_pose": gt,
                   "frame_mask": np.ones((K, B, W), np.float32)}
        multi = make_infiller_multistep(model, tx, loss_cfg, K)
        state_a, ma = multi(state_a, jax.tree.map(jnp.asarray, batches), rng)

        # sequential reference with the same rng folding
        from glamr_tpu.models.loss_func import infiller_loss_dict, weighted_total
        import optax as _optax

        r = rng
        st = state_b
        for k in range(K):
            r, sub = jax.random.split(r)
            def loss_fn(params):
                s_rng, d_rng = jax.random.split(sub)
                out = model.apply(params, jnp.asarray(batches["in_body_pose"][k]),
                                  jnp.asarray(batches["gt_body_pose"][k]),
                                  jnp.asarray(batches["frame_mask"][k]),
                                  rng=s_rng, deterministic=False,
                                  rngs={"dropout": d_rng})
                total, uw = weighted_total(
                    {**{kk: jnp.asarray(v[k]) for kk, v in batches.items()}, **out},
                    loss_cfg, infiller_loss_dict)
                return total
            loss, grads = jax.value_and_grad(loss_fn)(st.params)
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            from glamr_tpu.train import TrainState
            st = TrainState(params=_optax.apply_updates(st.params, updates),
                            opt_state=opt_state, step=st.step + 1)
        diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                            state_a.params, st.params)
        maxdiff = max(jax.tree.leaves(diff))
        # scan vs eager reassociates float ops; Adam's eps-normalized
        # updates amplify the ulp-level differences — equivalence holds to
        # optimizer-step magnitude, not machine epsilon
        assert maxdiff < 5e-3, maxdiff


class TestDeviceSampler:
    def test_semantics(self):
        """On-device sampling matches AMASSDataset semantics: shapes,
        mask structure, masked-input zeroing, window within sequence."""
        from glamr_tpu.data import DeviceSampler
        data, _ = synthetic_amass_data(6, min_len=60, max_len=200)
        ds = DeviceSampler(data)
        b = ds.sample_batch(jax.random.PRNGKey(0), 32, 50,
                            {"preserve_first_n": 10, "min_drop_len": 10,
                             "max_drop_len": 40})
        b = jax.tree.map(np.asarray, b)
        assert b["pose"].shape == (32, 50, 72)
        assert (b["frame_mask"][:, :10] == 1).all()
        assert (b["frame_mask"] == 0).any(axis=1).all()
        dropped = b["frame_mask"] == 0
        assert np.abs(b["in_body_pose"][dropped]).sum() == 0
        # windows contain real dataset rows: every window row must exist
        # in the concatenated theta
        theta = np.concatenate(list(data.values()), 0)
        row = b["pose"][0, 0]
        assert (np.abs(theta[:, 3:75] - row).sum(1) < 1e-6).any()

    def test_short_sequences_edge_hold(self):
        from glamr_tpu.data import DeviceSampler
        data, _ = synthetic_amass_data(2, min_len=20, max_len=25)
        ds = DeviceSampler(data)
        b = jax.tree.map(np.asarray,
                         ds.sample_batch(jax.random.PRNGKey(1), 8, 40, None))
        lm = b["frame_loss_mask"][..., 0]
        assert (lm.sum(1) >= 20).all() and (lm.sum(1) <= 25).all()
        for i in range(8):
            eff = int(lm[i].sum())
            assert np.abs(b["pose"][i, eff:] - b["pose"][i, eff - 1]).max() == 0

    def test_composes_with_train_step_under_jit(self):
        """Sampler + train step fuse into one jitted program."""
        from glamr_tpu.data import DeviceSampler
        from glamr_tpu.train.trainer import make_tx
        from glamr_tpu.models.loss_func import infiller_loss_dict, weighted_total
        import optax

        data, _ = synthetic_amass_data(4, min_len=30, max_len=60)
        ds = DeviceSampler(data)
        model = MotionInfillerVAE(MCFG)
        tx = make_tx(1e-3)
        rng = jax.random.PRNGKey(0)
        W = MCFG.window_len
        params = model.init(rng, jnp.zeros((1, W, 69)), jnp.zeros((1, W, 69)),
                            jnp.ones((1, W)))
        opt_state = tx.init(params)

        @jax.jit
        def fused_step(params, opt_state, rng):
            rng, kb, ks, kd = jax.random.split(rng, 4)
            batch = ds.sample_batch(kb, 8, W, {"preserve_first_n": 2,
                                               "min_drop_len": 2,
                                               "max_drop_len": 4})
            def loss_fn(p):
                out = model.apply(p, batch["in_body_pose"],
                                  batch["gt_body_pose"], batch["frame_mask"],
                                  rng=ks, deterministic=False,
                                  rngs={"dropout": kd})
                total, _ = weighted_total({**batch, **out},
                                          {"mse": {"weight": 1.0}},
                                          infiller_loss_dict)
                return total
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, rng, loss

        losses = []
        for _ in range(4):
            params, opt_state, rng, loss = fused_step(params, opt_state, rng)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]


def test_trajpred_device_step():
    """Fully on-device traj-pred training: raw device-sampler batch, FK +
    quat conversion inside the step, loss decreases."""
    from glamr_tpu.body import get_smpl
    from glamr_tpu.data import DeviceSampler
    from glamr_tpu.train import init_trajpred
    from glamr_tpu.train.trainer import make_trajpred_device_step, make_tx

    tcfg = TrajPredConfig(
        nz=8, seq_len=10, ctx_in_mlp=(32,), ctx_rnn_hdim=32, ctx_rnn_layers=1,
        ctx_out_mlp=(32,), enc_in_mlp=(32,), enc_rnn_hdim=32, enc_rnn_layers=1,
        enc_out_mlp=(32,), enc_fusion_mlp=(32,), dec_out_mlp=(32,),
        dec_prior_mlp=(32,))
    model = TrajPredVAE(tcfg)
    tx = make_tx(1e-3)
    rng = jax.random.PRNGKey(0)
    state = init_trajpred(model, tx, rng, seq_len=10)
    smpl = get_smpl("body26fk", synthetic=True)
    step = make_trajpred_device_step(
        model, tx,
        {"trans_mse": {"weight": 1.0}, "orient_angle": {"weight": 1.0},
         "vae_z_kld": {"weight": 1e-3, "min_clip": 0.0}}, smpl)

    data, _ = synthetic_amass_data(4, min_len=30, max_len=60)
    ds = DeviceSampler(data)
    losses = []
    for i in range(14):
        rng, kb, ks = jax.random.split(rng, 3)
        batch = ds.sample_batch(kb, 8, 10, None)
        state, m = step(state, batch, ks)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    # each step draws a fresh stochastic batch: compare trend, not endpoints
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


class TestFusedEpoch:
    def test_sharded_matches_single_device(self, mesh8):
        """A fused device-resident epoch sharded over the ('dp',) mesh
        produces the same parameters as the unsharded program (same rng
        stream; only the psum reassociation differs)."""
        from glamr_tpu.data import DeviceSampler
        from glamr_tpu.train.trainer import (infiller_step_core,
                                             make_fused_epoch)

        import optax

        model = MotionInfillerVAE(MCFG)
        # SGD, not Adam: Adam's m/sqrt(v) is scale-free, so psum fp
        # reassociation on near-zero grads would amplify to lr-sized
        # param diffs; with SGD params differ only as much as grads do
        tx = optax.sgd(1e-2)
        rng = jax.random.PRNGKey(0)
        state0 = init_infiller(model, tx, rng)
        loss_cfg = {"mse": {"weight": 1.0},
                    "vae_z_kld": {"weight": 1e-3, "min_clip": 0.0}}
        core = infiller_step_core(model, tx, loss_cfg)

        data, _ = synthetic_amass_data(4, min_len=30, max_len=60)
        K, B, W = 3, 8, MCFG.window_len
        keys = ("in_body_pose", "gt_body_pose", "frame_mask")

        def run(mesh):
            ds = DeviceSampler(data, mesh=mesh)

            def sample(key):
                b = ds.sample_batch(key, B, W, None)
                return {k: b[k] for k in keys}
            epoch = make_fused_epoch(core, sample, K, mesh=mesh)
            st = jax.tree.map(lambda x: x.copy(), state0)
            if mesh is not None:
                st = replicate(st, mesh)
            st, metrics = epoch(st, jax.random.PRNGKey(7))
            return jax.device_get(st.params), jax.device_get(metrics)

        p1, m1 = run(None)
        p8, m8 = run(mesh8)
        assert m8["loss"].shape == (K,)
        np.testing.assert_allclose(m1["loss"], m8["loss"], rtol=2e-4)
        flat1 = jax.tree.leaves(p1)
        flat8 = jax.tree.leaves(p8)
        for a, b in zip(flat1, flat8):
            np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-4)

    @pytest.mark.slow
    def test_train_cli_multidevice_device_data(self, tmp_path, monkeypatch):
        """Train CLI with --ndevices 8 --device_data 1: the fused epoch
        shards the on-device batch draw over the dp mesh."""
        monkeypatch.chdir(tmp_path)
        from glamr_tpu.cli import train as train_cli

        train_cli.main([
            "--model", "motion_infiller", "--synthetic_data",
            "--epochs", "1", "--steps_per_epoch", "2", "--batch_size", "16",
            "--ndevices", "8", "--device_data", "1",
        ])
        import glob
        cps = glob.glob(
            str(tmp_path / "results" / "**" / "checkpoints" / "*.pkl"),
            recursive=True)
        assert cps, "no checkpoint written"


def test_enable_compile_cache_honors_jax_platforms_env(monkeypatch, tmp_path):
    """enable_compile_cache re-applies the JAX_PLATFORMS env var: platform
    plugins rewrite jax_platforms at import time, and every CLI relies on
    this helper to restore env-var semantics (utils/cache.py)."""
    import jax

    from glamr_tpu.utils.cache import enable_compile_cache

    prev = jax.config.jax_platforms
    try:
        monkeypatch.setenv("JAX_PLATFORMS", "cpu")
        jax.config.update("jax_platforms", "")  # simulate a plugin override
        d = enable_compile_cache(str(tmp_path))
        assert jax.config.jax_platforms == "cpu"
        assert d == str(tmp_path)
    finally:
        jax.config.update("jax_platforms", prev)
        enable_compile_cache()  # restore the shared cache dir for later tests


def test_remat_step_matches_plain():
    """--remat (jax.checkpoint around the loss) changes the memory
    schedule, not the math: one train step with remat produces the same
    loss and parameters as without (trainer.maybe_remat)."""
    import jax
    import numpy as np

    from glamr_tpu.models import MotionInfillerConfig, MotionInfillerVAE
    from glamr_tpu.models.configs import TransformerSpec
    from glamr_tpu.train import init_infiller
    from glamr_tpu.train.trainer import infiller_step_core, make_tx

    tf = TransformerSpec(nlayer=1, model_dim=32, nhead=2, ff_dim=64,
                         dropout=0.0)
    cfg = MotionInfillerConfig(
        nz=8, past_nframe=2, cur_nframe=4, fut_nframe=2, ctx_in_fc=32,
        ctx_transformer=tf, enc_transformer=tf, dec_transformer=tf,
        prior_transformer=tf, dec_out_mlp=(32,),
    )
    model = MotionInfillerVAE(cfg)
    tx = make_tx(1e-3)
    rng = jax.random.PRNGKey(0)
    loss_cfg = {"mse": {"weight": 1.0, "body_only": True},
                "vae_z_kld": {"weight": 1e-3, "min_clip": 0.0}}
    r = np.random.default_rng(0)
    B, W = 4, cfg.window_len
    batch = {
        "in_body_pose": r.normal(size=(B, W, 69)).astype(np.float32),
        "gt_body_pose": r.normal(size=(B, W, 69)).astype(np.float32),
        "frame_mask": np.ones((B, W), np.float32),
    }
    outs = {}
    for remat in (False, True):
        step = jax.jit(infiller_step_core(model, tx, loss_cfg, remat=remat))
        state, metrics = step(init_infiller(model, tx, rng), batch, rng)
        outs[remat] = (float(metrics["loss"]), jax.tree.leaves(state.params))
    assert outs[False][0] == outs[True][0]
    for a, b in zip(outs[False][1], outs[True][1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_accelerator_usable_probe(monkeypatch):
    """accelerator_usable: trusts plain environments (no tunnel env var),
    and short-circuits False when the tunnel relay is dead — without ever
    touching this process's jax backend (utils/cache.py)."""
    from glamr_tpu.utils import cache

    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    assert cache.accelerator_usable(timeout_s=1) is True

    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.setattr(cache, "accelerator_reachable", lambda: False)
    assert cache.accelerator_usable(timeout_s=1) is False


def test_resolve_results_dir(tmp_path, monkeypatch):
    """Read-side checkpoint resolution survives a chdir into a scratch
    workdir (eval_synthetic_sweep chdirs so run_dataset sees its own
    datasets/ tree): relative roots fall back to the repo root when they
    don't exist under the CWD (utils/tools.py resolve_results_dir)."""
    import glamr_tpu
    from glamr_tpu.utils.tools import resolve_results_dir

    repo_root = os.path.dirname(os.path.dirname(
        os.path.abspath(glamr_tpu.__file__)))
    # absolute roots pass through
    assert resolve_results_dir("/abs/x") == "/abs/x"
    # CWD-relative hit wins (writer semantics preserved)
    monkeypatch.chdir(tmp_path)
    (tmp_path / "results").mkdir()
    assert resolve_results_dir("results") == "results"
    # miss in CWD -> repo-root fallback when it exists there
    if os.path.isdir(os.path.join(repo_root, "glamr_tpu")):
        got = resolve_results_dir("glamr_tpu")
        assert got == os.path.join(repo_root, "glamr_tpu")
    # miss everywhere -> unchanged (caller's find_last_version returns -1)
    assert resolve_results_dir("no_such_dir_xyz") == "no_such_dir_xyz"


def test_find_checkpoint_across_versions_skips_empty(tmp_path):
    """Checkpoint discovery walks past checkpoint-less versions (interrupted
    runs / committed log-only results trees) instead of falling through to
    random init when only version_N is inspected."""
    from glamr_tpu.utils.tools import find_checkpoint_across_versions

    base = tmp_path / "model"
    (base / "version_0" / "checkpoints").mkdir(parents=True)
    cp = base / "version_0" / "checkpoints" / "best.pkl"
    cp.write_bytes(b"x")
    (base / "version_1").mkdir()                       # log-only
    (base / "version_2" / "checkpoints").mkdir(parents=True)  # empty dir

    assert find_checkpoint_across_versions(str(base), "best") == str(cp)
    assert find_checkpoint_across_versions(str(tmp_path / "nope")) is None
