"""CVAE training harness (reference: motion_infiller/train.py,
traj_pred/train.py — Lightning DDP there; jitted DP-mesh steps here with
versioned checkpoint dirs, best/every-N checkpoints, per-epoch text log).
"""
from __future__ import annotations

import argparse
import os
import sys
import time


def build_infiller_batch(ds, rng, batch_size):
    b = ds.batch(rng, batch_size)
    return {
        "in_body_pose": b["in_body_pose"],
        "gt_body_pose": b["gt_body_pose"],
        "frame_mask": b["frame_mask"],
    }


def build_trajpred_batch(ds, rng, batch_size, smpl):
    import jax.numpy as jnp
    import numpy as np

    from ..transforms import angle_axis_to_quaternion

    b = ds.batch(rng, batch_size)
    if "joint_pos_noshape" in b:
        joint_pos = b["joint_pos_noshape"]
    else:
        joint_pos = np.asarray(
            smpl.joint_pos_from_body_pose(jnp.asarray(b["gt_body_pose"])))
    orient_q = np.asarray(
        angle_axis_to_quaternion(jnp.asarray(b["pose"][..., :3])))
    return {
        "joint_pos": joint_pos,
        "trans": b["trans"],
        "orient_q": orient_q,
        "frame_loss_mask": b["frame_loss_mask"][..., 0],
    }


# one-command demo bootstrap: the recorded single-chip recipes that
# produce every checkpoint run_demo / eval_stage1 need (ROADMAP.md
# "Reference-scale training on procedural data"). Order: most
# downstream-critical first, so an interrupted bootstrap still leaves the
# trajectory predictor (whose absence makes random-init decodes walk off
# ~10 m) and the stage-1 models behind.
ALL_DEMO_RECIPES = [
    ["--model", "traj_pred", "--synthetic_data",
     "--synthetic_kind", "procedural", "--synthetic_num_seqs", "512",
     "--epochs", "850", "--steps_per_epoch", "100"],
    ["--model", "lifter", "--synthetic_data",
     "--synthetic_kind", "procedural", "--synthetic_num_seqs", "512"],
    ["--model", "detector", "--synthetic_data",
     "--synthetic_kind", "procedural"],
    ["--model", "motion_infiller", "--synthetic_data",
     "--synthetic_kind", "procedural", "--synthetic_num_seqs", "512",
     "--epochs", "500", "--steps_per_epoch", "100",
     "--precision", "bf16"],
]


def main(argv=None):
    from ..utils.cache import enable_compile_cache
    enable_compile_cache()
    if argv is None:
        argv = sys.argv[1:]
    if "--all_demo" in argv:
        # train all four demo models with the recorded recipes; extra
        # flags (e.g. --epochs overrides for a quick bootstrap) are
        # appended to every leg
        extra = [a for a in argv if a != "--all_demo"]
        for recipe in ALL_DEMO_RECIPES:
            print(f"== all_demo leg: {' '.join(recipe)} ==", flush=True)
            main(recipe + extra)
        return
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="motion_infiller",
                        choices=["motion_infiller", "traj_pred", "lifter",
                                 "detector"])
    parser.add_argument("--cfg", default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None,
                        help="override the cfg learning rate (e.g. a "
                             "reduced lr when resuming past a loss "
                             "spike)")
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--steps_per_epoch", type=int, default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--synthetic_data", action="store_true")
    parser.add_argument("--synthetic_kind", default="noise",
                        choices=["noise", "procedural"],
                        help="noise: unstructured random-walk poses; "
                             "procedural: gait-model motions (walking/"
                             "turning/idle) with FK joint positions — the "
                             "stand-in for AMASS when the licensed dataset "
                             "is absent")
    parser.add_argument("--synthetic_num_seqs", type=int, default=None)
    parser.add_argument("--resume", default=None, help="checkpoint path")
    parser.add_argument("--ndevices", type=int, default=None)
    parser.add_argument("--pool_size", type=int, default=None,
                        help="detector: pre-rendered device-resident pool "
                             "size (default cfg pool_size or 4096)")
    parser.add_argument("--device_data", type=int, default=1,
                        help="sample batches on-device from HBM-resident "
                             "data (zero per-step host traffic); 0 forces "
                             "the host pipeline (needed for gaussian-smooth "
                             "augmentation or jpos windows)")
    parser.add_argument("--debug", action="store_true",
                        help="enable NaN checking (the reference's "
                             "autograd-anomaly-mode analog, train.py:51-52)")
    parser.add_argument("--profile", default=None,
                        help="write a jax.profiler trace to this directory "
                             "(the reference's --profiler flag analog)")
    parser.add_argument("--multihost", action="store_true",
                        help="multi-host SPMD: call "
                             "jax.distributed.initialize() before device "
                             "discovery so the ('dp',) mesh spans all hosts "
                             "(gradient all-reduce rides ICI within a slice "
                             "and DCN across slices — the NCCL-DDP analog)")
    parser.add_argument("--wandb_project", default=None,
                        help="log metrics to this wandb project when the "
                             "package is available (reference projects "
                             "GLAMR.motion_infiller / GLAMR.traj_pred)")
    parser.add_argument("--tensorboard", type=int, default=1,
                        help="write TensorBoard event files under the run "
                             "dir (0 disables)")
    parser.add_argument("--remat", action="store_true",
                        help="gradient rematerialization (jax.checkpoint "
                             "around the loss): store no forward "
                             "activations, recompute them in the backward "
                             "pass — ~2x forward FLOPs for a near-flat "
                             "activation-memory profile; unlocks larger "
                             "per-chip batch sizes")
    parser.add_argument("--precision", default="f32",
                        choices=["f32", "bf16"],
                        help="compute precision (the reference's pl.Trainer "
                             "precision flag, train.py:28): bf16 casts "
                             "params+activations for MXU matmuls; master "
                             "params, grads, and losses stay f32")
    args = parser.parse_args(argv)

    import jax

    if args.multihost:
        # one process per host; jax.devices() then spans the whole slice
        # and the same jitted step runs SPMD everywhere (SURVEY §2.9 —
        # replaces torch.distributed/NCCL process groups)
        jax.distributed.initialize()
    # host-side side effects (run dir, metric loggers, checkpoints) happen
    # on process 0 only — every host computes the same replicated state, so
    # N processes writing the same files is pure write-racing (the
    # reference's DDP trainer likewise logs/saves on rank 0 only)
    is_primary = not args.multihost or jax.process_index() == 0
    if args.debug:
        jax.config.update("jax_debug_nans", True)
    import jax.numpy as jnp
    import numpy as np

    from ..body.smpl import get_smpl
    from ..data import AMASSDataset, synthetic_amass_data
    from ..models import MotionInfillerVAE, TrajPredVAE
    from ..models.configs import MotionInfillerConfig, TrajPredConfig
    from ..parallel import get_mesh, replicate, shard_batch
    from ..train import (init_infiller, init_trajpred,
                         make_infiller_eval_step, make_infiller_train_step,
                         make_trajpred_eval_step, make_trajpred_train_step)
    from ..train.trainer import make_tx
    from ..utils import Config, create_logger
    from ..utils.checkpoint import load_checkpoint, save_checkpoint
    from ..utils.log_utils import MetricsLogger
    from ..utils.tools import find_last_version

    cfg = Config(args.cfg or {
        "motion_infiller": "motion_infiller_demo",
        "traj_pred": "traj_pred_demo",
        "lifter": "kp_lifter_demo",
        "detector": "kp_detector_demo",
    }[args.model])
    seed = args.seed if args.seed is not None else cfg.get("seed", 1)
    epochs = args.epochs or int(cfg.get("max_epochs", 100))
    batch_size = args.batch_size or int(cfg.get("batch_size", 64))
    seq_len = int(cfg.get("seq_len", 50))
    lr = args.lr if args.lr is not None else float(cfg.get("lr", 1e-3))
    clip = float(cfg.get("gradient_clip_val", 5.0))

    # versioned run dir (reference train.py:75-88), created by process 0
    base = os.path.join(cfg.get("results_root_dir", "results"), cfg.id)
    version = find_last_version(base) + 1
    run_dir = os.path.join(base, f"version_{version}")
    cp_dir = os.path.join(run_dir, "checkpoints")
    if is_primary:
        os.makedirs(cp_dir, exist_ok=True)
        log = create_logger(os.path.join(run_dir, "log.txt"))
        log.info(f"training {args.model} ({cfg.id}) -> {run_dir}")
        mlog = MetricsLogger(run_dir, use_tb=bool(args.tensorboard),
                             wandb_project=args.wandb_project,
                             wandb_run_name=f"{cfg.id}_v{version}")
    else:
        log = create_logger(None)
        mlog = MetricsLogger(run_dir, use_tb=False)

    # data
    if args.synthetic_data:
        if args.synthetic_kind == "procedural":
            from ..data import procedural_amass_data

            data, val_data, jpos, val_jpos = procedural_amass_data(
                args.synthetic_num_seqs or 64, seed=seed)
        else:
            data, jpos = synthetic_amass_data(args.synthetic_num_seqs or 16)
            val_data, val_jpos = data, jpos
        train_ds = AMASSDataset(
            data, jpos, seq_len=seq_len,
            ntime_per_epoch=cfg.get("train_ntime_per_epoch", 1e6),
            seq_sampling_method=cfg.get("seq_sampling_method", "uniform"),
            data_mask_methods=cfg.get("data_mask_methods"),
            pose_gaussian_smooth=cfg.get("pose_gaussian_smooth"))
        val_ds = AMASSDataset(val_data, val_jpos, seq_len=seq_len,
                              data_mask_methods=cfg.get("data_mask_methods"))
    else:
        amass_dir = cfg.get("amass_dir", "datasets/amass_processed/v1")
        train_ds = AMASSDataset.from_dir(
            amass_dir, "train", seq_len=seq_len,
            ntime_per_epoch=cfg.get("train_ntime_per_epoch", 1e6),
            seq_sampling_method=cfg.get("seq_sampling_method", "uniform"),
            data_mask_methods=cfg.get("data_mask_methods"),
            pose_gaussian_smooth=cfg.get("pose_gaussian_smooth"))
        val_ds = AMASSDataset.from_dir(
            amass_dir, "test", seq_len=seq_len,
            ntime_per_epoch=cfg.get("val_ntime_per_epoch", 1e5),
            data_mask_methods=cfg.get("data_mask_methods"))

    mesh = get_mesh(args.ndevices)
    ndev = mesh.devices.size
    batch_size = max(batch_size // ndev, 1) * ndev  # divisible by mesh
    steps = args.steps_per_epoch or max(len(train_ds) // batch_size, 1)
    tx = make_tx(lr, clip)
    rng = jax.random.PRNGKey(seed)
    smpl = get_smpl("body26fk")
    cdtype = {"f32": None, "bf16": jnp.bfloat16}[args.precision]

    if args.model == "motion_infiller":
        mcfg = MotionInfillerConfig.from_dict(cfg.model_specs)
        model = MotionInfillerVAE(mcfg)
        state = init_infiller(model, tx, rng)
        step_fn = make_infiller_train_step(model, tx, cfg.loss_cfg, mesh,
                                           compute_dtype=cdtype,
                                           remat=args.remat)
        eval_fn = make_infiller_eval_step(model, cfg.loss_cfg, mesh,
                                          compute_dtype=cdtype)
        make_batch = lambda r: build_infiller_batch(train_ds, r, batch_size)
        make_val = lambda r: build_infiller_batch(val_ds, r, batch_size)
    elif args.model == "lifter":
        from ..pose_est.lifter import (KeypointLifter, LifterConfig,
                                       init_lifter)
        from ..pose_est.synth import LifterDataGen
        from ..train import make_lifter_eval_step, make_lifter_train_step

        lcfg = LifterConfig.from_dict(cfg.model_specs)
        model = KeypointLifter(lcfg)
        state = init_lifter(model, tx, rng, seq_len=seq_len)
        step_fn = make_lifter_train_step(model, tx, cfg.loss_cfg, mesh,
                                         compute_dtype=cdtype,
                                         remat=args.remat)
        eval_fn = make_lifter_eval_step(model, cfg.loss_cfg, mesh,
                                        compute_dtype=cdtype)
        gen_train = LifterDataGen(train_ds.data, smpl, seq_len=seq_len)
        gen_val = LifterDataGen(val_ds.data, smpl, seq_len=seq_len)
        make_batch = lambda r: gen_train.batch(r, batch_size)
        make_val = lambda r: gen_val.batch(r, batch_size)
    elif args.model == "detector":
        from ..pose_est.detector import (DetectorConfig,
                                         PersonKeypointDetector,
                                         init_detector)
        from ..pose_est.synth_images import DetectorDataGen
        from ..train import make_detector_eval_step, make_detector_train_step

        dcfg = DetectorConfig.from_dict(cfg.model_specs)
        model = PersonKeypointDetector(dcfg)
        state = init_detector(model, tx, rng)
        step_fn = make_detector_train_step(model, tx, cfg.loss_cfg, mesh,
                                           compute_dtype=cdtype,
                                           remat=args.remat)
        eval_fn = make_detector_eval_step(model, cfg.loss_cfg, mesh,
                                          compute_dtype=cdtype)
        gen_train = DetectorDataGen(train_ds.data, smpl, cfg=dcfg)
        gen_val = DetectorDataGen(val_ds.data, smpl, cfg=dcfg)
        make_batch = lambda r: gen_train.batch(r, batch_size)
        make_val = lambda r: gen_val.batch(r, batch_size)
        steps = args.steps_per_epoch or int(cfg.get("steps_per_epoch", 50))
    else:
        tcfg = TrajPredConfig.from_dict(cfg.model_specs, seq_len=seq_len)
        model = TrajPredVAE(tcfg)
        state = init_trajpred(model, tx, rng, seq_len=seq_len)
        step_fn = make_trajpred_train_step(model, tx, cfg.loss_cfg, mesh,
                                           compute_dtype=cdtype,
                                           remat=args.remat)
        eval_fn = make_trajpred_eval_step(model, cfg.loss_cfg, mesh,
                                          compute_dtype=cdtype)
        make_batch = lambda r: build_trajpred_batch(train_ds, r, batch_size, smpl)
        make_val = lambda r: build_trajpred_batch(val_ds, r, batch_size, smpl)

    # on-device batch sampling: dataset resident in HBM, zero per-step
    # host traffic (measured: 877 -> 90 ms/step at bs 1024 on a tunneled
    # v5e). Host pipeline remains for gaussian-smooth augmentation and
    # the traj model's jpos windows. On a multi-device mesh the sampled
    # batch is sharding-constrained over ('dp',) so the partitioner
    # splits the gather per device and all-reduces grads over ICI.
    epoch_fn = None
    if (args.device_data and cfg.get("pose_gaussian_smooth") is None
            and args.model in ("motion_infiller", "traj_pred")):
        from ..data import DeviceSampler
        from ..train.trainer import (infiller_step_core, make_fused_epoch,
                                     trajpred_device_step_core)

        dsd = DeviceSampler(train_ds.data, train_ds.seq_prob,
                            mesh=mesh if ndev > 1 else None)
        if args.model == "motion_infiller":
            mask_spec = (cfg.get("data_mask_methods") or {}).get("drop_frames")
            dev_keys = ("in_body_pose", "gt_body_pose", "frame_mask")
            core = infiller_step_core(model, tx, cfg.loss_cfg,
                                      compute_dtype=cdtype,
                                      remat=args.remat)
        else:
            # raw theta windows; FK + quat conversion happen inside the step
            mask_spec = None
            dev_keys = ("pose", "trans", "frame_loss_mask")
            core = trajpred_device_step_core(model, tx, cfg.loss_cfg, smpl,
                                             compute_dtype=cdtype,
                                             remat=args.remat)
        def sample(data, key, _keys=dev_keys, _mask=mask_spec):
            b = DeviceSampler.sample_from(data, key, batch_size, seq_len,
                                          _mask)
            return {k: b[k] for k in _keys}
        # the WHOLE epoch — K x (device batch draw -> train step) — is one
        # lax.scan program: one dispatch per epoch instead of two per step;
        # the dataset rides as a jit argument, not a baked-in constant
        epoch_fn = make_fused_epoch(core, sample, steps,
                                    mesh=mesh if ndev > 1 else None,
                                    data=dsd.data_tree())
        log.info("using fused device-resident epochs "
                 f"({steps} steps/dispatch, {ndev} devices)")
    elif args.device_data and args.model == "detector":
        # rendering is host-bound (~25 ms/image): pre-render a fixed pool
        # once, keep it in HBM, and run fused epochs with on-device
        # augmentation (pose_est/synth_images.py build_detector_pool)
        from ..pose_est.synth_images import build_detector_pool
        from ..train.trainer import (detector_step_core, make_fused_epoch,
                                     make_detector_pool_sampler)

        pool_n = int(args.pool_size or cfg.get("pool_size", 4096))
        t0 = time.time()
        pool = build_detector_pool(gen_train, np.random.default_rng(seed),
                                   pool_n)
        log.info(f"rendered {pool_n}-image detector pool "
                 f"in {time.time() - t0:.0f}s")
        sample, dev_pool, _ = make_detector_pool_sampler(
            pool, batch_size, mesh=mesh if ndev > 1 else None)
        core = detector_step_core(model, tx, cfg.loss_cfg,
                                  compute_dtype=cdtype,
                                  remat=args.remat)
        epoch_fn = make_fused_epoch(core, sample, steps,
                                    mesh=mesh if ndev > 1 else None,
                                    data=dev_pool)
        log.info("using pooled device-resident detector epochs "
                 f"({steps} steps/dispatch, {ndev} devices); "
                 "val renders fresh scenes each epoch")

    if args.resume:
        state = load_checkpoint(args.resume, target=jax.device_get(state))
        log.info(f"resumed from {args.resume}")
    state = replicate(state, mesh)

    save_n = int(cfg.get("save_n_epochs", 10))
    best_val = float("inf")
    np_rng = np.random.default_rng(seed)
    t_start = time.time()
    if args.profile:
        jax.profiler.start_trace(args.profile)
    try:
      for epoch in range(epochs):
        t0 = time.time()
        if epoch_fn is not None:
            rng, sub = jax.random.split(rng)
            state, emetrics = epoch_fn(state, sub)
            train_loss = float(emetrics["loss"].mean())
            train_terms = {f"train/{k}": float(v[-1])
                           for k, v in emetrics.items()}
        else:
            # accumulate the per-step loss ON DEVICE and pull once per
            # epoch: a float() per step blocks on a host round-trip, which
            # on a tunneled TPU costs ~30x the step itself (measured)
            loss_acc = []
            for it in range(steps):
                rng, sub = jax.random.split(rng)
                batch = shard_batch(make_batch(np_rng), mesh)
                state, metrics = step_fn(state, batch, replicate(sub, mesh))
                loss_acc.append(metrics["loss"])
            train_loss = float(jnp.stack(loss_acc).mean())
            train_terms = {f"train/{k}": float(v) for k, v in metrics.items()}

        # quick val pass (posterior-mode loss on held-out windows)
        vbatch = shard_batch(make_val(np_rng), mesh)
        rng, sub = jax.random.split(rng)
        vmetrics = eval_fn(state.params, vbatch, replicate(sub, mesh))
        val_loss = float(vmetrics["loss"])

        dt = time.time() - t0
        eta = dt * (epochs - epoch - 1)
        log.info(f"epoch {epoch:4d}/{epochs} | train {train_loss:.4f} | "
                 f"val {val_loss:.4f} | {dt:.1f}s/epoch | ETA {eta/60:.1f}m")
        mlog.log_scalars(epoch, {
            "train/loss_epoch": train_loss, **train_terms,
            **{f"val/{k}": float(v) for k, v in vmetrics.items()},
            "time/sec_per_epoch": dt,
        })

        new_best = val_loss < best_val
        if new_best:
            best_val = val_loss
        periodic = (epoch + 1) % save_n == 0 or epoch == epochs - 1
        if is_primary and (new_best or periodic):
            # one state fetch even when both saves coincide (a full
            # params+opt-state device_get is a multi-second round trip
            # on a tunneled accelerator)
            host_state = jax.device_get(state)
            if new_best:
                save_checkpoint(os.path.join(cp_dir, "best.pkl"), host_state)
            if periodic:
                save_checkpoint(os.path.join(cp_dir, f"epoch={epoch}.pkl"),
                                host_state)
    except (KeyboardInterrupt, Exception) as e:
        # failure recovery (SURVEY §5.3 gap in the reference): always
        # leave a resumable checkpoint behind, whatever interrupted us
        if is_primary:
            emergency = os.path.join(cp_dir, "interrupted.pkl")
            save_checkpoint(emergency, jax.device_get(state))
            log.info(f"interrupted ({type(e).__name__}); wrote {emergency}")
        raise
    if args.profile:
        jax.profiler.stop_trace()
        log.info(f"profiler trace written to {args.profile}")
    mlog.close()
    log.info(f"done in {(time.time()-t_start)/60:.1f}m; best val {best_val:.4f}")
    return state


if __name__ == "__main__":
    main()
