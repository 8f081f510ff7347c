"""Qualitative motion-infiller check: sample occluded AMASS test windows,
infill, render gt / recon / sample side-by-side (reference:
motion_infiller/vis_motion_infiller.py:42-106)."""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    from ..utils.cache import enable_compile_cache
    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", default="motion_infiller_demo")
    parser.add_argument("--num_seq", type=int, default=3)
    parser.add_argument("--seq_len", type=int, default=None)
    parser.add_argument("--out_dir", default="out/glamr_tpu/vis_motion_infiller")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--synthetic_data", action="store_true")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--html", action="store_true",
                        help="also export an interactive HTML viewer")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..body.smpl import get_smpl
    from ..data import AMASSDataset, synthetic_amass_data
    from ..models import MotionInfillerVAE, infill_multi_step, num_latents
    from ..models.configs import MotionInfillerConfig
    from ..utils import Config, create_logger
    from ..utils.checkpoint import load_checkpoint
    from ..vis import SMPLVisualizer

    cfg = Config(args.cfg)
    log = create_logger()
    seq_len = args.seq_len or int(cfg.get("test_seq_len", 300))
    mcfg = MotionInfillerConfig.from_dict(cfg.model_specs)
    model = MotionInfillerVAE(mcfg)

    rng = jax.random.PRNGKey(args.seed)
    W = mcfg.window_len
    params = model.init(rng, jnp.zeros((1, W, 69)), jnp.zeros((1, W, 69)),
                        jnp.ones((1, W)))
    if args.checkpoint:
        state = load_checkpoint(args.checkpoint)
        params = state["params"] if isinstance(state, dict) and "params" in state \
            else getattr(state, "params", state)

    if args.synthetic_data:
        data, jpos = synthetic_amass_data(8, min_len=seq_len + 10,
                                          max_len=seq_len + 60)
        ds = AMASSDataset(data, jpos, seq_len=seq_len,
                          data_mask_methods=cfg.get("test_data_mask_methods"))
    else:
        ds = AMASSDataset.from_dir(
            cfg.get("amass_dir"), "test", seq_len=seq_len,
            data_mask_methods=cfg.get("test_data_mask_methods"))

    smpl = get_smpl("body26fk")
    os.makedirs(args.out_dir, exist_ok=True)
    np_rng = np.random.default_rng(args.seed)
    for i in range(args.num_seq):
        s = ds.sample(np_rng)
        in_pose = jnp.asarray(s["in_body_pose"])[None]
        mask = jnp.asarray(s["frame_mask"])[None]
        L = num_latents(mcfg, seq_len)
        rng, sub = jax.random.split(rng)
        eps = jax.random.normal(sub, (L, 1, mcfg.nz))
        out_pose = np.asarray(
            infill_multi_step(model, params, in_pose, mask, eps))[0]

        T = seq_len
        def motion(body_pose, visible=None):
            return {"orient": s["pose"][:, :3], "body_pose": body_pose,
                    "betas": s["shape"], "trans": s["trans"],
                    "visible": visible}

        v = SMPLVisualizer(smpl=smpl, width=480, height=360)
        v.set_motions([
            motion(s["pose"][:, 3:]),                     # gt
            motion(out_pose, s["frame_mask"]),            # infer sample
        ])
        path = os.path.join(args.out_dir, f"seq_{i}.mp4")
        v.save_animation_as_video(path, num_fr=T)
        if args.html:
            v.save_interactive_html(path[:-4] + ".html", num_fr=T)
        log.info(f"wrote {path} (dropped {int(T - s['frame_mask'].sum())} frames)")


if __name__ == "__main__":
    main()
