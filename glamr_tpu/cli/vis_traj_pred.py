"""Qualitative trajectory-predictor check: decode multiple trajectory
samples for AMASS clips and render them against GT (reference:
traj_pred/vis_traj_pred.py)."""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    from ..utils.cache import enable_compile_cache
    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", default="traj_pred_demo")
    parser.add_argument("--num_seq", type=int, default=3)
    parser.add_argument("--sample_num", type=int, default=4)
    parser.add_argument("--out_dir", default="out/glamr_tpu/vis_traj_pred")
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
    from ..models import TrajPredVAE
    from ..models.configs import TrajPredConfig
    from ..transforms import angle_axis_to_quaternion, quaternion_to_angle_axis
    from ..utils import Config, create_logger
    from ..utils.checkpoint import load_checkpoint
    from ..vis import SMPLVisualizer

    cfg = Config(args.cfg)
    log = create_logger()
    seq_len = int(cfg.get("seq_len", 100))
    tcfg = TrajPredConfig.from_dict(cfg.model_specs, seq_len=seq_len)
    model = TrajPredVAE(tcfg)
    smpl = get_smpl("body26fk")

    rng = jax.random.PRNGKey(args.seed)
    q0 = jnp.tile(jnp.array([1.0, 0, 0, 0]), (1, 8, 1))
    params = model.init(rng, jnp.zeros((1, 8, 69)), jnp.zeros((1, 8, 3)), q0)
    if args.checkpoint:
        state = load_checkpoint(args.checkpoint)
        params = state["params"] if isinstance(state, dict) and "params" in state \
            else getattr(state, "params", state)

    if args.synthetic_data:
        data, jpos = synthetic_amass_data(8, min_len=seq_len + 10,
                                          max_len=seq_len + 60)
        ds = AMASSDataset(data, jpos, seq_len=seq_len)
    else:
        ds = AMASSDataset.from_dir(cfg.get("amass_dir"), "test", seq_len=seq_len)

    os.makedirs(args.out_dir, exist_ok=True)
    np_rng = np.random.default_rng(args.seed)
    for i in range(args.num_seq):
        s = ds.sample(np_rng)
        joint_pos = np.asarray(
            smpl.joint_pos_from_body_pose(jnp.asarray(s["pose"][:, 3:])))[None]
        motions = [{"orient": s["pose"][:, :3], "body_pose": s["pose"][:, 3:],
                    "betas": s["shape"], "trans": s["trans"]}]
        for k in range(args.sample_num):
            rng, sub = jax.random.split(rng)
            eps = jax.random.normal(sub, (1, tcfg.nz))
            out = model.apply(params, jnp.asarray(joint_pos), eps,
                              method=TrajPredVAE.decode)
            motions.append({
                "orient": np.asarray(
                    quaternion_to_angle_axis(out["out_orient_q"]))[0],
                "body_pose": s["pose"][:, 3:], "betas": s["shape"],
                "trans": np.asarray(out["out_trans"])[0],
            })
        v = SMPLVisualizer(smpl=smpl, width=480, height=360, show_smpl=False,
                           show_skeleton=True)
        v.set_motions(motions, offset_x=0.0)  # overlaid trajectories
        path = os.path.join(args.out_dir, f"seq_{i}.mp4")
        v.save_animation_as_video(path, num_fr=seq_len)
        if args.html:
            v.save_interactive_html(path[:-4] + ".html", num_fr=seq_len)
        log.info(f"wrote {path}")


if __name__ == "__main__":
    main()
