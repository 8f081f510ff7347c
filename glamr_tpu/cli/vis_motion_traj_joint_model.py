"""Stage-2+3 integration harness: occluded AMASS sequences through the
joint motion-infiller + trajectory-predictor, rendered gt / recon /
sample (reference: motion_infiller/vis_motion_traj_joint_model.py —
the closest thing upstream has to an integration test; maps onto
BASELINE.json configs 1-3)."""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    from ..utils.cache import enable_compile_cache
    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", default="joint_motion_traj_demo")
    parser.add_argument("--num_seq", type=int, default=3)
    parser.add_argument("--seq_len", type=int, default=None)
    parser.add_argument("--out_dir", default="out/glamr_tpu/vis_joint")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--synthetic_data", action="store_true")
    parser.add_argument("--html", action="store_true",
                        help="also export an interactive HTML viewer")
    parser.add_argument("--sample_num", type=int, default=None,
                        help="samples per sequence (default: cfg num_motion_samp)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data import AMASSDataset, synthetic_amass_data
    from ..models import load_joint_model
    from ..transforms import quaternion_to_angle_axis
    from ..utils import Config, create_logger
    from ..vis import SMPLVisualizer

    cfg = Config(args.cfg)
    log = create_logger()
    seq_len = args.seq_len or int(cfg.get("seq_len", 300))
    jm = load_joint_model(cfg)

    if args.synthetic_data:
        data, jpos = synthetic_amass_data(8, min_len=seq_len + 10,
                                          max_len=seq_len + 60)
        ds = AMASSDataset(data, jpos, seq_len=seq_len,
                          data_mask_methods=cfg.get("data_mask_methods"))
    else:
        ds = AMASSDataset.from_dir(
            cfg.get("amass_dir"), "test", seq_len=seq_len,
            seq_sampling_method=cfg.get("seq_sampling_method", "uniform"),
            data_mask_methods=cfg.get("data_mask_methods"))

    os.makedirs(args.out_dir, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)
    np_rng = np.random.default_rng(args.seed)
    sample_num = args.sample_num or int(cfg.get("num_motion_samp", 1))
    for i in range(args.num_seq):
        s = ds.sample(np_rng)
        rng, k = jax.random.split(rng)
        out = jm.infer_samples(
            jnp.asarray(s["in_body_pose"])[None],
            jnp.asarray(s["frame_mask"])[None],
            k, sample_num=sample_num,
        )
        gt = {"orient": s["pose"][:, :3], "body_pose": s["pose"][:, 3:],
              "betas": s["shape"], "trans": s["trans"]}
        motions = [gt]
        for j in range(sample_num):
            motions.append({
                "orient": np.asarray(
                    quaternion_to_angle_axis(out["orient_q"][j]))[0],
                "body_pose": np.asarray(out["body_pose"][j])[0],
                "betas": s["shape"],
                "trans": np.asarray(out["trans"][j])[0],
                "visible": s["frame_mask"],
            })
        v = SMPLVisualizer(smpl=jm.smpl, width=480, height=360)
        v.set_motions(motions)
        path = os.path.join(args.out_dir, f"seq_{i}.mp4")
        v.save_animation_as_video(path, num_fr=seq_len)
        if args.html:
            v.save_interactive_html(path[:-4] + ".html", num_fr=seq_len)
        log.info(f"wrote {path}")


if __name__ == "__main__":
    main()
