"""G-MPJPE-level side-by-side: rebuild vs the REAL torch reference on
IDENTICAL degraded synthetic inputs.

The north-star quality target is "G-MPJPE within 1% of the PyTorch
reference" (BASELINE.md). Licensed 3DPW/SMPL assets are absent, so this
harness measures the target the only way available here — and arguably
the most direct way: the same in_dict (known-GT procedural sequences +
the eval_synthetic_sweep degradation model) is optimized by

  (a) the rebuild  — GlobalReconOptimizer, no joint model (est-derived
      base trajectory), and
  (b) the reference — the REAL unbound methods of
      /root/reference/global_recon/models/global_recon_model.py via
      tests/refutil.make_ref_optimizer (est_traj_init=True, the same
      est-derived fallback; its smplx body model is replaced by
      refutil.TorchSMPL, the same subset-skinning math the rebuild uses,
      so the body model cancels out of the comparison),

and BOTH outputs are scored by the rebuild's Evaluator (metric-value
parity of that evaluator against the reference's is pinned by
tests/test_parity.py). The CVAE halves are excluded on both sides (no
trained torch checkpoints exist for the reference), so the comparison
isolates stage 4 — the global optimizer that defines the paper's
G-MPJPE improvements.

Usage:
    python scripts/eval_ref_comparison.py --cfg glamr_3dpw \
        --num_seqs 4 --seq_len 300 --out benchmarks/ref_quality_comparison.json
"""
import argparse
import copy
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="glamr_3dpw")
    p.add_argument("--num_seqs", type=int, default=4)
    p.add_argument("--seq_len", type=int, default=300)
    p.add_argument("--data_seed", type=int, default=77)
    p.add_argument("--kp_noise_px", type=float, default=2.0)
    p.add_argument("--pose_noise", type=float, default=0.05)
    p.add_argument("--depth_noise", type=float, default=0.02)
    p.add_argument("--occl_frac", type=float, default=0.15)
    p.add_argument("--skip_ref", action="store_true",
                   help="rebuild side only (for a TPU-only pass)")
    p.add_argument("--niters", type=int, default=None,
                   help="override every stage's opt_niters (smoke probes)")
    p.add_argument("--out", default="benchmarks/ref_quality_comparison.json")
    return p.parse_args()


def to_numpy(obj):
    import torch

    if isinstance(obj, dict):
        return {k: to_numpy(v) for k, v in obj.items()}
    if isinstance(obj, torch.Tensor):
        return obj.detach().cpu().numpy()
    return obj


def metrics_of(evaluator, out, gt, seq_len):
    md = evaluator.compute_sequence_metrics(
        {**out, "gt": gt, "seq_len": seq_len}, accumulate=False)
    return {k: float(np.mean(v.avg)) for k, v in md["metrics"].items()}


def main():
    args = parse_args()
    from eval_synthetic_sweep import build_sequence

    from glamr_tpu.body import get_smpl, smpl_to_body26fk_map
    from glamr_tpu.data import procedural_amass_data
    from glamr_tpu.eval import Evaluator
    from glamr_tpu.recon import GlobalReconOptimizer
    from glamr_tpu.utils import Config
    from glamr_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    smpl = get_smpl("body26fk", synthetic=True)
    m26to24 = smpl_to_body26fk_map()
    K = np.array([[800.0, 0, 400], [0, 800, 300], [0, 0, 1]], np.float32)

    data, _, _, _ = procedural_amass_data(
        max(args.num_seqs * 2, 8), min_len=args.seq_len + 8,
        max_len=args.seq_len + 64, seed=args.data_seed)
    thetas = [v[:args.seq_len] for v in data.values()
              if v.shape[0] >= args.seq_len][:args.num_seqs]
    assert len(thetas) == args.num_seqs

    rng = np.random.default_rng(args.data_seed)
    seqs = []
    for i, theta in enumerate(thetas):
        gt_pkl, est, _ = build_sequence(theta, rng, args, smpl, m26to24, K)
        seqs.append((f"cmp_{i:02d}", gt_pkl, est))

    cfg = Config(args.cfg)
    if args.niters is not None:
        for ss in cfg.opt_stage_specs.values():
            ss["opt_niters"] = args.niters
    ev = Evaluator(algo="cmp", dataset="3dpw", smpl=smpl)

    # ---- rebuild side (no joint model: est-derived base trajectory,
    # mirroring the reference side's est_traj_init fallback)
    opt = GlobalReconOptimizer(cfg, smpl=smpl)
    mine, mine_wall = {}, 0.0
    for seq, gt_pkl, est in seqs:
        ind = {"est": copy.deepcopy(est),
               "gt": copy.deepcopy(gt_pkl["person_data"]),
               "gt_meta": copy.deepcopy(gt_pkl["meta"]), "seq_name": seq}
        t0 = time.time()
        out = opt.optimize(ind)
        mine_wall += time.time() - t0
        mine[seq] = metrics_of(ev, out, gt_pkl["person_data"], args.seq_len)
        print(f"[rebuild] {seq}: " + json.dumps(
            {k: round(v, 2) for k, v in mine[seq].items()}))

    result = {
        "cfg": args.cfg,
        "workload": {"num_seqs": args.num_seqs, "seq_len": args.seq_len,
                     "data_seed": args.data_seed,
                     "kp_noise_px": args.kp_noise_px,
                     "pose_noise": args.pose_noise,
                     "depth_noise": args.depth_noise,
                     "occl_frac": args.occl_frac},
        "scope": "stage-4 only, est-derived base trajectory both sides "
                 "(no CVAEs: no trained torch checkpoints exist for the "
                 "reference); shared subset-skinning body model; both "
                 "outputs scored by the rebuild Evaluator (metric parity "
                 "vs reference evaluator pinned in tests/test_parity.py)",
        "rebuild": {"per_seq": mine, "wall_s": round(mine_wall, 1)},
        "reproduce": f"python scripts/eval_ref_comparison.py --cfg "
                     f"{args.cfg} --num_seqs {args.num_seqs} --seq_len "
                     f"{args.seq_len}",
    }

    # ---- reference side
    if not args.skip_ref:
        import torch

        from refutil import TorchSMPL, make_ref_optimizer

        torch.set_num_threads(os.cpu_count() or 8)
        specs = dict(cfg.get("grecon_model_specs", {}))
        specs["flag_infer_motion_traj"] = True
        specs.pop("motion_traj_cfg", None)
        stage_specs = copy.deepcopy(cfg.opt_stage_specs)
        theirs, ref_wall = {}, 0.0
        for seq, gt_pkl, est in seqs:
            ref = make_ref_optimizer(specs, stage_specs, TorchSMPL(smpl),
                                     est_traj_init=True)
            ref.write_logs = lambda *a, **k: None
            ind = {"est": copy.deepcopy(est),
                   "gt": copy.deepcopy(gt_pkl["person_data"]),
                   "gt_meta": copy.deepcopy(gt_pkl["meta"]),
                   "seq_name": seq}
            t0 = time.time()
            out = to_numpy(ref.optimize(ind))
            ref_wall += time.time() - t0
            theirs[seq] = metrics_of(ev, out, gt_pkl["person_data"],
                                     args.seq_len)
            print(f"[reference] {seq}: " + json.dumps(
                {k: round(v, 2) for k, v in theirs[seq].items()}))

        agg = {}
        for k in next(iter(mine.values())):
            mv = float(np.mean([m[k] for m in mine.values()]))
            rv = float(np.mean([m[k] for m in theirs.values()]))
            agg[k] = {"rebuild": round(mv, 3), "reference": round(rv, 3),
                      "delta_pct": round(100 * (mv - rv) / max(abs(rv), 1e-9), 2)}
        result["reference"] = {"per_seq": theirs, "wall_s": round(ref_wall, 1)}
        result["aggregate"] = agg
        print("== aggregate (mean over sequences) ==")
        print(json.dumps(agg, indent=2))

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
