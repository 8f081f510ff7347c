"""Measure the PyTorch reference baseline on THIS machine.

Times the REAL reference optimizer — the unbound methods of
/root/reference/global_recon/models/global_recon_model.py bound via
tests/refutil.make_ref_optimizer (init_data, forward, compute_loss,
optimize_main, torch.optim.Adam closures) — on the SAME synthetic
workload bench.py uses (900 frames, 2 persons, glamr_static 500-iter
stage budget), with torch CPU (no CUDA in this image).

The reference's smplx body model is replaced by refutil.TorchSMPL (the
repo's subset-skinning joints math as a torch module — licensed smplx
files are absent; this makes the reference CHEAPER than its real
6890-vertex LBS) and its CVAE inference is replaced by the est-derived
fallback (no trained torch checkpoints exist here — again cheaper).
Both substitutions bias the measured baseline FAST, so
bench.py's vs_baseline = mine/reference is conservative.

Writes {"measured": {...}} into BASELINE.json and prints the result.

Usage: python scripts/measure_ref_baseline.py [--niters N] [--dry]
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--niters", type=int, default=None,
                    help="override stage iterations (probe runs)")
    ap.add_argument("--dry", action="store_true",
                    help="probe only; do not write BASELINE.json")
    args = ap.parse_args()

    import copy

    import jax

    jax.config.update("jax_platforms", "cpu")  # workload synth only
    import torch

    from refutil import TorchSMPL, make_ref_optimizer
    from __graft_entry__ import _synthetic_in_dict
    from glamr_tpu.body import get_smpl
    from glamr_tpu.utils import Config

    torch.set_num_threads(os.cpu_count() or 8)

    T, P = 900, 2
    in_dict = _synthetic_in_dict(T=T, P=P)
    cfg = Config("glamr_static")
    smpl = get_smpl("body26fk", synthetic=True)
    torch_smpl = TorchSMPL(smpl)

    specs = dict(cfg.get("grecon_model_specs", {}))
    specs["flag_infer_motion_traj"] = True
    specs.pop("motion_traj_cfg", None)
    stage_specs = copy.deepcopy(cfg.opt_stage_specs)
    niters = {k: ss["opt_niters"] for k, ss in stage_specs.items()}
    if args.niters is not None:
        for ss in stage_specs.values():
            ss["opt_niters"] = args.niters
        niters = {k: args.niters for k in stage_specs}

    ref = make_ref_optimizer(specs, stage_specs, torch_smpl,
                             est_traj_init=True)
    ref.init_traj_heading_from_cam = lambda *a, **k: None
    ref.write_logs = lambda *a, **k: None

    t0 = time.time()
    ref.optimize(in_dict)
    elapsed = time.time() - t0
    total_iters = sum(niters.values())
    fps = T / elapsed
    print(f"reference optimize: {elapsed:.1f}s for {total_iters} iters "
          f"on T={T} P={P}  =>  {fps:.3f} frames/sec "
          f"({elapsed / total_iters:.3f} s/iter)")

    if args.dry:
        return

    measured = {
        "reference_fps": round(fps, 4),
        "elapsed_sec": round(elapsed, 1),
        "workload": f"glamr_static {total_iters} iters, T={T}, P={P}, "
                    "synthetic (bench.py workload)",
        "methodology": "real reference optimize_main/forward/compute_loss/"
                       "Adam (refutil.make_ref_optimizer), torch CPU "
                       f"{torch.get_num_threads()} threads; smplx LBS -> "
                       "TorchSMPL subset skinning, CVAE -> est-derived "
                       "fallback (both bias the baseline FAST; see "
                       "BASELINE.md)",
        "torch_version": torch.__version__,
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    path = os.path.join(REPO, "BASELINE.json")
    with open(path) as f:
        base = json.load(f)
    base["measured"] = measured
    with open(path, "w") as f:
        json.dump(base, f, indent=2)
    print(f"wrote measured baseline to {path}")


if __name__ == "__main__":
    main()
