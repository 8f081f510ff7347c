"""Precompile stage programs into the persistent XLA compile cache.

Cold-start compile of a recon stage schedule is the dominant latency for
a fresh deployment (minutes over a tunneled TPU; seconds warm). The
compiled program depends only on static shapes — the (persons, frames)
bucket — and the config's stage schedule, NOT on data values, so warming
the cache with synthetic estimates of the production shape buckets makes
every subsequent run_demo / run_dataset sweep start warm.

Typical production prep (one-off per deployment / config change):

    python -m glamr_tpu.cli.warmup --cfg glamr_static,glamr_static_multi \
        --num_fr 300,900 --persons 1,2 --pad_to 100

The reference has no equivalent (PyTorch eager pays per-iteration
dispatch instead of a one-off compile, global_recon_model.py:547-570).
"""
from __future__ import annotations

import argparse
import itertools
import os
import time

ALL_CFGS = ["glamr_static", "glamr_dynamic", "glamr_static_multi",
            "glamr_dynamic_multi", "glamr_3dpw", "glamr_h36m"]


def _parallel_warmup(args):
    """Fan the (cfg, persons, frames) grid out over N subprocesses, each
    running this CLI serially on its slice; the persistent cache dir is
    shared (cache writes are atomic per program)."""
    import subprocess
    import sys

    cfg_ids = ALL_CFGS if args.cfg == "all" else args.cfg.split(",")
    combos = list(itertools.product(
        cfg_ids, str(args.persons).split(","), str(args.num_fr).split(",")))

    def launch(combo):
        cfg_id, p, t = combo
        return subprocess.Popen(
            [sys.executable, "-m", "glamr_tpu.cli.warmup",
             "--parallel", "1",
             "--cache_dir", args.cache_dir,
             "--pad_to", str(args.pad_to),
             "--multi_seed", str(args.multi_seed),
             "--min_compile_secs", str(args.min_compile_secs),
             "--opt_niters", str(args.opt_niters),
             "--cfg", cfg_id, "--persons", p, "--num_fr", t])

    pending = list(combos)
    running: list = []
    rc = 0
    while pending or running:
        while pending and len(running) < args.parallel:
            running.append(launch(pending.pop(0)))
        done = [pr for pr in running if pr.poll() is not None]
        for pr in done:
            rc |= pr.returncode
            running.remove(pr)
        if not done:
            time.sleep(1.0)
    if rc:
        raise SystemExit(rc)
    return None


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", default="glamr_static",
                        help="comma-separated config ids (or 'all' for the "
                             "six shipped grecon configs)")
    parser.add_argument("--num_fr", default="900",
                        help="comma-separated sequence lengths (bucket "
                             "upper bounds) to compile for")
    parser.add_argument("--persons", default="1,2",
                        help="comma-separated person counts")
    parser.add_argument("--pad_to", type=int, default=0,
                        help="bucket granularity applied to each num_fr "
                             "(same value production sweeps will pass)")
    parser.add_argument("--multi_seed", type=int, default=0,
                        help="also compile the vmapped multi-seed program "
                             "for this many seeds (0 = skip)")
    parser.add_argument("--cache_dir", default="/root/.cache/jax")
    parser.add_argument("--min_compile_secs", type=float, default=0.0,
                        help="only persist programs whose compile took at "
                             "least this long (0 caches everything — tiny "
                             "programs are cheap to store and still save "
                             "the dispatch-path retrace)")
    parser.add_argument("--opt_niters", type=int, default=0,
                        help="override every stage's iteration count. The "
                             "scan length is baked into the compiled "
                             "program, so this warms a DIFFERENT program "
                             "than production — smoke-testing only")
    parser.add_argument("--parallel", type=int, default=1,
                        help="warm N (cfg, persons, frames) combos in N "
                             "concurrent subprocesses sharing the cache "
                             "dir — XLA compiles are mostly serial per "
                             "program, so independent bucket programs "
                             "overlap nearly perfectly")
    args = parser.parse_args(argv)

    if args.parallel > 1:
        return _parallel_warmup(args)

    import jax

    # respect an explicit JAX_PLATFORMS even when a platform plugin
    # rewrites jax_platforms at import time (the tunneled-TPU plugin does)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      args.min_compile_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from ..models import load_joint_model
    from ..pose_est import synthetic_pose_est
    from ..recon import GlobalReconOptimizer
    from ..utils import Config, create_logger

    log = create_logger()
    cfg_ids = ALL_CFGS if args.cfg == "all" else args.cfg.split(",")
    lengths = [int(t) for t in str(args.num_fr).split(",")]
    person_counts = [int(p) for p in str(args.persons).split(",")]

    for cfg_id in cfg_ids:
        cfg = Config(cfg_id)
        if args.opt_niters:
            for ss in cfg.opt_stage_specs.values():
                ss["opt_niters"] = args.opt_niters
        joint_model = None
        specs = cfg.get("grecon_model_specs", {})
        if specs.get("flag_infer_motion_traj") and "motion_traj_cfg" in specs:
            try:
                joint_model = load_joint_model(
                    Config(specs["motion_traj_cfg"]))
            except FileNotFoundError as e:
                log.info(f"{cfg_id}: joint model unavailable ({e}); "
                         f"warming the est-derived-traj path")
        opt = GlobalReconOptimizer(cfg, joint_model=joint_model, log=log)
        for P, T in itertools.product(person_counts, lengths):
            est = synthetic_pose_est(T, num_persons=P, seed=0)
            in_dict = {"est": est, "gt": {}, "gt_meta": {},
                       "seq_name": f"warmup_P{P}_T{T}"}
            t0 = time.time()
            opt.optimize(in_dict, pad_to=args.pad_to)
            log.info(f"{cfg_id} P={P} T={T} pad_to={args.pad_to}: "
                     f"compiled+ran in {time.time() - t0:.1f}s")
            if args.multi_seed:
                t0 = time.time()
                opt.optimize_multi_seed(
                    in_dict, seeds=list(range(args.multi_seed)),
                    pad_to=args.pad_to)
                log.info(f"{cfg_id} P={P} T={T} x{args.multi_seed} seeds "
                         f"(vmapped): compiled+ran in {time.time() - t0:.1f}s")
    size = sum(os.path.getsize(os.path.join(r, f))
               for r, _, fs in os.walk(args.cache_dir) for f in fs)
    log.info(f"compile cache at {args.cache_dir}: {size / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
