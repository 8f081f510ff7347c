"""Metric evaluation over run_dataset outputs (reference:
global_recon/eval_dataset.py — load grecon pkls per seq x seed, compute
metrics, aggregate across seeds with min/mean rules)."""
from __future__ import annotations

import argparse
import os
import pickle


def main(argv=None):
    from ..utils.cache import enable_compile_cache
    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="3dpw", choices=["3dpw", "h36m"])
    parser.add_argument("--cfg", default=None)
    parser.add_argument("--out_dir", default=None)
    parser.add_argument("--seeds", default="1")
    parser.add_argument("--sequences", default=None)
    args = parser.parse_args(argv)

    from .run_dataset import TEST_SEQUENCES
    from ..eval import Evaluator
    from ..utils import Config, create_logger

    cfg_id = args.cfg or f"glamr_{args.dataset}"
    out_dir = args.out_dir or f"out/glamr_tpu/{cfg_id}"
    cfg = Config(cfg_id, out_dir=out_dir)
    log = create_logger(os.path.join(out_dir, "eval_log.txt"))
    seeds = [int(s) for s in str(args.seeds).split(",")]
    seqs = (args.sequences.split(",") if args.sequences
            else TEST_SEQUENCES[args.dataset])

    dataset_name = "3DPW" if args.dataset == "3dpw" else "H36M"
    evaluator = Evaluator(algo=cfg.id, dataset=dataset_name,
                          compute_sample=len(seeds) > 1)
    for seq in seqs:
        per_seed = []
        for seed in seeds:
            f = os.path.join(out_dir, f"{seq}_seed{seed}.pkl")
            if not os.path.isfile(f):
                continue
            with open(f, "rb") as fh:
                data = pickle.load(fh)
            per_seed.append(
                evaluator.compute_sequence_metrics(data, accumulate=False))
        if not per_seed:
            log.info(f"skip {seq}: no recon outputs in {out_dir}")
            continue
        md = (evaluator.metrics_from_multiple_seeds(per_seed)
              if len(per_seed) > 1 else per_seed[0])
        evaluator.update_accumulated_metrics(md, name=seq)
        evaluator.print_metrics(md, prefix=f"{seq} | ", print_accum=False)
    evaluator.print_metrics(prefix="TOTAL | ")

    # persist the aggregate metrics next to the recon outputs
    import yaml

    metrics_file = os.path.join(out_dir, "metrics.yml")
    dump = {k: float(v.avg) for k, v in evaluator.acc_metrics_dict["metrics"].items()
            if not hasattr(v.avg, "ndim") or getattr(v.avg, "ndim", 0) == 0}
    with open(metrics_file, "w") as f:
        yaml.safe_dump(dump, f)
    log.info(f"wrote {metrics_file}")
    return evaluator.acc_metrics_dict


if __name__ == "__main__":
    main()
