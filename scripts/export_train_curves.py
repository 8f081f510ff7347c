"""Export committed training-curve evidence from run-dir logs.

results/ is gitignored (checkpoints are hundreds of MB), so the curve
evidence for release checkpoints gets exported as small JSONs under
benchmarks/train_curves/ — one file per run leg, parsed from the
trainer's per-epoch log lines (cli/train.py writes
"epoch N/M | train X | val Y | Zs/epoch ...").

Usage:
    python scripts/export_train_curves.py            # all runs found
    python scripts/export_train_curves.py --runs results/traj_pred/...
"""
import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

LINE = re.compile(
    r"epoch\s+(\d+)/(\d+) \| train ([\d.eE+-]+) \| val ([\d.eE+-]+) \| "
    r"([\d.]+)s/epoch")


def parse_log(path: str) -> dict | None:
    epochs, train, val, spe = [], [], [], []
    total = None
    with open(path) as f:
        for line in f:
            m = LINE.search(line)
            if m:
                epochs.append(int(m.group(1)))
                total = int(m.group(2))
                train.append(float(m.group(3)))
                val.append(float(m.group(4)))
                spe.append(float(m.group(5)))
    if not epochs:
        return None
    best_i = min(range(len(val)), key=val.__getitem__)
    return {
        "run_dir": os.path.relpath(os.path.dirname(path)),
        "epochs_run": len(epochs),
        "epochs_target": total,
        "best_val": val[best_i],
        "best_val_epoch": epochs[best_i],
        "final_train": train[-1],
        "sec_per_epoch_median": sorted(spe)[len(spe) // 2],
        "curve": {"epoch": epochs, "train": train, "val": val},
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--runs", nargs="*", default=None,
                   help="run dirs (default: every results/*/*/version_*)")
    p.add_argument("--out_dir", default="benchmarks/train_curves")
    args = p.parse_args(argv)

    runs = args.runs or sorted(glob.glob("results/*/*/version_*"))
    os.makedirs(args.out_dir, exist_ok=True)
    written = []
    for run in runs:
        log = os.path.join(run, "log.txt")
        if not os.path.isfile(log):
            continue
        rec = parse_log(log)
        if rec is None:
            continue
        parts = os.path.normpath(run).split(os.sep)
        name = f"{parts[-2]}_{parts[-1]}.json"
        out = os.path.join(args.out_dir, name)
        with open(out, "w") as f:
            json.dump(rec, f)
        written.append((out, rec["epochs_run"], rec["best_val"]))
        print(f"{out}: {rec['epochs_run']}/{rec['epochs_target']} epochs, "
              f"best val {rec['best_val']:.4f} @ {rec['best_val_epoch']}")
    if not written:
        print("no parsable run logs found")
    return written


if __name__ == "__main__":
    main()
