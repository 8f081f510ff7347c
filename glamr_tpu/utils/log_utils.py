"""Logging helpers (reference: lib/utils/log_utils.py:8-30, single module —
the reference's split `logging`/`log_utils` import bug is intentionally not
reproduced; see SURVEY.md 'latent import bugs')."""
from __future__ import annotations

import logging
import os
import sys
from typing import Optional


def create_logger(filename: Optional[str] = None, file_handle: bool = True,
                  name: str = "glamr_tpu") -> logging.Logger:
    log = logging.getLogger(name if filename is None else f"{name}.{filename}")
    log.setLevel(logging.INFO)
    log.propagate = False
    if not log.handlers:
        fmt = logging.Formatter("%(asctime)s %(message)s", datefmt="%H:%M:%S")
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        log.addHandler(sh)
        if filename is not None and file_handle:
            os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
            fh = logging.FileHandler(filename)
            fh.setFormatter(fmt)
            log.addHandler(fh)
    return log


class MetricsLogger:
    """Scalar-metrics fan-out: TensorBoard event files + wandb when the
    package is importable (the reference's three-logger stack —
    TensorBoardLogger + WandbLogger + TextLogger, motion_infiller/
    train.py:73-89; the text half is the `create_logger` console/file
    logger the training CLI already writes through)."""

    def __init__(self, run_dir: str, use_tb: bool = True,
                 wandb_project: Optional[str] = None,
                 wandb_run_name: Optional[str] = None):
        self.tb = None
        if use_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(os.path.join(run_dir, "tb"))
            except Exception as e:
                logging.getLogger("glamr_tpu").warning(
                    f"TensorBoard logging disabled ({type(e).__name__}: {e})")
        self.wandb = None
        if wandb_project:
            try:
                import wandb

                self.wandb = wandb.init(project=wandb_project,
                                        name=wandb_run_name, dir=run_dir)
            except Exception as e:
                logging.getLogger("glamr_tpu").warning(
                    f"wandb logging to project {wandb_project!r} disabled "
                    f"({type(e).__name__}: {e})")

    def log_scalars(self, step: int, scalars: dict):
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, float(v), step)
        if self.wandb is not None:
            self.wandb.log({k: float(v) for k, v in scalars.items()},
                           step=step)

    def close(self):
        if self.tb is not None:
            self.tb.flush()
            self.tb.close()
        if self.wandb is not None:
            self.wandb.finish()


def convert_sec_to_time(secs: float) -> str:
    m, s = divmod(int(secs), 60)
    h, m = divmod(m, 60)
    return f"{h:02d}:{m:02d}:{s:02d}"


def get_eta_str(cur_iter: int, total_iter: int, iter_secs: float) -> str:
    eta = iter_secs * max(total_iter - cur_iter - 1, 0)
    return convert_sec_to_time(eta)
