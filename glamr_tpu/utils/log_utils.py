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


def convert_sec_to_time(secs: float) -> str:
    m, s = divmod(int(secs), 60)
    h, m = divmod(m, 60)
    return f"{h:02d}:{m:02d}:{s:02d}"


def get_eta_str(cur_iter: int, total_iter: int, iter_secs: float) -> str:
    eta = iter_secs * max(total_iter - cur_iter - 1, 0)
    return convert_sec_to_time(eta)
