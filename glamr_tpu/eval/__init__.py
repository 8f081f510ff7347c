"""Benchmark evaluation: G-MPJPE / PA-MPJPE / G-MPVE / ACCEL on 3DPW and
Dynamic-H36M."""
from .evaluator import Evaluator

__all__ = ["Evaluator"]
