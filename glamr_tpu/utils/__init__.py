"""Config system, logging, misc helpers."""
from .config import Config
from .log_utils import create_logger

__all__ = ["Config", "create_logger"]
