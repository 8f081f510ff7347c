"""Config system, logging, misc helpers."""
from .cache import enable_compile_cache
from .config import Config
from .log_utils import create_logger

__all__ = ["Config", "create_logger", "enable_compile_cache"]
