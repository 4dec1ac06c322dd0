"""Support layer: logging, metrics, params (reference: asr/utils/, SURVEY.md
section 2.1 Logger/params row)."""

from tpuasr.utils.metrics import edit_distance, wer
from tpuasr.utils.logger import init_logger

__all__ = ["edit_distance", "wer", "init_logger"]
