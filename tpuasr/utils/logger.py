"""Logging setup (reference: asr/utils/logger.py [M] — python logging to
file+stdout plus TensorBoard scalars). TensorBoard here is optional via
tf.summary (tensorflow is in-env); falls back to CSV metrics."""

from __future__ import annotations

import csv
import logging
import sys
from pathlib import Path


def init_logger(name: str = "tpuasr", log_dir: str | None = None,
                level=logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(level)
    fmt = logging.Formatter(
        "%(asctime)s %(levelname).1s %(name)s: %(message)s", "%H:%M:%S")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_dir:
        Path(log_dir).mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(Path(log_dir) / f"{name}.log")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


class MetricsWriter:
    """Scalar metrics -> CSV always; TensorBoard if tf is importable."""

    def __init__(self, log_dir: str):
        self.dir = Path(log_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._csv_path = self.dir / "metrics.csv"
        self._csv = open(self._csv_path, "a", newline="")
        self._writer = csv.writer(self._csv)
        if self._csv.tell() == 0:
            self._writer.writerow(["step", "name", "value"])
        self._tb = None
        try:
            import tensorflow as tf  # noqa: deferred, heavy
            self._tb = tf.summary.create_file_writer(str(self.dir / "tb"))
        except Exception:
            pass

    def scalar(self, name: str, value: float, step: int):
        self._writer.writerow([step, name, float(value)])
        self._csv.flush()
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                tf.summary.scalar(name, float(value), step=step)

    def close(self):
        self._csv.close()
