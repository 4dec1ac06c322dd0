"""Shared harness for the 5 BASELINE benchmark configs (BASELINE.md).

Each config script prints one JSON line: {"config": N, "metric": ...,
"value": ..., "unit": ...} plus optional detail lines to stderr.
"""

from __future__ import annotations

import json
import sys

import numpy as np

from tpuasr.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def emit(config: int, metric: str, value: float, unit: str, **extra):
    rec = {"config": config, "metric": metric, "value": round(value, 4),
           "unit": unit}
    rec.update(extra)
    print(json.dumps(rec))


def detail(msg: str):
    print(msg, file=sys.stderr)


def synth_wav(rng, b, seconds, sr=8000, scale=0.2):
    return (rng.standard_normal((b, int(sr * seconds))) * scale).astype(
        np.float32)
