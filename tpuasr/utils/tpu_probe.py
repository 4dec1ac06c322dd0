"""Timeout-bounded TPU health probe.

The axon tunnel can wedge so hard that ``jax.default_backend()`` itself
blocks indefinitely (measured round-3: >10 min at 0% CPU in every fresh
process). Probing in-process would wedge the caller too; a subprocess
bounds the damage to the timeout and leaves the parent free to fall back
to CPU (bench.py) or fail fast with a clear message (chip_smoke).
"""

from __future__ import annotations

import subprocess
import sys


def probe_tpu_status(timeout_s: float = 180.0) -> str:
    """One of:

    * ``"ok"``      — TPU backend initialized and ran one op + transfer;
    * ``"wedged"``  — the probe subprocess hung past the timeout (the
      tunnel-down failure mode: backend init itself blocks);
    * ``"no_tpu"``  — the subprocess finished but the default backend is
      not a TPU (CPU-only machine) or the op failed.
    """
    code = ("import jax, numpy as np, jax.numpy as jnp;"
            "assert jax.default_backend() == 'tpu', jax.default_backend();"
            "print(int(np.asarray(jnp.ones((8, 128)).sum())))")
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True,
                              timeout=timeout_s)
    except (subprocess.TimeoutExpired, OSError):
        return "wedged"
    if proc.returncode == 0 and proc.stdout.strip().endswith("1024"):
        return "ok"
    return "no_tpu"


def probe_tpu(timeout_s: float = 180.0) -> bool:
    """True iff a healthy TPU is reachable (see probe_tpu_status)."""
    return probe_tpu_status(timeout_s) == "ok"
