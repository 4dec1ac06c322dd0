"""Wedge-proofing shared by the artifact harnesses (VERDICT r4 next #2).

bench.py survived the round-4 tunnel wedge because it (a) probes the TPU
with bounded retries before touching jax, (b) re-execs its body once in a
fresh process when the body crashes after a passing probe, and (c) never
leaves the driver hanging. wer_delta.py and train_sustained.py — the two
harnesses whose round-4 full-scale outputs were LOST to the same outage —
had none of that. This module gives every harness the same treatment plus
one more: INCREMENTAL artifact writes (atomic tmp+rename after every
stage/batch), so a process killed or wedged mid-run leaves a valid partial
JSON on disk with everything measured so far instead of nothing.

Import order contract: call :func:`decide_platform` BEFORE importing any
tpuasr module that enables the compilation cache (the cache must stay off
on the XLA:CPU fallback — see tpuasr/utils/compile_cache.py).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import traceback
from pathlib import Path


def decide_platform() -> bool:
    """Probe the TPU (bounded retries, fresh subprocess per attempt); on
    failure pin this process to CPU so the body cannot wedge in backend
    init. Returns True iff the run should be (and is) on the TPU.

    ``TPUASR_PLATFORM=cpu`` skips the probe and forces CPU (tests)."""
    from tpuasr.utils.tpu_probe import probe_tpu_retry

    want_cpu = os.environ.get("TPUASR_PLATFORM") == "cpu"
    tpu_ok = (not want_cpu) and probe_tpu_retry()
    if not tpu_ok and os.environ.get("TPUASR_REQUIRE_TPU") == "1":
        # Artifact-of-record mode (capture_r05.py): a CPU fallback run at
        # full scale is hours of single-core compute producing a JSON the
        # orchestrator must reject anyway — exit fast with a distinct code
        # so the outer loop goes back to waiting on the tunnel instead.
        print("harness: TPU required (TPUASR_REQUIRE_TPU=1) but the probe "
              "failed; exiting 43 for the outer wait loop", file=sys.stderr,
              flush=True)
        raise SystemExit(43)
    import jax

    if not tpu_ok:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized by the embedding process
    return tpu_ok


class ArtifactWriter:
    """Incremental JSON artifact: ``update()`` merges columns, ``flush()``
    atomically rewrites ``path`` (tmp + os.replace) with ``"partial": true``
    until ``finish()``. With ``path=None`` (no --out) it only accumulates.

    A wedge/kill between flushes costs at most one stage — the artifact of
    record keeps every arm already measured (VERDICT r4 weak #3)."""

    def __init__(self, path: str | None):
        self.path = Path(path) if path else None
        self.record: dict = {}

    def update(self, **cols):
        self.record.update(cols)

    def flush(self, stage: str | None = None):
        if stage is not None:
            self.record["stage"] = stage
        if self.path is None:
            return
        self.record["partial"] = True
        tmp = self.path.with_name(self.path.name + ".tmp")
        tmp.write_text(json.dumps(self.record) + "\n")
        os.replace(tmp, self.path)

    def finish(self) -> str:
        self.record.pop("partial", None)
        self.record.pop("stage", None)
        line = json.dumps(self.record)
        if self.path is not None:
            tmp = self.path.with_name(self.path.name + ".tmp")
            tmp.write_text(line + "\n")
            os.replace(tmp, self.path)
        return line


class Watchdog:
    """Abort the process when the harness stops making progress.

    The axon tunnel's worst failure mode is a device op that HANGS (0%
    CPU, forever) after a passing probe — exceptions never fire, so the
    body-retry can't help and a mid-run wedge used to cost the whole
    artifact (rounds 3 and 4). A daemon thread watches a heartbeat the
    harness touches at every batch/stage; staleness past ``timeout_s``
    (default 900 s — axon compiles legitimately take minutes, and the
    persistent compile cache makes them one-time) prints a diagnostic
    and hard-exits with code 42, so an outer retry loop can re-probe and
    relaunch. Compiled executables are reused from the persistent cache
    on relaunch, so a retry costs compute, not compiles."""

    EXIT_CODE = 42

    def __init__(self, timeout_s: float = 900.0, label: str = "harness"):
        import threading
        import time
        self.timeout_s = timeout_s
        self.label = label
        self._last = time.monotonic()
        self._stop = False
        t = threading.Thread(target=self._watch, daemon=True)
        t.start()

    def beat(self):
        import time
        self._last = time.monotonic()

    def close(self):
        self._stop = True

    def _watch(self):
        import time
        while not self._stop:
            time.sleep(15.0)
            stale = time.monotonic() - self._last
            if not self._stop and stale > self.timeout_s:
                print(f"{self.label}: watchdog fired — no progress for "
                      f"{stale:.0f}s (wedged tunnel?); aborting for the "
                      "outer retry loop", file=sys.stderr, flush=True)
                os._exit(self.EXIT_CODE)


def run_with_body_retry(main_fn, script_path: str, env_key: str,
                        timeout_s: int = 7200) -> int:
    """Run ``main_fn()``; if the body crashes (e.g. FAILED_PRECONDITION from
    a tunnel that wedged *after* the probe passed), re-exec the script once
    in a fresh subprocess — backend init state is process-level, so a clean
    process is the only real retry. ``env_key`` bounds the recursion."""
    try:
        return main_fn()
    except Exception:
        if os.environ.get(env_key) == "1":
            raise
        traceback.print_exc(file=sys.stderr)
        print(f"{Path(script_path).name}: body crashed; retrying once in a "
              "fresh process", file=sys.stderr)
        env = dict(os.environ, **{env_key: "1"})
        proc = subprocess.run([sys.executable, script_path, *sys.argv[1:]],
                              env=env, timeout=timeout_s)
        return proc.returncode
