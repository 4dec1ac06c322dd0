#!/usr/bin/env python
"""Run the test suite one FILE per PROCESS (the round-gate runner).

Why: twice in round 3 a full single-process ``pytest --runslow`` run died
with a SIGSEGV inside jax's persistent-cache executable (de)serialization
(once in get_executable_and_time, once in put_executable_and_time) — deep
into the run, never reproducible in isolation. The crash needs hundreds of
prior compilations' process state, i.e. an XLA:CPU export bug we cannot
fix here. Fresh processes per file keep every process far from that
regime, isolate any future crash to one file's report. (The persistent compile
cache is OFF for CPU processes for the same stability reason — see
tpuasr/utils/compile_cache.py — so shards recompile their programs; the
per-file cost is import + compile time.)

Usage: python tests/run_sharded.py [--runslow] [pytest args...]
Exit code 0 iff every file's pytest run exits 0.
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path


def main(argv: list[str]) -> int:
    tests_dir = Path(__file__).resolve().parent
    files = sorted(p for p in tests_dir.glob("test_*.py"))
    failures: list[tuple[str, int]] = []
    t0 = time.time()
    for i, f in enumerate(files, 1):
        cmd = [sys.executable, "-m", "pytest", str(f), "-q", *argv]
        print(f"[{i}/{len(files)}] {f.name}", flush=True)
        proc = subprocess.run(cmd, cwd=tests_dir.parent)
        if proc.returncode == 5:
            # pytest exit 5 = no tests collected (e.g. file is all slow
            # markers without --runslow) — not a failure.
            continue
        if proc.returncode != 0:
            failures.append((f.name, proc.returncode))
    dt = time.time() - t0
    if failures:
        print(f"\nSHARDED RUN FAILED in {dt:.0f}s: "
              + ", ".join(f"{n} (rc={rc})" for n, rc in failures))
        return 1
    print(f"\nSHARDED RUN OK: {len(files)} files in {dt:.0f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
