#!/usr/bin/env python
"""Round-5 artifact-of-record capture orchestrator (VERDICT r4 next #1).

Runs the three full-scale chip harnesses in sequence and leaves their JSON
artifacts at the repo root:

  * WERDELTA_r05.json      — 320-utt homophone-language accuracy harness
                             (wer_delta.py), all arms incl. the device
                             graph beam vs the host LG first pass.
  * TRAIN_r05.json         — sustained training throughput at B=64/bf16
                             with the HBM-resident corpus
                             (train_sustained.py), incl. isolated-step
                             rate so sustained/isolated is explicit.
  * TRAINPROFILE_r05.json  — per-stage train-step attribution + train-step
                             MFU (train_profile.py) post _gather_ext /
                             full-width-CTC-retile.

Wedge strategy (the round-3 and round-4 post-mortems): each harness has
its own bounded probe, CPU pin, incremental atomic writes, fresh-process
body retry, and a 15-min no-progress Watchdog that hard-exits 42. This
orchestrator is the OUTER loop those mechanisms hand off to: before every
launch it waits for a clean probe (the tunnel outage can outlast any
single harness's ~13-min retry budget), relaunches on exit 42 or a crash,
and rejects an artifact whose recorded backend fell back to "cpu". The
persistent compile cache makes relaunches cost compute, not compiles.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

#           argv (under sys.executable)                               out file
JOBS = [
    (["benchmarks/wer_delta.py", "--out", "WERDELTA_r05.json"],
     "WERDELTA_r05.json", 4 * 3600),
    (["benchmarks/train_sustained.py", "--out", "TRAIN_r05.json",
      "--batch-size", "64", "--bf16"],
     "TRAIN_r05.json", 2 * 3600),
    (["benchmarks/train_profile.py", "--ctc", "auto",
      "--out", "TRAINPROFILE_r05.json"],
     "TRAINPROFILE_r05.json", 1 * 3600),
]


def wait_for_tpu(max_wait_s: float) -> bool:
    """Block until the probe says "ok" (True) or the backend is clean-CPU /
    the budget runs out (False). "wedged" keeps waiting — that is the
    transient-outage signal worth riding out."""
    sys.path.insert(0, str(REPO))
    from tpuasr.utils.tpu_probe import probe_tpu_status

    t0 = time.monotonic()
    while True:
        status = probe_tpu_status(180.0)
        if status == "ok":
            return True
        if status == "no_tpu":
            print("capture_r05: backend is not a TPU (clean answer); "
                  "refusing to capture CPU artifacts", flush=True)
            return False
        waited = time.monotonic() - t0
        if waited > max_wait_s:
            print(f"capture_r05: tunnel still wedged after {waited:.0f}s; "
                  "giving up on this job", flush=True)
            return False
        print(f"capture_r05: tunnel wedged ({waited:.0f}s so far); "
              "re-probing in 120s", flush=True)
        time.sleep(120.0)


def artifact_backend(path: Path) -> str | None:
    try:
        return json.loads(path.read_text()).get("backend")
    except (OSError, ValueError):
        return None


def run_job(argv: list[str], out_name: str, timeout_s: int,
            attempts: int = 3, wait_budget_s: float = 4 * 3600) -> bool:
    """Run one harness to a TPU-backed artifact.

    The harness runs with TPUASR_REQUIRE_TPU=1 so a failed in-harness
    probe exits 43 immediately instead of burning hours on a full-scale
    single-core CPU run. rc 43 (probe refused) and rc 42 (mid-run
    Watchdog wedge abort) do NOT consume an attempt — they are tunnel
    weather, bounded by the overall deadline; only real failures count."""
    out = REPO / out_name
    deadline = time.monotonic() + wait_budget_s + timeout_s
    env = dict(os.environ, TPUASR_REQUIRE_TPU="1")
    fails = 0
    while fails < attempts and time.monotonic() < deadline:
        if not wait_for_tpu(deadline - time.monotonic()):
            return False
        print(f"capture_r05: [{out_name}] launch (fails={fails}): "
              f"{' '.join(argv)}", flush=True)
        t0 = time.monotonic()
        try:
            rc = subprocess.run([sys.executable, *argv], cwd=REPO, env=env,
                                timeout=timeout_s).returncode
        except subprocess.TimeoutExpired:
            print(f"capture_r05: [{out_name}] timed out after {timeout_s}s",
                  flush=True)
            rc = -1
        dt = time.monotonic() - t0
        backend = artifact_backend(out)
        if rc == 0 and backend == "tpu":
            print(f"capture_r05: [{out_name}] DONE in {dt:.0f}s "
                  f"(backend={backend})", flush=True)
            return True
        print(f"capture_r05: [{out_name}] rc={rc} backend={backend} "
              f"after {dt:.0f}s; "
              + ("tunnel weather — waiting" if rc in (42, 43)
                 else "counts as a failure"), flush=True)
        if rc not in (42, 43):
            fails += 1
    return False


def main() -> int:
    results = {}
    for argv, out_name, timeout_s in JOBS:
        results[out_name] = run_job(argv, out_name, timeout_s)
    print("capture_r05 summary:", json.dumps(results), flush=True)
    return 0 if all(results.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
