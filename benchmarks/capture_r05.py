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

#   argv (under sys.executable) / out file / timeout / kind
#   kind: artifact     — harness writes out itself; gate on recorded backend
#         stdout_json  — last stdout line is the JSON; gate on its backend
#         smoke        — rc==0 is the gate; stdout+stderr saved to out
JOBS = [
    (["benchmarks/wer_delta.py", "--out", "WERDELTA_r05.json"],
     "WERDELTA_r05.json", 4 * 3600, "artifact"),
    (["benchmarks/train_sustained.py", "--out", "TRAIN_r05.json",
      "--batch-size", "64", "--bf16"],
     "TRAIN_r05.json", 2 * 3600, "artifact"),
    (["benchmarks/train_profile.py", "--ctc", "auto",
      "--out", "TRAINPROFILE_r05.json"],
     "TRAINPROFILE_r05.json", 1 * 3600, "artifact"),
    (["bench.py"], "BENCH_r05_preview.json", 1 * 3600, "stdout_json"),
    (["benchmarks/chip_smoke.py"], "CHIPSMOKE_r05.txt", 1 * 3600, "smoke"),
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
            kind: str = "artifact", attempts: int = 3,
            wait_budget_s: float = 4 * 3600) -> bool:
    """Run one chip job to a TPU-backed artifact.

    Harness jobs run with TPUASR_REQUIRE_TPU=1 so a failed in-harness
    probe exits 43 immediately instead of burning hours on a full-scale
    single-core CPU run. rc 43 (probe refused), rc 42 (mid-run Watchdog
    wedge abort), chip_smoke's rc 2 (fail-fast no-TPU), and a bench JSON
    whose backend fell back to cpu do NOT consume an attempt — they are
    tunnel weather, bounded by the overall deadline; only real failures
    count."""
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
        capture = kind in ("stdout_json", "smoke")
        try:
            proc = subprocess.run([sys.executable, *argv], cwd=REPO,
                                  env=env, timeout=timeout_s,
                                  capture_output=capture, text=capture)
            rc = proc.returncode
        except subprocess.TimeoutExpired:
            print(f"capture_r05: [{out_name}] timed out after {timeout_s}s",
                  flush=True)
            rc, proc = -1, None
        dt = time.monotonic() - t0

        ok = weather = False
        if kind == "artifact":
            backend = artifact_backend(out)
            ok = rc == 0 and backend == "tpu"
            weather = rc in (42, 43)
            detail = f"rc={rc} backend={backend}"
        elif kind == "stdout_json":
            rec, detail = None, f"rc={rc} (no parsable JSON line)"
            if proc is not None and rc == 0:
                for line in reversed(proc.stdout.splitlines()):
                    try:
                        rec = json.loads(line)
                        break
                    except ValueError:
                        continue
            if rec is not None:
                detail = f"rc={rc} backend={rec.get('backend')}"
                if rec.get("backend") == "tpu":
                    tmp = out.with_name(out.name + ".tmp")
                    tmp.write_text(json.dumps(rec) + "\n")
                    os.replace(tmp, out)
                    ok = True
                else:
                    weather = True      # probe lost the race -> cpu JSON
            weather = weather or rc == 43
        else:   # smoke
            if proc is not None:
                tmp = out.with_name(out.name + ".tmp")
                tmp.write_text((proc.stdout or "") + (proc.stderr or ""))
                os.replace(tmp, out)
            ok = rc == 0
            weather = rc in (2, 43)
            detail = f"rc={rc}"

        if ok:
            print(f"capture_r05: [{out_name}] DONE in {dt:.0f}s ({detail})",
                  flush=True)
            return True
        print(f"capture_r05: [{out_name}] {detail} after {dt:.0f}s; "
              + ("tunnel weather — waiting" if weather
                 else "counts as a failure"), flush=True)
        if not weather:
            fails += 1
    return False


def main() -> int:
    jobs = JOBS
    if len(sys.argv) > 1:       # re-run a subset: capture_r05.py OUT [OUT..]
        jobs = [j for j in JOBS if j[1] in sys.argv[1:]]
    results = {}
    for argv, out_name, timeout_s, kind in jobs:
        results[out_name] = run_job(argv, out_name, timeout_s, kind)
    print("capture_r05 summary:", json.dumps(results), flush=True)
    return 0 if all(results.values()) else 1


if __name__ == "__main__":
    raise SystemExit(main())
