"""Wedge-proofing of the artifact harnesses (benchmarks/harness.py;
VERDICT r4 next #2): incremental atomic artifact writes, the platform
decision, and — in the slow tier — a literal kill-mid-run check that a
SIGKILLed wer_delta leaves a valid partial JSON on disk."""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

from benchmarks.harness import ArtifactWriter

REPO = Path(__file__).resolve().parent.parent


class TestArtifactWriter:
    def test_incremental_partial_then_finish(self, tmp_path):
        p = tmp_path / "art.json"
        aw = ArtifactWriter(str(p))
        aw.update(a=1)
        aw.flush(stage="one")
        rec = json.loads(p.read_text())
        assert rec == {"a": 1, "stage": "one", "partial": True}
        aw.update(b=2)
        aw.flush(stage="two")
        rec = json.loads(p.read_text())
        assert rec["b"] == 2 and rec["stage"] == "two" and rec["partial"]
        line = aw.finish()
        rec = json.loads(p.read_text())
        assert rec == {"a": 1, "b": 2} == json.loads(line)
        assert not (tmp_path / "art.json.tmp").exists()

    def test_no_path_accumulates_only(self, tmp_path):
        aw = ArtifactWriter(None)
        aw.update(x=1)
        aw.flush(stage="s")
        assert json.loads(aw.finish()) == {"x": 1}

    def test_flush_is_atomic_replace(self, tmp_path):
        """Every flush fully replaces the file — a reader never sees a
        truncated JSON (write to .tmp + os.replace)."""
        p = tmp_path / "art.json"
        aw = ArtifactWriter(str(p))
        for i in range(20):
            aw.update(**{f"k{i}": "v" * 100})
            aw.flush()
            json.loads(p.read_text())   # parse must never fail


class TestRequireTpu:
    def test_failed_probe_exits_43_instead_of_cpu_fallback(self):
        """With TPUASR_REQUIRE_TPU=1 and a probe that cannot see a TPU,
        decide_platform must exit 43 fast (the capture orchestrator's
        wait-loop contract) rather than pinning CPU and letting a
        full-scale artifact run burn hours off-chip."""
        code = ("import os; os.environ['TPUASR_REQUIRE_TPU'] = '1';"
                "os.environ['TPUASR_PLATFORM'] = 'cpu';"   # forces probe fail
                "from benchmarks.harness import decide_platform;"
                "decide_platform()")
        proc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                              capture_output=True, text=True, timeout=120)
        assert proc.returncode == 43, (proc.returncode, proc.stderr)
        assert "TPUASR_REQUIRE_TPU" in proc.stderr


@pytest.mark.slow
class TestKillMidRun:
    def test_sigkill_leaves_valid_partial_artifact(self, tmp_path):
        """Launch wer_delta --quick, SIGKILL it the moment the first
        partial artifact lands, and assert what's on disk is valid JSON
        with partial=true and a stage marker — the round-4 failure mode
        (wedge mid-run => zero artifact) can no longer occur."""
        out = tmp_path / "WERDELTA_kill.json"
        env = dict(os.environ, TPUASR_PLATFORM="cpu",
                   TPUASR_PROBE_ATTEMPTS="1")
        proc = subprocess.Popen(
            [sys.executable, str(REPO / "benchmarks" / "wer_delta.py"),
             "--quick", "--out", str(out)],
            cwd=REPO, env=env, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL)
        try:
            deadline = time.time() + 900
            while time.time() < deadline and not out.exists():
                if proc.poll() is not None:
                    pytest.fail("wer_delta exited before first flush")
                time.sleep(0.5)
            assert out.exists(), "no partial artifact within budget"
        finally:
            if proc.poll() is None:
                proc.send_signal(signal.SIGKILL)
            proc.wait(timeout=60)
        rec = json.loads(out.read_text())
        assert rec["partial"] is True
        assert "stage" in rec
