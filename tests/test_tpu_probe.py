"""probe_tpu_retry: bounded backoff on transient wedges (VERDICT r3 #3).

The probe itself needs a live tunnel; these tests fake probe_tpu_status to
pin the retry *policy*: wedged retries with backoff, no_tpu short-circuits,
ok returns immediately, and the env override caps attempts.
"""

import tpuasr.utils.tpu_probe as tp


def _patched(monkeypatch, statuses):
    calls = []
    seq = iter(statuses)
    monkeypatch.setattr(tp, "probe_tpu_status",
                        lambda timeout_s=180.0: (calls.append(1),
                                                 next(seq))[1])
    slept = []
    monkeypatch.setattr(tp.time, "sleep", slept.append)
    return calls, slept


def test_wedged_retries_with_backoff(monkeypatch):
    calls, slept = _patched(monkeypatch, ["wedged"] * 3)
    assert tp.probe_tpu_retry(attempts=3) is False
    assert len(calls) == 3
    assert slept == [30.0, 60.0]  # no sleep after the final attempt


def test_transient_wedge_recovers(monkeypatch):
    calls, slept = _patched(monkeypatch, ["wedged", "wedged", "ok"])
    assert tp.probe_tpu_retry(attempts=5) is True
    assert len(calls) == 3 and slept == [30.0, 60.0]


def test_no_tpu_short_circuits(monkeypatch):
    calls, slept = _patched(monkeypatch, ["no_tpu"] * 5)
    assert tp.probe_tpu_retry(attempts=5) is False
    assert len(calls) == 1 and slept == []


def test_env_override(monkeypatch):
    monkeypatch.setenv("TPUASR_PROBE_ATTEMPTS", "1")
    calls, slept = _patched(monkeypatch, ["wedged"] * 5)
    assert tp.probe_tpu_retry() is False
    assert len(calls) == 1 and slept == []
