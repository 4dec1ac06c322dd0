"""Driver-contract regression: entry() compiles, dryrun_multichip(8) runs.

Round-3 redesign (VERDICT r2 item 1): ``dryrun_multichip`` re-execs in a
hermetic subprocess with a scrubbed environment so the axon client's
health/topology can never kill a CPU-mesh dry run, and ``_cpu_devices``
refuses — never falls back — when the CPU platform can't supply n devices.
"""

import os
import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as ge  # noqa: E402


def test_entry_compiles():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    logp, lens = out
    assert logp.shape[0] == 4 and logp.shape[2] == 64


@pytest.mark.slow
def test_dryrun_multichip_subprocess():
    """The driver-visible surface: spawns the hermetic child and succeeds
    even from a process whose own env/backend are poisoned."""
    assert os.environ.get("TPUASR_DRYRUN_INPROC") != "1"
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_subprocess_survives_poisoned_env(monkeypatch):
    """Simulate the driver host: axon plugin env present, JAX_PLATFORMS=axon.
    The scrubbed child must still run a CPU mesh and pass."""
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "203.0.113.7")  # bogus
    monkeypatch.setenv("LIBTPU_INIT_ARGS", "--bogus")
    ge.dryrun_multichip(8)


def test_child_env_scrubbed(monkeypatch):
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "203.0.113.7")
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    monkeypatch.setenv("LIBTPU_INIT_ARGS", "--x")
    monkeypatch.setenv("PJRT_DEVICE", "TPU")
    monkeypatch.setenv("HOME", "/root")
    env = ge._child_env(8)
    for k in ("PALLAS_AXON_POOL_IPS", "TPU_WORKER_HOSTNAMES",
              "LIBTPU_INIT_ARGS", "PJRT_DEVICE"):
        assert k not in env
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["XLA_FLAGS"] == "--xla_force_host_platform_device_count=8"
    assert env["TPUASR_DRYRUN_INPROC"] == "1"
    assert env["TPUASR_JAX_CACHE"] == "0"
    assert env["HOME"] == "/root"
    assert env["PYTHONPATH"].split(os.pathsep)[0] == ge._REPO


def test_cpu_devices_refuses_non_cpu(monkeypatch):
    """VERDICT r2 item 1: a fake topology where the CPU platform is absent
    but 8 accelerator devices exist must be REFUSED, not silently used
    (the exact round-1/2 driver failure mode)."""
    class FakeDev:
        platform = "axon"

    def fake_devices(backend=None):
        if backend == "cpu":
            raise RuntimeError("Backend 'cpu' is not in the list")
        return [FakeDev() for _ in range(8)]

    monkeypatch.setattr(jax, "devices", fake_devices)
    with pytest.raises(RuntimeError, match="[Rr]efusing"):
        ge._cpu_devices(8)


def test_cpu_devices_refuses_too_few(monkeypatch):
    class FakeCpu:
        platform = "cpu"

    monkeypatch.setattr(jax, "devices",
                        lambda backend=None: [FakeCpu() for _ in range(2)])
    with pytest.raises(RuntimeError, match="have 2"):
        ge._cpu_devices(8)


@pytest.mark.slow
def test_dryrun_inproc():
    assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
    ge._dryrun_inproc(8)


def test_dryrun_hermetic_to_default_device():
    """Simulate the round-1 driver failure in-process: the process default
    device is a device OUTSIDE the dry-run mesh. The in-proc body must (a)
    succeed and (b) never create a buffer on it — its internal live-array
    diff asserts (b) while state is still live."""
    devices = jax.devices()
    poisoned = devices[7]
    pre = list(jax.live_arrays())   # earlier tests may span all 8 devices
    before = {id(a) for a in pre}
    with jax.default_device(poisoned):
        ge._dryrun_inproc(4)   # mesh = devices[:4]; 7 must stay untouched
    leaked = [a for a in jax.live_arrays()
              if id(a) not in before and poisoned in a.devices()]
    # Anything here is a long-lived escape from the dryrun (cached jit
    # constant, leaked state leaf) onto the simulated-TPU default device.
    assert not leaked, f"{len(leaked)} buffers leaked onto {poisoned}"
    del pre
