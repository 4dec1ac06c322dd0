"""Driver-contract regression: entry() compiles, dryrun_multichip(8) runs."""

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
def test_dryrun_multichip():
    assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
    ge.dryrun_multichip(8)


def test_dryrun_hermetic_to_default_device():
    """Simulate the round-1 driver failure: the process default device is a
    device OUTSIDE the dry-run mesh (on the real host: the unhealthy axon
    TPU). The dryrun must (a) succeed and (b) never create a buffer on it —
    its internal live-array diff asserts (b) while state is still live."""
    devices = jax.devices()
    poisoned = devices[7]
    pre = list(jax.live_arrays())   # earlier tests may span all 8 devices
    before = {id(a) for a in pre}
    with jax.default_device(poisoned):
        ge.dryrun_multichip(4)   # mesh = devices[:4]; 7 must stay untouched
    leaked = [a for a in jax.live_arrays()
              if id(a) not in before and poisoned in a.devices()]
    # Anything here is a long-lived escape from the dryrun (cached jit
    # constant, leaked state leaf) onto the simulated-TPU default device.
    assert not leaked, f"{len(leaked)} buffers leaked onto {poisoned}"
    del pre
