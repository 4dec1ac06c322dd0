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


def test_dryrun_multichip():
    assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
    ge.dryrun_multichip(8)
