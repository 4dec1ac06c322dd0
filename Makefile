# tpuasr verification entry points (VERDICT r2 item 8: hardware truth is a
# GATE, not a convention — run `make verify-chip` before any round-end
# snapshot and record the result in WORKLOG.md).

PY ?= python

# Fast CPU suite (default tier; ~3-6 min warm on one core).
test:
	$(PY) -m pytest tests/ -q

# Full suite including the slow tier (~30-45 min on one core). One pytest
# PROCESS PER FILE: a single-process full run segfaulted twice inside
# jax's persistent-cache executable (de)serialization once enough process
# state accumulated (round-3, tests/run_sharded.py docstring).
test-all:
	$(PY) tests/run_sharded.py --runslow

# HARDWARE TRUTH: compiles + parity-checks every Pallas kernel fwd+bwd on
# the real chip (interpret mode skips Mosaic lowering — CPU tests can all
# pass on a kernel that does not compile on hardware), then checks the
# driver bench contract emits its JSON line. Run on the TPU host; first
# run ~10 min of compiles, cached afterwards.
verify-chip:
	$(PY) benchmarks/chip_smoke.py
	$(PY) bench.py
	$(PY) -m __graft_entry__

# Everything a round-end snapshot requires.
verify-round: verify-chip test-all

.PHONY: test test-all verify-chip verify-round
