#!/usr/bin/env python
"""Reference-compatible entry point: python train.py <model> [flags].

The reference exposed both train.py and batch_train.py (SURVEY.md L3); in
tpuasr both drive the same bucketed-batch trainer — fixed-shape batches are
what makes the TPU path compile once, so there is no separate per-utterance
loop to preserve.
"""
from tpuasr.cli.batch_train import main

if __name__ == "__main__":
    raise SystemExit(main())
