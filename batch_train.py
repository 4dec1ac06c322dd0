#!/usr/bin/env python
"""Reference-compatible entry point: python batch_train.py <model> [flags]."""
from tpuasr.cli.batch_train import main

if __name__ == "__main__":
    raise SystemExit(main())
