#!/usr/bin/env python
"""Reference-compatible entry point: python test.py <model> --manifest ..."""
from tpuasr.cli.test import main

if __name__ == "__main__":
    raise SystemExit(main())
