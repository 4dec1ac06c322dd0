#!/usr/bin/env python
"""Reference-compatible entry point: python predict.py <model> wav [wav...]."""
from tpuasr.cli.predict import main

if __name__ == "__main__":
    raise SystemExit(main())
