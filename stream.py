#!/usr/bin/env python
"""Streaming recognition entry point: python stream.py <wav> --checkpoint ..."""
from tpuasr.cli.stream import main

if __name__ == "__main__":
    raise SystemExit(main())
