#!/usr/bin/env python
"""LM toolkit: python lm.py {train,ppl,score} — ARPA n-gram build/query."""
from tpuasr.cli.lmtool import main

if __name__ == "__main__":
    raise SystemExit(main())
