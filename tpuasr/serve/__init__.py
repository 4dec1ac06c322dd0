"""Online/streaming serving (beyond the reference, which was batch-only:
SURVEY.md section 3.2 — per-file predict). Production serving needs chunked,
stateful inference; see serve/streaming.py."""

from tpuasr.serve.streaming import StreamingRecognizer

__all__ = ["StreamingRecognizer"]
