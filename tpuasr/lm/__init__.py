"""Language models: backoff n-gram (ARPA) — the grammar ("G") half of the
reference's TLG decode path, consumed as shallow fusion on device or n-best
rescoring on host. See tpuasr/lm/ngram.py."""

from tpuasr.lm.ngram import (BOS, EOS, UNK, NGramLM, rescore_nbest,
                             train_ngram)

__all__ = ["NGramLM", "train_ngram", "rescore_nbest", "BOS", "EOS", "UNK"]
