"""Corpus preparation (reference: asr/datasets/<corpus>/ prep scripts,
SURVEY.md section 2.1 Corpus-prep row). Converts corpus artifacts into the
JSONL manifests tpuasr.data consumes."""

from tpuasr.data.corpus.kaldi_dir import prepare_kaldi_dir

__all__ = ["prepare_kaldi_dir"]
