"""Host-side data pipeline (reference: asr/utils/{dataset,dataloader}.py and
asr/datasets/ corpus prep, SURVEY.md section 2.1).

The reference sorted each batch by length and padded to the batch max —
variable shapes, a recompile per batch on TPU. Here batches are
**length-bucketed into a small, fixed set of shapes** (data/bucketing.py) so
every bucket compiles exactly once per program; featurization happens on
device (tpuasr.features), so the loader only decodes wavs and pads.
"""

from tpuasr.data.manifest import Utterance, read_manifest, write_manifest
from tpuasr.data.bucketing import BucketSpec, make_buckets
from tpuasr.data.loader import AudioLoader, LoaderConfig
from tpuasr.data.synthetic import (SyntheticCorpus, WordCorpus,
                                   make_synthetic_corpus,
                                   make_word_corpus)

__all__ = [
    "Utterance", "read_manifest", "write_manifest",
    "BucketSpec", "make_buckets",
    "AudioLoader", "LoaderConfig",
    "SyntheticCorpus", "WordCorpus", "make_synthetic_corpus",
    "make_word_corpus",
]
