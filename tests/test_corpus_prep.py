"""Kaldi data-dir -> manifest conversion tests."""

import numpy as np
import pytest
from scipy.io import wavfile

from tpuasr.data.corpus import prepare_kaldi_dir
from tpuasr.data.manifest import read_manifest
from tpuasr.decode.lexicon import Lexicon, SymbolTable


@pytest.fixture
def kaldi_dir(tmp_path, rng):
    d = tmp_path / "data"
    d.mkdir()
    wavs = {}
    for i, uid in enumerate(["utt_a", "utt_b"]):
        path = tmp_path / f"{uid}.wav"
        wavfile.write(path, 8000,
                      (rng.standard_normal(8000 * (i + 1)) * 3000)
                      .astype(np.int16))
        wavs[uid] = str(path)
    (d / "wav.scp").write_text(
        "".join(f"{k} {v}\n" for k, v in wavs.items()))
    (d / "text").write_text("utt_a cat dog\nutt_b dog\n")
    return d


def test_prepare_with_lexicon(kaldi_dir, tmp_path):
    phones = SymbolTable.from_list(["<blank>", "k", "ae", "t", "d", "aa",
                                    "g"])
    words = SymbolTable.from_list(["<eps>", "cat", "dog"])
    lex = Lexicon([(words["cat"], (1, 2, 3)), (words["dog"], (4, 5, 6))])
    utts = prepare_kaldi_dir(kaldi_dir, tmp_path / "m.jsonl", lexicon=lex,
                             words=words)
    assert [u.id for u in utts] == ["utt_a", "utt_b"]
    assert utts[0].tokens == [1, 2, 3, 4, 5, 6]
    assert utts[1].tokens == [4, 5, 6]
    loaded = read_manifest(tmp_path / "m.jsonl")
    assert loaded[0].num_samples == 8000


def test_prepare_with_units(kaldi_dir, tmp_path):
    units = SymbolTable.from_list(["<blank>", "cat", "dog"])
    utts = prepare_kaldi_dir(kaldi_dir, tmp_path / "m.jsonl", units=units)
    assert utts[0].tokens == [1, 2]


def test_pipe_entries_rejected(kaldi_dir, tmp_path):
    (kaldi_dir / "wav.scp").write_text("utt_x sox a.flac -t wav - |\n")
    with pytest.raises(ValueError, match="pipe"):
        prepare_kaldi_dir(kaldi_dir, tmp_path / "m.jsonl")


def test_missing_wav_skipped_or_strict(kaldi_dir, tmp_path):
    (kaldi_dir / "wav.scp").write_text("utt_missing /nope/missing.wav\n")
    utts = prepare_kaldi_dir(kaldi_dir, tmp_path / "m.jsonl")
    assert utts == []
    with pytest.raises(FileNotFoundError):
        prepare_kaldi_dir(kaldi_dir, tmp_path / "m.jsonl", strict=True)
