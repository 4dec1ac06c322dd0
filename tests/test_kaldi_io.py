"""kaldi_io round-trip tests (binary FM/DM/FV formats, scp offsets)."""

import numpy as np

from tpuasr.utils import kaldi_io


def test_matrix_roundtrip(tmp_path, rng):
    mats = {
        "utt1": rng.standard_normal((17, 13)).astype(np.float32),
        "utt2": rng.standard_normal((5, 40)).astype(np.float32),
        "utt3": rng.standard_normal((3, 7)).astype(np.float64),
    }
    ark, scp = kaldi_io.write_ark_scp(tmp_path / "feats", mats.items())
    got_ark = dict(kaldi_io.read_ark(ark))
    assert set(got_ark) == set(mats)
    for k in mats:
        np.testing.assert_array_equal(got_ark[k], mats[k])
    got_scp = dict(kaldi_io.read_scp(scp))
    for k in mats:
        np.testing.assert_array_equal(got_scp[k], mats[k])


def test_vector_roundtrip(tmp_path, rng):
    vecs = {"a": rng.standard_normal(9).astype(np.float32),
            "b": rng.standard_normal(3).astype(np.float64)}
    ark, scp = kaldi_io.write_ark_scp(tmp_path / "vecs", vecs.items())
    got = dict(kaldi_io.read_ark(ark))
    for k in vecs:
        np.testing.assert_array_equal(got[k], vecs[k])


def test_write_ark_scp_dotted_prefix(tmp_path):
    """Suffixes append to the prefix — a dot inside it must not be spliced
    away (out.v1 -> out.v1.ark, not out.ark)."""
    items = [("a", np.ones((2, 3), np.float32))]
    ark, scp = kaldi_io.write_ark_scp(tmp_path / "out.v1", items)
    assert ark.name == "out.v1.ark" and scp.name == "out.v1.scp"
    assert dict(kaldi_io.read_ark(ark))["a"].shape == (2, 3)


def test_write_ark_scp_duplicate_keys_raise(tmp_path):
    import pytest

    m = np.ones((1, 2), np.float32)
    with pytest.raises(ValueError, match="duplicate ark key"):
        kaldi_io.write_ark_scp(tmp_path / "dup", [("k", m), ("k", m)])
