"""Native multithreaded wav batch loader vs the scipy reference decoder."""

import numpy as np
import pytest
from scipy.io import wavfile

from tpuasr.data import AudioLoader, LoaderConfig, make_synthetic_corpus
from tpuasr.data.manifest import load_wav
from tpuasr.native import wav_batch

pytestmark = pytest.mark.skipif(not wav_batch.available(),
                                reason="native toolchain unavailable")


def test_matches_scipy_loader_bitexact(tmp_path):
    corpus = make_synthetic_corpus(tmp_path, num_utts=6, vocab_size=4)
    from tpuasr.data.manifest import read_manifest
    utts = read_manifest(corpus.manifest)
    paths = [u.wav for u in utts]
    max_s = max(u.num_samples for u in utts)
    out, lens, srs = wav_batch.load_wav_batch(paths, max_s, num_threads=4)
    for j, u in enumerate(utts):
        ref, sr = load_wav(u.wav)
        assert srs[j] == sr and lens[j] == len(ref)
        np.testing.assert_array_equal(out[j, :lens[j]], ref)
        assert not out[j, lens[j]:].any()          # zero padding


@pytest.mark.parametrize("dtype,fmt", [
    (np.int16, "pcm16"), (np.int32, "pcm32"),
    (np.float32, "float32"), (np.uint8, "pcm8"),
])
def test_encodings_match_scipy(tmp_path, dtype, fmt):
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.9, 0.9, size=777).astype(np.float32)
    if dtype == np.int16:
        data = (x * 32767).astype(np.int16)
    elif dtype == np.int32:
        data = (x * 2147483647).astype(np.int32)
    elif dtype == np.uint8:
        data = ((x * 127) + 128).astype(np.uint8)
    else:
        data = x
    path = tmp_path / f"{fmt}.wav"
    wavfile.write(path, 8000, data)
    ref, sr = load_wav(str(path))
    out, lens, srs = wav_batch.load_wav_batch([str(path)] * 3, 1000,
                                              num_threads=3)
    assert sr == 8000 and (srs == 8000).all() and (lens == len(ref)).all()
    for j in range(3):
        np.testing.assert_array_equal(out[j, :lens[j]], ref)


def test_stereo_mean(tmp_path):
    rng = np.random.default_rng(1)
    st = (rng.uniform(-0.5, 0.5, size=(300, 2)) * 32767).astype(np.int16)
    path = tmp_path / "st.wav"
    wavfile.write(path, 8000, st)
    ref, _ = load_wav(str(path))                    # scipy path means too
    out, lens, _ = wav_batch.load_wav_batch([str(path)], 400)
    np.testing.assert_allclose(out[0, :lens[0]], ref, atol=1e-7)


def test_truncation_and_errors(tmp_path):
    x = (np.zeros(500) + 0.25 * 32767).astype(np.int16)
    path = tmp_path / "t.wav"
    wavfile.write(path, 8000, x)
    out, lens, _ = wav_batch.load_wav_batch([str(path)], 100)
    assert lens[0] == 100 and out.shape == (1, 100)
    with pytest.raises(RuntimeError, match="open failed"):
        wav_batch.load_wav_batch([str(tmp_path / "missing.wav")], 10)
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a wav file at all, definitely not RIFF data...")
    with pytest.raises(RuntimeError, match="RIFF"):
        wav_batch.load_wav_batch([str(bad)], 10)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    import struct
    return tag + struct.pack("<I", len(payload)) + payload


def test_sub_byte_encoding_rejected_not_sigfpe(tmp_path):
    """IMA ADPCM-style fmt (0x11, bits=4) must raise the clean
    unsupported-encoding error, not divide by zero (bytes = bits//8 == 0)."""
    import struct
    fmt = struct.pack("<HHIIHH", 0x11, 1, 8000, 4000, 256, 4)
    body = _chunk(b"fmt ", fmt) + _chunk(b"data", b"\x00" * 64)
    path = tmp_path / "adpcm.wav"
    path.write_bytes(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE"
                     + body)
    with pytest.raises(RuntimeError, match="unsupported encoding"):
        wav_batch.load_wav_batch([str(path)], 32)


def test_truncated_extensible_fmt_no_oob(tmp_path):
    """A WAVE_FORMAT_EXTENSIBLE fmt chunk that CLAIMS 40 bytes but is
    truncated at the file end must not read past the buffer; with no data
    chunk it lands on the missing-chunk error."""
    import struct
    # 12-byte RIFF header + 8-byte chunk header + 24 payload bytes = 44 (the
    # minimum parseable size); the GUID word would sit at offset 44 == EOF.
    fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16) + b"\x00" * 8
    path = tmp_path / "trunc.wav"
    path.write_bytes(b"RIFF" + struct.pack("<I", 36) + b"WAVE"
                     + b"fmt " + struct.pack("<I", 40) + fmt)
    with pytest.raises(RuntimeError, match="missing fmt/data chunk"):
        wav_batch.load_wav_batch([str(path)], 32)


def test_loader_batches_identical_with_native_io(tmp_path):
    corpus = make_synthetic_corpus(tmp_path, num_utts=10, vocab_size=4)
    la = AudioLoader(corpus.manifest,
                     LoaderConfig(batch_size=4, shuffle=False,
                                  native_io=True))
    lb = AudioLoader(corpus.manifest,
                     LoaderConfig(batch_size=4, shuffle=False,
                                  native_io=False))
    for ba, bb in zip(la, lb):
        for k in ("wav", "wav_lens", "tokens", "token_lens", "real"):
            np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)
