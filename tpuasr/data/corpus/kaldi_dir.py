"""Kaldi data-dir -> JSONL manifest conversion (the ASpIRE path).

The reference consumed Kaldi ASpIRE recipe artifacts: wav.scp, text,
utt2dur, and the graph's words.txt/phones.txt plus a lexicon (SURVEY.md
sections 2.1/3.3 — labels were Kaldi phone ids). This module performs the
same role offline: given a user-supplied Kaldi-style data directory, emit a
tpuasr manifest whose token ids come from phones.txt via the lexicon (or
directly from a units table for character/word-unit models).

No Kaldi binaries are invoked; wav.scp entries must point at plain wav files
(pipe entries — 'cmd |' — are rejected with a clear error).
"""

from __future__ import annotations

from pathlib import Path

from tpuasr.data.manifest import Utterance, load_wav, write_manifest
from tpuasr.decode.lexicon import Lexicon, SymbolTable


def _read_kv(path: Path) -> dict[str, str]:
    out = {}
    for line in path.read_text().splitlines():
        parts = line.split(None, 1)
        if len(parts) == 2:
            out[parts[0]] = parts[1].strip()
    return out


def prepare_kaldi_dir(data_dir, out_manifest, units: SymbolTable = None,
                      lexicon: Lexicon = None, words: SymbolTable = None,
                      sample_rate: int = 8000,
                      strict: bool = False) -> list[Utterance]:
    """Convert a Kaldi-style data dir into a JSONL manifest.

    Tokenization, in priority order:
      * lexicon + words given: text words -> phone-id sequence (OOVs skipped,
        or error when strict);
      * units given: whitespace tokens looked up directly (char/word units);
      * neither: tokens left empty (inference-only manifest).
    """
    data_dir = Path(data_dir)
    wav_scp = _read_kv(data_dir / "wav.scp")
    text = _read_kv(data_dir / "text") if (data_dir / "text").exists() else {}
    utts = []
    skipped = []
    for utt_id, wav_path in sorted(wav_scp.items()):
        if wav_path.endswith("|"):
            raise ValueError(
                f"{utt_id}: pipe wav.scp entries are not supported "
                f"(pre-convert to wav files): {wav_path!r}")
        transcript = text.get(utt_id, "")
        tokens: list[int] = []
        if transcript and lexicon is not None and words is not None:
            for w in transcript.split():
                wid = words.sym2id.get(w)
                pron = None
                if wid is not None:
                    pron = next((p for vid, p in lexicon.prons
                                 if vid == wid), None)
                if pron is None:
                    if strict:
                        raise KeyError(f"{utt_id}: OOV word {w!r}")
                    continue
                tokens.extend(pron)
        elif transcript and units is not None:
            for tok in transcript.split():
                tid = units.sym2id.get(tok)
                if tid is None:
                    if strict:
                        raise KeyError(f"{utt_id}: unknown unit {tok!r}")
                    continue
                tokens.append(tid)
        try:
            data, sr = load_wav(wav_path)
        except (FileNotFoundError, ValueError) as e:
            if strict:
                raise
            skipped.append((utt_id, str(e)))
            continue
        if sr != sample_rate:
            if strict:
                raise ValueError(f"{utt_id}: sr {sr} != {sample_rate}")
            skipped.append((utt_id, f"sr {sr}"))
            continue
        utts.append(Utterance(id=utt_id, wav=wav_path, tokens=tokens,
                              text=transcript, num_samples=len(data),
                              sample_rate=sr))
    write_manifest(out_manifest, utts)
    return utts
