"""CLI end-to-end: batch_train.py -> predict.py -> test.py as subprocesses on
the synthetic corpus (the reference's public API surface, SURVEY.md L3)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

from tpuasr.data import make_synthetic_corpus

REPO = Path(__file__).resolve().parent.parent


def run_cli(script, *args, timeout=600):
    env = dict(os.environ)
    env["TPUASR_PLATFORM"] = "cpu"
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run([sys.executable, str(REPO / script), *map(str, args)],
                       capture_output=True, text=True, timeout=timeout,
                       cwd=REPO, env=env)
    assert r.returncode == 0, f"{script} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


@pytest.mark.slow
def test_cli_train_predict_test(tmp_path):
    corpus = make_synthetic_corpus(tmp_path / "corpus", num_utts=12,
                                   vocab_size=5, min_tokens=2, max_tokens=3)
    log_dir = tmp_path / "run"
    out = run_cli(
        "batch_train.py", "deepspeech_ctc",
        "--train-manifest", corpus.manifest,
        "--units", corpus.root / "units.txt",
        "--batch-size", 4, "--num-epochs", 2, "--lr", "3e-3",
        "--max-label-len", 4, "--log-dir", log_dir,
        "--log-every", 1)
    ckpts = list((log_dir / "ckpt").glob("ckpt_*.msgpack"))
    assert ckpts, "no checkpoint written"

    wav = corpus.root / "wav" / "train_0000.wav"
    out = run_cli("predict.py", "deepspeech_ctc", wav,
                  "--checkpoint", log_dir / "ckpt",
                  "--units", corpus.root / "units.txt")
    assert str(wav) in out
    # Output format: "<path>\t<tokens...>" (possibly empty for 2 epochs)
    line = [l for l in out.splitlines() if str(wav) in l][0]
    assert "\t" in line

    out = run_cli("predict.py", "deepspeech_ctc", wav,
                  "--checkpoint", log_dir / "ckpt",
                  "--units", corpus.root / "units.txt", "--beam",
                  "--beam-width", 8, "--align", "--confidence")
    assert str(wav) in out
    # --align prints per-token spans for the best hypothesis (or nothing
    # when the hypothesis is empty this early in training).
    line = [l for l in out.splitlines() if str(wav) in l][0]
    hyp = line.split("\t", 1)[1].strip()
    if hyp:
        assert any(l.startswith("# align:") for l in out.splitlines())
    # --confidence always prints the utterance line; with --beam it carries
    # the hypothesis' posterior mass within the beam, both in [0, 1].
    conf = [l for l in out.splitlines() if l.startswith("# conf:")]
    assert conf, out
    fields = conf[0].split("|")[0].split()
    utt_c = float(fields[fields.index("utt") + 1])
    beam_c = float(fields[fields.index("beam") + 1])
    assert 0.0 <= utt_c <= 1.0 and 0.0 <= beam_c <= 1.0

    out = run_cli("test.py", "deepspeech_ctc",
                  "--manifest", corpus.manifest,
                  "--checkpoint", log_dir / "ckpt",
                  "--units", corpus.root / "units.txt",
                  "--batch-size", 4, "--max-label-len", 4,
                  "--dump-loglikes", tmp_path / "ll",
                  "--align", tmp_path / "ali",
                  "--write-segments", tmp_path / "aligned.jsonl")
    assert "token-error-rate" in out
    # Hybrid-workflow export: loglikes ark/scp round-trips via kaldi_io.
    from tpuasr.utils.kaldi_io import read_scp
    mats = dict(read_scp(tmp_path / "ll.scp"))
    assert len(mats) == 12 and all(m.ndim == 2 for m in mats.values())
    # Forced alignments: one frame-label vector per utterance, same T as
    # the loglikes, collapsing to the reference transcript.
    alis = dict(read_scp(tmp_path / "ali.scp"))
    assert len(alis) == 12
    for k, v in alis.items():
        assert v.ndim == 1 and len(v) == len(mats[k])
        assert (v >= 0).all()  # feasible on this corpus
    # Segment bootstrap: the written manifest carries aligned sample spans
    # ordered within each utterance (frame-wise training without hand-made
    # segments).
    from tpuasr.data.manifest import read_manifest
    utts = read_manifest(tmp_path / "aligned.jsonl")
    assert len(utts) == 12 and all(u.segments for u in utts)
    for u in utts:
        assert [s[0] for s in u.segments] == list(u.tokens)
        for (_, a0, a1), (_, b0, b1) in zip(u.segments, u.segments[1:]):
            assert a0 <= b0 and a1 <= b1

    # ---- Quantized serving: same checkpoint through the int8 paths ----
    out = run_cli("predict.py", "deepspeech_ctc", wav,
                  "--checkpoint", log_dir / "ckpt",
                  "--units", corpus.root / "units.txt", "--beam", "--int8")
    assert str(wav) in out
    out = run_cli("test.py", "deepspeech_ctc",
                  "--manifest", corpus.manifest,
                  "--checkpoint", log_dir / "ckpt",
                  "--units", corpus.root / "units.txt",
                  "--batch-size", 4, "--max-label-len", 4, "--int8")
    assert "token-error-rate" in out

    # ---- LM toolkit: train G from the transcripts, decode with it ----
    arpa = tmp_path / "g.arpa"
    out = run_cli("lm.py", "train", "--manifest", corpus.manifest,
                  "--units", corpus.root / "units.txt",
                  "--order", 2, "--out", arpa)
    assert arpa.exists() and "trained order-2 LM" in out
    out = run_cli("lm.py", "ppl", "--lm", arpa,
                  "--manifest", corpus.manifest,
                  "--units", corpus.root / "units.txt")
    assert "perplexity:" in out
    # n-best rescoring and on-device shallow fusion paths both run.
    out = run_cli("predict.py", "deepspeech_ctc", wav,
                  "--checkpoint", log_dir / "ckpt",
                  "--units", corpus.root / "units.txt", "--beam",
                  "--lm", arpa, "--lm-weight", "0.5", "--nbest", 2)
    assert str(wav) in out
    out = run_cli("predict.py", "deepspeech_ctc", wav,
                  "--checkpoint", log_dir / "ckpt",
                  "--units", corpus.root / "units.txt", "--beam",
                  "--lm", arpa, "--lm-fusion", "--lm-weight", "0.5")
    assert str(wav) in out
    out = run_cli("predict.py", "deepspeech_ctc", wav,
                  "--checkpoint", log_dir / "ckpt",
                  "--units", corpus.root / "units.txt", "--beam",
                  "--lm", arpa, "--lm-fusion", "--lm-fusion-order", 3)
    assert str(wav) in out
    out = run_cli("test.py", "deepspeech_ctc",
                  "--manifest", corpus.manifest,
                  "--checkpoint", log_dir / "ckpt",
                  "--units", corpus.root / "units.txt",
                  "--batch-size", 4, "--max-label-len", 4,
                  "--beam", "--lm", arpa, "--lm-fusion")
    assert "token-error-rate" in out

    # ---- First-pass WFST decode (the latgen path over a TLG-style
    # graph supplied as a binary OpenFst file) ----
    from tpuasr.decode import SymbolTable, lexicon_to_fst
    # Hand lexicon over the unit inventory (the token-level synthetic
    # corpus has no word lexicon; the graph still constrains the decode).
    word_prons = [("wA", (1, 2)), ("wB", (2, 1)), ("wC", (3,)),
                  ("wD", (4, 1))]
    tl = lexicon_to_fst(word_prons)
    tl_path = tmp_path / "tl.fst"
    tl.save_binary(tl_path)
    osyms_path = tmp_path / "fst_words.txt"
    SymbolTable({"<eps>": 0, **{w: i + 1 for i, (w, _) in
                                enumerate(word_prons)}}
                ).save(osyms_path)
    out = run_cli("predict.py", "deepspeech_ctc", wav,
                  "--checkpoint", log_dir / "ckpt",
                  "--units", corpus.root / "units.txt",
                  "--fst", tl_path, "--fst-decode",
                  "--fst-osyms", osyms_path, "--align")
    line = [l for l in out.splitlines() if str(wav) in l][0]
    hyp_words = line.split("\t", 1)[1].split()
    vocab = {w for w, _ in word_prons}
    assert all(w in vocab for w in hyp_words)  # graph-constrained output
    out = run_cli("test.py", "deepspeech_ctc",
                  "--manifest", corpus.manifest,
                  "--checkpoint", log_dir / "ckpt",
                  "--units", corpus.root / "units.txt",
                  "--batch-size", 4, "--max-label-len", 4,
                  "--fst", tl_path, "--fst-decode",
                  "--fst-osyms", osyms_path)
    assert "word-error-rate" in out and "final-reached" in out

    # ---- Lattice surface over the same graph: n-best + word
    # confidences + Kaldi-style text lattice archive ----
    lat_path = tmp_path / "lat.txt"
    out = run_cli("predict.py", "deepspeech_ctc", wav,
                  "--checkpoint", log_dir / "ckpt",
                  "--units", corpus.root / "units.txt",
                  "--fst", tl_path, "--fst-decode",
                  "--fst-osyms", osyms_path, "--fst-nbest", 3,
                  "--confidence", "--write-lattice", lat_path)
    hyp_lines = [l for l in out.splitlines() if str(wav) in l]
    assert hyp_lines and hyp_lines[0].split("\t")[1].startswith("[0]")
    conf_line = [l for l in out.splitlines() if l.startswith("# conf:")]
    if hyp_lines[0].split("\t", 2)[-1].strip():  # non-empty hypothesis
        assert conf_line
        for part in conf_line[0].split()[2:]:
            w, c = part.rsplit(":", 1)
            assert w in vocab and 0.0 < float(c) <= 1.0
    lat_text = lat_path.read_text()
    assert lat_text.startswith(wav.stem)  # utt key header
    arc_lines = [l for l in lat_text.splitlines()
                 if len(l.split()) == 4 and "," in l]
    assert arc_lines  # src dst word graph,acoustic, arcs present

    # ---- Device graph decode (the TPU-native latgen surface,
    # VERDICT r4 next #3): the graph constrains the ON-DEVICE beam ----
    # Route 1: prebuilt --fst (binary OpenFst over unit ilabels).
    out = run_cli("predict.py", "deepspeech_ctc", wav,
                  "--checkpoint", log_dir / "ckpt",
                  "--units", corpus.root / "units.txt",
                  "--fst", tl_path, "--graph-decode",
                  "--fst-osyms", osyms_path)
    line = [l for l in out.splitlines() if str(wav) in l][0]
    hyp_words = line.split("\t", 1)[1].split()
    assert all(w in vocab for w in hyp_words)  # graph-constrained output
    # Route 2: in-repo mkgraph — L from --lexicon/--words composed with a
    # word-level ARPA --lm into LG (tpuasr/decode/graph.py).
    units_list = (corpus.root / "units.txt").read_text().splitlines()
    lex_path = tmp_path / "lexicon.txt"
    lex_path.write_text("".join(
        f"{w} {' '.join(units_list[p] for p in pron)}\n"
        for w, pron in word_prons))
    words_path = tmp_path / "words.txt"
    SymbolTable({w: i for i, (w, _) in enumerate(word_prons)}
                ).save(words_path)
    from tpuasr.lm import train_ngram
    warpa = tmp_path / "words.arpa"
    train_ngram([["wA", "wB"], ["wB", "wC"], ["wD", "wA"], ["wC", "wA"]],
                order=2).save_arpa(warpa)
    out = run_cli("predict.py", "deepspeech_ctc", wav,
                  "--checkpoint", log_dir / "ckpt",
                  "--units", corpus.root / "units.txt",
                  "--lexicon", lex_path, "--words", words_path,
                  "--lm", warpa, "--graph-decode", "--nbest", 2)
    hyp_lines = [l for l in out.splitlines() if str(wav) in l]
    assert hyp_lines and hyp_lines[0].split("\t")[1].startswith("[0]")
    for l in hyp_lines:
        assert all(w in vocab for w in l.split("\t", 2)[-1].split())
    # test.py --graph-decode: word-level WER over the manifest.
    out = run_cli("test.py", "deepspeech_ctc",
                  "--manifest", corpus.manifest,
                  "--checkpoint", log_dir / "ckpt",
                  "--units", corpus.root / "units.txt",
                  "--batch-size", 4, "--max-label-len", 4,
                  "--fst", tl_path, "--fst-osyms", osyms_path,
                  "--graph-decode")
    assert "word-error-rate" in out and "final-reached" in out


@pytest.mark.slow
def test_cli_stream_graph_decode(tmp_path):
    """stream.py --graph-decode: the graph rides the STREAMING beam (state
    carried across chunks) and the final words come from graph replay."""
    corpus = make_synthetic_corpus(tmp_path / "corpus", num_utts=10,
                                   vocab_size=5, min_tokens=2, max_tokens=3)
    log_dir = tmp_path / "run"
    run_cli("batch_train.py", "deepspeech_ctc",
            "--train-manifest", corpus.manifest,
            "--units", corpus.root / "units.txt",
            "--batch-size", 4, "--num-epochs", 2, "--lr", "3e-3",
            "--max-label-len", 4, "--log-dir", log_dir,
            "--log-every", 100, "--no-cmvn",
            "--model-kwarg", "bidirectional=False",
            "--model-kwarg", "explicit_pad=True")
    from tpuasr.decode import SymbolTable, lexicon_to_fst
    word_prons = [("wA", (1, 2)), ("wB", (2, 1)), ("wC", (3,)),
                  ("wD", (4, 1))]
    units_list = (corpus.root / "units.txt").read_text().splitlines()
    lex_path = tmp_path / "lexicon.txt"
    lex_path.write_text("".join(
        f"{w} {' '.join(units_list[p] for p in pron)}\n"
        for w, pron in word_prons))
    words_path = tmp_path / "words.txt"
    SymbolTable({w: i for i, (w, _) in enumerate(word_prons)}
                ).save(words_path)
    wav = corpus.root / "wav" / "train_0000.wav"
    out = run_cli("stream.py", wav, "--checkpoint", log_dir / "ckpt",
                  "--units", corpus.root / "units.txt",
                  "--lexicon", lex_path, "--words", words_path,
                  "--graph-decode")
    assert "# transcript:" in out
    wline = [l for l in out.splitlines() if l.startswith("# words:")]
    assert wline, out
    vocab = {w for w, _ in word_prons}
    ws = wline[0].split(":", 1)[1].split()
    # Graph-constrained streaming: every emitted word is in the lexicon
    # (or the explicit no-complete-parse marker for an empty hypothesis).
    assert all(w in vocab for w in ws) or "(hypothesis" in wline[0]
