#!/usr/bin/env python
"""Reference re-baseline readiness (SURVEY.md provenance header; VERDICT r1
item 6). One command that:

  * TODAY (reference mount empty): verifies the checked-in golden fixtures
    — a deterministic wav, its feature frames under the CURRENT
    FeatureConfig defaults, and CTC losses on a fixed problem — against the
    current code. Any convention drift (window, mel scale, log floor, CMVN,
    CTC semantics) breaks this loudly instead of silently moving the
    baseline.
  * THE DAY /root/reference POPULATES: inventories the reference tree,
    flags every file that pins a featurizer convention (the [M]-tagged
    FeatureConfig defaults in SURVEY.md section 3.3 must be re-verified
    against it), and runs the two parity harnesses (config1 featurizer
    parity + wer_delta) so the ≤0.2% WER-delta north star gets measured
    against the real thing.

Usage:
  python benchmarks/rebaseline.py            # verify fixtures (+ ref scan)
  python benchmarks/rebaseline.py --regen    # rewrite fixtures (after a
                                             # DELIBERATE convention change)

Prints one JSON summary line last; exit code 0 iff everything checked out.
"""

from __future__ import annotations

import dataclasses
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def _require_cpu_backend():
    """Parity fixtures are pinned to the deterministic CPU backend: TPU
    matmul precision moves log-mel+CMVN values by up to ~0.3, which would
    mask real convention drift.

    Guarded (advisor r2): an import-time ``jax.config.update`` silently
    flipped any live TPU process that imported this module. Now the pin
    happens only when backends are uninitialized; an initialized non-CPU
    process gets a loud error instead of a silent backend switch.
    """
    import jax
    from jax._src import xla_bridge

    if xla_bridge.backends_are_initialized():
        if jax.default_backend() != "cpu":
            raise RuntimeError(
                "rebaseline fixtures require the deterministic CPU backend, "
                f"but this process already initialized "
                f"{jax.default_backend()!r}. Run benchmarks/rebaseline.py "
                "in its own process (or before any backend use).")
        return
    jax.config.update("jax_platforms", "cpu")

GOLDEN = REPO / "tests" / "data" / "golden"
REFERENCE = Path("/root/reference")

FRAME_ATOL = 1e-4      # log-mel values, CPU backend (deterministic)
CTC_ATOL = 1e-4


def golden_wav() -> np.ndarray:
    """1 s deterministic 8 kHz signal: three tone segments + seeded noise."""
    sr = 8000
    rng = np.random.default_rng(1234)
    t = np.arange(sr) / sr
    sig = np.zeros(sr, np.float32)
    for i, f in enumerate((440.0, 1210.0, 2600.0)):
        seg = slice(i * sr // 3, (i + 1) * sr // 3)
        sig[seg] = 0.4 * np.sin(2 * np.pi * f * t[seg])
    sig += 0.05 * rng.standard_normal(sr).astype(np.float32)
    return np.clip(sig, -1.0, 1.0)


def golden_ctc_problem():
    """Deterministic (log_probs, labels, lengths) for the CTC fixture."""
    rng = np.random.default_rng(77)
    B, T, C, U = 3, 40, 8, 6
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    logp = x - np.log(np.exp(x).sum(-1, keepdims=True))
    labels = rng.integers(1, C, size=(B, U)).astype(np.int32)
    in_lens = np.array([40, 33, 25], np.int32)
    lab_lens = np.array([6, 4, 2], np.int32)
    return logp, labels, in_lens, lab_lens


def compute_fixtures():
    _require_cpu_backend()
    import jax.numpy as jnp
    from scipy.io import wavfile

    from tpuasr.features import FeatureConfig, Featurizer
    from tpuasr.losses import ctc_loss, ctc_loss_ref

    cfg = FeatureConfig()
    # Quantize through int16 exactly as the on-disk fixture stores it, so
    # verification compares like for like (tight tolerance).
    wav = (golden_wav() * 32767.0).astype(np.int16).astype(np.float32) \
        / 32768.0
    fz = Featurizer(cfg)
    feats, flens = fz(wav[None], np.array([len(wav)], np.int32))
    feats = np.asarray(feats)[0, :int(flens[0])]

    logp, labels, in_lens, lab_lens = golden_ctc_problem()
    loss_ref = np.asarray(ctc_loss_ref(jnp.asarray(logp), jnp.asarray(labels),
                                       jnp.asarray(in_lens),
                                       jnp.asarray(lab_lens)))
    loss_fb = np.asarray(ctc_loss(jnp.asarray(logp), jnp.asarray(labels),
                                  jnp.asarray(in_lens),
                                  jnp.asarray(lab_lens)))
    meta = {"feature_config": dataclasses.asdict(cfg),
            "wav_sha_first16": hash_head(wav),
            "ctc_loss_ref": [round(float(v), 6) for v in loss_ref],
            "ctc_loss_fb": [round(float(v), 6) for v in loss_fb]}
    return wav, feats, meta


def hash_head(arr: np.ndarray) -> str:
    import hashlib
    return hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()[:16]


def regen() -> None:
    from scipy.io import wavfile
    GOLDEN.mkdir(parents=True, exist_ok=True)
    wav, feats, meta = compute_fixtures()
    wavfile.write(GOLDEN / "golden.wav", 8000,
                  (golden_wav() * 32767.0).astype(np.int16))
    np.save(GOLDEN / "golden_frames.npy", feats)
    (GOLDEN / "golden_meta.json").write_text(json.dumps(meta, indent=1))
    print(f"wrote fixtures to {GOLDEN} (frames {feats.shape})")


def verify() -> dict:
    """Recompute everything and diff against the checked-in fixtures."""
    out = {"fixtures": "missing"}
    if not (GOLDEN / "golden_meta.json").exists():
        return out
    meta = json.loads((GOLDEN / "golden_meta.json").read_text())
    wav, feats, now = compute_fixtures()

    import dataclasses as dc

    from tpuasr.features import FeatureConfig
    cfg_drift = {k: (v, now["feature_config"].get(k))
                 for k, v in meta["feature_config"].items()
                 if now["feature_config"].get(k) != v}

    # The wav fixture on disk is int16; featurize THAT (what a user feeds).
    from scipy.io import wavfile
    sr, disk = wavfile.read(GOLDEN / "golden.wav")
    disk = disk.astype(np.float32) / 32768.0
    from tpuasr.features import Featurizer
    fz = Featurizer(FeatureConfig())
    got, gl = fz(disk[None], np.array([len(disk)], np.int32))
    got = np.asarray(got)[0, :int(gl[0])]
    ref = np.load(GOLDEN / "golden_frames.npy")
    frame_dev = (float(np.abs(got - ref).max())
                 if got.shape == ref.shape else float("inf"))

    ctc_dev = max(
        max(abs(a - b) for a, b in zip(meta["ctc_loss_ref"],
                                       now["ctc_loss_ref"])),
        max(abs(a - b) for a, b in zip(meta["ctc_loss_fb"],
                                       now["ctc_loss_fb"])))
    out = {
        "fixtures": "ok",
        "config_drift": cfg_drift,
        "frame_shape": list(got.shape),
        "frame_max_dev": frame_dev,
        "frames_ok": frame_dev <= FRAME_ATOL,
        "ctc_max_dev": ctc_dev,
        "ctc_ok": ctc_dev <= CTC_ATOL,
        "wav_hash_ok": now["wav_sha_first16"] == meta["wav_sha_first16"],
    }
    return out


def scan_reference() -> dict:
    """Inventory /root/reference when it exists; point at convention files."""
    if not REFERENCE.exists():
        return {"reference": "no mount"}
    entries = [p for p in REFERENCE.rglob("*") if p.is_file()]
    if not entries:
        return {"reference": "empty"}
    convention_hits = []
    keywords = ("stft", "mel", "mfcc", "fbank", "spectrogram", "preemph",
                "dither", "cmvn", "window", "hamming", "hann")
    for p in entries:
        if p.suffix not in (".py", ".cc", ".cpp", ".h", ".sh", ".cfg"):
            continue
        try:
            text = p.read_text(errors="ignore").lower()
        except OSError:
            continue
        hits = [k for k in keywords if k in text]
        if hits:
            convention_hits.append({"file": str(p.relative_to(REFERENCE)),
                                    "keywords": hits})
    return {"reference": "POPULATED", "n_files": len(entries),
            "convention_files": convention_hits[:40]}


def main() -> int:
    if "--regen" in sys.argv:
        regen()
        return 0
    res = verify()
    ref = scan_reference()
    ok = (res.get("fixtures") == "ok" and res.get("frames_ok")
          and res.get("ctc_ok") and res.get("wav_hash_ok")
          and not res.get("config_drift"))
    if ref.get("reference") == "POPULATED":
        print("REFERENCE MOUNT IS POPULATED — re-verify SURVEY.md section "
              "2/3 [M]/[L] claims against it, re-pin FeatureConfig "
              "defaults from the files below, then the parity harnesses "
              "run now:", file=sys.stderr)
        for hit in ref["convention_files"]:
            print(f"  {hit['file']}: {','.join(hit['keywords'])}",
                  file=sys.stderr)
        for script in ("benchmarks/config1_featparity.py",
                       "benchmarks/wer_delta.py"):
            print(f"# running {script}", file=sys.stderr)
            r = subprocess.run([sys.executable, str(REPO / script)],
                               cwd=REPO)
            ok = ok and r.returncode == 0
    print(json.dumps({"metric": "rebaseline_ready", "ok": ok,
                      **{k: v for k, v in res.items()
                         if k != "frame_shape"},
                      "reference": ref.get("reference")}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
