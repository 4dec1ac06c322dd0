"""Golden-fixture regression: featurizer frames and CTC losses must match
the checked-in fixtures (benchmarks/rebaseline.py — the re-baseline
readiness machinery for the day /root/reference populates). A failure here
means a convention drifted (window, mel scale, log floor, CMVN, CTC
semantics); regen ONLY after a deliberate convention change."""

import json
from pathlib import Path

import numpy as np

GOLDEN = Path(__file__).parent / "data" / "golden"


def test_frames_match_fixture():
    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from benchmarks.rebaseline import FRAME_ATOL, compute_fixtures
    _, feats, _ = compute_fixtures()
    ref = np.load(GOLDEN / "golden_frames.npy")
    assert feats.shape == ref.shape
    assert float(np.abs(feats - ref).max()) <= FRAME_ATOL


def test_ctc_and_config_match_fixture():
    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from benchmarks.rebaseline import CTC_ATOL, compute_fixtures
    meta = json.loads((GOLDEN / "golden_meta.json").read_text())
    _, _, now = compute_fixtures()
    assert now["feature_config"] == meta["feature_config"], \
        "FeatureConfig defaults drifted; re-pin deliberately via --regen"
    assert now["wav_sha_first16"] == meta["wav_sha_first16"]
    for key in ("ctc_loss_ref", "ctc_loss_fb"):
        for a, b in zip(meta[key], now[key]):
            assert abs(a - b) <= CTC_ATOL
