"""Shared CLI plumbing: argument groups, vocab loading, checkpoint lookup."""

from __future__ import annotations

import argparse
from pathlib import Path

from tpuasr.features import FeatureConfig
from tpuasr.models import MODEL_REGISTRY


def add_common_flags(p: argparse.ArgumentParser):
    p.add_argument("model", choices=sorted(MODEL_REGISTRY),
                   help="acoustic model (reference model names)")
    p.add_argument("--units", type=str, default=None,
                   help="units/vocab file (one token name per line, id order; "
                        "line 0 = <blank>)")
    p.add_argument("--sample-rate", type=int, default=8000)
    p.add_argument("--n-mels", type=int, default=64)
    p.add_argument("--feature-type", default="fbank",
                   choices=["fbank", "mfcc", "spectrogram"])
    p.add_argument("--use-cuda", action="store_true",
                   help="accepted for reference-CLI compatibility; ignored "
                        "(device selection is automatic: TPU if present)")
    return p


def feature_config(args) -> FeatureConfig:
    return FeatureConfig(sample_rate=args.sample_rate, n_mels=args.n_mels,
                         feature_type=args.feature_type)


def load_units(path: str | None) -> list[str]:
    if path is None:
        return []
    return Path(path).read_text().splitlines()


def tokens_to_text(tokens, units: list[str]) -> str:
    if not units:
        return " ".join(str(int(t)) for t in tokens)
    return " ".join(units[int(t)] if 0 <= int(t) < len(units) else "<unk>"
                    for t in tokens)
