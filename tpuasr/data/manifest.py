"""JSON-lines manifests describing a corpus (reference kept Kaldi-style
wav.scp/text files produced by asr/datasets/<corpus>/prepare [M]; the rebuild
uses one JSONL manifest per split with the same information).

Each line: {"id": str, "wav": path, "tokens": [int, ...], "text": str,
"num_samples": int, "sample_rate": int}
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path


@dataclasses.dataclass
class Utterance:
    id: str
    wav: str
    tokens: list[int]
    text: str = ""
    num_samples: int = 0
    sample_rate: int = 8000
    # Optional time-aligned segments for frame-wise training (reference's
    # CapsNet/SSVAE usage): [[token, start_sample, end_sample], ...]
    segments: list = dataclasses.field(default_factory=list)

    @property
    def duration(self) -> float:
        return self.num_samples / max(self.sample_rate, 1)


def write_manifest(path: str | Path, utts: list[Utterance]) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for u in utts:
            f.write(json.dumps(dataclasses.asdict(u)) + "\n")


def read_manifest(path: str | Path) -> list[Utterance]:
    utts = []
    base = Path(path).parent
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            # Relative wav paths resolve against the manifest location.
            if not os.path.isabs(d["wav"]):
                d["wav"] = str(base / d["wav"])
            utts.append(Utterance(**d))
    return utts


def load_wav(path: str) -> tuple:
    """Read a wav file -> (float32 array in [-1, 1], sample_rate).

    scipy-based (no soundfile/torchaudio in-env; SURVEY.md section 2.2 maps
    the reference's torchaudio/sox IO to host-side scipy decode).
    """
    import numpy as np
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data.mean(axis=1)
    return data, sr
