"""Grain-backed input pipeline (SURVEY.md section 7.1 step 3: host-side
Grain feeding fixed-shape padded batches).

Wraps the bucketed batch plan of tpuasr.data.loader.AudioLoader in a
``grain.MapDataset`` so epochs get Grain's worker prefetching and a
checkpointable iterator (deterministic resume mid-epoch — the rebuild's
answer to SURVEY.md section 5's failure-recovery row at the data layer).

Falls back cleanly if grain is unavailable (GRAIN_AVAILABLE gate).
"""

from __future__ import annotations

try:
    import grain.python as grain
    GRAIN_AVAILABLE = True
except Exception:          # pragma: no cover
    grain = None
    GRAIN_AVAILABLE = False

from tpuasr.data.loader import AudioLoader


class GrainAudioPipeline:
    """Checkpointable Grain iterator over an AudioLoader's batch plan.

    iter_epoch(epoch) yields the same fixed-shape batches as the plain
    loader; get_state()/set_state() capture the mid-epoch cursor.
    """

    def __init__(self, loader: AudioLoader, num_workers: int = 0,
                 prefetch: int = 2):
        if not GRAIN_AVAILABLE:
            raise RuntimeError("grain is not installed")
        self.loader = loader
        self.num_workers = num_workers
        self.prefetch = prefetch
        self._iter = None
        self._epoch = None

    def _dataset(self, epoch: int):
        plan = self.loader.batch_plan(epoch)
        ds = grain.MapDataset.source(plan)
        ds = ds.map(self.loader.make_batch)
        return ds

    def iter_epoch(self, epoch: int):
        ds = self._dataset(epoch).to_iter_dataset()
        if self.num_workers > 0:
            ds = ds.mp_prefetch(
                grain.MultiprocessingOptions(num_workers=self.num_workers))
        self._iter = iter(ds)
        self._epoch = epoch
        return self._iter

    # -- mid-epoch checkpointing --

    def get_state(self) -> dict:
        if self._iter is None:
            return {"epoch": 0, "it": None}
        return {"epoch": self._epoch, "it": self._iter.get_state()}

    def set_state(self, state: dict):
        self.iter_epoch(state.get("epoch", 0))
        if state.get("it") is not None:
            self._iter.set_state(state["it"])
        return self._iter
