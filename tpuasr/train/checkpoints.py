"""Checkpoint save/restore with the reference's --continue-from semantics
(reference: torch.save({model, optimizer, epoch}) per epoch + --continue-from
<ckpt>, SURVEY.md section 5). Serialization via flax msgpack (host-portable,
no framework-version pickle hazards); Orbax can be layered on later for async
multi-host saves."""

from __future__ import annotations

import json
import re
from pathlib import Path

import flax.serialization
import jax


def save_checkpoint(ckpt_dir, state, step: int, keep: int = 5,
                    meta: dict | None = None) -> Path:
    """state: any pytree (e.g. TrainState). Returns the checkpoint path."""
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    state = jax.device_get(state)
    path = ckpt_dir / f"ckpt_{step:08d}.msgpack"
    path.write_bytes(flax.serialization.to_bytes(state))
    if meta is not None:
        (ckpt_dir / f"ckpt_{step:08d}.json").write_text(json.dumps(meta))
    # Prune old checkpoints.
    ckpts = sorted(ckpt_dir.glob("ckpt_*.msgpack"))
    for old in ckpts[:-keep]:
        old.unlink(missing_ok=True)
        old.with_suffix(".json").unlink(missing_ok=True)
    return path


def latest_checkpoint(ckpt_dir) -> Path | None:
    ckpts = sorted(Path(ckpt_dir).glob("ckpt_*.msgpack"))
    return ckpts[-1] if ckpts else None


def restore_checkpoint(path, target):
    """Restore into the structure of `target` (a template pytree)."""
    path = Path(path)
    if path.is_dir():
        found = latest_checkpoint(path)
        if found is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
        path = found
    state = flax.serialization.from_bytes(target, path.read_bytes())
    meta_path = path.with_suffix(".json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return state, meta


def load_for_inference(path) -> tuple[dict, dict]:
    """Load a checkpoint WITHOUT a template: returns ({'params',
    'batch_stats'}, meta). Used by predict/test CLIs which don't know the
    optimizer structure."""
    path = Path(path)
    if path.is_dir():
        found = latest_checkpoint(path)
        if found is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
        path = found
    raw = flax.serialization.msgpack_restore(path.read_bytes())
    meta_path = path.with_suffix(".json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    variables = {"params": raw["params"]}
    if raw.get("batch_stats"):
        variables["batch_stats"] = raw["batch_stats"]
    # Place on device ONCE: msgpack restores numpy arrays, and numpy leaves
    # passed as jit arguments re-upload through the axon tunnel on every
    # call (measured ~600 ms per streaming tick before this).
    import jax

    return jax.device_put(variables), meta


def checkpoint_step(path) -> int:
    m = re.search(r"ckpt_(\d+)\.msgpack$", str(path))
    return int(m.group(1)) if m else -1


# ---- optional Orbax backend (async-capable, multi-host-aware) --------------
# The default msgpack path above is dependency-light and what the CLIs use;
# OrbaxCheckpointer offers the same save/restore contract on Orbax for
# deployments that want async saves and multi-host coordination
# (SURVEY.md section 5 checkpoint row).


class OrbaxCheckpointer:
    def __init__(self, ckpt_dir, keep: int = 5):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.dir = Path(ckpt_dir).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.dir, options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True))

    def save(self, state, step: int, meta: dict | None = None) -> None:
        args = self._ocp.args.Composite(
            state=self._ocp.args.StandardSave(jax.device_get(state)),
            **({"meta": self._ocp.args.JsonSave(meta)} if meta else {}))
        self.manager.save(step, args=args)

    def restore(self, target, step: int | None = None):
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no orbax checkpoints under {self.dir}")
        restored = self.manager.restore(
            step, args=self._ocp.args.Composite(
                state=self._ocp.args.StandardRestore(
                    jax.device_get(target))))
        return restored["state"], step

    def wait(self):
        self.manager.wait_until_finished()
