"""Orbax checkpointing of the sharded train state (+EMA).

TPU-native counterpart of Lightning's ModelCheckpoint(save_last=True) +
EMA state round-trip (training_pipeline_ip.py:82-100, ema_callback.py:
291-377) and `resume_checkpoint: "last"` resolution (:30-51). Orbax writes
asynchronously so checkpointing overlaps the next train steps — the
preemption-tolerance mechanism the reference lacks (SURVEY.md §5).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str | Path, max_to_keep: int = 3,
                 save_interval_steps: int = 1):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
            enable_async_checkpointing=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        return self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint found in {self.directory}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def resolve_resume_path(resume: Optional[str], ckpt_root: str | Path) -> Optional[Path]:
    """Reference semantics: a path, or the literal "last" → newest checkpoint
    (training_pipeline_ip.py:30-51)."""
    if not resume:
        return None
    if resume == "last":
        root = Path(ckpt_root)
        if not root.exists():
            raise FileNotFoundError(f"No checkpoint directory at {root}")
        return root
    p = Path(resume)
    if not p.exists():
        raise FileNotFoundError(f"Checkpoint not found: {p}")
    return p
