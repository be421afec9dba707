"""Metric logging: JSONL always; Weights & Biases when available/configured.

The reference logs everything to W&B (SURVEY.md §5 observability). In this
environment wandb may be absent or offline-only — the logger degrades to
JSONL without changing call sites.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional


class MetricLogger:
    def __init__(self, jsonl_path: str | Path, wandb_cfg: Optional[Dict] = None):
        self.path = Path(jsonl_path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a")
        self._wandb = None
        if wandb_cfg and wandb_cfg.get("project"):
            try:
                import wandb

                self._wandb = wandb.init(
                    project=wandb_cfg.get("project"),
                    group=wandb_cfg.get("group"),
                    name=wandb_cfg.get("run_name"),
                    id=wandb_cfg.get("run_id"),
                    resume="allow" if wandb_cfg.get("run_id") else None,
                    mode="offline" if wandb_cfg.get("offline", True) else "online",
                )
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict[str, Any]) -> None:
        rec = {"ts": time.time(), **metrics}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            try:
                self._wandb.log(metrics)
            except Exception:
                pass

    def close(self) -> None:
        self._fh.close()
        if self._wandb is not None:
            try:
                self._wandb.finish()
            except Exception:
                pass
