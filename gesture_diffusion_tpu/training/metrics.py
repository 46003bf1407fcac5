"""Run metrics logging.

The reference's observability backbone is wandb (SURVEY.md §5).  This
environment has no network, so the primary sink is an append-only JSONL
file with wandb-compatible keys (``train/*`` every ``log_step_gap`` steps,
``val/*`` per epoch, ``test/*`` from eval) plus run-id persistence for
resume.  If the ``wandb`` package is importable the same records are
mirrored to it.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any, Dict, Optional

import numpy as np


def generate_run_id() -> str:
    return uuid.uuid4().hex[:8]


class MetricsLogger:
    def __init__(self, log_dir: str, run_id: Optional[str] = None,
                 config: Optional[dict] = None):
        os.makedirs(log_dir, exist_ok=True)
        self.run_id = run_id or generate_run_id()
        self.path = os.path.join(log_dir, f"metrics_{self.run_id}.jsonl")
        self._wandb = None
        try:  # optional mirror
            import wandb  # noqa: F401

            self._wandb = wandb
        except Exception:
            pass
        if config is not None:
            with open(os.path.join(log_dir, f"run_{self.run_id}.config.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)

    def log(self, record: Dict[str, Any], step: Optional[int] = None) -> None:
        def scalarize(v):
            # float() only on actual scalars: numpy/jax arrays define
            # __float__ regardless of size, and float(size>1 array) raises
            # mid-epoch; vectors serialize as lists instead
            if hasattr(v, "size") and getattr(v, "size", 1) != 1:
                return np.asarray(v).tolist()
            return float(v) if hasattr(v, "__float__") else v

        rec = {k: scalarize(v) for k, v in record.items()}
        rec["_time"] = time.time()
        if step is not None:
            rec["_step"] = int(step)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._wandb is not None and getattr(self._wandb, "run", None):
            self._wandb.log(record, step=step)

    def read_all(self):
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]
