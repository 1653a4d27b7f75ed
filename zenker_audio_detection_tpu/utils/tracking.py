"""Experiment tracking (reference observability stack is W&B, SURVEY §5.5).

`Run` is a minimal W&B-shaped tracker (init/log/summary/finish) that always
writes locally (config.json + metrics.jsonl + summary.json under
<dir>/<run_id>/) and mirrors to the real `wandb` package when it is
installed and not disabled — so the reference's W&B workflow keeps working
where wandb exists, and everything stays inspectable where it doesn't
(this environment has no wandb and no network).
"""

from __future__ import annotations

import json
import os
import time
from datetime import datetime
from typing import Any


def _wandb_or_none(offline: bool):
    try:
        import wandb  # noqa: F401

        if offline:
            os.environ.setdefault("WANDB_MODE", "offline")
        return wandb
    except ImportError:
        return None


class Run:
    def __init__(self, project: str, name: str | None = None,
                 config: dict | None = None, group: str | None = None,
                 dir: str = "runs/tracking", use_wandb: bool = True,
                 offline: bool = False):
        self.run_id = name or datetime.now().strftime("%Y%m%d_%H%M%S")
        self.dir = os.path.join(dir, self.run_id)
        os.makedirs(self.dir, exist_ok=True)
        self.config = dict(config or {})
        self._summary: dict[str, Any] = {}
        self._metrics_path = os.path.join(self.dir, "metrics.jsonl")
        with open(os.path.join(self.dir, "config.json"), "w") as f:
            json.dump(self.config, f, indent=2, default=str)

        self._wandb = _wandb_or_none(offline) if use_wandb else None
        self._wandb_run = None
        if self._wandb is not None:
            try:
                self._wandb_run = self._wandb.init(
                    project=project, name=name, group=group, config=config,
                    reinit=True)
            except Exception as exc:  # network/auth failures degrade politely
                print(f"[tracking][WARN] wandb init failed: {exc}")
                self._wandb_run = None

    def log(self, metrics: dict, step: int | None = None) -> None:
        rec = {"_time": time.time(), **metrics}
        if step is not None:
            rec["_step"] = step
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(rec, default=float) + "\n")
        if self._wandb_run is not None:
            self._wandb_run.log(metrics, step=step)

    def summary(self, **kwargs) -> None:
        self._summary.update(kwargs)

    def finish(self) -> None:
        with open(os.path.join(self.dir, "summary.json"), "w") as f:
            json.dump(self._summary, f, indent=2, default=float)
        if self._wandb_run is not None:
            for k, v in self._summary.items():
                self._wandb_run.summary[k] = v
            self._wandb_run.finish()
