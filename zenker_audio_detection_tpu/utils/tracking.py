"""Experiment tracking (reference observability stack is W&B, SURVEY §5.5).

`Run` is a W&B-shaped tracker (init/log/log_image/log_table/log_artifact/
summary/finish) that always writes locally (config.json + metrics.jsonl +
media/ + tables/ + artifacts/ + summary.json under <dir>/<run_id>/) and
mirrors to the real `wandb` package when it is installed and not disabled —
so the reference's W&B workflow (scalar metrics, confusion-matrix plots,
classification-report tables, config artifacts, per-fold runs + a summary
run; src/train_ast_stage1_cross_validation.py:163-185,564-637,824-864,
922-941) keeps working where wandb exists, and everything stays inspectable
where it doesn't (this environment has no wandb and no network).
"""

from __future__ import annotations

import json
import os
import shutil
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
                 offline: bool = False, entity: str | None = None):
        self.run_id = name or datetime.now().strftime("%Y%m%d_%H%M%S")
        self.dir = os.path.join(dir, self.run_id)
        os.makedirs(self.dir, exist_ok=True)
        self.config = dict(config or {})
        self._summary: dict[str, Any] = {}
        self._metrics_path = os.path.join(self.dir, "metrics.jsonl")
        # fresh history per run: a rerun under the same name replaces the
        # previous run's files wholesale (last-run-wins, like config.json /
        # summary.json below) instead of appending mixed metric streams —
        # including media/tables/artifacts, or a rerun with different fold
        # counts / table names would leave the old run's files mixed in
        open(self._metrics_path, "w").close()
        for sub in ("media", "tables", "artifacts"):
            shutil.rmtree(os.path.join(self.dir, sub), ignore_errors=True)
        with open(os.path.join(self.dir, "config.json"), "w") as f:
            json.dump(self.config, f, indent=2, default=str)

        self._wandb = _wandb_or_none(offline) if use_wandb else None
        self._wandb_run = None
        if self._wandb is not None:
            try:
                self._wandb_run = self._wandb.init(
                    project=project, entity=entity, name=name, group=group,
                    config=config, reinit=True)
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

    def log_image(self, name: str, path: str) -> None:
        """Register an image file (e.g. a confusion-matrix plot): copied to
        <run>/media/ and mirrored as a wandb.Image (reference CM plots,
        src/train_ast_stage1_cross_validation.py:564-605)."""
        import shutil

        dest = os.path.join(self.dir, "media",
                            f"{name}{os.path.splitext(path)[1]}")
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.copy2(path, dest)
        if self._wandb_run is not None:
            try:
                self._wandb_run.log({name: self._wandb.Image(dest)})
            except Exception as exc:
                print(f"[tracking][WARN] wandb image log failed: {exc}")

    def log_table(self, name: str, columns: list[str],
                  rows: list[list]) -> None:
        """Tabular payload (e.g. a classification report): JSON locally,
        wandb.Table in the mirror (reference report tables, :607-637)."""
        dest = os.path.join(self.dir, "tables", f"{name}.json")
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        with open(dest, "w") as f:
            json.dump({"columns": columns, "rows": rows}, f, indent=2,
                      default=str)
        if self._wandb_run is not None:
            try:
                self._wandb_run.log(
                    {name: self._wandb.Table(columns=columns, data=rows)})
            except Exception as exc:
                print(f"[tracking][WARN] wandb table log failed: {exc}")

    def log_artifact(self, path: str, name: str | None = None,
                     type: str = "config") -> None:
        """File artifact (e.g. the run-config snapshot): copied to
        <run>/artifacts/ and mirrored as a wandb.Artifact (reference
        config-artifact upload, :163-185)."""
        import shutil

        arts = os.path.join(self.dir, "artifacts")
        os.makedirs(arts, exist_ok=True)
        name = name or os.path.basename(path)
        shutil.copy2(path, os.path.join(arts, name))
        if self._wandb_run is not None:
            try:
                art = self._wandb.Artifact(name=name.replace(".", "-"),
                                           type=type)
                art.add_file(path)
                self._wandb_run.log_artifact(art)
            except Exception as exc:
                print(f"[tracking][WARN] wandb artifact failed: {exc}")

    def summary(self, **kwargs) -> None:
        self._summary.update(kwargs)

    def finish(self) -> None:
        with open(os.path.join(self.dir, "summary.json"), "w") as f:
            json.dump(self._summary, f, indent=2, default=float)
        if self._wandb_run is not None:
            for k, v in self._summary.items():
                self._wandb_run.summary[k] = v
            self._wandb_run.finish()
