"""Tests for the sweep agent, tracking, and profiling utilities."""

import json
from pathlib import Path

import numpy as np
import pytest

from zenker_audio_detection_tpu.tune import sweep as S
from zenker_audio_detection_tpu.utils import profiling, tracking

REPO = Path(__file__).resolve().parent.parent


def test_sample_parameters_distributions():
    cfg = S.load_sweep_config(str(REPO / "sweeps" /
                                  "sweep_stage2_comprehensive.yaml"))
    rng = np.random.default_rng(0)
    samples = [S.sample_parameters(cfg["parameters"], rng)
               for _ in range(200)]
    lr = np.array([s["learning-rate"] for s in samples])
    assert lr.min() >= 1e-5 and lr.max() <= 1e-4
    # log-uniform: roughly half the mass below the geometric mean
    assert 0.3 < np.mean(lr < np.sqrt(1e-5 * 1e-4)) < 0.7
    ls = np.array([s["label-smoothing"] for s in samples])
    assert ls.min() >= 0 and ls.max() <= 0.15
    assert all(s["fold"] == 3 for s in samples)
    assert "wandb-group" not in samples[0]


def test_hyperband_rungs():
    et = {"type": "hyperband", "min_iter": 3, "eta": 2, "s": 2}
    assert S.hyperband_rungs(et, max_epochs=10) == [3, 6]
    assert S.hyperband_rungs(et, max_epochs=20) == [3, 6, 12]
    assert S.hyperband_rungs(None, 10) == []


def test_hyperband_cut_median():
    cutter = S.HyperbandCut([3], "maximize")
    cb1 = cutter.callback()
    assert cb1(3, {"f1": 0.8}) is False  # first trial never cut
    cb2 = cutter.callback()
    assert cb2(3, {"f1": 0.9}) is False  # fewer than 2 priors
    cb3 = cutter.callback()
    assert cb3(3, {"f1": 0.5}) is True  # below median(0.8, 0.9)
    cb4 = cutter.callback()
    assert cb4(2, {"f1": 0.0}) is False  # not a rung epoch


def test_run_sweep_tiny(tmp_path, monkeypatch):
    """Two trials over a stubbed train_fold: verifies sampling, JSONL
    logging, and best-config tracking without real training."""
    from zenker_audio_detection_tpu.train import loop as train_loop

    calls = []

    def fake_train_fold(fold, cfg):
        calls.append((fold, cfg.learning_rate))
        f1 = 0.5 + 0.1 * len(calls)
        return {f"fold{fold}_val_f1": f1, f"fold{fold}_test_f1": f1}

    monkeypatch.setattr(train_loop, "train_fold", fake_train_fold)
    base = train_loop.TrainFoldConfig(stage="stage1", data_dir="unused",
                                      output_root=str(tmp_path))
    out = S.run_sweep(str(REPO / "sweeps" / "sweep_stage1_comprehensive.yaml"),
                      base, count=2, output_dir=str(tmp_path / "sw"))
    assert len(out["results"]) == 2
    assert out["best"]["value"] == pytest.approx(0.7)
    lines = (tmp_path / "sw" / "sweep_results.jsonl").read_text().splitlines()
    assert len(lines) == 2
    best = json.loads((tmp_path / "sw" / "best_config.json").read_text())
    assert best["trial"] == 1
    assert all(f == 3 for f, _ in calls)


def test_tracking_run(tmp_path):
    run = tracking.Run("proj", name="r1", config={"lr": 1e-4},
                       dir=str(tmp_path), use_wandb=False)
    run.log({"f1": 0.5}, step=1)
    run.log({"f1": 0.7}, step=2)
    run.summary(best_f1=0.7)
    run.finish()
    d = tmp_path / "r1"
    assert json.loads((d / "config.json").read_text())["lr"] == 1e-4
    lines = (d / "metrics.jsonl").read_text().splitlines()
    assert len(lines) == 2 and json.loads(lines[1])["f1"] == 0.7
    assert json.loads((d / "summary.json").read_text())["best_f1"] == 0.7


def test_throughput_counter():
    tp = profiling.Throughput("windows")
    with tp.measure(100):
        pass
    assert tp.items == 100
    assert tp.rate() > 0
    assert "windows" in tp.report()


def test_trace_noop():
    with profiling.trace(None):
        x = 1
    assert x == 1


def test_tracking_media_table_artifact(tmp_path):
    """The reference's non-scalar W&B channels (CM plots, report tables,
    config artifacts; src/train_ast_stage1_cross_validation.py:163-185,
    564-637) have local-first equivalents."""
    import numpy as np

    run = tracking.Run("proj", name="r2", dir=str(tmp_path), use_wandb=False)
    png = tmp_path / "cm.png"
    png.write_bytes(b"\x89PNG\r\n\x1a\nfake")
    run.log_image("fold1_test_confusion_matrix", str(png))
    run.log_table("fold1_report", ["class", "f1"], [["Idle", 0.9]])
    cfgf = tmp_path / "run_config.json"
    cfgf.write_text('{"lr": 1}')
    run.log_artifact(str(cfgf))
    run.finish()
    d = tmp_path / "r2"
    assert (d / "media" / "fold1_test_confusion_matrix.png").exists()
    table = json.loads((d / "tables" / "fold1_report.json").read_text())
    assert table["columns"] == ["class", "f1"]
    assert table["rows"] == [["Idle", 0.9]]
    assert (d / "artifacts" / "run_config.json").read_text() == '{"lr": 1}'


def test_sweep_reuses_active_wandb_run(tmp_path, monkeypatch):
    """W&B agent interop: a pre-existing wandb.run is REUSED (no init), its
    config updated with the sampled params, and the objective logged with
    duplicated test_* keys (reference
    src/train_ast_stage2_cross_validation.py:595-597,901-917)."""
    import sys
    import types

    from zenker_audio_detection_tpu.train import loop as train_loop

    class FakeConfig(dict):
        def update(self, d, allow_val_change=False):
            dict.update(self, d)

    class FakeRun:
        def __init__(self):
            self.config = FakeConfig()
            self.logged = []
            self.finished = False

        def log(self, payload, step=None):
            self.logged.append(payload)

        def finish(self):
            self.finished = True

    fake_run = FakeRun()
    fake_wandb = types.ModuleType("wandb")
    fake_wandb.run = fake_run
    monkeypatch.setitem(sys.modules, "wandb", fake_wandb)

    def fake_train_fold(fold, cfg):
        return {f"fold{fold}_val_f1": 0.8, f"fold{fold}_test_f1": 0.75,
                f"fold{fold}_test_accuracy": 0.7}

    monkeypatch.setattr(train_loop, "train_fold", fake_train_fold)
    base = train_loop.TrainFoldConfig(stage="stage1", data_dir="unused",
                                      output_root=str(tmp_path))
    S.run_sweep(str(REPO / "sweeps" / "sweep_stage1_comprehensive.yaml"),
                base, count=1, output_dir=str(tmp_path / "sw"))
    assert not fake_run.finished  # reused, never closed by the agent
    assert "learning-rate" in fake_run.config  # sampled params recorded
    assert len(fake_run.logged) == 1
    payload = fake_run.logged[0]
    assert payload["eval_f1"] == pytest.approx(0.8)  # sweep objective
    assert payload["test_f1"] == pytest.approx(0.75)  # duplicate test_* keys
    assert payload["test_accuracy"] == pytest.approx(0.7)
