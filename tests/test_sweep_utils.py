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


def test_sample_parameters_malformed_specs_raise_typed():
    """Hand-edited YAML mistakes must name the parameter, not surface as
    numpy internals (KeyError 'min', OverflowError on log(0), 'high <= 0'
    from an empty choice list)."""
    rng = np.random.default_rng(0)
    bad = [
        {"lr": {"distribution": "uniform", "max": 1.0}},          # no min
        {"lr": {"distribution": "log_uniform_values",
                "min": 0, "max": 1e-2}},                          # log(0)
        {"lr": {"distribution": "log_uniform_values",
                "min": -1e-3, "max": 1e-2}},                      # log(<0)
        {"lr": {"values": []}},                                   # empty
        {"lr": {"values": 3}},                                    # scalar
        {"lr": {"distribution": "uniform", "min": 2.0, "max": 1.0}},
        {"lr": {"distribution": "uniform", "min": "a", "max": 1.0}},
        {"lr": {"distribution": "uniform", "min": float("nan"),
                "max": 1.0}},
    ]
    for spec in bad:
        with pytest.raises(ValueError, match="'lr'"):
            S.sample_parameters(spec, rng)
    # boundary sanity: min == max is legal and degenerate, not an error
    got = S.sample_parameters(
        {"lr": {"distribution": "log_uniform_values",
                "min": 1e-3, "max": 1e-3}}, rng)
    assert got["lr"] == pytest.approx(1e-3)


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
        return {f"fold{fold}_val_eval_f1": f1, f"fold{fold}_test_eval_f1": f1}

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


def test_run_sweep_rejects_unknown_parameters(tmp_path):
    """A parameter outside _PARAM_MAP would be sampled and RECORDED but
    silently dropped from the trial config — reject the config up front."""
    import yaml

    from zenker_audio_detection_tpu.train import loop as train_loop

    p = tmp_path / "bad.yaml"
    p.write_text(yaml.safe_dump({
        "method": "random",
        "metric": {"name": "eval_f1", "goal": "maximize"},
        "parameters": {"fold": {"values": [1]},
                       "focal-alpha": {"distribution": "uniform",
                                       "min": 0.1, "max": 0.9}}}))
    with pytest.raises(ValueError, match="focal-alpha"):
        S.run_sweep(str(p), train_loop.TrainFoldConfig(), count=1,
                    output_dir=str(tmp_path / "sw"))

    bad_goal = tmp_path / "bad_goal.yaml"
    bad_goal.write_text(yaml.safe_dump({
        "method": "random",
        "metric": {"name": "eval_f1", "goal": "maximise"},
        "parameters": {"fold": {"values": [1]}}}))
    with pytest.raises(ValueError, match="goal"):
        S.run_sweep(str(bad_goal), train_loop.TrainFoldConfig(), count=1,
                    output_dir=str(tmp_path / "sw2"))

    # `parameters:` written as a YAML list of names must be rejected with
    # a message, not an AttributeError from the num-epochs probe
    bad_params = tmp_path / "bad_params.yaml"
    bad_params.write_text(yaml.safe_dump({
        "method": "random", "parameters": ["fold", "learning-rate"]}))
    with pytest.raises(ValueError, match="mapping"):
        S.run_sweep(str(bad_params), train_loop.TrainFoldConfig(), count=1,
                    output_dir=str(tmp_path / "sw3"))

    # a scalar num-epochs spec dies at the epoch probe BEFORE sampling —
    # needs its own typed error
    bad_ne = tmp_path / "bad_ne.yaml"
    bad_ne.write_text(yaml.safe_dump({
        "method": "random",
        "parameters": {"fold": {"values": [1]}, "num-epochs": 4}}))
    with pytest.raises(ValueError, match="num-epochs"):
        S.run_sweep(str(bad_ne), train_loop.TrainFoldConfig(), count=1,
                    output_dir=str(tmp_path / "sw4"))


def test_run_sweep_goal_defaults_to_minimize(tmp_path, monkeypatch):
    """W&B's documented default goal is minimize: a goal-less eval_loss
    objective must track the LOWEST value as best (defaulting to maximize
    would invert the optimization)."""
    import yaml

    from zenker_audio_detection_tpu.train import loop as train_loop

    losses = [0.9, 0.2, 0.5]
    calls = []

    def fake_train_fold(fold, cfg):
        calls.append(1)
        return {f"fold{fold}_val_eval_loss": losses[len(calls) - 1]}

    monkeypatch.setattr(train_loop, "train_fold", fake_train_fold)
    p = tmp_path / "s.yaml"
    p.write_text(yaml.safe_dump({
        "method": "random",
        "metric": {"name": "eval_loss"},  # goal omitted
        "parameters": {"fold": {"values": [1]},
                       "learning-rate": {"distribution": "uniform",
                                         "min": 1e-5, "max": 1e-4}}}))
    base = train_loop.TrainFoldConfig(stage="stage1", data_dir="unused",
                                      output_root=str(tmp_path))
    out = S.run_sweep(str(p), base, count=3, output_dir=str(tmp_path / "sw"))
    assert len(calls) == 3
    assert out["best"]["value"] == pytest.approx(0.2)


def test_run_sweep_no_metric_block_maximizes_default_f1(tmp_path,
                                                        monkeypatch):
    """With NO metric block, the objective name eval_f1 is OUR default —
    pairing it with W&B's minimize default would be self-inconsistent, so
    the metric-absent case maximizes."""
    import yaml

    from zenker_audio_detection_tpu.train import loop as train_loop

    f1s = [0.4, 0.9, 0.6]
    calls = []

    def fake_train_fold(fold, cfg):
        calls.append(1)
        return {f"fold{fold}_val_eval_f1": f1s[len(calls) - 1]}

    monkeypatch.setattr(train_loop, "train_fold", fake_train_fold)
    p = tmp_path / "s.yaml"
    p.write_text(yaml.safe_dump({
        "method": "random",
        "parameters": {"fold": {"values": [1]},
                       "learning-rate": {"distribution": "uniform",
                                         "min": 1e-5, "max": 1e-4}}}))
    base = train_loop.TrainFoldConfig(stage="stage1", data_dir="unused",
                                      output_root=str(tmp_path))
    out = S.run_sweep(str(p), base, count=3, output_dir=str(tmp_path / "sw"))
    assert out["best"]["value"] == pytest.approx(0.9)


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


def _read_tb_scalars(logdir):
    """Parse TensorBoard event files into {tag: [(step, value), ...]}."""
    import os

    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader,
    )
    from tensorboard.util import tensor_util

    out = {}
    for fn in sorted(os.listdir(logdir)):
        if "tfevents" not in fn:
            continue
        for ev in EventFileLoader(os.path.join(logdir, fn)).Load():
            for val in ev.summary.value:
                v = float(tensor_util.make_ndarray(val.tensor)) \
                    if val.HasField("tensor") else val.simple_value
                out.setdefault(val.tag, []).append((ev.step, v))
    return out


def test_tracking_tensorboard_events(tmp_path):
    """Scalar metrics are mirrored as TensorBoard event files under
    <run>/logs/ (reference HF Trainer logging_dir + logging_steps=20,
    src/train_ast_stage1_cross_validation.py:478,490-491): the per-step
    loss channel must be recoverable from the event file at its HF global
    step, non-scalar values skipped, summary written at finish."""
    run = tracking.Run("proj", name="tb1", dir=str(tmp_path),
                       use_wandb=False)
    # the trainer's per-step loss channel shape (no explicit step arg:
    # train_step is the HF global step)
    run.log({"fold": 1, "train_step": 20, "train_step_loss": 0.5})
    run.log({"fold": 1, "train_step": 40, "train_step_loss": 0.25})
    # per-epoch record: auto-step, strings skipped
    run.log({"fold": 1, "epoch": 1, "eval_f1": 0.9, "note": "text"})
    run.summary(best_f1=0.9)
    run.finish()
    scalars = _read_tb_scalars(str(tmp_path / "tb1" / "logs"))
    assert scalars["train_step_loss"] == [(20, 0.5), (40, 0.25)]
    assert [v for _, v in scalars["eval_f1"]] == [pytest.approx(0.9)]
    assert scalars["eval_f1"][0][0] >= 41  # auto-step stays monotonic
    assert "note" not in scalars
    assert [v for _, v in scalars["summary/best_f1"]] == [pytest.approx(0.9)]


def test_tracking_tensorboard_shared_run_fold_restart(tmp_path):
    """Shared-run CV mode: folds 2+ restart train_step at 1; TB event
    steps must stay monotonic (fall back to auto-step) instead of
    rewriting fold 1's points under the same tag."""
    run = tracking.Run("proj", name="tb2", dir=str(tmp_path),
                       use_wandb=False)
    run.log({"fold": 1, "train_step": 20, "train_step_loss": 0.5})
    run.log({"fold": 1, "train_step": 40, "train_step_loss": 0.25})
    run.log({"fold": 2, "train_step": 20, "train_step_loss": 0.75})
    run.finish()
    scalars = _read_tb_scalars(str(tmp_path / "tb2" / "logs"))
    steps = [s for s, _ in scalars["train_step_loss"]]
    assert steps == sorted(set(steps)), steps  # strictly monotonic
    assert scalars["train_step_loss"][:2] == [(20, 0.5), (40, 0.25)]
    assert scalars["train_step_loss"][2][1] == pytest.approx(0.75)


def test_tracking_tensorboard_disabled(tmp_path):
    run = tracking.Run("proj", name="tb0", dir=str(tmp_path),
                       use_wandb=False, use_tensorboard=False)
    run.log({"x": 1.0}, step=1)
    run.finish()
    assert not (tmp_path / "tb0" / "logs").exists()


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
        return {f"fold{fold}_val_eval_f1": 0.8,
                f"fold{fold}_test_eval_f1": 0.75,
                f"fold{fold}_test_eval_accuracy": 0.7}

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
    assert payload["test_eval_f1"] == pytest.approx(0.75)  # dup test_* keys
    assert payload["test_eval_accuracy"] == pytest.approx(0.7)


def test_log_uniform_legacy_log_space_bounds():
    """W&B legacy 'log_uniform' takes LOG-space min/max (exp(U(min,max)));
    'log_uniform_values' takes value-space bounds. Both must land in
    [1e-5, 1e-4] for equivalent specs."""
    from zenker_audio_detection_tpu.tune import sweep as S

    rng = np.random.default_rng(0)
    legacy = {"lr": {"distribution": "log_uniform",
                     "min": float(np.log(1e-5)), "max": float(np.log(1e-4))}}
    values = {"lr": {"distribution": "log_uniform_values",
                     "min": 1e-5, "max": 1e-4}}
    for spec in (legacy, values):
        for _ in range(20):
            v = S.sample_parameters(spec, rng)["lr"]
            assert 1e-5 <= v <= 1e-4, (spec, v)


def test_objective_resolution_and_goal():
    from zenker_audio_detection_tpu.tune import sweep as S

    metrics = {"fold3_val_eval_f1": 0.8, "fold3_val_eval_loss": 0.4,
               "fold3_test_eval_f1": 0.7}
    assert S._objective_value(metrics, 3, "eval_f1") == 0.8
    assert S._objective_value(metrics, 3, "eval_loss") == 0.4
    assert S._objective_value(metrics, 3, "test_f1") == 0.7
    with pytest.raises(ValueError, match="not found"):
        S._objective_value(metrics, 3, "eval_auroc")
    # no-val fallback (HF eval loop falls back to the test split)
    assert S._objective_value({"fold1_test_during_train_eval_f1": 0.5}, 1,
                              "eval_f1") == 0.5
    assert S.epoch_metric_key("eval_loss") == "loss"
    with pytest.raises(ValueError, match="unsupported"):
        S.epoch_metric_key("eval_auroc")


def test_hyperband_cut_honors_metric_and_goal():
    from zenker_audio_detection_tpu.tune import sweep as S

    cut = S.HyperbandCut([2], goal="minimize", metric_key="loss")
    cbs = [cut.callback() for _ in range(3)]
    assert cbs[0](2, {"loss": 0.5, "f1": 0.0}) is False   # first at rung
    assert cbs[1](2, {"loss": 0.3, "f1": 0.0}) is False   # below median
    assert cbs[2](2, {"loss": 0.9, "f1": 0.0}) is True    # worse (higher)


def test_rungs_from_pinned_num_epochs(tmp_path):
    """A num-epochs pinned in the sweep parameters drives the rung
    schedule; a SWEPT num-epochs with hyperband is rejected."""
    import yaml

    from zenker_audio_detection_tpu.tune import sweep as S
    from zenker_audio_detection_tpu.train import loop as L

    base = L.TrainFoldConfig(num_epochs=10)

    def write(params):
        p = tmp_path / "s.yaml"
        p.write_text(yaml.safe_dump({
            "method": "random", "metric": {"name": "eval_f1",
                                           "goal": "maximize"},
            "early_terminate": {"type": "hyperband", "min_iter": 3,
                                "eta": 2, "s": 2},
            "parameters": params}))
        return str(p)

    # pinned 20 epochs -> rung at 12 exists (would be dropped under the
    # base config's 10)
    path = write({"fold": {"values": [1]},
                  "num-epochs": {"values": [20]},
                  "learning-rate": {"distribution": "uniform",
                                    "min": 1e-5, "max": 1e-4}})
    sweep = S.load_sweep_config(path)
    assert S.hyperband_rungs(sweep["early_terminate"], 20) == [3, 6, 12]

    with pytest.raises(ValueError, match="SWEPT num-epochs"):
        S.run_sweep(write({"fold": {"values": [1]},
                           "num-epochs": {"values": [5, 10]}}),
                    base, count=0)
