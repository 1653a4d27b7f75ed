"""End-to-end tests for the sweep CLI and the all-folds batch driver."""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from test_train_loop import make_dataset, tiny_pretrained_dir

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def test_sweep_cli_two_trials(tmp_path, monkeypatch, rng):
    from zenker_audio_detection_tpu.cli import sweep as sweep_cli

    data_dir = make_dataset(tmp_path, rng, n_per_class=4, val=True)
    pretrained = tiny_pretrained_dir(tmp_path)
    monkeypatch.chdir(tmp_path)

    # sweep yaml pinned to fold 1 (the tiny dataset has one fold)
    cfg = (REPO / "sweeps" / "sweep_stage1_comprehensive.yaml").read_text()
    (tmp_path / "sweep.yaml").write_text(cfg.replace("values: [3]",
                                                     "values: [1]"))
    sweep_cli.main([
        str(tmp_path / "sweep.yaml"), "--stage", "stage1", "--count", "2",
        "--data-dir", data_dir, "--pretrained-model-dir", pretrained,
        "--num-epochs", "1", "--batch-size", "8", "--no-augment", "--f32",
        "--output-dir", str(tmp_path / "sw")])

    lines = (tmp_path / "sw" / "sweep_results.jsonl").read_text().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["fold"] == 1 and "learning-rate" in rec["params"]
    best = json.loads((tmp_path / "sw" / "best_config.json").read_text())
    assert best["value"] == max(json.loads(ln)["value"] for ln in lines)


def test_sweep_cli_grad_accum(tmp_path, monkeypatch, rng, capsys):
    """--grad-accum flows into sequential sweep trials (and is rejected
    with --parallel-trials, which shares one data batch per step)."""
    from zenker_audio_detection_tpu.cli import sweep as sweep_cli

    data_dir = make_dataset(tmp_path, rng, n_per_class=4, val=True)
    pretrained = tiny_pretrained_dir(tmp_path)
    monkeypatch.chdir(tmp_path)
    cfg = (REPO / "sweeps" / "sweep_stage1_comprehensive.yaml").read_text()
    (tmp_path / "sweep.yaml").write_text(cfg.replace("values: [3]",
                                                     "values: [1]"))
    sweep_cli.main([
        str(tmp_path / "sweep.yaml"), "--stage", "stage1", "--count", "1",
        "--data-dir", data_dir, "--pretrained-model-dir", pretrained,
        "--num-epochs", "1", "--batch-size", "4", "--grad-accum", "2",
        "--no-augment", "--f32", "--output-dir", str(tmp_path / "swga")])
    assert "[GradAccum] 2 micro-batches of 4" in capsys.readouterr().out
    lines = (tmp_path / "swga"
             / "sweep_results.jsonl").read_text().splitlines()
    assert len(lines) == 1

    with pytest.raises(SystemExit, match="parallel-trials"):
        sweep_cli.main([str(tmp_path / "sweep.yaml"), "--stage", "stage1",
                        "--grad-accum", "2", "--parallel-trials"])


def test_sweep_cli_stage2_objective_defaults(tmp_path, monkeypatch):
    """A stage-2 sweep whose YAML doesn't sweep focal-gamma/label-smoothing
    must train with the stage-2 trainer-CLI defaults (2.0/0.1), so the
    reported best config reproduces under zenker-train-stage2."""
    import yaml

    from zenker_audio_detection_tpu.cli import sweep as sweep_cli
    from zenker_audio_detection_tpu.cli.sweep import sweep_mod

    captured = {}

    def fake_run_sweep(path, base, **kw):
        captured["base"] = base
        return {"results": [], "best": None}

    monkeypatch.setattr(sweep_mod, "run_sweep", fake_run_sweep)
    p = tmp_path / "s.yaml"
    p.write_text(yaml.safe_dump({
        "method": "random", "metric": {"name": "eval_f1",
                                       "goal": "maximize"},
        "parameters": {"fold": {"values": [1]},
                       "learning-rate": {"distribution": "uniform",
                                         "min": 1e-5, "max": 1e-4}}}))
    sweep_cli.main([str(p), "--stage", "stage2", "--count", "1"])
    assert captured["base"].focal_gamma == 2.0
    assert captured["base"].label_smoothing == 0.1
    assert captured["base"].use_class_weights is True

    sweep_cli.main([str(p), "--stage", "stage1", "--count", "1"])
    assert captured["base"].focal_gamma == 0.0
    assert captured["base"].label_smoothing == 0.0


def test_run_all_folds_dry_run(tmp_path, monkeypatch, capsys):
    from zenker_audio_detection_tpu.cli import run_all_folds

    monkeypatch.chdir(tmp_path)
    ids_root = tmp_path / "data_ast_stage2"
    ids_root.mkdir()
    for fold in (1, 2):
        (ids_root / f"test_ids_fold{fold}.txt").write_text(
            f"Zenker/Z0{fold}\nHealthy/H0{fold}\n")
    (tmp_path / "Long").mkdir()

    run_all_folds.main(["runs", "--long-audio-root", str(tmp_path / "Long"),
                        "--ids-root", str(ids_root), "--num-folds", "2",
                        "--dry-run", "--no-threshold-config"])
    out = capsys.readouterr().out
    assert out.count("[DRY-RUN]") == 4  # 2 folds x 2 patients
    assert "Fold 1" in out and "Fold 2" in out


def test_run_all_folds_forwards_pattern_and_plot(tmp_path, monkeypatch):
    """The reference wrapper passes --pattern and --plot to every per-fold
    batch run (src/run_all_folds_simple_batch.sh:26,86-87,118); ours must
    forward both (plot as an explicit flag rather than the wrapper's
    edit-the-script default)."""
    from zenker_audio_detection_tpu.cli import run_all_folds, run_batch_2stage

    monkeypatch.chdir(tmp_path)
    ids_root = tmp_path / "data_ast_stage2"
    ids_root.mkdir()
    (ids_root / "test_ids_fold1.txt").write_text("Zenker/Z01\n")

    seen = []
    monkeypatch.setattr(run_batch_2stage, "main",
                        lambda argv, **kw: seen.append(list(argv)) or
                        {"done": 0, "failed": 0, "skipped": 0})
    run_all_folds.main(["runs", "--long-audio-root", "Long",
                        "--ids-root", str(ids_root), "--num-folds", "1",
                        "--no-threshold-config",
                        "--pattern", "rec_*.wav", "--plot"])
    (argv,) = seen
    assert argv[argv.index("--pattern") + 1] == "rec_*.wav"
    assert "--plot" in argv

    seen.clear()
    run_all_folds.main(["runs", "--long-audio-root", "Long",
                        "--ids-root", str(ids_root), "--num-folds", "1",
                        "--no-threshold-config"])
    (argv,) = seen
    assert argv[argv.index("--pattern") + 1] == "*.wav"  # wrapper default
    assert "--plot" not in argv  # plots are opt-in here


def test_run_all_folds_auto_threshold_detection(tmp_path, monkeypatch, capsys):
    from zenker_audio_detection_tpu.cli import run_all_folds

    monkeypatch.chdir(tmp_path)
    ids_root = tmp_path / "data_ast_stage2"
    ids_root.mkdir()
    (ids_root / "test_ids_fold1.txt").write_text("Zenker/Z01\n")
    model_dir = tmp_path / "runs"
    model_dir.mkdir()
    (model_dir / "optimal_thresholds_per_fold_both_stages.json").write_text(
        json.dumps({"folds": {"1": {"stage2": {"threshold": 0.42},
                                    "stage1": {"threshold": 0.61}}}}))
    run_all_folds.main([str(model_dir), "--long-audio-root", "Long",
                        "--ids-root", str(ids_root), "--num-folds", "1",
                        "--dry-run"])
    out = capsys.readouterr().out
    assert "auto-using" in out
    assert "stage2 <- 0.42" in out and "stage1 <- 0.61" in out


def test_run_all_folds_parallel_matches_sequential(tmp_path, monkeypatch):
    """--parallel-folds (one fold-resident engine per device, threaded)
    produces byte-identical per-patient JSONs to the sequential loop."""
    import jax

    from zenker_audio_detection_tpu.audio import io as aio
    from zenker_audio_detection_tpu.cli import run_all_folds
    from zenker_audio_detection_tpu.models import ast as ast_mod, convert
    from zenker_audio_detection_tpu.train import loop as L

    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(9)
    cfg = ast_mod.ASTConfig(hidden_size=16, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=32,
                            num_labels=2)
    ids_root = tmp_path / "data_ast_stage2"
    ids_root.mkdir()
    long_root = tmp_path / "Long"
    for fold in (1, 2):
        for stage, seed, labels in [
                ("stage1", fold, {0: "Idle", 1: "Swallow"}),
                ("stage2", 10 + fold, {0: "Healthy", 1: "Zenker"})]:
            d = tmp_path / "runs" / f"ast_classifier_{stage}" / \
                f"fold{fold}" / "best"
            params = ast_mod.init_params(jax.random.PRNGKey(seed), cfg)
            convert.save_hf_model_dir(params, cfg, str(d), labels)
            L.save_feature_extractor_config(str(d), -1.15, 3.53)
        pid = f"ZP{fold}"
        (ids_root / f"test_ids_fold{fold}.txt").write_text(
            f"Zenker/{pid}\n")
        pdir = long_root / "Zenker" / pid
        pdir.mkdir(parents=True)
        for fn in ("recA.wav", "recB.wav"):
            aio.write_wav(str(pdir / fn),
                          (rng.standard_normal(16000 * 3) * 0.3
                           ).astype(np.float32), 16000, dtype="float32")

    common = ["runs", "--long-audio-root", str(long_root),
              "--num-folds", "2", "--f32", "--no-threshold-config"]
    run_all_folds.main(common + ["--output-dir", str(tmp_path / "out_seq"),
                                 "--aggregate"])
    run_all_folds.main(common + ["--output-dir", str(tmp_path / "out_par"),
                                 "--parallel-folds"])

    # fold-group serving: each fold's engine shards window chunks across
    # its own 2-device group (run_all_folds --data-per-fold); numerics
    # must still be byte-identical
    run_all_folds.main(common + ["--output-dir", str(tmp_path / "out_fd"),
                                 "--parallel-folds", "--data-per-fold",
                                 "2"])

    for fold in (1, 2):
        seq = json.loads((tmp_path / "out_seq"
                          / f"ZP{fold}_2stage.json").read_text())
        par = json.loads((tmp_path / "out_par"
                          / f"ZP{fold}_2stage.json").read_text())
        fd = json.loads((tmp_path / "out_fd"
                         / f"ZP{fold}_2stage.json").read_text())
        assert seq["per_file"] == par["per_file"]
        assert seq["aggregate"] == par["aggregate"]
        assert seq["per_file"] == fd["per_file"]
        assert seq["aggregate"] == fd["aggregate"]

    # --aggregate chains the patient-level aggregator (the reference's
    # manual step) over the finished output dir
    agg = json.loads((tmp_path / "out_seq"
                      / "aggregate_summary.json").read_text())
    assert agg["summary"]["num_patient_results"] == 2
    assert (tmp_path / "out_seq" / "per_patient_results.csv").exists()


def test_run_all_folds_parallel_failed_fold_still_aggregates(tmp_path,
                                                             monkeypatch,
                                                             capsys):
    """A failed fold in --parallel-folds must not discard the completed
    folds: --aggregate still runs over them (sequential-path semantics),
    and the driver exits nonzero AFTERWARDS."""
    from zenker_audio_detection_tpu.cli import (run_all_folds,
                                                run_batch_2stage)

    monkeypatch.chdir(tmp_path)
    out_dir = tmp_path / "out"
    out_dir.mkdir()

    def fake_main(argv, mesh=None):
        fold = int(argv[argv.index("--fold") + 1])
        if fold == 2:
            raise RuntimeError("boom")
        (out_dir / f"ZP{fold}_2stage.json").write_text(json.dumps({
            "aggregate": {
                "overall_zenker_ratio_over_swallow": 0.8,
                "files_used": [f"Long/Zenker/ZP{fold}/recA.wav"],
            }}))
        return {"failed": 0}

    monkeypatch.setattr(run_batch_2stage, "main", fake_main)
    # files the aggregator skips must be ACCOUNTED for in the summary
    (out_dir / "batch_fold1_2stage.json").write_text("{}")
    (out_dir / "truncated_2stage.json").write_text('{"aggregate": ')
    with pytest.raises(SystemExit, match=r"folds failed: \[2\]"):
        run_all_folds.main(["runs", "--long-audio-root", "x",
                            "--num-folds", "2", "--no-threshold-config",
                            "--output-dir", str(out_dir),
                            "--parallel-folds", "--aggregate"])
    agg = json.loads((out_dir / "aggregate_summary.json").read_text())
    assert agg["summary"]["num_patient_results"] == 1
    # reference-exact num_files_found (ALL glob matches) reconciles via
    # the additive skip counters
    assert agg["summary"]["num_files_found"] == 3
    assert agg["summary"]["skipped_batch_summaries"] == 1
    assert agg["summary"]["skipped_parse_errors"] == 1
    assert "FAILED" in capsys.readouterr().out


def test_run_all_folds_parallel_rejects_window_sharding(tmp_path,
                                                        monkeypatch):
    from zenker_audio_detection_tpu.cli import run_all_folds

    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit, match="incompatible"):
        run_all_folds.main(["runs", "--long-audio-root", "x",
                            "--parallel-folds", "--num-devices", "2"])


def test_default_device_is_thread_local():
    """--parallel-folds relies on jax.default_device being thread-local:
    each fold thread must commit its engine's params to its own chip."""
    import threading

    import jax
    import jax.numpy as jnp

    devices = jax.devices()[:2]
    placed = {}

    def place(i):
        with jax.default_device(devices[i]):
            placed[i] = jnp.ones(4).device

    threads = [threading.Thread(target=place, args=(i,)) for i in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert placed[0] == devices[0] and placed[1] == devices[1]
