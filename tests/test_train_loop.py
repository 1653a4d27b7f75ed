"""End-to-end tests for the fine-tuning loop on a tiny synthetic task.

Class 0 = quiet noise, class 1 = loud tone: separable enough that even a
tiny random-init AST learns it in a few epochs, proving the full loop
(featurize -> train step -> eval -> best selection -> HF export) works.
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from zenker_audio_detection_tpu.audio import io as aio
from zenker_audio_detection_tpu.models import ast as ast_mod, convert
from zenker_audio_detection_tpu.train import loop as L


def tiny_pretrained_dir(tmp_path):
    """A small random 'pretrained' HF model dir (527-class head like
    AudioSet, so head re-init is exercised)."""
    import jax

    cfg = ast_mod.ASTConfig(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=4, intermediate_size=64,
                            num_labels=527)
    params = ast_mod.init_params(jax.random.PRNGKey(7), cfg)
    d = tmp_path / "pretrained"
    convert.save_hf_model_dir(params, cfg, str(d))
    return str(d)


def make_dataset(tmp_path, rng, n_per_class=8, fold=1, val=True):
    d = tmp_path / "data"
    d.mkdir(exist_ok=True)

    def clip(label, i):
        # quiet vs loud broadband noise: big constant log-mel shift, so the
        # tiny random-init model separates it within a few epochs
        w = rng.standard_normal(16000) * (0.002 if label == 0 else 0.5)
        p = tmp_path / f"wav_f{fold}" / ("Healthy" if label else "Idle") / f"P{label}{i:02d}"
        p.mkdir(parents=True, exist_ok=True)
        fp = p / f"c{i}.wav"
        aio.write_wav(str(fp), w.astype(np.float32), 16000, dtype="float32")
        return str(fp)

    def split(name, n):
        xs, ys = [], []
        for i in range(n):
            for label in (0, 1):
                xs.append(clip(label, i + hash(name) % 50))
                ys.append(label)
        np.save(d / f"{name}_x_fold{fold}.npy", np.asarray(xs, object))
        np.save(d / f"{name}_y_fold{fold}.npy", np.asarray(ys))

    split("train", n_per_class)
    split("test", 3)
    if val:
        split("val", 3)
    return str(d)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    import jax.numpy as jnp

    tmp_path = tmp_path_factory.mktemp("train")
    rng = np.random.default_rng(0)
    data_dir = make_dataset(tmp_path, rng)
    cfg = L.TrainFoldConfig(
        stage="stage1",
        data_dir=data_dir,
        output_root=str(tmp_path / "runs/stage1"),
        pretrained_model_dir=tiny_pretrained_dir(tmp_path),
        num_epochs=10,
        batch_size=4,
        learning_rate=1e-3,
        enable_early_stopping=False,
        augment=False,
        dtype=jnp.float32,
    )
    result = L.run_cross_validation([1], cfg)
    return tmp_path, cfg, result


def test_training_learns(trained):
    _, _, result = trained
    agg = result["aggregate"]
    assert agg["eval_f1_mean"] > 0.8, agg
    assert agg["eval_accuracy_mean"] > 0.8, agg


def test_artifact_contract(trained):
    tmp_path, cfg, _ = trained
    fold_dir = Path(cfg.output_root) / "fold1"
    best = fold_dir / "best"
    assert (best / "model.safetensors").exists()
    assert (best / "config.json").exists()
    assert (best / "preprocessor_config.json").exists()
    mean, std = L.load_feature_extractor_config(str(best))
    assert std > 0
    assert (best / "evaluation_test" / "confusion_matrix.npy").exists()
    assert (best / "evaluation_val" / "classification_report.txt").exists()
    assert (fold_dir / "run_config.json").exists()
    assert (fold_dir / "history.json").exists()
    assert (Path(cfg.output_root) / "cv_metrics.npy").exists()
    assert (Path(cfg.output_root) / "cv_metrics.txt").exists()
    # checkpoint limit respected
    cks = [p for p in fold_dir.iterdir() if p.name.startswith("checkpoint-")]
    assert 1 <= len(cks) <= max(2, (cfg.num_epochs + 1) // 2)


def test_best_dir_loads_in_hf(trained):
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")

    tmp_path, cfg, _ = trained
    best = str(Path(cfg.output_root) / "fold1" / "best")
    model = transformers.ASTForAudioClassification.from_pretrained(best).eval()
    assert model.config.num_labels == 2
    assert model.config.id2label == {0: "Idle", 1: "Swallow"}
    fx = transformers.ASTFeatureExtractor.from_pretrained(best)
    assert fx.mean != -4.2677393  # per-fold stats, not AudioSet default

    # logits agree between HF reload and our params
    params, mcfg = convert.load_hf_model_dir(best)
    x = np.random.default_rng(1).standard_normal(
        (2, mcfg.max_length, mcfg.num_mel_bins)).astype(np.float32)
    ours = np.asarray(ast_mod.forward(params, x, mcfg))
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).logits.numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_backup_run_dir(tmp_path):
    d = tmp_path / "fold1"
    d.mkdir()
    (d / "old.txt").write_text("x")
    backup = L.backup_existing_run_dir(str(d))
    assert backup and Path(backup).exists()
    assert (Path(backup) / "old.txt").read_text() == "x"
    assert L.backup_existing_run_dir(str(tmp_path / "nope")) is None


def test_dry_run_fast(tmp_path):
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    data_dir = make_dataset(tmp_path, rng, n_per_class=4, val=False)
    cfg = L.TrainFoldConfig(
        stage="stage2",
        data_dir=data_dir,
        output_root=str(tmp_path / "runs/stage2"),
        pretrained_model_dir=tiny_pretrained_dir(tmp_path),
        dry_run=True,
        use_class_weights=True,
        focal_gamma=2.0,
        label_smoothing=0.1,
        augment=True,
        dtype=jnp.float32,
    )
    m = L.train_fold(1, cfg)
    assert any(k.startswith("fold1_test_") for k in m)
    # dry run: no CM dirs, checkpoint limit 1
    fold_dir = Path(cfg.output_root) / "fold1"
    assert not (fold_dir / "best" / "evaluation_test").exists()
    cks = [p for p in fold_dir.iterdir() if p.name.startswith("checkpoint-")]
    assert len(cks) == 1


def test_per_fold_tracking_runs(tmp_path):
    """--wandb-per-fold equivalent: one tracking run per fold (grouped) +
    a cv_summary run, with CM plots / report tables / config artifacts
    (reference src/train_ast_stage1_cross_validation.py:824-864,922-941)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    data_dir = make_dataset(tmp_path, rng, n_per_class=4)
    out = tmp_path / "runs_pf"
    cfg = L.TrainFoldConfig(
        stage="stage1", data_dir=data_dir, output_root=str(out),
        pretrained_model_dir=tiny_pretrained_dir(tmp_path),
        num_epochs=2, batch_size=4, learning_rate=1e-3,
        enable_early_stopping=False, augment=False, dtype=jnp.float32,
        logging_steps=1)
    L.run_cross_validation([1], cfg, tracking_opts={"enabled": False,
                                                    "per_fold": True})
    tracking_dir = out / "tracking"
    run_dirs = sorted(p.name for p in tracking_dir.iterdir())
    assert any(d.endswith("_fold1") for d in run_dirs), run_dirs
    assert any(d.endswith("_cv_summary") for d in run_dirs), run_dirs
    fold_run = next(p for p in tracking_dir.iterdir()
                    if p.name.endswith("_fold1"))
    # per-epoch scalars + per-step loss channel (reference logging_steps)
    records = [json.loads(ln) for ln in
               (fold_run / "metrics.jsonl").read_text().splitlines()]
    assert any(r.get("epoch") == 1 and "eval_f1" in r for r in records)
    step_recs = [r for r in records if "train_step_loss" in r]
    assert step_recs and step_recs[0]["train_step"] == 1
    # TensorBoard mirror: event files under <run>/logs with the same
    # per-step loss points at their HF global steps
    from test_sweep_utils import _read_tb_scalars
    tb = _read_tb_scalars(str(fold_run / "logs"))
    assert [s for s, _ in tb["train_step_loss"]] == \
        [r["train_step"] for r in step_recs]
    assert tb["train_step_loss"][0][1] == pytest.approx(
        step_recs[0]["train_step_loss"])
    assert "eval_f1" in tb
    # CM plot + report table + config artifact channels
    media = list((fold_run / "media").glob("*confusion_matrix*"))
    assert media, "no CM plot logged"
    tables = list((fold_run / "tables").glob("*classification_report*"))
    assert tables
    table = json.loads(tables[0].read_text())
    assert table["columns"][0] == "class"
    assert {r[0] for r in table["rows"]} >= {"Idle", "Swallow"}
    assert any((fold_run / "artifacts").glob("run_config*"))
    # fold summary + cv summary
    assert "fold1_test_eval_f1" in json.loads(
        (fold_run / "summary.json").read_text())
    summary_run = next(p for p in tracking_dir.iterdir()
                       if p.name.endswith("_cv_summary"))
    assert "eval_f1_mean" in json.loads(
        (summary_run / "summary.json").read_text())


def test_streaming_matches_eager(tmp_path):
    """TrainFoldConfig.streaming featurizes per batch with background
    prefetch; training metrics must be IDENTICAL to eager featurization
    (same per-example augmentation seeds, same batches)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    data_dir = make_dataset(tmp_path, rng, n_per_class=4)

    def run(streaming, tag):
        cfg = L.TrainFoldConfig(
            stage="stage1", data_dir=data_dir,
            output_root=str(tmp_path / f"runs_{tag}"),
            pretrained_model_dir=tiny_pretrained_dir(tmp_path),
            num_epochs=2, batch_size=4, learning_rate=1e-3,
            enable_early_stopping=False, augment=True,  # augment exercised!
            dtype=jnp.float32, streaming=streaming)
        return L.train_fold(1, cfg)

    eager = run(False, "eager")
    stream = run(True, "stream")
    assert set(eager) == set(stream)
    for k, v in eager.items():
        if "runtime" in k or "per_second" in k:
            continue  # wall-clock speed metrics differ run to run
        assert abs(v - stream[k]) < 1e-6, (k, v, stream[k])


def test_feature_stream_gather_matches_eager_rows():
    """gather(idx) returns exactly the rows eager featurization produces,
    for any batch composition, repeatedly (epoch-stable)."""
    rng = np.random.default_rng(1)
    entries = [rng.standard_normal(16000).astype(np.float32)
               for _ in range(6)]
    eager = L.featurize_paths(entries, -1.1, 3.5,
                              np.random.default_rng(42), max_frames=128)
    stream = L.FeatureStream(entries, -1.1, 3.5,
                             np.random.default_rng(42), max_frames=128)
    for idx in ([3, 0, 5], [1, 2], [3, 0, 5]):  # repeat: same result
        got = stream.gather(np.asarray(idx))
        np.testing.assert_array_equal(got, eager[np.asarray(idx)])
    # prefetch path returns the same rows
    stream.prefetch(np.asarray([4, 1]))
    np.testing.assert_array_equal(stream.gather(np.asarray([4, 1])),
                                  eager[[4, 1]])
    stream.close()
