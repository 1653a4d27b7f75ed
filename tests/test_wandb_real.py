"""Pin the tracker's wandb mirror against the REAL wandb client in offline
mode (VERDICT r4 missing #2: the mirror surface was only ever tested
against fakes — a schema drift in how we call `wandb.init/log/Image/
Table/Artifact` would go unnoticed until a user ran with wandb installed).

Skips when wandb is not installed (this image has none); wherever it IS
installed these run with WANDB_MODE=offline (no network) and parse the
offline run directory the real client writes. Reference anchor for the
mirrored surface: src/train_ast_stage1_cross_validation.py:789-835
(init/config/log), :564-637 (CM images + report tables), :922-941
(summary + artifacts).
"""

import glob
import json
import os

import numpy as np
import pytest

wandb = pytest.importorskip("wandb")


@pytest.fixture()
def offline_env(tmp_path, monkeypatch):
    # the real client honors WANDB_DIR for where the offline run lands
    monkeypatch.setenv("WANDB_MODE", "offline")
    monkeypatch.setenv("WANDB_DIR", str(tmp_path))
    monkeypatch.setenv("WANDB_SILENT", "true")
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _offline_run_files(root):
    runs = sorted(glob.glob(os.path.join(str(root), "wandb",
                                         "offline-run-*", "files")))
    assert runs, "real wandb client created no offline run directory"
    return runs[-1]


def test_mirror_surface_against_real_client(offline_env, tmp_path):
    """Drive every mirror call the trainers use through utils.tracking.Run
    with the REAL client underneath, then assert the offline payloads the
    client persisted carry our config/metrics/media/table/summary."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from zenker_audio_detection_tpu.utils.tracking import Run

    img = tmp_path / "cm.png"
    fig = plt.figure()
    plt.imshow(np.eye(2))
    fig.savefig(img)
    plt.close(fig)
    art = tmp_path / "run_config.json"
    art.write_text(json.dumps({"fold": 1}))

    run = Run("zenker-stage1", name="fold1-real-wandb",
              config={"learning_rate": 1e-5, "fold": 1},
              dir=str(tmp_path / "tracking"), offline=True)
    assert run._wandb_run is not None, \
        "real wandb installed but the mirror did not attach to it"
    run.log({"train_loss": 0.5, "eval_f1": 0.25}, step=1)
    run.log({"train_loss": 0.25, "eval_f1": 0.5}, step=2)
    run.log_image("fold1/confusion_matrix", str(img))
    run.log_table("fold1/confusion_matrix_counts",
                  ["class", "Idle", "Swallow"],
                  [["Idle", 3, 1], ["Swallow", 0, 4]])
    run.log_artifact(str(art), name="run_config.json")
    run.summary(best_f1=0.5)
    run.finish()

    files = _offline_run_files(offline_env)

    # config: the real client serializes init(config=...) to config.yaml
    cfg_text = open(os.path.join(files, "config.yaml")).read()
    assert "learning_rate" in cfg_text and "fold" in cfg_text

    # summary: finish() flushed our summary keys into wandb-summary.json
    summary = json.load(open(os.path.join(files, "wandb-summary.json")))
    assert summary["best_f1"] == 0.5
    # the last logged scalars also land in the summary (client behavior
    # the reference dashboards rely on)
    assert summary["train_loss"] == 0.25

    # media: wandb.Image(path) persisted the CM png under files/media
    media = glob.glob(os.path.join(files, "media", "images", "**", "*.png"),
                      recursive=True)
    assert media, "logged wandb.Image left no media file in the offline run"

    # table: wandb.Table persisted as a media/table json payload with our
    # exact columns/rows
    tables = glob.glob(os.path.join(files, "media", "table", "**",
                                    "*.json"), recursive=True)
    assert tables, "logged wandb.Table left no table payload"
    payload = json.load(open(tables[0]))
    assert payload["columns"] == ["class", "Idle", "Swallow"]
    assert ["Idle", 3, 1] in payload["data"]


def test_trainer_fold_with_real_client(offline_env, tmp_path):
    """One REAL trainer fold with --wandb and the actual client offline:
    the trainer's mirrored stream (per-epoch metrics, fold CM image,
    report table) must produce a parseable offline run."""
    from zenker_audio_detection_tpu.analysis import drift_bench
    from zenker_audio_detection_tpu.cli import (compute_stats,
                                                prepare_training_data,
                                                prepare_two_stage,
                                                train_stage1)

    short, _ = drift_bench.build_workflow_corpus(str(tmp_path))
    pre = drift_bench.build_pretrained(str(tmp_path))
    prepare_training_data.main(["--dataset-root", short])
    prepare_two_stage.main(["--val-ratio", "0.25"])
    compute_stats.main(["--stage", "stage1", "--folds", "1"])
    train_stage1.main(["--fold", "1", "--num-epochs", "2",
                       "--batch-size", "8", "--learning-rate", "1e-2",
                       "--no-augment", "--f32", "--no-early-stopping",
                       "--pretrained-model-dir", pre,
                       "--wandb", "--wandb-offline"])

    files = _offline_run_files(offline_env)
    summary = json.load(open(os.path.join(files, "wandb-summary.json")))
    # per-epoch eval metrics flowed through the real client
    assert any(k.startswith("eval") or k.endswith("f1") for k in summary), \
        summary
