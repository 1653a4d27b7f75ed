"""Executed-reference differentials for the two SNIPPET EVALUATORS
(src/test_trained_model_stage{1,2}_cv.py) — the last two reference scripts
that had never run here (they need `evaluate`, `datasets` audio decode and
the MIT extractor hub lookup; tests/refstubs.py provides all three).

Both evaluators run as subprocesses on IDENTICAL assets (tiny
head-amplified models exported by our converter, shared fold npys, stats
JSONs, class_mapping.json), then our `zenker-test-stage{1,2}` CLI runs
in-process (f32) on the same assets. Every persisted artifact is compared:
per-fold y_true/y_pred/confusion_matrix (exact), classification reports
(text-equal), the summed cv_aggregate_evaluation, and the central results
reports. Prediction stability is asserted up front: every torch prob must
sit >5e-3 away from 0.5 so the ≤2e-4 torch-vs-JAX prob difference cannot
flip an argmax.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import refstubs

REF_SRC = Path("/root/reference/src")
REF_EVAL = {1: REF_SRC / "test_trained_model_stage1_cv.py",
            2: REF_SRC / "test_trained_model_stage2_cv.py"}
pytestmark = pytest.mark.skipif(not REF_EVAL[1].exists(),
                                reason="reference not mounted")

NUM_FOLDS = 2
MEAN, STD = -4.27, 4.57

DRIVER = '''\
"""Run the actual reference snippet evaluator with its module-level path
constants redirected (they derive from the read-only script location)."""
import os, sys

ref, data_dir, project_root = sys.argv[1:4]
g = {"__file__": ref, "__name__": "ref_eval"}
with open(ref) as f:
    exec(compile(f.read(), ref, "exec"), g)
g["DATA_DIR"] = data_dir
g["PROJECT_ROOT"] = project_root
g["NUM_FOLDS"] = int(os.environ["REF_NUM_FOLDS"])
sys.argv = ["ref_eval"] + sys.argv[4:]
g["main"]()
'''


def _build_assets(tmp_path: Path, stage: int):
    """Fold npys (2 folds), stats JSONs, class_mapping.json and per-fold
    head-amplified tiny model dirs shared by both evaluators."""
    import torch
    from transformers import ASTConfig as HFASTConfig
    from transformers import ASTFeatureExtractor, ASTForAudioClassification

    from zenker_audio_detection_tpu.audio import io as aio
    from zenker_audio_detection_tpu.models import convert
    from zenker_audio_detection_tpu.train.loop import \
        save_feature_extractor_config

    rng = np.random.default_rng(100 + stage)
    data = tmp_path / "data"
    wavs = tmp_path / "wavs"
    model_root = tmp_path / "runs"
    data.mkdir()
    wavs.mkdir()

    # amplitude-staircase clips: a raw random-init AST is nearly
    # input-insensitive at the pooled output, so diversity must come from
    # wide amplitude structure + the 400x head amplification below
    t = np.arange(16000) / 16000.0
    clips = []
    for i in range(NUM_FOLDS * 10):
        x = (0.05 * rng.standard_normal(16000)
             + 0.1 * np.sin(2 * np.pi * 300 * t))
        for s in range(0, 16000, 4000):
            x[s:s + 4000] *= float(rng.choice([0.02, 0.3, 1.0, 4.0, 8.0]))
        p = wavs / f"clip{i}.wav"
        aio.write_wav(str(p), x.astype(np.float32), 16000)
        clips.append(str(p))

    labels_map = ({0: "Idle", 1: "Swallow"} if stage == 1
                  else {0: "Healthy", 1: "Zenker"})
    per_fold_stats = []
    for fold in range(1, NUM_FOLDS + 1):
        xs = clips[(fold - 1) * 10: fold * 10]
        ys = rng.integers(0, 2, size=10)
        np.save(data / f"test_x_fold{fold}.npy", np.array(xs))
        np.save(data / f"test_y_fold{fold}.npy", ys)
        # per-fold stats deliberately differ from the aggregate so the
        # --use-aggregate-stats path change is observable
        per_fold_stats.append({"fold": fold, "mean": MEAN + 0.2 * fold,
                               "std": STD, "count": 50})

        torch.manual_seed(stage * 10 + fold)
        hf_cfg = HFASTConfig(hidden_size=32, num_hidden_layers=2,
                             num_attention_heads=4, intermediate_size=64,
                             num_labels=2)
        m = ASTForAudioClassification(hf_cfg).eval()
        fx = ASTFeatureExtractor(mean=per_fold_stats[-1]["mean"], std=STD)
        with torch.no_grad():
            m.classifier.dense.weight *= 400.0
            wav_arrays = [np.asarray(aio.read_wav(p)[0]) for p in xs]
            feats = fx(wav_arrays, sampling_rate=16000,
                       return_tensors="pt")["input_values"]
            logits = m(feats).logits
            m.classifier.dense.bias[1] -= (logits[:, 1]
                                           - logits[:, 0]).mean()
            probs = torch.softmax(m(feats).logits, dim=1)[:, 1].numpy()
        # argmax stability: torch-vs-JAX probs differ <=2e-4 in f32
        assert np.abs(probs - 0.5).min() > 5e-3, (fold, probs)
        assert (probs > 0.5).any() and (probs < 0.5).any(), (fold, probs)

        cfg = convert.config_from_hf_dict(
            hf_cfg.to_dict() | {"id2label": labels_map})
        params = convert.from_hf_state_dict(m.state_dict(), cfg)
        d = model_root / f"fold{fold}" / "best"
        convert.save_hf_model_dir(params, cfg, str(d))
        save_feature_extractor_config(str(d), per_fold_stats[-1]["mean"],
                                      STD)

    with open(data / "stats_per_fold.json", "w") as f:
        json.dump(per_fold_stats, f)
    with open(data / "stats_aggregate.json", "w") as f:
        json.dump({"mean": MEAN - 0.15, "std": STD + 0.1,
                   "total_count": 100}, f)
    with open(data / "class_mapping.json", "w") as f:
        json.dump({v: k for k, v in labels_map.items()}, f)
    return data, model_root


def _run_reference(tmp_path: Path, stage: int, data: Path, model_root: Path,
                   extra):
    stub_dir = refstubs.write_stub_tree(tmp_path / "stubs")
    hf_home = tmp_path / "hf"
    refstubs.seed_tiny_hf_cache(hf_home)
    driver = tmp_path / "eval_driver.py"
    driver.write_text(DRIVER)
    project_root = tmp_path / "ref_project"
    project_root.mkdir(exist_ok=True)
    env = dict(os.environ)
    env.update(HF_HOME=str(hf_home), HF_HUB_OFFLINE="1",
               TRANSFORMERS_OFFLINE="1", REF_NUM_FOLDS=str(NUM_FOLDS),
               PYTHONPATH=str(stub_dir), WANDB_DISABLED="true")
    r = subprocess.run(
        [sys.executable, str(driver), str(REF_EVAL[stage]), str(data),
         str(project_root), "--model-root", str(model_root),
         "--class-mapping-path", str(data / "class_mapping.json"), *extra],
        env=env, capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    return project_root


def _compare_fold_dirs(ref_best: Path, our_best: Path):
    for name in ("y_true.npy", "y_pred.npy", "confusion_matrix.npy"):
        np.testing.assert_array_equal(
            np.load(ref_best / "evaluation" / name),
            np.load(our_best / "evaluation" / name), err_msg=name)
    assert ((ref_best / "evaluation" / "classification_report.txt")
            .read_text().strip()
            == (our_best / "evaluation" / "classification_report.txt")
            .read_text().strip())


@pytest.mark.slow
@pytest.mark.parametrize("stage", [1, 2])
def test_snippet_eval_all_folds_vs_executed_reference(tmp_path, stage):
    from zenker_audio_detection_tpu.cli import test_stage1, test_stage2

    data, model_root = _build_assets(tmp_path, stage)
    # the reference writes evaluation/ INTO the model dirs — give each side
    # its own copy so the artifacts can't cross-contaminate
    import shutil
    ref_models = tmp_path / "ref_models"
    shutil.copytree(model_root, ref_models)

    project_root = _run_reference(tmp_path, stage, data, ref_models,
                                  ["--all"])

    our_central = tmp_path / "our_central"
    cli = test_stage1 if stage == 1 else test_stage2
    cli.main(["--all", "--num-folds", str(NUM_FOLDS),
              "--data-dir", str(data), "--model-root", str(model_root),
              "--results-dir", str(our_central / f"stage{stage}"),
              "--class-mapping-path", str(data / "class_mapping.json"),
              "--f32"])

    # predictions did vary across clips (the fixture is non-vacuous)
    preds = np.concatenate([
        np.load(model_root / f"fold{f}" / "best" / "evaluation"
                / "y_pred.npy") for f in range(1, NUM_FOLDS + 1)])
    assert len(set(preds.tolist())) == 2, preds

    for fold in range(1, NUM_FOLDS + 1):
        _compare_fold_dirs(ref_models / f"fold{fold}" / "best",
                           model_root / f"fold{fold}" / "best")
        # central per-fold reports (ref: PROJECT_ROOT/results/stage{N})
        ref_rep = (project_root / "results" / f"stage{stage}"
                   / f"fold{fold}_classification_report.txt")
        our_rep = (our_central / f"stage{stage}"
                   / f"fold{fold}_classification_report.txt")
        assert ref_rep.read_text().strip() == our_rep.read_text().strip()

    # summed aggregate CM + report (what the CM plotter consumes)
    np.testing.assert_array_equal(
        np.load(ref_models / "cv_aggregate_evaluation"
                / "confusion_matrix.npy"),
        np.load(model_root / "cv_aggregate_evaluation"
                / "confusion_matrix.npy"))
    assert ((ref_models / "cv_aggregate_evaluation"
             / "classification_report.txt").read_text().strip()
            == (model_root / "cv_aggregate_evaluation"
                / "classification_report.txt").read_text().strip())
    # aggregate central report goes INSIDE the custom model root (reference
    # --model-root branch, test_trained_model_stage1_cv.py:330-343)
    ref_agg_central = (ref_models / "results" / f"stage{stage}"
                       / "aggregate_classification_report.txt")
    assert ref_agg_central.exists()
    assert ((our_central / f"stage{stage}"
             / "aggregate_classification_report.txt").read_text().strip()
            == ref_agg_central.read_text().strip())


@pytest.mark.slow
def test_snippet_eval_aggregate_stats_vs_executed_reference(tmp_path):
    """--use-aggregate-stats must flip BOTH sides to the aggregate
    normalization (different mean/std than fold 1's) and still agree."""
    from zenker_audio_detection_tpu.cli import test_stage1

    data, model_root = _build_assets(tmp_path, 1)
    import shutil
    ref_models = tmp_path / "ref_models"
    shutil.copytree(model_root, ref_models)

    _run_reference(tmp_path, 1, data, ref_models,
                   ["--fold", "1", "--use-aggregate-stats"])
    test_stage1.main(["--fold", "1", "--num-folds", str(NUM_FOLDS),
                      "--data-dir", str(data),
                      "--model-root", str(model_root),
                      "--results-dir", str(tmp_path / "c"),
                      "--use-aggregate-stats", "--f32"])
    _compare_fold_dirs(ref_models / "fold1" / "best",
                       model_root / "fold1" / "best")
