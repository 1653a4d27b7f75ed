"""Quality-parity harness on REAL fine-tuned weights (round-1 VERDICT
missing item 3) + an always-run self-test on fake assets (round-2 #4).

This environment has no network, so the MIT pretrained checkpoint and the
study's audio cannot be fetched here; the `real` tests are skipif-guarded
on environment variables pointing at local copies. Given those, they
reproduce the reference's actual quality claims — the paper's summed 5-fold
confusion matrices (utils/plot_confusion_matrices.py:168-184, BASELINE.md) —
through this framework's converter + evaluator. Documented workflow:
README.md "Reproducing the paper's quality numbers".

The `selftest` variants drive the SAME helper bodies unskipped every CI run
against generated checkpoint dirs / data trees, with the expected confusion
matrix derived independently of the evaluator under test — so the harness
cannot bit-rot before the day real assets appear.

Env vars:

  ZENKER_PRETRAINED_AST_DIR  local HF dir of
                             MIT/ast-finetuned-audioset-10-10-0.4593
                             (or any real fine-tuned fold's `best/`)
  ZENKER_RUNS_DIR            runs root holding
                             ast_classifier_stage{1,2}/fold{1..5}/best
  ZENKER_DATA_STAGE1/2       the data_ast_stage{1,2} split dirs (npy paths
                             must resolve to real WAVs)
"""

import json
import os

import numpy as np
import pytest

PRETRAINED = os.environ.get("ZENKER_PRETRAINED_AST_DIR")
RUNS = os.environ.get("ZENKER_RUNS_DIR")
DATA1 = os.environ.get("ZENKER_DATA_STAGE1")
DATA2 = os.environ.get("ZENKER_DATA_STAGE2")

# canonical constant lives with the one-command runbook (analysis/validate.py)
from zenker_audio_detection_tpu.analysis.validate import PAPER_CM  # noqa: E402


# ---------------------------------------------------------------------------
# Shared harness bodies (run both by the env-gated real tests and by the
# fake-asset self-tests)
# ---------------------------------------------------------------------------


def check_checkpoint_logit_parity(model_dir: str, atol: float = 1e-3):
    """Converter fidelity: our forward vs torch on the same checkpoint dir,
    logits <= atol (same tolerance as the random-init parity in
    test_ast_model.py, on the deployed distribution when real)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import jax.numpy as jnp

    from zenker_audio_detection_tpu.models import ast as ast_mod, convert

    params, config = convert.load_hf_model_dir(model_dir)
    ref = transformers.ASTForAudioClassification.from_pretrained(
        model_dir).eval()

    rng = np.random.default_rng(0)
    feats = rng.standard_normal(
        (2, config.max_length, config.num_mel_bins)).astype(np.float32)
    ours = np.asarray(ast_mod.forward(params, jnp.asarray(feats), config,
                                      dtype=jnp.float32))
    with torch.inference_mode():
        want = ref(torch.from_numpy(feats)).logits.numpy()
    np.testing.assert_allclose(ours, want, atol=atol)


def check_fold_eval_cm(*, stage: str, data_dir: str, runs_dir: str,
                       expected_cm: np.ndarray, results_dir: str,
                       folds=None, dtype=None):
    """Summed fold confusion matrix through the framework's evaluator must
    match `expected_cm` (the paper's numbers for real assets; an
    independently computed CM for the self-test). Row sums are fixed by the
    data, so equality is asserted up to a small per-cell tolerance for
    framework-boundary rounding of near-threshold windows."""
    from zenker_audio_detection_tpu.analysis import snippet_eval

    out = snippet_eval.evaluate_all_folds(
        stage=stage, data_dir=data_dir,
        model_root=os.path.join(runs_dir, f"ast_classifier_{stage}"),
        central_results_dir=results_dir, folds=folds, dtype=dtype)
    cm = np.asarray(out["aggregate_confusion_matrix"])
    expected_cm = np.asarray(expected_cm)
    assert cm.sum() == expected_cm.sum(), "different evaluation set size"
    # <=0.5% of windows may flip at the bf16/f32 framework boundary
    tol = max(1, int(round(0.005 * expected_cm.sum())))
    np.testing.assert_allclose(cm, expected_cm, atol=tol)
    return out


# ---------------------------------------------------------------------------
# Env-gated real-asset tests
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not PRETRAINED,
                    reason="set ZENKER_PRETRAINED_AST_DIR to a local HF "
                           "AST checkpoint dir")
def test_real_checkpoint_logit_parity():
    check_checkpoint_logit_parity(PRETRAINED)


@pytest.mark.parametrize("stage,data_env", [
    ("stage1", DATA1), ("stage2", DATA2)])
def test_fold_eval_reproduces_paper_cm(stage, data_env, tmp_path):
    """Given the study's fine-tuned fold models and split data, the summed
    5-fold confusion matrix must reproduce the paper's numbers
    (BASELINE.md; utils/plot_confusion_matrices.py:168-184)."""
    if not (RUNS and data_env):
        pytest.skip("set ZENKER_RUNS_DIR and ZENKER_DATA_STAGE1/2")
    check_fold_eval_cm(stage=stage, data_dir=data_env, runs_dir=RUNS,
                       expected_cm=PAPER_CM[stage],
                       results_dir=str(tmp_path / "results"))


# ---------------------------------------------------------------------------
# Always-run self-tests on generated fake assets
# ---------------------------------------------------------------------------


def _fake_checkpoint(tmp_path, seed=0, num_labels=2, max_length=128):
    import jax

    from zenker_audio_detection_tpu.models import ast as ast_mod, convert
    from zenker_audio_detection_tpu.train import loop as train_loop

    cfg = ast_mod.ASTConfig(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=4, intermediate_size=64,
                            max_length=max_length, num_labels=num_labels)
    params = ast_mod.init_params(jax.random.PRNGKey(seed), cfg)
    d = str(tmp_path)
    convert.save_hf_model_dir(params, cfg, d)
    train_loop.save_feature_extractor_config(d, -1.1509622, 3.5340312,
                                             max_length=max_length)
    return d, params, cfg


def test_harness_selftest_logit_parity(tmp_path):
    """check_checkpoint_logit_parity end-to-end on a generated checkpoint
    dir: exercises the exact helper the real-weights test runs."""
    d, _, _ = _fake_checkpoint(tmp_path / "ckpt")
    check_checkpoint_logit_parity(d)


def test_harness_selftest_fold_eval(tmp_path):
    """check_fold_eval_cm end-to-end on a generated runs root + data tree,
    with the expected CM computed INDEPENDENTLY (direct featurize+forward
    +argmax here, vs the evaluator's own pipeline under test)."""
    import jax.numpy as jnp

    from zenker_audio_detection_tpu.audio import io as aio
    from zenker_audio_detection_tpu.data import stats as stats_mod
    from zenker_audio_detection_tpu.models import ast as ast_mod
    from zenker_audio_detection_tpu.train import loop as train_loop, steps

    stage = "stage2"
    runs = tmp_path / "runs"
    data = tmp_path / f"data_ast_{stage}"
    data.mkdir()
    with open(data / "class_mapping.json", "w") as f:
        json.dump({"Healthy": 0, "Zenker": 1}, f)

    rng = np.random.default_rng(7)
    expected = np.zeros((2, 2), int)
    folds = [1, 2]
    fold_models = {}
    for fold in folds:
        mdir, params, cfg = _fake_checkpoint(
            runs / f"ast_classifier_{stage}" / f"fold{fold}" / "best",
            seed=fold)
        fold_models[fold] = (params, cfg)
        xs, ys = [], []
        for i in range(6):
            label = i % 2
            amp = 0.02 if label == 0 else 0.3
            p = tmp_path / "wavs" / f"f{fold}_{i}.wav"
            p.parent.mkdir(parents=True, exist_ok=True)
            aio.write_wav(str(p), (rng.standard_normal(16000) * amp
                                   ).astype(np.float32), 16000,
                          dtype="float32")
            xs.append(str(p))
            ys.append(label)
        np.save(data / f"test_x_fold{fold}.npy", np.asarray(xs, object))
        np.save(data / f"test_y_fold{fold}.npy", np.asarray(ys))

        # independent expectation: featurize + forward + argmax right here
        mean, std = stats_mod.load_fold_normalization(str(data), fold)[:2]
        feats = train_loop.featurize_paths(xs, mean, std,
                                           max_frames=cfg.max_length)
        logits = train_loop._predict(
            steps.make_eval_step(cfg, dtype=jnp.float32), params, feats, 4)
        preds = logits.argmax(axis=1)
        for t, p_ in zip(ys, preds):
            expected[t, p_] += 1

    out = check_fold_eval_cm(stage=stage, data_dir=str(data),
                             runs_dir=str(runs), expected_cm=expected,
                             results_dir=str(tmp_path / "results"),
                             folds=folds, dtype=jnp.float32)
    # the harness also wrote the artifacts the CM plotter consumes
    assert (runs / f"ast_classifier_{stage}" / "cv_aggregate_evaluation"
            / "confusion_matrix.npy").exists()
    assert np.asarray(out["aggregate_confusion_matrix"]).sum() == 12
