"""Quality-parity harness on REAL fine-tuned weights (round-1 VERDICT
missing item 3).

This environment has no network, so the MIT pretrained checkpoint and the
study's audio cannot be fetched here; instead these tests are skipif-guarded
on environment variables pointing at local copies. Given those, they
reproduce the reference's actual quality claims — the paper's summed 5-fold
confusion matrices (utils/plot_confusion_matrices.py:168-184, BASELINE.md) —
through this framework's converter + evaluator. Documented workflow:
README.md "Reproducing the paper's quality numbers".

Env vars:

  ZENKER_PRETRAINED_AST_DIR  local HF dir of
                             MIT/ast-finetuned-audioset-10-10-0.4593
                             (or any real fine-tuned fold's `best/`)
  ZENKER_RUNS_DIR            runs root holding
                             ast_classifier_stage{1,2}/fold{1..5}/best
  ZENKER_DATA_STAGE1/2       the data_ast_stage{1,2} split dirs (npy paths
                             must resolve to real WAVs)
"""

import os

import numpy as np
import pytest

PRETRAINED = os.environ.get("ZENKER_PRETRAINED_AST_DIR")
RUNS = os.environ.get("ZENKER_RUNS_DIR")
DATA1 = os.environ.get("ZENKER_DATA_STAGE1")
DATA2 = os.environ.get("ZENKER_DATA_STAGE2")


@pytest.mark.skipif(not PRETRAINED,
                    reason="set ZENKER_PRETRAINED_AST_DIR to a local HF "
                           "AST checkpoint dir")
def test_real_checkpoint_logit_parity():
    """Converter fidelity on real weights: our forward vs torch on the same
    checkpoint, full-size logits <= 1e-3 (same tolerance as the random-init
    parity in test_ast_model.py, now on the deployed distribution)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import jax.numpy as jnp

    from zenker_audio_detection_tpu.models import ast as ast_mod, convert

    params, config = convert.load_hf_model_dir(PRETRAINED)
    ref = transformers.ASTForAudioClassification.from_pretrained(
        PRETRAINED).eval()

    rng = np.random.default_rng(0)
    feats = rng.standard_normal(
        (2, config.max_length, config.num_mel_bins)).astype(np.float32)
    ours = np.asarray(ast_mod.forward(params, jnp.asarray(feats), config,
                                      dtype=jnp.float32))
    with torch.inference_mode():
        want = ref(torch.from_numpy(feats)).logits.numpy()
    np.testing.assert_allclose(ours, want, atol=1e-3)


@pytest.mark.parametrize("stage,data_env,paper_cm", [
    ("stage1", DATA1, np.array([[2590, 229], [108, 1324]])),
    ("stage2", DATA2, np.array([[473, 261], [117, 581]])),
])
def test_fold_eval_reproduces_paper_cm(stage, data_env, paper_cm, tmp_path):
    """Given the study's fine-tuned fold models and split data, the summed
    5-fold confusion matrix must reproduce the paper's numbers
    (BASELINE.md; utils/plot_confusion_matrices.py:168-184). Row sums are
    fixed by the data, so equality is asserted up to a small per-cell
    tolerance for framework-boundary rounding of near-threshold windows."""
    if not (RUNS and data_env):
        pytest.skip("set ZENKER_RUNS_DIR and ZENKER_DATA_STAGE1/2")

    from zenker_audio_detection_tpu.analysis import snippet_eval

    out = snippet_eval.evaluate_all_folds(
        stage=stage, data_dir=data_env,
        model_root=os.path.join(RUNS, f"ast_classifier_{stage}"),
        central_results_dir=str(tmp_path / "results"))
    cm = np.asarray(out["aggregate_confusion_matrix"])
    assert cm.sum() == paper_cm.sum(), "different evaluation set size"
    # <=0.5% of windows may flip at the bf16/f32 framework boundary
    tol = max(1, int(round(0.005 * paper_cm.sum())))
    np.testing.assert_allclose(cm, paper_cm, atol=tol)
