"""Executed-reference differential for the ROC/PR analyzer.

Runs the ACTUAL reference script (utils/analyze_ROC_PR_stage1.py) — with
torchaudio stubbed out (absent here; ndarray split payloads never reach it)
— over a tiny model dir EXPORTED BY OUR CONVERTER and synthetic splits,
then runs our `cli.analyze_roc_pr` on the same inputs and diffs the metrics
payload: per-fold and aggregate AUCs, bootstrap CIs (same seed-42 RNG
sequence), operating points, and best-F1 selection.
"""

import json
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/utils/analyze_ROC_PR_stage1.py")
pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference not mounted")

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

MEAN, STD = -1.1509622, 3.5340312


def _make_assets(tmp_path, rng):
    """Two folds of val splits (ndarray payloads) + our exported model dirs."""
    from transformers import ASTConfig as HFASTConfig
    from transformers import ASTForAudioClassification

    from zenker_audio_detection_tpu.models import convert
    from zenker_audio_detection_tpu.train.loop import save_feature_extractor_config

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    for fold in (1, 2):
        torch.manual_seed(10 + fold)
        hf_cfg = HFASTConfig(hidden_size=32, num_hidden_layers=2,
                             num_attention_heads=4, intermediate_size=64,
                             num_labels=2)
        m = ASTForAudioClassification(hf_cfg).eval()
        cfg = convert.config_from_hf_dict(hf_cfg.to_dict() | {
            "id2label": {0: "Idle", 1: "Swallow"}})
        params = convert.from_hf_state_dict(m.state_dict(), cfg)
        model_dir = tmp_path / "runs" / f"fold{fold}" / "best"
        convert.save_hf_model_dir(params, cfg, str(model_dir))
        save_feature_extractor_config(str(model_dir), MEAN, STD)

        n = int(rng.integers(14, 25))
        waves = np.empty(n, dtype=object)
        labels = rng.integers(0, 2, size=n)
        for i in range(n):
            # amplitude loosely tracks the label so the AUC is non-trivial
            amp = 0.02 + 0.15 * labels[i] + 0.05 * rng.uniform()
            waves[i] = (rng.standard_normal(16000) * amp).astype(np.float32)
        np.save(data_dir / f"val_x_fold{fold}.npy", waves, allow_pickle=True)
        np.save(data_dir / f"val_y_fold{fold}.npy", labels.astype(np.int64))
    return data_dir, str(tmp_path / "runs" / "fold{fold}" / "best")


def _run_reference(data_dir, tmpl, out_json):
    """exec the reference analyzer with torchaudio stubbed (never called
    for ndarray payloads at 16 kHz) and argv redirected."""
    ta = types.ModuleType("torchaudio")
    ta.functional = types.SimpleNamespace(resample=None)
    ta.load = None
    old_ta = sys.modules.get("torchaudio")
    old_argv = sys.argv
    sys.modules["torchaudio"] = ta
    sys.argv = ["analyze_ROC_PR_stage1.py", "--data-dir", str(data_dir),
                "--model-root-template", tmpl, "--split", "val",
                "--num-folds", "2", "--batch-size", "7",
                "--output-json", str(out_json)]
    try:
        src = REF.read_text()
        exec(compile(src, str(REF), "exec"),
             {"__file__": str(REF), "__name__": "__main__"})
    finally:
        sys.argv = old_argv
        if old_ta is None:
            del sys.modules["torchaudio"]
        else:
            sys.modules["torchaudio"] = old_ta
    return json.loads(Path(out_json).read_text())


@pytest.mark.slow
def test_rocpr_analyzer_parity_vs_executed_reference(tmp_path, capsys):
    from zenker_audio_detection_tpu.cli import analyze_roc_pr

    rng = np.random.default_rng(20260818)
    data_dir, tmpl = _make_assets(tmp_path, rng)

    ref = _run_reference(data_dir, tmpl, tmp_path / "ref.json")
    our_json = tmp_path / "ours.json"
    analyze_roc_pr.main(["--stage", "stage1", "--data-dir", str(data_dir),
                         "--model-root-template", tmpl, "--split", "val",
                         "--num-folds", "2", "--batch-size", "7",
                         "--output-json", str(our_json), "--f32"])
    capsys.readouterr()
    ours = json.loads(our_json.read_text())

    assert set(ours) >= {"fold_reports", "aggregate",
                         "decision_thresholds_evaluated"}
    assert ours["decision_thresholds_evaluated"] == \
        ref["decision_thresholds_evaluated"]

    def close(a, b, tag, tol=1e-3):
        assert a == pytest.approx(b, abs=tol), (tag, a, b)

    for rrep, orep in zip(ref["fold_reports"] + [ref["aggregate"]],
                          ours["fold_reports"] + [ours["aggregate"]],
                          strict=True):
        tag = rrep.get("fold", "aggregate")
        if "fold" in rrep:
            assert orep["fold"] == rrep["fold"]
            assert orep["split"] == rrep["split"] == "val"
        for k in ["roc_auc", "pr_auc", "roc_auc_ci_lower",
                  "roc_auc_ci_upper", "pr_auc_ci_lower", "pr_auc_ci_upper",
                  "best_f1_threshold", "best_f1", "best_f1_precision",
                  "best_f1_recall"]:
            close(orep[k], rrep[k], (tag, k))
        for key in rrep:
            if key.startswith("thr_"):
                if key.endswith("_confusion"):
                    assert orep[key] == rrep[key], (tag, key)
                else:
                    close(orep[key], rrep[key], (tag, key))
        # curve points: same staircase (score ORDER parity, not just AUC)
        for curve, parts in (("roc_curve", ("fpr", "tpr")),
                             ("pr_curve", ("precision", "recall"))):
            for part in parts:
                np.testing.assert_allclose(
                    orep[curve][part], rrep[curve][part], atol=1e-6,
                    err_msg=f"{tag} {curve}.{part}")
