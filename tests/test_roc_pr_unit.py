"""Unit tests for analysis/roc_pr.py internals (curve metrics, bootstrap,
plotting) without model inference."""

import json
from pathlib import Path

import numpy as np
import pytest

from zenker_audio_detection_tpu.analysis import roc_pr


@pytest.fixture
def scored(rng):
    y = rng.integers(0, 2, 200)
    s = np.clip(y * 0.6 + rng.standard_normal(200) * 0.3 + 0.2, 0, 1)
    return y, s


def test_curve_metrics_keys(scored):
    y, s = scored
    m = roc_pr._curve_metrics(y, s, ["Idle", "Swallow"], [0.5])
    for k in ["roc_auc", "pr_auc", "roc_auc_ci_lower", "roc_auc_ci_upper",
              "pr_auc_ci_lower", "pr_auc_ci_upper", "thr_0.5_confusion",
              "thr_0.5_precision", "thr_0.5_recall", "thr_0.5_f1",
              "roc_curve", "pr_curve", "best_f1_threshold", "best_f1",
              "best_f1_precision", "best_f1_recall"]:
        assert k in m, k
    assert m["roc_auc_ci_lower"] <= m["roc_auc"] <= m["roc_auc_ci_upper"]
    # best-F1 threshold really is the argmax over PR-curve thresholds
    from sklearn.metrics import precision_recall_curve
    p, r, t = precision_recall_curve(y, s)
    f1 = 2 * p[:-1] * r[:-1] / np.clip(p[:-1] + r[:-1], 1e-8, None)
    assert m["best_f1"] == pytest.approx(float(f1.max()))


def test_bootstrap_ci_deterministic(scored):
    from sklearn.metrics import roc_auc_score

    y, s = scored
    a = roc_pr.bootstrap_ci(y, s, roc_auc_score, n_bootstrap=200)
    b = roc_pr.bootstrap_ci(y, s, roc_auc_score, n_bootstrap=200)
    assert a == b
    assert a[0] < a[1]


def test_plot_payload_outputs(tmp_path, scored):
    y, s = scored
    rep = {"fold": 1, "split": "val"}
    rep.update(roc_pr._curve_metrics(y, s, ["Healthy", "Zenker"], [0.5]))
    rep2 = dict(rep, fold=2)
    agg = roc_pr._curve_metrics(y, s, ["Healthy", "Zenker"], [0.5])
    payload = {"fold_reports": [rep, rep2], "aggregate": agg,
               "decision_thresholds_evaluated": [0.5]}
    roc_pr.plot_payload(payload, str(tmp_path), stage="stage2",
                        combined=True, individual=True, fmt="both")
    assert (tmp_path / "stage2_roc_combined.png").exists()
    assert (tmp_path / "stage2_pr_combined.pdf").exists()
    assert (tmp_path / "stage2_fold1.png").exists()
    assert (tmp_path / "stage2_fold2.pdf").exists()


def test_to_waveform_payload_types(tmp_path):
    """Reference payload contract (analyze_ROC_PR_stage1.py:132-155): path,
    ndarray (assumed 16 kHz), and dict with array + sampling-rate keys,
    resampling non-16k dict payloads."""
    from zenker_audio_detection_tpu.audio import io as aio
    from zenker_audio_detection_tpu.train import loop as train_loop

    rng = np.random.default_rng(0)
    wav = (0.2 * rng.standard_normal(16000)).astype(np.float32)
    p = str(tmp_path / "clip.wav")
    aio.write_wav(p, wav, 16000, dtype="float32")

    np.testing.assert_allclose(train_loop.to_waveform(p), wav, atol=1e-7)
    np.testing.assert_array_equal(train_loop.to_waveform(wav), wav)
    np.testing.assert_array_equal(
        train_loop.to_waveform({"array": wav, "sampling_rate": 16000}), wav)
    # alternate key spellings
    np.testing.assert_array_equal(
        train_loop.to_waveform({"audio": wav}), wav)
    np.testing.assert_array_equal(
        train_loop.to_waveform({"values": wav, "sampling_rate_hz": 16000}),
        wav)
    # non-16k dict payload is resampled to 16 kHz
    wav48 = (0.2 * rng.standard_normal(48000)).astype(np.float32)
    out = train_loop.to_waveform({"array": wav48, "sampling_rate": 48000})
    assert abs(len(out) - 16000) <= 1
    # int16 payloads are PCM: scaled by 1/32768 like ops/fbank's device path
    pcm = (wav * 32768.0).astype(np.int16)
    np.testing.assert_allclose(train_loop.to_waveform(pcm),
                               pcm.astype(np.float32) / 32768.0, atol=0)
    np.testing.assert_allclose(
        train_loop.to_waveform({"array": pcm, "sampling_rate": 16000}),
        pcm.astype(np.float32) / 32768.0, atol=0)
    with pytest.raises(ValueError):
        train_loop.to_waveform({"sampling_rate": 16000})
    with pytest.raises(TypeError):
        train_loop.to_waveform(3.14)


def test_positive_scores_accepts_mixed_payloads(tmp_path):
    """The analyzer pipeline itself (positive_scores -> featurize_paths)
    must accept split npys storing paths, raw arrays, dict payloads, and
    MIXED lengths — the reference defends against all of these."""
    import jax

    from zenker_audio_detection_tpu.audio import io as aio
    from zenker_audio_detection_tpu.models import ast as ast_mod, convert
    from zenker_audio_detection_tpu.train import loop as train_loop

    cfg = ast_mod.ASTConfig(hidden_size=16, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=32,
                            max_length=128, num_labels=2)
    params = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
    mdir = str(tmp_path / "model")
    convert.save_hf_model_dir(params, cfg, mdir)
    train_loop.save_feature_extractor_config(mdir, -1.0, 3.0,
                                             max_length=cfg.max_length)

    rng = np.random.default_rng(1)
    wav = (0.2 * rng.standard_normal(16000)).astype(np.float32)
    p = str(tmp_path / "c.wav")
    aio.write_wav(p, wav, 16000, dtype="float32")
    longer = (0.1 * rng.standard_normal(24000)).astype(np.float32)

    entries = [p, wav, {"array": wav, "sampling_rate": 16000}, longer]
    scores = roc_pr.positive_scores(mdir, entries, batch_size=2)
    assert scores.shape == (4,)
    assert np.isfinite(scores).all() and ((0 <= scores) & (scores <= 1)).all()
    # identical audio through path / ndarray / dict gives identical scores
    assert scores[0] == pytest.approx(scores[1], abs=1e-5)
    assert scores[1] == pytest.approx(scores[2], abs=1e-5)


def test_load_split_val_fallback(tmp_path):
    d = tmp_path
    np.save(d / "test_x_fold1.npy", np.asarray(["a.wav"], object))
    np.save(d / "test_y_fold1.npy", np.asarray([1]))
    X, y, used = roc_pr.load_split(str(d), 1, "val")
    assert used == "test"
    np.save(d / "val_x_fold1.npy", np.asarray(["b.wav"], object))
    np.save(d / "val_y_fold1.npy", np.asarray([0]))
    X, y, used = roc_pr.load_split(str(d), 1, "val")
    assert used == "val" and X == ["b.wav"]
    with pytest.raises(FileNotFoundError):
        roc_pr.load_split(str(d), 2, "val")


def test_load_fold_thresholds_shapes_and_errors(tmp_path):
    """Per-fold lookup, legacy flat fallback (reference
    src/run_batch_simple_2stage.py:97-118), and typed errors that NAME the
    config file on corrupt/malformed input."""
    from zenker_audio_detection_tpu.analysis import thresholds as T

    p = str(tmp_path / "thr.json")
    Path(p).write_text(json.dumps(
        {"folds": {"2": {"stage1": {"threshold": 0.61},
                         "stage2": {"threshold": 0.42}}},
         "thresholds": {"stage2": {"threshold": 0.33}}}))
    assert T.load_fold_thresholds(p, 2) == {"stage1": 0.61, "stage2": 0.42}
    # fold absent -> legacy flat shape applies to every fold
    assert T.load_fold_thresholds(p, 1) == {"stage1": None, "stage2": 0.33}

    for bad in ('{"folds": [1,2]}',                       # wrong shape
                '{"folds": {"1": {"stage1": {"threshold": "x"}}}}',
                '{truncated'):                            # corrupt JSON
        Path(p).write_text(bad)
        with pytest.raises(ValueError, match="thr.json"):
            T.load_fold_thresholds(p, 1)
