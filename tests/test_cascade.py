"""End-to-end parity: TwoStageEngine vs a reference-style torch pipeline.

Replicates the reference's serving loop (per-window ASTFeatureExtractor ->
torch AST -> softmax -> threshold gating -> summary) on randomly-initialized
thin models (full 1214-token geometry, tiny hidden size) and asserts the
engine reproduces probabilities, gating decisions, and the JSON summary.
"""

import numpy as np
import pytest

from zenker_audio_detection_tpu.infer import cascade as C
from zenker_audio_detection_tpu.models import ast as ast_mod, convert

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
from transformers import ASTConfig as HFASTConfig  # noqa: E402
from transformers import ASTFeatureExtractor, ASTForAudioClassification  # noqa: E402

MEAN1, STD1 = -1.1509622, 3.5340312
MEAN2, STD2 = -0.9, 2.8


def thin_model(seed):
    torch.manual_seed(seed)
    cfg = HFASTConfig(hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=64,
                      num_labels=2)
    return ASTForAudioClassification(cfg).eval()


@pytest.fixture(scope="module")
def engines():
    m1, m2 = thin_model(0), thin_model(1)
    cfg1 = convert.config_from_hf_dict(m1.config.to_dict())
    cfg2 = convert.config_from_hf_dict(m2.config.to_dict())
    s1 = C.StageSpec(convert.from_hf_state_dict(m1.state_dict(), cfg1), cfg1,
                     MEAN1, STD1, ("Idle", "Swallow"))
    s2 = C.StageSpec(convert.from_hf_state_dict(m2.state_dict(), cfg2), cfg2,
                     MEAN2, STD2, ("Healthy", "Zenker"))
    return m1, m2, s1, s2


def ref_window_audio(audio, window_sec, hop_sec, sr=16000):
    # replicated from src/test_long_audio_windows_2stage.py:62-75
    win, hop = int(window_sec * sr), int(hop_sec * sr)
    out = []
    for start in range(0, max(1, len(audio) - win + 1), hop):
        seg = audio[start:start + win]
        if len(seg) < win:
            pad = np.zeros(win, dtype=audio.dtype)
            pad[: len(seg)] = seg
            seg = pad
        out.append(seg)
    return out


def ref_probs(model, fx, windows, batch_size=128):
    out = []
    with torch.inference_mode():
        for i in range(0, len(windows), batch_size):
            batch = windows[i:i + batch_size]
            feats = fx(batch, sampling_rate=16000, return_tensors="pt")["input_values"]
            out.append(torch.softmax(model(feats).logits, dim=1).numpy())
    return np.concatenate(out)


def make_audio(rng, seconds):
    n = int(16000 * seconds)
    t = np.arange(n) / 16000
    x = 0.05 * rng.standard_normal(n) + 0.1 * np.sin(2 * np.pi * 300 * t)
    return x.astype(np.float32)


def test_window_starts_match_reference(rng):
    for n in [4000, 16000, 16001, 47999, 80000]:
        # the reference's exact grid (test_long_audio_windows_2stage.py:
        # 62-75): range(0, max(1, n - win + 1), hop) — compare the START
        # POSITIONS, not just the count (an offset grid with the same
        # length would pass a count-only check)
        ref_starts = list(range(0, max(1, n - 16000 + 1), 8000))
        starts = C.window_starts(n, 1.0, 0.5)
        np.testing.assert_array_equal(np.asarray(starts),
                                      np.asarray(ref_starts))
        # and the count matches the windows the reference would cut
        assert len(starts) == len(ref_window_audio(np.zeros(n, np.float32),
                                                   1.0, 0.5))


def test_cascade_probs_and_summary_parity(engines, rng):
    import jax.numpy as jnp

    m1, m2, s1, s2 = engines
    fx1 = ASTFeatureExtractor(mean=MEAN1, std=STD1)
    fx2 = ASTFeatureExtractor(mean=MEAN2, std=STD2)

    audio = make_audio(rng, 4.3)  # 7 windows
    windows = ref_window_audio(audio, 1.0, 0.5)
    r1 = ref_probs(m1, fx1, windows)
    r2_all = ref_probs(m2, fx2, windows)

    eng = C.TwoStageEngine(s1, s2, C.CascadeConfig(dtype=jnp.float32,
                                                   stage2_mode="all"))
    p1, p2 = eng.window_probs(audio)
    assert p1.shape == r1.shape and p2.shape == r2_all.shape
    np.testing.assert_allclose(p1, r1, atol=2e-4)
    np.testing.assert_allclose(p2, r2_all, atol=2e-4)

    # gated mode: stage-2 evaluated only where the gate passes, identical
    # values there and identical downstream summary
    eng_gated = C.TwoStageEngine(s1, s2, C.CascadeConfig(dtype=jnp.float32,
                                                         stage2_mode="gated"))
    g1, g2 = eng_gated.window_probs(audio)
    np.testing.assert_allclose(g1, p1, atol=1e-6)
    gated_idx = eng_gated._gate_indices(g1)
    np.testing.assert_allclose(g2[gated_idx], p2[gated_idx], atol=1e-6)
    ungated = np.setdiff1d(np.arange(len(g1)), gated_idx)
    assert np.all(g2[ungated] == 0.0)
    sum_all = eng.gate_and_summarize(p1, p2)[0]
    sum_gated = eng_gated.gate_and_summarize(g1, g2)[0]
    assert sum_all == sum_gated

    # reference gating (src/test_long_audio_windows_2stage.py:310-345)
    p_swallow = r1[:, 1]
    preds = r1.argmax(1)
    preds = np.where((preds == 1) & (p_swallow >= 0.5), 1, 0)
    swallow_idx = np.where(preds == 1)[0]
    stage2_results = [(int(g), r2_all[g]) for g in swallow_idx]
    ref_summary = C.summarize_stage_outputs(
        r1, stage2_results, ["Idle", "Swallow"], ["Healthy", "Zenker"], 0.5)

    summary, s1_preds, s2_results, aligned = eng.gate_and_summarize(p1, p2)
    for key in ["num_windows", "stage1_idle_windows", "stage1_swallow_windows",
                "stage2_swallow_windows_evaluated", "stage2_healthy_windows",
                "stage2_zenker_windows"]:
        assert summary[key] == ref_summary[key], key
    np.testing.assert_allclose(summary["stage1_mean_probs"],
                               ref_summary["stage1_mean_probs"], atol=2e-4)
    np.testing.assert_array_equal(s1_preds, preds)


def test_cascade_short_file_single_window(engines, rng):
    import jax.numpy as jnp

    m1, m2, s1, s2 = engines
    eng = C.TwoStageEngine(s1, s2, C.CascadeConfig(dtype=jnp.float32))
    audio = make_audio(rng, 0.4)  # shorter than window -> 1 zero-padded window
    p1, p2 = eng.window_probs(audio)
    assert p1.shape == (1, 2) and p2.shape == (1, 2)

    fx1 = ASTFeatureExtractor(mean=MEAN1, std=STD1)
    ref = ref_probs(m1, fx1, ref_window_audio(audio, 1.0, 0.5))
    np.testing.assert_allclose(p1, ref, atol=2e-4)


def test_run_patient_json_schema(engines, rng):
    import jax.numpy as jnp

    m1, m2, s1, s2 = engines
    eng = C.TwoStageEngine(s1, s2, C.CascadeConfig(dtype=jnp.float32))
    audios = [make_audio(rng, 2.0), make_audio(rng, 3.0)]
    out = eng.run_patient(["/x/a.wav", "/x/b.wav"], audios,
                          "runs/s1/fold1/best", "runs/s2/fold1/best")
    # exact schema of outputs/<pid>_2stage.json
    assert set(out) == {"config", "per_file", "aggregate"}
    assert set(out["per_file"]) == {"file_0", "file_1"}
    f0 = out["per_file"]["file_0"]
    for k in ["path", "num_windows", "stage1_idle_windows",
              "stage1_swallow_windows", "stage1_swallow_ratio",
              "stage1_mean_probs", "stage2_mean_probs_over_swallow",
              "stage2_swallow_windows_evaluated", "stage2_healthy_windows",
              "stage2_zenker_windows", "stage2_zenker_ratio_over_swallow"]:
        assert k in f0, k
    agg = out["aggregate"]
    assert agg["total_windows"] == (f0["num_windows"]
                                    + out["per_file"]["file_1"]["num_windows"])
    assert set(agg) == {
        "files_used", "total_windows", "total_idle_windows",
        "total_swallow_windows", "total_swallow_ratio",
        "total_swallow_windows_evaluated_stage2", "total_healthy_windows",
        "total_zenker_windows", "overall_zenker_ratio_over_swallow"}
    import json
    json.dumps(out)  # must be JSON-serializable


def test_stage1_forward_min_prob_and_argmax_gates(engines, rng):
    """The cached script's extra knobs
    (src/test_long_audio_windows_2stage_cache.py:469-523)."""
    import jax.numpy as jnp

    _, _, s1, s2 = engines
    eng = C.TwoStageEngine(
        s1, s2, C.CascadeConfig(dtype=jnp.float32,
                                stage1_forward_min_prob=0.99,
                                stage2_argmax=True))
    audio = make_audio(rng, 3.0)
    p1, p2 = eng.window_probs(audio)
    summary, _, s2_results, aligned = eng.gate_and_summarize(p1, p2)
    # with an absurd forward-min-prob nearly all swallow windows are filtered
    kept = [g for g, _ in s2_results]
    for g in kept:
        assert p1[g, 1] >= 0.99
    # argmax mode labels every evaluated window by argmax
    for g, probs in s2_results:
        assert aligned[g] == int(np.argmax(probs))


@pytest.mark.slow
def test_cascade_randomized_config_parity(engines, rng):
    """Engine vs torch-pipeline oracle at 4 random (audio length, window,
    hop, gate threshold, batch size) draws — the fixed test pins the
    reference's 1.0 s/0.5 s/0.5 point; the window grid, bucketing, gating
    and summary must agree for any CLI-reachable configuration."""
    import jax.numpy as jnp

    m1, m2, s1, s2 = engines
    fx1 = ASTFeatureExtractor(mean=MEAN1, std=STD1)
    fx2 = ASTFeatureExtractor(mean=MEAN2, std=STD2)
    r = np.random.default_rng(20260818)
    for trial in range(4):
        window_sec = float(r.integers(5, 21)) / 10.0
        hop_sec = float(r.integers(1, 11)) / 10.0
        thr = float(r.uniform(0.2, 0.8))
        seconds = float(r.uniform(0.3, 6.0))
        batch = int(r.choice([3, 8, 128]))
        audio = make_audio(r, seconds)

        windows = ref_window_audio(audio, window_sec, hop_sec)
        r1 = ref_probs(m1, fx1, windows)
        r2_all = ref_probs(m2, fx2, windows)

        eng = C.TwoStageEngine(s1, s2, C.CascadeConfig(
            dtype=jnp.float32, stage2_mode="all", window_sec=window_sec,
            hop_sec=hop_sec, stage1_threshold=thr, batch_size=batch))
        p1, p2 = eng.window_probs(audio)
        tag = (f"trial {trial}: win={window_sec} hop={hop_sec} thr={thr:.2f} "
               f"len={seconds:.2f}s batch={batch}")
        assert p1.shape == r1.shape and p2.shape == r2_all.shape, tag
        np.testing.assert_allclose(p1, r1, atol=2e-4, err_msg=tag)
        np.testing.assert_allclose(p2, r2_all, atol=2e-4, err_msg=tag)

        # reference gating at this threshold
        preds = np.where((r1.argmax(1) == 1) & (r1[:, 1] >= thr), 1, 0)
        swallow_idx = np.where(preds == 1)[0]
        ref_summary = C.summarize_stage_outputs(
            r1, [(int(g), r2_all[g]) for g in swallow_idx],
            ["Idle", "Swallow"], ["Healthy", "Zenker"], 0.5)
        summary, s1_preds, _, _ = eng.gate_and_summarize(p1, p2)
        for key in ["num_windows", "stage1_idle_windows",
                    "stage1_swallow_windows",
                    "stage2_swallow_windows_evaluated",
                    "stage2_healthy_windows", "stage2_zenker_windows"]:
            assert summary[key] == ref_summary[key], (tag, key)
        np.testing.assert_array_equal(s1_preds, preds, err_msg=tag)

        # gated mode agrees wherever the gate passes at this threshold
        eng_g = C.TwoStageEngine(s1, s2, C.CascadeConfig(
            dtype=jnp.float32, stage2_mode="gated", window_sec=window_sec,
            hop_sec=hop_sec, stage1_threshold=thr, batch_size=batch))
        g1, g2 = eng_g.window_probs(audio)
        np.testing.assert_allclose(g1, p1, atol=1e-6, err_msg=tag)
        gidx = eng_g._gate_indices(g1)
        np.testing.assert_allclose(g2[gidx], p2[gidx], atol=1e-6, err_msg=tag)
        assert eng_g.gate_and_summarize(g1, g2)[0] == summary, tag
