"""Edge-case tests for the cascade engine chunking/bucketing."""

import numpy as np
import pytest

from zenker_audio_detection_tpu.infer import cascade as C
from zenker_audio_detection_tpu.models import ast as ast_mod


@pytest.fixture(scope="module")
def engine():
    import jax
    import jax.numpy as jnp

    cfg = ast_mod.ASTConfig(hidden_size=16, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=32,
                            num_labels=2)
    s1 = C.StageSpec(ast_mod.init_params(jax.random.PRNGKey(0), cfg), cfg,
                     -1.15, 3.53, ("Idle", "Swallow"))
    s2 = C.StageSpec(ast_mod.init_params(jax.random.PRNGKey(1), cfg), cfg,
                     -0.9, 2.8, ("Healthy", "Zenker"))
    return C.TwoStageEngine(s1, s2,
                            C.CascadeConfig(batch_size=16,
                                            dtype=jnp.float32))


def test_subframe_audio(engine, rng):
    """Audio shorter than one fbank frame still yields one (padded) window."""
    p1, p2 = engine.window_probs((rng.standard_normal(100) * 0.1
                                  ).astype(np.float32))
    assert p1.shape == (1, 2)
    assert np.isfinite(p1).all()


def test_silence_hits_log_floor(engine):
    """All-zero audio exercises the Kaldi mel floor; probs stay finite."""
    p1, p2 = engine.window_probs(np.zeros(32000, np.float32))
    assert np.isfinite(p1).all()
    np.testing.assert_allclose(p1.sum(axis=1), 1.0, atol=1e-5)


def test_exact_multiple_window_counts(engine, rng):
    """len==window yields 1 window; len==window+hop yields 2; the chunk
    bucketing handles counts below, at, and above batch_size."""
    for n_samples, expect in ((16000, 1), (24000, 2), (16000 + 8000 * 16, 17)):
        audio = (rng.standard_normal(n_samples) * 0.1).astype(np.float32)
        p1, _ = engine.window_probs(audio)
        assert len(p1) == expect, (n_samples, len(p1), expect)


def test_nonstandard_hop_uses_sample_path(rng):
    """A hop off the 10 ms frame grid falls back to per-window fbank and
    matches per-window featurization."""
    import jax
    import jax.numpy as jnp

    cfg = ast_mod.ASTConfig(hidden_size=16, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=32,
                            num_labels=2)
    s1 = C.StageSpec(ast_mod.init_params(jax.random.PRNGKey(0), cfg), cfg,
                     -1.15, 3.53, ("Idle", "Swallow"))
    s2 = C.StageSpec(ast_mod.init_params(jax.random.PRNGKey(1), cfg), cfg,
                     -0.9, 2.8, ("Healthy", "Zenker"))
    eng = C.TwoStageEngine(
        s1, s2, C.CascadeConfig(batch_size=8, hop_sec=0.331,
                                dtype=jnp.float32))
    assert not eng._frame_reuse
    audio = (np.random.default_rng(0).standard_normal(48000) * 0.1
             ).astype(np.float32)
    p1, _ = eng.window_probs(audio)
    starts = C.window_starts(len(audio), 1.0, 0.331)
    assert len(p1) == len(starts)
    np.testing.assert_allclose(p1.sum(axis=1), 1.0, atol=1e-5)


def test_sample_path_audio_longer_than_bucketed_buffer(rng):
    """Generic (off-grid-hop) path: trailing audio past starts[-1]+win may
    exceed the pow2-bucketed buffer — it must be clamped (those samples are
    never windowed), not crash the copy. Regression: hop 0.625 s, 33000
    samples -> starts [0, 10000], bucket 32000 < 33000."""
    import jax
    import jax.numpy as jnp

    cfg = ast_mod.ASTConfig(hidden_size=16, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=32,
                            num_labels=2)
    s1 = C.StageSpec(ast_mod.init_params(jax.random.PRNGKey(0), cfg), cfg,
                     -1.15, 3.53, ("Idle", "Swallow"))
    s2 = C.StageSpec(ast_mod.init_params(jax.random.PRNGKey(1), cfg), cfg,
                     -0.9, 2.8, ("Healthy", "Zenker"))
    eng = C.TwoStageEngine(
        s1, s2, C.CascadeConfig(batch_size=8, hop_sec=0.625,
                                dtype=jnp.float32))
    assert not eng._frame_reuse
    audio = (rng.standard_normal(33000) * 0.1).astype(np.float32)
    p1, _ = eng.window_probs(audio)
    assert len(p1) == len(C.window_starts(33000, 1.0, 0.625))
    # the clamped run matches the same windows from exactly-fitting audio
    p1_fit, _ = eng.window_probs(audio[:26000])
    np.testing.assert_allclose(p1, p1_fit, atol=1e-6)


def test_summary_quirk_argmax_counts_vs_thresholded_gate(engine):
    """Reference quirk (src/test_long_audio_windows_2stage.py:150-153 vs
    :312-317): summary swallow counts use RAW argmax, while Stage-2
    selection uses the thresholded gate — with a high stage1 threshold,
    fewer windows are evaluated than counted as swallow."""
    import dataclasses

    import jax.numpy as jnp

    from zenker_audio_detection_tpu.infer import cascade as C

    eng = C.TwoStageEngine(
        engine.stage1, engine.stage2,
        dataclasses.replace(engine.config, stage1_threshold=0.99))
    s1 = np.array([[0.4, 0.6], [0.05, 0.95], [0.7, 0.3], [0.005, 0.995]])
    s2 = np.tile([[0.3, 0.7]], (4, 1))
    summary, preds, results, aligned = eng.gate_and_summarize(s1, s2)
    # argmax says 3 swallows; the 0.99 gate only forwards 1 (p=0.995)
    assert summary["stage1_swallow_windows"] == 3
    assert summary["stage2_swallow_windows_evaluated"] == 1
    assert [g for g, _ in results] == [3]
    assert aligned[3] == 1 and all(aligned[i] == -1 for i in (0, 1, 2))
    # zenker ratio denominators use the argmax count (reference :186-191)
    assert summary["stage2_zenker_ratio_over_swallow"] == pytest.approx(1 / 3)


def test_int16_audio_bit_identical_probs():
    """int16 PCM transferred raw and scaled on device must give the same
    probabilities as host-converted float32 (x * 2^-15 is exact in f32)."""
    import jax
    import jax.numpy as jnp

    from zenker_audio_detection_tpu.infer import cascade as C
    from zenker_audio_detection_tpu.models import ast as ast_mod

    cfg = ast_mod.ASTConfig(hidden_size=16, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=32,
                            num_labels=2)
    s1 = C.StageSpec(ast_mod.init_params(jax.random.PRNGKey(0), cfg), cfg,
                     -1.15, 3.53, ("Idle", "Swallow"))
    s2 = C.StageSpec(ast_mod.init_params(jax.random.PRNGKey(1), cfg), cfg,
                     -1.15, 3.53, ("Healthy", "Zenker"))
    eng = C.TwoStageEngine(s1, s2, C.CascadeConfig(batch_size=8,
                                                   dtype=jnp.float32))
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(16000 * 3) * 8000).astype(np.int16)
    p1_i, p2_i = eng.window_probs(pcm)
    p1_f, p2_f = eng.window_probs(pcm.astype(np.float32) / 32768.0)
    np.testing.assert_array_equal(p1_i, p1_f)
    np.testing.assert_array_equal(p2_i, p2_f)

    # sub-window recording exercises the generic (samples-gather) path too
    short = pcm[:12000]
    q1_i, _ = eng.window_probs(short)
    q1_f, _ = eng.window_probs(short.astype(np.float32) / 32768.0)
    np.testing.assert_array_equal(q1_i, q1_f)


def test_stage2_mode_validated(engine):
    """Anything but exactly 'gated'/'all' must be rejected at construction
    (a typo like 'All' would otherwise silently run gated mode)."""
    import jax.numpy as jnp

    for bad in ("All", "ALL", "speculative", ""):
        with pytest.raises(ValueError, match="stage2_mode"):
            C.TwoStageEngine(engine.stage1, engine.stage2,
                             C.CascadeConfig(batch_size=16,
                                             dtype=jnp.float32,
                                             stage2_mode=bad))
