"""Golden-vector parity tests for the fbank front-end.

The normative implementation is `transformers.ASTFeatureExtractor` (the
reference uses it in every train/test/infer script, e.g.
src/test_long_audio_windows_2stage.py:104-113).  With torchaudio absent, HF
uses its numpy Kaldi-compatible path, which is the documented equivalent of
`torchaudio.compliance.kaldi.fbank` to ~1e-4.
"""

import numpy as np
import pytest

from zenker_audio_detection_tpu.ops import fbank as F

transformers = pytest.importorskip("transformers")
from transformers import ASTFeatureExtractor  # noqa: E402


@pytest.fixture(scope="module")
def fx():
    return ASTFeatureExtractor()  # AudioSet mean/std defaults


def _rand_wave(rng, n):
    # Realistic scale: PCM16-ish normalized audio plus a DC offset to
    # exercise the per-frame DC removal.
    return (rng.standard_normal(n) * 0.1 + 0.01).astype(np.float32)


def test_mel_filters_match_transformers():
    from transformers.audio_utils import mel_filter_bank

    ref = mel_filter_bank(
        num_frequency_bins=257,
        num_mel_filters=128,
        min_frequency=20,
        max_frequency=8000,
        sampling_rate=16000,
        norm=None,
        mel_scale="kaldi",
        triangularize_in_mel_space=True,
    )
    ours = F.mel_filter_bank_kaldi()
    np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_window_matches_transformers():
    from transformers.audio_utils import window_function

    ref = window_function(400, "hann", periodic=False)
    np.testing.assert_allclose(F.hann_window_symmetric(), ref, atol=1e-12)


def test_num_frames():
    assert F.num_frames(16000) == 98
    assert F.num_frames(400) == 1
    assert F.num_frames(399) == 0
    assert F.num_frames(560) == 2


@pytest.mark.parametrize("use_matmul_dft", [True, False])
def test_ast_features_parity_1s(fx, rng, use_matmul_dft):
    wave = _rand_wave(rng, 16000)
    ref = fx(wave, sampling_rate=16000, return_tensors="np")["input_values"][0]
    ours = np.asarray(
        F.ast_features(wave[None, :], use_matmul_dft=use_matmul_dft)[0]
    )
    assert ours.shape == (1024, 128)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-4)


def test_ast_features_parity_short_clip(fx, rng):
    # 0.5 s clip -> 48 frames, the rest is pad.
    wave = _rand_wave(rng, 8000)
    ref = fx(wave, sampling_rate=16000, return_tensors="np")["input_values"][0]
    ours = np.asarray(F.ast_features(wave[None, :])[0])
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-4)


def test_ast_features_batch(fx, rng):
    waves = np.stack([_rand_wave(rng, 16000) for _ in range(3)])
    ref = fx([w for w in waves], sampling_rate=16000, return_tensors="np")[
        "input_values"
    ]
    ours = np.asarray(F.ast_features(waves))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-4)


def test_custom_mean_std(rng):
    wave = _rand_wave(rng, 16000)
    fx2 = ASTFeatureExtractor(mean=-1.1509622, std=3.5340312)
    ref = fx2(wave, sampling_rate=16000, return_tensors="np")["input_values"][0]
    cfg = F.FbankConfig(mean=-1.1509622, std=3.5340312)
    ours = np.asarray(F.ast_features(wave[None, :], cfg)[0])
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-4)


def test_frame_reuse_matches_per_window(rng):
    """1 s windows at 0.5 s hop gathered from file-level frames must equal
    per-window featurization exactly (frames are shared on the 160-sample
    grid; see SURVEY §5.7)."""
    import jax.numpy as jnp

    audio = _rand_wave(rng, 16000 * 4)  # 4 s -> 7 windows
    win, hop = 16000, 8000
    starts = np.arange(0, len(audio) - win + 1, hop)
    per_window = np.stack(
        [np.asarray(F.ast_features(audio[None, s : s + win])[0]) for s in starts]
    )

    n_file_frames = F.num_frames(len(audio))
    file_frames = F.logmel_frames(jnp.asarray(audio), n_file_frames)
    fpw, frame_hop = F.window_frame_geometry(1.0, 0.5)
    assert (fpw, frame_hop) == (98, 50)
    wstarts = jnp.asarray(np.arange(len(starts)) * frame_hop, dtype=np.int32)
    reused = np.asarray(
        F.window_features_from_frames(file_frames, wstarts, fpw)
    )
    np.testing.assert_allclose(reused, per_window, atol=1e-5, rtol=1e-5)


def test_frame_reuse_rejects_out_of_range_starts(rng):
    """JAX gather clamps out-of-range indices (it would silently repeat the
    last file frame); concrete starts past the end must raise instead."""
    import jax.numpy as jnp

    audio = _rand_wave(rng, 16000)
    n_file_frames = F.num_frames(len(audio))
    file_frames = F.logmel_frames(jnp.asarray(audio), n_file_frames)
    fpw, _ = F.window_frame_geometry(1.0, 0.5)
    bad = jnp.asarray([0, n_file_frames - fpw + 1], dtype=jnp.int32)
    with pytest.raises(ValueError, match="out of range"):
        F.window_features_from_frames(file_frames, bad, fpw)
    with pytest.raises(ValueError, match="out of range"):
        F.window_features_from_frames(
            file_frames, jnp.asarray([-1], dtype=jnp.int32), fpw)


def test_ast_features_randomized_lengths(fx, rng):
    """Differential parity at random waveform lengths (deterministic draw).

    The fixed tests pin 1 s and 0.5 s clips; the pad/truncate boundary
    logic (num_frames rounding, zero-pad to max_length=1024 frames,
    truncation past 1024) must hold for any length — including the exact
    163,840-sample boundary (1024 frames), one hop either side of it,
    sub-frame clips, and lengths not on the 160-sample hop grid.
    """
    r = np.random.default_rng(48151623)
    lengths = [399, 400, 401, 163680, 163840, 164000, 170000] + [
        int(v) for v in r.integers(300, 200_000, size=5)
    ]
    for n in lengths:
        wave = _rand_wave(r, n)
        ref = fx(wave, sampling_rate=16000, return_tensors="np")["input_values"][0]
        ours = np.asarray(F.ast_features(wave[None, :])[0])
        assert ours.shape == ref.shape == (1024, 128), n
        np.testing.assert_allclose(
            ours, ref, atol=5e-4, rtol=1e-4, err_msg=f"length {n}"
        )


def test_ast_features_subframe_all_pad(fx):
    """A <400-sample clip yields all-pad features, exactly as HF (found by
    the randomized-length differential test: HF pads the empty fbank and
    normalizes; raising here would fail files the reference handles)."""
    wave = np.full(399, 0.01, np.float32)
    ref = fx(wave, sampling_rate=16000, return_tensors="np")["input_values"][0]
    ours = np.asarray(F.ast_features(wave[None, :])[0])
    assert ours.shape == (1024, 128)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-4)


@pytest.mark.slow
def test_frame_reuse_randomized_geometry(rng):
    """Frame reuse must equal per-window featurization for ANY window/hop
    on the 160-sample frame grid, not just the reference's 1.0 s / 0.5 s —
    6 random (file length, window, hop) draws, incl. a window shorter than
    max_length*HOP (pad path) and windows ending at the file's last frame."""
    import jax.numpy as jnp

    r = np.random.default_rng(31337)
    for trial in range(6):
        win_sec = float(r.integers(4, 21)) / 10.0  # 0.4 .. 2.0 s
        hop_sec = float(r.integers(1, 11)) / 10.0  # 0.1 .. 1.0 s
        win = int(win_sec * 16000)
        n = win + int(r.integers(0, 16000 * 3))
        audio = _rand_wave(r, n)
        fpw, frame_hop = F.window_frame_geometry(win_sec, hop_sec)
        n_file_frames = F.num_frames(n)
        max_start = n_file_frames - fpw
        starts_f = np.arange(0, max_start + 1, frame_hop, dtype=np.int32)
        if not len(starts_f):
            continue
        per_window = np.stack([
            np.asarray(F.ast_features(
                audio[None, s * F.HOP_LENGTH: s * F.HOP_LENGTH + win])[0])
            for s in starts_f
        ])
        file_frames = F.logmel_frames(jnp.asarray(audio), n_file_frames)
        reused = np.asarray(F.window_features_from_frames(
            file_frames, jnp.asarray(starts_f), fpw))
        np.testing.assert_allclose(
            reused, per_window, atol=1e-5, rtol=1e-5,
            err_msg=f"trial {trial}: win={win_sec}s hop={hop_sec}s n={n}")
