"""Tests for the augmentation pipeline (distribution/behavioral checks —
exact audiomentations RNG parity is out of scope per SURVEY §7)."""

import numpy as np
import pytest

from zenker_audio_detection_tpu.data import augment as A


@pytest.fixture
def tone():
    t = np.arange(16000) / 16000
    return np.sin(2 * np.pi * 440 * t).astype(np.float64)


def _peak_freq(x, sr=16000):
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return np.argmax(spec) * sr / len(x)


def test_augment_preserves_length_and_dtype(tone, rng):
    for _ in range(10):
        y = A.augment_waveform(tone, rng)
        assert y.shape == tone.shape
        assert y.dtype == np.float32


def test_augment_deterministic_given_rng(tone):
    a = A.augment_waveform(tone, np.random.default_rng(5))
    b = A.augment_waveform(tone, np.random.default_rng(5))
    np.testing.assert_array_equal(a, b)


def test_compose_probability_zero_is_identity(tone):
    y = A.augment_waveform(tone, np.random.default_rng(0), p_compose=0.0)
    np.testing.assert_allclose(y, tone.astype(np.float32), atol=0)


def test_gaussian_snr_in_range(tone, rng):
    y = A.add_gaussian_snr(tone, rng, 10, 20)
    noise = y - tone
    snr_db = 20 * np.log10(np.sqrt(np.mean(tone ** 2))
                           / np.sqrt(np.mean(noise ** 2)))
    assert 8 < snr_db < 22


def test_gain_bounds(tone, rng):
    for _ in range(5):
        y = A.gain(tone, rng, -6, 6)
        ratio = np.max(np.abs(y)) / np.max(np.abs(tone))
        assert 10 ** (-6 / 20) - 1e-6 <= ratio <= 10 ** (6 / 20) + 1e-6


def test_clipping_distortion_reduces_peaks(rng):
    x = rng.standard_normal(16000)
    y = A.clipping_distortion(x, np.random.default_rng(1), 20, 30)
    assert np.max(np.abs(y)) < np.max(np.abs(x))
    assert y.shape == x.shape


def test_time_mask_zeroes_band(tone, rng):
    y = A.time_mask(tone, rng, 0.1, 0.2)
    zeros = np.sum(y == 0.0)
    assert 0.1 * len(tone) * 0.9 <= zeros <= 0.2 * len(tone) * 1.1


def test_time_stretch_keeps_length_changes_tempo(tone):
    y = A.phase_vocoder_stretch(tone, 1.25)
    assert abs(len(y) - int(round(len(tone) / 1.25))) <= 1
    # tone frequency unchanged by time stretch
    assert abs(_peak_freq(y) - 440) < 6


def test_pitch_shift_moves_frequency(tone):
    y = A.pitch_shift(tone, 4.0, 16000)
    assert len(y) == len(tone)
    expected = 440 * 2 ** (4 / 12)
    assert abs(_peak_freq(y) - expected) < 12


def test_pitch_shift_down(tone):
    y = A.pitch_shift(tone, -4.0, 16000)
    expected = 440 * 2 ** (-4 / 12)
    assert abs(_peak_freq(y) - expected) < 12


def test_augment_waveform_always_finite_and_shape_preserving():
    """Property: the full 7-transform Compose never emits non-finite
    samples or changes length, across amplitudes spanning the corpus
    range (1e-4 .. 0.95) and odd lengths, including all-zero input."""
    rng = np.random.default_rng(0)
    for seed in range(30):
        arng = np.random.default_rng(seed)
        n = int(rng.integers(1600, 32000))
        x = (rng.standard_normal(n)
             * rng.choice([1e-4, 0.01, 0.3, 0.95])).astype(np.float32)
        out = A.augment_waveform(x, arng)
        assert out.shape == x.shape
        assert np.isfinite(out).all()
    for n in (1600, 1601, 15999):  # zero input, odd lengths
        out = A.augment_waveform(np.zeros(n, np.float32),
                                 np.random.default_rng(1))
        assert out.shape == (n,) and np.isfinite(out).all()
