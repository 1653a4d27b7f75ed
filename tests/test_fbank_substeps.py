"""Golden sub-step tests for the fbank front-end (SURVEY §7 hard part 1:
each Kaldi detail shifts logits — pin them individually, not just the
end-to-end HF parity in test_fbank.py)."""

import numpy as np
import pytest

from zenker_audio_detection_tpu.ops import fbank as F


def test_frame_indices_snip_edges():
    idx = F.frame_indices(3)
    assert idx.shape == (3, 400)
    np.testing.assert_array_equal(idx[:, 0], [0, 160, 320])
    np.testing.assert_array_equal(idx[1], np.arange(160, 560))


def test_dc_removal_before_preemphasis(rng):
    """Kaldi order: per-frame mean removal happens BEFORE preemphasis —
    swapping the order changes the result."""
    import jax.numpy as jnp

    frames = jnp.asarray(rng.standard_normal((2, 400)) + 0.5, jnp.float32)
    window = jnp.ones(400, jnp.float32)
    got = np.asarray(F._preprocess_frames(frames, window))

    f = np.asarray(frames, np.float64)
    f = f - f.mean(axis=-1, keepdims=True)          # DC first
    pre = np.concatenate([f[:, :1] * (1 - 0.97),    # Kaldi head convention
                          f[:, 1:] - 0.97 * f[:, :-1]], axis=-1)
    np.testing.assert_allclose(got, pre, atol=1e-5)

    # wrong order produces a different result
    g = np.asarray(frames, np.float64)
    pre_first = np.concatenate([g[:, :1] * (1 - 0.97),
                                g[:, 1:] - 0.97 * g[:, :-1]], axis=-1)
    pre_first -= pre_first.mean(axis=-1, keepdims=True)
    assert np.abs(pre_first - got).max() > 1e-3


def test_matmul_dft_equals_rfft(rng):
    """The MXU matmul DFT is exactly the zero-padded 512-pt rFFT."""
    cos_m, sin_m = F._dft_matrices()
    frame = rng.standard_normal(400).astype(np.float32)
    re = frame @ cos_m
    im = frame @ sin_m
    ref = np.fft.rfft(frame, n=512)
    np.testing.assert_allclose(re, ref.real, atol=1e-2)
    np.testing.assert_allclose(im, ref.imag, atol=1e-2)
    # power spectrum parity at f32-friendly tolerance
    np.testing.assert_allclose(re**2 + im**2, np.abs(ref)**2,
                               rtol=1e-4, atol=1e-3)


def test_mel_floor_applied(rng):
    """Silent input hits exactly log(float32-eps), the Kaldi/HF floor."""
    import jax.numpy as jnp

    silent = jnp.zeros((1, 16000), jnp.float32)
    feats = np.asarray(F.logmel_frames(silent, 98))
    np.testing.assert_allclose(feats, np.log(F.MEL_FLOOR), atol=1e-5)


def test_pad_rows_normalized_not_zero():
    """HF order: pad to 1024 THEN normalize — pad rows equal (0-m)/(2s)."""
    import jax.numpy as jnp

    feats = jnp.ones((1, 98, 128), jnp.float32)
    cfg = F.FbankConfig(mean=-1.0, std=2.0)
    out = np.asarray(F.pad_and_normalize(feats, cfg))
    assert out.shape == (1, 1024, 128)
    np.testing.assert_allclose(out[0, 98:], (0 - (-1.0)) / (2 * 2.0))
    np.testing.assert_allclose(out[0, :98], (1 - (-1.0)) / (2 * 2.0))


def test_truncation_beyond_max_length(rng):
    import jax.numpy as jnp

    feats = jnp.asarray(rng.standard_normal((1, 1100, 128)), jnp.float32)
    out = F.pad_and_normalize(feats, F.FbankConfig(do_normalize=False))
    assert out.shape == (1, 1024, 128)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(feats)[:, :1024])
