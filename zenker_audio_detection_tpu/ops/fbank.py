"""Kaldi-compatible log-mel filterbank features for AST, TPU-first.

Replicates the numerics of the reference's feature path
(`transformers.ASTFeatureExtractor`, reference usage at
src/train_ast_stage1_cross_validation.py:455-458 and
src/test_long_audio_windows_2stage.py:104-113):

  frame (400 samples / 160 hop, snip-edges) -> per-frame DC removal ->
  preemphasis 0.97 -> symmetric Hann window -> 512-pt rFFT -> |.|^2 ->
  128 Kaldi-mel triangles (20 Hz .. Nyquist) -> max(floor) -> ln ->
  pad/truncate to 1024 frames -> (x - mean) / (2 * std)

TPU-first design: the DFT is *not* computed with an FFT op.  For a fixed
400-sample real frame zero-padded to 512, the rFFT is a linear map, so the
whole front-end collapses to three MXU matmuls

    power[k] = (frame @ C)[k]^2 + (frame @ S)[k]^2 ,  mel = power @ M

which XLA fuses with the surrounding elementwise work.  This keeps the
hot path on the systolic array with static shapes instead of the scalar
FFT butterflies a CPU/CUDA port would use.  `jnp.fft.rfft` remains as a
cross-check path (`use_matmul_dft=False`).

For long recordings the 1 s / 0.5 s-hop sliding windows share frames
(window w covers file-level frames [50w, 50w+98)); `logmel_frames` computes
the file-level frame matrix once and `window_features_from_frames` gathers
98-frame blocks, an 8x compute saving over per-window fbank at 0.5 s hop.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------------------
# Constants matching the AST feature contract.
# --------------------------------------------------------------------------
SAMPLING_RATE = 16000
FRAME_LENGTH = 400  # 25 ms
HOP_LENGTH = 160  # 10 ms
FFT_LENGTH = 512  # next pow2 of 400
NUM_FREQ_BINS = FFT_LENGTH // 2 + 1  # 257
NUM_MEL_BINS = 128
MAX_FRAMES = 1024
PREEMPHASIS = 0.97
MEL_FLOOR = 1.192092955078125e-07  # float32 eps, the Kaldi/HF log floor
MEL_FMIN = 20.0

# AudioSet defaults (ASTFeatureExtractor); the reference overrides these with
# per-fold dataset statistics (loaded from stats_per_fold.json).
AUDIOSET_MEAN = -4.2677393
AUDIOSET_STD = 4.5689974
# Reference fallback dataset stats (train_ast_stage1_cross_validation.py:104-105)
DATASET_FALLBACK_MEAN = -1.1509622
DATASET_FALLBACK_STD = 3.5340312


def num_frames(num_samples: int) -> int:
    """Snip-edges frame count: 1 + floor((N - 400) / 160); 0 if too short."""
    if num_samples < FRAME_LENGTH:
        return 0
    return 1 + (num_samples - FRAME_LENGTH) // HOP_LENGTH


def hertz_to_mel_kaldi(freq):
    return 1127.0 * np.log(1.0 + np.asarray(freq, dtype=np.float64) / 700.0)


def mel_filter_bank_kaldi(
    num_frequency_bins: int = NUM_FREQ_BINS,
    num_mel_filters: int = NUM_MEL_BINS,
    min_frequency: float = MEL_FMIN,
    max_frequency: float = SAMPLING_RATE / 2,
    sampling_rate: int = SAMPLING_RATE,
) -> np.ndarray:
    """Kaldi-scale triangular mel filters, triangularized in mel space.

    Matches `transformers.audio_utils.mel_filter_bank(..., norm=None,
    mel_scale="kaldi", triangularize_in_mel_space=True)`, the numerics the
    reference inherits via ASTFeatureExtractor.  Returns (num_freq, num_mel).
    """
    mel_min = hertz_to_mel_kaldi(min_frequency)
    mel_max = hertz_to_mel_kaldi(max_frequency)
    filter_mels = np.linspace(mel_min, mel_max, num_mel_filters + 2)

    fft_bin_width = sampling_rate / ((num_frequency_bins - 1) * 2)
    fft_mels = hertz_to_mel_kaldi(fft_bin_width * np.arange(num_frequency_bins))

    filter_diff = np.diff(filter_mels)
    slopes = filter_mels[None, :] - fft_mels[:, None]
    down_slopes = -slopes[:, :-2] / filter_diff[:-1]
    up_slopes = slopes[:, 2:] / filter_diff[1:]
    fbank = np.maximum(0.0, np.minimum(down_slopes, up_slopes))
    return fbank.astype(np.float64)


def hann_window_symmetric(length: int = FRAME_LENGTH) -> np.ndarray:
    """Symmetric (periodic=False) Hann window, Kaldi's "hanning"."""
    n = np.arange(length, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / (length - 1))


@functools.lru_cache(maxsize=4)
def _dft_matrices(frame_length: int = FRAME_LENGTH, fft_length: int = FFT_LENGTH):
    """Real/imag DFT matrices (frame_length, num_bins) for the matmul DFT.

    X[k] = sum_n f[n] * exp(-2*pi*i*k*n / fft_length); the zero-padding of the
    frame to fft_length contributes nothing, so only the first frame_length
    rows are needed.
    """
    n = np.arange(frame_length, dtype=np.float64)[:, None]
    k = np.arange(fft_length // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / fft_length
    cos_m = np.cos(ang)
    sin_m = -np.sin(ang)
    return cos_m.astype(np.float32), sin_m.astype(np.float32)


@functools.lru_cache(maxsize=4)
def _host_constants():
    window = hann_window_symmetric().astype(np.float32)
    mel = mel_filter_bank_kaldi().astype(np.float32)
    return window, mel


@dataclasses.dataclass(frozen=True)
class FbankConfig:
    """Feature extraction config mirroring ASTFeatureExtractor fields."""

    sampling_rate: int = SAMPLING_RATE
    num_mel_bins: int = NUM_MEL_BINS
    max_length: int = MAX_FRAMES
    do_normalize: bool = True
    mean: float = AUDIOSET_MEAN
    std: float = AUDIOSET_STD

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["feature_extractor_type"] = "ASTFeatureExtractor"
        return d


def frame_indices(n_frames: int) -> np.ndarray:
    """(n_frames, FRAME_LENGTH) sample-index matrix for snip-edges framing."""
    starts = np.arange(n_frames, dtype=np.int32)[:, None] * HOP_LENGTH
    offs = np.arange(FRAME_LENGTH, dtype=np.int32)[None, :]
    return starts + offs


def _frames_by_hop_slices(waveform: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """Snip-edges framing as reshape + 3 contiguous slices + concat.

    Sample-identical to `waveform[..., frame_indices(n_frames)]` but avoids
    the (n_frames, 400) gather, which dominates file-level fbank time on TPU
    (random-access loads). With FRAME_LENGTH = 400 = 2*HOP + 80, frame i is
    hop[i] ++ hop[i+1] ++ hop[i+2][:80]; the zero-pad up to (n_frames+2)
    hops only touches samples beyond what emitted frames read."""
    hop2 = FRAME_LENGTH - 2 * HOP_LENGTH
    assert 0 <= hop2 <= HOP_LENGTH, "framing trick requires 2h <= F <= 3h"
    need = (n_frames + 2) * HOP_LENGTH
    cur = waveform.shape[-1]
    if cur < need:
        widths = [(0, 0)] * (waveform.ndim - 1) + [(0, need - cur)]
        waveform = jnp.pad(waveform, widths)
    elif cur > need:
        waveform = waveform[..., :need]
    hops = waveform.reshape(waveform.shape[:-1] + (n_frames + 2, HOP_LENGTH))
    return jnp.concatenate(
        [hops[..., :-2, :], hops[..., 1:-1, :], hops[..., 2:, :hop2]],
        axis=-1)


def _preprocess_frames(frames: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Per-frame DC removal, preemphasis and windowing (Kaldi order)."""
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    head = frames[..., :1] * (1.0 - PREEMPHASIS)
    tail = frames[..., 1:] - PREEMPHASIS * frames[..., :-1]
    frames = jnp.concatenate([head, tail], axis=-1)
    return frames * window


def logmel_frames(
    waveform: jnp.ndarray,
    n_frames: int,
    *,
    use_matmul_dft: bool = True,
) -> jnp.ndarray:
    """Log-mel features for all frames of `waveform`.

    Args:
      waveform: (..., num_samples) float32 audio at 16 kHz.
      n_frames: static frame count (use `num_frames(num_samples)`).
      use_matmul_dft: compute the DFT as two MXU matmuls (TPU fast path)
        instead of `jnp.fft.rfft`.

    Returns:
      (..., n_frames, NUM_MEL_BINS) float32 log-mel features (unnormalized,
      unpadded) — identical content to Kaldi fbank / HF ASTFeatureExtractor
      before the pad-to-1024 + normalize steps.
    """
    if n_frames <= 0:
        raise ValueError(
            f"waveform too short for even one {FRAME_LENGTH}-sample frame "
            f"(got n_frames={n_frames}); minimum is {FRAME_LENGTH} samples"
        )
    window_np, mel_np = _host_constants()
    window = jnp.asarray(window_np)
    mel = jnp.asarray(mel_np)

    # int16 PCM is accepted and scaled on device: transferring int16 halves
    # host->device traffic for long recordings (the engine's biggest
    # non-compute cost), and x/32768 here equals the host-side conversion.
    if waveform.dtype == jnp.int16:
        waveform = waveform.astype(jnp.float32) * (1.0 / 32768.0)
    frames = _frames_by_hop_slices(waveform, n_frames)  # (..., n_frames, 400)
    frames = _preprocess_frames(frames, window)

    # The DFT/mel matmuls must run in true f32: the TPU MXU's default bf16
    # passes lose ~8 mantissa bits, and the log amplifies that into O(0.5)
    # errors in low-power mel bins (observed on-chip).  'highest' selects the
    # multi-pass f32 MXU mode.
    if use_matmul_dft:
        cos_np, sin_np = _dft_matrices()
        cos_m = jnp.asarray(cos_np)
        sin_m = jnp.asarray(sin_np)
        re = jnp.matmul(frames, cos_m, precision="highest",
                        preferred_element_type=jnp.float32)
        im = jnp.matmul(frames, sin_m, precision="highest",
                        preferred_element_type=jnp.float32)
        power = re * re + im * im
    else:
        spec = jnp.fft.rfft(frames, n=FFT_LENGTH, axis=-1)
        power = jnp.abs(spec) ** 2

    mel_energies = jnp.matmul(power, mel, precision="highest",
                              preferred_element_type=jnp.float32)
    mel_energies = jnp.maximum(mel_energies, MEL_FLOOR)
    return jnp.log(mel_energies)


def pad_and_normalize(
    feats: jnp.ndarray,
    config: FbankConfig = FbankConfig(),
) -> jnp.ndarray:
    """Pad/truncate frame axis to max_length, then (x - mean) / (2 * std).

    Note the HF order: padding zeros are *also* normalized, so padded rows
    become (0 - mean) / (2 std) after normalization.
    """
    t = feats.shape[-2]
    if t < config.max_length:
        pad = [(0, 0)] * (feats.ndim - 2) + [(0, config.max_length - t), (0, 0)]
        feats = jnp.pad(feats, pad)
    elif t > config.max_length:
        feats = feats[..., : config.max_length, :]
    if config.do_normalize:
        feats = (feats - config.mean) / (config.std * 2.0)
    return feats


def ast_features(
    waveforms: jnp.ndarray,
    config: FbankConfig = FbankConfig(),
    *,
    use_matmul_dft: bool = True,
) -> jnp.ndarray:
    """Full AST feature path: (B, num_samples) -> (B, max_length, 128).

    Equivalent to `ASTFeatureExtractor.__call__` on a batch of equal-length
    waveforms (the reference always featurizes fixed 1 s windows).

    A sub-frame waveform (< 400 samples, i.e. zero whole frames) yields
    all-pad features, exactly as HF does — the extractor pads the empty
    fbank to max_length and normalizes, so every row is (0 - mean)/(2 std).
    (`logmel_frames` itself still raises on n_frames<=0: zero frames is a
    caller bug on the window/streaming paths, which own their geometry.)
    """
    n = num_frames(waveforms.shape[-1])
    if n <= 0:
        feats = jnp.zeros(waveforms.shape[:-1] + (0, NUM_MEL_BINS), jnp.float32)
        return pad_and_normalize(feats, config)
    feats = logmel_frames(waveforms, n, use_matmul_dft=use_matmul_dft)
    return pad_and_normalize(feats, config)


# --------------------------------------------------------------------------
# Frame-reuse path for long-audio sliding windows.
# --------------------------------------------------------------------------


def window_frame_geometry(window_sec: float, hop_sec: float, sr: int = SAMPLING_RATE):
    """Frames-per-window and frame-hop between successive windows.

    Valid when the window hop in samples is a multiple of HOP_LENGTH (true for
    the reference's 1.0 s / 0.5 s grid: 8000 = 50 * 160), which makes every
    window frame bit-identical to a file-level frame.
    """
    win = int(window_sec * sr)
    hop = int(hop_sec * sr)
    if hop % HOP_LENGTH != 0:
        raise ValueError(
            f"window hop {hop} samples is not a multiple of the frame hop "
            f"{HOP_LENGTH}; frame reuse is not exact"
        )
    return num_frames(win), hop // HOP_LENGTH


def window_features_from_frames(
    file_frames: jnp.ndarray,
    window_starts: jnp.ndarray,
    frames_per_window: int,
    config: FbankConfig = FbankConfig(),
) -> jnp.ndarray:
    """Gather per-window AST features from file-level log-mel frames.

    Args:
      file_frames: (n_file_frames, 128) from `logmel_frames` on the file.
      window_starts: (W,) int32 frame index of each window's first frame.
      frames_per_window: static frames per window (98 for 1 s windows).

    Returns:
      (W, max_length, 128) normalized features, identical to featurizing each
      window's samples independently.
    """
    # JAX gather CLAMPS out-of-range indices, which would silently repeat
    # the file's last frame instead of honoring the "identical to per-window
    # featurization" contract — validate when the starts are concrete
    # (under jit tracing the caller owns the bound).
    if not isinstance(window_starts, jax.core.Tracer):
        starts = np.asarray(window_starts)
        n_file = int(file_frames.shape[0])
        if starts.size and (starts.min() < 0
                            or int(starts.max()) + frames_per_window > n_file):
            raise ValueError(
                f"window_starts out of range: starts in "
                f"[{int(starts.min())}, {int(starts.max())}] with "
                f"frames_per_window={frames_per_window} exceed the "
                f"{n_file} file frames")
    offs = jnp.arange(frames_per_window, dtype=jnp.int32)[None, :]
    idx = window_starts[:, None] + offs  # (W, frames_per_window)
    feats = file_frames[idx]  # (W, fpw, 128)
    return pad_and_normalize(feats, config)
