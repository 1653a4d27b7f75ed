"""Tests for WAV IO and the torchaudio-compatible polyphase resampler.

torchaudio itself is absent from this environment, so resampler parity is
checked against golden values computed from the identical filter-design
formulas (float64, validated invariants): tone-frequency preservation,
passband flatness, aliasing rejection, linearity, and torchaudio's exact
output-length contract.
"""

import numpy as np
import pytest

from zenker_audio_detection_tpu.audio import io as aio
from zenker_audio_detection_tpu.ops import resample as R


# ----------------------------- WAV IO -----------------------------


def test_wav_roundtrip_int16(tmp_path, rng):
    x = np.clip(rng.standard_normal(16000) * 0.3, -0.9, 0.9).astype(np.float32)
    p = str(tmp_path / "a.wav")
    aio.write_wav(p, x, 16000)
    y, sr = aio.read_wav(p)
    assert sr == 16000 and y.shape == (1, 16000)
    np.testing.assert_allclose(y[0], x, atol=1.0 / 32768)


def test_wav_roundtrip_float32(tmp_path, rng):
    x = rng.standard_normal((2, 8000)).astype(np.float32) * 0.5
    p = str(tmp_path / "st.wav")
    aio.write_wav(p, x, 44100, dtype="float32")
    y, sr = aio.read_wav(p)
    assert sr == 44100 and y.shape == (2, 8000)
    np.testing.assert_allclose(y, x, atol=0)


def test_wav_stdlib_compat(tmp_path, rng):
    """Our PCM16 files must be readable by the stdlib wave module and
    vice versa."""
    import wave

    x = (rng.standard_normal(4000) * 0.2).astype(np.float32)
    p = str(tmp_path / "w.wav")
    aio.write_wav(p, x, 48000)
    with wave.open(p) as w:
        assert w.getframerate() == 48000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        raw = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    ours, sr = aio.read_wav(p)
    np.testing.assert_allclose(ours[0], raw.astype(np.float32) / 32768.0)


def test_load_audio_mono_mean_and_resample(tmp_path):
    """load_audio = channel mean + resample (reference
    src/test_long_audio_windows_2stage.py:53-59)."""
    t = np.arange(48000 * 2) / 48000
    left = np.sin(2 * np.pi * 440 * t).astype(np.float32) * 0.5
    right = np.zeros_like(left)
    p = str(tmp_path / "st48.wav")
    aio.write_wav(p, np.stack([left, right]), 48000, dtype="float32")
    y = aio.load_audio(p)
    assert y.shape == (32000,)
    # channel mean halves the amplitude; tone survives resampling
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    f_peak = np.argmax(spec) * 16000 / len(y)
    assert abs(f_peak - 440) < 2


# ----------------------------- Resampler -----------------------------


def test_length_contract():
    # torchaudio: target_length = ceil(new_freq * length / orig_freq)
    for n, o, nf in [(48000, 48000, 16000), (44100, 44100, 16000),
                     (12345, 44100, 16000), (16000, 16000, 16000)]:
        out = R.resample(np.zeros(n, np.float32), o, nf)
        assert out.shape[-1] == int(np.ceil(nf * n / o))


def test_tone_preservation_48k_to_16k():
    sr, new = 48000, 16000
    t = np.arange(sr) / sr
    for f in [440.0, 1000.0, 3000.0]:
        x = np.sin(2 * np.pi * f * t).astype(np.float32)
        y = R.resample(x, sr, new)
        n = len(y)
        w = np.hanning(n)
        spec = np.abs(np.fft.rfft(y * w))
        peak = np.argmax(spec)
        assert abs(peak * new / n - f) < 2.0
        # passband gain ~1 (within 1%): compare to windowed pure tone energy
        ref = np.abs(np.fft.rfft(np.sin(2 * np.pi * f * np.arange(n) / new) * w))
        assert abs(spec[peak] / ref[np.argmax(ref)] - 1.0) < 0.01


def test_aliasing_rejection():
    """Content above the new Nyquist must be strongly attenuated."""
    sr, new = 48000, 16000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 11000 * t).astype(np.float32)  # > 8 kHz Nyquist
    y = R.resample(x, sr, new)
    assert np.sqrt(np.mean(y[200:-200] ** 2)) < 0.02  # vs 0.707 input RMS


def test_linearity_and_dtype(rng):
    x1 = rng.standard_normal(44100).astype(np.float32)
    x2 = rng.standard_normal(44100).astype(np.float32)
    a = R.resample(x1 + 2.0 * x2, 44100, 16000)
    b = R.resample(x1, 44100, 16000) + 2.0 * R.resample(x2, 44100, 16000)
    np.testing.assert_allclose(a, b, atol=1e-5)
    assert a.dtype == np.float32


def test_identity_when_equal_rates(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    np.testing.assert_array_equal(R.resample(x, 16000, 16000), x)


def test_batched_shapes(rng):
    x = rng.standard_normal((3, 2, 48000)).astype(np.float32)
    y = R.resample(x, 48000, 16000)
    assert y.shape == (3, 2, 16000)
    np.testing.assert_allclose(y[1, 0], R.resample(x[1, 0], 48000, 16000),
                               atol=1e-6)


def test_jax_matches_host(rng):
    x = rng.standard_normal(44100).astype(np.float32)
    host = R.resample(x, 44100, 16000)
    dev = np.asarray(R.resample_jax(x, 44100, 16000))
    assert dev.shape == host.shape
    np.testing.assert_allclose(dev, host, atol=2e-5)


def test_kernel_matches_torchaudio_formula():
    """Spot-check the filter design against values computed symbolically from
    the torchaudio algorithm (sinc_interp_hann, width=6, rolloff=0.99)."""
    kernels, width = R._design_kernel(3, 1)  # 48 k -> 16 k
    base_freq = 1 * 0.99
    assert width == int(np.ceil(6 * 3 / base_freq))
    idx = np.arange(-width, width + 3, dtype=np.float64) / 3
    t = np.clip(idx * base_freq, -6, 6)
    win = np.cos(t * np.pi / 6 / 2) ** 2
    tt = t * np.pi
    expected = np.where(tt == 0, 1.0, np.sin(tt) / np.where(tt == 0, 1, tt))
    expected = expected * win * (base_freq / 3)
    np.testing.assert_allclose(kernels[0], expected, atol=1e-15)
    assert kernels.shape == (1, len(idx))


def test_load_audio_compact_fast_path(tmp_path, rng):
    """Mono PCM16 @ 16 kHz stays int16 (raw samples); anything else falls
    back to the float32 reference loader."""
    x = np.clip(rng.standard_normal(16000) * 0.3, -0.9, 0.9).astype(np.float32)
    p16 = str(tmp_path / "mono16k.wav")
    aio.write_wav(p16, x, 16000)  # PCM16
    raw = aio.load_audio_compact(p16)
    assert raw.dtype == np.int16
    np.testing.assert_allclose(raw.astype(np.float32) / 32768.0,
                               aio.load_audio(p16), atol=0)

    pf = str(tmp_path / "float.wav")
    aio.write_wav(pf, x, 16000, dtype="float32")
    out = aio.load_audio_compact(pf)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, aio.load_audio(pf))

    p44 = str(tmp_path / "sr44k.wav")
    aio.write_wav(p44, x, 44100)
    out44 = aio.load_audio_compact(p44)
    assert out44.dtype == np.float32  # resampled path


def test_decoders_handle_streaming_recorder_headers(tmp_path, rng):
    """The decode layer must share discovery.wav_num_frames' robustness:
    a size-0 data-chunk placeholder (unfinalized recorder header) decodes
    the full audio instead of an empty array, an over-declared/0xFFFFFFFF
    size truncated mid-sample doesn't crash frombuffer, and an explicitly
    empty data chunk followed by a known trailing chunk stays empty."""
    import struct

    x = np.clip(rng.standard_normal(16000) * 0.3, -0.9, 0.9).astype(np.float32)
    p = str(tmp_path / "a.wav")
    aio.write_wav(p, x, 16000)  # mono PCM16 @ 16k
    raw = bytearray(open(p, "rb").read())
    idx = raw.find(b"data")

    # size-0 placeholder, samples to EOF
    q = tmp_path / "placeholder.wav"
    q.write_bytes(raw[:idx + 4] + struct.pack("<I", 0) + raw[idx + 8:])
    ref = aio.load_audio(p)
    np.testing.assert_array_equal(aio.load_audio(str(q)), ref)
    compact = aio.load_audio_compact(str(q))
    assert compact.dtype == np.int16 and len(compact) == 16000

    # 0xFFFFFFFF placeholder + odd trailing byte (truncated mid-sample)
    r = tmp_path / "truncated.wav"
    r.write_bytes(raw[:idx + 4] + struct.pack("<I", 0xFFFFFFFF)
                  + raw[idx + 8:-1])
    out = aio.load_audio(str(r))
    np.testing.assert_array_equal(out, ref[:-1])

    # genuinely empty data chunk + LIST metadata stays empty
    s = tmp_path / "empty.wav"
    payload = bytes(raw[idx + 8:])
    s.write_bytes(raw[:idx + 4] + struct.pack("<I", 0)
                  + b"LIST" + struct.pack("<I", len(payload)) + payload)
    assert len(aio.load_audio(str(s))) == 0


def test_logmel_accepts_int16(rng):
    """Device-side int16 scaling is bit-identical to host conversion."""
    import jax.numpy as jnp

    from zenker_audio_detection_tpu.ops import fbank as F

    pcm = (rng.standard_normal(16000) * 8000).astype(np.int16)
    a = np.asarray(F.logmel_frames(jnp.asarray(pcm), F.num_frames(16000)))
    b = np.asarray(F.logmel_frames(
        jnp.asarray(pcm.astype(np.float32) / 32768.0), F.num_frames(16000)))
    np.testing.assert_array_equal(a, b)


def test_read_wav_corrupt_headers_raise_valueerror(tmp_path, rng):
    """Corrupt fmt headers (the unfinalized-recorder shapes) must surface
    as read_wav's ValueError contract — not raw struct.error /
    ZeroDivisionError / SIGFPE deep in the decode or resample layers."""
    import struct

    x = np.clip(rng.standard_normal(8000) * 0.3, -0.9, 0.9).astype(np.float32)
    p = str(tmp_path / "ok.wav")
    aio.write_wav(p, x, 16000)
    raw = bytearray(open(p, "rb").read())
    fmt_at = raw.find(b"fmt ") + 8  # start of the fmt body

    def variant(name, mutate):
        buf = bytearray(raw)
        mutate(buf)
        q = tmp_path / name
        q.write_bytes(bytes(buf))
        return str(q)

    # channels = 0
    zero_ch = variant("zero_ch.wav", lambda b: b.__setitem__(
        slice(fmt_at + 2, fmt_at + 4), struct.pack("<H", 0)))
    # sample_rate = 0
    zero_sr = variant("zero_sr.wav", lambda b: b.__setitem__(
        slice(fmt_at + 4, fmt_at + 8), struct.pack("<I", 0)))
    # EXTENSIBLE format tag with only a 16-byte fmt body
    ext_short = variant("ext_short.wav", lambda b: b.__setitem__(
        slice(fmt_at, fmt_at + 2), struct.pack("<H", 0xFFFE)))
    for path in (zero_ch, zero_sr, ext_short):
        with pytest.raises(ValueError, match=r"invalid WAV|truncated"):
            aio.read_wav(path)
        with pytest.raises(ValueError):
            aio.load_audio(path)

    # a fmt chunk shorter than 16 bytes
    idx = raw.find(b"fmt ")
    short = tmp_path / "short_fmt.wav"
    short.write_bytes(bytes(raw[:idx + 4]) + struct.pack("<I", 8)
                      + bytes(raw[idx + 8: idx + 16]) + bytes(raw[idx + 24:]))
    with pytest.raises(ValueError, match="truncated"):
        aio.read_wav(str(short))


def test_resample_rejects_invalid_rates(rng):
    from zenker_audio_detection_tpu.ops import resample as R

    x = rng.standard_normal(100).astype(np.float32)
    for bad in ((0, 16000), (16000, 0), (-8000, 16000)):
        with pytest.raises(ValueError, match="invalid resample rates"):
            R.resample(x, *bad)


def test_resample_kernel_cost_guard(rng):
    """The guard bounds the REDUCED ratio's kernel table, not the raw rate:
    augmentation's fictitious pitch-shift rates (1536000->1232000 = 96:77)
    must pass, while a corrupt u32 header rate (reduces huge) must raise —
    previously a multi-GB swap-hang."""
    from zenker_audio_detection_tpu.ops import resample as R

    x = rng.standard_normal(400).astype(np.float32)
    big = R.resample(x, 1536000, 1232000)
    np.testing.assert_array_equal(big, R.resample(x, 9600, 7700))  # = 96:77
    for fn in (R.resample, R.resample_jax):
        with pytest.raises(ValueError, match="kernel table"):
            fn(x, 4_000_000_001, 16000)


def _fuzz_wav_corpus(rng, n_flip=150, n_garbage=50):
    """Deterministic corrupt-WAV corpus: truncations at every boundary,
    random byte flips of a valid file, random garbage, and pathological
    declared sizes (incl. u32-max sample rates that previously drove the
    polyphase kernel design into a multi-GB swap-hang)."""
    import struct

    x = (rng.standard_normal(600) * 8000).astype(np.int16)
    base = bytearray()
    base += b"RIFF" + struct.pack("<I", 36 + len(x) * 2) + b"WAVE"
    base += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
    base += b"data" + struct.pack("<I", len(x) * 2) + x.tobytes()
    cases = [bytes(base[:cut]) for cut in range(0, len(base), 13)]
    for _ in range(n_flip):
        buf = bytearray(base)
        for _ in range(rng.integers(1, 8)):
            buf[rng.integers(len(buf))] = rng.integers(256)
        cases.append(bytes(buf))
    for _ in range(n_garbage):
        cases.append(rng.integers(0, 256, rng.integers(0, 300))
                     .astype(np.uint8).tobytes())
    for size in (0, 1, 0x7FFFFFFF, 0xFFFFFFFF):
        for off in (16, 40):  # fmt size / data size fields
            buf = bytearray(base)
            buf[off: off + 4] = struct.pack("<I", size)
            cases.append(bytes(buf))
    for sr in (0, 1, 10_000_000, 0xFFFFFFFF):  # header sample-rate field
        buf = bytearray(base)
        buf[24:28] = struct.pack("<I", sr)
        cases.append(bytes(buf))
    return cases


def test_wav_decode_fuzz_only_typed_errors(tmp_path, rng):
    """Every decode-layer entry point must either succeed or raise
    ValueError on arbitrary corrupt input — never struct.error,
    ZeroDivisionError, MemoryError, or an allocation hang."""
    from zenker_audio_detection_tpu.infer import discovery

    for i, c in enumerate(_fuzz_wav_corpus(rng)):
        p = str(tmp_path / f"f{i}.wav")
        with open(p, "wb") as f:
            f.write(c)
        for fn in (aio.read_wav, aio.load_audio, aio.load_audio_compact,
                   discovery.wav_num_frames):
            try:
                fn(p)
            except ValueError:
                pass  # the documented contract
