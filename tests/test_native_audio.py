"""Parity tests: native C++ audio loader vs the pure-Python oracle."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from zenker_audio_detection_tpu.audio import io as aio
from zenker_audio_detection_tpu.audio import native
from zenker_audio_detection_tpu.ops import resample as R

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        subprocess.run(["make", "-C", str(REPO / "native")], check=True,
                       capture_output=True)
        native._TRIED = False  # re-probe
    if not native.available():
        pytest.skip("native toolchain unavailable")


def test_read_mono_parity_int16_stereo(tmp_path, rng):
    x = np.clip(rng.standard_normal((2, 12000)) * 0.3, -0.9, 0.9).astype(np.float32)
    p = str(tmp_path / "st.wav")
    aio.write_wav(p, x, 44100)
    got = native.read_mono(p)
    assert got is not None
    mono, sr = got
    assert sr == 44100
    ref_wav, ref_sr = aio.read_wav(p)
    np.testing.assert_allclose(mono, ref_wav.mean(axis=0), atol=1e-7)


def test_read_mono_parity_float32(tmp_path, rng):
    x = (rng.standard_normal(8000) * 0.5).astype(np.float32)
    p = str(tmp_path / "f32.wav")
    aio.write_wav(p, x, 48000, dtype="float32")
    mono, sr = native.read_mono(p)
    np.testing.assert_allclose(mono, x, atol=0)
    assert sr == 48000


@pytest.mark.parametrize("orig,new", [(48000, 16000), (44100, 16000),
                                      (16000, 16000)])
def test_resample_parity(rng, orig, new):
    x = rng.standard_normal(orig).astype(np.float32)
    got = native.resample(x, orig, new)
    ref = R.resample(x, orig, new)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_load_audio_native_matches_python(tmp_path, rng):
    x = np.clip(rng.standard_normal((2, 44100)) * 0.2, -0.9, 0.9).astype(np.float32)
    p = str(tmp_path / "a.wav")
    aio.write_wav(p, x, 44100, dtype="float32")
    nat = native.load_audio(p, 16000)
    # python oracle path
    wav, sr = aio.read_wav(p)
    ref = R.resample(wav.mean(axis=0), sr, 16000)
    np.testing.assert_allclose(nat, ref, atol=2e-6)
    assert len(nat) == 16000


def test_native_placeholder_data_size_matches_python(tmp_path, rng):
    """The C++ parser shares the streaming-recorder header semantics of
    audio/io.find_wav_chunks: size-0 data placeholder decodes to EOF."""
    import struct

    x = np.clip(rng.standard_normal(16000) * 0.2, -0.9, 0.9).astype(np.float32)
    p = str(tmp_path / "a.wav")
    aio.write_wav(p, x, 16000)
    raw = bytearray(open(p, "rb").read())
    idx = raw.find(b"data")
    q = str(tmp_path / "placeholder.wav")
    with open(q, "wb") as f:
        f.write(raw[:idx + 4] + struct.pack("<I", 0) + raw[idx + 8:])
    nat = native.load_audio(q, 16000)
    wav, sr = aio.read_wav(q)  # python parser, same robustness
    assert nat is not None and len(nat) == 16000
    np.testing.assert_allclose(nat, wav.mean(axis=0), atol=2e-6)


def test_native_vocoder_matches_numpy_oracle(rng):
    """native/vocoder.cpp vs the numpy phase vocoder (same algorithm,
    different FFT + libm): agreement to FFT rounding error across stretch
    rates, including the rates pitch_shift uses (2^(±4/12))."""
    from zenker_audio_detection_tpu.data import augment as A

    if native.phase_vocoder_stretch(np.zeros(2048), 1.1) is None:
        pytest.skip("libaudioio.so predates the vocoder symbol")
    x = rng.standard_normal(16000)
    for rate in (0.8, 0.93, 1.07, 1.2, 2 ** (4 / 12), 2 ** (-4 / 12)):
        got = native.phase_vocoder_stretch(x, rate)
        ref = A._numpy_phase_vocoder_stretch(x, rate)
        assert got is not None
        assert len(got) == len(ref)
        np.testing.assert_allclose(got, ref, atol=1e-8)


def test_native_vocoder_short_input_falls_back(rng):
    """Inputs of length <= n_fft//2 take the numpy path (native returns
    None): below 1024 numpy zero-pads, and AT 1024 np.pad 'reflect' needs
    a multi-reflection the single-reflection C++ padding doesn't do (it
    would read out of bounds)."""
    assert native.phase_vocoder_stretch(np.zeros(512), 1.1) is None
    assert native.phase_vocoder_stretch(np.zeros(1024), 1.1) is None
    # 1025 is the smallest single-reflection length: parity must hold there
    from zenker_audio_detection_tpu.data import augment as A

    x = rng.standard_normal(1025)
    got = native.phase_vocoder_stretch(x, 1.1)
    # the contract is that the native path HANDLES 1025 (a None here means
    # the C++ length guard regressed) — don't silently waive the parity
    assert got is not None
    np.testing.assert_allclose(got, A._numpy_phase_vocoder_stretch(x, 1.1),
                               atol=1e-8)


def test_native_zero_sample_rate_header_no_sigfpe(tmp_path, rng):
    """A WAV header with sample_rate=0 previously reached an unsigned
    division by zero in audioio_resampled_length — SIGFPE that killed the
    host process. The native path must instead error out cleanly (None),
    and the resample guards must reject invalid rates."""
    import struct

    x = np.clip(rng.standard_normal(4000) * 0.3, -0.9, 0.9).astype(np.float32)
    p = str(tmp_path / "ok.wav")
    aio.write_wav(p, x, 16000)
    raw = bytearray(open(p, "rb").read())
    fmt_at = raw.find(b"fmt ") + 8
    raw[fmt_at + 4: fmt_at + 8] = struct.pack("<I", 0)
    bad = tmp_path / "zero_sr.wav"
    bad.write_bytes(bytes(raw))

    assert native.read_mono(str(bad)) is None  # wav_info rejects sr<1
    assert native.load_audio(str(bad)) is None
    # direct resample guards
    assert native.resample(x, 0, 16000) is None
    assert native.resample(x, 16000, -1) is None


def test_native_read_mono_v2_reports_actual_frames(tmp_path, rng):
    """The v2 ABI reports the actually-decoded frame count so a file that
    shrank between wav_info and the decode can be trimmed (no np.empty
    garbage tail). Drive it with an oversized capacity buffer."""
    import ctypes

    lib = native.load_library()
    if not hasattr(lib, "audioio_read_mono_v2"):
        pytest.skip("old libaudioio.so without v2 symbol")
    x = np.clip(rng.standard_normal(5000) * 0.3, -0.9, 0.9).astype(np.float32)
    p = str(tmp_path / "a.wav")
    aio.write_wav(p, x, 16000)

    out = np.full(5000 + 64, np.nan, dtype=np.float32)  # oversized
    sr = ctypes.c_int()
    frames = ctypes.c_longlong()
    rc = lib.audioio_read_mono_v2(
        p.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(out), ctypes.byref(sr), ctypes.byref(frames))
    assert rc == 0 and sr.value == 16000
    assert frames.value == 5000  # actual decoded count, not the capacity
    assert np.isnan(out[5000:]).all()  # tail untouched
    # the Python wrapper returns exactly the decoded span
    got, got_sr = native.read_mono(p)
    assert len(got) == 5000 and got_sr == 16000


def test_native_decoder_fuzz_no_crash(tmp_path, rng):
    """The C++ decoder must return error codes on arbitrary corrupt input —
    never SIGFPE/SIGSEGV/bad_alloc-abort (which kill the host process and
    defeat the C-ABI fallback design). Runs in a subprocess so a crash is
    an exit code here, not a dead pytest."""
    import sys

    from test_audio import _fuzz_wav_corpus

    d = tmp_path / "corpus"
    d.mkdir()
    for i, c in enumerate(_fuzz_wav_corpus(rng, n_flip=120, n_garbage=40)):
        (d / f"f{i}.wav").write_bytes(c)
    code = (
        "import sys, os\n"
        "sys.path.insert(0, %r)\n"
        "from zenker_audio_detection_tpu.audio import native\n"
        "assert native.available()\n"
        "n = 0\n"
        "for fn in sorted(os.listdir(%r)):\n"
        "    p = os.path.join(%r, fn)\n"
        "    native.read_mono(p)\n"
        "    native.load_audio(p)\n"
        "    n += 1\n"
        "print('fuzzed', n)\n" % (str(REPO), str(d), str(d)))
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300)
    assert out.returncode == 0, (out.returncode, out.stderr[-2000:])
    assert "fuzzed" in out.stdout
