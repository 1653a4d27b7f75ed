"""ctypes bindings for the native audio loader (native/libaudioio.so).

Fast-path WAV decode + polyphase resample in C++ (the framework's
counterpart to the reference's libsndfile/soxr C stack). Falls back to the
pure-Python implementations (audio/io.py, ops/resample.py) when the shared
library hasn't been built — numerics are identical by construction.

Build once with: make -C native
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _find_lib():
    here = os.path.dirname(os.path.abspath(__file__))
    repo_root = os.path.dirname(os.path.dirname(here))
    candidates = [
        os.environ.get("ZENKER_AUDIOIO_LIB", ""),
        os.path.join(repo_root, "native", "libaudioio.so"),
        os.path.join(here, "libaudioio.so"),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def load_library():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.audioio_wav_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_longlong)]
    lib.audioio_wav_info.restype = ctypes.c_int
    lib.audioio_read_mono.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_int)]
    lib.audioio_read_mono.restype = ctypes.c_int
    if hasattr(lib, "audioio_read_mono_v2"):  # newer .so: actual-frames out
        lib.audioio_read_mono_v2.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_longlong)]
        lib.audioio_read_mono_v2.restype = ctypes.c_int
    lib.audioio_resampled_length.argtypes = [
        ctypes.c_longlong, ctypes.c_int, ctypes.c_int]
    lib.audioio_resampled_length.restype = ctypes.c_longlong
    lib.audioio_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_longlong, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    lib.audioio_resample.restype = ctypes.c_int
    if hasattr(lib, "audioio_phase_vocoder_stretch"):  # newer .so builds
        lib.audioio_stretch_out_length.argtypes = [
            ctypes.c_longlong, ctypes.c_double]
        lib.audioio_stretch_out_length.restype = ctypes.c_longlong
        lib.audioio_phase_vocoder_stretch.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
            ctypes.c_double, ctypes.POINTER(ctypes.c_double)]
        lib.audioio_phase_vocoder_stretch.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return load_library() is not None


def read_mono(path: str) -> tuple[np.ndarray, int] | None:
    """Decoded mono (channel-mean) float32 waveform, or None if the native
    lib is unavailable / the format is unsupported."""
    lib = load_library()
    if lib is None:
        return None
    ch = ctypes.c_int()
    sr = ctypes.c_int()
    nf = ctypes.c_longlong()
    if lib.audioio_wav_info(path.encode(), ctypes.byref(ch), ctypes.byref(sr),
                            ctypes.byref(nf)) != 0:
        return None
    out = np.empty(nf.value, dtype=np.float32)
    if hasattr(lib, "audioio_read_mono_v2"):
        # the file is re-read after `out` was sized from wav_info; an
        # actively-written recorder file may have SHRUNK in between — trim
        # to the actually-decoded frame count so no np.empty tail leaks
        frames = ctypes.c_longlong()
        rc = lib.audioio_read_mono_v2(
            path.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nf.value, ctypes.byref(sr), ctypes.byref(frames))
        if rc != 0:
            return None
        return out[: frames.value], sr.value
    rc = lib.audioio_read_mono(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nf.value, ctypes.byref(sr))
    if rc != 0:
        return None
    return out, sr.value


def resample(x: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray | None:
    lib = load_library()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    out_len = lib.audioio_resampled_length(len(x), orig_freq, new_freq)
    if out_len < 0:  # invalid rates (e.g. sr=0 header) — let callers fall
        return None  # back / raise their own typed error
    out = np.empty(out_len, dtype=np.float32)
    rc = lib.audioio_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        orig_freq, new_freq,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if rc == 0 else None


def phase_vocoder_stretch(x: np.ndarray, rate: float) -> np.ndarray | None:
    """Native STFT phase-vocoder time stretch (native/vocoder.cpp), ~1.5x
    the vectorized numpy path per call on one core and OpenMP-parallel over
    STFT frames on multi-core hosts; agrees with the numpy oracle to
    ~1e-10 (test_native_audio.py). None when the lib is missing, predates
    the symbol, or the input is not longer than the analysis pad (np.pad
    "reflect" multi-reflects when pad >= n — that edge, and the zero-pad
    one below it, stay on the numpy path)."""
    lib = load_library()
    if lib is None or not hasattr(lib, "audioio_phase_vocoder_stretch"):
        return None
    x = np.ascontiguousarray(x, dtype=np.float64)
    if len(x) <= 1024:  # <= n_fft//2: single reflection needs pad < n
        return None
    n_out = lib.audioio_stretch_out_length(len(x), float(rate))
    if n_out < 0:
        return None
    out = np.empty(n_out, dtype=np.float64)
    rc = lib.audioio_phase_vocoder_stretch(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(x),
        float(rate), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out if rc == 0 else None


def load_audio(path: str, target_sr: int = 16000) -> np.ndarray | None:
    """Native decode -> mono -> resample; None if native path unavailable."""
    got = read_mono(path)
    if got is None:
        return None
    mono, sr = got
    if sr == target_sr:
        return mono
    res = resample(mono, sr, target_sr)
    return res
