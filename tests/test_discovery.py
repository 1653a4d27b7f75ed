"""Patient file discovery (reference discover_two_files,
src/test_long_audio_windows_2stage.py:119-142) + WAV length probing."""

import struct

import numpy as np
import pytest

from zenker_audio_detection_tpu.audio import io as aio
from zenker_audio_detection_tpu.infer import discovery


def _write(path, seconds, sr=16000):
    aio.write_wav(str(path), np.zeros(int(sr * seconds), np.float32), sr)
    return str(path)


def test_wav_num_frames_matches_written(tmp_path):
    p = _write(tmp_path / "a.wav", 1.5)
    assert discovery.wav_num_frames(p) == 24000


def test_wav_num_frames_clamps_placeholder_sizes(tmp_path):
    """Streaming recorders leave 0 / 0xFFFFFFFF data-chunk sizes; the
    length must come from the bytes actually present, not the header."""
    p = _write(tmp_path / "a.wav", 1.0)  # 16000 frames, int16 mono
    raw = bytearray(open(p, "rb").read())
    # locate the data chunk header and overwrite its size field
    idx = raw.find(b"data")
    for fake in (0xFFFFFFFF, 0):
        raw[idx + 4: idx + 8] = struct.pack("<I", fake)
        q = tmp_path / f"fake_{fake}.wav"
        q.write_bytes(bytes(raw))
        assert discovery.wav_num_frames(str(q)) == 16000, fake
    assert discovery.wav_num_frames(str(tmp_path / "missing.wav")) == 0


def test_wav_num_frames_empty_data_with_trailing_chunks(tmp_path):
    """An explicitly empty data chunk followed by a valid trailing chunk
    (e.g. LIST/INFO metadata) really has 0 frames — the size-0 placeholder
    fallback applies only when the data chunk runs to EOF."""
    p = _write(tmp_path / "a.wav", 1.0)
    raw = bytearray(open(p, "rb").read())
    idx = raw.find(b"data")
    payload = raw[idx + 8:]
    # rebuild: empty data chunk, then the old payload wrapped as a LIST chunk
    rebuilt = raw[:idx + 4] + struct.pack("<I", 0) \
        + b"LIST" + struct.pack("<I", len(payload)) + payload
    q = tmp_path / "empty_data_trailing.wav"
    q.write_bytes(bytes(rebuilt))
    assert discovery.wav_num_frames(str(q)) == 0
    # but size==0 with non-chunk garbage after it is still a placeholder
    garbage = raw[:idx + 4] + struct.pack("<I", 0) + bytes(payload)
    r = tmp_path / "placeholder_to_eof.wav"
    r.write_bytes(garbage)
    assert discovery.wav_num_frames(str(r)) == 16000
    # and PCM payload that happens to START with printable ASCII + a
    # plausible size (e.g. float32 byte patterns) must NOT be mistaken for
    # a trailing chunk — only KNOWN chunk ids count, else an unfinalized
    # recording is zeroed out of keep-2-longest discovery
    ascii_payload = b"abcd" + struct.pack("<I", 16) + bytes(payload[8:])
    s = tmp_path / "placeholder_ascii_payload.wav"
    s.write_bytes(raw[:idx + 4] + struct.pack("<I", 0) + ascii_payload)
    assert discovery.wav_num_frames(str(s)) == 16000


def test_discover_keeps_two_longest(tmp_path):
    d = tmp_path / "Zenker" / "P7"
    d.mkdir(parents=True)
    _write(d / "short.wav", 0.5)
    long_a = _write(d / "rec_a.wav", 2.0)
    long_b = _write(d / "rec_b.wav", 3.0)
    out = discovery.discover_two_files(str(tmp_path), "P7")
    assert sorted(out) == sorted([long_a, long_b])


def test_discover_placeholder_size_does_not_flip_selection(tmp_path):
    """A 3 s recording whose data-size field is a 0xFFFFFFFF placeholder
    must still be selected over a genuinely shorter file."""
    d = tmp_path / "Healthy" / "P9"
    d.mkdir(parents=True)
    _write(d / "short.wav", 0.5)
    _write(d / "mid.wav", 2.0)
    big = _write(d / "big.wav", 3.0)
    raw = bytearray(open(big, "rb").read())
    idx = raw.find(b"data")
    raw[idx + 4: idx + 8] = struct.pack("<I", 0xFFFFFFFF)
    open(big, "wb").write(bytes(raw))
    out = discovery.discover_two_files(str(tmp_path), "P9")
    assert big in out and str(d / "mid.wav") in out


def test_discover_requires_exactly_two(tmp_path):
    d = tmp_path / "Zenker" / "P1"
    d.mkdir(parents=True)
    _write(d / "only.wav", 1.0)
    with pytest.raises(ValueError, match="exactly 2"):
        discovery.discover_two_files(str(tmp_path), "P1")
    with pytest.raises(ValueError, match="exactly 2"):
        discovery.discover_two_files(str(tmp_path), "NOPE")
