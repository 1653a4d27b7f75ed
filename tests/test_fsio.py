"""utils.fsio: atomic JSON writes backing the skip-if-exists contract."""

import json
import os

import pytest

from zenker_audio_detection_tpu.utils import fsio


def test_atomic_json_dump_roundtrip(tmp_path):
    p = str(tmp_path / "sub" / "out.json")  # parent created on demand
    fsio.atomic_json_dump({"a": [1, 2.5, None], "b": "x"}, p, indent=2)
    with open(p) as f:
        assert json.load(f) == {"a": [1, 2.5, None], "b": "x"}
    assert os.listdir(tmp_path / "sub") == ["out.json"]  # no tmp leftovers


def test_atomic_json_dump_crash_preserves_previous(tmp_path, monkeypatch):
    """A crash before the rename leaves the previous good file untouched
    and no staging file behind — an existing result can never be replaced
    by a truncated one."""
    p = str(tmp_path / "out.json")
    fsio.atomic_json_dump({"v": 1}, p)

    def no_replace(src, dst):
        raise RuntimeError("simulated crash before rename")

    monkeypatch.setattr(fsio.os, "replace", no_replace)
    with pytest.raises(RuntimeError):
        fsio.atomic_json_dump({"v": 2}, p)
    monkeypatch.undo()

    with open(p) as f:
        assert json.load(f) == {"v": 1}
    assert os.listdir(tmp_path) == ["out.json"]


def test_atomic_json_dump_unserializable_leaves_no_trace(tmp_path):
    """json.dump failing mid-stream (unserializable object) must not leave
    a half-written file under EITHER name."""
    p = str(tmp_path / "out.json")
    with pytest.raises(TypeError):
        fsio.atomic_json_dump({"bad": object()}, p)
    assert os.listdir(tmp_path) == []
