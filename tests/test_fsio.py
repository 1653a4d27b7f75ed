"""utils.fsio: atomic JSON writes backing the skip-if-exists contract."""

import json
import os

import numpy as np
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


# ---------------------------------------------------------------------------
# load_json_object — the typed reader used by every config-file consumer
# ---------------------------------------------------------------------------


def test_load_json_object_roundtrip(tmp_path):
    p = str(tmp_path / "c.json")
    fsio.atomic_json_dump({"k": 1}, p)
    assert fsio.load_json_object(p) == {"k": 1}


def test_load_json_object_corrupt_names_file(tmp_path):
    p = str(tmp_path / "c.json")
    with open(p, "w") as f:
        f.write('{"k": 1')  # truncated
    with pytest.raises(ValueError, match="c.json"):
        fsio.load_json_object(p, "model config")


def test_load_json_object_non_object_names_file(tmp_path):
    p = str(tmp_path / "c.json")
    for payload in ("[1, 2]", '"a string"', "3.5", "null"):
        with open(p, "w") as f:
            f.write(payload)
        with pytest.raises(ValueError, match="JSON object"):
            fsio.load_json_object(p)


def test_load_json_object_missing_is_file_not_found(tmp_path):
    with pytest.raises(FileNotFoundError):
        fsio.load_json_object(str(tmp_path / "absent.json"))


def test_load_json_object_fuzz_only_typed_errors(tmp_path, rng):
    """Deterministic byte-level fuzz: every corrupt payload must raise
    ValueError (never a bare JSONDecodeError reaching the user without the
    filename, never any other exception type)."""
    import json as _json

    p = str(tmp_path / "f.json")
    good = _json.dumps({"hidden_size": 768, "id2label": {"0": "a"}}).encode()
    for i in range(200):
        mode = i % 4
        if mode == 0:
            blob = good[: int(rng.integers(len(good)))]
        elif mode == 1:
            b = bytearray(good)
            for _ in range(int(rng.integers(1, 6))):
                b[int(rng.integers(len(b)))] = int(rng.integers(256))
            blob = bytes(b)
        elif mode == 2:
            blob = rng.integers(0, 256, int(rng.integers(1, 80)),
                                dtype=np.uint8).tobytes()
        else:
            blob = b"[" + good + b"]"  # valid JSON, wrong top-level type
        with open(p, "wb") as f:
            f.write(blob)
        try:
            out = fsio.load_json_object(p, "fuzzed config")
            assert isinstance(out, dict)  # mutation may keep it valid
        except ValueError as e:
            # UnicodeDecodeError subclasses ValueError, so undecodable
            # bytes are wrapped with the filename too
            assert "f.json" in str(e) or "JSON object" in str(e)


def test_load_npy_roundtrip(tmp_path):
    p = str(tmp_path / "a.npy")
    np.save(p, np.arange(6).reshape(2, 3))
    out = fsio.load_npy(p, "test array")
    np.testing.assert_array_equal(out, np.arange(6).reshape(2, 3))
    # object payloads (split path lists) need allow_pickle=True
    p2 = str(tmp_path / "b.npy")
    np.save(p2, np.asarray(["x/1.wav", "y/2.wav"], dtype=object),
            allow_pickle=True)
    assert fsio.load_npy(p2, "paths", allow_pickle=True).tolist() == [
        "x/1.wav", "y/2.wav"]


def test_load_npy_missing_is_file_not_found(tmp_path):
    with pytest.raises(FileNotFoundError):
        fsio.load_npy(str(tmp_path / "absent.npy"), "test array")


def test_load_npy_fuzz_only_typed_errors(tmp_path):
    """Deterministic corruption corpus over a real .npy blob: every
    corrupt variant must either load (a mutation can keep it valid) or
    raise ValueError naming the file — never a path-less EOFError,
    UnpicklingError, BadZipFile, or crash (the same contract the
    safetensors/WAV fuzz pins)."""
    rng = np.random.default_rng(20260818)
    src = str(tmp_path / "good.npy")
    np.save(src, np.arange(64, dtype=np.float32))
    good = open(src, "rb").read()
    p = str(tmp_path / "f.npy")
    for i in range(250):
        mode = i % 5
        if mode == 0:  # truncation (incl. zero-byte)
            blob = good[: int(rng.integers(len(good)))]
        elif mode == 1:  # byte flips
            b = bytearray(good)
            for _ in range(int(rng.integers(1, 6))):
                b[int(rng.integers(len(b)))] = int(rng.integers(256))
            blob = bytes(b)
        elif mode == 2:  # random garbage
            blob = rng.integers(0, 256, int(rng.integers(1, 120)),
                                dtype=np.uint8).tobytes()
        elif mode == 3:  # zip-masquerade ('PK' magic -> BadZipFile path)
            blob = b"PK\x03\x04" + bytes(rng.integers(
                0, 256, int(rng.integers(0, 60)), dtype=np.uint8))
        else:  # pickle payload with allow_pickle=False at the call site
            import pickle
            blob = good[:8] + pickle.dumps({"o": 1})
        with open(p, "wb") as f:
            f.write(blob)
        try:
            fsio.load_npy(p, "fuzzed array")
        except ValueError as e:
            assert "f.npy" in str(e)


def test_load_npy_consumers_name_the_file(tmp_path):
    """The split/CM loaders route corrupt artifacts through load_npy."""
    from zenker_audio_detection_tpu.analysis import cm_plots
    from zenker_audio_detection_tpu.train import loop as L

    # zero-byte CM under the expected layout
    cm_dir = tmp_path / "ast_classifier_stage1" / "cv_aggregate_evaluation"
    cm_dir.mkdir(parents=True)
    (cm_dir / "confusion_matrix.npy").write_bytes(b"")
    with pytest.raises(ValueError, match="confusion_matrix.npy"):
        cm_plots.load_confusion_matrix_from_results("stage1", str(tmp_path))

    # truncated split pair
    d = tmp_path / "splits"
    d.mkdir()
    (d / "train_x_fold1.npy").write_bytes(b"\x93NUMPY\x01\x00trunc")
    (d / "train_y_fold1.npy").write_bytes(b"")
    with pytest.raises(ValueError, match="train_x_fold1.npy"):
        L._load_split(str(d), "train", 1)


def test_load_npy_unpickling_error_with_allow_pickle(tmp_path):
    """A corrupt pickled OBJECT payload read with allow_pickle=True (the
    real split-file path) must hit load_npy's UnpicklingError branch and
    come back as a typed, file-naming ValueError — the fuzz modes above
    all run allow_pickle=False and never reach it."""
    import numpy as np

    p = tmp_path / "paths.npy"
    np.save(p, np.array([["a"], ["b"]], dtype=object), allow_pickle=True)
    good = p.read_bytes()
    # truncate inside the pickle stream (past the npy header, which ends
    # at the first newline after the magic)
    header_end = good.index(b"\n") + 1
    p.write_bytes(good[: header_end + max(1, (len(good) - header_end) // 3)])
    import pickle

    with pytest.raises(ValueError, match="paths.npy") as ei:
        fsio.load_npy(p, "split paths", allow_pickle=True)
    # pin the BRANCH: this corpus must come in via UnpicklingError, so a
    # refactor dropping it from the except tuple fails here
    assert isinstance(ei.value.__cause__, pickle.UnpicklingError)
