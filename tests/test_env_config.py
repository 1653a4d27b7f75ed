"""Tests for the .env dataset-path configuration (reference utils/config.py
contract incl. ${VAR} interpolation from .env.example)."""

import os

import pytest

from zenker_audio_detection_tpu.data import config as C


def test_parse_env_file_interpolation(tmp_path):
    env = tmp_path / ".env"
    env.write_text(
        "# comment line\n"
        "DATASET_ROOT=/data/SwallowSet\n"
        "RAW_DATA_DIR=${DATASET_ROOT}/Raw\n"
        "SHORT_AUDIO_DIR=${DATASET_ROOT}/Data\n"
        "LONG_AUDIO_DIR=${DATASET_ROOT}/Long\n"
        "LONG_AUDIO_ROOT=${LONG_AUDIO_DIR}\n")
    vars_ = C.parse_env_file(env)
    assert vars_["RAW_DATA_DIR"] == "/data/SwallowSet/Raw"
    assert vars_["LONG_AUDIO_ROOT"] == "/data/SwallowSet/Long"


def test_load_dataset_config_from_env_file(tmp_path, monkeypatch):
    (tmp_path / ".env").write_text("DATASET_ROOT=/x\nSHORT_AUDIO_DIR=/x/S\n")
    for k in ("DATASET_ROOT", "SHORT_AUDIO_DIR", "RAW_DATA_DIR",
              "LONG_AUDIO_DIR", "LONG_AUDIO_ROOT"):
        monkeypatch.delenv(k, raising=False)
    cfg = C.load_dataset_config(tmp_path)
    assert cfg["dataset_root"] == "/x"
    assert cfg["short_audio_dir"] == "/x/S"
    assert cfg["raw_data_dir"].startswith("/path/to/")  # default fallback


def test_process_env_overrides_file(tmp_path, monkeypatch):
    (tmp_path / ".env").write_text("DATASET_ROOT=/file\n")
    monkeypatch.setenv("DATASET_ROOT", "/env")
    cfg = C.load_dataset_config(tmp_path)
    assert cfg["dataset_root"] == "/env"


def test_process_env_wins_inside_interpolation(tmp_path, monkeypatch):
    """python-dotenv load_dotenv(override=False) semantics (the reference
    loader): an exported var also wins INSIDE ${VAR} interpolation, so
    derived paths stay consistent with the exported root."""
    (tmp_path / ".env").write_text(
        "DATASET_ROOT=/file\n"
        "LONG_AUDIO_DIR=${DATASET_ROOT}/Long\n")
    monkeypatch.setenv("DATASET_ROOT", "/env")
    cfg = C.load_dataset_config(tmp_path)
    assert cfg["dataset_root"] == "/env"
    assert cfg["long_audio_dir"] == "/env/Long"
    # without the export, the file value resolves as before
    monkeypatch.delenv("DATASET_ROOT")
    cfg = C.load_dataset_config(tmp_path)
    assert cfg["long_audio_dir"] == "/file/Long"


def test_empty_exported_var_counts_as_set(tmp_path, monkeypatch):
    """os.getenv / dotenv override=False semantics (the reference loader):
    an exported EMPTY variable is still set — it must win over the .env
    file value and the placeholder default, exactly like it already does
    inside ${VAR} interpolation."""
    (tmp_path / ".env").write_text("DATASET_ROOT=/file\n")
    monkeypatch.setenv("DATASET_ROOT", "")
    cfg = C.load_dataset_config(tmp_path)
    assert cfg["dataset_root"] == ""
    # an empty value IN THE FILE also beats the placeholder default
    monkeypatch.delenv("DATASET_ROOT")
    (tmp_path / ".env").write_text("DATASET_ROOT=\n")
    cfg = C.load_dataset_config(tmp_path)
    assert cfg["dataset_root"] == ""


def test_long_audio_root_falls_back_to_long_dir(tmp_path, monkeypatch):
    for k in ("LONG_AUDIO_ROOT", "LONG_AUDIO_DIR"):
        monkeypatch.delenv(k, raising=False)
    (tmp_path / ".env").write_text("LONG_AUDIO_DIR=/l\n")
    cfg = C.load_dataset_config(tmp_path)
    assert cfg["long_audio_root"] == "/l"


def test_env_example_parses():
    import pathlib

    repo = pathlib.Path(__file__).resolve().parent.parent
    vars_ = C.parse_env_file(repo / ".env.example")
    assert vars_["RAW_DATA_DIR"].endswith("/Raw")
    assert vars_["LONG_AUDIO_ROOT"] == vars_["LONG_AUDIO_DIR"]


def test_binary_env_file_typed_error(tmp_path):
    import pytest

    p = tmp_path / ".env"
    p.write_bytes(b"\xff\xfe\x00\x01 DATASET_ROOT=/x\n\x80\x81")
    with pytest.raises(ValueError, match=".env"):
        C.parse_env_file(p)


def test_path_getters_cover_env_contract(tmp_path, monkeypatch):
    """The four public path getters (the reference's get_dataset_root /
    get_raw_data_dir / get_short_audio_dir / get_long_audio_dir surface,
    utils/config.py) each resolve through the same .env loading."""
    (tmp_path / ".env").write_text(
        "DATASET_ROOT=/d\nRAW_DATA_DIR=/d/raw\n"
        "SHORT_AUDIO_DIR=/d/short\nLONG_AUDIO_DIR=/d/long\n")
    for k in ("DATASET_ROOT", "SHORT_AUDIO_DIR", "RAW_DATA_DIR",
              "LONG_AUDIO_DIR", "LONG_AUDIO_ROOT"):
        monkeypatch.delenv(k, raising=False)
    assert C.get_dataset_root(project_root=tmp_path) == "/d"
    assert C.get_raw_data_dir(project_root=tmp_path) == "/d/raw"
    assert C.get_short_audio_dir(project_root=tmp_path) == "/d/short"
    assert C.get_long_audio_dir(project_root=tmp_path) == "/d/long"
