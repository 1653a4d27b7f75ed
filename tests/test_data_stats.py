"""Tests for normalization stats (C7) and dataset organizers (C2/C3)."""

import json
import os
from pathlib import Path

import numpy as np
import pytest

from zenker_audio_detection_tpu.audio import io as aio
from zenker_audio_detection_tpu.data import prepare, stats

transformers = pytest.importorskip("transformers")
from transformers import ASTFeatureExtractor  # noqa: E402


@pytest.fixture
def wav_fold_dir(tmp_path, rng):
    """Tiny fold layout with real 1 s WAVs."""
    d = tmp_path / "data_ast_stage1"
    d.mkdir()
    paths = []
    for i in range(4):
        p = tmp_path / f"clip{i}.wav"
        aio.write_wav(str(p), (rng.standard_normal(16000) * 0.1
                               ).astype(np.float32), 16000, dtype="float32")
        paths.append(str(p))
    np.save(d / "train_x_fold1.npy", np.asarray(paths, dtype=object))
    np.save(d / "train_x_fold2.npy", np.asarray(paths[:2], dtype=object))
    return d, paths


def reference_fold_stats(paths):
    """The reference algorithm verbatim on HF features
    (utils/compute_ast_normalization_stats.py:55-95)."""
    fx = ASTFeatureExtractor()
    fx.do_normalize = False
    running_sum = running_sq = 0.0
    total = 0
    for p in paths:
        wav, sr = aio.read_wav(p)
        feats = fx(wav[0], sampling_rate=sr, return_tensors="np")["input_values"]
        flat = feats.reshape(-1).astype(np.float64)
        running_sum += flat.sum()
        running_sq += (flat ** 2).sum()
        total += flat.size
    mean = running_sum / total
    var_pop = max(running_sq / total - mean * mean, 0.0)
    var = var_pop * total / (total - 1)
    return mean, var ** 0.5, total


def test_fold_stats_parity(wav_fold_dir):
    d, paths = wav_fold_dir
    ours = stats.compute_fold_stats(str(d), 1)
    ref_mean, ref_std, ref_count = reference_fold_stats(paths)
    assert ours["count"] == ref_count
    assert abs(ours["mean"] - ref_mean) < 5e-5
    assert abs(ours["std"] - ref_std) < 5e-5


def test_aggregate_formula():
    per_fold = [
        {"fold": 1, "mean": 1.0, "std": 2.0, "count": 100},
        {"fold": 2, "mean": -1.0, "std": 1.0, "count": 50},
    ]
    agg = stats.aggregate_stats(per_fold)
    total = 150
    wmean = (1.0 * 100 - 1.0 * 50) / total
    num = (99 * 4.0 + 100 * (1.0 - wmean) ** 2
           + 49 * 1.0 + 50 * (-1.0 - wmean) ** 2)
    assert abs(agg["mean"] - wmean) < 1e-12
    assert abs(agg["std"] - (num / 149) ** 0.5) < 1e-12
    assert agg["total_count"] == total


def test_compute_all_writes_artifacts(wav_fold_dir):
    d, _ = wav_fold_dir
    per_fold, agg = stats.compute_all_stats(str(d), num_folds=2)
    assert (d / "stats_per_fold.json").exists()
    assert (d / "stats_aggregate.json").exists()
    assert (d / "stats_all.npz").exists()
    loaded = json.loads((d / "stats_per_fold.json").read_text())
    assert [e["fold"] for e in loaded] == [1, 2]
    assert agg["total_count"] == sum(e["count"] for e in loaded)


def test_load_fold_normalization_fallbacks(tmp_path):
    # nothing -> defaults
    m, s, src = stats.load_fold_normalization(str(tmp_path), 1)
    assert src == "default" and abs(m - (-1.1509622)) < 1e-7
    # aggregate only
    (tmp_path / "stats_aggregate.json").write_text(
        json.dumps({"mean": -2.0, "std": 3.0, "total_count": 10}))
    m, s, src = stats.load_fold_normalization(str(tmp_path), 1)
    assert (m, s, src) == (-2.0, 3.0, "aggregate")
    # per-fold wins
    (tmp_path / "stats_per_fold.json").write_text(
        json.dumps([{"fold": 1, "mean": -1.0, "std": 2.0, "count": 5}]))
    m, s, src = stats.load_fold_normalization(str(tmp_path), 1)
    assert (m, s, src) == (-1.0, 2.0, "per_fold")
    # fold without stats falls through to aggregate
    m, s, src = stats.load_fold_normalization(str(tmp_path), 2)
    assert src == "aggregate"


def test_organize_short_clips(tmp_path, rng):
    raw = tmp_path / "Raw"
    for cl, spec in [("Healthy", "H01_xyz"), ("Idle", "H01_abc")]:
        d = raw / cl / spec / "foo_1sec_bar"
        d.mkdir(parents=True)
        (raw / cl / spec / "other").mkdir()
        for k in range(2):
            aio.write_wav(str(d / f"c{k}.WAV" if k else d / f"c{k}.wav"),
                          (rng.standard_normal(8000) * 0.1).astype(np.float32),
                          48000, dtype="float32")
    out = tmp_path / "Short"
    n = prepare.organize_short_clips(str(raw), str(out))
    assert n == 4
    assert sorted(os.listdir(out / "Healthy" / "H01")) == ["c0.wav", "c1.wav"]
    assert (out / "Idle" / "H01").exists()
    wav, sr = aio.read_wav(str(out / "Healthy" / "H01" / "c0.wav"))
    assert sr == 48000 and wav.shape[1] == 8000  # original sr preserved


def test_organize_long_audio_skips_idle(tmp_path, rng):
    raw = tmp_path / "Raw"
    for cl in ("Zenker", "Idle"):
        d = raw / cl / "Z01_x" / "Long_Recording"
        d.mkdir(parents=True)
        aio.write_wav(str(d / "rec.wav"),
                      (rng.standard_normal(32000) * 0.1).astype(np.float32),
                      16000, dtype="float32")
    out = tmp_path / "Long"
    # a specimen with NO long recordings must leave no empty patient dir
    # (the reference creates specimen dirs lazily per written file,
    # PrepareDatasetLongAudio.py:59-62) — phantom patient dirs would show
    # up in downstream patient enumeration
    (raw / "Zenker" / "Z02_y" / "OneSecond_Clips").mkdir(parents=True)
    n = prepare.organize_long_audio(str(raw), str(out))
    assert n == 1
    assert (out / "Zenker" / "Z01" / "rec.wav").exists()
    assert not (out / "Idle").exists()
    assert not (out / "Zenker" / "Z02").exists()
