"""Executed-reference differential for the normalization-stats script.

Runs the ACTUAL reference utils/compute_ast_normalization_stats.py as a
subprocess — soundfile stubbed with exact PCM16 semantics (sf.read returns
int16/32768 float64), librosa present-but-poisoned (unreachable at 16 kHz),
and the MIT extractor hub lookup satisfied from a locally-seeded offline HF
cache (the script sets do_normalize=False, so only the default geometry
matters) — then diffs our `cli.compute_stats` outputs: per-fold mean/std/
count, the weighted aggregate pooling, and the JSON artifacts.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/utils/compute_ast_normalization_stats.py")
pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference not mounted")

transformers = pytest.importorskip("transformers")

SOUNDFILE_STUB = '''\
"""PCM16-exact soundfile stand-in (sf.read semantics for 16-bit PCM are
fixed: int16 / 32768, float64)."""
import wave

import numpy as np


def read(path):
    with wave.open(str(path), "rb") as w:
        assert w.getsampwidth() == 2 and w.getnchannels() == 1
        sr = w.getframerate()
        pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    return pcm.astype(np.float64) / 32768.0, sr
'''

LIBROSA_STUB = '''\
"""Poisoned librosa stand-in: unreachable for 16 kHz PCM16 fixtures."""


def resample(*a, **k):
    raise AssertionError("librosa.resample must not be reached at 16 kHz")


def load(*a, **k):
    raise AssertionError("librosa.load fallback must not be reached")
'''


def _seed_hf_cache(hf_home: Path):
    """Materialize MIT/ast-finetuned-audioset-10-10-0.4593's preprocessor
    config in hub-cache layout so from_pretrained resolves offline."""
    from transformers import ASTFeatureExtractor

    snap = (hf_home / "hub" / "models--MIT--ast-finetuned-audioset-10-10-0.4593"
            / "snapshots" / "local")
    snap.mkdir(parents=True)
    ASTFeatureExtractor().save_pretrained(str(snap))
    refs = snap.parent.parent / "refs"
    refs.mkdir()
    (refs / "main").write_text("local")


def _make_splits(tmp_path, rng):
    from zenker_audio_detection_tpu.audio import io as aio

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    # lengths exercise: normal 1 s, off-grid, sub-frame (all-pad features),
    # and >1024-frame truncation
    lengths = [16000, 16000, 7321, 399, 170000, 401, 16000]
    paths = []
    for i, n in enumerate(lengths):
        p = wav_dir / f"clip{i}.wav"
        aio.write_wav(str(p), (rng.standard_normal(n) * 0.1
                               ).astype(np.float32), 16000)
        paths.append(str(p))
    np.save(data_dir / "train_x_fold1.npy", np.array(paths[:4]))
    np.save(data_dir / "train_x_fold2.npy", np.array(paths[3:]))
    return data_dir


@pytest.mark.slow
def test_stats_parity_vs_executed_reference(tmp_path, capsys):
    from zenker_audio_detection_tpu.cli import compute_stats

    rng = np.random.default_rng(20260818)
    data_dir = _make_splits(tmp_path, rng)

    stub_dir = tmp_path / "stub"
    stub_dir.mkdir()
    (stub_dir / "soundfile.py").write_text(SOUNDFILE_STUB)
    (stub_dir / "librosa.py").write_text(LIBROSA_STUB)
    hf_home = tmp_path / "hf"
    _seed_hf_cache(hf_home)

    env = dict(os.environ)
    env["PYTHONPATH"] = str(stub_dir) + os.pathsep + env.get("PYTHONPATH", "")
    env["HF_HOME"] = str(hf_home)
    env["HF_HUB_OFFLINE"] = "1"
    env["TRANSFORMERS_OFFLINE"] = "1"
    ref_out = tmp_path / "refout"
    subprocess.run(
        [sys.executable, str(REF), "--data-dir", str(data_dir),
         "--output-dir", str(ref_out), "--folds", "2", "--batch-size", "3"],
        env=env, capture_output=True, text=True, check=True)
    ref_per = json.loads((ref_out / "stats_per_fold.json").read_text())
    ref_agg = json.loads((ref_out / "stats_aggregate.json").read_text())

    our_out = tmp_path / "ourout"
    compute_stats.main(["--data-dir", str(data_dir),
                        "--output-dir", str(our_out), "--folds", "2"])
    capsys.readouterr()
    our_per = json.loads((our_out / "stats_per_fold.json").read_text())
    our_agg = json.loads((our_out / "stats_aggregate.json").read_text())

    # fbank parity is <=5e-4 elementwise, so fold means/stds agree to ~1e-3
    assert [d["fold"] for d in our_per] == [d["fold"] for d in ref_per]
    for o, r in zip(our_per, ref_per):
        assert o["count"] == r["count"], r
        assert o["mean"] == pytest.approx(r["mean"], abs=1e-3), r
        assert o["std"] == pytest.approx(r["std"], abs=1e-3), r
    assert our_agg["total_count"] == ref_agg["total_count"]
    assert our_agg["mean"] == pytest.approx(ref_agg["mean"], abs=1e-3)
    assert our_agg["std"] == pytest.approx(ref_agg["std"], abs=1e-3)
