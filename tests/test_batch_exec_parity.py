"""Executed-reference differential for the batch driver.

Runs the ACTUAL reference batch launcher (src/run_batch_simple_2stage.py),
which spawns one `python test_long_audio_windows_2stage_cache.py`
subprocess per patient — made runnable by a file-based torchaudio stub on
PYTHONPATH (PCM16 decode is fixed semantics: int16/32768) — then runs our
`cli.run_batch_2stage` on the same tree/models/threshold-config and diffs
every per-patient JSON plus the skip-if-exists semantics.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REF_BATCH = Path("/root/reference/src/run_batch_simple_2stage.py")
pytestmark = pytest.mark.skipif(not REF_BATCH.exists(),
                                reason="reference not mounted")

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import test_cascade_exec_parity as cascade_assets  # noqa: E402

TORCHAUDIO_STUB = '''\
"""PCM16-exact torchaudio stand-in for reference subprocesses (no
torchaudio in this environment; 16-bit PCM decode semantics are fixed)."""
import types
import wave

import numpy as np
import torch


def load(path):
    with wave.open(str(path), "rb") as w:
        assert w.getsampwidth() == 2 and w.getnchannels() == 1
        sr = w.getframerate()
        pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    return torch.from_numpy((pcm.astype(np.float32) / 32768.0)[None, :]), sr


def info(path):
    with wave.open(str(path), "rb") as w:
        return types.SimpleNamespace(num_frames=w.getnframes())


def _no_resample(*a, **k):
    raise AssertionError("resample must not be reached at 16 kHz")


functional = types.SimpleNamespace(resample=_no_resample)
'''


def _make_tree(tmp_path, rng):
    """Three patients (two classes) with 2-3 files each, reusing the
    amplitude-staircase fixture audio from the cascade exec test so the
    gates stay non-vacuous."""
    from zenker_audio_detection_tpu.audio import io as aio

    t = np.arange(16000 * 4) / 16000.0
    patients = {"Zenker/P77": 3, "Healthy/H12": 2, "Zenker/Q34": 2}
    for rel, n_files in patients.items():
        pdir = tmp_path / "long" / rel
        pdir.mkdir(parents=True)
        specs = [("recA.wav", 3.7, [0.05, 1.0, 4.0, 0.3, 8.0, 0.02, 2.0, 1.5]),
                 ("recB.wav", 2.4, [6.0, 0.1, 1.0, 0.5, 3.0]),
                 ("short.wav", 0.9, [1.0, 1.0])][:n_files]
        for name, sec, amps in specs:
            n = int(16000 * sec)
            x = (0.05 * rng.standard_normal(n)
                 + 0.1 * np.sin(2 * np.pi * 300 * t[:n]))
            for i in range(0, n, 8000):
                x[i:i + 8000] *= amps[(i // 8000) % len(amps)]
            aio.write_wav(str(pdir / name), x.astype(np.float32), 16000)

    ids_root = tmp_path / "ids"
    ids_root.mkdir()
    (ids_root / "test_ids_fold1.txt").write_text(
        "\n".join(patients) + "\n\n")  # trailing blank line: must be skipped
    return tmp_path / "long", ids_root, [p.split("/")[-1] for p in patients]


def _load_jsons(out_dir, pids):
    return {pid: json.loads((Path(out_dir) / f"{pid}_2stage.json").read_text())
            for pid in pids}


@pytest.mark.slow
def test_batch_driver_parity_vs_executed_reference(tmp_path, capsys):
    from zenker_audio_detection_tpu.cli import run_batch_2stage

    rng = np.random.default_rng(20260818)
    roots, _ = cascade_assets._make_assets(tmp_path, rng)
    tree_rng = np.random.default_rng(99)
    long_root, ids_root, pids = _make_tree(tmp_path / "tree", tree_rng)

    # per-fold threshold config exactly as zenker-extract-thresholds emits
    thr_config = tmp_path / "thresholds.json"
    thr_config.write_text(json.dumps({
        "folds": {"1": {"stage1": {"threshold": 0.45},
                        "stage2": {"threshold": 0.55}}}}))

    stub_dir = tmp_path / "stub"
    stub_dir.mkdir()
    (stub_dir / "torchaudio.py").write_text(TORCHAUDIO_STUB)
    env = dict(os.environ)
    env["PYTHONPATH"] = (str(stub_dir) + os.pathsep
                         + env.get("PYTHONPATH", ""))
    ref_out = tmp_path / "ref_outputs"
    ref_cwd = tmp_path / "ref_cwd"
    ref_cwd.mkdir()
    ref_cmd = [sys.executable, str(REF_BATCH), "--fold", "1",
               "--ids-root", str(ids_root),
               "--long-audio-root", str(long_root),
               "--stage1-model-root", roots[1],
               "--stage2-model-root", roots[2],
               "--threshold-config", str(thr_config),
               "--output-dir", str(ref_out),
               "--stage1-forward-min-prob", "0.55"]
    r1 = subprocess.run(ref_cmd, env=env, cwd=ref_cwd, capture_output=True,
                        text=True, check=True)
    assert r1.stdout.count("[DONE]") == 3, r1.stdout + r1.stderr
    # second run: skip-if-exists for every patient
    r2 = subprocess.run(ref_cmd, env=env, cwd=ref_cwd, capture_output=True,
                        text=True, check=True)
    assert r2.stdout.count("[SKIP]") == 3, r2.stdout

    our_out = tmp_path / "our_outputs"
    our_args = ["--fold", "1", "--ids-root", str(ids_root),
                "--long-audio-root", str(long_root),
                "--stage1-model-root", roots[1],
                "--stage2-model-root", roots[2],
                "--threshold-config", str(thr_config),
                "--output-dir", str(our_out),
                "--stage1-forward-min-prob", "0.55",
                "--disable-cache", "--f32"]
    run_batch_2stage.main(our_args)
    out1 = capsys.readouterr().out
    assert out1.count("[DONE]") == 3, out1
    run_batch_2stage.main(our_args)
    assert capsys.readouterr().out.count("[SKIP]") == 3

    refs, ours = _load_jsons(ref_out, pids), _load_jsons(our_out, pids)
    for pid in pids:
        r, o = refs[pid], ours[pid]
        assert set(o["per_file"]) == set(r["per_file"]), pid
        # the fold-threshold config must have reached the engine
        assert o["config"]["stage1_threshold"] == \
            r["config"]["stage1_threshold"] == 0.45, pid
        for fk, rf in r["per_file"].items():
            of = o["per_file"][fk]
            assert of["path"] == rf["path"], (pid, fk)
            for k in ["num_windows", "stage1_idle_windows",
                      "stage1_swallow_windows",
                      "stage2_swallow_windows_evaluated",
                      "stage2_healthy_windows", "stage2_zenker_windows"]:
                assert of[k] == rf[k], (pid, fk, k)
            np.testing.assert_allclose(of["stage1_mean_probs"],
                                       rf["stage1_mean_probs"], atol=2e-4)
        for k in ["total_windows", "total_idle_windows",
                  "total_swallow_windows",
                  "total_swallow_windows_evaluated_stage2",
                  "total_healthy_windows", "total_zenker_windows"]:
            assert o["aggregate"][k] == r["aggregate"][k], (pid, k)

    # non-vacuity across the batch: gating mixed, filter bit somewhere
    tot_sw = sum(r["aggregate"]["total_swallow_windows"] for r in refs.values())
    tot_eval = sum(r["aggregate"]["total_swallow_windows_evaluated_stage2"]
                   for r in refs.values())
    tot_idle = sum(r["aggregate"]["total_idle_windows"] for r in refs.values())
    assert tot_idle > 0 and tot_sw > 0 and 0 < tot_eval < tot_sw
