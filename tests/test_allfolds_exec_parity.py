"""Executed-reference differential for the all-folds shell wrapper.

Copies the reference's run_all_folds_simple_batch.sh (+ the two scripts it
invokes) into a synthetic project root and EXECUTES it with bash — .env
sourcing, per-fold model templates, threshold-config autodetection, the
{model}/results/patient_inference layout, and the always-on --plot — then
runs our `cli.run_all_folds` against an identical root and diffs every
per-patient JSON and the plot file set. torchaudio is stubbed on
PYTHONPATH with exact PCM16 decode (see test_batch_exec_parity).
"""

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REF_SRC = Path("/root/reference/src")
pytestmark = pytest.mark.skipif(not REF_SRC.exists(),
                                reason="reference not mounted")

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import test_batch_exec_parity as batch_assets  # noqa: E402
import test_cascade_exec_parity as cascade_assets  # noqa: E402

WRAPPER_FILES = ["run_all_folds_simple_batch.sh", "run_batch_simple_2stage.py",
                 "test_long_audio_windows_2stage_cache.py"]


def _make_patient(tmp_long, rel, rng):
    from zenker_audio_detection_tpu.audio import io as aio
    t = np.arange(16000 * 4) / 16000.0
    pdir = tmp_long / rel
    pdir.mkdir(parents=True)
    for name, sec, amps in (
        ("recA.wav", 3.3, [0.05, 1.0, 4.0, 0.3, 8.0, 0.02, 2.0]),
        ("recB.wav", 2.1, [6.0, 0.1, 1.0, 0.5]),
    ):
        n = int(16000 * sec)
        x = (0.05 * rng.standard_normal(n)
             + 0.1 * np.sin(2 * np.pi * 300 * t[:n]))
        for i in range(0, n, 8000):
            x[i:i + 8000] *= amps[(i // 8000) % len(amps)]
        aio.write_wav(str(pdir / name), x.astype(np.float32), 16000)


def _make_project_root(root, roots, long_root, ids):
    """A reference-shaped project root: .env, data_ast_stage2 ids, runs/
    model tree (every fold symlinked to the one exported pair), and the
    threshold config at the wrapper's autodetection path."""
    root.mkdir(parents=True)
    (root / ".env").write_text(f"LONG_AUDIO_ROOT={long_root}\n")
    ids_dir = root / "data_ast_stage2"
    ids_dir.mkdir()
    for fold, rel in ids.items():
        (ids_dir / f"test_ids_fold{fold}.txt").write_text(rel + "\n")
    for stage in (1, 2):
        for fold in ids:
            d = root / "runs" / f"ast_classifier_stage{stage}" / f"fold{fold}"
            d.mkdir(parents=True)
            (d / "best").symlink_to(roots[stage])
    (root / "runs" / "optimal_thresholds_per_fold_both_stages.json").write_text(
        json.dumps({"folds": {
            str(f): {"stage1": {"threshold": 0.45},
                     "stage2": {"threshold": 0.55 if f % 2 else 0.5}}
            for f in ids}}))
    return root


@pytest.mark.slow
def test_allfolds_wrapper_parity_vs_executed_reference(tmp_path, capsys,
                                                       monkeypatch):
    from zenker_audio_detection_tpu.cli import run_all_folds

    rng = np.random.default_rng(20260818)
    roots, _ = cascade_assets._make_assets(tmp_path, rng)

    long_root = tmp_path / "tree" / "long"
    ids = {1: "Zenker/P77", 2: "Healthy/H12", 3: "Zenker/Q34",
           4: "Healthy/H55", 5: "Zenker/R88"}
    tree_rng = np.random.default_rng(99)
    for rel in ids.values():
        _make_patient(long_root, rel, tree_rng)

    # --- reference side: copy the wrapper + the scripts it invokes into a
    # synthetic project root and execute the REAL bash wrapper
    ref_root = _make_project_root(tmp_path / "refroot", roots, long_root, ids)
    src_dir = ref_root / "src"
    src_dir.mkdir()
    for f in WRAPPER_FILES:
        shutil.copy(REF_SRC / f, src_dir / f)
    stub_dir = tmp_path / "stub"
    stub_dir.mkdir()
    (stub_dir / "torchaudio.py").write_text(batch_assets.TORCHAUDIO_STUB)
    env = dict(os.environ)
    env["PYTHONPATH"] = str(stub_dir) + os.pathsep + env.get("PYTHONPATH", "")
    env["PYTHON"] = sys.executable
    env.pop("LONG_AUDIO_ROOT", None)  # must come from the .env file
    r = subprocess.run(
        ["bash", str(src_dir / "run_all_folds_simple_batch.sh"), "runs",
         "--stage1-forward-min-prob", "0.55"],
        env=env, cwd=ref_root, capture_output=True, text=True, check=True)
    assert "All folds completed." in r.stdout
    ref_out = ref_root / "runs" / "results" / "patient_inference"

    # --- our side: identical project root, our CLI, cwd-based .env
    our_root = _make_project_root(tmp_path / "ourroot", roots, long_root, ids)
    monkeypatch.chdir(our_root)
    run_all_folds.main(["runs", "--stage1-forward-min-prob", "0.55",
                        "--plot", "--f32"])
    capsys.readouterr()
    our_out = our_root / "runs" / "results" / "patient_inference"

    pids = [rel.split("/")[-1] for rel in ids.values()]
    for pid in pids:
        ref = json.loads((ref_out / f"{pid}_2stage.json").read_text())
        ours = json.loads((our_out / f"{pid}_2stage.json").read_text())
        # per-fold threshold routing: even folds 0.5, odd folds 0.55
        for fk, rf in ref["per_file"].items():
            of = ours["per_file"][fk]
            for k in ["num_windows", "stage1_idle_windows",
                      "stage1_swallow_windows",
                      "stage2_swallow_windows_evaluated",
                      "stage2_healthy_windows", "stage2_zenker_windows"]:
                assert of[k] == rf[k], (pid, fk, k)
            np.testing.assert_allclose(of["stage1_mean_probs"],
                                       rf["stage1_mean_probs"], atol=2e-4)
        for k in ["total_windows", "total_swallow_windows",
                  "total_swallow_windows_evaluated_stage2",
                  "total_healthy_windows", "total_zenker_windows"]:
            assert ours["aggregate"][k] == ref["aggregate"][k], (pid, k)
        assert ours["config"]["stage1_threshold"] == \
            ref["config"]["stage1_threshold"] == 0.45, pid

    # the wrapper plots unconditionally: same plot artifacts must exist
    ref_plots = sorted(p.name for p in ref_out.glob("*.png"))
    our_plots = sorted(p.name for p in our_out.glob("*.png"))
    assert ref_plots and our_plots == ref_plots
