"""Unit coverage for the ``zenker-drift`` quality benchmark CLI: the
one-JSON-line contract, band verdict logic, and exit semantics — the
driver/trending contract, cheap enough for every CI run (the full
pipeline is exercised by tests/test_cli_workflow.py, which shares the
drift_bench builders, and by the committed QUALITY_r*.json artifacts)."""

import json

import pytest

from zenker_audio_detection_tpu.analysis import drift_bench
from zenker_audio_detection_tpu.cli import drift as drift_cli


def _good_results():
    return {
        "stage1_auc_f32": drift_bench.PIN_S1_F32,
        "stage1_auc_int8": drift_bench.PIN_S1_F32 + 0.004,
        "stage1_auc_short": 0.70,
        "stage2_auc_f32": drift_bench.PIN_S2_F32,
        "stage2_auc_int8": drift_bench.PIN_S2_F32 - 0.002,
        "stage2_auc_short": drift_bench.PIN_S2_F32,
        "patient_acc_f32": drift_bench.PIN_PATIENT_F32,
        "patient_acc_int8": drift_bench.PIN_PATIENT_F32,
    }


def test_in_band_passes_and_discriminates():
    checks = drift_bench.in_band(_good_results())
    assert all(checks.values()), checks

    # each failure mode flips exactly its own check
    cases = {
        "s1_f32_pin": ("stage1_auc_f32", drift_bench.PIN_S1_F32 + 0.04),
        "s2_f32_pin": ("stage2_auc_f32", drift_bench.PIN_S2_F32 - 0.04),
        "s1_int8_delta": ("stage1_auc_int8",
                          drift_bench.PIN_S1_F32 + 0.02),
        "s2_short_delta": ("stage2_auc_short",
                           drift_bench.PIN_S2_F32 - 0.02),
        "s1_short_floor": ("stage1_auc_short", 0.55),
        "patient_int8_delta": ("patient_acc_int8",
                               drift_bench.PIN_PATIENT_F32
                               - drift_bench.BAND_PATIENT_INT8 - 0.01),
    }
    for check_name, (key, bad_value) in cases.items():
        r = _good_results()
        r[key] = bad_value
        checks = drift_bench.in_band(r)
        assert not checks[check_name], (check_name, r)

    # saturation guards: a benchmark that saturates has lost sensitivity
    r = _good_results()
    r["patient_acc_f32"] = r["patient_acc_int8"] = 1.0
    checks = drift_bench.in_band(r)
    assert not checks["patient_nonsaturated"]


def test_band_edges_inclusive():
    """Exactly-at-band results pass (the TPU backend historically landed
    at the edge; VERDICT r4 weak #1 — the 1e-9 epsilon keeps float
    round-off from flipping a legitimate edge landing)."""
    r = _good_results()
    r["patient_acc_f32"] = (drift_bench.PIN_PATIENT_F32
                            + drift_bench.BAND_PATIENT)
    r["patient_acc_int8"] = (r["patient_acc_f32"]
                             - drift_bench.BAND_PATIENT_INT8)
    checks = drift_bench.in_band(r)
    assert checks["patient_pin"] and checks["patient_int8_delta"], checks


def test_cli_one_json_line_and_exit(monkeypatch, capsys, tmp_path):
    results = _good_results()
    monkeypatch.setattr(drift_bench, "run",
                        lambda wd: (results, drift_bench.in_band(results)))
    drift_cli.main(["--cpu", "--workdir", str(tmp_path / "wd")])
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.strip()]
    assert len(lines) == 1, out
    payload = json.loads(lines[0])
    assert payload["metric"] == "quality_drift_patient_accuracy"
    assert payload["value"] == results["patient_acc_f32"]
    assert payload["in_band"] is True
    assert payload["pins"]["patient_acc"] == drift_bench.PIN_PATIENT_F32
    assert payload["backend"] == "cpu"  # --cpu flipped the platform
    assert set(payload["checks"]) == set(drift_bench.in_band(results))

    # failed bands: still one JSON line (in_band false) + exit 1 + the
    # failing band names on stderr
    bad = dict(results, stage1_auc_f32=0.5)
    monkeypatch.setattr(drift_bench, "run",
                        lambda wd: (bad, drift_bench.in_band(bad)))
    with pytest.raises(SystemExit) as e:
        drift_cli.main(["--cpu", "--workdir", str(tmp_path / "wd2")])
    assert e.value.code == 1
    captured = capsys.readouterr()
    lines = [l for l in captured.out.splitlines() if l.strip()]
    assert len(lines) == 1
    assert json.loads(lines[0])["in_band"] is False
    assert "s1_f32_pin" in captured.err


def test_cli_temp_workdir_cleanup(monkeypatch, tmp_path):
    """Default (no --workdir): a fresh temp dir, removed afterwards even
    when the run raises."""
    import os

    seen = {}

    def fake_run(wd):
        seen["wd"] = wd
        raise RuntimeError("boom")

    monkeypatch.setattr(drift_bench, "run", fake_run)
    with pytest.raises(RuntimeError):
        drift_cli.main(["--cpu"])
    # tempfile's cached tempdir decides WHERE; the contract is that the
    # scratch dir is gone afterwards even on a raising run
    assert "zenker_drift_" in seen["wd"]
    assert not os.path.exists(seen["wd"])
