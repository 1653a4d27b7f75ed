"""Executed-reference differential for the per-patient aggregator.

Like tests/test_splits.py, this runs the ACTUAL reference script
(/root/reference/utils/aggregate_2stage_results.py) on randomized
per-patient JSON corpora and diffs our `cli.aggregate_results` output
against it — summary JSON (reference keys; ours adds additive
skipped_batch_summaries/parse_errors keys) and the per-patient CSV rows.
"""

import csv
import json
import math
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REF_SCRIPT = Path("/root/reference/utils/aggregate_2stage_results.py")
pytestmark = pytest.mark.skipif(not REF_SCRIPT.exists(),
                                reason="reference not mounted")


def _patient_payload(r, gt_dir):
    """One *_2stage.json with randomized aggregate fields."""
    ratio_kind = r.choice(["num", "none", "nan", "edge"])
    if ratio_kind == "num":
        ratio = float(np.round(r.uniform(0, 1), 3))
    elif ratio_kind == "edge":
        ratio = 0.5  # exactly at the default threshold (>= gates Zenker)
    elif ratio_kind == "nan":
        ratio = float("nan")  # json emits the non-std NaN token; both read it
    else:
        ratio = None
    files_used = ([] if r.uniform() < 0.1 else
                  [f"/data/{gt_dir}/p/{i}.wav" for i in range(int(r.integers(1, 4)))])
    return {
        "config": {"threshold": 0.5},
        "per_file": {},
        "aggregate": {
            "files_used": files_used,
            "total_windows": int(r.integers(0, 500)),
            "total_idle_windows": int(r.integers(0, 100)),
            "total_swallow_windows": int(r.integers(0, 400)),
            "total_swallow_windows_evaluated_stage2": int(r.integers(0, 400)),
            "total_healthy_windows": int(r.integers(0, 200)),
            "total_zenker_windows": int(r.integers(0, 200)),
            "overall_zenker_ratio_over_swallow": ratio,
        },
    }


def _make_corpus(out: Path, r):
    out.mkdir(parents=True)
    n = int(r.integers(4, 16))
    for i in range(n):
        gt_dir = str(r.choice(["Healthy", "Zenker", "Mystery"]))
        pid = f"{int(r.integers(100, 999))}{chr(65 + i)}"
        (out / f"{pid}_2stage.json").write_text(
            json.dumps(_patient_payload(r, gt_dir)))
    # batch summary files: skipped by the loop but counted in
    # num_files_found (reference quirk: len(files) precedes the skip)
    for fold in range(1, int(r.integers(1, 4))):
        (out / f"batch_fold{fold}_2stage.json").write_text(
            json.dumps({"fold": fold}))
    if r.uniform() < 0.7:  # corrupt file: silently skipped by the reference
        (out / "999X_2stage.json").write_text("{not json")
    return out


def _run_ref(outputs_dir: Path, threshold: float, tmp: Path):
    js, cs = tmp / "ref.json", tmp / "ref.csv"
    subprocess.run(
        [sys.executable, str(REF_SCRIPT), "--outputs-dir", str(outputs_dir),
         "--threshold", str(threshold), "--json", str(js), "--csv", str(cs)],
        check=True, capture_output=True, text=True)
    return json.loads(js.read_text()), cs.read_text()


def _run_ours(outputs_dir: Path, threshold: float, tmp: Path):
    from zenker_audio_detection_tpu.cli import aggregate_results
    js, cs = tmp / "our.json", tmp / "our.csv"
    aggregate_results.main(["--outputs-dir", str(outputs_dir),
                            "--threshold", str(threshold),
                            "--json", str(js), "--csv", str(cs)])
    return json.loads(js.read_text()), cs.read_text()


def _csv_rows(text, fieldnames):
    rows = list(csv.DictReader(text.splitlines()))
    return [{k: row.get(k) for k in fieldnames} for row in rows]


def test_aggregator_randomized_corpora_parity(tmp_path, capsys):
    for trial in range(4):
        r = np.random.default_rng(4200 + trial)
        corpus = _make_corpus(tmp_path / f"c{trial}" / "outputs", r)
        threshold = float(r.choice([0.5, 0.31, 0.8]))
        ref_doc, ref_csv = _run_ref(corpus, threshold, tmp_path / f"c{trial}")
        our_doc, our_csv = _run_ours(corpus, threshold, tmp_path / f"c{trial}")
        capsys.readouterr()
        ref, ours = ref_doc["summary"], our_doc["summary"]

        # per-patient payloads must match exactly (NaN != NaN, so compare
        # through a json round-trip with NaN normalized to a sentinel)
        def _norm(obj):
            return json.loads(json.dumps(obj).replace("NaN", '"<nan>"'))
        assert _norm(our_doc["patients"]) == _norm(ref_doc["patients"]), trial

        for key in ["outputs_dir", "threshold", "num_files_found",
                    "num_patient_results", "skipped_no_ratio",
                    "skipped_unknown_gt", "confusion_matrix"]:
            assert ours[key] == ref[key], (trial, key)
        for mk, rv in ref["metrics"].items():
            ov = ours["metrics"][mk]
            if rv is None:
                assert ov is None, (trial, mk)
            else:
                assert ov is not None and math.isclose(ov, rv,
                                                       rel_tol=1e-12), \
                    (trial, mk, ov, rv)

        fields = ["patient_id", "gt", "ratio", "predicted_label", "tp",
                  "tn", "fp", "fn", "swallow_windows", "zenker_windows",
                  "healthy_windows", "total_windows", "json_path"]
        assert _csv_rows(our_csv, fields) == _csv_rows(ref_csv, fields), trial


REF_THRESH = Path("/root/reference/utils/extract_thresholds_per_fold.py")


def _metrics_payload(r, n_folds):
    """Randomized validation_metrics.json in the ROC/PR analyzer's shape."""
    reports = []
    for fold in range(1, n_folds + 1):
        rep = {"fold": fold}
        if r.uniform() < 0.85:  # missing threshold -> fold skipped
            rep["best_f1_threshold"] = float(np.round(r.uniform(0.1, 0.9), 4))
            # best_f1 accompanies the threshold (the ROC/PR analyzer always
            # writes both; the reference script's summary print crashes on a
            # None f1, so threshold-without-f1 is not a reachable payload)
            rep["best_f1"] = float(np.round(r.uniform(0, 1), 4))
            # precision/recall are not printed: None/missing must pass through
            if r.uniform() < 0.8:
                rep["best_f1_precision"] = float(np.round(r.uniform(0, 1), 4))
            if r.uniform() < 0.5:
                rep["best_f1_recall"] = None
        reports.append(rep)
    if r.uniform() < 0.3:  # fold-less report entry: skipped
        reports.append({"best_f1_threshold": 0.5})
    payload = {"fold_reports": reports}
    if r.uniform() < 0.7:
        payload["aggregate"] = {
            "best_f1_threshold": float(np.round(r.uniform(0.1, 0.9), 4)),
            "best_f1": float(np.round(r.uniform(0, 1), 4)),
            # precision/recall left missing -> reference defaults them to 0
        }
    return payload


@pytest.mark.skipif(not REF_THRESH.exists(), reason="reference not mounted")
def test_threshold_extractor_randomized_parity(tmp_path, capsys):
    """cli.extract_thresholds vs the executed reference script on 4 random
    metrics payloads — per-fold/aggregate structure, skip rules for
    missing thresholds, and None/default handling must match exactly."""
    from zenker_audio_detection_tpu.cli import extract_thresholds

    for trial in range(4):
        r = np.random.default_rng(8800 + trial)
        d = tmp_path / f"t{trial}"
        d.mkdir()
        s2 = d / "stage2_val.json"
        s2.write_text(json.dumps(_metrics_payload(r, int(r.integers(1, 7)))))
        args2 = ["--stage2-metrics", str(s2)]
        if r.uniform() < 0.7:
            s1 = d / "stage1_val.json"
            s1.write_text(json.dumps(
                _metrics_payload(r, int(r.integers(1, 7)))))
            args2 += ["--stage1-metrics", str(s1)]

        ref_out = d / "ref_config.json"
        subprocess.run(
            [sys.executable, str(REF_THRESH), *args2,
             "--output-config", str(ref_out)],
            check=True, capture_output=True, text=True)
        our_out = d / "our_config.json"
        extract_thresholds.main([*args2, "--output-config", str(our_out)])
        capsys.readouterr()
        assert json.loads(our_out.read_text()) == \
            json.loads(ref_out.read_text()), trial
