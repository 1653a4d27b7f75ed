"""``zenker-drift`` — reproducible quality-drift benchmark (one JSON line).

Builds the seed-pinned synthetic corpus, trains both cascade stages with
the frozen recipe, scores them on the calibrated-overlap corpora (the
non-saturating regime of the reference paper,
/root/reference/utils/plot_confusion_matrices.py:168-184), and prints ONE
JSON line with every figure plus band verdicts against the frozen pins in
analysis/drift_bench.py — the quality analogue of bench.py, so
quality-on-TPU is reproducible and trendable (QUALITY_r*.json) instead of
living in ad-hoc scripts (VERDICT r4 item #1).

    zenker-drift --cpu                  # force CPU backend (the pin config)
    zenker-drift                        # default JAX platform (real chip)
    zenker-drift --workdir /tmp/zd --keep

Runtime: trains 2x12 epochs on a tiny model — ~15 min quiet CPU, ~8 min on
a warm-cache v5e (first chip run compiles each program once; importing the
package enables the persistent XLA cache).
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Quality-drift benchmark: train the frozen synthetic "
                    "recipe and score it on the overlap corpora; one JSON "
                    "line with band verdicts.")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the pin-measurement "
                         "config); default uses the session's JAX platform")
    ap.add_argument("--workdir", default=None,
                    help="scratch dir (default: fresh temp dir)")
    ap.add_argument("--keep", action="store_true",
                    help="keep the workdir (runs, outputs, corpora)")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        # jax pre-imports with the axon platform in this image; the env var
        # is too late — flip the platform before any backend use
        jax.config.update("jax_platforms", "cpu")

    from ..analysis import drift_bench

    workdir = args.workdir or tempfile.mkdtemp(prefix="zenker_drift_")
    made_temp = args.workdir is None
    t0 = time.time()
    try:
        results, checks = drift_bench.run(workdir)
    finally:
        if made_temp and not args.keep:
            shutil.rmtree(workdir, ignore_errors=True)

    payload = {
        "metric": "quality_drift_patient_accuracy",
        "value": results["patient_acc_f32"],
        "unit": "accuracy",
        "backend": jax.default_backend(),
        "in_band": all(checks.values()),
        **results,
        "pins": {"s1_auc": drift_bench.PIN_S1_F32,
                 "s2_auc": drift_bench.PIN_S2_F32,
                 "patient_acc": drift_bench.PIN_PATIENT_F32,
                 "band_auc": drift_bench.BAND_AUC,
                 "band_patient": round(drift_bench.BAND_PATIENT, 6)},
        "checks": checks,
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(payload))
    failed = [k for k, ok in checks.items() if not ok]
    if failed:
        print(f"# FAILED bands: {failed}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
