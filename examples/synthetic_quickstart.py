#!/usr/bin/env python
"""Synthetic end-to-end quickstart / install validator.

Runs the COMPLETE reference workflow (SURVEY §3: prepare -> CV splits ->
normalization stats -> train both stages -> snippet eval -> ROC/PR ->
threshold extraction -> batch patient inference -> aggregation -> CM plots
-> real-time serving) on generated WAVs with a tiny random "pretrained"
checkpoint, inside a scratch directory. Nothing external is needed: no
dataset, no downloaded model, no network.

    python examples/synthetic_quickstart.py            # CPU, ~6-10 min
    python examples/synthetic_quickstart.py --tpu      # default JAX platform
    python examples/synthetic_quickstart.py --workdir /tmp/zq --keep

The --tpu path exercises every stage on real hardware (verified end-to-end
on a v5e: ~8 min with a warm persistent compile cache). The FIRST TPU run
compiles each of the pipeline's programs once — importing the package
enables the persistent XLA cache, so later runs skip all of it.

This mirrors tests/test_cli_workflow.py as user-runnable documentation:
every command below is exactly what you would run on real data (with a
real dataset root and the MIT AST checkpoint dir as --pretrained-model-dir).
"""

import argparse
import json
import os
import shutil
import sys
import tempfile

import numpy as np

# run straight from a git checkout, no install needed (harmless if installed)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(step, msg):
    print(f"[{step}] {msg}", flush=True)


def synthesize_raw_dataset(root):
    """RAW SwallowSet-shaped tree, the actual starting point of the
    reference workflow (utils/PrepareDataset.py): each specimen is a
    `Class/<PID>_<session>/` folder whose "1sec"-tagged subfolder holds the
    short clips and whose "long"-tagged subfolder holds continuous
    recordings. Healthy = quiet, Zenker = loud, so even a tiny model
    separates them; Idle specimens have only short clips (the long
    organizer skips the Idle class by design)."""
    from zenker_audio_detection_tpu.audio import io as aio

    rng = np.random.default_rng(0)
    raw = os.path.join(root, "Raw")
    for cls, n_pat, amp in [("Healthy", 6, 0.1), ("Zenker", 6, 0.8)]:
        for i in range(n_pat):
            pid = f"{cls[0]}{i:02d}"
            d = os.path.join(raw, cls, f"{pid}_session1", f"{pid}_1sec_clips")
            os.makedirs(d, exist_ok=True)
            for k in range(4):
                aio.write_wav(os.path.join(d, f"c{k}.wav"),
                              (rng.standard_normal(16000) * amp
                               ).astype(np.float32), 16000, dtype="float32")
            ld = os.path.join(raw, cls, f"{pid}_session1", "long_recordings")
            os.makedirs(ld, exist_ok=True)
            for fn in ("recA.wav", "recB.wav"):
                quiet = rng.standard_normal(8000) * 0.001
                active = rng.standard_normal(40000) * amp
                aio.write_wav(os.path.join(ld, fn),
                              np.concatenate([quiet, active]
                                             ).astype(np.float32),
                              16000, dtype="float32")
    for pid in [f"{c}{i:02d}" for c in "HZ" for i in range(6)]:
        d = os.path.join(raw, "Idle", f"{pid}_session1", f"{pid}_1sec_clips")
        os.makedirs(d, exist_ok=True)
        for k in range(2):
            aio.write_wav(os.path.join(d, f"i{k}.wav"),
                          (rng.standard_normal(16000) * 0.001
                           ).astype(np.float32), 16000, dtype="float32")
    return raw


def make_tiny_pretrained(path):
    import jax

    from zenker_audio_detection_tpu.models import ast as ast_mod, convert

    cfg = ast_mod.ASTConfig(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=4, intermediate_size=64,
                            num_labels=527)  # AudioSet-shaped head
    convert.save_hf_model_dir(ast_mod.init_params(jax.random.PRNGKey(3), cfg),
                              cfg, path)
    return path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--workdir", default=None,
                    help="scratch dir (default: a fresh temp dir)")
    ap.add_argument("--keep", action="store_true",
                    help="keep the scratch dir (implied by --workdir)")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default JAX platform instead of CPU")
    ap.add_argument("--extended", action="store_true",
                    help="also drive the remaining tools: checkpoint "
                         "adaptation (short-seq + int8 exports served "
                         "transparently), a 2-trial hyperparameter sweep, "
                         "the all-folds batch driver, and the real-asset "
                         "validation runbook (adds ~3-5 min on CPU)")
    args = ap.parse_args(argv)

    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    keep = args.keep or args.workdir is not None
    workdir = args.workdir or tempfile.mkdtemp(prefix="zenker_quickstart_")
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)  # the CLIs use the reference's relative default paths
    log("0/10", f"workdir: {workdir}")

    raw = synthesize_raw_dataset(workdir)
    pretrained = make_tiny_pretrained(os.path.join(workdir, "pretrained"))
    log("1/10", "raw synthetic dataset + tiny random pretrained checkpoint "
        "ready")

    from zenker_audio_detection_tpu.cli import (
        aggregate_results, analyze_roc_pr, compute_stats, extract_thresholds,
        infer_long_audio, plot_confusion_matrices, prepare_dataset,
        prepare_training_data, prepare_two_stage, run_batch_2stage, serve,
        test_stage1, test_stage2, train_stage1, train_stage2)

    short = os.path.join(workdir, "Short")
    long_dir = os.path.join(workdir, "Long")
    prepare_dataset.main(["--mode", "both", "--raw-data-dir", raw,
                          "--short-audio-dir", short,
                          "--long-audio-dir", long_dir])
    log("2/10", "raw tree organized into Class/<patient>/ short + long "
        "trees (PCM16)")

    prepare_training_data.main(["--dataset-root", short])
    prepare_two_stage.main(["--val-ratio", "0.25"])
    log("3/10", "patient-level CV splits + two-stage derivation written")

    compute_stats.main(["--stage", "stage1", "--folds", "1"])
    compute_stats.main(["--stage", "stage2", "--folds", "1"])
    log("4/10", "per-fold normalization stats computed")

    common = ["--fold", "1", "--num-epochs", "12", "--batch-size", "8",
              "--learning-rate", "1e-2", "--no-augment", "--f32",
              "--no-early-stopping", "--pretrained-model-dir", pretrained]
    train_stage1.main(common)
    # pure CE for stage 2 on this tiny random-init model: the reference's
    # focal+smoothing defaults cap window probabilities near 0.5, leaving
    # no margin for the patient ZSR decision (loss-quirk parity is pinned
    # by the test suite; this demo shows the calibrated decision path)
    train_stage2.main(common + ["--focal-gamma", "0",
                                "--label-smoothing", "0"])
    log("5/10", "both stages fine-tuned (fold 1); best models exported "
        "as HF-compatible dirs under runs/")

    test_stage1.main(["--fold", "1", "--f32"])
    test_stage2.main(["--fold", "1", "--f32"])
    log("6/10", "snippet evaluation written (confusion matrices + reports)")

    analyze_roc_pr.main(["--stage", "stage2", "--fold", "1", "--f32",
                         "--output-json", "rocpr/stage2_val.json"])
    extract_thresholds.main(["--stage2-metrics", "rocpr/stage2_val.json",
                             "--output-config", "thr.json"])
    log("7/10", "validation ROC/PR analyzed; per-fold thresholds extracted")

    run_batch_2stage.main(["--fold", "1", "--long-audio-root", long_dir,
                           "--output-dir", "outputs",
                           "--threshold-config", "thr.json",
                           "--f32", "--batch-size", "16"])
    aggregate_results.main(["--outputs-dir", "outputs", "--store-output"])
    summary = json.load(open("outputs/aggregate_summary.json"))["summary"]
    log("8/10", f"patient-level inference + aggregation: "
        f"{summary['num_patient_results']} patients, "
        f"accuracy={summary['metrics']['accuracy']:.3f}")

    plot_confusion_matrices.main(["--model-root", "runs"])
    infer_long_audio.main(["--fold", "1", "--patient-id", "Z00",
                           "--long-audio-root", long_dir,
                           "--output-json", "outputs/manual_Z00.json",
                           "--plot", "--plot-dir", "plots", "--f32"])
    log("9/10", "CM plots + single-patient inference with waveform plot")

    wav = os.path.join(long_dir, "Zenker", "Z00", "recA.wav")
    serve.main(["--fold", "1", "--input", wav, "--f32",
                "--chunk-windows", "2"])
    log("10/10", "real-time serving simulated over a recording (JSONL above)")

    if args.extended:
        from zenker_audio_detection_tpu.cli import (
            adapt_checkpoint, run_all_folds, sweep as sweep_cli,
            validate_real)

        # E1: adapt the trained checkpoints to 128-frame windows (plus an
        # int8 stage-1 export) and serve them transparently — the engine
        # reads max_length / quantization from the exported config.
        # The ranking-drift guardrail auto-discovers data_ast_stage{1,2}/
        # in cwd and prints the measured pre/post AUC; --allow-drift: this
        # quickstart serves the adapted dirs regardless of the verdict
        # (on real models, heed the warning and fine-tune instead)
        for stage in ("stage1", "stage2"):
            adapt_checkpoint.main(
                [f"runs/ast_classifier_{stage}/fold1/best",
                 f"runs_short/ast_classifier_{stage}/fold1/best",
                 "--max-length", "128", "--allow-drift"])
        adapt_checkpoint.main(
            ["runs/ast_classifier_stage1/fold1/best",
             "runs_short_int8/ast_classifier_stage1/fold1/best",
             "--max-length", "128", "--int8", "--allow-drift"])
        infer_long_audio.main(["--fold", "1", "--patient-id", "Z00",
                               "--long-audio-root", long_dir,
                               "--model-root", "runs_short",
                               "--output-json", "outputs/short_Z00.json",
                               "--f32"])
        # serve the int8 stage-1 export too (engine auto-detects
        # model_int8.safetensors from the dir) — f32 short-seq stage 2
        infer_long_audio.main(
            ["--patient-id", "Z00", "--long-audio-root", long_dir,
             "--stage1-model-root",
             "runs_short_int8/ast_classifier_stage1/fold1/best",
             "--stage2-model-root",
             "runs_short/ast_classifier_stage2/fold1/best",
             "--output-json", "outputs/int8_Z00.json", "--f32"])
        log("E1", "short-seq (max_length=128) adaptation + int8 export; "
            "single-patient inference served from the adapted dirs "
            "(f32-short and int8-stage1 variants)")

        # E2: a 2-trial random-search sweep through the local agent
        with open("sweep_tiny.yaml", "w") as f:
            f.write("name: quickstart_sweep\nmethod: random\n"
                    "metric: {name: eval_f1, goal: maximize}\n"
                    "parameters:\n  fold: {values: [1]}\n"
                    "  learning-rate:\n"
                    "    distribution: log_uniform_values\n"
                    "    min: 1.0e-3\n    max: 1.0e-2\n")
        sweep_cli.main(["sweep_tiny.yaml", "--stage", "stage1", "--count",
                        "2", "--num-epochs", "2", "--batch-size", "8",
                        "--no-augment", "--f32", "--output-dir",
                        "sweep_runs", "--pretrained-model-dir", pretrained])
        log("E2", "2-trial hyperparameter sweep completed (best config "
            "under sweep_runs/)")

        # E3: the all-folds batch driver (one trained fold here) + its
        # chained patient aggregation
        run_all_folds.main(["runs", "--num-folds", "1",
                            "--long-audio-root", long_dir,
                            "--output-dir", "outputs_allfolds",
                            "--threshold-config", "thr.json", "--f32",
                            "--force", "--aggregate"])
        log("E3", "all-folds batch driver + aggregation completed")

        # E4: the real-asset validation runbook. On synthetic data the
        # evaluation-set size never matches the paper's, so the paper-CM
        # comparison cannot happen: the runbook must run every check clean
        # yet exit 2 (INCONCLUSIVE), never a parity-proving 0.
        rc = 0
        try:
            validate_real.main(["--runs-dir", "runs",
                                "--data-stage1", "data_ast_stage1",
                                "--data-stage2", "data_ast_stage2",
                                "--long-audio-root", long_dir,
                                "--folds", "1", "--f32",
                                "--output-dir", "validation"])
        except SystemExit as e:
            rc = int(e.code or 0)
        if rc != 2:
            raise RuntimeError(
                f"validate-real exited {rc}; expected 2 (clean run, but a "
                f"synthetic eval set cannot be compared against the "
                f"paper's published numbers)")
        log("E4", "real-asset validation runbook ran end-to-end and "
            "correctly reported INCONCLUSIVE (exit 2) on synthetic data")

    print(f"\nAll steps completed. Artifacts under: {workdir}")
    print("  runs/              trained models + evaluation")
    print("  rocpr/, thr.json   calibration")
    print("  outputs/, plots/   patient inference")
    if not keep:
        os.chdir("/")
        shutil.rmtree(workdir)
        print("(scratch dir removed; pass --keep to retain it)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
