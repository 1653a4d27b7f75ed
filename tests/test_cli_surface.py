"""Import + argparse smoke for every CLI entry point (catches wiring
regressions cheaply; each module maps to a reference script, see
cli/__init__.py)."""

import importlib

import pytest

CLI_MODULES = [
    "prepare_dataset", "prepare_training_data", "prepare_two_stage",
    "compute_stats", "train_stage1", "train_stage2", "test_stage1",
    "test_stage2", "infer_long_audio", "run_batch_2stage", "run_all_folds",
    "analyze_roc_pr", "extract_thresholds", "aggregate_results",
    "plot_confusion_matrices", "sweep", "adapt_checkpoint", "serve",
    "serve_supervisor", "validate_real", "drift",
]


@pytest.mark.parametrize("name", CLI_MODULES)
def test_cli_help(name, capsys):
    mod = importlib.import_module(f"zenker_audio_detection_tpu.cli.{name}")
    assert callable(mod.main)
    with pytest.raises(SystemExit) as e:
        mod.main(["--help"])
    assert e.value.code == 0
    assert "usage:" in capsys.readouterr().out


def test_console_scripts_point_at_real_mains():
    import tomllib
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    with open(repo / "pyproject.toml", "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    assert len(scripts) == len(CLI_MODULES)
    for target in scripts.values():
        mod_name, func = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func))


def test_reference_flag_aliases_and_optim_validation():
    """Drop-in parity names from the reference scripts parse to the same
    dests, and --optim rejects non-AdamW identifiers (reference
    src/train_ast_stage1_cross_validation.py:706-709)."""
    import argparse

    from zenker_audio_detection_tpu.cli import _train_common, infer_long_audio

    ap = argparse.ArgumentParser()
    _train_common.add_common_train_args(ap, "stage1")
    args = ap.parse_args(["--disable-early-stopping",
                          "--wandb-entity", "someteam",
                          "--optim", "adamw_torch_fused"])
    assert args.no_early_stopping
    assert _train_common.tracking_opts(args)["entity"] == "someteam"
    _train_common.validate_train_args(args)

    bad = ap.parse_args(["--optim", "sgd"])
    with pytest.raises(SystemExit):
        _train_common.validate_train_args(bad)

    # infer CLI: --feature-cache-dir is the reference cache script's name
    iargs = infer_long_audio.build_arg_parser().parse_args(
        ["--feature-cache-dir", "/tmp/fc"])
    assert iargs.cache_dir == "/tmp/fc"


def test_eval_clis_reject_out_of_range_fold():
    """--fold 0 is falsy: without validation it silently evaluated ALL
    folds instead of erroring (analyze CLI shares the pattern)."""
    from zenker_audio_detection_tpu.cli import analyze_roc_pr, test_stage1

    for argv in (["--fold", "0"], ["--fold", "-1"], ["--fold", "6"]):
        with pytest.raises(SystemExit, match="--fold must be in"):
            test_stage1.run("stage1", argv)
        with pytest.raises(SystemExit, match="--fold must be in"):
            analyze_roc_pr.main(argv)


def test_serve_rejects_nonpositive_read_chunk():
    """read(0) is instant EOF and read(-n) buffers the whole stream —
    both silently defeat streaming; the flag must be >= 1."""
    from zenker_audio_detection_tpu.cli import serve

    for bad in ("0", "-1"):
        with pytest.raises(SystemExit, match="read-chunk-samples"):
            serve.main(["--read-chunk-samples", bad])
