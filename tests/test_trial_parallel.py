"""Trial-parallel sweeps (train/trial_parallel.py) must reproduce the
sequential trainer per trial: same per-trial metrics/history for the same
sampled hyperparameters (the traced-hyperparameter AdamW + traced losses
against the optax/branchy sequential path), plus the agent-level dispatch
(tune/sweep.py parallel_trials) and the simultaneous Hyperband cut."""

import dataclasses
import json

import numpy as np
import pytest

from zenker_audio_detection_tpu.audio import io as aio
from zenker_audio_detection_tpu.models import ast as ast_mod, convert
from zenker_audio_detection_tpu.train import loop as L
from zenker_audio_detection_tpu.train.trial_parallel import (
    train_trials_parallel)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """One fold (11 train clips -> a tail batch at bs=4) + val/test."""
    import jax

    root = tmp_path_factory.mktemp("tp")
    rng = np.random.default_rng(11)
    data = root / "data"
    data.mkdir()

    def make_split(name, n):
        xs, ys = [], []
        for i in range(n):
            label = i % 2
            amp = 0.004 if label == 0 else 0.5
            d = root / "wavs" / name / str(i)
            d.mkdir(parents=True, exist_ok=True)
            fp = d / "clip.wav"
            aio.write_wav(str(fp),
                          (rng.standard_normal(16000) * amp
                           ).astype(np.float32), 16000, dtype="float32")
            xs.append(str(fp))
            ys.append(label)
        np.save(data / f"{name}_x_fold1.npy", np.asarray(xs, object))
        np.save(data / f"{name}_y_fold1.npy", np.asarray(ys))

    make_split("train", 11)
    make_split("val", 6)
    make_split("test", 6)

    cfg = ast_mod.ASTConfig(hidden_size=16, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=32,
                            max_length=128, num_labels=527)
    params = ast_mod.init_params(jax.random.PRNGKey(3), cfg)
    pre = root / "pretrained"
    convert.save_hf_model_dir(params, cfg, str(pre))
    return root


TRIALS = [  # spans both branch points (gamma=0, ls=0) and the swept space
    dict(learning_rate=1e-3, weight_decay=0.01, adam_beta2=0.98,
         warmup_ratio=0.1, focal_gamma=0.0, label_smoothing=0.0),
    dict(learning_rate=3e-4, weight_decay=0.05, adam_beta2=0.95,
         warmup_ratio=0.25, focal_gamma=2.0, label_smoothing=0.1),
    dict(learning_rate=2e-3, weight_decay=0.0, adam_beta2=0.999,
         warmup_ratio=0.0, focal_gamma=1.0, label_smoothing=0.07),
]


def _cfg(tree, tag, stage="stage1", **kw):
    import jax.numpy as jnp

    defaults = dict(
        stage=stage, data_dir=str(tree / "data"),
        output_root=str(tree / f"runs_{tag}"),
        pretrained_model_dir=str(tree / "pretrained"),
        num_epochs=3, batch_size=4, eval_batch_size=4,
        enable_early_stopping=True, augment=True,
        dtype=jnp.float32, seed=42)
    defaults.update(kw)
    return L.TrainFoldConfig(**defaults)


def _trial_cfgs(tree, tag, stage="stage1"):
    return [dataclasses.replace(_cfg(tree, f"{tag}_t{i}", stage=stage),
                                **overrides)
            for i, overrides in enumerate(TRIALS)]


@pytest.mark.parametrize("stage", ["stage1", "stage2"])
def test_trials_parallel_match_sequential(tree, stage):
    kw = dict(use_class_weights=True) if stage == "stage2" else {}
    seq_cfgs = [dataclasses.replace(c, **kw)
                for c in _trial_cfgs(tree, f"seq_{stage}", stage)]
    seq = [L.train_fold(1, c) for c in seq_cfgs]

    par_cfgs = [dataclasses.replace(c, **kw)
                for c in _trial_cfgs(tree, f"par_{stage}", stage)]
    par = train_trials_parallel(1, par_cfgs)

    for t, (ms, mp) in enumerate(zip(seq, par)):
        assert set(ms) == set(mp)
        for k in ms:
            if "runtime" in k or "per_second" in k:
                continue  # wall-clock speed metrics differ run to run
            assert abs(ms[k] - mp[k]) < 1e-4, (t, k, ms[k], mp[k])
        hs = json.loads((tree / f"runs_seq_{stage}_t{t}" / "fold1"
                         / "history.json").read_text())
        hp = json.loads((tree / f"runs_par_{stage}_t{t}" / "fold1"
                         / "history.json").read_text())
        assert len(hs) == len(hp)
        for es, ep in zip(hs, hp):
            for k in ("loss", "f1", "accuracy"):
                assert abs(es[k] - ep[k]) < 1e-4, (t, k, es, ep)
        assert (tree / f"runs_par_{stage}_t{t}" / "fold1"
                / "best/model.safetensors").exists()


def test_trials_parallel_sharded_over_mesh(tree):
    """Trial axis over 3 of the 8 virtual devices: same history as the
    single-device parallel run (which the test above pinned to sequential)."""
    cfgs = _trial_cfgs(tree, "par_mesh")
    cfgs = [dataclasses.replace(c, num_devices=3) for c in cfgs]
    train_trials_parallel(1, cfgs)
    for t in range(len(TRIALS)):
        hp = json.loads((tree / f"runs_par_mesh_t{t}" / "fold1"
                         / "history.json").read_text())
        hs = json.loads((tree / f"runs_par_stage1_t{t}" / "fold1"
                         / "history.json").read_text())
        assert len(hp) == len(hs)
        for a, b in zip(hp, hs):
            assert abs(a["f1"] - b["f1"]) < 1e-4
            assert abs(a["loss"] - b["loss"]) < 1e-4


def test_trials_trial_data_mesh_matches(tree):
    """2-D (trial, data) mesh — 3 trials x 2 data-parallel devices each:
    the SHARED batch shards across each trial's device group (per-group
    gradient all-reduce), histories must match the pinned parallel run."""
    cfgs = _trial_cfgs(tree, "par_td")
    cfgs = [dataclasses.replace(c, num_devices=6, data_per_fold=2)
            for c in cfgs]
    train_trials_parallel(1, cfgs)
    for t in range(len(TRIALS)):
        hp = json.loads((tree / f"runs_par_td_t{t}" / "fold1"
                         / "history.json").read_text())
        hs = json.loads((tree / f"runs_par_stage1_t{t}" / "fold1"
                         / "history.json").read_text())
        assert len(hp) == len(hs)
        for a, b in zip(hp, hs):
            assert abs(a["f1"] - b["f1"]) < 1e-4
            assert abs(a["loss"] - b["loss"]) < 1e-4


def test_trials_data_per_trial_validation(tree):
    cfgs = _trial_cfgs(tree, "tdv")
    bad = [dataclasses.replace(c, num_devices=4, data_per_fold=2)
           for c in cfgs]
    with pytest.raises(ValueError, match="not divisible by 2 trial groups"):
        train_trials_parallel(1, bad)  # 3 trials, 2 groups
    bad = [dataclasses.replace(c, data_per_fold=2) for c in cfgs]
    with pytest.raises(ValueError, match="requires num_devices"):
        train_trials_parallel(1, bad)
    bad = [dataclasses.replace(c, num_devices=3, data_per_fold=3)
           for c in cfgs]
    with pytest.raises(ValueError, match="batch_size 4 not divisible"):
        train_trials_parallel(1, bad)  # 1 group of 3; bs 4 % 3 != 0


def test_hyperband_rung_cut_masks_trials(tree):
    """With a rung at epoch 1, below-median trials stop training: their
    history freezes at the rung and the cut is recorded in the metrics."""
    cfgs = [dataclasses.replace(c, num_epochs=3,
                                enable_early_stopping=False)
            for c in _trial_cfgs(tree, "hb")]
    # cut on loss (minimize): the separable fixture drives every trial's
    # f1 to 1.0 by rung 1 with the HF-faithful init, and median cuts must
    # act on a metric that actually spreads across trials
    out = train_trials_parallel(1, cfgs, rungs=[1], goal="minimize",
                                rung_metric="loss")
    cut = [m for m in out if "hyperband_cut_at_epoch" in m]
    survived = [m for m in out if "hyperband_cut_at_epoch" not in m]
    assert cut and survived  # median rule cuts some, keeps some
    for t, m in enumerate(out):
        hist = json.loads((tree / f"runs_hb_t{t}" / "fold1"
                           / "history.json").read_text())
        if "hyperband_cut_at_epoch" in m:
            assert len(hist) == m["hyperband_cut_at_epoch"]
        else:
            assert len(hist) == 3


def test_trials_reject_mismatched_configs(tree):
    cfgs = _trial_cfgs(tree, "bad")
    cfgs[1] = dataclasses.replace(cfgs[1], num_epochs=5)
    with pytest.raises(ValueError, match="num_epochs"):
        train_trials_parallel(1, cfgs)


def test_trials_reject_mismatched_grad_accum(tree):
    """grad_accum is a shared field: a non-base trial asking for
    accumulation must be rejected (not silently trained without it —
    the accum guard only inspects cfgs[0])."""
    cfgs = _trial_cfgs(tree, "bad_accum")
    cfgs[1] = dataclasses.replace(cfgs[1], grad_accum=8)
    with pytest.raises(ValueError, match="grad_accum"):
        train_trials_parallel(1, cfgs)


def test_run_sweep_parallel_trials_dispatch(tree, tmp_path):
    """Agent-level: run_sweep(parallel_trials=True) samples the same
    configs as sequential (same rng sequence) and writes the same artifact
    shapes (sweep_results.jsonl + best_config.json)."""
    import yaml

    from zenker_audio_detection_tpu.tune import sweep as sweep_mod

    sweep_yaml = tmp_path / "sweep.yaml"
    sweep_yaml.write_text(yaml.safe_dump({
        "method": "random",
        "metric": {"name": "eval_f1", "goal": "maximize"},
        "parameters": {
            "fold": {"values": [1]},
            "learning-rate": {"distribution": "log_uniform_values",
                              "min": 1e-4, "max": 1e-3},
            "focal-gamma": {"distribution": "uniform", "min": 0, "max": 2},
        },
    }))
    base = _cfg(tree, "agent_par", num_epochs=2,
                enable_early_stopping=False)
    out = sweep_mod.run_sweep(str(sweep_yaml), base, count=2, seed=5,
                              output_dir=str(tmp_path / "out"),
                              parallel_trials=True)
    assert len(out["results"]) == 2
    lines = (tmp_path / "out" / "sweep_results.jsonl").read_text().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[0])
    assert rec["fold"] == 1 and "learning-rate" in rec["params"]
    # the docstring's actual claim: the parallel agent consumes the SAME
    # rng sequence sequential sampling would (reproduce it and compare the
    # recorded hyperparameters exactly)
    expected_rng = np.random.default_rng(5)
    spec = sweep_mod.load_sweep_config(str(sweep_yaml))["parameters"]
    expected = [{k: v for k, v in sweep_mod.sample_parameters(
                     spec, expected_rng).items() if k != "fold"}
                for _ in range(2)]  # both branches record sans 'fold'
    assert [json.loads(ln)["params"] for ln in lines] == expected
    # best tracks the max of the recorded objective values (>= 0 is
    # vacuous for an f1)
    vals = [json.loads(ln)["value"] for ln in lines]
    assert out["best"]["value"] == max(vals)
    assert (tmp_path / "out" / "best_config.json").exists()
    for t in range(2):  # per-trial run dirs with exported best models
        assert (tmp_path / "out" / f"trial{t}" / "fold1"
                / "best" / "model.safetensors").exists()


def test_sweep_cli_parallel_trials(tree, tmp_path):
    """CLI-level: zenker-sweep --parallel-trials end-to-end over a pinned
    fold, writing the sweep artifacts."""
    import yaml

    from zenker_audio_detection_tpu.cli import sweep as sweep_cli

    sweep_yaml = tmp_path / "sweep.yaml"
    sweep_yaml.write_text(yaml.safe_dump({
        "method": "random",
        "metric": {"name": "eval_f1", "goal": "maximize"},
        "parameters": {
            "fold": {"values": [1]},
            "learning-rate": {"distribution": "log_uniform_values",
                              "min": 1e-4, "max": 1e-3},
            "label-smoothing": {"distribution": "uniform",
                                "min": 0.0, "max": 0.1},
        },
    }))
    out = tmp_path / "sw"
    sweep_cli.main([
        str(sweep_yaml), "--stage", "stage1", "--count", "2",
        "--num-epochs", "1", "--batch-size", "4", "--no-augment", "--f32",
        "--data-dir", str(tree / "data"),
        "--pretrained-model-dir", str(tree / "pretrained"),
        "--parallel-trials", "--output-dir", str(out)])
    assert (out / "best_config.json").exists()
    assert len((out / "sweep_results.jsonl").read_text().splitlines()) == 2
