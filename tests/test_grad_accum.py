"""Gradient accumulation (beyond-parity batch scaling, train/steps.py
make_accum_steps): N accumulated micro-batches must reproduce one
monolithic N*micro optimizer update, the tail group must equal-weight its
micro-batches (HF Trainer gradient_accumulation_steps convention), and the
full trainer at (batch b, accum k) must match (batch b*k, accum 1).

The reference never scales batch (fixed per-device 16,
src/train_ast_stage1_cross_validation.py:484); this is the TPU-native
extension that lifts MXU utilization past the HBM transient (ROOFLINE.md
batch-scaling section).
"""

import json
from pathlib import Path

import numpy as np
import pytest

from zenker_audio_detection_tpu.models import ast as ast_mod
from zenker_audio_detection_tpu.train import loop as L
from zenker_audio_detection_tpu.train import losses, optim, steps

from test_train_loop import make_dataset, tiny_pretrained_dir


def _tiny_setup(seed=0, n=8):
    import jax
    import jax.numpy as jnp

    cfg = ast_mod.ASTConfig(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=4, intermediate_size=64,
                            num_labels=2, max_length=64, num_mel_bins=128)
    params = ast_mod.init_params(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.standard_normal((n, 64, 128)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, n))
    tx = optim.make_optimizer(1e-3, 10, 0.1, 0.01)
    return cfg, params, feats, labels, tx


def _copy(tree):
    import jax

    return jax.tree.map(lambda x: np.array(x), tree)


def test_accum_step_matches_monolithic_update():
    """2 accumulated micro-batches of 4 == one batch-8 train_step (same
    AdamW update on the same mean gradient, up to float reorder)."""
    import jax
    import jax.numpy as jnp

    cfg, params, feats, labels, tx = _tiny_setup()
    loss = losses.stage1_loss

    mono = steps.make_train_step(tx, cfg, loss, dtype=jnp.float32)
    p_mono, o_mono, loss_mono, _ = mono(
        _copy(params), tx.init(params), feats, labels)

    grad_step, apply_step = steps.make_accum_steps(tx, cfg, loss,
                                                   dtype=jnp.float32)
    buf = jax.tree.map(jnp.zeros_like, params)
    buf, l1, _ = grad_step(params, buf, feats[:4], labels[:4])
    buf, l2, _ = grad_step(params, buf, feats[4:], labels[4:])
    p_acc, o_acc, buf = apply_step(_copy(params), tx.init(params), buf, 2.0)

    # per-sample-mean CE: mean of equal-sized micro means == batch mean
    assert np.isclose(float(loss_mono), (float(l1) + float(l2)) / 2,
                      atol=1e-6)
    flat_m = jax.tree_util.tree_leaves(p_mono)
    flat_a = jax.tree_util.tree_leaves(p_acc)
    for m, a in zip(flat_m, flat_a):
        np.testing.assert_allclose(np.asarray(m), np.asarray(a),
                                   atol=5e-6, rtol=1e-5)
    # the returned buffer is zeroed for the next group
    assert all(float(np.abs(np.asarray(x)).max()) == 0.0
               for x in jax.tree_util.tree_leaves(buf))


def test_accum_tail_group_equal_weights_micros():
    """A short trailing micro-batch is weighted like the full ones: the
    applied gradient is mean(micro-mean grads), NOT a sample-weighted
    mean (HF Trainer convention)."""
    import jax
    import jax.numpy as jnp

    cfg, params, feats, labels, tx = _tiny_setup()
    loss = losses.stage1_loss
    loss_fn = steps.make_loss_fn(cfg, loss, jnp.float32)

    grad_step, apply_step = steps.make_accum_steps(tx, cfg, loss,
                                                   dtype=jnp.float32)
    buf = jax.tree.map(jnp.zeros_like, params)
    buf, _, _ = grad_step(params, buf, feats[:4], labels[:4])
    buf, _, _ = grad_step(params, buf, feats[4:6], labels[4:6])  # tail of 2
    p_acc, _, _ = apply_step(_copy(params), tx.init(params), buf, 2.0)

    g1 = jax.grad(lambda p: loss_fn(p, feats[:4], labels[:4])[0])(params)
    g2 = jax.grad(lambda p: loss_fn(p, feats[4:6], labels[4:6])[0])(params)
    g = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)
    updates, _ = tx.update(g, tx.init(params), params)
    import optax

    p_ref = optax.apply_updates(_copy(params), updates)
    for m, a in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_acc)):
        np.testing.assert_allclose(np.asarray(m), np.asarray(a),
                                   atol=5e-6, rtol=1e-5)


@pytest.mark.slow
def test_train_fold_accum_matches_bigger_batch(tmp_path):
    """train_fold at (batch 4, accum 2) reproduces (batch 8, accum 1):
    same permutation, same grouped samples, same LR schedule (optimizer
    steps), so the learned params agree to float-reorder noise."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    data_dir = make_dataset(tmp_path, rng)
    pre = tiny_pretrained_dir(tmp_path)

    def run(tag, batch, accum):
        cfg = L.TrainFoldConfig(
            stage="stage1", data_dir=data_dir,
            output_root=str(tmp_path / f"runs/{tag}"),
            pretrained_model_dir=pre, num_epochs=3, batch_size=batch,
            grad_accum=accum, learning_rate=1e-3,
            enable_early_stopping=False, augment=False, dtype=jnp.float32)
        L.run_cross_validation([1], cfg)
        from zenker_audio_detection_tpu.models import convert

        best = tmp_path / f"runs/{tag}/fold1/best/model.safetensors"
        hist = json.loads((tmp_path / f"runs/{tag}/fold1/history.json"
                           ).read_text())
        return convert.read_safetensors(str(best)), hist

    w_mono, h_mono = run("mono", 8, 1)
    w_acc, h_acc = run("acc", 4, 2)

    # identical grouped samples per update + equal-size micros -> same
    # training trajectory; accept float-reorder drift amplified by AdamW
    for k in w_mono:
        np.testing.assert_allclose(w_acc[k], w_mono[k], atol=2e-3,
                                   rtol=5e-3, err_msg=k)
    for em, ea in zip(h_mono, h_acc):
        assert abs(em["loss"] - ea["loss"]) < 1e-3, (em, ea)

    # checkpoint-N counts OPTIMIZER steps: 16 train samples / batch 8 = 2
    # per epoch for both runs (batch 4 accum 2 -> 4 micro, 2 updates)
    cks = sorted(p.name for p in (tmp_path / "runs/acc/fold1").iterdir()
                 if p.name.startswith("checkpoint-"))
    assert all(int(c.split("-")[1]) % 2 == 0 for c in cks), cks
    assert max(int(c.split("-")[1]) for c in cks) == 6, cks


@pytest.mark.slow
def test_accum_with_data_parallel_mesh_matches_single(tmp_path):
    """--grad-accum composes with --num-devices: the sharded-batch
    accumulate path (replicated grad buffer + XLA all-reduce) reproduces
    the single-device accumulated trajectory."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    data_dir = make_dataset(tmp_path, rng)
    pre = tiny_pretrained_dir(tmp_path)

    def run(tag, num_devices):
        cfg = L.TrainFoldConfig(
            stage="stage1", data_dir=data_dir,
            output_root=str(tmp_path / f"runs/{tag}"),
            pretrained_model_dir=pre, num_epochs=2, batch_size=4,
            grad_accum=2, learning_rate=1e-3,
            enable_early_stopping=False, augment=False, dtype=jnp.float32,
            num_devices=num_devices)
        L.run_cross_validation([1], cfg)
        from zenker_audio_detection_tpu.models import convert

        return convert.read_safetensors(
            str(tmp_path / f"runs/{tag}/fold1/best/model.safetensors"))

    w1 = run("dev1", None)
    w2 = run("dev2", 2)
    for k in w1:
        np.testing.assert_allclose(w2[k], w1[k], atol=2e-4, rtol=1e-4,
                                   err_msg=k)


def test_cli_grad_accum_validation(tmp_path):
    from zenker_audio_detection_tpu.cli import train_stage1

    with pytest.raises(SystemExit, match="grad-accum"):
        train_stage1.main(["--grad-accum", "0"])
    with pytest.raises(SystemExit, match="parallel-folds"):
        train_stage1.main(["--grad-accum", "2", "--parallel-folds"])


def test_parallel_trainers_reject_grad_accum():
    """The guard lives at the CONSUMING layer too: programmatic configs
    (no CLI validation) must not silently train without accumulation."""
    from zenker_audio_detection_tpu.train import fold_parallel, trial_parallel

    cfg = L.TrainFoldConfig(stage="stage1", data_dir="x", output_root="y",
                            grad_accum=2)
    with pytest.raises(ValueError, match="accumulation"):
        fold_parallel.train_folds_parallel([1], cfg)
    with pytest.raises(ValueError, match="accumulation"):
        trial_parallel.train_trials_parallel(1, [cfg])


def test_cli_scale_lr(capsys):
    """--scale-lr multiplies LR by effective_batch/16 (linear scaling
    rule); without it the flag-free LR passes through untouched."""
    import argparse

    from zenker_audio_detection_tpu.cli import _train_common

    ap = argparse.ArgumentParser()
    _train_common.add_common_train_args(ap, "stage1")
    args = ap.parse_args(["--batch-size", "16", "--grad-accum", "4",
                          "--learning-rate", "5e-5", "--scale-lr"])
    assert np.isclose(_train_common.effective_lr(args), 2e-4)
    assert "[ScaleLR]" in capsys.readouterr().out
    args = ap.parse_args(["--batch-size", "16", "--grad-accum", "4"])
    assert _train_common.effective_lr(args) == 5e-5
    # --num-devices SHARDS the global batch, it does not grow it, so it
    # must not enter the scaling (the mesh-parity test proves identical
    # trajectories at any device count)
    args = ap.parse_args(["--batch-size", "16", "--grad-accum", "4",
                          "--learning-rate", "5e-5", "--scale-lr",
                          "--num-devices", "8"])
    assert np.isclose(_train_common.effective_lr(args), 2e-4)
