"""Fold-parallel CV training (train/fold_parallel.py) must reproduce the
sequential trainer fold for fold: same per-fold metrics, history, best
epoch, and on-disk artifacts. Folds are built with DIFFERENT train-set
sizes so the masked no-op steps, padded tail batches, and per-fold LR
schedules are all exercised."""

import json
import os

import numpy as np
import pytest

from zenker_audio_detection_tpu.audio import io as aio
from zenker_audio_detection_tpu.models import ast as ast_mod, convert
from zenker_audio_detection_tpu.train import loop as L
from zenker_audio_detection_tpu.train.fold_parallel import (
    train_folds_parallel)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """Two folds with unequal train sizes (10 vs 13 clips -> different
    steps_per_epoch and tail-batch sizes at bs=4), plus val/test splits."""
    import jax

    root = tmp_path_factory.mktemp("fp")
    rng = np.random.default_rng(7)
    data = root / "data"
    data.mkdir()

    def make_split(fold, name, n):
        xs, ys = [], []
        for i in range(n):
            label = i % 2
            amp = 0.004 if label == 0 else 0.5
            d = root / "wavs" / f"f{fold}" / name / str(i)
            d.mkdir(parents=True, exist_ok=True)
            fp = d / "clip.wav"
            aio.write_wav(str(fp),
                          (rng.standard_normal(16000) * amp
                           ).astype(np.float32), 16000, dtype="float32")
            xs.append(str(fp))
            ys.append(label)
        np.save(data / f"{name}_x_fold{fold}.npy", np.asarray(xs, object))
        np.save(data / f"{name}_y_fold{fold}.npy", np.asarray(ys))

    for fold, n_train in [(1, 10), (2, 13)]:
        make_split(fold, "train", n_train)
        make_split(fold, "val", 6)
        make_split(fold, "test", 6)

    cfg = ast_mod.ASTConfig(hidden_size=16, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=32,
                            max_length=128, num_labels=527)
    params = ast_mod.init_params(jax.random.PRNGKey(3), cfg)
    pre = root / "pretrained"
    convert.save_hf_model_dir(params, cfg, str(pre))
    return root


def _cfg(tree, tag, stage="stage1", **kw):
    import jax.numpy as jnp

    defaults = dict(
        stage=stage, data_dir=str(tree / "data"),
        output_root=str(tree / f"runs_{tag}"),
        pretrained_model_dir=str(tree / "pretrained"),
        num_epochs=4, batch_size=4, eval_batch_size=4,
        learning_rate=1e-3, warmup_ratio=0.25,
        enable_early_stopping=True, augment=True,
        dtype=jnp.float32, seed=42)
    defaults.update(kw)
    return L.TrainFoldConfig(**defaults)


def _compare(tree, seq_tag, par_tag, seq_metrics, par_metrics, folds=(1, 2)):
    assert len(seq_metrics) == len(par_metrics)
    for ms, mp in zip(seq_metrics, par_metrics):
        assert set(ms) == set(mp)
        for k in ms:
            if "runtime" in k or "per_second" in k:
                continue  # wall-clock speed metrics differ run to run
            assert abs(ms[k] - mp[k]) < 1e-4, (k, ms[k], mp[k])
    for fold in folds:
        hs = json.loads((tree / f"runs_{seq_tag}" / f"fold{fold}"
                         / "history.json").read_text())
        hp = json.loads((tree / f"runs_{par_tag}" / f"fold{fold}"
                         / "history.json").read_text())
        assert len(hs) == len(hp)  # same (early-stop) epoch count
        for es, ep in zip(hs, hp):
            assert es["epoch"] == ep["epoch"]
            for k in ("loss", "f1", "accuracy"):
                assert abs(es[k] - ep[k]) < 1e-4, (fold, k, es, ep)
        for rel in ("best/model.safetensors", "best/config.json",
                    "best/preprocessor_config.json",
                    "best/evaluation_test/confusion_matrix.npy"):
            assert (tree / f"runs_{par_tag}" / f"fold{fold}" / rel).exists()


def _ensure_seq1_histories(tree):
    """Sequential baseline shared by the mesh-parity tests below;
    regenerated when running under -k filters so each test is
    self-contained (the short-seq test got the same treatment)."""
    if not (tree / "runs_seq1" / "fold2" / "history.json").exists():
        for f in (1, 2):
            L.train_fold(f, _cfg(tree, "seq1"))
    return [json.loads((tree / "runs_seq1" / f"fold{f}"
                        / "history.json").read_text()) for f in (1, 2)]


def test_stage1_parallel_matches_sequential(tree):
    seq = [L.train_fold(f, _cfg(tree, "seq1")) for f in (1, 2)]
    cfg_par = _cfg(tree, "par1")
    par = train_folds_parallel([1, 2], cfg_par)
    _compare(tree, "seq1", "par1", seq, par)


def test_stage1_parallel_sharded_over_mesh(tree):
    """Fold axis sharded over 2 of the 8 virtual devices: same numbers."""
    seq = _ensure_seq1_histories(tree)
    cfg_par = _cfg(tree, "par_mesh", num_devices=2)
    train_folds_parallel([1, 2], cfg_par)
    for f, hist_seq in zip((1, 2), seq):
        hist_par = json.loads((tree / "runs_par_mesh" / f"fold{f}"
                               / "history.json").read_text())
        assert len(hist_seq) == len(hist_par)
        for es, ep in zip(hist_seq, hist_par):
            assert abs(es["f1"] - ep["f1"]) < 1e-4
            assert abs(es["loss"] - ep["loss"]) < 1e-4


def test_fold_data_mesh_matches_sequential(tree):
    """2-D (fold, data) mesh — 2 folds x 2 data-parallel devices each:
    fold batches shard across each fold's device group (XLA inserts the
    per-group gradient all-reduce), numerics must still equal the
    sequential trainer's."""
    seq = _ensure_seq1_histories(tree)
    cfg_par = _cfg(tree, "par_fd", num_devices=4, data_per_fold=2)
    train_folds_parallel([1, 2], cfg_par)
    for f, hist_seq in zip((1, 2), seq):
        hist_par = json.loads((tree / "runs_par_fd" / f"fold{f}"
                               / "history.json").read_text())
        assert len(hist_seq) == len(hist_par)
        for es, ep in zip(hist_seq, hist_par):
            assert abs(es["f1"] - ep["f1"]) < 1e-4
            assert abs(es["loss"] - ep["loss"]) < 1e-4


def test_fold_parallel_per_step_loss_channel(tree):
    """cfg.logging_steps (the reference's HF logging_steps channel) must
    reach the trackers from the fold-parallel path too, with the same
    payload keys as the sequential trainer's."""
    class Stub:
        def __init__(self):
            self.rows = []

        def log(self, d):
            self.rows.append(d)

    stubs = {1: Stub(), 2: Stub()}
    cfg = _cfg(tree, "logsteps", num_epochs=1, enable_early_stopping=False,
               logging_steps=1)
    train_folds_parallel([1, 2], cfg, trackers=stubs)
    for fold, stub in stubs.items():
        step_rows = [r for r in stub.rows if "train_step_loss" in r]
        assert step_rows, f"fold {fold}: no per-step loss rows"
        assert all(r["fold"] == fold for r in step_rows)
        assert [r["train_step"] for r in step_rows] == list(
            range(1, len(step_rows) + 1))
        assert all(np.isfinite(r["train_step_loss"]) for r in step_rows)


def test_data_per_fold_validation(tree):
    with pytest.raises(ValueError, match="requires num_devices"):
        train_folds_parallel([1], _cfg(tree, "v1", data_per_fold=2))
    with pytest.raises(ValueError, match="not divisible into groups"):
        train_folds_parallel([1], _cfg(tree, "v2", num_devices=3,
                                       data_per_fold=2))
    with pytest.raises(ValueError, match="batch_size"):
        train_folds_parallel([1, 2], _cfg(tree, "v3", num_devices=6,
                                          data_per_fold=3, batch_size=4))
    with pytest.raises(ValueError, match="folds not divisible"):
        # 4 devices / 2 per fold = 2 fold groups; 3 folds don't fit
        train_folds_parallel([1, 2, 3], _cfg(tree, "v4", num_devices=4,
                                             data_per_fold=2))


def test_stage2_focal_class_weights_parallel_matches_sequential(tree):
    """Stage-2 loss (class weights + batch-level alpha quirk) through the
    masked path: the alpha flip must use the masked label mean."""
    kw = dict(stage="stage2", focal_gamma=2.0, label_smoothing=0.1,
              use_class_weights=True)
    cfg_seq = _cfg(tree, "seq2", **kw)
    seq = [L.train_fold(f, cfg_seq) for f in (1, 2)]
    cfg_par = _cfg(tree, "par2", **kw)
    par = train_folds_parallel([1, 2], cfg_par)
    _compare(tree, "seq2", "par2", seq, par)


def test_parallel_rejects_streaming_and_resume(tree):
    with pytest.raises(ValueError, match="streaming"):
        train_folds_parallel([1], _cfg(tree, "x1", streaming=True))
    with pytest.raises(ValueError, match="resume"):
        train_folds_parallel([1], _cfg(tree, "x2", resume=True))
    with pytest.raises(ValueError, match="num-slices"):
        train_folds_parallel([1, 2], _cfg(tree, "x3", num_devices=2,
                                          num_slices=2))
    with pytest.raises(ValueError, match="on_epoch_end"):
        train_folds_parallel([1], _cfg(tree, "x4",
                                       on_epoch_end=lambda e, m: False))


def test_parallel_checkpoint_resumable_by_sequential(tree):
    """Fold-parallel checkpoints must restore into the sequential trainer's
    optimizer template (round-2 advisor finding: the parallel tx lacked the
    trailing ScaleByScheduleState count leaf, so sequential --resume raised
    KeyError on leaf_NNNN). sequential_opt_layout appends it; assert both
    the raw load_checkpoint roundtrip and an actual sequential resume run."""
    import jax

    from zenker_audio_detection_tpu.train import optim

    cfg_par = _cfg(tree, "ck_interop", num_epochs=2,
                   enable_early_stopping=False)
    train_folds_parallel([1], cfg_par)
    fold_dir = str(tree / "runs_ck_interop" / "fold1")
    ck = L.latest_checkpoint(fold_dir)
    assert ck is not None

    # raw restore into the sequential template
    params_t, model_cfg = L.init_model(cfg_par)
    n_train = 10  # fold 1 train size in this fixture
    steps = -(-n_train // cfg_par.batch_size)
    tx = optim.make_optimizer(cfg_par.learning_rate,
                              steps * cfg_par.num_epochs,
                              cfg_par.warmup_ratio, cfg_par.weight_decay,
                              beta2=cfg_par.adam_beta2)
    params, opt_state, st = L.load_checkpoint(ck, params_t, tx.init(params_t))
    counts = [np.asarray(l) for l in jax.tree.leaves(opt_state)
              if hasattr(l, "shape") and np.asarray(l).ndim == 0
              and np.asarray(l).dtype == np.int32]
    # trailing schedule count == leading adam count == steps taken
    assert len(counts) == 2 and int(counts[0]) == int(counts[1]) > 0
    assert st["epoch"] == 2

    # and a real sequential --resume continues from epoch 3
    cfg_seq = _cfg(tree, "ck_interop", num_epochs=4, resume=True,
                   enable_early_stopping=False)
    L.train_fold(1, cfg_seq)
    hist = json.loads((tree / "runs_ck_interop" / "fold1"
                       / "history.json").read_text())
    assert [h["epoch"] for h in hist] == [1, 2, 3, 4]
    assert all(np.isfinite(h["loss"]) for h in hist)


def test_run_cross_validation_dispatches_fold_parallel(tree):
    """cv entry point with fold_parallel=True writes cv_metrics + per-fold
    run_config and logs through the tracker plumbing."""
    cfg = _cfg(tree, "cv_par", fold_parallel=True, num_epochs=2,
               enable_early_stopping=False)
    out = L.run_cross_validation([1, 2], cfg,
                                 tracking_opts={"enabled": False})
    assert len(out["per_fold"]) == 2
    assert any(k.startswith("eval_f1") or k.startswith("eval_accuracy")
               for k in out["aggregate"])
    for f in (1, 2):
        assert (tree / "runs_cv_par" / f"fold{f}" / "run_config.json").exists()


def test_fold_sharded_step_has_no_gradient_collectives(tree):
    """The fold axis must be embarrassingly parallel: the compiled
    fold-sharded train step may contain no all-reduce/reduce-scatter (a
    gradient sync would mean folds are leaking into each other). XLA is
    allowed its small patch-embed weight-grad activation all-gather
    (ROOFLINE.md 'Fold-parallel CV training')."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from zenker_audio_detection_tpu.models import ast as ast_mod
    from zenker_audio_detection_tpu.train import losses, optim
    from zenker_audio_detection_tpu.train.fold_parallel import FOLD_AXIS

    F, B = 4, 8
    cfg = ast_mod.ASTConfig(hidden_size=16, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=32,
                            max_length=128, num_labels=2)
    mesh = Mesh(np.asarray(jax.devices()[:F]), (FOLD_AXIS,))
    sh = NamedSharding(mesh, P(FOLD_AXIS))
    params1 = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
    paramsF = jax.device_put(
        jax.tree.map(lambda a: np.broadcast_to(np.asarray(a),
                                               (F,) + np.shape(a)).copy(),
                     params1), sh)
    txp = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(1.0, b1=0.9, b2=0.98, eps=1e-8, weight_decay=0.01,
                    mask=optim.decay_mask))
    optF = jax.vmap(txp.init)(paramsF)
    rng = np.random.default_rng(0)
    feats = jax.device_put(
        rng.standard_normal((F, B, 128, 128)).astype(np.float32), sh)
    labels = jax.device_put(rng.integers(0, 2, (F, B)).astype(np.int32), sh)
    mask = jax.device_put(np.ones((F, B), np.float32), sh)

    def fold_step(p, o, f, y, m):
        def obj(pp):
            logits = ast_mod.forward(pp, f, cfg, dtype=jnp.float32,
                                     remat=True)
            return losses.stage1_loss(logits, y, sample_mask=m)

        loss, grads = jax.value_and_grad(obj)(p)
        u, o2 = txp.update(grads, o, p)
        u = jax.tree.map(lambda x: x * 1e-3, u)
        return optax.apply_updates(p, u), o2, loss

    hlo = jax.jit(jax.vmap(fold_step)).lower(
        paramsF, optF, feats, labels, mask).compile().as_text()
    for op in ("all-reduce", "reduce-scatter", "all-to-all",
               "collective-permute"):
        assert op not in hlo, f"unexpected {op} in fold-sharded step"


def test_train_cli_parallel_folds(tree):
    """CLI-level: zenker-train-stage1 --parallel-folds --num-devices 2
    produces the standard cv artifacts for both folds."""
    from zenker_audio_detection_tpu.cli import train_stage1

    out = tree / "runs_cli_par"
    train_stage1.main([
        "--num-folds", "2", "--num-epochs", "2", "--batch-size", "4",
        "--learning-rate", "1e-3", "--f32", "--no-early-stopping",
        "--no-augment", "--parallel-folds", "--num-devices", "2",
        "--data-dir", str(tree / "data"), "--output-root", str(out),
        "--pretrained-model-dir", str(tree / "pretrained"), "--no-wandb"])
    assert (out / "cv_metrics.npy").exists()
    for f in (1, 2):
        assert (out / f"fold{f}" / "best" / "model.safetensors").exists()
        assert (out / f"fold{f}" / "run_config.json").exists()


def test_fold_parallel_eval_batch_rounds_up(tree, capsys):
    """eval_batch_size is not CLI-exposed: an indivisible value under a
    data-per-fold group rounds UP with a note (same policy as
    train_fold's mesh bump) instead of hard-failing."""
    cfg = _cfg(tree, "evalbump", num_devices=2, data_per_fold=2,
               eval_batch_size=3, num_epochs=1, augment=False)
    out = train_folds_parallel([1], cfg)
    assert "eval_batch_size 3 -> 4" in capsys.readouterr().out
    assert len(out) == 1
