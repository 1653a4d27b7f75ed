"""Checkpoint/resume: training N epochs with an interruption must equal
training N epochs straight through (params, optimizer state, RNG stream,
best-model tracking all restored)."""

import dataclasses
from pathlib import Path

import numpy as np
import pytest

from zenker_audio_detection_tpu.models import ast as ast_mod, convert
from zenker_audio_detection_tpu.train import loop as L

from test_train_loop import make_dataset, tiny_pretrained_dir


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    import jax.numpy as jnp

    tmp_path = tmp_path_factory.mktemp("resume")
    rng = np.random.default_rng(1)
    data_dir = make_dataset(tmp_path, rng, n_per_class=6)
    base = L.TrainFoldConfig(
        stage="stage1", data_dir=data_dir,
        output_root="",  # set per test
        pretrained_model_dir=tiny_pretrained_dir(tmp_path),
        num_epochs=4, batch_size=4, learning_rate=5e-4,
        enable_early_stopping=False, augment=False, dtype=jnp.float32)
    return tmp_path, base


def _best_logits(output_root, data_dir, tmp_path):
    import jax.numpy as jnp

    from zenker_audio_detection_tpu.train import steps

    params, cfg = convert.load_hf_model_dir(str(Path(output_root) /
                                                "fold1/best"))
    x = np.random.default_rng(9).standard_normal(
        (2, cfg.max_length, cfg.num_mel_bins)).astype(np.float32)
    return np.asarray(ast_mod.forward(params, x, cfg))


def test_interrupted_equals_straight(env):
    tmp_path, base = env

    # straight 4-epoch run
    straight = dataclasses.replace(
        base, output_root=str(tmp_path / "straight"))
    m_straight = L.train_fold(1, straight)

    # interrupted: 2 epochs, then resume to 4
    class StopAfter:
        def __init__(self, at):
            self.at = at

        def __call__(self, epoch, metrics):
            return epoch >= self.at

    part1 = dataclasses.replace(
        base, output_root=str(tmp_path / "resumed"),
        on_epoch_end=StopAfter(2))
    L.train_fold(1, part1)
    part2 = dataclasses.replace(
        base, output_root=str(tmp_path / "resumed"), resume=True)
    m_resumed = L.train_fold(1, part2)

    for k in m_straight:
        if "runtime" in k or "per_second" in k:
            continue  # wall-clock speed metrics differ run to run
        assert m_straight[k] == pytest.approx(m_resumed[k], abs=1e-6), k
    a = _best_logits(straight.output_root, base.data_dir, tmp_path)
    b = _best_logits(part2.output_root, base.data_dir, tmp_path)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_resume_without_checkpoint_starts_fresh(env):
    tmp_path, base = env
    cfg = dataclasses.replace(base, output_root=str(tmp_path / "fresh"),
                              resume=True, num_epochs=1)
    m = L.train_fold(1, cfg)
    assert any(k.endswith("_f1") for k in m)


def test_checkpoint_roundtrip_primitives(tmp_path):
    import jax
    import jax.numpy as jnp
    import optax

    from zenker_audio_detection_tpu.train import optim

    cfg = ast_mod.ASTConfig(hidden_size=8, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=16,
                            num_mel_bins=16, max_length=32, patch_size=8,
                            frequency_stride=4, time_stride=4)
    params = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(1e-4, 10, 0.1, 0.01)
    opt_state = tx.init(params)
    # make opt state non-trivial
    grads = jax.tree.map(jnp.ones_like, params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)

    ck = str(tmp_path / "ck")
    state = {"epoch": 3, "best_f1": 0.5, "best_epoch": 2, "patience_left": 1,
             "rng_state": np.random.default_rng(7).bit_generator.state,
             "history": [{"epoch": 1, "f1": 0.4}]}
    L.save_checkpoint(ck, params, opt_state, state)
    p2, o2, s2 = L.load_checkpoint(ck, params, tx.init(params))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_allclose(a, b, atol=0)
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(o2)):
        if hasattr(a, "shape"):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32), atol=0)
    assert s2["epoch"] == 3 and s2["best_epoch"] == 2
    assert s2["rng_state"] == state["rng_state"]


def test_corrupt_train_state_raises_typed(tmp_path):
    """A tampered train_state.json must fail with an error naming the file
    and the problem — not a bare JSONDecodeError/KeyError from deep inside
    the resume loop (checkpoint writes are atomic, so this only happens on
    external edits; the message is the debugging surface)."""
    import jax

    cfg = ast_mod.ASTConfig(hidden_size=8, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=16,
                            num_mel_bins=16, max_length=32, patch_size=8,
                            frequency_stride=4, time_stride=4)
    params = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
    from zenker_audio_detection_tpu.train import optim
    tx = optim.make_optimizer(1e-4, 10, 0.1, 0.01)
    opt_state = tx.init(params)
    good = {"epoch": 3, "best_f1": 0.5, "best_epoch": 2, "patience_left": 1,
            "rng_state": np.random.default_rng(7).bit_generator.state}
    ck = str(tmp_path / "ck")
    L.save_checkpoint(ck, params, opt_state, good)
    state_path = Path(ck) / "train_state.json"

    # corrupt bytes -> typed error naming the file
    state_path.write_text("{truncated")
    with pytest.raises(ValueError, match="train_state.json.*not valid JSON"):
        L.load_checkpoint(ck, params, tx.init(params))

    # top-level list -> typed error
    state_path.write_text("[1, 2]")
    with pytest.raises(ValueError, match="JSON object"):
        L.load_checkpoint(ck, params, tx.init(params))

    # each required key: missing and wrong-typed both name the key
    import json as _json
    for key in ("epoch", "best_f1", "best_epoch", "patience_left",
                "rng_state"):
        bad = {k: v for k, v in good.items() if k != key}
        state_path.write_text(_json.dumps(bad))
        with pytest.raises(ValueError, match=f"missing required key '{key}'"):
            L.load_checkpoint(ck, params, tx.init(params))
        bad = dict(good, **{key: "nope"})
        state_path.write_text(_json.dumps(bad))
        with pytest.raises(ValueError, match=f"key '{key}'"):
            L.load_checkpoint(ck, params, tx.init(params))

    # bools are not epochs (bool subclasses int — must still be rejected)
    state_path.write_text(_json.dumps(dict(good, epoch=True)))
    with pytest.raises(ValueError, match="key 'epoch'"):
        L.load_checkpoint(ck, params, tx.init(params))


def _full_state(epoch):
    # load_checkpoint validates the complete trainer-written key set, so
    # mechanics-focused tests must save a real state shape too
    return {"epoch": epoch, "best_f1": 0.0, "best_epoch": 0,
            "patience_left": 2,
            "rng_state": np.random.default_rng(0).bit_generator.state}


def test_checkpoint_roundtrip_with_scalar_leaf(tmp_path):
    """Non-array leaves in the opt state (Python scalars ARE pytree leaves)
    must not leave gaps in the saved leaf_NNNN numbering: load_checkpoint
    reads consecutive indices over shape-bearing template leaves."""
    import jax
    import jax.numpy as jnp

    params = {"w": jnp.ones((3, 2)), "b": jnp.zeros((2,))}
    opt_state = {"count": jnp.zeros((), jnp.int32),
                 "py_scalar": 7,  # no .shape -> skipped by the writer
                 "mu": jax.tree.map(jnp.zeros_like, params)}
    ck = str(tmp_path / "ck")
    L.save_checkpoint(ck, params, opt_state, _full_state(1))
    _, o2, _ = L.load_checkpoint(ck, params, opt_state)
    assert o2["py_scalar"] == 7  # non-array template leaf passes through
    np.testing.assert_array_equal(np.asarray(o2["count"]), 0)
    for k in ("w", "b"):
        np.testing.assert_array_equal(np.asarray(o2["mu"][k]),
                                      np.asarray(opt_state["mu"][k]))


def test_checkpoint_save_crash_preserves_previous(tmp_path, monkeypatch):
    """A crash mid-save must leave no partial dir under the final
    checkpoint name: latest_checkpoint would pick it over the older
    INTACT checkpoint and --resume would fail instead of recovering.
    save_checkpoint stages into <dir>.tmp and renames atomically."""
    import jax.numpy as jnp

    params = {"w": jnp.ones((3, 2))}
    opt = {"mu": jnp.zeros((3, 2))}
    fold_dir = tmp_path / "fold1"
    ck10 = str(fold_dir / "checkpoint-10")
    L.save_checkpoint(ck10, params, opt, _full_state(1))

    calls = {"n": 0}
    real = convert.write_safetensors

    def crashing(tensors, path):
        calls["n"] += 1
        if calls["n"] == 2:  # params written, die before opt_state lands
            raise RuntimeError("simulated crash mid-checkpoint")
        real(tensors, path)

    monkeypatch.setattr(L.convert, "write_safetensors", crashing)
    with pytest.raises(RuntimeError):
        L.save_checkpoint(str(fold_dir / "checkpoint-20"), params, opt,
                          _full_state(2))
    monkeypatch.undo()

    assert not (fold_dir / "checkpoint-20").exists()  # nothing partial
    assert L.latest_checkpoint(str(fold_dir)) == ck10  # intact one wins
    p2, _, s2 = L.load_checkpoint(ck10, params, opt)
    assert s2["epoch"] == 1

    # a retry with the stale .tmp staging dir still present must succeed
    L.save_checkpoint(str(fold_dir / "checkpoint-20"), params, opt,
                      _full_state(2))
    assert L.latest_checkpoint(str(fold_dir)).endswith("checkpoint-20")


def test_latest_checkpoint_ignores_staging_dirs(tmp_path):
    import jax.numpy as jnp

    fold_dir = tmp_path / "fold1"
    L.save_checkpoint(str(fold_dir / "checkpoint-10"),
                      {"w": jnp.ones(2)}, {}, _full_state(1))
    (fold_dir / "checkpoint-20.tmp").mkdir()  # crashed save's leftover
    assert L.latest_checkpoint(str(fold_dir)).endswith("checkpoint-10")


def test_write_safetensors_crash_preserves_previous(tmp_path, monkeypatch):
    """Overwriting an existing safetensors (model exports, best_params,
    re-saved checkpoints) must not destroy the previous good version if
    the write dies: write-to-tmp + os.replace."""
    p = str(tmp_path / "m.safetensors")
    convert.write_safetensors({"a": np.arange(6.0).reshape(2, 3)}, p)

    def no_replace(src, dst):
        raise RuntimeError("simulated crash before rename")

    monkeypatch.setattr(convert.os, "replace", no_replace)
    with pytest.raises(RuntimeError):
        convert.write_safetensors({"a": np.zeros((2, 3))}, p)
    monkeypatch.undo()

    out = convert.read_safetensors(p)  # original survives, uncorrupted
    np.testing.assert_array_equal(out["a"], np.arange(6.0).reshape(2, 3))
    leftovers = [f for f in tmp_path.iterdir() if ".tmp." in f.name]
    assert not leftovers  # staging file cleaned up on failure


def test_resume_rotates_prior_runs_checkpoints(env):
    """save_total_limit must bound disk across resume cycles: the resume
    branch seeds rotation with the prior run's checkpoint dirs."""
    import dataclasses as dc

    tmp_path, base = env

    class StopAfter:
        def __init__(self, at):
            self.at = at

        def __call__(self, epoch, metrics):
            return epoch >= self.at

    root = str(tmp_path / "rotate")
    L.train_fold(1, dc.replace(base, output_root=root,
                               on_epoch_end=StopAfter(2)))
    fold_dir = Path(root) / "fold1"
    before = sorted(p.name for p in fold_dir.glob("checkpoint-*"))
    assert len(before) == 2  # limit = max(2, (4+1)//2) = 2
    L.train_fold(1, dc.replace(base, output_root=root, resume=True))
    after = sorted(p.name for p in fold_dir.glob("checkpoint-*"))
    assert len(after) == 2, after          # bounded, not 4
    assert after != before                 # the old ones were rotated out
