"""Determinism guarantees (the framework's answer to SURVEY §5.2: the
reference's only concurrency-safety story is seeding — here it's tested)."""

import dataclasses

import numpy as np
import pytest

from zenker_audio_detection_tpu.train import loop as L

from test_train_loop import make_dataset, tiny_pretrained_dir

pytestmark = pytest.mark.slow


def test_two_identical_runs_identical_metrics(tmp_path, rng):
    import jax.numpy as jnp

    data_dir = make_dataset(tmp_path, rng, n_per_class=4)
    base = L.TrainFoldConfig(
        stage="stage1", data_dir=data_dir,
        output_root=str(tmp_path / "a"),
        pretrained_model_dir=tiny_pretrained_dir(tmp_path),
        num_epochs=2, batch_size=4, enable_early_stopping=False,
        augment=True, dtype=jnp.float32)
    m1 = L.train_fold(1, base)
    m2 = L.train_fold(1, dataclasses.replace(
        base, output_root=str(tmp_path / "b")))

    def strip_speed(m):  # wall-clock speed metrics differ run to run
        return {k: v for k, v in m.items()
                if "runtime" not in k and "per_second" not in k}

    # identical seeds -> identical everything (incl. augment)
    assert strip_speed(m1) == strip_speed(m2) and set(m1) == set(m2)


def test_inference_deterministic(tmp_path, rng):
    import jax
    import jax.numpy as jnp

    from zenker_audio_detection_tpu.infer import cascade as C
    from zenker_audio_detection_tpu.models import ast as ast_mod

    cfg = ast_mod.ASTConfig(hidden_size=16, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=32,
                            num_labels=2)
    s1 = C.StageSpec(ast_mod.init_params(jax.random.PRNGKey(0), cfg), cfg,
                     -1.15, 3.53, ("Idle", "Swallow"))
    s2 = C.StageSpec(ast_mod.init_params(jax.random.PRNGKey(1), cfg), cfg,
                     -0.9, 2.8, ("Healthy", "Zenker"))
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    eng = C.TwoStageEngine(s1, s2, C.CascadeConfig(dtype=jnp.float32,
                                                   batch_size=16))
    a = eng.window_probs(audio)
    b = eng.window_probs(audio)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
