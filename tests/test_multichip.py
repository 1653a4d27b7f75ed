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
