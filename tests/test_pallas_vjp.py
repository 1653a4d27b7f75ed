"""Gradient parity for the trainable packed pallas attention."""

import numpy as np
import pytest

from zenker_audio_detection_tpu.ops import attention as A


def test_mha_packed_trainable_grads_match_reference(rng, monkeypatch):
    import jax
    import jax.numpy as jnp

    # interpret mode for the pallas forward on CPU
    orig = A.mha_packed
    monkeypatch.setattr(A, "mha_packed",
                        lambda q, k, v, **kw: orig(q, k, v,
                                                   **{**kw, "interpret": True}))

    B, S, NH, D = 2, 70, 4, 16
    H = NH * D
    q = jnp.asarray(rng.standard_normal((B, S, H)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, H)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, H)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((B, S, H)), jnp.float32)

    def loss_pallas(q, k, v):
        return jnp.sum(A.mha_packed_trainable(q, k, v, NH) * t)

    def loss_ref(q, k, v):
        def sp(x):
            return x.reshape(B, S, NH, D)

        out = A.reference_mha(sp(q), sp(k), sp(v)).reshape(B, S, H)
        return jnp.sum(out * t)

    vp, gp = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    vr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    assert abs(float(vp) - float(vr)) < 1e-3
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


def test_model_trains_with_pallas_attention(rng, monkeypatch):
    """A training step with attention_impl='pallas' runs and decreases loss."""
    import jax
    import jax.numpy as jnp

    from zenker_audio_detection_tpu.models import ast as ast_mod
    from zenker_audio_detection_tpu.train import losses, optim

    orig = A.mha_packed
    monkeypatch.setattr(A, "mha_packed",
                        lambda q, k, v, **kw: orig(q, k, v,
                                                   **{**kw, "interpret": True}))

    cfg = ast_mod.ASTConfig(hidden_size=32, num_hidden_layers=1,
                            num_attention_heads=4, intermediate_size=64,
                            patch_size=8, frequency_stride=4, time_stride=4,
                            num_mel_bins=16, max_length=64, num_labels=2)
    params = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
    feats = jnp.asarray(np.repeat(
        rng.standard_normal((2, 1, cfg.max_length, cfg.num_mel_bins)), 4,
        axis=1).reshape(8, cfg.max_length, cfg.num_mel_bins), jnp.float32)
    labels = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1], jnp.int32)

    tx = optim.make_optimizer(3e-3, 20, 0.0, 0.0)
    opt = tx.init(params)

    def loss_fn(p):
        logits = ast_mod.forward(p, feats, cfg, dtype=jnp.float32,
                                 attention_impl="pallas")
        return losses.stage1_loss(logits, labels)

    first = None
    import optax
    for _ in range(10):
        lv, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        if first is None:
            first = float(lv)
    assert float(lv) < first, (first, float(lv))
