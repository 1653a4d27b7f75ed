"""Opt-in int8 inference path (models/ast.py quantize_params + _dense_int8).

The int8 path is a documented accuracy trade-off for ~2x MXU peak; these
tests pin its numerical contract on CPU: exact weight-quantization error
bounds, probability drift vs the f32 path on a real-size distribution, and
end-to-end engine integration via CascadeConfig(int8=True)."""

import numpy as np
import pytest

from zenker_audio_detection_tpu.infer import cascade as C
from zenker_audio_detection_tpu.models import ast as ast_mod


@pytest.fixture(scope="module")
def tiny():
    import jax

    # default max_length (1024): the cascade engine always pads features to
    # the full AST frame count
    cfg = ast_mod.ASTConfig(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=4, intermediate_size=64,
                            num_labels=2)
    params = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_weight_quant_error_bound(tiny):
    """Dequantized kernels are within half a quantization step of the
    original, per output channel."""
    _, params = tiny
    q = ast_mod.quantize_params(params)
    for name in ("q", "k", "v", "attn_out", "fc1", "fc2"):
        w = np.asarray(params["encoder"][name]["kernel"], np.float32)
        wq = q["encoder"][name]["kernel_int8"]
        s = q["encoder"][name]["scale"]
        assert wq.dtype == np.int8
        np.testing.assert_allclose(wq.astype(np.float32) * s, w,
                                   atol=float(s.max()) / 2 + 1e-8)
    # non-encoder params untouched
    assert "kernel" in q["head"]["dense"]
    np.testing.assert_array_equal(np.asarray(q["pos_embed"]),
                                  np.asarray(params["pos_embed"]))


def test_int8_forward_close_to_f32(tiny):
    import jax.numpy as jnp

    cfg, params = tiny
    qparams = ast_mod.quantize_params(params)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal(
        (4, cfg.max_length, cfg.num_mel_bins)).astype(np.float32))
    exact = np.asarray(ast_mod.forward(params, feats, cfg, dtype=jnp.float32))
    quant = np.asarray(ast_mod.forward(qparams, feats, cfg,
                                       dtype=jnp.float32))

    def softmax(z):
        e = np.exp(z - z.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    # documented trade-off: probabilities drift O(1e-2), not O(1e-3)
    assert np.abs(softmax(exact) - softmax(quant)).max() < 5e-2


def test_engine_int8_mode(tiny):
    import jax
    import jax.numpy as jnp

    cfg, params = tiny
    params2 = ast_mod.init_params(jax.random.PRNGKey(1), cfg)
    s1 = C.StageSpec(params, cfg, -1.15, 3.53, ("Idle", "Swallow"))
    s2 = C.StageSpec(params2, cfg, -0.9, 2.8, ("Healthy", "Zenker"))
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)

    exact = C.TwoStageEngine(s1, s2, C.CascadeConfig(batch_size=8,
                                                     dtype=jnp.float32))
    fast = C.TwoStageEngine(s1, s2, C.CascadeConfig(batch_size=8,
                                                    dtype=jnp.float32,
                                                    int8=True))
    p1e, _ = exact.window_probs(audio)
    p1q, _ = fast.window_probs(audio)
    assert p1e.shape == p1q.shape
    assert np.abs(p1e - p1q).max() < 5e-2
    # the engine must hold quantized weights, not silently fall back
    assert "kernel_int8" in fast.stage1.params["encoder"]["q"]
