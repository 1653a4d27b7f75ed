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


def test_int8_params_rejected_by_hf_export(tiny):
    """The conversion layer itself owns the invariant: int8 trees must fail
    with a pointed error, not a bare KeyError('kernel') mid-export."""
    from zenker_audio_detection_tpu.models import convert

    _, params = tiny
    q = ast_mod.quantize_params(params)
    with pytest.raises(ValueError, match="int8"):
        convert.to_hf_state_dict(q)


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


def test_int8_model_dir_roundtrip(tiny, tmp_path):
    """save_int8_model_dir -> load_hf_model_dir returns ready-quantized
    params whose forward is EXACTLY the in-memory quantized forward, the
    file is ~4x smaller than the f32 export, and the engine's --int8 path
    serves the dir without double-quantizing."""
    import os

    import jax.numpy as jnp

    from zenker_audio_detection_tpu.models import convert

    cfg, params = tiny
    f32_dir = str(tmp_path / "f32")
    i8_dir = str(tmp_path / "i8")
    convert.save_hf_model_dir(params, cfg, f32_dir)
    convert.save_int8_model_dir(params, cfg, i8_dir,
                                id2label={0: "Idle", 1: "Swallow"})

    f32_size = os.path.getsize(os.path.join(f32_dir, "model.safetensors"))
    i8_size = os.path.getsize(os.path.join(i8_dir, "model_int8.safetensors"))
    # the six encoder GEMM kernels shrink 4x (f32 -> i8); everything else
    # (pos_embed, LNs, head — which dominate THIS tiny model, unlike
    # AST-base where the encoder is ~95% of bytes) stays f32
    kernel_bytes = sum(
        np.asarray(params["encoder"][n]["kernel"]).nbytes
        for n in ("q", "k", "v", "attn_out", "fc1", "fc2"))
    assert i8_size < f32_size - 0.70 * kernel_bytes

    loaded, lcfg = convert.load_hf_model_dir(i8_dir)
    assert lcfg.num_labels == 2 and lcfg.max_length == cfg.max_length
    assert loaded["encoder"]["q"]["kernel_int8"].dtype == np.int8

    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.standard_normal(
        (2, cfg.max_length, cfg.num_mel_bins)).astype(np.float32))
    want = np.asarray(ast_mod.forward(ast_mod.quantize_params(params),
                                      feats, cfg, dtype=jnp.float32))
    got = np.asarray(ast_mod.forward(loaded, feats, lcfg, dtype=jnp.float32))
    np.testing.assert_allclose(got, want, atol=1e-5)

    # quantize_params is idempotent -> CascadeConfig(int8=True) over an
    # int8 dir serves identically
    again = ast_mod.quantize_params(loaded)
    np.testing.assert_array_equal(again["encoder"]["q"]["kernel_int8"],
                                  loaded["encoder"]["q"]["kernel_int8"])


def test_adapt_checkpoint_cli_int8(tiny, tmp_path):
    """zenker-adapt-checkpoint --int8 (optionally with --max-length) writes
    a servable int8 dir; trainers refuse it with an actionable error."""
    import jax.numpy as jnp
    import pytest as _pytest

    from zenker_audio_detection_tpu.cli import adapt_checkpoint
    from zenker_audio_detection_tpu.models import convert
    from zenker_audio_detection_tpu.train import loop as train_loop

    cfg, params = tiny
    src = str(tmp_path / "src")
    convert.save_hf_model_dir(params, cfg, src)
    train_loop.save_feature_extractor_config(src, -1.15, 3.53,
                                             max_length=cfg.max_length)

    dst = str(tmp_path / "short_i8")
    adapt_checkpoint.main([src, dst, "--max-length", "128", "--int8"])
    loaded, lcfg = convert.load_hf_model_dir(dst)
    assert lcfg.max_length == 128
    assert loaded["encoder"]["q"]["kernel_int8"].dtype == np.int8
    # fx config traveled with the export
    import json as _json
    fx = _json.loads((tmp_path / "short_i8"
                      / "preprocessor_config.json").read_text())
    assert fx["max_length"] == 128

    cfgT = train_loop.TrainFoldConfig(
        stage="stage1", data_dir=".", output_root=".",
        pretrained_model_dir=dst, dtype=jnp.float32)
    with _pytest.raises(ValueError, match="int8"):
        train_loop.init_model(cfgT)
