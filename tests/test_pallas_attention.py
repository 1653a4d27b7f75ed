"""Parity tests for the Pallas fused attention (interpret mode on CPU)."""

import numpy as np
import pytest

from zenker_audio_detection_tpu.ops import attention as A


def _qkv(rng, b, s, nh, d, dtype):
    import jax.numpy as jnp

    def one():
        return jnp.asarray(rng.standard_normal((b, s, nh, d)),
                           dtype=dtype)

    return one(), one(), one()


@pytest.mark.parametrize("s", [64, 100, 128])
def test_mha_parity_fp32(rng, s):
    import jax.numpy as jnp

    q, k, v = _qkv(rng, 2, s, 4, 32, jnp.float32)
    ours = np.asarray(A.mha(q, k, v, interpret=True))
    ref = np.asarray(A.reference_mha(q, k, v))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_mha_parity_bf16(rng):
    import jax.numpy as jnp

    q, k, v = _qkv(rng, 1, 70, 2, 64, jnp.bfloat16)
    ours = np.asarray(A.mha(q, k, v, interpret=True), np.float32)
    ref = np.asarray(A.reference_mha(q, k, v), np.float32)
    np.testing.assert_allclose(ours, ref, atol=0.02)


def test_mask_excludes_padded_keys(rng, monkeypatch):
    """DIRECT mask check: fill the internal pad region with huge garbage
    instead of zeros — masked padded keys must leave the output unchanged
    (a broken -inf mask would let k/v pad rows dominate every softmax)."""
    import jax.numpy as jnp

    q, k, v = _qkv(rng, 1, 65, 2, 32, jnp.float32)  # padded to 128
    ref = np.asarray(A.mha(q, k, v, interpret=True))

    real_pad = jnp.pad

    def garbage_pad(x, widths, **kw):
        kw.pop("constant_values", None)
        return real_pad(x, widths, constant_values=1e4, **kw)

    with monkeypatch.context() as m:
        # mha pads q/k/v via jnp.pad right before the kernel; poisoning
        # the pad content exercises the iota mask, not zero-pad luck
        m.setattr(A.jnp, "pad", garbage_pad)
        poisoned = np.asarray(A.mha(q, k, v, interpret=True))
    np.testing.assert_allclose(poisoned, ref, atol=2e-5)
    np.testing.assert_allclose(ref, np.asarray(A.reference_mha(q, k, v)),
                               atol=2e-5)


@pytest.mark.parametrize("s", [64, 100])
def test_mha_batched_heads_parity(rng, s):
    import jax.numpy as jnp

    q, k, v = _qkv(rng, 2, s, 4, 32, jnp.float32)
    ours = np.asarray(A.mha_batched_heads(q, k, v, interpret=True))
    ref = np.asarray(A.reference_mha(q, k, v))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


@pytest.mark.parametrize("s,bq", [
    (64, 64), (300, 128), (100, 256),
    # non-128-divisible block_q where round-to-max(LANE, bq) alone leaves
    # s_pad % bq != 0: the floor-divided grid used to skip the trailing
    # valid query rows (uninitialized output) — round-3 review finding
    (1280, 96), (200, 96),
])
def test_mha_qblock_and_fused_parity(rng, s, bq):
    import jax.numpy as jnp

    q, k, v = _qkv(rng, 2, s, 4, 32, jnp.float32)
    ref = np.asarray(A.reference_mha(q, k, v))
    got_q = np.asarray(A.mha_qblock(q, k, v, block_q=bq, interpret=True))
    np.testing.assert_allclose(got_q, ref, atol=2e-5)
    got_f = np.asarray(A.mha_fused(q, k, v, block_q=bq, interpret=True))
    np.testing.assert_allclose(got_f, ref, atol=2e-5)


def test_full_model_with_pallas_attention(rng):
    """encode(attention_impl='pallas') matches the XLA path on a tiny AST."""
    import jax
    import jax.numpy as jnp

    from zenker_audio_detection_tpu.models import ast as ast_mod
    from zenker_audio_detection_tpu.ops import attention as attn_ops

    # interpret mode on CPU: patch mha_packed (the model's pallas entry)
    orig = attn_ops.mha_packed
    patched = lambda q, k, v, **kw: orig(q, k, v,
                                         **{**kw, "interpret": True})
    attn_ops.mha_packed, saved = patched, orig
    try:
        cfg = ast_mod.ASTConfig(hidden_size=32, num_hidden_layers=2,
                                num_attention_heads=4, intermediate_size=64,
                                patch_size=8, frequency_stride=4,
                                time_stride=4, num_mel_bins=16, max_length=64,
                                num_labels=2)
        params = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
        x = rng.standard_normal((2, 64, 16)).astype(np.float32)
        ref = np.asarray(ast_mod.forward(params, x, cfg))
        ours = np.asarray(ast_mod.forward(params, x, cfg,
                                          attention_impl="pallas"))
        np.testing.assert_allclose(ours, ref, atol=5e-5)
    finally:
        attn_ops.mha_packed = saved
