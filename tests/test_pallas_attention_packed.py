"""Parity for the packed layout-preserving kernel."""

import numpy as np
import pytest

from zenker_audio_detection_tpu.ops import attention as A


@pytest.mark.parametrize("s,bq", [(64, 64), (300, 128)])
def test_mha_packed_parity(rng, s, bq):
    import jax.numpy as jnp

    B, NH, D = 2, 4, 32
    mk = lambda: jnp.asarray(rng.standard_normal((B, s, NH, D)), jnp.float32)
    q, k, v = mk(), mk(), mk()
    ref = np.asarray(A.reference_mha(q, k, v)).reshape(B, s, NH * D)
    got = np.asarray(A.mha_packed(
        q.reshape(B, s, NH * D), k.reshape(B, s, NH * D),
        v.reshape(B, s, NH * D), num_heads=NH, block_q=bq, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.parametrize("s,bq", [(64, 64), (300, 128)])
def test_mha_pairs_parity(rng, s, bq):
    """Head-pair block-diagonal variant: numerically identical attention
    (see ops/attention.py closure note: measured slower than XLA in-model,
    kept as the documented full-MXU-width experiment)."""
    import jax.numpy as jnp

    B, NH, D = 2, 4, 32
    mk = lambda: jnp.asarray(rng.standard_normal((B, s, NH, D)), jnp.float32)
    q, k, v = mk(), mk(), mk()
    ref = np.asarray(A.reference_mha(q, k, v)).reshape(B, s, NH * D)
    got = np.asarray(A.mha_pairs(
        q.reshape(B, s, NH * D), k.reshape(B, s, NH * D),
        v.reshape(B, s, NH * D), num_heads=NH, block_q=bq, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_mha_pairs_odd_heads_falls_back(rng):
    import jax.numpy as jnp

    B, s, NH, D = 1, 64, 3, 32
    mk = lambda: jnp.asarray(rng.standard_normal((B, s, NH, D)), jnp.float32)
    q, k, v = mk(), mk(), mk()
    ref = np.asarray(A.reference_mha(q, k, v)).reshape(B, s, NH * D)
    got = np.asarray(A.mha_pairs(
        q.reshape(B, s, NH * D), k.reshape(B, s, NH * D),
        v.reshape(B, s, NH * D), num_heads=NH, block_q=64, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)
