"""Tests for parallel/mesh.py helpers."""

import numpy as np
import pytest

from zenker_audio_detection_tpu.parallel import mesh as M


def test_pad_to_multiple():
    x = np.arange(10, dtype=np.float32).reshape(10, 1)
    padded, n = M.pad_to_multiple(x, 8)
    assert padded.shape == (16, 1) and n == 10
    assert np.all(padded[10:] == 0)
    same, n2 = M.pad_to_multiple(x[:8], 8)
    assert same.shape == (8, 1) and n2 == 8


def test_local_batch_size():
    import jax

    mesh = M.data_mesh(jax.devices())
    assert M.local_batch_size(16, mesh) == 2
    with pytest.raises(ValueError):
        M.local_batch_size(10, mesh)


def test_replicate_and_shard_roundtrip(rng):
    import jax

    mesh = M.data_mesh(jax.devices())
    x = rng.standard_normal((16, 4)).astype(np.float32)
    sharded = M.shard_batch(x, mesh)
    np.testing.assert_array_equal(np.asarray(sharded), x)
    tree = {"a": np.ones((3, 3), np.float32)}
    rep = M.replicate(tree, mesh)
    np.testing.assert_array_equal(np.asarray(rep["a"]), tree["a"])
