"""Feature-cache integrity tests (reference cache contract:
src/test_long_audio_windows_2stage_cache.py:84-192 — metadata-verified,
recompute on mismatch)."""

import numpy as np
import pytest

from zenker_audio_detection_tpu.audio import io as aio
from zenker_audio_detection_tpu.infer import cache as FC


@pytest.fixture
def wav(tmp_path, rng):
    p = str(tmp_path / "a.wav")
    aio.write_wav(p, (rng.standard_normal(32000) * 0.1).astype(np.float32),
                  16000, dtype="float32")
    return p


def test_roundtrip(tmp_path, wav, rng):
    frames = rng.standard_normal((198, 128)).astype(np.float32)
    cache_dir = str(tmp_path / "cache")
    FC.save_frames(wav, frames, 1.0, 0.5, 16000, cache_dir)
    got = FC.load_frames(wav, 1.0, 0.5, 16000, cache_dir)
    np.testing.assert_array_equal(got, frames)


def test_miss_on_absent(tmp_path, wav):
    assert FC.load_frames(wav, 1.0, 0.5, 16000, str(tmp_path / "c")) is None


def test_key_changes_with_params(wav):
    k1 = FC.cache_key(wav, 1.0, 0.5, 16000)
    k2 = FC.cache_key(wav, 1.0, 0.25, 16000)
    k3 = FC.cache_key(wav, 2.0, 0.5, 16000)
    assert len({k1, k2, k3}) == 3


def test_stale_on_file_change(tmp_path, wav, rng):
    cache_dir = str(tmp_path / "cache")
    frames = rng.standard_normal((198, 128)).astype(np.float32)
    FC.save_frames(wav, frames, 1.0, 0.5, 16000, cache_dir)
    # rewrite the audio -> size/mtime metadata mismatch -> miss
    aio.write_wav(wav, (rng.standard_normal(16000) * 0.2).astype(np.float32),
                  16000, dtype="float32")
    assert FC.load_frames(wav, 1.0, 0.5, 16000, cache_dir) is None


def test_corrupt_bundle_self_heals(tmp_path, wav, rng):
    """A truncated/garbled bundle (killed job, disk hiccup) must read as a
    MISS — never an exception or a permanent break — and the recompute's
    save must repair it in place."""
    cache_dir = str(tmp_path / "cache")
    frames = rng.standard_normal((198, 128)).astype(np.float32)
    out = FC.save_frames(wav, frames, 1.0, 0.5, 16000, cache_dir)

    with open(out, "rb") as f:
        good = f.read()
    for blob in (good[: len(good) // 3],        # truncation
                 b"\x00" * 100,                 # not a zip at all
                 good[:30] + b"\xff" * 40 + good[70:]):  # flipped bytes
        with open(out, "wb") as f:
            f.write(blob)
        assert FC.load_frames(wav, 1.0, 0.5, 16000, cache_dir) is None
        FC.save_frames(wav, frames, 1.0, 0.5, 16000, cache_dir)  # heals
        got = FC.load_frames(wav, 1.0, 0.5, 16000, cache_dir)
        np.testing.assert_array_equal(got, frames)


def test_concurrent_same_key_writers(tmp_path, wav, rng):
    """Fold-parallel serving runs one engine per fold in THREADS and the
    cache key is fold-independent, so several threads can publish the same
    bundle path simultaneously. Every observable state must be a complete
    bundle (os.replace is atomic; staging names are pid+tid-unique) — a
    concurrent reader gets valid frames, never a half-written file."""
    import glob
    import threading

    cache_dir = str(tmp_path / "cache")
    frames = rng.standard_normal((198, 128)).astype(np.float32)
    errs = []

    def writer():
        try:
            for _ in range(5):
                FC.save_frames(wav, frames, 1.0, 0.5, 16000, cache_dir)
                got = FC.load_frames(wav, 1.0, 0.5, 16000, cache_dir)
                assert got is not None and np.array_equal(got, frames)
        except Exception as e:  # pragma: no cover - failure diagnostics
            errs.append(e)

    threads = [threading.Thread(target=writer) for _ in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    got = FC.load_frames(wav, 1.0, 0.5, 16000, cache_dir)
    np.testing.assert_array_equal(got, frames)
    assert not glob.glob(str(tmp_path / "cache" / "*.tmp.*"))


def test_save_frames_atomic_no_tmp_leftovers(tmp_path, wav, rng):
    """save_frames stages through a pid-suffixed tmp and renames: after a
    save, the cache dir holds exactly the final bundle (concurrent servers
    sharing a cache dir must never observe a half-written bundle under the
    final name)."""
    import os

    cache_dir = str(tmp_path / "cache")
    frames = rng.standard_normal((198, 128)).astype(np.float32)
    out = FC.save_frames(wav, frames, 1.0, 0.5, 16000, cache_dir)
    assert os.listdir(cache_dir) == [os.path.basename(out)]


def test_engine_cache_hit_identical_probs(tmp_path, rng):
    """Second engine call served from cache must reproduce probabilities."""
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
    eng = C.TwoStageEngine(s1, s2, C.CascadeConfig(
        dtype=jnp.float32, cache_dir=str(tmp_path / "cache"), batch_size=16))

    wavpath = str(tmp_path / "rec.wav")
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    aio.write_wav(wavpath, audio, 16000, dtype="float32")

    p1a, p2a = eng.window_probs(audio, wavpath)  # miss -> compute + save
    p1b, p2b = eng.window_probs(audio, wavpath)  # hit
    np.testing.assert_allclose(p1b, p1a, atol=1e-6)
    np.testing.assert_allclose(p2b, p2a, atol=1e-6)
    import glob
    assert glob.glob(str(tmp_path / "cache" / "*.npz"))


def test_engine_cache_hit_identical_probs_int16(tmp_path, rng):
    """int16 PCM input: cache stores f32 frames; the hit path must
    reproduce the miss path's probabilities exactly."""
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
    eng = C.TwoStageEngine(s1, s2, C.CascadeConfig(
        dtype=jnp.float32, cache_dir=str(tmp_path / "cache"), batch_size=16))

    pcm = (rng.standard_normal(16000 * 3) * 8000).astype(np.int16)
    wavpath = str(tmp_path / "rec16.wav")
    aio.write_wav(wavpath, pcm.astype(np.float32) / 32768.0, 16000)

    loaded = aio.load_audio_compact(wavpath)
    assert loaded.dtype == np.int16
    p1a, p2a = eng.window_probs(loaded, wavpath)  # miss -> compute + save
    p1b, p2b = eng.window_probs(loaded, wavpath)  # hit from f32 frame cache
    np.testing.assert_array_equal(p1b, p1a)
    np.testing.assert_array_equal(p2b, p2a)


def test_structurally_corrupt_bundles_are_misses(tmp_path, wav, rng):
    """Beyond byte-level damage: bundles that ARE valid npz files but
    violate the schema (missing members, non-JSON metadata, pickled
    payloads) must read as misses — and the pickled case must never be
    unpickled (allow_pickle=False)."""
    import json as _json

    cache_dir = str(tmp_path / "cache")
    frames = rng.standard_normal((50, 128)).astype(np.float32)
    out = FC.save_frames(wav, frames, 1.0, 0.5, 16000, cache_dir)
    meta = _json.dumps(FC._metadata(wav, 1.0, 0.5, 16000))

    variants = [
        {"frames": frames},                              # metadata missing
        {"metadata": meta},                              # frames missing
        {"metadata": "not json {", "frames": frames},    # metadata not JSON
        {"metadata": _json.dumps({"path": "other"}),     # metadata mismatch
         "frames": frames},
        {"metadata": np.array({"a": 1}, dtype=object),   # pickled payload
         "frames": frames},
    ]
    for kw in variants:
        np.savez(out, **kw)
        assert FC.load_frames(wav, 1.0, 0.5, 16000, cache_dir) is None
    # and a good rewrite heals it
    FC.save_frames(wav, frames, 1.0, 0.5, 16000, cache_dir)
    np.testing.assert_array_equal(
        FC.load_frames(wav, 1.0, 0.5, 16000, cache_dir), frames)
