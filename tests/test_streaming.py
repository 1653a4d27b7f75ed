"""StreamingCascade parity vs the offline TwoStageEngine.

The streaming engine must emit, for any chunking of the input (including
1-sample feeds and the whole file at once), exactly the windows and
probabilities the offline engine computes on the concatenated audio —
including gated-mode zero rows, the single zero-padded window for inputs
shorter than one window, and the reference-exact summary."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zenker_audio_detection_tpu.infer import cascade as C
from zenker_audio_detection_tpu.infer.streaming import StreamingCascade
from zenker_audio_detection_tpu.models import ast as ast_mod

MEAN1, STD1 = -1.1509622, 3.5340312
MEAN2, STD2 = -0.9, 2.8


def tiny_spec(seed, mean, std, labels):
    cfg = ast_mod.ASTConfig(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=4, intermediate_size=64,
                            num_mel_bins=128, max_length=128, num_labels=2)
    params = ast_mod.init_params(jax.random.PRNGKey(seed), cfg)
    return C.StageSpec(params, cfg, mean, std, labels)


def make_engine(stage2_mode="gated", **cfg_kw):
    s1 = tiny_spec(0, MEAN1, STD1, ("Idle", "Swallow"))
    s2 = tiny_spec(1, MEAN2, STD2, ("Healthy", "Zenker"))
    return C.TwoStageEngine(s1, s2, C.CascadeConfig(
        dtype=jnp.float32, batch_size=64, stage2_mode=stage2_mode, **cfg_kw))


def make_audio(seconds, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    n = int(16000 * seconds)
    x = 0.05 * rng.standard_normal(n) + 0.1 * np.sin(
        2 * np.pi * 300 * np.arange(n) / 16000)
    if dtype == np.int16:
        return np.clip(x * 32768.0, -32768, 32767).astype(np.int16)
    return x.astype(np.float32)


def feed_in_chunks(stream, audio, rng, max_chunk=30000):
    out = []
    i = 0
    while i < len(audio):
        n = int(rng.integers(0, max_chunk))
        out.extend(stream.feed(audio[i: i + n]))
        i += n
    out.extend(stream.flush())
    return out


def assert_stream_matches_offline(engine, audio, results, stream):
    p1_ref, p2_ref = engine.window_probs(audio)
    assert len(results) == len(p1_ref)
    assert [r.window_index for r in results] == list(range(len(p1_ref)))
    np.testing.assert_allclose(stream.stage1_probs(), p1_ref, atol=1e-5)
    np.testing.assert_allclose(stream.stage2_probs(), p2_ref, atol=1e-5)
    # identical gating decisions (zero rows in gated mode)
    assert ((np.abs(stream.stage2_probs()).sum(1) > 0)
            == (np.abs(p2_ref).sum(1) > 0)).all()
    # reference-exact summary parity
    ref_summary, _, _, _ = engine.gate_and_summarize(p1_ref, p2_ref)
    got = stream.summary()
    for k, v in ref_summary.items():
        if isinstance(v, list):
            np.testing.assert_allclose(got[k], v, atol=1e-5)
        else:
            assert got[k] == v or got[k] == pytest.approx(v, abs=1e-9), k


def test_streaming_gated_random_chunks():
    engine = make_engine("gated")
    audio = make_audio(12.0)
    stream = StreamingCascade(engine, chunk_windows=8)
    results = feed_in_chunks(stream, audio, np.random.default_rng(1))
    assert_stream_matches_offline(engine, audio, results, stream)
    # start samples follow the 0.5 s hop
    assert [r.start_sample for r in results[:3]] == [0, 8000, 16000]


def test_streaming_all_mode_single_feed():
    engine = make_engine("all")
    audio = make_audio(6.0, seed=3)
    stream = StreamingCascade(engine, chunk_windows=4)
    results = stream.feed(audio) + stream.flush()
    assert_stream_matches_offline(engine, audio, results, stream)


def test_streaming_short_file_single_padded_window():
    engine = make_engine("gated")
    audio = make_audio(0.3, seed=5)
    stream = StreamingCascade(engine)
    assert stream.feed(audio) == []
    results = stream.flush()
    assert len(results) == 1
    assert_stream_matches_offline(engine, audio, results, stream)


def test_streaming_empty_input():
    engine = make_engine("gated")
    stream = StreamingCascade(engine)
    results = stream.flush()
    # offline emits one zero-padded window even for empty audio
    p1_ref, _ = engine.window_probs(np.zeros(0, np.float32))
    assert len(results) == len(p1_ref) == 1
    np.testing.assert_allclose(stream.stage1_probs(), p1_ref, atol=1e-5)


def test_streaming_ring_wraparound():
    engine = make_engine("gated")
    audio = make_audio(10.0, seed=7)
    # 10 s -> 19 windows -> 1048 frames >> 256-frame ring: several wraps
    stream = StreamingCascade(engine, chunk_windows=2, capacity_frames=256)
    results = feed_in_chunks(stream, audio, np.random.default_rng(2),
                             max_chunk=9000)
    assert_stream_matches_offline(engine, audio, results, stream)


def test_streaming_int16_matches_offline_int16():
    engine = make_engine("gated")
    audio = make_audio(5.0, seed=9, dtype=np.int16)
    stream = StreamingCascade(engine, chunk_windows=4)
    results = feed_in_chunks(stream, audio, np.random.default_rng(3))
    assert_stream_matches_offline(engine, audio, results, stream)


def test_streaming_mixed_dtype_chunks():
    engine = make_engine("gated")
    audio16 = make_audio(4.0, seed=11, dtype=np.int16)
    audio_f = audio16.astype(np.float32) / 32768.0
    stream = StreamingCascade(engine, chunk_windows=4)
    half = len(audio16) // 2
    results = (stream.feed(audio16[:half])  # raw PCM chunk
               + stream.feed(audio_f[half:])  # float chunk
               + stream.flush())
    assert_stream_matches_offline(engine, audio_f, results, stream)


def test_streaming_emission_latency():
    """With chunk_windows=1, window w must be emitted by the first feed that
    completes its last sample — no buffering beyond the window itself."""
    engine = make_engine("gated")
    audio = make_audio(3.0, seed=13)
    stream = StreamingCascade(engine, chunk_windows=1)
    emitted = []
    fed = 0
    for i in range(0, len(audio), 4000):
        out = stream.feed(audio[i: i + 4000])
        fed = min(i + 4000, len(audio))
        for r in out:
            assert r.start_sample + 16000 <= fed
        emitted.extend(out)
        # every window whose samples are all fed must already be out
        expected = 0 if fed < 16000 else (fed - 16000) // 8000 + 1
        assert len(emitted) == expected
    emitted.extend(stream.flush())
    assert_stream_matches_offline(engine, audio, emitted, stream)


def test_streaming_nondefault_window_geometry():
    """1.2 s windows / 0.4 s hop (both on the 10 ms frame grid)."""
    s1 = tiny_spec(0, MEAN1, STD1, ("Idle", "Swallow"))
    s2 = tiny_spec(1, MEAN2, STD2, ("Healthy", "Zenker"))
    engine = C.TwoStageEngine(s1, s2, C.CascadeConfig(
        dtype=jnp.float32, window_sec=1.2, hop_sec=0.4, stage2_mode="gated"))
    audio = make_audio(7.0, seed=23)
    stream = StreamingCascade(engine, chunk_windows=5)
    results = feed_in_chunks(stream, audio, np.random.default_rng(6),
                             max_chunk=11000)
    assert_stream_matches_offline(engine, audio, results, stream)
    assert results[1].start_sample == int(0.4 * 16000)


def test_streaming_int8_engine_matches_offline_int8():
    """Engine options (here: int8 quantization) compose transparently —
    the stream uses the engine's committed (quantized) params and config."""
    s1 = tiny_spec(0, MEAN1, STD1, ("Idle", "Swallow"))
    s2 = tiny_spec(1, MEAN2, STD2, ("Healthy", "Zenker"))
    engine = C.TwoStageEngine(s1, s2, C.CascadeConfig(
        dtype=jnp.float32, batch_size=64, stage2_mode="gated", int8=True))
    audio = make_audio(4.0, seed=21)
    stream = StreamingCascade(engine, chunk_windows=4)
    results = feed_in_chunks(stream, audio, np.random.default_rng(5))
    assert_stream_matches_offline(engine, audio, results, stream)


@pytest.mark.parametrize("dtype", [np.float32, np.int16])
def test_warmup_precompiles_feed_programs(dtype):
    """After warmup(), the steady feed loop must trigger zero new traces —
    the live-serving guarantee (first windows don't stall on JIT) — for
    BOTH sample dtypes (int16 PCM is the serve CLI's default input and
    traces a second frames program)."""
    engine = make_engine("gated")
    stream = StreamingCascade(engine, chunk_windows=8)
    stream.warmup()
    sizes = {
        "frames": {b: fn._cache_size()
                   for b, fn in stream._frames_fns.items()},
        "update": {b: fn._cache_size()
                   for b, fn in stream._update_fns.items()},
        "stage": {k: fn._cache_size()
                  for k, fn in stream._stage_fns.items()},
    }
    n_frames, n_update, n_stage = (len(stream._frames_fns),
                                   len(stream._update_fns),
                                   len(stream._stage_fns))

    audio = make_audio(14.0, seed=17, dtype=dtype)  # 27 win -> 3 batches
    results = []
    for i in range(0, len(audio), 12000):
        results.extend(stream.feed(audio[i: i + 12000]))
    assert len(results) == 24  # only full batches so far

    assert len(stream._frames_fns) == n_frames
    assert len(stream._update_fns) == n_update
    assert len(stream._stage_fns) == n_stage
    for b, fn in stream._frames_fns.items():
        assert fn._cache_size() == sizes["frames"][b], f"frames block {b}"
    for b, fn in stream._update_fns.items():
        assert fn._cache_size() == sizes["update"][b], f"update block {b}"
    for k, fn in stream._stage_fns.items():
        assert fn._cache_size() == sizes["stage"][k], "stage program"

    # warmup must not have perturbed results: parity with offline prefix
    results.extend(stream.flush())
    assert_stream_matches_offline(engine, audio, results, stream)


def test_streaming_unretained_summary_matches_retained():
    """retain_results=False keeps the summary exact via O(1) accumulators
    (the memory-bounded mode for indefinite live streams)."""
    engine = make_engine("gated")
    audio = make_audio(9.0, seed=25)
    retained = StreamingCascade(engine, chunk_windows=4)
    unretained = StreamingCascade(engine, chunk_windows=4,
                                  retain_results=False)
    for s in (retained, unretained):
        s.feed(audio)
        s.flush()
    assert unretained._results == []
    got, ref = unretained.summary(), retained.summary()
    for k, v in ref.items():
        if isinstance(v, list):
            np.testing.assert_allclose(got[k], v, atol=1e-12)
        else:
            assert got[k] == pytest.approx(v), k
    with pytest.raises(RuntimeError, match="retain_results"):
        unretained.stage1_probs()
    with pytest.raises(RuntimeError, match="retain_results"):
        unretained.stage2_probs()


def test_streaming_validation_errors():
    engine = make_engine("gated")
    with pytest.raises(ValueError, match="capacity_frames"):
        StreamingCascade(engine, chunk_windows=64, capacity_frames=256)
    stream = StreamingCascade(engine)
    stream.flush()
    with pytest.raises(RuntimeError, match="flush"):
        stream.feed(np.zeros(100, np.float32))

    off_grid = C.TwoStageEngine(
        engine.stage1, engine.stage2,
        C.CascadeConfig(dtype=jnp.float32, hop_sec=0.4755))  # 7608 % 160 != 0
    with pytest.raises(ValueError, match="frame grid"):
        StreamingCascade(off_grid)

    zero_hop = C.TwoStageEngine(
        engine.stage1, engine.stage2,
        C.CascadeConfig(dtype=jnp.float32, hop_sec=0.0))
    with pytest.raises(ValueError, match="must be > 0"):
        StreamingCascade(zero_hop)


def test_concurrent_streams_fold_per_device():
    """Fleet serving smoke test (the --parallel-folds recipe, module
    docstring): one stream per device on its own thread under thread-local
    jax.default_device — each stream's numerics must equal its own offline
    engine run with no cross-stream interference, and each fold's params
    must have committed to its assigned chip."""
    from concurrent.futures import ThreadPoolExecutor

    devices = jax.devices()
    n_streams = min(3, len(devices))
    assert n_streams >= 2, "conftest provisions 8 virtual devices"

    def serve(fold):
        dev = devices[fold % len(devices)]
        with jax.default_device(dev):
            # per-fold model pair (distinct seeds = distinct weights)
            s1 = tiny_spec(2 * fold, MEAN1, STD1, ("Idle", "Swallow"))
            s2 = tiny_spec(2 * fold + 1, MEAN2, STD2, ("Healthy", "Zenker"))
            engine = C.TwoStageEngine(s1, s2, C.CascadeConfig(
                dtype=jnp.float32, batch_size=64, stage2_mode="gated"))
            audio = make_audio(5.0, seed=100 + fold)
            stream = StreamingCascade(engine, chunk_windows=4)
            results = feed_in_chunks(stream, audio,
                                     np.random.default_rng(fold))
            return engine, audio, results, stream, dev

    with ThreadPoolExecutor(max_workers=n_streams) as pool:
        outs = list(pool.map(serve, range(n_streams)))

    for engine, audio, results, stream, dev in outs:
        assert_stream_matches_offline(engine, audio, results, stream)
        # inspect the engine's COMMITTED serving copy (not the caller's
        # StageSpec input), and fail hard if the leaf has no .devices()
        # — a getattr fallback would make this check vacuous for numpy
        # leaves, exactly the uncommitted-params failure it exists for
        leaf = jax.tree.leaves(engine._params1)[0]
        assert hasattr(leaf, "devices"), type(leaf)
        assert leaf.devices() == {dev}
