"""serve CLI: stdin PCM -> JSONL windows, parity vs the offline engine."""

import io
import json

import jax
import numpy as np
import pytest

from zenker_audio_detection_tpu.cli import serve
from zenker_audio_detection_tpu.infer import cascade as C
from zenker_audio_detection_tpu.models import ast as ast_mod, convert
from zenker_audio_detection_tpu.train import loop as train_loop

MEAN1, STD1 = -1.1509622, 3.5340312
MEAN2, STD2 = -0.9, 2.8


@pytest.fixture(scope="module")
def model_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve_models")
    cfg = ast_mod.ASTConfig(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=4, intermediate_size=64,
                            num_mel_bins=128, max_length=128, num_labels=2)
    dirs = []
    for seed, (mean, std) in [(0, (MEAN1, STD1)), (1, (MEAN2, STD2))]:
        d = str(root / f"stage{seed + 1}")
        params = ast_mod.init_params(jax.random.PRNGKey(seed), cfg)
        convert.save_hf_model_dir(params, cfg, d)
        train_loop.save_feature_extractor_config(d, mean, std,
                                                 max_length=cfg.max_length)
        dirs.append(d)
    return dirs


def make_audio(seconds, seed=0):
    rng = np.random.default_rng(seed)
    n = int(16000 * seconds)
    x = 0.05 * rng.standard_normal(n) + 0.1 * np.sin(
        2 * np.pi * 300 * np.arange(n) / 16000)
    return np.clip(x * 32768.0, -32768, 32767).astype(np.int16)


def run_serve(model_dirs, argv_extra, stdin_bytes):
    out = io.StringIO()
    rc = serve.main(
        ["--stage1-model-root", model_dirs[0],
         "--stage2-model-root", model_dirs[1],
         "--f32", "--chunk-windows", "4"] + argv_extra,
        stdin_buffer=io.BytesIO(stdin_bytes), stdout=out)
    assert rc == 0
    return [json.loads(line) for line in out.getvalue().splitlines()]


def offline_reference(model_dirs, audio):
    import jax.numpy as jnp

    params1, cfg1 = convert.load_hf_model_dir(model_dirs[0])
    params2, cfg2 = convert.load_hf_model_dir(model_dirs[1])
    s1 = C.StageSpec(params1, cfg1, MEAN1, STD1, ("Idle", "Swallow"))
    s2 = C.StageSpec(params2, cfg2, MEAN2, STD2, ("Healthy", "Zenker"))
    engine = C.TwoStageEngine(s1, s2, C.CascadeConfig(dtype=jnp.float32))
    return engine, engine.window_probs(audio)


def test_serve_stdin_pcm16_matches_offline(model_dirs):
    audio = make_audio(6.0)
    lines = run_serve(model_dirs, [], audio.tobytes())
    windows = [l for l in lines if l["type"] == "window"]
    summaries = [l for l in lines if l["type"] == "summary"]
    assert len(summaries) == 1

    engine, (p1_ref, p2_ref) = offline_reference(model_dirs, audio)
    assert len(windows) == len(p1_ref)
    got_p1 = np.array([w["stage1_probs"] for w in windows])
    np.testing.assert_allclose(got_p1, p1_ref, atol=1e-5)
    # stage-2 rows: null exactly where the offline gated row is zero
    for w, row in zip(windows, p2_ref):
        if np.abs(row).sum() > 0:
            np.testing.assert_allclose(w["stage2_probs"], row, atol=1e-5)
            assert w["stage2_pred"] in ("Healthy", "Zenker")
            assert w["stage1_pred"] == "Swallow"
        else:
            assert w["stage2_probs"] is None and w["stage2_pred"] is None
    # summary line equals the engine's reference-exact summary
    ref_summary, _, _, _ = engine.gate_and_summarize(p1_ref, p2_ref)
    got = summaries[0]
    for k, v in ref_summary.items():
        if isinstance(v, list):
            np.testing.assert_allclose(got[k], v, atol=1e-5)
        else:
            assert got[k] == v, k
    # start_sec follows the hop
    assert [w["start_sec"] for w in windows[:3]] == [0.0, 0.5, 1.0]


def test_serve_f32_stdin_and_odd_chunks(model_dirs):
    audio = make_audio(3.0, seed=4).astype(np.float32) / 32768.0
    lines = run_serve(model_dirs,
                      ["--input-format", "f32",
                       "--read-chunk-samples", "1111", "--no-summary"],
                      audio.tobytes())
    assert all(l["type"] == "window" for l in lines)
    _, (p1_ref, _) = offline_reference(model_dirs, audio)
    np.testing.assert_allclose(
        np.array([l["stage1_probs"] for l in lines]), p1_ref, atol=1e-5)


def test_serve_wav_simulation(model_dirs, tmp_path):
    from zenker_audio_detection_tpu.audio import io as aio

    audio = make_audio(2.5, seed=7)
    wav = str(tmp_path / "rec.wav")
    # write_wav takes float in [-1, 1]; the int16 round-trip is exact, so
    # load_audio_compact returns `audio` bit-identically
    aio.write_wav(wav, audio.astype(np.float32) / 32768.0, 16000)
    lines = run_serve(model_dirs, ["--input", wav], b"")
    windows = [l for l in lines if l["type"] == "window"]
    _, (p1_ref, _) = offline_reference(model_dirs, audio)
    assert len(windows) == len(p1_ref)
    np.testing.assert_allclose(
        np.array([w["stage1_probs"] for w in windows]), p1_ref, atol=1e-5)


def test_serve_summary_nan_serialized_as_null(model_dirs):
    """Swallow windows present but none passing an unreachable stage-1 gate:
    summary()'s reference-exact NaN sentinel must hit the wire as null, not
    the non-standard JSON token NaN (strict JSONL consumers)."""
    audio = make_audio(8.0)
    out = io.StringIO()
    rc = serve.main(
        ["--stage1-model-root", model_dirs[0],
         "--stage2-model-root", model_dirs[1],
         "--f32", "--chunk-windows", "4", "--stage1-threshold", "1.01"],
        stdin_buffer=io.BytesIO(audio.tobytes()), stdout=out)
    assert rc == 0

    def reject_constant(_s):
        raise AssertionError("non-standard JSON constant on the wire")

    lines = [json.loads(l, parse_constant=reject_constant)
             for l in out.getvalue().splitlines()]
    summary = [l for l in lines if l["type"] == "summary"][0]
    # the quirk: swallow windows counted by argmax, gate by threshold
    assert summary["stage1_swallow_windows"] > 0
    assert summary["stage2_swallow_windows_evaluated"] == 0
    assert summary["stage2_mean_probs_over_swallow"] is None


def test_json_safe_maps_all_nonfinite_to_null():
    """NaN AND +/-Inf must become null on the wire — json.dumps would emit
    the non-standard 'Infinity' token for an overflowing metric."""
    payload = {"a": float("nan"), "b": float("inf"), "c": float("-inf"),
               "d": [1.0, float("inf")], "e": ("x", float("nan")), "f": 2}
    safe = serve._json_safe(payload)
    assert safe == {"a": None, "b": None, "c": None,
                    "d": [1.0, None], "e": ["x", None], "f": 2}
    json.loads(json.dumps(safe),
               parse_constant=lambda s: (_ for _ in ()).throw(
                   AssertionError(s)))


def test_serve_requires_model_roots():
    with pytest.raises(ValueError, match="Model roots"):
        serve.main([], stdin_buffer=io.BytesIO(b""), stdout=io.StringIO())


def test_serve_int8_model_dirs(model_dirs, tmp_path):
    """Streaming serve over int8 EXPORT dirs (model_int8.safetensors) with
    --int8: quantize_params must be idempotent through the CLI path and
    probs must stay within the documented O(1e-2) band of the f32 run."""
    from zenker_audio_detection_tpu.models import convert
    from zenker_audio_detection_tpu.train import loop as train_loop

    i8_dirs = []
    for src, name in zip(model_dirs, ("s1", "s2")):
        params, cfg = convert.load_hf_model_dir(src)
        dst = str(tmp_path / f"i8_{name}")
        convert.save_int8_model_dir(params, cfg, dst)
        mean, std = train_loop.load_feature_extractor_config(src)
        train_loop.save_feature_extractor_config(dst, mean, std,
                                                 max_length=cfg.max_length)
        i8_dirs.append(dst)

    audio = make_audio(4.0, seed=11)
    out = io.StringIO()
    rc = serve.main(
        ["--stage1-model-root", i8_dirs[0],
         "--stage2-model-root", i8_dirs[1],
         "--int8", "--f32", "--chunk-windows", "4"],
        stdin_buffer=io.BytesIO(audio.tobytes()), stdout=out)
    assert rc == 0
    windows = [json.loads(l) for l in out.getvalue().splitlines()
               if json.loads(l)["type"] == "window"]
    _, (p1_ref, _) = offline_reference(model_dirs, audio)
    assert len(windows) == len(p1_ref)
    got = np.array([w["stage1_probs"] for w in windows])
    assert np.abs(got - p1_ref).max() < 5e-2  # int8 drift band


def test_serve_rss_limit_graceful_recycle(model_dirs):
    """--rss-limit-mb: exceeding the bound stops the stream gracefully —
    remaining windows flushed, a valid summary carrying
    stopped_reason='rss_limit', exit code 3 (supervisor-restart contract
    for the axon tunnel's transfer-buffer retention,
    .bench/probe_tunnel_leak.py). A generous bound must not trigger."""
    audio = make_audio(6.0, seed=5)
    out = io.StringIO()
    rc = serve.main(
        ["--stage1-model-root", model_dirs[0],
         "--stage2-model-root", model_dirs[1],
         "--f32", "--chunk-windows", "4", "--rss-limit-mb", "1"],
        stdin_buffer=io.BytesIO(audio.tobytes()), stdout=out)
    assert rc == 3
    lines = [json.loads(l) for l in out.getvalue().splitlines()]
    assert lines, "no output at all"
    summary = lines[-1]
    assert summary["type"] == "summary"
    assert summary["stopped_reason"] == "rss_limit"
    # every pre-stop line is a well-formed window record
    assert all(l["type"] == "window" for l in lines[:-1])

    # generous bound: stream runs to completion, no recycle marker
    lines2 = run_serve(model_dirs, ["--rss-limit-mb", "1000000"],
                       make_audio(2.5, seed=5).tobytes())
    assert lines2[-1]["type"] == "summary"
    assert "stopped_reason" not in lines2[-1]
