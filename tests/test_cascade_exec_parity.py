"""Executed-reference differential for the FULL cascade CLI.

Runs the ACTUAL reference script (src/test_long_audio_windows_2stage.py)
end-to-end — discovery (keep-2-longest via torchaudio.info), windowing,
two-stage torch inference over model dirs EXPORTED BY OUR CONVERTER,
gating, summary, JSON writing — and diffs our `cli.infer_long_audio`
output JSON against it. torchaudio (absent here) is stubbed with an
exact PCM16 reader: torchaudio.load's semantics for 16-bit PCM are
fixed (int16 / 32768), so the stub injects no behavior of ours.
"""

import json
import sys
import types
import wave
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference/src/test_long_audio_windows_2stage.py")
pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference not mounted")

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

MEAN1, STD1 = -1.1509622, 3.5340312
MEAN2, STD2 = -0.9, 2.8


def _torchaudio_stub():
    """Exact-semantics stand-in for the two calls the script makes on
    16 kHz PCM16 WAVs (resample is unreachable and poisoned)."""
    def load(path):
        with wave.open(str(path), "rb") as w:
            assert w.getsampwidth() == 2 and w.getnchannels() == 1
            sr = w.getframerate()
            pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        return torch.from_numpy(
            (pcm.astype(np.float32) / 32768.0)[None, :]), sr

    def info(path):
        with wave.open(str(path), "rb") as w:
            return types.SimpleNamespace(num_frames=w.getnframes())

    ta = types.ModuleType("torchaudio")
    ta.load = load
    ta.info = info
    ta.functional = types.SimpleNamespace(
        resample=lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("resample must not be reached at 16 kHz")))
    return ta


def _make_assets(tmp_path, rng):
    from zenker_audio_detection_tpu.audio import io as aio
    from zenker_audio_detection_tpu.models import convert
    from zenker_audio_detection_tpu.train.loop import save_feature_extractor_config
    from transformers import ASTConfig as HFASTConfig
    from transformers import ASTFeatureExtractor, ASTForAudioClassification

    pdir = tmp_path / "long" / "Zenker" / "P77"
    pdir.mkdir(parents=True)
    t = np.arange(16000 * 4) / 16000.0
    waves = {}
    # THREE files: discovery must keep the 2 longest (via torchaudio.info).
    # Per-half-second amplitude staircases make the windows diverse enough
    # for the (head-amplified, see below) models to gate them differently.
    for name, sec, amps in (
        ("recA.wav", 3.7, [0.05, 1.0, 4.0, 0.3, 8.0, 0.02, 2.0, 1.5]),
        ("recB.wav", 2.4, [6.0, 0.1, 1.0, 0.5, 3.0]),
        ("short.wav", 0.9, [1.0, 1.0]),
    ):
        n = int(16000 * sec)
        x = (0.05 * rng.standard_normal(n)
             + 0.1 * np.sin(2 * np.pi * 300 * t[:n]))
        for i in range(0, n, 8000):
            x[i:i + 8000] *= amps[(i // 8000) % len(amps)]
        waves[name] = x.astype(np.float32)
        aio.write_wav(str(pdir / name), waves[name], 16000)

    def all_windows(a):
        out = []
        for s in range(0, max(1, len(a) - 16000 + 1), 8000):
            seg = a[s: s + 16000]
            if len(seg) < 16000:
                pad = np.zeros(16000, np.float32)
                pad[: len(seg)] = seg
                seg = pad
            out.append(seg)
        return out

    windows = all_windows(waves["recA.wav"]) + all_windows(waves["recB.wav"])

    roots = {}
    for stage, (seed, mean, std, labels) in {
        1: (0, MEAN1, STD1, {0: "Idle", 1: "Swallow"}),
        2: (1, MEAN2, STD2, {0: "Healthy", 1: "Zenker"}),
    }.items():
        torch.manual_seed(seed)
        hf_cfg = HFASTConfig(hidden_size=32, num_hidden_layers=2,
                             num_attention_heads=4, intermediate_size=64,
                             num_labels=2)
        m = ASTForAudioClassification(hf_cfg).eval()
        # A raw random-init AST is nearly input-INSENSITIVE at the pooled
        # CLS output (probs vary ~1e-3 across wildly different windows), so
        # every window gates the same way and the stage-2/filter paths go
        # vacuous. Amplify the head 400x and mean-center its logit margin
        # ON THIS FIXTURE so the window probs straddle every gate the tests
        # use — a deterministic weight edit made BEFORE export, shared
        # bit-for-bit by the reference (transformers) and our loader.
        fx = ASTFeatureExtractor(mean=mean, std=std)
        with torch.no_grad():
            m.classifier.dense.weight *= 400.0
            feats = fx(windows, sampling_rate=16000,
                       return_tensors="pt")["input_values"]
            logits = m(feats).logits
            margin = (logits[:, 1] - logits[:, 0])
            m.classifier.dense.bias[1] -= margin.mean()
            probs = torch.softmax(m(feats).logits, dim=1)[:, 1].numpy()
        # every LIVE gate boundary must have safe numeric margin (torch vs
        # JAX probs differ <=2e-4; a window ON a boundary would make the
        # counts oracle-unstable). 0.5 = the argmax gate / argmax counting;
        # 0.55 = the stage-2 threshold and the stage-1 min-prob filter. The
        # tests' 0.45 stage-1 threshold is INERT (argmax==Swallow already
        # implies p>0.5), so no margin is needed there.
        for boundary in (0.5, 0.55):
            assert np.abs(probs - boundary).min() > 5e-3, (stage, probs)
        assert (probs > 0.5).any() and (probs < 0.5).any(), (stage, probs)
        if stage == 1:  # the min-prob filter band must be populated
            assert ((probs > 0.5) & (probs < 0.55)).any(), probs
            assert (probs >= 0.55).any(), probs

        cfg = convert.config_from_hf_dict(hf_cfg.to_dict() | {"id2label": labels})
        params = convert.from_hf_state_dict(m.state_dict(), cfg)
        d = tmp_path / "runs" / f"stage{stage}" / "best"
        convert.save_hf_model_dir(params, cfg, str(d))
        save_feature_extractor_config(str(d), mean, std)
        roots[stage] = str(d)
    return roots, tmp_path / "long"


def _run_reference(roots, long_root, out_json):
    ta = _torchaudio_stub()
    old_ta = sys.modules.get("torchaudio")
    old_argv = sys.argv
    sys.modules["torchaudio"] = ta
    sys.argv = ["test_long_audio_windows_2stage.py",
                "--stage1-model-root", roots[1],
                "--stage2-model-root", roots[2],
                "--patient-id", "P77", "--long-audio-root", str(long_root),
                "--stage1-threshold", "0.45", "--stage2-threshold", "0.55",
                "--show-first-n", "0", "--output-json", str(out_json)]
    try:
        exec(compile(REF.read_text(), str(REF), "exec"),
             {"__file__": str(REF), "__name__": "__main__"})
    finally:
        sys.argv = old_argv
        if old_ta is None:
            del sys.modules["torchaudio"]
        else:
            sys.modules["torchaudio"] = old_ta
    return json.loads(Path(out_json).read_text())


@pytest.mark.slow
def test_full_cascade_cli_parity_vs_executed_reference(tmp_path, capsys):
    from zenker_audio_detection_tpu.cli import infer_long_audio

    rng = np.random.default_rng(20260818)
    roots, long_root = _make_assets(tmp_path, rng)
    ref = _run_reference(roots, long_root, tmp_path / "ref.json")

    our_json = tmp_path / "ours.json"
    infer_long_audio.main([
        "--stage1-model-root", roots[1], "--stage2-model-root", roots[2],
        "--patient-id", "P77", "--long-audio-root", str(long_root),
        "--stage1-threshold", "0.45", "--stage2-threshold", "0.55",
        "--show-first-n", "0", "--output-json", str(our_json),
        "--disable-cache", "--f32"])
    capsys.readouterr()
    ours = json.loads(our_json.read_text())

    assert set(ours) == set(ref) == {"config", "per_file", "aggregate"}
    # discovery picked the same 2 longest files in the same order
    assert ours["config"]["files"] == ref["config"]["files"]
    for k in ["window_sec", "hop_sec", "stage1_threshold"]:
        assert ours["config"][k] == ref["config"][k], k

    assert set(ours["per_file"]) == set(ref["per_file"]) == {"file_0", "file_1"}
    for fk in ("file_0", "file_1"):
        o, r = ours["per_file"][fk], ref["per_file"][fk]
        assert o["path"] == r["path"]
        for k in ["num_windows", "stage1_idle_windows",
                  "stage1_swallow_windows",
                  "stage2_swallow_windows_evaluated",
                  "stage2_healthy_windows", "stage2_zenker_windows"]:
            assert o[k] == r[k], (fk, k)
        for k in ["stage1_swallow_ratio", "stage2_zenker_ratio_over_swallow"]:
            assert o[k] == pytest.approx(r[k], abs=1e-6, nan_ok=True), (fk, k)
        np.testing.assert_allclose(o["stage1_mean_probs"],
                                   r["stage1_mean_probs"], atol=2e-4)
        if r["stage2_mean_probs_over_swallow"] is None:
            assert o["stage2_mean_probs_over_swallow"] is None
        else:
            np.testing.assert_allclose(o["stage2_mean_probs_over_swallow"],
                                       r["stage2_mean_probs_over_swallow"],
                                       atol=2e-4)

    oa, ra = ours["aggregate"], ref["aggregate"]
    assert oa["files_used"] == ra["files_used"]
    for k in ["total_windows", "total_idle_windows", "total_swallow_windows",
              "total_swallow_windows_evaluated_stage2",
              "total_healthy_windows", "total_zenker_windows"]:
        assert oa[k] == ra[k], k
    # non-vacuity: both stages and both outcomes must actually occur
    assert ra["total_idle_windows"] > 0 and ra["total_swallow_windows"] > 0
    assert ra["total_swallow_windows_evaluated_stage2"] > 0
    assert ra["total_healthy_windows"] + ra["total_zenker_windows"] > 0
    for k in ["total_swallow_ratio", "overall_zenker_ratio_over_swallow"]:
        if ra[k] is None:
            assert oa[k] is None, k
        else:
            assert oa[k] == pytest.approx(ra[k], abs=1e-6), k


REF_CACHE = Path("/root/reference/src/test_long_audio_windows_2stage_cache.py")


def _run_reference_cache(roots, long_root, out_json, cache_dir, extra=()):
    ta = _torchaudio_stub()
    old_ta = sys.modules.get("torchaudio")
    old_argv = sys.argv
    sys.modules["torchaudio"] = ta
    sys.argv = ["test_long_audio_windows_2stage_cache.py",
                "--stage1-model-root", roots[1],
                "--stage2-model-root", roots[2],
                "--patient-id", "P77", "--long-audio-root", str(long_root),
                "--feature-cache-dir", str(cache_dir),
                "--show-first-n", "0", "--output-json", str(out_json),
                *extra]
    try:
        exec(compile(REF_CACHE.read_text(), str(REF_CACHE), "exec"),
             {"__file__": str(REF_CACHE), "__name__": "__main__"})
    finally:
        sys.argv = old_argv
        if old_ta is None:
            del sys.modules["torchaudio"]
        else:
            sys.modules["torchaudio"] = old_ta
    return json.loads(Path(out_json).read_text())


@pytest.mark.slow
@pytest.mark.parametrize("extra", [
    ("--stage1-threshold", "0.45", "--stage1-forward-min-prob", "0.55"),
    ("--stage1-threshold", "0.45", "--stage2-argmax"),
])
def test_cache_variant_cli_parity_vs_executed_reference(tmp_path, capsys,
                                                        extra):
    """The cache-variant reference script owns --stage1-forward-min-prob and
    --stage2-argmax (threshold-mode stage-2 counting instead of the base
    script's); run it cold AND warm (its own feature cache) and diff our
    CLI (cold and warm through OUR frame-level cache) against it."""
    from zenker_audio_detection_tpu.cli import infer_long_audio

    rng = np.random.default_rng(20260818)
    roots, long_root = _make_assets(tmp_path, rng)

    ref_cache = tmp_path / "refcache"
    ref_cold = _run_reference_cache(roots, long_root, tmp_path / "r1.json",
                                    ref_cache, extra)
    ref_warm = _run_reference_cache(roots, long_root, tmp_path / "r2.json",
                                    ref_cache, extra)
    assert ref_warm == ref_cold  # reference cache is output-invariant

    our_cache = tmp_path / "ourcache"
    outs = []
    for run in (1, 2):
        oj = tmp_path / f"o{run}.json"
        infer_long_audio.main([
            "--stage1-model-root", roots[1], "--stage2-model-root", roots[2],
            "--patient-id", "P77", "--long-audio-root", str(long_root),
            "--show-first-n", "0", "--output-json", str(oj),
            "--cache-dir", str(our_cache), "--f32", *extra])
        outs.append(json.loads(oj.read_text()))
    capsys.readouterr()
    assert outs[1] == outs[0]  # our frame cache is output-invariant

    ours = outs[0]
    if "--stage1-forward-min-prob" in extra:
        # the filter must actually bite on this fixture, or the test is vacuous
        f0 = ref_cold["per_file"]["file_0"]
        assert (f0["stage2_swallow_windows_evaluated"]
                < f0["stage1_swallow_windows"]), f0
    for fk in ("file_0", "file_1"):
        o, r = ours["per_file"][fk], ref_cold["per_file"][fk]
        for k in ["num_windows", "stage1_idle_windows",
                  "stage1_swallow_windows",
                  "stage2_swallow_windows_evaluated",
                  "stage2_healthy_windows", "stage2_zenker_windows"]:
            assert o[k] == r[k], (fk, k, extra)
        np.testing.assert_allclose(o["stage1_mean_probs"],
                                   r["stage1_mean_probs"], atol=2e-4)
    oa, ra = ours["aggregate"], ref_cold["aggregate"]
    for k in ["total_windows", "total_idle_windows", "total_swallow_windows",
              "total_swallow_windows_evaluated_stage2",
              "total_healthy_windows", "total_zenker_windows"]:
        assert oa[k] == ra[k], (k, extra)
