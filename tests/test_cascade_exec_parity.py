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
    from transformers import ASTForAudioClassification

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
        cfg = convert.config_from_hf_dict(hf_cfg.to_dict() | {"id2label": labels})
        params = convert.from_hf_state_dict(m.state_dict(), cfg)
        d = tmp_path / "runs" / f"stage{stage}" / "best"
        convert.save_hf_model_dir(params, cfg, str(d))
        save_feature_extractor_config(str(d), mean, std)
        roots[stage] = str(d)

    pdir = tmp_path / "long" / "Zenker" / "P77"
    pdir.mkdir(parents=True)
    t = np.arange(16000 * 4) / 16000.0
    # THREE files: discovery must keep the 2 longest (via torchaudio.info)
    for name, sec in (("recA.wav", 3.7), ("recB.wav", 2.4), ("short.wav", 0.9)):
        n = int(16000 * sec)
        x = (0.05 * rng.standard_normal(n)
             + 0.1 * np.sin(2 * np.pi * 300 * t[:n])).astype(np.float32)
        aio.write_wav(str(pdir / name), x, 16000)
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
    for k in ["total_swallow_ratio", "overall_zenker_ratio_over_swallow"]:
        if ra[k] is None:
            assert oa[k] is None, k
        else:
            assert oa[k] == pytest.approx(ra[k], abs=1e-6), k
