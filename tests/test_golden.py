"""Frozen golden-vector parity (tests/golden/*.npz, see generate_golden.py).

These decouple parity from the installed `transformers` version and from
test-side formula re-derivation: the resampler goldens come from a dense
continuous-time evaluation of the torchaudio definition (no shared code
structure with ops/resample.py), the fbank goldens from the HF numpy
extractor at a pinned version."""

import os

import numpy as np
import pytest

from zenker_audio_detection_tpu.ops import fbank as F
from zenker_audio_detection_tpu.ops import resample as R

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def resample_golden():
    return np.load(os.path.join(GOLDEN, "resample_golden.npz"))


@pytest.fixture(scope="module")
def fbank_golden():
    return np.load(os.path.join(GOLDEN, "fbank_golden.npz"))


CASES = ["noise_48k_to_16k", "noise_44k1_to_16k", "tone_48k_to_16k"]


@pytest.mark.parametrize("case", CASES)
def test_resample_host_matches_golden(resample_golden, case):
    x = resample_golden[f"{case}_in"]
    want = resample_golden[f"{case}_out"]
    orig, new = resample_golden[f"{case}_rates"]
    got = R.resample(x, int(orig), int(new))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("case", CASES)
def test_resample_jax_matches_golden(resample_golden, case):
    x = resample_golden[f"{case}_in"]
    want = resample_golden[f"{case}_out"]
    orig, new = resample_golden[f"{case}_rates"]
    got = np.asarray(R.resample_jax(x, int(orig), int(new)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("clip", ["one_sec", "half_sec", "tone"])
def test_fbank_raw_matches_golden(fbank_golden, clip):
    import jax.numpy as jnp

    x = fbank_golden[f"{clip}_in"]
    want = fbank_golden[f"{clip}_raw"]
    got = np.asarray(F.logmel_frames(jnp.asarray(x), F.num_frames(len(x))))
    assert got.shape == want.shape
    # the pure tone has ~zero energy in most mel bins, so the log sits at the
    # Kaldi floor (-15.94) where f32 rounding is magnified — hence the wider
    # tolerance there; broadband clips stay within the usual 5e-4
    np.testing.assert_allclose(got, want, atol=1e-3 if clip == "tone" else 5e-4)


def test_fbank_normalized_matches_golden(fbank_golden):
    import jax.numpy as jnp

    x = fbank_golden["one_sec_in"]
    want = fbank_golden["one_sec_normalized_full"]
    mean = float(fbank_golden["norm_mean"])
    std = float(fbank_golden["norm_std"])
    raw = F.logmel_frames(jnp.asarray(x), F.num_frames(len(x)))
    got = np.asarray(F.pad_and_normalize(raw[None],
                                         F.FbankConfig(mean=mean, std=std)))[0]
    assert got.shape == want.shape == (F.MAX_FRAMES, F.NUM_MEL_BINS)
    np.testing.assert_allclose(got, want, atol=2e-4)
    # pad rows are normalized zeros, not raw zeros (HF pad-then-normalize)
    pad_value = (0.0 - mean) / (2.0 * std)
    np.testing.assert_allclose(got[200:], pad_value, atol=1e-6)


# ---------------------------------------------------------------------------
# Phase-vocoder goldens: regression guard pinning BOTH the numpy path and
# the C++ port to the validated implementation (generate_golden.py explains
# why these are a drift guard, not an independent re-derivation).
# ---------------------------------------------------------------------------


VOCODER_RATES = (0.8, 1.07, 1.2, 2 ** (4 / 12), 2 ** (-4 / 12))


@pytest.fixture(scope="module")
def vocoder_golden():
    return np.load(os.path.join(GOLDEN, "vocoder_golden.npz"))


@pytest.mark.parametrize("rate", VOCODER_RATES)
def test_numpy_vocoder_matches_golden(vocoder_golden, rate):
    from zenker_audio_detection_tpu.data.augment import (
        _numpy_phase_vocoder_stretch)

    ref = vocoder_golden[f"rate_{rate:.6f}"]
    got = _numpy_phase_vocoder_stretch(vocoder_golden["input"], rate)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-10)


@pytest.mark.parametrize("rate", VOCODER_RATES)
def test_native_vocoder_matches_golden(vocoder_golden, rate):
    import subprocess
    from pathlib import Path

    from zenker_audio_detection_tpu.audio import native

    if not native.available():
        # build here rather than rely on test_native_audio's fixture —
        # that module collects AFTER this one, so on a clean checkout the
        # pin would silently skip and never guard the C++ vocoder
        repo = Path(__file__).resolve().parent.parent
        subprocess.run(["make", "-C", str(repo / "native")], check=True,
                       capture_output=True)
        native._TRIED = False
    got = native.phase_vocoder_stretch(vocoder_golden["input"], rate)
    if got is None:
        pytest.skip("native toolchain unavailable")
    ref = vocoder_golden[f"rate_{rate:.6f}"]
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-8)


# ---- full-cascade pins (cascade_golden.npz) -------------------------------
# Torch-free drift guard for the two-stage cascade (C12): weights live in the
# npz, so this fails on ANY numeric change in the fbank -> AST -> gate ->
# summary chain without consulting the live torch/transformers oracle
# (reference semantics: src/test_long_audio_windows_2stage.py:360-410).

CASCADE_CFG = dict(hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
                   intermediate_size=32, max_length=256, num_labels=2)


@pytest.fixture(scope="module")
def cascade_golden():
    return np.load(os.path.join(GOLDEN, "cascade_golden.npz"))


@pytest.fixture(scope="module")
def cascade_engine(cascade_golden):
    import jax.numpy as jnp

    from zenker_audio_detection_tpu.infer import cascade as C
    from zenker_audio_detection_tpu.models import ast as ast_mod
    from zenker_audio_detection_tpu.models.convert import _unflatten_tree

    g = cascade_golden
    cfg = ast_mod.ASTConfig(**CASCADE_CFG)
    p1 = _unflatten_tree({k[3:]: g[k] for k in g.files if k.startswith("s1.")})
    p2 = _unflatten_tree({k[3:]: g[k] for k in g.files if k.startswith("s2.")})
    s1 = C.StageSpec(p1, cfg, -1.15, 3.53, ("Idle", "Swallow"))
    s2 = C.StageSpec(p2, cfg, -0.9, 2.8, ("Healthy", "Zenker"))
    return C.TwoStageEngine(
        s1, s2, C.CascadeConfig(batch_size=16, dtype=jnp.float32))


@pytest.mark.parametrize("tag", ["a", "b"])
def test_cascade_window_probs_match_golden(cascade_golden, cascade_engine,
                                           tag):
    g = cascade_golden
    s1_probs, s2_probs = cascade_engine.window_probs(g[f"audio_{tag}"])
    np.testing.assert_allclose(s1_probs, g[f"s1_probs_{tag}"], atol=1e-5)
    np.testing.assert_allclose(s2_probs, g[f"s2_probs_{tag}"], atol=1e-5)


def _json_close(got, want, path="$"):
    """Pinned-JSON comparison: structure/strings/ints exact, floats to 1e-5
    (far below the pinned 0.023 minimum decision margin, so integer counts
    cannot legitimately differ while floats pass)."""
    if isinstance(want, dict):
        assert isinstance(got, dict) and set(got) == set(want), path
        for k in want:
            _json_close(got[k], want[k], f"{path}.{k}")
    elif isinstance(want, list):
        assert isinstance(got, list) and len(got) == len(want), path
        for i, (a, b) in enumerate(zip(got, want)):
            _json_close(a, b, f"{path}[{i}]")
    elif want is None or isinstance(want, (bool, str)):
        assert got == want, (path, got, want)
    elif isinstance(want, int) and isinstance(got, int):
        assert got == want, (path, got, want)
    else:
        assert abs(float(got) - float(want)) < 1e-5, (path, got, want)


def test_cascade_patient_json_matches_golden(cascade_golden, cascade_engine):
    import json

    g = cascade_golden
    want = json.loads(g["patient_json"].item().decode())
    got = json.loads(json.dumps(cascade_engine.run_patient(
        ["a.wav", "b.wav"], [g["audio_a"], g["audio_b"]],
        "s1_root", "s2_root"), sort_keys=True))
    _json_close(got, want)
