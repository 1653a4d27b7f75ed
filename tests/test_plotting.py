"""Waveform overlay plots (`infer/plotting.py`,
src/test_long_audio_windows_2stage.py:412-522): artifact names (base vs
cache-variant), GT-from-path extraction, and the degenerate title branches
— the executed-reference batch differentials run with --plot off, so this
is the direct pin on the plotting surface."""

import os

import numpy as np

from zenker_audio_detection_tpu.infer import plotting


def test_ground_truth_from_path():
    assert plotting.ground_truth_from_path("/x/Zenker/p1/a.wav") == "Zenker"
    assert plotting.ground_truth_from_path("/x/healthy/p2/a.wav") == "Healthy"
    assert plotting.ground_truth_from_path("/x/Idle/p3/a.wav") == "Unknown"


def _assets(rng, n_files=2):
    out = []
    for i in range(n_files):
        audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
        s1 = [0, 1, 1, 0, 1]  # 5 windows at 1 s / 0.5 s hop over 3 s
        s2 = [-1, 0, 1, -1, -1]  # healthy, zenker, swallow-only shading
        out.append((audio, s1, s2, f"File {i}", f"/data/Zenker/p7/f{i}.wav"))
    return out


def test_plot_two_stage_artifact_names(tmp_path, rng):
    """The batch drivers always invoke the reference's CACHE script, whose
    artifact stem differs from the base script's
    ({pid}_2stage_plot_cached.* vs {pid}_2stage_plot.*,
    src/test_long_audio_windows_2stage_cache.py:693-694 vs …_2stage.py:515-516)
    — both spellings must be produced as PNG+PDF pairs."""
    png = plotting.plot_two_stage(_assets(rng), 1.0, 0.5, str(tmp_path),
                                  patient_id="p7")
    assert png == str(tmp_path / "p7_2stage_plot.png")
    assert os.path.getsize(png) > 0
    assert os.path.getsize(png.replace(".png", ".pdf")) > 0

    cached = plotting.plot_two_stage(_assets(rng), 1.0, 0.5, str(tmp_path),
                                     patient_id="p7", cached_name=True)
    assert cached == str(tmp_path / "p7_2stage_plot_cached.png")
    assert os.path.getsize(cached) > 0
    assert os.path.getsize(cached.replace(".png", ".pdf")) > 0

    # no patient id: the direct CLI's two-file "pair" stem
    pair = plotting.plot_two_stage(_assets(rng, 1), 1.0, 0.5, str(tmp_path))
    assert pair == str(tmp_path / "pair_2stage_plot.png")


def test_plot_two_stage_degenerate_ratio_branches(tmp_path, rng):
    """Zero detected swallows with (impossible but guarded) zenker windows
    hits the 'Ratio: N/A' title branch; all-idle hits the empty-suffix
    branch — neither may divide by zero."""
    audio = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    weird = [(audio, [0, 0, 0], [1, -1, -1], "w", "/x/Healthy/p/w.wav")]
    idle = [(audio, [0, 0, 0], [-1, -1, -1], "i", "/x/Healthy/p/i.wav")]
    assert os.path.exists(plotting.plot_two_stage(
        weird, 1.0, 0.5, str(tmp_path), patient_id="weird"))
    assert os.path.exists(plotting.plot_two_stage(
        idle, 1.0, 0.5, str(tmp_path), patient_id="idle"))
