"""Executed-reference differentials for the raw-dataset organizers.

Runs the ACTUAL reference scripts (utils/PrepareDataset.py and
utils/PrepareDatasetLongAudio.py) via exec with their config module and
librosa/soundfile dependencies stubbed (librosa.load at sr=None on PCM16 is
the fixed int16/32768 conversion; the sf.write PCM16 re-encode is compared
with 1-LSB tolerance since the float->int16 rounding is libsndfile's), then
diffs our organizers' output trees: directory structure, specimen_id
splitting, the '1sec'/'long' subfolder selection, .WAV/.wav filtering,
extension rewriting, Idle skipping, and the per-file audio content.
"""

import os
import sys
import types
import wave
from pathlib import Path

import numpy as np
import pytest

REF_UTILS = Path("/root/reference/utils")
pytestmark = pytest.mark.skipif(not REF_UTILS.exists(),
                                reason="reference not mounted")


def _stub_modules(monkeypatch, raw_dir, out_dir):
    def load(path, sr=None, mono=True):
        assert sr is None and mono
        with wave.open(str(path), "rb") as w:
            assert w.getsampwidth() == 2 and w.getnchannels() == 1
            rate = w.getframerate()
            pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        return pcm.astype(np.float32) / 32768.0, rate

    def write(path, data, sr):
        # libsndfile float->PCM16; the exact rounding is libsndfile's, so
        # the test compares content at 1-LSB tolerance
        pcm = np.clip(np.asarray(data) * 32768.0, -32768, 32767)
        with wave.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(int(sr))
            w.writeframes(pcm.astype("<i2").tobytes())

    lib = types.ModuleType("librosa")
    lib.load = load
    sf = types.ModuleType("soundfile")
    sf.write = write
    cfg = types.ModuleType("config")
    cfg.get_raw_data_dir = lambda: str(raw_dir)
    cfg.get_short_audio_dir = lambda: str(out_dir)
    cfg.get_long_audio_dir = lambda: str(out_dir)
    for name, mod in (("librosa", lib), ("soundfile", sf), ("config", cfg)):
        monkeypatch.setitem(sys.modules, name, mod)


def _exec_ref(script):
    path = REF_UTILS / script
    exec(compile(path.read_text(), str(path), "exec"),
         {"__file__": str(path), "__name__": "__main__"})


def _make_raw_tree(root, rng):
    """Raw SwallowSet-shaped tree with the quirks the organizers own:
    specimen dirs with _suffixes, 1sec/long/other subfolders, .WAV upper
    extensions, csv distractors, and a specimen with no long folder."""
    from zenker_audio_detection_tpu.audio import io as aio

    def wav(p, n, sr=16000):
        p.parent.mkdir(parents=True, exist_ok=True)
        aio.write_wav(str(p), (rng.standard_normal(n) * 0.1
                               ).astype(np.float32), sr)

    layout = {
        "Healthy/H01_sessionA/1sec_clips": ["a.wav", "b.WAV"],
        "Healthy/H01_sessionA/long_rec": ["whole.wav"],
        "Healthy/H02_x/clips_1sec": ["c.wav", "notes.csv"],
        "Healthy/H02_x/LONG": ["rec.WAV"],
        "Zenker/Z01_y/take_1sec": ["d.WAV"],
        "Zenker/Z01_y/the_long_one": ["e.wav"],
        "Zenker/Z02_noLong/z_1sec": ["f.wav"],  # no long folder at all
        "Idle/I01_z/idle_1sec": ["g.wav"],      # long organizer skips Idle
    }
    for rel, files in layout.items():
        for f in files:
            p = root / rel / f
            if f.endswith(".csv"):
                p.parent.mkdir(parents=True, exist_ok=True)
                p.write_text("x,y\n")
            else:
                wav(p, int(rng.integers(4000, 20000)),
                    sr=int(rng.choice([16000, 44100])))
    return root


def _tree_with_audio(root):
    out = {}
    for p in sorted(Path(root).rglob("*.wav")):
        with wave.open(str(p), "rb") as w:
            sr = w.getframerate()
            pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        out[str(p.relative_to(root))] = (sr, pcm)
    return out


@pytest.mark.parametrize("script,ours_fn", [
    ("PrepareDataset.py", "organize_short_clips"),
    ("PrepareDatasetLongAudio.py", "organize_long_audio"),
])
def test_organizers_parity_vs_executed_reference(tmp_path, monkeypatch,
                                                 capsys, script, ours_fn):
    from zenker_audio_detection_tpu.data import prepare

    raw = _make_raw_tree(tmp_path / "raw", np.random.default_rng(20260818))
    ref_out = tmp_path / "refout"
    _stub_modules(monkeypatch, raw, ref_out)
    _exec_ref(script)
    capsys.readouterr()

    our_out = tmp_path / "ourout"
    getattr(prepare, ours_fn)(str(raw), str(our_out))
    capsys.readouterr()

    ref_tree = _tree_with_audio(ref_out)
    our_tree = _tree_with_audio(our_out)
    assert sorted(our_tree) == sorted(ref_tree)
    assert ref_tree  # non-vacuous
    if script == "PrepareDatasetLongAudio.py":
        assert not any(r.startswith("Idle") for r in ref_tree)
        assert not any("Z02" in r for r in ref_tree)  # no long folder
    for rel, (sr, pcm) in ref_tree.items():
        our_sr, our_pcm = our_tree[rel]
        assert our_sr == sr, rel
        assert our_pcm.shape == pcm.shape, rel
        # decode->re-encode roundtrip: rounding may differ by 1 LSB
        np.testing.assert_allclose(our_pcm.astype(np.int32),
                                   pcm.astype(np.int32), atol=1,
                                   err_msg=rel)


def _exec_ref_argv(script, argv, monkeypatch):
    path = REF_UTILS / script
    monkeypatch.setattr(sys, "argv", [script, *argv])
    _exec_ref(script)


@pytest.mark.parametrize("with_real_cms", [True, False])
def test_cm_plotter_parity_vs_executed_reference(tmp_path, monkeypatch,
                                                 capsys, with_real_cms):
    """cli.plot_confusion_matrices vs the executed reference plotter:
    derived-stats printout (accuracy/recall/precision from the CMs),
    artifact names, and the paper-CM fallback path must match."""
    import matplotlib
    matplotlib.use("Agg")
    from zenker_audio_detection_tpu.cli import plot_confusion_matrices

    def make_root(root):
        root.mkdir(parents=True)
        if with_real_cms:
            r = np.random.default_rng(7)
            for stage in ("stage1", "stage2"):
                d = (root / f"ast_classifier_{stage}"
                     / "cv_aggregate_evaluation")
                d.mkdir(parents=True)
                np.save(d / "confusion_matrix.npy",
                        r.integers(5, 900, size=(2, 2)))
        return root

    ref_root = make_root(tmp_path / "refroot")
    _exec_ref_argv("plot_confusion_matrices.py",
                   ["--model-root", str(ref_root)], monkeypatch)
    ref_out = capsys.readouterr().out

    our_root = make_root(tmp_path / "ourroot")
    plot_confusion_matrices.main(["--model-root", str(our_root)])
    our_out = capsys.readouterr().out

    def derived_stats(text):
        # print FORMATTING differs (ours is a compact line per stage); the
        # derived VALUES — accuracy/recall/precision percentages and the
        # total sample counts, in print order — must match exactly
        import re
        return (re.findall(r"\d+\.\d+%", text),
                re.findall(r"[Tt]otal[^0-9\n]*?(\d+)", text))

    assert derived_stats(our_out) == derived_stats(ref_out)
    assert len(derived_stats(ref_out)[0]) >= 6  # both stages' acc/rec/prec
    if not with_real_cms:
        # both sides announce the paper-CM fallback (wording differs only
        # in stage-name casing: "Stage 1" vs "stage1")
        assert "Using hardcoded Stage 1 confusion matrix" in ref_out
        assert "using hardcoded stage" in our_out.lower().replace(" 1", "1")
    for name in ("stage1_confusion_matrix_clean.png",
                 "stage1_confusion_matrix_clean.pdf",
                 "stage2_confusion_matrix_clean.png",
                 "stage2_confusion_matrix_clean.pdf"):
        assert (ref_root / "results" / name).exists(), name
        assert (our_root / "results" / name).exists(), name
