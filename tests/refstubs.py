"""Shared stand-ins for the reference trainers'/evaluators' dependencies
that aren't in this image (torchcodec, evaluate, audiomentations), plus the
tiny-model HF-cache seeder. Used by the executed-reference differentials
(test_trainer_exec_parity.py, test_snippet_eval_exec_parity.py).

Design notes:
- torchcodec: `datasets.Audio` decode in datasets>=5 goes through
  torchcodec.decoders.AudioDecoder; ffmpeg decodes PCM16 as int16/32768
  float32 channels-first, which the stub reproduces exactly for the WAV
  fixtures. Resampling and non-path sources are poisoned. transformers
  gates on importlib.metadata, so the stub ships dist-info metadata.
- evaluate: the four metric modules the reference loads (accuracy /
  precision / recall / f1) delegate to sklearn with plain parameter
  passthrough; the stub is that delegation.
- audiomentations: identity transforms. The differentials isolate the
  TRAINER from the augmentation layer (diffed parameter-by-parameter in
  tests/test_augment.py) by comparing against our --no-augment mode.
"""

import os

TORCHCODEC_INIT = "from . import decoders, encoders\n"

TORCHCODEC_DECODERS = '''\
"""PCM16-exact torchcodec stand-in for datasets.Audio decode (WAV only)."""
import wave

import numpy as np
import torch


class _Metadata:
    def __init__(self, sample_rate, num_frames):
        self.sample_rate = sample_rate
        self.num_frames = num_frames
        self.path = None


class _Samples:
    def __init__(self, data, sample_rate):
        self.data = data
        self.sample_rate = sample_rate


class AudioDecoder:
    def __init__(self, source, *, stream_index=None, sample_rate=None,
                 num_channels=None):
        if not isinstance(source, str):
            raise AssertionError("stub AudioDecoder: path input only")
        with wave.open(source, "rb") as w:
            assert w.getsampwidth() == 2 and w.getnchannels() == 1
            sr = w.getframerate()
            pcm = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        if sample_rate is not None and int(sample_rate) != int(sr):
            raise AssertionError(
                f"stub AudioDecoder: resample {sr}->{sample_rate} unsupported")
        arr = (pcm.astype(np.float32) / 32768.0)[None, :]  # (C=1, N)
        self._samples = _Samples(torch.from_numpy(arr.copy()), int(sr))
        self.metadata = _Metadata(int(sr), arr.shape[1])

    def get_all_samples(self):
        return self._samples

    def get_samples_played_in_range(self, start, stop):
        return self._samples


class VideoDecoder:
    def __init__(self, *a, **k):
        raise AssertionError("stub VideoDecoder must not be constructed")
'''

TORCHCODEC_ENCODERS = '''\
"""Import-satisfying encoder stand-in; fixtures pass paths, never encode."""


class AudioEncoder:
    def __init__(self, *a, **k):
        raise AssertionError("stub AudioEncoder must not be constructed")
'''

EVALUATE_STUB = '''\
"""HF-evaluate stand-in: the four metric modules the reference loads all
delegate to sklearn with plain parameter passthrough (accuracy takes no
average kwarg; precision/recall/f1 forward `average`)."""
import numpy as np
import sklearn.metrics as skm

_FNS = {
    "accuracy": lambda p, r, **k: {"accuracy": float(skm.accuracy_score(r, p))},
    "precision": lambda p, r, **k: {"precision": float(
        skm.precision_score(r, p, **k))},
    "recall": lambda p, r, **k: {"recall": float(skm.recall_score(r, p, **k))},
    "f1": lambda p, r, **k: {"f1": float(skm.f1_score(r, p, **k))},
}


class _Metric:
    def __init__(self, name):
        self._name = name

    def compute(self, *, predictions, references, **kwargs):
        return _FNS[self._name](np.asarray(predictions),
                                np.asarray(references), **kwargs)


def load(name, *a, **k):
    if name not in _FNS:
        raise AssertionError(f"evaluate stub: unsupported metric {name!r}")
    return _Metric(name)
'''

AUDIOMENTATIONS_STUB = '''\
"""Identity audiomentations stand-in: every transform accepts the
reference's kwargs and Compose applies nothing, matching the --no-augment
mode of our trainer (the augmentation layer itself is diffed separately)."""


class _Identity:
    def __init__(self, *a, **k):
        pass


class AddGaussianSNR(_Identity):
    pass


class Gain(_Identity):
    pass


class GainTransition(_Identity):
    pass


class ClippingDistortion(_Identity):
    pass


class TimeStretch(_Identity):
    pass


class PitchShift(_Identity):
    pass


class TimeMask(_Identity):
    pass


class Compose:
    def __init__(self, transforms, p=1.0, shuffle=False):
        self.transforms = transforms

    def __call__(self, samples, sample_rate=None):
        return samples
'''


def write_stub_tree(stub_dir) -> str:
    """Materialize the subprocess stub packages under `stub_dir` (str/Path)
    for PYTHONPATH injection. Returns the dir as str."""
    stub_dir = str(stub_dir)
    tc = os.path.join(stub_dir, "torchcodec")
    os.makedirs(tc, exist_ok=True)
    with open(os.path.join(tc, "__init__.py"), "w") as f:
        f.write(TORCHCODEC_INIT)
    with open(os.path.join(tc, "decoders.py"), "w") as f:
        f.write(TORCHCODEC_DECODERS)
    with open(os.path.join(tc, "encoders.py"), "w") as f:
        f.write(TORCHCODEC_ENCODERS)
    # transformers gates torchcodec use on importlib.metadata.version()
    di = os.path.join(stub_dir, "torchcodec-0.8.0.dist-info")
    os.makedirs(di, exist_ok=True)
    with open(os.path.join(di, "METADATA"), "w") as f:
        f.write("Metadata-Version: 2.1\nName: torchcodec\nVersion: 0.8.0\n")
    with open(os.path.join(di, "RECORD"), "w") as f:
        f.write("")
    with open(os.path.join(di, "top_level.txt"), "w") as f:
        f.write("torchcodec\n")
    with open(os.path.join(stub_dir, "evaluate.py"), "w") as f:
        f.write(EVALUATE_STUB)
    with open(os.path.join(stub_dir, "audiomentations.py"), "w") as f:
        f.write(AUDIOMENTATIONS_STUB)
    return stub_dir


def install_inprocess_stubs(monkeypatch):
    """sys.modules stand-ins (evaluate + audiomentations) sufficient to
    exec a reference trainer's MODULE BODY in-process (from_pretrained and
    dataset decode only happen inside train_fold, which in-process tests
    never call)."""
    import sys
    import types

    ev = types.ModuleType("evaluate")
    ns: dict = {}
    exec(compile(EVALUATE_STUB, "evaluate-stub", "exec"), ns)
    ev.load = ns["load"]
    am = types.ModuleType("audiomentations")
    ns = {}
    exec(compile(AUDIOMENTATIONS_STUB, "audiomentations-stub", "exec"), ns)
    for name in ("Compose", "AddGaussianSNR", "Gain", "GainTransition",
                 "ClippingDistortion", "TimeStretch", "PitchShift",
                 "TimeMask"):
        setattr(am, name, ns[name])
    monkeypatch.setitem(sys.modules, "evaluate", ev)
    monkeypatch.setitem(sys.modules, "audiomentations", am)


def exec_ref_module(path) -> dict:
    """Execute a reference script's module body (NOT its __main__ guard)
    and return its globals dict."""
    path = str(path)
    g = {"__file__": path, "__name__": "ref_module"}
    with open(path) as f:
        src = f.read()
    exec(compile(src, path, "exec"), g)
    return g


def seed_tiny_hf_cache(hf_home, *, hidden=32, layers=2, heads=2,
                       seed=0) -> str:
    """Seed an offline HF hub cache with a tiny random-init AST under the
    MIT checkpoint name the reference scripts hardcode. Returns the
    snapshot dir (also usable directly as --pretrained-model-dir)."""
    import torch
    from transformers import (ASTConfig, ASTFeatureExtractor,
                              ASTForAudioClassification)

    snap = os.path.join(
        str(hf_home), "hub",
        "models--MIT--ast-finetuned-audioset-10-10-0.4593",
        "snapshots", "local")
    os.makedirs(snap, exist_ok=True)
    cfg = ASTConfig(hidden_size=hidden, num_hidden_layers=layers,
                    num_attention_heads=heads, intermediate_size=2 * hidden,
                    patch_size=16, frequency_stride=10, time_stride=10,
                    max_length=1024, num_mel_bins=128)
    torch.manual_seed(seed)
    ASTForAudioClassification(cfg).save_pretrained(snap)
    ASTFeatureExtractor().save_pretrained(snap)
    refs = os.path.join(os.path.dirname(os.path.dirname(snap)), "refs")
    os.makedirs(refs, exist_ok=True)
    with open(os.path.join(refs, "main"), "w") as f:
        f.write("local")
    return snap
