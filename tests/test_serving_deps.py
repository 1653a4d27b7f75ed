"""Deployment contract: the SERVING path has no torch/transformers
dependency. torch appears only in parity TESTS and in bench.py's CPU
reference — a production TPU serving image needs just jax + numpy (+ the
optional native loader)."""

import subprocess
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)

_PROBE = r"""
import sys

# make any torch/transformers import explode loudly (find_spec — the
# legacy find_module API is ignored by the 3.12 import system)
class _Banned:
    def find_spec(self, name, path=None, target=None):
        root = name.split(".")[0]
        if root in ("torch", "transformers", "datasets", "accelerate"):
            raise ImportError(f"BANNED import in serving path: {name}")
        return None

sys.meta_path.insert(0, _Banned())

# self-check: the hook must actually fire
try:
    import torch  # noqa: F401
    raise SystemExit("ban hook is dead — test would be vacuous")
except ImportError:
    pass

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from zenker_audio_detection_tpu.infer import cascade as C
from zenker_audio_detection_tpu.infer import discovery, cache  # noqa: F401
from zenker_audio_detection_tpu.models import ast as ast_mod, convert
from zenker_audio_detection_tpu.audio import io as aio  # noqa: F401
from zenker_audio_detection_tpu.analysis import aggregate  # noqa: F401

cfg = ast_mod.ASTConfig(hidden_size=16, num_hidden_layers=1,
                        num_attention_heads=2, intermediate_size=32,
                        num_labels=2)
s1 = C.StageSpec(ast_mod.init_params(jax.random.PRNGKey(0), cfg), cfg,
                 -1.15, 3.53, ("Idle", "Swallow"))
s2 = C.StageSpec(ast_mod.init_params(jax.random.PRNGKey(1), cfg), cfg,
                 -0.9, 2.8, ("Healthy", "Zenker"))
eng = C.TwoStageEngine(s1, s2, C.CascadeConfig(batch_size=8))
audio = (np.random.default_rng(0).standard_normal(16000 * 2) * 0.1
         ).astype(np.float32)
res = eng.infer_file(audio, "x.wav")
assert res["num_windows"] == 3
print("SERVING_TORCH_FREE_OK")
"""


def test_serving_path_imports_no_torch():
    r = subprocess.run([sys.executable, "-c", _PROBE], capture_output=True,
                       text=True, cwd=REPO, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "SERVING_TORCH_FREE_OK" in r.stdout
