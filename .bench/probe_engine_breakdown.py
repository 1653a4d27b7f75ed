"""Where do the e2e cascade's milliseconds go? Times each engine phase on
600 s of audio: file-level fbank, stage-1 chunks, gating, stage-2 chunks."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
import zenker_audio_detection_tpu
from zenker_audio_detection_tpu.infer import cascade as C
from zenker_audio_detection_tpu.models import ast as ast_mod
from zenker_audio_detection_tpu.ops import fbank as F

cfg = ast_mod.ASTConfig()
params1 = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
params2 = ast_mod.init_params(jax.random.PRNGKey(1), cfg)
s1 = C.StageSpec(params1, cfg, -1.1509622, 3.5340312, ("Idle", "Swallow"))
s2 = C.StageSpec(params2, cfg, -1.1509622, 3.5340312, ("Healthy", "Zenker"))
eng = C.TwoStageEngine(s1, s2, C.CascadeConfig(dtype=jnp.bfloat16,
                                               batch_size=256,
                                               stage2_mode="all"))
rng = np.random.default_rng(0)
# int16 PCM like bench.py (half the host->device bytes, scaled on device)
audio = np.clip(rng.standard_normal(int(16000 * 600)) * 0.1 * 32768.0,
                -32768, 32767).astype(np.int16)

# warm
p1, p2 = eng.window_probs(audio)
W = len(p1)
print(f"windows={W}", flush=True)

def t(label, fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    print(f"{label}: {np.median(ts)*1e3:.1f} ms", flush=True)

starts = C.window_starts(len(audio), 1.0, 0.5)
needed = int(starts[-1]) + eng._win
n_true = F.num_frames(needed)
n_pad = C._next_pow2(n_true)
padded_len = (n_pad - 1) * F.HOP_LENGTH + F.FRAME_LENGTH

def fbank_only():
    buf = np.zeros(padded_len, audio.dtype)
    buf[:len(audio)] = audio
    fr = eng._frames_fn_cache[padded_len](jnp.asarray(buf))
    fr.block_until_ready(); _ = float(fr[0,0])

frames = eng._cached_or_computed_frames(audio, None, padded_len, n_true, n_pad)
stage_starts = (starts // F.HOP_LENGTH).astype(np.int32)

def stage1_only():
    _ = eng._run_stage(eng._stage_fn("frames", 1), eng._params1, frames,
                       stage_starts, W)

def full():
    eng.window_probs(audio)

t("fbank file-level", fbank_only)
t("stage-1 all chunks (incl fetch)", stage1_only)
t("full e2e (both stages)", full)
