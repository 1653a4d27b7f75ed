"""StreamingCascade on the real chip: sustained throughput + emit latency.

Feeds 600 s of int16 PCM in 0.5 s chunks (one hop per feed — the
microphone-buffer arrival pattern) through full-size stage models and
times (a) sustained windows/s over the whole stream and (b) the latency of
each feed() call that dispatched a window batch (featurize + stage-1 +
gate + stage-2 + fetch).

Run: PYTHONPATH=/root/repo:/root/.axon_site python .bench/probe_streaming.py
(first run compiles the ring-gather stage program + frame blocks: minutes).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from zenker_audio_detection_tpu.infer import cascade as C
from zenker_audio_detection_tpu.infer.streaming import StreamingCascade
from zenker_audio_detection_tpu.models import ast as ast_mod

SECONDS = 600.0
CHUNK_SAMPLES = 8000  # one 0.5 s hop per feed

def make_engine(max_length=1024):
    cfg = ast_mod.ASTConfig(max_length=max_length)
    params1 = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
    params2 = ast_mod.init_params(jax.random.PRNGKey(1), cfg)
    s1 = C.StageSpec(params1, cfg, -1.1509622, 3.5340312, ("Idle", "Swallow"))
    s2 = C.StageSpec(params2, cfg, -0.9, 2.8, ("Healthy", "Zenker"))
    return C.TwoStageEngine(s1, s2, C.CascadeConfig(
        dtype=jnp.bfloat16, batch_size=256, stage2_mode="gated"))


rng = np.random.default_rng(0)
audio = np.clip(rng.standard_normal(int(16000 * SECONDS)) * 0.1 * 32768.0,
                -32768, 32767).astype(np.int16)


def run(chunk_windows, engine, tag="1024"):
    stream = StreamingCascade(engine, chunk_windows=chunk_windows)
    # cw=1 pays one full dispatch+sync round-trip per window; 120 s of
    # audio (239 batches) is plenty to get stable percentiles
    src = audio[: 16000 * 120] if chunk_windows == 1 else audio
    n = 0
    emit_lat = []
    t_start = time.perf_counter()
    for i in range(0, len(src), CHUNK_SAMPLES):
        t0 = time.perf_counter()
        out = stream.feed(src[i: i + CHUNK_SAMPLES])
        if out:
            emit_lat.append(time.perf_counter() - t0)
            n += len(out)
    n += len(stream.flush())
    total = time.perf_counter() - t_start
    lat = np.array(emit_lat) * 1e3
    print(f"max_length={tag} chunk_windows={chunk_windows:3d}: {n} windows "
          f"in {total:.2f} s = {n / total:6.1f} windows/s sustained; emit "
          f"latency p50={np.percentile(lat, 50):.0f} ms "
          f"p95={np.percentile(lat, 95):.0f} ms ({len(lat)} batches)",
          flush=True)


full = make_engine(1024)
for cw in (32, 8, 1):
    run(cw, full)         # first pass compiles
    run(cw, full)         # warm numbers
short = make_engine(128)  # short-sequence mode (ROOFLINE.md)
for cw in (8, 1):
    run(cw, short, "128")
    run(cw, short, "128")
