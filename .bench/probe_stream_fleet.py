"""Streaming FLEET on one chip: N concurrent StreamingCascade streams
(VERDICT r4 item #5 — the fleet recipe existed only as a CPU smoke test;
this measures the interference cost of time-multiplexing real streams on
one v5e).

N client threads share ONE fold engine (the production serving story: one
model, many live sessions; params live in HBM once) and each runs its own
StreamingCascade in zero-buffering mode (chunk_windows=1 — the 67 w/s /
147 ms single-stream baseline config, .bench/probe_streaming.py), feeding
0.5 s int16 hops from its own audio. Device compute time-multiplexes; the
question is how per-stream sustained w/s and p50/p95 emit latency degrade
with N.

Run: PYTHONPATH=/root/repo:/root/.axon_site python .bench/probe_stream_fleet.py
(programs are shared across streams — one warmup compile serves the fleet).
"""

import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax
import jax.numpy as jnp

from zenker_audio_detection_tpu.infer import cascade as C
from zenker_audio_detection_tpu.infer.streaming import StreamingCascade
from zenker_audio_detection_tpu.models import ast as ast_mod

SECONDS = 120.0          # per stream; 239 emit batches at cw=1
CHUNK_SAMPLES = 8000     # one 0.5 s hop per feed


def make_engine():
    cfg = ast_mod.ASTConfig()
    params1 = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
    params2 = ast_mod.init_params(jax.random.PRNGKey(1), cfg)
    s1 = C.StageSpec(params1, cfg, -1.1509622, 3.5340312,
                     ("Idle", "Swallow"))
    s2 = C.StageSpec(params2, cfg, -0.9, 2.8, ("Healthy", "Zenker"))
    return C.TwoStageEngine(s1, s2, C.CascadeConfig(
        dtype=jnp.bfloat16, batch_size=256, stage2_mode="gated"))


def stream_worker(engine, audio, cw):
    stream = StreamingCascade(engine, chunk_windows=cw)
    n = 0
    emit_lat = []
    t_start = time.perf_counter()
    for i in range(0, len(audio), CHUNK_SAMPLES):
        t0 = time.perf_counter()
        out = stream.feed(audio[i: i + CHUNK_SAMPLES])
        if out:
            emit_lat.append(time.perf_counter() - t0)
            n += len(out)
    n += len(stream.flush())
    return n, time.perf_counter() - t_start, np.array(emit_lat) * 1e3


def main():
    import sys

    cws = [int(a) for a in sys.argv[1:]] or [1]
    engine = make_engine()
    rng = np.random.default_rng(0)
    audios = [np.clip(rng.standard_normal(int(16000 * SECONDS))
                      * 0.1 * 32768.0, -32768, 32767).astype(np.int16)
              for _ in range(8)]

    for cw in cws:
        # warmup / compile once; programs are shared by every stream
        StreamingCascade(engine, chunk_windows=cw).feed(
            audios[0][:16000 * 20])
        print(f"chunk_windows={cw}", flush=True)
        print(f"{'N':>2} {'w/s per stream':>15} {'aggregate w/s':>14} "
              f"{'p50 ms':>7} {'p95 ms':>7}", flush=True)
        for n_streams in (1, 2, 4, 8):
            with ThreadPoolExecutor(max_workers=n_streams) as ex:
                t0 = time.perf_counter()
                results = list(ex.map(
                    lambda a: stream_worker(engine, a, cw),
                    audios[:n_streams]))
                wall = time.perf_counter() - t0
            per_stream = [n / t for n, t, _ in results]
            total_windows = sum(n for n, _, _ in results)
            lat = np.concatenate([l for _, _, l in results])
            print(f"{n_streams:2d} {np.mean(per_stream):15.1f} "
                  f"{total_windows / wall:14.1f} "
                  f"{np.percentile(lat, 50):7.0f} "
                  f"{np.percentile(lat, 95):7.0f}", flush=True)


if __name__ == "__main__":
    main()
