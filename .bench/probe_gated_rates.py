"""Profile gated-mode Stage-2 dispatch at controlled gate pass-rates.

Closes the round-2 open question (CLAUDE.md queue): production serving runs
stage2_mode="gated" (the reference's own semantics — Stage 2 only on windows
passing the Stage-1 gate, src/test_long_audio_windows_2stage_cache.py:463-478)
but its throughput was only ever measured with random weights, whose gate
pass-rate on noise audio is uncontrolled. The study's real pass-rate is ~34 %
(SURVEY §6: 1432 of 4251 test windows are true swallows).

Method: with random weights we can't pick the gate rate directly, so we
shape it — measure the stage-1 p_swallow distribution once, shift the head's
class-1 logit bias so ~all windows clear the argmax half of the gate
(p_swallow >= 0.5), then choose stage1_threshold as the (1 - rate) quantile
of the shifted distribution. The bias shift is exact in the model (the head
bias is added in f32, models/ast.py:374), so the realized gate counts match
the analytic targets up to bf16 noise; the probe reports realized counts.

Run: PYTHONPATH=/root/repo:/root/.axon_site python .bench/probe_gated_rates.py
(one TPU process at a time; first run may compile a 128-window bucket).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from zenker_audio_detection_tpu.infer import cascade as C
from zenker_audio_detection_tpu.models import ast as ast_mod

SECONDS = 600.0
REPEATS = 3

cfg = ast_mod.ASTConfig()
params1 = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
params2 = ast_mod.init_params(jax.random.PRNGKey(1), cfg)

rng = np.random.default_rng(0)
audio = np.clip(rng.standard_normal(int(16000 * SECONDS)) * 0.1 * 32768.0,
                -32768, 32767).astype(np.int16)


def make_engine(p1, thr, mode):
    s1 = C.StageSpec(p1, cfg, -1.1509622, 3.5340312, ("Idle", "Swallow"))
    s2 = C.StageSpec(params2, cfg, -1.1509622, 3.5340312, ("Healthy", "Zenker"))
    return C.TwoStageEngine(s1, s2, C.CascadeConfig(
        dtype=jnp.bfloat16, batch_size=256, stage1_threshold=thr,
        stage2_mode=mode))


def timed(engine):
    p1, p2 = engine.window_probs(audio)  # warmup/compile
    n = len(p1)
    gated = int((np.abs(p2).sum(axis=1) > 0).sum())
    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        engine.window_probs(audio)
        times.append(time.perf_counter() - t0)
    return n / float(np.median(times)), n, gated


# ---- phase 1: stage-1 p_swallow distribution (thr=2.0 -> no stage-2 work)
probe = make_engine(params1, 2.0, "gated")
p1_probs, _ = probe.window_probs(audio)
p = np.clip(p1_probs[:, 1], 1e-9, 1 - 1e-9)
d = np.log((1 - p) / p)  # logit margin l0 - l1
delta = float(np.quantile(d, 0.995))  # shift so 99.5 % clear argmax==1
p_shift = 1.0 / (1.0 + np.exp(d - delta))
print(f"# p_swallow raw: median={np.median(p):.4f} "
      f"frac>=0.5={float((p >= .5).mean()):.3f}; bias delta={delta:.4f}",
      flush=True)

patched = dict(params1)
patched["head"] = {
    "ln": params1["head"]["ln"],
    "dense": {
        "kernel": params1["head"]["dense"]["kernel"],
        "bias": params1["head"]["dense"]["bias"] + jnp.asarray([0.0, delta]),
    },
}

# ---- phase 2: identical-work control ("all") with the patched model
wps_all, n_windows, _ = timed(make_engine(patched, 0.5, "all"))
print(f"# control stage2_mode=all: {wps_all:.1f} windows/s "
      f"({n_windows} windows)", flush=True)

# ---- phase 3: gated mode across target pass-rates
print(f"{'target':>7} {'thr':>7} {'realized':>9} {'w/s':>7} {'vs all':>7}")
for rate in (0.995, 0.70, 0.34, 0.10):
    thr = max(0.5, float(np.quantile(p_shift, 1.0 - rate)))
    wps, n, gated = timed(make_engine(patched, thr, "gated"))
    print(f"{rate:7.3f} {thr:7.4f} {gated / n:9.3f} {wps:7.1f} "
          f"{wps / wps_all:6.2f}x", flush=True)
