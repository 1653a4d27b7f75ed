"""Short-seq cascade chunk-size sweep."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
import zenker_audio_detection_tpu
from zenker_audio_detection_tpu.infer import cascade as C
from zenker_audio_detection_tpu.models import ast as ast_mod

cfg = ast_mod.ASTConfig(max_length=128)
params1 = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
params2 = ast_mod.init_params(jax.random.PRNGKey(1), cfg)
s1 = C.StageSpec(params1, cfg, -1.1509622, 3.5340312, ("Idle", "Swallow"))
s2 = C.StageSpec(params2, cfg, -1.1509622, 3.5340312, ("Healthy", "Zenker"))
rng = np.random.default_rng(0)
audio = np.clip(rng.standard_normal(int(16000 * 600)) * 0.1 * 32768.0,
                -32768, 32767).astype(np.int16)
for bs in (256, 512, 512, 1024):
    eng = C.TwoStageEngine(s1, s2, C.CascadeConfig(
        dtype=jnp.bfloat16, batch_size=bs, stage2_mode="all"))
    print(f"compile bs={bs}", file=sys.stderr, flush=True)
    p1, _ = eng.window_probs(audio)
    W = len(p1)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); eng.window_probs(audio)
        ts.append(time.perf_counter() - t0)
    print(f"bs={bs}: {W/np.median(ts):.1f} windows/s", flush=True)
