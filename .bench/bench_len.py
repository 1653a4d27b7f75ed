import time
import numpy as np
import jax.numpy as jnp
import zenker_audio_detection_tpu
from zenker_audio_detection_tpu.infer import cascade as C
from zenker_audio_detection_tpu.models import ast as ast_mod
import jax

cfg = ast_mod.ASTConfig()
s1 = C.StageSpec(ast_mod.init_params(jax.random.PRNGKey(0), cfg), cfg, -1.15, 3.53, ("Idle","Swallow"))
s2 = C.StageSpec(ast_mod.init_params(jax.random.PRNGKey(1), cfg), cfg, -1.15, 3.53, ("Healthy","Zenker"))
rng = np.random.default_rng(0)

for secs, bs in ((120, 128), (120, 256), (600, 256)):
    eng = C.TwoStageEngine(s1, s2, C.CascadeConfig(dtype=jnp.bfloat16, batch_size=bs))
    audio = (rng.standard_normal(16000*secs)*0.1).astype(np.float32)
    p1, _ = eng.window_probs(audio)  # warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter(); eng.window_probs(audio)
        times.append(time.perf_counter()-t0)
    dt = float(np.median(times))
    print(f"audio={secs}s bs={bs}: {len(p1)} windows in {dt:.2f}s -> {len(p1)/dt:.0f} w/s", flush=True)
