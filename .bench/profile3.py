import time
import numpy as np
import jax, jax.numpy as jnp
import zenker_audio_detection_tpu  # enables persistent compile cache
from zenker_audio_detection_tpu.infer import cascade as C
from zenker_audio_detection_tpu.models import ast as ast_mod

cfg = ast_mod.ASTConfig()
s1 = C.StageSpec(ast_mod.init_params(jax.random.PRNGKey(0), cfg), cfg, -1.15, 3.53, ("Idle","Swallow"))
s2 = C.StageSpec(ast_mod.init_params(jax.random.PRNGKey(1), cfg), cfg, -1.15, 3.53, ("Healthy","Zenker"))
eng = C.TwoStageEngine(s1, s2, C.CascadeConfig(dtype=jnp.bfloat16))
rng = np.random.default_rng(0)
audio = (rng.standard_normal(16000*120)*0.1).astype(np.float32)

t0=time.time(); p1,_ = eng.window_probs(audio); print(f"first call (compile): {time.time()-t0:.1f}s, {len(p1)} windows", flush=True)
for r in range(3):
    t0=time.time(); eng.window_probs(audio); dt=time.time()-t0
    print(f"steady run {r}: {dt:.2f}s -> {len(p1)/dt:.0f} windows/s", flush=True)

key = [k for k in eng._chunk_fn_cache if isinstance(k, int)][0]
fn = eng._chunk_fn_cache[key]
frames = eng._cached_or_computed_frames(audio, None, (key-1)*160+400, key, key)
starts = jnp.arange(128, dtype=jnp.int32)*50
out = fn(eng._params1, eng._params2, frames, starts); _ = np.asarray(out[0]).ravel()[0]
t0=time.time()
N=5
for _ in range(N):
    out = fn(eng._params1, eng._params2, frames, starts)
_ = np.asarray(out[0]).ravel()[0]; _ = np.asarray(out[1]).ravel()[0]
dt=(time.time()-t0)/N
print(f"chunk fn (128 win, both stages): {dt*1000:.0f} ms -> {128/dt:.0f} windows/s", flush=True)
