import time
import numpy as np
import jax, jax.numpy as jnp
import zenker_audio_detection_tpu
from zenker_audio_detection_tpu.ops import attention as A
from zenker_audio_detection_tpu.models import ast as ast_mod

B, S, NH, D = 128, 1214, 12, 64
rng = np.random.default_rng(0)
mk = lambda: jax.device_put(rng.standard_normal((B, S, NH, D)).astype(np.float32)).astype(jnp.bfloat16)
q, k, v = mk(), mk(), mk()

def bench(fn, name, n=5):
    s = jax.jit(lambda q,k,v: jnp.sum(fn(q,k,v).astype(jnp.float32)))
    t0=time.time(); ref=float(s(q,k,v)); print(f"{name}: compile {time.time()-t0:.1f}s", flush=True)
    t0=time.time()
    for _ in range(n): out = s(q,k,v)
    float(out); dt=(time.time()-t0)/n
    print(f"{name}: steady {dt*1000:.1f} ms (sum {ref:.1f})", flush=True)
    return dt

for bq in (128, 256, 640):
    bench(lambda q,k,v,bq=bq: A.mha_qblock(q,k,v,block_q=bq), f"qblock bq={bq}")

# full model with the best variant wired as 'pallas'
A.mha = A.mha_qblock  # monkeypatch for this process
cfg = ast_mod.ASTConfig()
params = jax.device_put(ast_mod.init_params(jax.random.PRNGKey(0), cfg))
feats = jax.device_put(rng.standard_normal((128, 1024, 128)).astype(np.float32))
for impl in ("xla", "pallas"):
    fwd = jax.jit(lambda p, x, impl=impl: jnp.sum(
        ast_mod.forward(p, x, cfg, dtype=jnp.bfloat16, attention_impl=impl)))
    t0=time.time(); float(fwd(params, feats)); print(f"model {impl}: compile {time.time()-t0:.1f}s", flush=True)
    t0=time.time(); n=5
    for _ in range(n): out = fwd(params, feats)
    float(out); dt=(time.time()-t0)/n
    print(f"model {impl}: steady {dt*1000:.0f} ms -> {128/dt:.0f} windows/s/stage", flush=True)
