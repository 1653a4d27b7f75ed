import time
import numpy as np
import jax, jax.numpy as jnp
import zenker_audio_detection_tpu
from zenker_audio_detection_tpu.ops import attention as A

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
    print(f"{name}: steady {dt*1000:.1f} ms", flush=True)
    return ref

r0 = bench(A.reference_mha, "xla")
r1 = bench(A.mha, "pallas-v1 (per bh)")
r2 = bench(A.mha_batched_heads, "pallas-v2 (per b)")
print(f"sums: xla {r0:.1f} v1 {r1:.1f} v2 {r2:.1f}", flush=True)
