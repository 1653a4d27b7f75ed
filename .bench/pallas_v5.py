import time
import numpy as np
import jax, jax.numpy as jnp
import zenker_audio_detection_tpu
from zenker_audio_detection_tpu.ops import attention as A

B, S, NH, D = 128, 1214, 12, 64
rng = np.random.default_rng(0)
mk = lambda: jax.device_put(rng.standard_normal((B, S, NH*D)).astype(np.float32)).astype(jnp.bfloat16)
q, k, v = mk(), mk(), mk()
s = jax.jit(lambda q,k,v: jnp.sum(A.mha_packed(q,k,v,num_heads=NH).astype(jnp.float32)))
t0=time.time(); print(f"packed: sum={float(s(q,k,v)):.1f} compile {time.time()-t0:.1f}s", flush=True)
t0=time.time(); n=5
for _ in range(n): out = s(q,k,v)
float(out); print(f"packed isolated steady {(time.time()-t0)/n*1000:.1f} ms", flush=True)
