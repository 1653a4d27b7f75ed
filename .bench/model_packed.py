import time
import numpy as np
import jax, jax.numpy as jnp
import zenker_audio_detection_tpu
from zenker_audio_detection_tpu.models import ast as ast_mod

cfg = ast_mod.ASTConfig()
params = jax.device_put(ast_mod.init_params(jax.random.PRNGKey(0), cfg))
rng = np.random.default_rng(0)
feats = jax.device_put(rng.standard_normal((128, 1024, 128)).astype(np.float32))
for impl in ("xla", "pallas"):
    fwd = jax.jit(lambda p, x, impl=impl: jnp.sum(
        ast_mod.forward(p, x, cfg, dtype=jnp.bfloat16, attention_impl=impl)))
    t0=time.time(); r=float(fwd(params, feats)); print(f"model {impl}: compile {time.time()-t0:.1f}s sum={r:.2f}", flush=True)
    t0=time.time(); n=6
    for _ in range(n): out = fwd(params, feats)
    float(out); dt=(time.time()-t0)/n
    print(f"model {impl}: steady {dt*1000:.0f} ms -> {128/dt:.0f} windows/s/stage", flush=True)
