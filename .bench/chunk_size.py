import time
import numpy as np
import jax, jax.numpy as jnp
import zenker_audio_detection_tpu
from zenker_audio_detection_tpu.models import ast as ast_mod

cfg = ast_mod.ASTConfig()
params = jax.device_put(ast_mod.init_params(jax.random.PRNGKey(0), cfg))
rng = np.random.default_rng(0)

for B in (128, 256, 512):
    feats = jax.device_put(rng.standard_normal((B, 1024, 128)).astype(np.float32))
    fwd = jax.jit(lambda p, x: jnp.sum(ast_mod.forward(p, x, cfg, dtype=jnp.bfloat16)))
    t0 = time.time(); float(fwd(params, feats))
    print(f"b={B}: compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time(); n=5
    for _ in range(n): out = fwd(params, feats)
    float(out); dt=(time.time()-t0)/n
    print(f"b={B}: steady {dt*1000:.0f} ms -> {B/dt:.0f} windows/s/stage", flush=True)
