import time
import numpy as np
import jax, jax.numpy as jnp
import zenker_audio_detection_tpu
from zenker_audio_detection_tpu.models import ast as ast_mod

cfg = ast_mod.ASTConfig()
params = jax.device_put(ast_mod.init_params(jax.random.PRNGKey(0), cfg))
rng = np.random.default_rng(0)
feats = jax.device_put(rng.standard_normal((128, 1024, 128)).astype(np.float32))

def run(impl, n=5):
    fwd = jax.jit(lambda p, x: jnp.sum(
        ast_mod.forward(p, x, cfg, dtype=jnp.bfloat16, attention_impl=impl)))
    t0 = time.time(); ref = float(fwd(params, feats))
    print(f"{impl}: compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(n): out = fwd(params, feats)
    out = float(out)
    dt = (time.time()-t0)/n
    print(f"{impl}: steady {dt*1000:.0f} ms/fwd (b=128) -> {128/dt:.0f} windows/s/stage", flush=True)
    return out

a = run("xla")
b = run("pallas")
print(f"logit-sum diff: {abs(a-b):.4f} (bf16 tolerance ~1.0)", flush=True)
