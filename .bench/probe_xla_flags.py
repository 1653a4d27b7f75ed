import sys, time
import numpy as np
import jax
import jax.numpy as jnp
import zenker_audio_detection_tpu
from zenker_audio_detection_tpu.models import ast as ast_mod

cfg = ast_mod.ASTConfig()
params = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
feats = jnp.asarray(np.random.default_rng(0).standard_normal(
    (128, cfg.max_length, cfg.num_mel_bins)).astype(np.float32))

@jax.jit
def fwd(p, f):
    return jnp.sum(ast_mod.forward(p, f, cfg, dtype=jnp.bfloat16))

_ = float(fwd(params, feats))
t0 = time.perf_counter()
for _ in range(10):
    out = fwd(params, feats)
_ = float(out)
import os
print(f"fwd b=128: {(time.perf_counter()-t0)/10*1e3:.1f} ms  flags={os.environ.get('EXTRA','')}")
