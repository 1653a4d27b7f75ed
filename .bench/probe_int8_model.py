"""Full-size AST forward: int8-quantized encoder GEMMs vs bf16, b=128.

Params are committed to the device ONCE (jnp.asarray) — numpy jit args are
re-transferred per call over the 40 MB/s tunnel, which was the 3.9 s red
herring in the first version of this probe."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
import zenker_audio_detection_tpu  # compile cache
from zenker_audio_detection_tpu.models import ast as ast_mod

cfg = ast_mod.ASTConfig()
params = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
qparams = jax.tree.map(jnp.asarray,
                       ast_mod.quantize_params(jax.tree.map(np.asarray, params)))
feats = jnp.asarray(np.random.default_rng(0).standard_normal(
    (128, cfg.max_length, cfg.num_mel_bins)).astype(np.float32))

@jax.jit
def fwd(p, f):
    return jnp.sum(ast_mod.forward(p, f, cfg, dtype=jnp.bfloat16))

def timeit(name, p, n=10):
    print(f"compile {name}", file=sys.stderr, flush=True)
    _ = float(fwd(p, feats))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(p, feats)
    _ = float(out)  # one sync: amortize tunnel round-trip like bench.py
    return (time.perf_counter() - t0) / n

tb = timeit("bf16", params)
t8 = timeit("int8", qparams)
print(f"bf16 fwd b=128: {tb*1e3:.1f} ms")
print(f"int8 fwd b=128: {t8*1e3:.1f} ms  speedup {tb/t8:.2f}x")
