"""Short-sequence mode on the real chip: full-size ViT-B at max_length=128
(146 tokens) — forward b=128 and the e2e two-stage cascade."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
import zenker_audio_detection_tpu
from zenker_audio_detection_tpu.infer import cascade as C
from zenker_audio_detection_tpu.models import ast as ast_mod

cfg = ast_mod.ASTConfig(max_length=128)  # ViT-B, 146 tokens
print(f"seq_length={cfg.seq_length}", file=sys.stderr, flush=True)
params1 = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
params2 = ast_mod.init_params(jax.random.PRNGKey(1), cfg)
feats = jnp.asarray(np.random.default_rng(0).standard_normal(
    (128, cfg.max_length, cfg.num_mel_bins)).astype(np.float32))

@jax.jit
def fwd(p, f):
    return jnp.sum(ast_mod.forward(p, f, cfg, dtype=jnp.bfloat16))

print("compile fwd", file=sys.stderr, flush=True)
_ = float(fwd(params1, feats))
t0 = time.perf_counter()
for _ in range(20):
    out = fwd(params1, feats)
_ = float(out)
tf = (time.perf_counter() - t0) / 20
print(f"short-seq fwd b=128: {tf*1e3:.1f} ms", flush=True)

s1 = C.StageSpec(params1, cfg, -1.1509622, 3.5340312, ("Idle", "Swallow"))
s2 = C.StageSpec(params2, cfg, -1.1509622, 3.5340312, ("Healthy", "Zenker"))
eng = C.TwoStageEngine(s1, s2, C.CascadeConfig(dtype=jnp.bfloat16,
                                               batch_size=1024,
                                               stage2_mode="all"))
rng = np.random.default_rng(0)
audio = np.clip(rng.standard_normal(int(16000 * 600)) * 0.1 * 32768.0,
                -32768, 32767).astype(np.int16)
print("compile cascade", file=sys.stderr, flush=True)
p1, _ = eng.window_probs(audio)
W = len(p1)
ts = []
for _ in range(5):
    t0 = time.perf_counter(); eng.window_probs(audio)
    ts.append(time.perf_counter() - t0)
wps = W / float(np.median(ts))
print(f"short-seq e2e cascade: {wps:.1f} windows/s ({W} windows)", flush=True)
