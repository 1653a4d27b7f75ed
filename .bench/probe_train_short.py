"""Train-step time: full-size AST at max_length=1024 vs 128 (b=16, bf16+remat)."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
import zenker_audio_detection_tpu
from zenker_audio_detection_tpu.models import ast as ast_mod
from zenker_audio_detection_tpu.train import losses, optim, steps

def bench(max_length, n=10):
    cfg = ast_mod.ASTConfig(max_length=max_length)
    params = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(3.7e-5, 1000, 0.2, 0.013, beta2=0.97)
    opt_state = tx.init(params)
    ts = steps.make_train_step(tx, cfg, losses.stage1_loss, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((16, max_length, 128)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, 16).astype(np.int32))
    print(f"compile {max_length}", file=sys.stderr, flush=True)
    params, opt_state, l, _ = ts(params, opt_state, feats, labels)
    _ = float(l)
    t0 = time.perf_counter()
    for _ in range(n):
        params, opt_state, l, _ = ts(params, opt_state, feats, labels)
    _ = float(l)
    print(f"train step b=16 max_length={max_length}: "
          f"{(time.perf_counter()-t0)/n*1e3:.1f} ms", flush=True)

bench(1024)
bench(128)
