import time
import numpy as np
import jax, jax.numpy as jnp
import zenker_audio_detection_tpu
from zenker_audio_detection_tpu.models import ast as ast_mod
from zenker_audio_detection_tpu.train import losses, optim, steps

cfg = ast_mod.ASTConfig()
rng = np.random.default_rng(0)
feats = jax.device_put(rng.standard_normal((16, 1024, 128)).astype(np.float32))
labels = jax.device_put(rng.integers(0, 2, 16).astype(np.int32))

for policy in ("full", "dots_no_batch"):
    params = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(3.7e-5, 1000, 0.2, 0.013, beta2=0.97)
    opt = tx.init(params)
    ts = steps.make_train_step(tx, cfg, lambda lg, lb: losses.stage1_loss(lg, lb, 2.0, 0.07),
                               dtype=jnp.bfloat16, remat=True, remat_policy=policy)
    try:
        t0 = time.time()
        params, opt, lv, _ = ts(params, opt, feats, labels)
        print(f"{policy}: compile+run {time.time()-t0:.1f}s loss={float(lv):.4f}", flush=True)
        t0 = time.time(); n = 8
        for _ in range(n):
            params, opt, lv, _ = ts(params, opt, feats, labels)
        float(lv)
        print(f"{policy}: steady {(time.time()-t0)/n*1000:.0f} ms/step", flush=True)
    except Exception as e:
        print(f"{policy}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
