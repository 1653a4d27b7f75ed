import time
import numpy as np
import jax, jax.numpy as jnp
import zenker_audio_detection_tpu
from zenker_audio_detection_tpu.models import ast as ast_mod
from zenker_audio_detection_tpu.train import losses, optim
import optax

cfg = ast_mod.ASTConfig()
rng = np.random.default_rng(0)
feats = jax.device_put(rng.standard_normal((16, 1024, 128)).astype(np.float32))
labels = jax.device_put(rng.integers(0, 2, 16).astype(np.int32))

for impl in ("xla", "pallas"):
    params = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(3.7e-5, 1000, 0.2, 0.013, beta2=0.97)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, f, y):
        def loss_fn(p):
            lg = ast_mod.forward(p, f, cfg, dtype=jnp.bfloat16, remat=True,
                                 attention_impl=impl)
            return losses.stage1_loss(lg, y, 2.0, 0.07)
        lv, g = jax.value_and_grad(loss_fn)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, lv

    try:
        t0 = time.time()
        params, opt, lv = step(params, opt, feats, labels)
        print(f"train {impl}: compile {time.time()-t0:.1f}s loss={float(lv):.4f}", flush=True)
        t0 = time.time(); n = 6
        for _ in range(n):
            params, opt, lv = step(params, opt, feats, labels)
        float(lv)
        print(f"train {impl}: steady {(time.time()-t0)/n*1000:.0f} ms/step", flush=True)
    except Exception as e:
        print(f"train {impl}: FAILED {str(e)[:200]}", flush=True)
