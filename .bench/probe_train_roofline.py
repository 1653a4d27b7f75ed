"""Train-step accounting: where do 303 ms/step (b=16, remat, bf16) go?

Decomposes the full-size training step into fwd / fwd+bwd / optimizer to
check the step against its own roofline (fwd+bwd+remat ~= 4x fwd FLOPs for
a matmul-dominated net). All timings sync-amortized: N queued calls, one
scalar fetch.

Run: PYTHONPATH=/root/repo:/root/.axon_site python .bench/probe_train_roofline.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from zenker_audio_detection_tpu.models import ast as ast_mod
from zenker_audio_detection_tpu.train import losses, optim, steps

B = 16
cfg = ast_mod.ASTConfig()
params = jax.tree.map(jnp.asarray, ast_mod.init_params(jax.random.PRNGKey(0), cfg))
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.standard_normal((B, cfg.max_length, cfg.num_mel_bins))
                    .astype(np.float32))
labels = jnp.asarray(rng.integers(0, 2, size=(B,)).astype(np.int32))


def timed(label, fn, out_scalar, n=10):
    fn()  # compile
    float(out_scalar(fn()))
    t0 = time.perf_counter()
    r = None
    for _ in range(n):
        r = fn()
    float(out_scalar(r))  # one sync for the whole queue
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label}: {dt:.1f} ms", flush=True)
    return dt


def loss(logits, lab):
    return losses.stage1_loss(logits, lab, focal_gamma=2.0,
                              label_smoothing=0.07)


# 1. forward only, b=16
fwd = jax.jit(lambda p, x: jnp.sum(
    ast_mod.forward(p, x, cfg, dtype=jnp.bfloat16)))
t_fwd = timed("fwd b=16 (bf16)", lambda: fwd(params, feats), lambda r: r)

# 2. loss + grads with full remat (no optimizer)
loss_fn = steps.make_loss_fn(cfg, loss, jnp.bfloat16, remat=True)
grad_fn = jax.jit(lambda p, x, y: jax.value_and_grad(
    loss_fn, has_aux=True)(p, x, y))
t_bwd = timed("fwd+bwd b=16 (full remat)",
              lambda: grad_fn(params, feats, labels),
              lambda r: r[0][0])

# 3. optimizer only (AdamW update + apply on fixed grads)
tx = optim.make_optimizer(learning_rate=3.7e-5, total_steps=100,
                          warmup_ratio=0.2, weight_decay=0.013, beta2=0.97)
opt_state = tx.init(params)
(_, _), grads = grad_fn(params, feats, labels)
grads = jax.tree.map(jnp.asarray, grads)


@jax.jit
def opt_only(p, s, g):
    updates, s = tx.update(g, s, p)
    p2 = jax.tree.map(lambda a, b: a + b, p, updates)
    return jnp.sum(p2["cls_token"]), s


t_opt = timed("optimizer only (AdamW+schedule+clip)",
              lambda: opt_only(params, opt_state, grads), lambda r: r[0])

# 4. the real train step (donated buffers prevent timing reuse of params;
#    rebuild fresh trees per run and time a 5-step chain instead)
train_step = steps.make_train_step(tx, cfg, loss, dtype=jnp.bfloat16)
p, s = jax.tree.map(jnp.asarray, params), tx.init(params)
p, s, lv, _ = train_step(p, s, feats, labels)  # compile
float(lv)
t0 = time.perf_counter()
n = 10
for _ in range(n):
    p, s, lv, _ = train_step(p, s, feats, labels)
float(lv)
t_step = (time.perf_counter() - t0) / n * 1e3
print(f"full train step: {t_step:.1f} ms", flush=True)

print(f"\naccounting: fwd {t_fwd:.0f} + bwd-extra {t_bwd - t_fwd:.0f} "
      f"+ opt {t_opt:.0f} vs step {t_step:.0f} "
      f"(bwd/fwd ratio {t_bwd / t_fwd:.2f})", flush=True)
