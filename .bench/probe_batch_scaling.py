"""Beyond-parity training batch scaling: samples/s + MFU for b in
{16, 32, 64, 128} plus grad-accumulation variants (micro 16 x K).

The round-3 roofline showed b=16 runs ~29 % MXU vs ~49 % at b=128 — a
fixed property of 16-row GEMM tiles against the 128-wide MXU
(ROOFLINE.md). This probe measures the full train step (fwd + bwd with
full remat + fused AdamW) at each batch size on the real chip, the one
unexploited perf axis VERDICT r3 flagged.

FLOPs accounting: forward = 0.261 TFLOP/sample (ROOFLINE.md: 33.4 TFLOP
at b=128). MFU uses the standard model-FLOPs convention 3x fwd (fwd +
2x bwd); the remat re-forward is hardware overhead, not model FLOPs.

Run: PYTHONPATH=/root/repo:/root/.axon_site python .bench/probe_batch_scaling.py
Pass --short for the 128-frame (146-token) short-seq config with batch
sizes scaled up accordingly.
All timings sync-amortized: N queued steps, one scalar fetch.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from zenker_audio_detection_tpu.models import ast as ast_mod
from zenker_audio_detection_tpu.train import losses, optim, steps

SHORT = "--short" in sys.argv
if SHORT:
    cfg = ast_mod.ASTConfig(max_length=128)
    # 146 tokens vs 1214: ~8.3x fewer tokens => ~8.3x fewer fwd FLOPs
    # (attention's quadratic term is negligible at this length)
    FWD_TFLOP_PER_SAMPLE = (33.4 / 128) * (146 / 1214)
    BATCHES = (16, 64, 256, 1024)
    ACCUMS = (4, 16)
else:
    cfg = ast_mod.ASTConfig()
    FWD_TFLOP_PER_SAMPLE = 33.4 / 128
    BATCHES = (16, 32, 64, 128)
    ACCUMS = (2, 4, 8)
PEAK_TFLOPS = 197.0
# host-resident template: fresh DEVICE buffers per configuration (the train
# step donates params/opt-state — reusing one device tree across configs
# would hand deleted buffers to the next run)
params0 = jax.tree.map(np.asarray, ast_mod.init_params(jax.random.PRNGKey(0), cfg))
rng = np.random.default_rng(0)


def fresh_params():
    return jax.tree.map(jnp.asarray, params0)


def loss(logits, lab):
    return losses.stage1_loss(logits, lab, focal_gamma=2.0,
                              label_smoothing=0.07)


def batch(b):
    feats = jnp.asarray(rng.standard_normal((b, cfg.max_length,
                                             cfg.num_mel_bins))
                        .astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, size=(b,)).astype(np.int32))
    return feats, labels


def report(label, eff_b, dt_ms):
    sps = eff_b / (dt_ms / 1e3)
    mfu = 100 * sps * 3 * FWD_TFLOP_PER_SAMPLE / PEAK_TFLOPS
    print(f"{label}: {dt_ms:7.1f} ms/update  {sps:6.1f} samples/s  "
          f"MFU {mfu:4.1f} %", flush=True)
    return sps


tx = optim.make_optimizer(learning_rate=5e-5, total_steps=100,
                          warmup_ratio=0.1, weight_decay=0.01)

print(f"== monolithic batch ({'short-seq 128fr' if SHORT else '1024fr'}) ==",
      flush=True)
for b in BATCHES:
    feats, labels = batch(b)
    train_step = steps.make_train_step(tx, cfg, loss, dtype=jnp.bfloat16)
    p = fresh_params()
    s = tx.init(p)
    try:
        p, s, lv, _ = train_step(p, s, feats, labels)  # compile
        float(lv)
    except Exception as e:  # b=128 exceeds HBM even with full remat
        print(f"b={b}: DOES NOT FIT ({type(e).__name__}: "
              f"{str(e).splitlines()[0][:100]})", flush=True)
        continue
    n = 10 if b <= 32 else 5
    t0 = time.perf_counter()
    for _ in range(n):
        p, s, lv, _ = train_step(p, s, feats, labels)
    float(lv)
    report(f"b={b:<3}            ", b, (time.perf_counter() - t0) / n * 1e3)

print("== grad accumulation (micro 16) ==", flush=True)
feats, labels = batch(16)
grad_step, apply_step = steps.make_accum_steps(tx, cfg, loss,
                                               dtype=jnp.bfloat16)
for accum in ACCUMS:
    p = fresh_params()
    s = tx.init(p)
    buf = jax.tree.map(jnp.zeros_like, p)
    for _ in range(accum):  # compile both programs
        buf, lv, _ = grad_step(p, buf, feats, labels)
    p, s, buf = apply_step(p, s, buf, float(accum))
    float(lv)
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        for _ in range(accum):
            buf, lv, _ = grad_step(p, buf, feats, labels)
        p, s, buf = apply_step(p, s, buf, float(accum))
    float(lv)
    report(f"micro16 x accum{accum}", 16 * accum,
           (time.perf_counter() - t0) / n * 1e3)
