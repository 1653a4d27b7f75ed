"""Fold-parallel training on ONE chip: does vmapping folds' b=16 steps
into one (F,16) step beat F sequential steps?

The sequential step runs 16-row GEMM tiles at ~29 % MXU (ROOFLINE.md
"Training step accounting"); the vmapped step feeds the same GEMMs F*16
rows. HBM bounds F at full sequence length: the backward's rematerialized
attention-scores transient is (16,12,1214,1214) f32 = 1.13 GB per fold, so
5 folds need 18.3 GB (compile-time OOM on a 16 GB v5e). Full size fits 2
folds per chip; short-seq (128 frames) fits all 5. All timings
sync-amortized: N queued calls, one scalar fetch.

Run: PYTHONPATH=/root/repo:/root/.axon_site python .bench/probe_fold_parallel.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from zenker_audio_detection_tpu.models import ast as ast_mod
from zenker_audio_detection_tpu.train import losses, optim, steps

B = 16


def timed(label, fn, out_scalar, n=10):
    r = fn()
    float(out_scalar(r))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    float(out_scalar(r))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label}: {dt:.1f} ms", flush=True)
    return dt


def run(F, max_length):
    cfg = ast_mod.ASTConfig(max_length=max_length)
    rng = np.random.default_rng(0)
    params1 = jax.tree.map(jnp.asarray,
                           ast_mod.init_params(jax.random.PRNGKey(0), cfg))
    feats1 = jnp.asarray(rng.standard_normal(
        (B, cfg.max_length, cfg.num_mel_bins)).astype(np.float32))
    labels1 = jnp.asarray(rng.integers(0, 2, size=(B,)).astype(np.int32))

    tx = optim.make_optimizer(1e-4, 1000, 0.1, 0.01)
    step1 = steps.make_train_step(tx, cfg, losses.stage1_loss,
                                  dtype=jnp.bfloat16)

    # stack BEFORE the sequential run donates params1's buffers
    stack = lambda a: jnp.broadcast_to(jnp.asarray(a),
                                       (F,) + np.shape(a)).copy()
    paramsF = jax.tree.map(stack, params1)

    state = {"p": params1, "o": tx.init(params1)}

    def seq_step():
        p, o, loss, _ = step1(state["p"], state["o"], feats1, labels1)
        state["p"], state["o"] = p, o
        return loss

    t_seq = timed(f"[len {max_length}] sequential step (b=16)", seq_step,
                  lambda x: x)

    txp = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(1.0, b1=0.9, b2=0.98, eps=1e-8, weight_decay=0.01,
                    mask=optim.decay_mask))
    optF = jax.vmap(txp.init)(paramsF)
    featsF = jnp.asarray(rng.standard_normal(
        (F, B, cfg.max_length, cfg.num_mel_bins)).astype(np.float32))
    labelsF = jnp.asarray(rng.integers(0, 2, size=(F, B)).astype(np.int32))
    maskF = jnp.ones((F, B), jnp.float32)

    def fold_step(p, o, feats, labels, mask):
        def obj(pp):
            logits = ast_mod.forward(pp, feats, cfg, dtype=jnp.bfloat16,
                                     remat=True)
            return losses.stage1_loss(logits, labels, sample_mask=mask)

        loss, grads = jax.value_and_grad(obj)(p)
        updates, o2 = txp.update(grads, o, p)
        updates = jax.tree.map(lambda u: u * 1e-4, updates)
        return optax.apply_updates(p, updates), o2, loss

    vstep = jax.jit(jax.vmap(fold_step), donate_argnums=(0, 1))
    stateF = {"p": paramsF, "o": optF}

    def par_step():
        p, o, loss = vstep(stateF["p"], stateF["o"], featsF, labelsF, maskF)
        stateF["p"], stateF["o"] = p, o
        return loss

    t_par = timed(f"[len {max_length}] fold-parallel step ({F}x b=16)",
                  par_step, lambda x: jnp.sum(x))
    print(f"[len {max_length}] per-CV-sweep: sequential {F} steps = "
          f"{F * t_seq:.0f} ms, fold-parallel 1 step = {t_par:.0f} ms "
          f"-> {F * t_seq / t_par:.2f}x on one chip\n", flush=True)


run(2, 1024)   # full size: HBM fits 2 folds/chip
run(5, 128)    # short-seq: all 5 folds on one chip
