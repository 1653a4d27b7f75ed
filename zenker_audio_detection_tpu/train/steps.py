"""Jitted train/eval steps with data-parallel sharding.

The reference's training device story is one GPU inside HF Trainer
(SURVEY §2.4); here the batch axis is sharded over a 1-D `jax.sharding.Mesh`
and XLA inserts the gradient all-reduce over ICI — the NCCL-equivalent layer
is the compiler, not a library.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..models import ast as ast_mod


def make_loss_fn(config: ast_mod.ASTConfig, loss: Callable,
                 dtype=jnp.bfloat16, remat: bool = True,
                 remat_policy: str = "full"):
    """loss(logits, labels) -> scalar, lifted to a params-first objective."""

    def loss_fn(params, feats, labels):
        logits = ast_mod.forward(params, feats, config, dtype=dtype,
                                 remat=remat, remat_policy=remat_policy)
        return loss(logits, labels), logits

    return loss_fn


def make_train_step(tx: optax.GradientTransformation,
                    config: ast_mod.ASTConfig, loss: Callable,
                    dtype=jnp.bfloat16, remat: bool = True,
                    remat_policy: str = "full"):
    loss_fn = make_loss_fn(config, loss, dtype, remat, remat_policy)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, feats, labels):
        (loss_val, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, feats, labels)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_val, logits

    return train_step


def make_accum_steps(tx: optax.GradientTransformation,
                     config: ast_mod.ASTConfig, loss: Callable,
                     dtype=jnp.bfloat16, remat: bool = True,
                     remat_policy: str = "full"):
    """Gradient accumulation as two jitted programs (beyond-parity batch
    scaling: the reference trains at a fixed per-device batch of 16,
    src/train_ast_stage1_cross_validation.py:484; this lets the effective
    batch grow past the HBM transient without changing the micro-batch
    shape XLA compiles for).

      grad_step(params, grad_buf, feats, labels) -> (grad_buf', loss, logits)
          one micro-batch: accumulate d(mean micro-loss)/d(params) into the
          donated HBM-resident buffer — no optimizer work, no host sync.
      apply_step(params, opt_state, grad_buf, n_micro) -> (params', opt', 0)
          one optimizer update on the micro-mean of the accumulated grads,
          returning a zeroed buffer for the next group.

    Equal-sized micro-batches make N accumulated steps bit-equivalent (up
    to float reorder) to one N*micro batch for per-sample-mean losses; a
    smaller tail micro-batch is equal-WEIGHTED with the full ones (the HF
    Trainer gradient_accumulation_steps convention). The stage-2 focal
    loss computes its class-alpha over each micro batch, so its accum
    grads differ from a monolithic batch by design (losses.py batch-level
    alpha quirk).
    """
    loss_fn = make_loss_fn(config, loss, dtype, remat, remat_policy)

    @partial(jax.jit, donate_argnums=(1,))
    def grad_step(params, grad_buf, feats, labels):
        (loss_val, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, feats, labels)
        grad_buf = jax.tree.map(jnp.add, grad_buf, grads)
        return grad_buf, loss_val, logits

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def apply_step(params, opt_state, grad_buf, n_micro):
        grads = jax.tree.map(lambda g: g / n_micro, grad_buf)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        zero = jax.tree.map(jnp.zeros_like, grads)
        return params, opt_state, zero

    return grad_step, apply_step


def make_eval_step(config: ast_mod.ASTConfig, dtype=jnp.bfloat16):
    @jax.jit
    def eval_step(params, feats):
        return ast_mod.forward(params, feats, config, dtype=dtype)

    return eval_step
