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


def make_eval_step(config: ast_mod.ASTConfig, dtype=jnp.bfloat16):
    @jax.jit
    def eval_step(params, feats):
        return ast_mod.forward(params, feats, config, dtype=dtype)

    return eval_step
