"""Optimizer + LR schedule matching the reference's HF Trainer configuration.

The reference uses `adamw_torch_fused` with per-run (lr, weight_decay,
adam_beta2, warmup_ratio) knobs and HF's default linear-decay schedule
(src/train_ast_stage1_cross_validation.py:476-498,688-727). The TPU-native
equivalent is `optax.adamw` (XLA fuses the update by construction,
SURVEY §2.3) with:

  * linear warmup over ceil(warmup_ratio * total_steps) steps, then linear
    decay to 0 (transformers get_linear_schedule_with_warmup semantics);
  * weight decay masked exactly like HF Trainer: no decay on biases or
    LayerNorm parameters (transformers.Trainer.get_decay_parameter_names).
"""

from __future__ import annotations

import math

import jax
import optax


def linear_schedule(learning_rate: float, total_steps: int,
                    warmup_ratio: float = 0.1) -> optax.Schedule:
    warmup_steps = math.ceil(total_steps * warmup_ratio)

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = (total_steps - step) / jnp.maximum(1.0, total_steps - warmup_steps)
        return learning_rate * jnp.clip(
            jnp.where(step < warmup_steps, warm, decay), 0.0, 1.0)

    return schedule


def decay_mask(params) -> object:
    """True (apply weight decay) for every leaf except biases and LayerNorm
    scales/biases — mirroring HF's name-based exclusion."""

    def is_ln(path) -> bool:
        keys = [getattr(p, "key", None) for p in path]
        return any(k in ("ln1", "ln2", "ln_final", "ln") for k in keys)

    def mask_leaf(path, leaf):
        last = getattr(path[-1], "key", None)
        return not (last == "bias" or is_ln(path))

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def make_optimizer(learning_rate: float, total_steps: int,
                   warmup_ratio: float = 0.1, weight_decay: float = 0.01,
                   beta1: float = 0.9, beta2: float = 0.98,
                   eps: float = 1e-8,
                   max_grad_norm: float | None = 1.0) -> optax.GradientTransformation:
    """HF-Trainer-equivalent AdamW (max_grad_norm=1.0 is the HF default)."""
    sched = linear_schedule(learning_rate, total_steps, warmup_ratio)
    tx = optax.adamw(sched, b1=beta1, b2=beta2, eps=eps,
                     weight_decay=weight_decay, mask=decay_mask)
    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx


# ---------------------------------------------------------------------------
# Traced-hyperparameter AdamW for trial-parallel sweeps
# ---------------------------------------------------------------------------
#
# `make_optimizer` bakes (b2, weight_decay, schedule) into the optax
# transformation at trace time — fine when every step uses one config, but
# the trial-parallel sweep (train/trial_parallel.py) vmaps ONE update over
# N trials whose hyperparameters differ, so they must be traced values.
# These functions re-state the exact optax composition
# clip_by_global_norm(1.0) -> scale_by_adam -> add_decayed_weights(mask) ->
# scale(-lr) with (lr, b2, wd) as arguments; parity with make_optimizer is
# pinned to ~1e-7 over multi-step runs by test_optim_parity.py.


def adamw_init(params):
    import jax.numpy as jnp

    return {"count": jnp.zeros((), jnp.int32),
            "mu": jax.tree.map(jnp.zeros_like, params),
            "nu": jax.tree.map(jnp.zeros_like, params)}


def adamw_apply(params, state, grads, *, lr, weight_decay, beta2,
                beta1: float = 0.9, eps: float = 1e-8,
                max_grad_norm: float = 1.0, mask_tree=None):
    """(new_params, new_state). lr/weight_decay/beta2 may be traced scalars
    (e.g. per-vmapped-trial); lr is the already-scheduled step size.
    mask_tree: decay_mask(params)-shaped bool pytree (computed statically by
    the caller)."""
    import jax.numpy as jnp

    if mask_tree is None:
        mask_tree = decay_mask(params)

    # optax.clip_by_global_norm semantics
    g_norm = optax.global_norm(grads)
    grads = jax.tree.map(
        lambda g: jnp.where(g_norm < max_grad_norm, g,
                            (g / g_norm.astype(g.dtype)) * max_grad_norm),
        grads)

    count = state["count"] + 1
    mu = jax.tree.map(lambda m, g: beta1 * m + (1.0 - beta1) * g,
                      state["mu"], grads)
    nu = jax.tree.map(lambda v, g: beta2 * v + (1.0 - beta2) * g * g,
                      state["nu"], grads)
    bc1 = 1.0 - beta1 ** count.astype(jnp.float32)
    bc2 = 1.0 - beta2 ** count.astype(jnp.float32)
    new_params = jax.tree.map(
        lambda p, m, v, use_wd: p - lr * (
            (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            + jnp.where(use_wd, weight_decay, 0.0) * p),
        params, mu, nu, mask_tree)
    return new_params, {"count": count, "mu": mu, "nu": nu}
