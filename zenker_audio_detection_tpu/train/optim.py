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
