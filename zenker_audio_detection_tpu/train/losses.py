"""Loss functions replicating the reference's two custom Trainer subclasses.

Stage 1 — `FocalLossTrainer` (src/train_ast_stage1_cross_validation.py:55-85):
  γ>0:   FL = mean((1 - exp(-ce))^γ * ce) with ce = torch-style
         label-smoothed cross-entropy (smoothing mass ls/C on ALL classes).
  γ==0:  plain label-smoothed CE.

Stage 2 — `ImprovedWeightedTrainer`
(src/train_ast_stage2_cross_validation.py:369-469): focal loss with a
*different* smoothing scheme (ls/(C-1) on non-true classes only), per-sample
class weights, and the batch-level α quirk
(α_t = α if mean(labels) < 0.5 else 1-α, :459-465) — replicated exactly
because it produced the paper's baseline numbers (SURVEY §7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _log_softmax(logits):
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def torch_smoothed_ce(logits, labels, label_smoothing: float = 0.0):
    """Per-sample CE matching `torch.nn.functional.cross_entropy(...,
    label_smoothing=ls, reduction="none")`: target distribution puts
    (1 - ls) + ls/C on the true class and ls/C elsewhere."""
    logp = _log_softmax(logits)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if label_smoothing == 0.0:
        return nll
    smooth = -jnp.mean(logp, axis=-1)
    return (1.0 - label_smoothing) * nll + label_smoothing * smooth


def _masked_mean(per_sample, mask):
    return jnp.sum(per_sample * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def stage1_loss(logits, labels, focal_gamma: float = 0.0,
                label_smoothing: float = 0.0, sample_mask=None):
    """FocalLossTrainer.compute_loss, mean-reduced scalar.

    sample_mask (0/1 per row): masked mean over the valid rows — identical
    to running the plain mean on just those rows. Used by the fold-parallel
    trainer, whose fixed-shape stacked batches pad tail batches with dummy
    rows (train/fold_parallel.py)."""
    ce = torch_smoothed_ce(logits, labels, label_smoothing)
    per = (1.0 - jnp.exp(-ce)) ** focal_gamma * ce if focal_gamma > 0 else ce
    if sample_mask is None:
        return jnp.mean(per)
    return _masked_mean(per, sample_mask)


def stage2_focal_loss(logits, labels, class_weights=None,
                      focal_alpha: float | None = 0.25,
                      focal_gamma: float = 2.0,
                      label_smoothing: float = 0.1, sample_mask=None):
    """ImprovedWeightedTrainer.focal_loss_with_smoothing (:421-469).

    sample_mask: masked mean as in stage1_loss; the batch-level α uses the
    masked label mean, so padded rows can't flip it."""
    logp = _log_softmax(logits)
    probs = jnp.exp(logp)
    C = logits.shape[-1]

    # smoothing mass ls/(C-1) on non-true classes, 1-ls on the true class
    smooth = jnp.full_like(logp, label_smoothing / (C - 1))
    onehot = jax.nn.one_hot(labels, C, dtype=logp.dtype)
    smooth = smooth * (1.0 - onehot) + (1.0 - label_smoothing) * onehot

    p_t = jnp.take_along_axis(probs, labels[:, None], axis=-1)[:, 0]
    focal_weight = (1.0 - p_t) ** focal_gamma
    ce = -jnp.sum(smooth * logp, axis=-1)
    loss = focal_weight * ce

    if class_weights is not None:
        loss = loss * jnp.asarray(class_weights, jnp.float32)[labels]

    if focal_alpha is not None:
        labf = labels.astype(jnp.float32)
        lab_mean = (jnp.mean(labf) if sample_mask is None
                    else _masked_mean(labf, sample_mask))
        alpha_t = jnp.where(lab_mean < 0.5, focal_alpha, 1.0 - focal_alpha)
        loss = loss * alpha_t
    if sample_mask is None:
        return jnp.mean(loss)
    return _masked_mean(loss, sample_mask)


def stage2_weighted_ce(logits, labels, class_weights=None,
                       label_smoothing: float = 0.1, sample_mask=None):
    """`--no-focal-loss` path (:404-417): torch CrossEntropyLoss(weight=w,
    label_smoothing=ls) semantics (verified empirically vs torch 2.13):
    per-sample = (1-ls)·w[y]·nll + ls·(-Σ_c w_c·logp_c)/C, mean reduction
    normalized by Σ w[y]. sample_mask: both sums run over valid rows only."""
    logp = _log_softmax(logits)
    C = logits.shape[-1]
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if class_weights is None:
        smooth = -jnp.mean(logp, axis=-1)
        per = (1.0 - label_smoothing) * nll + label_smoothing * smooth
        if sample_mask is None:
            return jnp.mean(per)
        return _masked_mean(per, sample_mask)
    w = jnp.asarray(class_weights, jnp.float32)
    wi = w[labels]
    smooth = -jnp.sum(logp * w[None, :], axis=-1) / C
    num = (1.0 - label_smoothing) * wi * nll + label_smoothing * smooth
    if sample_mask is None:
        return jnp.sum(num) / jnp.sum(wi)
    return (jnp.sum(num * sample_mask)
            / jnp.maximum(jnp.sum(wi * sample_mask), 1e-9))


def _safe_focal_base(x, gamma):
    """(x)**gamma with a clean gradient at gamma == 0 (where the sequential
    losses take the plain-CE branch): the where keeps x out of the power's
    gradient when the exponent is zero, avoiding 0**-1 NaNs at x == 0."""
    return jnp.where(gamma > 0, x, 1.0) ** gamma


def stage1_loss_traced(logits, labels, focal_gamma, label_smoothing,
                       sample_mask=None):
    """stage1_loss with focal_gamma / label_smoothing as TRACED scalars —
    the per-trial form the trial-parallel sweep vmaps over (no Python
    branches). Identical to stage1_loss at every (γ, ls), including the
    branch points γ=0 (focal factor collapses to 1) and ls=0 (plain NLL);
    pinned by test_losses.py."""
    logp = _log_softmax(logits)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    smooth = -jnp.mean(logp, axis=-1)
    ce = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    per = _safe_focal_base(1.0 - jnp.exp(-ce), focal_gamma) * ce
    if sample_mask is None:
        return jnp.mean(per)
    return _masked_mean(per, sample_mask)


def stage2_focal_loss_traced(logits, labels, class_weights, focal_alpha,
                             focal_gamma, label_smoothing, sample_mask=None):
    """stage2_focal_loss with focal_gamma / label_smoothing traced
    (class_weights may be a traced array; focal_alpha stays static — the
    reference sweeps never touch it)."""
    logp = _log_softmax(logits)
    probs = jnp.exp(logp)
    C = logits.shape[-1]
    smooth = jnp.full_like(logp, 1.0) * (label_smoothing / (C - 1))
    onehot = jax.nn.one_hot(labels, C, dtype=logp.dtype)
    smooth = smooth * (1.0 - onehot) + (1.0 - label_smoothing) * onehot
    p_t = jnp.take_along_axis(probs, labels[:, None], axis=-1)[:, 0]
    loss = _safe_focal_base(1.0 - p_t, focal_gamma) * (
        -jnp.sum(smooth * logp, axis=-1))
    if class_weights is not None:
        loss = loss * jnp.asarray(class_weights, jnp.float32)[labels]
    if focal_alpha is not None:
        labf = labels.astype(jnp.float32)
        lab_mean = (jnp.mean(labf) if sample_mask is None
                    else _masked_mean(labf, sample_mask))
        loss = loss * jnp.where(lab_mean < 0.5, focal_alpha,
                                1.0 - focal_alpha)
    if sample_mask is None:
        return jnp.mean(loss)
    return _masked_mean(loss, sample_mask)


def stage2_weighted_ce_traced(logits, labels, class_weights, label_smoothing,
                              sample_mask=None):
    """stage2_weighted_ce with label_smoothing traced (its formula is
    already branch-free; this wrapper exists for a uniform traced API)."""
    return stage2_weighted_ce(logits, labels, class_weights,
                              label_smoothing, sample_mask=sample_mask)


def inverse_frequency_weights(labels, num_classes: int = 2):
    """Class weights from train labels: n_total / (n_classes * count_c)
    (src/train_ast_stage2_cross_validation.py:355-366)."""
    import numpy as np

    labels = np.asarray(labels)
    counts = np.bincount(labels, minlength=num_classes).astype(np.float64)
    return (len(labels) / (num_classes * np.maximum(counts, 1))).astype(np.float32)


def hf_eval_loss(loss_fn, logits, labels, batch_size: int) -> float:
    """HF Trainer eval-loss reduction: mean loss per eval batch, combined
    as a sample-weighted mean (the Trainer repeats each batch's mean per
    sample before the final mean; the trailing batch is PARTIAL, never
    padded). The batching matters for stage-2 focal loss, whose batch-level
    alpha quirk makes the value depend on how samples are grouped
    (src/train_ast_stage2_cross_validation.py:459-466)."""
    import numpy as np

    logits = np.asarray(logits)
    labels = np.asarray(labels)
    n = len(labels)
    if n == 0:
        return float("nan")
    total = 0.0
    for s in range(0, n, int(batch_size)):
        yb = labels[s: s + int(batch_size)]
        total += float(loss_fn(jnp.asarray(logits[s: s + int(batch_size)]),
                               jnp.asarray(yb))) * len(yb)
    return total / n
