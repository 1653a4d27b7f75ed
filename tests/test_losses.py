"""Parity tests for the loss functions vs torch reference implementations.

The torch sides below are transcriptions of the reference's Trainer
subclasses (FocalLossTrainer src/train_ast_stage1_cross_validation.py:55-85;
ImprovedWeightedTrainer src/train_ast_stage2_cross_validation.py:369-469)
evaluated directly, so any deviation in our JAX versions fails here.
"""

import numpy as np
import pytest

from zenker_audio_detection_tpu.train import losses, optim

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402


@pytest.fixture
def batch(rng):
    logits = rng.standard_normal((16, 2)).astype(np.float32) * 2
    labels = rng.integers(0, 2, size=16).astype(np.int64)
    return logits, labels


def torch_stage1(logits, labels, gamma, ls):
    logits = torch.from_numpy(logits)
    labels = torch.from_numpy(labels)
    if gamma > 0:
        ce = TF.cross_entropy(logits, labels, reduction="none",
                              label_smoothing=ls)
        pt = torch.exp(-ce)
        return float(((1 - pt) ** gamma * ce).mean())
    return float(TF.cross_entropy(logits, labels, label_smoothing=ls))


def torch_stage2_focal(logits, labels, class_weights, alpha, gamma, ls):
    logits = torch.from_numpy(logits)
    labels = torch.from_numpy(labels)
    num_classes = logits.size(-1)
    smooth = torch.zeros_like(logits)
    smooth.fill_(ls / (num_classes - 1))
    smooth.scatter_(1, labels.unsqueeze(1), 1.0 - ls)
    log_probs = TF.log_softmax(logits, dim=-1)
    probs = torch.exp(log_probs)
    p_t = probs.gather(1, labels.unsqueeze(1)).squeeze(1)
    focal_weight = (1 - p_t) ** gamma
    ce = -(smooth * log_probs).sum(dim=-1)
    fl = focal_weight * ce
    if class_weights is not None:
        w = torch.tensor(class_weights)[labels]
        fl = fl * w
    if alpha is not None:
        alpha_t = alpha if labels.float().mean() < 0.5 else (1 - alpha)
        fl = fl * alpha_t
    return float(fl.mean())


@pytest.mark.parametrize("gamma,ls", [(0.0, 0.0), (0.0, 0.07), (2.0, 0.0),
                                      (2.0, 0.07), (1.0, 0.09)])
def test_stage1_loss_parity(batch, gamma, ls):
    logits, labels = batch
    ours = float(losses.stage1_loss(logits, labels, gamma, ls))
    ref = torch_stage1(logits, labels, gamma, ls)
    assert abs(ours - ref) < 1e-6


@pytest.mark.parametrize("weights,alpha,gamma,ls", [
    (None, 0.25, 2.0, 0.1),
    ([0.8, 1.3], 0.25, 2.0, 0.1),
    ([0.8, 1.3], None, 1.0, 0.09),
    (None, 0.4, 0.0, 0.0),
])
def test_stage2_focal_parity(batch, weights, alpha, gamma, ls):
    logits, labels = batch
    ours = float(losses.stage2_focal_loss(logits, labels, weights, alpha,
                                          gamma, ls))
    ref = torch_stage2_focal(logits, labels, weights, alpha, gamma, ls)
    assert abs(ours - ref) < 1e-6


def test_stage2_focal_alpha_flips_with_batch_majority():
    """The batch-level α quirk: α_t depends on the batch's label mean."""
    logits = np.zeros((4, 2), np.float32)
    mostly0 = np.array([0, 0, 0, 1])
    mostly1 = np.array([1, 1, 1, 0])
    a = float(losses.stage2_focal_loss(logits, mostly0, None, 0.25, 0.0, 0.0))
    b = float(losses.stage2_focal_loss(logits, mostly1, None, 0.25, 0.0, 0.0))
    assert abs(a / b - 0.25 / 0.75) < 1e-6


@pytest.mark.parametrize("weights,ls", [(None, 0.1), ([0.5, 2.0], 0.1),
                                        ([0.5, 2.0], 0.0)])
def test_stage2_weighted_ce_parity(batch, weights, ls):
    logits, labels = batch
    ours = float(losses.stage2_weighted_ce(logits, labels, weights, ls))
    w = torch.tensor(weights) if weights is not None else None
    loss_fn = torch.nn.CrossEntropyLoss(weight=w, label_smoothing=ls)
    ref = float(loss_fn(torch.from_numpy(logits), torch.from_numpy(labels)))
    assert abs(ours - ref) < 1e-6


def test_inverse_frequency_weights():
    labels = np.array([0] * 30 + [1] * 10)
    w = losses.inverse_frequency_weights(labels)
    np.testing.assert_allclose(w, [40 / 60, 40 / 20], atol=1e-6)


def test_linear_schedule_matches_hf():
    """transformers.get_linear_schedule_with_warmup parity."""
    sched = optim.linear_schedule(1e-4, total_steps=100, warmup_ratio=0.2)
    import math
    warmup = math.ceil(100 * 0.2)
    for step in [0, 1, 10, 19, 20, 21, 50, 99, 100]:
        if step < warmup:
            ref = 1e-4 * step / max(1, warmup)
        else:
            ref = 1e-4 * max(0.0, (100 - step) / max(1, 100 - warmup))
        assert abs(float(sched(step)) - ref) < 1e-9, step  # f32 schedule math


def test_decay_mask_excludes_ln_and_bias():
    import jax

    from zenker_audio_detection_tpu.models import ast as ast_mod

    cfg = ast_mod.ASTConfig(hidden_size=8, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=16,
                            num_mel_bins=16, max_length=32, patch_size=8,
                            frequency_stride=4, time_stride=4)
    params = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
    mask = optim.decay_mask(params)
    assert mask["encoder"]["q"]["kernel"] is True
    assert mask["encoder"]["q"]["bias"] is False
    assert mask["encoder"]["ln1"]["scale"] is False
    assert mask["ln_final"]["bias"] is False
    assert mask["head"]["ln"]["scale"] is False
    assert mask["head"]["dense"]["kernel"] is True
    assert mask["cls_token"] is True  # HF decays plain Parameters
    assert mask["pos_embed"] is True


def test_traced_losses_match_branch_losses(rng):
    """The *_traced variants (trial-parallel sweep) must equal the original
    branchy losses at every hyperparameter, INCLUDING the branch points
    gamma=0 and ls=0, with and without a sample mask."""
    import jax.numpy as jnp

    logits = jnp.asarray(rng.standard_normal((8, 2)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 2, 8).astype(np.int32))
    mask = jnp.asarray((rng.random(8) > 0.3).astype(np.float32))
    cw = jnp.asarray([0.7, 1.4], jnp.float32)

    for gamma in (0.0, 0.5, 2.0):
        for ls in (0.0, 0.07, 0.15):
            for m in (None, mask):
                a = losses.stage1_loss(logits, labels, gamma, ls,
                                       sample_mask=m)
                b = losses.stage1_loss_traced(
                    logits, labels, jnp.float32(gamma), jnp.float32(ls),
                    sample_mask=m)
                np.testing.assert_allclose(float(a), float(b), atol=1e-7,
                                           err_msg=f"stage1 {gamma} {ls}")
                a = losses.stage2_focal_loss(logits, labels, cw, 0.25,
                                             gamma, ls, sample_mask=m)
                b = losses.stage2_focal_loss_traced(
                    logits, labels, cw, 0.25, jnp.float32(gamma),
                    jnp.float32(ls), sample_mask=m)
                np.testing.assert_allclose(float(a), float(b), atol=1e-7,
                                           err_msg=f"stage2 {gamma} {ls}")
            a = losses.stage2_weighted_ce(logits, labels, cw, ls)
            b = losses.stage2_weighted_ce_traced(logits, labels, cw,
                                                 jnp.float32(ls))
            np.testing.assert_allclose(float(a), float(b), atol=1e-7)


def test_traced_stage1_gradient_finite_at_branch_points(rng):
    """gamma=0 with a perfectly-confident example (ce ~= 0) must not NaN
    the gradient (the _safe_focal_base where-guard)."""
    import jax
    import jax.numpy as jnp

    labels = jnp.asarray([1, 0], jnp.int32)

    def f(w, gamma):
        logits = jnp.asarray([[-30.0, 30.0], [0.5, -0.5]]) * w
        return losses.stage1_loss_traced(logits, labels, gamma,
                                         jnp.float32(0.0))

    for gamma in (0.0, 2.0):
        g = jax.grad(f)(jnp.float32(1.0), jnp.float32(gamma))
        assert np.isfinite(float(g)), f"gamma={gamma}"


def test_losses_randomized_params_parity():
    """Differential parity at 10 random (batch, gamma, smoothing, weights,
    alpha) draws — incl. single-class batches (the batch-majority alpha
    flip's boundary), extreme logits, and batch sizes the fixed grid
    doesn't touch."""
    r = np.random.default_rng(20260818)
    for trial in range(10):
        n = int(r.integers(1, 33))
        scale = float(r.choice([0.5, 2.0, 12.0]))
        logits = (r.standard_normal((n, 2)) * scale).astype(np.float32)
        kind = trial % 3  # mixed / all-zeros / all-ones label batches
        if kind == 0:
            labels = r.integers(0, 2, size=n).astype(np.int64)
        else:
            labels = np.full(n, kind - 1, np.int64)
        gamma = float(r.choice([0.0, r.uniform(0.1, 5.0)]))
        ls = float(r.choice([0.0, r.uniform(0.0, 0.3)]))
        ours1 = float(losses.stage1_loss(logits, labels, gamma, ls))
        ref1 = torch_stage1(logits, labels, gamma, ls)
        np.testing.assert_allclose(ours1, ref1, rtol=2e-5, atol=1e-6,
                                   err_msg=f"stage1 trial {trial}")

        weights = (None if r.uniform() < 0.3 else
                   [float(10 ** r.uniform(-1, 1)) for _ in range(2)])
        alpha = None if r.uniform() < 0.3 else float(r.uniform(0.05, 0.95))
        ours2 = float(losses.stage2_focal_loss(
            logits, labels, weights, alpha, gamma, ls))
        ref2 = torch_stage2_focal(logits, labels, weights, alpha, gamma, ls)
        np.testing.assert_allclose(ours2, ref2, rtol=2e-5, atol=1e-6,
                                   err_msg=f"stage2 trial {trial}")

        oursw = float(losses.stage2_weighted_ce(logits, labels, weights, ls))
        w = torch.tensor(weights) if weights is not None else None
        refw = float(torch.nn.CrossEntropyLoss(weight=w, label_smoothing=ls)(
            torch.from_numpy(logits), torch.from_numpy(labels)))
        np.testing.assert_allclose(oursw, refw, rtol=2e-5, atol=1e-6,
                                   err_msg=f"weighted-ce trial {trial}")
