"""Optimizer-update parity vs torch: the reference trains with HF Trainer's
adamw_torch_fused + get_linear_schedule_with_warmup + max_grad_norm=1.0
(src/train_ast_stage1_cross_validation.py:476-498,707). test_losses.py proves
loss parity; this file proves the UPDATE RULE — decoupled weight decay scaled
by the scheduled lr, global-norm grad clipping, linear warmup/decay schedule,
and HF's decay-parameter exclusion (biases + LayerNorm) — by running the same
gradient sequence through optax (train/optim.py) and torch.optim.AdamW."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from zenker_audio_detection_tpu.train import optim

LR, WD, BETA2, WARMUP, TOTAL = 3.7e-5, 0.013, 0.97, 0.2, 10


def _tree(rng):
    """Param tree exercising every decay-mask case: plain kernel (decays),
    bias (excluded), LayerNorm scale+bias (excluded)."""
    return {
        "dense": {"kernel": rng.standard_normal((8, 8)).astype(np.float32),
                  "bias": rng.standard_normal(8).astype(np.float32)},
        "ln1": {"scale": rng.standard_normal(8).astype(np.float32),
                "bias": rng.standard_normal(8).astype(np.float32)},
    }


def _hf_lr_lambda(step, warmup=WARMUP, total=TOTAL):
    """transformers.get_linear_schedule_with_warmup's lr_lambda with
    HF TrainingArguments.get_warmup_steps = ceil(ratio * total)."""
    warmup_steps = math.ceil(warmup * total)
    if step < warmup_steps:
        return step / max(1, warmup_steps)
    return max(0.0, (total - step) / max(1, total - warmup_steps))


def _run_optax(tree, grad_seq, *, lr=LR, wd=WD, beta2=BETA2,
               warmup=WARMUP, total=TOTAL):
    import jax
    import jax.numpy as jnp

    tx = optim.make_optimizer(lr, total, warmup, wd, beta2=beta2)
    params = jax.tree.map(jnp.asarray, tree)
    opt_state = tx.init(params)
    import optax as ox

    for g in grad_seq:
        g = jax.tree.map(jnp.asarray, g)
        updates, opt_state = tx.update(g, opt_state, params)
        params = ox.apply_updates(params, updates)
    return jax.tree.map(np.asarray, params)


def _run_torch(tree, grad_seq, *, lr=LR, wd=WD, beta2=BETA2,
               warmup=WARMUP, total=TOTAL):
    flat = {f"{a}.{b}": torch.tensor(v, requires_grad=True)
            for a, sub in tree.items() for b, v in sub.items()}
    # HF get_decay_parameter_names: exclude biases and LayerNorm params
    decay = [v for k, v in flat.items()
             if not (k.endswith(".bias") or k.startswith("ln"))]
    no_decay = [v for k, v in flat.items()
                if k.endswith(".bias") or k.startswith("ln")]
    opt = torch.optim.AdamW(
        [{"params": decay, "weight_decay": wd},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=lr, betas=(0.9, beta2), eps=1e-8)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda s: _hf_lr_lambda(s, warmup, total))
    for g in grad_seq:
        for a, sub in g.items():
            for b, gv in sub.items():
                flat[f"{a}.{b}"].grad = torch.tensor(gv)
        torch.nn.utils.clip_grad_norm_(list(flat.values()), 1.0)
        opt.step()
        sched.step()
    return {a: {b: flat[f"{a}.{b}"].detach().numpy() for b in sub}
            for a, sub in tree.items()}


@pytest.mark.parametrize("n_steps", [1, 6])
def test_adamw_update_parity_vs_torch(n_steps):
    rng = np.random.default_rng(42)
    tree = _tree(rng)
    # large grads so global-norm clipping actually engages (norm >> 1),
    # plus one small-grad step so the unclipped path is covered too
    grad_seq = [
        {a: {b: (rng.standard_normal(v.shape) * (0.01 if s == 0 else 10.0)
                 ).astype(np.float32) for b, v in sub.items()}
         for a, sub in tree.items()}
        for s in range(n_steps)
    ]
    ours = _run_optax(tree, grad_seq)
    ref = _run_torch(tree, grad_seq)
    for a in tree:
        for b in tree[a]:
            np.testing.assert_allclose(
                ours[a][b], ref[a][b], atol=1e-7,
                err_msg=f"{a}.{b} diverges from torch AdamW after "
                        f"{n_steps} steps")
            if n_steps > 1:  # step 0 has lr=0 (warmup), params only move later
                assert not np.allclose(ours[a][b], tree[a][b])


def test_schedule_matches_hf_lambda():
    sched = optim.linear_schedule(LR, TOTAL, WARMUP)
    for step in range(TOTAL + 2):
        np.testing.assert_allclose(float(sched(step)),
                                   LR * _hf_lr_lambda(step), rtol=1e-6)


@pytest.mark.parametrize("lr,wd,b2,warmup", [
    (3.7e-5, 0.013, 0.97, 0.2),
    (1e-3, 0.0, 0.999, 0.05),
    (5e-4, 0.1, 0.95, 0.0),
])
def test_traced_adamw_apply_matches_optax(lr, wd, b2, warmup):
    """optim.adamw_apply (traced hyperparams, used by the trial-parallel
    sweep) must reproduce make_optimizer's optax chain step for step,
    including grad clipping, bias correction, decay mask, and the linear
    schedule applied as a step-indexed lr."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    params_ref = jax.tree.map(jnp.asarray, _tree(rng))
    params_new = jax.tree.map(jnp.asarray, _tree(np.random.default_rng(0)))
    total = 8
    tx = optim.make_optimizer(lr, total, warmup, wd, beta2=b2)
    opt_state = tx.init(params_ref)
    state = optim.adamw_init(params_new)
    sched = optim.linear_schedule(lr, total, warmup)
    mask_tree = optim.decay_mask(params_new)

    for step in range(total):
        # one big-grad step to exercise the clip path, then normal grads
        scale = 50.0 if step == 1 else 1.0
        grads = jax.tree.map(
            lambda p: jnp.asarray(
                np.random.default_rng(100 + step).standard_normal(p.shape)
                .astype(np.float32)) * scale, params_ref)
        updates, opt_state = tx.update(grads, opt_state, params_ref)
        params_ref = jax.tree.map(lambda p, u: p + u, params_ref, updates)

        params_new, state = optim.adamw_apply(
            params_new, state, grads, lr=sched(step), weight_decay=wd,
            beta2=b2, mask_tree=mask_tree)
        for a, b in zip(jax.tree.leaves(params_ref),
                        jax.tree.leaves(params_new)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7, err_msg=f"step {step}")


def test_adamw_randomized_hyperparams_vs_torch():
    """Differential parity at 6 random hyperparameter draws (deterministic).

    The fixed-constant test pins one (lr, wd, beta2, warmup) point; the
    update rule must match torch for any values the trainer CLI accepts —
    incl. warmup=0, wd=0, and warmup covering the whole run.
    """
    r = np.random.default_rng(20260818)
    for trial in range(6):
        lr = float(10 ** r.uniform(-5, -2))
        wd = float(r.choice([0.0, 10 ** r.uniform(-3, -0.5)]))
        beta2 = float(r.uniform(0.9, 0.9999))
        total = int(r.integers(3, 12))
        warmup = float(r.choice([0.0, r.uniform(0.05, 1.0)]))
        tree = _tree(np.random.default_rng(trial))
        gr = np.random.default_rng(1000 + trial)
        grad_seq = [
            {a: {b: (gr.standard_normal(v.shape)
                     * (10.0 if s % 3 == 1 else 0.05)).astype(np.float32)
                 for b, v in sub.items()}
             for a, sub in tree.items()}
            for s in range(total)
        ]
        kw = dict(lr=lr, wd=wd, beta2=beta2, warmup=warmup, total=total)
        ours = _run_optax(tree, grad_seq, **kw)
        ref = _run_torch(tree, grad_seq, **kw)
        for a in tree:
            for b in tree[a]:
                np.testing.assert_allclose(
                    ours[a][b], ref[a][b], atol=1e-6,
                    err_msg=f"trial {trial} {kw}: {a}.{b}")
