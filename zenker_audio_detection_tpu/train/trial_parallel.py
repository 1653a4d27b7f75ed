"""Trial-parallel hyperparameter sweeps: N trials in one vmapped step.

The reference's hyperparameters came from W&B random-search sweeps that run
full fine-tunes one after another (wandb_sweeps/*.yaml; the agent loops
src/train_ast_stage2_cross_validation.py:901-917). Sweep trials are even
more parallel than CV folds: every trial trains on the SAME fold — same
clips, same featurization, same batch order (each sequential trial reseeds
`default_rng(cfg.seed)`), so a stacked run shares ONE data batch per step
across all trials,

    vmap(trial_step, in_axes=(0, 0, 0, None, None, None, ...))

with only (params, optimizer state, hyperparameters) per-trial. The trial
axis shards over the device mesh (axis "trial") exactly like fold-parallel
training — no cross-trial collectives, so T trials on T chips run at ≈ one
trial's step time (~T× sweep wall-clock vs the reference's serial agent).

Per-trial hyperparameters become traced values inside the step:
  * learning rate + warmup_ratio: the HF-linear factor is computed from
    the shared step index and per-trial (total, warmup) arrays, applied to
    an lr of 1.0 — see train/fold_parallel.py for the algebra;
  * weight_decay + adam_beta2: `optim.adamw_apply`, a restatement of the
    optax chain with traced hyperparameters (parity pinned to ~1e-7 by
    test_optim_parity.py);
  * focal_gamma + label_smoothing: the `losses.*_traced` forms, equal to
    the branchy sequential losses at every point including γ=0 / ls=0
    (test_losses.py).

Hyperband rung cuts differ from the sequential agent by construction: all
trials hit a rung simultaneously, so the cut is the true Hyperband rule —
drop trials below the median of ALL trials at the rung — rather than the
sequential agent's streaming median over previously-finished trials.

Same restrictions as fold-parallel (eager featurization, no resume); all
trials must share everything except the six swept hyperparameters and
their output roots. Parity with sequential trials is pinned by
tests/test_trial_parallel.py.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import loop as L, losses, metrics as metrics_mod, optim, steps
from .fold_parallel import _lr_factor, _slice_fold

TRIAL_AXIS = "trial"

# the swept hyperparameters (reference sweep YAML spaces); everything else
# must be identical across the stacked trials
SWEPT_FIELDS = ("learning_rate", "weight_decay", "adam_beta2",
                "warmup_ratio", "focal_gamma", "label_smoothing")
_SHARED_FIELDS = (
    "stage", "data_dir", "pretrained_model_dir", "num_epochs", "batch_size",
    "eval_batch_size", "dry_run", "enable_early_stopping",
    "early_stopping_patience", "early_stopping_threshold", "augment",
    "seed", "dtype", "use_class_weights", "use_focal_loss", "focal_alpha",
    "max_length", "streaming", "resume", "num_devices", "num_slices",
    "data_per_fold", "grad_accum")


def _make_trial_loss(cfg: L.TrainFoldConfig, class_weights):
    """loss(logits, labels, mask, gamma, ls) with traced (gamma, ls);
    class_weights/focal_alpha are shared across trials (not swept)."""
    if cfg.stage == "stage1":
        def loss(logits, labels, mask, gamma, ls):
            return losses.stage1_loss_traced(logits, labels, gamma, ls,
                                             sample_mask=mask)
    elif cfg.use_focal_loss:
        def loss(logits, labels, mask, gamma, ls):
            return losses.stage2_focal_loss_traced(
                logits, labels, class_weights, cfg.focal_alpha, gamma, ls,
                sample_mask=mask)
    else:
        def loss(logits, labels, mask, gamma, ls):
            return losses.stage2_weighted_ce_traced(
                logits, labels, class_weights, ls, sample_mask=mask)
    return loss


def train_trials_parallel(fold: int, cfgs: list[L.TrainFoldConfig], *,
                          rungs: list[int] | None = None,
                          goal: str = "maximize",
                          rung_metric: str = "f1") -> list[dict]:
    """Train all trial configs concurrently on one fold; returns per-trial
    metrics dicts identical to sequential `train_fold` calls (and writes
    the same per-trial run dirs). `rungs`: Hyperband rung epochs — at each
    rung, trials whose per-epoch `rung_metric` is on the wrong side of the
    surviving trials' median (per `goal`) are cut (masked no-op for the
    rest of the run)."""
    base = cfgs[0]
    for cfg in cfgs[1:]:
        for f in _SHARED_FIELDS:
            if getattr(cfg, f) != getattr(base, f):
                raise ValueError(
                    f"trial configs must agree on {f!r} "
                    f"({getattr(cfg, f)!r} != {getattr(base, f)!r}); only "
                    f"{SWEPT_FIELDS} and output_root may vary")
    if base.streaming:
        raise ValueError("trial-parallel sweeps require eager featurization "
                         "(drop --streaming)")
    if base.grad_accum > 1:
        raise ValueError("trial-parallel sweeps do not implement gradient "
                         "accumulation (trials share one data batch per "
                         "step); scale data via data_per_fold groups")
    if base.resume:
        raise ValueError("trial-parallel sweeps do not support --resume")
    if base.num_slices and base.num_slices > 1:
        raise ValueError("trial-parallel sweeps shard the trial axis over "
                         "a flat mesh; --num-slices is not supported here")
    if any(cfg.on_epoch_end is not None for cfg in cfgs):
        raise ValueError("on_epoch_end is not supported in trial-parallel "
                         "mode (Hyperband cuts run via `rungs`)")
    roots = [cfg.output_root for cfg in cfgs]
    if len(set(roots)) != len(roots):
        raise ValueError("trial configs must have distinct output_root "
                         "dirs (colliding trials would overwrite each "
                         "other's run artifacts)")
    T = len(cfgs)
    data_per_trial = base.data_per_fold or 1
    if data_per_trial > 1 and not (base.num_devices
                                   and base.num_devices > 1):
        raise ValueError("data_per_fold > 1 requires num_devices > 1")
    if (base.num_devices and base.num_devices > 1):
        # validate BEFORE run dirs are backed up / data is featurized
        if base.num_devices % data_per_trial:
            raise ValueError(f"{base.num_devices} devices not divisible "
                             f"into groups of {data_per_trial}")
        trial_groups = base.num_devices // data_per_trial
        if T % trial_groups:
            raise ValueError(f"{T} trials not divisible by "
                             f"{trial_groups} trial groups")
        if data_per_trial > 1 and base.batch_size % data_per_trial:
            raise ValueError(f"batch_size {base.batch_size} not divisible "
                             f"by data_per_trial {data_per_trial}")
        if data_per_trial > 1 and base.eval_batch_size % data_per_trial:
            # eval_batch_size is not CLI-exposed: round UP instead of
            # erroring (eval chunk size only affects perf — same policy
            # as train_fold's mesh bump)
            bumped = (-(-base.eval_batch_size // data_per_trial)
                      * data_per_trial)
            print(f"[Mesh] eval_batch_size {base.eval_batch_size} -> "
                  f"{bumped} (rounded up to a {data_per_trial}-device "
                  f"group multiple)")
            cfgs = [dataclasses.replace(c, eval_batch_size=bumped)
                    for c in cfgs]
            base = cfgs[0]
    print(f"\n===== {base.stage} fold {fold}: {T} trials "
          f"(trial-parallel) =====")

    params0, model_cfg = L.init_model(base)
    # every trial shares data_dir (enforced above), so the fold stats are
    # one value; prepare_fold_dir still runs per trial for its run-dir
    # backup semantics
    fold_dirs = []
    mean = std = None
    for cfg in cfgs:
        fd, mean, std = L.prepare_fold_dir(fold, cfg)
        fold_dirs.append(fd)

    # one shared dataset: all trials see the same fold with the same
    # featurization seed, exactly like each sequential trial would
    train_x, train_y, test_x, test_y, val_x, val_y = L.load_fold_splits(
        fold, base)
    aug_rng = np.random.default_rng(base.seed) if base.augment else None
    mf = model_cfg.max_length
    train_feats = L.featurize_paths(train_x, mean, std, aug_rng,
                                    max_frames=mf)
    test_feats = L.featurize_paths(test_x, mean, std, max_frames=mf)
    val_feats = (L.featurize_paths(val_x, mean, std, max_frames=mf)
                 if val_x is not None else None)
    has_val = val_feats is not None
    eval_feats = val_feats if has_val else test_feats
    eval_y = np.asarray(val_y if has_val else test_y, np.int32)
    train_y = np.asarray(train_y, np.int32)

    class_weights = None
    if base.stage == "stage2" and base.use_class_weights:
        class_weights = losses.inverse_frequency_weights(train_y)
        print(f"[ClassWeights] {class_weights}")

    n = len(train_feats)
    bs = base.batch_size
    num_epochs = 1 if base.dry_run else base.num_epochs
    steps_per_epoch = -(-n // bs)
    total_steps = num_epochs * steps_per_epoch
    checkpoint_limit = 1 if base.dry_run else max(2, (base.num_epochs + 1) // 2)

    from ..parallel import mesh as pmesh

    if data_per_trial > 1:
        mesh = pmesh.fold_data_mesh(base.num_devices, data_per_trial,
                                    axis_name=TRIAL_AXIS)
    else:
        mesh = pmesh.make_mesh(base.num_devices, axis_name=TRIAL_AXIS)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        trial_sharding = NamedSharding(mesh, P(TRIAL_AXIS))
        replicated = NamedSharding(mesh, P())
        shard = lambda x: jax.device_put(x, trial_sharding)
        if data_per_trial > 1:
            # the SHARED batch: rows sharded across each group's data axis,
            # replicated across trial groups -> every trial's gradient
            # all-reduce stays inside its own group's ICI
            data_sharding = NamedSharding(mesh, P(pmesh.DATA_AXIS))
            shard_shared = lambda x: jax.device_put(x, data_sharding)
            print(f"[Mesh] {T} trials over {mesh.devices.size} devices: "
                  f"{mesh.shape[TRIAL_AXIS]} trial groups x "
                  f"{data_per_trial} data-parallel devices each")
        else:
            shard_shared = lambda x: jax.device_put(x, replicated)
            print(f"[Mesh] {T} trials over {mesh.devices.size} devices "
                  f"(axis '{TRIAL_AXIS}')")
    else:
        shard = lambda x: jax.tree.map(jnp.asarray, x)
        shard_shared = jnp.asarray

    params = shard(jax.tree.map(
        lambda a: np.broadcast_to(np.asarray(a), (T,) + np.shape(a)).copy(),
        params0))
    opt_state = jax.vmap(optim.adamw_init)(params)
    mask_tree = optim.decay_mask(params0)
    loss_fn = _make_trial_loss(base, class_weights)

    hp = {  # per-trial traced hyperparameters, stacked (T,)
        "lr": np.asarray([c.learning_rate for c in cfgs], np.float32),
        "wd": np.asarray([c.weight_decay for c in cfgs], np.float32),
        "b2": np.asarray([c.adam_beta2 for c in cfgs], np.float32),
        "warm": np.asarray(
            [math.ceil(total_steps * c.warmup_ratio) for c in cfgs],
            np.float32),
        "gamma": np.asarray([c.focal_gamma for c in cfgs], np.float32),
        "ls": np.asarray([c.label_smoothing for c in cfgs], np.float32),
    }
    hp = shard(hp)

    from ..models import ast as ast_mod

    def trial_step(p, st, h, active, feats, labels, row_mask, step_idx):
        def objective(pp):
            logits = ast_mod.forward(pp, feats, model_cfg, dtype=base.dtype,
                                     remat=True)
            return loss_fn(logits, labels, row_mask, h["gamma"], h["ls"])

        loss_val, grads = jax.value_and_grad(objective)(p)
        lr = h["lr"] * _lr_factor(step_idx, float(total_steps), h["warm"])
        new_p, new_st = optim.adamw_apply(
            p, st, grads, lr=lr, weight_decay=h["wd"], beta2=h["b2"],
            mask_tree=mask_tree)
        keep = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(active, a, b), new, old)
        return keep(new_p, p), keep(new_st, st), loss_val

    vstep = jax.jit(
        jax.vmap(trial_step, in_axes=(0, 0, 0, 0, None, None, None, None)),
        donate_argnums=(0, 1))

    def fold_eval(p, feats):
        return ast_mod.forward(p, feats, model_cfg, dtype=base.dtype)

    veval = jax.jit(jax.vmap(fold_eval, in_axes=(0, None)))

    # host-side per-trial loop state (mirrors train_fold's locals)
    epoch_rng = np.random.default_rng(base.seed)  # shared: same batch order
    progs = [L.FoldProgress(patience_left=base.early_stopping_patience)
             for _ in range(T)]
    cut_at_rung: list[int | None] = [None] * T
    rungs = sorted(rungs or [])

    for epoch in range(1, num_epochs + 1):
        order = epoch_rng.permutation(n)
        epoch_loss = np.zeros(T)
        active_arr = shard(np.asarray([not p.stopped for p in progs]))
        for s_idx in range(steps_per_epoch):
            idx = order[s_idx * bs: (s_idx + 1) * bs]
            feats = train_feats[idx]
            labels = train_y[idx]
            row_mask = np.ones(len(idx), np.float32)
            if len(idx) < bs:  # pad the tail batch, mask the dummy rows
                pad = bs - len(idx)
                feats = np.concatenate(
                    [feats, np.zeros((pad,) + feats.shape[1:], feats.dtype)])
                labels = np.concatenate([labels, np.zeros(pad, np.int32)])
                row_mask = np.concatenate([row_mask, np.zeros(pad, np.float32)])
            step_idx = float((epoch - 1) * steps_per_epoch + s_idx)
            params, opt_state, loss_vals = vstep(
                params, opt_state, hp, active_arr,
                shard_shared(feats), shard_shared(labels),
                shard_shared(row_mask), step_idx)
            epoch_loss += np.asarray(loss_vals) * len(idx)

        logits_all = []
        for s in range(0, len(eval_feats), base.eval_batch_size):
            chunk = eval_feats[s: s + base.eval_batch_size]
            pad = base.eval_batch_size - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            lg = np.asarray(veval(params, shard_shared(chunk)))
            logits_all.append(lg[:, : base.eval_batch_size - pad])
        # empty eval split (e.g. an empty-but-present val npy): same guard
        # as loop._predict / fold_parallel._stacked_eval
        eval_logits = (np.concatenate(logits_all, axis=1) if logits_all
                       else np.zeros((T, 0, 2)))

        rung_values: list[tuple[int, float]] = []
        for t in range(T):
            prog = progs[t]
            if prog.stopped:
                continue
            m = metrics_mod.compute_metrics_from_logits(eval_logits[t],
                                                        eval_y)
            m["loss"] = float(epoch_loss[t] / n)
            prog.history.append({"epoch": epoch, **m})
            print(f"[Trial {t} Epoch {epoch}/{num_epochs}] "
                  f"loss={m['loss']:.4f} eval_f1={m['f1']:.4f}")

            L.epoch_bookkeeping(
                base, fold_dirs[t], epoch, steps_per_epoch,
                checkpoint_limit, m, has_val, prog,
                snapshot=lambda t=t: (
                    _slice_fold(params, t),
                    L.sequential_opt_layout(_slice_fold(opt_state, t))),
                rng_state=epoch_rng.bit_generator.state,
                label=f" trial {t}:")
            if not prog.stopped and epoch in rungs:
                rung_values.append((t, m[rung_metric]))

        if len(rung_values) >= 2:
            med = float(np.median([v for _, v in rung_values]))
            for t, v in rung_values:
                worse = v < med if goal == "maximize" else v > med
                if worse:
                    print(f"[Hyperband] cut trial {t} at rung {epoch}: "
                          f"{v:.4f} vs median {med:.4f}")
                    progs[t].stopped = True
                    cut_at_rung[t] = epoch
        if all(p.stopped for p in progs):
            break

    all_metrics = []
    single_eval = steps.make_eval_step(model_cfg, dtype=base.dtype)
    for t in range(T):
        prog = progs[t]
        if prog.best_params is None:
            prog.best_params = _slice_fold(params, t)
        m = L.finalize_fold(
            fold, cfgs[t], fold_dirs[t], model_cfg, mean, std,
            prog.best_params, prog.best_epoch, prog.best_f1, eval_feats,
            eval_y, has_val, test_feats, np.asarray(test_y, np.int32),
            single_eval, jnp.asarray, None, prog.history,
            class_weights=class_weights)
        if cut_at_rung[t] is not None:
            m["hyperband_cut_at_epoch"] = cut_at_rung[t]
        all_metrics.append(m)
    return all_metrics
