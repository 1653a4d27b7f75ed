"""Fold-parallel cross-validation training: all folds in one vmapped step.

The reference trains its 5 CV folds strictly sequentially (one
`train_fold` call after another, src/train_ast_stage1_cross_validation.py:
848-864), and SURVEY §2.4 calls the fold/patient loops "embarrassingly
parallel but run sequentially". Plain data parallelism is a weak answer for
this workload: parity pins the per-fold batch at 16, so DP splits 16 rows
into even smaller MXU tiles AND pays a gradient all-reduce every step. The
TPU-native axis to scale over is the FOLD: every fold runs the same program
on different data and different weights, so the whole CV run becomes ONE
jitted step

    vmap(fold_step) over stacked per-fold (params, opt_state, batch)

with the fold axis sharded over the device mesh (axis "fold", one or more
folds per chip). Folds never synchronize — the compiled fold-sharded step
contains no gradient collectives (the only cross-device op XLA inserts is
a small activation all-gather for the patch-embed weight grad, ~42 MB/step
at full size, <1 % of the 303 ms step over ICI) — so F folds on F chips
run at ≈ one fold's step time: ~F× CV wall-clock vs the reference's serial
loop. Measured honestly on ONE chip it is 0.93-0.94× sequential (each fold
carries its own weights, so the vmapped GEMMs are batched-per-fold, not
row-merged — per-chip MXU utilization does not improve), and HBM bounds
folds-per-chip at full sequence length: the backward's rematerialized
attention-scores transient is (16, 12, 1214, 1214) f32 ≈ 1.13 GB per fold,
so a 16 GB v5e fits 2 folds at 1024 frames (all 5 in --max-length 128
short-seq mode). Numbers: .bench/probe_fold_parallel.py, ROOFLINE.md.

Each fold's numerics stay exactly those of the sequential trainer
(train/loop.py:train_fold):

  * per-fold LR schedule: folds have different train-set sizes, hence
    different total_steps and warmup lengths. The optimizer is built with
    learning_rate=1.0 and the per-fold HF-linear factor (optim.
    linear_schedule formula) multiplies the update inside the vmapped step
    — algebraically identical to optax.adamw(schedule) because AdamW
    scales the whole (adam + decoupled-decay) update by lr.
  * unequal batch counts: the step loop runs to the largest fold's
    steps_per_epoch; folds past their own count get a masked no-op step
    (params/opt-state carried through unchanged, so their optax count and
    schedule position stay exactly sequential).
  * tail batches: rows are padded to batch_size with a 0/1 sample mask;
    the losses' masked means (train/losses.py) equal the plain means the
    sequential path computes on the smaller tail batch.
  * per-fold early stopping / best-F1 selection / checkpoints: tracked on
    host exactly like the sequential loop; a stopped fold keeps riding
    along as masked no-ops until every fold is done (its rng, checkpoints
    and history freeze at the stopping epoch, like the sequential break).

Not supported here (use the sequential path): --streaming (eager
featurization only — the stacked batches are assembled from in-memory
per-fold feature arrays) and --resume. Parity with the sequential trainer
is pinned by tests/test_fold_parallel.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import ast as ast_mod
from . import loop as L, losses, metrics as metrics_mod, optim, steps

FOLD_AXIS = "fold"


@dataclasses.dataclass
class _FoldData:
    fold: int
    fold_dir: str
    mean: float
    std: float
    train_feats: np.ndarray
    train_y: np.ndarray
    test_feats: np.ndarray
    test_y: np.ndarray
    val_feats: np.ndarray | None
    val_y: np.ndarray | None
    class_weights: np.ndarray  # (2,); ones when unused
    steps_per_epoch: int
    total_steps: int
    warmup_steps: int

    @property
    def has_val(self) -> bool:
        return self.val_feats is not None

    @property
    def eval_feats(self) -> np.ndarray:
        return self.val_feats if self.has_val else self.test_feats

    @property
    def eval_y(self) -> np.ndarray:
        return self.val_y if self.has_val else self.test_y


def _prepare_fold(fold: int, cfg: L.TrainFoldConfig,
                  model_cfg) -> _FoldData:
    """Per-fold data prep through the helpers shared with the sequential
    trainer (loop.prepare_fold_dir / load_fold_splits); model init is
    excluded — identical across folds (same seed, same pretrained dir), so
    it happens once in the caller."""
    fold_dir, mean, std = L.prepare_fold_dir(fold, cfg)
    train_x, train_y, test_x, test_y, val_x, val_y = L.load_fold_splits(
        fold, cfg)

    aug_rng = np.random.default_rng(cfg.seed) if cfg.augment else None
    mf = model_cfg.max_length
    train_feats = L.featurize_paths(train_x, mean, std, aug_rng,
                                    max_frames=mf)
    test_feats = L.featurize_paths(test_x, mean, std, max_frames=mf)
    val_feats = (L.featurize_paths(val_x, mean, std, max_frames=mf)
                 if val_x is not None else None)

    class_weights = np.ones(2, np.float32)
    if cfg.stage == "stage2" and cfg.use_class_weights:
        class_weights = losses.inverse_frequency_weights(train_y)
        print(f"[ClassWeights] fold {fold}: {class_weights}")

    n = len(train_feats)
    num_epochs = 1 if cfg.dry_run else cfg.num_epochs
    steps_per_epoch = -(-n // cfg.batch_size)
    total_steps = num_epochs * steps_per_epoch
    return _FoldData(
        fold=fold, fold_dir=fold_dir, mean=mean, std=std,
        train_feats=train_feats, train_y=np.asarray(train_y, np.int32),
        test_feats=test_feats, test_y=np.asarray(test_y, np.int32),
        val_feats=val_feats,
        val_y=(np.asarray(val_y, np.int32) if val_y is not None else None),
        class_weights=np.asarray(class_weights, np.float32),
        steps_per_epoch=steps_per_epoch, total_steps=total_steps,
        warmup_steps=math.ceil(total_steps * cfg.warmup_ratio))


def _make_parallel_loss(cfg: L.TrainFoldConfig):
    """loss(logits, labels, mask, class_w) -> scalar, per fold (the vmapped
    counterpart of loop._make_loss; class_w is traced so folds can carry
    different inverse-frequency weights)."""
    if cfg.stage == "stage1":
        def loss(logits, labels, mask, class_w):
            return losses.stage1_loss(logits, labels, cfg.focal_gamma,
                                      cfg.label_smoothing, sample_mask=mask)
    elif cfg.use_focal_loss:
        def loss(logits, labels, mask, class_w):
            cw = class_w if cfg.use_class_weights else None
            return losses.stage2_focal_loss(
                logits, labels, cw, cfg.focal_alpha, cfg.focal_gamma,
                cfg.label_smoothing, sample_mask=mask)
    else:
        def loss(logits, labels, mask, class_w):
            cw = class_w if cfg.use_class_weights else None
            return losses.stage2_weighted_ce(logits, labels, cw,
                                             cfg.label_smoothing,
                                             sample_mask=mask)
    return loss


def _lr_factor(step, total_steps, warmup_steps):
    """optim.linear_schedule with per-fold (total, warmup) as traced args."""
    step = jnp.asarray(step, jnp.float32)
    warm = step / jnp.maximum(1.0, warmup_steps)
    decay = (total_steps - step) / jnp.maximum(1.0,
                                               total_steps - warmup_steps)
    return jnp.clip(jnp.where(step < warmup_steps, warm, decay), 0.0, 1.0)


def _make_parallel_train_step(cfg: L.TrainFoldConfig, model_cfg,
                              tx: optax.GradientTransformation):
    loss_fn = _make_parallel_loss(cfg)

    def fold_step(params, opt_state, feats, labels, mask, active, step_idx,
                  total_steps, warmup_steps, class_w):
        def objective(p):
            logits = ast_mod.forward(p, feats, model_cfg, dtype=cfg.dtype,
                                     remat=True)
            return loss_fn(logits, labels, mask, class_w)

        loss_val, grads = jax.value_and_grad(objective)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        lr = cfg.learning_rate * _lr_factor(step_idx, total_steps,
                                            warmup_steps)
        updates = jax.tree.map(lambda u: u * lr, updates)
        new_params = optax.apply_updates(params, updates)
        keep = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(active, a, b), new, old)
        return keep(new_params, params), keep(new_opt, opt_state), loss_val

    vstep = jax.vmap(fold_step)
    return jax.jit(vstep, donate_argnums=(0, 1))


def _make_parallel_eval_step(cfg: L.TrainFoldConfig, model_cfg):
    def fold_eval(params, feats):
        return ast_mod.forward(params, feats, model_cfg, dtype=cfg.dtype)

    return jax.jit(jax.vmap(fold_eval))


def _stacked_eval(eval_step, params_stacked, folds_data: list[_FoldData],
                  batch: int, shard) -> list[np.ndarray]:
    """Per-fold logits over each fold's eval split (val, or test when no
    val exists), evaluated fold-parallel on padded stacks; returns the
    valid prefixes."""
    sets = [fd.eval_feats for fd in folds_data]
    n_max = max(len(s) for s in sets)
    outs = [[] for _ in sets]
    for s in range(0, n_max, batch):
        chunk = np.zeros((len(sets), batch) + sets[0].shape[1:],
                         sets[0].dtype)
        for f, data in enumerate(sets):
            rows = data[s: s + batch]
            chunk[f, : len(rows)] = rows
        logits = np.asarray(eval_step(params_stacked, shard(chunk)))
        for f, data in enumerate(sets):
            k = min(batch, max(0, len(data) - s))
            if k:
                outs[f].append(logits[f, :k])
    return [np.concatenate(o) if o else np.zeros((0, 2)) for o in outs]


def _slice_fold(tree, f: int):
    """Host copy of one fold's slice of a stacked pytree."""
    return jax.tree.map(lambda a: np.asarray(a[f]), tree)


def train_folds_parallel(folds: list[int], cfg: L.TrainFoldConfig,
                         trackers: dict[int, Any] | None = None
                         ) -> list[dict[str, float]]:
    """Train all `folds` concurrently in one vmapped/jitted step (module
    docstring); returns the same per-fold metrics dicts as sequential
    train_fold calls, and writes the same on-disk artifacts (checkpoints,
    best/ export, evaluation dirs, history.json)."""
    if cfg.streaming:
        raise ValueError("fold-parallel training requires eager "
                         "featurization (drop --streaming)")
    if cfg.grad_accum > 1:
        raise ValueError("fold-parallel training does not implement "
                         "gradient accumulation; grow per-fold data "
                         "parallelism via data_per_fold instead")
    if cfg.resume:
        raise ValueError("fold-parallel training does not support --resume; "
                         "resume individual folds with the sequential path")
    if cfg.num_slices and cfg.num_slices > 1:
        raise ValueError("fold-parallel training shards the fold axis over "
                         "a flat mesh; --num-slices is not supported here")
    if cfg.on_epoch_end is not None:
        raise ValueError("fold-parallel training does not support the "
                         "on_epoch_end hook (sweep trials cut per trial; "
                         "use the sequential path)")
    data_per_fold = cfg.data_per_fold or 1
    if data_per_fold > 1 and not (cfg.num_devices and cfg.num_devices > 1):
        raise ValueError("data_per_fold > 1 requires num_devices > 1")
    fold_groups = ((cfg.num_devices or 1) // data_per_fold
                   if cfg.num_devices else None)
    if (cfg.num_devices and cfg.num_devices > 1):
        # validate BEFORE run dirs are backed up / data is featurized
        if cfg.num_devices % data_per_fold:
            raise ValueError(f"{cfg.num_devices} devices not divisible "
                             f"into groups of {data_per_fold}")
        if len(folds) % fold_groups:
            raise ValueError(f"{len(folds)} folds not divisible by "
                             f"{fold_groups} fold groups "
                             f"({cfg.num_devices} devices / "
                             f"{data_per_fold} per fold)")
        if data_per_fold > 1 and cfg.batch_size % data_per_fold:
            raise ValueError(f"batch_size {cfg.batch_size} not divisible "
                             f"by data_per_fold {data_per_fold}")
        if data_per_fold > 1 and cfg.eval_batch_size % data_per_fold:
            # eval_batch_size is not CLI-exposed: round UP instead of
            # erroring (eval chunk size only affects perf — same policy
            # as train_fold's mesh bump)
            bumped = (-(-cfg.eval_batch_size // data_per_fold)
                      * data_per_fold)
            print(f"[Mesh] eval_batch_size {cfg.eval_batch_size} -> "
                  f"{bumped} (rounded up to a {data_per_fold}-device "
                  f"group multiple)")
            cfg = dataclasses.replace(cfg, eval_batch_size=bumped)
    trackers = trackers or {}
    print(f"\n===== {cfg.stage} folds {list(folds)} (fold-parallel) =====")

    # model init once — identical for every fold (same seed/pretrained),
    # exactly as each sequential train_fold call would produce
    params0, model_cfg = L.init_model(cfg)

    folds_data = [_prepare_fold(f, cfg, model_cfg) for f in folds]
    F = len(folds_data)
    bs = cfg.batch_size
    num_epochs = 1 if cfg.dry_run else cfg.num_epochs
    max_steps = max(fd.steps_per_epoch for fd in folds_data)
    checkpoint_limit = 1 if cfg.dry_run else max(2, (cfg.num_epochs + 1) // 2)

    # fold axis over the mesh: one (or more) folds per device / device group
    from ..parallel import mesh as pmesh

    if data_per_fold > 1:
        mesh = pmesh.fold_data_mesh(cfg.num_devices, data_per_fold)
    else:
        mesh = pmesh.make_mesh(cfg.num_devices, axis_name=FOLD_AXIS)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        # per-fold state (stacked params/opt, per-fold scalars): sharded on
        # the fold axis, replicated across any data axis
        fold_sharding = NamedSharding(mesh, P(FOLD_AXIS))
        shard = lambda x: jax.device_put(x, fold_sharding)  # pytrees too
        if data_per_fold > 1:
            # batch-carrying stacks (F, bs, ...): each fold's rows sharded
            # across its group's data axis -> XLA inserts that fold's
            # gradient all-reduce over the group's ICI only
            batch_sharding = NamedSharding(mesh, P(FOLD_AXIS,
                                                   pmesh.DATA_AXIS))
            shard_b = lambda x: jax.device_put(x, batch_sharding)
            print(f"[Mesh] {F} folds over {mesh.devices.size} devices: "
                  f"{mesh.shape[FOLD_AXIS]} fold groups x "
                  f"{data_per_fold} data-parallel devices each")
        else:
            shard_b = shard
            print(f"[Mesh] {F} folds over {mesh.devices.size} devices "
                  f"(axis '{FOLD_AXIS}')")
    else:
        shard = lambda x: jax.tree.map(jnp.asarray, x)
        shard_b = shard

    # stacked params / optimizer state; tx carries lr=1.0 (per-fold schedule
    # factor is applied inside the step — module docstring)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(1.0, b1=0.9, b2=cfg.adam_beta2, eps=1e-8,
                    weight_decay=cfg.weight_decay, mask=optim.decay_mask))
    params = shard(jax.tree.map(
        lambda a: np.broadcast_to(np.asarray(a), (F,) + np.shape(a)).copy(),
        params0))
    opt_state = jax.vmap(tx.init)(params)

    train_step = _make_parallel_train_step(cfg, model_cfg, tx)
    eval_step = _make_parallel_eval_step(cfg, model_cfg)

    total_arr = shard(np.asarray([fd.total_steps for fd in folds_data],
                                 np.float32))
    warm_arr = shard(np.asarray([fd.warmup_steps for fd in folds_data],
                                np.float32))
    cw_arr = shard(np.stack([fd.class_weights for fd in folds_data]))

    # host-side per-fold loop state (loop.FoldProgress, shared bookkeeping)
    epoch_rngs = [np.random.default_rng(cfg.seed) for _ in folds_data]
    progs = [L.FoldProgress(patience_left=cfg.early_stopping_patience)
             for _ in folds_data]

    feat_shape = folds_data[0].train_feats.shape[1:]
    for epoch in range(1, num_epochs + 1):
        orders = [rng.permutation(len(fd.train_feats))
                  if not progs[f].stopped else None
                  for f, (rng, fd) in enumerate(zip(epoch_rngs, folds_data))]
        epoch_loss = np.zeros(F)
        for s_idx in range(max_steps):
            feats = np.zeros((F, bs) + feat_shape, np.float32)
            labels = np.zeros((F, bs), np.int32)
            mask = np.zeros((F, bs), np.float32)
            active = np.zeros(F, bool)
            step_idx = np.zeros(F, np.float32)
            counts = np.zeros(F, int)
            for f, fd in enumerate(folds_data):
                if progs[f].stopped or s_idx >= fd.steps_per_epoch:
                    continue
                idx = orders[f][s_idx * bs: (s_idx + 1) * bs]
                feats[f, : len(idx)] = fd.train_feats[idx]
                labels[f, : len(idx)] = fd.train_y[idx]
                mask[f, : len(idx)] = 1.0
                active[f] = True
                counts[f] = len(idx)
                step_idx[f] = (epoch - 1) * fd.steps_per_epoch + s_idx
            if not active.any():
                continue
            params, opt_state, loss_vals = train_step(
                params, opt_state, shard_b(feats), shard_b(labels),
                shard_b(mask), shard(active), shard(step_idx), total_arr,
                warm_arr, cw_arr)
            loss_np = np.asarray(loss_vals)
            epoch_loss += np.where(active, loss_np * counts, 0.0)
            if cfg.logging_steps and trackers:
                # the reference's per-step loss channel (HF logging_steps),
                # same payload as the sequential trainer's (loop.py)
                for f, fd in enumerate(folds_data):
                    tr = trackers.get(fd.fold)
                    gstep = int(step_idx[f]) + 1
                    if (tr is not None and active[f]
                            and gstep % cfg.logging_steps == 0):
                        tr.log({"fold": fd.fold, "train_step": gstep,
                                "train_step_loss": float(loss_np[f])})

        eval_logits = _stacked_eval(eval_step, params, folds_data,
                                    cfg.eval_batch_size, shard_b)
        for f, fd in enumerate(folds_data):
            prog = progs[f]
            if prog.stopped:
                continue
            m = metrics_mod.compute_metrics_from_logits(eval_logits[f],
                                                        fd.eval_y)
            m["loss"] = float(epoch_loss[f] / len(fd.train_feats))
            prog.history.append({"epoch": epoch, **m})
            print(f"[Fold {fd.fold} Epoch {epoch}/{num_epochs}] "
                  f"loss={m['loss']:.4f} eval_f1={m['f1']:.4f} "
                  f"acc={m['accuracy']:.4f}")
            tr = trackers.get(fd.fold)
            if tr is not None:
                tr.log({"fold": fd.fold, "epoch": epoch,
                        **{f"eval_{k}" if k != "loss" else "train_loss": v
                           for k, v in m.items()}})

            L.epoch_bookkeeping(
                cfg, fd.fold_dir, epoch, fd.steps_per_epoch,
                checkpoint_limit, m, fd.has_val, prog,
                snapshot=lambda f=f: (
                    _slice_fold(params, f),
                    L.sequential_opt_layout(_slice_fold(opt_state, f))),
                rng_state=epoch_rngs[f].bit_generator.state,
                label=f" fold {fd.fold}:")
        if all(p.stopped for p in progs):
            break

    # finalize each fold through the helper shared with the sequential
    # trainer: best export + metrics + CM artifacts
    all_metrics = []
    single_eval = steps.make_eval_step(model_cfg, dtype=cfg.dtype)
    for f, fd in enumerate(folds_data):
        prog = progs[f]
        if prog.best_params is None:
            prog.best_params = _slice_fold(params, f)
        all_metrics.append(L.finalize_fold(
            fd.fold, cfg, fd.fold_dir, model_cfg, fd.mean, fd.std,
            prog.best_params, prog.best_epoch, prog.best_f1, fd.eval_feats,
            fd.eval_y, fd.has_val, fd.test_feats, fd.test_y, single_eval,
            jnp.asarray, trackers.get(fd.fold), prog.history,
            class_weights=(fd.class_weights if cfg.use_class_weights
                           else None)))
    return all_metrics
