"""Fine-tuning loop: the HF-Trainer-equivalent for this framework.

Replicates the training behavior of the reference's per-fold pipeline
(src/train_ast_stage1_cross_validation.py:417-645 and the stage-2 twin):

  run-dir backup -> per-fold normalization -> pretrained load + 2-class head
  re-init -> eager dataset featurization (augment train split once, like the
  reference's `datasets.map`) -> epoch loop (batch 16, eval+checkpoint per
  epoch, best-on-F1, early stop patience 2 / threshold 0.001 when a val
  split exists) -> export `fold{k}/best/` as an HF model dir (+ feature
  extractor config so the deployed mean/std travels with the model) ->
  val/test confusion matrices -> cross-fold mean/std aggregation
  (cv_metrics.npy/.txt).

TPU structure: featurization runs batched on device via the fbank op; the
train step is one jitted fwd+bwd+AdamW update. With cfg.num_devices > 1
(CLI --num-devices) params/optimizer state are replicated over a 1-D data
mesh and each batch is sharded across it — XLA inserts the gradient
all-reduce (psum over ICI). Tail batches that don't divide evenly run
unsharded (params stay mesh-replicated through them), so multi-device
training is bit-compatible with single-device up to float reassociation
(tests/test_multichip.py).
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import time
from datetime import datetime
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import io as aio
from ..data import augment as aug
from ..data import stats as stats_mod
from ..models import ast as ast_mod
from ..models import convert
from ..ops import fbank as F
from ..parallel import mesh as pmesh
from ..utils import fsio
from . import losses, metrics as metrics_mod, optim, steps

SAMPLING_RATE = 16000
NUM_EPOCHS = 10
SEED = 42

STAGE_LABELS = {
    "stage1": ["Idle", "Swallow"],
    "stage2": ["Healthy", "Zenker"],
}


@dataclasses.dataclass
class TrainFoldConfig:
    stage: str = "stage1"
    data_dir: str = "data_ast_stage1"
    output_root: str = "runs/ast_classifier_stage1"
    pretrained_model_dir: str | None = None  # HF dir; None -> random init
    num_epochs: int = NUM_EPOCHS
    batch_size: int = 16
    eval_batch_size: int = 8
    learning_rate: float = 5e-5
    weight_decay: float = 0.01
    warmup_ratio: float = 0.1
    adam_beta2: float = 0.98
    focal_gamma: float = 0.0
    label_smoothing: float = 0.0
    # stage2 extras (ImprovedWeightedTrainer)
    use_class_weights: bool = False
    focal_alpha: float | None = 0.25
    use_focal_loss: bool = True
    enable_early_stopping: bool = True
    early_stopping_patience: int = 2
    early_stopping_threshold: float = 0.001
    augment: bool = True
    dry_run: bool = False
    seed: int = SEED
    dtype: Any = jnp.bfloat16
    # resume from the latest checkpoint-* in the fold dir (params, optimizer
    # state, RNG, best-model tracking all restored). The reference never
    # exposed HF's resume_from_checkpoint (SURVEY §5.4); here it's first-class.
    resume: bool = False
    # optional hook: on_epoch_end(epoch, metrics_dict) -> True to stop early
    # (used by the sweep agent's Hyperband-style early termination)
    on_epoch_end: Any = None
    # data-parallel mesh size (SURVEY §2.4): params/opt-state replicated,
    # batch axis sharded over a 1-D "data" mesh. None/1 = single device.
    num_devices: int | None = None
    # multi-slice DP: split the num_devices into this many DCN-connected
    # slices — a hierarchical ("dcn", "data") mesh whose gradient
    # all-reduce rides ICI within each slice first (parallel/mesh.py).
    num_slices: int | None = None
    # short-sequence mode: fine-tune at this input frame count instead of
    # the checkpoint's (1024 for the AudioSet AST). Pretrained positional
    # embeddings are cut/extended on the time axis (the AST authors' own
    # transfer trick, models/ast.py adapt_max_length); 1 s clips produce 98
    # frames, so max_length=128 trains the same windows with ~10x fewer
    # FLOPs than the reference's 1024-frame padding. None = keep the
    # checkpoint's length.
    max_length: int | None = None
    # stream the train split per batch (O(batch) host memory + background
    # prefetch) instead of eager whole-split featurization; numerics are
    # identical (FeatureStream docstring). Use for corpora past the eager
    # path's ~5 GB/10k-clip ceiling.
    streaming: bool = False
    # per-step train-loss logging cadence into the tracker (the reference's
    # HF Trainer logging_strategy="steps", logging_steps=20,
    # src/train_ast_stage1_cross_validation.py:490-491); 0 disables
    logging_steps: int = 20
    # train all target folds concurrently in one vmapped step, fold axis
    # sharded over num_devices (train/fold_parallel.py) — the TPU-native
    # answer to the reference's sequential 5-fold loop. Per-fold numerics
    # identical to sequential training; incompatible with streaming/resume.
    fold_parallel: bool = False
    # fold_parallel only: give each concurrent fold its own group of this
    # many devices and shard the fold's batch across the group — a 2-D
    # ("fold", "data") mesh (parallel/mesh.py:fold_data_mesh). Each fold's
    # gradient all-reduce stays inside its group's ICI; across groups there
    # are no collectives. num_devices must be group_size * group_count.
    # None/1 = the flat 1-D fold mesh.
    data_per_fold: int | None = None
    # beyond-parity batch scaling: accumulate this many micro-batches of
    # batch_size before each optimizer update (effective batch =
    # batch_size * grad_accum; num_devices shards each batch, it does not
    # grow it). The LR schedule counts OPTIMIZER steps, so warmup_ratio
    # keeps its meaning; pair with a linearly scaled learning rate (see
    # steps.make_accum_steps and the ROOFLINE batch-scaling section).
    # 1 = the parity path (batch 16, one update per batch, reference :484).
    grad_accum: int = 1


def backup_existing_run_dir(path: str) -> str | None:
    """Timestamped copy of a non-empty run dir before overwrite
    (src/train_ast_stage1_cross_validation.py:188-232)."""
    if not os.path.isdir(path) or not any(os.scandir(path)):
        return None
    try:
        ts = datetime.fromtimestamp(os.stat(path).st_mtime)
    except OSError:
        ts = datetime.now()
    base = f"{os.path.normpath(path)}_{ts.strftime('%Y%m%d_%H%M%S')}"
    backup = base
    counter = 1
    while os.path.exists(backup):
        backup = f"{base}_{counter}"
        counter += 1
    print(f"[RunBackup] Existing run dir detected; copying '{path}' -> '{backup}'")
    shutil.copytree(path, backup)
    return backup


# ---------------------------------------------------------------------------
# Featurization (device-batched replacement for the eager datasets.map)
# ---------------------------------------------------------------------------


def to_waveform(entry) -> np.ndarray:
    """Audio payload -> 16 kHz float32 waveform. Accepts a path, an ndarray
    (assumed 16 kHz), or a dict {"array"/"audio"/"values", "sampling_rate"}
    — the reference analyzer's payload contract
    (utils/analyze_ROC_PR_stage1.py:132-155). int16 payloads are PCM and
    scaled by 1/32768, matching ops/fbank.logmel_frames' device-side
    convention (everything else is assumed already float-scaled)."""
    if isinstance(entry, np.ndarray):
        if entry.dtype == np.int16:
            return entry.astype(np.float32) * (1.0 / 32768.0)
        return entry.astype(np.float32)
    if isinstance(entry, dict):
        arr = entry.get("array")
        if arr is None:
            arr = entry.get("audio")
        if arr is None:
            arr = entry.get("values")
        if arr is None:
            raise ValueError("Unsupported dict payload for audio sample.")
        arr = np.asarray(arr)
        if arr.dtype == np.int16:
            arr = arr.astype(np.float32) * (1.0 / 32768.0)
        else:
            arr = arr.astype(np.float32)
        sr = (entry.get("sampling_rate") or entry.get("sampling_rate_hz")
              or SAMPLING_RATE)
        if sr != SAMPLING_RATE:
            from ..ops import resample as R

            arr = R.resample(arr, int(sr), SAMPLING_RATE)
        return arr
    if isinstance(entry, (str, os.PathLike)):
        return aio.load_audio(str(entry), SAMPLING_RATE)
    raise TypeError(f"Unsupported audio payload type: {type(entry)}")


def _spawn_example_rngs(augment_rng, n: int) -> list:
    """Independent per-example generators (SeedSequence spawn): results
    don't depend on worker scheduling, and the SAME seed yields the SAME
    augmentation per example whether featurized eagerly or streamed."""
    if augment_rng is None:
        return [None] * n
    seeds = augment_rng.bit_generator.seed_seq.spawn(n)
    return [np.random.default_rng(s) for s in seeds]


def _featurize_waves(waves, mean: float, std: float, max_frames: int,
                     batch: int) -> np.ndarray:
    """Decoded waveforms -> (N, max_frames, 128) normalized features,
    device-batched by length."""
    out = np.empty((len(waves), max_frames, F.NUM_MEL_BINS), np.float32)
    denom = 2.0 * std
    pad_value = (0.0 - mean) / denom  # HF pads raw fbank, then normalizes
    out[:] = pad_value

    by_len: dict[int, list[int]] = {}
    for i, w in enumerate(waves):
        by_len.setdefault(len(w), []).append(i)
    for length, idxs in by_len.items():
        n_frames = min(F.num_frames(length), max_frames)
        if n_frames <= 0:  # sub-frame clip: all-pad features
            continue
        for s in range(0, len(idxs), batch):
            chunk = idxs[s: s + batch]
            stackw = np.stack([waves[i] for i in chunk])
            raw = np.asarray(_jit_logmel(jnp.asarray(stackw)))
            out[chunk, :n_frames] = (raw[:, :n_frames] - mean) / denom
    return out


def _decode_entries(entries, ex_rngs, workers: int | None = None) -> list:
    """Decode (+augment) entries on a host thread pool (the reference's CPU
    hot loops #1/#2, SURVEY §3.1, parallelized)."""
    from concurrent.futures import ThreadPoolExecutor

    def prepare(i):
        w = to_waveform(entries[i])
        if ex_rngs[i] is not None:
            w = aug.augment_waveform(w, ex_rngs[i])
        return w

    workers = workers or min(16, os.cpu_count() or 4)
    if len(entries) > 1 and workers > 1:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            return list(pool.map(prepare, range(len(entries))))
    return [prepare(i) for i in range(len(entries))]


def featurize_paths(paths, mean: float, std: float,
                    augment_rng: np.random.Generator | None = None,
                    batch: int = 32, workers: int | None = None,
                    max_frames: int = F.MAX_FRAMES) -> np.ndarray:
    """Decode -> (augment) -> fbank+normalize the WHOLE split eagerly.
    Entries may be paths, ndarrays, or dict payloads (see to_waveform).

    Memory ceiling (like the reference's eager `datasets.map`): the split is
    materialized as (N, max_frames, 128) float32 on host — 512 KB/clip at
    1024 frames, ~5 GB at 10k clips. The study's splits are ~4k clips
    (BASELINE.md CM sums); for larger corpora use FeatureStream
    (TrainFoldConfig.streaming), which featurizes per batch with identical
    numerics."""
    ex_rngs = _spawn_example_rngs(augment_rng, len(paths))
    waves = _decode_entries(paths, ex_rngs, workers)
    return _featurize_waves(waves, mean, std, max_frames, batch)


class FeatureStream:
    """Lazy, O(batch)-memory featurization with background prefetch.

    Identical numerics to `featurize_paths`: per-example augmentation
    generators are spawned once up front, so `gather(idx)` returns the same
    features eager featurization would have put at those rows, regardless
    of batch composition or epoch order. `prefetch(idx)` overlaps the next
    batch's host decode/augment/fbank with the current device step."""

    def __init__(self, entries, mean: float, std: float,
                 augment_rng: np.random.Generator | None = None,
                 max_frames: int = F.MAX_FRAMES, batch: int = 32):
        from concurrent.futures import ThreadPoolExecutor

        self._entries = list(entries)
        self._mean, self._std = mean, std
        self._max_frames, self._batch = max_frames, batch
        # store SEEDS, not generators: a fresh generator per gather makes
        # every epoch's features identical to each other and to the eager
        # path (the reference augments once at map time, SURVEY §3.1)
        self._seeds = (augment_rng.bit_generator.seed_seq.spawn(
            len(self._entries)) if augment_rng is not None
            else [None] * len(self._entries))
        self._pool = ThreadPoolExecutor(max_workers=1)
        self._pending: tuple | None = None  # (key, future)

    def __len__(self):
        return len(self._entries)

    def _compute(self, idx) -> np.ndarray:
        rngs = [np.random.default_rng(self._seeds[i])
                if self._seeds[i] is not None else None for i in idx]
        waves = _decode_entries([self._entries[i] for i in idx], rngs)
        return _featurize_waves(waves, self._mean, self._std,
                                self._max_frames, self._batch)

    def prefetch(self, idx) -> None:
        idx = np.asarray(idx)
        self._pending = (idx.tobytes(), self._pool.submit(self._compute, idx))

    def gather(self, idx) -> np.ndarray:
        idx = np.asarray(idx)
        if self._pending is not None and self._pending[0] == idx.tobytes():
            fut = self._pending[1]
            self._pending = None
            return fut.result()
        self._pending = None
        return self._compute(idx)

    def close(self):
        self._pool.shutdown(wait=False)


# jit caches one executable per input shape; shape determines frame count
_jit_logmel = jax.jit(lambda w: F.logmel_frames(w, F.num_frames(w.shape[-1])))


def _load_split(data_dir, split, fold):
    x_path = os.path.join(data_dir, f"{split}_x_fold{fold}.npy")
    y_path = os.path.join(data_dir, f"{split}_y_fold{fold}.npy")
    if not (os.path.exists(x_path) and os.path.exists(y_path)):
        return None, None
    x = fsio.load_npy(x_path, "split paths", allow_pickle=True).tolist()
    y = np.asarray(fsio.load_npy(y_path, "split labels", allow_pickle=True),
                   dtype=np.int32)
    return x, y


def save_feature_extractor_config(path: str, mean: float, std: float,
                                  max_length: int = F.MAX_FRAMES) -> None:
    """preprocessor_config.json compatible with ASTFeatureExtractor."""
    with open(os.path.join(path, "preprocessor_config.json"), "w") as f:
        json.dump({
            "feature_extractor_type": "ASTFeatureExtractor",
            "feature_size": 1,
            "sampling_rate": SAMPLING_RATE,
            "num_mel_bins": F.NUM_MEL_BINS,
            "max_length": max_length,
            "padding_side": "right",
            "padding_value": 0.0,
            "return_attention_mask": False,
            "do_normalize": True,
            "mean": float(mean),
            "std": float(std),
        }, f, indent=2)


def load_feature_extractor_config(model_dir: str) -> tuple[float, float]:
    p = os.path.join(model_dir, "preprocessor_config.json")
    d = fsio.load_json_object(p, "feature-extractor config")
    try:
        return float(d["mean"]), float(d["std"])
    except (KeyError, TypeError, ValueError) as e:
        raise ValueError(f"feature-extractor config {p} has missing or "
                         f"non-numeric mean/std: {e!r}") from e


# ---------------------------------------------------------------------------
# The fold trainer
# ---------------------------------------------------------------------------


def _make_loss(cfg: TrainFoldConfig, class_weights):
    if cfg.stage == "stage1":
        def loss(logits, labels):
            return losses.stage1_loss(logits, labels, cfg.focal_gamma,
                                      cfg.label_smoothing)
    elif cfg.use_focal_loss:
        def loss(logits, labels):
            return losses.stage2_focal_loss(
                logits, labels, class_weights, cfg.focal_alpha,
                cfg.focal_gamma, cfg.label_smoothing)
    else:
        def loss(logits, labels):
            return losses.stage2_weighted_ce(logits, labels, class_weights,
                                             cfg.label_smoothing)
    return loss


def _predict(eval_step, params, feats, batch: int,
             shard=jnp.asarray) -> np.ndarray:
    # commit params once: numpy leaves passed as jit args are re-transferred
    # on EVERY call (340 MB/batch over the 40 MB/s axon tunnel)
    params = jax.tree.map(jnp.asarray, params)
    outs = []
    n = len(feats)
    for s in range(0, n, batch):
        chunk = feats[s: s + batch]
        pad = batch - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:],
                                                    chunk.dtype)])
        logits = np.asarray(eval_step(params, shard(chunk)))
        outs.append(logits[: batch - pad])
    return np.concatenate(outs) if outs else np.zeros((0, 2))


def prepare_fold_dir(fold: int, cfg: TrainFoldConfig
                     ) -> tuple[str, float, float]:
    """Run-dir backup + normalization-stat resolution shared by the
    sequential and fold-parallel trainers (reference :433-443, :235-282)."""
    fold_dir = os.path.join(cfg.output_root, f"fold{fold}")
    if not cfg.resume and backup_existing_run_dir(fold_dir):
        shutil.rmtree(fold_dir)
        print(f"[RunBackup] Cleared original run dir '{fold_dir}' after backup.")
    os.makedirs(fold_dir, exist_ok=True)
    mean, std, src = stats_mod.load_fold_normalization(cfg.data_dir, fold)
    print(f"[Normalization] fold {fold}: mean={mean:.6f} std={std:.6f} ({src})")
    return fold_dir, mean, std


def init_model(cfg: TrainFoldConfig):
    """(params, model_cfg): pretrained load + fresh 2-class head (the
    reference's ignore_mismatched_sizes + init_weights dance), with optional
    short-sequence positional-embedding adaptation. Deterministic in
    cfg.seed, so every fold starts from the identical tree."""
    rng_key = jax.random.PRNGKey(cfg.seed)
    if cfg.pretrained_model_dir:
        params, model_cfg = convert.load_hf_model_dir(cfg.pretrained_model_dir)
        if "kernel_int8" in params.get("encoder", {}).get("q", {}):
            raise ValueError(
                f"{cfg.pretrained_model_dir} is an int8 inference export "
                "(model_int8.safetensors) — quantization is lossy and not "
                "trainable; fine-tune from the f32 dir and re-export")
        if model_cfg.num_labels != 2:
            model_cfg = dataclasses.replace(model_cfg, num_labels=2)
        params = ast_mod.reinit_head(rng_key, params, model_cfg, 2)
        if cfg.max_length and cfg.max_length != model_cfg.max_length:
            params, model_cfg = ast_mod.adapt_max_length(
                params, model_cfg, cfg.max_length)
            print(f"[MaxLength] adapted positional embeddings to "
                  f"{cfg.max_length} frames ({model_cfg.seq_length} tokens)")
    else:
        print("[WARN] no pretrained model dir; random init")
        model_cfg = ast_mod.ASTConfig(num_labels=2,
                                      max_length=cfg.max_length or 1024)
        params = ast_mod.init_params(rng_key, model_cfg)
    return params, model_cfg


def load_fold_splits(fold: int, cfg: TrainFoldConfig):
    """(train_x, train_y, test_x, test_y, val_x, val_y) with dry-run
    truncation and the reference's label sanity checks (:355-369)."""
    train_x, train_y = _load_split(cfg.data_dir, "train", fold)
    test_x, test_y = _load_split(cfg.data_dir, "test", fold)
    val_x, val_y = _load_split(cfg.data_dir, "val", fold)
    if train_x is None or test_x is None:
        raise FileNotFoundError(
            f"missing train/test npy files for fold {fold} in {cfg.data_dir}")
    if cfg.dry_run:
        train_x, train_y = train_x[:32], train_y[:32]
        test_x, test_y = test_x[:32], test_y[:32]
        if val_x is not None:
            val_x, val_y = val_x[:32], val_y[:32]
    for name, arr in [("train_y", train_y), ("test_y", test_y)] + (
            [("val_y", val_y)] if val_x is not None else []):
        uniq = sorted(set(arr.tolist()))
        if any(v not in (0, 1) for v in uniq):
            raise ValueError(f"Unexpected labels in {name} fold {fold}: {uniq}")
        if len(uniq) < 2:
            print(f"[WARN] Fold {fold} {name} single class: {uniq}")
    return train_x, train_y, test_x, test_y, val_x, val_y


def finalize_fold(fold: int, cfg: TrainFoldConfig, fold_dir: str, model_cfg,
                  mean: float, std: float, best_params, best_epoch: int,
                  best_f1: float, eval_feats, eval_y, has_val: bool,
                  test_feats, test_y, eval_step, shard, tracker,
                  history, class_weights=None) -> dict[str, float]:
    """Best-model export + final metrics + CM artifacts, shared by both
    trainers (mirrors the reference's fold{k}/best export and per-split
    reports, :521-524, :542-644). The per-split metric dicts are shaped
    like `trainer.evaluate()` output — eval_-prefixed sklearn metrics plus
    eval_loss, speed metrics and the final epoch — so cv_metrics.npy keys
    match the executed reference (test_trainer_exec_parity.py)."""
    print(f"[Best] fold {fold}: epoch {best_epoch} eval_f1={best_f1:.4f}")
    best_dir = os.path.join(fold_dir, "best")
    labels_map = {i: name for i, name in enumerate(STAGE_LABELS[cfg.stage])}
    convert.save_hf_model_dir(best_params, model_cfg, best_dir, labels_map)
    save_feature_extractor_config(best_dir, mean, std,
                                  max_length=model_cfg.max_length)

    loss_fn = _make_loss(cfg, class_weights)
    final_epoch = (float(history[-1]["epoch"]) if history
                   else float(max(best_epoch, 0)))
    metrics: dict[str, float] = {}
    prefix = "val" if has_val else "test_during_train"
    t0 = time.perf_counter()
    logits = _predict(eval_step, best_params, eval_feats, cfg.eval_batch_size,
                      shard=shard)
    eval_rt = time.perf_counter() - t0
    for k, v in metrics_mod.hf_eval_metrics(
            logits, eval_y, runtime=eval_rt, epoch=final_epoch,
            batch_size=cfg.eval_batch_size,
            loss=losses.hf_eval_loss(loss_fn, logits, eval_y,
                                     cfg.eval_batch_size)).items():
        metrics[f"fold{fold}_{prefix}_{k}"] = v
    if eval_feats is test_feats:
        # no val split: the eval split IS the test split — reuse the pass
        # above instead of running an identical full forward again
        test_logits = logits
        test_rt = eval_rt
    else:
        t0 = time.perf_counter()
        test_logits = _predict(eval_step, best_params, test_feats,
                               cfg.eval_batch_size, shard=shard)
        test_rt = time.perf_counter() - t0
    for k, v in metrics_mod.hf_eval_metrics(
            test_logits, test_y, runtime=test_rt, epoch=final_epoch,
            batch_size=cfg.eval_batch_size,
            loss=losses.hf_eval_loss(loss_fn, test_logits, test_y,
                                     cfg.eval_batch_size)).items():
        metrics[f"fold{fold}_test_{k}"] = v
        if cfg.stage == "stage2":
            # the stage-2 reference also duplicates test metrics under
            # generic names for sweep optimization
            # (train_ast_stage2_cross_validation.py:592-597)
            metrics[f"test_{k.replace('eval_', '')}"] = v

    if not cfg.dry_run:
        splits = [("test", test_logits, test_y)]
        if has_val:
            splits.append(("val", logits, eval_y))
        for split_name, lg, yy in splits:
            cm, report = metrics_mod.confusion_and_report(
                yy, lg.argmax(1), STAGE_LABELS[cfg.stage])
            eval_dir = os.path.join(best_dir, f"evaluation_{split_name}")
            os.makedirs(eval_dir, exist_ok=True)
            np.save(os.path.join(eval_dir, "confusion_matrix.npy"), cm)
            with open(os.path.join(eval_dir, "classification_report.txt"),
                      "w") as f:
                f.write(report)
            if tracker is not None:
                _track_split_report(tracker, cfg.stage, fold, split_name, cm,
                                    yy, lg.argmax(1), eval_dir)

    with open(os.path.join(fold_dir, "history.json"), "w") as f:
        json.dump(history, f, indent=2)
    return metrics


@dataclasses.dataclass
class FoldProgress:
    """Per-fold/trial epoch-end bookkeeping state, shared by the
    sequential, fold-parallel and trial-parallel trainers."""
    patience_left: int
    best_f1: float = -1.0
    best_params: Any = None
    best_epoch: int = -1
    stopped: bool = False
    history: list = dataclasses.field(default_factory=list)
    checkpoints: list = dataclasses.field(default_factory=list)


def epoch_bookkeeping(cfg: TrainFoldConfig, fold_dir: str, epoch: int,
                      steps_per_epoch: int, checkpoint_limit: int, m: dict,
                      has_val: bool, prog: FoldProgress, snapshot,
                      rng_state, label: str = "") -> None:
    """The epoch tail every trainer shares: best-F1/patience update
    (reference load_best_model_at_end + EarlyStoppingCallback semantics),
    best-weights persist for resume, rotating full checkpoint
    (save_total_limit), and the early-stop decision — sets prog.stopped.
    `snapshot()` -> (params_host, opt_state) for this fold/trial; the
    caller appends to prog.history BEFORE calling."""
    params_now, opt_now = snapshot()
    f1 = m["f1"]
    # HF EarlyStoppingCallback.check_metric_value resets the patience
    # counter on the FIRST eval unconditionally, afterwards only when the
    # metric is strictly greater AND the margin (computed as a difference,
    # not a shifted comparison — bit-faithful at threshold boundaries)
    # strictly exceeds the threshold. The no-threshold best update below
    # mirrors Trainer._determine_best_metric, which runs AFTER on_evaluate —
    # so each epoch's patience check compares against the previous epoch's
    # best (test_trainer_exec_parity.py drives the real callback).
    if prog.best_f1 < 0 or (
            f1 > prog.best_f1
            and (f1 - prog.best_f1) > cfg.early_stopping_threshold):
        prog.best_f1, prog.best_params, prog.best_epoch = f1, params_now, epoch
        prog.patience_left = cfg.early_stopping_patience
    else:
        if f1 > prog.best_f1:
            prog.best_f1 = f1
            prog.best_params = params_now
            prog.best_epoch = epoch
        prog.patience_left -= 1

    if prog.best_epoch == epoch:  # persist best weights for resume
        convert.write_safetensors(
            {k: np.asarray(v, np.float32)
             for k, v in _flatten(prog.best_params).items()},
            os.path.join(fold_dir, "best_params.safetensors"))

    ck = os.path.join(fold_dir, f"checkpoint-{epoch * steps_per_epoch}")
    save_checkpoint(ck, params_now, opt_now, {
        "epoch": epoch, "best_f1": prog.best_f1,
        "best_epoch": prog.best_epoch,
        "patience_left": prog.patience_left,
        "rng_state": rng_state,
        "history": prog.history,
    })
    prog.checkpoints.append(ck)
    while len(prog.checkpoints) > checkpoint_limit:
        shutil.rmtree(prog.checkpoints.pop(0), ignore_errors=True)

    if has_val and cfg.enable_early_stopping and prog.patience_left <= 0:
        print(f"[EarlyStop]{label} no f1 improvement > "
              f"{cfg.early_stopping_threshold} for "
              f"{cfg.early_stopping_patience} epochs")
        prog.stopped = True


def train_fold(fold: int, cfg: TrainFoldConfig,
               tracker=None) -> dict[str, float]:
    """`tracker`: optional utils.tracking.Run; receives per-epoch metrics,
    confusion-matrix plots, and classification-report tables (the
    reference's W&B channels, src/train_ast_stage1_cross_validation.py:
    564-637)."""
    print(f"\n===== {cfg.stage} Fold {fold} =====")
    mesh = pmesh.make_mesh(cfg.num_devices, cfg.num_slices)
    if mesh is not None:
        topo = " x ".join(f"{mesh.shape[a]} ({a})" for a in mesh.axis_names)
        print(f"[Mesh] data-parallel training over "
              f"{mesh.devices.size} devices: {topo}")
        # _shard's single-device fallback exists for TAIL batches; a batch
        # size that never divides would silently run the whole fine-tune on
        # one device while the banner above claims otherwise — reject it
        # (batch_size is CLI-exposed, so the user can fix it).
        if cfg.batch_size % mesh.devices.size != 0:
            raise ValueError(
                f"batch_size {cfg.batch_size} is not divisible by the "
                f"{mesh.devices.size}-device mesh; every batch would fall "
                f"back to a single device — choose a batch_size divisible "
                f"by num_devices")
        # eval_batch_size is NOT CLI-exposed and only affects eval-side
        # perf (per-sample logits are chunk-size independent): round it UP
        # to the next mesh multiple instead of erroring
        if cfg.eval_batch_size % mesh.devices.size != 0:
            bumped = -(-cfg.eval_batch_size // mesh.devices.size) \
                * mesh.devices.size
            print(f"[Mesh] eval_batch_size {cfg.eval_batch_size} -> "
                  f"{bumped} (rounded up to a {mesh.devices.size}-device "
                  f"multiple so eval chunks shard)")
            cfg = dataclasses.replace(cfg, eval_batch_size=bumped)
    fold_dir, mean, std = prepare_fold_dir(fold, cfg)

    def _shard(x):
        """Batch to device: sharded over the mesh when it divides evenly,
        plain single-device array otherwise (tail batches; params stay
        mesh-replicated through them — GSPMD reshards transparently)."""
        x = np.asarray(x)
        if mesh is not None and len(x) % mesh.devices.size == 0:
            return pmesh.shard_batch(x, mesh)
        return jnp.asarray(x)

    params, model_cfg = init_model(cfg)
    train_x, train_y, test_x, test_y, val_x, val_y = load_fold_splits(fold,
                                                                      cfg)

    aug_rng = np.random.default_rng(cfg.seed) if cfg.augment else None
    mf = model_cfg.max_length
    if cfg.streaming:
        train_feats = FeatureStream(train_x, mean, std, aug_rng,
                                    max_frames=mf)
    else:
        train_feats = featurize_paths(train_x, mean, std, aug_rng,
                                      max_frames=mf)
    test_feats = featurize_paths(test_x, mean, std, max_frames=mf)
    val_feats = (featurize_paths(val_x, mean, std, max_frames=mf)
                 if val_x is not None else None)
    has_val = val_feats is not None

    class_weights = None
    if cfg.stage == "stage2" and cfg.use_class_weights:
        class_weights = losses.inverse_frequency_weights(train_y)
        print(f"[ClassWeights] {class_weights}")

    n = len(train_feats)
    num_epochs = 1 if cfg.dry_run else cfg.num_epochs
    steps_per_epoch = -(-n // cfg.batch_size)
    # the LR schedule counts OPTIMIZER steps: with gradient accumulation
    # there is one update per `accum` micro-batches, so warmup_ratio and
    # the decay keep their meaning at any effective batch size
    accum = max(1, cfg.grad_accum)
    opt_steps_per_epoch = -(-steps_per_epoch // accum)
    total_steps = num_epochs * opt_steps_per_epoch
    tx = optim.make_optimizer(cfg.learning_rate, total_steps,
                              cfg.warmup_ratio, cfg.weight_decay,
                              beta2=cfg.adam_beta2)
    opt_state = tx.init(params)
    loss_fn = _make_loss(cfg, class_weights)
    if accum > 1:
        print(f"[GradAccum] {accum} micro-batches of {cfg.batch_size} per "
              f"update (effective batch {accum * cfg.batch_size}"
              f"{' per device group' if mesh is not None else ''})")
        grad_step, apply_step = steps.make_accum_steps(
            tx, model_cfg, loss_fn, dtype=cfg.dtype)
        train_step = None
    else:
        train_step = steps.make_train_step(tx, model_cfg, loss_fn,
                                           dtype=cfg.dtype)
    eval_step = steps.make_eval_step(model_cfg, dtype=cfg.dtype)

    checkpoint_limit = 1 if cfg.dry_run else max(2, (cfg.num_epochs + 1) // 2)
    epoch_rng = np.random.default_rng(cfg.seed)
    eval_feats = val_feats if has_val else test_feats
    eval_y = val_y if has_val else test_y

    prog = FoldProgress(patience_left=cfg.early_stopping_patience)
    start_epoch = 1

    if cfg.resume:
        ck = latest_checkpoint(fold_dir)
        if ck:
            params, opt_state, st = load_checkpoint(ck, params, opt_state)
            start_epoch = st["epoch"] + 1
            prog.best_f1 = st["best_f1"]
            prog.best_epoch = st["best_epoch"]
            prog.patience_left = st["patience_left"]
            epoch_rng.bit_generator.state = st["rng_state"]
            prog.history = st.get("history", [])
            bp = os.path.join(fold_dir, "best_params.safetensors")
            if prog.best_epoch > 0 and os.path.exists(bp):
                flat = convert.read_safetensors(bp)
                prog.best_params = jax.tree.map(np.asarray, params)
                for key, arr in flat.items():
                    node = prog.best_params
                    ks = key.split(".")
                    for k in ks[:-1]:
                        node = node[k]
                    node[ks[-1]] = arr
            # seed rotation with the PRIOR run's checkpoints (oldest first)
            # so save_total_limit keeps bounding disk across resume cycles
            prog.checkpoints = [
                p for _, p in sorted(
                    (int(n.split("-", 1)[1]), os.path.join(fold_dir, n))
                    for n in os.listdir(fold_dir)
                    if n.startswith("checkpoint-")
                    and n.split("-", 1)[1].isdigit())]
            print(f"[Resume] from {ck}: next epoch {start_epoch}, "
                  f"best_f1={prog.best_f1:.4f} @ epoch {prog.best_epoch}")
        else:
            print("[Resume] no checkpoint found; training from scratch")

    if mesh is not None:
        params = pmesh.replicate(params, mesh)
        opt_state = pmesh.replicate(opt_state, mesh)

    is_stream = isinstance(train_feats, FeatureStream)
    grad_buf = (jax.tree.map(jnp.zeros_like, params) if accum > 1 else None)
    micro_in_group = 0
    group_loss = 0.0
    global_step = (start_epoch - 1) * opt_steps_per_epoch
    for epoch in range(start_epoch, num_epochs + 1):
        order = epoch_rng.permutation(n)
        epoch_loss = 0.0
        if is_stream:
            train_feats.prefetch(order[: cfg.batch_size])
        for s in range(0, n, cfg.batch_size):
            idx = order[s: s + cfg.batch_size]
            if is_stream:
                batch_feats = train_feats.gather(idx)
                nxt = order[s + cfg.batch_size: s + 2 * cfg.batch_size]
                if len(nxt):  # overlap next batch's decode with this step
                    train_feats.prefetch(nxt)
            else:
                batch_feats = train_feats[idx]
            feats = _shard(batch_feats)
            labels = _shard(train_y[idx])
            step_loss = None
            if accum > 1:
                grad_buf, loss_val, _ = grad_step(params, grad_buf, feats,
                                                  labels)
                micro_in_group += 1
                # loss accumulates ON DEVICE: float(loss_val) here would
                # block on a device->host readback per micro-batch,
                # serializing `accum` round-trips per optimizer update and
                # defeating make_accum_steps' async accumulation; the only
                # host sync is at the apply step below
                group_loss = group_loss + loss_val
                epoch_loss = epoch_loss + loss_val * len(idx)
                # update on a full group or on the epoch's last micro-batch
                # (a short trailing group averages over its actual count)
                if micro_in_group == accum or s + cfg.batch_size >= n:
                    params, opt_state, grad_buf = apply_step(
                        params, opt_state, grad_buf, float(micro_in_group))
                    step_loss = float(group_loss) / micro_in_group
                    micro_in_group = 0
                    group_loss = 0.0
            else:
                params, opt_state, loss_val, _ = train_step(
                    params, opt_state, feats, labels)
                step_loss = float(loss_val)
                epoch_loss += step_loss * len(idx)
            if step_loss is not None:
                # global_step counts OPTIMIZER updates (the HF Trainer
                # global_step at any accumulation factor), so the per-step
                # loss channel, checkpoint-N and the LR schedule share ONE
                # step axis; under accumulation the logged loss is the
                # group's micro-mean (HF's averaged accumulated loss)
                global_step += 1
                if (tracker is not None and cfg.logging_steps
                        and global_step % cfg.logging_steps == 0):
                    # the reference's per-step loss channel (HF Trainer
                    # logging_steps=20)
                    tracker.log({"fold": fold, "train_step": global_step,
                                 "train_step_loss": step_loss})
        epoch_loss = float(epoch_loss) / n  # one sync; device scalar at accum>1

        logits = _predict(eval_step, params, eval_feats, cfg.eval_batch_size,
                          shard=_shard)
        m = metrics_mod.compute_metrics_from_logits(logits, eval_y)
        m["loss"] = epoch_loss
        prog.history.append({"epoch": epoch, **m})
        print(f"[Epoch {epoch}/{num_epochs}] loss={epoch_loss:.4f} "
              f"eval_f1={m['f1']:.4f} acc={m['accuracy']:.4f}")
        if tracker is not None:
            # no explicit step: in the shared-run mode folds restart epochs
            # at 1, and wandb rejects non-monotonic steps (folds 2+ would be
            # silently dropped); auto-step keeps the sequential history
            tracker.log({"fold": fold, "epoch": epoch,
                         **{f"eval_{k}" if k != "loss" else "train_loss": v
                            for k, v in m.items()}})

        # checkpoint-N counts optimizer steps (= micro-steps at accum 1,
        # the HF Trainer convention at any accumulation factor)
        epoch_bookkeeping(cfg, fold_dir, epoch, opt_steps_per_epoch,
                          checkpoint_limit, m, has_val, prog,
                          snapshot=lambda: (jax.tree.map(np.asarray, params),
                                            opt_state),
                          rng_state=epoch_rng.bit_generator.state)
        if prog.stopped:
            break

        if cfg.on_epoch_end is not None and cfg.on_epoch_end(epoch, m):
            print(f"[Sweep] externally terminated after epoch {epoch}")
            break

    if is_stream:
        train_feats.close()
    if prog.best_params is None:
        prog.best_params = jax.tree.map(np.asarray, params)
    return finalize_fold(fold, cfg, fold_dir, model_cfg, mean, std,
                         prog.best_params, prog.best_epoch, prog.best_f1,
                         eval_feats, eval_y, has_val, test_feats, test_y,
                         eval_step, _shard, tracker, prog.history,
                         class_weights=class_weights)


def _track_split_report(tracker, stage: str, fold: int, split_name: str,
                        cm, y_true, y_pred, eval_dir: str) -> None:
    """CM plot + per-class classification-report table into the tracker
    (the reference's W&B CM/table channels,
    src/train_ast_stage1_cross_validation.py:564-637). Best-effort, like
    the reference's wide try/except around W&B plotting."""
    labels = STAGE_LABELS[stage]
    try:
        from ..analysis import cm_plots

        png = os.path.join(eval_dir, "confusion_matrix.png")
        cm_plots.plot_confusion_matrix_overlay(
            np.asarray(cm), labels, f"{stage} fold {fold} ({split_name})", png)
        tracker.log_image(f"fold{fold}_{split_name}_confusion_matrix", png)
    except Exception as exc:
        print(f"[tracking][WARN] CM plot failed: {exc}")
    try:
        from sklearn.metrics import classification_report

        rep = classification_report(y_true, y_pred, labels=[0, 1],
                                    target_names=labels, output_dict=True,
                                    zero_division=0)
        rows = [[name, d["precision"], d["recall"], d["f1-score"],
                 d["support"]] for name, d in rep.items()
                if isinstance(d, dict) and "precision" in d]
        tracker.log_table(
            f"fold{fold}_{split_name}_classification_report",
            ["class", "precision", "recall", "f1", "support"], rows)
    except Exception as exc:
        print(f"[tracking][WARN] report table failed: {exc}")


def _flatten(tree, prefix="") -> dict[str, Any]:
    """Dotted-key pytree flattening — delegates to the canonical
    implementation in models/convert.py so checkpoint and int8-export key
    formats can never diverge."""
    return convert._flatten_tree(tree, prefix)


# ---------------------------------------------------------------------------
# Checkpoint save/restore (params + optimizer state + loop state)
# ---------------------------------------------------------------------------


def sequential_opt_layout(opt_state):
    """Re-layout a parallel trainer's per-fold/per-trial optimizer-state
    slice into the sequential `make_optimizer` checkpoint layout.

    The parallel paths carry AdamW state without a schedule count (their lr
    schedule is a traced per-fold factor applied outside tx.update):
    fold-parallel uses chain(clip, adamw(1.0)) and trial-parallel uses
    optim.adamw_init's dict — both flatten to [adam_count, mu..., nu...].
    The sequential template chain(clip, adamw(schedule)) flattens to the
    same leaves plus a TRAILING ScaleByScheduleState count. load_checkpoint
    restores positionally, so appending one int32 count equal to the number
    of update steps taken (== the leading scale_by_adam count) makes these
    checkpoints resumable by the sequential trainer's --resume."""
    leaves = [l for l in jax.tree.leaves(opt_state) if hasattr(l, "shape")]
    return (opt_state, np.asarray(leaves[0], np.int32))


def save_checkpoint(ck_dir: str, params, opt_state, state: dict) -> None:
    """Full training checkpoint: params + opt state (leaves in pytree order,
    restored into a freshly tx.init'd structure) + json loop state.

    Written into `<ck_dir>.tmp` and atomically renamed into place: a crash
    mid-save must not leave a partial checkpoint under the final name,
    because latest_checkpoint() would pick it over the older INTACT one and
    --resume would fail instead of recovering. The ".tmp" suffix makes the
    staging dir invisible to both checkpoint scanners (their
    int(name.split("-",1)[1]) / .isdigit() parses reject it)."""
    tmp_dir = ck_dir + ".tmp"
    if os.path.exists(tmp_dir):  # stale staging dir from a crashed save
        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir)
    convert.write_safetensors(
        {k: np.asarray(v, np.float32) for k, v in _flatten(params).items()},
        os.path.join(tmp_dir, "params.safetensors"))
    # enumerate only the ARRAY leaves: load_checkpoint reads consecutive
    # leaf_NNNN keys over shape-bearing template leaves, so any non-array
    # leaf (Python scalars are tree leaves too) must not leave index gaps
    array_leaves = [l for l in jax.tree.leaves(opt_state)
                    if hasattr(l, "shape")]
    convert.write_safetensors(
        {f"leaf_{i:04d}": np.asarray(leaf)
         for i, leaf in enumerate(array_leaves)},
        os.path.join(tmp_dir, "opt_state.safetensors"))
    with open(os.path.join(tmp_dir, "train_state.json"), "w") as f:
        json.dump(state, f, indent=2, default=float)
    if os.path.exists(ck_dir):  # same-name leftover from a pre-atomicity run
        shutil.rmtree(ck_dir)
    os.rename(tmp_dir, ck_dir)


def load_checkpoint(ck_dir: str, params_template, opt_state_template):
    """Inverse of save_checkpoint; templates give structure and dtypes."""
    flat = convert.read_safetensors(os.path.join(ck_dir, "params.safetensors"))
    params = jax.tree.map(lambda x: x, params_template)

    def set_path(tree, keys, value):
        for k in keys[:-1]:
            tree = tree[k]
        tree[keys[-1]] = value

    for key, arr in flat.items():
        set_path(params, key.split("."), jnp.asarray(arr))

    opt_flat = convert.read_safetensors(
        os.path.join(ck_dir, "opt_state.safetensors"))
    leaves, treedef = jax.tree.flatten(opt_state_template)
    n_template = sum(1 for l in leaves if hasattr(l, "shape"))
    if n_template != len(opt_flat):
        raise ValueError(
            f"optimizer-state layout mismatch in {ck_dir}: checkpoint has "
            f"{len(opt_flat)} array leaves, template expects {n_template}. "
            "Checkpoints written before the sequential_opt_layout fix by "
            "--parallel-folds/--parallel-trials lack the trailing schedule "
            "count; re-save with the current version or resume with the "
            "path that wrote them.")
    new_leaves = []
    array_idx = 0
    for leaf in leaves:
        if hasattr(leaf, "shape"):
            arr = opt_flat[f"leaf_{array_idx:04d}"]
            # the safetensors writer promotes 0-d to (1,) via
            # ascontiguousarray; restore the template leaf's true shape so
            # scalar counts stay scalars (schedule/bias-correction shapes)
            new_leaves.append(jnp.asarray(arr, getattr(leaf, "dtype", None))
                              .reshape(np.shape(leaf)))
            array_idx += 1
        else:
            new_leaves.append(leaf)
    opt_state = jax.tree.unflatten(treedef, new_leaves)
    state_path = os.path.join(ck_dir, "train_state.json")
    state = fsio.load_json_object(state_path, "train state")
    # checkpoint dirs are written atomically (tmp dir + os.replace), so a
    # malformed state here means external tampering or a hand-edited file —
    # name exactly what is wrong instead of KeyError-ing deep in the
    # resume loop (resume reads every one of these fields).
    required = {"epoch": int, "best_f1": (int, float), "best_epoch": int,
                "patience_left": int, "rng_state": dict}
    for key, typ in required.items():
        if key not in state:
            raise ValueError(f"train state {state_path} is missing "
                             f"required key {key!r}")
        if not isinstance(state[key], typ) or isinstance(state[key], bool):
            raise ValueError(
                f"train state {state_path} key {key!r} must be "
                f"{getattr(typ, '__name__', 'numeric')}, got "
                f"{type(state[key]).__name__}")
    return params, opt_state, state


def latest_checkpoint(fold_dir: str) -> str | None:
    cks = []
    if not os.path.isdir(fold_dir):
        return None
    for name in os.listdir(fold_dir):
        if name.startswith("checkpoint-"):
            try:
                cks.append((int(name.split("-", 1)[1]),
                            os.path.join(fold_dir, name)))
            except ValueError:
                continue
    if not cks:
        return None
    return max(cks)[1]


def run_cross_validation(folds, cfg: TrainFoldConfig,
                         run_config_extra: dict | None = None,
                         tracking_opts: dict | None = None) -> dict:
    """Train the given folds and write cv_metrics.npy/.txt + run-config
    snapshot (reference :772-784, :887-910).

    tracking_opts maps the reference's W&B surface onto utils/tracking.Run:
    {"enabled": bool, "project": str, "group": str, "offline": bool,
    "per_fold": bool}. per_fold replicates --wandb-per-fold (reference
    :824-864): one run per fold grouped under the run id, plus a final
    cv_summary run carrying the aggregate metrics (:922-941)."""
    os.makedirs(cfg.output_root, exist_ok=True)
    run_started = datetime.now()
    topts = tracking_opts or {}
    folds = list(folds)
    run_config = {
        "run_id": run_started.strftime("%Y%m%d_%H%M%S"),
        "timestamp": run_started.isoformat(),
        # schema mirrors the reference's build_run_config snapshot
        # (train_ast_stage1_cross_validation.py:108-158, executed-reference
        # key-structure parity in test_trainer_exec_parity.py)
        "script": f"train_ast_{cfg.stage}_cross_validation",
        "stage": cfg.stage,
        "pretrained_model": (cfg.pretrained_model_dir
                             or "MIT/ast-finetuned-audioset-10-10-0.4593"),
        "seed": cfg.seed,
        "num_epochs": 1 if cfg.dry_run else cfg.num_epochs,
        "per_device_train_batch_size": cfg.batch_size,
        "learning_rate": cfg.learning_rate,
        "optimizer": {
            "name": "optax.adamw",
            "weight_decay": cfg.weight_decay,
            "warmup_ratio": cfg.warmup_ratio,
            "adam_beta2": cfg.adam_beta2,
        },
        "loss": {
            "focal_gamma": cfg.focal_gamma,
            "label_smoothing": cfg.label_smoothing,
        },
        "dry_run": cfg.dry_run,
        "target_folds": folds,
        "fold_requested": folds[0] if len(folds) == 1 else None,
        "early_stopping": {
            "enabled": cfg.enable_early_stopping,
            "patience": cfg.early_stopping_patience,
        },
        # the reference SNAPSHOT divides by 4 while its train_fold divides
        # by 2 (an upstream inconsistency, :118 vs :475) — mirror both
        "checkpoint_limit": 1 if cfg.dry_run else max(
            2, (cfg.num_epochs + 1) // 4),
        "paths": {"data_dir": cfg.data_dir, "output_root": cfg.output_root,
                  "log_dir": os.path.join(cfg.output_root, "tracking")},
        "wandb": {
            "enabled": topts.get("enabled", True),
            "project": topts.get("project") or f"zenker-ast-{cfg.stage}",
            "entity": topts.get("entity"),
            "group": topts.get("group"),
            "per_fold": topts.get("per_fold", False),
            "offline": topts.get("offline", False),
        },
        **(run_config_extra or {}),
    }
    config_path = os.path.join(
        cfg.output_root, f"run_config_{run_config['run_id']}.json")
    with open(config_path, "w") as f:
        json.dump(run_config, f, indent=2)

    from ..utils import tracking

    per_fold_runs = topts.get("per_fold", False)
    group = topts.get("group") or (run_config["run_id"] if per_fold_runs
                                   else None)

    def make_run(name):
        return tracking.Run(
            project=topts.get("project") or f"zenker-ast-{cfg.stage}",
            name=name, config=run_config, group=group,
            dir=os.path.join(cfg.output_root, "tracking"),
            use_wandb=topts.get("enabled", True),
            offline=topts.get("offline", False),
            entity=topts.get("entity"))

    run = None if per_fold_runs else make_run(run_config["run_id"])
    if run is not None:
        run.log_artifact(config_path)

    def fold_tracker(fold):
        fr = (make_run(f"{run_config['run_id']}_fold{fold}")
              if per_fold_runs else run)
        if per_fold_runs:
            fr.log_artifact(config_path)
        return fr

    def fold_done(fold, fold_run, m):
        shutil.copy2(config_path,
                     os.path.join(cfg.output_root, f"fold{fold}",
                                  "run_config.json"))
        fold_run.log(m)
        if per_fold_runs:
            fold_run.summary(**m)
            fold_run.finish()

    all_metrics = []
    if cfg.fold_parallel:
        from . import fold_parallel

        fold_runs = {fold: fold_tracker(fold) for fold in folds}
        all_metrics = fold_parallel.train_folds_parallel(
            list(folds), cfg, trackers=fold_runs)
        for fold, m in zip(folds, all_metrics):
            fold_done(fold, fold_runs[fold], m)
    else:
        for fold in folds:
            fold_run = fold_tracker(fold)
            m = train_fold(fold, cfg, tracker=fold_run)
            all_metrics.append(m)
            fold_done(fold, fold_run, m)

    aggregate: dict[str, float] = {}
    names = {k.split("_test_", 1)[1] for d in all_metrics
             for k in d if "_test_" in k}
    for name in names:
        vals = [d[k] for d in all_metrics for k in d
                if k.endswith(f"_test_{name}")]
        if vals:
            aggregate[f"{name}_mean"] = float(np.mean(vals))
            aggregate[f"{name}_std"] = float(np.std(vals))

    np.save(os.path.join(cfg.output_root, "cv_metrics.npy"),
            {"per_fold": all_metrics, "aggregate": aggregate})
    with open(os.path.join(cfg.output_root, "cv_metrics.txt"), "w") as f:
        f.write("Per-fold metrics:\n")
        for m in all_metrics:
            f.write(str(m) + "\n")
        f.write("\nAggregate metrics:\n")
        f.write(str(aggregate) + "\n")
    if per_fold_runs:  # dedicated summary run (reference :922-941)
        run = make_run(f"{run_config['run_id']}_cv_summary")
        run.log(aggregate)
    run.summary(**aggregate)
    run.finish()
    for k, v in sorted(aggregate.items()):
        print(f"  {k}: {v:.4f}")
    return {"per_fold": all_metrics, "aggregate": aggregate}
