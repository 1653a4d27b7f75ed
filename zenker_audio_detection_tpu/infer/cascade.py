"""Two-stage AST cascade inference engine, TPU-first.

Re-implements the reference's serving path
(src/test_long_audio_windows_2stage.py and the cached variant
src/test_long_audio_windows_2stage_cache.py) with the host<->device
ping-pong removed:

  reference: per window CPU kaldi-fbank -> .to(GPU) -> stage1 -> .cpu()
             -> numpy boolean indexing -> .to(GPU) -> stage2 -> .cpu()
  here:      file-level log-mel frames computed ONCE on device (overlapping
             1 s / 0.5 s windows share 48 of 98 frames; SURVEY §5.7), window
             features are a strided gather over those frames, and both stages
             run back-to-back on-device in fixed-shape chunks. Stage-2 is
             computed for every window (mask-gated afterwards on host) — with
             XLA's static shapes this costs one extra AST forward per chunk
             but removes the data-dependent host round-trip entirely.

Numerical contract: per-window probabilities equal the reference's
(fbank parity ≤5e-4, logit parity ≤1e-3); the gating/summary math on top is
replicated exactly (including the reference quirk that summary swallow
counts use raw argmax while Stage-2 selection uses thresholded
predictions — src/test_long_audio_windows_2stage.py:312-317 vs :150-153).
"""

from __future__ import annotations

import dataclasses
import os
import sys
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import ast as ast_mod
from ..ops import fbank as F

SAMPLING_RATE = 16000


@dataclasses.dataclass(frozen=True)
class StageSpec:
    """One stage's model + feature normalization (the `fold{k}/best/`
    equivalent: weights travel with their feature-extractor stats, as in the
    reference's saved model dirs, src/train_ast_stage1_cross_validation.py:521-524)."""

    params: Any
    config: ast_mod.ASTConfig
    mean: float
    std: float
    label_order: tuple[str, str]


@dataclasses.dataclass(frozen=True)
class CascadeConfig:
    window_sec: float = 1.0
    hop_sec: float = 0.5
    batch_size: int = 128
    stage1_threshold: float = 0.5
    stage2_threshold: float = 0.5
    stage1_forward_min_prob: float | None = None
    stage2_argmax: bool = False
    dtype: Any = jnp.bfloat16
    # raw-frame cache (infer/cache.py); None disables caching
    cache_dir: str | None = None
    refresh_cache: bool = False
    # "gated": Stage 2 runs only on windows that pass the Stage-1 gate
    # (compacted + bucket-padded; one host sync for the mask) — the
    # reference's own semantics, ~1.5x faster at typical swallow ratios.
    # "all": Stage 2 on every window, fully async, no host sync.
    stage2_mode: str = "gated"
    # "xla" | "pallas": attention implementation (ops/attention.py); pallas
    # keeps scores VMEM-resident and is trainable (custom VJP,
    # models/ast.py routes through mha_packed_trainable)
    attention_impl: str = "xla"
    # opt-in int8 inference: encoder GEMMs run int8xint8->int32 on the MXU
    # with per-channel weight + dynamic per-token activation quantization
    # (models/ast.py quantize_params — see its measured closure: throughput-
    # neutral on v5e via XLA, 4x smaller weights). Accuracy trade-off: probs
    # shift O(1e-2); recalibrate gate thresholds on validation when enabled.
    int8: bool = False


def window_starts(num_samples: int, window_sec: float, hop_sec: float,
                  sr: int = SAMPLING_RATE) -> np.ndarray:
    """Start sample of every window, matching `window_audio`
    (src/test_long_audio_windows_2stage.py:62-75): full windows only, except
    a single zero-padded window when the file is shorter than the window."""
    win = int(window_sec * sr)
    hop = int(hop_sec * sr)
    return np.arange(0, max(1, num_samples - win + 1), hop, dtype=np.int64)


def _next_pow2(n: int, floor: int = 1024) -> int:
    p = floor
    while p < n:
        p *= 2
    return p


class TwoStageEngine:
    """Fold-resident two-stage engine: load models once, serve every patient
    (vs the reference's model-reload-per-patient subprocess fan-out,
    src/run_batch_simple_2stage.py:282-284)."""

    def __init__(self, stage1: StageSpec, stage2: StageSpec,
                 config: CascadeConfig = CascadeConfig(),
                 mesh=None):
        """`mesh`: optional jax.sharding.Mesh with a "data" axis — windows in
        each chunk are sharded across it (models replicated), the multi-chip
        serving layout from SURVEY §2.4. Single-chip when None."""
        if config.stage2_mode not in ("gated", "all"):
            raise ValueError(
                f"stage2_mode must be 'gated' or 'all', got "
                f"{config.stage2_mode!r} (anything else would silently run "
                "gated mode)")
        if config.int8:
            stage1 = dataclasses.replace(
                stage1, params=ast_mod.quantize_params(stage1.params))
            stage2 = dataclasses.replace(
                stage2, params=ast_mod.quantize_params(stage2.params))
        self.stage1 = stage1
        self.stage2 = stage2
        self.config = config
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import mesh as pmesh

            if config.batch_size % mesh.devices.size:
                raise ValueError(
                    f"batch_size {config.batch_size} must divide across "
                    f"{mesh.devices.size} devices")
            self._shard_batch = lambda x: pmesh.shard_batch(x, mesh)
            self._replicate = lambda x: pmesh.replicate(x, mesh)
        else:
            self._shard_batch = jnp.asarray
            # commit params to the device ONCE: numpy leaves (e.g. from
            # safetensors or quantize_params) passed as jit args would be
            # re-transferred on every call — ~8 s/chunk for 340 MB of f32
            # over the 40 MB/s axon tunnel
            self._replicate = lambda t: jax.tree.map(jnp.asarray, t)
        win = int(config.window_sec * SAMPLING_RATE)
        hop = int(config.hop_sec * SAMPLING_RATE)
        self._win = win
        self._hop = hop
        self._frames_per_window = F.num_frames(win)
        if self._frames_per_window <= 0:
            raise ValueError("window shorter than one fbank frame")
        for spec in (stage1, stage2):
            if self._frames_per_window > spec.config.max_length:
                raise ValueError(
                    f"{config.window_sec}s windows produce "
                    f"{self._frames_per_window} frames > the model's "
                    f"max_length {spec.config.max_length}")
        # Frame reuse is exact only when window starts land on the 10 ms
        # frame grid; otherwise fall back to per-window fbank.
        self._frame_reuse = (hop % F.HOP_LENGTH == 0)
        self._params1 = self._replicate(stage1.params)
        self._params2 = self._replicate(stage2.params)
        self._frames_fn_cache: dict[int, Any] = {}
        self._chunk_fn_cache: dict[int, Any] = {}

    # ---------------- device functions ----------------

    def _make_frames_fn(self, padded_len: int):
        n_frames = F.num_frames(padded_len)

        @jax.jit
        def frames_fn(audio):
            return F.logmel_frames(audio, n_frames)

        return frames_fn

    def _make_stage_fn(self, kind: str, config: ast_mod.ASTConfig):
        """One windows->probs program, shared by BOTH stages.

        kind "frames": gather fpw-frame blocks from file-level log-mel;
        kind "samples": gather raw windows and fbank them (non-grid hops).
        Params and the normalization (mean, 2*std) are explicit jit
        arguments, NOT closure captures: captured device arrays get embedded
        in the HLO as constants (bloating the program by the full ~340 MB of
        weights and breaking remote compile), and baked-in mean/std would
        make stage-1 and stage-2 distinct programs — as arguments, one
        compiled executable serves both stages."""
        fpw = self._frames_per_window
        win = self._win
        max_len = config.max_length  # 1024 reference-parity; 128 short-seq
        dtype = self.config.dtype

        @jax.jit
        def stage_fn(params, mean, denom, device_buf, starts):
            if kind == "frames":
                offs = jnp.arange(fpw, dtype=jnp.int32)[None, :]
                raw = device_buf[starts[:, None] + offs]  # (C, fpw, 128)
            else:
                offs = jnp.arange(win, dtype=jnp.int32)[None, :]
                wavs = device_buf[starts[:, None] + offs]  # (C, win)
                raw = F.logmel_frames(wavs, fpw)
            # pad-then-normalize (HF order): pad rows become (0-mean)/denom
            pad = [(0, 0)] * (raw.ndim - 2) + [(0, max_len - raw.shape[-2]),
                                               (0, 0)]
            feats = (jnp.pad(raw, pad) - mean) / denom
            logits = ast_mod.forward(params, feats, config, dtype=dtype,
                                     attention_impl=self.config.attention_impl)
            return jax.nn.softmax(logits, -1)

        return stage_fn

    def _stage_fn(self, kind: str, stage: int):
        spec = self.stage1 if stage == 1 else self.stage2
        key = (kind, spec.config)  # identical configs share one executable
        if key not in self._chunk_fn_cache:
            self._chunk_fn_cache[key] = self._make_stage_fn(kind, spec.config)
        fn = self._chunk_fn_cache[key]
        mean = jnp.float32(spec.mean)
        denom = jnp.float32(2.0 * spec.std)
        return lambda params, buf, starts: fn(params, mean, denom, buf, starts)

    def _gate_indices(self, s1_probs: np.ndarray) -> np.ndarray:
        """Window indices forwarded to Stage 2 — the reference's gate
        (argmax==Swallow AND p_swallow >= threshold, then the optional
        --stage1-forward-min-prob second gate,
        src/test_long_audio_windows_2stage_cache.py:463-478)."""
        cfg = self.config
        p_swallow = s1_probs[:, 1]
        preds = s1_probs.argmax(axis=1)
        preds = np.where((preds == 1) & (p_swallow >= cfg.stage1_threshold), 1, 0)
        idx = np.where(preds == 1)[0]
        if cfg.stage1_forward_min_prob is not None and len(idx):
            idx = idx[p_swallow[idx] >= cfg.stage1_forward_min_prob]
        return idx

    # ---------------- host orchestration ----------------

    def window_probs(self, audio: np.ndarray,
                     path: str | None = None) -> tuple[np.ndarray, np.ndarray]:
        """All-window probabilities for one recording.

        Returns (stage1_probs (W, 2), stage2_probs (W, 2)). In "gated" mode
        stage2 rows are only evaluated for windows passing the Stage-1 gate
        (other rows are zero — exactly the rows the reference never
        computes); in "all" mode every row is evaluated. `path` enables the
        raw-frame cache when config.cache_dir is set.

        `audio` may be float32 or int16 PCM; int16 is transferred as-is
        (half the host->device traffic) and scaled to float on device
        (bit-identical to converting on host).
        """
        audio = np.asarray(audio)
        if audio.dtype != np.int16:
            audio = audio.astype(np.float32)
        starts = window_starts(len(audio), self.config.window_sec,
                               self.config.hop_sec)
        W = len(starts)

        if self._frame_reuse and len(audio) >= self._win:
            # Bucket the padded file length (pow2 frames) to bound recompiles.
            needed = int(starts[-1]) + self._win
            n_true_frames = F.num_frames(needed)
            n_frames_padded = _next_pow2(n_true_frames)
            padded_len = (n_frames_padded - 1) * F.HOP_LENGTH + F.FRAME_LENGTH
            device_buf = self._replicate(self._cached_or_computed_frames(
                audio, path, padded_len, n_true_frames, n_frames_padded))
            kind = "frames"
            stage_starts = (starts // F.HOP_LENGTH).astype(np.int32)
        else:
            # generic path: zero-pad so every gathered window is in-bounds;
            # bucket to pow2 samples to bound recompiles
            padded_len = int(starts[-1]) + self._win
            buf = np.zeros(_next_pow2(padded_len, floor=self._win),
                           audio.dtype)
            # clamp: audio may exceed the bucketed buffer (trailing samples
            # past starts[-1]+win are never windowed); the frame-reuse path
            # clamps the same way in _cached_or_computed_frames
            m = min(len(audio), len(buf))
            buf[:m] = audio[:m]
            device_buf = self._replicate(jnp.asarray(buf))
            kind = "samples"
            stage_starts = starts.astype(np.int32)

        p1 = self._run_stage(self._stage_fn(kind, 1), self._params1,
                             device_buf, stage_starts, W)
        if self.config.stage2_mode == "all":
            p2 = self._run_stage(self._stage_fn(kind, 2), self._params2,
                                 device_buf, stage_starts, W)
        else:
            p2 = np.zeros((W, 2), np.float64)
            gated = self._gate_indices(p1)
            if len(gated):
                p2[gated] = self._run_stage(
                    self._stage_fn(kind, 2), self._params2, device_buf,
                    stage_starts[gated], len(gated))
        return p1, p2

    def _cached_or_computed_frames(self, audio, path, padded_len,
                                   n_true_frames, n_frames_padded):
        """File-level raw log-mel frames, via the cache when enabled."""
        from . import cache as fcache

        cfg = self.config
        use_cache = (cfg.cache_dir is not None and path is not None
                     and os.path.exists(path))
        if use_cache and not cfg.refresh_cache:
            hit = fcache.load_frames(path, cfg.window_sec, cfg.hop_sec,
                                     SAMPLING_RATE, cfg.cache_dir)
            if hit is not None and hit.shape[0] >= n_true_frames:
                # stderr: stdout is reserved for tool output contracts
                # (bench.py's single JSON line; CLI JSON payloads)
                print(f"[cache] hit for {os.path.basename(path)}",
                      file=sys.stderr)
                padded = np.zeros((n_frames_padded, F.NUM_MEL_BINS), np.float32)
                padded[:n_true_frames] = hit[:n_true_frames]
                return jnp.asarray(padded)

        buf = np.zeros(padded_len, audio.dtype)
        m = min(len(audio), padded_len)
        buf[:m] = audio[:m]
        if padded_len not in self._frames_fn_cache:
            self._frames_fn_cache[padded_len] = self._make_frames_fn(padded_len)
        frames = self._frames_fn_cache[padded_len](jnp.asarray(buf))
        if use_cache:
            fcache.save_frames(path, np.asarray(frames[:n_true_frames]),
                               cfg.window_sec, cfg.hop_sec, SAMPLING_RATE,
                               cfg.cache_dir)
        return frames

    def _run_stage(self, fn, params, device_buf, starts: np.ndarray,
                   W: int) -> np.ndarray:
        """Run one stage over W windows in fixed-shape chunks.

        Every chunk is dispatched before any result is fetched: jax queues
        device work asynchronously, so transfers overlap compute instead of
        forcing a host sync per chunk. Tail chunks are padded up to pow2
        buckets (start index 0; rows discarded) to bound compile count."""
        C = self.config.batch_size
        floor = self.mesh.devices.size if self.mesh is not None else 8
        pending = []
        i = 0
        while i < W:
            n = min(C, W - i)
            bucket = C if n == C else min(C, _next_pow2(n, floor=floor))
            chunk = starts[i: i + n]
            if n < bucket:
                chunk = np.concatenate([chunk, np.zeros(bucket - n,
                                                        chunk.dtype)])
            probs = fn(params, device_buf, self._shard_batch(chunk))
            pending.append((n, probs))
            i += n
        return np.concatenate(
            [np.asarray(p)[:n].astype(np.float64) for n, p in pending])

    # ---------------- reference-exact gating & summaries ----------------

    def gate_and_summarize(self, s1_probs: np.ndarray, s2_probs: np.ndarray):
        """Apply the reference's two-stage gating to all-window probs.

        Returns (summary dict, s1_preds, stage2_results, stage2_aligned_classes)
        exactly as src/test_long_audio_windows_2stage_cache.py:455-538 computes
        them."""
        cfg = self.config
        p_swallow = s1_probs[:, 1]
        s1_preds = s1_probs.argmax(axis=1)
        s1_preds = np.where((s1_preds == 1) & (p_swallow >= cfg.stage1_threshold), 1, 0)

        # same gate that selected the stage-2 evaluations in window_probs
        swallow_indices = self._gate_indices(s1_probs)
        stage2_results = [(int(g), s2_probs[g]) for g in swallow_indices]

        aligned_classes = np.full(len(s1_preds), -1, dtype=int)
        for gidx, probs in stage2_results:
            if cfg.stage2_argmax:
                aligned_classes[gidx] = int(np.argmax(probs))
            else:
                aligned_classes[gidx] = 1 if probs[1] >= cfg.stage2_threshold else 0

        summary = summarize_stage_outputs(
            s1_probs, stage2_results,
            list(self.stage1.label_order), list(self.stage2.label_order),
            cfg.stage2_threshold, cfg.stage2_argmax,
        )
        return summary, s1_preds, stage2_results, aligned_classes

    def infer_file(self, audio: np.ndarray, path: str = "") -> dict:
        s1_probs, s2_probs = self.window_probs(audio, path or None)
        summary, s1_preds, stage2_results, aligned = self.gate_and_summarize(
            s1_probs, s2_probs)
        return {
            "path": path,
            **summary,
            "_s1_preds": s1_preds,
            "_stage2_aligned_classes": aligned,
            "_s1_probs": s1_probs,
            "_s2_probs": s2_probs,
        }

    def run_patient(self, files: Sequence[str], audios: Sequence[np.ndarray],
                    stage1_model_root: str = "", stage2_model_root: str = "") -> dict:
        """Full per-patient output, JSON-schema compatible with the
        reference's `outputs/<pid>_2stage.json`
        (src/test_long_audio_windows_2stage.py:360-410)."""
        per_file = {}
        for idx, (path, audio) in enumerate(zip(files, audios)):
            res = self.infer_file(audio, path)
            per_file[f"file_{idx}"] = {
                k: v for k, v in res.items() if not k.startswith("_")
            }
        return build_patient_output(self.config, files, per_file,
                                    stage1_model_root, stage2_model_root)


def build_patient_output(cfg: CascadeConfig, files: Sequence[str],
                         per_file: dict,
                         stage1_model_root: str = "",
                         stage2_model_root: str = "") -> dict:
    """Assemble the per-patient JSON (config/per_file/aggregate) from
    per-file summaries — the SINGLE definition of the output schema
    (reference src/test_long_audio_windows_2stage.py:360-410), shared by
    TwoStageEngine.run_patient and cli/infer_long_audio."""
    vals = per_file.values()
    total_windows = sum(f["num_windows"] for f in vals)
    total_idle = sum(f["stage1_idle_windows"] for f in vals)
    total_swallow = sum(f["stage1_swallow_windows"] for f in vals)
    total_eval = sum(f["stage2_swallow_windows_evaluated"] for f in vals)
    total_healthy = sum(f["stage2_healthy_windows"] for f in vals)
    total_zenker = sum(f["stage2_zenker_windows"] for f in vals)
    aggregate = {
        "files_used": list(files),
        "total_windows": int(total_windows),
        "total_idle_windows": int(total_idle),
        "total_swallow_windows": int(total_swallow),
        "total_swallow_ratio": total_swallow / max(1, total_windows),
        "total_swallow_windows_evaluated_stage2": int(total_eval),
        "total_healthy_windows": int(total_healthy),
        "total_zenker_windows": int(total_zenker),
        "overall_zenker_ratio_over_swallow": (total_zenker / total_swallow)
        if total_swallow else None,
    }
    return {
        "config": {
            "stage1_model_root": stage1_model_root,
            "stage2_model_root": stage2_model_root,
            "window_sec": cfg.window_sec,
            "hop_sec": cfg.hop_sec,
            "batch_size": cfg.batch_size,
            "stage1_threshold": cfg.stage1_threshold,
            "files": list(files),
        },
        "per_file": per_file,
        "aggregate": aggregate,
    }


def summarize_stage_outputs(
    stage1_probs: np.ndarray,
    stage2_probs_or_none: list[tuple[int, np.ndarray]],
    stage1_label_order: list[str],
    stage2_label_order: list[str],
    stage2_threshold: float = 0.5,
    use_argmax: bool = False,
) -> dict:
    """Byte-for-byte replication of the reference summary
    (src/test_long_audio_windows_2stage_cache.py:243-301): note the counts
    use raw argmax predictions, NOT the thresholded ones."""
    stage1_preds = stage1_probs.argmax(axis=1)
    stage2_aligned: list[np.ndarray | None] = [None] * len(stage1_preds)
    for idx, probs in stage2_probs_or_none:
        stage2_aligned[idx] = probs
    idle_count = int((stage1_preds == 0).sum())
    swallow_count = int((stage1_preds == 1).sum())

    evaluated = [p for p in stage2_aligned if p is not None]
    if use_argmax:
        healthy_count = int(sum(1 for p in evaluated if np.argmax(p) == 0))
        zenker_count = int(sum(1 for p in evaluated if np.argmax(p) == 1))
    else:
        healthy_count = int(sum(1 for p in evaluated if p[1] < stage2_threshold))
        zenker_count = int(sum(1 for p in evaluated if p[1] >= stage2_threshold))

    return {
        "num_windows": int(len(stage1_preds)),
        "stage1_idle_windows": idle_count,
        "stage1_swallow_windows": swallow_count,
        "stage1_swallow_ratio": (swallow_count / len(stage1_preds))
        if len(stage1_preds) else 0.0,
        "stage1_mean_probs": stage1_probs.mean(axis=0).tolist()
        if len(stage1_probs) else None,
        "stage2_mean_probs_over_swallow": np.mean(evaluated, axis=0).tolist()
        if swallow_count else None,
        "stage2_swallow_windows_evaluated": int(len(evaluated)),
        "stage2_healthy_windows": healthy_count,
        "stage2_zenker_windows": zenker_count,
        "stage2_zenker_ratio_over_swallow": (zenker_count / swallow_count)
        if swallow_count else None,
    }
