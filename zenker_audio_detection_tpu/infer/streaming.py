"""Real-time streaming two-stage cascade (beyond-reference capability).

The reference's serving path is strictly offline: it decodes a whole
recording, windows it, and batch-classifies
(src/test_long_audio_windows_2stage.py:62-75,223). This module serves the
same cascade *incrementally* — audio arrives in arbitrary-sized chunks (a
microphone buffer, a network stream) and per-window probabilities are
emitted with bounded latency, numerically matching the offline engine.

TPU-native design:

- **HBM-resident log-mel ring buffer.** Frames are computed on device in
  fixed-shape blocks as samples arrive and scattered into a fixed-capacity
  ring ``(capacity_frames, 128)``; windows are gathered from the ring with
  modular indexing inside the jitted stage program. Raw audio crosses
  host->device once (int16 accepted, scaled on device); only (B, 2)
  probability tensors come back. Overlapping 1 s / 0.5 s windows share 48
  of 98 frames exactly as in the offline engine (SURVEY §5.7).
- **Fixed shapes everywhere.** Frame blocks and window batches are padded
  to pow2 buckets so the program count stays bounded no matter how the
  caller chunks the input — the XLA-compatible answer to a data-dependent
  arrival process.
- **Same compiled semantics as offline.** Feature math is
  ``ops.fbank.logmel_frames`` (identical per-frame content), the model call
  is ``models.ast.forward`` with the engine's dtype/attention/int8 options,
  and gating reuses the engine's reference-exact rules
  (src/test_long_audio_windows_2stage_cache.py:463-478). After ``flush()``,
  ``stage1_probs()``/``stage2_probs()`` equal ``TwoStageEngine.window_probs``
  on the concatenated audio (tests/test_streaming.py).

Latency model: a window is dispatched once ``chunk_windows`` new windows
complete (or on ``flush``); with the 0.5 s hop the added buffering latency
is ``chunk_windows / 2`` seconds of audio plus one cascade round-trip.

Scope: each StreamingCascade is single-device (latency-oriented);
multi-chip serving shards whole recordings in batch mode instead
(``TwoStageEngine(mesh=...)``). The hop must sit on the 10 ms frame grid
(the engine's frame-reuse condition) — off-grid hops are rejected at
construction; use the offline engine (whose per-window fbank path handles
them) instead.

Fleet throughput (N concurrent streams): run one stream per chip with the
same thread-per-fold machinery as ``zenker-run-all-folds --parallel-folds``
(cli/run_all_folds.py:111-137) — build each fold's engine + StreamingCascade
inside ``with jax.default_device(dev):`` on its own thread, so that stream's
params, ring buffer, and every ``feed()`` dispatch commit to its chip. Host
chunk-prep interleaves under the GIL; device compute runs truly
concurrently, so N chips sustain ~N x the single-stream windows/s at
unchanged per-stream latency. Smoke-tested in
tests/test_streaming.py::test_concurrent_streams_fold_per_device.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models import ast as ast_mod
from ..ops import fbank as F
from . import cascade as C


@dataclasses.dataclass(frozen=True)
class StreamResult:
    """One emitted window: absolute index, start sample, and probabilities.

    ``s2_probs`` is all-zero when the window did not pass the Stage-1 gate
    in gated mode — the same convention as the offline engine's rows the
    reference never computes."""

    window_index: int
    start_sample: int
    s1_probs: np.ndarray
    s2_probs: np.ndarray


_next_pow2 = C._next_pow2  # the shared pow2-bucketing primitive


class StreamingCascade:
    """Incremental wrapper around a single-device :class:`TwoStageEngine`.

    ``retain_results=False`` drops per-window history after emission (the
    summary is maintained in O(1) running accumulators instead) — required
    for indefinite live streams, where retaining every StreamResult would
    grow without bound."""

    def __init__(self, engine: C.TwoStageEngine, chunk_windows: int = 32,
                 capacity_frames: int = 4096, retain_results: bool = True):
        if engine.mesh is not None:
            raise NotImplementedError(
                "streaming is single-device (latency-oriented); use the "
                "batch engine for multi-chip serving")
        if engine._hop <= 0 or engine._win <= 0:
            raise ValueError("window_sec and hop_sec must be > 0")
        if engine._hop % F.HOP_LENGTH != 0:
            raise ValueError(
                f"streaming requires the hop ({engine._hop} samples) on the "
                f"{F.HOP_LENGTH}-sample fbank frame grid")
        if chunk_windows < 1:
            raise ValueError("chunk_windows must be >= 1")
        self.engine = engine
        self.chunk_windows = chunk_windows
        self._hop_frames = engine._hop // F.HOP_LENGTH
        self._fpw = engine._frames_per_window
        # worst-case frames touched by one emit batch: the batch's windows
        # span (count-1)*hop + fpw frames, and the frame block computed for
        # it is bucket-padded — both must fit the ring
        worst = chunk_windows * self._hop_frames + self._fpw
        self._block_floor = 64
        if _next_pow2(worst, self._block_floor) > capacity_frames:
            raise ValueError(
                f"capacity_frames={capacity_frames} too small for "
                f"chunk_windows={chunk_windows} (need >= "
                f"{_next_pow2(worst, self._block_floor)})")
        self._cap = capacity_frames
        self._ring = jnp.zeros((capacity_frames, F.NUM_MEL_BINS), jnp.float32)
        # host-side state
        self._stash = np.zeros(0, np.float32)  # samples not yet framed
        self._stash_offset = 0  # absolute sample index of stash[0]
        self._total_samples = 0
        self._next_frame = 0  # next absolute frame index to compute
        self._next_window = 0  # next absolute window index to emit
        self._retain = retain_results
        self._results: list[StreamResult] = []
        # O(1) running accumulators mirroring summarize_stage_outputs
        # (counts use raw argmax — the reference quirk — while stage-2
        # evaluation follows the thresholded gate)
        self._acc = {
            "n": 0, "idle": 0, "swallow": 0,
            "s1_sum": np.zeros(2, np.float64),
            "eval_count": 0, "s2_sum": np.zeros(2, np.float64),
            "healthy": 0, "zenker": 0,
        }
        self._flushed = False
        # jit caches (keyed by bucket size; capacity is static per instance)
        self._frames_fns: dict[int, Any] = {}
        self._update_fns: dict[int, Any] = {}
        self._stage_fns: dict[Any, Any] = {}

    # ---------------- device programs ----------------

    def _frames_fn(self, block: int):
        if block not in self._frames_fns:
            @jax.jit
            def fn(span):
                return F.logmel_frames(span, block)

            self._frames_fns[block] = fn
        return self._frames_fns[block]

    def _update_fn(self, block: int):
        """Scatter `block` new frame rows into the ring at absolute frame
        index `start` (mod capacity), keeping old rows where row >= n_valid
        (bucket padding must not clobber the ring)."""
        if block not in self._update_fns:
            cap = self._cap

            # no donate_argnums: the ring is ~2 MB and CPU (the test
            # backend) does not implement donation — a copy is cheaper
            # than per-call warnings
            @jax.jit
            def fn(ring, new, start, n_valid):
                idx = (start + jnp.arange(block, dtype=jnp.int32)) % cap
                rows = jnp.where(
                    (jnp.arange(block) < n_valid)[:, None], new, ring[idx])
                return ring.at[idx].set(rows)

            self._update_fns[block] = fn
        return self._update_fns[block]

    def _stage_fn(self, stage: int):
        """windows->probs over the ring; same body as the offline engine's
        stage program (cascade.TwoStageEngine._make_stage_fn) except the
        frame gather is modular over the ring capacity."""
        eng = self.engine
        spec = eng.stage1 if stage == 1 else eng.stage2
        key = spec.config
        if key not in self._stage_fns:
            fpw, cap = self._fpw, self._cap
            max_len = spec.config.max_length
            dtype = eng.config.dtype
            config = spec.config
            attention_impl = eng.config.attention_impl

            @jax.jit
            def fn(params, mean, denom, ring, starts):
                offs = jnp.arange(fpw, dtype=jnp.int32)[None, :]
                raw = ring[(starts[:, None] + offs) % cap]  # (B, fpw, 128)
                pad = [(0, 0), (0, max_len - fpw), (0, 0)]
                feats = (jnp.pad(raw, pad) - mean) / denom
                logits = ast_mod.forward(params, feats, config, dtype=dtype,
                                         attention_impl=attention_impl)
                return jax.nn.softmax(logits, -1)

            self._stage_fns[key] = fn
        fn = self._stage_fns[key]
        mean = jnp.float32(spec.mean)
        denom = jnp.float32(2.0 * spec.std)
        params = eng._params1 if stage == 1 else eng._params2
        return lambda starts: fn(params, mean, denom, self._ring, starts)

    def warmup(self) -> None:
        """Compile every program the live feed loop can hit, before traffic
        (end-of-stream flush tails may still compile smaller odd sizes —
        harmless there, the stream is over).

        Without this, the first emitted window pays all JIT compiles (on a
        cold persistent cache: minutes per full-size AST program over a
        remote-compile link — unacceptable mid-stream). Dispatches dummy
        data through each frame-block size, the ring update, and each
        window-bucket size of both stage programs; stream state is
        untouched (the programs are pure and the dummy ring update writes
        zero valid rows).
        """
        hop_f, fpw = self._hop_frames, self._fpw
        # frame blocks: the first emit computes (chunk-1)*hop+fpw frames,
        # steady-state emits chunk*hop; flush tails reuse smaller blocks
        blocks = set()
        for n_new in {(self.chunk_windows - 1) * hop_f + fpw,
                      self.chunk_windows * hop_f, hop_f, fpw}:
            blocks.add(_next_pow2(max(1, n_new), self._block_floor))
        for block in sorted(blocks):
            # both sample dtypes: int16 PCM spans trace a second program
            # (scaled on device, ops/fbank.py), and a live int16 stream
            # would otherwise hit that compile on its first emit
            for dt in (jnp.float32, jnp.int16):
                span = jnp.zeros((block + 2) * F.HOP_LENGTH, dt)
                frames = self._frames_fn(block)(span)
            # n_valid=0: a pure no-op on the ring contents
            self._ring = self._update_fn(block)(
                self._ring, frames, jnp.int32(0), jnp.int32(0))
        # window buckets: full batches, flush tails, and gated subsets all
        # land on pow2 buckets in [8, next_pow2(chunk_windows)]
        bucket = 8
        buckets = {8}
        while bucket < self.chunk_windows:
            bucket *= 2
            buckets.add(bucket)
        for bucket in sorted(buckets):
            starts = jnp.zeros(bucket, jnp.int32)
            for stage in (1, 2):
                np.asarray(self._stage_fn(stage)(starts))

    # ---------------- host orchestration ----------------

    def feed(self, samples: np.ndarray) -> list[StreamResult]:
        """Append audio (float32 or int16 PCM @16 kHz, any length, including
        empty) and return windows that completed, in order."""
        if self._flushed:
            raise RuntimeError("feed() after flush()")
        samples = np.asarray(samples)
        if samples.ndim != 1:
            raise ValueError("samples must be 1-D")
        if samples.dtype != np.int16:
            samples = samples.astype(np.float32)
        if len(samples):
            if len(self._stash) == 0:
                self._stash = samples.copy()
            elif self._stash.dtype == samples.dtype:
                self._stash = np.concatenate([self._stash, samples])
            else:
                # mixed int16/float32 chunks: int16 means raw PCM, so the
                # cast to float must also apply the 1/32768 scale the device
                # path would have applied (ops/fbank.py logmel_frames)
                def to_f32(x):
                    return (x.astype(np.float32) / 32768.0
                            if x.dtype == np.int16 else x)

                self._stash = np.concatenate([to_f32(self._stash),
                                              to_f32(samples)])
            self._total_samples += len(samples)

        win, hop = self.engine._win, self.engine._hop
        n_avail = (0 if self._total_samples < win
                   else (self._total_samples - win) // hop + 1)
        emitted: list[StreamResult] = []
        while n_avail - self._next_window >= self.chunk_windows:
            emitted.extend(self._emit(self.chunk_windows))
        return emitted

    def flush(self) -> list[StreamResult]:
        """Emit all remaining complete windows. For inputs shorter than one
        window, emits the single zero-padded window the offline path
        produces (src/test_long_audio_windows_2stage.py:62-75)."""
        if self._flushed:
            return []
        self._flushed = True
        win, hop = self.engine._win, self.engine._hop
        emitted: list[StreamResult] = []
        if self._total_samples < win:
            # zero-pad to one full window, exactly like window_audio()
            pad = win - self._total_samples
            if pad:
                zeros = np.zeros(pad, self._stash.dtype if len(self._stash)
                                 else np.float32)
                self._stash = (np.concatenate([self._stash, zeros])
                               if len(self._stash) else zeros)
                self._total_samples += pad
            n_remaining = 1
        else:
            n_avail = (self._total_samples - win) // hop + 1
            n_remaining = n_avail - self._next_window
        while n_remaining > 0:
            count = min(n_remaining, self.chunk_windows)
            emitted.extend(self._emit(count))
            n_remaining -= count
        return emitted

    def _emit(self, count: int) -> list[StreamResult]:
        hop_f, fpw = self._hop_frames, self._fpw
        first_w = self._next_window
        f_end = (first_w + count - 1) * hop_f + fpw

        # 1. compute the new frames [next_frame, f_end) in one bucket block
        n_new = f_end - self._next_frame
        if n_new > 0:
            block = _next_pow2(n_new, self._block_floor)
            span_len = (block + 2) * F.HOP_LENGTH  # _frames_by_hop_slices pad
            span = np.zeros(span_len, self._stash.dtype)
            lo = self._next_frame * F.HOP_LENGTH - self._stash_offset
            assert lo >= 0, "stash was trimmed past the next frame"
            m = min(len(self._stash) - lo, span_len)
            if m > 0:
                span[:m] = self._stash[lo: lo + m]
            new_frames = self._frames_fn(block)(jnp.asarray(span))
            self._ring = self._update_fn(block)(
                self._ring, new_frames, jnp.int32(self._next_frame % self._cap),
                jnp.int32(n_new))
            self._next_frame = f_end
            # trim the stash: frames >= f_end start at sample f_end*160;
            # keep from there on (frame overlap needs the 240-sample tail,
            # which starting at f_end*160 always includes)
            keep_from = self._next_frame * F.HOP_LENGTH - self._stash_offset
            if keep_from > 0:
                self._stash = self._stash[keep_from:]
                self._stash_offset += keep_from

        # 2. stage-1 on the batch (bucket-padded), then gate, then stage-2
        # Starts are reduced mod capacity on the host so absolute frame
        # indices never overflow int32, however long the stream runs
        # ((start % cap + off) % cap == (start + off) % cap).
        starts = ((np.arange(first_w, first_w + count, dtype=np.int64)
                   * hop_f) % self._cap).astype(np.int32)
        if self.engine.config.stage2_mode == "all":
            # speculative: both stages dispatched back-to-back, ONE fetch
            # round-trip instead of two — in latency mode the round-trip is
            # the floor (ROOFLINE.md), so "all" trades the gate's compute
            # saving for a sync saving
            d1 = self._dispatch(1, starts, count)
            d2 = self._dispatch(2, starts, count)
            p1 = self._fetch(d1, count)
            p2 = self._fetch(d2, count)
        else:
            p1 = self._fetch(self._dispatch(1, starts, count), count)
            p2 = np.zeros((count, 2), np.float64)
            gated = self.engine._gate_indices(p1)
            if len(gated):
                p2[gated] = self._fetch(
                    self._dispatch(2, starts[gated], len(gated)), len(gated))

        self._accumulate(p1, p2)
        out = []
        for i in range(count):
            r = StreamResult(first_w + i, (first_w + i) * self.engine._hop,
                             p1[i], p2[i])
            out.append(r)
            if self._retain:
                self._results.append(r)
        self._next_window += count
        return out

    def _accumulate(self, p1: np.ndarray, p2: np.ndarray) -> None:
        """Fold one emitted batch into the running summary accumulators,
        replicating summarize_stage_outputs' semantics element-wise."""
        cfg = self.engine.config
        acc = self._acc
        preds = p1.argmax(axis=1)
        acc["n"] += len(p1)
        acc["idle"] += int((preds == 0).sum())
        acc["swallow"] += int((preds == 1).sum())
        acc["s1_sum"] += p1.sum(axis=0)
        gated = self.engine._gate_indices(p1)
        if len(gated):
            s2 = p2[gated]
            acc["eval_count"] += len(gated)
            acc["s2_sum"] += s2.sum(axis=0)
            if cfg.stage2_argmax:
                z = (s2.argmax(axis=1) == 1)
            else:
                z = (s2[:, 1] >= cfg.stage2_threshold)
            acc["zenker"] += int(z.sum())
            acc["healthy"] += int((~z).sum())

    def _dispatch(self, stage: int, starts: np.ndarray, n: int):
        """Queue one bucket-padded stage call; no host sync."""
        bucket = _next_pow2(n, floor=8)
        if n < bucket:
            starts = np.concatenate([starts, np.zeros(bucket - n,
                                                      starts.dtype)])
        return self._stage_fn(stage)(jnp.asarray(starts))

    @staticmethod
    def _fetch(probs, n: int) -> np.ndarray:
        return np.asarray(probs)[:n].astype(np.float64)

    # ---------------- offline-compatible views ----------------

    def stage1_probs(self) -> np.ndarray:
        if not self._retain:
            raise RuntimeError(
                "per-window history not kept with retain_results=False "
                "(use the emitted StreamResults, or summary())")
        return (np.stack([r.s1_probs for r in self._results])
                if self._results else np.zeros((0, 2), np.float64))

    def stage2_probs(self) -> np.ndarray:
        if not self._retain:
            raise RuntimeError(
                "per-window history not kept with retain_results=False "
                "(use the emitted StreamResults, or summary())")
        return (np.stack([r.s2_probs for r in self._results])
                if self._results else np.zeros((0, 2), np.float64))

    @property
    def windows_emitted(self) -> int:
        """Number of windows emitted so far (== the next local window
        index). Used by the serve handoff protocol to compute the global
        resume point across process recycles."""
        return self._next_window

    def acc_state(self) -> dict:
        """JSON-able snapshot of the running summary accumulators.

        Together with :meth:`seed_accumulators` this makes the summary
        state portable across processes: a recycled server (see
        ``zenker-serve --handoff`` / ``zenker-serve-supervisor``) hands its
        accumulators to its successor so the successor's final
        :meth:`summary` covers the WHOLE stream, bit-identically to an
        uninterrupted run (the sums are transported as exact float64 —
        ``json.dumps``/``loads`` round-trips doubles losslessly)."""
        acc = self._acc
        return {
            "n": int(acc["n"]), "idle": int(acc["idle"]),
            "swallow": int(acc["swallow"]),
            "s1_sum": [float(x) for x in acc["s1_sum"]],
            "eval_count": int(acc["eval_count"]),
            "s2_sum": [float(x) for x in acc["s2_sum"]],
            "healthy": int(acc["healthy"]), "zenker": int(acc["zenker"]),
        }

    def seed_accumulators(self, state: dict) -> None:
        """Seed the summary accumulators from a prior :meth:`acc_state`
        snapshot (process-recycle handoff). Must be called before any
        audio is fed."""
        if self._next_window or self._total_samples:
            raise RuntimeError("seed_accumulators() on a started stream")
        missing = set(self._acc) - set(state)
        if missing:
            raise ValueError(f"acc state missing keys: {sorted(missing)}")
        for k in ("n", "idle", "swallow", "eval_count", "healthy", "zenker"):
            self._acc[k] = int(state[k])
        for k in ("s1_sum", "s2_sum"):
            arr = np.asarray(state[k], np.float64)
            if arr.shape != (2,):
                raise ValueError(f"acc state {k} must have shape (2,)")
            self._acc[k] = arr

    def summary(self) -> dict:
        """Reference-exact per-file summary over everything emitted so far
        (identical to the offline engine's gate_and_summarize); O(1) from
        the running accumulators."""
        acc = self._acc
        n, swallow = acc["n"], acc["swallow"]
        evaluated = acc["eval_count"]
        if not swallow:
            s2_mean = None
        elif evaluated:
            s2_mean = (acc["s2_sum"] / evaluated).tolist()
        else:
            # summarize_stage_outputs hits np.mean([]) here: scalar NaN
            s2_mean = float("nan")
        return {
            "num_windows": int(n),
            "stage1_idle_windows": int(acc["idle"]),
            "stage1_swallow_windows": int(swallow),
            "stage1_swallow_ratio": (swallow / n) if n else 0.0,
            "stage1_mean_probs": (acc["s1_sum"] / n).tolist() if n else None,
            "stage2_mean_probs_over_swallow": s2_mean,
            "stage2_swallow_windows_evaluated": int(evaluated),
            "stage2_healthy_windows": int(acc["healthy"]),
            "stage2_zenker_windows": int(acc["zenker"]),
            "stage2_zenker_ratio_over_swallow": (acc["zenker"] / swallow)
            if swallow else None,
        }
