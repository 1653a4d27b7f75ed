"""End-to-end benchmark: 1-s windows/sec/chip through the full two-stage
cascade (fbank + Stage-1 AST + Stage-2 AST), per BASELINE.md.

The reference publishes no throughput numbers (SURVEY §6), so the baseline
denominator is measured here: the reference's own serving math — HF
ASTFeatureExtractor (numpy kaldi fbank) + torch ASTForAudioClassification
on CPU — timed on a window sample and extrapolated. vs_baseline is
ours / reference on IDENTICAL work: both sides run BOTH stages on EVERY
window (stage2_mode="all"), so the headline is apples-to-apples. The
production default ("gated": Stage 2 only on windows passing the Stage-1
gate, the reference's own semantics) is timed too, with the gate
calibrated to the study's real ~34 % pass-rate (SURVEY §6), and reported
as gated_windows_per_sec + gate_rate inside the same JSON line.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def build_engine(stage2_mode="all", params1_override=None,
                 stage1_threshold=0.5):
    import jax
    import jax.numpy as jnp

    from zenker_audio_detection_tpu.infer import cascade as C
    from zenker_audio_detection_tpu.models import ast as ast_mod

    cfg = ast_mod.ASTConfig()
    params1 = (params1_override if params1_override is not None
               else ast_mod.init_params(jax.random.PRNGKey(0), cfg))
    params2 = ast_mod.init_params(jax.random.PRNGKey(1), cfg)
    s1 = C.StageSpec(params1, cfg, -1.1509622, 3.5340312, ("Idle", "Swallow"))
    s2 = C.StageSpec(params2, cfg, -1.1509622, 3.5340312, ("Healthy", "Zenker"))
    # 256-window chunks amortize per-call overhead on long recordings
    return C.TwoStageEngine(s1, s2, C.CascadeConfig(
        dtype=jnp.bfloat16, batch_size=256, stage2_mode=stage2_mode,
        stage1_threshold=stage1_threshold))


def bench_audio(seconds_of_audio=600.0):
    rng = np.random.default_rng(0)
    # int16 PCM, like the study's recordings: transferred raw, scaled on
    # device (bit-identical to host conversion; test_cascade_edge.py)
    return np.clip(rng.standard_normal(int(16000 * seconds_of_audio))
                   * 0.1 * 32768.0, -32768, 32767).astype(np.int16)


def bench_tpu(engine, audio=None, repeats=5):
    if audio is None:
        audio = bench_audio()
    # warmup / compile; gated windows show as nonzero stage-2 prob rows
    p1, p2 = engine.window_probs(audio)
    n_windows = len(p1)
    n_gated = int((np.abs(np.asarray(p2)).sum(axis=1) > 0).sum())
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        engine.window_probs(audio)
        times.append(time.perf_counter() - t0)
    return n_windows / float(np.median(times)), n_windows, n_gated


def calibrated_gated_engine(audio, rate=1432.0 / 4251.0):
    """Gated engine whose Stage-1 gate passes ~`rate` of the bench windows
    — the study's REAL pass-rate (SURVEY §6: 1432 of 4251 test windows are
    true swallows), so the secondary gated figure tracks production
    scaling (~2/(1+rate), measured .bench/probe_gated_rates.py) instead of
    trivially equaling "all" at rate 1.0 (VERDICT r4 item #3). Random
    weights can't choose the rate directly, so shape it exactly as the
    probe does: measure the stage-1 p_swallow distribution once (thr=2.0
    -> zero stage-2 work), shift the head's class-1 bias so ~all windows
    clear the argmax half of the gate, then set stage1_threshold to the
    (1 - rate) quantile of the shifted distribution."""
    import jax
    import jax.numpy as jnp

    from zenker_audio_detection_tpu.models import ast as ast_mod

    probe = build_engine(stage2_mode="gated", stage1_threshold=2.0)
    p1_probs, _ = probe.window_probs(audio)
    p = np.clip(np.asarray(p1_probs)[:, 1], 1e-9, 1 - 1e-9)
    d = np.log((1 - p) / p)  # logit margin l0 - l1
    delta = float(np.quantile(d, 0.995))
    p_shift = 1.0 / (1.0 + np.exp(d - delta))
    thr = max(0.5, float(np.quantile(p_shift, 1.0 - rate)))

    cfg = ast_mod.ASTConfig()
    params1 = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
    patched = dict(params1)
    patched["head"] = {
        "ln": params1["head"]["ln"],
        "dense": {
            "kernel": params1["head"]["dense"]["kernel"],
            "bias": (params1["head"]["dense"]["bias"]
                     + jnp.asarray([0.0, delta])),
        },
    }
    return build_engine(stage2_mode="gated", params1_override=patched,
                        stage1_threshold=thr)


def bench_cpu_reference(n_windows_sample=8):
    """Reference pipeline cost per window: fbank (HF numpy kaldi path) +
    both torch AST forwards, CPU."""
    import torch
    import transformers

    torch.manual_seed(0)
    model1 = transformers.ASTForAudioClassification(
        transformers.ASTConfig(num_labels=2)).eval()
    model2 = transformers.ASTForAudioClassification(
        transformers.ASTConfig(num_labels=2)).eval()
    fx = transformers.ASTFeatureExtractor()
    rng = np.random.default_rng(0)
    # same int16-derived values the TPU side sees (identical work & input)
    windows = [
        np.clip(rng.standard_normal(16000) * 0.1 * 32768.0,
                -32768, 32767).astype(np.int16).astype(np.float32) / 32768.0
        for _ in range(n_windows_sample)
    ]
    # warmup
    with torch.inference_mode():
        feats = fx(windows[:2], sampling_rate=16000,
                   return_tensors="pt")["input_values"]
        model1(feats)
    # best of 3 passes: the denominator must not be deflated by transient
    # host load (a single pass once halved under a concurrent test run;
    # best-of-2 still drifted ~8% between rounds — VERDICT r2 weak #5)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        with torch.inference_mode():
            feats = fx(windows, sampling_rate=16000,
                       return_tensors="pt")["input_values"]
            torch.softmax(model1(feats).logits, -1)
            torch.softmax(model2(feats).logits, -1)
        best = min(best, time.perf_counter() - t0)
    return n_windows_sample / best


def assert_chip_reachable(timeout_s: float = 180.0,
                          probe=None) -> None:
    """Fail FAST with the one-JSON-line contract intact when the axon
    tunnel is stalled. Observed failure mode (round 4): jax.devices()
    blocks for hours at ~0 CPU, so the bench would hang past the driver's
    timeout and the round artifact would record nothing diagnosable.
    The probe runs in a daemon thread; on timeout we print a single JSON
    line carrying an explicit error field and exit nonzero."""
    import threading

    if probe is None:
        def probe():
            import jax

            jax.devices()

    done = threading.Event()
    failure = []

    def _run():
        # done must be set even when the probe RAISES — otherwise a fast
        # backend-init failure idles the full timeout and gets reported
        # as a tunnel stall (the wrong diagnosis for the one JSON line
        # built to be diagnosable)
        try:
            probe()
        except BaseException as e:  # noqa: BLE001 — diagnostic path
            failure.append(f"{type(e).__name__}: {e}")
        finally:
            done.set()

    t = threading.Thread(target=_run, daemon=True)
    t.start()
    if not done.wait(timeout_s) or failure:
        err = (f"TPU unreachable: {failure[0]}" if failure else
               f"TPU unreachable: device enumeration blocked "
               f"> {timeout_s:.0f}s (stalled axon tunnel)")
        print(json.dumps({
            "metric": "e2e_2stage_windows_per_sec_per_chip",
            "value": 0.0,
            "unit": "windows/s",
            "vs_baseline": 0.0,
            "error": err,
        }))
        sys.exit(1)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default=None,
                    help="capture a jax.profiler trace of the timed runs")
    args = ap.parse_args()

    assert_chip_reachable()

    from zenker_audio_detection_tpu.utils import profiling

    audio = bench_audio()
    engine = build_engine(stage2_mode="all")
    with profiling.trace(args.trace_dir):
        tpu_wps, n_windows, _ = bench_tpu(engine, audio)
    # production default (Stage 2 only on gate-passing windows), with the
    # gate calibrated to the study's real ~34 % pass-rate so the figure
    # tracks production scaling (~1.37x the identical-work headline)
    gated_wps, _, n_gated = bench_tpu(calibrated_gated_engine(audio),
                                      audio, repeats=3)
    gate_rate = n_gated / n_windows
    cpu_wps = bench_cpu_reference()
    # cpu_windows_per_sec rides inside the one-line contract so the driver
    # can see denominator drift instead of a silently moving vs_baseline
    # host load rides along too: a concurrent CPU-heavy job deflates the
    # denominator ~2x (measured round 3) — load >~2 flags a suspect ratio
    import os

    print(json.dumps({
        "metric": "e2e_2stage_windows_per_sec_per_chip",
        "value": round(tpu_wps, 2),
        "unit": "windows/s",
        "vs_baseline": round(tpu_wps / cpu_wps, 2),
        "cpu_windows_per_sec": round(cpu_wps, 3),
        "gated_windows_per_sec": round(gated_wps, 2),
        "gate_rate": round(gate_rate, 4),
        "host_load_1min": round(os.getloadavg()[0], 2),
    }))
    print(f"# windows={n_windows} cpu_reference={cpu_wps:.2f} windows/s "
          f"gated_mode={gated_wps:.2f} windows/s at realized gate rate "
          f"{gate_rate:.3f} (study rate 1432/4251={1432 / 4251:.3f})",
          file=sys.stderr)


if __name__ == "__main__":
    # one retry: the remote-compile tunnel occasionally drops a request
    try:
        main()
    except Exception as exc:
        print(f"# bench attempt 1 failed ({type(exc).__name__}: {exc}); "
              f"retrying", file=sys.stderr)
        time.sleep(5)
        main()
