"""Streaming-serve soak: hours of PCM through the real zenker-serve
subprocess, watching RSS for leaks.

The pytest streaming tests prove numerics on short streams; nothing pins
the property a live deployment actually needs — that the server's memory
is FLAT over an unbounded stream (the ring buffer, the per-window JSONL
emit path, and the summary accumulator must all be O(1) in stream length;
reference has no streaming surface at all, so this is a beyond-parity
contract we own).

Drives the genuine CLI entrypoint in a subprocess (stdin=PCM16 pipe,
stdout=JSONL), so the whole wire path is under test, then reports RSS at
progress marks and the growth slope AFTER warmup (first 10 % excluded:
compile + cache fills). Pass/fail: every window line parses, the final
line is a valid summary, and RSS meets the backend criterion — CPU:
flat (< 32 MB total growth; measured -0.4 MB over 2 h); TPU tunnel:
< 48 KB/window slope (the axon client retains every host->device
transfer buffer — measured 19.9 KB/window over an 8 h soak at a
sustained 98.3 w/s, exactly the per-window transfer bytes; see
probe_tunnel_leak.py — so the tunnel criterion bounds OUR layer's
growth on top of that floor). Long-lived tunnel deployments should set
`zenker-serve --rss-limit-mb` for graceful recycling.

Run (CPU, ~4 min for the default 2 h of audio):
  PYTHONPATH=/root/repo:/root/.axon_site python .bench/soak_serve.py
  [--hours 2] [--tpu]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys
import jax
if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from zenker_audio_detection_tpu.cli import serve
sys.exit(serve.main(sys.argv[1:]))
"""


def make_model_dirs(root):
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    from zenker_audio_detection_tpu.models import ast as ast_mod, convert
    from zenker_audio_detection_tpu.train import loop as train_loop

    cfg = ast_mod.ASTConfig(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=2, intermediate_size=64,
                            max_length=128)  # short-seq serving config
    for stage, names, seed in (("stage1", {0: "Idle", 1: "Swallow"}, 0),
                               ("stage2", {0: "Healthy", 1: "Zenker"}, 1)):
        d = os.path.join(root, f"ast_classifier_{stage}", "fold1", "best")
        params = ast_mod.init_params(jax.random.PRNGKey(seed), cfg)
        convert.save_hf_model_dir(params, cfg, d, names)
        train_loop.save_feature_extractor_config(d, -0.5, 2.0,
                                                 max_length=128)
    return root


def rss_mb(pid):
    with open(f"/proc/{pid}/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=2.0,
                    help="simulated stream length")
    ap.add_argument("--tpu", action="store_true",
                    help="serve on the default (TPU) platform")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="soak_serve_")
    runs = make_model_dirs(os.path.join(tmp, "runs"))

    child_argv = [sys.executable, "-c", CHILD.format(repo=REPO),
                  "--fold", "1", "--model-root", runs,
                  "--stage2-mode", "gated"]
    if not args.tpu:
        child_argv.insert(3, "--cpu")
    env = dict(os.environ, PYTHONPATH=f"{REPO}:/root/.axon_site")
    proc = subprocess.Popen(child_argv, stdin=subprocess.PIPE,
                            stdout=subprocess.PIPE, env=env)

    n_samples = int(args.hours * 3600 * 16000)
    chunk = 8000  # one 0.5 s hop per write — microphone arrival pattern
    state = {"windows": 0, "bad_lines": 0, "summary": None}

    def reader():
        for line in proc.stdout:
            try:
                obj = json.loads(line)
            except ValueError:
                state["bad_lines"] += 1
                continue
            if obj.get("type") == "window":
                state["windows"] += 1
            elif obj.get("type") == "summary":
                state["summary"] = obj

    rt = threading.Thread(target=reader, daemon=True)
    rt.start()

    rng = np.random.default_rng(0)
    marks, last_rss_t = [], 0.0
    t0 = time.perf_counter()
    written = 0
    while written < n_samples:
        n = min(chunk, n_samples - written)
        pcm = np.clip(rng.standard_normal(n) * 0.1 * 32768.0,
                      -32768, 32767).astype("<i2")
        proc.stdin.write(pcm.tobytes())
        written += n
        now = time.perf_counter()
        if now - last_rss_t >= 2.0:
            marks.append((written / n_samples, now - t0,
                          rss_mb(proc.pid), state["windows"]))
            last_rss_t = now
    proc.stdin.close()
    # keep sampling through the drain/summary phase: the server still
    # processes the buffered tail and builds the final summary after the
    # last write, and growth concentrated there must count too
    deadline = time.perf_counter() + 600
    while proc.poll() is None and time.perf_counter() < deadline:
        try:
            marks.append((1.0, time.perf_counter() - t0,
                          rss_mb(proc.pid), state["windows"]))
        except Exception:
            break  # process exited between poll() and the rss read
        time.sleep(0.5)
    proc.wait(timeout=600)
    rt.join(timeout=60)
    total = time.perf_counter() - t0

    post = [m for m in marks if m[0] >= 0.10]
    growth = (post[-1][2] - post[0][2]) if len(post) >= 2 else 0.0
    for frac, t, rss, w in marks[:: max(1, len(marks) // 12)]:
        print(f"  {frac * 100:5.1f}%  t={t:7.1f}s  rss={rss:7.1f} MB  "
              f"windows={w}")
    expected = int(args.hours * 3600 / 0.5) - 1  # hop 0.5 s, window 1 s
    post_windows = (post[-1][3] - post[0][3]) if len(post) >= 2 else 0
    kb_per_window = (growth * 1024 / post_windows) if post_windows else 0.0
    # RSS criterion is backend-aware: CPU (and standard-PJRT TPU hosts)
    # must be FLAT; the axon tunnel's client retains every host->device
    # transfer buffer (511.6 KB/call == input size, probe_tunnel_leak.py),
    # an unavoidable ~19.9 KB/window floor here — the --tpu bound (48
    # KB/window ~= 2.4x that floor) still catches leaks in OUR layer
    # stacked on top of the plugin's.
    rss_ok = (kb_per_window < 48.0) if args.tpu else (growth < 32.0)
    ok = (state["bad_lines"] == 0 and state["summary"] is not None
          and abs(state["windows"] - expected) <= 2 and rss_ok)
    print(json.dumps({
        "hours": args.hours, "windows": state["windows"],
        "expected_windows": expected, "bad_lines": state["bad_lines"],
        "summary_ok": state["summary"] is not None,
        "sustained_windows_per_sec": round(state["windows"] / total, 1),
        "rss_mb_at_warmup": round(post[0][2], 1) if post else None,
        "rss_mb_at_end": round(post[-1][2], 1) if post else None,
        "post_warmup_growth_mb": round(growth, 1),
        "growth_kb_per_window": round(kb_per_window, 1),
        "rss_criterion": "tunnel<48KB/window" if args.tpu else "flat<32MB",
        "ok": ok}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
