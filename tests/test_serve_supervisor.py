"""zenker-serve-supervisor: zero-window-loss serving across recycles.

The exactness claim under test: a stream served through N process
recycles (graceful rss handoffs AND hard crashes) must produce the SAME
JSONL window lines and whole-stream summary as one uninterrupted
zenker-serve run. Children are real subprocesses (CPU-pinned via a
--child-cmd wrapper — the JAX_PLATFORMS env var is too late in this
environment, jax pre-imports at interpreter startup)."""

import io
import json
import sys

import jax
import numpy as np
import pytest

from zenker_audio_detection_tpu.cli import serve, serve_supervisor
from zenker_audio_detection_tpu.models import ast as ast_mod, convert
from zenker_audio_detection_tpu.train import loop as train_loop

MEAN1, STD1 = -1.1509622, 3.5340312
MEAN2, STD2 = -0.9, 2.8

REPO = str(__import__("pathlib").Path(__file__).resolve().parent.parent)

CPU_WRAPPER = f"""\
import sys
sys.path.insert(0, {REPO!r})
import jax
jax.config.update("jax_platforms", "cpu")
from zenker_audio_detection_tpu.cli.serve import main
sys.exit(main())
"""

# first-generation-only crash shim: hard-exits mid-stream after the 6th
# emitted window line, exactly once per marker dir (later children serve
# normally) — drives the supervisor's crash-recovery path
CRASH_WRAPPER = f"""\
import os
import sys
sys.path.insert(0, {REPO!r})
import jax
jax.config.update("jax_platforms", "cpu")
marker = sys.argv[1]
argv = sys.argv[2:]
from zenker_audio_detection_tpu.cli import serve
first = not os.path.exists(marker)
if first:
    open(marker, "w").close()
    real_line = serve.window_line
    count = [0]
    def counting_line(engine, r, index_offset=0):
        line = real_line(engine, r, index_offset)
        count[0] += 1
        if count[0] > 6:
            sys.stdout.flush()
            os._exit(17)  # hard crash, no handoff line
        return line
    serve.window_line = counting_line
sys.exit(serve.main(argv))
"""


@pytest.fixture(scope="module")
def model_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("sup_models")
    cfg = ast_mod.ASTConfig(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=4, intermediate_size=64,
                            num_mel_bins=128, max_length=128, num_labels=2)
    dirs = []
    for seed, (mean, std) in [(0, (MEAN1, STD1)), (1, (MEAN2, STD2))]:
        d = str(root / f"stage{seed + 1}")
        params = ast_mod.init_params(jax.random.PRNGKey(seed), cfg)
        convert.save_hf_model_dir(params, cfg, d)
        train_loop.save_feature_extractor_config(d, mean, std,
                                                 max_length=cfg.max_length)
        dirs.append(d)
    return dirs


@pytest.fixture(scope="module")
def cpu_wrapper(tmp_path_factory):
    p = tmp_path_factory.mktemp("wrap") / "serve_cpu.py"
    p.write_text(CPU_WRAPPER)
    return str(p)


def make_audio(seconds, seed=0):
    rng = np.random.default_rng(seed)
    n = int(16000 * seconds)
    x = 0.05 * rng.standard_normal(n) + 0.1 * np.sin(
        2 * np.pi * 300 * np.arange(n) / 16000)
    return np.clip(x * 32768.0, -32768, 32767).astype(np.int16)


def serve_args(model_dirs):
    return ["--stage1-model-root", model_dirs[0],
            "--stage2-model-root", model_dirs[1],
            "--f32", "--chunk-windows", "4"]


def uninterrupted(model_dirs, audio_bytes):
    out = io.StringIO()
    rc = serve.main(serve_args(model_dirs),
                    stdin_buffer=io.BytesIO(audio_bytes), stdout=out)
    assert rc == 0
    return out.getvalue().splitlines()


def run_supervisor(model_dirs, audio_bytes, sup_flags, child_cmd):
    out = io.StringIO()
    rc = serve_supervisor.main(
        sup_flags + ["--child-cmd", child_cmd, "--"]
        + serve_args(model_dirs),
        stdin_buffer=io.BytesIO(audio_bytes), stdout=out)
    return rc, out.getvalue().splitlines()


@pytest.mark.slow
def test_recycles_bit_identical_to_uninterrupted(model_dirs, cpu_wrapper,
                                                 capsys):
    """rss-limit 1 forces EVERY generation to hand off after its first
    emitted batch; the supervised stream (with prewarmed standbys) must
    reproduce the uninterrupted run line-for-line, summary included."""
    audio = make_audio(8.0, seed=3)  # 15 windows -> >=3 handoffs at cw=4
    ref = uninterrupted(model_dirs, audio.tobytes())

    rc, got = run_supervisor(
        model_dirs, audio.tobytes(),
        ["--rss-limit-mb", "1", "--replay-buffer-sec", "120",
         "--prewarm-standby"],
        f"{sys.executable} {cpu_wrapper}")
    assert rc == 0
    err = capsys.readouterr().err
    assert "recycle #2" in err, "test vacuous: fewer than 2 recycles"

    assert len(got) == len(ref)
    for g, r in zip(got, ref):
        assert json.loads(g) == json.loads(r)
    summary = json.loads(got[-1])
    assert summary["type"] == "summary"
    assert summary["num_windows"] == 15
    assert "stopped_reason" not in summary  # whole-stream summary is final


@pytest.mark.slow
def test_crash_recovery_resumes_without_loss(model_dirs, cpu_wrapper,
                                             tmp_path, capsys):
    """A hard mid-stream crash (no handoff line) resumes from the last
    forwarded window with line-rebuilt accumulators: indices stay
    contiguous and per-window values match the uninterrupted run exactly;
    the summary matches to the accumulator summation-order ULP."""
    audio = make_audio(7.0, seed=9)  # 13 windows; crash after 6
    ref = uninterrupted(model_dirs, audio.tobytes())

    crash_py = tmp_path / "serve_crash.py"
    crash_py.write_text(CRASH_WRAPPER)
    marker = tmp_path / "crashed.marker"
    rc, got = run_supervisor(
        model_dirs, audio.tobytes(),
        ["--rss-limit-mb", "100000"],
        f"{sys.executable} {crash_py} {marker}")
    assert rc == 0
    assert "crash-resuming" in capsys.readouterr().err
    assert marker.exists()

    got_windows = [json.loads(l) for l in got if
                   json.loads(l)["type"] == "window"]
    ref_windows = [json.loads(l) for l in ref if
                   json.loads(l)["type"] == "window"]
    assert [w["index"] for w in got_windows] == list(range(len(ref_windows)))
    for g, r in zip(got_windows, ref_windows):
        assert g == r
    got_summary = json.loads(got[-1])
    ref_summary = json.loads(ref[-1])
    for k, v in ref_summary.items():
        if isinstance(v, (int, str)):
            assert got_summary[k] == v, k
        elif isinstance(v, list):
            np.testing.assert_allclose(got_summary[k], v, rtol=1e-12)
        elif v is None:
            assert got_summary[k] is None, k
        else:
            np.testing.assert_allclose(got_summary[k], v, rtol=1e-12)


# ---------------- fast in-process pieces ----------------


def test_fold_window_lines_reproduce_summary(model_dirs):
    """fold_window_line_into_acc (the crash-recovery rebuild) applied to a
    real serve run's window lines must reproduce the summary's counts and
    means."""
    audio = make_audio(5.0, seed=21)
    out = io.StringIO()
    rc = serve.main(serve_args(model_dirs),
                    stdin_buffer=io.BytesIO(audio.tobytes()), stdout=out)
    assert rc == 0
    lines = [json.loads(l) for l in out.getvalue().splitlines()]
    summary = lines[-1]
    acc = serve.fresh_acc()
    for line in lines[:-1]:
        serve.fold_window_line_into_acc(acc, line)
    assert acc["n"] == summary["num_windows"]
    assert acc["idle"] == summary["stage1_idle_windows"]
    assert acc["swallow"] == summary["stage1_swallow_windows"]
    assert acc["eval_count"] == summary["stage2_swallow_windows_evaluated"]
    assert acc["healthy"] == summary["stage2_healthy_windows"]
    assert acc["zenker"] == summary["stage2_zenker_windows"]
    np.testing.assert_allclose(np.array(acc["s1_sum"]) / acc["n"],
                               summary["stage1_mean_probs"], rtol=1e-12)


def test_handoff_protocol_roundtrip(model_dirs):
    """--handoff + --expect-preamble in-process: segment A hands off, a
    preamble-seeded segment B fed the replay suffix reproduces the
    uninterrupted lines and an exact whole-stream summary."""
    audio = make_audio(6.0, seed=33)  # 11 windows
    ref = [json.loads(l) for l in uninterrupted(model_dirs,
                                                audio.tobytes())]

    out_a = io.StringIO()
    rc = serve.main(serve_args(model_dirs)
                    + ["--rss-limit-mb", "1", "--handoff"],
                    stdin_buffer=io.BytesIO(audio.tobytes()), stdout=out_a)
    assert rc == 3
    lines_a = [json.loads(l) for l in out_a.getvalue().splitlines()]
    handoff = lines_a[-1]
    assert handoff["type"] == "handoff"
    assert all(l["type"] == "window" for l in lines_a[:-1])
    assert handoff["next_window_index"] == len(lines_a) - 1

    hop = 8000
    replay = audio[handoff["next_window_index"] * hop:]
    preamble = json.dumps({"index_offset": handoff["next_window_index"],
                           "acc": handoff["acc"]}).encode() + b"\n"
    out_b = io.StringIO()
    rc = serve.main(serve_args(model_dirs) + ["--expect-preamble"],
                    stdin_buffer=io.BytesIO(preamble + replay.tobytes()),
                    stdout=out_b)
    assert rc == 0
    lines_b = [json.loads(l) for l in out_b.getvalue().splitlines()]

    assert lines_a[:-1] + lines_b == ref


def test_preamble_eof_exits_clean(model_dirs):
    rc = serve.main(serve_args(model_dirs) + ["--expect-preamble"],
                    stdin_buffer=io.BytesIO(b""), stdout=io.StringIO())
    assert rc == 0


def test_handoff_requires_rss_limit(model_dirs):
    with pytest.raises(SystemExit, match="rss-limit"):
        serve.main(serve_args(model_dirs) + ["--handoff"],
                   stdin_buffer=io.BytesIO(b""), stdout=io.StringIO())


def test_preamble_requires_stdin_input(model_dirs, tmp_path):
    with pytest.raises(SystemExit, match="stdin"):
        serve.main(serve_args(model_dirs)
                   + ["--expect-preamble", "--input", "x.wav"],
                   stdin_buffer=io.BytesIO(b""), stdout=io.StringIO())


def test_supervisor_rejects_managed_serve_flags(model_dirs):
    for flag in ("--handoff", "--expect-preamble", "--rss-limit-mb",
                 "--input"):
        with pytest.raises(SystemExit, match="managed by the supervisor"):
            serve_supervisor.main(
                ["--rss-limit-mb", "64", "--"] + serve_args(model_dirs)
                + ([flag, "1"] if flag.endswith("mb") else [flag]),
                stdin_buffer=io.BytesIO(b""), stdout=io.StringIO())


def test_tail_buffer_replay_and_eviction():
    tb = serve_supervisor.TailBuffer(max_bytes=10)
    tb.append(b"0123")
    tb.append(b"4567")
    assert tb.replay_from(2) == b"234567"
    tb.append(b"89ab")  # held=12 > 10: evicts the first chunk
    assert tb.replay_from(4) == b"456789ab"
    assert tb.replay_from(5) == b"56789ab"
    with pytest.raises(RuntimeError, match="replay-buffer-sec"):
        tb.replay_from(3)


def test_seed_accumulators_contract(model_dirs):
    import jax.numpy as jnp

    from zenker_audio_detection_tpu.infer import cascade as C
    from zenker_audio_detection_tpu.infer.streaming import StreamingCascade

    params1, cfg1 = convert.load_hf_model_dir(model_dirs[0])
    params2, cfg2 = convert.load_hf_model_dir(model_dirs[1])
    engine = C.TwoStageEngine(
        C.StageSpec(params1, cfg1, MEAN1, STD1, ("Idle", "Swallow")),
        C.StageSpec(params2, cfg2, MEAN2, STD2, ("Healthy", "Zenker")),
        C.CascadeConfig(dtype=jnp.float32))
    stream = StreamingCascade(engine, chunk_windows=4, retain_results=False)
    # acc_state round-trips through JSON and seeds a fresh stream exactly
    state = json.loads(json.dumps(stream.acc_state()))
    stream.seed_accumulators(state)
    with pytest.raises(ValueError, match="missing keys"):
        stream.seed_accumulators({"n": 0})
    with pytest.raises(ValueError, match="shape"):
        bad = dict(state, s1_sum=[1.0])
        stream.seed_accumulators(bad)
    stream.feed(make_audio(2.5, seed=1))
    with pytest.raises(RuntimeError, match="started stream"):
        stream.seed_accumulators(state)


def test_supervisor_validates_own_flags(model_dirs):
    with pytest.raises(SystemExit, match="pump-bytes"):
        serve_supervisor.main(
            ["--rss-limit-mb", "64", "--pump-bytes", "0", "--"]
            + serve_args(model_dirs),
            stdin_buffer=io.BytesIO(b""), stdout=io.StringIO())
    with pytest.raises(SystemExit, match="max-restarts"):
        serve_supervisor.main(
            ["--rss-limit-mb", "64", "--max-restarts-without-progress", "0",
             "--"] + serve_args(model_dirs),
            stdin_buffer=io.BytesIO(b""), stdout=io.StringIO())
