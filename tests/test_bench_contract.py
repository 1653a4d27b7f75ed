"""bench.py driver contract: exactly ONE JSON line on stdout, carrying the
metric, vs_baseline, and the round-3 denominator-visibility field."""

import json

import bench


def test_bench_prints_one_json_line(monkeypatch, capsys):
    monkeypatch.setattr(bench, "bench_audio", lambda *a, **kw: None)
    monkeypatch.setattr(
        bench, "bench_tpu",
        lambda engine, audio=None, **kw: ((160.0, 1199, 1199)
                                          if engine == "all-engine"
                                          else (219.0, 1199, 404)))
    monkeypatch.setattr(bench, "bench_cpu_reference", lambda: 0.192)
    monkeypatch.setattr(bench, "build_engine",
                        lambda stage2_mode="all", **kw: "all-engine")
    monkeypatch.setattr(bench, "calibrated_gated_engine",
                        lambda audio, **kw: "gated-engine")
    monkeypatch.setattr("sys.argv", ["bench.py"])
    bench.main()
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.strip()]
    assert len(lines) == 1, out
    payload = json.loads(lines[0])
    assert payload["metric"] == "e2e_2stage_windows_per_sec_per_chip"
    assert payload["unit"] == "windows/s"
    assert payload["value"] == 160.0
    assert payload["vs_baseline"] == round(160.0 / 0.192, 2)
    # denominator drift must be visible to the driver (VERDICT r2 weak #5)
    assert payload["cpu_windows_per_sec"] == 0.192
    # the secondary gated figure must carry its REALIZED gate rate so a
    # drifted calibration can't masquerade as production scaling
    # (VERDICT r4 item #3)
    assert payload["gated_windows_per_sec"] == 219.0
    assert payload["gate_rate"] == round(404 / 1199, 4)
    # host load flags a deflated CPU denominator (concurrent jobs cost ~2x)
    assert isinstance(payload["host_load_1min"], float)
    assert payload["host_load_1min"] >= 0


def test_bench_unreachable_chip_fails_fast(capsys):
    """A stalled axon tunnel (device enumeration blocking for hours) must
    produce ONE diagnosable JSON line + nonzero exit instead of hanging
    past the driver's timeout with no output."""
    import time

    import pytest

    with pytest.raises(SystemExit) as e:
        bench.assert_chip_reachable(timeout_s=0.05,
                                    probe=lambda: time.sleep(5))
    assert e.value.code == 1
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 1
    payload = json.loads(lines[0])
    assert payload["metric"] == "e2e_2stage_windows_per_sec_per_chip"
    assert payload["value"] == 0.0
    assert "TPU unreachable" in payload["error"]


def test_bench_reachable_chip_prints_nothing(capsys):
    bench.assert_chip_reachable(timeout_s=5.0, probe=lambda: None)
    assert capsys.readouterr().out == ""


def test_bench_probe_exception_reported_not_misdiagnosed(capsys):
    """A probe that RAISES instantly (broken backend init) must fail fast
    with the actual exception in the error field — not idle the full
    timeout and claim a tunnel stall."""
    import time

    import pytest

    def boom():
        raise RuntimeError("unable to initialize backend")

    t0 = time.monotonic()
    with pytest.raises(SystemExit) as e:
        bench.assert_chip_reachable(timeout_s=30.0, probe=boom)
    assert time.monotonic() - t0 < 5.0  # did NOT wait out the watchdog
    assert e.value.code == 1
    payload = json.loads(capsys.readouterr().out.strip())
    assert "unable to initialize backend" in payload["error"]
    assert "blocked" not in payload["error"]
