"""bench.py driver contract: exactly ONE JSON line on stdout, carrying the
metric, vs_baseline, and the round-3 denominator-visibility field."""

import json

import bench


def test_bench_prints_one_json_line(monkeypatch, capsys):
    monkeypatch.setattr(bench, "bench_tpu",
                        lambda engine, **kw: (160.0, 1199))
    monkeypatch.setattr(bench, "bench_cpu_reference", lambda: 0.192)
    monkeypatch.setattr(bench, "build_engine", lambda stage2_mode="all": None)
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
    # host load flags a deflated CPU denominator (concurrent jobs cost ~2x)
    assert isinstance(payload["host_load_1min"], float)
    assert payload["host_load_1min"] >= 0
