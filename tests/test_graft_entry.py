"""Driver-contract tests for __graft_entry__."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as G  # noqa: E402


def test_entry_jittable():
    import jax

    fn, (params, feats) = G.entry()
    logits = np.asarray(jax.jit(fn)(params, feats))
    assert logits.shape == (8, 2)
    assert np.isfinite(logits).all()


def test_dryrun_multichip_8(capsys):
    G.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "ok" in out and "loss=" in out
    assert "ok (dcn)" in out and "ok (fold-parallel)" in out
    assert "ok (fold x data)" in out


@pytest.mark.parametrize("n", [1, 2, 3])
def test_dryrun_multichip_small_counts(n, capsys):
    """n=2 and n=3 are the counts that crashed in round 2 (UnboundLocalError
    on hloss: the dcn print lived outside its guard). The driver contract is
    success for ALL n >= 1 — the dcn block only runs for even n >= 4."""
    G.dryrun_multichip(n)
    out = capsys.readouterr().out
    assert f"dryrun_multichip({n}): ok" in out
    assert "ok (dcn)" not in out  # dcn/fold-x-data layouts need even n >= 4
    assert "ok (fold x data)" not in out
    if n >= 2:
        assert "ok (fold-parallel)" in out


@pytest.mark.slow
def test_dryrun_multichip_self_provisions_with_adverse_flags(tmp_path):
    """The driver contract: dryrun_multichip(n) must succeed even when the
    inherited XLA_FLAGS pins a SMALLER virtual device count — the re-exec
    must replace (not just append to) the flag."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "import __graft_entry__ as g; g.dryrun_multichip(4)"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip(4): ok" in r.stdout
