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
