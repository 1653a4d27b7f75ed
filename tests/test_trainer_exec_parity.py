"""Executed-reference differentials for the two TRAINING scripts.

The reference trainers (src/train_ast_stage{1,2}_cross_validation.py) could
never run here before: `evaluate`/`audiomentations`/`torchcodec` are absent
and the MIT hub checkpoint is unreachable (zero egress). tests/refstubs.py
removes all three blockers (sklearn-backed evaluate, identity
audiomentations, PCM16-exact torchcodec, offline-seeded tiny-model HF
cache), so this module runs the ACTUAL reference code and diffs our
implementation against it on four axes:

- loss functions: the real FocalLossTrainer.compute_loss /
  ImprovedWeightedTrainer.compute_loss executed on random draws vs
  train/losses.py (upgrades the former torch-REIMPLEMENTATION parity).
- compute_metrics: the real function on random (logits, labels) vs
  train/metrics.py, exact equality.
- early stopping + best-model selection: the real
  transformers.EarlyStoppingCallback + Trainer._determine_best_metric
  driven over random metric sequences vs loop.epoch_bookkeeping —
  including the subtlety that on_evaluate fires BEFORE the best-metric
  update, so each patience check compares against the previous epoch's
  best, and that the best update itself ignores the threshold.
- end-to-end (slow): the full reference trainer vs our CLI trainer on an
  identical corpus/recipe — artifact tree, cv_metrics.npy key structure,
  run_config.json key structure, and the saturated confusion matrices /
  classification reports must match. Trajectory values can't be compared
  bitwise (both trainers random-init with their own framework RNG), so the
  corpus is separable and both must land at the same perfect CMs.
"""

import json
import os
import subprocess
import sys
import types
from pathlib import Path

import numpy as np
import pytest

import refstubs

REF_SRC = Path("/root/reference/src")
STAGE1 = REF_SRC / "train_ast_stage1_cross_validation.py"
STAGE2 = REF_SRC / "train_ast_stage2_cross_validation.py"
pytestmark = pytest.mark.skipif(not STAGE1.exists(),
                                reason="reference not mounted")


@pytest.fixture(scope="module")
def ref_mods():
    """Both trainer module bodies executed in-process (module-scoped: the
    bodies import transformers and build datasets Features)."""
    import sys as _sys

    saved = {k: _sys.modules.get(k) for k in ("evaluate", "audiomentations")}

    class _MP:
        def setitem(self, d, k, v):
            d[k] = v

    refstubs.install_inprocess_stubs(_MP())
    try:
        yield (refstubs.exec_ref_module(STAGE1),
               refstubs.exec_ref_module(STAGE2))
    finally:
        for k, v in saved.items():
            if v is None:
                _sys.modules.pop(k, None)
            else:
                _sys.modules[k] = v


def _bare(cls, **attrs):
    obj = object.__new__(cls)
    for k, v in attrs.items():
        setattr(obj, k, v)
    return obj


def _draws(rng, n_classes=2, n=12):
    for _ in range(n):
        b = int(rng.integers(1, 24))
        logits = rng.standard_normal((b, n_classes)) * rng.uniform(0.5, 4.0)
        labels = rng.integers(0, n_classes, size=b)
        yield logits.astype(np.float32), labels.astype(np.int64)


def test_stage1_loss_vs_executed_reference(ref_mods):
    import torch

    from zenker_audio_detection_tpu.train import losses

    g1, _ = ref_mods
    rng = np.random.default_rng(20260819)
    for gamma in (0.0, 0.5, 2.0, 5.0):
        for ls in (0.0, 0.1, 0.3):
            for logits, labels in _draws(rng, n=3):
                t = _bare(g1["FocalLossTrainer"], focal_gamma=gamma,
                          label_smoothing_factor=ls)
                fake = lambda **kw: types.SimpleNamespace(
                    logits=torch.from_numpy(logits))
                ref = float(t.compute_loss(
                    fake, {"labels": torch.from_numpy(labels),
                           "input_values": None}))
                ours = float(losses.stage1_loss(logits, labels, gamma, ls))
                assert ours == pytest.approx(ref, abs=2e-6), (gamma, ls)


def test_stage2_focal_loss_vs_executed_reference(ref_mods):
    import torch

    from zenker_audio_detection_tpu.train import losses

    _, g2 = ref_mods
    rng = np.random.default_rng(77)
    cases = []
    for alpha in (0.25, 0.4, None):
        for cw in (None, [1.7, 0.6]):
            for gamma in (2.0, 0.7):
                cases.append((alpha, cw, gamma, 0.1))
    cases.append((0.25, [2.0, 0.5], 2.0, 0.0))
    for alpha, cw, gamma, ls in cases:
        for logits, labels in _draws(rng, n=3):
            t = _bare(
                g2["ImprovedWeightedTrainer"],
                class_weights=(torch.tensor(cw) if cw is not None else None),
                focal_alpha=alpha, focal_gamma=gamma, label_smoothing=ls,
                use_focal_loss=True)
            fake = lambda **kw: {"logits": torch.from_numpy(logits)}
            ref = float(t.compute_loss(
                fake, {"labels": torch.from_numpy(labels)}))
            ours = float(losses.stage2_focal_loss(
                logits, labels, cw, alpha, gamma, ls))
            assert ours == pytest.approx(ref, abs=2e-6), (alpha, cw, gamma,
                                                          ls)
    # both sides of the batch-level alpha quirk explicitly
    logits = rng.standard_normal((4, 2)).astype(np.float32)
    for labels in ([0, 0, 0, 1], [1, 1, 1, 0], [0, 0, 1, 1]):
        labels = np.asarray(labels, np.int64)
        t = _bare(g2["ImprovedWeightedTrainer"], class_weights=None,
                  focal_alpha=0.25, focal_gamma=2.0, label_smoothing=0.1,
                  use_focal_loss=True)
        fake = lambda **kw: {"logits": torch.from_numpy(logits)}
        ref = float(t.compute_loss(fake,
                                   {"labels": torch.from_numpy(labels)}))
        ours = float(losses.stage2_focal_loss(logits, labels, None, 0.25,
                                              2.0, 0.1))
        assert ours == pytest.approx(ref, abs=2e-6), labels


def test_stage2_weighted_ce_vs_executed_reference(ref_mods):
    import torch

    from zenker_audio_detection_tpu.train import losses

    _, g2 = ref_mods
    rng = np.random.default_rng(4242)
    for cw in (None, [1.7, 0.6], [0.4, 3.0]):
        for ls in (0.0, 0.1, 0.25):
            for logits, labels in _draws(rng, n=3):
                t = _bare(
                    g2["ImprovedWeightedTrainer"],
                    class_weights=(torch.tensor(cw) if cw is not None
                                   else None),
                    focal_alpha=0.25, focal_gamma=2.0, label_smoothing=ls,
                    use_focal_loss=False)
                fake = lambda **kw: {"logits": torch.from_numpy(logits)}
                ref = float(t.compute_loss(
                    fake, {"labels": torch.from_numpy(labels)}))
                ours = float(losses.stage2_weighted_ce(logits, labels, cw,
                                                       ls))
                assert ours == pytest.approx(ref, abs=2e-6), (cw, ls)


def test_compute_metrics_vs_executed_reference(ref_mods):
    from zenker_audio_detection_tpu.train import metrics as M

    rng = np.random.default_rng(11)
    for g in ref_mods:
        for logits, labels in _draws(rng, n=6):
            pred = types.SimpleNamespace(predictions=logits,
                                         label_ids=labels)
            ref = g["compute_metrics"](pred)
            ours = M.compute_metrics_from_logits(logits, labels)
            assert ours == ref  # exact: same sklearn on the same arrays
        # single-class degenerate draws (zero_division path)
        for labels in (np.zeros(5, np.int64), np.ones(5, np.int64)):
            logits = rng.standard_normal((5, 2)).astype(np.float32)
            pred = types.SimpleNamespace(predictions=logits,
                                         label_ids=labels)
            assert M.compute_metrics_from_logits(logits, labels) == \
                g["compute_metrics"](pred)


def test_early_stopping_vs_executed_hf_callback(tmp_path):
    """Random metric sequences through the REAL transformers
    EarlyStoppingCallback + Trainer._determine_best_metric vs our
    epoch_bookkeeping: stop epoch, best epoch and best metric must agree —
    including exact-threshold boundaries and the previous-epoch-best
    comparison order."""
    from transformers import (EarlyStoppingCallback, Trainer,
                              TrainerControl, TrainerState,
                              TrainingArguments)

    from zenker_audio_detection_tpu.train import loop as L

    args = TrainingArguments(
        output_dir=str(tmp_path / "hfargs"), metric_for_best_model="f1",
        greater_is_better=True, load_best_model_at_end=True,
        save_strategy="epoch", eval_strategy="epoch", report_to=[])

    def hf_run(seq):
        state, control = TrainerState(), TrainerControl()
        cb = EarlyStoppingCallback(early_stopping_patience=2,
                                   early_stopping_threshold=0.001)
        ft = _bare(Trainer, args=args, state=state)
        best_epoch, stop_epoch = -1, None
        for epoch, v in enumerate(seq, start=1):
            state.global_step = epoch
            # trainer order: on_evaluate (patience) BEFORE best update
            cb.on_evaluate(args, state, control, metrics={"eval_f1": v})
            if ft._determine_best_metric({"eval_f1": v}, None):
                best_epoch = epoch
            if control.should_training_stop:
                stop_epoch = epoch
                break
        return best_epoch, stop_epoch, float(state.best_metric)

    def our_run(seq, workdir):
        cfg = L.TrainFoldConfig(stage="stage1", data_dir="unused",
                                output_root=str(workdir))
        prog = L.FoldProgress(patience_left=cfg.early_stopping_patience)
        tiny = {"w": np.zeros(1, np.float32)}
        best_epoch, stop_epoch = -1, None
        for epoch, v in enumerate(seq, start=1):
            L.epoch_bookkeeping(cfg, str(workdir), epoch, 1, 2, {"f1": v},
                                True, prog, lambda: (tiny, tiny), None)
            if stop_epoch is None and prog.stopped:
                stop_epoch = epoch
                break
        return prog.best_epoch, stop_epoch, prog.best_f1

    rng = np.random.default_rng(3)
    seqs = [list(np.round(rng.uniform(0.3, 0.9, size=10), 4))
            for _ in range(8)]
    # adversarial: exact-threshold margins, ties, plateau, monotone rise
    seqs += [
        [0.5, 0.501, 0.5011, 0.5, 0.5],       # margin == δ is NOT enough
        [0.5, 0.5, 0.5, 0.5],                  # immediate plateau
        [0.5, 0.5005, 0.5009, 0.5012, 0.50121],  # sub-δ creep w/ best drift
        [0.1, 0.2, 0.3, 0.4, 0.5, 0.6],        # never stops
        [0.9, 0.1, 0.1, 0.1],                  # early peak
        [0.6, 0.6001, 0.5999, 0.6002, 0.6003],
    ]
    for i, seq in enumerate(seqs):
        d = tmp_path / f"seq{i}"
        d.mkdir()
        assert hf_run(seq) == pytest.approx(our_run(seq, d)), (i, seq)


# ---------------------------------------------------------------------------
# End-to-end: the full reference trainer vs our CLI trainer
# ---------------------------------------------------------------------------

DRIVER = '''\
"""Run the actual reference trainer with DATA/LOG dirs redirected (its
module constants are derived from the read-only script location)."""
import os, sys

ref, data_dir, log_dir = sys.argv[1:4]
g = {"__file__": ref, "__name__": "ref_trainer"}
with open(ref) as f:
    exec(compile(f.read(), ref, "exec"), g)
g["DATA_DIR"] = data_dir
g["LOG_DIR"] = log_dir
g["NUM_EPOCHS"] = int(os.environ["REF_NUM_EPOCHS"])
sys.argv = ["ref_trainer"] + sys.argv[4:]
g["main"]()
'''


def _make_corpus(root: Path, rng, *, n_per_class=20, imbalance=False):
    """Separable two-class corpus + fold-1 npys in the reference layout."""
    from zenker_audio_detection_tpu.audio import io as aio

    data = root / "data"
    wavs = root / "wavs"
    data.mkdir()
    wavs.mkdir()

    def make(n, amp, tag):
        out = []
        for i in range(n):
            p = wavs / f"{tag}_{i}.wav"
            aio.write_wav(str(p), (rng.standard_normal(16000) * amp
                                   ).astype(np.float32), 16000)
            out.append(str(p))
        return out

    n_lo = (n_per_class // 2) if imbalance else n_per_class
    lo = make(n_lo, 0.001, "lo")
    hi = make(n_per_class, 0.8, "hi")

    def save(prefix, xs, ys):
        np.save(data / f"{prefix}_x_fold1.npy", np.array(xs))
        np.save(data / f"{prefix}_y_fold1.npy", np.array(ys))

    tr_lo, tr_hi = lo[:-8], hi[:-8]
    save("train", tr_lo + tr_hi, [0] * len(tr_lo) + [1] * len(tr_hi))
    save("val", lo[-8:-4] + hi[-8:-4], [0] * 4 + [1] * 4)
    save("test", lo[-4:] + hi[-4:], [0] * 4 + [1] * 4)
    with open(data / "stats_per_fold.json", "w") as f:
        json.dump([{"fold": 1, "mean": -4.27, "std": 4.57, "count": 100}], f)
    return data


def _run_reference_trainer(tmp_path: Path, script: Path, data_dir: Path,
                           extra_args, epochs=12) -> Path:
    stub_dir = refstubs.write_stub_tree(tmp_path / "stubs")
    hf_home = tmp_path / "hf"
    refstubs.seed_tiny_hf_cache(hf_home)
    driver = tmp_path / "ref_driver.py"
    driver.write_text(DRIVER)
    out_root = tmp_path / "ref_runs"
    env = dict(os.environ)
    env.update(HF_HOME=str(hf_home), HF_HUB_OFFLINE="1",
               TRANSFORMERS_OFFLINE="1", REF_NUM_EPOCHS=str(epochs),
               PYTHONPATH=str(stub_dir), WANDB_DISABLED="true")
    r = subprocess.run(
        [sys.executable, str(driver), str(script), str(data_dir),
         str(tmp_path / "ref_logs"), "--no-wandb", "--fold", "1",
         "--output-root", str(out_root), "--learning-rate", "1e-2",
         "--disable-early-stopping", *extra_args],
        env=env, capture_output=True, text=True, timeout=560)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    return out_root


def _key_tree(d):
    if isinstance(d, dict):
        return {k: _key_tree(v) for k, v in sorted(d.items())}
    return None


def _compare_runs(ref_root: Path, our_root: Path, fold=1):
    ref = np.load(ref_root / "cv_metrics.npy", allow_pickle=True).item()
    our = np.load(our_root / "cv_metrics.npy", allow_pickle=True).item()
    assert set(ref) == set(our) == {"per_fold", "aggregate"}
    assert set(ref["per_fold"][0]) == set(our["per_fold"][0]), (
        set(ref["per_fold"][0]) ^ set(our["per_fold"][0]))
    assert set(ref["aggregate"]) == set(our["aggregate"])

    # both trainings must saturate on the separable corpus: every sklearn
    # metric identical (1.0), final epoch identical
    for split in ("val", "test"):
        for m in ("accuracy", "precision", "recall", "f1"):
            k = f"fold{fold}_{split}_eval_{m}"
            assert ref["per_fold"][0][k] == 1.0, (k, ref["per_fold"][0][k])
            assert our["per_fold"][0][k] == 1.0, (k, our["per_fold"][0][k])
        assert (ref["per_fold"][0][f"fold{fold}_{split}_epoch"]
                == our["per_fold"][0][f"fold{fold}_{split}_epoch"])

    # artifact tree contract
    for root in (ref_root, our_root):
        fd = root / f"fold{fold}"
        assert (fd / "run_config.json").exists(), root
        for split in ("val", "test"):
            ed = fd / "best" / f"evaluation_{split}"
            assert (ed / "confusion_matrix.npy").exists(), ed
            assert (ed / "classification_report.txt").exists(), ed
        for name in ("config.json", "model.safetensors",
                     "preprocessor_config.json"):
            assert (fd / "best" / name).exists(), (root, name)
        assert (root / "cv_metrics.txt").read_text().startswith(
            "Per-fold metrics:")

    # CMs + classification reports identical (both saturated)
    for split in ("val", "test"):
        rcm = np.load(ref_root / f"fold{fold}" / "best"
                      / f"evaluation_{split}" / "confusion_matrix.npy")
        ocm = np.load(our_root / f"fold{fold}" / "best"
                      / f"evaluation_{split}" / "confusion_matrix.npy")
        np.testing.assert_array_equal(rcm, ocm)
        assert np.trace(rcm) == rcm.sum()  # perfect — the bar is real
        rrep = (ref_root / f"fold{fold}" / "best" / f"evaluation_{split}"
                / "classification_report.txt").read_text().strip()
        orep = (our_root / f"fold{fold}" / "best" / f"evaluation_{split}"
                / "classification_report.txt").read_text().strip()
        assert rrep == orep

    # run_config.json: identical nested key structure
    rcfgs = sorted(ref_root.glob("run_config_*.json"))
    ocfgs = sorted(our_root.glob("run_config_*.json"))
    assert rcfgs and ocfgs
    rcfg = json.loads(rcfgs[0].read_text())
    ocfg = json.loads(ocfgs[0].read_text())
    assert _key_tree(rcfg) == _key_tree(ocfg)
    for k in ("stage", "seed", "num_epochs", "per_device_train_batch_size",
              "learning_rate", "dry_run", "target_folds", "fold_requested",
              "checkpoint_limit"):
        assert rcfg[k] == ocfg[k], k
    assert rcfg["loss"] == ocfg["loss"]
    assert rcfg["early_stopping"] == ocfg["early_stopping"]
    return ref, our


@pytest.mark.slow
def test_stage1_trainer_e2e_vs_executed_reference(tmp_path):
    from zenker_audio_detection_tpu.cli import train_stage1

    rng = np.random.default_rng(20260819)
    data_dir = _make_corpus(tmp_path, rng)
    ref_root = _run_reference_trainer(tmp_path, STAGE1, data_dir, [])

    our_root = tmp_path / "our_runs"
    snap = (tmp_path / "hf" / "hub"
            / "models--MIT--ast-finetuned-audioset-10-10-0.4593"
            / "snapshots" / "local")
    train_stage1.main([
        "--fold", "1", "--data-dir", str(data_dir),
        "--output-root", str(our_root), "--num-epochs", "12",
        "--learning-rate", "1e-2", "--no-early-stopping", "--no-augment",
        "--no-wandb", "--pretrained-model-dir", str(snap)])

    ref, our = _compare_runs(ref_root, our_root)
    # stage-1 must NOT carry the stage-2-only generic test_* duplicates
    assert not any(k.startswith("test_") for k in our["per_fold"][0])

    # interop: the reference-trained best/ dir loads through OUR engine
    # loader and classifies the corpus the same way torch did
    from zenker_audio_detection_tpu.models import convert
    params, mcfg = convert.load_hf_model_dir(str(ref_root / "fold1" / "best"))
    assert mcfg.num_labels == 2


@pytest.mark.slow
def test_stage2_trainer_e2e_vs_executed_reference(tmp_path):
    """Stage-2: focal loss + inverse-frequency class weights (imbalanced
    train split) + label smoothing, and the generic test_* duplicate keys
    the stage-2 reference adds for sweep optimization."""
    from zenker_audio_detection_tpu.cli import train_stage2

    rng = np.random.default_rng(5)
    data_dir = _make_corpus(tmp_path, rng, imbalance=True)
    ref_root = _run_reference_trainer(tmp_path, STAGE2, data_dir, [])

    our_root = tmp_path / "our_runs"
    snap = (tmp_path / "hf" / "hub"
            / "models--MIT--ast-finetuned-audioset-10-10-0.4593"
            / "snapshots" / "local")
    train_stage2.main([
        "--fold", "1", "--data-dir", str(data_dir),
        "--output-root", str(our_root), "--num-epochs", "12",
        "--learning-rate", "1e-2", "--no-early-stopping", "--no-augment",
        "--no-wandb", "--pretrained-model-dir", str(snap)])

    ref, our = _compare_runs(ref_root, our_root)
    # the stage-2 generic duplicates exist on BOTH sides with equal key sets
    rdup = {k for k in ref["per_fold"][0] if k.startswith("test_")}
    odup = {k for k in our["per_fold"][0] if k.startswith("test_")}
    assert rdup == odup and rdup, rdup ^ odup
    assert ref["per_fold"][0]["test_f1"] == our["per_fold"][0]["test_f1"] \
        == 1.0
