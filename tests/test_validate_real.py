"""CI self-test of the `zenker-validate-real` runbook (round-3 VERDICT
item #3): drives the ENTIRE validation chain — converter parity, both
snippet evals, ROC/PR, cascade batch inference, patient aggregation,
report table — on synthetic HF-format fixtures, plus a sensitivity check
proving the CM PASS/FAIL logic actually discriminates."""

import json
import os

import numpy as np
import pytest

from zenker_audio_detection_tpu.analysis import validate


FOLDS = [1, 2]


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    """Fake runs tree (both stages x 2 folds), split data dirs, long-audio
    tree + per-fold test-ids files — the exact layout the real assets use
    (reference README; test_real_weights.py env-var docs)."""
    import jax

    from zenker_audio_detection_tpu.audio import io as aio
    from zenker_audio_detection_tpu.models import ast as ast_mod, convert
    from zenker_audio_detection_tpu.train import loop as train_loop

    root = tmp_path_factory.mktemp("validate_real")
    runs = root / "runs"
    cfg = ast_mod.ASTConfig(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=4, intermediate_size=64,
                            max_length=128, num_labels=2)
    for si, stage in enumerate(("stage1", "stage2")):
        for fold in FOLDS:
            d = runs / f"ast_classifier_{stage}" / f"fold{fold}" / "best"
            params = ast_mod.init_params(
                jax.random.PRNGKey(10 * si + fold), cfg)
            convert.save_hf_model_dir(params, cfg, str(d))
            train_loop.save_feature_extractor_config(
                str(d), -1.1509622, 3.5340312, max_length=128)

    rng = np.random.default_rng(5)
    for stage, classes in (("stage1", ("Idle", "Swallow")),
                           ("stage2", ("Healthy", "Zenker"))):
        data = root / f"data_ast_{stage}"
        data.mkdir()
        with open(data / "class_mapping.json", "w") as f:
            json.dump({c: i for i, c in enumerate(classes)}, f)
        for fold in FOLDS:
            xs, ys = [], []
            for i in range(6):
                label = i % 2
                amp = 0.02 if label == 0 else 0.3
                p = root / "wavs" / f"{stage}_f{fold}_{i}.wav"
                p.parent.mkdir(parents=True, exist_ok=True)
                aio.write_wav(str(p), (rng.standard_normal(16000) * amp
                                       ).astype(np.float32), 16000,
                              dtype="float32")
                xs.append(str(p))
                ys.append(label)
            np.save(data / f"test_x_fold{fold}.npy", np.asarray(xs, object))
            np.save(data / f"test_y_fold{fold}.npy", np.asarray(ys))

    la = root / "long_audio"
    ids_dir = root / "data_ast_stage2"
    for fold in FOLDS:
        pids = []
        for cls in ("Healthy", "Zenker"):
            pid = f"{cls[0]}{fold:02d}"
            pdir = la / cls / pid
            pdir.mkdir(parents=True)
            for j in range(2):
                aio.write_wav(str(pdir / f"rec{j}.wav"),
                              (rng.standard_normal(16000 * 3) * 0.2
                               ).astype(np.float32), 16000, dtype="float32")
            pids.append(f"{cls}/{pid}")
        with open(ids_dir / f"test_ids_fold{fold}.txt", "w") as f:
            f.write("\n".join(pids) + "\n")
    return root, str(runs)


@pytest.fixture(scope="module")
def full_report(assets, tmp_path_factory):
    import jax.numpy as jnp

    root, runs = assets
    out = str(tmp_path_factory.mktemp("report"))
    report = validate.run_validation(
        runs_dir=runs,
        data_stage1=str(root / "data_ast_stage1"),
        data_stage2=str(root / "data_ast_stage2"),
        long_audio_root=str(root / "long_audio"),
        output_dir=out, folds=FOLDS, dtype=jnp.float32)
    return report, out


def test_full_chain_passes_and_reports(full_report, capsys):
    report, out = full_report
    assert report["passed"] is True
    # fake 12-window assets never match the paper's eval N: the run is
    # clean but must be flagged as not-actually-compared
    assert report["paper_comparable"] is False
    names = {c["name"]: c for c in report["checks"]}

    conv = [c for c in report["checks"] if "converter" in c["name"]]
    assert len(conv) == 2 and all(c["verdict"] == "PASS" for c in conv)
    # converter fidelity is scored on the CPU backend at the tight bar —
    # on a TPU session the f32 forward takes bf16 MXU passes and a 1e-3
    # bar would flag healthy checkpoints (found by the on-chip quickstart)
    for c in conv:
        assert "(cpu forward)" in c["ours"]
        assert c["paper"] == "<=1e-03"

    cm_checks = [c for c in report["checks"] if "summed" in c["name"]]
    assert len(cm_checks) == 2
    for c in cm_checks:  # 12-window fake set != paper's N -> informational
        assert c["verdict"] == "INFO"
        assert np.asarray(c["cm"]).sum() == 12

    roc = names["stage1 pooled val ROC-AUC"]
    assert roc["verdict"] == "INFO" and 0.0 <= float(roc["ours"]) <= 1.0

    agg = [c for c in report["checks"] if "aggregation" in c["name"]]
    assert len(agg) == 1 and agg[0]["verdict"] == "INFO"
    assert "4 patients" in agg[0]["ours"]

    with open(os.path.join(out, "validation_report.json")) as f:
        assert json.load(f)["passed"] is True
    assert os.path.exists(os.path.join(out, "roc_pr_stage1.json"))
    assert os.path.exists(os.path.join(out, "patient_aggregate.json"))
    # four per-patient cascade JSONs (2 folds x 2 patients)
    outs = [p for p in os.listdir(os.path.join(out, "outputs"))
            if p.endswith("_2stage.json")]
    assert len(outs) == 4


def test_cm_comparison_discriminates(assets, full_report, tmp_path,
                                     monkeypatch):
    """When the paper CM matches the evaluated N, the comparison becomes a
    real PASS/FAIL gate: equal CMs pass, a shifted CM fails (and flips the
    overall verdict + CLI exit code)."""
    import jax.numpy as jnp

    root, runs = assets
    report, _ = full_report
    ours = {("stage1" if "stage1" in c["name"] else "stage2"):
            np.asarray(c["cm"])
            for c in report["checks"] if "summed" in c["name"]}

    def rerun(paper, out):
        monkeypatch.setattr(validate, "PAPER_CM", paper)
        return validate.run_validation(
            runs_dir=runs,
            data_stage1=str(root / "data_ast_stage1"),
            data_stage2=str(root / "data_ast_stage2"),
            output_dir=str(tmp_path / out), folds=FOLDS,
            skip_converter=True, dtype=jnp.float32)

    good = rerun(ours, "match")
    cm_checks = [c for c in good["checks"] if "summed" in c["name"]]
    assert all(c["verdict"] == "PASS" for c in cm_checks)
    assert good["passed"] is True
    assert good["paper_comparable"] is True  # N matched -> a real verdict

    shifted = {k: v + np.array([[3, -3], [0, 0]]) for k, v in ours.items()}
    bad = rerun(shifted, "shift")
    cm_checks = [c for c in bad["checks"] if "summed" in c["name"]]
    assert all(c["verdict"] == "FAIL" for c in cm_checks)
    assert bad["passed"] is False
    assert bad["paper_comparable"] is True

    # only ONE stage's N matching must NOT certify parity: the other
    # stage's published CM was never compared (e.g. a wrong --data-stage2
    # tree), so the run is INCONCLUSIVE, not PASS
    half = {"stage1": ours["stage1"],
            "stage2": ours["stage2"] + np.full((2, 2), 1000)}
    part = rerun(half, "half")
    verdicts = {("stage1" if "stage1" in c["name"] else "stage2"):
                c["verdict"]
                for c in part["checks"] if "summed" in c["name"]}
    assert verdicts["stage1"] == "PASS" and verdicts["stage2"] == "INFO"
    assert part["passed"] is True
    assert part["paper_comparable"] is False


def test_cli_exit_codes(assets, tmp_path):
    from zenker_audio_detection_tpu.cli import validate_real

    root, runs = assets
    with pytest.raises(SystemExit) as e:
        validate_real.main([
            "--runs-dir", runs,
            "--data-stage1", str(root / "data_ast_stage1"),
            "--data-stage2", str(root / "data_ast_stage2"),
            "--output-dir", str(tmp_path / "cli"),
            "--folds", "1,2", "--skip-converter", "--f32"])
    # clean run on fake assets: the paper comparison never happened, so
    # the CLI signals INCONCLUSIVE (2), not a parity-proving 0
    assert e.value.code == 2

def test_manifest_matches_checker_requirements(assets, full_report):
    """VERDICT r4 item #7: the shipped manifest must describe what the
    checker ACTUALLY requires — eval-N gate, checkpoint name, fold files —
    asserted against the live chain, not restated constants."""
    m = validate.asset_manifest()

    # the exit-0 gate is "summed CM N == paper N" (validate._compare_cm):
    # the manifest's Ns must be exactly the paper CM totals
    for s in ("stage1", "stage2"):
        paper = np.asarray(validate.PAPER_CM[s])
        assert m["paper_eval_n"][s] == int(paper.sum())
        assert np.array_equal(np.asarray(m["paper_cm"][s]), paper)
    assert m["paper_eval_n"] == {"stage1": 4251, "stage2": 1432}

    # the checkpoint name is the one the reference trainers hardcode and
    # our trainer defaults to (train/loop.py run_config snapshot)
    from zenker_audio_detection_tpu.train import loop as train_loop
    import inspect
    assert m["pretrained_checkpoint"] in inspect.getsource(train_loop)
    assert m["folds"] == [1, 2, 3, 4, 5]

    # every file the full chain opened in the fixture tree is covered by a
    # manifest pattern (drive-verified, not hand-listed): collect the
    # fixture's actual artifact names and match them against the patterns
    root, runs = assets
    for stage in ("stage1", "stage2"):
        for fold in FOLDS:
            best = os.path.join(runs, f"ast_classifier_{stage}",
                                f"fold{fold}", "best")
            for fn in ("model.safetensors", "config.json",
                       "preprocessor_config.json"):
                assert os.path.exists(os.path.join(best, fn))
                assert any(fn in pat for pat in m["runs_tree"]), fn
            for fn in (f"test_x_fold{fold}.npy", f"test_y_fold{fold}.npy"):
                assert os.path.exists(
                    os.path.join(root, f"data_ast_{stage}", fn))
                key = f"data_{stage}"
                assert any(fn.replace(f"fold{fold}", "fold{K}") in pat
                           for pat in m["data_tree"][key]), fn

    # exit-code table matches the CLI contract exercised in
    # test_cli_exit_codes (all three codes present and distinct)
    assert set(m["exit_codes"]) == {"0", "1", "2"}
    assert "INCONCLUSIVE" in m["exit_codes"]["2"]


def test_manifest_doc_and_cli_in_sync(capsys):
    """VALIDATE_REAL.md is byte-identical to the rendered manifest, and
    --print-manifest prints it without needing any asset args."""
    import pathlib

    from zenker_audio_detection_tpu.cli import validate_real

    md = validate.render_manifest_md()
    repo_root = pathlib.Path(__file__).resolve().parents[1]
    on_disk = (repo_root / "VALIDATE_REAL.md").read_text()
    assert on_disk == md, "VALIDATE_REAL.md drifted — regenerate via " \
        "python -c 'from zenker_audio_detection_tpu.analysis import " \
        "validate; open(\"VALIDATE_REAL.md\",\"w\")" \
        ".write(validate.render_manifest_md())'"

    validate_real.main(["--print-manifest"])  # must not SystemExit/require
    assert capsys.readouterr().out.strip() == md.strip()


def test_converter_gap_accelerator_fallback(assets, monkeypatch):
    """Accelerator-only runtimes (no CPU backend) fall back to the session
    backend at the documented on-chip bar (f32-on-TPU == bf16 MXU passes
    => <=1e-2), instead of mis-applying the CPU-grade 1e-3 tolerance."""
    import jax

    root, runs = assets
    model_dir = os.path.join(runs, "ast_classifier_stage1", "fold1", "best")

    gap, tol, backend = validate.converter_logit_gap(model_dir)
    assert (tol, backend) == (1e-3, "cpu") and gap <= tol

    def no_cpu(backend=None):
        raise RuntimeError("no cpu backend")

    monkeypatch.setattr(jax, "local_devices", no_cpu)
    gap2, tol2, backend2 = validate.converter_logit_gap(model_dir)
    assert tol2 == 1e-2 and backend2 == jax.default_backend()
    assert np.isclose(gap, gap2, atol=1e-6)  # same math on this host


def test_single_fold_reads_per_fold_cm(assets, tmp_path_factory):
    """folds=[1]: snippet_eval emits no aggregate CM for a single fold, so
    the checker must fall back to the per-fold
    evaluation/confusion_matrix.npy (_single_fold_cm) and still carry real
    verdicts on both stages' CM checks."""
    import jax.numpy as jnp

    root, runs = assets
    out = str(tmp_path_factory.mktemp("report_single"))
    report = validate.run_validation(
        runs_dir=runs,
        data_stage1=str(root / "data_ast_stage1"),
        data_stage2=str(root / "data_ast_stage2"),
        long_audio_root=str(root / "long_audio"),
        output_dir=out, folds=[1], dtype=jnp.float32)
    cm_checks = [c for c in report["checks"]
                 if "summed 1-fold CM" in c["name"]]
    assert len(cm_checks) == 2
    # fixture Ns never match the paper's, so the verdict is the honest
    # INFO — but the accuracy in the detail proves the per-fold CM was
    # actually read and compared
    assert all(c["verdict"] == "INFO" and "accuracy" in c["detail"]
               for c in cm_checks)
    assert report["paper_comparable"] is False
    # the fallback read the fold-1 artifact the evaluator wrote
    for stage in ("stage1", "stage2"):
        p = os.path.join(runs, f"ast_classifier_{stage}", "fold1", "best",
                         "evaluation", "confusion_matrix.npy")
        assert os.path.exists(p), p
