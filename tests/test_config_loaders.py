"""Corrupt-config robustness for the model-dir loaders.

Every infer CLI starts with `load_hf_model_dir` + `load_feature_extractor_
config` on a user-supplied directory; a half-copied or disk-damaged dir
must fail with a typed error NAMING the offending file, not a bare
JSONDecodeError / AttributeError / KeyError from deep inside the loader.
(Reference counterpart: HF `from_pretrained` raises its own typed errors
for corrupt config.json.)
"""

import json
import os

import jax
import pytest

from zenker_audio_detection_tpu.models import ast as ast_mod
from zenker_audio_detection_tpu.models import convert
from zenker_audio_detection_tpu.train import loop as train_loop


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mdl"))
    cfg = ast_mod.ASTConfig(hidden_size=16, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=32,
                            patch_size=8, max_length=32, num_labels=2)
    params = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
    convert.save_hf_model_dir(params, cfg, d, {0: "Idle", 1: "Swallow"})
    train_loop.save_feature_extractor_config(d, -1.0, 2.0, max_length=32)
    return d


def _clobber(path, payload):
    with open(path, "w") as f:
        f.write(payload)


def test_corrupt_config_json_names_file(model_dir, tmp_path):
    import shutil

    d = str(tmp_path / "m")
    shutil.copytree(model_dir, d)
    cfg_path = os.path.join(d, "config.json")
    for payload in ('{"hidden_size": 16', "[1, 2, 3]", "", "not json"):
        _clobber(cfg_path, payload)
        with pytest.raises(ValueError, match="config.json"):
            convert.load_hf_model_dir(d)


def test_corrupt_preprocessor_config_names_file(model_dir, tmp_path):
    import shutil

    d = str(tmp_path / "m")
    shutil.copytree(model_dir, d)
    fx_path = os.path.join(d, "preprocessor_config.json")

    _clobber(fx_path, '{"mean": -1.0')  # truncated
    with pytest.raises(ValueError, match="preprocessor_config.json"):
        train_loop.load_feature_extractor_config(d)

    _clobber(fx_path, json.dumps({"std": 2.0}))  # mean missing
    with pytest.raises(ValueError, match="mean/std"):
        train_loop.load_feature_extractor_config(d)

    _clobber(fx_path, json.dumps({"mean": "oops", "std": 2.0}))  # non-numeric
    with pytest.raises(ValueError, match="mean/std"):
        train_loop.load_feature_extractor_config(d)


def test_wrong_typed_config_values_name_the_field(model_dir, tmp_path):
    """Valid JSON with wrong-TYPED values (hand-edited config.json) must
    fail naming the field and the file — not a reshape/TypeError deep
    inside the jitted forward."""
    import shutil

    d = str(tmp_path / "m")
    shutil.copytree(model_dir, d)
    cfg_path = os.path.join(d, "config.json")
    good = json.load(open(cfg_path))

    bad_values = [("hidden_size", "big"), ("hidden_size", -16),
                  ("hidden_size", 16.5), ("hidden_size", True),
                  ("num_hidden_layers", 0), ("max_length", None),
                  ("layer_norm_eps", "tiny"), ("layer_norm_eps", False),
                  # non-finite/non-positive floats: json.load accepts the
                  # NaN/Infinity tokens, and eps<=0 would mean silent NaN
                  # logits from rsqrt inside jit
                  ("layer_norm_eps", float("nan")),
                  ("layer_norm_eps", float("inf")),
                  ("layer_norm_eps", -1e-12), ("layer_norm_eps", 0.0),
                  ("initializer_range", float("nan")),
                  ("initializer_range", -0.02),
                  ("qkv_bias", 1), ("id2label", [0, 1])]
    for field, value in bad_values:
        _clobber(cfg_path, json.dumps(dict(good, **{field: value})))
        with pytest.raises(ValueError) as ei:
            convert.load_hf_model_dir(d)
        assert field in str(ei.value) and "config.json" in str(ei.value), \
            (field, value, str(ei.value))

    # structural constraints: named message, not a jit reshape error
    _clobber(cfg_path, json.dumps(dict(good, hidden_size=17)))
    with pytest.raises(ValueError, match="divisible by num_attention_heads"):
        convert.load_hf_model_dir(d)
    _clobber(cfg_path, json.dumps(dict(good, patch_size=4096)))
    with pytest.raises(ValueError, match="patch_size"):
        convert.load_hf_model_dir(d)

    # restore -> loads again (validation is non-destructive)
    _clobber(cfg_path, json.dumps(good))
    params, cfg = convert.load_hf_model_dir(d)
    assert cfg.hidden_size == 16


def test_valid_dir_still_loads(model_dir):
    params, cfg = convert.load_hf_model_dir(model_dir)
    assert cfg.hidden_size == 16
    mean, std = train_loop.load_feature_extractor_config(model_dir)
    assert (mean, std) == (-1.0, 2.0)


def test_corrupt_class_mapping_names_file(tmp_path):
    from zenker_audio_detection_tpu.analysis.snippet_eval import (
        load_class_names)

    p = str(tmp_path / "class_mapping.json")
    _clobber(p, '{"Healthy": 0, ')
    with pytest.raises(ValueError, match="class_mapping.json"):
        load_class_names(p, "stage1")
    _clobber(p, '["Healthy", "Zenker"]')  # list, not name->index object
    with pytest.raises(ValueError, match="JSON object"):
        load_class_names(p, "stage1")
    # absent path keeps the reference's stage fallback
    names = load_class_names(str(tmp_path / "absent.json"), "stage1")
    assert len(names) == 2


def test_sweep_config_typed_errors(tmp_path):
    from zenker_audio_detection_tpu.tune import sweep as sw

    p = str(tmp_path / "sweep.yaml")
    with open(p, "w") as f:
        f.write("- just\n- a list\n")
    with pytest.raises(ValueError, match="YAML mapping"):
        sw.load_sweep_config(p)

    import numpy as np

    with pytest.raises(ValueError, match="'learning-rate'"):
        sw.sample_parameters({"learning-rate": 3e-5},  # bare scalar spec
                             np.random.default_rng(0))


def test_stats_loaders_typed_errors(tmp_path):
    from zenker_audio_detection_tpu.data import stats as stats_mod

    d = str(tmp_path)
    pf = os.path.join(d, "stats_per_fold.json")

    _clobber(pf, '[{"fold": 1')  # truncated
    with pytest.raises(ValueError, match="stats_per_fold.json"):
        stats_mod.load_fold_normalization(d, 1)

    _clobber(pf, '{"fold": 1}')  # object, not list
    with pytest.raises(ValueError, match="list"):
        stats_mod.load_fold_normalization(d, 1)

    _clobber(pf, '[{"fold": 1, "count": 3, "std": 2.0}]')  # mean missing
    with pytest.raises(ValueError, match="mean/std"):
        stats_mod.load_fold_normalization(d, 1)

    # absent files still resolve to the documented default
    os.remove(pf)
    mean, std, src = stats_mod.load_fold_normalization(d, 1)
    assert src == "default"

    agg = os.path.join(d, "stats_aggregate.json")
    _clobber(agg, '{"total_count": 5, "mean": "x", "std": 2.0}')
    with pytest.raises(ValueError, match="mean/std"):
        stats_mod.load_fold_normalization(d, 1)

    from zenker_audio_detection_tpu.analysis import snippet_eval
    _clobber(agg, "[")
    with pytest.raises(ValueError, match="stats_aggregate.json"):
        snippet_eval.load_mean_std(d, 1, use_aggregate=True)

    # non-numeric counts would otherwise hit the `> 0` comparison as a
    # bare TypeError; both the trainer chain and the evaluators'
    # --use-aggregate fast path must name the file
    _clobber(agg, '{"total_count": "5", "mean": 1.0, "std": 2.0}')
    with pytest.raises(ValueError, match="total_count"):
        stats_mod.load_fold_normalization(d, 1)
    with pytest.raises(ValueError, match="total_count"):
        snippet_eval.load_mean_std(d, 1, use_aggregate=True)
    _clobber(agg, '{"total_count": 5, "std": 2.0}')  # mean missing
    with pytest.raises(ValueError, match="mean/std"):
        snippet_eval.load_mean_std(d, 1, use_aggregate=True)
    pf2 = os.path.join(d, "stats_per_fold.json")
    _clobber(pf2, '[{"fold": 1, "count": "3", "mean": 1.0, "std": 2.0}]')
    with pytest.raises(ValueError, match="count"):
        stats_mod.load_fold_normalization(d, 1)
    os.remove(pf2)


def test_rocpr_metrics_loader_typed_errors(tmp_path):
    from zenker_audio_detection_tpu.analysis import thresholds as thr

    p = str(tmp_path / "metrics.json")
    _clobber(p, '{"fold_reports": [1, 2]}')  # entries not objects
    with pytest.raises(ValueError, match="fold_reports"):
        thr.extract_per_fold_thresholds(p)
    _clobber(p, '{"fold_reports": ')  # truncated
    with pytest.raises(ValueError, match="metrics.json"):
        thr.extract_per_fold_thresholds(p)
    # healthy shape still extracts
    _clobber(p, json.dumps({"fold_reports": [
        {"fold": 1, "best_f1_threshold": 0.4, "best_f1": 0.9}]}))
    out = thr.extract_per_fold_thresholds(p)
    assert out[1]["threshold"] == 0.4


def test_cm_npy_loader_typed_error(tmp_path):
    from zenker_audio_detection_tpu.analysis import cm_plots

    root = str(tmp_path)
    d = os.path.join(root, "ast_classifier_stage1", "cv_aggregate_evaluation")
    os.makedirs(d)
    import numpy as np
    p = os.path.join(d, "confusion_matrix.npy")
    np.save(p, np.eye(2))
    with open(p, "r+b") as f:
        f.truncate(40)  # cut inside the header
    with pytest.raises(ValueError, match="confusion_matrix.npy"):
        cm_plots.load_confusion_matrix_from_results("stage1", root)
    with open(p, "wb"):
        pass  # ZERO-byte file (np.save is not atomic): np.load -> EOFError
    with pytest.raises(ValueError, match="confusion_matrix.npy"):
        cm_plots.load_confusion_matrix_from_results("stage1", root)
    assert cm_plots.load_confusion_matrix_from_results("stage2", root) is None
