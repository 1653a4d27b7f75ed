"""Short-sequence mode: fine-tune/serve at max_length < 1024 (e.g. 128 for
1 s windows) with positional embeddings cut on the time axis — the AST
authors' own input-length transfer trick (models/ast.py adapt_max_length).

The reference always pads 1 s windows (98 real frames) to 1024 frames and
spends ~90 % of its FLOPs on pad tokens (SURVEY §5.7); this mode is the
framework's TPU-native answer. Reference-parity behavior (1024) is the
default everywhere and untouched by these tests."""

import json
import os

import numpy as np
import pytest

from zenker_audio_detection_tpu.infer import cascade as C
from zenker_audio_detection_tpu.models import ast as ast_mod, convert


def test_adapt_max_length_cuts_time_axis():
    """Kept positions must be bit-identical under the freq-major patch
    flatten; CLS/DIST untouched; extension pads zeros."""
    import jax

    cfg = ast_mod.ASTConfig(hidden_size=8, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=16,
                            num_mel_bins=128, max_length=1024)
    params = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
    F_dim, T = cfg.frequency_out_dimension, cfg.time_out_dimension  # 12, 101
    # stamp pos_embed so each (f, t) position is identifiable
    pe = np.zeros((1, cfg.seq_length, 8), np.float32)
    pe[0, 0, :] = -1.0  # CLS
    pe[0, 1, :] = -2.0  # DIST
    grid = (np.arange(F_dim)[:, None] * 1000
            + np.arange(T)[None, :]).astype(np.float32)
    pe[0, 2:, 0] = grid.reshape(-1)
    params["pos_embed"] = pe

    short, short_cfg = ast_mod.adapt_max_length(params, cfg, 128)
    T_new = short_cfg.time_out_dimension
    assert short_cfg.max_length == 128 and T_new == 12
    assert short_cfg.seq_length == F_dim * T_new + 2  # 146 tokens
    spe = np.asarray(short["pos_embed"])
    assert spe.shape == (1, short_cfg.seq_length, 8)
    np.testing.assert_array_equal(spe[0, :2], pe[0, :2])
    np.testing.assert_array_equal(spe[0, 2:, 0],
                                  grid[:, :T_new].reshape(-1))
    # trunk params are shared, not copied
    assert short["encoder"] is params["encoder"]

    # extension: new tail positions are zero
    longer, longer_cfg = ast_mod.adapt_max_length(short, short_cfg, 256)
    lpe = np.asarray(longer["pos_embed"])
    lgrid = lpe[0, 2:, 0].reshape(F_dim, longer_cfg.time_out_dimension)
    np.testing.assert_array_equal(lgrid[:, :T_new], grid[:, :T_new])
    assert (lgrid[:, T_new:] == 0).all()


def test_short_config_logit_parity_vs_hf():
    """A max_length=128 AST must match HF transformers exactly — same patch
    grid (12x12 -> 146 tokens) and numerics as the torch reference."""
    torch = pytest.importorskip("torch")
    from transformers import ASTConfig as HFASTConfig
    from transformers import ASTForAudioClassification

    import jax.numpy as jnp

    torch.manual_seed(0)
    hf_cfg = HFASTConfig(hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=4, intermediate_size=64,
                         num_mel_bins=128, max_length=128, num_labels=2,
                         attention_probs_dropout_prob=0.0,
                         hidden_dropout_prob=0.0)
    model = ASTForAudioClassification(hf_cfg).eval()
    ours_cfg = convert.config_from_hf_dict(hf_cfg.to_dict())
    assert ours_cfg.seq_length == 146
    params = convert.from_hf_state_dict(model.state_dict(), ours_cfg)

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 128, 128)).astype(np.float32)
    ours = np.asarray(ast_mod.forward(params, jnp.asarray(feats), ours_cfg,
                                      dtype=jnp.float32))
    with torch.inference_mode():
        want = model(torch.from_numpy(feats)).logits.numpy()
    np.testing.assert_allclose(ours, want, atol=2e-5)


def test_engine_serves_short_models(tmp_path):
    """1 s / 0.5 s windows through a max_length=128 cascade: 98 real frames
    fit, features pad to 128, gating/summary semantics unchanged."""
    import jax
    import jax.numpy as jnp

    cfg = ast_mod.ASTConfig(hidden_size=16, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=32,
                            max_length=128, num_labels=2)
    s1 = C.StageSpec(ast_mod.init_params(jax.random.PRNGKey(0), cfg), cfg,
                     -1.15, 3.53, ("Idle", "Swallow"))
    s2 = C.StageSpec(ast_mod.init_params(jax.random.PRNGKey(1), cfg), cfg,
                     -1.15, 3.53, ("Healthy", "Zenker"))
    eng = C.TwoStageEngine(s1, s2, C.CascadeConfig(batch_size=8,
                                                   dtype=jnp.float32))
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)
    p1, p2 = eng.window_probs(audio)
    assert p1.shape == (5, 2)
    np.testing.assert_allclose(p1.sum(1), 1.0, atol=1e-5)
    res = eng.infer_file(audio, "x.wav")
    assert res["num_windows"] == 5

    # windows longer than max_length are rejected up front
    with pytest.raises(ValueError, match="max_length"):
        C.TwoStageEngine(s1, s2, C.CascadeConfig(window_sec=2.0,
                                                 hop_sec=1.0))


def test_train_fold_short_seq_end_to_end(tmp_path):
    """--max-length 128: pretrained 1024-frame model adapted, trained,
    exported with max_length=128 in both config.json and
    preprocessor_config.json; snippet eval consumes the short dir."""
    import jax
    import jax.numpy as jnp

    from zenker_audio_detection_tpu.audio import io as aio
    from zenker_audio_detection_tpu.train import loop as L

    # tiny pretrained at the full 1024 frames
    pre_cfg = ast_mod.ASTConfig(hidden_size=16, num_hidden_layers=1,
                                num_attention_heads=2, intermediate_size=32,
                                num_labels=527)
    pre = tmp_path / "pretrained"
    convert.save_hf_model_dir(
        ast_mod.init_params(jax.random.PRNGKey(7), pre_cfg), pre_cfg,
        str(pre))

    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.default_rng(0)

    def split(name, n):
        xs, ys = [], []
        for i in range(n):
            for label in (0, 1):
                d = tmp_path / "wavs" / f"c{label}"
                d.mkdir(parents=True, exist_ok=True)
                fp = d / f"{name}{i}.wav"
                amp = 0.004 if label == 0 else 0.5
                aio.write_wav(str(fp), (rng.standard_normal(16000) * amp
                                        ).astype(np.float32), 16000,
                              dtype="float32")
                xs.append(str(fp))
                ys.append(label)
        np.save(data / f"{name}_x_fold1.npy", np.asarray(xs, object))
        np.save(data / f"{name}_y_fold1.npy", np.asarray(ys))

    split("train", 4)
    split("test", 2)

    cfg = L.TrainFoldConfig(
        stage="stage1", data_dir=str(data),
        output_root=str(tmp_path / "runs"),
        pretrained_model_dir=str(pre), max_length=128,
        num_epochs=2, batch_size=4, learning_rate=1e-3,
        enable_early_stopping=False, augment=False, dtype=jnp.float32)
    metrics = L.train_fold(1, cfg)
    assert f"fold1_test_eval_f1" in metrics

    best = tmp_path / "runs" / "fold1" / "best"
    exported_cfg = json.loads((best / "config.json").read_text())
    assert exported_cfg["max_length"] == 128
    fx = json.loads((best / "preprocessor_config.json").read_text())
    assert fx["max_length"] == 128
    params2, cfg2 = convert.load_hf_model_dir(str(best))
    assert cfg2.max_length == 128
    assert np.asarray(params2["pos_embed"]).shape[1] == cfg2.seq_length


def test_adapt_checkpoint_cli_round_trip(tmp_path):
    """zenker-adapt-checkpoint: 1024-frame HF dir -> 128-frame HF dir; the
    adapted dir loads both here and in HF transformers, keeps labels and
    fx stats, and matches training-time adaptation exactly."""
    import jax

    from zenker_audio_detection_tpu.cli import adapt_checkpoint
    from zenker_audio_detection_tpu.train import loop as L

    cfg = ast_mod.ASTConfig(hidden_size=16, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=32,
                            num_labels=2)
    params = ast_mod.init_params(jax.random.PRNGKey(0), cfg)
    src = tmp_path / "src"
    convert.save_hf_model_dir(params, cfg, str(src),
                              {0: "Idle", 1: "Swallow"})
    L.save_feature_extractor_config(str(src), -1.15, 3.53)

    dst = tmp_path / "short"
    adapt_checkpoint.main([str(src), str(dst), "--max-length", "128"])

    params2, cfg2 = convert.load_hf_model_dir(str(dst))
    assert cfg2.max_length == 128 and cfg2.seq_length == 146
    want, _ = ast_mod.adapt_max_length(params, cfg, 128)
    np.testing.assert_array_equal(np.asarray(params2["pos_embed"]),
                                  np.asarray(want["pos_embed"]))
    d = json.loads((dst / "config.json").read_text())
    assert d["id2label"] == {"0": "Idle", "1": "Swallow"}
    fx = json.loads((dst / "preprocessor_config.json").read_text())
    assert fx["max_length"] == 128 and fx["mean"] == -1.15

    transformers = pytest.importorskip("transformers")
    model = transformers.ASTForAudioClassification.from_pretrained(
        str(dst)).eval()
    assert model.config.max_length == 128


def test_mixed_max_length_stages_with_mesh_and_int8():
    """Stages may have DIFFERENT max_lengths (e.g. short stage-1 gate +
    parity stage-2): each stage pads its own features from the shared
    file-level frames. Combined here with int8 + the 8-device mesh to pin
    the full option matrix."""
    import jax
    import jax.numpy as jnp

    from zenker_audio_detection_tpu.parallel import mesh as pmesh

    short = ast_mod.ASTConfig(hidden_size=16, num_hidden_layers=1,
                              num_attention_heads=2, intermediate_size=32,
                              max_length=128, num_labels=2)
    full = ast_mod.ASTConfig(hidden_size=16, num_hidden_layers=1,
                             num_attention_heads=2, intermediate_size=32,
                             max_length=1024, num_labels=2)
    s1 = C.StageSpec(ast_mod.init_params(jax.random.PRNGKey(0), short),
                     short, -1.15, 3.53, ("Idle", "Swallow"))
    s2 = C.StageSpec(ast_mod.init_params(jax.random.PRNGKey(1), full),
                     full, -1.15, 3.53, ("Healthy", "Zenker"))
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000 * 3) * 0.1).astype(np.float32)

    base = C.TwoStageEngine(s1, s2, C.CascadeConfig(batch_size=8,
                                                    dtype=jnp.float32,
                                                    stage2_mode="all"))
    p1_base, p2_base = base.window_probs(audio)
    assert p1_base.shape == p2_base.shape == (5, 2)

    combo = C.TwoStageEngine(
        s1, s2, C.CascadeConfig(batch_size=8, dtype=jnp.float32,
                                stage2_mode="all", int8=True),
        mesh=pmesh.data_mesh(jax.devices()))
    p1_c, p2_c = combo.window_probs(audio)
    # int8 drift tolerance; mesh itself is exact
    assert np.abs(p1_c - p1_base).max() < 5e-2
    assert np.abs(p2_c - p2_base).max() < 5e-2
