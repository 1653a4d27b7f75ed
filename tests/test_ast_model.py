"""Logit-parity tests for the JAX AST vs the HF torch reference.

No pretrained download is available (or needed): parity is checked on
randomly-initialized `ASTForAudioClassification` models converted through
`models.convert.from_hf_state_dict` — this exercises every weight-layout
decision (conv->NHWC, Linear transpose, layer stacking, token/pos-embed
order), the same path a real `MIT/ast-finetuned-audioset-10-10-0.4593`
checkpoint takes.
"""

import numpy as np
import pytest

from zenker_audio_detection_tpu.models import ast as ast_mod
from zenker_audio_detection_tpu.models import convert

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
from transformers import ASTConfig as HFASTConfig  # noqa: E402
from transformers import ASTForAudioClassification  # noqa: E402


def make_pair(seed=0, **overrides):
    """Matching (torch model, our params, our config) with random weights."""
    kw = dict(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        patch_size=8,
        frequency_stride=4,
        time_stride=4,
        num_mel_bins=16,
        max_length=64,
        num_labels=2,
    )
    kw.update(overrides)
    torch.manual_seed(seed)
    hf_cfg = HFASTConfig(**{k: v for k, v in kw.items() if k != "num_labels"},
                         num_labels=kw["num_labels"],
                         attention_probs_dropout_prob=0.0,
                         hidden_dropout_prob=0.0)
    model = ASTForAudioClassification(hf_cfg).eval()
    ours_cfg = convert.config_from_hf_dict(hf_cfg.to_dict() | {
        "id2label": {i: f"L{i}" for i in range(kw["num_labels"])}})
    params = convert.from_hf_state_dict(model.state_dict(), ours_cfg)
    return model, params, ours_cfg


def rand_features(rng, b, cfg):
    return rng.standard_normal((b, cfg.max_length, cfg.num_mel_bins)).astype(
        np.float32
    )


def test_small_model_logit_parity(rng):
    model, params, cfg = make_pair()
    x = rand_features(rng, 3, cfg)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).logits.numpy()
    ours = np.asarray(ast_mod.forward(params, x, cfg))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


def test_small_model_hidden_parity(rng):
    """Trunk (final-LN hidden states) parity, catching block-level drift."""
    model, params, cfg = make_pair(seed=1)
    x = rand_features(rng, 2, cfg)
    with torch.no_grad():
        ref = model.audio_spectrogram_transformer(
            torch.from_numpy(x)
        ).last_hidden_state.numpy()
    ours = np.asarray(ast_mod.encode(params, x, cfg))
    assert ours.shape == ref.shape == (2, cfg.seq_length, cfg.hidden_size)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


def test_roundtrip_state_dict(rng):
    model, params, cfg = make_pair(seed=2)
    sd = convert.to_hf_state_dict(params)
    ref_sd = {k: v.numpy() for k, v in model.state_dict().items()}
    assert set(sd) == set(ref_sd)
    for k in sd:
        np.testing.assert_allclose(sd[k], ref_sd[k], atol=0, rtol=0, err_msg=k)


def test_safetensors_all_dtypes_roundtrip(tmp_path, rng):
    """Every dtype in the writer's table survives a write/read cycle with
    exact bytes and shape (incl. 0-d promotion handled by callers)."""
    tensors = {}
    for i, dt in enumerate((np.float64, np.float32, np.float16, np.int64,
                            np.int32, np.int16, np.int8, np.uint8, np.bool_)):
        shape = [(3, 2), (4,), (1, 1, 5)][i % 3]
        if dt is np.bool_:
            tensors[f"t{i}"] = rng.integers(0, 2, shape).astype(dt)
        elif np.issubdtype(dt, np.floating):
            tensors[f"t{i}"] = rng.standard_normal(shape).astype(dt)
        else:
            tensors[f"t{i}"] = rng.integers(-5, 100, shape).astype(
                dt if dt is not np.uint8 else np.int16).astype(dt)
    p = str(tmp_path / "all.safetensors")
    convert.write_safetensors(tensors, p)
    out = convert.read_safetensors(p)
    assert set(out) == set(tensors)
    for k, v in tensors.items():
        assert out[k].dtype == v.dtype, k
        np.testing.assert_array_equal(out[k], v, err_msg=k)


def _fuzz_safetensors_corpus(rng, tmp_path):
    """Deterministic corrupt-safetensors corpus: truncations, random byte
    flips of a valid file, random garbage, pathological declared header
    lengths (a corrupt u64 previously drove f.read() into a multi-TB
    preallocation), and structurally-wrong JSON headers."""
    import json
    import struct

    hdr = lambda h: struct.pack("<Q", len(h)) + h
    base_path = str(tmp_path / "_st_fuzz_base.safetensors")
    convert.write_safetensors(
        {"a": rng.standard_normal((4, 3)).astype(np.float32),
         "b": rng.integers(0, 9, 7).astype(np.int64)},
        base_path)
    with open(base_path, "rb") as f:
        base = bytearray(f.read())
    cases = [bytes(base[:cut]) for cut in range(0, len(base), 11)]
    for _ in range(150):
        buf = bytearray(base)
        for _ in range(rng.integers(1, 8)):
            buf[rng.integers(len(buf))] = rng.integers(256)
        cases.append(bytes(buf))
    for _ in range(50):
        cases.append(rng.integers(0, 256, rng.integers(0, 300))
                     .astype(np.uint8).tobytes())
    for hlen in (2**62, 100 * 2**30, 10_000, len(base)):  # over-declared
        cases.append(struct.pack("<Q", hlen) + bytes(base[8:]))
    ent = lambda **kw: hdr(json.dumps({"w": kw}).encode())
    cases += [
        hdr(b"[1,2,3]"), hdr(b"42"), hdr(b'"s"'), hdr(b"\xff\xfe invalid"),
        hdr(json.dumps({"w": 5}).encode()),
        hdr(json.dumps({"w": "meta"}).encode()),
        ent(dtype="F128", shape=[1], data_offsets=[0, 4]) + b"\0" * 4,
        ent(dtype="F32", shape=[-1], data_offsets=[0, 8]) + b"\0" * 8,
        ent(dtype="F32", shape=[1], data_offsets=[-4, 4]) + b"\0" * 8,
        ent(dtype="F32", shape=[1], data_offsets=[8, 4]) + b"\0" * 8,
        ent(dtype="F32", shape=[4], data_offsets=[0, 16]) + b"\0" * 8,
        ent(dtype="F32", shape=[10**15, 10**15], data_offsets=[0, 4]) + b"\0" * 4,
        ent(dtype="F32", shape=["x"], data_offsets=[0, 4]) + b"\0" * 4,
        ent(dtype="F32", shape=[1], data_offsets="ab") + b"\0" * 4,
        ent(dtype="F32", shape=[1], data_offsets=[0]) + b"\0" * 4,
        ent(dtype="F32", shape=[1], data_offsets=[0, 4, 8]) + b"\0" * 8,
        ent(dtype="F32") + b"\0" * 4,
        ent(dtype="I16", shape=[1], data_offsets=[0, 3]) + b"\0" * 3,
        ent(dtype="BF16", shape=[2], data_offsets=[0, 5]) + b"\0" * 5,  # odd
        ent(dtype="BF16", shape=[2], data_offsets=[0, 4]) + b"\0" * 4,  # valid
    ]
    return cases


def test_safetensors_fuzz_only_typed_errors(tmp_path, rng):
    """read_safetensors must either succeed or raise ValueError on
    arbitrary corrupt checkpoint files — never struct.error, KeyError,
    AttributeError, MemoryError, or a multi-TB allocation hang (the
    8-byte header-length field is attacker/corruption-controlled and
    f.read() preallocates it). Same contract as the WAV decode layer
    (tests/test_audio.py::test_wav_decode_fuzz_only_typed_errors)."""
    for i, c in enumerate(_fuzz_safetensors_corpus(rng, tmp_path)):
        p = str(tmp_path / f"f{i}.safetensors")
        with open(p, "wb") as f:
            f.write(c)
        try:
            convert.read_safetensors(p)
        except ValueError:
            pass  # the documented contract (JSONDecodeError included)


def test_model_dir_roundtrip(tmp_path, rng):
    model, params, cfg = make_pair(seed=3)
    convert.save_hf_model_dir(params, cfg, str(tmp_path), {0: "Idle", 1: "Swallow"})
    params2, cfg2 = convert.load_hf_model_dir(str(tmp_path))
    assert cfg2 == cfg
    x = rand_features(rng, 2, cfg)
    a = np.asarray(ast_mod.forward(params, x, cfg))
    b = np.asarray(ast_mod.forward(params2, x, cfg2))
    np.testing.assert_allclose(a, b, atol=1e-6)
    # and the exported dir loads in HF transformers itself
    hf_model = ASTForAudioClassification.from_pretrained(str(tmp_path)).eval()
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(x)).logits.numpy()
    np.testing.assert_allclose(a, ref, atol=2e-5, rtol=1e-5)


def test_reinit_head_keeps_trunk(rng):
    import jax

    _, params, cfg = make_pair(seed=4)
    new = ast_mod.reinit_head(jax.random.PRNGKey(0), params, cfg)
    x = rand_features(rng, 2, cfg)
    a = np.asarray(ast_mod.encode(params, x, cfg))
    b = np.asarray(ast_mod.encode(new, x, cfg))
    np.testing.assert_allclose(a, b, atol=0)
    assert not np.allclose(
        np.asarray(new["head"]["dense"]["kernel"]),
        np.asarray(params["head"]["dense"]["kernel"]),
    )


def test_seq_geometry_full_size():
    cfg = ast_mod.ASTConfig()
    assert (cfg.frequency_out_dimension, cfg.time_out_dimension) == (12, 101)
    assert cfg.num_patches == 1212 and cfg.seq_length == 1214


@pytest.mark.slow
def test_full_size_logit_parity(rng):
    """Full ViT-B geometry (12 layers, 1214 tokens): ≤1e-3 as per SURVEY §7."""
    model, params, cfg = make_pair(
        seed=5,
        hidden_size=768,
        num_hidden_layers=12,
        num_attention_heads=12,
        intermediate_size=3072,
        patch_size=16,
        frequency_stride=10,
        time_stride=10,
        num_mel_bins=128,
        max_length=1024,
    )
    x = rand_features(rng, 2, cfg)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).logits.numpy()
    ours = np.asarray(ast_mod.forward(params, x, cfg))
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-4)


def _random_geometry(r):
    """One random-but-valid AST geometry (all sizes tiny; torch CPU fast).

    Exercises the dimensions the fixed-config tests hold constant: head
    count/width, layer count, MLP width, patch/stride relations (overlap,
    exact tiling, AND gaps — stride > patch is legal conv geometry), label
    count, and the out-dimension formula down to its freq_out==1 /
    time_out==1 edge (num_mel_bins == patch_size).
    """
    heads = int(r.choice([1, 2, 4]))
    head_dim = int(r.choice([4, 8]))
    patch = int(r.choice([4, 8]))
    # mel bins: from the degenerate freq_out==1 case up to a few patches.
    num_mel = patch + int(r.integers(0, 3)) * int(r.integers(2, 9))
    f_stride = int(r.integers(2, patch + 3))  # < patch (overlap) .. > patch (gap)
    t_stride = int(r.integers(2, patch + 3))
    max_len = patch + int(r.integers(0, 6)) * t_stride
    return dict(
        hidden_size=heads * head_dim,
        num_hidden_layers=int(r.integers(1, 4)),
        num_attention_heads=heads,
        intermediate_size=int(r.integers(8, 97)),
        patch_size=patch,
        frequency_stride=f_stride,
        time_stride=t_stride,
        num_mel_bins=num_mel,
        max_length=max_len,
        num_labels=int(r.choice([2, 3, 5])),
    )


@pytest.mark.slow
def test_randomized_geometry_logit_parity():
    """Differential parity across 8 random geometries (deterministic draw).

    The fixed-config tests pin two shapes; geometry-dependent code (the
    patch-embed conv strides, pos-embed length, head split, label head)
    must hold for ANY valid ASTConfig — mirrors the reference's reliance
    on HF handling arbitrary configs (src/train_ast_stage1_cross_
    validation.py builds the model purely from a config dict).
    """
    r = np.random.default_rng(20260818)
    for trial in range(8):
        kw = _random_geometry(r)
        model, params, cfg = make_pair(seed=100 + trial, **kw)
        assert cfg.seq_length >= 3  # cls + dist + >=1 patch
        x = rand_features(np.random.default_rng(trial), int(r.integers(1, 4)), cfg)
        with torch.no_grad():
            ref = model(torch.from_numpy(x)).logits.numpy()
        ours = np.asarray(ast_mod.forward(params, x, cfg))
        np.testing.assert_allclose(
            ours, ref, atol=5e-5, rtol=1e-4,
            err_msg=f"geometry trial {trial}: {kw}",
        )
