"""Round-3 forward-perf experiments on the b=128 parity forward (VERDICT #5).

Variants over the stock XLA forward (349 ms, 48.6% MXU, ROOFLINE.md):
  stock        - models/ast.py as shipped
  fusedqkv     - one (H, 3H) GEMM for q/k/v instead of three (H, H)
  sdpa         - jax.nn.dot_product_attention instead of the einsum pair
  bf16softmax  - softmax accumulated in bf16 (numerics probe only)
  gemm_only    - attention replaced by the identity: measures the
                 projections+FFN floor -> upper-bound experiment proving
                 (or refuting) that ~349 ms is near the practical floor
Methodology: N queued calls, ONE scalar fetch (tunnel sync ~30 ms excluded).
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import zenker_audio_detection_tpu  # noqa: F401  (compile cache)
from zenker_audio_detection_tpu.models import ast as ast_mod

cfg = ast_mod.ASTConfig()
params = jax.tree.map(jnp.asarray,
                      ast_mod.init_params(jax.random.PRNGKey(0), cfg))
feats = jnp.asarray(np.random.default_rng(0).standard_normal(
    (128, cfg.max_length, cfg.num_mel_bins)).astype(np.float32))

B, S, H = 128, cfg.seq_length, cfg.hidden_size
nh, hd = cfg.num_attention_heads, cfg.head_dim
scale = 1.0 / np.sqrt(hd)


def dense(x, p):
    return jnp.matmul(x, p["kernel"].astype(x.dtype),
                      preferred_element_type=jnp.float32).astype(x.dtype) \
        + p["bias"].astype(x.dtype)


def attn_variant(x, lp, mode):
    if mode == "gemm_only":
        # keep q-projection + out-projection GEMM work shape but no
        # attention matmuls/softmax: the MXU floor of the non-attention part
        return dense(dense(x, lp["q"]), lp["attn_out"])
    if mode == "fusedqkv":
        wqkv = jnp.concatenate([lp["q"]["kernel"], lp["k"]["kernel"],
                                lp["v"]["kernel"]], axis=1).astype(x.dtype)
        bqkv = jnp.concatenate([lp["q"]["bias"], lp["k"]["bias"],
                                lp["v"]["bias"]]).astype(x.dtype)
        qkv = (jnp.matmul(x, wqkv, preferred_element_type=jnp.float32)
               .astype(x.dtype) + bqkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, S, nh, hd)
        k = k.reshape(B, S, nh, hd)
        v = v.reshape(B, S, nh, hd)
    else:
        q = dense(x, lp["q"]).reshape(B, S, nh, hd)
        k = dense(x, lp["k"]).reshape(B, S, nh, hd)
        v = dense(x, lp["v"]).reshape(B, S, nh, hd)
    if mode == "sdpa":
        ctx = jax.nn.dot_product_attention(q, k, v)
        return dense(ctx.reshape(B, S, H), lp["attn_out"])
    scores = jnp.einsum("bqnh,bknh->bnqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mode == "bf16softmax":
        probs = jax.nn.softmax(scores.astype(x.dtype), axis=-1)
    else:
        probs = jax.nn.softmax(scores.astype(jnp.float32),
                               axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bnqk,bknh->bqnh", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return dense(ctx.reshape(B, S, H), lp["attn_out"])


def block(x, lp, mode):
    eps = cfg.layer_norm_eps
    h = ast_mod._layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"], eps)
    x = x + attn_variant(h, lp, mode)
    h = ast_mod._layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"], eps)
    h = dense(h, lp["fc1"])
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
    return x + dense(h, lp["fc2"])


@functools.partial(jax.jit, static_argnames=("mode",))
def fwd(params, feats, mode):
    if mode == "stock":
        return jnp.sum(ast_mod.forward(params, feats, cfg,
                                       dtype=jnp.bfloat16))
    x = ast_mod.patch_embed(params, feats, cfg, dtype=jnp.bfloat16)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (B, 1, H))
    dist = jnp.broadcast_to(params["dist_token"].astype(x.dtype), (B, 1, H))
    x = jnp.concatenate([cls, dist, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)

    def body(carry, lp):
        return block(carry, lp, mode), None

    x, _ = jax.lax.scan(body, x, params["encoder"])
    x = ast_mod._layer_norm(x, params["ln_final"]["scale"],
                            params["ln_final"]["bias"], cfg.layer_norm_eps)
    return jnp.sum(ast_mod.classify(params, ast_mod.pool(x), cfg))


modes = sys.argv[1:] or ["stock", "fusedqkv", "sdpa", "bf16softmax",
                         "gemm_only"]
for mode in modes:
    ref = float(fwd(params, feats, "stock")) if mode != "stock" else None
    out = float(fwd(params, feats, mode))  # compile + warm
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        r = fwd(params, feats, mode)
    val = float(r)
    dt = (time.perf_counter() - t0) / n * 1e3
    drift = "" if ref is None else f"  sum-drift={abs(val - ref):.3e}"
    print(f"{mode:12s}: {dt:7.1f} ms/fwd (b=128){drift}", flush=True)
