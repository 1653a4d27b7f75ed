"""mha_pairs (head-pair block-diagonal) vs mha_packed vs XLA: correctness +
standalone timing at AST shapes, then in-model."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
import zenker_audio_detection_tpu
from zenker_audio_detection_tpu.ops import attention as A

B, S, H, NH = 128, 1214, 768, 12
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, S, H)), dtype=jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B, S, H)), dtype=jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B, S, H)), dtype=jnp.bfloat16)

def xla_ref(q, k, v):
    D = H // NH
    b = q.shape[0]
    qh = q.reshape(b, S, NH, D); kh = k.reshape(b, S, NH, D); vh = v.reshape(b, S, NH, D)
    s = jnp.einsum("bqnd,bknd->bnqk", qh, kh, preferred_element_type=jnp.float32) / np.sqrt(D)
    p = jax.nn.softmax(s, -1).astype(q.dtype)
    return jnp.einsum("bnqk,bknd->bqnd", p, vh, preferred_element_type=jnp.float32).astype(q.dtype).reshape(b, S, H)

fns = {
    "xla": jax.jit(lambda q,k,v: jnp.sum(xla_ref(q,k,v).astype(jnp.float32))),
    "packed": jax.jit(lambda q,k,v: jnp.sum(A.mha_packed(q,k,v,num_heads=NH).astype(jnp.float32))),
    "pairs": jax.jit(lambda q,k,v: jnp.sum(A.mha_pairs(q,k,v,num_heads=NH).astype(jnp.float32))),
}
# correctness on a small slice first
qs, ks, vs = q[:2], k[:2], v[:2]
ref = xla_ref(qs, ks, vs)
got = A.mha_pairs(qs, ks, vs, num_heads=NH)
err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
print(f"pairs max err vs xla: {err:.5f}", flush=True)
assert err < 0.05

for name, f in fns.items():
    print(f"compile {name}", file=sys.stderr, flush=True)
    _ = float(f(q, k, v))
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(q, k, v)
    _ = float(out)
    print(f"{name}: {(time.perf_counter()-t0)/10*1e3:.2f} ms", flush=True)
