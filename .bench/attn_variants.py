import time, functools
import numpy as np
import jax, jax.numpy as jnp
import zenker_audio_detection_tpu

B, S, H, NH, D = 128, 1214, 768, 12, 64
rng = np.random.default_rng(0)
q = jax.device_put(rng.standard_normal((B, S, NH, D)).astype(np.float32)).astype(jnp.bfloat16)
k = jax.device_put(rng.standard_normal((B, S, NH, D)).astype(np.float32)).astype(jnp.bfloat16)
v = jax.device_put(rng.standard_normal((B, S, NH, D)).astype(np.float32)).astype(jnp.bfloat16)

def timeit(fn, *args, n=5):
    out = fn(*args); ref = np.asarray(out, np.float32)
    t0 = time.time()
    for _ in range(n): out = fn(*args)
    _ = np.asarray(out).ravel()[0]
    return (time.time()-t0)/n, ref

@jax.jit
def attn_current(q, k, v):
    scores = jnp.einsum("bqnh,bknh->bnqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * (1.0/np.sqrt(D))
    probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(q.dtype)
    return jnp.einsum("bnqk,bknh->bqnh", probs, v, preferred_element_type=jnp.float32).astype(q.dtype)

@jax.jit
def attn_bf16softmax(q, k, v):
    scores = jnp.einsum("bqnh,bknh->bnqk", q, k, preferred_element_type=jnp.float32)
    scores = (scores * (1.0/np.sqrt(D))).astype(jnp.bfloat16)
    probs = jax.nn.softmax(scores, -1)
    return jnp.einsum("bnqk,bknh->bqnh", probs, v, preferred_element_type=jnp.float32).astype(q.dtype)

@jax.jit
def attn_jaxnn(q, k, v):
    return jax.nn.dot_product_attention(q, k, v)

t0, ref = timeit(attn_current, q, k, v)
print(f"current (fp32 softmax): {t0*1000:.1f} ms", flush=True)
t1, o1 = timeit(attn_bf16softmax, q, k, v)
print(f"bf16 softmax: {t1*1000:.1f} ms, max diff {np.abs(o1-ref).max():.4f}", flush=True)
t2, o2 = timeit(attn_jaxnn, q, k, v)
print(f"jax.nn.dot_product_attention: {t2*1000:.1f} ms, max diff {np.abs(o2-ref).max():.4f}", flush=True)
