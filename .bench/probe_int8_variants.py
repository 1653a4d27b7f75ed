"""Isolate the in-model int8 slowdown: 3D matmul? fused dynamic quant? scan?"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp
import zenker_audio_detection_tpu

B, S, K, N, L = 128, 1214, 768, 768, 12
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((B, S, K)).astype(np.float32), dtype=jnp.bfloat16)
w8 = jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8))
w8L = jnp.asarray(rng.integers(-127, 127, (L, K, N), dtype=np.int8))
x8 = jnp.asarray(rng.integers(-127, 127, (B, S, K), dtype=np.int8))
scale = jnp.asarray(rng.uniform(0.001, 0.01, (1, N)).astype(np.float32))

def timeit(name, f, *args, n=5):
    print(f"compile {name}", file=sys.stderr, flush=True)
    _ = float(f(*args)); ts = []
    for _ in range(n):
        t0 = time.perf_counter(); _ = float(f(*args)); ts.append(time.perf_counter() - t0)
    print(f"{name}: {np.median(ts)*1e3:.2f} ms", flush=True)

@jax.jit
def v1(x8, w8):  # 3D int8 matmul, pre-quantized activations
    return jnp.sum(jnp.matmul(x8, w8, preferred_element_type=jnp.int32))

@jax.jit
def v2(x, w8):  # dynamic quant + 3D int8 matmul + rescale
    xf = x.astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(xf), -1, keepdims=True) / 127., 1e-12)
    xq = jnp.clip(jnp.rint(xf / s_x), -127, 127).astype(jnp.int8)
    y = jnp.matmul(xq, w8, preferred_element_type=jnp.int32).astype(jnp.float32)
    return jnp.sum(y * (s_x * scale))

@jax.jit
def v3(x, w8L):  # same inside a 12-step scan
    def body(c, w):
        xf = c.astype(jnp.float32)
        s_x = jnp.maximum(jnp.max(jnp.abs(xf), -1, keepdims=True) / 127., 1e-12)
        xq = jnp.clip(jnp.rint(xf / s_x), -127, 127).astype(jnp.int8)
        y = jnp.matmul(xq, w, preferred_element_type=jnp.int32).astype(jnp.float32)
        return (y * (s_x * scale)).astype(c.dtype), None
    out, _ = jax.lax.scan(body, x, w8L)
    return jnp.sum(out)

@jax.jit
def v0(x):  # bf16 reference
    wb = w8.astype(jnp.bfloat16) * 0.01
    return jnp.sum(jnp.matmul(x, wb, preferred_element_type=jnp.float32))

timeit("v0 bf16 3D", v0, x)
timeit("v1 int8 3D pre-quant", v1, x8, w8)
timeit("v2 int8 3D dyn-quant", v2, x, w8)
timeit("v3 int8 scan", v3, x, w8L)
