"""Probe: int8 vs bf16 matmul throughput on v5e via XLA (MXU int8 path).

Shapes mimic the AST projection/FFN GEMMs at b=128: M=128*1214 tokens."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp
import zenker_audio_detection_tpu  # enable compile cache

M, K, N = 128 * 1214, 768, 3072
rng = np.random.default_rng(0)
a8 = jnp.asarray(rng.integers(-127, 127, (M, K), dtype=np.int8))
b8 = jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8))
abf = jnp.asarray(rng.standard_normal((M, K)), dtype=jnp.bfloat16)
bbf = jnp.asarray(rng.standard_normal((K, N)), dtype=jnp.bfloat16)

@jax.jit
def mm_i8(a, b):
    return jnp.sum(jnp.matmul(a, b, preferred_element_type=jnp.int32))

@jax.jit
def mm_bf(a, b):
    return jnp.sum(jnp.matmul(a, b, preferred_element_type=jnp.float32))

def timeit(name, f, *args, n=10):
    print(f"compiling {name}...", file=sys.stderr, flush=True)
    out = f(*args); _ = np.asarray(out)  # compile+sync
    print(f"compiled {name}", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _ = np.asarray(out)
    return (time.perf_counter() - t0) / n

tb = timeit("bf16", mm_bf, abf, bbf)
t8 = timeit("int8", mm_i8, a8, b8)
fl = 2 * M * K * N
print(f"int8: {t8*1e3:.2f} ms ({fl/t8/1e12:.1f} TOP/s)")
print(f"bf16: {tb*1e3:.2f} ms ({fl/tb/1e12:.1f} TFLOP/s)")
print(f"speedup {tb/t8:.2f}x")
