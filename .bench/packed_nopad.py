import functools, math, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import zenker_audio_detection_tpu
from zenker_audio_detection_tpu.ops import attention as A

def kern(q_ref, k_ref, v_ref, o_ref, *, scale, nh, d):
    S = k_ref.shape[1]
    outs = []
    for h in range(nh):
        sl = slice(h*d, (h+1)*d)
        s = jax.lax.dot_general(q_ref[0, :, sl], k_ref[0, :, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(q_ref.dtype)
        outs.append(jax.lax.dot_general(p, v_ref[0, :, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(q_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)

@functools.partial(jax.jit, static_argnames=("num_heads", "block_q"))
def mha_nopad(q, k, v, *, num_heads, block_q=256):
    B, S, H = q.shape
    D = H // num_heads
    n_qb = pl.cdiv(S, block_q)
    return pl.pallas_call(
        functools.partial(kern, scale=1.0/math.sqrt(D), nh=num_heads, d=D),
        grid=(B, n_qb),
        in_specs=[pl.BlockSpec((1, block_q, H), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, S, H), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, S, H), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, block_q, H), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, H), q.dtype),
    )(q, k, v)

B, S, NH, D = 128, 1214, 12, 64
rng = np.random.default_rng(0)
mk = lambda: jax.device_put(rng.standard_normal((B, S, NH*D)).astype(np.float32)).astype(jnp.bfloat16)
q, k, v = mk(), mk(), mk()
ref = jax.jit(lambda q,k,v: jnp.sum(A.mha_packed(q,k,v,num_heads=NH).astype(jnp.float32)))
s = jax.jit(lambda q,k,v: jnp.sum(mha_nopad(q,k,v,num_heads=NH).astype(jnp.float32)))
try:
    r_ref = float(ref(q,k,v))
    r = float(s(q,k,v))
    print(f"nopad sum={r:.1f} vs packed {r_ref:.1f} (diff {abs(r-r_ref):.3f})", flush=True)
    t0=time.time(); n=5
    for _ in range(n): out = s(q,k,v)
    float(out)
    print(f"nopad steady {(time.time()-t0)/n*1000:.1f} ms", flush=True)
except Exception as e:
    print(f"FAILED {str(e)[:200]}", flush=True)
