"""Training-side exposure to the axon transfer-buffer retention.

Companion to probe_tunnel_leak.py: the real train loop gathers each
batch from host numpy (train/loop.py:774, augmentation regenerates
features per epoch so device-caching the train set is not
parity-viable) and the tunnel client retains every host->device
transfer buffer. Measured (full-size AST, b=16, bf16+remat, 40 steps):
RSS +8.6 MB/step == the 8.4 MB feature-batch transfer, at 341 ms/step
(suite running concurrently; quiet-host reference is 303 ms).

Exposure is bounded by run length: the 12-epoch quickstart grows ~1-2
GB; a 10k-step run would need ~86 GB of host RAM over the tunnel. On
tunnel links, slice long runs with checkpoints + --resume (bit-exact,
tests/test_resume.py) — each process restart releases the retained
buffers. Standard-PJRT hosts don't exhibit the retention.

Run: PYTHONPATH=/root/repo:/root/.axon_site python .bench/probe_train_rss.py
"""

import time

import numpy as np

def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0

import jax, jax.numpy as jnp
import optax
from zenker_audio_detection_tpu.models import ast as ast_mod
from zenker_audio_detection_tpu.train import losses, steps

B = 16
cfg = ast_mod.ASTConfig()
params = jax.tree.map(jnp.asarray, ast_mod.init_params(jax.random.PRNGKey(0), cfg))
tx = optax.adamw(1e-4)
opt_state = jax.tree.map(jnp.asarray, tx.init(params))
loss = lambda logits, y: losses.stage1_loss(logits, y, focal_gamma=2.0, label_smoothing=0.1)
train_step = steps.make_train_step(tx, cfg, loss)
rng = np.random.default_rng(0)

def batch():
    return (rng.standard_normal((B, cfg.max_length, cfg.num_mel_bins)).astype(np.float32),
            rng.integers(0, 2, size=(B,)).astype(np.int32))

f, y = batch()
params, opt_state, lv, _ = train_step(params, opt_state, f, y)
float(lv)  # compile + settle
r0, t0 = rss_mb(), time.time()
N = 40
for i in range(N):
    f, y = batch()  # fresh host arrays each step, like the real loop
    params, opt_state, lv, _ = train_step(params, opt_state, f, y)
    if i % 10 == 9:
        float(lv)
        print(f"  step {i+1}: rss=+{rss_mb()-r0:.0f} MB")
float(lv)
dt = time.time() - t0
per_step = (rss_mb() - r0) / N
xfer = (f.nbytes + y.nbytes) / 1e6
print(f"train rss: {per_step:.1f} MB/step (batch transfer {xfer:.1f} MB) "
      f"{dt/N*1000:.0f} ms/step")
