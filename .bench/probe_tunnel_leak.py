"""Isolate the axon-tunnel per-call RSS leak (round-5 soak finding).

The 8-hour TPU serving soak (soak_serve.py --hours 8 --tpu) grew RSS
linearly: +1119.7 MB post-warmup over 57,599 windows (~19.9 KB/window)
where the identical CPU run is flat (-0.4 MB). This probe isolates the
mechanism with a trivial jitted reduction over a 512 KB input:

  mode=transfer  (fresh numpy input each call, host->device transfer):
      growth 999.1 MB / 2000 calls = 511.6 KB/call  == the INPUT SIZE
  mode=resident  (device-resident input, no per-call transfer):
      growth   2.9 MB / 2000 calls =   1.5 KB/call  (~flat)

Conclusion: the experimental axon PJRT client retains every
host->device transfer buffer for the life of the process; the leak is
proportional to bytes transferred, not calls, and is NOT in this
package's code (retain_results=False serving is O(1) on CPU). The
serving soak's ~19.9 KB/window matches its per-window transfer: 16 KB
of int16 samples (0.5 s hop @ 16 kHz) + starts vectors + JSONL
plumbing. Long-lived streams on the tunnel should use
`zenker-serve --rss-limit-mb` (graceful summary + exit 3 for
supervisor restart); real non-tunnel TPU hosts run the standard PJRT
client, where this retention has not been observed (unverifiable in
this environment).

Run:
  PYTHONPATH=/root/repo:/root/.axon_site python .bench/probe_tunnel_leak.py \
      [transfer|resident|newarrays]
"""

import sys
import time

import numpy as np


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0


def main():
    import jax

    print("devices:", jax.devices())
    mode = sys.argv[1] if len(sys.argv) > 1 else "transfer"
    f = jax.jit(lambda x: (x * 2.0).sum())
    x0 = np.zeros((8, 128, 128), np.float32)  # 512 KB, ~one feed chunk
    xd = jax.device_put(x0)
    float(f(xd))  # compile
    r0 = rss_mb()
    n = 2000
    t0 = time.time()
    for i in range(n):
        if mode == "transfer":
            float(f(x0))  # fresh host->device transfer each call
        elif mode == "resident":
            float(f(xd))  # device-resident input
        elif mode == "newarrays":
            y = jax.device_put(np.random.rand(8, 128, 128).astype(np.float32))
            float(f(y))
            del y
        else:
            raise SystemExit(f"unknown mode {mode!r}")
        if i % 500 == 499:
            print(f"  iter {i + 1}: rss={rss_mb():.1f} MB "
                  f"(+{rss_mb() - r0:.1f})")
    dt = time.time() - t0
    print(f"mode={mode} N={n} growth={rss_mb() - r0:.1f} MB "
          f"({(rss_mb() - r0) * 1024 / n:.1f} KB/call) {n / dt:.0f} calls/s")


if __name__ == "__main__":
    main()
