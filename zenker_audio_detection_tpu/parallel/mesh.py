"""Device mesh + sharding utilities (the framework's "distributed backend").

The reference has no distributed layer at all — parallelism there is
sequential subprocesses (src/run_batch_simple_2stage.py:282-284) and whatever
HF Trainer would do with multiple GPUs (SURVEY §2.4). The TPU-native
equivalent is XLA collectives over ICI, expressed through
`jax.sharding.Mesh` + `NamedSharding`:

  * training: batch axis sharded over the `data` mesh axis; the gradient
    all-reduce is inserted by XLA (psum over ICI), playing NCCL's role.
  * inference: model replicated, windows batch-sharded across chips.

AST-base (~86 M params) fits on one chip, so tensor/pipeline parallelism is
intentionally out of scope (documented decision, SURVEY §2.4); the mesh is
1-D over all devices.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def data_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, axis name "data"."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (DATA_AXIS,))


def make_mesh(num_devices: int | None) -> Mesh | None:
    """Mesh over the first `num_devices` devices; None when <= 1 requested
    (single-device mode). The CLI-facing constructor: validates availability
    instead of silently shrinking."""
    if num_devices is None or num_devices == 1:
        return None
    if num_devices < 1:
        raise ValueError(f"num_devices must be >= 1, got {num_devices}")
    devices = jax.devices()
    if len(devices) < num_devices:
        raise ValueError(
            f"requested {num_devices} devices, only {len(devices)} visible")
    return data_mesh(devices[:num_devices])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree, mesh: Mesh):
    """Put a pytree (e.g. model params) on the mesh fully replicated."""
    return jax.device_put(tree, replicated(mesh))


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0,
                    pad_value=0.0) -> tuple[np.ndarray, int]:
    """Pad `axis` up to a multiple of `multiple`; returns (padded, n_valid).

    Sharded batches must divide evenly across devices; callers mask out the
    padded tail using n_valid.
    """
    n = x.shape[axis]
    target = -(-n // multiple) * multiple
    if target == n:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, target - n)
    return np.pad(x, widths, constant_values=pad_value), n


def shard_batch(x, mesh: Mesh):
    """Device-put an array with its leading axis sharded over the mesh."""
    return jax.device_put(x, batch_sharding(mesh))


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.devices.size
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} devices")
    return global_batch // n
