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
1-D over all devices within a slice.

Multi-slice / multi-host: `num_slices > 1` builds a hierarchical 2-D mesh
with axes ("dcn", "data") — outer axis across slices (devices that only
reach each other over the data-center network), inner axis over each
slice's ICI ring. The batch still shards over ALL devices
(PartitionSpec(("dcn", "data"))); because the device order in the mesh
groups each slice contiguously, XLA lowers the gradient all-reduce
hierarchically — reduce within a slice over ICI first, then the small
cross-slice exchange over DCN — which is the standard TPU multi-pod DP
recipe. On real multi-slice TPU the device→slice assignment comes from
`mesh_utils.create_hybrid_device_mesh`; on a flat device set (tests,
virtual CPU devices) a contiguous reshape stands in for it.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
DCN_AXIS = "dcn"


def data_mesh(devices=None, num_slices: int = 1) -> Mesh:
    """1-D mesh (axis "data") over the given devices, or a hierarchical
    ("dcn", "data") mesh when num_slices > 1."""
    devices = list(devices if devices is not None else jax.devices())
    if num_slices <= 1:
        return Mesh(np.asarray(devices).reshape(-1), (DATA_AXIS,))
    if len(devices) % num_slices:
        raise ValueError(f"{len(devices)} devices not divisible by "
                         f"{num_slices} slices")
    per_slice = len(devices) // num_slices
    if all(getattr(d, "slice_index", None) is not None for d in devices):
        # real multi-slice topology: group by each device's slice_index;
        # errors (wrong slice count, uneven granules) must propagate — a
        # silent fallback would put devices of different slices on the
        # inner axis and push the per-step all-reduce onto DCN
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_hybrid_device_mesh(
            (1, per_slice), (num_slices, 1), devices=devices)
    else:
        # flat/virtual device sets (CPU tests) carry no slice topology;
        # contiguous blocks keep the inner axis "as local as it gets"
        grid = np.asarray(devices).reshape(num_slices, per_slice)
    return Mesh(grid, (DCN_AXIS, DATA_AXIS))


def make_mesh(num_devices: int | None, num_slices: int | None = None,
              axis_name: str = DATA_AXIS) -> Mesh | None:
    """Mesh over the first `num_devices` devices; None when <= 1 requested
    (single-device mode). The CLI-facing constructor: validates availability
    instead of silently shrinking. `num_slices` > 1 builds the hierarchical
    dcn×data mesh (see module docstring). `axis_name` renames the 1-D axis
    (e.g. "fold" for fold-parallel training); hierarchical meshes keep the
    canonical (dcn, data) names."""
    if num_slices is not None and num_slices < 1:
        raise ValueError(f"num_slices must be >= 1, got {num_slices}")
    if num_slices is not None and num_slices > 1 and axis_name != DATA_AXIS:
        raise ValueError("num_slices > 1 only applies to the data axis")
    if num_devices is None or num_devices == 1:
        if num_slices is not None and num_slices > 1:
            raise ValueError("num_slices > 1 requires num_devices > 1")
        return None
    if num_devices < 1:
        raise ValueError(f"num_devices must be >= 1, got {num_devices}")
    devices = jax.devices()
    if len(devices) < num_devices:
        raise ValueError(
            f"requested {num_devices} devices, only {len(devices)} visible")
    if num_slices is None or num_slices <= 1:
        return Mesh(np.asarray(devices[:num_devices]).reshape(-1),
                    (axis_name,))
    return data_mesh(devices[:num_devices], num_slices=num_slices)


FOLD_AXIS = "fold"


def fold_data_mesh(num_devices: int, data_per_fold: int,
                   axis_name: str = FOLD_AXIS) -> Mesh:
    """2-D (`axis_name`, "data") mesh: groups of `data_per_fold` devices,
    one group per concurrently-trained fold (train/fold_parallel.py) or
    sweep trial (train/trial_parallel.py, axis_name="trial").

    Within a group the fold's batch rows are sharded over the "data" axis
    and its weights replicated, so XLA inserts that fold's gradient
    all-reduce over the group's ICI only; across groups there are NO
    collectives (independent weight sets) — CV wall-clock scales with the
    group count while each fold also gets data-parallel throughput.
    Contiguous device blocks keep each group's all-reduce as local as the
    platform allows (same policy as the dcn mesh's inner axis)."""
    if data_per_fold < 1:
        raise ValueError(f"data_per_fold must be >= 1, got {data_per_fold}")
    if num_devices % data_per_fold:
        raise ValueError(f"{num_devices} devices not divisible into "
                         f"groups of {data_per_fold}")
    devices = jax.devices()
    if len(devices) < num_devices:
        raise ValueError(
            f"requested {num_devices} devices, only {len(devices)} visible")
    grid = np.asarray(devices[:num_devices]).reshape(
        num_devices // data_per_fold, data_per_fold)
    return Mesh(grid, (axis_name, DATA_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over every mesh axis (data for a 1-D
    mesh, dcn×data for a hierarchical one)."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


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
