"""Device mesh + sharding policy.

Replaces the reference's NCCL process-group runtime (engine.py:38-71):
instead of one process per GPU with DDP gradient buckets and SyncBN
conversion, we build a single-program `jax.sharding.Mesh` with two axes:

* ``data``    — batch dimension (data parallelism; grads reduce via the
  `psum` XLA inserts for the global-mean loss).
* ``spatial`` — image-height dimension (the convolutional analog of
  sequence parallelism: XLA's SPMD partitioner inserts halo exchanges over
  ICI for convs whose windows straddle shards).  Used for whole-image
  1024x2048 inference and to scale per-chip activation memory in training.

BN stays synchronized for free: batch moments are `jnp.mean` over the
global array, so the reduction spans both axes.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_data: Optional[int] = None, n_spatial: int = 1,
                devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    total = len(devices)
    if n_data is None:
        n_data = total // n_spatial
    if n_data * n_spatial != total:
        raise ValueError(
            f"mesh {n_data}x{n_spatial} != {total} devices")
    arr = np.asarray(devices).reshape(n_data, n_spatial)
    return Mesh(arr, axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh, spatial: bool = True) -> NamedSharding:
    """NHWC batch: shard N over 'data', H over 'spatial'."""
    return NamedSharding(mesh, P("data", "spatial" if spatial else None,
                                 None, None))


def label_sharding(mesh: Mesh, spatial: bool = True) -> NamedSharding:
    """(N,H,W) labels: same layout as the batch."""
    return NamedSharding(mesh, P("data", "spatial" if spatial else None,
                                 None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put(v, s: NamedSharding):
    """Host array -> global device array under ``s``.

    Multi-process jobs assemble the global array from each process's
    LOCAL piece (jax.make_array_from_process_local_data — the
    DistributedSampler-feeds-local-rank analog, engine.py:81-93); a
    replicated spec expects the identical full array on every process.
    Single-process jobs are a plain device_put."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(s, np.asarray(v))
    return jax.device_put(v, s)


def replicate_tree(mesh: Mesh, tree):
    """Replicate a pytree onto every device of a (possibly multi-process)
    mesh."""
    rep = replicated(mesh)
    return jax.tree.map(lambda x: put(np.asarray(x), rep), tree)


def shard_batch(mesh: Mesh, batch: dict, spatial: bool = True) -> dict:
    """Place a host batch dict onto the mesh with batch/label shardings.
    In multi-process jobs ``batch`` is this process's local shard of the
    global batch (rows rank::world of the epoch permutation)."""
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim == 4:
            s = batch_sharding(mesh, spatial)
        elif hasattr(v, "ndim") and v.ndim == 3:
            s = label_sharding(mesh, spatial)
        elif hasattr(v, "ndim") and v.ndim == 2:
            # per-image vectors (compact 'pad' triples, 'weight_class'):
            # batch-leading, so they shard over 'data' like the batch —
            # replicating them would mis-assemble the global array in
            # multi-process jobs where each process holds different rows
            s = NamedSharding(mesh, P("data"))
        elif isinstance(v, dict):
            out[k] = shard_batch(mesh, v, spatial)
            continue
        else:
            s = replicated(mesh)
        out[k] = put(v, s)
    return out
