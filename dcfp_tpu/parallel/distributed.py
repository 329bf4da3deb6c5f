"""Multi-host / multi-slice runtime setup.

The reference bootstraps one process per GPU with NCCL env rendezvous
(engine.py:38-46, launched by torch.distributed.launch).  The TPU-native
equivalent is one process per *host*, all running the same SPMD program:

* ``initialize()`` wraps ``jax.distributed.initialize`` (coordinator
  discovery is automatic on TPU pods; explicit args for CPU/GPU fleets);
* ``create_pod_mesh`` builds a ``(data, spatial)`` mesh over ALL devices
  in the job, laying the mesh out so the fast collective axes ride ICI
  within a slice and only the data axis crosses DCN between slices
  (hybrid mesh), matching the scaling-book recipe: pick a mesh, annotate
  shardings, let XLA insert collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from dcfp_tpu.utils.logger import get_logger

log = get_logger()


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the multi-host runtime (no-op in single-process jobs).

    On TPU pods all arguments are discovered from the environment; pass
    them explicitly only for manual CPU/GPU bring-up."""
    if num_processes is not None and num_processes <= 1:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    log.info("distributed: process %d/%d, %d local / %d global devices",
             jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())


def create_pod_mesh(n_spatial: int = 1,
                    dcn_data_parallel: Optional[int] = None) -> Mesh:
    """(data, spatial) mesh over every device in the job.

    Single-slice: contiguous ICI layout via ``create_device_mesh``.
    Multi-slice (``dcn_data_parallel`` = number of slices): hybrid layout
    where the data axis factors across DCN x ICI and spatial stays inside
    a slice — so BN-moment/grad reductions ride ICI and only the batch
    reduction crosses DCN.
    """
    from jax.experimental import mesh_utils
    total = jax.device_count()
    if total % n_spatial:
        raise ValueError(f"{total} devices not divisible by "
                         f"n_spatial={n_spatial}")
    n_data = total // n_spatial
    if dcn_data_parallel and dcn_data_parallel > 1:
        if n_data % dcn_data_parallel:
            raise ValueError(
                f"data axis {n_data} not divisible by "
                f"{dcn_data_parallel} slices")
        if hasattr(jax.devices()[0], "slice_index"):
            devices = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(n_data // dcn_data_parallel, n_spatial),
                dcn_mesh_shape=(dcn_data_parallel, 1))
        else:
            # non-pod platforms (CPU tests) have no slice topology;
            # emulate the slice-major layout so the mesh shape and axis
            # semantics are identical
            devices = np.asarray(jax.devices()).reshape(
                dcn_data_parallel, n_data // dcn_data_parallel, n_spatial)
        devices = devices.reshape(n_data, n_spatial)
    else:
        devices = mesh_utils.create_device_mesh((n_data, n_spatial))
    return Mesh(devices, axis_names=("data", "spatial"))


def process_batch_slice(global_batch: int) -> slice:
    """Which rows of the global batch this host should load (each host
    feeds only its local shard; jax.make_array_from_process_local_data
    assembles the global array)."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
