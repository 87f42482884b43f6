"""Device mesh and sharding helpers.

This module is the TPU-native replacement for the reference's entire
distributed stack (SURVEY.md §5.8): muji ring allreduce
(caffe2/python/muji.py:47-183), NCCL ops (contrib/nccl/cuda_nccl_op_gpu.cc),
Gloo ops + rendezvous stores (contrib/gloo, distributed/), MPI ops
(mpi/mpi_ops.cc), and the host-mediated parameter broadcast
(lib/utils/net.py:185-208).

On TPU all of that is one `jax.sharding.Mesh`: parameters are replicated by
sharding (no broadcast step), and gradient reduction is a psum XLA inserts
because the loss sums over the batch axis — riding ICI within a slice and DCN
across slices, chosen by the mesh axis layout.

Axes:
  'data'  — data parallel (the only parallelism the reference trains with)
  'model' — reserved for spatial/tensor sharding of very large inputs
            (the CNN analogue of sequence parallelism, SURVEY.md §5.7);
            size 1 by default.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/group) dim over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_tree(batch, mesh: Mesh):
    """Apply leading-dim data sharding to every array in a batch pytree."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
