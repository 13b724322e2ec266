"""Device mesh construction for multi-chip / multi-host scaling.

The reference has no distribution at all (single process; its only
"transport" is cudaMemcpy, SURVEY.md §5.8).  The TPU build scales along two
axes:
  'stream' — frame/stream data parallelism (independent stereo pairs),
  'tile'   — spatial row-tile parallelism within a frame (the image-domain
             analogue of sequence/context parallelism; epipolar matching is
             row-local so halos are shallow).
Collectives ride ICI within a slice and DCN across slices; XLA inserts them
from sharding annotations (jax.sharding + jit in/out shardings).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              stream: Optional[int] = None,
              tile: Optional[int] = None) -> Mesh:
    """Create a ('stream', 'tile') mesh over the available devices.

    Defaults: all devices on 'stream' (pure DP) — the embarrassingly
    parallel axis that gives linear scaling first; pass `tile` to split
    frames spatially as well."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if tile is None and stream is None:
        stream, tile = n, 1
    elif stream is None:
        stream = n // tile
    elif tile is None:
        tile = n // stream
    assert stream * tile == n, (stream, tile, n)
    arr = np.array(devs).reshape(stream, tile)
    return Mesh(arr, ("stream", "tile"))


def init_distributed(coordinator_address: str, num_processes: int,
                     process_id: int) -> None:
    """Join the multi-host job: every process calls this once before any
    other JAX operation (controller-less SPMD — the TPU-native analogue of
    an MPI init; the reference is strictly single-process, SURVEY.md §5.8).
    Collectives then ride ICI/DCN on TPU pods and Gloo on CPU test meshes."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def multihost_mesh(stream: Optional[int] = None,
                   tile: Optional[int] = None) -> Mesh:
    """Global ('stream', 'tile') mesh over every process's devices.

    Requires init_distributed() (or jax.distributed.initialize) to have run
    on every process.  The default layout puts whole hosts on 'stream'
    (frame data parallelism across DCN) and each host's local chips on
    'tile' (spatial splitting over ICI) — collectives that cross hosts are
    then only the tiny support-grid gathers, and halo-free row-sharding
    stays intra-host."""
    n = len(jax.devices())
    if stream is None and tile is None:
        stream = jax.process_count()
        tile = n // stream
    return make_mesh(n, stream=stream, tile=tile)


def local_batch_indices(global_batch: int, mesh: Mesh) -> np.ndarray:
    """Batch indices this process owns under P('stream') sharding."""
    n_s = mesh.shape["stream"]
    per = global_batch // n_s
    # which stream rows live on this process
    mine = sorted({
        i for i in range(n_s)
        if any(d.process_index == jax.process_index()
               for d in np.asarray(mesh.devices)[i].ravel())})
    return np.concatenate([np.arange(i * per, (i + 1) * per) for i in mine])


def spec(mesh: Mesh, *axes) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))
