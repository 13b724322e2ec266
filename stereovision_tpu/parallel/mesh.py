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


def multihost_mesh(stream: Optional[int] = None,
                   tile: Optional[int] = None) -> Mesh:
    """Multi-host variant: call jax.distributed.initialize() first on every
    host (controller-less), then build the global mesh over all processes'
    devices."""
    if jax.process_count() > 1 or jax.process_index() > 0:
        pass  # already initialized by the launcher
    return make_mesh(len(jax.devices()), stream=stream, tile=tile)


def spec(mesh: Mesh, *axes) -> NamedSharding:
    return NamedSharding(mesh, P(*axes))
