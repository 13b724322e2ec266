"""Mesh context: per-shard dispatch of the Pallas kernels.

GSPMD cannot partition a Mosaic `pallas_call`, so under a device mesh the
kernel invocations are wrapped in `jax.shard_map` with explicit
PartitionSpecs (the "per-shard pallas dispatch" strategy).  This works
with zero halo exchange because every kernel except CCL is row-local:

  matching  — each (8, 128) pixel block reads only its own row-stripe of
              the packed B planes (epipolar matching warps columns only);
              row blocks shard over 'tile', the batch over 'stream'.
  support   — candidate-row stripes are independent; same layout.
  LR check  — pure along-row consistency; same layout.
  CCL       — a global connected-components fixpoint.  Under a
              multi-shard 'tile' axis it runs BANDED with shard-aligned
              bands (ops/pallas/ccl_pl.py): each 'tile' member runs the
              in-VMEM fixpoint on its own row bands, then the
              boundary-row label merge (an O(boundary) XLA scatter/jump
              loop, GSPMD-partitioned) unions components across shard
              edges — the exact whole-frame partition.  Only the
              whole-frame kernel of a 1-shard tile axis replicates.

The context is thread-local and consulted at TRACE time: the sharded
pipeline enters `pallas_mesh(mesh)` around the first call of its jitted
stages.  With no context active the kernels dispatch exactly as before
(single device), so single-chip behaviour is untouched.

The reference has no distribution at all (SURVEY.md §5.8); this module is
part of the TPU-native scaling design, not a port.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

_state = threading.local()


def current() -> Optional[Tuple[Mesh, str, str]]:
    """(mesh, stream_axis, tile_axis) when a pallas_mesh context is active
    in this thread, else None."""
    return getattr(_state, "cfg", None)


@contextlib.contextmanager
def pallas_mesh(mesh: Mesh, stream: str = "stream", tile: str = "tile"):
    """Activate per-shard Pallas dispatch over `mesh` for code traced
    inside the context."""
    prev = getattr(_state, "cfg", None)
    _state.cfg = (mesh, stream, tile)
    try:
        yield
    finally:
        _state.cfg = prev


def row_multiple() -> int:
    """Number of 'tile' shards the padded row-block axis must divide into
    (1 with no active context)."""
    cfg = current()
    return int(cfg[0].shape[cfg[2]]) if cfg else 1


def shard_kernel(call, in_specs, out_specs, *args):
    """Run `call(*args)` under shard_map when a mesh context is active,
    plainly otherwise.  in/out_specs are PartitionSpecs over GLOBAL shapes;
    `call` must be built for the LOCAL (per-shard) shapes."""
    cfg = current()
    if cfg is None:
        return call(*args)
    mesh = cfg[0]
    return jax.shard_map(call, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)(*args)


def batch_split(axis_size: int) -> int:
    """Local batch size per 'stream' shard (= axis_size with no context)."""
    cfg = current()
    if cfg is None:
        return axis_size
    n_s = int(cfg[0].shape[cfg[1]])
    if axis_size % n_s:
        raise ValueError(
            f"batch {axis_size} not divisible by stream shards {n_s}")
    return axis_size // n_s
