"""Sharded execution of the stereo pipeline over a ('stream', 'tile') mesh.

Strategy (SURVEY.md §5.7/§5.8): the frame batch axis is sharded over
'stream' (pure data parallelism over ICI/DCN — linear scaling, no halos);
image rows are sharded over 'tile'.  Sharding is expressed with
jax.sharding annotations on the jitted stage functions and GSPMD inserts
the communication: the shifted-window ops of the descriptor/support stages
become collective-permute halo exchanges of a few boundary rows, the
postprocessing column scans become segmented collectives, and the tiny
support grid is gathered for the host geometry stage.

This module provides the mesh-aware analogue of ElasEngine's two device
stages; the host middle stage is unchanged (it sees the full, gathered
support grid — a few tens of KB)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..params import ElasParams
from ..models.elas import ElasEngine


class ShardedStereoPipeline:
    """Batched, mesh-sharded stereo pipeline.

    frames:   (B, H, W) uint8, B sharded over 'stream', H over 'tile'
    geometry: per-frame padded host arrays, sharded over 'stream'
    outputs:  disparity (B, Ho, Wo) with the same layout
    """

    def __init__(self, params: ElasParams, width: int, height: int,
                 mesh: Mesh, use_pallas: bool = False):
        self.p = params
        self.mesh = mesh
        self.engine = ElasEngine(params, width, height,
                                 use_pallas=use_pallas)
        e = self.engine

        def sh(*axes):
            return NamedSharding(mesh, P(*axes))

        img_s = sh("stream", "tile", None)
        desc_s = sh("stream", None, "tile", None)
        rep_s = sh("stream")          # replicated over 'tile'

        self.stage_a = jax.jit(
            jax.vmap(e._stage_support_impl),
            in_shardings=(img_s, img_s),
            out_shardings=(desc_s, desc_s, rep_s))

        geo_s = (rep_s, rep_s, rep_s, rep_s, rep_s)
        self.stage_b = jax.jit(
            jax.vmap(e._stage_dense_impl),
            in_shardings=(desc_s, desc_s) + geo_s,
            out_shardings=(sh("stream", "tile", None),
                           sh("stream", "tile", None)))

    def run(self, left_batch: np.ndarray, right_batch: np.ndarray
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Full step: device stage A -> host geometry (per frame) -> device
        stage B.  left/right_batch: (B, H, W) uint8."""
        desc1, desc2, d_can = self.stage_a(jnp.asarray(left_batch),
                                           jnp.asarray(right_batch))
        dcs = np.asarray(d_can)
        gs = [self.engine.host_mid(dcs[i]) for i in range(dcs.shape[0])]
        stacked = {k: jnp.asarray(np.stack([g[k] for g in gs]))
                   for k in gs[0]}
        return self.stage_b(desc1, desc2, stacked["pts"],
                            stacked["planes_l"], stacked["planes_r"],
                            stacked["tri_l"], stacked["tri_r"])
