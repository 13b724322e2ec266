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

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..params import ElasParams
from ..models.elas import ElasEngine
from . import ctx as mesh_ctx


class ShardedStereoPipeline:
    """Batched, mesh-sharded stereo pipeline.

    frames:   (B, H, W) uint8, B sharded over 'stream', H over 'tile'
    geometry: per-frame padded host arrays, sharded over 'stream'
    outputs:  disparity (B, Ho, Wo) with the same layout

    With use_pallas=True (the production configuration — the same kernels
    bench.py runs) the XLA glue is still partitioned by GSPMD, while each
    pallas_call dispatches per shard through jax.shard_map (see
    parallel.ctx): matching/support/LR shard their row blocks over 'tile'
    with no halo, CCL runs tile-replicated.
    """

    def __init__(self, params: ElasParams, width: int, height: int,
                 mesh: Mesh, use_pallas: bool = False):
        self.p = params
        self.mesh = mesh
        self.use_pallas = use_pallas
        self.engine = ElasEngine(params, width, height,
                                 use_pallas=use_pallas)
        e = self.engine

        def sh(*axes):
            return NamedSharding(mesh, P(*axes))

        def traced_in_ctx(f):
            # the pallas wrappers consult parallel.ctx at TRACE time; keep
            # the context active around every call so the first (tracing)
            # call sees it
            if not use_pallas:
                return f

            def g(*a):
                with mesh_ctx.pallas_mesh(mesh):
                    return f(*a)
            return g

        img_s = sh("stream", "tile", None)
        desc_s = sh("stream", None, "tile", None)
        rep_s = sh("stream")          # replicated over 'tile'

        self.stage_a = traced_in_ctx(jax.jit(
            jax.vmap(e._stage_support_impl),
            in_shardings=(img_s, img_s),
            out_shardings=(desc_s, desc_s, rep_s)))

        geo_s = (rep_s, rep_s, rep_s, rep_s, rep_s)
        self.stage_b = traced_in_ctx(jax.jit(
            jax.vmap(e._stage_dense_impl),
            in_shardings=(desc_s, desc_s) + geo_s,
            out_shardings=(sh("stream", "tile", None),
                           sh("stream", "tile", None))))

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
                            stacked["tris_l"], stacked["tris_r"],
                            stacked["tri_l"], stacked["tri_r"])

    # -- multi-host path ------------------------------------------------------

    def _global(self, spec: P, local: np.ndarray) -> jax.Array:
        return jax.make_array_from_process_local_data(
            NamedSharding(self.mesh, spec), local)

    def run_multihost(self, left_local: np.ndarray, right_local: np.ndarray
                      ) -> Tuple[jax.Array, jax.Array]:
        """SPMD step for multi-process meshes (every process calls this with
        ITS OWN (B_local, H, W) frame shard; see parallel.mesh.init_distributed).

        The host geometry stage stays process-local: the support grid is
        already replicated over 'tile', so each process reads only its own
        addressable batch entries, triangulates them, and contributes the
        geometry back as its local shard — zero extra cross-host traffic
        beyond stage boundaries.  Returns the global (B, Ho, Wo) disparity
        jax.Arrays (each process addresses its own shards)."""
        img = P("stream", "tile", None)
        gL = self._global(img, np.asarray(left_local))
        gR = self._global(img, np.asarray(right_local))
        desc1, desc2, d_can = self.stage_a(gL, gR)

        # local batch entries of the 'stream'-sharded, tile-replicated grid
        seen = {}
        for s in d_can.addressable_shards:
            b0 = s.index[0].start or 0
            if b0 not in seen:
                seen[b0] = np.asarray(s.data)
        local_dc = np.concatenate([seen[k] for k in sorted(seen)], axis=0)
        gs = [self.engine.host_mid(local_dc[i])
              for i in range(local_dc.shape[0])]
        geo = {k: self._global(P("stream"), np.stack([g[k] for g in gs]))
               for k in gs[0]}
        return self.stage_b(desc1, desc2, geo["pts"],
                            geo["tris_l"], geo["tris_r"],
                            geo["tri_l"], geo["tri_r"])
