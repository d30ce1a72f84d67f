"""Sharded pose-graph optimization over a device mesh.

The batched PGO solve (pipeline.posegraph) is already matrix-free: edge
residuals + CG on jvp/vjp products.  Distribution is therefore a data
placement decision, not new math — shard the node arrays over the mesh and
jit the same solve; XLA partitions the per-node work and inserts
all-gathers for the cross-shard edge gathers (loop edges) and all-reduces
for the CG inner products, riding ICI on a real slice.

This mirrors how the keyframe store scales: nodes (and their stored clouds
/ descriptors) live shard-local; only pose estimates move between shards.
"""

from __future__ import annotations

import jax

from ..pipeline import posegraph


def shard_graph(g: posegraph.PoseGraph, mesh, axis: str = "data"
                ) -> posegraph.PoseGraph:
    """Nodes sharded over `axis`; loop-edge arrays replicated (they are tiny
    and gather across shards)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    node = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def put_nodes(a):
        return jax.device_put(a, node)

    def put_rep(a):
        return jax.device_put(a, rep)

    return posegraph.PoseGraph(
        poses=jax.tree.map(put_nodes, g.poses),
        node_valid=put_nodes(g.node_valid),
        num_nodes=put_rep(g.num_nodes),
        odo_rel=jax.tree.map(put_nodes, g.odo_rel),
        loop_i=put_rep(g.loop_i),
        loop_j=put_rep(g.loop_j),
        loop_rel=jax.tree.map(put_rep, g.loop_rel),
        loop_sqrt_info=put_rep(g.loop_sqrt_info),
        loop_valid=put_rep(g.loop_valid),
        num_loops=put_rep(g.num_loops),
    )


optimize_sharded = posegraph.optimize  # same compiled entry point — the
# placement above is the entire distribution story.
