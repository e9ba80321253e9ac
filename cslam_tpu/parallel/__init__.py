"""Multi-chip parallel layer: device meshes, sharded descriptor matching,
distributed pose-graph optimization.

The reference distributes by robot over DDS topics (SURVEY §2
"Parallelism"); here the dense math distributes over a
jax.sharding.Mesh — descriptor databases shard by row, pose-graph edges
shard by factor — with XLA collectives (psum/all_gather) riding ICI.
The decentralized protocol (gossip, election, liveness) stays on hosts
(cslam_tpu.comm).
"""

from cslam_tpu.parallel.mesh import make_swarm_mesh  # noqa: F401
