"""cslam_tpu — TPU-native decentralized multi-robot SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Swarm-SLAM
(reference: nhahn/cslam):

- Place-recognition front-end: CosPlace/NetVLAD-style CNN global descriptors
  (visual) and Scan Context (lidar), as Flax models / JAX ops.
- Loop-closure management: batched cosine-similarity kNN matching (Pallas
  kernel on TPU), algebraic-connectivity-maximization (MAC) budgeted edge
  selection with a JAX Fiedler-pair eigensolver, vertex-cover brokerage.
- Back-end: GNC-robust Levenberg-Marquardt pose-graph optimization in JAX
  (replaces GTSAM GncOptimizer), with a multi-robot block structure that
  shards over a TPU device mesh.
- Swarm runtime: neighbor liveness, broker/optimizer election, windowed
  gossip with high-watermarks, simulated-rendezvous fault injection, and a
  C++ DCN message bus + metrics logger (native/).

Robots map to hosts/processes; dense math maps to TPU chips via
jax.sharding / shard_map; the decentralized protocol stays on hosts.
"""

__version__ = "0.1.0"

from cslam_tpu.utils.edges import Edge, EdgeInterRobot  # noqa: F401
