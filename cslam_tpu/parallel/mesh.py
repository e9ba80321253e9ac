"""Device-mesh construction for swarm workloads."""

import jax
import numpy as np
from jax.sharding import Mesh


def make_swarm_mesh(n_devices: int = None, axis_name: str = "shard") -> Mesh:
    """1-D mesh over the first n devices (default: all).

    One axis is the right topology for this workload's two data axes —
    descriptor-database rows and pose-graph factors — both of which
    reduce with a single psum/all-gather. Robots map to hosts (processes),
    not mesh axes; each host's chips form this mesh.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))
