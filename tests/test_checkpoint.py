"""Checkpoint/resume: a restored node continues the mission with intact
matching databases, candidate bookkeeping, gossip watermarks, and graph."""

import numpy as np
import pytest

from cslam_tpu.comm import messages as msgs
from cslam_tpu.comm.bus import InProcessBus, InProcessRouter, ManualClock
from cslam_tpu.frontend.sim import SimSensorHandler, SyntheticWorld
from cslam_tpu.node import SwarmNode
from cslam_tpu.utils import checkpoint

from test_e2e_swarm import build_swarm, drive_pipeline, make_params


def test_checkpoint_roundtrip(tmp_path):
    router, clock, world, nodes, handlers, odom = build_swarm(
        2, n_poses=16, drift=0.01)
    drive_pipeline(router, nodes, world, odom, detection_rounds=2)
    node = nodes[0]
    folder = str(tmp_path / "ckpt")
    checkpoint.save_node(node, folder)

    # fresh node on a fresh router
    router2 = InProcessRouter()
    clock2 = ManualClock()
    params = make_params(0, 2)
    node2 = SwarmNode(params, InProcessBus(router2, 0), clock2)
    checkpoint.load_node(node2, folder)

    # descriptor databases restored
    assert len(node2.detection.lcm.local_nnsm) == \
        len(node.detection.lcm.local_nnsm)
    assert len(node2.detection.lcm.other_robots_nnsm[1]) == \
        len(node.detection.lcm.other_robots_nnsm[1])
    # search behaves identically
    q = world.descriptor(0, 3)
    a = node.detection.lcm.local_nnsm.search(q, 3)
    b = node2.detection.lcm.local_nnsm.search(q, 3)
    assert a[0] == b[0]

    # candidate bookkeeping restored
    sel1 = node.detection.lcm.candidate_selector
    sel2 = node2.detection.lcm.candidate_selector
    assert set(sel2.candidate_edges.keys()) == set(sel1.candidate_edges.keys())
    assert sel2.already_considered_matches == sel1.already_considered_matches
    assert [tuple(e) for e in sel2.fixed_edges] == \
        [tuple(e) for e in sel1.fixed_edges]
    assert sel2.nb_poses == sel1.nb_poses

    # gossip watermarks restored
    mon1 = node.detection.neighbor_manager.neighbors_monitors[1]
    mon2 = node2.detection.neighbor_manager.neighbors_monitors[1]
    assert mon2.last_keyframe_sent == mon1.last_keyframe_sent
    assert mon2.last_keyframe_received == mon1.last_keyframe_received

    # back-end graph restored
    be1, be2 = node.backend, node2.backend
    assert set(be2.odometry_pose_estimates.keys()) == \
        set(be1.odometry_pose_estimates.keys())
    assert len(be2.local_factors) == len(be1.local_factors)
    assert sum(len(v) for v in be2.inter_robot_loop_closures.values()) == \
        sum(len(v) for v in be1.inter_robot_loop_closures.values())
    assert be2.latest_local_key == be1.latest_local_key

    # the restored node can still run a full selection + optimization
    selection = node2.detection.lcm.select_candidates(
        3, {0: True, 1: True})
    assert isinstance(selection, list)
    node2.backend.current_neighbors = msgs.RobotIdsAndOrigin(ids=[],
                                                             origins=[])
    node2.backend.optimizer_state = \
        type(node2.backend.optimizer_state).START_OPTIMIZATION
    node2.backend.start_optimization()
    if node2.backend._optimization_future is not None:
        node2.backend._optimization_future.result(timeout=120)
        node2.backend.check_result_and_finish_optimization()
    router2.spin_until_idle()
    assert node2.backend.optimization_count == 1


def test_bf16_database_checkpoint_roundtrip(tmp_path):
    """bfloat16-storage databases survive checkpoint/restore: npz cannot
    represent ml_dtypes bfloat16 (it round-trips as raw void bytes), so
    the saver up-casts to float32 and add_item re-rounds on restore."""
    import numpy as np
    import jax.numpy as jnp
    from cslam_tpu.matching.descriptor_db import DescriptorDatabase
    from cslam_tpu.utils.checkpoint import (_load_descriptor_db,
                                            _save_descriptor_db)
    rng = np.random.default_rng(0)
    db = DescriptorDatabase(method="exact", storage="bfloat16")
    for i in range(10):
        db.add_item(rng.standard_normal(32).astype(np.float32), i)
    path = str(tmp_path / "db.npz")
    _save_descriptor_db(db, path)
    db2 = DescriptorDatabase(method="exact", storage="bfloat16")
    _load_descriptor_db(db2, path)
    assert db2.data.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(db.data[:10], dtype=np.float32),
        np.asarray(db2.data[:10], dtype=np.float32))
    assert db2.items == db.items
