"""Full visual pipeline chain on one robot: RGBD handler -> KeyframeRGB
-> global-descriptor component -> processed descriptor -> loop-closure
detection -> LocalKeyframeMatch -> handler verification ->
IntraRobotLoopClosure -> back-end factor (SURVEY §3.1 call stack,
end to end over the bus with no simulation shortcuts)."""

import numpy as np
import pytest

from cslam_tpu.backend.decentralized_pgo import DecentralizedPGO
from cslam_tpu.comm import messages as msgs
from cslam_tpu.comm.bus import InProcessBus, InProcessRouter, ManualClock
from cslam_tpu.frontend.global_descriptor_component import \
    GlobalDescriptorComponent
from cslam_tpu.frontend.loop_closure_detection import \
    GlobalDescriptorLoopClosureDetection
from cslam_tpu.frontend.rgbd_handler import RGBDHandler

from test_rgbd_handler import INTR, make_pose, render_scene


class PlaceModel:
    """Global descriptors correlated with camera pose (stands in for the
    CNN so the test is deterministic and fast; the CNN path is covered by
    test_models)."""

    def __init__(self):
        self.rng = np.random.default_rng(0)
        self.proj = self.rng.standard_normal((4, 16)).astype(np.float32)
        self.calls = 0

    def compute_embeddings_batch(self, images):
        # descriptor from mean image statistics: identical scenes ->
        # near-identical descriptors
        self.calls += 1
        out = []
        for img in images:
            img = img.astype(np.float32)
            stats = np.array([img.mean(), img.std(),
                              img[: img.shape[0] // 2].mean(),
                              img[:, : img.shape[1] // 2].mean()],
                             dtype=np.float32)
            d = np.tanh(stats @ self.proj)
            out.append(d / np.linalg.norm(d))
        return np.stack(out)


def _chain_params(robot_id=0, **overrides):
    params = {
        "robot_id": robot_id,
        "max_nb_robots": 1,
        "frontend.similarity_threshold": 0.9,
        "frontend.global_descriptor_technique": "custom",
        "frontend.nb_best_matches": 5,
        "frontend.intra_loop_min_inbetween_keyframes": 2,
        "frontend.enable_intra_robot_loop_closures": True,
        "frontend.detection_publication_max_elems_per_msg": 10,
        "frontend.enable_sparsification": True,
        "frontend.use_vertex_cover_selection": True,
        "frontend.sensor_type": "rgbd",
        "frontend.keyframe_generation_ratio_threshold": 1.0,
        "frontend.pnp_min_inliers": 6,
        "frontend.max_queue_size": 5,
        "backend.max_waiting_time_sec": 60.0,
        "neighbor_management.enable_neighbor_monitoring": False,
        "neighbor_management.init_delay_sec": 0.0,
        "neighbor_management.max_heartbeat_delay_sec": 5.0,
        "evaluation.enable_simulated_rendezvous": False,
        "evaluation.rendezvous_schedule_file": "",
    }
    params.update(overrides)
    return params


def test_single_robot_visual_chain_produces_backend_factor():
    router = InProcessRouter()
    clock = ManualClock()
    bus = InProcessBus(router, 0)
    params = _chain_params()
    model = PlaceModel()
    handler = RGBDHandler(params, bus, clock)
    gdc = GlobalDescriptorComponent(params, bus, model=model, batch_size=1)
    detection = GlobalDescriptorLoopClosureDetection(
        params, bus, clock, descriptor_model=model)
    backend = DecentralizedPGO(params, bus, clock)

    rng = np.random.default_rng(1)
    # trajectory that revisits the start: 0 and 4 observe the same place
    poses = [make_pose(0.0), make_pose(0.8, 0.2, 0.1),
             make_pose(1.6, 0.0, 0.2), make_pose(0.8, -0.2, 0.1),
             make_pose(0.02, 0.01, 0.005)]
    for pose in poses:
        img, depth = render_scene(pose, rng)
        handler.add_sensor_data(img, depth, INTR, pose)
        handler.process_new_sensor_data()
        gdc.tick()
        router.spin_until_idle()

    # descriptors flowed through the CNN component into the detector
    assert model.calls == 5
    assert len(detection.lcm.local_nnsm) == 5
    # keyframe odometry reached the back-end as an odometry chain
    assert len(backend.odometry_pose_estimates) == 5
    assert len([f for f in backend.local_factors if not f.is_loop]) == 4
    # the revisit produced a verified intra-robot loop closure factor
    loops = [f for f in backend.local_factors if f.is_loop]
    assert len(loops) >= 1, "no intra-robot loop closure reached the backend"
    lc = loops[0]
    # its measurement is close to the ground-truth relative pose
    k0, k1 = lc.key_from[1], lc.key_to[1]
    R_rel = poses[k0][0].T @ poses[k1][0]
    t_rel = poses[k0][0].T @ (poses[k1][1] - poses[k0][1])
    np.testing.assert_allclose(lc.R, R_rel, atol=0.05)
    np.testing.assert_allclose(lc.t, t_rel, atol=0.15)


def test_learned_feature_chain_runs_end_to_end():
    """The SuperPoint + LightGlue runtime path (frontend.features:
    learned — the reference fork's visual chain, rgbd_handler.cpp:263-315
    + :317-412) drives the full pipeline. Weights are random (no
    downloads in the image), so the assertion is structural: learned
    extraction feeds keyframes, LightGlue matching + RANSAC verification
    executes, odometry reaches the back-end, and the near-identical
    revisit still yields a verified loop closure (identical frames give
    near-identical random-net descriptors, which even an untrained
    matcher pairs by self-similarity)."""
    router = InProcessRouter()
    clock = ManualClock()
    bus = InProcessBus(router, 0)
    params = _chain_params(**{
        "frontend.features": "learned",
        "frontend.lightglue_layers": 2,
        "frontend.lightglue_score_threshold": 0.0,
        "frontend.pnp_min_inliers": 6,
    })
    model = PlaceModel()
    handler = RGBDHandler(params, bus, clock, max_keypoints=128)
    assert handler.superpoint is not None
    assert handler.lightglue is not None
    gdc = GlobalDescriptorComponent(params, bus, model=model, batch_size=1)
    detection = GlobalDescriptorLoopClosureDetection(
        params, bus, clock, descriptor_model=model)
    backend = DecentralizedPGO(params, bus, clock)

    rng = np.random.default_rng(1)
    poses = [make_pose(0.0), make_pose(0.8, 0.2, 0.1),
             make_pose(1.6, 0.0, 0.2), make_pose(0.8, -0.2, 0.1),
             make_pose(0.0)]  # exact revisit
    for pose in poses:
        img, depth = render_scene(pose, rng)
        handler.add_sensor_data(img, depth, INTR, pose)
        handler.process_new_sensor_data()
        gdc.tick()
        router.spin_until_idle()

    assert len(backend.odometry_pose_estimates) == 5
    # learned extraction produced well-formed keyframes
    for kf in handler.local_keyframes.values():
        assert kf.descriptors.shape[1] == 256  # SuperPoint dim
        assert kf.mask.sum() > 0
    # the exact revisit was verified through LightGlue + RANSAC
    loops = [f for f in backend.local_factors if f.is_loop]
    assert len(loops) >= 1, \
        "learned verification chain produced no loop closure"
    lc = loops[0]
    np.testing.assert_allclose(lc.R, np.eye(3), atol=0.05)
    np.testing.assert_allclose(lc.t, np.zeros(3), atol=0.15)
