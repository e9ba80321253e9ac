"""Lidar sensor handler: keyframe selection, Scan Context descriptors,
registration-based loop-closure verification.

Capability parity with the reference LidarHandler
(/root/reference/cslam/lidar_handler_node.py): odometry-distance keyframe
gating (:144-166), voxel downsampling (:168-203, open3d ->
ops/registration.voxel_downsample), local-descriptor request/response
with TEASER+ICP verification (:91-142, -> ops/registration.gnc_icp
seeded by the Scan Context yaw), publication of KeyframePointCloud +
KeyframeOdom (:186-196) and Intra/InterRobotLoopClosure results.
"""

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from cslam_tpu.comm import messages as msgs
from cslam_tpu.ops import registration, scancontext as sc_ops
from cslam_tpu.ops import se3


@dataclass
class KeyframePointCloud:
    id: int
    points: np.ndarray  # (N, 3)


class ScanContextModel:
    """compute_embedding(points) -> flattened (20*60,) Scan Context
    (reference cslam/lidar_pr/scancontext.py:3-16)."""

    def __init__(self, params: Optional[Dict] = None):
        self.params = params or {}
        self.shape = (20, 60)
        self.max_length = 80.0

    def compute_embedding(self, points: np.ndarray) -> np.ndarray:
        pts = np.asarray(points, dtype=np.float32).reshape(-1, 3)
        sc = sc_ops.pointcloud_to_scancontext(
            jnp.asarray(pts), jnp.ones(len(pts), dtype=jnp.float32),
            num_ring=self.shape[0], num_sector=self.shape[1],
            max_length=self.max_length)
        return np.asarray(sc).flatten()


def _pad_cloud(points: np.ndarray, capacity: int):
    n = min(len(points), capacity)
    out = np.zeros((capacity, 3), dtype=np.float32)
    out[:n] = points[:n]
    mask = np.zeros(capacity, dtype=np.float32)
    mask[:n] = 1.0
    return out, mask


class LidarHandler:
    """Host-side driver: feed (pointcloud, odom) pairs; emits keyframes
    and verified loop closures over the bus."""

    def __init__(self, params: Dict, bus, clock, capacity: int = 8192):
        self.params = params
        self.bus = bus
        self.clock = clock
        self.capacity = capacity
        self.robot_id = params["robot_id"]
        self.nb_local_keyframes = 0
        self.previous_keyframe_pose: Optional[Tuple[np.ndarray,
                                                    np.ndarray]] = None
        self.local_keyframes: Dict[int, np.ndarray] = {}
        self.received_data: List[Tuple[np.ndarray, Tuple]] = []

        self.keyframe_publisher = bus.create_publisher("cslam/keyframe_data")
        self.odom_publisher = bus.create_publisher("cslam/keyframe_odom")
        self.intra_lc_publisher = bus.create_publisher(
            "cslam/intra_robot_loop_closure")
        self.inter_lc_publisher = bus.create_publisher(
            "/cslam/inter_robot_loop_closure")
        self.pointcloud_publisher = bus.create_publisher(
            "/cslam/local_descriptors")
        bus.subscribe("cslam/local_descriptors_request",
                      self.publish_local_descriptors)
        bus.subscribe("/cslam/local_descriptors",
                      self.receive_local_descriptors)
        bus.subscribe("cslam/local_keyframe_match",
                      self.receive_local_keyframe_match)

        self.kf_threshold = params.get("frontend.kf_distance_threshold",
                                       params.get(
                                           "frontend.keyframe_generation_ratio_threshold",
                                           1.0))
        self.voxel_size = params.get("frontend.voxel_size", 0.5)
        # ICP iteration cap per GNC level. The GNC continuation only
        # needs the weighted optimum TRACKED per mu level, not fully
        # converged (the anneal refines it next level); candidate pairs
        # that oscillate (non-revisits) otherwise burn the full budget
        # on every level — measured 4x of the lidar mission's
        # verification wall time.
        self.icp_iters_per_level = params.get(
            "frontend.icp_max_iters_per_level", 5)
        # Separate cap for the FINAL step-gated refinement at the
        # hardest mu (converged solves exit early regardless).
        self.icp_max_iters = params.get("frontend.icp_max_iters", 12)

    # ------------------------------------------------------------------
    def add_sensor_data(self, points: np.ndarray,
                        pose: Tuple[np.ndarray, np.ndarray]):
        """One synced (pointcloud, odometry) sample; buffered for the
        processing tick (reference sync callback :33-43)."""
        self.received_data.append((np.asarray(points, dtype=np.float32),
                                   (np.asarray(pose[0], dtype=np.float32),
                                    np.asarray(pose[1], dtype=np.float32))))

    def generate_new_keyframe(self, pose) -> bool:
        """Keyframe when odometry moved far enough (reference :144-166)."""
        if self.previous_keyframe_pose is None:
            return True
        dt = pose[1] - self.previous_keyframe_pose[1]
        return float(np.dot(dt, dt)) > self.kf_threshold ** 2

    def process_new_sensor_data(self):
        """Processing tick (reference timer :168-203)."""
        if not self.received_data:
            return None
        points, pose = self.received_data.pop(0)
        if not self.generate_new_keyframe(pose):
            return None
        padded, mask = _pad_cloud(points, self.capacity)
        ds_points, ds_mask = registration.voxel_downsample(
            jnp.asarray(padded), jnp.asarray(mask), self.voxel_size)
        keep = np.asarray(ds_mask) > 0
        cloud = np.asarray(ds_points)[keep]
        kf_id = self.nb_local_keyframes
        self.local_keyframes[kf_id] = cloud
        self.previous_keyframe_pose = pose
        self.nb_local_keyframes += 1
        self.keyframe_publisher.publish(KeyframePointCloud(kf_id, cloud))
        self.odom_publisher.publish(msgs.KeyframeOdom(id=kf_id, pose=pose))
        return kf_id

    # ------------------------------------------------------------------
    def publish_local_descriptors(self, request):
        """Answer a LocalDescriptorsRequest with the keyframe cloud
        (reference :91-105)."""
        kf_id = request.keyframe_id
        if kf_id not in self.local_keyframes:
            return
        self.pointcloud_publisher.publish(
            msgs.LocalPointCloudDescriptors(
                robot_id=self.robot_id, keyframe_id=kf_id,
                matches_robot_id=list(request.matches_robot_id),
                matches_keyframe_id=list(request.matches_keyframe_id),
                points=self.local_keyframes[kf_id]))

    def _register(self, src_cloud: np.ndarray, dst_cloud: np.ndarray):
        """Robust registration, TEASER++ replacement (icp_utils.py:99-135):
        GNC-ICP refinement from two independent global seeds — the Scan
        Context yaw estimate and FPFH mutual-correspondence RANSAC — with
        the better-fitting hypothesis (inlier fraction, then RMSE)
        winning. Multi-hypothesis seeding covers both SC's planar-scene
        symmetries and FPFH's sparse-feature failure modes."""
        from cslam_tpu.ops import fpfh as fpfh_ops
        from cslam_tpu.ops.matching2d import ransac_rigid3d

        cap = 1
        target = max(len(src_cloud), len(dst_cloud), 1)
        while cap < target:
            cap *= 2
        src, src_mask = _pad_cloud(src_cloud, cap)
        dst, dst_mask = _pad_cloud(dst_cloud, cap)
        src_j, dst_j = jnp.asarray(src), jnp.asarray(dst)
        sm_j, dm_j = jnp.asarray(src_mask), jnp.asarray(dst_mask)

        seeds = []
        # seed A: Scan Context yaw
        sc_src = sc_ops.pointcloud_to_scancontext(src_j, sm_j)
        sc_dst = sc_ops.pointcloud_to_scancontext(dst_j, dm_j)
        _, yaws = sc_ops.scancontext_distances(sc_dst, sc_src[None])
        yaw = -float(yaws[0]) * (2.0 * np.pi / 60.0)
        seeds.append((registration.yaw_rotation(jnp.float32(yaw)),
                      jnp.zeros(3, dtype=jnp.float32)))
        # seed B: FPFH correspondences + robust 3D alignment
        fa = fpfh_ops.fpfh(src_j, sm_j)
        fb = fpfh_ops.fpfh(dst_j, dm_j)
        idx, valid = fpfh_ops.fpfh_correspondences(fa, sm_j, fb, dm_j)
        coarse = ransac_rigid3d(src_j, dst_j[idx], valid,
                                inlier_threshold=4.0 * self.voxel_size,
                                min_inliers=3)
        seeds.append((coarse.R, coarse.t))

        best = None
        for R0, t0 in seeds:
            result = registration.gnc_icp(
                src_j, sm_j, dst_j, dm_j, R0, t0,
                max_corr_dist=2.0 * self.voxel_size,
                max_iters=self.icp_max_iters,
                iters_per_level=self.icp_iters_per_level)
            if best is None or \
                    (float(result.inlier_frac), -float(result.rmse)) > \
                    (float(best.inlier_frac), -float(best.rmse)):
                best = result
        return best

    def receive_local_descriptors(self, msg: msgs.LocalPointCloudDescriptors):
        """Register the received cloud against each of my matched
        keyframes; publish InterRobotLoopClosures (reference :106-127)."""
        for rid, kid in zip(msg.matches_robot_id, msg.matches_keyframe_id):
            if rid != self.robot_id:
                continue
            if kid not in self.local_keyframes:
                continue
            result = self._register(msg.points, self.local_keyframes[kid])
            # _register(src=sender, dst=mine) estimates T mapping sender
            # points into MY frame: T = X_mine^-1 X_sender. The wire
            # convention is pose = X_robot0^-1 X_robot1 with
            # robot0 < robot1 (same derivation as rgbd_handler
            # receive_local_image_descriptors).
            R = np.asarray(result.R)
            t = np.asarray(result.t)
            if msg.robot_id < self.robot_id:
                # robot0 = sender: need X_sender^-1 X_mine = T^-1
                pose = (R.T, (-R.T @ t).astype(np.float32))
                r0, k0, r1, k1 = msg.robot_id, msg.keyframe_id, rid, kid
            else:
                # robot0 = me: need X_mine^-1 X_sender = T
                pose = (R, t)
                r0, k0, r1, k1 = rid, kid, msg.robot_id, msg.keyframe_id
            self.inter_lc_publisher.publish(
                msgs.InterRobotLoopClosure(
                    robot0_id=r0, robot0_keyframe_id=k0,
                    robot1_id=r1, robot1_keyframe_id=k1,
                    success=bool(result.success),
                    pose=pose,
                    covariance_diag=np.asarray(result.cov_diag,
                                               dtype=np.float32)))

    def receive_local_keyframe_match(self, msg: msgs.LocalKeyframeMatch):
        """Intra-robot match verification (reference :128-142)."""
        k0, k1 = msg.keyframe0_id, msg.keyframe1_id
        if k0 not in self.local_keyframes or k1 not in self.local_keyframes:
            return
        result = self._register(self.local_keyframes[k0],
                                self.local_keyframes[k1])
        # _register(src=k0, dst=k1) estimates T = X_1^-1 X_0; the
        # between measurement is X_0^-1 X_1 = T^-1 (matches
        # rgbd_handler.receive_local_keyframe_match)
        R = np.asarray(result.R)
        t = np.asarray(result.t)
        self.intra_lc_publisher.publish(
            msgs.IntraRobotLoopClosure(
                keyframe0_id=k0, keyframe1_id=k1,
                success=bool(result.success),
                pose=(R.T, (-R.T @ t).astype(np.float32)),
                covariance_diag=np.asarray(result.cov_diag,
                                           dtype=np.float32)))
