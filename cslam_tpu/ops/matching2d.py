"""Descriptor matching + robust pose verification kernels.

The reference's verification stage is LightGlue matching followed by
rtabmap RegistrationVis PnP-RANSAC (rgbd_handler.cpp:317-412, :657-726;
SURVEY §3.5 hot loop 3). TPU-native equivalents:

- `mutual_match`: mutual nearest-neighbor descriptor matching with
  Lowe's ratio test — one (K, K) similarity matmul + row/col argmax
  (the learned-matcher stand-in; a LightGlue-style attention matcher can
  drop in behind the same interface);
- `ransac_rigid3d`: batched-hypothesis RANSAC for the relative pose from
  matched 3D keypoints. RGBD/stereo gives 3D on both sides, so the
  minimal solver is 3-point Kabsch; all H hypotheses are evaluated in
  parallel (one (H, 3, N) einsum pipeline) instead of the reference's
  sequential RANSAC loop. Success gate = inlier count, mirroring
  `pnp_min_inliers` (config) semantics.

Static shapes with masks throughout.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cslam_tpu.ops import registration
from cslam_tpu.ops.registration import weighted_kabsch


@functools.partial(jax.jit, static_argnames=())
def mutual_match(desc0, mask0, desc1, mask1, ratio_threshold=0.9,
                 min_similarity=-1.0):
    """Mutual-NN matches with ratio test.

    Returns (idx1_for_0, valid): for each keypoint in image 0 the matched
    index in image 1, and a (K0,) float mask of surviving matches."""
    sims = jnp.dot(desc0, desc1.T, preferred_element_type=jnp.float32)
    valid_pair = (mask0[:, None] > 0) & (mask1[None, :] > 0)
    sims = jnp.where(valid_pair, sims, -jnp.inf)
    best1 = jnp.argmax(sims, axis=1)
    # ratio test: best vs second-best along rows
    top2, _ = jax.lax.top_k(sims, 2)
    ratio_ok = top2[:, 0] * ratio_threshold >= top2[:, 1]
    # mutual check
    best0 = jnp.argmax(sims, axis=0)
    mutual = best0[best1] == jnp.arange(desc0.shape[0])
    score_ok = top2[:, 0] >= min_similarity
    valid = mutual & ratio_ok & score_ok & (mask0 > 0) & \
        jnp.isfinite(top2[:, 0])
    return best1.astype(jnp.int32), valid.astype(jnp.float32)


class RansacResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray       # (N,) float mask
    num_inliers: jnp.ndarray   # scalar
    success: jnp.ndarray       # bool
    cov_diag: jnp.ndarray      # (6,) [omega, v] estimate covariance diag


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def ransac_rigid3d(pts0, pts1, valid, inlier_threshold=0.3,
                   min_inliers=6, num_hypotheses=256, seed=0):
    """Robust relative pose from matched 3D points, batched hypotheses.

    Args:
      pts0, pts1: (N, 3) matched camera-frame points (pts1 ~ R pts0 + t).
      valid: (N,) float mask of usable correspondences.
      inlier_threshold: max residual (meters).
      min_inliers: success gate (reference frontend.pnp_min_inliers).
      num_hypotheses: static hypothesis count — all evaluated in one
        batch (grid work for the MXU, no sequential loop).

    Returns RansacResult with the pose refined on the winning inliers.
    """
    N = pts0.shape[0]
    key = jax.random.PRNGKey(seed)
    # sample 3 distinct-ish correspondences per hypothesis, biased to
    # valid entries by weighting probabilities
    probs = valid / jnp.maximum(jnp.sum(valid), 1.0)
    samples = jax.random.choice(key, N, shape=(num_hypotheses, 3),
                                replace=True, p=probs)

    def solve_one(sample):
        src = pts0[sample]
        dst = pts1[sample]
        w = jnp.ones(3)
        return weighted_kabsch(src, dst, w)

    Rs, ts = jax.vmap(solve_one)(samples)  # (H, 3, 3), (H, 3)
    # evaluate all hypotheses: residuals (H, N)
    moved = jnp.einsum("hij,nj->hni", Rs, pts0) + ts[:, None, :]
    res = jnp.linalg.norm(moved - pts1[None], axis=-1)
    inliers = (res < inlier_threshold) & (valid[None] > 0)
    counts = jnp.sum(inliers, axis=1)
    best = jnp.argmax(counts)
    best_inliers = inliers[best].astype(jnp.float32)
    # refine on the winning inlier set
    R_ref, t_ref = weighted_kabsch(pts0, pts1, best_inliers)
    moved = pts0 @ R_ref.T + t_ref
    res = jnp.linalg.norm(moved - pts1, axis=-1)
    final_inliers = ((res < inlier_threshold) &
                     (valid > 0)).astype(jnp.float32)
    num = jnp.sum(final_inliers)
    sigma_sq = jnp.sum(final_inliers * res * res) / jnp.maximum(num, 1.0)
    cov_diag = registration.se3_estimate_covariance(
        moved, final_inliers, sigma_sq)
    return RansacResult(R=R_ref, t=t_ref, inliers=final_inliers,
                        num_inliers=num, success=num >= min_inliers,
                        cov_diag=cov_diag)


def verify_keyframe_pair(desc0, pts0, mask0, desc1, pts1, mask1,
                         ratio_threshold=0.9, inlier_threshold=0.3,
                         min_inliers=6, seed=0):
    """Full verification: match descriptors, then robust 3D alignment.

    Returns (RansacResult, match_count). Convention: the returned pose
    maps frame-0 points into frame 1, i.e. the relative pose
    T_1<-0; the between-factor measurement X_0^-1 X_1 is its inverse.
    """
    idx1, match_valid = mutual_match(desc0, mask0, desc1, mask1,
                                     ratio_threshold)
    matched_pts1 = pts1[idx1]
    result = ransac_rigid3d(pts0, matched_pts1, match_valid,
                            inlier_threshold=inlier_threshold,
                            min_inliers=min_inliers, seed=seed)
    return result, jnp.sum(match_valid)


@functools.partial(jax.jit, static_argnames=(
    "ratio_threshold", "inlier_threshold", "min_inliers",
    "num_hypotheses"))
def verify_keyframe_pairs(desc0, pts0, mask0, desc1, pts1, mask1,
                          ratio_threshold=0.9, inlier_threshold=0.3,
                          min_inliers=6, num_hypotheses=256, seed=0):
    """Batched verification: B keyframes of MINE vs ONE received frame
    in a single program.

    A detection round delivers one LocalImageDescriptors message whose
    match list targets several of my keyframes (reference hot loop
    rgbd_handler.cpp:687-697 verifies them one by one); at ~2 ms of
    device time per pair the per-pair dispatch dominates mission-scale
    verification. Batching rides vmap: the (K, K) match matmuls and the
    (H, 3, N) hypothesis pipelines stack into MXU-friendly
    (B, ...) einsums, paying one dispatch for the whole budget.

    Args:
      desc0/pts0/mask0: (B, K, D), (B, K, 3), (B, K) — my keyframes.
      desc1/pts1/mask1: (K, D), (K, 3), (K,) — the received frame.

    Returns (RansacResult with leading (B,) axes, (B,) match counts).
    """
    B = desc0.shape[0]
    seeds = jnp.int32(seed) + 9973 * jnp.arange(B, dtype=jnp.int32)

    def one(d0, p0, m0, s):
        idx1, valid = mutual_match(d0, m0, desc1, mask1, ratio_threshold)
        res = ransac_rigid3d(p0, pts1[idx1], valid,
                             inlier_threshold=inlier_threshold,
                             min_inliers=min_inliers,
                             num_hypotheses=num_hypotheses, seed=s)
        return res, jnp.sum(valid)

    return jax.vmap(one)(desc0, pts0, mask0, seeds)
