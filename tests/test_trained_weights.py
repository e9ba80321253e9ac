"""Quality validation of the shipped self-trained perception weights
(models/weights/*.npz, produced by models/train_superpoint.py and
models/train_lightglue.py).

The reference's learned front-end quality comes from downloaded
SuperPoint/LightGlue checkpoints (rgbd_handler.cpp:263-315); these tests
pin that the shipped self-trained equivalents are *functional* — the
detector localizes real corners, descriptors match across homography
warps, and LightGlue beats raw descriptor matching in the
noise regime where consensus matters — not just well-formed.
"""

import numpy as np
import pytest

from cslam_tpu.models import zoo

SP_CKPT = zoo.shipped_checkpoint("superpoint_synth.npz")
LG_CKPT = zoo.shipped_checkpoint("lightglue_synth.npz")

needs_sp = pytest.mark.skipif(not SP_CKPT,
                              reason="no shipped superpoint weights")
needs_lg = pytest.mark.skipif(not LG_CKPT,
                              reason="no shipped lightglue weights")


@pytest.fixture(scope="module")
def superpoint():
    from cslam_tpu.models.superpoint import SuperPoint
    return SuperPoint(checkpoint=SP_CKPT, max_keypoints=128)


@needs_sp
def test_superpoint_detects_synthetic_corners(superpoint):
    """Corner recall on held-out synthetic shapes: a trained detector
    localizes most GT corners within 4 px; a random-weight one doesn't."""
    from cslam_tpu.models.synthetic_shapes import render_shapes
    rng = np.random.default_rng(777)  # not a training seed
    hits = total = 0
    for _ in range(6):
        img, corners = render_shapes(rng, 120, 160)
        if len(corners) < 4:
            continue
        xy, desc, scores, mask = superpoint.extract_features(img)
        xy = np.asarray(xy)[np.asarray(mask) > 0]
        d = np.linalg.norm(corners[:, None, :] - xy[None, :, :], axis=-1)
        hits += int((d.min(axis=1) <= 4.0).sum())
        total += len(corners)
    assert total > 20
    recall = hits / total
    assert recall >= 0.5, f"corner recall {recall:.2f}"


@needs_sp
def test_superpoint_descriptors_match_across_warp(superpoint):
    """Mutual-NN matching of SuperPoint features across a homography
    pair: most matches must agree with the GT warp."""
    from cslam_tpu.models.synthetic_shapes import (apply_homography,
                                                   make_pair_sample)
    rng = np.random.default_rng(778)
    good = selected = 0
    for _ in range(6):
        s = make_pair_sample(rng, 120, 160)
        xy0, d0, _, m0 = map(np.asarray,
                             superpoint.extract_features(s["img0"]))
        xy1, d1, _, m1 = map(np.asarray,
                             superpoint.extract_features(s["img1"]))
        v0, v1 = m0 > 0, m1 > 0
        if v0.sum() < 8 or v1.sum() < 8:
            continue
        sim = d0[v0] @ d1[v1].T
        b1 = sim.argmax(axis=1)
        b0 = sim.argmax(axis=0)
        mutual = b0[b1] == np.arange(sim.shape[0])
        warped = apply_homography(s["H"], xy0[v0])
        err = np.linalg.norm(warped - xy1[v1][b1], axis=-1)
        inb = (warped[:, 0] >= 0) & (warped[:, 0] < 160) & \
              (warped[:, 1] >= 0) & (warped[:, 1] < 120)
        sel = mutual & inb
        good += int((err[sel] <= 6.0).sum())
        selected += int(sel.sum())
    assert selected >= 30, f"only {selected} mutual matches"
    precision = good / selected
    assert precision >= 0.5, f"warp-consistent precision {precision:.2f}"


@needs_lg
def test_lightglue_beats_raw_matching_under_noise():
    """At descriptor corruption sigma=0.7 (matched-pair cosine ~0.51 —
    heavy corruption), trained LightGlue must beat raw mutual cosine
    matching on F1 by a solid margin.

    Why sigma=0.7 and not higher: at K=96 keypoints / D=256 descriptors
    the raw mutual-NN baseline is remarkably robust — measured F1 stays
    ~0.86 flat through sigma=0.85 and only collapses near 0.95 (random
    cosine noise floor 1/sqrt(256) keeps collisions rare), so "near the
    random floor" is NOT where matching differentiates. The trained
    model's joint-consensus advantage lives in the 0.6-0.75 band
    (measured sweep: lg 0.94-0.98 vs raw ~0.87), which is also the
    operating regime of real verification (weak-but-not-destroyed
    descriptors); above it this compact 3-layer model degrades below
    the baseline and the classical mutual matcher should be preferred.

    Round-4 re-attempt (VERDICT item 8), measured negative: an 800-step
    continuation at noise band 0.55-0.97 left sigma-0.85 F1 at 0.708 vs
    raw 0.837 (shipped: 0.728) and slightly hurt 0.8 (0.854 vs 0.880),
    with 0.6/0.7 unchanged — the band does NOT extend at this model
    capacity; matching where mutual-NN is already flat-robust needs a
    deeper model (and a re-bench of its per-pair device cost)."""
    from cslam_tpu.models.lightglue import LightGlueNet
    from cslam_tpu.models.train_lightglue import eval_matching
    import jax.numpy as jnp
    from flax.traverse_util import unflatten_dict
    with np.load(LG_CKPT, allow_pickle=True) as data:
        flat = {k: jnp.asarray(v) for k, v in data.items()}
    params = unflatten_dict({tuple(k.split("/")): v
                             for k, v in flat.items()})
    model = LightGlueNet(num_layers=zoo.SHIPPED_LIGHTGLUE_LAYERS)

    def f1(d):
        p, r = d["precision"], d["recall"]
        return 2 * p * r / max(p + r, 1e-9)

    ev = eval_matching(model, params, np.random.default_rng(4321),
                       n_pairs=16, K=96, sigma=0.7)
    lg, raw = f1(ev["lightglue"]), f1(ev["raw"])
    assert lg > raw + 0.05, f"lightglue F1 {lg:.3f} vs raw {raw:.3f}"
    assert ev["lightglue"]["precision"] >= 0.85, ev


@needs_lg
@needs_sp
def test_runtime_wrappers_pick_up_shipped_weights():
    """RGBDHandler('learned') with no explicit checkpoints must load the
    shipped weights (not random init) and the shipped LightGlue depth."""
    from cslam_tpu.frontend.rgbd_handler import RGBDHandler
    from cslam_tpu.comm.bus import InProcessBus, InProcessRouter, ManualClock

    router = InProcessRouter()
    bus = InProcessBus(router, robot_id=0)
    h = RGBDHandler({"robot_id": 0, "max_nb_robots": 1,
                     "frontend.features": "learned"}, bus, ManualClock())
    # loaded (not random-init) == params equal the checkpoint contents
    from flax.traverse_util import flatten_dict
    flat = {"/".join(k): np.asarray(v) for k, v in
            flatten_dict(h.superpoint.variables).items()}
    with np.load(SP_CKPT) as data:
        key = sorted(data.files)[0]
        assert np.allclose(flat[key], data[key])
    n_layers = len({k.split("/")[1].split("_")[1]
                    for k in flatten_dict(
                        h.lightglue.variables, sep="/").keys()
                    if k.split("/")[1].startswith("transformers_")})
    assert n_layers == zoo.SHIPPED_LIGHTGLUE_LAYERS


def _render_corner_scene(pose, rng, n=36, seed=0):
    """In-distribution rendered view — one shared implementation in
    cslam_tpu.frontend.sim (the visual mission benchmark uses it too)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_rgbd_handler import INTR
    from cslam_tpu.frontend.sim import render_corner_scene
    return render_corner_scene(pose, INTR, rng, n=n, seed=seed)


@needs_lg
@needs_sp
def test_trained_chain_verifies_offset_revisit():
    """Full learned visual chain (SuperPoint detect -> LightGlue match ->
    RANSAC verify -> backend factor) with the SHIPPED weights on a
    revisit from a displaced viewpoint — the quality bar the random-init
    structural test (test_visual_chain.py) cannot set: descriptors must
    be distinctive enough to match across a real viewpoint change, and
    the verified relative pose must agree with ground truth.

    The scene is corner-rich squares on a gray gradient with blur+noise
    (the trained detector's distribution; test_rgbd_handler's
    random-texture blobs on black yield <10 confident detections)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_visual_chain import PlaceModel, _chain_params
    from test_rgbd_handler import INTR, make_pose
    from cslam_tpu.backend.decentralized_pgo import DecentralizedPGO
    from cslam_tpu.comm.bus import InProcessBus, InProcessRouter, ManualClock
    from cslam_tpu.frontend.global_descriptor_component import \
        GlobalDescriptorComponent
    from cslam_tpu.frontend.loop_closure_detection import \
        GlobalDescriptorLoopClosureDetection
    from cslam_tpu.frontend.rgbd_handler import RGBDHandler

    render_scene = _render_corner_scene

    router = InProcessRouter()
    clock = ManualClock()
    bus = InProcessBus(router, 0)
    params = _chain_params(**{
        "frontend.features": "learned",   # shipped ckpts auto-load
        "frontend.lightglue_score_threshold": 0.1,
        "frontend.pnp_min_inliers": 6,
    })
    model = PlaceModel()
    handler = RGBDHandler(params, bus, clock, max_keypoints=128)
    gdc = GlobalDescriptorComponent(params, bus, model=model, batch_size=1)
    GlobalDescriptorLoopClosureDetection(params, bus, clock,
                                         descriptor_model=model)
    backend = DecentralizedPGO(params, bus, clock)

    rng = np.random.default_rng(2)
    # revisit is DISPLACED: ~0.15 m translation + 2deg yaw from keyframe 0
    poses = [make_pose(0.0), make_pose(0.9, 0.25, 0.12),
             make_pose(1.8, 0.0, 0.22), make_pose(0.9, -0.25, 0.12),
             make_pose(0.12, 0.06, 0.035)]
    for pose in poses:
        img, depth = render_scene(pose, rng)
        handler.add_sensor_data(img, depth, INTR, pose)
        handler.process_new_sensor_data()
        gdc.tick()
        router.spin_until_idle()

    loops = [f for f in backend.local_factors if f.is_loop]
    assert loops, "trained chain verified no loop closure on the revisit"
    lc = loops[0]
    k0, k1 = lc.key_from[1], lc.key_to[1]
    R_rel = poses[k0][0].T @ poses[k1][0]
    t_rel = poses[k0][0].T @ (poses[k1][1] - poses[k0][1])
    np.testing.assert_allclose(lc.R, R_rel, atol=0.05)
    np.testing.assert_allclose(lc.t, t_rel, atol=0.15)


@needs_lg
@needs_sp
def test_trained_inter_robot_verification():
    """Cross-robot geometric verification with the shipped weights: the
    broker-initiated LocalDescriptorsRequest flow ships robot 0's learned
    keyframe features over the bus and robot 1 verifies them against its
    own keyframe from a displaced viewpoint (reference
    rgbd_handler.cpp:657-726 receive_local_image_descriptors)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_rgbd_handler import INTR, make_pose
    from cslam_tpu.comm import messages as msgs
    from cslam_tpu.comm.bus import InProcessBus, InProcessRouter, ManualClock
    from cslam_tpu.frontend.rgbd_handler import RGBDHandler

    router = InProcessRouter()
    results = []
    router.subscribe("/cslam/inter_robot_loop_closure", results.append)
    handlers = {}
    for rid in (0, 1):
        bus = InProcessBus(router, rid)
        handlers[rid] = (RGBDHandler({
            "robot_id": rid, "max_nb_robots": 2,
            "frontend.features": "learned",
            "frontend.lightglue_score_threshold": 0.1,
            "frontend.max_queue_size": 5,
            "frontend.keyframe_generation_ratio_threshold": 1.0,
            "frontend.pnp_min_inliers": 6,
        }, bus, ManualClock(), max_keypoints=128), bus)

    rng = np.random.default_rng(5)
    pose0 = make_pose(0.0)
    pose1 = make_pose(0.4, -0.12, -0.05)
    img0, depth0 = _render_corner_scene(pose0, rng)
    img1, depth1 = _render_corner_scene(pose1, rng)
    handlers[0][0].add_sensor_data(img0, depth0, INTR, pose0)
    handlers[0][0].process_new_sensor_data()
    handlers[1][0].add_sensor_data(img1, depth1, INTR, pose1)
    handlers[1][0].process_new_sensor_data()

    handlers[0][1].publish("cslam/local_descriptors_request",
                           msgs.LocalDescriptorsRequest(
                               keyframe_id=0, matches_robot_id=[1],
                               matches_keyframe_id=[0]))
    router.spin_until_idle()

    assert len(results) == 1 and results[0].success
    lc = results[0]
    R_rel = pose0[0].T @ pose1[0]
    t_rel = pose0[0].T @ (pose1[1] - pose0[1])
    np.testing.assert_allclose(lc.pose[0], R_rel, atol=0.05)
    np.testing.assert_allclose(lc.pose[1], t_rel, atol=0.15)


@needs_sp
def test_detector_domain_breadth_gates():
    """Round-4 widened domain gates on the SHIPPED detector: black /
    texture / real-photo backgrounds, texture-blob scenes, and real
    photographs must all yield usable detection counts.

    Measured history: round 4's mixed-background continuations (with
    SYNTHETIC labels) were all net negative — photo backgrounds carry
    real unlabeled corners whose dustbin labels teach suppression.
    Round 5's TWO-ROUND homographic adaptation (pseudo-labels from the
    detector's own warp-aggregated responses on real photographs +
    ignore-cells on intermediate responses,
    models/homographic_adaptation.py) broke the wall: black 15/24 ->
    47/65 min/median, texture 24/34 -> 45/79, photo 26/63 -> 59/95,
    blob scenes 20 -> 70 minimum, real frames still saturating the
    128-keypoint budget, real-image warp precision up ~25% relative —
    measured against the round-4 shipped weights on identical probes.
    This test pins the widened breadth of the round-5 checkpoint."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_rgbd_handler import render_scene, make_pose
    from cslam_tpu.models.superpoint import SuperPoint
    from cslam_tpu.models.synthetic_shapes import render_shapes
    from cslam_tpu.utils.image_sequence import open_sequence

    sp = SuperPoint(checkpoint=zoo.shipped_checkpoint(
        "superpoint_synth.npz"), max_keypoints=128)

    for bg in ("black", "texture", "photo"):
        counts = []
        for seed in range(8):
            rng = np.random.default_rng(seed)
            img, _ = render_shapes(rng, 120, 160, background=bg,
                                   n_primitives=4)
            _, _, _, mask = sp.extract_features(img)
            counts.append(int(np.asarray(mask).sum()))
        counts.sort()
        assert counts[0] >= 30, (bg, counts)
        assert counts[len(counts) // 2] >= 40, (bg, counts)

    # texture blobs on black (test_rgbd_handler's rendered scenes — the
    # probe the stale known-limit cited)
    rng = np.random.default_rng(0)
    blob_counts = []
    for k in range(6):
        img, _depth = render_scene(make_pose(0.3 * k), rng)
        gray = np.asarray(img, np.float32)
        if gray.ndim == 3:
            gray = gray.mean(-1)
        if gray.max() > 1.5:
            gray = gray / 255.0
        _, _, _, mask = sp.extract_features(gray.astype(np.float32))
        blob_counts.append(int(np.asarray(mask).sum()))
    assert min(blob_counts) >= 40, blob_counts

    # real photographs saturate the keypoint budget
    seq = open_sequence(os.path.join(os.path.dirname(__file__), "data",
                                     "real_seq"))
    for i in (0, 5, 9, 14):
        gray = np.asarray(seq.frame(i), np.float32).mean(-1) / 255.0
        _, _, _, mask = sp.extract_features(gray)
        assert int(np.asarray(mask).sum()) >= 100
