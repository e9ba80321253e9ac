"""int8-quantized descriptor gossip: wire format + detection parity.

The reference gossips float32 descriptors and accounts 4 B/float of comm
volume (global_descriptor_loop_closure_detection.py:210-214). Our wire
format optionally ships per-descriptor affine uint8 (config
frontend.gossip_descriptor_quantization: "int8") — 4x less DCN traffic.
These tests pin the encoding's error bound, its on-wire size, sentinel
coexistence with the float layout, and that detection results are
unchanged when the gossip path quantizes.
"""

import numpy as np
import pytest

from cslam_tpu.comm import messages as msgs
from cslam_tpu.comm.bus import InProcessBus, InProcessRouter, ManualClock
from cslam_tpu.frontend.loop_closure_detection import (
    GlobalDescriptorLoopClosureDetection)


def _unit(rng, d=512):
    v = rng.standard_normal(d).astype(np.float32)
    return v / np.linalg.norm(v)


def test_quantized_roundtrip_error_and_size():
    rng = np.random.default_rng(0)
    descs = [msgs.GlobalDescriptor(i, 1, _unit(rng)) for i in range(8)]
    float_wire = msgs.GlobalDescriptors(descriptors=descs).to_bytes()
    q_wire = msgs.GlobalDescriptors(descriptors=descs,
                                    quantization="int8").to_bytes()
    # 1 B/element + 16 B header per descriptor vs 4 B/element
    assert len(q_wire) < 0.30 * len(float_wire)

    out = msgs.GlobalDescriptors.from_bytes(q_wire)
    assert out.quantization == "int8"
    assert len(out.descriptors) == 8
    for orig, dec in zip(descs, out.descriptors):
        assert dec.keyframe_id == orig.keyframe_id
        assert dec.robot_id == orig.robot_id
        x = orig.descriptor
        step = float(x.max() - x.min()) / 255.0
        np.testing.assert_allclose(dec.descriptor, x, atol=step / 2 + 1e-7)
        # cosine similarity barely moves (threshold gates sit at ~0.75-0.9)
        cos = float(x @ dec.descriptor /
                    (np.linalg.norm(x) * np.linalg.norm(dec.descriptor)))
        assert cos > 0.9999

    # the float layout is untouched and both decode from one stream
    out_f = msgs.GlobalDescriptors.from_bytes(float_wire)
    assert out_f.quantization == "none"
    np.testing.assert_array_equal(out_f.descriptors[3].descriptor,
                                  descs[3].descriptor)


def test_quantized_edge_cases():
    # constant descriptor: scale 0 must round-trip exactly
    const = msgs.GlobalDescriptor(0, 1, np.full(16, 0.25, np.float32))
    out = msgs.GlobalDescriptors.from_bytes(
        msgs.GlobalDescriptors([const], quantization="int8").to_bytes())
    np.testing.assert_allclose(out.descriptors[0].descriptor, 0.25,
                               atol=1e-7)
    # mixed dims cannot share a quantized block: falls back to floats
    rng = np.random.default_rng(1)
    mixed = [msgs.GlobalDescriptor(0, 1, _unit(rng, 8)),
             msgs.GlobalDescriptor(1, 1, _unit(rng, 16))]
    out = msgs.GlobalDescriptors.from_bytes(
        msgs.GlobalDescriptors(mixed, quantization="int8").to_bytes())
    assert out.quantization == "none"
    assert out.descriptors[1].descriptor.size == 16
    # empty list stays on the float path
    assert msgs.GlobalDescriptors.from_bytes(
        msgs.GlobalDescriptors([], quantization="int8")
        .to_bytes()).descriptors == []


def _params(robot_id, quant):
    return {
        "robot_id": robot_id,
        "max_nb_robots": 2,
        "frontend.similarity_threshold": 0.8,
        "frontend.global_descriptor_technique": "cosplace",
        "frontend.nn_checkpoint": "disable",
        "frontend.nb_best_matches": 5,
        "frontend.intra_loop_min_inbetween_keyframes": 2,
        "frontend.enable_intra_robot_loop_closures": False,
        "frontend.detection_publication_max_elems_per_msg": 10,
        "frontend.gossip_descriptor_quantization": quant,
        "frontend.enable_sparsification": True,
        "frontend.inter_robot_loop_closure_budget": 5,
        "frontend.use_vertex_cover_selection": True,
        "neighbor_management.enable_neighbor_monitoring": False,
        "neighbor_management.init_delay_sec": 0.0,
        "neighbor_management.max_heartbeat_delay_sec": 5.0,
    }


@pytest.mark.parametrize("quant", ["none", "int8"])
def test_detection_parity_through_serialized_gossip(quant):
    """Robot 1 gossips its descriptors (optionally quantized), the wire
    bytes are decoded as the TCP bus would, and robot 0's detection
    finds the same cross-robot match with (near-)identical weight."""
    rng = np.random.default_rng(7)
    place = _unit(rng)
    views = {  # robot->keyframe->descriptor; kf 2 of each sees `place`
        0: {0: _unit(rng), 1: _unit(rng), 2: place},
        1: {0: _unit(rng), 1: _unit(rng),
            2: (place + 0.05 * _unit(rng)) /
               np.linalg.norm(place + 0.05 * _unit(rng))},
    }

    router = InProcessRouter()
    clock = ManualClock()
    det0 = GlobalDescriptorLoopClosureDetection(
        _params(0, quant), InProcessBus(router, 0), clock)
    det1 = GlobalDescriptorLoopClosureDetection(
        _params(1, quant), InProcessBus(router, 1), clock)
    for kf, d in views[0].items():
        det0.add_global_descriptor_to_map(d, kf)
    for kf, d in views[1].items():
        det1.add_global_descriptor_to_map(d, kf)

    sent = []
    det1.global_descriptor_publisher.publish = sent.append
    det1.global_descriptors_timer_callback()
    assert len(sent) == 1
    wire = sent[0].to_bytes()
    if quant == "int8":
        assert len(wire) < 0.3 * (3 * 512 * 4)
        assert det1.log_detection_cumulative_communication == 3 * (512 + 16)
    else:
        assert det1.log_detection_cumulative_communication == 3 * 512 * 4

    det0.global_descriptor_callback(msgs.GlobalDescriptors.from_bytes(wire))
    matches = list(det0.inter_robot_matches_buffer.values())
    assert len(matches) == 1
    m = matches[0]
    assert {(m.robot0_id, m.robot0_keyframe_id),
            (m.robot1_id, m.robot1_keyframe_id)} == {(0, 2), (1, 2)}
    true_w = float(views[0][2] @ views[1][2])
    assert m.weight == pytest.approx(true_w, abs=2e-3)
