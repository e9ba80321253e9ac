"""Broker vertex-cover semantics (mirrors the reference's
tests/test_broker.py contract: cover bounds, no duplicates, full edge
coverage, known manual cover)."""

import math

import numpy as np
import pytest

from cslam_tpu.matching.sparse_matching import LoopClosureSparseMatching
from cslam_tpu.sparsification.broker import Broker
from cslam_tpu.utils.edges import EdgeInterRobot

from test_algebraic_connectivity import build_multi_robot_graph


def make_params(robot_id, max_nb_robots):
    return {
        "robot_id": robot_id,
        "max_nb_robots": max_nb_robots,
        "frontend.similarity_threshold": 0.0,
        "frontend.sensor_type": "stereo",
        "frontend.enable_sparsification": True,
        "frontend.nb_best_matches": 10,
        "frontend.intra_loop_min_inbetween_keyframes": 10,
        "evaluation.enable_sparsification_comparison": False,
    }


def build_graph_and_extract_selection(nb_poses, nb_candidate_edges,
                                      max_nb_robots, robot_id,
                                      nb_candidates_to_choose, rng):
    fixed, cand = build_multi_robot_graph(nb_poses, nb_candidate_edges,
                                          max_nb_robots, rng)
    lcsm = LoopClosureSparseMatching(make_params(robot_id, max_nb_robots))
    lcsm.candidate_selector.set_graph(fixed, cand)
    considered = {i: True for i in range(max_nb_robots)}
    return lcsm.select_candidates(nb_candidates_to_choose, considered,
                                  greedy_initialization=False)


def verif_broker(nb_poses, nb_candidate_edges, max_nb_robots, robot_id,
                 nb_candidates_to_choose, use_vertex_cover, rng):
    selection = build_graph_and_extract_selection(nb_poses,
                                                  nb_candidate_edges,
                                                  max_nb_robots, robot_id,
                                                  nb_candidates_to_choose, rng)
    assert len(selection) == min(nb_candidate_edges, nb_candidates_to_choose)

    broker = Broker(selection, list(range(max_nb_robots)))
    components = broker.brokerage(use_vertex_cover)

    initial_vertices = set()
    duplicates = []
    for e in selection:
        for v in [(e.robot0_id, e.robot0_keyframe_id),
                  (e.robot1_id, e.robot1_keyframe_id)]:
            if v in initial_vertices:
                duplicates.append(v)
            initial_vertices.add(v)
    assert len(initial_vertices) + len(duplicates) == len(selection) * 2

    vertices = [v for c in components for v in c]

    # Upper bound: never worse than one vertex per edge
    assert len(vertices) <= len(selection)
    if use_vertex_cover and max_nb_robots == 2:
        # Konig cover is at most half the vertices (exact minimum)
        assert len(vertices) <= math.ceil(len(initial_vertices) / 2)
    assert len(vertices) >= 1
    # No duplicates
    assert len(vertices) == len(set(vertices))
    # Every edge covered
    for e in selection:
        v0 = (e.robot0_id, e.robot0_keyframe_id)
        v1 = (e.robot1_id, e.robot1_keyframe_id)
        assert v0 in vertices or v1 in vertices


@pytest.mark.parametrize("use_vertex_cover", [True, False])
@pytest.mark.parametrize("max_nb_robots,robot_id", [(2, 0), (3, 1), (5, 2)])
def test_broker_random_graphs(max_nb_robots, robot_id, use_vertex_cover):
    rng = np.random.default_rng(17)
    verif_broker(30, 20, max_nb_robots, robot_id, 10, use_vertex_cover, rng)
    verif_broker(30, 20, max_nb_robots, robot_id, 20, use_vertex_cover, rng)
    verif_broker(30, 20, max_nb_robots, robot_id, 40, use_vertex_cover, rng)


def test_manual_vertex_cover():
    """Star around (0,1) plus one extra edge: cover = {(0,1)} and one
    endpoint of the extra edge — 2 components, 2 vertices total
    (reference test_manual_vertex_cover)."""
    candidate_edges = [
        EdgeInterRobot(0, 1, 1, 1, 1.0),
        EdgeInterRobot(0, 1, 1, 2, 1.0),
        EdgeInterRobot(0, 1, 1, 3, 1.0),
        EdgeInterRobot(0, 1, 1, 4, 1.0),
        EdgeInterRobot(0, 2, 1, 5, 1.0),
    ]
    lcsm = LoopClosureSparseMatching(make_params(0, 2))
    lcsm.candidate_selector.set_graph([], candidate_edges)
    considered = {0: True, 1: True}
    selection = lcsm.select_candidates(5, considered,
                                       greedy_initialization=False)
    assert len(selection) == 5

    broker = Broker(selection, range(2))
    components = broker.brokerage(True)
    nb_vertices = sum(len(c) for c in components)
    assert len(components) == 2
    assert nb_vertices == 2


def test_single_robot_graph_no_brokerage():
    edges = [EdgeInterRobot(0, 1, 0, 5, 1.0)]
    broker = Broker(edges, [0])
    assert broker.brokerage(True) == []
