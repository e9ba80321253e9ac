"""Loop-closure sparse matching: descriptor databases + budgeted selection.

Capability parity with the reference `LoopClosureSparseMatching`
(/root/reference/cslam/loop_closure_sparse_matching.py): per-robot
descriptor databases, local/cross-robot best-match search producing
candidate EdgeInterRobot matches, and MAC-budgeted candidate selection.
The node handle is optional (pure-algorithm tests construct it without
one — tests/test_sparse_matching.py:31 in the reference does the same,
which the reference's current signature broke; fixed here per SURVEY §7).
"""

from typing import Dict, Optional

import numpy as np

from cslam_tpu.matching.descriptor_db import DescriptorDatabase
from cslam_tpu.sparsification.acm import AlgebraicConnectivityMaximization
from cslam_tpu.utils.edges import EdgeInterRobot


class LoopClosureSparseMatching:
    """Matches global descriptors into loop-closure candidates, then
    selects candidates under the communication budget."""

    def __init__(self, params: Dict, node=None):
        self.params = params
        self.node = node
        if self.params.get("frontend.sensor_type") == "lidar":
            from cslam_tpu.matching.scancontext_matching import \
                ScanContextMatching
            make_db = ScanContextMatching
        else:
            method = self.params.get("frontend.nns_method", "auto")
            storage = self.params.get("frontend.nns_storage", "float32")
            def make_db(method=method, storage=storage):
                return DescriptorDatabase(method=method, storage=storage)
        self.local_nnsm = make_db()
        self.other_robots_nnsm = {
            i: make_db()
            for i in range(self.params["max_nb_robots"])
            if i != self.params["robot_id"]
        }
        self.candidate_selector = AlgebraicConnectivityMaximization(
            self.params["robot_id"], self.params["max_nb_robots"],
            extra_params=self.params)

    # Parity alias: reference databases expose `.data` as the raw matrix.
    def add_local_global_descriptor(self, embedding, keyframe_id):
        """Store a local keyframe descriptor and match it against every
        other robot's database (reference :37-56)."""
        matches = []
        embedding = np.asarray(embedding, dtype=np.float32)
        self.local_nnsm.add_item(embedding, keyframe_id)
        for i in range(self.params["max_nb_robots"]):
            if i == self.params["robot_id"]:
                continue
            kf, similarity = self.other_robots_nnsm[i].search_best(embedding)
            if kf is not None and \
                    similarity >= self.params["frontend.similarity_threshold"]:
                match = EdgeInterRobot(self.params["robot_id"], keyframe_id,
                                       i, kf, float(similarity))
                self.candidate_selector.add_match(match)
                matches.append(match)
        return matches

    def add_other_robot_global_descriptor(self, msg):
        """Store another robot's descriptor and match it against the local
        database (reference :58-76). `msg` needs .robot_id, .keyframe_id,
        .descriptor."""
        embedding = np.asarray(msg.descriptor, dtype=np.float32)
        self.other_robots_nnsm[msg.robot_id].add_item(embedding,
                                                      msg.keyframe_id)
        match = None
        kf, similarity = self.local_nnsm.search_best(embedding)
        if kf is not None and \
                similarity >= self.params["frontend.similarity_threshold"]:
            match = EdgeInterRobot(self.params["robot_id"], kf, msg.robot_id,
                                   msg.keyframe_id, float(similarity))
            self.candidate_selector.add_match(match)
        return match

    def match_local_loop_closures(self, descriptor, kf_id):
        """Best intra-robot match at least `intra_loop_min_inbetween_keyframes`
        away and above the similarity threshold (reference :78-97)."""
        kfs, similarities = self.local_nnsm.search(
            np.asarray(descriptor, dtype=np.float32),
            k=self.params["frontend.nb_best_matches"])
        if len(kfs) > 0 and kfs[0] == kf_id:
            kfs, similarities = kfs[1:], similarities[1:]
        if len(kfs) == 0:
            return None, similarities
        for kf, similarity in zip(kfs, similarities):
            if abs(kf - kf_id) < \
                    self.params["frontend.intra_loop_min_inbetween_keyframes"]:
                continue
            if similarity < self.params["frontend.similarity_threshold"]:
                continue
            return kf, similarities
        return None, similarities

    def select_candidates(self,
                          number_of_candidates: int,
                          is_neighbor_in_range: Dict[int, bool],
                          greedy_initialization: bool = True):
        """Budget-respecting inter-robot loop-closure selection."""
        return self.candidate_selector.select_candidates(
            int(number_of_candidates), dict(is_neighbor_in_range),
            greedy_initialization)
