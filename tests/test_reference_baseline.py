"""Head-to-head harness sanity: the reference's own modules import and
run under benchmarks/reference_baseline.py's shims, and our MAC's
selection quality matches or beats the reference's on identical inputs.

This pins the measured-baseline machinery (VERDICT round-3 item 1) so
BASELINE_MEASURED.json can always be regenerated."""

import os
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, os.path.join(REPO, "benchmarks"))

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_modules():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference tree not mounted")
    import reference_baseline as rb
    return rb._import_reference()


def test_reference_modules_import(ref_modules):
    ref_nns, ref_mac, ref_mac_utils, ref_sc, ref_broker = ref_modules
    assert hasattr(ref_nns, "NearestNeighborsMatching")
    assert hasattr(ref_mac, "MAC")
    assert hasattr(ref_sc, "distance_sc")
    assert hasattr(ref_broker, "Broker")


def test_mac_quality_parity_identical_inputs(ref_modules):
    """Our MAC's rounded lambda_2 >= the reference's (minus float fuzz)
    on the same small random problem, judged by the REFERENCE's own
    evaluate_objective (cslam/mac/mac.py:99)."""
    _, ref_mac, ref_mac_utils, _, _ = ref_modules
    from cslam_tpu.sparsification.mac import MAC as OurMAC
    from cslam_tpu.utils.edges import Edge as OurEdge

    n_poses, n_cand, k = 60, 30, 6
    rng = np.random.default_rng(7)
    pairs = [(int(rng.integers(n_poses)), int(rng.integers(n_poses)),
              float(rng.random())) for _ in range(n_cand)]
    ref_fixed = [ref_mac_utils.Edge(i, i + 1, 1.0)
                 for i in range(n_poses - 1)]
    ref_cand = [ref_mac_utils.Edge(*p) for p in pairs]
    our_fixed = [OurEdge(i, i + 1, 1.0) for i in range(n_poses - 1)]
    our_cand = [OurEdge(*p) for p in pairs]

    w0 = np.zeros(n_cand)
    w0[np.random.default_rng(0).choice(n_cand, k, replace=False)] = 1.0

    rmac = ref_mac.MAC(ref_fixed, ref_cand, n_poses)
    ref_w, _, _ = rmac.fw_subset(w0.copy(), k, max_iters=20)

    omac = OurMAC(our_fixed, our_cand, n_poses)
    our_w, _, _ = omac.fw_subset(w0.astype(np.float32), k, max_iters=20)
    our_w = np.asarray(our_w, dtype=float)

    assert our_w.sum() == pytest.approx(k)
    lam_ref = rmac.evaluate_objective(ref_w)
    lam_ours = rmac.evaluate_objective(our_w)
    assert lam_ours >= lam_ref - 1e-6


def test_broker_cover_validity_on_identical_edges(ref_modules):
    """Both brokers produce VALID vertex covers of the same edge set;
    ours is never larger on the bipartite (exact Konig) case."""
    import reference_baseline as rb
    _, _, _, _, ref_broker = ref_modules
    from cslam.algebraic_connectivity_maximization import \
        EdgeInterRobot as RefEdge
    from cslam_tpu.sparsification.broker import Broker as OurBroker
    from cslam_tpu.utils.edges import EdgeInterRobot as OurEdge

    raw = rb._broker_edges(40, 2, seed=11)
    robots = [0, 1]
    ref_cover = set().union(*ref_broker.Broker(
        [RefEdge(*e) for e in raw], robots).brokerage(True))
    our_cover = set().union(*(set(c) for c in OurBroker(
        [OurEdge(*e) for e in raw], robots).brokerage(True)))

    for r0, k0, r1, k1, _w in raw:
        assert (r0, k0) in our_cover or (r1, k1) in our_cover
        assert (r0, k0) in ref_cover or (r1, k1) in ref_cover
    assert len(our_cover) <= len(ref_cover)
