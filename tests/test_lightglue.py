"""LightGlue matcher: interface contract, masking, determinism.

(Untrained weights can't be tested for matching quality; quality-path
tests live on the classical matcher in test_features.py. Here we verify
the architecture runs, respects masks, and slots into the verification
interface.)"""

import numpy as np
import pytest

from cslam_tpu.models.lightglue import LightGlue


@pytest.fixture(scope="module")
def lg():
    return LightGlue(num_layers=2, dim=64, score_threshold=0.0)


def test_match_interface(lg):
    rng = np.random.default_rng(0)
    K = 16
    d = rng.standard_normal((K, 256)).astype(np.float32)
    xy = rng.uniform(0, 50, (K, 2)).astype(np.float32)
    m = np.ones(K, np.float32)
    idx, valid = lg.match(d, xy, m, d, xy, m)
    assert idx.shape == (K,) and valid.shape == (K,)
    assert idx.dtype == np.int32
    assert set(np.unique(valid)) <= {0.0, 1.0}


def test_masked_keypoints_never_match(lg):
    rng = np.random.default_rng(1)
    K = 16
    d = rng.standard_normal((K, 256)).astype(np.float32)
    xy = rng.uniform(0, 50, (K, 2)).astype(np.float32)
    m0 = np.ones(K, np.float32)
    m0[10:] = 0.0
    m1 = np.ones(K, np.float32)
    m1[8:] = 0.0
    idx, valid = lg.match(d, xy, m0, d, xy, m1)
    # masked query slots are invalid; valid matches point into live slots
    assert np.all(valid[10:] == 0.0)
    assert np.all(idx[valid > 0] < 8)


def test_deterministic(lg):
    rng = np.random.default_rng(2)
    K = 12
    d0 = rng.standard_normal((K, 256)).astype(np.float32)
    d1 = rng.standard_normal((K, 256)).astype(np.float32)
    xy = rng.uniform(0, 50, (K, 2)).astype(np.float32)
    m = np.ones(K, np.float32)
    a = lg.match(d0, xy, m, d1, xy, m)
    b = lg.match(d0, xy, m, d1, xy, m)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
