"""Pallas fused kNN kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cslam_tpu.ops import knn


def _pallas_interpret(data, n_valid, queries, k, tile_rows,
                      query_groups=1):
    """Run the kernel in interpreter mode (no TPU on CI)."""
    from jax.experimental import pallas as pl
    from cslam_tpu.ops import knn_pallas
    import functools

    N, D = data.shape
    B = queries.shape[0]
    num_tiles = N // tile_rows
    norms = jnp.linalg.norm(data.astype(jnp.float32), axis=1)
    valid = jnp.arange(N) < n_valid
    inv_row = jnp.where(valid, 1.0 / jnp.maximum(norms, 1e-12),
                        0.0).reshape(1, N)
    bias_row = jnp.where(valid, 0.0, knn_pallas.NEG_LARGE).astype(
        jnp.float32).reshape(1, N)
    queries_n = queries / jnp.maximum(
        jnp.linalg.norm(queries, axis=1, keepdims=True), 1e-12)
    queries_n = queries_n.astype(data.dtype)  # native-dtype MXU path
    from jax.experimental.pallas import tpu as pltpu
    kernel = functools.partial(knn_pallas._knn_kernel, tile_rows=tile_rows,
                               k=k, num_tiles=num_tiles,
                               query_groups=query_groups)
    idx, vals = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((tile_rows, D), lambda i: (i, 0)),
            pl.BlockSpec((1, tile_rows), lambda i: (0, i)),
            pl.BlockSpec((1, tile_rows), lambda i: (0, i)),
            pl.BlockSpec((B, D), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((B, k), lambda i: (0, 0)),
            pl.BlockSpec((B, k), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, k), jnp.int32),
            jax.ShapeDtypeStruct((B, k), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, k), jnp.float32),
            pltpu.VMEM((B, k), jnp.int32),
            pltpu.VMEM((B, tile_rows), jnp.float32),
        ],
        interpret=True,
    )(data, inv_row, bias_row, queries_n)
    return idx, vals


@pytest.mark.parametrize("n_valid", [1, 100, 256, 500, 512])
def test_pallas_knn_matches_xla(n_valid):
    rng = np.random.default_rng(0)
    N, D, B, k = 512, 128, 8, 5
    data = rng.standard_normal((N, D)).astype(np.float32)
    queries = rng.standard_normal((B, D)).astype(np.float32)
    ref_idx, ref_sims = knn.cosine_topk(jnp.asarray(data), n_valid,
                                        jnp.asarray(queries), k)
    idx, sims = _pallas_interpret(jnp.asarray(data), n_valid,
                                  jnp.asarray(queries), k, tile_rows=128)
    k_eff = min(k, n_valid)
    np.testing.assert_allclose(np.asarray(sims)[:, :k_eff],
                               np.asarray(ref_sims)[:, :k_eff], atol=1e-5)
    # indices must agree where similarities are distinct
    for b in range(B):
        for j in range(k_eff):
            if j + 1 < k_eff and abs(float(ref_sims[b, j]) -
                                     float(ref_sims[b, j + 1])) < 1e-6:
                continue
            assert int(idx[b, j]) == int(ref_idx[b, j])


def test_pallas_knn_multiple_tiles():
    rng = np.random.default_rng(1)
    N, D, B, k = 1024, 128, 4, 10
    data = rng.standard_normal((N, D)).astype(np.float32)
    queries = data[[3, 77, 500, 1000]] + \
        rng.standard_normal((4, D)).astype(np.float32) * 0.01
    idx, sims = _pallas_interpret(jnp.asarray(data), N, jnp.asarray(queries),
                                  k, tile_rows=256)
    # each query's best match is its own source row
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], [3, 77, 500, 1000])
    assert np.all(np.asarray(sims)[:, 0] > 0.99)


def test_pallas_knn_bf16_matches_xla_bf16():
    """bf16 database tiles feed the kernel's matmul directly (no f32
    up-cast); results must equal the XLA path over the same bf16 data."""
    rng = np.random.default_rng(3)
    N, D, B, k = 512, 128, 8, 5
    data = jnp.asarray(rng.standard_normal((N, D)), dtype=jnp.bfloat16)
    queries = jnp.asarray(rng.standard_normal((B, D)), dtype=jnp.float32)
    ref_idx, ref_sims = knn.cosine_topk(data, N, queries, k)
    idx, sims = _pallas_interpret(data, N, queries, k, tile_rows=128)
    # bf16 matmul accumulation differs slightly between the two lowerings
    np.testing.assert_allclose(np.asarray(sims), np.asarray(ref_sims),
                               atol=5e-3)
    match = np.mean(np.asarray(idx) == np.asarray(ref_idx))
    assert match >= 0.9, match


@pytest.mark.parametrize("n_valid", [900, 2048])
def test_cosine_topk_streamed_matches_dense(n_valid):
    """The scan-over-blocks variant is exact: identical indices/sims to
    the dense materializing path, including n_valid masking across
    block boundaries."""
    rng = np.random.default_rng(5)
    data = jnp.asarray(rng.standard_normal((2048, 64)), dtype=jnp.float32)
    q = jnp.asarray(rng.standard_normal((7, 64)), dtype=jnp.float32)
    i1, s1 = knn.cosine_topk(data, n_valid, q, 10)
    i2, s2 = knn.cosine_topk_streamed(data, n_valid, q, 10, block=256)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_cosine_topk_streamed_bf16_recall():
    """bf16 storage: near-perfect top-10 recall vs the f32 dense path on
    unit-ish random descriptors (the production dtype for the database)."""
    rng = np.random.default_rng(8)
    data = rng.standard_normal((4096, 128)).astype(np.float32)
    q = rng.standard_normal((16, 128)).astype(np.float32)
    i_ref, _ = knn.cosine_topk(jnp.asarray(data), 4096, jnp.asarray(q), 10)
    i_bf, _ = knn.cosine_topk_streamed(
        jnp.asarray(data, dtype=jnp.bfloat16), 4096, jnp.asarray(q), 10,
        block=1024)
    recall = np.mean([
        len(set(np.asarray(i_ref)[b]) & set(np.asarray(i_bf)[b])) / 10.0
        for b in range(16)])
    assert recall >= 0.9, recall


def test_cosine_topk_precomputed_norms():
    """cosine_topk with cached row norms equals the self-normalizing path."""
    rng = np.random.default_rng(2)
    data = jnp.asarray(rng.standard_normal((128, 32)), dtype=jnp.float32)
    q = jnp.asarray(rng.standard_normal((3, 32)), dtype=jnp.float32)
    norms = jnp.linalg.norm(data, axis=-1)
    i1, s1 = knn.cosine_topk(data, 100, q, 4)
    i2, s2 = knn.cosine_topk(data, 100, q, 4, data_norms=norms)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


@pytest.mark.parametrize("query_groups", [2, 4])
def test_pallas_knn_query_groups_exact(query_groups):
    """Query-group-sliced merges (the 1M-row lever) stay EXACT: same
    top-k as XLA for every group width."""
    rng = np.random.default_rng(3)
    N, D, B, k = 1024, 128, 8, 5
    data = rng.standard_normal((N, D)).astype(np.float32)
    queries = rng.standard_normal((B, D)).astype(np.float32)
    ref_idx, ref_sims = knn.cosine_topk(jnp.asarray(data), N,
                                        jnp.asarray(queries), k)
    idx, sims = _pallas_interpret(jnp.asarray(data), N,
                                  jnp.asarray(queries), k, tile_rows=256,
                                  query_groups=query_groups)
    np.testing.assert_allclose(np.asarray(sims), np.asarray(ref_sims),
                               rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(idx), np.asarray(ref_idx))
