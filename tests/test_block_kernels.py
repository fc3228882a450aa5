"""Property tests for the sub-cell block-pruning kernels.

``block_knn_triplets`` must be bit-identical to the full brute top-k
under the global (dist2, id) tie order for ANY point/query geometry —
duplicates, collinear data, tiny blocks, k near n.  These kernels carry
every serving-path kNN result, so they get the widest-input coverage in
the suite (hypothesis), mirroring the reference's CGAL differential
oracle role (``tests/checkCorrectParallel.cpp:316-367``).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from pkd_tree_ray.kdtree import (
    block_knn_triplets,
    block_range_triplets,
    brute_knn_nd,
    kd_block_partition,
    topk_per_qid,
)


def _brute_reference(fc, ids, Qc, k):
    idx, d2 = brute_knn_nd(fc, Qc, k, tie_key=ids)
    k_eff = idx.shape[1]
    m = len(Qc[0])
    q = np.repeat(np.arange(m, dtype=np.int64), k_eff)
    n = ids[idx.ravel()]
    d = d2.ravel()
    rows, _ = topk_per_qid(q, d, n, k)
    return q[rows], n[rows], d[rows]


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=4_000),
    m=st.integers(min_value=1, max_value=60),
    k=st.integers(min_value=1, max_value=120),
    d=st.integers(min_value=2, max_value=4),
    block=st.sampled_from([16, 64, 256]),
    coord_range=st.sampled_from([3, 100, 1_000_000]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_block_knn_matches_brute(n, m, k, d, block, coord_range, seed):
    rng = np.random.RandomState(seed)
    fc = [rng.randint(0, coord_range, n).astype(np.int64) for _ in range(d)]
    Qc = [rng.randint(-coord_range, 2 * coord_range, m).astype(np.int64) for _ in range(d)]
    ids = rng.permutation(n).astype(np.int64)
    order, blo, bhi, bb = kd_block_partition(fc, block)
    q3, n3, d3 = block_knn_triplets(
        [c[order] for c in fc], ids[order], blo, bhi, bb, Qc, k
    )
    eq, en, ed = _brute_reference(fc, ids, Qc, k)
    assert np.array_equal(q3, eq)
    assert np.array_equal(n3, en)
    assert np.array_equal(d3, ed)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=3_000),
    m=st.integers(min_value=1, max_value=40),
    block=st.sampled_from([32, 256]),
    coord_range=st.sampled_from([10, 10_000]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_block_range_matches_direct_filter(n, m, block, coord_range, seed):
    rng = np.random.RandomState(seed)
    fc = [rng.randint(0, coord_range, n).astype(np.int64) for _ in range(2)]
    Qc = [rng.randint(0, coord_range, m).astype(np.int64) for _ in range(2)]
    ids = rng.permutation(n).astype(np.int64)
    bounds = rng.randint(0, 4 * coord_range * coord_range + 1, m).astype(np.int64)
    order, blo, bhi, bb = kd_block_partition(fc, block)
    q3, n3, d3 = block_range_triplets(
        [c[order] for c in fc], ids[order], blo, bhi, bb, Qc, bounds
    )
    P = np.stack(fc, 1)
    Qm = np.stack(Qc, 1)
    d2 = ((Qm[:, None, :] - P[None, :, :]) ** 2).sum(-1)
    eq, ep = np.nonzero(d2 <= bounds[:, None])
    assert set(zip(q3.tolist(), n3.tolist())) == set(
        zip(eq.tolist(), ids[ep].tolist())
    )


def test_partition_covers_every_row_once():
    rng = np.random.RandomState(3)
    for n in (1, 7, 2048, 10_000):
        fc = [rng.randint(0, 50, n).astype(np.int64) for _ in range(2)]
        order, blo, bhi, bb = kd_block_partition(fc, 128)
        assert sorted(order.tolist()) == list(range(n))
        assert blo[0] == 0 and bhi[-1] == n
        assert (blo[1:] == bhi[:-1]).all()


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=3_000),
    m=st.integers(min_value=1, max_value=50),
    k=st.integers(min_value=1, max_value=60),
    block=st.sampled_from([16, 64, 256]),
    coord_range=st.sampled_from([3, 1_000_000]),
    slack=st.sampled_from([0, 1, 1_000_000_000]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_block_knn_with_valid_init_bounds_is_exact(
    n, m, k, block, coord_range, slack, seed
):
    """With init_bounds >= the true per-query kth distance (the
    serving path's provable global bound), block_knn_triplets must
    still return the exact (dist2, id)-ordered top-k — the skipped
    seed blocks and capped phase-B bound may only drop rows that the
    bound-verified merge would discard anyway."""
    rng = np.random.RandomState(seed)
    fc = [rng.randint(0, coord_range, n).astype(np.int64) for _ in range(2)]
    Qc = [rng.randint(-coord_range, 2 * coord_range, m).astype(np.int64) for _ in range(2)]
    ids = rng.permutation(n).astype(np.int64)
    eq, en, ed = _brute_reference(fc, ids, Qc, k)
    # true kth per query (+ slack): a VALID external bound
    kth = np.zeros(m, dtype=np.int64)
    uq, st_, ct = np.unique(eq, return_index=True, return_counts=True)
    kth[uq] = ed[st_ + ct - 1]
    order, blo, bhi, bb = kd_block_partition(fc, block)
    q3, n3, d3 = block_knn_triplets(
        [c[order] for c in fc], ids[order], blo, bhi, bb, Qc, k,
        init_bounds=kth + slack,
    )
    assert np.array_equal(q3, eq)
    assert np.array_equal(n3, en)
    assert np.array_equal(d3, ed)
