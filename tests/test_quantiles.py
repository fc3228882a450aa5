"""Exact distributed quantiles (histogram-refinement quickselect) vs
numpy sorted ground truth.  Reference analog: pivot sampling in
include/cpdd/kd_tree_impl/kd_build_tree.hpp solves the approximate
problem; ours is exact selection without a sort shuffle."""

import numpy as np
import pyarrow as pa
import pytest

from pkd_tree_ray.quantiles import (
    percentile_filter,
    quantiles,
    rank_select,
    rank_select_multi,
)


def _ds(vals: np.ndarray, blocks: int = 7):
    import ray.data as rd

    tables = [
        pa.table({"v": pa.array(chunk, pa.int64())})
        for chunk in np.array_split(vals, blocks)
    ]
    return rd.from_arrow(tables)


@pytest.mark.usefixtures("ray_session")
def test_rank_select_matches_sort():
    rng = np.random.default_rng(42)
    vals = rng.integers(-(10**12), 10**12, size=5000)
    srt = np.sort(vals)
    ranks = [1, 2, 500, 2500, 4999, 5000]
    got = rank_select_multi(_ds(vals), "v", ranks)
    assert got == [int(srt[r - 1]) for r in ranks]


@pytest.mark.usefixtures("ray_session")
def test_rank_select_duplicates_and_narrow_range():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 50, size=3000)  # heavy duplicates, range < buckets
    srt = np.sort(vals)
    for r in (1, 1500, 3000):
        assert rank_select(_ds(vals), "v", r) == int(srt[r - 1])


@pytest.mark.usefixtures("ray_session")
def test_quantiles_table_semantics():
    vals = np.arange(1, 101, dtype=np.int64)
    t = quantiles(_ds(vals), "v", [0.5, 0.9, 1.0])
    # rank = ceil(q * 100) -> elements 50, 90, 100
    assert t.column("value").to_pylist() == [50, 90, 100]
    assert t.column("q_permille").to_pylist() == [500, 900, 1000]


@pytest.mark.usefixtures("ray_session")
def test_percentile_filter_keeps_ties():
    vals = np.array([1, 2, 3, 4, 5, 5, 5, 9, 10, 11], dtype=np.int64)
    out = percentile_filter(_ds(vals, blocks=3), "v", 0.5).to_pandas()
    # rank ceil(0.5*10)=5 -> threshold is 5th smallest = 5; all ties kept
    assert sorted(out["v"].tolist()) == [5, 5, 5, 9, 10, 11]
