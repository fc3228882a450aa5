"""Float-native (coord = double) path — the reference harness default
(``tests/testFramework.h:18-19``; epsilon comparator
``include/cpdd/comparator.h:10-79``).  Raw float64 coordinates are
indexed without quantization; distances are exact IEEE doubles."""

import numpy as np
import pyarrow as pa
import pytest

from pkd_tree_ray.config import EngineConfig
from pkd_tree_ray.floatindex import (
    build_float,
    float_key,
    key_float_hi,
    key_float_lo,
    knn_float,
    range_count_float,
)


class TestFloatKey:
    def test_order_preserved_across_magnitudes(self):
        rng = np.random.RandomState(5)
        v = np.concatenate(
            [
                rng.normal(0, 1e6, 2000),
                rng.normal(0, 1e-300, 100),  # subnormal-adjacent
                [-0.0, 0.0, 1e308, -1e308, 5e-324, -5e-324],
            ]
        )
        k = float_key(v)
        o = np.argsort(v, kind="stable")
        assert (np.diff(k[o]) >= 0).all()

    def test_bounds_conservative(self):
        rng = np.random.RandomState(6)
        v = rng.normal(0, 1e3, 5000)
        k = float_key(v)
        assert (key_float_lo(k) <= v).all()
        assert (v <= key_float_hi(k)).all()

    def test_nan_rejected(self):
        with pytest.raises(ValueError):
            float_key(np.array([1.0, np.nan]))


@pytest.fixture(scope="module")
def float_built(ray_session, tmp_path_factory):
    import ray.data as rd

    rng = np.random.RandomState(9)
    n = 12_000
    xf = rng.normal(0, 1000.0, n)  # crosses zero: negative keys exercised
    yf = rng.uniform(-5000, 5000, n)
    t = pa.table(
        {"point_id": np.arange(n, dtype=np.int64), "x": xf, "y": yf}
    )
    idx = build_float(
        rd.from_arrow(t),
        str(tmp_path_factory.mktemp("fidx")),
        EngineConfig(target_cell_rows=1500),
        float_dims=("x", "y"),
        id_col="point_id",
    )
    return idx, xf, yf


class TestFloatQueries:
    def test_knn_exact_vs_numpy(self, float_built):
        idx, xf, yf = float_built
        n = len(xf)
        rng = np.random.RandomState(3)
        qi = rng.choice(n, 40, replace=False)
        Qf = np.stack([xf[qi] + 0.123, yf[qi] - 0.456], axis=1)
        res = knn_float(idx, Qf, k=7)
        rq = res["qid"].to_numpy()
        rn = res["neighbor"].to_numpy()
        rdist = res["dist2"].to_numpy()
        assert res["dist2"].type == pa.float64()
        for j in range(len(Qf)):
            d2 = (xf - Qf[j, 0]) ** 2 + (yf - Qf[j, 1]) ** 2
            order = np.lexsort((np.arange(n), d2))[:7]
            assert np.array_equal(rn[rq == j], order)
            assert np.array_equal(rdist[rq == j], d2[order])

    def test_range_count_exact_vs_numpy(self, float_built):
        idx, xf, yf = float_built
        rng = np.random.RandomState(4)
        qi = rng.choice(len(xf), 30, replace=False)
        boxes = np.stack(
            [xf[qi] - 150, yf[qi] - 600, xf[qi] + 150, yf[qi] + 600], axis=1
        )
        cnt = range_count_float(idx, boxes)["n"].to_numpy()
        for j in range(len(boxes)):
            want = (
                (xf >= boxes[j, 0])
                & (xf <= boxes[j, 2])
                & (yf >= boxes[j, 1])
                & (yf <= boxes[j, 3])
            ).sum()
            assert cnt[j] == want

    def test_multi_cell_directory(self, float_built):
        idx, _, _ = float_built
        assert len(idx.cell_files) > 4  # partitioning actually happened
