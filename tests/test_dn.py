"""Higher-dimension conformance (d=5, 7, 9, 10, 12, 16) — the reference
dispatches d in {2,3,5,7,9,10,12,16} (``tests/test.cpp:569-617``);
dimension is a runtime parameter here.  Morton depth shrinks with d
(ndim * max_depth <= 62 so a full-depth code fits int64); d=7 exercises
an odd-dimension Morton budget (7*8 = 56 bits)."""

import numpy as np
import pyarrow as pa
import pytest

from pkd_tree_ray.config import EngineConfig
from pkd_tree_ray.index import PkdIndex


def _mk(d, n, seed=5):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 1 << 20, n).astype(np.int64) for _ in range(d)]


@pytest.mark.parametrize("d", [5, 7, 9, 10, 12, 16])
class TestHigherD:
    def _build(self, ray_session, tmp_path, d, n=3_000):
        import ray.data as rd

        dims = tuple(f"x{j}" for j in range(d))
        cfg = EngineConfig(
            dims=dims,
            max_depth=62 // d,
            target_cell_rows=512,
            batch_size=4_096,
        )
        c = _mk(d, n)
        ids = np.arange(n, dtype=np.int64)
        tbl = pa.table({"point_id": ids, **{dims[j]: c[j] for j in range(d)}})
        idx = PkdIndex.build(rd.from_arrow(tbl), str(tmp_path), cfg, id_col="point_id")
        return idx, ids, c

    def test_build_and_knn_matches_oracle(self, ray_session, tmp_path, d):
        from pkd_tree_ray.queries import knn_nd

        idx, ids, c = self._build(ray_session, tmp_path, d)
        assert idx.total_rows == len(ids)
        rng = np.random.default_rng(11)
        Q = rng.integers(0, 1 << 20, (15, d)).astype(np.int64)
        df = knn_nd(idx, Q, 5).to_pandas().sort_values(["qid", "rank"])
        for q in range(len(Q)):
            d2 = sum((cj - qj) ** 2 for cj, qj in zip(c, Q[q]))
            order = np.lexsort((ids, d2))[:5]
            sub = df[df["qid"] == q]
            assert sub["dist2"].tolist() == d2[order].tolist()
            assert sub["neighbor"].tolist() == ids[order].tolist()

    def test_range_count_matches_oracle(self, ray_session, tmp_path, d):
        from pkd_tree_ray.queries import range_count

        idx, ids, c = self._build(ray_session, tmp_path, d)
        rng = np.random.default_rng(13)
        span = 1 << 18
        mins = rng.integers(0, (1 << 20) - span, (10, d)).astype(np.int64)
        boxes = np.concatenate([mins, mins + span], axis=1)
        got = range_count(idx, boxes).to_pandas()["cnt"].to_numpy()
        for q in range(len(boxes)):
            inside = np.ones(len(ids), dtype=bool)
            for j in range(d):
                inside &= (c[j] >= boxes[q, j]) & (c[j] <= boxes[q, d + j])
            assert got[q] == int(inside.sum())
