"""Resident shard-pool serving layer + self-kNN graph sink.

The pool must return bit-identical results to the Dataset scan path
for every query family, across index updates (refresh), since both run
the same scan kernels (queries.py) over the same cells.
"""

import numpy as np
import pandas as pd
import pytest

from pkd_tree_ray.config import EngineConfig
from pkd_tree_ray.fixtures import point_pair_boxes, varden_xy
from pkd_tree_ray.index import PkdIndex

CFG = EngineConfig(target_cell_rows=1024, batch_size=4096)
N = 20_000


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data as rd

    pid = np.arange(N, dtype=np.int64)
    x, y = varden_xy(pid, seed=11)
    path = str(tmp_path_factory.mktemp("shards") / "idx")
    idx = PkdIndex.build(
        rd.from_pandas(pd.DataFrame({"point_id": pid, "x": x, "y": y})),
        path,
        CFG,
        id_col="point_id",
    )
    return idx, x, y


class TestPoolEquivalence:
    def test_all_query_families_match_dataset_path(self, built):
        from pkd_tree_ray.queries import circle_count, knn, range_count, range_report
        from pkd_tree_ray.shards import ShardedQueryPool

        idx, x, y = built
        qx, qy = x[:150].copy(), y[:150].copy()
        boxes = point_pair_boxes(x, y, 40)
        rng = np.random.RandomState(3)
        circles = np.stack(
            [x[:25], y[:25], rng.randint(500, 40_000, 25)], axis=1
        ).astype(np.int64)

        def snap():
            return (
                knn(idx, qx, qy, 10).to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True),
                range_count(idx, boxes).to_pandas(),
                circle_count(idx, circles).to_pandas(),
                range_report(idx, boxes[:8]).to_pandas().sort_values(["qid", "point_id"]).reset_index(drop=True),
            )

        base = snap()
        pool = ShardedQueryPool(idx, n_shards=3)
        try:
            served = snap()
            for b, s in zip(base, served):
                pd.testing.assert_frame_equal(b, s)
        finally:
            pool.shutdown()
        assert idx.pool is None

    def test_refresh_after_insert_and_detach(self, built, tmp_path):
        import ray.data as rd

        from pkd_tree_ray.queries import range_count
        from pkd_tree_ray.shards import ShardedQueryPool

        idx, x, y = built
        boxes = point_pair_boxes(x, y, 20)
        pool = ShardedQueryPool(idx, n_shards=2)
        try:
            delta = pd.DataFrame(
                {
                    "point_id": np.arange(N, N + 700, dtype=np.int64),
                    "x": x[:700] + 5,
                    "y": y[:700] + 5,
                }
            )
            idx2 = idx.insert(rd.from_pandas(delta))
            pool.refresh(idx2)
            assert idx.pool is None  # old handle no longer served
            assert idx2.pool is pool
            got = range_count(idx2, boxes).to_pandas()["cnt"].to_numpy()
            ax = np.concatenate([x, delta.x.to_numpy()])
            ay = np.concatenate([y, delta.y.to_numpy()])
            for bi, b in enumerate(boxes):
                exp = int(np.sum((ax >= b[0]) & (ax <= b[2]) & (ay >= b[1]) & (ay <= b[3])))
                assert got[bi] == exp
        finally:
            pool.shutdown()


class TestKnnGraph:
    def test_finality_candidates_prune_to_local_ring(self):
        """The per-cell finality pass must consult only cells whose
        bbox is within the cell-wide max kth-distance — on a 16x16
        grid with a tight ball that is the 8-neighbor ring, not all
        255 foreign cells (r2 weak item: O(n x C))."""
        from pkd_tree_ray.joins import _finality_candidates

        side = 100
        boxes = np.array(
            [
                [i * side, j * side, (i + 1) * side - 1, (j + 1) * side - 1]
                for i in range(16)
                for j in range(16)
            ],
            dtype=np.int64,
        )
        pos = 5 * 16 + 5  # interior cell
        cand = _finality_candidates(pos, boxes, dk2_max=(side // 4) ** 2)
        assert pos not in cand
        assert len(cand) == 8  # only the touching ring survives
        # distant dk reaches further but still prunes
        cand2 = _finality_candidates(pos, boxes, dk2_max=(2 * side) ** 2)
        assert 8 < len(cand2) < 255

    def test_graph_matches_bruteforce(self, ray_session, tmp_path):
        import ray.data as rd

        from pkd_tree_ray.joins import knn_graph

        n, k = 4_000, 5
        pid = np.arange(n, dtype=np.int64)
        x, y = varden_xy(pid, seed=13)
        idx = PkdIndex.build(
            rd.from_pandas(pd.DataFrame({"point_id": pid, "x": x, "y": y})),
            str(tmp_path / "g"),
            CFG,
            id_col="point_id",
        )
        edges = (
            knn_graph(idx, str(tmp_path / "gout"), k)
            .to_pandas()
            .sort_values(["src", "rank"])
            .reset_index(drop=True)
        )
        assert len(edges) == n * k
        # exact oracle on a sample of sources
        for s in range(0, n, 397):
            d2 = (x - x[s]).astype(np.int64) ** 2 + (y - y[s]).astype(np.int64) ** 2
            order = np.lexsort((pid, d2))
            order = order[order != s][:k]  # nearest k excluding self
            got = edges[edges.src == s]
            assert list(got["dst"]) == list(pid[order])
            assert list(got["dist2"]) == list(d2[order])

    def test_graph_resumes_from_partial_output(self, ray_session, tmp_path):
        import ray.data as rd

        from pkd_tree_ray.joins import knn_graph

        n, k = 2_000, 3
        pid = np.arange(n, dtype=np.int64)
        x, y = varden_xy(pid, seed=17)
        idx = PkdIndex.build(
            rd.from_pandas(pd.DataFrame({"point_id": pid, "x": x, "y": y})),
            str(tmp_path / "r"),
            CFG,
            id_col="point_id",
        )
        out = str(tmp_path / "rout")
        first = knn_graph(idx, out, k).to_pandas()
        import glob
        import os

        files = sorted(glob.glob(os.path.join(out, "edges", "*.parquet")))
        assert len(files) > 1
        # drop one finished cell file; the second run must regenerate
        # exactly it and leave the rest untouched (mtime unchanged)
        victim = files[0]
        keeper = files[-1]
        mtime_keeper = os.path.getmtime(keeper)
        os.remove(victim)
        second = knn_graph(idx, out, k).to_pandas()
        assert os.path.exists(victim)
        assert os.path.getmtime(keeper) == mtime_keeper
        a = first.sort_values(["src", "rank"]).reset_index(drop=True)
        b = second.sort_values(["src", "rank"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestParallelClassification:
    def test_large_batch_knn_uses_task_classification(self, ray_session, tmp_path, monkeypatch):
        """Forcing the task-parallel classification path (r1 weak item:
        driver-side O(m x C) classification) must give the identical
        result as the driver-side path."""
        import ray.data as rd
        import numpy as np
        import pyarrow as pa

        from pkd_tree_ray import queries as q
        from pkd_tree_ray.config import EngineConfig
        from pkd_tree_ray.index import PkdIndex
        from pkd_tree_ray.fixtures import uniform_xy

        cfg = EngineConfig(target_cell_rows=512, batch_size=4_096)
        n = 3_000
        x, y = uniform_xy(np.arange(n, dtype=np.uint64), 77)
        ids = np.arange(n, dtype=np.int64)
        idx = PkdIndex.build(
            rd.from_arrow(pa.table({"point_id": ids, "x": x, "y": y})),
            str(tmp_path),
            cfg,
            id_col="point_id",
        )
        qx, qy = x[:400], y[:400]
        base = q.knn(idx, qx, qy, 5).to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True)
        monkeypatch.setattr(q, "_CLASSIFY_TASK_MIN", 100)
        got = q.knn(idx, qx, qy, 5).to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True)
        assert got["neighbor"].tolist() == base["neighbor"].tolist()
        assert got["dist2"].tolist() == base["dist2"].tolist()


class TestPoolOODRepair:
    def test_ood_queries_repair_through_pool_scan(self, built):
        """OOD queries (uniform over the space, varden build —
        test.cpp:494-509) force the density-bound repair path, whose
        pool.scan payload is (Q, k, *csr) with MANY candidate cells;
        r2 regression: shard-side shrink read k from the wrong slot."""
        from pkd_tree_ray.queries import knn
        from pkd_tree_ray.shards import ShardedQueryPool
        from tests.oracle import knn_oracle

        idx, x, y = built
        rng = np.random.RandomState(7)
        qx = rng.randint(0, 1_000_000, 60).astype(np.int64)
        qy = rng.randint(0, 1_000_000, 60).astype(np.int64)
        pool = ShardedQueryPool(idx, n_shards=3)
        try:
            df = knn(idx, qx, qy, 10).to_pandas().sort_values(["qid", "rank"])
        finally:
            pool.shutdown()
        pid = np.arange(N, dtype=np.int64)
        oracle = knn_oracle(x, y, pid, qx, qy, 10)
        for q in range(len(qx)):
            assert df[df["qid"] == q]["dist2"].tolist() == [e[0] for e in oracle[q]]
