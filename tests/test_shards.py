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


class TestBlockPrunedCells:
    def test_pool_knn_with_block_index_matches_brute(self, ray_session, tmp_path):
        """Cells above _BLOCK_MIN_ROWS get a kd-ordered block index at
        shard sync; the block-pruned kNN kernels must stay bit-exact
        against the full brute oracle for in- and out-of-distribution
        queries (ties broken by (dist2, id))."""
        import ray
        import ray.data as rd

        from pkd_tree_ray.queries import knn
        from pkd_tree_ray.shards import ShardedQueryPool

        n = 40_000
        pid = np.arange(n, dtype=np.int64)
        x, y = varden_xy(pid, seed=23)
        cfg = EngineConfig(target_cell_rows=16_384, batch_size=16_384)
        idx = PkdIndex.build(
            rd.from_pandas(pd.DataFrame({"point_id": pid, "x": x, "y": y})),
            str(tmp_path / "blkidx"),
            cfg,
            id_col="point_id",
        )
        pool = ShardedQueryPool(idx, n_shards=2)
        try:
            # at least one resident cell must carry a block index or
            # this test exercises nothing
            has_blocks = any(
                ray.get(a.__ray_call__.remote(
                    lambda self: any(v[4] is not None for v in self.cells.values())
                ))
                for a in pool.actors
            )
            assert has_blocks, "no cell reached _BLOCK_MIN_ROWS"
            k = 10
            qx = np.concatenate([x[:200], x[:100] + 40_000_000])
            qy = np.concatenate([y[:200], y[:100] - 40_000_000])
            got = knn(idx, qx, qy, k).to_pandas().sort_values(["qid", "rank"])
            P = np.stack([x, y], 1).astype(np.float64)
            Qm = np.stack([qx, qy], 1).astype(np.float64)
            for q in range(len(Qm)):
                d2 = ((Qm[q, None, :] - P) ** 2).sum(-1).astype(np.int64)
                order = np.lexsort((pid, d2))[:k]
                g = got[got.qid == q]
                assert np.array_equal(g.dist2.to_numpy(), d2[order]), q
                assert np.array_equal(g.neighbor.to_numpy(), pid[order]), q
        finally:
            pool.shutdown()

    def test_block_partition_handles_duplicate_heavy_cells(self):
        """An all-identical segment must stop splitting (dummy-leaf
        analog) and still answer exactly."""
        from pkd_tree_ray.kdtree import (
            block_knn_triplets,
            kd_block_partition,
        )

        n, k = 30_000, 5
        fc = [
            np.concatenate([np.full(n // 2, 10, np.int64), np.arange(n // 2, dtype=np.int64)]),
            np.full(n, 7, np.int64),
        ]
        ids = np.arange(n, dtype=np.int64)
        order, blo, bhi, bb = kd_block_partition(fc, 2048)
        q3, n3, d3 = block_knn_triplets(
            [c[order] for c in fc],
            ids[order],
            blo,
            bhi,
            bb,
            [np.array([10], np.int64), np.array([7], np.int64)],
            k,
        )
        assert np.array_equal(n3, np.arange(k, dtype=np.int64))
        assert (d3 == 0).all()


class TestCenterDirBounds:
    def test_bound_is_provable_upper_bound_on_kth_distance(self, built):
        """_center_dir_bounds must dominate the true kth distance for
        every query — in-distribution, boundary, and far outside the
        data — or kNN exactness would silently depend on repair."""
        from pkd_tree_ray.queries import _center_dir_bounds

        idx, x, y = built
        rng = np.random.RandomState(9)
        qs = [
            np.stack([x[:300], y[:300]], 1),                     # on-data
            rng.randint(0, 1_000_001, size=(300, 2)),            # uniform box
            rng.randint(-5_000_000, 5_000_000, size=(300, 2)),   # far outside
        ]
        P = np.stack([x, y], 1).astype(np.float64)
        for k in (1, 10, 100):
            for Q in qs:
                Q = Q.astype(np.int64)
                b = _center_dir_bounds(idx, Q, k)
                d2 = ((Q[:, None, :].astype(np.float64) - P[None, :, :]) ** 2).sum(-1)
                kth = np.partition(d2, k - 1, axis=1)[:, k - 1].astype(np.int64)
                assert (b >= kth).all(), (k, int((b < kth).sum()))

    def test_replicated_hot_cells_answer_identically(self, built, monkeypatch):
        """Force every cell to replicate to all shards: the qid-modulo
        split must return results identical to the unreplicated pool
        (each query answered exactly once per candidate cell)."""
        from pkd_tree_ray.queries import knn
        from pkd_tree_ray.shards import ShardedQueryPool

        idx, x, y = built
        qx = np.concatenate([x[:150], x[:50] + 2_000_000])
        qy = np.concatenate([y[:150], y[:50] - 2_000_000])
        pool = ShardedQueryPool(idx, n_shards=3)
        try:
            base = knn(idx, qx, qy, 10).to_pandas()
        finally:
            pool.shutdown()

        pool2 = ShardedQueryPool(idx, n_shards=3, min_replicas=64)
        try:
            n_rep = sum(1 for v in pool2.replicas.values() if len(v) > 1)
            assert n_rep > 0, "replication never triggered; test is vacuous"
            got = knn(idx, qx, qy, 10).to_pandas()
            pd.testing.assert_frame_equal(
                base.sort_values(["qid", "rank"]).reset_index(drop=True),
                got.sort_values(["qid", "rank"]).reset_index(drop=True),
            )
        finally:
            pool2.shutdown()


class TestKnnJoinWindowing:
    def test_windowed_left_matches_single_window(self, built, monkeypatch):
        """A left Dataset above KNN_JOIN_LEFT_CAP streams through as
        independent windows; the unioned result must equal the
        one-window join (driver memory bounded at any left size)."""
        import ray.data as rd

        import pkd_tree_ray.joins as joins

        idx, x, y = built
        m = 900
        left = pd.DataFrame(
            {
                "c_key": np.arange(m, dtype=np.int64),
                "x": x[:m].copy(),
                "y": y[:m].copy(),
            }
        )

        def run():
            res = joins.knn_join(idx, rd.from_pandas(left), "c_key", k=5)
            pdf = res.to_pandas() if not hasattr(res, "num_rows") else res.to_pandas()
            return pdf.sort_values(["c_key", "rank"]).reset_index(drop=True)

        base = run()
        monkeypatch.setattr(joins, "KNN_JOIN_LEFT_CAP", 250)
        windowed = run()
        pd.testing.assert_frame_equal(base, windowed)


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

    def test_graph_clustered_corpus_windows_repair(
        self, ray_session, tmp_path, monkeypatch
    ):
        # heavily clustered corpus: kth-balls cross cells for a LARGE
        # fraction of points, so the boundary-repair set is not thin.
        # Force multiple repair windows (tiny cap) and check exactness
        # — the repair must stream, never assume one driver slice.
        import glob
        import os

        import ray.data as rd

        from pkd_tree_ray import joins
        from pkd_tree_ray.joins import knn_graph

        monkeypatch.setattr(joins, "KNN_GRAPH_REPAIR_CAP", 200)

        n, k = 3_000, 5
        pid = np.arange(n, dtype=np.int64)
        # ONE razor-thin cluster larger than a cell: the build must
        # split it, so cell bboxes sit within a few units of almost
        # every point's kth-ball — the boundary-repair set is a large
        # fraction of the corpus, not a thin strip
        rng = np.random.default_rng(23)
        x = (500_000 + rng.integers(-40, 41, n)).astype(np.int64)
        y = (500_000 + rng.integers(-40, 41, n)).astype(np.int64)
        idx = PkdIndex.build(
            rd.from_pandas(pd.DataFrame({"point_id": pid, "x": x, "y": y})),
            str(tmp_path / "cl"),
            CFG,
            id_col="point_id",
        )
        out = str(tmp_path / "clout")
        edges = (
            knn_graph(idx, out, k)
            .to_pandas()
            .sort_values(["src", "rank"])
            .reset_index(drop=True)
        )
        assert len(edges) == n * k
        # the tiny cap must have produced several repair windows
        wfiles = glob.glob(os.path.join(out, "edges", "repair-v*-w*.parquet"))
        assert len(wfiles) >= 2
        for s in range(0, n, 307):
            d2 = (x - x[s]).astype(np.int64) ** 2 + (y - y[s]).astype(np.int64) ** 2
            order = np.lexsort((pid, d2))
            order = order[order != s][:k]
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


class TestChunkedPartials:
    def test_parallel_merge_with_subblock_multitile_cells(
        self, ray_session, tmp_path, monkeypatch
    ):
        """Regression: shard partials ship as qid-ascending chunks and
        the parallel qid-slice merge binary-searches each chunk.  Cells
        between the brute kernel's p_chunk (1024) and the block-index
        minimum (2048 rows) take the direct multi-tile
        brute_range_filter_nd foreign path, which emits per-tile qid
        RUNS — unsorted chunks silently break the searchsorted slicing
        (observed as out-of-slice qids / wrong merges at 4 CPUs)."""
        import ray.data as rd
        import pyarrow as pa

        from pkd_tree_ray.config import EngineConfig
        from pkd_tree_ray.fixtures import uniform_xy
        from pkd_tree_ray.kdtree import brute_knn_batch
        from pkd_tree_ray.queries import knn
        from pkd_tree_ray.shards import ShardedQueryPool

        cfg = EngineConfig(target_cell_rows=1_400, batch_size=8_192)
        n = 12_000
        ids = np.arange(n, dtype=np.int64)
        x, y = uniform_xy(ids.astype(np.uint64), 13)
        idx = PkdIndex.build(
            rd.from_arrow(pa.table({"point_id": ids, "x": x, "y": y})),
            str(tmp_path),
            cfg,
            id_col="point_id",
        )
        pool = ShardedQueryPool(idx, n_shards=4)
        idx.pool = pool
        # force the parallel qid-slice merge path at test scale, with
        # multiple qid slices so cross-slice binary search is covered
        monkeypatch.setattr(ShardedQueryPool, "_DRIVER_MERGE_ROWS", 500)
        monkeypatch.setattr(ShardedQueryPool, "_MERGE_TASK_ROWS", 500)
        k = 7
        qx, qy = x[::9].copy(), y[::9].copy()
        res = knn(idx, qx, qy, k)
        tab = res if hasattr(res, "num_rows") else pa.concat_tables(
            [b for b in res.iter_batches(batch_format="pyarrow")]
        )
        m = len(qx)
        assert tab.num_rows == m * k
        qid = tab["qid"].to_numpy()
        nb = tab["neighbor"].to_numpy()
        d2 = tab["dist2"].to_numpy()
        oi, od = brute_knn_batch(x, y, qx, qy, k, tie_key=ids)
        order = np.lexsort((nb, d2, qid))
        got_nb = nb[order].reshape(m, k)
        got_d2 = d2[order].reshape(m, k)
        assert np.array_equal(np.sort(got_d2, axis=1), np.sort(od, axis=1))
        assert np.array_equal(np.sort(got_nb, axis=1), np.sort(ids[oi], axis=1))
        pool.shutdown()


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


class TestLoadAdaptiveRebalance:
    """rebalance(): measured-load fractional-replica LPT must keep
    every query family bit-identical (each query answered exactly once
    across holders) while re-homing/replicating cells."""

    def test_rebalance_keeps_knn_exact(self, built):
        from pkd_tree_ray.queries import knn, range_count
        from pkd_tree_ray.shards import ShardedQueryPool

        idx, x, y = built
        pool = ShardedQueryPool(idx, n_shards=4)
        # OOD workload: uniform queries over the varden build
        rng = np.random.RandomState(3)
        qx = rng.randint(0, 1_000_000, 500).astype(np.int64)
        qy = rng.randint(0, 1_000_000, 500).astype(np.int64)
        before = knn(idx, qx, qy, 10).to_pandas()
        r = pool.rebalance()
        assert r["rebalanced"] and r["cells_observed"] > 0
        # some cell must have moved or replicated into a new layout
        after = knn(idx, qx, qy, 10).to_pandas()
        pd.testing.assert_frame_equal(
            before.sort_values(["qid", "rank"]).reset_index(drop=True),
            after.sort_values(["qid", "rank"]).reset_index(drop=True),
        )
        boxes = point_pair_boxes(x, y, 12)
        got = range_count(idx, boxes).to_pandas()["cnt"].to_numpy()
        pool2 = None
        try:
            # compare against a fresh pool with the static layout
            pool.shutdown()
            idx.pool = None
            pool2 = ShardedQueryPool(idx, n_shards=4)
            got2 = range_count(idx, boxes).to_pandas()["cnt"].to_numpy()
            assert np.array_equal(got, got2)
        finally:
            if pool2 is not None:
                pool2.shutdown()

    def test_rebalance_without_load_is_noop(self, built):
        from pkd_tree_ray.shards import ShardedQueryPool

        idx, x, y = built
        idx.pool = None
        pool = ShardedQueryPool(idx, n_shards=2)
        try:
            r = pool.rebalance()  # no kNN batch ran -> no telemetry
            assert r["rebalanced"] is False
        finally:
            pool.shutdown()
            idx.pool = None
