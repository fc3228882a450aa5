"""d=3 conformance — the reference's headline dimensionality (its
build/kNN baselines are d=3; dimension dispatch at
``tests/test.cpp:569-617``).  Exercises the runtime-d core end to end:
3-way Morton directory, KDTreeND kernels, ND scan stages, updates and
the resident shard pool."""

import numpy as np
import pyarrow as pa
import pytest

from pkd_tree_ray.config import EngineConfig
from pkd_tree_ray.index import PkdIndex

CFG3 = EngineConfig(dims=("x", "y", "z"), target_cell_rows=512, batch_size=4_096)


def _rand3(n, seed=0, lo=0, hi=1 << 20):
    rng = np.random.default_rng(seed)
    return [rng.integers(lo, hi, n).astype(np.int64) for _ in range(3)]


def _table(ids, c):
    return pa.table(
        {"point_id": np.asarray(ids, dtype=np.int64), "x": c[0], "y": c[1], "z": c[2]}
    )


def _knn_oracle_3d(c, pid, Q, k):
    out = []
    for q in Q:
        d2 = sum((cj - qj) ** 2 for cj, qj in zip(c, q))
        order = np.lexsort((pid, d2))[: min(k, len(pid))]
        out.append([(int(d2[i]), int(pid[i])) for i in order])
    return out


@pytest.fixture(scope="module")
def built3(ray_session, tmp_path_factory):
    import ray.data as rd

    n = 4_000
    c = _rand3(n, seed=5)
    ids = np.arange(n, dtype=np.int64)
    path = str(tmp_path_factory.mktemp("idx3"))
    idx = PkdIndex.build(rd.from_arrow(_table(ids, c)), path, CFG3, id_col="point_id")
    return idx, ids, c


class TestBuild3D:
    def test_counts_and_validate(self, built3):
        idx, ids, c = built3
        assert idx.total_rows == len(ids)
        metrics = idx.validate()
        assert metrics["rows"] == len(ids)
        # bboxes are 6-wide
        assert idx.directory.bboxes.shape[1] == 6

    def test_reopen_preserves_dims(self, built3):
        idx, _, _ = built3
        re = PkdIndex.open(idx.path)
        assert re.config.dims == ("x", "y", "z")
        assert re.total_rows == idx.total_rows


class TestQueries3D:
    def test_knn_matches_oracle(self, built3):
        from pkd_tree_ray.queries import knn_nd

        idx, ids, c = built3
        rng = np.random.default_rng(9)
        Q = rng.integers(0, 1 << 20, (30, 3)).astype(np.int64)
        df = knn_nd(idx, Q, 10).to_pandas().sort_values(["qid", "rank"])
        oracle = _knn_oracle_3d(c, ids, Q, 10)
        for q in range(len(Q)):
            sub = df[df["qid"] == q]
            assert sub["dist2"].tolist() == [e[0] for e in oracle[q]]
            assert sub["neighbor"].tolist() == [e[1] for e in oracle[q]]

    def test_range_count_matches_oracle(self, built3):
        from pkd_tree_ray.queries import range_count

        idx, ids, c = built3
        rng = np.random.default_rng(10)
        span = 1 << 18
        mins = rng.integers(0, (1 << 20) - span, (15, 3)).astype(np.int64)
        boxes = np.concatenate([mins, mins + span], axis=1)
        got = range_count(idx, boxes).to_pandas()["cnt"].to_numpy()
        for i, b in enumerate(boxes):
            m = np.ones(len(ids), dtype=bool)
            for j in range(3):
                m &= (c[j] >= b[j]) & (c[j] <= b[3 + j])
            assert got[i] == int(m.sum())

    def test_circle_count_matches_oracle(self, built3):
        from pkd_tree_ray.queries import circle_count

        idx, ids, c = built3
        rng = np.random.default_rng(11)
        centers = rng.integers(0, 1 << 20, (10, 3)).astype(np.int64)
        rs = rng.integers(1 << 16, 1 << 19, 10).astype(np.int64)
        circles = np.concatenate([centers, rs[:, None]], axis=1)
        got = circle_count(idx, circles).to_pandas()["cnt"].to_numpy()
        for i in range(10):
            d2 = sum((cj - centers[i, j]) ** 2 for j, cj in enumerate(c))
            assert got[i] == int((d2 <= rs[i] * rs[i]).sum())

    def test_range_report_matches_oracle(self, built3):
        from pkd_tree_ray.queries import range_report

        idx, ids, c = built3
        b = np.array([[100_000, 100_000, 100_000, 800_000, 800_000, 800_000]])
        rep = range_report(idx, b).to_pandas()
        m = np.ones(len(ids), dtype=bool)
        for j in range(3):
            m &= (c[j] >= b[0, j]) & (c[j] <= b[0, 3 + j])
        assert set(rep["point_id"]) == set(ids[m].tolist())


class TestUpdates3D:
    def test_insert_delete_roundtrip(self, ray_session, tmp_path):
        import ray.data as rd
        from pkd_tree_ray.queries import knn_nd

        n = 2_000
        c = _rand3(n, seed=6)
        ids = np.arange(n, dtype=np.int64)
        idx = PkdIndex.build(
            rd.from_arrow(_table(ids, c)), str(tmp_path), CFG3, id_col="point_id"
        )
        ci = _rand3(300, seed=7)
        iids = np.arange(n, n + 300, dtype=np.int64)
        idx2 = idx.insert(rd.from_arrow(_table(iids, ci)))
        assert idx2.total_rows == n + 300
        idx3 = idx2.delete(rd.from_arrow(_table(iids, ci)), strict=True)
        assert idx3.total_rows == n
        Q = np.stack([c[0][:5], c[1][:5], c[2][:5]], axis=1)
        df = knn_nd(idx3, Q, 5).to_pandas().sort_values(["qid", "rank"])
        oracle = _knn_oracle_3d(c, ids, Q, 5)
        for q in range(5):
            assert df[df["qid"] == q]["dist2"].tolist() == [e[0] for e in oracle[q]]


class TestShardPool3D:
    def test_pool_matches_dataset_path(self, built3):
        from pkd_tree_ray.queries import knn_nd, range_count
        from pkd_tree_ray.shards import ShardedQueryPool

        idx, ids, c = built3
        rng = np.random.default_rng(12)
        Q = rng.integers(0, 1 << 20, (25, 3)).astype(np.int64)
        base_knn = knn_nd(idx, Q, 8).to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True)
        span = 1 << 18
        mins = rng.integers(0, (1 << 20) - span, (8, 3)).astype(np.int64)
        boxes = np.concatenate([mins, mins + span], axis=1)
        base_rc = range_count(idx, boxes).to_pandas()

        pool = ShardedQueryPool(idx, n_shards=3)
        try:
            got_knn = knn_nd(idx, Q, 8)
            got_knn = (
                got_knn.to_pandas() if hasattr(got_knn, "to_pandas") else got_knn
            )
            got_knn = got_knn.sort_values(["qid", "rank"]).reset_index(drop=True)
            assert got_knn["neighbor"].tolist() == base_knn["neighbor"].tolist()
            assert got_knn["dist2"].tolist() == base_knn["dist2"].tolist()
            got_rc = range_count(idx, boxes).to_pandas()
            assert got_rc["cnt"].tolist() == base_rc["cnt"].tolist()
        finally:
            pool.shutdown()
