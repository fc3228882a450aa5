"""Integration tests: distributed build / queries / updates against the
brute-force oracle (the conformance strategy of
``tests/checkCorrectParallel.cpp``, with numpy in CGAL's role)."""

import numpy as np
import pyarrow as pa
import pytest

from pkd_tree_ray.config import EngineConfig
from pkd_tree_ray.fixtures import (
    known_cardinality_boxes,
    point_pair_boxes,
    self_query_sample,
    uniform_xy,
    varden_xy,
)
from tests.oracle import (
    circle_count_oracle,
    knn_oracle,
    range_count_oracle,
    range_report_oracle,
)

CFG = EngineConfig(target_cell_rows=512, batch_size=4_096, split_factor=4.0)


def _points_table(n, gen=uniform_xy, seed=42, id_offset=0):
    x, y = gen(np.arange(id_offset, id_offset + n, dtype=np.uint64), seed)
    return (
        pa.table(
            {
                "point_id": np.arange(id_offset, id_offset + n, dtype=np.int64),
                "x": x,
                "y": y,
            }
        ),
        x,
        y,
    )


@pytest.fixture(scope="module", params=["uniform", "varden"])
def built(ray_session, request, tmp_path_factory):
    import ray.data as rd

    from pkd_tree_ray.index import PkdIndex

    gen = uniform_xy if request.param == "uniform" else varden_xy
    n = 4_000
    table, x, y = _points_table(n, gen)
    path = str(tmp_path_factory.mktemp(f"idx_{request.param}"))
    idx = PkdIndex.build(rd.from_arrow(table), path, CFG, id_col="point_id")
    return idx, x, y, np.arange(n, dtype=np.int64)


class TestBuild:
    def test_directory_invariants(self, built):
        """Mirrors validate() (validation.hpp:49-70): counts sum to n,
        cell bboxes cover their rows, every row in exactly one cell."""
        idx, x, y, pid = built
        assert idx.total_rows == len(x)
        df = idx.scan_all().to_pandas()
        assert len(df) == len(x)
        assert set(df["point_id"]) == set(pid.tolist())
        d = idx.directory
        for i, cell in enumerate(d.starts):
            if d.counts[i] == 0:
                continue
            rows = df[df["cell"] == cell]
            assert len(rows) == d.counts[i]
            bb = d.bboxes[i]
            assert rows["x"].min() >= bb[0] and rows["x"].max() <= bb[2]
            assert rows["y"].min() >= bb[1] and rows["y"].max() <= bb[3]

    def test_open_roundtrip(self, built):
        from pkd_tree_ray.index import PkdIndex

        idx, x, y, pid = built
        re = PkdIndex.open(idx.path)
        assert re.total_rows == idx.total_rows
        assert re.cell_files == idx.cell_files
        assert np.array_equal(re.directory.starts, idx.directory.starts)

    def test_resume_skips_existing(self, built, ray_session):
        """Partition-granularity resume: rebuilding over an existing
        index reuses every finished cell file."""
        import ray.data as rd

        from pkd_tree_ray.index import PkdIndex

        idx, x, y, pid = built
        table, _, _ = _points_table(len(x), uniform_xy if "uniform" in idx.path else varden_xy)
        idx2 = PkdIndex.build(rd.from_arrow(table), idx.path, CFG, id_col="point_id", resume=True)
        statuses = {r["status"] for r in idx2.lineage}
        assert statuses == {"skipped"}


class TestQueries:
    def test_range_count_point_pair_boxes(self, built):
        from pkd_tree_ray.queries import range_count

        idx, x, y, pid = built
        boxes = point_pair_boxes(x, y, 40)
        got = range_count(idx, boxes).to_pandas().set_index("qid")["cnt"]
        for q, box in enumerate(boxes):
            assert got[q] == range_count_oracle(x, y, box), f"query {q}"

    def test_range_count_known_cardinality(self, built):
        from pkd_tree_ray.queries import range_count

        idx, x, y, pid = built
        for bracket in ("small", "medium", "large"):
            boxes, expected = known_cardinality_boxes(x, y, 5, bracket)
            got = range_count(idx, boxes).to_pandas()["cnt"].to_numpy()
            assert np.array_equal(got, expected), bracket

    def test_range_report(self, built):
        from pkd_tree_ray.queries import range_report

        idx, x, y, pid = built
        boxes = point_pair_boxes(x, y, 10)
        df = range_report(idx, boxes).to_pandas()
        for q, box in enumerate(boxes):
            got = set(df[df["qid"] == q]["point_id"])
            assert got == range_report_oracle(x, y, pid, box), f"query {q}"

    def test_circle_count(self, built):
        from pkd_tree_ray.queries import circle_count

        idx, x, y, pid = built
        rng = np.random.RandomState(3)
        circles = np.stack(
            [
                rng.randint(0, 1_000_000, 15),
                rng.randint(0, 1_000_000, 15),
                rng.randint(1, 300_000, 15),
            ],
            axis=1,
        ).astype(np.int64)
        got = circle_count(idx, circles).to_pandas()["cnt"].to_numpy()
        for q, c in enumerate(circles):
            assert got[q] == circle_count_oracle(x, y, c[0], c[1], c[2]), f"query {q}"

    @pytest.mark.parametrize("k", [1, 10, 100])
    def test_knn_self_queries(self, built, k):
        from pkd_tree_ray.queries import knn

        idx, x, y, pid = built
        qx, qy = self_query_sample(x, y, ratio=0.01, max_queries=25)
        df = knn(idx, qx, qy, k).to_pandas().sort_values(["qid", "rank"])
        oracle = knn_oracle(x, y, pid, qx, qy, k)
        for q in range(len(qx)):
            got = df[df["qid"] == q]
            exp = oracle[q]
            assert len(got) == len(exp)
            # exact (dist2, id) sequence under (dist2, id) tie-break
            assert got["dist2"].tolist() == [e[0] for e in exp], f"q{q} dists"
            assert got["neighbor"].tolist() == [e[1] for e in exp], f"q{q} ids"


class TestValidateApi:
    def test_validate_returns_metrics_and_passes(self, ray_session, tmp_path):
        import ray.data as rd
        import numpy as np
        import pandas as pd

        from pkd_tree_ray.fixtures import varden_xy
        from pkd_tree_ray.index import PkdIndex
        from pkd_tree_ray.config import EngineConfig

        pid = np.arange(5_000, dtype=np.int64)
        x, y = varden_xy(pid, seed=51)
        idx = PkdIndex.build(
            rd.from_pandas(pd.DataFrame({"point_id": pid, "x": x, "y": y})),
            str(tmp_path / "v"),
            EngineConfig(target_cell_rows=512),
            id_col="point_id",
        )
        m = idx.validate()
        assert m["rows"] == 5_000
        assert m["cells"] >= 1
        assert m["avg_tree_height"] >= 1
        # still valid after a tombstone delete + sidecar insert
        d = pd.DataFrame({"point_id": pid[:100], "x": x[:100], "y": y[:100]})
        idx2 = idx.delete(rd.from_pandas(d), strict=True)
        m2 = idx2.validate()
        assert m2["rows"] == 4_900
        ins = pd.DataFrame(
            {"point_id": pid[:50] + 10_000, "x": x[:50] + 1, "y": y[:50] + 1}
        )
        idx3 = idx2.insert(rd.from_pandas(ins))
        assert idx3.validate()["rows"] == 4_950


class TestHotKeySalting:
    def test_duplicate_point_mass_salts_into_parts(self, ray_session, tmp_path):
        """A duplicate-coordinate point mass cannot be split spatially;
        the build must salt it over multiple files so no single shuffle
        task carries the whole mass — and queries stay exact."""
        import ray.data as rd
        import numpy as np
        import pandas as pd

        from pkd_tree_ray.config import EngineConfig
        from pkd_tree_ray.index import PkdIndex
        from pkd_tree_ray.queries import knn, range_count

        cfg = EngineConfig(target_cell_rows=1_000, batch_size=4_096)
        n_dup, n_other = 12_000, 3_000
        pid = np.arange(n_dup + n_other, dtype=np.int64)
        x = np.concatenate(
            [np.full(n_dup, 500_000, dtype=np.int64),
             np.arange(n_other, dtype=np.int64) * 37 % 1_000_000]
        )
        y = np.concatenate(
            [np.full(n_dup, 500_000, dtype=np.int64),
             np.arange(n_other, dtype=np.int64) * 101 % 1_000_000]
        )
        idx = PkdIndex.build(
            rd.from_pandas(pd.DataFrame({"point_id": pid, "x": x, "y": y})),
            str(tmp_path / "salt"),
            cfg,
            id_col="point_id",
        )
        assert idx.total_rows == n_dup + n_other
        # the mass cell must hold multiple part files
        multi = [c for c, fs in idx.cell_files.items() if len(fs) > 1]
        assert multi, "expected salted multi-file cell for the point mass"
        # exact count through the mass
        box = np.array([[500_000, 500_000, 500_000, 500_000]], dtype=np.int64)
        got = range_count(idx, box).to_pandas()["cnt"][0]
        assert got == n_dup
        # kNN at the mass point: k nearest are all at distance 0
        res = knn(idx, np.array([500_000]), np.array([500_000]), 5).to_pandas()
        assert (res["dist2"] == 0).all()
        idx.validate()


class TestKnnStats:
    def test_visited_node_metrics(self, ray_session, tmp_path):
        """Per-query work counters (testFramework.h:516): every query
        reports its scanned cells and visited-node/row work; total
        work grows with k."""
        import ray.data as rd
        import pandas as pd
        from pkd_tree_ray.config import EngineConfig
        from pkd_tree_ray.fixtures import uniform_xy
        from pkd_tree_ray.index import PkdIndex
        from pkd_tree_ray.queries import knn_stats

        cfg = EngineConfig(target_cell_rows=512, batch_size=4096)
        n = 6_000
        pid = np.arange(n, dtype=np.int64)
        x, y = uniform_xy(pid, 21)
        idx = PkdIndex.build(
            rd.from_pandas(pd.DataFrame({"point_id": pid, "x": x, "y": y})),
            str(tmp_path),
            cfg,
            id_col="point_id",
        )
        Q = np.stack([x[:40], y[:40]], axis=1)
        s1 = knn_stats(idx, Q, 1).to_pandas()
        s20 = knn_stats(idx, Q, 20).to_pandas()
        assert sorted(s1["qid"]) == list(range(40))
        assert (s1["cells_scanned"] >= 1).all()
        # every query did SOME work, tree nodes or brute rows
        assert ((s1["nodes_visited"] + s1["rows_scanned"]) > 0).all()
        work1 = (s1["nodes_visited"] + s1["rows_scanned"]).sum()
        work20 = (s20["nodes_visited"] + s20["rows_scanned"]).sum()
        assert work20 >= work1
