"""Unit tests for the pure-numpy core: hashing, geometry, cells,
kd-tree kernel, fixtures.  No Ray needed."""

import numpy as np
import pytest

from pkd_tree_ray.cells import CellDirectory, morton_cell_box, morton_code, pick_base_depth
from pkd_tree_ray.config import EngineConfig
from pkd_tree_ray.fixtures import (
    decode_png_rgb,
    encode_png_rgb,
    image_batch,
    image_pixels,
    known_cardinality_boxes,
    phash_to_xy,
    psnr,
    uniform_xy,
    varden_xy,
)
from pkd_tree_ray.geometry import (
    boxes_intersect,
    box_contains_box,
    p2b_max_dist2,
    p2b_min_dist2,
    points_in_convex_polygon,
    within_box,
)
from pkd_tree_ray.hashing import mulhash_coord, splitmix64, XA, YA
from pkd_tree_ray.kdtree import KDTree2D, brute_knn_batch
from tests.oracle import circle_count_oracle, knn_oracle, range_count_oracle, range_report_oracle


def _points(n, seed=42, gen=uniform_xy):
    x, y = gen(np.arange(n, dtype=np.uint64), seed)
    return x, y


class TestHashing:
    def test_splitmix_deterministic(self):
        a = splitmix64(np.arange(100, dtype=np.uint64), 42)
        b = splitmix64(np.arange(100, dtype=np.uint64), 42)
        assert np.array_equal(a, b)
        c = splitmix64(np.arange(100, dtype=np.uint64), 43)
        assert not np.array_equal(a, c)

    def test_splitmix_spread(self):
        v = splitmix64(np.arange(10_000, dtype=np.uint64), 1)
        assert len(np.unique(v)) == 10_000

    def test_mulhash_matches_duckdb(self):
        import duckdb

        ids = np.arange(1, 5_000, dtype=np.int64) * 7
        x = mulhash_coord(ids, XA)
        y = mulhash_coord(ids, YA)
        got = duckdb.sql(
            f"SELECT (i * {XA}) % 1000001 AS x, (i * {YA}) % 1000001 AS y "
            "FROM (SELECT unnest(range(1, 5000)) * 7 AS i)"
        ).fetchnumpy()
        assert np.array_equal(x, got["x"].astype(np.int64))
        assert np.array_equal(y, got["y"].astype(np.int64))


class TestGeometry:
    def test_within_box_inclusive(self):
        x = np.array([0, 5, 10, 11])
        y = np.array([0, 5, 10, 10])
        m = within_box(x, y, (0, 0, 10, 10))
        assert m.tolist() == [True, True, True, False]

    def test_p2b_dists(self):
        boxes = np.array([[10, 10, 20, 20]])
        assert p2b_min_dist2(15, 15, boxes)[0, 0] == 0  # inside
        assert p2b_min_dist2(0, 15, boxes)[0, 0] == 100
        assert p2b_min_dist2(0, 0, boxes)[0, 0] == 200
        assert p2b_max_dist2(0, 0, boxes)[0, 0] == 800

    def test_box_relations(self):
        a = np.array([[0, 0, 10, 10]])
        b = np.array([[10, 10, 20, 20], [11, 11, 20, 20], [2, 2, 3, 3]])
        assert boxes_intersect(a, b)[0].tolist() == [True, False, True]
        assert box_contains_box(a, b)[0].tolist() == [False, False, True]

    def test_convex_polygon(self):
        tri = np.array([[0, 0], [10, 0], [0, 10]])  # CCW
        x = np.array([1, 9, 5, 0])
        y = np.array([1, 9, 4, 0])
        assert points_in_convex_polygon(x, y, tri).tolist() == [True, False, True, True]

    def test_concave_polygon_even_odd(self):
        """Even-odd membership on non-convex polygons agrees with
        matplotlib-free brute ray casting on random points, and
        is_convex separates the two polygon kinds."""
        from pkd_tree_ray.geometry import is_convex, points_in_polygon
        from pkd_tree_ray.workloads import concave_polygons, polygons

        assert all(is_convex(v) for v in polygons())
        assert not any(is_convex(v) for v in concave_polygons())
        # L-shape: interior of the notch must be OUTSIDE
        L = np.array([[0, 0], [60, 0], [60, 20], [20, 20], [20, 60], [0, 60]])
        x = np.array([10, 50, 50, 10, 21, 0])
        y = np.array([10, 10, 50, 50, 21, 0])
        got = points_in_polygon(x, y, L).tolist()
        assert got[:5] == [True, True, False, True, False]

    def test_polygon_coordinate_magnitude_guard(self):
        """|coords| just under 2^30 stay int64-exact (verified against
        an arbitrary-precision Python reference); at the bound the
        guard raises instead of letting numpy wrap silently while the
        DuckDB twin errors — the two oracle sides must never diverge."""
        import pytest

        from pkd_tree_ray.geometry import points_in_polygon

        lim = 1 << 30
        big = lim - 1
        verts = np.array(
            [[-big, -big], [big, -big + 7], [big - 3, big], [-big + 5, big - 2]]
        )
        x = np.array([0, big - 10, -big, big], dtype=np.int64)
        y = np.array([0, big - 10, -big, big], dtype=np.int64)
        got = points_in_polygon(x, y, verts)

        def ref_point(qx: int, qy: int) -> bool:
            inside = False
            k = len(verts)
            for i in range(k):
                x1, y1 = map(int, verts[i])
                x2, y2 = map(int, verts[(i + 1) % k])
                spans = (y1 > qy) != (y2 > qy)
                lhs = (qx - x1) * (y2 - y1)  # exact: Python ints
                rhs = (x2 - x1) * (qy - y1)
                crosses = lhs < rhs if y2 > y1 else lhs > rhs
                inside ^= spans and crosses
            return inside

        assert got.tolist() == [ref_point(int(a), int(b)) for a, b in zip(x, y)]
        with pytest.raises(ValueError, match="2\\^30"):
            points_in_polygon(np.array([lim]), np.array([0]), verts)
        with pytest.raises(ValueError, match="2\\^30"):
            points_in_polygon(x[:1], y[:1],
                              np.array([[0, 0], [lim, 0], [0, lim]]))

    def test_concave_containment_shortcut_matches_full_scan(self, ray_session, tmp_path):
        """point_in_polygon_count over a non-convex polygon must equal
        the brute per-point count — the edge-vs-bbox contained-cell
        shortcut may not over- or under-count cells a concavity bites
        into."""
        import pandas as pd
        import ray.data as rd

        from pkd_tree_ray.config import EngineConfig
        from pkd_tree_ray.fixtures import uniform_xy
        from pkd_tree_ray.geometry import points_in_polygon
        from pkd_tree_ray.index import PkdIndex
        from pkd_tree_ray.joins import point_in_polygon_count
        from pkd_tree_ray.workloads import concave_polygons

        pid = np.arange(30_000, dtype=np.int64)
        x, y = uniform_xy(pid, seed=6)
        idx = PkdIndex.build(
            rd.from_pandas(pd.DataFrame({"point_id": pid, "x": x, "y": y})),
            str(tmp_path / "pipidx"),
            EngineConfig(target_cell_rows=1024, batch_size=8192),
            id_col="point_id",
        )
        polys = concave_polygons()
        got = point_in_polygon_count(idx, polys).to_pandas()
        for pi, v in enumerate(polys):
            exp = int(points_in_polygon(x, y, v).sum())
            assert int(got[got.poly_id == pi].cnt.iloc[0]) == exp, pi


class TestCells:
    def test_morton_roundtrip_box(self):
        cfg = EngineConfig()
        for depth in (0, 1, 3, 8):
            x = np.array([0, 1000, 999_999, 523_123], dtype=np.int64)
            y = np.array([0, 999_999, 7, 812_337], dtype=np.int64)
            codes = morton_code(x, y, depth, cfg.coord_bits)
            for xi, yi, ci in zip(x, y, codes):
                bx = morton_cell_box(int(ci), depth, cfg.coord_bits)
                assert bx[0] <= xi <= bx[2] and bx[1] <= yi <= bx[3]

    def test_directory_tiles_space(self):
        cfg = EngineConfig(target_cell_rows=100)
        x, y = _points(5_000, gen=varden_xy)
        codes = morton_code(x, y, cfg.max_depth, cfg.coord_bits)
        d = CellDirectory.from_counts(codes, None, cfg)
        # every point maps to exactly one leaf, and leaves tile the space
        cells = d.assign(x, y)
        assert len(cells) == len(x)
        spans = 1 << (2 * (cfg.max_depth - d.depths))
        assert d.starts[0] == 0
        assert np.array_equal(d.starts[1:], (d.starts + spans)[:-1])
        assert int((d.starts + spans)[-1]) == 4**cfg.max_depth

    def test_directory_splits_hot_cells(self):
        cfg = EngineConfig(target_cell_rows=100, split_factor=2.0)
        xu, yu = _points(5_000, gen=uniform_xy)
        xv, yv = _points(5_000, gen=varden_xy)
        cu = morton_code(xu, yu, cfg.max_depth, cfg.coord_bits)
        cv = morton_code(xv, yv, cfg.max_depth, cfg.coord_bits)
        du = CellDirectory.from_counts(cu, None, cfg)
        dv = CellDirectory.from_counts(cv, None, cfg)
        # varden needs deeper cells in clusters than uniform's max depth
        assert dv.depths.max() > du.depths.max()
        # no cell holds more than the split threshold (or is at max depth)
        cells = dv.assign(xv, yv)
        _, counts = np.unique(cells, return_counts=True)
        assert counts.max() <= cfg.split_threshold or dv.depths.max() == cfg.max_depth

    def test_pick_base_depth(self):
        cfg = EngineConfig(target_cell_rows=1000)
        assert pick_base_depth(500, cfg) == 0
        assert pick_base_depth(4_000, cfg) == 1
        assert pick_base_depth(1_000_000, cfg) == 5


class TestKDTree:
    @pytest.mark.parametrize("gen", [uniform_xy, varden_xy])
    @pytest.mark.parametrize("n", [1, 33, 1_000])
    def test_knn_matches_oracle(self, gen, n):
        x, y = _points(n, gen=gen)
        pid = np.arange(n, dtype=np.int64)
        t = KDTree2D(x, y)
        qx, qy = _points(20, seed=7, gen=gen)
        for k in (1, 10, 100):
            oracle = knn_oracle(x, y, pid, qx, qy, k)
            for qi in range(len(qx)):
                idx, d2, _ = t.knn(int(qx[qi]), int(qy[qi]), k)
                got = sorted(zip(d2.tolist(), idx.tolist()))
                # compare kth distance (tie sets may differ in members)
                exp = oracle[qi]
                assert len(got) == len(exp)
                assert [g[0] for g in got] == [e[0] for e in exp]

    def test_range_count_and_report(self):
        n = 2_000
        x, y = _points(n)
        pid = np.arange(n, dtype=np.int64)
        t = KDTree2D(x, y)
        rng = np.random.RandomState(10)
        for _ in range(30):
            a = rng.randint(0, 1_000_000, 2)
            b = rng.randint(0, 1_000_000, 2)
            box = (min(a[0], b[0]), min(a[1], b[1]), max(a[0], b[0]), max(a[1], b[1]))
            assert t.range_count(box) == range_count_oracle(x, y, box)
            got = set(int(v) for v in t.range_report(box))
            assert got == range_report_oracle(x, y, pid, box)

    def test_circle_count(self):
        n = 2_000
        x, y = _points(n)
        t = KDTree2D(x, y)
        rng = np.random.RandomState(11)
        for _ in range(20):
            cx, cy = rng.randint(0, 1_000_000, 2)
            r = rng.randint(1, 400_000)
            assert t.circle_count(cx, cy, r) == circle_count_oracle(x, y, cx, cy, r)

    def test_duplicates_multiplicity(self):
        # dummy-leaf semantics: duplicates keep full multiplicity
        x = np.array([5] * 100 + [9] * 50, dtype=np.int64)
        y = np.array([5] * 100 + [9] * 50, dtype=np.int64)
        t = KDTree2D(x, y)
        assert t.range_count((0, 0, 6, 6)) == 100
        assert t.range_count((0, 0, 9, 9)) == 150
        idx, d2, _ = t.knn(5, 5, 10)
        assert len(idx) == 10 and (d2 == 0).all()

    def test_validate_and_height(self):
        x, y = _points(3_000)
        t = KDTree2D(x, y)
        t.validate()
        assert 0 < t.height() <= 24

    def test_brute_knn_batch(self):
        n, m, k = 500, 40, 10
        x, y = _points(n)
        qx, qy = _points(m, seed=9)
        pid = np.arange(n, dtype=np.int64)
        idx, d2 = brute_knn_batch(x, y, qx, qy, k)
        oracle = knn_oracle(x, y, pid, qx, qy, k)
        for qi in range(m):
            assert sorted(d2[qi].tolist()) == [e[0] for e in oracle[qi]]


class TestFixtures:
    def test_png_roundtrip(self):
        px = image_pixels(123)
        data = encode_png_rgb(px)
        back = decode_png_rgb(data)
        assert np.array_equal(px, back)
        assert psnr(px, back) == float("inf")

    def test_image_batch_schema_and_determinism(self):
        t1 = image_batch(0, 50)
        t2 = image_batch(0, 50)
        assert t1.equals(t2)
        assert t1.column_names == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
        assert t1["image_id"][0].as_py() == "img000000000000"
        # chunked generation is consistent with one-shot
        t3 = image_batch(25, 25)
        assert t1.slice(25, 25).equals(t3)

    def test_phash_to_xy_range(self):
        t = image_batch(0, 200)
        x, y = phash_to_xy(t["phash"].to_numpy())
        assert x.min() >= 0 and x.max() <= 1_000_000
        assert y.min() >= 0 and y.max() <= 1_000_000

    def test_known_cardinality_boxes(self):
        x, y = _points(2_000)
        boxes, counts = known_cardinality_boxes(x, y, 10, "medium")
        assert len(boxes) == 10
        for box, c in zip(boxes, counts):
            assert range_count_oracle(x, y, box) == c
        lo, hi = int(2_000**0.25), int(2_000**0.5)
        assert ((counts >= lo) & (counts < hi)).all()


class TestDistributedMergePath:
    def test_knn_groupby_merge_path_matches_fast_path(self, ray_session, tmp_path, monkeypatch):
        """Force the m*k > limit Dataset groupby(qid) merge (the
        no-pool large-result path) and check it equals the driver-merge
        fast path."""
        import ray.data as rd
        import pandas as pd

        from pkd_tree_ray import queries as Q
        from pkd_tree_ray.config import EngineConfig
        from pkd_tree_ray.fixtures import varden_xy
        from pkd_tree_ray.index import PkdIndex

        pid = np.arange(6_000, dtype=np.int64)
        x, y = varden_xy(pid, seed=61)
        idx = PkdIndex.build(
            rd.from_pandas(pd.DataFrame({"point_id": pid, "x": x, "y": y})),
            str(tmp_path / "m"),
            EngineConfig(target_cell_rows=512, batch_size=4096),
            id_col="point_id",
        )
        qx, qy = x[:80].copy(), y[:80].copy()
        fast = Q.knn(idx, qx, qy, 5).to_pandas().sort_values(["qid", "rank"]).reset_index(drop=True)
        monkeypatch.setattr(Q, "_DRIVER_MERGE_LIMIT", 10)
        dist = Q.knn(idx, qx, qy, 5)
        dist = (dist.to_pandas() if hasattr(dist, "to_pandas") else dist)
        dist = dist.sort_values(["qid", "rank"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(fast, dist)


class TestFloatCoordinateKit:
    """Float (double) coordinate support: epsilon comparators
    (comparator.h:10-79) + grid quantization adapter."""

    def test_epsilon_comparators(self):
        from pkd_tree_ray.geometry import num_eq, num_gt, num_lt

        a = np.array([1.0, 1.0, 2.0])
        b = np.array([1.0 + 5e-10, 1.1, 1.9])
        assert num_eq(a, b).tolist() == [True, False, False]
        assert num_lt(a, b).tolist() == [False, True, False]
        assert num_gt(a, b).tolist() == [False, False, True]

    def test_quantize_is_floor_grid(self):
        from pkd_tree_ray.geometry import quantize_coords

        v = np.array([0.0, 0.24, 0.25, 0.9999, 1.0, 142857.3])
        q = quantize_coords(v, 4)
        assert q.tolist() == [0, 0, 1, 3, 4, 571429]

    def test_float_pipeline_matches_float_oracle(self, ray_session, tmp_path):
        """Build over quantized float64 coords; kNN result equals the
        float-space oracle computed on the same quantization."""
        import ray.data as rd
        import pyarrow as pa

        from pkd_tree_ray.config import EngineConfig
        from pkd_tree_ray.geometry import quantize_coords
        from pkd_tree_ray.index import PkdIndex
        from pkd_tree_ray.queries import knn

        rng = np.random.default_rng(21)
        n = 3_000
        fx = rng.random(n) * 140_000.0
        fy = rng.random(n) * 140_000.0
        ids = np.arange(n, dtype=np.int64)
        x = quantize_coords(fx, 4)
        y = quantize_coords(fy, 4)
        cfg = EngineConfig(target_cell_rows=512, batch_size=4_096)
        idx = PkdIndex.build(
            rd.from_arrow(pa.table({"point_id": ids, "x": x, "y": y})),
            str(tmp_path),
            cfg,
            id_col="point_id",
        )
        qfx, qfy = fx[:15], fy[:15]
        qx, qy = quantize_coords(qfx, 4), quantize_coords(qfy, 4)
        df = knn(idx, qx, qy, 5).to_pandas().sort_values(["qid", "rank"])
        for q in range(15):
            d2 = (x - qx[q]) ** 2 + (y - qy[q]) ** 2
            order = np.lexsort((ids, d2))[:5]
            sub = df[df["qid"] == q]
            assert sub["dist2"].tolist() == d2[order].tolist()
            assert sub["neighbor"].tolist() == ids[order].tolist()
