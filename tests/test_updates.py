"""Batch insert / delete conformance (the reference's
``batchInsert``/``batchDelete`` phases, ``tests/test.cpp:53-74``,
validated after every step like ``checkCorrectParallel.cpp:139-168``)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from pkd_tree_ray.config import EngineConfig
from pkd_tree_ray.index import PkdIndex
from pkd_tree_ray.fixtures import uniform_xy, varden_xy, point_pair_boxes
from tests.oracle import knn_oracle, range_count_oracle

CFG = EngineConfig(target_cell_rows=512, batch_size=4_096)


def _table(ids, x, y):
    return pa.table({"point_id": np.asarray(ids, dtype=np.int64), "x": x, "y": y})


def _mk_index(tmp_path, n=3_000, gen=uniform_xy, seed=42):
    import ray.data as rd
    from pkd_tree_ray.index import PkdIndex

    x, y = gen(np.arange(n, dtype=np.uint64), seed)
    ids = np.arange(n, dtype=np.int64)
    idx = PkdIndex.build(rd.from_arrow(_table(ids, x, y)), str(tmp_path), CFG, id_col="point_id")
    return idx, ids, x, y


class TestInsert:
    def test_insert_then_query(self, ray_session, tmp_path):
        """Insert a 10% batch (readInsertFile convention,
        tests/test.cpp:53-62) and check counts + kNN on the union."""
        import ray.data as rd
        from pkd_tree_ray.queries import knn, range_count

        idx, ids, x, y = _mk_index(tmp_path)
        n = len(ids)
        m = n // 10
        # seed=43: the "2.in" second-file convention (FIXTURES.md §2)
        ix, iy = uniform_xy(np.arange(m, dtype=np.uint64), seed=43)
        iids = np.arange(n, n + m, dtype=np.int64)
        idx2 = idx.insert(rd.from_arrow(_table(iids, ix, iy)))

        assert idx2.total_rows == n + m
        assert idx2.version == idx.version + 1
        ax = np.concatenate([x, ix])
        ay = np.concatenate([y, iy])
        aid = np.concatenate([ids, iids])
        boxes = point_pair_boxes(ax, ay, 20)
        got = range_count(idx2, boxes).to_pandas()["cnt"].to_numpy()
        for q, box in enumerate(boxes):
            assert got[q] == range_count_oracle(ax, ay, box)
        qx, qy = ax[:10], ay[:10]
        df = knn(idx2, qx, qy, 10).to_pandas().sort_values(["qid", "rank"])
        oracle = knn_oracle(ax, ay, aid, qx, qy, 10)
        for q in range(len(qx)):
            assert df[df["qid"] == q]["dist2"].tolist() == [e[0] for e in oracle[q]]

    def test_hot_cell_split(self, ray_session, tmp_path):
        """Inserting a dense cluster into one cell must split it
        (the weight-balance rebuild analog): no live cell exceeds the
        split threshold afterwards, and counts stay exact."""
        import ray.data as rd
        from pkd_tree_ray.queries import range_count

        idx, ids, x, y = _mk_index(tmp_path)
        n = len(ids)
        m = 4 * CFG.split_threshold
        # all inserts inside a 100x100 patch -> one hot cell
        hx = 500_000 + (np.arange(m, dtype=np.int64) % 100)
        hy = 500_000 + ((np.arange(m, dtype=np.int64) * 7) % 100)
        iids = np.arange(n, n + m, dtype=np.int64)
        idx2 = idx.insert(rd.from_arrow(_table(iids, hx, hy)))
        assert idx2.total_rows == n + m
        assert len(idx2.directory) > len(idx.directory)
        ax, ay = np.concatenate([x, hx]), np.concatenate([y, hy])
        box = np.array([[499_990, 499_990, 500_200, 500_200]])
        got = range_count(idx2, box).to_pandas()["cnt"][0]
        assert got == range_count_oracle(ax, ay, box[0])


class TestDelete:
    def test_full_covered_delete(self, ray_session, tmp_path):
        """FullCoveredTag: delete existing rows by id; counts shrink
        exactly (batch_delete.hpp:74-91)."""
        import ray.data as rd
        from pkd_tree_ray.queries import range_count

        idx, ids, x, y = _mk_index(tmp_path)
        sel = ids % 10 == 0
        idx2 = idx.delete(rd.from_arrow(_table(ids[sel], x[sel], y[sel])), strict=True)
        assert idx2.total_rows == (~sel).sum()
        boxes = point_pair_boxes(x[~sel], y[~sel], 15)
        got = range_count(idx2, boxes).to_pandas()["cnt"].to_numpy()
        for q, box in enumerate(boxes):
            assert got[q] == range_count_oracle(x[~sel], y[~sel], box)

    def test_strict_delete_missing_raises(self, ray_session, tmp_path):
        import ray.data as rd

        idx, ids, x, y = _mk_index(tmp_path, n=1_000)
        ghost = _table(np.array([999_999]), np.array([123_456]), np.array([654_321]))
        with pytest.raises(ValueError, match="FullCovered"):
            idx.delete(rd.from_arrow(ghost), strict=True)

    def test_partial_cover_delete_skips_missing(self, ray_session, tmp_path):
        """PartialCoverTag: missing rows are skipped
        (batch_delete.hpp:93-107)."""
        import ray.data as rd

        idx, ids, x, y = _mk_index(tmp_path, n=1_000)
        mix = pa.concat_tables(
            [
                _table(ids[:50], x[:50], y[:50]),
                _table(np.array([777_777]), np.array([1]), np.array([1])),
            ]
        )
        idx2 = idx.delete(rd.from_arrow(mix), strict=False)
        assert idx2.total_rows == 950

    def test_insert_delete_roundtrip(self, ray_session, tmp_path):
        """Insert a batch then delete it -> original point set
        (incrementalDelete driver, testFramework.h:252-304)."""
        import ray.data as rd

        idx, ids, x, y = _mk_index(tmp_path, n=1_500, gen=varden_xy)
        ix, iy = varden_xy(np.arange(200, dtype=np.uint64), seed=43)
        iids = np.arange(10_000, 10_200, dtype=np.int64)
        idx2 = idx.insert(rd.from_arrow(_table(iids, ix, iy)))
        idx3 = idx2.delete(rd.from_arrow(_table(iids, ix, iy)), strict=True)
        assert idx3.total_rows == 1_500
        got = set(idx3.scan_all().to_pandas()["point_id"])
        assert got == set(ids.tolist())


class TestFunctionalUpdate:
    def test_old_handle_unchanged_after_insert(self, ray_session, tmp_path):
        """insert/delete return NEW handles; the old index keeps
        serving the old version (functional update contract)."""
        import ray.data as rd

        idx, ids, x, y = _mk_index(tmp_path, n=1_000)
        before = idx.total_rows
        ix, iy = uniform_xy(np.arange(100, dtype=np.uint64), seed=43)
        idx2 = idx.insert(rd.from_arrow(_table(np.arange(5_000, 5_100), ix, iy)))
        assert idx.total_rows == before
        assert idx2.total_rows == before + 100


class TestTombstoneDeletes:
    """O(delta) delete path: tombstone sidecars + verified counts
    (mark_tomb analog, batch_delete.hpp:147-265)."""

    def _build(self, tmp_path, n=6000):
        import ray.data as rd
        import pandas as pd

        from pkd_tree_ray.fixtures import varden_xy

        pid = np.arange(n, dtype=np.int64)
        x, y = varden_xy(pid, seed=23)
        idx = PkdIndex.build(
            rd.from_pandas(pd.DataFrame({"point_id": pid, "x": x, "y": y})),
            str(tmp_path / "t"),
            CFG,
            id_col="point_id",
        )
        return idx, pid, x, y

    def test_small_delete_writes_tombstones_not_rewrites(self, ray_session, tmp_path):
        import ray.data as rd
        import pandas as pd

        from pkd_tree_ray.fixtures import varden_xy, point_pair_boxes
        from pkd_tree_ray.queries import range_count

        idx, pid, x, y = self._build(tmp_path)
        victims = pid[::97]
        vx, vy = x[::97], y[::97]
        idx2 = idx.delete(
            rd.from_pandas(pd.DataFrame({"point_id": victims, "x": vx, "y": vy})),
            strict=True,
        )
        # tombstones, not rewrites: base files unchanged, tomb files added
        assert idx2.tomb_files, "expected tombstone sidecars"
        assert idx2.cell_files == idx.cell_files
        assert idx2.total_rows == len(pid) - len(victims)
        keep = np.ones(len(pid), dtype=bool)
        keep[::97] = False
        boxes = point_pair_boxes(x, y, 15)
        got = range_count(idx2, boxes).to_pandas()["cnt"].to_numpy()
        for bi, b in enumerate(boxes):
            exp = int(
                np.sum(
                    (x[keep] >= b[0]) & (x[keep] <= b[2])
                    & (y[keep] >= b[1]) & (y[keep] <= b[3])
                )
            )
            assert got[bi] == exp

    def test_double_delete_fails_strict(self, ray_session, tmp_path):
        import ray.data as rd
        import pandas as pd

        idx, pid, x, y = self._build(tmp_path)
        d = pd.DataFrame({"point_id": pid[:50], "x": x[:50], "y": y[:50]})
        idx2 = idx.delete(rd.from_pandas(d), strict=True)
        with pytest.raises(ValueError):
            idx2.delete(rd.from_pandas(d), strict=True)

    def test_reinsert_after_tombstone_compacts(self, ray_session, tmp_path):
        import ray.data as rd
        import pandas as pd

        idx, pid, x, y = self._build(tmp_path)
        d = pd.DataFrame({"point_id": pid[:80], "x": x[:80], "y": y[:80]})
        idx2 = idx.delete(rd.from_pandas(d), strict=True)
        idx3 = idx2.insert(rd.from_pandas(d))  # same ids come back
        assert idx3.total_rows == len(pid)
        # the touched cells compacted: their tombstones are gone
        from pkd_tree_ray.queries import knn

        res = knn(idx3, x[:80].copy(), y[:80].copy(), 1).to_pandas()
        assert (res["dist2"] == 0).all()

    def test_heavy_delete_compacts(self, ray_session, tmp_path):
        import ray.data as rd
        import pandas as pd

        idx, pid, x, y = self._build(tmp_path)
        half = pd.DataFrame({"point_id": pid[::2], "x": x[::2], "y": y[::2]})
        idx2 = idx.delete(rd.from_pandas(half), strict=True)
        assert idx2.total_rows == len(pid) - len(half)
        # ~50% >> tomb_compact_frac -> the heavy cells physically
        # rewrite; at most a few edge cells (delta fraction exactly at
        # the threshold) may legitimately tombstone
        assert len(idx2.tomb_files) <= 2


class TestSplitReroute:
    """Regression (ADVICE r1): a hot-cell split must compact the split
    parent so its resident rows re-route under the new directory —
    child 0 shares the parent's Morton start, so a start-set test never
    detects the split and rows stay filed under an aliased cell id."""

    def test_strict_delete_of_old_rows_after_split(self, ray_session, tmp_path):
        import ray.data as rd
        from pkd_tree_ray.queries import knn, range_count
        from tests.oracle import knn_oracle

        idx, ids, x, y = _mk_index(tmp_path)
        n = len(ids)
        m = 4 * CFG.split_threshold
        hx = 500_000 + (np.arange(m, dtype=np.int64) % 100)
        hy = 500_000 + ((np.arange(m, dtype=np.int64) * 7) % 100)
        iids = np.arange(n, n + m, dtype=np.int64)
        idx2 = idx.insert(rd.from_arrow(_table(iids, hx, hy)))
        assert len(idx2.directory) > len(idx.directory)  # split happened

        # strict delete of 500 PRE-EXISTING rows must succeed: their
        # coordinates now route to the split children, so the children
        # must actually hold them
        sel = slice(0, 500)
        idx3 = idx2.delete(rd.from_arrow(_table(ids[sel], x[sel], y[sel])), strict=True)
        assert idx3.total_rows == n + m - 500

        # every row is physically filed under the cell the directory
        # routes its coordinates to
        idx3.validate()

        # queries over the survivors stay exact
        ax = np.concatenate([x[500:], hx])
        ay = np.concatenate([y[500:], hy])
        aid = np.concatenate([ids[500:], iids])
        qx, qy = ax[::1500], ay[::1500]
        df = knn(idx3, qx, qy, 5).to_pandas().sort_values(["qid", "rank"])
        oracle = knn_oracle(ax, ay, aid, qx, qy, 5)
        for q in range(len(qx)):
            assert df[df["qid"] == q]["dist2"].tolist() == [e[0] for e in oracle[q]]

    def test_partial_delete_after_split_deletes(self, ray_session, tmp_path):
        """strict=False after a split must actually delete the rows
        (the bug made it silently delete nothing)."""
        import ray.data as rd

        idx, ids, x, y = _mk_index(tmp_path)
        n = len(ids)
        m = 4 * CFG.split_threshold
        hx = 500_000 + (np.arange(m, dtype=np.int64) % 100)
        hy = 500_000 + ((np.arange(m, dtype=np.int64) * 7) % 100)
        idx2 = idx.insert(rd.from_arrow(_table(np.arange(n, n + m), hx, hy)))
        idx3 = idx2.delete(
            rd.from_arrow(_table(ids[:300], x[:300], y[:300])), strict=False
        )
        assert idx3.total_rows == n + m - 300


class TestKnnTieBreak:
    """Regression (ADVICE r1): fragment-level top-k cuts must not drop
    the smaller-id neighbor when candidates tie at the kth distance."""

    def test_brute_kernel_prefers_smaller_key_on_ties(self):
        from pkd_tree_ray.kdtree import brute_knn_batch

        # 8 points all at distance 25 from the query, ids reversed
        # relative to array order so positional tie-breaks differ
        qx = np.array([0], dtype=np.int64)
        qy = np.array([0], dtype=np.int64)
        px = np.array([5, -5, 0, 0, 3, -3, 4, -4], dtype=np.int64)
        py = np.array([0, 0, 5, -5, 4, 4, -3, 3], dtype=np.int64)
        ids = np.array([70, 60, 50, 40, 30, 20, 10, 0], dtype=np.int64)
        idx, d2 = brute_knn_batch(px, py, qx, qy, 3, tie_key=ids)
        assert sorted(ids[idx[0]].tolist()) == [0, 10, 20]
        assert (d2 == 25).all()

    def test_kdtree_knn_prefers_smaller_key_on_ties(self):
        from pkd_tree_ray.kdtree import KDTree2D

        rng = np.random.default_rng(7)
        # ring of ties + background noise
        tx = np.array([5, -5, 0, 0, 3, -3, 4, -4], dtype=np.int64) + 1000
        ty = np.array([0, 0, 5, -5, 4, 4, -3, 3], dtype=np.int64) + 1000
        bx = rng.integers(0, 2000, 200)
        by = rng.integers(0, 2000, 200)
        # keep background strictly farther than the ring
        far = ((bx - 1000) ** 2 + (by - 1000) ** 2) > 25
        px = np.concatenate([tx, bx[far]])
        py = np.concatenate([ty, by[far]])
        ids = np.arange(len(px), dtype=np.int64)[::-1].copy()  # reversed ids
        tree = KDTree2D(px, py, tie_key=ids)
        idx, d2, _ = tree.knn(1000, 1000, 3)
        assert (d2 == 25).all()
        # the 3 smallest ids among the 8 tied ring points
        ring_ids = np.sort(ids[:8])[:3]
        assert sorted(ids[idx].tolist()) == ring_ids.tolist()

    def test_end_to_end_knn_tie_break_matches_oracle(self, ray_session, tmp_path):
        """Duplicate-coordinate clusters: the pipeline result must equal
        the (dist2, point_id)-ordered oracle exactly."""
        import ray.data as rd
        from pkd_tree_ray.queries import knn
        from tests.oracle import knn_oracle

        rng = np.random.default_rng(11)
        base_x = rng.integers(0, 1 << 20, 400).astype(np.int64)
        base_y = rng.integers(0, 1 << 20, 400).astype(np.int64)
        # replicate every point 4x -> guaranteed dist2 ties everywhere
        x = np.repeat(base_x, 4)
        y = np.repeat(base_y, 4)
        ids = rng.permutation(len(x)).astype(np.int64)
        idx = PkdIndex.build(
            rd.from_arrow(_table(ids, x, y)), str(tmp_path), CFG, id_col="point_id"
        )
        qx, qy = base_x[:25], base_y[:25]
        df = knn(idx, qx, qy, 6).to_pandas().sort_values(["qid", "rank"])
        oracle = knn_oracle(x, y, ids, qx, qy, 6)
        for q in range(len(qx)):
            sub = df[df["qid"] == q]
            assert sub["dist2"].tolist() == [e[0] for e in oracle[q]]
            assert sub["neighbor"].tolist() == [e[1] for e in oracle[q]]


class TestMergeAndVacuum:
    """THIN_LEAVE_WRAP analog + vacuum (r1 missing items #3)."""

    def test_heavy_delete_merges_cells_and_vacuum_frees_disk(self, ray_session, tmp_path):
        import glob
        import os

        import ray.data as rd
        from pkd_tree_ray.queries import knn, range_count
        from tests.oracle import knn_oracle, range_count_oracle

        idx, ids, x, y = _mk_index(tmp_path, n=8_000)
        cells_before = len(idx.directory)
        assert cells_before > 4  # enough leaves to have sibling groups

        # delete 95% of rows -> most sibling groups fall below
        # merge_factor x target and coarsen
        sel = ids % 20 != 0
        idx2 = idx.delete(rd.from_arrow(_table(ids[sel], x[sel], y[sel])), strict=True)
        assert idx2.total_rows == int((~sel).sum())
        assert len(idx2.directory) < cells_before  # directory shrank
        idx2.validate()

        # queries over survivors stay exact
        rx, ry, rid = x[~sel], y[~sel], ids[~sel]
        boxes = point_pair_boxes(rx, ry, 10)
        got = range_count(idx2, boxes).to_pandas()["cnt"].to_numpy()
        for q, box in enumerate(boxes):
            assert got[q] == range_count_oracle(rx, ry, box)
        df = knn(idx2, rx[:10], ry[:10], 5).to_pandas().sort_values(["qid", "rank"])
        oracle = knn_oracle(rx, ry, rid, rx[:10], ry[:10], 5)
        for q in range(10):
            assert df[df["qid"] == q]["dist2"].tolist() == [e[0] for e in oracle[q]]

        # vacuum: superseded v0 files disappear, disk usage shrinks,
        # the index still answers correctly
        def usage():
            return sum(
                os.path.getsize(f)
                for f in glob.glob(os.path.join(str(tmp_path), "parts", "*.parquet"))
            )

        before = usage()
        stats = idx2.vacuum()
        assert stats["files_removed"] > 0
        assert usage() < before
        got2 = range_count(idx2, boxes).to_pandas()["cnt"].to_numpy()
        assert (got2 == got).all()

    def test_vacuum_keeps_all_referenced_files(self, ray_session, tmp_path):
        import ray.data as rd
        from pkd_tree_ray.queries import range_count
        from tests.oracle import range_count_oracle

        idx, ids, x, y = _mk_index(tmp_path, n=2_000)
        ix, iy = uniform_xy(np.arange(100, dtype=np.uint64), seed=99)
        idx2 = idx.insert(rd.from_arrow(_table(np.arange(90_000, 90_100), ix, iy)))
        idx2.vacuum()
        ax, ay = np.concatenate([x, ix]), np.concatenate([y, iy])
        boxes = point_pair_boxes(ax, ay, 8)
        got = range_count(idx2, boxes).to_pandas()["cnt"].to_numpy()
        for q, box in enumerate(boxes):
            assert got[q] == range_count_oracle(ax, ay, box)


class TestImbalancePolicy:
    """imbalance_alpha as a live rebuild policy (tag_inbalance_node,
    inner_tree.hpp:78-148; the INBALANCE_RATIO sweep, test.cpp bit10):
    a cell compacts when its unindexed sidecar fraction would exceed
    alpha."""

    def _mk(self, tmp_path, alpha):
        import ray.data as rd

        cfg = EngineConfig(
            target_cell_rows=512, batch_size=4_096, imbalance_alpha=alpha
        )
        n = 2_000
        x, y = uniform_xy(np.arange(n, dtype=np.uint64), 42)
        ids = np.arange(n, dtype=np.int64)
        idx = PkdIndex.build(
            rd.from_arrow(_table(ids, x, y)), str(tmp_path), cfg, id_col="point_id"
        )
        return idx, n

    @staticmethod
    def _n_sidecars(idx):
        return sum(
            1
            for fs in idx.cell_files.values()
            for f in fs
            if "-delta" in os.path.basename(f)
        )

    def test_small_insert_stays_sidecar(self, ray_session, tmp_path):
        import ray.data as rd

        idx, n = self._mk(tmp_path, alpha=0.3)
        m = max(1, n // 100)  # 1% — far below alpha per cell
        ix, iy = uniform_xy(np.arange(m, dtype=np.uint64), 43)
        idx2 = idx.insert(rd.from_arrow(_table(np.arange(n, n + m), ix, iy)))
        assert self._n_sidecars(idx2) > 0
        assert idx2.total_rows == n + m

    def test_large_insert_triggers_alpha_rebuild(self, ray_session, tmp_path):
        import ray.data as rd
        from pkd_tree_ray.queries import range_count

        idx, n = self._mk(tmp_path, alpha=0.3)
        m = n  # 100% insert: every cell's sidecar fraction ~0.5 > 0.3
        ix, iy = uniform_xy(np.arange(m, dtype=np.uint64), 43)
        iids = np.arange(n, n + m, dtype=np.int64)
        idx2 = idx.insert(rd.from_arrow(_table(iids, ix, iy)))
        assert self._n_sidecars(idx2) == 0  # alpha forced compaction
        assert idx2.total_rows == 2 * n
        # correctness after the rebuild
        x, y = uniform_xy(np.arange(n, dtype=np.uint64), 42)
        ax, ay = np.concatenate([x, ix]), np.concatenate([y, iy])
        boxes = point_pair_boxes(ax, ay, 10)
        got = range_count(idx2, boxes).to_pandas()["cnt"].to_numpy()
        for q, box in enumerate(boxes):
            assert got[q] == range_count_oracle(ax, ay, box)

    def test_strict_alpha_rebuilds_more_often(self, ray_session, tmp_path):
        """alpha ~ 0 (strict balance) compacts on every insert where a
        lax alpha absorbs it as a sidecar — the policy is live."""
        import ray.data as rd

        strict, n = self._mk(tmp_path / "s", alpha=0.01)
        lax, _ = self._mk(tmp_path / "l", alpha=0.45)
        m = n // 10  # 10%: above 1% bound, below 45% bound
        ix, iy = uniform_xy(np.arange(m, dtype=np.uint64), 43)
        t = _table(np.arange(n, n + m), ix, iy)
        s2 = strict.insert(rd.from_arrow(t))
        l2 = lax.insert(rd.from_arrow(t))
        assert self._n_sidecars(s2) == 0
        assert self._n_sidecars(l2) > 0
        assert s2.total_rows == l2.total_rows == n + m


class TestBranchedUpdates:
    def test_two_different_inserts_from_same_version(self, ray_session, tmp_path):
        """Functional-update branching (r2 regression): two DIFFERENT
        deltas inserted off the same base version must not collide on
        version-numbered files — blind resume dropped the second delta
        (strict delete then reported missing rows)."""
        import ray.data as rd

        idx, ids, x, y = _mk_index(tmp_path, n=2_000)
        n = len(ids)
        ax_, ay_ = uniform_xy(np.arange(50, dtype=np.uint64), seed=50)
        bx_, by_ = uniform_xy(np.arange(50, dtype=np.uint64), seed=51)
        ta = _table(np.arange(n, n + 50), ax_, ay_)
        tb = _table(np.arange(n + 100, n + 150), bx_, by_)
        ia = idx.insert(rd.from_arrow(ta))
        ib = idx.insert(rd.from_arrow(tb))  # same new version number
        assert ia.total_rows == ib.total_rows == n + 50
        # each branch holds exactly its own delta: strict delete works
        ib2 = ib.delete(rd.from_arrow(tb), strict=True)
        assert ib2.total_rows == n
        ia2 = ia.delete(rd.from_arrow(ta), strict=True)
        assert ia2.total_rows == n
        # and branch A never held B's rows
        with pytest.raises(ValueError):
            ia.delete(rd.from_arrow(tb), strict=True)

    def test_branched_tombstones_with_identical_footer_stats(self, ray_session, tmp_path):
        """ADVICE r2 (medium): two deletes branched off the same base
        whose tombstone sets coincide in count AND per-column min/max
        ({1,5,9} vs {1,6,9}) defeat the stats-only resume check; the
        footer content token must keep them distinct."""
        import ray.data as rd
        from pkd_tree_ray.config import EngineConfig
        from pkd_tree_ray.index import PkdIndex

        cfg = EngineConfig(target_cell_rows=100_000, batch_size=4_096)
        n = 2_000
        x, y = uniform_xy(np.arange(n, dtype=np.uint64), 42)
        ids = np.arange(n, dtype=np.int64)
        idx = PkdIndex.build(
            rd.from_arrow(_table(ids, x, y)), str(tmp_path), cfg, id_col="point_id"
        )
        assert len(idx.cell_files) == 1  # single cell: forced collision
        sa = np.array([1, 5, 9])
        sb = np.array([1, 6, 9])  # same count, same min/max id
        ia = idx.delete(rd.from_arrow(_table(ids[sa], x[sa], y[sa])), strict=True)
        ib = idx.delete(rd.from_arrow(_table(ids[sb], x[sb], y[sb])), strict=True)
        live_a = set(ia.scan_all(columns=["point_id"]).to_pandas()["point_id"])
        live_b = set(ib.scan_all(columns=["point_id"]).to_pandas()["point_id"])
        assert ia.total_rows == ib.total_rows == n - 3
        assert 6 in live_a and 5 not in live_a
        assert 5 in live_b and 6 not in live_b

    def test_crash_resume_same_delta_reuses_files(self, ray_session, tmp_path):
        """The resume contract itself still holds: re-running the SAME
        insert (same base version, same delta) reuses the files."""
        import glob
        import ray.data as rd

        idx, ids, x, y = _mk_index(tmp_path, n=2_000)
        n = len(ids)
        ix, iy = uniform_xy(np.arange(40, dtype=np.uint64), seed=50)
        t = _table(np.arange(n, n + 40), ix, iy)
        i1 = idx.insert(rd.from_arrow(t))
        files_before = set(glob.glob(str(tmp_path) + "/parts/*.parquet"))
        i2 = idx.insert(rd.from_arrow(t))  # identical job re-run
        files_after = set(glob.glob(str(tmp_path) + "/parts/*.parquet"))
        assert files_after == files_before  # no new files
        assert i2.total_rows == i1.total_rows == n + 40


class TestDirectCompaction:
    """The shuffle-free compaction path (``_compact_cells_direct``):
    a directory-stable update rewrites each compacted cell from its
    own files via raw per-cell tasks instead of a groupby exchange."""

    def _spy(self, monkeypatch):
        import pkd_tree_ray.index as mod

        calls = []
        orig = mod.PkdIndex._compact_cells_direct

        def wrapper(self, cells, tbl, op, version, resume):
            calls.append((list(cells), op))
            return orig(self, cells, tbl, op, version, resume)

        monkeypatch.setattr(mod.PkdIndex, "_compact_cells_direct", wrapper)
        return calls

    def test_delete_heavy_compacts_direct(self, ray_session, tmp_path, monkeypatch):
        """A 40% delete exceeds tomb_compact_frac in every cell but
        merges none (post-count >> merge threshold) -> the direct path
        runs and results are exact vs brute force."""
        import ray.data as rd
        from pkd_tree_ray.index import _OP_DELETE
        from pkd_tree_ray.queries import knn, range_count

        calls = self._spy(monkeypatch)
        idx, ids, x, y = _mk_index(tmp_path, n=4_000)
        n = len(ids)
        sel = np.arange(0, n, 5)  # every 5th then every other 5th: 40%
        sel = np.union1d(sel, np.arange(1, n, 5))
        idx2 = idx.delete(rd.from_arrow(_table(ids[sel], x[sel], y[sel])), strict=True)
        assert calls and calls[0][1] == _OP_DELETE
        keep = np.setdiff1d(np.arange(n), sel)
        assert idx2.total_rows == len(keep)
        # no tombstones survive a compaction
        compacted = set(calls[0][0])
        assert not any(idx2.tomb_files.get(c) for c in compacted)
        ax, ay, aid = x[keep], y[keep], ids[keep]
        boxes = point_pair_boxes(ax, ay, 16)
        got = range_count(idx2, boxes).to_pandas()["cnt"].to_numpy()
        for q, box in enumerate(boxes):
            assert got[q] == range_count_oracle(ax, ay, box)
        qx, qy = ax[:8], ay[:8]
        df = knn(idx2, qx, qy, 10).to_pandas().sort_values(["qid", "rank"])
        oracle = knn_oracle(ax, ay, aid, qx, qy, 10)
        for q in range(len(qx)):
            assert df[df["qid"] == q]["dist2"].tolist() == [e[0] for e in oracle[q]]

    def test_insert_alpha_compacts_direct(self, ray_session, tmp_path, monkeypatch):
        """A 40% insert violates imbalance_alpha (0.3) in every cell
        without splitting any (counts stay under split_threshold) ->
        the direct INSERT path runs; union results are exact."""
        import ray.data as rd
        from pkd_tree_ray.index import _OP_INSERT
        from pkd_tree_ray.queries import range_count

        calls = self._spy(monkeypatch)
        idx, ids, x, y = _mk_index(tmp_path, n=4_000)
        n = len(ids)
        m = int(n * 0.4)
        ix, iy = uniform_xy(np.arange(m, dtype=np.uint64), seed=91)
        iids = np.arange(n, n + m, dtype=np.int64)
        idx2 = idx.insert(rd.from_arrow(_table(iids, ix, iy)))
        assert calls and calls[0][1] == _OP_INSERT
        assert idx2.total_rows == n + m
        ax, ay = np.concatenate([x, ix]), np.concatenate([y, iy])
        boxes = point_pair_boxes(ax, ay, 16)
        got = range_count(idx2, boxes).to_pandas()["cnt"].to_numpy()
        for q, box in enumerate(boxes):
            assert got[q] == range_count_oracle(ax, ay, box)

    def test_direct_resume_reuses_files(self, ray_session, tmp_path):
        """Re-running the SAME heavy delete reuses the compacted files
        (content-token resume through the direct path)."""
        import glob
        import ray.data as rd

        idx, ids, x, y = _mk_index(tmp_path, n=4_000)
        n = len(ids)
        sel = np.union1d(np.arange(0, n, 5), np.arange(1, n, 5))
        t = _table(ids[sel], x[sel], y[sel])
        d1 = idx.delete(rd.from_arrow(t), strict=True)
        files_before = set(glob.glob(str(tmp_path) + "/parts/*.parquet"))
        d2 = idx.delete(rd.from_arrow(t), strict=True)
        files_after = set(glob.glob(str(tmp_path) + "/parts/*.parquet"))
        assert files_after == files_before
        assert d2.total_rows == d1.total_rows == n - len(sel)

    def test_strict_violation_still_raises(self, ray_session, tmp_path):
        """FullCovered semantics survive the direct path: deleting a
        nonexistent id through a compacting delete raises."""
        import ray.data as rd

        idx, ids, x, y = _mk_index(tmp_path, n=4_000)
        n = len(ids)
        sel = np.union1d(np.arange(0, n, 5), np.arange(1, n, 5))
        bad_ids = ids[sel].copy()
        bad_ids[0] = n + 999  # not in the index
        with pytest.raises(ValueError, match="strict"):
            idx.delete(rd.from_arrow(_table(bad_ids, x[sel], y[sel])), strict=True)


class TestStringIds:
    def test_build_delete_with_string_ids(self, ray_session, tmp_path):
        """String id column through build, tombstone delete AND
        compacting delete — exercises the sorted-membership kernels
        (_in_sorted) on object arrays and the id-stats pruning
        fallback for non-numeric ids."""
        import ray.data as rd
        from pkd_tree_ray.queries import range_count

        n = 2_000
        x, y = uniform_xy(np.arange(n, dtype=np.uint64), 7)
        ids = np.array([f"doc-{i:06d}" for i in range(n)], dtype=object)
        t = pa.table({"point_id": pa.array(ids, pa.string()), "x": x, "y": y})
        idx = PkdIndex.build(
            rd.from_arrow(t), str(tmp_path), CFG, id_col="point_id"
        )
        assert idx.id_type in ("string", "large_string")
        # small tombstone delete (1%)
        sel = np.arange(0, n, 100)
        d1 = pa.table(
            {"point_id": pa.array(ids[sel], pa.string()), "x": x[sel], "y": y[sel]}
        )
        idx2 = idx.delete(rd.from_arrow(d1), strict=True)
        assert idx2.total_rows == n - len(sel)
        # heavy compacting delete (40%)
        sel2 = np.union1d(np.arange(1, n, 5), np.arange(2, n, 5))
        sel2 = np.setdiff1d(sel2, sel)
        d2 = pa.table(
            {"point_id": pa.array(ids[sel2], pa.string()), "x": x[sel2], "y": y[sel2]}
        )
        idx3 = idx2.delete(rd.from_arrow(d2), strict=True)
        keep = np.setdiff1d(np.arange(n), np.union1d(sel, sel2))
        assert idx3.total_rows == len(keep)
        boxes = point_pair_boxes(x[keep], y[keep], 10)
        got = range_count(idx3, boxes).to_pandas()["cnt"].to_numpy()
        for q, box in enumerate(boxes):
            assert got[q] == range_count_oracle(x[keep], y[keep], box)
