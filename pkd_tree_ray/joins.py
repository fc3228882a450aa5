"""Spatial joins and tiling — the north-star extensions (SURVEY.md
§7.2 M5).  All are compositions of the primitive query pipelines, as
the reference's join-like drivers are compositions of
``range_count``/``range_query``/``k_nearest`` (SURVEY.md §2.7
"Joins/lookups").

* point-in-polygon join: polygon -> covering cells via the directory
  (cells whose bbox lies fully inside the convex polygon are counted /
  emitted with NO per-point test — the contained-subtree shortcut);
  boundary cells get the exact vectorized half-plane test;
* kNN join: the two-phase kNN pipeline with the query side taken from
  a (small) keyed table, broadcast via ``ray.put``;
* raster-tile <-> vector assignment: fixed-resolution tile id is pure
  arithmetic per row; the aggregate is a partial-agg ``map_batches``
  followed by a tiny ``groupby`` — the pre-aggregation pattern, so the
  all-to-all shuffle moves one row per (batch, tile) instead of one
  per point.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from pkd_tree_ray.geometry import (
    is_convex,
    p2b_min_dist2,
    points_in_convex_polygon,
    points_in_polygon,
    polygon_bbox,
    segments_intersect_box,
)


def _poly_mask(x: np.ndarray, y: np.ndarray, verts: np.ndarray, convex: bool) -> np.ndarray:
    """Membership dispatch: convex polygons keep the boundary-inclusive
    half-plane conjunction (the original oracle semantics); arbitrary
    simple polygons use the integer-exact even-odd crossing rule."""
    if convex:
        return points_in_convex_polygon(x, y, verts)
    return points_in_polygon(x, y, verts)
from pkd_tree_ray.hashing import COORD_MOD
from pkd_tree_ray.index import PkdIndex, _in_sorted
from pkd_tree_ray.queries import _Pairs, _csr, _iter_cell_runs, _live, _pool_size, _scan_stage, knn


# ----------------------------------------------------------------------
# point-in-polygon
# ----------------------------------------------------------------------

def _classify_polygons(index: PkdIndex, polys: list[np.ndarray]):
    """Per polygon: contained-cell base counts + partial cells.
    A cell bbox is inside a convex polygon iff all 4 corners are; for a
    NON-convex simple polygon the corners must be inside AND no polygon
    edge may cross the bbox (corners-inside alone admits bboxes that a
    concavity bites into)."""
    cells, counts, bboxes = _live(index)
    base = np.zeros(len(polys), dtype=np.int64)
    if len(cells) == 0:
        empty = _Pairs(np.zeros(0, np.int64), np.zeros(0, np.int64))
        return base, empty, empty
    corners = [
        (bboxes[:, 0], bboxes[:, 1]),
        (bboxes[:, 0], bboxes[:, 3]),
        (bboxes[:, 2], bboxes[:, 1]),
        (bboxes[:, 2], bboxes[:, 3]),
    ]
    full_parts, part_parts = [], []
    for pi, verts in enumerate(polys):
        convex = is_convex(verts)
        inside = np.ones(len(cells), dtype=bool)
        for cx, cy in corners:
            inside &= _poly_mask(cx, cy, verts, convex)
        if not convex:
            boxes4 = np.stack(
                [bboxes[:, 0], bboxes[:, 1], bboxes[:, 2], bboxes[:, 3]], axis=1
            )
            inside &= ~segments_intersect_box(verts, boxes4)
        pb = polygon_bbox(verts)
        overlap = (
            (bboxes[:, 0] <= pb[2])
            & (bboxes[:, 2] >= pb[0])
            & (bboxes[:, 1] <= pb[3])
            & (bboxes[:, 3] >= pb[1])
        )
        partial = overlap & ~inside
        base[pi] = counts[inside].sum()
        ci = np.nonzero(inside)[0]
        full_parts.append(_Pairs(cells[ci], np.full(len(ci), pi, dtype=np.int64)))
        ci = np.nonzero(partial)[0]
        part_parts.append(_Pairs(cells[ci], np.full(len(ci), pi, dtype=np.int64)))
    return base, _Pairs.concat(full_parts), _Pairs.concat(part_parts)


class _PipScan:
    """Actor: exact point-in-polygon tests in boundary cells."""

    def __init__(self, ref, id_col: str | None):
        polys, (cells, offs, qids) = ray.get(ref)
        self.polys = polys
        self.convex = [is_convex(v) for v in polys]
        self.cells, self.offs, self.qids = cells, offs, qids
        self.id_col = id_col  # None -> count mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        cell_col = batch["cell"].to_numpy()
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        out_p: list[np.ndarray] = []
        out_v: list[np.ndarray] = []
        for cell, sl in _iter_cell_runs(cell_col):
            i = np.searchsorted(self.cells, cell)
            if i >= len(self.cells) or self.cells[i] != cell:
                continue
            for pi in self.qids[self.offs[i]: self.offs[i + 1]]:
                m = _poly_mask(x[sl], y[sl], self.polys[pi], self.convex[pi])
                if self.id_col is None:
                    out_p.append(np.array([pi], dtype=np.int64))
                    out_v.append(np.array([int(m.sum())], dtype=np.int64))
                else:
                    rows = np.arange(sl.start, sl.stop, dtype=np.int64)[m]
                    out_p.append(np.full(len(rows), pi, dtype=np.int64))
                    out_v.append(rows)
        if self.id_col is None:
            if not out_p:
                return pa.table(
                    {"poly_id": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
                )
            return pa.table(
                {"poly_id": np.concatenate(out_p), "cnt": np.concatenate(out_v)}
            )
        if not out_p:
            return pa.table(
                {
                    "poly_id": pa.array([], pa.int64()),
                    self.id_col: pa.array([], batch[self.id_col].type),
                }
            )
        rows_all = np.concatenate(out_v)
        return pa.table(
            {
                "poly_id": pa.array(np.concatenate(out_p), pa.int64()),
                self.id_col: batch.take(pa.array(rows_all))[self.id_col],
            }
        )


def point_in_polygon_count(index: PkdIndex, polys: list[np.ndarray]) -> pa.Table:
    """-> (poly_id, cnt): points inside each convex polygon
    (boundary-inclusive)."""
    cfg = index.config
    base, full_map, part_map = _classify_polygons(index, polys)
    total = base.copy()
    if part_map:
        ref = ray.put((polys, _csr(part_map)))
        from ray.data.aggregate import Sum

        partial = (
            _scan_stage(
                index.scan_cells(part_map.cell_list(), columns=["cell", "x", "y"]),
                _PipScan,
                (ref, None),
                cfg,
                len(part_map.cell_list()),
            )
            .groupby("poly_id")
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas()
        )
        if len(partial):
            total[partial["poly_id"].to_numpy(dtype=np.int64)] += partial["cnt"].to_numpy(
                dtype=np.int64
            )
    return pa.table({"poly_id": np.arange(len(polys), dtype=np.int64), "cnt": total})


def point_in_polygon_join(index: PkdIndex, polys: list[np.ndarray]):
    """-> streaming Dataset (poly_id, <id>): the join rows.  Cells
    fully inside a polygon are emitted without per-point tests."""
    cfg = index.config
    _, full_map, part_map = _classify_polygons(index, polys)
    id_col = index.id_col

    full_ref = ray.put((polys, _csr(full_map)))
    part_ref = ray.put((polys, _csr(part_map)))

    class _PipEmit:
        def __init__(self):
            polys_, full = ray.get(full_ref)
            _, part = ray.get(part_ref)
            self.inner = _PipScan.__new__(_PipScan)
            self.inner.polys = polys_
            self.inner.convex = [is_convex(v) for v in polys_]
            self.inner.cells, self.inner.offs, self.inner.qids = part
            self.inner.id_col = id_col
            self.f_cells, self.f_offs, self.f_qids = full

        def __call__(self, batch: pa.Table) -> pa.Table:
            parts = [self.inner(batch)]
            cell_col = batch["cell"].to_numpy()
            for cell, sl in _iter_cell_runs(cell_col):
                i = np.searchsorted(self.f_cells, cell)
                if i >= len(self.f_cells) or self.f_cells[i] != cell:
                    continue
                ids = batch.slice(sl.start, sl.stop - sl.start)[id_col]
                for pi in self.f_qids[self.f_offs[i]: self.f_offs[i + 1]]:
                    parts.append(
                        pa.table(
                            {
                                "poly_id": pa.array(
                                    np.full(len(ids), pi, dtype=np.int64)
                                ),
                                id_col: ids,
                            }
                        )
                    )
            return pa.concat_tables(parts)

    needed = sorted(set(full_map.cell_list()) | set(part_map.cell_list()))
    return index.scan_cells(needed, columns=["cell", id_col, "x", "y"]).map_batches(
        _PipEmit,
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=_pool_size(cfg, len(needed)),
    )


# ----------------------------------------------------------------------
# kNN join
# ----------------------------------------------------------------------

#: window size for the left side of knn_join (rows): the driver holds
#: at most one window of (key, x, y) at a time — a larger left Dataset
#: is processed as independent sequential windows whose results union,
#: so driver memory stays bounded at any left-side scale.
KNN_JOIN_LEFT_CAP = 5_000_000

#: knn_graph boundary-repair window: each driver-resident repair slice
#: holds at most this many pending points (a clustered corpus can make
#: the boundary fraction large, so the repair must not assume "thin")
KNN_GRAPH_REPAIR_CAP = 1_000_000


def _knn_join_window(index: PkdIndex, left: pa.Table, key_col: str, k: int):
    """One bounded window of the join: broadcast the window's queries,
    run the distributed kNN, remap qid -> key."""
    keys = left[key_col].to_numpy()
    qx = left["x"].to_numpy()
    qy = left["y"].to_numpy()
    res = knn(index, qx, qy, k)

    def remap(batch: pa.Table, ks=keys) -> pa.Table:
        return pa.table(
            {
                key_col: pa.array(ks[batch["qid"].to_numpy()]),
                "rank": batch["rank"],
                "neighbor": batch["neighbor"],
                "dist2": batch["dist2"],
            }
        )

    if isinstance(res, pa.Table):
        return remap(res)
    key_ref = ray.put(keys)
    return res.map_batches(
        lambda t: remap(t, ray.get(key_ref)), batch_format="pyarrow"
    )


def knn_join(index: PkdIndex, left, key_col: str, k: int):
    """kNN join of a keyed query table (columns key_col, x, y) against
    the indexed points -> Table or Dataset (<key_col>, rank, neighbor,
    dist2).

    ``left`` may be a pyarrow Table or a Dataset.  Each window of
    ``KNN_JOIN_LEFT_CAP`` left rows is the broadcast-small side (the
    reference's query batches are 1% of the build side,
    ``testFramework.h:24``); a larger left streams through as
    independent sequential windows whose results union — no unbounded
    driver materialization at any left size.  Large RESULTS stream
    (``knn`` returns a ref-backed Dataset past the merge limit).
    """
    if isinstance(left, pa.Table):
        if left.num_rows <= KNN_JOIN_LEFT_CAP:
            return _knn_join_window(index, left, key_col, k)
        windows = [
            left.slice(s, KNN_JOIN_LEFT_CAP)
            for s in range(0, left.num_rows, KNN_JOIN_LEFT_CAP)
        ]
    else:
        windows = _iter_left_windows(left, key_col)
    import ray.data as _rd

    out = None
    for w in windows:
        part = _knn_join_window(index, w, key_col, k)
        if isinstance(part, pa.Table):
            part = _rd.from_arrow(part)
        out = part if out is None else out.union(part)
    if out is not None:
        return out
    # empty left: key column typed from the input, not assumed int64
    if isinstance(left, pa.Table):
        key_type = left.schema.field(key_col).type
    else:
        sch = left.schema()
        key_type = sch.base_schema.field(key_col).type if hasattr(sch, "base_schema") else pa.int64()
    return pa.table(
        {
            key_col: pa.array([], key_type),
            "rank": pa.array([], pa.int64()),
            "neighbor": pa.array([], pa.int64()),
            "dist2": pa.array([], pa.int64()),
        }
    )


def _iter_left_windows(left, key_col: str, cap: int = KNN_JOIN_LEFT_CAP):
    """Yield <= ``cap``-row pyarrow windows of a left Dataset without
    ever holding more than one window (plus one input block) on the
    driver.  The drain loop is a ``while`` so a single oversized input
    block still splits into cap-sized windows."""
    buf: list[pa.Table] = []
    buffered = 0
    for b in left.select_columns([key_col, "x", "y"]).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        t = pa.table(b) if not isinstance(b, pa.Table) else b
        buf.append(t)
        buffered += t.num_rows
        while buffered >= cap:
            whole = pa.concat_tables(buf)
            yield whole.slice(0, cap)
            rest = whole.slice(cap)
            buf = [rest] if rest.num_rows else []
            buffered = rest.num_rows
    if buffered:
        yield pa.concat_tables(buf)


# ----------------------------------------------------------------------
# raster tiles
# ----------------------------------------------------------------------

def _finality_candidates(pos: int, bboxes: np.ndarray, dk2_max: int) -> np.ndarray:
    """Indices of foreign cells whose bbox lies within ``dk2_max``
    (squared) of cell ``pos``'s bbox — the only cells that can break
    any home point's kNN finality.  Box-to-box min distance: per-dim
    gap, clamped at 0.  O(C) per cell, replacing the O(n_cell x C)
    per-point matrix against all cells."""
    d = bboxes.shape[1] // 2
    home = bboxes[pos]
    lo, hi = bboxes[:, :d], bboxes[:, d:]
    gap = np.maximum(
        0, np.maximum(lo - home[d:][None, :], home[:d][None, :] - hi)
    ).astype(np.int64)
    b2b = (gap * gap).sum(axis=1)
    out = np.nonzero(b2b <= dk2_max)[0]
    return out[out != pos]


def knn_graph(index: PkdIndex, out_path: str, k: int, config=None):
    """Self-kNN graph sink (``generate_knn``, ``testFramework.h:742-815``):
    every indexed point is a query; the result is the edge table
    (src, dst, dist2) of each point's k nearest OTHER points, written as
    one Parquet file per cell (resumable: finished cell files are
    skipped on re-run) plus one repair file.  Returns the edge Dataset.

    Streaming shape: one task per cell reads ONLY that cell's file,
    answers its own points' kNN locally (cache-blocked brute kernel /
    per-partition tree), and is FINAL for every query whose kth-ball
    stays strictly inside the cell — no other cell's bbox intersects it
    (the sibling-prune test, ``nn_search.hpp:118-125``, applied at the
    directory level).  Only boundary queries (a thin O((k/n_cell)^0.5)
    fraction) spill to an exact global pass via :func:`~pkd_tree_ray.queries.knn`.
    The query side therefore never materializes on the driver.
    """
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from pkd_tree_ray.index import _atomic_write_table
    from pkd_tree_ray.kdtree import brute_knn_batch
    from pkd_tree_ray.queries import knn as knn_exact

    cfg = config or index.config
    cells, counts, bboxes = _live(index)
    id_col = index.id_col
    os.makedirs(os.path.join(out_path, "edges"), exist_ok=True)
    bref = ray.put((cells, bboxes))

    items = [
        {
            "cell": int(c),
            "files": list(index.cell_files[int(c)]),
            "tombs": list(index.tomb_files.get(int(c), [])),
            "pos": int(i),
        }
        for i, c in enumerate(cells)
        if int(c) in index.cell_files
    ]
    version = index.version

    def one_cell(batch: pa.Table) -> pa.Table:
        pending_id, pending_x, pending_y = [], [], []
        cells_, bboxes_ = _cached(bref)
        for row in range(batch.num_rows):
            cell = int(batch["cell"][row].as_py())
            pos = int(batch["pos"][row].as_py())
            final = os.path.join(out_path, "edges", f"cell-{cell:012x}-v{version}.parquet")
            fl = batch["files"][row].as_py()
            ts = [pq.read_table(f, columns=[id_col, "x", "y"]) for f in fl]
            t = pa.concat_tables(ts) if len(ts) > 1 else ts[0]
            tfl = batch["tombs"][row].as_py()
            if tfl:
                dead = np.unique(
                    np.concatenate(
                        [
                            pq.read_table(f, columns=[id_col])[id_col].to_numpy(
                                zero_copy_only=False
                            )
                            for f in tfl
                        ]
                    )
                )
                t = t.filter(
                    pa.array(~_in_sorted(t[id_col].to_numpy(zero_copy_only=False), dead))
                )
            ids = t[id_col].to_numpy(zero_copy_only=False)
            fx = t["x"].to_numpy()
            fy = t["y"].to_numpy()
            n = len(fx)
            if n == 0:
                continue
            kk = min(n, k + 2)
            # tie_key=ids: the kernel's cut keeps the smaller id on kth-
            # distance ties, so the lexsort below sees every candidate
            # that can appear in the exact (d2, id)-ordered top-k
            idx, d2 = brute_knn_batch(fx, fy, fx, fy, kk, tie_key=ids)
            cand_ids = ids[idx]
            # row-major per-query order: lexsort over the flattened
            # (qid, d2, id) triples
            flat_q = np.repeat(np.arange(n, dtype=np.int64), kk)
            flat_d = d2.ravel()
            flat_i = cand_ids.ravel()
            o = np.lexsort((flat_i, flat_d, flat_q))
            fq, fd, fi = flat_q[o], flat_d[o], flat_i[o]
            not_self = fi != ids[fq]
            fq, fd, fi = fq[not_self], fd[not_self], fi[not_self]
            # rank within query after self-drop
            uq, starts, cnts = np.unique(fq, return_index=True, return_counts=True)
            ranks = np.arange(len(fq), dtype=np.int64) - np.repeat(starts, cnts)
            keep = ranks < k
            fq, fd, fi, ranks = fq[keep], fd[keep], fi[keep], ranks[keep]
            # per-query kth distance (last kept rank); queries with < k
            # neighbors in-cell are never final
            uq2, starts2, cnts2 = np.unique(fq, return_index=True, return_counts=True)
            dk = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
            got_k = cnts2 >= k
            dk[uq2[got_k]] = fd[starts2[got_k] + k - 1]
            # boundary-tie guard: kth == (k+1)th candidate distance ->
            # the global pass must arbitrate the tie by id
            # finality: no OTHER cell's bbox within dk (strict).  Pre-
            # select candidate foreign cells by box-to-box distance
            # against the cell-wide max dk (every point lies inside the
            # home bbox, so a cell farther than max-dk from the home
            # BOX cannot break any point's finality) — the per-point
            # matrix then runs against the adjacent ring only, not all
            # C cells (r2 weak item: O(n x C) total).
            live = dk < np.iinfo(np.int64).max
            cand = (
                _finality_candidates(pos, bboxes_, int(dk[live].max()))
                if live.any()
                else np.empty(0, np.int64)
            )
            if cand.size:
                od2 = p2b_min_dist2(fx, fy, bboxes_[cand])
                is_final = (od2.min(axis=1) > dk) & live
            else:
                is_final = live
            pend = ~is_final
            if pend.any():
                pending_id.append(ids[pend])
                pending_x.append(fx[pend])
                pending_y.append(fy[pend])
            if not os.path.exists(final):
                emit = is_final[fq]
                _atomic_write_table(
                    pa.table(
                        {
                            "src": pa.array(ids[fq[emit]]),
                            "rank": pa.array(ranks[emit] + 1, pa.int64()),
                            "dst": pa.array(fi[emit]),
                            "dist2": pa.array(fd[emit], pa.int64()),
                        }
                    ),
                    final,
                )
        if not pending_id:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "x": pa.array([], pa.int64()),
                    "y": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "src": pa.array(np.concatenate(pending_id)),
                "x": pa.array(np.concatenate(pending_x), pa.int64()),
                "y": pa.array(np.concatenate(pending_y), pa.int64()),
            }
        )

    pending_ds = rd.from_items(items, override_num_blocks=len(items)).map_batches(
        one_cell, batch_size=1, batch_format="pyarrow"
    )

    def repair_window(w: pa.Table) -> pa.Table:
        src = w["src"].to_numpy()
        res = knn_exact(index, w["x"].to_numpy(), w["y"].to_numpy(), k + 1, cfg)
        rt = res.to_pandas() if hasattr(res, "to_pandas") else res
        rq = src[rt["qid"].to_numpy()]
        not_self = rt["neighbor"].to_numpy() != rq
        rq = rq[not_self]
        rn = rt["neighbor"].to_numpy()[not_self]
        rd2 = rt["dist2"].to_numpy()[not_self]
        o = np.lexsort((rn, rd2, rq))
        rq, rn, rd2 = rq[o], rn[o], rd2[o]
        uq, starts, cnts = np.unique(rq, return_index=True, return_counts=True)
        ranks = np.arange(len(rq), dtype=np.int64) - np.repeat(starts, cnts)
        keep = ranks < k
        return pa.table(
            {
                "src": pa.array(rq[keep]),
                "rank": pa.array(ranks[keep] + 1, pa.int64()),
                "dst": pa.array(rn[keep]),
                "dist2": pa.array(rd2[keep], pa.int64()),
            }
        )

    # boundary repair in bounded WINDOWS: the pending set (thin on
    # uniform data, potentially large on clustered corpora) streams
    # through cap-sized driver windows instead of one to_pandas(); each
    # window writes its own versioned file, so a killed run resumes at
    # window granularity, and the version-stamped done marker is
    # written only after every window landed (window boundaries are
    # deterministic per version: ordered iter_batches over the same
    # cell list)
    done_marker = os.path.join(out_path, "edges", f"repair-v{version}.parquet")
    missing = [
        it
        for it in items
        if not os.path.exists(
            os.path.join(
                out_path, "edges", f"cell-{it['cell']:012x}-v{version}.parquet"
            )
        )
    ]
    if os.path.exists(done_marker) and missing:
        # repair already complete for this version but some finished
        # cell files were lost: regenerate exactly those cells (their
        # pending rows are discarded — the repair files already hold
        # the boundary answers for this version)
        rd.from_items(missing, override_num_blocks=len(missing)).map_batches(
            one_cell, batch_size=1, batch_format="pyarrow"
        ).count()
    if not os.path.exists(done_marker):
        for widx, w in enumerate(
            _iter_left_windows(pending_ds, "src", cap=KNN_GRAPH_REPAIR_CAP)
        ):
            wfile = os.path.join(
                out_path, "edges", f"repair-v{version}-w{widx}.parquet"
            )
            if os.path.exists(wfile):
                continue
            _atomic_write_table(repair_window(w), wfile)
        _atomic_write_table(
            pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "dist2": pa.array([], pa.int64()),
                }
            ),
            done_marker,
        )
    from pkd_tree_ray.sources import read_parquet_clean

    return read_parquet_clean(os.path.join(out_path, "edges"))


_JOIN_WORKER_STATE: dict = {}


def _cached(ref):
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _JOIN_WORKER_STATE:
        if len(_JOIN_WORKER_STATE) > 64:
            _JOIN_WORKER_STATE.clear()
        _JOIN_WORKER_STATE[key] = ray.get(ref)
    return _JOIN_WORKER_STATE[key]


def tile_stats(points, tile_side: int):
    """Raster-tile <-> vector assignment: tile id = (x // side,
    y // side); -> (tile_x, tile_y, cnt) via partial aggregation then a
    tiny groupby shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        tx = batch["x"].to_numpy() // tile_side
        ty = batch["y"].to_numpy() // tile_side
        code = tx * (1 << 20) + ty
        u, c = np.unique(code, return_counts=True)
        return pa.table(
            {
                "tile_x": u // (1 << 20),
                "tile_y": u % (1 << 20),
                "cnt": c.astype(np.int64),
            }
        )

    from ray.data.aggregate import Sum

    return (
        points.map_batches(partial, batch_format="pyarrow")
        .groupby(["tile_x", "tile_y"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )


# ----------------------------------------------------------------------
# radius (epsilon-distance) join
# ----------------------------------------------------------------------

#: cap on candidate (na x nb) cross-product rows materialized at once
#: inside one bucket kernel — bounds peak memory on skewed cells
_RJ_CHUNK_PAIRS = 1 << 22


def radius_join(a, b, r: int, a_id: str = "a_id", b_id: str = "b_id"):
    """All pairs (a, b) with ||a - b||^2 <= r^2 between two point
    Datasets -> Dataset (a_id, b_id, dist2).

    The distance-join analog of the reference's box joins
    (``range_query`` over per-row boxes, testFramework.h:452-512),
    expressed as ONE hash shuffle: snap both sides to a grid of cell
    side ``r`` — any qualifying pair then spans at most one cell step
    per axis — keep A at its home cell and replicate B to the 3x3
    neighborhood, bucket-hash the cell key, and resolve each bucket
    with a fully vectorized segmented cross product (no per-cell
    Python).  Each pair is emitted exactly once (A's home cell is
    unique; B reaches it via exactly one replica).

    Partitioning assumption, stated honestly: per-cell occupancy must
    be bounded (uniform-ish density at grid side r).  A pathological
    hot cell degrades to its true output size na*nb — inherent to the
    join's result, and peak memory stays bounded by the chunked
    candidate sweep (:data:`_RJ_CHUNK_PAIRS`).  Column layout: both
    inputs need (id, x, y) with the id column named per ``a_id`` /
    ``b_id``.
    """
    if r < 1:
        raise ValueError("r >= 1")
    from pkd_tree_ray.components import _mix_bucket, _n_buckets_for

    r2 = int(r) * int(r)
    side = int(r)
    span = COORD_MOD // side + 3  # cells per axis incl. border slack
    nb_buckets = _n_buckets_for(b.count() * 4)

    def cell_of(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        return (x // side) * span + (y // side)

    def tag_a(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy().astype(np.int64)
        y = t["y"].to_numpy().astype(np.int64)
        c = cell_of(x, y)
        return pa.table(
            {
                "_bkt": pa.array(_mix_bucket(c, nb_buckets)),
                "_cell": pa.array(c),
                "_role": pa.array(np.zeros(len(x), np.int8)),
                "_id": t[a_id].cast(pa.int64()),
                "_x": pa.array(x),
                "_y": pa.array(y),
            }
        )

    def tag_b(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy().astype(np.int64)
        y = t["y"].to_numpy().astype(np.int64)
        cx, cy = x // side, y // side
        reps = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                ncx, ncy = cx + dx, cy + dy
                ok = (ncx >= 0) & (ncy >= 0)  # grid starts at 0
                reps.append((np.flatnonzero(ok), ncx[ok] * span + ncy[ok]))
        idx = np.concatenate([i for i, _ in reps])
        c = np.concatenate([c for _, c in reps])
        sel = pa.array(idx)
        return pa.table(
            {
                "_bkt": pa.array(_mix_bucket(c, nb_buckets)),
                "_cell": pa.array(c),
                "_role": pa.array(np.ones(len(c), np.int8)),
                "_id": t[b_id].cast(pa.int64()).take(sel),
                "_x": pa.array(x[idx]),
                "_y": pa.array(y[idx]),
            }
        )

    def resolve(g: pa.Table) -> pa.Table:
        cell = g["_cell"].to_numpy()
        role = g["_role"].to_numpy()
        order = np.lexsort((role, cell))
        cell_s, role_s = cell[order], role[order]
        ids = g["_id"].to_numpy()[order]
        xs = g["_x"].to_numpy()[order]
        ys = g["_y"].to_numpy()[order]
        new = np.concatenate([[True], cell_s[1:] != cell_s[:-1]])
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(cell_s)]])
        # A rows sort before B rows inside each run (role lexsort key)
        first_b = starts + np.add.reduceat(
            (role_s == 0).astype(np.int64), starts
        )
        na = first_b - starts
        nb_ = ends - first_b
        ppr = na * nb_  # candidate pairs per run
        live = np.flatnonzero(ppr)
        out_a, out_b, out_d = [], [], []
        lo = 0
        while lo < len(live):
            # grow the chunk until the candidate total would overflow
            hi, tot = lo, 0
            while hi < len(live) and tot + ppr[live[hi]] <= _RJ_CHUNK_PAIRS:
                tot += ppr[live[hi]]
                hi += 1
            hi = max(hi, lo + 1)  # a single giant run still proceeds
            runs = live[lo:hi]
            lo = hi
            cnt = ppr[runs]
            rep = np.repeat(np.arange(len(runs)), cnt)
            offs = np.concatenate([[0], np.cumsum(cnt)[:-1]])
            intra = np.arange(int(cnt.sum())) - offs[rep]
            ai = starts[runs][rep] + intra // nb_[runs][rep]
            bi = first_b[runs][rep] + intra % nb_[runs][rep]
            dx = xs[ai] - xs[bi]
            dy = ys[ai] - ys[bi]
            d2 = dx * dx + dy * dy
            keep = d2 <= r2
            out_a.append(ids[ai[keep]])
            out_b.append(ids[bi[keep]])
            out_d.append(d2[keep])
        cat = (
            lambda parts: np.concatenate(parts)
            if parts
            else np.empty(0, np.int64)
        )
        return pa.table(
            {
                a_id: pa.array(cat(out_a), pa.int64()),
                b_id: pa.array(cat(out_b), pa.int64()),
                "dist2": pa.array(cat(out_d), pa.int64()),
            }
        )

    tagged = a.map_batches(tag_a, batch_format="pyarrow").union(
        b.map_batches(tag_b, batch_format="pyarrow")
    )
    return tagged.groupby("_bkt").map_groups(resolve, batch_format="pyarrow")
