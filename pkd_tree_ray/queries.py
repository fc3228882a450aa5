"""Distributed query pipelines over a :class:`PkdIndex`.

Each query family mirrors its reference kernel, lifted from a single
shared-memory tree to cells + per-partition scans:

* range count (``include/cpdd/query_op/range_count.hpp:8-96``):
  cells fully inside a query box contribute their directory count with
  **no data touched** (the contained-subtree shortcut,
  ``range_count.hpp:77-83``); only boundary cells are scanned, with a
  per-partition kd-tree or vectorized mask;
* range report (``range_query.hpp:28-119``): contained cells emit all
  rows (the ``flatten`` fast path), partial cells emit masked rows —
  a streaming output Dataset, never materialized on the driver;
* circular range count (``range_count.hpp:98-131``);
* kNN (``nn_search.hpp:81-126``): two-phase — (A) seed each query on
  the nearest cells holding >= k points to obtain an upper bound on
  the kth distance, (B) scan every cell whose bbox min-distance is
  within the bound and merge per-query top-k with a
  ``groupby(qid)`` — the distributed form of sibling pruning via
  ``p2b_min_distance`` (``nn_search.hpp:121-124``).

Queries are the SMALL side: the query table is broadcast once via
``ray.put`` and read in each actor's ``__init__``, never re-shipped
per batch (SURVEY.md §2.7 "broadcast-small-side").  Results carry
``qid`` instead of positional alignment (SURVEY.md §7.4.6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from pkd_tree_ray.geometry import (
    box_contains_box,
    boxes_intersect,
    p2b_max_dist2,
    p2b_min_dist2,
)
from pkd_tree_ray.index import PkdIndex
from pkd_tree_ray.kdtree import KDTree2D, brute_knn_batch

_CLASSIFY_CHUNK = 4_096  # queries classified per driver-side chunk


def _pool_size(cfg) -> int:
    """Actor-pool size for stateful query stages: the session's CPU
    count minus headroom for the read stage (callable classes require
    explicit ``concurrency`` in Ray Data)."""
    if cfg.query_concurrency:
        return cfg.query_concurrency
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, cpus - 1)


# ----------------------------------------------------------------------
# classification (driver-side, vectorized over directory cells)
# ----------------------------------------------------------------------

def _live(index: PkdIndex) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(cells, counts, bboxes) of non-empty cells only."""
    d = index.directory
    live = d.counts > 0
    return d.starts[live], d.counts[live], d.bboxes[live]


def _classify_boxes(index: PkdIndex, boxes: np.ndarray):
    """Per query box: contained-cell base count + (cell -> qids) map of
    partial cells.  Chunked so driver memory stays O(chunk x cells)."""
    cells, counts, bboxes = _live(index)
    m = len(boxes)
    base = np.zeros(m, dtype=np.int64)
    cell_qids: dict[int, list[int]] = {}
    for s in range(0, m, _CLASSIFY_CHUNK):
        q = np.asarray(boxes[s: s + _CLASSIFY_CHUNK], dtype=np.int64)
        contained = box_contains_box(q, bboxes)  # (mq, C)
        overlap = boxes_intersect(q, bboxes)
        partial = overlap & ~contained
        base[s: s + len(q)] = contained @ counts
        qi, ci = np.nonzero(partial)
        for qq, cc in zip(qi, ci):
            cell_qids.setdefault(int(cells[cc]), []).append(s + int(qq))
    return base, cell_qids


def _classify_circles(index: PkdIndex, circles: np.ndarray):
    """Same for balls: contained = max-dist <= r^2, overlap = min-dist
    <= r^2 (``range_count.hpp:104-118``)."""
    cells, counts, bboxes = _live(index)
    m = len(circles)
    base = np.zeros(m, dtype=np.int64)
    cell_qids: dict[int, list[int]] = {}
    for s in range(0, m, _CLASSIFY_CHUNK):
        q = np.asarray(circles[s: s + _CLASSIFY_CHUNK], dtype=np.int64)
        r2 = (q[:, 2] * q[:, 2])[:, None]
        mind = p2b_min_dist2(q[:, 0], q[:, 1], bboxes)
        maxd = p2b_max_dist2(q[:, 0], q[:, 1], bboxes)
        contained = maxd <= r2
        partial = (mind <= r2) & ~contained
        base[s: s + len(q)] = contained @ counts
        qi, ci = np.nonzero(partial)
        for qq, cc in zip(qi, ci):
            cell_qids.setdefault(int(cells[cc]), []).append(s + int(qq))
    return base, cell_qids


def _csr(cell_qids: dict[int, list[int]]):
    """Pack {cell: [qid]} into broadcastable CSR arrays."""
    if not cell_qids:
        return (np.zeros(0, np.int64), np.zeros(1, np.int64), np.zeros(0, np.int64))
    cells = np.array(sorted(cell_qids), dtype=np.int64)
    offs = np.zeros(len(cells) + 1, dtype=np.int64)
    chunks = []
    for i, c in enumerate(cells):
        qs = np.asarray(cell_qids[int(c)], dtype=np.int64)
        chunks.append(qs)
        offs[i + 1] = offs[i] + len(qs)
    return cells, offs, np.concatenate(chunks)


def _iter_cell_runs(cell_col: np.ndarray):
    """Yield (cell, slice) runs — cell files are concatenated into
    blocks, so the column is piecewise-constant."""
    n = len(cell_col)
    if n == 0:
        return
    breaks = np.nonzero(np.diff(cell_col))[0] + 1
    edges = np.concatenate([[0], breaks, [n]])
    for s, e in zip(edges[:-1], edges[1:]):
        yield int(cell_col[s]), slice(int(s), int(e))


# ----------------------------------------------------------------------
# range count
# ----------------------------------------------------------------------

class _RangeCountScan:
    """Actor: counts hits of broadcast boxes in the partial cells.
    Builds a per-fragment kd-tree when a fragment serves many queries
    (tree query O(log n + hits) beats an O(n) mask per query);
    otherwise vectorized masks — the SERIAL_BUILD_CUTOFF idea."""

    def __init__(self, queries_ref, leaf_size: int, cutoff: int):
        boxes, (cells, offs, qids) = ray.get(queries_ref)
        self.boxes = boxes
        self.cells, self.offs, self.qids = cells, offs, qids
        self.leaf_size = leaf_size
        self.cutoff = cutoff

    def _qids_for(self, cell: int) -> np.ndarray:
        i = np.searchsorted(self.cells, cell)
        if i >= len(self.cells) or self.cells[i] != cell:
            return np.empty(0, np.int64)
        return self.qids[self.offs[i]: self.offs[i + 1]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        cell_col = batch["cell"].to_numpy()
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        out_q: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        for cell, sl in _iter_cell_runs(cell_col):
            qs = self._qids_for(cell)
            if not len(qs):
                continue
            fx, fy = x[sl], y[sl]
            qb = self.boxes[qs]
            if len(qs) >= 8 and len(fx) >= self.cutoff:
                tree = KDTree2D(fx, fy)
                cnts = np.array([tree.range_count(b) for b in qb], dtype=np.int64)
            else:
                inx = (fx[None, :] >= qb[:, 0, None]) & (fx[None, :] <= qb[:, 2, None])
                iny = (fy[None, :] >= qb[:, 1, None]) & (fy[None, :] <= qb[:, 3, None])
                cnts = (inx & iny).sum(axis=1).astype(np.int64)
            out_q.append(qs)
            out_c.append(cnts)
        if not out_q:
            return pa.table({"qid": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())})
        return pa.table(
            {"qid": np.concatenate(out_q), "cnt": np.concatenate(out_c)}
        )


def range_count(index: PkdIndex, boxes: np.ndarray, config=None) -> pa.Table:
    """Batch orthogonal range count -> (qid, cnt), inclusive bounds.

    qid = row position in ``boxes``.
    """
    cfg = config or index.config
    boxes = np.asarray(boxes, dtype=np.int64)
    base, cell_qids = _classify_boxes(index, boxes)
    total = base.copy()
    if cell_qids:
        ref = ray.put((boxes, _csr(cell_qids)))
        from ray.data.aggregate import Sum

        partial = (
            index.scan_cells(list(cell_qids), columns=["cell", "x", "y"])
            .map_batches(
                _RangeCountScan,
                fn_constructor_args=(ref, cfg.leaf_size, cfg.brute_force_cutoff),
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
                concurrency=_pool_size(cfg),
            )
            .groupby("qid")
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas()
        )
        if len(partial):
            total[partial["qid"].to_numpy(dtype=np.int64)] += partial["cnt"].to_numpy(
                dtype=np.int64
            )
    return pa.table({"qid": np.arange(len(boxes), dtype=np.int64), "cnt": total})


# ----------------------------------------------------------------------
# circular range count
# ----------------------------------------------------------------------

class _CircleCountScan:
    def __init__(self, queries_ref, leaf_size: int, cutoff: int):
        circles, (cells, offs, qids) = ray.get(queries_ref)
        self.circles = circles
        self.cells, self.offs, self.qids = cells, offs, qids
        self.cutoff = cutoff

    def __call__(self, batch: pa.Table) -> pa.Table:
        cell_col = batch["cell"].to_numpy()
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        out_q, out_c = [], []
        for cell, sl in _iter_cell_runs(cell_col):
            i = np.searchsorted(self.cells, cell)
            if i >= len(self.cells) or self.cells[i] != cell:
                continue
            qs = self.qids[self.offs[i]: self.offs[i + 1]]
            fx, fy = x[sl], y[sl]
            qc = self.circles[qs]
            if len(qs) >= 8 and len(fx) >= self.cutoff:
                tree = KDTree2D(fx, fy)
                cnts = np.array(
                    [tree.circle_count(c[0], c[1], c[2]) for c in qc], dtype=np.int64
                )
            else:
                dx = fx[None, :] - qc[:, 0, None]
                dy = fy[None, :] - qc[:, 1, None]
                cnts = (dx * dx + dy * dy <= (qc[:, 2] * qc[:, 2])[:, None]).sum(axis=1)
            out_q.append(qs)
            out_c.append(cnts.astype(np.int64))
        if not out_q:
            return pa.table({"qid": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())})
        return pa.table({"qid": np.concatenate(out_q), "cnt": np.concatenate(out_c)})


def circle_count(index: PkdIndex, circles: np.ndarray, config=None) -> pa.Table:
    """Batch circular range count -> (qid, cnt); membership is
    dist2 <= r^2 inclusive."""
    cfg = config or index.config
    circles = np.asarray(circles, dtype=np.int64)
    base, cell_qids = _classify_circles(index, circles)
    total = base.copy()
    if cell_qids:
        ref = ray.put((circles, _csr(cell_qids)))
        from ray.data.aggregate import Sum

        partial = (
            index.scan_cells(list(cell_qids), columns=["cell", "x", "y"])
            .map_batches(
                _CircleCountScan,
                fn_constructor_args=(ref, cfg.leaf_size, cfg.brute_force_cutoff),
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
                concurrency=_pool_size(cfg),
            )
            .groupby("qid")
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas()
        )
        if len(partial):
            total[partial["qid"].to_numpy(dtype=np.int64)] += partial["cnt"].to_numpy(
                dtype=np.int64
            )
    return pa.table({"qid": np.arange(len(circles), dtype=np.int64), "cnt": total})


# ----------------------------------------------------------------------
# range report
# ----------------------------------------------------------------------

class _RangeReportScan:
    """Actor: emits (qid, id, x, y) rows.  Fully-contained cells are
    flattened without predicate evaluation (``range_query.hpp:92-97``)."""

    def __init__(self, queries_ref, id_col: str):
        boxes, full, partial = ray.get(queries_ref)
        self.boxes = boxes
        self.full_cells, self.full_offs, self.full_qids = full
        self.part_cells, self.part_offs, self.part_qids = partial
        self.id_col = id_col

    @staticmethod
    def _lookup(cells, offs, qids, cell):
        i = np.searchsorted(cells, cell)
        if i >= len(cells) or cells[i] != cell:
            return np.empty(0, np.int64)
        return qids[offs[i]: offs[i + 1]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        cell_col = batch["cell"].to_numpy()
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        take_idx: list[np.ndarray] = []
        take_qid: list[np.ndarray] = []
        for cell, sl in _iter_cell_runs(cell_col):
            rows = np.arange(sl.start, sl.stop, dtype=np.int64)
            for q in self._lookup(self.full_cells, self.full_offs, self.full_qids, cell):
                take_idx.append(rows)
                take_qid.append(np.full(len(rows), q, dtype=np.int64))
            part_qs = self._lookup(self.part_cells, self.part_offs, self.part_qids, cell)
            if len(part_qs):
                fx, fy = x[sl], y[sl]
                qb = self.boxes[part_qs]
                inb = (
                    (fx[None, :] >= qb[:, 0, None])
                    & (fx[None, :] <= qb[:, 2, None])
                    & (fy[None, :] >= qb[:, 1, None])
                    & (fy[None, :] <= qb[:, 3, None])
                )
                qi, ri = np.nonzero(inb)
                take_idx.append(rows[ri])
                take_qid.append(part_qs[qi])
        if not take_idx:
            return pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    self.id_col: pa.array([], batch[self.id_col].type),
                    "x": pa.array([], pa.int64()),
                    "y": pa.array([], pa.int64()),
                }
            )
        idx = np.concatenate(take_idx)
        qid = np.concatenate(take_qid)
        taken = batch.take(pa.array(idx))
        return pa.table(
            {
                "qid": pa.array(qid, pa.int64()),
                self.id_col: taken[self.id_col],
                "x": taken["x"],
                "y": taken["y"],
            }
        )


def range_report(index: PkdIndex, boxes: np.ndarray, config=None):
    """Batch orthogonal range report -> streaming Dataset
    (qid, <id>, x, y)."""
    cfg = config or index.config
    boxes = np.asarray(boxes, dtype=np.int64)
    cells, counts, bboxes = _live(index)
    full_map: dict[int, list[int]] = {}
    part_map: dict[int, list[int]] = {}
    for s in range(0, len(boxes), _CLASSIFY_CHUNK):
        q = boxes[s: s + _CLASSIFY_CHUNK]
        contained = box_contains_box(q, bboxes)
        partial = boxes_intersect(q, bboxes) & ~contained
        for qq, cc in zip(*np.nonzero(contained)):
            full_map.setdefault(int(cells[cc]), []).append(s + int(qq))
        for qq, cc in zip(*np.nonzero(partial)):
            part_map.setdefault(int(cells[cc]), []).append(s + int(qq))
    needed = sorted(set(full_map) | set(part_map))
    ref = ray.put((boxes, _csr(full_map), _csr(part_map)))
    return index.scan_cells(needed, columns=["cell", index.id_col, "x", "y"]).map_batches(
        _RangeReportScan,
        fn_constructor_args=(ref, index.id_col),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=_pool_size(cfg),
    )


# ----------------------------------------------------------------------
# kNN
# ----------------------------------------------------------------------

class _KnnScan:
    """Actor: per fragment, partial top-k for the queries routed to its
    cells.  Uses the per-partition kd-tree for large fragments, brute
    vectorized distance for small ones.  Partials merge later in
    groupby(qid) — correctness does not require a fragment to see its
    whole cell."""

    def __init__(self, queries_ref, id_col: str, leaf_size: int, cutoff: int):
        (qx, qy, k, cells, offs, qids) = ray.get(queries_ref)
        self.qx, self.qy, self.k = qx, qy, k
        self.cells, self.offs, self.qids = cells, offs, qids
        self.id_col = id_col
        self.leaf_size = leaf_size
        self.cutoff = cutoff

    def __call__(self, batch: pa.Table) -> pa.Table:
        cell_col = batch["cell"].to_numpy()
        x = batch["x"].to_numpy()
        y = batch["y"].to_numpy()
        out_qid: list[np.ndarray] = []
        out_row: list[np.ndarray] = []
        out_d2: list[np.ndarray] = []
        k = self.k
        for cell, sl in _iter_cell_runs(cell_col):
            i = np.searchsorted(self.cells, cell)
            if i >= len(self.cells) or self.cells[i] != cell:
                continue
            qs = self.qids[self.offs[i]: self.offs[i + 1]]
            if not len(qs):
                continue
            fx, fy = x[sl], y[sl]
            rows = np.arange(sl.start, sl.stop, dtype=np.int64)
            if len(fx) >= self.cutoff and len(qs) * len(fx) > 4_000_000:
                tree = KDTree2D(fx, fy)
                for q in qs:
                    idx, d2, _ = tree.knn(int(self.qx[q]), int(self.qy[q]), k)
                    out_qid.append(np.full(len(idx), q, dtype=np.int64))
                    out_row.append(rows[idx])
                    out_d2.append(d2)
            else:
                idx, d2 = brute_knn_batch(fx, fy, self.qx[qs], self.qy[qs], k)
                k_eff = idx.shape[1]
                out_qid.append(np.repeat(qs, k_eff))
                out_row.append(rows[idx.ravel()])
                out_d2.append(d2.ravel())
        id_col = self.id_col
        if not out_qid:
            return pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "neighbor": pa.array([], batch[id_col].type),
                    "dist2": pa.array([], pa.int64()),
                }
            )
        rows_all = np.concatenate(out_row)
        taken = batch.take(pa.array(rows_all))
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_qid), pa.int64()),
                "neighbor": taken[id_col],
                "dist2": pa.array(np.concatenate(out_d2), pa.int64()),
            }
        )


def _seed_cells(index: PkdIndex, qx: np.ndarray, qy: np.ndarray, k: int):
    """Phase A routing: for each query the nearest cells (by bbox
    min-distance) whose cumulative count reaches k."""
    cells, counts, bboxes = _live(index)
    cell_qids: dict[int, list[int]] = {}
    for s in range(0, len(qx), _CLASSIFY_CHUNK):
        d2 = p2b_min_dist2(qx[s: s + _CLASSIFY_CHUNK], qy[s: s + _CLASSIFY_CHUNK], bboxes)
        order = np.argsort(d2, axis=1, kind="stable")
        csum = np.cumsum(counts[order], axis=1)
        # first column index where cumulative count >= k
        enough = csum >= k
        last = np.argmax(enough, axis=1)
        last = np.where(enough.any(axis=1), last, len(cells) - 1)
        for qi in range(d2.shape[0]):
            for cc in order[qi, : last[qi] + 1]:
                cell_qids.setdefault(int(cells[cc]), []).append(s + qi)
    return cell_qids


def _knn_partials(index: PkdIndex, qx, qy, k, cell_qids, cfg):
    ref = ray.put((qx, qy, k, *_csr(cell_qids)))
    return index.scan_cells(list(cell_qids), columns=["cell", index.id_col, "x", "y"]).map_batches(
        _KnnScan,
        fn_constructor_args=(ref, index.id_col, cfg.leaf_size, cfg.brute_force_cutoff),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=_pool_size(cfg),
    )


def knn(index: PkdIndex, qx: np.ndarray, qy: np.ndarray, k: int, config=None):
    """Batch kNN -> Dataset (qid, rank, neighbor, dist2); squared
    distances, ties broken by (dist2, neighbor id), rank 1-based.

    Two-phase: seed-cell bound then pruned full scan — the distributed
    analog of guided descent + sibling pruning
    (``nn_search.hpp:108-125``).
    """
    cfg = config or index.config
    qx = np.asarray(qx, dtype=np.int64)
    qy = np.asarray(qy, dtype=np.int64)
    m = len(qx)

    # phase A: upper bound on the kth distance from the seed cells
    seed = _seed_cells(index, qx, qy, k)
    bounds = np.full(m, np.iinfo(np.int64).max, dtype=np.int64)
    if seed:
        pdf = _knn_partials(index, qx, qy, k, seed, cfg).to_pandas()
        if len(pdf):
            grp = pdf.groupby("qid")["dist2"]
            kth = grp.apply(lambda s: s.nsmallest(min(k, len(s))).iloc[-1])
            cnt = grp.size()
            full = cnt[cnt >= k].index
            bounds[np.asarray(full, dtype=np.int64)] = kth[full].to_numpy(dtype=np.int64)

    # phase B: all cells within the bound
    cells, counts, bboxes = _live(index)
    cell_qids: dict[int, list[int]] = {}
    for s in range(0, m, _CLASSIFY_CHUNK):
        d2 = p2b_min_dist2(qx[s: s + _CLASSIFY_CHUNK], qy[s: s + _CLASSIFY_CHUNK], bboxes)
        qi, ci = np.nonzero(d2 <= bounds[s: s + d2.shape[0], None])
        for qq, cc in zip(qi, ci):
            cell_qids.setdefault(int(cells[cc]), []).append(s + int(qq))
    if not cell_qids:  # empty index
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "neighbor": pa.array([], pa.int64()),
                    "dist2": pa.array([], pa.int64()),
                }
            )
        )
    partials = _knn_partials(index, qx, qy, k, cell_qids, cfg)

    def topk(group: pa.Table) -> pa.Table:
        d2 = group["dist2"].to_numpy()
        nb = group["neighbor"]
        import pandas as pd

        df = pd.DataFrame({"dist2": d2, "neighbor": nb.to_pandas()})
        df = df.sort_values(["dist2", "neighbor"], kind="stable").head(k)
        df.insert(0, "qid", group["qid"][0].as_py())
        df.insert(1, "rank", np.arange(1, len(df) + 1, dtype=np.int64))
        return pa.Table.from_pandas(df[["qid", "rank", "neighbor", "dist2"]], preserve_index=False)

    return partials.groupby("qid").map_groups(topk, batch_format="pyarrow")
