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
* kNN (``nn_search.hpp:81-126``): bound -> one scan -> verify/repair.
  In-distribution queries bound the kth distance from home-cell
  density (O(m), no data touched); out-of-distribution queries use
  the provable nearest-center directory bound
  (``_center_dir_bounds``).  Every cell whose bbox
  min-distance is within the bound is scanned — the distributed form
  of sibling pruning via ``p2b_min_distance``
  (``nn_search.hpp:121-124``) — with candidate selection fused into
  the shards (``IndexShard.knn_auto``) and re-applied INSIDE each
  cell over kd-ordered sub-blocks (``kdtree.block_knn_triplets``).
  Per-query top-k merges via qid-slice tasks or ``groupby(qid)``;
  queries whose density estimate proves too small are repaired with
  the exact seed-scan two-phase (``_exact_bounds``).

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
    pnd_b_max_dist2,
    pnd_b_min_dist2,
)
from pkd_tree_ray.index import PkdIndex
from pkd_tree_ray.kdtree import (
    KDTreeND,
    brute_knn_nd,
    cum_nearest_prefix,
    topk_per_qid,
)

_CLASSIFY_CHUNK = 4_096  # queries classified per driver-side chunk

# Per-worker-process cache of broadcast query state: Ray keeps worker
# processes warm across tasks, so a plain-function scan stage fetches
# its ray.put state once per worker — the broadcast-small-side pattern
# without paying actor-pool spin-up (~1-2s x pool size) on every short
# query job.  Actor pools (config.use_actor_pools) remain available for
# long-running jobs where per-actor state amortizes further.
_WORKER_STATE: dict = {}


def _cached_get(ref):
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _WORKER_STATE:
        if len(_WORKER_STATE) > 64:  # bound worker memory
            _WORKER_STATE.clear()
        _WORKER_STATE[key] = ray.get(ref)
    return _WORKER_STATE[key]


def _maybe_get(ref_or_value):
    """Scan kernels run either as Ray Data stages (payload broadcast as
    an ObjectRef) or inside resident shard actors (payload passed
    directly, already deserialized) — accept both."""
    if isinstance(ref_or_value, ray.ObjectRef):
        return ray.get(ref_or_value)
    return ref_or_value


def _scan_stage(ds, scan_cls, ctor_args, cfg, n_parts):
    """Attach a scan kernel to a cell Dataset — as stateless tasks with
    worker-cached broadcast state (default) or as an actor pool
    (cfg.use_actor_pools)."""
    if getattr(cfg, "use_actor_pools", False):
        return ds.map_batches(
            scan_cls,
            fn_constructor_args=ctor_args,
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=_pool_size(cfg, n_parts),
        )
    ref = ctor_args[0]
    rest = ctor_args[1:]

    def run(batch: pa.Table) -> pa.Table:
        key = ("scan", scan_cls.__name__, ref.hex() if hasattr(ref, "hex") else id(ref), rest)
        if key not in _WORKER_STATE:
            if len(_WORKER_STATE) > 64:
                _WORKER_STATE.clear()
            _WORKER_STATE[key] = scan_cls(ref, *rest)
        return _WORKER_STATE[key](batch)

    return ds.map_batches(run, batch_format="pyarrow", batch_size=cfg.batch_size)


def _pool_size(cfg, n_parts: int | None = None) -> tuple[int, int]:
    """Autoscaling actor-pool bounds for stateful query stages:
    (1, min(cpus-1, #partitions scanned)).  Starting at 1 avoids
    paying ~300ms x N actor start-up for stages whose input is a
    handful of cells; Ray grows the pool under backpressure."""
    if cfg.query_concurrency:
        return (1, cfg.query_concurrency)
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    cap = max(2, cpus - 1)
    if n_parts is not None:
        cap = max(1, min(cap, n_parts))
    return (1, cap)


# ----------------------------------------------------------------------
# classification (driver-side, vectorized over directory cells)
# ----------------------------------------------------------------------

def _live(index: PkdIndex) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(cells, counts, bboxes) of non-empty cells only."""
    d = index.directory
    live = d.counts > 0
    return d.starts[live], d.counts[live], d.bboxes[live]


class _Pairs:
    """(cell, qid) routing pairs — fully vectorized replacement for a
    {cell: [qids]} dict; converts to broadcastable CSR in one lexsort."""

    __slots__ = ("cells", "qids")

    def __init__(self, cells: np.ndarray, qids: np.ndarray):
        self.cells = cells
        self.qids = qids

    def __bool__(self) -> bool:
        return len(self.cells) > 0

    def cell_list(self) -> list[int]:
        return np.unique(self.cells).tolist()

    def to_csr(self):
        if not len(self.cells):
            return (np.zeros(0, np.int64), np.zeros(1, np.int64), np.zeros(0, np.int64))
        order = np.lexsort((self.qids, self.cells))
        c = self.cells[order]
        q = self.qids[order]
        uc, starts = np.unique(c, return_index=True)
        offs = np.concatenate([starts, [len(c)]]).astype(np.int64)
        return uc, offs, q

    @classmethod
    def concat(cls, parts: list["_Pairs"]) -> "_Pairs":
        if not parts:
            return cls(np.zeros(0, np.int64), np.zeros(0, np.int64))
        return cls(
            np.concatenate([p.cells for p in parts]),
            np.concatenate([p.qids for p in parts]),
        )


def _csr(pairs: "_Pairs"):
    return pairs.to_csr()


#: cells per run in the two-level classification index: driver-side
#: classification tests query-vs-RUN union bboxes first (C/_RUN of
#: them), then members of overlapping runs only — O(m*C) dense masks
#: become O(m*C/_RUN + overlap) and stay tractable at 10^6 cells
_RUN = 64


def _cell_run_boxes(bboxes: np.ndarray, run: int = _RUN) -> np.ndarray:
    """Union bbox per consecutive run of cells; the directory is
    Morton-sorted, so consecutive cells are spatially coherent and the
    union boxes stay tight."""
    C, w = bboxes.shape
    nd = w // 2
    B = -(-C // run)
    out = np.empty((B, w), dtype=bboxes.dtype)
    for b in range(B):
        seg = bboxes[b * run: (b + 1) * run]
        out[b, :nd] = seg[:, :nd].min(axis=0)
        out[b, nd:] = seg[:, nd:].max(axis=0)
    return out


def _classify_boxes(index: PkdIndex, boxes: np.ndarray):
    """Per query box: contained-cell base count + partial-cell routing
    pairs — two-level (run prune, then members of overlapping runs),
    chunked so driver memory stays O(chunk x runs)."""
    cells, counts, bboxes = _live(index)
    m = len(boxes)
    base = np.zeros(m, dtype=np.int64)
    parts: list[_Pairs] = []
    if not len(cells):
        return base, _Pairs.concat(parts)
    run_boxes = _cell_run_boxes(bboxes)
    for s in range(0, m, _CLASSIFY_CHUNK):
        q = np.asarray(boxes[s: s + _CLASSIFY_CHUNK], dtype=np.int64)
        hit = boxes_intersect(q, run_boxes)  # (mq, B)
        for b in np.nonzero(hit.any(axis=0))[0]:
            qs = np.nonzero(hit[:, b])[0]
            lo, hi = b * _RUN, min((b + 1) * _RUN, len(cells))
            sub = bboxes[lo:hi]
            contained = box_contains_box(q[qs], sub)
            overlap = boxes_intersect(q[qs], sub)
            partial = overlap & ~contained
            base[s + qs] += contained @ counts[lo:hi]
            qi, ci = np.nonzero(partial)
            parts.append(_Pairs(cells[lo + ci], (qs[qi] + s).astype(np.int64)))
    return base, _Pairs.concat(parts)


def _classify_circles(index: PkdIndex, circles: np.ndarray):
    """Same for balls: contained = max-dist <= r^2, overlap = min-dist
    <= r^2 (``range_count.hpp:104-118``).  circles: (m, d+1) =
    [centers..., r]."""
    cells, counts, bboxes = _live(index)
    m = len(circles)
    base = np.zeros(m, dtype=np.int64)
    parts: list[_Pairs] = []
    if not len(cells):
        return base, _Pairs.concat(parts)
    run_boxes = _cell_run_boxes(bboxes)
    for s in range(0, m, _CLASSIFY_CHUNK):
        q = np.asarray(circles[s: s + _CLASSIFY_CHUNK], dtype=np.int64)
        r2 = (q[:, -1] * q[:, -1])[:, None]
        hit = pnd_b_min_dist2(q[:, :-1], run_boxes) <= r2  # (mq, B)
        for b in np.nonzero(hit.any(axis=0))[0]:
            qs = np.nonzero(hit[:, b])[0]
            lo, hi = b * _RUN, min((b + 1) * _RUN, len(cells))
            sub = bboxes[lo:hi]
            r2s = r2[qs]
            mind = pnd_b_min_dist2(q[qs, :-1], sub)
            maxd = pnd_b_max_dist2(q[qs, :-1], sub)
            contained = maxd <= r2s
            partial = (mind <= r2s) & ~contained
            base[s + qs] += contained @ counts[lo:hi]
            qi, ci = np.nonzero(partial)
            parts.append(_Pairs(cells[lo + ci], (qs[qi] + s).astype(np.int64)))
    return base, _Pairs.concat(parts)


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

def _box_masks(fc: list[np.ndarray], qb: np.ndarray) -> np.ndarray:
    """(n_boxes, n_points) inclusive containment masks; fc = per-dim
    point arrays, qb = (n_boxes, 2d) boxes."""
    d = len(fc)
    m = np.ones((len(qb), len(fc[0])), dtype=bool)
    for j in range(d):
        m &= fc[j][None, :] >= qb[:, j, None]
        m &= fc[j][None, :] <= qb[:, d + j, None]
    return m


class _RangeCountScan:
    """Actor: counts hits of broadcast boxes in the partial cells.
    Builds a per-fragment kd-tree when a fragment serves many queries
    (tree query O(log n + hits) beats an O(n) mask per query);
    otherwise vectorized masks — the SERIAL_BUILD_CUTOFF idea."""

    def __init__(self, queries_ref, dims, leaf_size: int, cutoff: int, tree_provider=None):
        boxes, (cells, offs, qids) = _maybe_get(queries_ref)
        self.boxes = boxes
        self.dims = dims
        self.cells, self.offs, self.qids = cells, offs, qids
        self.leaf_size = leaf_size
        self.cutoff = cutoff
        self.tree_provider = tree_provider

    def _qids_for(self, cell: int) -> np.ndarray:
        i = np.searchsorted(self.cells, cell)
        if i >= len(self.cells) or self.cells[i] != cell:
            return np.empty(0, np.int64)
        return self.qids[self.offs[i]: self.offs[i + 1]]

    def __call__(self, batch: pa.Table) -> pa.Table:
        cell_col = batch["cell"].to_numpy()
        cs = [batch[dc].to_numpy() for dc in self.dims]
        out_q: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        for cell, sl in _iter_cell_runs(cell_col):
            qs = self._qids_for(cell)
            if not len(qs):
                continue
            fc = [c[sl] for c in cs]
            qb = self.boxes[qs]
            if len(qs) >= 64 and len(fc[0]) >= 131_072:
                tree = self.tree_provider(cell, fc) if self.tree_provider else KDTreeND(fc)
                cnts = np.array([tree.range_count(b) for b in qb], dtype=np.int64)
            else:
                cnts = np.empty(len(qs), dtype=np.int64)
                for s0 in range(0, len(qs), 128):  # bound mask memory
                    inb = _box_masks(fc, qb[s0: s0 + 128])
                    cnts[s0: s0 + 128] = inb.sum(axis=1)
            out_q.append(qs)
            out_c.append(cnts)
        if not out_q:
            return pa.table({"qid": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())})
        return pa.table(
            {"qid": np.concatenate(out_q), "cnt": np.concatenate(out_c)}
        )


def range_count(index: PkdIndex, boxes: np.ndarray, config=None) -> pa.Table:
    """Batch orthogonal range count -> (qid, cnt), inclusive bounds.

    qid = row position in ``boxes``; boxes are (m, 2d)
    [mins..., maxs...] in the index's configured dimensionality.
    """
    cfg = config or index.config
    boxes = np.asarray(boxes, dtype=np.int64)
    base, cell_qids = _classify_boxes(index, boxes)
    total = base.copy()
    pool = getattr(index, "pool", None)
    if cell_qids and pool is not None:
        tbl = pool.scan(
            "range_count", ray.put((boxes, _csr(cell_qids))), cell_qids.cell_list()
        )
        if tbl.num_rows:
            np.add.at(total, tbl["qid"].to_numpy(), tbl["cnt"].to_numpy())
    elif cell_qids:
        ref = ray.put((boxes, _csr(cell_qids)))
        from ray.data.aggregate import Sum

        partial = (
            _scan_stage(
                index.scan_cells(cell_qids.cell_list(), columns=["cell", *cfg.dims]),
                _RangeCountScan,
                (ref, cfg.dims, cfg.leaf_size, cfg.brute_force_cutoff),
                cfg,
                len(cell_qids.cell_list()),
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
    def __init__(self, queries_ref, dims, leaf_size: int, cutoff: int, tree_provider=None):
        circles, (cells, offs, qids) = _maybe_get(queries_ref)
        self.circles = circles  # (m, d+1) = [centers..., r]
        self.dims = dims
        self.cells, self.offs, self.qids = cells, offs, qids
        self.cutoff = cutoff
        self.tree_provider = tree_provider

    def __call__(self, batch: pa.Table) -> pa.Table:
        cell_col = batch["cell"].to_numpy()
        cs = [batch[dc].to_numpy() for dc in self.dims]
        d = len(cs)
        out_q, out_c = [], []
        for cell, sl in _iter_cell_runs(cell_col):
            i = np.searchsorted(self.cells, cell)
            if i >= len(self.cells) or self.cells[i] != cell:
                continue
            qs = self.qids[self.offs[i]: self.offs[i + 1]]
            fc = [c[sl] for c in cs]
            qc = self.circles[qs]
            if len(qs) >= 64 and len(fc[0]) >= 131_072:
                tree = self.tree_provider(cell, fc) if self.tree_provider else KDTreeND(fc)
                cnts = np.array(
                    [tree.ball_count(c[:-1], c[-1]) for c in qc], dtype=np.int64
                )
            else:
                cnts = np.empty(len(qs), dtype=np.int64)
                for s0 in range(0, len(qs), 128):
                    qk = qc[s0: s0 + 128]
                    dj = fc[0][None, :] - qk[:, 0, None]
                    d2 = dj * dj
                    for j in range(1, d):
                        dj = fc[j][None, :] - qk[:, j, None]
                        d2 += dj * dj
                    cnts[s0: s0 + 128] = (
                        d2 <= (qk[:, -1] * qk[:, -1])[:, None]
                    ).sum(axis=1)
            out_q.append(qs)
            out_c.append(cnts.astype(np.int64))
        if not out_q:
            return pa.table({"qid": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())})
        return pa.table({"qid": np.concatenate(out_q), "cnt": np.concatenate(out_c)})


def circle_count(index: PkdIndex, circles: np.ndarray, config=None) -> pa.Table:
    """Batch circular range count -> (qid, cnt); membership is
    dist2 <= r^2 inclusive.  circles: (m, d+1) = [centers..., r]."""
    cfg = config or index.config
    circles = np.asarray(circles, dtype=np.int64)
    base, cell_qids = _classify_circles(index, circles)
    total = base.copy()
    pool = getattr(index, "pool", None)
    if cell_qids and pool is not None:
        tbl = pool.scan(
            "circle_count", ray.put((circles, _csr(cell_qids))), cell_qids.cell_list()
        )
        if tbl.num_rows:
            np.add.at(total, tbl["qid"].to_numpy(), tbl["cnt"].to_numpy())
    elif cell_qids:
        ref = ray.put((circles, _csr(cell_qids)))
        from ray.data.aggregate import Sum

        partial = (
            _scan_stage(
                index.scan_cells(cell_qids.cell_list(), columns=["cell", *cfg.dims]),
                _CircleCountScan,
                (ref, cfg.dims, cfg.leaf_size, cfg.brute_force_cutoff),
                cfg,
                len(cell_qids.cell_list()),
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
    """Actor: emits (qid, id, *dims) rows.  Fully-contained cells are
    flattened without predicate evaluation (``range_query.hpp:92-97``)."""

    def __init__(self, queries_ref, dims, id_col: str):
        boxes, full, partial = _maybe_get(queries_ref)
        self.boxes = boxes
        self.dims = dims
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
        cs = [batch[dc].to_numpy() for dc in self.dims]
        take_idx: list[np.ndarray] = []
        take_qid: list[np.ndarray] = []
        for cell, sl in _iter_cell_runs(cell_col):
            rows = np.arange(sl.start, sl.stop, dtype=np.int64)
            for q in self._lookup(self.full_cells, self.full_offs, self.full_qids, cell):
                take_idx.append(rows)
                take_qid.append(np.full(len(rows), q, dtype=np.int64))
            part_qs = self._lookup(self.part_cells, self.part_offs, self.part_qids, cell)
            if len(part_qs):
                fc = [c[sl] for c in cs]
                inb = _box_masks(fc, self.boxes[part_qs])
                qi, ri = np.nonzero(inb)
                take_idx.append(rows[ri])
                take_qid.append(part_qs[qi])
        if not take_idx:
            cols = {
                "qid": pa.array([], pa.int64()),
                self.id_col: pa.array([], batch[self.id_col].type),
            }
            for dc in self.dims:
                cols[dc] = pa.array([], pa.int64())
            return pa.table(cols)
        idx = np.concatenate(take_idx)
        qid = np.concatenate(take_qid)
        taken = batch.take(pa.array(idx))
        cols = {
            "qid": pa.array(qid, pa.int64()),
            self.id_col: taken[self.id_col],
        }
        for dc in self.dims:
            cols[dc] = taken[dc]
        return pa.table(cols)


def range_report(index: PkdIndex, boxes: np.ndarray, config=None):
    """Batch orthogonal range report -> streaming Dataset
    (qid, <id>, *dims)."""
    cfg = config or index.config
    boxes = np.asarray(boxes, dtype=np.int64)
    cells, counts, bboxes = _live(index)
    full_parts: list[_Pairs] = []
    part_parts: list[_Pairs] = []
    for s in range(0, len(boxes), _CLASSIFY_CHUNK):
        q = boxes[s: s + _CLASSIFY_CHUNK]
        contained = box_contains_box(q, bboxes)
        partial = boxes_intersect(q, bboxes) & ~contained
        qi, ci = np.nonzero(contained)
        full_parts.append(_Pairs(cells[ci], (qi + s).astype(np.int64)))
        qi, ci = np.nonzero(partial)
        part_parts.append(_Pairs(cells[ci], (qi + s).astype(np.int64)))
    full_map = _Pairs.concat(full_parts)
    part_map = _Pairs.concat(part_parts)
    needed = sorted(set(full_map.cell_list()) | set(part_map.cell_list()))
    ref = ray.put((boxes, _csr(full_map), _csr(part_map)))
    pool = getattr(index, "pool", None)
    if pool is not None:
        import ray.data as rd

        # ref-backed Dataset over the per-shard result refs: the report
        # streams from shard memory to the consumer without ever being
        # concatenated on the driver (the knn_topk from_arrow_refs
        # pattern applied to reports)
        return rd.from_arrow_refs(pool.scan_refs("range_report", ref, needed))
    return _scan_stage(
        index.scan_cells(needed, columns=["cell", index.id_col, *cfg.dims]),
        _RangeReportScan,
        (ref, cfg.dims, index.id_col),
        cfg,
        len(needed),
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

    def __init__(self, queries_ref, dims, id_col: str, leaf_size: int, cutoff: int, tree_provider=None):
        (Q, k, cells, offs, qids) = _maybe_get(queries_ref)
        self.Q, self.k = Q, k  # Q: (m, d) query matrix
        self.dims = dims
        self.cells, self.offs, self.qids = cells, offs, qids
        self.id_col = id_col
        self.leaf_size = leaf_size
        self.cutoff = cutoff
        self.tree_provider = tree_provider

    def __call__(self, batch: pa.Table) -> pa.Table:
        cell_col = batch["cell"].to_numpy()
        cs = [batch[dc].to_numpy() for dc in self.dims]
        d = len(cs)
        nb_all = batch[self.id_col].to_numpy(zero_copy_only=False)
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
            fc = [c[sl] for c in cs]
            key = nb_all[sl]  # (dist2, neighbor id) tie-break inside the cut
            rows = np.arange(sl.start, sl.stop, dtype=np.int64)
            # vectorized brute top-k wins until the fragment is very
            # large AND serves many queries (the numpy kd-tree pays
            # Python-per-node costs; measured crossover ~1e5 rows)
            if len(fc[0]) >= 131_072 and len(qs) >= 64:
                tree = (
                    self.tree_provider(cell, fc)
                    if self.tree_provider
                    else KDTreeND(fc, tie_key=key)
                )
                for q in qs:
                    idx, d2, _ = tree.knn_point(self.Q[q], k)
                    out_qid.append(np.full(len(idx), q, dtype=np.int64))
                    out_row.append(rows[idx])
                    out_d2.append(d2)
            else:
                idx, d2 = brute_knn_nd(
                    fc, [self.Q[qs, j] for j in range(d)], k, tie_key=key
                )
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


#: shared per-qid top-k kernel — one implementation (kdtree.topk_per_qid)
_topk_per_qid = topk_per_qid


def _seed_chunk(Q: np.ndarray, s: int, k: int, cells, counts, bboxes) -> "_Pairs":
    """Seed-cell classification for one query chunk: per query, the
    nearest cells (by bbox min-distance) whose cumulative count
    reaches k (progressive argpartition walk — see
    ``kdtree.cum_nearest_prefix``)."""
    d2 = pnd_b_min_dist2(Q, bboxes)
    qi, ci = cum_nearest_prefix(d2, counts, k)
    return _Pairs(cells[ci], (qi + s).astype(np.int64))


def _candidate_chunk(Q: np.ndarray, s: int, bounds: np.ndarray, cells, bboxes) -> "_Pairs":
    """Cells within each query's kth-distance bound — two-level (run
    prune, then members of hit runs only)."""
    run_boxes = _cell_run_boxes(bboxes)
    hit = pnd_b_min_dist2(Q, run_boxes) <= bounds[:, None]
    out: list[_Pairs] = []
    for b in np.nonzero(hit.any(axis=0))[0]:
        qs = np.nonzero(hit[:, b])[0]
        lo, hi = b * _RUN, min((b + 1) * _RUN, len(cells))
        d2 = pnd_b_min_dist2(Q[qs], bboxes[lo:hi])
        qi, ci = np.nonzero(d2 <= bounds[qs, None])
        out.append(_Pairs(cells[lo + ci], (qs[qi] + s).astype(np.int64)))
    return _Pairs.concat(out)


@ray.remote(num_cpus=1)
def _classify_task(kind: str, Q: np.ndarray, s: int, extra, state_ref):
    """One classification chunk as a Ray task — the O(m x C) query-vs-
    cell matrices run where the CPUs are, not on the driver (r1 weak
    item: driver-side classification is the scale ceiling for large
    query batches).  Returns the chunk's (cells, qids) pair arrays."""
    cells, counts, bboxes = (
        ray.get(state_ref) if isinstance(state_ref, ray.ObjectRef) else state_ref
    )
    if kind == "seed":
        p = _seed_chunk(Q, s, extra, cells, counts, bboxes)
    else:
        p = _candidate_chunk(Q, s, extra, cells, bboxes)
    return p.cells, p.qids


#: above this many queries, classification fans out as Ray tasks
_CLASSIFY_TASK_MIN = 65_536


def _classify_parallel(kind: str, index: PkdIndex, Q: np.ndarray, extra) -> "_Pairs":
    """Chunked task-parallel classification; extra = k (seed) or the
    per-query bounds array (candidate)."""
    cells, counts, bboxes = _live(index)
    state_ref = ray.put((cells, counts, bboxes))
    refs = []
    for s in range(0, len(Q), _CLASSIFY_CHUNK * 4):
        e = s + _CLASSIFY_CHUNK * 4
        x = extra if np.isscalar(extra) else extra[s:e]
        refs.append(_classify_task.remote(kind, Q[s:e], s, x, state_ref))
    outs = ray.get(refs)
    return _Pairs.concat([_Pairs(c, q) for c, q in outs])


def _seed_cells(index: PkdIndex, Q: np.ndarray, k: int) -> "_Pairs":
    """Phase A routing: for each query the nearest cells (by bbox
    min-distance) whose cumulative count reaches k.  Driver-side for
    small batches; fans out as Ray tasks for large ones."""
    if len(Q) >= _CLASSIFY_TASK_MIN:
        return _classify_parallel("seed", index, Q, k)
    cells, counts, bboxes = _live(index)
    parts: list[_Pairs] = []
    for s in range(0, len(Q), _CLASSIFY_CHUNK):
        parts.append(_seed_chunk(Q[s: s + _CLASSIFY_CHUNK], s, k, cells, counts, bboxes))
    return _Pairs.concat(parts)


def _knn_partials(index: PkdIndex, Q, k, pairs: "_Pairs", cfg):
    ref = ray.put((Q, k, *_csr(pairs)))
    needed = pairs.cell_list()
    return _scan_stage(
        index.scan_cells(needed, columns=["cell", index.id_col, *cfg.dims]),
        _KnnScan,
        (ref, cfg.dims, index.id_col, cfg.leaf_size, cfg.brute_force_cutoff),
        cfg,
        len(needed),
    )


def _knn_partials_frame(index: PkdIndex, Q, k, pairs: "_Pairs", cfg):
    """Shrunk kNN partials as a pandas frame — via the resident shard
    pool when attached (in-memory scan, shard-side shrink), else the
    Dataset scan path."""
    pool = getattr(index, "pool", None)
    if pool is not None:
        ref = ray.put((Q, k, *_csr(pairs)))
        return pool.scan("knn", ref, pairs.cell_list()).to_pandas()
    return (
        _knn_partials(index, Q, k, pairs, cfg)
        .map_batches(lambda t: _shrink_partials(t, k), batch_format="pyarrow")
        .to_pandas()
    )


#: above this many result rows (m x k) the final merge stays distributed
_DRIVER_MERGE_LIMIT = 2_000_000


def _shrink_partials(batch: pa.Table, k: int) -> pa.Table:
    """Within-batch partial top-k per qid (vectorized) — shrinks the
    merge input before it leaves the worker (pre-aggregation)."""
    qid = batch["qid"].to_numpy()
    d2 = batch["dist2"].to_numpy()
    nb = batch["neighbor"].to_numpy(zero_copy_only=False)
    rows, _ = _topk_per_qid(qid, d2, nb, k)
    return batch.take(pa.array(np.sort(rows)))


def _exact_bounds(index: PkdIndex, Q, k, cfg) -> np.ndarray:
    """Classic phase-A: scan seed cells, return per-query upper bound
    on the kth distance (the reference's guided-descent first pass)."""
    m = len(Q)
    bounds = np.full(m, np.iinfo(np.int64).max, dtype=np.int64)
    seed = _seed_cells(index, Q, k)
    if not seed:
        return bounds
    apdf = _knn_partials_frame(index, Q, k, seed, cfg)
    if len(apdf):
        aqid = apdf["qid"].to_numpy()
        ad2 = apdf["dist2"].to_numpy()
        order = np.lexsort((ad2, aqid))
        qs, ds = aqid[order], ad2[order]
        uq, starts, cnts = np.unique(qs, return_index=True, return_counts=True)
        full = cnts >= k
        bounds[uq[full]] = ds[starts[full] + k - 1]
    return bounds


def _home_stats(index: PkdIndex, Q: np.ndarray):
    """Per-query home-cell stats via Morton ``searchsorted`` — O(m log C),
    no query-vs-cell distance matrix: (counts, bboxes, d2h_min, d2h_max)
    where d2h_* are squared distances to the home cell's live bbox."""
    d = index.directory
    nd = index.config.ndim
    idx = d.index_of(d.assign_nd([Q[:, j] for j in range(nd)]))
    counts = d.counts[idx]
    bb = d.bboxes[idx]
    d2h_min = np.zeros(len(Q), dtype=np.float64)
    d2h_max = np.zeros(len(Q), dtype=np.float64)
    for j in range(nd):
        qj = Q[:, j].astype(np.float64)
        lo = bb[:, j].astype(np.float64)
        hi = bb[:, nd + j].astype(np.float64)
        dj = np.maximum(np.maximum(lo - qj, qj - hi), 0.0)
        d2h_min += dj * dj
        djx = np.maximum(np.abs(qj - lo), np.abs(hi - qj))
        d2h_max += djx * djx
    return counts, bb, d2h_min, d2h_max


def _density_bounds(index: PkdIndex, Q, k, safety: int = 2, stats=None) -> np.ndarray:
    """Estimated kth-distance bound from directory stats alone (no
    scan): min of (a) the home-cell uniform-density estimate
    r_k^2 ~ (safety * k * volume / count)^(2/d) — tight when queries
    follow the build distribution — and (b) the provable cumulative
    directory bound (:func:`_center_dir_bounds`) — what keeps OOD
    queries from scanning the world.  NOT exact below the provable
    bound — every query is verified after the scan and repaired
    exactly if the estimate was too small (see ``knn``)."""
    d = index.directory
    nd = index.config.ndim
    counts, bb, d2h_min, d2h_max = stats if stats is not None else _home_stats(index, Q)
    # float to avoid overflow at d >= 3 (volume alone can reach 2^60)
    vol = np.ones(len(bb), dtype=np.float64)
    for j in range(nd):
        vol *= (bb[:, nd + j] - bb[:, j] + 1).astype(np.float64)
    with np.errstate(divide="ignore"):
        r_d = safety * float(k) * vol / np.maximum(counts, 1)  # ~ r^d
    est_f = np.power(r_d, 2.0 / nd)
    est = np.minimum(est_f, float(np.iinfo(np.int64).max // 4)).astype(np.int64)
    est = np.maximum(est, 4)  # never a zero-radius bound
    # empty home cell -> no basis for an estimate
    est[counts == 0] = np.iinfo(np.int64).max
    # home-cell provable cap: the home cell's rows all lie within its
    # bbox max-dist, so when it holds >= k rows that distance bounds
    # the kth.  O(m), no all-cells pass.
    cap0_ok = counts >= k
    est[cap0_ok] = np.minimum(
        est[cap0_ok],
        np.minimum(d2h_max[cap0_ok], float(np.iinfo(np.int64).max // 4)).astype(np.int64),
    )
    # directory-bound pass ONLY for queries the home cell can't bound
    # tightly: out-of-distribution (outside the home bbox) or a home
    # cell with < k rows.  In-distribution batches skip it entirely.
    need = (counts < k) | (d2h_min > 0)
    if need.any() and (d.counts > 0).any():
        capn = _center_dir_bounds(index, Q[need], k)
        est[need] = np.minimum(
            est[need],
            np.minimum(
                capn.astype(np.float64), float(np.iinfo(np.int64).max // 4)
            ).astype(np.int64),
        )
    return est


def _candidate_pairs(index: PkdIndex, Q, bounds) -> "_Pairs":
    if len(Q) >= _CLASSIFY_TASK_MIN:
        return _classify_parallel("candidate", index, Q, bounds)
    cells, counts, bboxes = _live(index)
    parts: list[_Pairs] = []
    for s in range(0, len(Q), _CLASSIFY_CHUNK):
        parts.append(
            _candidate_chunk(
                Q[s: s + _CLASSIFY_CHUNK], s, bounds[s: s + _CLASSIFY_CHUNK], cells, bboxes
            )
        )
    return _Pairs.concat(parts)


def _bounds_from_partials(qid, d2, nb, m: int, k: int, k_eff: int) -> np.ndarray:
    """Per-query kth-distance upper bound from scan partials: the kth
    smallest found distance (exact over the rows seen; +inf where
    fewer than ``k_eff`` rows were found)."""
    bounds = np.full(m, np.iinfo(np.int64).max, dtype=np.int64)
    if len(qid):
        rows, _ = _topk_per_qid(qid, d2, nb, k)
        qs, ds = qid[rows], d2[rows]
        uq, st, ct = np.unique(qs, return_index=True, return_counts=True)
        full = ct >= k_eff
        bounds[uq[full]] = ds[st[full] + ct[full] - 1]
    return bounds


#: how many nearest cell centers feed each query's directory bound —
#: min over a few candidates approaches the true min-over-max
_CENTER_BOUND_T = 4

#: center sets up to this size take the chunked dense pass in
#: :func:`_center_dir_bounds`; larger directories use block pruning
_CENTER_BRUTE_MAX = 8_192


def _nearest_centers_dense(
    centers: list[np.ndarray], Q: np.ndarray, T: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """T nearest centers per query via a query-chunked dense distance
    matrix (float64 squared distances, the same space the maxdist
    reduction uses) -> triplets (q_idx, center_idx, d2).  Each chunk's
    matrix stays ~32 MB, so memory is flat in m."""
    m = len(Q)
    C = len(centers[0])
    nd = len(centers)
    T = min(T, C)
    # |q - c|^2 = |q|^2 - 2 q.c + |c|^2 — one BLAS sgemm instead of
    # per-dim broadcast temporaries.  float32 everywhere: the distances
    # only ORDER the candidates (the provable bound is the float64
    # maxdist computed by the caller over whichever cells are picked),
    # and float32 halves the memory traffic of the m x C pass — the
    # pass is DRAM-bound, not compute-bound.
    mu = [float(c.mean()) for c in centers]  # recentre: keeps float32
    CM = np.stack(
        [(c - mu[j]).astype(np.float32) for j, c in enumerate(centers)], axis=1
    )  # (C, d)
    QM = np.stack(
        [(Q[:, j] - mu[j]).astype(np.float32) for j in range(nd)], axis=1
    )  # (m, d)
    c2 = (CM * CM).sum(axis=1)  # (C,)
    neg2C = np.ascontiguousarray(CM.T * np.float32(-2.0))
    chunk = max(64, (1 << 23) // max(C, 1))
    out_q: list[np.ndarray] = []
    out_n: list[np.ndarray] = []
    out_d: list[np.ndarray] = []
    for s in range(0, m, chunk):
        e = min(s + chunk, m)
        Qc = QM[s:e]
        D = Qc @ neg2C
        D += (Qc * Qc).sum(axis=1)[:, None]
        D += c2[None, :]
        if T < C:
            part = np.argpartition(D, T - 1, axis=1)[:, :T]
        else:
            part = np.broadcast_to(np.arange(C, dtype=np.int64), (e - s, C))
        rows = np.repeat(np.arange(s, e, dtype=np.int64), part.shape[1])
        cols = part.ravel().astype(np.int64)
        out_q.append(rows)
        out_n.append(cols)
        out_d.append(D[rows - s, cols].astype(np.float64))
    return np.concatenate(out_q), np.concatenate(out_n), np.concatenate(out_d)


def _center_dir_bounds(
    index: PkdIndex, Q: np.ndarray, k: int, return_seeds: bool = False
):
    """PROVABLE per-query kth-distance bounds at sub-O(m x C) cost:

    1. find each query's T nearest CELL CENTERS among cells holding
       >= k points — a block-pruned kNN over the (tiny) center set
       (``kdtree.block_knn_triplets``), NOT an m x C matrix;
    2. bound = min over those T cells of the query's bbox
       max-distance (each such cell alone holds >= k points within
       that distance, so the min over them is a valid cap).

    The true min-over-max cell is almost always among the nearest few
    centers; when it is not, the bound is merely looser — still
    provable, so kNN exactness never depends on the choice.

    ``return_seeds``: also return the (query, cell) candidate pairs —
    each query's T nearest >= k-count cells — as flat arrays
    (pair_qids, pair_cells).  The serving path refines the coarse
    CELL-bbox max-distance bound against those cells' resident BLOCK
    bboxes (``IndexShard.knn_seed``) before candidate expansion.
    Measured on varden OOD: the refinement cuts admitted (query, cell)
    routings ~4x — the median bound barely moves but the TAIL (queries
    whose nearest cells are wide) is where scan cost lives."""
    from pkd_tree_ray.kdtree import block_knn_triplets, kd_block_partition

    cells, counts, bboxes = _live(index)
    m = len(Q)
    inf = np.iinfo(np.int64).max
    if not len(cells):
        b = np.full(m, inf, dtype=np.int64)
        return (b, None, None) if return_seeds else b
    nd = Q.shape[1]
    ok = counts >= k
    if not ok.any():
        # k exceeds every single cell (not a real workload): all live
        # cells together hold the k nearest
        bounds = np.full(m, 0, dtype=np.float64)
        for s in range(0, m, _CLASSIFY_CHUNK):
            bounds[s: s + _CLASSIFY_CHUNK] = pnd_b_max_dist2(
                Q[s: s + _CLASSIFY_CHUNK], bboxes
            ).max(axis=1)
        b = np.minimum(bounds, float(inf // 4)).astype(np.int64)
        return (b, None, None) if return_seeds else b
    bb = bboxes[ok]
    C = len(bb)
    centers = [((bb[:, j] + bb[:, nd + j]) // 2).astype(bb.dtype) for j in range(nd)]
    T = min(_CENTER_BOUND_T, C)
    pos = np.arange(C, dtype=np.int64)

    def select(QS: np.ndarray):
        if C > _CENTER_BRUTE_MAX:
            # huge directory (~10^6 cells): block-pruned kNN over the
            # center set — never an m x C matrix
            order, blo, bhi, bxs = kd_block_partition(centers, 64)
            return block_knn_triplets(
                [c[order] for c in centers], pos[order], blo, bhi, bxs,
                [np.ascontiguousarray(QS[:, j]) for j in range(nd)], T,
            )
        # small/mid center set: a chunked dense pass is ~10x faster
        # than the block kernel's per-block bookkeeping at large m
        return _nearest_centers_dense(centers, QS, T)

    # coarse-grid query dedup: nearby queries share their CANDIDATE
    # cells (the selection is a heuristic; the bound below is computed
    # per query over whichever cells are picked, so provability is
    # unaffected).  One representative per occupied coarse cell cuts
    # the m x C selection pass ~10x at large m.
    reps_inv = None
    if m > 4 * _CLASSIFY_CHUNK and C > 64:
        bkt = max(2, int(2 ** (14 / nd)))
        keys = np.zeros(m, dtype=np.int64)
        for j in range(nd):
            qj = Q[:, j].astype(np.float64)
            lo_, hi_ = float(qj.min()), float(qj.max())
            w = (hi_ - lo_) or 1.0
            bk = np.minimum(((qj - lo_) * (bkt / w)).astype(np.int64), bkt - 1)
            keys = keys * bkt + bk
        uq_keys, inv = np.unique(keys, return_inverse=True)
        if len(uq_keys) <= m // 2:
            reps_inv = inv
    if reps_inv is not None:
        reps = np.zeros(int(reps_inv.max()) + 1, dtype=np.int64)
        reps[reps_inv] = np.arange(m)
        rq3, rn3, _ = select(Q[reps])
        # expand each representative's candidate list to its members
        cnts = np.bincount(rq3, minlength=len(reps))
        offs = np.concatenate([[0], np.cumsum(cnts)])
        sorted_n3 = rn3[np.argsort(rq3, kind="stable")]
        cnt_q = cnts[reps_inv]
        tot = int(cnt_q.sum())
        q3 = np.repeat(np.arange(m, dtype=np.int64), cnt_q)
        starts_q = np.cumsum(cnt_q) - cnt_q
        idx = (
            np.arange(tot, dtype=np.int64)
            - np.repeat(starts_q, cnt_q)
            + np.repeat(offs[reps_inv], cnt_q)
        )
        n3 = sorted_n3[idx]
    else:
        q3, n3, _ = select(Q)
    # pairwise max-dist to each query's candidate cells, min-reduced
    bq = bb[n3]
    md = np.zeros(len(q3), dtype=np.float64)
    for j in range(nd):
        qj = Q[q3, j].astype(np.float64)
        dj = np.maximum(np.abs(qj - bq[:, j]), np.abs(qj - bq[:, nd + j]))
        md += dj * dj
    bounds = np.full(m, np.float64(inf), dtype=np.float64)
    np.minimum.at(bounds, q3, md)
    # float64(int64.max) rounds UP to 2^63 and overflows the int64
    # cast to a NEGATIVE bound — clamp at max//4 (as _density_bounds)
    out = np.minimum(bounds, float(inf // 4)).astype(np.int64)
    if not return_seeds:
        return out
    return out, q3, cells[ok][n3]


def _ood_mask(index: PkdIndex, Q: np.ndarray, k_eff: int, stats=None) -> np.ndarray:
    """True for queries the density heuristic has no basis for: the
    home cell holds < k points, or the query lies outside its live
    bbox (stats from :func:`_home_stats`, precomputed by the caller
    when it also feeds :func:`_density_bounds`).  The complementary
    set is served by the r1 fast path (density bound + shard-fused
    classification) at O(m) driver cost; only OOD queries pay the
    nearest-center directory-bound pass."""
    counts, _, d2h_min, _ = stats if stats is not None else _home_stats(index, Q)
    return (counts < k_eff) | (d2h_min > 0)


def _remap_qids(merged, sel: np.ndarray):
    """Rewrite subset-local qids back to batch positions (``sel[qid]``)
    — driver-side for tables, per-block for ref-backed Datasets."""
    if isinstance(merged, pa.Table):
        q = merged["qid"].to_numpy()
        return merged.set_column(
            merged.schema.get_field_index("qid"), "qid", pa.array(sel[q], pa.int64())
        )
    sel_ref = ray.put(sel)

    def remap(t: pa.Table) -> pa.Table:
        s = _cached_get(sel_ref)
        q = t["qid"].to_numpy()
        return t.set_column(
            t.schema.get_field_index("qid"), "qid", pa.array(s[q], pa.int64())
        )

    return merged.map_batches(remap, batch_format="pyarrow")


def _pool_serve(index: PkdIndex, pool, Q: np.ndarray, k: int, k_eff: int):
    """Serving-path kNN dispatch: split the batch by distribution.

    In-distribution queries (home cell holds >= k points AND the query
    sits inside its bbox) take the one-scan path — O(m) density bounds,
    classification fused into the shards (``IndexShard.knn_auto``
    prunes only its own resident cells), verify, and the caller repairs
    the (normally empty) unsafe remainder.  This is the r2-verdict
    "skip the extra bound passes wholesale" fast path: no driver-side
    query-vs-cell matrix at all.

    Out-of-distribution queries run a two-phase seed walk (the
    distributed analog of the reference's guided descent seeding the
    bounded queue at the home leaf, ``nn_search.hpp:108-125``):
    (a) the provable nearest-center directory bound
    (``_center_dir_bounds``: block-kNN over the tiny cell-center set,
    then maxdist to the nearest few >= k cells) picks each query's
    SEED cell; (b) one shard hop (``ShardedQueryPool.knn_seed_bounds``)
    scans just that seed cell block-pruned and returns the exact kth
    distance within it — a provable upper bound on the global kth that
    is typically ~the true kth, not ~a cell diameter, so candidate
    expansion admits a handful of cells instead of a ring of them.
    No O(m x C) matrix anywhere.  Both bounds are provable, so OOD
    verification never repairs.

    Returns ``(merged, unsafe_qids)`` in batch-global qid space;
    ``merged`` is a pyarrow Table (small) or ref-backed Dataset."""
    def ood_bounds(Qo: np.ndarray) -> tuple[np.ndarray, np.ndarray | None]:
        base, pq, pc = _center_dir_bounds(index, Qo, k, return_seeds=True)
        if pq is None or not hasattr(pool, "knn_seed_bounds"):
            return base, None
        kth, best = pool.knn_seed_bounds(Qo, k, pq, pc)
        return np.minimum(base, kth), best

    stats = _home_stats(index, Q)
    ood = _ood_mask(index, Q, k_eff, stats=stats)
    n_ood = int(ood.sum())
    if n_ood == 0:
        bounds = _density_bounds(index, Q, k, stats=stats)
        return pool.knn_topk(Q, k, bounds, k_eff)
    if n_ood == len(Q):
        b, best = ood_bounds(Q)
        return pool.knn_topk(Q, k, b, k_eff, seeds=best)
    ii = np.nonzero(~ood)[0]
    oi = np.nonzero(ood)[0]
    stats_ii = tuple(s[ii] for s in stats)
    mi, ui = pool.knn_topk(
        Q[ii], k, _density_bounds(index, Q[ii], k, stats=stats_ii), k_eff
    )
    bo, besto = ood_bounds(Q[oi])
    mo, uo = pool.knn_topk(Q[oi], k, bo, k_eff, seeds=besto)
    mi = _remap_qids(mi, ii)
    mo = _remap_qids(mo, oi)
    unsafe = np.sort(np.concatenate([ii[ui], oi[uo]]))
    if isinstance(mi, pa.Table) and isinstance(mo, pa.Table):
        merged = pa.concat_tables([mi, mo])
        srt = np.lexsort((merged["rank"].to_numpy(), merged["qid"].to_numpy()))
        return merged.take(pa.array(srt)), unsafe
    import ray.data as _rd

    di = mi if not isinstance(mi, pa.Table) else _rd.from_arrow(mi)
    do = mo if not isinstance(mo, pa.Table) else _rd.from_arrow(mo)
    return di.union(do), unsafe


def _merge_topk_driver(pdf, k):
    qid = pdf["qid"].to_numpy()
    d2 = pdf["dist2"].to_numpy()
    nb = pdf["neighbor"].to_numpy()
    rows, ranks = _topk_per_qid(qid, d2, nb, k)
    return qid[rows], ranks, nb[rows], d2[rows]


def knn(index: PkdIndex, qx: np.ndarray, qy: np.ndarray, k: int, config=None):
    """2-D batch kNN — see :func:`knn_nd`."""
    Q = np.stack(
        [np.asarray(qx, dtype=np.int64), np.asarray(qy, dtype=np.int64)], axis=1
    )
    return knn_nd(index, Q, k, config)


def knn_nd(index: PkdIndex, Q: np.ndarray, k: int, config=None):
    """Batch kNN -> (qid, rank, neighbor, dist2); squared distances,
    ties broken by (dist2, neighbor id), rank 1-based.  Exact.
    ``Q``: (m, d) query matrix in the index's dimensionality.

    Strategy (the distributed analog of guided descent + sibling
    pruning, ``nn_search.hpp:108-125``):

    1. estimate each query's kth-distance bound from the directory's
       per-cell density — no data touched;
    2. ONE scan over cells within the bound, per-fragment partial
       top-k, vectorized merge;
    3. verify: a query whose kth found distance exceeds its estimate
       (or that found < k rows) may have missed a neighbor in an
       unscanned cell — re-run exactly those queries with the classic
       two-phase (seed-scan bound, provably sufficient radius).  The
       repair set is empty for well-estimated uniform data and small
       under skew, so the common case does one scan instead of two.

    Returns a pyarrow Table when the result fits the driver
    (m x k <= _DRIVER_MERGE_LIMIT) else a streaming Dataset merged by
    a distributed groupby (which always uses the provably-sufficient
    two-phase bound).
    """
    cfg = config or index.config
    Q = np.asarray(Q, dtype=np.int64)
    if Q.ndim != 2 or Q.shape[1] != cfg.ndim:
        raise ValueError(f"query matrix must be (m, {cfg.ndim})")
    m = len(Q)

    def empty():
        return pa.table(
            {
                "qid": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "neighbor": pa.array([], pa.int64()),
                "dist2": pa.array([], pa.int64()),
            }
        )

    if index.total_rows == 0 or m == 0:
        return empty()

    if m * k > _DRIVER_MERGE_LIMIT and getattr(index, "pool", None) is None:
        # distributed path: exact two-phase + groupby(qid) merge (the
        # pool path below handles large results itself — its merge runs
        # as parallel qid-slice tasks and returns a ref-backed Dataset)
        bounds = _exact_bounds(index, Q, k, cfg)
        pairs = _candidate_pairs(index, Q, bounds)
        partials = _knn_partials(index, Q, k, pairs, cfg).map_batches(
            lambda t: _shrink_partials(t, k), batch_format="pyarrow"
        )

        def topk_bucket(group: pa.Table) -> pa.Table:
            # one Python call per qid HASH bucket, the vectorized cut
            # over every qid inside (per-raw-qid map_groups is one
            # Python call per QUERY — O(m) calls at serving scale)
            qid = group["qid"].to_numpy()
            d2 = group["dist2"].to_numpy()
            nb = group["neighbor"].to_numpy(zero_copy_only=False)
            rows, ranks = _topk_per_qid(qid, d2, nb, k)
            out = group.take(pa.array(rows))
            return pa.table(
                {
                    "qid": out["qid"],
                    "rank": pa.array(ranks, pa.int64()),
                    "neighbor": out["neighbor"],
                    "dist2": out["dist2"],
                }
            )

        def add_qbkt(t: pa.Table) -> pa.Table:
            from pkd_tree_ray.pairjoin import _bucket_of

            return t.append_column(
                "qbkt", pa.array(_bucket_of(t["qid"].to_numpy()))
            )

        return (
            partials.map_batches(add_qbkt, batch_format="pyarrow")
            .groupby("qbkt")
            .map_groups(topk_bucket, batch_format="pyarrow")
        )

    k_eff_pool = min(k, index.total_rows)
    pool = getattr(index, "pool", None)
    if pool is not None:
        # serving path: distribution-split dispatch — in-distribution
        # queries one-scan with O(m) bounds, OOD queries the exact
        # two-phase seed walk — see _pool_serve
        merged, uidx = _pool_serve(index, pool, Q, k, k_eff_pool)
        repair_tbl = None
        if len(uidx):
            b2 = _exact_bounds(index, Q[uidx], k, cfg)
            pairs2 = _candidate_pairs(index, Q[uidx], b2)
            pdf2 = _knn_partials_frame(index, Q[uidx], k, pairs2, cfg)
            q2, r2, n2, d2_ = _merge_topk_driver(pdf2, k)
            repair_tbl = pa.table(
                {
                    "qid": pa.array(uidx[q2], pa.int64()),
                    "rank": pa.array(r2, pa.int64()),
                    "neighbor": pa.array(n2),
                    "dist2": pa.array(d2_, pa.int64()),
                }
            )
        if isinstance(merged, pa.Table):
            if repair_tbl is not None:
                merged = pa.concat_tables([merged, repair_tbl])
                srt = np.lexsort((merged["rank"].to_numpy(), merged["qid"].to_numpy()))
                merged = merged.take(pa.array(srt))
            return merged
        import ray.data as _rd

        if repair_tbl is not None and repair_tbl.num_rows:
            merged = merged.union(_rd.from_arrow(repair_tbl))
        return merged

    # no-pool fast path: density-estimated bound, one scan, exact repair
    bounds = _density_bounds(index, Q, k)
    pairs = _candidate_pairs(index, Q, bounds)
    pdf = _knn_partials_frame(index, Q, k, pairs, cfg)
    rq, rr, rn, rd = (
        _merge_topk_driver(pdf, k)
        if len(pdf)
        else (np.zeros(0, np.int64),) * 4
    )

    # verification: count + kth distance per query
    found = np.zeros(m, dtype=np.int64)
    kth = np.full(m, np.iinfo(np.int64).max, dtype=np.int64)
    if len(rq):
        uq, starts, cnts = np.unique(rq, return_index=True, return_counts=True)
        found[uq] = cnts
        kth[uq] = rd[starts + cnts - 1]
    k_eff = min(k, index.total_rows)
    unsafe = (found < k_eff) | (kth > bounds)
    if unsafe.any():
        uidx = np.nonzero(unsafe)[0]
        b2 = _exact_bounds(index, Q[uidx], k, cfg)
        pairs2 = _candidate_pairs(index, Q[uidx], b2)
        pdf2 = _knn_partials_frame(index, Q[uidx], k, pairs2, cfg)
        q2, r2, n2, d2_ = _merge_topk_driver(pdf2, k)
        keep = ~np.isin(rq, uidx)
        rq = np.concatenate([rq[keep], uidx[q2]])
        rr = np.concatenate([rr[keep], r2])
        rn = np.concatenate([rn[keep], n2])
        rd = np.concatenate([rd[keep], d2_])
        order = np.lexsort((rr, rq))
        rq, rr, rn, rd = rq[order], rr[order], rn[order], rd[order]

    return pa.table(
        {
            "qid": pa.array(rq, pa.int64()),
            "rank": pa.array(rr, pa.int64()),
            "neighbor": pa.array(rn),
            "dist2": pa.array(rd, pa.int64()),
        }
    )


# -- per-query visit diagnostics ---------------------------------------


class _KnnStatsScan:
    """Diagnostic scan kernel: per (query, cell) work counters instead
    of neighbors — kd-tree nodes visited (``testFramework.h:516``'s
    per-query counter) for tree-served fragments, rows scanned for
    brute-forced ones."""

    def __init__(self, queries_ref, dims, id_col, leaf_size, cutoff, tree_provider=None):
        (Q, k, cells, offs, qids) = _maybe_get(queries_ref)
        self.Q, self.k = Q, k
        self.dims = dims
        self.cells, self.offs, self.qids = cells, offs, qids
        self.cutoff = cutoff
        self.tree_provider = tree_provider

    def __call__(self, batch: pa.Table) -> pa.Table:
        cell_col = batch["cell"].to_numpy()
        cs = [batch[dc].to_numpy() for dc in self.dims]
        out_qid: list[np.ndarray] = []
        out_vis: list[np.ndarray] = []
        out_rows: list[np.ndarray] = []
        out_cell: list[np.ndarray] = []
        for cell, sl in _iter_cell_runs(cell_col):
            i = np.searchsorted(self.cells, cell)
            if i >= len(self.cells) or self.cells[i] != cell:
                continue
            qs = self.qids[self.offs[i]: self.offs[i + 1]]
            if not len(qs):
                continue
            fc = [c[sl] for c in cs]
            n_frag = len(fc[0])
            if n_frag >= self.cutoff:
                tree = (
                    self.tree_provider(cell, fc)
                    if self.tree_provider
                    else KDTreeND(fc)
                )
                vis = np.empty(len(qs), dtype=np.int64)
                for j, q in enumerate(qs):
                    _, _, v = tree.knn_point(self.Q[q], self.k)
                    vis[j] = v
                out_qid.append(qs.astype(np.int64))
                out_vis.append(vis)
                out_rows.append(np.zeros(len(qs), dtype=np.int64))
            else:
                out_qid.append(qs.astype(np.int64))
                out_vis.append(np.zeros(len(qs), dtype=np.int64))
                out_rows.append(np.full(len(qs), n_frag, dtype=np.int64))
            out_cell.append(np.full(len(qs), cell, dtype=np.int64))
        if not out_qid:
            return pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "nodes_visited": pa.array([], pa.int64()),
                    "rows_scanned": pa.array([], pa.int64()),
                    "cell": pa.array([], pa.int64()),
                }
            )
        qid = np.concatenate(out_qid)
        return pa.table(
            {
                "qid": pa.array(qid),
                "nodes_visited": pa.array(np.concatenate(out_vis)),
                "rows_scanned": pa.array(np.concatenate(out_rows)),
                "cell": pa.array(np.concatenate(out_cell)),
            }
        )


def knn_stats(index: PkdIndex, Q: np.ndarray, k: int, config=None) -> pa.Table:
    """Per-query kNN work metrics (the reference prints per-query
    visited-node counts, ``tests/testFramework.h:516``): for each
    query, the number of candidate cells its bound touched, kd-tree
    nodes visited in tree-served fragments, and rows scanned in
    brute-forced fragments.  Diagnostic — uses the exact two-phase
    bound so the counts reflect the provably-sufficient search volume.

    Returns a table (qid, cells_scanned, nodes_visited, rows_scanned)
    sorted by qid."""
    cfg = config or index.config
    Q = np.asarray(Q, dtype=np.int64)
    m = len(Q)
    empty = pa.table(
        {
            "qid": pa.array([], pa.int64()),
            "cells_scanned": pa.array([], pa.int64()),
            "nodes_visited": pa.array([], pa.int64()),
            "rows_scanned": pa.array([], pa.int64()),
        }
    )
    if m == 0 or index.total_rows == 0:
        return empty
    bounds = _exact_bounds(index, Q, k, cfg)
    pairs = _candidate_pairs(index, Q, bounds)
    needed = pairs.cell_list()
    if not needed:
        return empty
    ref = ray.put((Q, k, *_csr(pairs)))
    pdf = (
        _scan_stage(
            index.scan_cells(needed, columns=["cell", *cfg.dims]),
            _KnnStatsScan,
            (ref, cfg.dims, index.id_col, cfg.leaf_size, cfg.brute_force_cutoff),
            cfg,
            len(needed),
        )
        .to_pandas()
    )
    agg = pdf.groupby("qid").agg(
        cells_scanned=("cell", "nunique"),
        nodes_visited=("nodes_visited", "sum"),
        rows_scanned=("rows_scanned", "sum"),
    ).reset_index().sort_values("qid")
    return pa.Table.from_pandas(agg, preserve_index=False)
