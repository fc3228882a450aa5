"""Resident shard actors — the serving layer of the two-level index.

The Dataset scan path (``queries.py``) re-reads cell Parquet on every
query batch; that is the right shape for one-shot pipelines, but a
serving workload (the reference's usage: build once in shared memory,
answer millions of queries — ``tests/test.cpp:34-512``) pays the
object-store/decode cost over and over, and on bandwidth-limited nodes
that cost is the scaling ceiling.  The north-star design is
"per-partition in-memory kd-trees ... inside stateful actor-pool
map_batches": this module is that state made explicit — a fixed pool
of ``IndexShard`` actors, each owning a deterministic subset of cells
(greedy balance by directory counts), holding the cells' coordinate
arrays (and lazily-built per-cell kd-trees) in its heap.

Query batches then ship ONLY the query payload (broadcast once via
``ray.put``) to each shard, and shards run the very same scan kernels
as the Dataset path (``_RangeCountScan`` / ``_CircleCountScan`` /
``_RangeReportScan`` / ``_KnnScan``) over in-memory batches — identical
semantics, zero Parquet I/O, cache-resident compute.  ``PkdIndex``
update methods return NEW index objects; ``ShardedQueryPool.refresh``
re-syncs only the cells whose files changed (per-cell versioned file
names make this an equality check).

This is the one place the engine drops below the Dataset API, and it is
exactly the sanctioned case: a shared, long-lived, mutable-by-refresh
distributed index that ``map_batches`` cannot hold across pipelines.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa

import ray

from pkd_tree_ray.index import PkdIndex, _in_sorted

#: a foreign query ball overlapping more than this fraction of a cell's
#: bbox volume takes the bounded top-k path instead of the sliver
#: filter (see knn_auto); env-overridable for experiments.
_DEEP_OVERLAP_FRAC = float(os.environ.get("PKD_DEEP_FRAC", "0.125"))

def _qid_ascending(q3, n3, d3):
    """Return the triplet sorted by qid (the emit-chunk invariant the
    per-chunk binary-search merge relies on).  The block kernels return
    qid-grouped rows on their top-k-cut paths but per-block concatenated
    rows on early-return paths — check first, sort only when needed."""
    if len(q3) > 1 and not bool(np.all(q3[1:] >= q3[:-1])):
        o = np.argsort(q3, kind="stable")
        return q3[o], n3[o], d3[o]
    return q3, n3, d3


#: kd-ordered sub-cell block size (rows) and the minimum cell size that
#: gets a block index at sync — below it, plain brute is cheaper than
#: the block bookkeeping.  512 measured best on the serving suite at
#: both 8- and 32-way concurrency (vs 2048: 32-way concurrent kNN wall
#: 3.94 -> 2.67 s; 256 reverses the gain, per-block dispatch dominates).
_BLOCK_ROWS = int(os.environ.get("PKD_BLOCK_ROWS", "512"))
_BLOCK_MIN_ROWS = 4 * _BLOCK_ROWS


@ray.remote(num_cpus=0)
class IndexShard:
    """Holds a subset of cells in memory and runs scan kernels on them.

    State: ``cells[cell] = (file, ids, x, y)``; ``trees[cell]`` caches
    the per-cell kd-tree across query batches (built on first use by a
    kernel whose thresholds ask for a tree).

    Declared ``num_cpus=0``: shards are resident state, not a CPU
    reservation — reserving a slot per shard would starve Ray Data
    tasks (build/update pipelines) sharing the cluster.  Actual scan
    concurrency is bounded by the fan-out of each query batch."""

    def __init__(self, id_col: str, dims: tuple[str, ...], leaf_size: int, cutoff: int):
        self.id_col = id_col
        self.dims = tuple(dims)
        self.nd = len(self.dims)
        self.leaf_size = leaf_size
        self.cutoff = cutoff
        #: cells[cell] = (file_key, ids, [per-dim coord arrays], bbox(2d,))
        self.cells: dict[int, tuple] = {}
        self.trees: dict[int, object] = {}
        #: cells this shard PRIMARILY owns (rank 0); replicated hot
        #: cells are resident at other ranks too and answer a
        #: qid-modulo slice of that cell's queries
        self.primary: set[int] = set()
        #: role[cell] = (rank, n_holders) for every resident cell
        self.role: dict[int, tuple[int, int]] = {}
        #: measured serving work since the last drain: per resident
        #: cell, sum over kNN batches of (admitted queries x resident
        #: rows) — the pool's load-adaptive rebalance signal
        self.load: dict[int, float] = {}
        #: per-section wall seconds inside knn_auto since the last
        #: drain_sections — scaling-bottleneck diagnostics
        self.sect: dict[str, float] = {}
    def drain_sections(self) -> dict:
        out, self.sect = self.sect, {}
        return out

    def sync(self, cell_files: dict[int, tuple]) -> int:
        """Load added/changed cells, drop removed ones.  Values are
        (data_files, tombstone_files, rank, n_holders); files are
        versioned so "changed" is a filename comparison.  Tombstoned
        ids are dropped at load — shards hold LIVE rows only.
        ``rank``/``n_holders`` describe hot-cell replication (see
        ``ShardedQueryPool.refresh``): rank 0 is the primary; kernels
        that ENUMERATE resident cells answer a deterministic
        ``qid % n_holders == rank`` slice of a replicated cell's
        queries, so every query is answered exactly once while the hot
        cell's serving load spreads across its holders.  Single-count
        kernels (count_matches) run on the primary only.  Returns
        resident row count."""
        import pyarrow.parquet as pq

        for cell in [c for c in self.cells if c not in cell_files]:
            del self.cells[cell]
            self.trees.pop(cell, None)
            self.primary.discard(cell)
            self.role.pop(cell, None)
        for cell, (files, tombs, rank, n_holders) in cell_files.items():
            self.role[cell] = (int(rank), int(n_holders))
            if rank == 0:
                self.primary.add(cell)
            else:
                self.primary.discard(cell)
            key = (tuple(files), tuple(tombs))
            cur = self.cells.get(cell)
            if cur is not None and cur[0] == key:
                continue
            ts = [pq.read_table(f, columns=[self.id_col, *self.dims]) for f in files]
            t = pa.concat_tables(ts) if len(ts) > 1 else ts[0]
            if tombs:
                dead = np.unique(
                    np.concatenate(
                        [
                            pq.read_table(f, columns=[self.id_col])[
                                self.id_col
                            ].to_numpy(zero_copy_only=False)
                            for f in tombs
                        ]
                    )
                )
                keep = ~_in_sorted(
                    t[self.id_col].to_numpy(zero_copy_only=False), dead
                )
                t = t.filter(pa.array(keep))
            fc = [np.ascontiguousarray(t[dc].to_numpy()) for dc in self.dims]
            ids = t[self.id_col].to_numpy(zero_copy_only=False)
            if len(fc[0]):
                bbox = np.array(
                    [c.min() for c in fc] + [c.max() for c in fc], dtype=np.int64
                )
            else:
                bbox = np.array(
                    [0] * self.nd + [-1] * self.nd, dtype=np.int64
                )
            # kd-ordered sub-cell blocks (tight bboxes): kNN kernels
            # prune to blocks within the kth bound instead of brute-
            # scanning the whole cell (see kdtree.block_knn_triplets)
            blocks = None
            if len(fc[0]) >= _BLOCK_MIN_ROWS:
                from pkd_tree_ray.kdtree import kd_block_partition

                order, blo, bhi, bboxes_blk = kd_block_partition(fc, _BLOCK_ROWS)
                fc = [np.ascontiguousarray(c[order]) for c in fc]
                ids = ids[order]
                blocks = (blo, bhi, bboxes_blk)
            self.cells[cell] = (key, ids, fc, bbox, blocks)
            self.trees.pop(cell, None)
        return int(sum(len(v[1]) for v in self.cells.values()))

    def _tree(self, cell: int, fc: list[np.ndarray]):
        from pkd_tree_ray.kdtree import KDTreeND

        t = self.trees.get(cell)
        if t is None:
            # tie_key = the cell's resident ids, so the bounded kNN
            # queue breaks kth-distance ties by neighbor id (ADVICE r1)
            t = KDTreeND(fc, tie_key=self.cells[cell][1])
            self.trees[cell] = t
        return t

    def knn_auto(self, payload) -> pa.Table:
        """Shard-local candidate classification + kNN partials in one
        hop: for each resident cell, queries whose kth-distance bound
        reaches the cell's bbox (the sibling-prune test applied here,
        against only this shard's cells) are answered with the
        cache-blocked brute kernel.  Returns shrunk per-query top-k
        partials (qid, neighbor, dist2)."""
        Q, k, bounds = payload[:3]  # Q: (m, d) query matrix
        # optional 4th element: per-query SEED cell (the best candidate
        # found by knn_seed) — served with the exact local top-k path
        # even when the query ball only slivers it, because the global
        # bound ~equals that cell's block maxdist and the sliver filter
        # would scan every near-side block (OOD r4 finding)
        seeds = payload[3] if len(payload) > 3 else None
        nd = self.nd
        t_sect = time.perf_counter()

        def _mark(name: str) -> None:
            nonlocal t_sect
            now = time.perf_counter()
            self.sect[name] = self.sect.get(name, 0.0) + (now - t_sect)
            t_sect = now

        Qc = [np.ascontiguousarray(Q[:, j]) for j in range(nd)]
        out_q: list[np.ndarray] = []
        out_n: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        # dense per-cell admission: O(m x C_shard) but vectorized and
        # cheap in absolute terms (~35 ms per 100k queries x 29 cells);
        # a run-union pre-filter was tried and REJECTED — shard cell
        # sets are spatially scattered (balance-driven assignment), so
        # 16-cell union boxes admit ~85% of queries and only add work
        for cell, (key, ids, fc, bbox, blocks) in self.cells.items():
            rank, n_holders = self.role.get(cell, (0, 1))
            if len(fc[0]) == 0:
                continue
            dj = np.maximum(np.maximum(bbox[0] - Qc[0], Qc[0] - bbox[nd]), 0)
            bd2 = dj * dj
            for j in range(1, nd):
                dj = np.maximum(np.maximum(bbox[j] - Qc[j], Qc[j] - bbox[nd + j]), 0)
                bd2 += dj * dj
            qs = np.nonzero(bd2 <= bounds)[0]
            if n_holders > 1:
                # replicated hot cell: every holder answers its own
                # deterministic qid slice — each query exactly once,
                # the cell's serving load spread across the holders
                qs = qs[qs % n_holders == rank]
            if not len(qs):
                continue
            _mark("classify")
            t_cell = time.perf_counter()
            self._knn_cell(
                cell, ids, fc, bbox, blocks, Qc, qs, bd2[qs],
                k, bounds, seeds, out_q, out_n, out_d,
            )
            # serving-work telemetry (MEASURED kernel seconds — the
            # quantity wall time actually rides on) for
            # ShardedQueryPool.rebalance
            self.load[cell] = self.load.get(cell, 0.0) + (
                time.perf_counter() - t_cell
            )
            _mark("scan")
        _mark("classify")
        if not out_q:
            return pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "neighbor": pa.array([], pa.int64()),
                    "dist2": pa.array([], pa.int64()),
                }
            )
        # Per-cell contributions are qid-ASCENDING on the kernels'
        # top-k-cut paths, and the merge side re-cuts to the final
        # top-k anyway — so the shard ships the chunks ZERO-COPY
        # instead of materializing one sorted table.  The old
        # concat + full-key lexsort + gather cost 7-15 CPU-s per k=100
        # call (fresh 336 MB per shard: the measured page-fault hot
        # spot); per-chunk wrapping costs microseconds, and the merge
        # tasks binary-search each sorted chunk (see _merge_qid_slice).
        # The kernels' early-return / multi-tile paths CAN emit
        # per-block runs instead of one ascending sequence — enforce
        # the per-chunk invariant here, at the single chokepoint the
        # merge's searchsorted relies on (one cheap monotonicity pass
        # per chunk; the rare offender gets a local argsort).
        for i in range(len(out_q)):
            qi, ni, di = _qid_ascending(out_q[i], out_n[i], out_d[i])
            out_q[i], out_n[i], out_d[i] = qi, ni, di
        self.sect["emit_rows"] = self.sect.get("emit_rows", 0.0) + float(
            sum(len(a) for a in out_q)
        )
        out = pa.table(
            {
                "qid": pa.chunked_array([pa.array(a, pa.int64()) for a in out_q]),
                "neighbor": pa.chunked_array([pa.array(a) for a in out_n]),
                "dist2": pa.chunked_array([pa.array(a, pa.int64()) for a in out_d]),
            }
        )
        _mark("emit")
        return out

    def _knn_cell(
        self, cell, ids, fc, bbox, blocks, Qc, qs, bd2v,
        k, bounds, seeds, out_q, out_n, out_d,
    ) -> None:
        """Answer one resident cell's admitted queries (``qs``, with
        their cell-bbox min distances ``bd2v``), appending partial
        triplets to the out lists.

        Cell bboxes are disjoint, so bd2 == 0 identifies a query's HOME
        cell: it answers with a full local top-k.  A foreign cell
        usually overlaps the query ball only in a sliver — emit just
        the rows inside the bound (cheaper to compute, far fewer
        partial rows through the object store); the merge-side
        verification (kth <= bound, found >= k) already guarantees
        exactness for both emit shapes.  BUT a foreign query whose ball
        COVERS the cell (the out-of-distribution case: the directory
        bound is the max-dist of the nearest populated cells) must take
        the top-k path too: the sliver filter would admit ~the whole
        cell per query, materializing q x n pair rows (r2: OOD phase
        ran minutes and thrashed the object store)."""
        from pkd_tree_ray.kdtree import (
            block_knn_triplets,
            block_range_triplets,
            brute_knn_nd,
            brute_range_filter_nd,
        )
        from pkd_tree_ray.queries import _topk_per_qid

        nd = self.nd
        _t0 = time.perf_counter()
        home = bd2v == 0
        # fraction of the cell bbox inside the query ball's bounding
        # box: a deep overlap (> 1/8 of the cell) would make the sliver
        # filter emit ~fraction x n_cell rows per query — route those
        # through the bounded top-k path
        r = np.sqrt(bounds[qs].astype(np.float64))
        frac = np.ones(len(qs), dtype=np.float64)
        for j in range(nd):
            lo, hi = float(bbox[j]), float(bbox[nd + j])
            qj = Qc[j][qs].astype(np.float64)
            ext = np.minimum(qj + r, hi) - np.maximum(qj - r, lo)
            frac *= np.clip(ext, 0.0, hi - lo + 1.0) / (hi - lo + 1.0)
        deep = frac > _DEEP_OVERLAP_FRAC
        if seeds is not None:
            deep = deep | (seeds[qs] == cell)
        hq = qs[home | deep]
        fq = qs[~home & ~deep]
        _t1 = time.perf_counter()
        self.sect["s_frac"] = self.sect.get("s_frac", 0.0) + (_t1 - _t0)
        if len(hq):
            if blocks is not None and k < len(fc[0]):
                # the caller's per-query bound is a provable cap on
                # any row that can survive the bound-verified merge
                # — blocks beyond it are never scanned
                q3, n3, d3 = block_knn_triplets(
                    fc, ids, *blocks, [c[hq] for c in Qc], k,
                    init_bounds=bounds[hq],
                )
                out_q.append(hq[q3])
                out_n.append(n3)
                out_d.append(d3)
            else:
                idx, d2 = brute_knn_nd(fc, [c[hq] for c in Qc], k, tie_key=ids)
                k_eff = idx.shape[1]
                out_q.append(np.repeat(hq, k_eff))
                out_n.append(ids[idx.ravel()])
                out_d.append(d2.ravel())
        _t2 = time.perf_counter()
        self.sect["s_home"] = self.sect.get("s_home", 0.0) + (_t2 - _t1)
        if len(fq) and blocks is not None:
            q3, n3, d3 = block_range_triplets(
                fc, ids, *blocks, [c[fq] for c in Qc], bounds[fq], k_cap=k
            )
            if len(q3):
                out_q.append(fq[q3])
                out_n.append(n3)
                out_d.append(d3)
        elif len(fq):
            qi, pi, d2f = brute_range_filter_nd(
                fc, [c[fq] for c in Qc], bounds[fq]
            )
            if len(qi):
                if len(qi) > 4 * k * len(fq):
                    # loose bounds on skewed data can admit whole
                    # clusters; only each cell's top-k per query can
                    # survive the global merge — cap before concat
                    rows, _ = _topk_per_qid(qi, d2f, ids[pi], k)
                    qi, pi, d2f = qi[rows], pi[rows], d2f[rows]
                out_q.append(fq[qi])
                out_n.append(ids[pi])
                out_d.append(d2f)
        self.sect["s_foreign"] = self.sect.get("s_foreign", 0.0) + (
            time.perf_counter() - _t2
        )

    def knn_seed(self, payload) -> pa.Table:
        """Per-query kth-distance UPPER bound from ONE resident cell —
        each query's nearest >= k-count cell (its SEED, chosen by
        ``queries._center_dir_bounds``): the min over the cell's
        kd-ordered BLOCKS holding >= k rows of the query's bbox
        max-distance.  Each such block alone holds k rows within that
        distance, so the bound is provable; block bboxes are ~32x
        tighter than the whole-cell bbox, so it is ~the true kth for
        far queries — the OOD analog of the reference's guided descent
        seeding the bounded queue at the home leaf
        (``nn_search.hpp:108-125``).  No rows are scanned: the cost is
        m_cell x n_blocks box arithmetic, so the hop has no straggler
        even under heavy seed-load skew.

        ``payload``: (Q, k, pair_qids, pair_cells) — flat (query, cell)
        candidate pairs (every query's T nearest >= k-count cells).
        Returns (qid, kth) rows for the pairs whose cell is resident
        here with a usable block index; the pool min-reduces rows
        across shards per query."""
        Q, k, pqid, pcell = payload
        nd = self.nd
        out_q: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        order = np.argsort(pcell, kind="stable")
        ss = pcell[order]
        starts = np.flatnonzero(
            np.concatenate([[True], ss[1:] != ss[:-1]])
        ) if len(ss) else np.zeros(0, np.int64)
        ends = np.concatenate([starts[1:], [len(ss)]]).astype(np.int64) \
            if len(starts) else starts
        for s, e in zip(starts, ends):
            cell = int(ss[s])
            ent = self.cells.get(cell)
            if ent is None:
                continue
            rank, n_holders = self.role.get(cell, (0, 1))
            qs = pqid[order[s:e]]
            if n_holders > 1:
                qs = qs[qs % n_holders == rank]
            if not len(qs):
                continue
            key, ids, fc, bbox, blocks = ent
            if blocks is None:
                continue  # small cell: its bbox IS ~a block — no gain
            blo, bhi, bxs = blocks
            okb = (bhi - blo) >= k
            if not okb.any():
                continue  # k exceeds every block: keep the cell bound
            bx = bxs[okb]
            md = np.zeros((len(qs), len(bx)), dtype=np.float64)
            for j in range(nd):
                qj = Q[qs, j].astype(np.float64)[:, None]
                blo_j = bx[None, :, j].astype(np.float64)
                bhi_j = bx[None, :, nd + j].astype(np.float64)
                dj = np.maximum(np.abs(qj - blo_j), np.abs(qj - bhi_j))
                md += dj * dj
            kth = np.minimum(
                md.min(axis=1), float(np.iinfo(np.int64).max // 4)
            ).astype(np.int64)
            out_q.append(qs.astype(np.int64))
            out_b.append(kth)
            out_c.append(np.full(len(qs), cell, dtype=np.int64))
        if not out_q:
            return pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "kth": pa.array([], pa.int64()),
                    "cell": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q), pa.int64()),
                "kth": pa.array(np.concatenate(out_b), pa.int64()),
                "cell": pa.array(np.concatenate(out_c), pa.int64()),
            }
        )

    def drain_load(self) -> dict:
        """Return and reset the measured per-cell serving work."""
        out = self.load
        self.load = {}
        return out

    def count_matches(self, dead_ref) -> dict:
        """Per-cell count of resident LIVE rows whose id is in the
        delete set — the in-memory form of the delete verification
        scan."""
        dead = ray.get(dead_ref) if isinstance(dead_ref, ray.ObjectRef) else dead_ref
        out = {}
        for cell, (key, ids, fc, bbox, blocks) in self.cells.items():
            if cell not in self.primary:
                continue  # replicated hot cell: its primary answers
            n = int(_in_sorted(ids, dead).sum())
            if n:
                out[cell] = n
        return out

    def _batch(self, cell: int, with_id: bool) -> pa.Table:
        key, ids, fc, bbox, blocks = self.cells[cell]
        cols = {"cell": pa.array(np.full(len(fc[0]), cell, dtype=np.int64))}
        if with_id:
            cols[self.id_col] = pa.array(ids)
        for dc, c in zip(self.dims, fc):
            cols[dc] = pa.array(c)
        return pa.table(cols)

    def scan(self, kind: str, payload, wanted: np.ndarray) -> pa.Table:
        """Run one scan kernel over this shard's ``wanted`` cells.
        ``payload`` is the same broadcast tuple the Dataset-path kernel
        ctor takes (Ray auto-derefs the ObjectRef on delivery)."""
        from pkd_tree_ray import queries as q

        if kind == "range_count":
            kernel = q._RangeCountScan(payload, self.dims, self.leaf_size, self.cutoff, self._tree)
            with_id = False
        elif kind == "circle_count":
            kernel = q._CircleCountScan(payload, self.dims, self.leaf_size, self.cutoff, self._tree)
            with_id = False
        elif kind == "range_report":
            kernel = q._RangeReportScan(payload, self.dims, self.id_col)
            with_id = True
        elif kind == "knn":
            kernel = q._KnnScan(payload, self.dims, self.id_col, self.leaf_size, self.cutoff, self._tree)
            with_id = True
        else:  # pragma: no cover
            raise ValueError(kind)
        outs = [
            kernel(self._batch(int(c), with_id))
            for c in wanted
            if int(c) in self.cells
        ]
        outs = [t for t in outs if t.num_rows]
        if not outs:
            return kernel(self._empty(with_id))
        out = pa.concat_tables(outs)
        if kind == "knn" and out.num_rows:
            # shrink to per-query top-k before leaving the shard (the
            # same pre-aggregation the Dataset path applies per block)
            # payload layout is (Q, k, *csr) — see _knn_partials_frame
            out = q._shrink_partials(out, int(payload[1]))
        return out

    def _empty(self, with_id: bool) -> pa.Table:
        cols = {"cell": pa.array([], pa.int64())}
        if with_id:
            cols[self.id_col] = pa.array([], pa.int64())
        for dc in self.dims:
            cols[dc] = pa.array([], pa.int64())
        return pa.table(cols)


@ray.remote(num_cpus=1, num_returns=2)
def _merge_qid_slice(lo: int, hi: int, k: int, k_eff: int, bounds_ref, *parts: pa.Table):
    """Merge one qid slice of the per-shard kNN partials to final
    ranked top-k AND verify it: a query that found < k_eff rows or
    whose kth distance exceeds its density bound may have missed a
    cell — its rows are EXCLUDED and its qid returned for exact
    repair.  Runs where the partials live (zero-copy plasma reads);
    each slice is independent.  Returns (final_table, unsafe_qids)."""
    import ray as _ray

    from pkd_tree_ray.queries import _topk_per_qid

    bounds = _ray.get(bounds_ref) if isinstance(bounds_ref, _ray.ObjectRef) else bounds_ref
    empty = pa.table(
        {
            "qid": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "neighbor": pa.array([], pa.int64()),
            "dist2": pa.array([], pa.int64()),
        }
    )
    picked = []
    for t in parts:
        if not t.num_rows:
            continue
        # shard partials arrive as qid-ASCENDING chunks (one per cell
        # contribution, shipped zero-copy from the shard): binary-search
        # each chunk so the merge task touches only its own rows
        # (zero-copy plasma reads)
        off = 0
        for ch in t["qid"].chunks:
            qid = ch.to_numpy()
            a = int(np.searchsorted(qid, lo, side="left"))
            b = int(np.searchsorted(qid, hi, side="left"))
            if b > a:
                picked.append(t.slice(off + a, b - a))
            off += len(qid)
    if not picked:
        return empty, np.arange(lo, hi, dtype=np.int64)
    pdf = pa.concat_tables(picked)
    qid = pdf["qid"].to_numpy()
    d2 = pdf["dist2"].to_numpy()
    nb = pdf["neighbor"].to_numpy(zero_copy_only=False)
    rows, ranks = _topk_per_qid(qid, d2, nb, k)
    rq = qid[rows]
    rd_ = d2[rows]
    # per-query found count + kth distance over the ranked slice
    found = np.zeros(hi - lo, dtype=np.int64)
    kth = np.full(hi - lo, np.iinfo(np.int64).max, dtype=np.int64)
    uq, starts, cnts = np.unique(rq, return_index=True, return_counts=True)
    found[uq - lo] = cnts
    kth[uq - lo] = rd_[starts + cnts - 1]
    unsafe_local = (found < k_eff) | (kth > bounds[lo:hi])
    unsafe = np.nonzero(unsafe_local)[0] + lo
    if len(unsafe):
        keep = ~np.isin(rq, unsafe)
        rows, ranks = rows[keep], ranks[keep]
    out = pdf.take(pa.array(rows))
    return (
        pa.table(
            {
                "qid": out["qid"],
                "rank": pa.array(ranks, pa.int64()),
                "neighbor": out["neighbor"],
                "dist2": out["dist2"],
            }
        ),
        unsafe,
    )


class ShardedQueryPool:
    """Fixed pool of :class:`IndexShard` actors serving one index
    (refreshable to its successor versions)."""

    def __init__(
        self,
        index: PkdIndex,
        n_shards: int | None = None,
        min_replicas: int = 1,
    ):
        if n_shards is None:
            try:
                cpus = int(ray.cluster_resources().get("CPU", 4))
            except Exception:  # pragma: no cover
                cpus = 4
            n_shards = max(1, min(cpus, max(1, len(index.cell_files))))
        cfg = index.config
        self.n_shards = n_shards
        #: floor on per-cell holder count (capped at n_shards); the
        #: traffic heuristic in refresh() can only raise it.  >1 forces
        #: replication — used by tests and by read-heavy deployments
        #: that want every cell multi-homed regardless of traffic.
        self.min_replicas = max(1, int(min_replicas))
        self.actors = [
            IndexShard.remote(index.id_col, cfg.dims, cfg.leaf_size, cfg.brute_force_cutoff)
            for _ in range(n_shards)
        ]
        self.owner: dict[int, int] = {}
        #: replicas[cell] = [primary shard, extra replica shards...]
        self.replicas: dict[int, list[int]] = {}
        #: last measured per-cell serving work (kernel seconds), kept
        #: STICKY across refresh() calls: an index-version refresh
        #: (insert/delete churn) must not throw away the observed
        #: workload balance — cells that survive the version keep
        #: their measured weight, new cells enter on the rows term
        self._measured: dict[int, float] = {}
        self.index: PkdIndex | None = None
        self.refresh(index)

    # -- membership -----------------------------------------------------

    def refresh(self, index: PkdIndex, measured: dict[int, float] | None = None) -> None:
        """(Re)assign cells to shards — greedy balance by directory
        count, deterministic — and sync each shard (only changed cells
        move any data).  Attaches the pool to ``index``.

        Hot-cell REPLICATION: out-of-distribution query traffic
        concentrates on large-AREA cells (a uniform query cloud hits a
        cell ∝ its bbox volume, and each routed query costs ∝ the
        cell's rows — r3 profiling saw ONE shard do 164M of 663M
        brute-kernel point-distances on the varden OOD phase).  A cell
        whose expected traffic share exceeds one shard's fair slice is
        synced to extra shards as a NON-primary replica; every holder
        answers a deterministic ``qid % n_holders`` slice of the
        cell's in-bound queries inside ``knn_auto``, flattening the
        serving-load skew the same way hot-key salting flattens a
        shuffle.

        ``measured``: per-cell serving work observed by the shards
        (see :meth:`rebalance`).  When given, it replaces BOTH the
        assignment weight (blended with rows, which still governs
        memory/sync balance) and the static ``area_frac x rows``
        replication proxy — r4 profiling showed the static proxy
        ranks the hottest cells poorly (log-corr 0.22 with measured
        work; 0 of 871 cells crossed the replication threshold while
        the max/mean shard-work skew was 3x)."""
        d = index.directory
        cells = [int(c) for c in index.cell_files]
        idx_of = {int(c): i for i, c in enumerate(d.starts)}
        rows_of = np.array([int(d.counts[idx_of[c]]) for c in cells], dtype=np.int64)
        if measured:
            self._measured = dict(measured)
        measured = self._measured or None
        meas = None
        if measured:
            meas = np.array([float(measured.get(c, 0.0)) for c in cells])
            if meas.sum() <= 0:
                meas = None
        if meas is not None:
            # MEASURED layout: one unified fractional-replica LPT.
            # A cell whose observed kernel seconds exceed half a fair
            # shard slice splits into n_rep equal-work holder items;
            # all items greedy-pack largest-first onto the least-loaded
            # shard not already holding that cell.  This balances what
            # wall time actually rides on — the two-stage (assign by
            # rows, then replicate by a static proxy) layout left a 3x
            # max/mean kernel-seconds skew on the varden OOD phase.
            fair = float(meas.sum()) / self.n_shards or 1.0
            n_rep = np.clip(
                np.ceil(meas / max(fair / 2.0, 1e-12)).astype(np.int64),
                self.min_replicas,
                min(8, self.n_shards),
            )
            rn = rows_of / max(float(rows_of.sum()), 1.0)
            mn = meas / meas.sum()
            items: list[tuple[float, int]] = []
            for i in range(len(cells)):
                # small rows term: never-observed cells still spread
                # for memory/sync balance
                w = (mn[i] + 0.05 * rn[i]) / float(n_rep[i])
                items.extend([(w, i)] * int(n_rep[i]))
            items.sort(key=lambda t: -t[0])
            shard_load = np.zeros(self.n_shards, dtype=np.float64)
            holders_of: dict[int, list[int]] = {i: [] for i in range(len(cells))}
            for w, i in items:
                held = holders_of[i]
                cand = [s for s in range(self.n_shards) if s not in held]
                if not cand:
                    continue
                s = min(cand, key=lambda s: shard_load[s])
                held.append(s)
                shard_load[s] += w
            owner = {cells[i]: hs[0] for i, hs in holders_of.items()}
            replicas = {cells[i]: list(hs) for i, hs in holders_of.items()}
        else:
            # STATIC layout (no workload observed yet): assign by rows,
            # replicate by the area_frac x rows traffic proxy
            aw = rows_of.astype(np.float64)
            order = np.argsort(-aw, kind="stable")
            load = np.zeros(self.n_shards, dtype=np.float64)
            owner = {}
            for i in order:
                s = int(np.argmin(load))
                owner[cells[i]] = s
                load[s] += aw[i]
            nd = len(index.config.dims)
            bb = d.bboxes[np.array([idx_of[c] for c in cells], dtype=np.int64)]
            ext = np.maximum(
                (bb[:, nd:] - bb[:, :nd] + 1).astype(np.float64), 0.0
            )
            vol = np.prod(ext, axis=1)
            tot_vol = float(vol.sum()) or 1.0
            traffic = vol / tot_vol * rows_of.astype(np.float64)
            fair = float(traffic.sum()) / self.n_shards or 1.0
            n_rep = np.minimum(
                np.maximum(
                    np.ceil(traffic / fair).astype(np.int64), self.min_replicas
                ),
                self.n_shards,
            )
            replicas = {}
            rep_load = load.astype(np.float64)
            for i in np.argsort(-traffic, kind="stable"):
                cell = cells[i]
                holders = [owner[cell]]
                for _ in range(int(n_rep[i]) - 1):
                    cand = [s for s in range(self.n_shards) if s not in holders]
                    if not cand:
                        break
                    s = min(cand, key=lambda s: rep_load[s])
                    holders.append(s)
                    rep_load[s] += traffic[i] / n_rep[i]
                replicas[cell] = holders
        self.owner = owner
        self.replicas = replicas
        per_shard: list[dict[int, tuple]] = [{} for _ in range(self.n_shards)]
        for cell in cells:
            entry_files = list(index.cell_files[cell])
            entry_tombs = list(index.tomb_files.get(cell, []))
            holders = replicas[cell]
            for j, s in enumerate(holders):
                per_shard[s][cell] = (entry_files, entry_tombs, j, len(holders))
        ray.get([a.sync.remote(files) for a, files in zip(self.actors, per_shard)])
        if self.index is not None and self.index is not index:
            self.index.pool = None  # old handle no longer served
        self.index = index
        index.pool = self

    def rebalance(self) -> dict:
        """Load-adaptive re-shard: drain the per-cell serving work the
        shards measured since the last drain (kernel seconds per
        resident cell) and re-run assignment +
        replication with those MEASURED weights.  The distributed
        analog of a serving system promoting hot partitions to extra
        replicas after a warmup window; static proxies cannot rank
        out-of-distribution hot cells (uniform queries against
        clustered data concentrate on cluster-face cells the driver
        cannot identify without the workload).  Incremental: sync only
        moves cells whose holder set changed.  Returns
        {rebalanced, cells_observed}."""
        parts = ray.get([a.drain_load.remote() for a in self.actors])
        merged: dict[int, float] = {}
        for p in parts:
            for c, w in p.items():
                merged[c] = merged.get(c, 0.0) + w
        if self.index is not None:
            merged = {c: w for c, w in merged.items() if c in self.index.cell_files}
        if not merged or self.index is None:
            return {"rebalanced": False, "cells_observed": len(merged)}
        self.refresh(self.index, measured=merged)
        return {"rebalanced": True, "cells_observed": len(merged)}

    # -- scans ----------------------------------------------------------

    def scan_refs(self, kind: str, payload_ref, cell_list) -> list:
        """Fan one query batch out to the owning shards; returns the
        per-shard result TABLE REFS without fetching them — large
        results (range_report) wrap these in ``from_arrow_refs`` so
        the output never lands on the driver."""
        by_shard: dict[int, list[int]] = {}
        for c in cell_list:
            s = self.owner.get(int(c))
            if s is not None:
                by_shard.setdefault(s, []).append(int(c))
        if not by_shard:
            by_shard = {0: []}
        return [
            self.actors[s].scan.remote(kind, payload_ref, np.asarray(cs, dtype=np.int64))
            for s, cs in by_shard.items()
        ]

    def scan(self, kind: str, payload_ref, cell_list) -> pa.Table:
        """Driver-side concat of :meth:`scan_refs` — for SMALL partial
        tables (counts, shrunk kNN partials)."""
        return pa.concat_tables(ray.get(self.scan_refs(kind, payload_ref, cell_list)))

    def knn_seed_bounds(
        self, Q: np.ndarray, k: int, pair_qids: np.ndarray, pair_cells: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """One-hop block-level kth bound over each query's candidate
        cells (:meth:`IndexShard.knn_seed`): broadcast (queries, pairs)
        once, min-reduce the (qid, kth, cell) parts per query.  Returns
        (kth, best_cell): per-query kth int64 (int64.max where no shard
        answered — the caller mins against its coarse bound, so that is
        a no-op) and the cell achieving it (-1 where none) — the cell
        the scan should serve with its exact local top-k path."""
        ref = ray.put((Q, k, pair_qids, pair_cells))
        parts = [
            t for t in ray.get([a.knn_seed.remote(ref) for a in self.actors])
            if t.num_rows
        ]
        out = np.full(len(Q), np.iinfo(np.int64).max, dtype=np.int64)
        best = np.full(len(Q), -1, dtype=np.int64)
        if parts:
            t = pa.concat_tables(parts)
            qid = t["qid"].to_numpy()
            kth = t["kth"].to_numpy()
            cell = t["cell"].to_numpy()
            order = np.lexsort((kth, qid))
            qs = qid[order]
            first = np.concatenate([[True], qs[1:] != qs[:-1]])
            sel = order[first]
            out[qid[sel]] = kth[sel]
            best[qid[sel]] = cell[sel]
        return out, best

    def knn_partials(self, Q: np.ndarray, k: int, bounds: np.ndarray):
        """One-hop kNN partials: broadcast (queries, bounds) once; every
        shard classifies against its own cells and answers locally.
        Returns the concatenated shrunk partial table.  Q: (m, d)."""
        ref = ray.put((Q, k, bounds))
        return pa.concat_tables(
            ray.get([a.knn_auto.remote(ref) for a in self.actors])
        )

    #: above this many final rows the cross-shard merge runs as parallel
    #: Ray tasks over qid slices instead of one driver-side lexsort
    _DRIVER_MERGE_ROWS = 400_000
    #: target final rows per merge task — sized so the lexsort + slice
    #: fetch per task stays ~100 ms while still fanning wide enough to
    #: ride the pool (an n_merge sweep at 32 CPUs / 1M rows measured
    #: 3 tasks = 192 ms, 8 = 125 ms, 32 = 186 ms)
    _MERGE_TASK_ROWS = 131_072

    def knn_topk(
        self,
        Q: np.ndarray,
        k: int,
        bounds: np.ndarray,
        k_eff: int,
        seeds: np.ndarray | None = None,
    ):
        """Final ranked top-k + verification.

        Returns ``(result, unsafe_qids)`` where unsafe queries (bound
        possibly too small — they need the exact two-phase repair) are
        EXCLUDED from the result.  Small results merge on the driver
        and come back as a pyarrow Table; large ones merge through a
        second task hop partitioned by qid slice, fed the SHARD RESULT
        REFS directly, and come back as a ref-backed ``ray.data``
        Dataset that never materializes on the driver."""
        from pkd_tree_ray.queries import _topk_per_qid

        ref = ray.put((Q, k, bounds) if seeds is None else (Q, k, bounds, seeds))
        part_refs = [a.knn_auto.remote(ref) for a in self.actors]
        m = len(Q)
        if m * k <= self._DRIVER_MERGE_ROWS:
            pdf = pa.concat_tables(ray.get(part_refs))
            qid = pdf["qid"].to_numpy()
            d2 = pdf["dist2"].to_numpy()
            nb = pdf["neighbor"].to_numpy(zero_copy_only=False)
            rows, ranks = _topk_per_qid(qid, d2, nb, k)
            rq = qid[rows]
            rd_ = d2[rows]
            found = np.zeros(m, dtype=np.int64)
            kth = np.full(m, np.iinfo(np.int64).max, dtype=np.int64)
            uq, starts, cnts = np.unique(rq, return_index=True, return_counts=True)
            found[uq] = cnts
            kth[uq] = rd_[starts + cnts - 1]
            unsafe = np.nonzero((found < k_eff) | (kth > bounds))[0]
            if len(unsafe):
                keep = ~np.isin(rq, unsafe)
                rows, ranks = rows[keep], ranks[keep]
            out = pdf.take(pa.array(rows))
            return (
                pa.table(
                    {
                        "qid": out["qid"],
                        "rank": pa.array(ranks, pa.int64()),
                        "neighbor": out["neighbor"],
                        "dist2": out["dist2"],
                    }
                ),
                unsafe,
            )
        bref = ray.put(bounds)
        n_merge = max(
            1, min(self.n_shards, -(-m * k // self._MERGE_TASK_ROWS))
        )
        edges = np.linspace(0, m, n_merge + 1).astype(np.int64)
        out_refs = []
        unsafe_refs = []
        for i in range(n_merge):
            o, u = _merge_qid_slice.remote(
                int(edges[i]), int(edges[i + 1]), k, k_eff, bref, *part_refs
            )
            out_refs.append(o)
            unsafe_refs.append(u)
        unsafe = np.concatenate(ray.get(unsafe_refs)) if unsafe_refs else np.zeros(0, np.int64)
        import ray.data as rd_mod

        return rd_mod.from_arrow_refs(out_refs), unsafe

    def count_matches(self, del_ids: np.ndarray) -> dict[int, int]:
        """Per-cell live-row matches of a delete id set, answered from
        resident shard memory (no storage reads)."""
        ref = ray.put(np.unique(del_ids))  # sorted: actors use searchsorted
        out: dict[int, int] = {}
        for part in ray.get([a.count_matches.remote(ref) for a in self.actors]):
            for c, n in part.items():
                out[c] = out.get(c, 0) + n
        return out

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
        if self.index is not None:
            self.index.pool = None
