"""Float-native (double) coordinate path — the reference harness
default (``tests/testFramework.h:18-19``: ``coord = double`` with the
epsilon comparator ``include/cpdd/comparator.h:10-79``).

Design: raw float64 coordinates are indexed WITHOUT quantization.  The
distributed partitioner (Morton cells) only needs a total ORDER per
axis, so each float column gets an order-preserving integer key
(IEEE-754 total-order trick, top 62 bits — key space [0, 2**62) so the
whole cell layer runs unchanged with ``coord_bits=62``).  Because the
key map is monotonic per axis, every Morton cell is still an
axis-aligned box in FLOAT space; its float bounds are recovered
exactly-conservatively from the key bbox (the 2 dropped mantissa bits
widen each bound by <= 3 ulps — pruning with a superset box is always
safe).  All DISTANCES are computed on the raw float64 columns, which
ride through the build shuffle as ordinary payload columns and land in
the same per-cell Parquet files.

Scale shape matches the int64 path: directory-level pruning via the
cumulative nearest-cells bound, one streaming scan over candidate
cells (``scan_cells`` file pruning), per-cell vectorized brute kernel,
k rows per (query, cell) partial.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from pkd_tree_ray.config import EngineConfig, DEFAULT_CONFIG
from pkd_tree_ray.geometry import pnd_b_min_dist2, pnd_b_max_dist2
from pkd_tree_ray.index import PkdIndex

_SIGN = np.uint64(0x8000000000000000)
_U = np.uint64

#: key-space width: 62 bits so keys are non-negative int64 and a 2-D
#: Morton code at max_depth<=31 fits the 62-bit budget.
FLOAT_COORD_BITS = 62


def float_key(v: np.ndarray) -> np.ndarray:
    """Order-preserving int64 key of float64 values, in [0, 2**62).

    IEEE-754 total-order map (positive: set sign bit; negative: flip
    all bits) then drop the 2 lowest mantissa bits.  Monotonic
    (non-strictly: floats within 4 ulps may share a key — they then
    share a cell, which is harmless).  NaN is rejected."""
    v = np.asarray(v, dtype=np.float64)
    if np.isnan(v).any():
        raise ValueError("float coordinates must not contain NaN")
    b = v.view(np.uint64)
    neg = (b & _SIGN) != 0
    u = np.where(neg, ~b, b | _SIGN)
    return (u >> _U(2)).astype(np.int64)


def _key_to_float(u_full: np.ndarray) -> np.ndarray:
    """Inverse of the full 64-bit total-order map."""
    u_full = np.asarray(u_full, dtype=np.uint64)
    pos = (u_full & _SIGN) != 0
    bits = np.where(pos, u_full & ~_SIGN, ~u_full)
    return bits.view(np.float64)


def key_float_lo(k: np.ndarray) -> np.ndarray:
    """Smallest float64 whose key is ``k`` (conservative box min)."""
    return _key_to_float(np.asarray(k, dtype=np.int64).astype(np.uint64) << _U(2))


def key_float_hi(k: np.ndarray) -> np.ndarray:
    """Largest float64 whose key is ``k`` (conservative box max)."""
    return _key_to_float(
        (np.asarray(k, dtype=np.int64).astype(np.uint64) << _U(2)) | _U(3)
    )


def key_dims(float_dims: tuple[str, ...]) -> tuple[str, ...]:
    return tuple(f"{c}_k" for c in float_dims)


def float_dims_of(index: PkdIndex) -> tuple[str, ...]:
    """Recover the float column names from the key-dim convention."""
    dims = index.config.dims
    if not all(c.endswith("_k") for c in dims):
        raise ValueError(f"not a float-native index (dims={dims})")
    return tuple(c[:-2] for c in dims)


def build_float(
    points,
    path: str,
    config: EngineConfig = DEFAULT_CONFIG,
    float_dims: tuple[str, ...] = ("x", "y"),
    id_col: str = "point_id",
    resume: bool = True,
) -> PkdIndex:
    """Bulk build over raw float64 coordinate columns.

    ``points``: Dataset with (id_col, *float_dims:float64).  Derives
    the order-preserving key columns in a streaming ``map_batches``,
    then runs the standard :meth:`PkdIndex.build` over the keys with
    ``coord_bits=62``; the float columns ride along as payload into
    the per-cell files."""
    from dataclasses import replace

    kd = key_dims(float_dims)
    cfg = replace(config, dims=kd, coord_bits=FLOAT_COORD_BITS)
    fd = tuple(float_dims)

    def add_keys(batch: pa.Table) -> pa.Table:
        out = batch
        for fc, kc in zip(fd, kd):
            keys = float_key(out[fc].to_numpy(zero_copy_only=False))
            if kc in out.column_names:
                out = out.drop_columns([kc])
            out = out.append_column(kc, pa.array(keys, pa.int64()))
        return out

    keyed = points.map_batches(add_keys, batch_format="pyarrow")
    return PkdIndex.build(keyed, path, cfg, id_col=id_col, resume=resume)


def float_cell_boxes(index: PkdIndex) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(cells, counts, float_boxes) of live cells; boxes are (C, 2d)
    float64 [mins..., maxs...], conservative supersets of the true
    per-cell float extents."""
    d = index.directory
    live = d.counts > 0
    kb = d.bboxes[live]
    nd = kb.shape[1] // 2
    fb = np.empty_like(kb, dtype=np.float64)
    for j in range(nd):
        fb[:, j] = key_float_lo(kb[:, j])
        fb[:, nd + j] = key_float_hi(kb[:, nd + j])
    return d.starts[live], d.counts[live], fb


_CHUNK = 8_192


def _float_bounds(Qf: np.ndarray, counts: np.ndarray, fb: np.ndarray, k: int):
    """Cumulative nearest-cells bound: per query, walk cells by
    min-distance until the visited population reaches k; the prefix's
    max corner distance provably contains the k nearest.  Returns
    (qid, cell_idx) candidate pairs, chunked so driver memory stays
    O(chunk x C)."""
    m = len(Qf)
    out_q: list[np.ndarray] = []
    out_c: list[np.ndarray] = []
    for s in range(0, m, _CHUNK):
        Qc = Qf[s: s + _CHUNK]
        mind2 = pnd_b_min_dist2(Qc, fb)
        maxd2 = pnd_b_max_dist2(Qc, fb)
        order = np.argsort(mind2, axis=1)
        csum = np.cumsum(np.take_along_axis(np.broadcast_to(counts, mind2.shape), order, axis=1), axis=1)
        reach = csum >= min(k, int(counts.sum()))
        pos = np.argmax(reach, axis=1)
        prefix_max = np.maximum.accumulate(
            np.take_along_axis(maxd2, order, axis=1), axis=1
        )
        bound = prefix_max[np.arange(len(Qc)), pos]
        qi, ci = np.nonzero(mind2 <= bound[:, None])
        out_q.append(qi + s)
        out_c.append(ci)
    return np.concatenate(out_q), np.concatenate(out_c)


class _FloatKnnScan:
    """Per-cell float brute kNN over the streamed scan — the actor
    holds the broadcast (Q, k, CSR) once (``__init__``), each batch is
    segmented into cell runs and answered vectorized."""

    def __init__(self, ref, fdims, id_col):
        from pkd_tree_ray.queries import _maybe_get

        (Q, k, cells, offs, qids) = _maybe_get(ref)
        self.Q, self.k = Q, k
        self.cells, self.offs, self.qids = cells, offs, qids
        self.fdims = fdims
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pkd_tree_ray.kdtree import brute_knn_nd
        from pkd_tree_ray.queries import _iter_cell_runs

        cell_col = batch["cell"].to_numpy()
        ids_all = batch[self.id_col].to_numpy(zero_copy_only=False)
        cs = [
            batch[fc].to_numpy(zero_copy_only=False).astype(np.float64)
            for fc in self.fdims
        ]
        out_qid: list[np.ndarray] = []
        out_nb: list[np.ndarray] = []
        out_d2: list[np.ndarray] = []
        for cell, sl in _iter_cell_runs(cell_col):
            i = np.searchsorted(self.cells, cell)
            if i >= len(self.cells) or self.cells[i] != cell:
                continue
            qs = self.qids[self.offs[i]: self.offs[i + 1]]
            if not len(qs):
                continue
            P = [c[sl] for c in cs]
            ids = ids_all[sl]
            if not len(P[0]):
                continue
            Qc = [self.Q[qs, j] for j in range(len(cs))]
            idx, d2 = brute_knn_nd(P, Qc, self.k, tie_key=ids)
            kk = idx.shape[1]
            out_qid.append(np.repeat(qs.astype(np.int64), kk))
            out_nb.append(ids[idx].ravel())
            out_d2.append(d2.ravel())
        if not out_qid:
            return pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "neighbor": pa.array([], pa.int64()),
                    "dist2": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_qid)),
                "neighbor": pa.array(np.concatenate(out_nb)),
                "dist2": pa.array(np.concatenate(out_d2), pa.float64()),
            }
        )


def knn_float(index: PkdIndex, Qf: np.ndarray, k: int, config=None) -> pa.Table:
    """Batch kNN over raw float64 coordinates -> (qid, rank, neighbor,
    dist2:float64); exact IEEE-double distances, ties broken by
    (dist2, neighbor id), rank 1-based.

    The bound/scan/merge shape mirrors :func:`pkd_tree_ray.queries.knn_nd`;
    distances never touch key space."""
    from pkd_tree_ray.queries import _Pairs, _csr, _scan_stage

    cfg = config or index.config
    fdims = float_dims_of(index)
    Qf = np.atleast_2d(np.asarray(Qf, dtype=np.float64))
    m = len(Qf)
    empty = pa.table(
        {
            "qid": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "neighbor": pa.array([], pa.int64()),
            "dist2": pa.array([], pa.float64()),
        }
    )
    if m == 0 or index.total_rows == 0:
        return empty
    cells, counts, fb = float_cell_boxes(index)
    qi, ci = _float_bounds(Qf, counts, fb, k)
    pairs = _Pairs(cells[ci], qi)
    needed = pairs.cell_list()
    if not needed:
        return empty
    ref = ray.put((Qf, k, *_csr(pairs)))
    pdf = _scan_stage(
        index.scan_cells(needed, columns=["cell", index.id_col, *fdims]),
        _FloatKnnScan,
        (ref, fdims, index.id_col),
        cfg,
        len(needed),
    ).to_pandas()
    if not len(pdf):
        return empty
    rq = pdf["qid"].to_numpy(dtype=np.int64)
    rn = pdf["neighbor"].to_numpy(dtype=np.int64)
    rd = pdf["dist2"].to_numpy(dtype=np.float64)
    order = np.lexsort((rn, rd, rq))
    rq, rn, rd = rq[order], rn[order], rd[order]
    uq, starts, cnts = np.unique(rq, return_index=True, return_counts=True)
    ranks = np.arange(len(rq), dtype=np.int64) - np.repeat(starts, cnts)
    keep = ranks < k
    return pa.table(
        {
            "qid": pa.array(rq[keep], pa.int64()),
            "rank": pa.array(ranks[keep] + 1, pa.int64()),
            "neighbor": pa.array(rn[keep], pa.int64()),
            "dist2": pa.array(rd[keep], pa.float64()),
        }
    )


class _FloatRangeScan:
    def __init__(self, ref, fdims):
        from pkd_tree_ray.queries import _maybe_get

        (B, cells, offs, qids) = _maybe_get(ref)
        self.B = B
        self.cells, self.offs, self.qids = cells, offs, qids
        self.fdims = fdims

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pkd_tree_ray.queries import _iter_cell_runs

        cell_col = batch["cell"].to_numpy()
        cs = [
            batch[fc].to_numpy(zero_copy_only=False).astype(np.float64)
            for fc in self.fdims
        ]
        d = len(cs)
        out_q: list[np.ndarray] = []
        out_n: list[np.ndarray] = []
        for cell, sl in _iter_cell_runs(cell_col):
            i = np.searchsorted(self.cells, cell)
            if i >= len(self.cells) or self.cells[i] != cell:
                continue
            qs = self.qids[self.offs[i]: self.offs[i + 1]]
            if not len(qs):
                continue
            P = [c[sl] for c in cs]
            B = self.B[qs]  # (nq, 2d)
            inside = np.ones((len(qs), len(P[0])), dtype=bool)
            for j in range(d):
                inside &= P[j][None, :] >= B[:, j, None]
                inside &= P[j][None, :] <= B[:, d + j, None]
            out_q.append(qs.astype(np.int64))
            out_n.append(inside.sum(axis=1).astype(np.int64))
        if not out_q:
            return pa.table(
                {"qid": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q)),
                "n": pa.array(np.concatenate(out_n)),
            }
        )


def range_count_float(index: PkdIndex, boxes: np.ndarray, config=None) -> pa.Table:
    """Inclusive box counts over raw float64 coordinates -> (qid, n).

    Contained-cell shortcut with the CONSERVATIVE float cell boxes
    (a conservative box inside the query box implies the true extent
    is too); partially-covered cells are scanned and filtered exactly
    in float space."""
    from pkd_tree_ray.geometry import box_contains_box, boxes_intersect
    from pkd_tree_ray.queries import _Pairs, _csr, _scan_stage

    cfg = config or index.config
    fdims = float_dims_of(index)
    B = np.atleast_2d(np.asarray(boxes, dtype=np.float64))
    m = len(B)
    cells, counts, fb = float_cell_boxes(index)
    base = np.zeros(m, dtype=np.int64)
    parts: list[_Pairs] = []
    for s in range(0, m, _CHUNK):
        q = B[s: s + _CHUNK]
        contained = box_contains_box(q, fb)
        partial = boxes_intersect(q, fb) & ~contained
        base[s: s + len(q)] = contained @ counts
        qi2, ci2 = np.nonzero(partial)
        parts.append(_Pairs(cells[ci2], qi2 + s))
    pairs = _Pairs.concat(parts)
    needed = pairs.cell_list()
    if needed:
        ref = ray.put((B, *_csr(pairs)))
        pdf = _scan_stage(
            index.scan_cells(needed, columns=["cell", *fdims]),
            _FloatRangeScan,
            (ref, fdims),
            cfg,
            len(needed),
        ).to_pandas()
        if len(pdf):
            agg = pdf.groupby("qid")["n"].sum()
            base[agg.index.to_numpy()] += agg.to_numpy()
    return pa.table(
        {
            "qid": pa.array(np.arange(m, dtype=np.int64)),
            "n": pa.array(base, pa.int64()),
        }
    )
