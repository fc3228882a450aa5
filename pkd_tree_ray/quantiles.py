"""Exact distributed quantiles by histogram-refinement quickselect —
order statistics over a 100-TB column WITHOUT a sort shuffle.

A global ``sort`` is the classic way to take a quantile and the wrong
one at scale: it moves every row.  Here each refinement round is one
streaming ``map_batches`` pass emitting per-batch bucket counts
(``_NBUCKETS`` rows per batch, not data rows), the driver folds them
and narrows each target rank's value interval by ~4096x, and the loop
ends when every interval is a single integer.  Passes =
O(log_4096(range)) — 2 rounds for 32-bit domains, <= 6 for the full
int64 line — and ALL requested quantiles refine in the SAME pass, so
the pass count does not grow with the number of quantiles.

The reference has no quantile kernel (its pivot sampling,
``include/cpdd/kd_tree_impl/kd_build_tree.hpp`` sampling + oversample,
solves the approximate analog); this is exact selection for the
LLM-pipeline filters (percentile thresholds on quality scores).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_NBUCKETS = 4096


def _fold_hist(ds_col, intervals: list[tuple[int, int]]):
    """One streaming pass: per-batch counts of ``col`` into
    ``_NBUCKETS`` equal-width buckets of every active interval ->
    folded (n_intervals, _NBUCKETS) int64 matrix on the driver (the
    pass ships `len(intervals) * _NBUCKETS` ints per block — never
    rows)."""
    import ray

    iv = np.asarray(intervals, dtype=np.int64)
    ivref = ray.put(iv)

    def hist(t: pa.Table) -> pa.Table:
        from pkd_tree_ray.queries import _cached_get

        bounds = _cached_get(ivref)
        v = t.column(0).to_numpy()
        out = np.zeros((len(bounds), _NBUCKETS), dtype=np.int64)
        for i, (lo, hi) in enumerate(bounds):
            m = v[(v >= lo) & (v <= hi)]
            if len(m):
                w = (int(hi) - int(lo)) // _NBUCKETS + 1
                out[i] = np.bincount((m - lo) // w, minlength=_NBUCKETS)
        return pa.table({"h": pa.array([out.ravel()])})

    parts = ray.get(ds_col.map_batches(hist, batch_format="pyarrow").to_arrow_refs())
    acc = np.zeros(len(iv) * _NBUCKETS, dtype=np.int64)
    for p in parts:
        for row in p["h"].to_pylist():
            acc += np.asarray(row, dtype=np.int64)
    return acc.reshape(len(iv), _NBUCKETS)


def rank_select_multi(ds, col: str, ranks: list[int]) -> list[int]:
    """Exact values at the given 1-based global ranks of ``ds[col]``
    (int64 column, ascending order) — all ranks resolved together,
    one histogram pass per refinement round."""
    import ray
    from ray.data.aggregate import Max, Min

    sel = ds.select_columns([col])
    stats = sel.aggregate(Min(col), Max(col))
    glo, ghi = int(stats[f"min({col})"]), int(stats[f"max({col})"])
    # state per rank: (lo, hi, rank-within-interval)
    state = [[glo, ghi, int(r)] for r in ranks]
    out: list[int | None] = [None] * len(ranks)
    while True:
        active = [i for i, s in enumerate(state) if out[i] is None]
        for i in active:
            lo, hi, r = state[i]
            if lo == hi:
                out[i] = lo
        active = [i for i in active if out[i] is None]
        if not active:
            return [int(v) for v in out]  # type: ignore[arg-type]
        hists = _fold_hist(sel, [(state[i][0], state[i][1]) for i in active])
        for j, i in enumerate(active):
            lo, hi, r = state[i]
            w = (hi - lo) // _NBUCKETS + 1
            cum = np.cumsum(hists[j])
            b = int(np.searchsorted(cum, r, side="left"))
            below = int(cum[b - 1]) if b else 0
            nlo = lo + b * w
            nhi = min(hi, nlo + w - 1)
            state[i] = [nlo, nhi, r - below]


def rank_select(ds, col: str, k: int) -> int:
    """Exact k-th smallest (1-based) value of ``ds[col]``."""
    return rank_select_multi(ds, col, [k])[0]


def quantiles(ds, col: str, qs: list[float]) -> pa.Table:
    """Exact discrete quantiles -> pa.Table (q_permille, value) where
    value is the element at rank ``clamp(ceil(q * n), 1, n)`` —
    ``quantile_disc`` semantics with an explicit integer rank, so the
    DuckDB ``ORDER BY .. LIMIT 1 OFFSET rank-1`` oracle is bit-exact."""
    n = ds.count()
    ranks = [min(max(int(np.ceil(q * n)), 1), n) for q in qs]
    vals = rank_select_multi(ds, col, ranks)
    return pa.table(
        {
            "q_permille": pa.array(
                [int(round(q * 1000)) for q in qs], pa.int64()
            ),
            "value": pa.array(vals, pa.int64()),
        }
    )


def percentile_filter(ds, col: str, p: float, keep: str = "ge"):
    """Rows whose ``col`` is at or above the exact ``p``-quantile
    value (``keep='ge'``; ties at the threshold are all kept, the
    deterministic choice) — the LLM-pipeline "top (1-p) by quality"
    filter.  Two passes: quickselect the threshold (histogram rounds),
    then one streaming predicate filter.  No sort, no shuffle."""
    import pyarrow.compute as pc

    n = ds.count()
    r = min(max(int(np.ceil(p * n)), 1), n)
    thr = rank_select(ds, col, r)

    def flt(t: pa.Table) -> pa.Table:
        cmp = pc.greater_equal if keep == "ge" else pc.greater
        return t.filter(cmp(t[col], thr))

    return ds.map_batches(flt, batch_format="pyarrow")


def sql_quantiles(col: str, qs: list[float], table: str = "documents") -> str:
    """DuckDB SQL bit-exact vs :func:`quantiles`."""
    parts = []
    for q in qs:
        qpm = int(round(q * 1000))
        parts.append(f"""
SELECT {qpm} AS q_permille,
       (SELECT {col} FROM {table} ORDER BY {col}
        LIMIT 1 OFFSET greatest(least(CAST(ceil({q!r} * (SELECT count(*) FROM {table})) AS BIGINT),
                                      (SELECT count(*) FROM {table})), 1) - 1) AS value""")
    return "\nUNION ALL\n".join(parts)


def sql_percentile_filter(
    col: str, p: float, table: str = "documents", select: str = "doc_id"
) -> str:
    """DuckDB SQL bit-exact vs :func:`percentile_filter` (projected to
    ``select, col``)."""
    return f"""
WITH t AS (SELECT {col} AS thr FROM {table} ORDER BY {col}
           LIMIT 1 OFFSET greatest(least(CAST(ceil({p!r} * (SELECT count(*) FROM {table})) AS BIGINT),
                                         (SELECT count(*) FROM {table})), 1) - 1)
SELECT {select}, {col} FROM {table}, t WHERE {col} >= t.thr
"""
