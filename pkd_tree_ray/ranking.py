"""Group-wise top-N: the highest-``n`` rows per group under a total
order (order DESC, id ASC) — e.g. the n longest documents per
language, the n best-scored pages per domain.

100-TB shape: a vectorized per-batch PARTIAL cut first (any global
per-group top-n row is in its own batch's per-group top-n, so the cut
is lossless) bounds each partial at groups_in_batch x n rows; then ONE
``groupby`` over ``_N_BUCKETS`` hash buckets of the group key, each
bucket merged with the same multi-run kernel in ONE Python call per
BUCKET — not per group (the :mod:`pairjoin` bucketed-run idiom; a
corpus with 10^8 groups still makes only 64 Python calls in the merge
stage).  The full table never sorts and groups' payload rows beyond
the partial cut never shuffle.

No counterpart in the reference (spatial index); part of the
training-data-pipeline surface (per-language / per-domain corpus
capping and stratified curation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_N_BUCKETS = 64


def _topn_runs(
    g: np.ndarray, o: np.ndarray, i: np.ndarray, n: int, with_rank: bool = False
):
    """Indices of the per-group top-``n`` rows of (group g, order o,
    id i) under (o DESC, i ASC) within each group — one lexsort, run
    boundaries, a vectorized position-in-run cut.  Groups are compared
    via ``np.unique`` codes, so any comparable dtype (strings
    included) works.  Returns (take_idx, rank_1based | None)."""
    if not len(g):
        z = np.zeros(0, np.int64)
        return z, (z if with_rank else None)
    _, codes = np.unique(g, return_inverse=True)
    order = np.lexsort((i, -o, codes))
    cs = codes[order]
    starts = np.flatnonzero(np.concatenate([[True], cs[1:] != cs[:-1]]))
    # position of each sorted row inside its group run
    pos = np.arange(len(cs), dtype=np.int64) - np.repeat(
        starts, np.diff(np.concatenate([starts, [len(cs)]]))
    )
    keep = pos < n
    take = order[keep]
    return take, (pos[keep] + 1 if with_rank else None)


def topn_per_group(ds, group_col: str, order_col: str, id_col: str, n: int = 3):
    """Top-``n`` rows per group under (``order_col`` DESC, ``id_col``
    ASC) -> Dataset (group, id, order, rank) with rank 1-based.

    See module docstring for the two-level lossless-cut shape.
    """

    def partial(t: pa.Table) -> pa.Table:
        from pkd_tree_ray.hashing import token_hash64

        g = t[group_col].to_numpy(zero_copy_only=False)
        o = t[order_col].to_numpy(zero_copy_only=False).astype(np.int64)
        i = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        take, _ = _topn_runs(g, o, i, n)
        gk = t[group_col].take(pa.array(take))
        bkt = (token_hash64(gk.combine_chunks() if isinstance(gk, pa.ChunkedArray) else gk)
               % np.uint64(_N_BUCKETS)).astype(np.int64)
        return pa.table(
            {
                "gbkt": pa.array(bkt),
                group_col: gk,
                id_col: pa.array(i[take]),
                order_col: pa.array(o[take]),
            }
        )

    def merge_bucket(t: pa.Table) -> pa.Table:
        g = t[group_col].to_numpy(zero_copy_only=False)
        o = t[order_col].to_numpy(zero_copy_only=False)
        i = t[id_col].to_numpy(zero_copy_only=False)
        take, rank = _topn_runs(g, o, i, n, with_rank=True)
        return pa.table(
            {
                group_col: t[group_col].take(pa.array(take)),
                id_col: pa.array(i[take]),
                order_col: pa.array(o[take]),
                "rank": pa.array(rank),
            }
        )

    return (
        ds.select_columns([group_col, order_col, id_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("gbkt")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )


def sql_topn_per_group(
    group_col: str, order_col: str, id_col: str, n: int = 3, table: str = "documents"
) -> str:
    """DuckDB SQL bit-exact vs :func:`topn_per_group`."""
    return f"""
WITH r AS (SELECT {group_col}, {id_col}, {order_col},
                  row_number() OVER (PARTITION BY {group_col}
                                     ORDER BY {order_col} DESC, {id_col}) AS rnk
           FROM {table})
SELECT {group_col}, {id_col}, {order_col}, rnk AS "rank"
FROM r WHERE rnk <= {n}
"""
