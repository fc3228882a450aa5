"""Token-budget sequence packing — the concat-and-chunk assignment a
pretraining data pipeline runs last: documents are concatenated in
doc_id order and chunked into fixed ``budget``-token sequences; each
document is assigned to the sequence containing its FIRST token
(``seq_id = tokens_before // budget``) plus its offset inside it.

The global prefix sum is computed distributedly: (1) per-doc token
counts (the SQL-exact ``n_bpe`` kernel from :mod:`pkd_tree_ray.text`),
(2) per-bucket (``doc_id // bucket_rows``) token totals — a tiny
aggregate, the only driver-side state, (3) exclusive bucket offsets
broadcast via ``ray.put``, (4) a per-bucket vectorized cumsum.  No
stage holds more than one bucket; nothing re-orders the corpus.

Deterministic by construction (pure function of doc_id order and the
token regex), so re-runs and the DuckDB oracle (one window cumsum)
reproduce it exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def pack_sequences(
    docs,
    budget: int,
    bucket_rows: int = 65536,
    count_col: str = "n_bpe",
):
    """-> Dataset (doc_id, n_tok, seq_id, tok_offset): concat-and-chunk
    packing of ``docs`` (doc_id, text) into ``budget``-token sequences.

    ``count_col`` picks the token counter from
    :class:`pkd_tree_ray.text.TextStats` (default the BPE-ish ``n_bpe``).
    """
    from pkd_tree_ray.text import token_stats

    stats = (
        token_stats(docs)
        .select_columns(["doc_id", count_col])
        .materialize()
    )

    # per-bucket token totals: partial-aggregate inside map_batches so
    # only (bucket, partial) rows transit; the driver folds them
    def bucket_partials(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        tok = batch[count_col].to_numpy().astype(np.int64)
        bkt = ids // bucket_rows
        ub, inv = np.unique(bkt, return_inverse=True)
        sums = np.bincount(inv, weights=tok).astype(np.int64)
        return pa.table({"bucket": pa.array(ub), "tok": pa.array(sums)})

    part = stats.map_batches(bucket_partials, batch_format="pyarrow").to_pandas()
    totals = part.groupby("bucket")["tok"].sum().sort_index()
    offsets = totals.cumsum().shift(fill_value=0)  # exclusive prefix
    off_ref = ray.put(
        {int(b): int(v) for b, v in offsets.items()}
    )

    def assign(group: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        ids = group["doc_id"].to_numpy(dtype=np.int64)
        tok = group[count_col].to_numpy(dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids_s, tok_s = ids[order], tok[order]
        before = offs[int(ids_s[0] // bucket_rows)] + np.concatenate(
            [[0], np.cumsum(tok_s)[:-1]]
        )
        return pd.DataFrame(
            {
                "doc_id": ids_s,
                "n_tok": tok_s,
                "seq_id": before // budget,
                "tok_offset": before % budget,
            }
        )

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch["bucket"] = batch["doc_id"].to_numpy(dtype=np.int64) // bucket_rows
        return batch

    return (
        stats.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(assign, batch_format="pandas")
    )


def sql_pack_sequences(budget: int, table: str = "documents") -> str:
    """DuckDB SQL bit-exact vs :func:`pack_sequences` with the default
    ``n_bpe`` counter (one window cumsum over doc_id order)."""
    return rf"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(text,
             '[a-zA-Z]+|[0-9]{{1,3}}|[^\sa-zA-Z0-9]+')) AS n_tok
  FROM {table}),
c AS (
  SELECT doc_id, n_tok,
         coalesce(sum(n_tok) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM t)
SELECT doc_id, n_tok,
       before // {int(budget)} AS seq_id,
       before % {int(budget)} AS tok_offset
FROM c
"""
