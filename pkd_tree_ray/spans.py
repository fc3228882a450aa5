"""Cross-document duplicated-span detection (substring-level dedup).

The corpus-level analog of benchmark decontamination
(:func:`pkd_tree_ray.text.decontaminate`): instead of scanning the
corpus against a small broadcast eval set, every document's rolling
``window``-token hashes are checked against EVERY OTHER document's —
the signal behind substring-level training-data dedup (Lee et al.,
"Deduplicating Training Data Makes Language Models Better", ACL'22:
span-level duplication survives document-level near-dup filters).
A training pipeline drops or trims documents whose duplicated-span
fraction exceeds a threshold.

Scale shape (100 TB): no broadcast side exists here, so this is an
honest two-exchange pipeline, both exchanges pre-shrunk:

1. one streaming pass emits each doc's DISTINCT window hashes as
   (hash-bucket, hash, doc_id) rows — 16 B of key payload per row, the
   text never leaves the map stage;
2. ``groupby(hash bucket)``: inside each bucket one lexsort finds
   hashes held by >= 2 docs (rows are per-doc distinct, so run length
   == holder count) and collapses to per-(doc, bucket) PARTIAL counts
   — the second exchange carries at most one row per (doc, bucket);
3. ``groupby(doc bucket)`` sums partials into the final per-doc row.

Window hashes, tokenization and the sub-window whole-doc fold are
shared with fingerprints/decontaminate (``text.window_hash_stream``),
so the DuckDB oracle reproduces the pipeline bit-exactly from the raw
text (reference semantics anchor: the reference collapses exact
duplicate POINTS into multiplicity dummy leaves,
``build_tree.hpp:183-186`` — this is the text-corpus analog at span
granularity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pkd_tree_ray.text import (
    _sql_fold_hs,
    _sql_token_cte,
    _sql_windows_list,
    window_hash_stream,
)

_SEED_SP = 21
#: hash buckets for the two exchanges — each groupby moves <= _NB
#: groups, each processed by one vectorized Python call
_NB = 64


def _emit_batch(batch: pd.DataFrame, window: int) -> pd.DataFrame:
    """Per-doc DISTINCT window hashes -> (b, h, doc_id) rows."""
    wh, own, _ = window_hash_stream(batch["text"], window, _SEED_SP, empty_docs="skip")
    if not len(wh):
        return pd.DataFrame(
            {
                "b": np.zeros(0, np.int64),
                "h": np.zeros(0, np.int64),
                "doc_id": np.zeros(0, batch["doc_id"].to_numpy().dtype),
            }
        )
    o = np.lexsort((wh, own))
    wh, own = wh[o], own[o]
    first = np.concatenate([[True], (wh[1:] != wh[:-1]) | (own[1:] != own[:-1])])
    wh, own = wh[first], own[first]
    return pd.DataFrame(
        {
            "b": (wh % _NB).astype(np.int64),
            "h": wh.view(np.int64),
            "doc_id": batch["doc_id"].to_numpy()[own],
        }
    )


def _doc_bucket(ids: np.ndarray) -> np.ndarray:
    """Deterministic doc -> bucket map for the second exchange (must
    agree across hash buckets so a doc's partials co-locate)."""
    if np.issubdtype(ids.dtype, np.integer):
        return ((ids.astype(np.int64) % _NB) + _NB) % _NB
    from pkd_tree_ray.hashing import poly64

    return (poly64(ids) % _NB).astype(np.int64)


def _bucket_partials(group: pa.Table) -> pa.Table:
    """One hash bucket: flag hashes held by >= 2 docs, collapse to
    per-doc partial (n_windows, n_dup_windows) counts."""
    h = group["h"].to_numpy()
    doc = group["doc_id"].to_numpy(zero_copy_only=False)
    o = np.argsort(h, kind="stable")
    hs = h[o]
    new = np.concatenate([[True], hs[1:] != hs[:-1]])
    run_id = np.cumsum(new) - 1
    run_len = np.bincount(run_id)
    dup_sorted = run_len[run_id] >= 2
    dup = np.empty(len(h), dtype=bool)
    dup[o] = dup_sorted
    od = np.argsort(doc, kind="stable")
    ds = doc[od]
    newd = np.concatenate([[True], ds[1:] != ds[:-1]])
    starts = np.nonzero(newd)[0]
    nw = np.diff(np.concatenate([starts, [len(ds)]]))
    ndup = np.add.reduceat(dup[od].astype(np.int64), starts)
    heads = ds[starts]
    return pa.table(
        {
            "db": pa.array(_doc_bucket(heads), pa.int64()),
            "doc_id": pa.array(heads),
            "nw": pa.array(nw.astype(np.int64), pa.int64()),
            "ndup": pa.array(ndup, pa.int64()),
        }
    )


def _doc_totals(group: pa.Table) -> pa.Table:
    """One doc bucket: sum the per-bucket partials into final rows."""
    doc = group["doc_id"].to_numpy(zero_copy_only=False)
    nw = group["nw"].to_numpy()
    nd = group["ndup"].to_numpy()
    o = np.argsort(doc, kind="stable")
    ds = doc[o]
    newd = np.concatenate([[True], ds[1:] != ds[:-1]])
    starts = np.nonzero(newd)[0]
    tw = np.add.reduceat(nw[o], starts)
    td = np.add.reduceat(nd[o], starts)
    return pa.table(
        {
            "doc_id": pa.array(ds[starts]),
            "n_windows": pa.array(tw, pa.int64()),
            "n_dup_windows": pa.array(td, pa.int64()),
            "dup_permille": pa.array(1000 * td // tw, pa.int64()),
        }
    )


def dedup_spans(docs, window: int = 8):
    """-> (doc_id, n_windows, n_dup_windows, dup_permille): per doc
    with >= 1 token, its distinct ``window``-token rolling-hash count,
    how many of those hashes occur in at least one OTHER document, and
    the duplicated fraction in integer permille.  Sub-window docs fold
    to one whole-doc window (the fingerprints convention); zero-token
    docs are absent (no spans to judge)."""
    rows = docs.select_columns(["doc_id", "text"]).map_batches(
        lambda b: _emit_batch(b, window),
        batch_format="pandas",
    )
    partials = rows.groupby("b").map_groups(_bucket_partials, batch_format="pyarrow")
    return partials.groupby("db").map_groups(_doc_totals, batch_format="pyarrow")


def sql_dedup_spans(window: int = 8) -> str:
    """DuckDB SQL bit-exact vs :func:`dedup_spans` over ``documents``.

    Rows in ``wd`` are DISTINCT per (doc, hash), so ``count(*)`` per
    hash equals the holder-doc count — identical to the bucket kernel's
    run length."""
    wins = _sql_windows_list(window)
    return f"""
WITH {_sql_token_cte(_SEED_SP)},
wl AS (SELECT d.doc_id,
         CASE WHEN len(h.hs) < {window} THEN [{_sql_fold_hs()}]
              ELSE {wins}
         END AS wl
       FROM docs0 d JOIN hl h USING (doc_id)),
wd AS (SELECT DISTINCT doc_id, unnest(wl) AS h FROM wl),
cnt AS (SELECT h, count(*) AS c FROM wd GROUP BY h),
per AS (SELECT doc_id, count(*) AS n_windows,
               sum(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END) AS n_dup
        FROM wd JOIN cnt USING (h) GROUP BY doc_id)
SELECT doc_id,
       CAST(n_windows AS BIGINT) AS n_windows,
       CAST(n_dup AS BIGINT) AS n_dup_windows,
       CAST((1000 * n_dup) // n_windows AS BIGINT) AS dup_permille
FROM per
"""
