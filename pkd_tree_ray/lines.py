"""Corpus-level line deduplication (C4 / RefinedWeb style).

Removes every occurrence of a duplicated line EXCEPT the globally
first one (ordered by (doc_id, line position)), then reassembles each
document.  Lines shorter than ``min_len`` characters (blank lines,
bullets, separators) are never deduplicated — dropping every blank
line from all but one document would mangle the corpus.

Shape (two bounded shuffles, no broadcast, no driver state):

1. explode: ``map_batches`` splits each doc into lines with ONE Arrow
   C pass (``pc.split_pattern``) and emits only the 128-bit line hash
   + a composite (doc_id, pos) rank per dedupable line — the line
   TEXT never transits the first shuffle.
2. losers: hash-bucket groupby (1024 buckets, the
   :mod:`pairjoin` pattern); per bucket one lexsort finds each line's
   global first occurrence and emits the LOSER (doc_id, pos) rows
   only — typically a small fraction of all lines.
3. apply: docs and losers co-grouped by a doc-hash bucket
   (union + tag, bounded buckets); per bucket the kernel re-splits,
   masks loser positions, rebuilds the line lists from offsets and
   joins them back with ``pc.binary_join`` — fully vectorized, no
   per-doc Python.

The DuckDB oracle (:func:`sql_dedup_lines`) computes the identical
first-occurrence rule on the exact line strings; the Ray side dedups
by 128-bit content hash (collision odds ~n²/2¹²⁸).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pkd_tree_ray.pairjoin import _bucket_of
from pkd_tree_ray.text import _text_hash128

#: positions per doc packed below doc_id in the composite rank.
_RANK_MOD = 1 << 20


def split_lines_flat(texts) -> tuple[pa.Array, np.ndarray]:
    """Split a string column on ``\\n`` in one Arrow pass ->
    (flat line values, per-doc line counts).  Empty lines are KEPT
    (``'' -> ['']``, matching DuckDB ``string_split``)."""
    import pyarrow.compute as pc

    if isinstance(texts, pd.Series):
        arr = pa.Array.from_pandas(texts.astype(object), type=pa.string())
    elif isinstance(texts, pa.ChunkedArray):
        arr = texts.combine_chunks().cast(pa.string())
    elif isinstance(texts, pa.Array):
        arr = texts.cast(pa.string())
    else:
        arr = pa.array(list(texts), pa.string())
    if arr.null_count:
        arr = arr.fill_null("")
    sp = pc.split_pattern(arr, "\n")
    if isinstance(sp, pa.ChunkedArray):
        sp = sp.combine_chunks()
    counts = np.diff(
        np.frombuffer(sp.buffers()[1], dtype=np.int32)[
            sp.offset: sp.offset + len(sp) + 1
        ].astype(np.int64)
    )
    vals = sp.values if sp.offset == 0 else sp.flatten()
    return vals, counts


def _explode_keys(min_len: int):
    import pyarrow.compute as pc

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        flat, counts = split_lines_flat(batch["text"])
        if counts.max(initial=0) >= _RANK_MOD:
            raise ValueError(f"dedup_lines: >{_RANK_MOD} lines in one doc")
        own = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos = np.arange(len(own), dtype=np.int64) - starts[own]
        mask = (
            pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
            >= min_len
        )
        lo, hi = _text_hash128(flat.filter(pa.array(mask)))
        rank = ids[own[mask]] * _RANK_MOD + pos[mask]
        return pa.table(
            {
                "lbkt": pa.array(_bucket_of(lo)),
                "h_lo": pa.array(lo),
                "h_hi": pa.array(hi),
                "rank": pa.array(rank),
            }
        )

    return explode


def _losers(group: pa.Table) -> pa.Table:
    lo = group["h_lo"].to_numpy()
    hi = group["h_hi"].to_numpy()
    rank = group["rank"].to_numpy()
    order = np.lexsort((rank, hi, lo))
    lo, hi, rank = lo[order], hi[order], rank[order]
    first = np.concatenate(
        [[True], (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])]
    ) if len(lo) else np.zeros(0, bool)
    lose = rank[~first]
    return pa.table(
        {
            "doc_id": pa.array(lose // _RANK_MOD),
            "pos": pa.array(lose % _RANK_MOD),
        }
    )


def _apply_drops(group: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    tag = group["tag"].to_numpy()
    docs = group.filter(pa.array(tag == 0))
    ids = docs["doc_id"].to_numpy()
    drop = group.filter(pa.array(tag == 1))
    dropkey = (
        drop["doc_id"].to_numpy() * _RANK_MOD + drop["pos"].to_numpy()
    )
    flat, counts = split_lines_flat(docs["text"])
    own = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    linekey = ids[own] * _RANK_MOD + (
        np.arange(len(own), dtype=np.int64) - starts[own]
    )
    keep = ~np.isin(linekey, dropkey)
    bounds = np.concatenate([[0], np.cumsum(counts)])
    kept_counts = np.add.reduceat(
        np.concatenate([keep.astype(np.int64), [0]]), bounds[:-1]
    )
    kept_counts[counts == 0] = 0
    offsets = np.concatenate([[0], np.cumsum(kept_counts)]).astype(np.int32)
    lists = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), flat.filter(pa.array(keep))
    )
    return pa.table(
        {
            "doc_id": docs["doc_id"],
            "text_clean": pc.binary_join(lists, "\n"),
            "n_lines": pa.array(counts),
            "n_dropped": pa.array(counts - kept_counts),
        }
    )


def dedup_lines(docs, min_len: int = 8):
    """-> (doc_id, text_clean, n_lines, n_dropped): corpus-level line
    dedup keeping each duplicated line's first occurrence by
    (doc_id, pos); lines shorter than ``min_len`` chars always kept."""
    docs = docs.select_columns(["doc_id", "text"])

    loser_ds = (
        docs.map_batches(_explode_keys(min_len), batch_format="pyarrow")
        .groupby("lbkt")
        .map_groups(_losers, batch_format="pyarrow")
    )

    def tag_docs(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        return pa.table(
            {
                "dbkt": pa.array(_bucket_of(ids)),
                "tag": pa.array(np.zeros(len(ids), np.int64)),
                "doc_id": batch["doc_id"],
                "pos": pa.array(np.zeros(len(ids), np.int64)),
                "text": batch["text"].combine_chunks().cast(pa.string()),
            }
        )

    def tag_drops(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        return pa.table(
            {
                "dbkt": pa.array(_bucket_of(ids)),
                "tag": pa.array(np.ones(len(ids), np.int64)),
                "doc_id": batch["doc_id"],
                "pos": batch["pos"].combine_chunks().cast(pa.int64()),
                "text": pa.array([""] * len(ids), pa.string()),
            }
        )

    return (
        docs.map_batches(tag_docs, batch_format="pyarrow")
        .union(loser_ds.map_batches(tag_drops, batch_format="pyarrow"))
        .groupby("dbkt")
        .map_groups(_apply_drops, batch_format="pyarrow")
    )


def sql_dedup_lines(
    min_len: int = 8, docs_sql: str = "SELECT doc_id, text FROM documents"
) -> str:
    """DuckDB SQL bit-exact vs :func:`dedup_lines`: the same
    first-occurrence-by-(doc_id, pos) rule on exact line strings."""
    return f"""
WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM ({docs_sql}) q),
s AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM d),
l AS (SELECT doc_id, unnest(ls) AS line,
             unnest(range(1, len(ls) + 1)) AS pos FROM s),
w AS (SELECT line, min(doc_id * {_RANK_MOD} + pos - 1) AS wkey
      FROM l WHERE len(line) >= {min_len} GROUP BY line),
k AS (SELECT l.doc_id, l.line, l.pos,
             (len(l.line) < {min_len}
              OR l.doc_id * {_RANK_MOD} + l.pos - 1 = w.wkey) AS keep
      FROM l LEFT JOIN w ON l.line = w.line)
SELECT doc_id,
       coalesce(string_agg(line, chr(10) ORDER BY pos)
                FILTER (WHERE keep), '') AS text_clean,
       count(*) AS n_lines,
       count(*) FILTER (WHERE NOT keep) AS n_dropped
FROM k GROUP BY doc_id
"""


# ----------------------------------------------------------------------
# Within-doc repetition scores (Gopher-style quality rules)
# ----------------------------------------------------------------------

def _runs_per_owner(owner: np.ndarray, lo: np.ndarray, hi: np.ndarray):
    """Sort the (owner, lo, hi) stream and return (sorted order,
    first-of-run mask, run ids) — runs are equal (lo, hi) values
    within one owner segment."""
    order = np.lexsort((hi, lo, owner))
    o, l, h = owner[order], lo[order], hi[order]
    first = np.concatenate(
        [[True], (o[1:] != o[:-1]) | (l[1:] != l[:-1]) | (h[1:] != h[:-1])]
    ) if len(o) else np.zeros(0, bool)
    return order, first, np.cumsum(first) - 1


class RepetitionScores:
    """Actor: per-doc repetition metrics, all integer permille so the
    DuckDB oracle reproduces them bit-exactly.

    - dup_line_permille: line occurrences beyond their first within
      the SAME doc, / total lines.
    - dup_line_char_permille: characters of those duplicate
      occurrences / total line characters (newlines excluded).
    - top_bigram_permille: occurrences of the doc's most frequent
      token bigram / total bigrams.

    Everything is flat-stream numpy: one Arrow split / tokenize pass
    per batch, lexsort run detection, ``np.maximum.at`` per-owner max
    — no per-doc Python loop.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from pkd_tree_ray.text import tokenize_flat

        ids = batch["doc_id"].to_numpy()
        n = len(ids)

        # --- line metrics ------------------------------------------
        flat, counts = split_lines_flat(batch["text"])
        own = np.repeat(np.arange(n, dtype=np.int64), counts)
        chars = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        lo, hi = _text_hash128(flat)
        order, first, _ = _runs_per_owner(own, lo, hi)
        dup = ~first
        dup_lines = np.zeros(n, np.int64)
        np.add.at(dup_lines, own[order][dup], 1)
        dup_chars = np.zeros(n, np.int64)
        np.add.at(dup_chars, own[order][dup], chars[order][dup])
        tot_chars = np.zeros(n, np.int64)
        np.add.at(tot_chars, own, chars)

        # --- bigram metrics ----------------------------------------
        from pkd_tree_ray.hashing import splitmix64
        from pkd_tree_ray.text import _text_hash128 as th128

        toks, tcounts = tokenize_flat(batch["text"])
        town = np.repeat(np.arange(n, dtype=np.int64), tcounts)
        tlo, thi = th128(toks)
        same = town[1:] == town[:-1] if len(town) else np.zeros(0, bool)
        blo = splitmix64(
            tlo[:-1].view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            ^ tlo[1:].view(np.uint64),
            1,
        )[same].view(np.int64) if len(town) else np.zeros(0, np.int64)
        bhi = splitmix64(
            thi[:-1].view(np.uint64) * np.uint64(0xBF58476D1CE4E5B9)
            ^ thi[1:].view(np.uint64),
            2,
        )[same].view(np.int64) if len(town) else np.zeros(0, np.int64)
        bown = town[:-1][same] if len(town) else np.zeros(0, np.int64)
        border, bfirst, brun = _runs_per_owner(bown, blo, bhi)
        run_len = np.diff(np.concatenate(
            [np.flatnonzero(bfirst), [len(bfirst)]]
        )) if len(bfirst) else np.zeros(0, np.int64)
        top = np.zeros(n, np.int64)
        if len(run_len):
            np.maximum.at(top, bown[border][bfirst], run_len)
        n_bigrams = np.zeros(n, np.int64)
        np.add.at(n_bigrams, bown, 1)

        def permille(num, den):
            return np.where(den > 0, 1000 * num // np.maximum(den, 1), 0)

        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "dup_line_permille": pa.array(permille(dup_lines, counts)),
                "dup_line_char_permille": pa.array(
                    permille(dup_chars, tot_chars)
                ),
                "top_bigram_permille": pa.array(permille(top, n_bigrams)),
                "n_lines": pa.array(counts),
                "n_bigrams": pa.array(n_bigrams),
            }
        )


def repetition_scores(docs):
    """-> (doc_id, dup_line_permille, dup_line_char_permille,
    top_bigram_permille, n_lines, n_bigrams): Gopher-style repetition
    quality signals, pure per-batch map (no shuffle)."""
    from pkd_tree_ray.text import worker_cached

    return docs.select_columns(["doc_id", "text"]).map_batches(
        worker_cached(RepetitionScores), batch_format="pyarrow"
    )


def sql_repetition_scores(
    docs_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """DuckDB SQL bit-exact vs :func:`repetition_scores` (exact
    strings where the Ray side uses 128-bit hashes)."""
    return f"""
WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM ({docs_sql}) q),
l AS (SELECT doc_id, unnest(string_split(t, chr(10))) AS line FROM d),
lr AS (SELECT doc_id, line, count(*) AS c, len(line) AS lc
       FROM l GROUP BY doc_id, line),
lm AS (SELECT doc_id, sum(c) AS n_lines, sum(c - 1) AS dup_lines,
              sum((c - 1) * lc) AS dup_chars, sum(c * lc) AS tot_chars
       FROM lr GROUP BY doc_id),
tok AS (SELECT doc_id,
               unnest(regexp_extract_all(t, '\\S+')) AS tk,
               unnest(range(1, len(regexp_extract_all(t, '\\S+')) + 1)) AS pos
        FROM d),
bg AS (SELECT a.doc_id, a.tk || ' ' || b.tk AS bigram
       FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram),
bm AS (SELECT doc_id, max(c) AS mc, sum(c) AS nb FROM bc GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(1000 * lm.dup_lines // lm.n_lines, 0) AS dup_line_permille,
       CASE WHEN coalesce(lm.tot_chars, 0) > 0
            THEN 1000 * lm.dup_chars // lm.tot_chars ELSE 0 END
         AS dup_line_char_permille,
       coalesce(1000 * bm.mc // bm.nb, 0) AS top_bigram_permille,
       coalesce(lm.n_lines, 0) AS n_lines,
       coalesce(bm.nb, 0) AS n_bigrams
FROM d LEFT JOIN lm ON d.doc_id = lm.doc_id
       LEFT JOIN bm ON d.doc_id = bm.doc_id
"""
