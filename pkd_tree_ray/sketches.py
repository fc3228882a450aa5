"""Mergeable sketches: HyperLogLog distinct counts and Misra-Gries
heavy hitters (exact top-k terms WITHOUT a vocabulary shuffle).

A 100-TB corpus can't count distinct tokens exactly without a
token-cardinality shuffle (``vocab_topk`` pays it deliberately); the
HLL sketch answers the same question in one streaming pass with
``m = 2**p`` bytes of state per partial and an elementwise-max merge.

Design: each ``map_batches`` task folds its batch into a dense
register array with ``np.maximum.at`` and emits the NON-ZERO registers
as sparse (bucket, rho) rows; a 64-way bucketed groupby max-merges
them (the :mod:`pairjoin` vectorized-run idiom — no per-register
Python).  The sketch STATE is deterministic given the hash, so the
DuckDB oracle reproduces the registers bit-exactly via the repo's
SQL-exact token hash (``hashing.sql_token_hash64``); only the float
estimator (:func:`hll_estimate`) is pytest-tested for accuracy, since
a float harmonic mean has no bit-exact SQL twin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

#: register-index bits: m = 2**p registers, sigma ~ 1.04/sqrt(m).
HLL_P = 12
_MERGE_GROUPS = 64


def _rho_and_bucket(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, rho) for uint64 hashes: bucket = top ``p`` bits, rho =
    1 + leading zeros of the remaining ``64 - p`` bits (w == 0 ->
    64 - p + 1).  bit_length via ``np.frexp`` is exact: w < 2**52
    <= 2**53 so the float64 conversion is lossless."""
    w_bits = 64 - p
    bucket = (h >> np.uint64(w_bits)).astype(np.int64)
    w = h & np.uint64((1 << w_bits) - 1)
    e = np.frexp(w.astype(np.float64))[1]  # = bit_length(w), 0 for w=0
    rho = (w_bits + 1 - e).astype(np.int64)
    return bucket, rho


class _TokenHllPartial:
    """Actor: batch -> sparse non-zero HLL registers over token hashes."""

    def __init__(self, p: int = HLL_P, seed: int = 0):
        self.p = p
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pkd_tree_ray.hashing import token_hash64
        from pkd_tree_ray.text import tokenize_flat

        flat, _ = tokenize_flat(batch["text"])
        regs = np.zeros(1 << self.p, np.int64)
        if len(flat):
            h = token_hash64(flat, self.seed).astype(np.uint64)
            bucket, rho = _rho_and_bucket(h, self.p)
            np.maximum.at(regs, bucket, rho)
        nz = np.flatnonzero(regs)
        return pa.table(
            {
                "gbkt": pa.array(nz & np.int64(_MERGE_GROUPS - 1)),
                "bucket": pa.array(nz),
                "rho": pa.array(regs[nz]),
            }
        )


def _merge_max(group: pa.Table) -> pa.Table:
    b = group["bucket"].to_numpy()
    r = group["rho"].to_numpy()
    order = np.lexsort((-r, b))
    b, r = b[order], r[order]
    first = np.concatenate([[True], b[1:] != b[:-1]]) if len(b) else np.zeros(0, bool)
    return pa.table({"bucket": pa.array(b[first]), "rho": pa.array(r[first])})


def hll_tokens(docs, p: int = HLL_P, seed: int = 0):
    """-> (bucket, rho): merged HLL registers (non-zero only) over the
    corpus's whitespace tokens.  One streaming pass + a <= ``2**p``-row
    merge shuffle; feed the result to :func:`hll_estimate`."""
    from pkd_tree_ray.text import worker_cached

    return (
        docs.select_columns(["doc_id", "text"])
        .map_batches(
            worker_cached(_TokenHllPartial, p=p, seed=seed),
            batch_format="pyarrow",
        )
        .groupby("gbkt")
        .map_groups(_merge_max, batch_format="pyarrow")
    )


def hll_estimate(registers: pd.DataFrame, p: int = HLL_P) -> float:
    """Classic HLL estimator (Flajolet et al. 2007) with the
    small-range linear-counting correction; ``registers`` holds the
    non-zero (bucket, rho) rows from :func:`hll_tokens`."""
    m = 1 << p
    regs = np.zeros(m, np.float64)
    if len(registers):
        regs[registers["bucket"].to_numpy()] = registers["rho"].to_numpy()
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def sql_hll_tokens(
    p: int = HLL_P,
    seed: int = 0,
    docs_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """DuckDB SQL bit-exact vs :func:`hll_tokens`: the identical token
    hash (``sql_token_hash64``) and an integer CASE cascade for the
    leading-zero count — no float anywhere."""
    from pkd_tree_ray.hashing import sql_token_hash64
    from pkd_tree_ray.text import _TOKEN_RE

    w_bits = 64 - p
    th = sql_token_hash64("tok", seed)
    cascade = " ".join(
        f"WHEN w >= {1 << (w_bits - k)} THEN {k}" for k in range(1, w_bits + 1)
    )
    return f"""
WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM ({docs_sql}) q),
toks AS (SELECT unnest(regexp_extract_all(t, '{_TOKEN_RE}')) AS tok FROM d),
h AS (SELECT CAST({th} AS HUGEINT) AS hv FROM toks),
br AS (SELECT CAST(hv // {1 << w_bits} AS BIGINT) AS bucket,
              CAST(hv % {1 << w_bits} AS BIGINT) AS w
       FROM h),
rho AS (SELECT bucket,
               CASE {cascade} ELSE {w_bits + 1} END AS r
        FROM br)
SELECT bucket, max(r) AS rho FROM rho GROUP BY bucket
"""


# ----------------------------------------------------------------------
# Misra-Gries heavy hitters: EXACT global top-k with no vocab shuffle

#: default Misra-Gries summary capacity (terms kept per partial).
MG_CAP = 4096


def _mg_compress(terms: pa.Array, cnts: np.ndarray, cap: int):
    """Misra-Gries compression of EXACT batch counts to ``cap``
    counters: subtract the (cap+1)-th largest count ``d`` from every
    counter and keep the positives.  This is the closed form of
    running MG's repeated decrement over a stream summarized exactly;
    the residual error per batch is <= d <= n_batch_tokens/(cap+1), so
    any term whose TRUE corpus count exceeds
    sum_batches n_b/(cap+1) = n_tokens/(cap+1) survives in at least
    one partial (classic MG frequent-items guarantee, Misra & Gries
    1982)."""
    if len(cnts) <= cap:
        return terms, cnts
    d = np.partition(cnts, len(cnts) - cap - 1)[len(cnts) - cap - 1]
    keep = cnts > d
    return terms.filter(pa.array(keep)), cnts[keep] - d


class _MisraGriesPartial:
    """Actor: batch -> capacity-``cap`` Misra-Gries summary (term,
    res) over the batch's whitespace tokens — one Arrow tokenize +
    ``value_counts`` pass, then the closed-form compression."""

    def __init__(self, cap: int = MG_CAP):
        self.cap = cap

    def __call__(self, batch: pa.Table) -> pa.Table:
        from pkd_tree_ray.text import tokenize_flat

        flat, _ = tokenize_flat(batch["text"])
        if not len(flat):
            return pa.table(
                {"term": pa.array([], pa.string()), "res": pa.array([], pa.int64())}
            )
        vc = flat.value_counts()
        terms, cnts = _mg_compress(
            vc.field("values"), vc.field("counts").to_numpy().astype(np.int64), self.cap
        )
        return pa.table({"term": terms, "res": pa.array(cnts)})


class _CandidateRecount:
    """Actor: exact (term, cnt) partial restricted to the broadcast
    candidate set — ``pc.is_in`` against the batch's value_counts, so
    per-batch work is sized by the batch VOCABULARY and the emitted
    partial by ``len(candidates)``."""

    def __init__(self, cand_ref):
        import ray

        self.cands = ray.get(cand_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from pkd_tree_ray.text import tokenize_flat

        flat, _ = tokenize_flat(batch["text"])
        if not len(flat):
            return pa.table(
                {"term": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        vc = flat.value_counts()
        t = pa.table(
            {"term": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())}
        )
        return t.filter(pc.is_in(t["term"], value_set=self.cands))


def heavy_hitters(docs, k: int = 20, cap: int = MG_CAP):
    """EXACT global top-``k`` tokens -> pa.Table (term, cnt) ordered
    (cnt DESC, term ASC) — same answer as :func:`text.vocab_topk`, but
    the full vocabulary NEVER shuffles.

    100-TB shape, two streaming passes:

    1. **Candidates.**  Each batch emits a capacity-``cap``
       Misra-Gries summary (<= cap rows regardless of batch vocab);
       ONE ``groupby(term)`` over the capped partials sums residuals,
       a per-block top-``cap`` cut bounds the driver merge at
       blocks x cap rows.  Any term with true count >
       n_tokens/(cap+1) is guaranteed into the partials (see
       :func:`_mg_compress`); with cap >> k the union comfortably
       holds the true top-k (asserted against the exact counts in
       ``tests/test_sketches.py``).
    2. **Exact recount.**  The <= cap candidate terms are broadcast
       ONCE via ``ray.put``; batches emit exact counts for candidates
       only (``pc.is_in`` over per-batch value_counts), one tiny
       ``groupby(term).sum`` merges them, and the final top-k cut is
       exact integer arithmetic — so the result oracles bit-exactly
       against plain SQL (:func:`sql_heavy_hitters`).

    vs ``vocab_topk``: identical output, but the shuffle here carries
    O(batches x cap) rows instead of the corpus vocabulary — the right
    trade once the vocab outgrows the candidate cap by orders of
    magnitude (web-scale corpora: ~10^9 distinct tokens vs cap=4096).
    """
    import ray

    from pkd_tree_ray.text import _norm_term_cnt, _table_sorted_cut, worker_cached

    summary = (
        docs.select_columns(["text"])
        .map_batches(
            worker_cached(_MisraGriesPartial, cap=cap),
            batch_format="pyarrow",
        )
        .groupby("term")
        .sum("res")
    )

    def block_cut(t: pa.Table) -> pa.Table:
        return _table_sorted_cut(_norm_term_cnt(t), cap)

    parts = [pa.table({"term": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})]
    parts += [
        t.select(["term", "cnt"])
        for t in (
            ray.get(r)
            for r in summary.map_batches(block_cut, batch_format="pyarrow").to_arrow_refs()
        )
        if "term" in t.schema.names and t.num_rows
    ]
    cand_terms = _table_sorted_cut(pa.concat_tables(parts), cap)["term"].combine_chunks()
    cand_ref = ray.put(cand_terms)

    exact = (
        docs.select_columns(["text"])
        .map_batches(
            worker_cached(_CandidateRecount, cand_ref=cand_ref),
            batch_format="pyarrow",
        )
        .groupby("term")
        .sum("cnt")
    )

    def final_cut(t: pa.Table) -> pa.Table:
        return _table_sorted_cut(_norm_term_cnt(t), k)

    out = [pa.table({"term": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})]
    out += [
        t.select(["term", "cnt"])
        for t in (
            ray.get(r)
            for r in exact.map_batches(final_cut, batch_format="pyarrow").to_arrow_refs()
        )
        if "term" in t.schema.names and t.num_rows
    ]
    return _table_sorted_cut(pa.concat_tables(out), k)


def sql_heavy_hitters(k: int = 20) -> str:
    """DuckDB SQL bit-exact vs :func:`heavy_hitters` — the recount
    pass makes the sketch result EXACT, so the oracle is the plain
    top-k query (same as ``sql_vocab_topk``)."""
    from pkd_tree_ray.text import sql_vocab_topk

    return sql_vocab_topk(k)
