"""Mergeable distinct-count sketches (HyperLogLog).

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
    from pkd_tree_ray.text import _pool_width

    return (
        docs.select_columns(["doc_id", "text"])
        .map_batches(
            _TokenHllPartial,
            fn_constructor_kwargs={"p": p, "seed": seed},
            batch_format="pyarrow",
            concurrency=_pool_width(),
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
