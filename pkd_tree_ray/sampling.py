"""Deterministic sampling operators for training-data curation.

A 100-TB corpus is rarely trained on whole: pipelines stratify
(per-language / per-source caps), deduplicate, then sample.  These
operators are DETERMINISTIC — membership is a pure function of
(id, seed), so a re-run (or a resumed run) selects the identical
sample, and DuckDB can re-derive the exact result for the oracle gate.

Scale shape: rank-by-hash sampling needs the global top-n per key,
but n is small — so each batch PRE-PRUNES to its local top-n per key
(vectorized lexsort, no Python loop) and only ~n_keys * n_per_key
rows reach the final single-key combine.  No full-corpus shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pkd_tree_ray.hashing import splitmix64


def _rank_prune(
    keys: np.ndarray, ids: np.ndarray, hv: np.ndarray, n_per_key: int
) -> np.ndarray:
    """Indices of rows ranked < n_per_key within their key by
    (hash, id) ascending — one lexsort, run-segmented, no Python loop."""
    order = np.lexsort((ids, hv, keys))
    ks = keys[order]
    new_run = np.concatenate([[True], ks[1:] != ks[:-1]])
    run_start = np.maximum.accumulate(np.where(new_run, np.arange(len(ks)), 0))
    rank = np.arange(len(ks)) - run_start
    return order[rank < n_per_key]


def sample_per_key(
    ds,
    key_col: str,
    id_col: str,
    n_per_key: int,
    seed: int = 0,
    key_dtype: pa.DataType | None = None,
):
    """Deterministic stratified sample: for every distinct ``key_col``
    value keep the ``n_per_key`` rows with the smallest
    ``(splitmix64(id, seed), id)`` — a seeded uniform sample per
    stratum that any re-run reproduces exactly.

    Two-level: per-batch vectorized prune to the local top-n per key
    (so the shuffle moves at most ``n_keys * n_per_key`` rows per
    batch), then a KEY-BUCKETED combine — keys hash into
    :data:`~pkd_tree_ray.pairjoin._ATTACH_BUCKETS` buckets and each
    bucket re-runs the same vectorized rank kernel over all its keys
    at once, so high-cardinality strata cost one Python call per
    bucket, not per key.
    """
    from pkd_tree_ray.pairjoin import _bucket_of

    def batch_keys(batch: pa.Table) -> np.ndarray:
        kc = batch[key_col]
        if pa.types.is_integer(kc.type):
            return kc.to_numpy().astype(np.int64)
        kd = kc.combine_chunks().dictionary_encode()
        return np.asarray(kd.indices).astype(np.int64)

    def prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        ids = batch[id_col].to_numpy().astype(np.int64)
        keys = batch_keys(batch)
        hv = splitmix64(ids.view(np.uint64), seed).view(np.int64)
        sel = _rank_prune(keys, ids, hv, n_per_key)
        return batch.take(pa.array(np.sort(sel)))

    def add_kbkt(batch: pd.DataFrame) -> pd.DataFrame:
        # hash the key VALUE (not a batch-local code): identical keys
        # must land in the same bucket across batches
        hv = pd.util.hash_array(batch[key_col].to_numpy()).astype(np.int64)
        batch["kbkt"] = _bucket_of(hv)
        return batch

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(group[key_col], sort=False)
        ids = group[id_col].to_numpy(dtype=np.int64)
        hv = splitmix64(ids.view(np.uint64), seed).view(np.int64)
        sel = _rank_prune(codes.astype(np.int64), ids, hv, n_per_key)
        return group.iloc[np.sort(sel)].drop(columns=["kbkt"])

    return (
        ds.map_batches(prune, batch_format="pyarrow")
        .map_batches(add_kbkt, batch_format="pandas")
        .groupby("kbkt")
        .map_groups(combine, batch_format="pandas")
    )


def hash_split(ds, id_col: str, holdout_permille: int, seed: int = 0):
    """Deterministic train/holdout corpus split: a row is ``holdout``
    iff ``splitmix64(id, seed) % 1000 < holdout_permille`` — membership
    is a pure function of (id, seed), so the split is identical across
    re-runs, resumed shards and cluster sizes, train/holdout never
    overlap, and no shuffle is needed (pure streaming map; the split
    column prunes at read time when written as a partition key).

    -> input columns + ``split``:string (``train`` | ``holdout``).

    Ids must be non-negative: the Python side would wrap a negative id
    through the uint64 view while the SQL twin keeps it negative in
    HUGEINT arithmetic — rather than silently diverge, the kernel
    rejects negative ids."""
    p = int(holdout_permille)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy().astype(np.int64)
        if len(ids) and ids.min() < 0:
            raise ValueError(
                f"hash_split: {id_col} must be non-negative (the SQL "
                "oracle's integer arithmetic diverges on negatives)"
            )
        hv = splitmix64(ids.view(np.uint64), seed) % np.uint64(1000)
        split = np.where(hv < np.uint64(p), "holdout", "train")
        return batch.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow")


def sql_hash_split(
    table: str,
    id_col: str,
    holdout_permille: int,
    seed: int = 0,
    cols: str | None = None,
) -> str:
    """DuckDB SQL bit-exact vs :func:`hash_split`."""
    from pkd_tree_ray.hashing import sql_splitmix64

    hv = sql_splitmix64(id_col, seed)
    cols = cols or id_col
    return f"""
SELECT {cols},
       CASE WHEN ({hv}) % 1000 < {int(holdout_permille)}
            THEN 'holdout' ELSE 'train' END AS split
FROM {table}
"""


def sql_sample_per_key(
    table: str,
    key_col: str,
    id_col: str,
    n_per_key: int,
    seed: int = 0,
    cols: str | None = None,
) -> str:
    """DuckDB SQL bit-exact vs :func:`sample_per_key`."""
    from pkd_tree_ray.hashing import sql_splitmix64, sql_u64_to_i64

    hv = sql_u64_to_i64(sql_splitmix64(id_col, seed))
    cols = cols or f"{key_col}, {id_col}"
    return f"""
SELECT {cols} FROM (
  SELECT *, row_number() OVER (
      PARTITION BY {key_col} ORDER BY {hv}, {id_col}) AS rk
  FROM {table})
WHERE rk <= {int(n_per_key)}
"""
