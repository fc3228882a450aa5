"""Broadcast-Bloom semi-join / anti-join: filter a big table by key
membership in a small table with ZERO shuffle on the big side.

A shuffle join moves every block of both sides; when one side is
orders of magnitude smaller (a filtered dimension table, a blocklist,
a sampled id set), the scale-correct plan is a broadcast: collect the
small side's distinct keys ONCE, ``ray.put`` a Bloom filter plus the
sorted key array, and stream the big side through a ``map_batches``
probe.  The Bloom bitset (``bits_per_key`` bits/key, default 16 ->
~0.05% fpp at kh=6) fits in L2/L3 where the raw key array may not at
10^9 keys, so the hot loop touches the big array only for the thin
Bloom-positive slice — the Bloom is a BANDWIDTH optimization, never a
correctness cut: every Bloom-positive row is re-checked exactly via
searchsorted membership, so the output is exact and oracles against
plain ``IN`` / ``NOT IN`` SQL.

Small-side assumption (documented, same contract as ``tfidf_topk``'s
IDF broadcast): the build side's distinct keys fit on the driver and
in each worker's heap — at 10^9 int64 keys that is 8 GB; a build side
beyond that needs a hash-shuffle join instead (and loses the
zero-shuffle property by necessity).

No counterpart in the reference (it is a spatial index); this is part
of the training-data-pipeline surface (id-blocklist filtering,
sampled-subset joins, quality-gated corpus cuts).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pkd_tree_ray.hashing import splitmix64

#: Bloom sizing defaults: m = bits_per_key * n keys (rounded up to a
#: power of two so ``h % m`` is a mask), kh independent probes.
BITS_PER_KEY = 16
N_PROBES = 6
_BLOOM_SEED = 0xB100F


def build_bloom(keys: np.ndarray, bits_per_key: int = BITS_PER_KEY, kh: int = N_PROBES):
    """-> (bitset uint8[m/8], m, kh, sorted_keys): Bloom bitset over
    int64 keys + the sorted exact key array, both broadcast together."""
    keys = np.unique(np.asarray(keys, dtype=np.int64))
    m = 1 << max(6, int(np.ceil(np.log2(max(1, len(keys)) * bits_per_key))))
    bits = np.zeros(m >> 3, dtype=np.uint8)
    hv = keys.view(np.uint64)
    for i in range(kh):
        idx = (splitmix64(hv, _BLOOM_SEED + i) & np.uint64(m - 1)).astype(np.int64)
        np.bitwise_or.at(bits, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))
    return bits, m, kh, keys


def bloom_test(bits: np.ndarray, m: int, kh: int, values: np.ndarray) -> np.ndarray:
    """Vectorized membership probe: AND of kh bit tests per value."""
    mask = np.ones(len(values), dtype=bool)
    hv = np.asarray(values, dtype=np.int64).view(np.uint64)
    for i in range(kh):
        idx = (splitmix64(hv, _BLOOM_SEED + i) & np.uint64(m - 1)).astype(np.int64)
        mask &= (bits[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1 > 0
    return mask


def _in_sorted(values: np.ndarray, sset: np.ndarray) -> np.ndarray:
    """Membership of ``values`` in the SORTED array ``sset`` — one
    searchsorted, no per-call re-sort (the :mod:`index` idiom)."""
    out = np.zeros(len(values), dtype=bool)
    if not len(sset) or not len(values):
        return out
    pos = np.searchsorted(sset, values, side="left")
    ok = pos < len(sset)
    out[ok] = sset[pos[ok]] == values[ok]
    return out


class _BloomProbe:
    """Actor: filter batches by exact key membership, Bloom-first.

    State (bitset + sorted keys) is fetched from the object store once
    per actor in ``__init__``; ``__call__`` is pure numpy."""

    def __init__(self, state_ref, key_col: str, anti: bool = False):
        import ray

        self.bits, self.m, self.kh, self.keys = ray.get(state_ref)
        self.key_col = key_col
        self.anti = anti

    def __call__(self, t: pa.Table) -> pa.Table:
        v = t[self.key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = bloom_test(self.bits, self.m, self.kh, v)
        surv = np.flatnonzero(mask)
        if len(surv):
            # exact re-check of Bloom positives only: false positives
            # (~0.05% at the defaults) die here, so output is EXACT
            mask[surv] = _in_sorted(v[surv], self.keys)
        if self.anti:
            mask = ~mask
        return t.filter(pa.array(mask))


def bloom_semi_join(
    big,
    key_col: str,
    small,
    small_key_col: str,
    anti: bool = False,
    bits_per_key: int = BITS_PER_KEY,
    kh: int = N_PROBES,
):
    """Rows of ``big`` whose ``key_col`` is (semi) / is not (anti) in
    ``small.small_key_col`` -> Dataset with ``big``'s schema.

    100-TB shape: the build side streams once through per-batch
    ``unique`` partials (each partial is sized by the batch's DISTINCT
    keys); the driver de-dups the partials and broadcasts
    (bitset, sorted keys) ONCE via ``ray.put``; the probe side streams
    through an actor-pool ``map_batches`` with no shuffle, no
    re-shipping of the key set per batch, and exact output.
    """
    import pyarrow.compute as pc
    import ray

    from pkd_tree_ray.text import worker_cached

    def distinct_partial(t: pa.Table) -> pa.Table:
        return pa.table({"k": pc.unique(t[small_key_col]).cast(pa.int64())})

    parts = [
        t["k"].to_numpy(zero_copy_only=False)
        for t in (
            ray.get(r)
            for r in small.select_columns([small_key_col])
            .map_batches(distinct_partial, batch_format="pyarrow")
            .to_arrow_refs()
        )
        # empty blocks can surface with a bare schema — they carry no keys
        if "k" in t.schema.names and t.num_rows
    ]
    keys = (
        np.concatenate(parts).astype(np.int64) if parts else np.zeros(0, np.int64)
    )
    state_ref = ray.put(build_bloom(keys, bits_per_key=bits_per_key, kh=kh))

    return big.map_batches(
        worker_cached(_BloomProbe, state_ref=state_ref, key_col=key_col, anti=anti),
        batch_format="pyarrow",
    )


def sql_semi_join(
    big_sql: str, key: str, small_sql: str, small_key: str, anti: bool = False
) -> str:
    """DuckDB SQL bit-exact vs :func:`bloom_semi_join` (the Bloom is
    transparent: output = plain IN / NOT IN on non-null keys)."""
    op = "NOT IN" if anti else "IN"
    return f"""
SELECT * FROM ({big_sql}) b
WHERE b.{key} {op} (SELECT {small_key} FROM ({small_sql}) s)
"""


# ----------------------------------------------------------------------
# broadcast inner/left join: attach small-side payload columns


class _BroadcastJoinProbe:
    """Actor: attach broadcast payload columns by key.

    ``__init__`` fetches (sorted keys, key-sorted payload table) once
    per actor; ``__call__`` is one searchsorted + one Arrow ``take``
    per batch — zero Python per row, zero shuffle."""

    def __init__(self, state_ref, key_col: str, how: str):
        import ray

        self.keys, self.payload = ray.get(state_ref)
        self.key_col = key_col
        self.how = how

    def __call__(self, t: pa.Table) -> pa.Table:
        v = t[self.key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(self.keys, v, side="left")
        pos_c = np.minimum(pos, max(len(self.keys) - 1, 0))
        hit = (
            self.keys[pos_c] == v if len(self.keys) else np.zeros(len(v), bool)
        )
        if self.how == "inner":
            t = t.filter(pa.array(hit))
            idx = pa.array(pos_c[hit])
        else:  # left: misses become nulls in the payload columns
            idx = pa.array(pos_c, mask=~hit)
        for name in self.payload.column_names:
            t = t.append_column(name, self.payload[name].take(idx))
        return t


def broadcast_join(
    big,
    key_col: str,
    small,
    small_key_col: str,
    payload_cols: list[str],
    how: str = "inner",
):
    """Join ``big`` to ``small`` on int64 keys, attaching
    ``payload_cols`` from the small side -> Dataset with big's schema +
    payloads.  ``how`` is 'inner' (drop misses) or 'left' (null-fill).

    100-TB shape: the small side is collected ONCE on the driver
    (unique-key requirement asserted — a duplicate build key would
    multiply probe rows, which is a shuffle join's job), sorted by key,
    and broadcast as ONE ``ray.put`` of (keys, payload table); the big
    side streams through an actor-pool ``map_batches`` doing a
    searchsorted + Arrow ``take`` per batch.  No shuffle, no per-batch
    re-ship of the build side — same small-side contract as
    :func:`bloom_semi_join` and ``tfidf_topk``'s IDF broadcast.
    """
    import ray

    from pkd_tree_ray.text import worker_cached

    if how not in ("inner", "left"):
        raise ValueError(f"broadcast_join: how={how!r} must be 'inner' or 'left'")

    cols = [small_key_col] + list(payload_cols)
    parts = [
        t
        for t in (
            ray.get(r)
            for r in small.select_columns(cols).to_arrow_refs()
        )
        if small_key_col in t.schema.names and t.num_rows
    ]
    build = (
        pa.concat_tables(parts)
        if parts
        else None
    )
    if build is not None:
        keys = build[small_key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        if len(keys) > 1 and (keys[1:] == keys[:-1]).any():
            raise ValueError(
                "broadcast_join: duplicate keys on the build side — "
                "use a shuffle join for one-to-many"
            )
        payload = build.select(list(payload_cols)).take(pa.array(order))
    else:
        keys = np.zeros(0, np.int64)
        payload = pa.table(
            {c: pa.array([], pa.string()) for c in payload_cols}
        )
    state_ref = ray.put((keys, payload))

    return big.map_batches(
        worker_cached(_BroadcastJoinProbe, state_ref=state_ref, key_col=key_col, how=how),
        batch_format="pyarrow",
    )


def sql_broadcast_join(
    big_sql: str,
    key: str,
    small_sql: str,
    small_key: str,
    payload_cols: list[str],
    how: str = "inner",
) -> str:
    """DuckDB SQL bit-exact vs :func:`broadcast_join`."""
    jt = "JOIN" if how == "inner" else "LEFT JOIN"
    pl = ", ".join(f"s.{c}" for c in payload_cols)
    return f"""
SELECT b.*, {pl}
FROM ({big_sql}) b {jt} ({small_sql}) s ON b.{key} = s.{small_key}
"""
