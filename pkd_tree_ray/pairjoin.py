"""Distributed pairwise verification: two repartition joins bring both
endpoints' payloads onto ONE row per pair, then a vectorized
``map_batches`` kernel verifies whole batches of pairs at once.

Shared shape for the near-dup verifiers (MinHash-Jaccard in text.py,
embedding-cosine in ann.py).  r1 fetched every candidate payload to
the driver; r2 joined payloads to pairs distributedly but verified via
``groupby(pair).map_groups`` — one Python call per pair; r3 attached
payloads via ``groupby(endpoint).map_groups`` — one Python call per
distinct DOC (r3 weak item).  Here each join groups by a HASH BUCKET
of the endpoint (``_ATTACH_BUCKETS`` buckets), and the per-bucket
kernel attaches every doc's payload to its edges with run-segmented
numpy plus ONE vectorized Arrow ``take`` on the list column — zero
per-doc Python, bounded bucket payload (~corpus/1024).  Verification
is a ``map_batches`` over (a, b, payload_a, payload_b) rows — the
caller supplies a batch kernel that vectorizes the comparison across
the whole batch.  The only driver-side state is the candidate id set
(ints), used for the broadcast semi-filter of the payload table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def list_to_matrix(col) -> np.ndarray:
    """(n, d) float64 matrix from an equal-length list column."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(n, -1)


def list_flat(col) -> tuple[np.ndarray, np.ndarray]:
    """(values, row_index) of a variable-length list column — the flat
    form the vectorized set kernels consume."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    lens = np.asarray([len(x) if x is not None else 0 for x in arr], dtype=np.int64) \
        if arr.null_count else np.diff(
            np.asarray(arr.offsets.to_numpy(zero_copy_only=False))
        )
    vals = arr.flatten().to_numpy(zero_copy_only=False)
    idx = np.repeat(np.arange(len(arr), dtype=np.int64), lens)
    return vals, idx


#: hash buckets for the payload-attach shuffles — each bucket's group
#: is ~corpus/1024, so per-task payload stays bounded at any corpus
#: size while the per-bucket kernel amortizes Python over ~thousands
#: of docs
_ATTACH_BUCKETS = 1024

#: splitmix64 finalizer multipliers (public domain) — jkey values are
#: doc ids (often sequential), so bucket = jkey % P would stripe;
#: a mixed bucket spreads any id pattern
_MIX_M1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX_M2 = np.uint64(0x94D049BB133111EB)


def _bucket_of(jkey: np.ndarray) -> np.ndarray:
    z = jkey.astype(np.uint64, copy=True)
    z ^= z >> np.uint64(30)
    z *= _MIX_M1
    z ^= z >> np.uint64(27)
    z *= _MIX_M2
    z ^= z >> np.uint64(31)
    return (z & np.uint64(_ATTACH_BUCKETS - 1)).astype(np.int64)


def pairwise_join_verify(
    payload_ds,
    cand_ds,
    id_col: str,
    a_col: str,
    b_col: str,
    payload_col: str,
    payload_type: pa.DataType,
    verify_fn,
    out_col: str,
    verify_batch_fn=None,
):
    """-> Dataset (a_col, b_col, out_col:int64).

    ``payload_ds``: (id_col, payload_col:list<...>) — payload rows for
    AT LEAST the candidate ids (pre-filtering is the caller's choice);
    ``cand_ds``: (a_col, b_col) candidate pairs (a < b, distinct);
    ``verify_fn(payload_a: np.ndarray, payload_b: np.ndarray) ->
    int | None`` — None drops the pair, an int becomes ``out_col``.
    ``verify_batch_fn(col_a, col_b) -> (values: int64[n], keep:
    bool[n])`` — vectorized over a batch of pairs (``col_*`` are Arrow
    list columns); when given it replaces the per-pair fallback loop.
    """
    ptype = pa.list_(payload_type)

    def join_schema(with_b: bool) -> dict:
        cols = {
            "jbkt": pa.int64(),
            "jkey": pa.int64(),
            a_col: pa.int64(),
            b_col: pa.int64(),
            "slot": pa.int8(),
            "pl_a": ptype,
        }
        if with_b:
            cols["pl_b"] = ptype
        return cols

    def empty_table(cols: dict) -> pa.Table:
        return pa.table({k: pa.array([], t) for k, t in cols.items()})

    def const_lists(n: int) -> pa.Array:
        return pa.ListArray.from_arrays(
            pa.array(np.zeros(n + 1, np.int32)), pa.array([], payload_type)
        )

    # -- stage 1: join on `a` ------------------------------------------
    def edges1(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        jk = batch[a_col].to_numpy().astype(np.int64)
        return pa.table(
            {
                "jbkt": pa.array(_bucket_of(jk)),
                "jkey": pa.array(jk),
                a_col: batch[a_col].cast(pa.int64()),
                b_col: batch[b_col].cast(pa.int64()),
                "slot": pa.array(np.zeros(n, np.int8)),
                "pl_a": const_lists(n),
            }
        )

    def tag(batch: pa.Table, with_b: bool) -> pa.Table:
        n = batch.num_rows
        z = pa.array(np.zeros(n, np.int64))
        jk = batch[id_col].to_numpy().astype(np.int64)
        cols = {
            "jbkt": pa.array(_bucket_of(jk)),
            "jkey": pa.array(jk),
            a_col: z,
            b_col: z,
            "slot": pa.array(np.full(n, -1, np.int8)),
            "pl_a": (
                const_lists(n) if with_b else batch[payload_col].cast(ptype)
            ),
        }
        if with_b:
            cols["pl_b"] = batch[payload_col].cast(ptype)
        return pa.table(cols)

    def attach(group: pa.Table, stage: int) -> pa.Table:
        """Run-segmented payload attach over one HASH BUCKET of jkeys:
        owner rows (slot=-1, one per doc) sort to the head of their
        doc's run; every edge row in a run with an owner receives the
        owner's payload via ONE Arrow ``take`` on the list column —
        no per-doc Python, no ``.as_py()`` payload round-trip."""
        jk = group["jkey"].to_numpy()
        slot = group["slot"].to_numpy()
        order = np.lexsort((slot, jk))
        jk_s = jk[order]
        slot_s = slot[order]
        new_run = np.concatenate([[True], jk_s[1:] != jk_s[:-1]])
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        owner_ok = slot_s[starts] == -1
        keep = (slot_s >= 0) & owner_ok[run_id]
        if not keep.any():
            return empty_table(join_schema(True))
        edge_pos = pa.array(order[keep])
        owner_pos = pa.array(order[starts[run_id[keep]]])
        sub = group.take(edge_pos)
        pl_col = "pl_a" if stage == 1 else "pl_b"
        payload = group[pl_col].take(owner_pos)
        if stage == 1:
            # re-key by b for the second join
            jk2 = sub[b_col].to_numpy()
            return pa.table(
                {
                    "jbkt": pa.array(_bucket_of(jk2)),
                    "jkey": sub[b_col],
                    a_col: sub[a_col],
                    b_col: sub[b_col],
                    "slot": sub["slot"],
                    "pl_a": payload,
                    "pl_b": const_lists(len(jk2)),
                }
            )
        return pa.table(
            {
                "jbkt": sub["jbkt"],
                "jkey": sub["jkey"],
                a_col: sub[a_col],
                b_col: sub[b_col],
                "slot": sub["slot"],
                "pl_a": sub["pl_a"],
                "pl_b": payload,
            }
        )

    def attach_a(group: pa.Table) -> pa.Table:
        return attach(group, 1)

    def attach_b(group: pa.Table) -> pa.Table:
        return attach(group, 2)

    # -- stage 3: vectorized verify ------------------------------------
    def verify_batch(batch: pa.Table) -> pa.Table:
        out_empty = pa.table(
            {
                a_col: pa.array([], pa.int64()),
                b_col: pa.array([], pa.int64()),
                out_col: pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return out_empty
        if verify_batch_fn is not None:
            vals, keep = verify_batch_fn(batch["pl_a"], batch["pl_b"])
        else:
            vals = np.zeros(batch.num_rows, np.int64)
            keep = np.zeros(batch.num_rows, bool)
            for i in range(batch.num_rows):
                v = verify_fn(
                    np.asarray(batch["pl_a"][i].as_py()),
                    np.asarray(batch["pl_b"][i].as_py()),
                )
                if v is not None:
                    vals[i] = int(v)
                    keep[i] = True
        if not keep.any():
            return out_empty
        sel = pa.array(np.nonzero(keep)[0])
        return pa.table(
            {
                a_col: batch[a_col].take(sel),
                b_col: batch[b_col].take(sel),
                out_col: pa.array(vals[keep], pa.int64()),
            }
        )

    tagged1 = payload_ds.map_batches(
        lambda b: tag(b, False), batch_format="pyarrow"
    )
    edge_ds = cand_ds.map_batches(edges1, batch_format="pyarrow")
    half = (
        tagged1.union(edge_ds)
        .groupby("jbkt")
        .map_groups(attach_a, batch_format="pyarrow")
    )
    tagged2 = payload_ds.map_batches(
        lambda b: tag(b, True), batch_format="pyarrow"
    )
    full = (
        tagged2.union(half)
        .groupby("jbkt")
        .map_groups(attach_b, batch_format="pyarrow")
    )
    return full.map_batches(verify_batch, batch_format="pyarrow")


def distinct_pairs(cand, a_col: str, b_col: str):
    """Distinct (a, b) int64 pair rows via a :data:`_ATTACH_BUCKETS`-way
    hash shuffle + per-bucket vectorized lexsort-unique.

    Replaces ``groupby([a, b]).aggregate(Count)`` for pair dedup: the
    global two-key aggregate pays per-GROUP Python overhead, which at
    >1e5 distinct pairs dominates the whole near-dup pipeline (~50 s
    for 315k pairs); the bucketed unique is one bounded shuffle plus
    numpy (~2 s same input)."""
    import pandas as pd

    def add_pbkt(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch[a_col].to_numpy(dtype=np.int64)
        b = batch[b_col].to_numpy(dtype=np.int64)
        batch["pbkt"] = _bucket_of(a * np.int64(0x9E3779B9) ^ b)
        return batch

    def uniq(group: pd.DataFrame) -> pd.DataFrame:
        a = group[a_col].to_numpy(dtype=np.int64)
        b = group[b_col].to_numpy(dtype=np.int64)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        keep = np.concatenate(
            [[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        ) if len(a) else np.zeros(0, bool)
        return pd.DataFrame({a_col: a[keep], b_col: b[keep]})

    return (
        cand.map_batches(add_pbkt, batch_format="pandas")
        .groupby("pbkt")
        .map_groups(uniq, batch_format="pandas")
    )


def distinct_ids(ds, id_col: str):
    """Distinct int64 id rows, same bucketed-unique shape as
    :func:`distinct_pairs` (replaces ``groupby(id).aggregate(Count)``
    whose per-group overhead dominates past ~1e5 distinct ids)."""
    import pandas as pd

    def add_pbkt(batch: pd.DataFrame) -> pd.DataFrame:
        batch["pbkt"] = _bucket_of(batch[id_col].to_numpy(dtype=np.int64))
        return batch

    def uniq(group: pd.DataFrame) -> pd.DataFrame:
        v = np.unique(group[id_col].to_numpy(dtype=np.int64))
        return pd.DataFrame({id_col: v})

    return (
        ds.map_batches(add_pbkt, batch_format="pandas")
        .groupby("pbkt")
        .map_groups(uniq, batch_format="pandas")
    )


def semi_filter_ids(ds, id_col: str, ids: np.ndarray):
    """Broadcast semi-join: keep rows whose id is in ``ids`` (the id
    set ships once via ray.put; the table streams through a filter)."""
    idref = ray.put(np.asarray(ids))

    def semi(batch: pa.Table) -> pa.Table:
        keep = np.isin(batch[id_col].to_numpy(), ray.get(idref))
        return batch.filter(pa.array(keep))

    return ds.map_batches(semi, batch_format="pyarrow")


def bucket_pairs_capped_runs(
    run: np.ndarray, ids: np.ndarray, cap: int = 64
) -> tuple[np.ndarray, np.ndarray]:
    """:func:`bucket_pairs_capped` over MANY buckets at once — the
    emitted pair SET per run is identical, with zero per-bucket Python.

    ``run``: non-decreasing run labels (one per LSH bucket); ``ids``
    must be sorted ascending WITHIN each run (lexsort by (bucket key,
    id) upstream).  Small runs (<= cap) vectorize by grouping equal
    lengths (one ``triu_indices`` broadcast per distinct length — at
    most cap-1 iterations, independent of bucket count); large runs
    emit the segmented star + sorted-adjacent chain with global
    position arithmetic, skipping the chain edges the star already
    covers (position % cap == 1) instead of a unique() dedup."""
    run = np.asarray(run)
    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    empty = np.empty(0, np.int64)
    if n < 2:
        return empty, empty
    starts = np.flatnonzero(np.concatenate([[True], run[1:] != run[:-1]]))
    lens = np.diff(np.append(starts, n))
    pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    small = (lens >= 2) & (lens <= cap)
    for L in np.unique(lens[small]):
        rs = starts[small & (lens == L)]
        ia, ib = np.triu_indices(int(L), k=1)
        out_a.append(ids[(rs[:, None] + ia[None, :]).ravel()])
        out_b.append(ids[(rs[:, None] + ib[None, :]).ravel()])
    big = np.repeat(lens > cap, lens)
    if big.any():
        p = pos[big]
        gi = np.nonzero(big)[0]
        st = np.repeat(starts, lens)[big]
        spoke = p % cap != 0
        out_a.append(ids[(st + (p // cap) * cap)[spoke]])
        out_b.append(ids[gi[spoke]])
        chain = (p >= 1) & (p % cap != 1)
        out_a.append(ids[gi[chain] - 1])
        out_b.append(ids[gi[chain]])
    if not out_a:
        return empty, empty
    return np.concatenate(out_a), np.concatenate(out_b)


def bucket_pairs_runs_table(
    key_cols: list[np.ndarray], ids: np.ndarray, cap: int = 64
) -> tuple[np.ndarray, np.ndarray]:
    """Pairs for a batch holding MANY (bucket-key, id) rows: lexsort by
    (keys..., id), run-split on key change, emit capped pairs — the
    whole-batch form used inside a hash-bucket ``map_groups``."""
    order = np.lexsort((ids, *reversed(key_cols)))
    ids_s = ids[order]
    change = np.zeros(len(ids_s), dtype=bool)
    if len(ids_s):
        change[0] = True
        for c in key_cols:
            cs = c[order]
            change[1:] |= cs[1:] != cs[:-1]
    runs = np.cumsum(change) - 1
    return bucket_pairs_capped_runs(runs, ids_s, cap)


def sql_capped_pairs_ctes(
    bucket_rel: str, part_cols: tuple[str, str], id_col: str, cap: int = 64
) -> str:
    """DuckDB CTE chain reproducing :func:`bucket_pairs_capped_runs`
    exactly over a relation ``bucket_rel(part_cols..., id_col)`` —
    small buckets emit all pairs, oversized ones the segmented
    star+chain — ending in ``cand(a, b)`` (distinct, a < b).  Used by
    the near-dup oracle SQL so the LSH candidate SET matches the Ray
    engine bit-for-bit even past the cap."""
    p1, p2 = part_cols
    return f"""
ordered AS (
  SELECT {p1}, {p2}, {id_col},
         row_number() OVER (PARTITION BY {p1}, {p2} ORDER BY {id_col}) - 1 AS pos,
         count(*) OVER (PARTITION BY {p1}, {p2}) AS bn
  FROM {bucket_rel}),
small AS (
  SELECT o1.{id_col} AS a, o2.{id_col} AS b
  FROM ordered o1 JOIN ordered o2 USING ({p1}, {p2})
  WHERE o1.bn <= {cap} AND o1.pos < o2.pos),
centers AS (SELECT {p1}, {p2}, pos AS cpos, {id_col} AS cid
            FROM ordered WHERE bn > {cap} AND pos % {cap} = 0),
spokes AS (
  SELECT c.cid AS a, o.{id_col} AS b
  FROM ordered o JOIN centers c USING ({p1}, {p2})
  WHERE o.bn > {cap} AND o.pos % {cap} <> 0 AND c.cpos = (o.pos // {cap}) * {cap}),
chain AS (
  SELECT a, b FROM (
    SELECT lag({id_col}) OVER (PARTITION BY {p1}, {p2} ORDER BY pos) AS a,
           {id_col} AS b, pos
    FROM ordered WHERE bn > {cap})
  WHERE pos >= 1 AND pos % {cap} <> 1),
cand AS (SELECT DISTINCT a, b FROM (
  SELECT * FROM small UNION ALL SELECT * FROM spokes UNION ALL SELECT * FROM chain))"""


def bucket_pairs_capped(ids: np.ndarray, cap: int = 64) -> tuple[np.ndarray, np.ndarray]:
    """Candidate pairs within one LSH bucket, bounded ~O(B) edges and
    O(cap) PER-DOC degree.

    Buckets up to ``cap`` members emit all pairs; larger ones emit a
    SEGMENTED star + chain: sorted members are cut into segments of
    ``cap``, each segment stars around its minimum, and the sorted-
    adjacent chain links everything (so every true duplicate group
    stays connected for clustering) — 2B edges instead of B^2/2, and
    no single doc exceeds ~cap+2 incident edges.  A single global star
    center (r2) made the payload-attach stage replicate one doc's
    payload O(B) times inside one task; segmenting bounds that fan-out
    at the source."""
    ids = np.sort(np.asarray(ids, dtype=np.int64))
    n = len(ids)
    if n < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if n <= cap:
        a, b = np.triu_indices(n, k=1)
        return ids[a], ids[b]
    seg = np.arange(n) // cap
    centers = ids[seg * cap]  # segment minimum (ids sorted)
    spoke = np.nonzero(np.arange(n) % cap != 0)[0]
    star_a = centers[spoke]
    star_b = ids[spoke]
    chain_a = ids[:-1]
    chain_b = ids[1:]
    a = np.concatenate([star_a, chain_a])
    b = np.concatenate([star_b, chain_b])
    # dedup (star duplicates the within-segment adjacent edge)
    key = np.stack([a, b], axis=1)
    key = np.unique(key, axis=0)
    return key[:, 0], key[:, 1]
