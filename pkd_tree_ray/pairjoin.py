"""Distributed pairwise verification: two repartition joins bring both
endpoints' payloads onto ONE row per pair, then a vectorized
``map_batches`` kernel verifies whole batches of pairs at once.

Shared shape for the near-dup verifiers (MinHash-Jaccard in text.py,
embedding-cosine in ann.py).  r1 fetched every candidate payload to
the driver; r2 joined payloads to pairs distributedly but verified via
``groupby(pair).map_groups`` — one Python call per pair (r2 weak
item).  Here each join is a ``groupby(endpoint)`` whose ``map_groups``
runs once per distinct DOC (not per pair), and verification is a
``map_batches`` over (a, b, payload_a, payload_b) rows — the caller
supplies a batch kernel that vectorizes the comparison across the
whole batch.  The only driver-side state is the candidate id set
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
        return pa.table(
            {
                "jkey": batch[a_col].cast(pa.int64()),
                a_col: batch[a_col].cast(pa.int64()),
                b_col: batch[b_col].cast(pa.int64()),
                "slot": pa.array(np.zeros(n, np.int8)),
                "pl_a": const_lists(n),
            }
        )

    def tag1(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        z = pa.array(np.zeros(n, np.int64))
        return pa.table(
            {
                "jkey": batch[id_col].cast(pa.int64()),
                a_col: z,
                b_col: z,
                "slot": pa.array(np.full(n, -1, np.int8)),
                "pl_a": batch[payload_col].cast(ptype),
            }
        )

    def attach_a(group: pa.Table) -> pa.Table:
        slot = group["slot"].to_numpy()
        own = np.nonzero(slot == -1)[0]
        e = np.nonzero(slot >= 0)[0]
        if not len(own) or not len(e):
            return empty_table(join_schema(False))
        payload = group["pl_a"][int(own[0])].as_py()
        sub = group.take(pa.array(e))
        return pa.table(
            {
                # re-key by b for the second join
                "jkey": sub[b_col],
                a_col: sub[a_col],
                b_col: sub[b_col],
                "slot": pa.array(np.zeros(len(e), np.int8)),
                "pl_a": pa.array([payload] * len(e), ptype),
            }
        )

    # -- stage 2: join on `b` ------------------------------------------
    def tag2(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        z = pa.array(np.zeros(n, np.int64))
        return pa.table(
            {
                "jkey": batch[id_col].cast(pa.int64()),
                a_col: z,
                b_col: z,
                "slot": pa.array(np.full(n, -1, np.int8)),
                "pl_a": const_lists(n),
                "pl_b": batch[payload_col].cast(ptype),
            }
        )

    def widen1(batch: pa.Table) -> pa.Table:
        return batch.append_column("pl_b", const_lists(batch.num_rows))

    def attach_b(group: pa.Table) -> pa.Table:
        slot = group["slot"].to_numpy()
        own = np.nonzero(slot == -1)[0]
        e = np.nonzero(slot >= 0)[0]
        if not len(own) or not len(e):
            return empty_table(join_schema(True))
        payload = group["pl_b"][int(own[0])].as_py()
        sub = group.take(pa.array(e))
        return pa.table(
            {
                "jkey": sub["jkey"],
                a_col: sub[a_col],
                b_col: sub[b_col],
                "slot": sub["slot"],
                "pl_a": sub["pl_a"],
                "pl_b": pa.array([payload] * len(e), ptype),
            }
        )

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

    tagged1 = payload_ds.map_batches(tag1, batch_format="pyarrow")
    edge_ds = cand_ds.map_batches(edges1, batch_format="pyarrow")
    half = (
        tagged1.union(edge_ds)
        .groupby("jkey")
        .map_groups(attach_a, batch_format="pyarrow")
        .map_batches(widen1, batch_format="pyarrow")
    )
    tagged2 = payload_ds.map_batches(tag2, batch_format="pyarrow")
    full = (
        tagged2.union(half)
        .groupby("jkey")
        .map_groups(attach_b, batch_format="pyarrow")
    )
    return full.map_batches(verify_batch, batch_format="pyarrow")


def semi_filter_ids(ds, id_col: str, ids: np.ndarray):
    """Broadcast semi-join: keep rows whose id is in ``ids`` (the id
    set ships once via ray.put; the table streams through a filter)."""
    idref = ray.put(np.asarray(ids))

    def semi(batch: pa.Table) -> pa.Table:
        keep = np.isin(batch[id_col].to_numpy(), ray.get(idref))
        return batch.filter(pa.array(keep))

    return ds.map_batches(semi, batch_format="pyarrow")


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
