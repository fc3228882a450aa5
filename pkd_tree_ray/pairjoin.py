"""Distributed pairwise verification: (pairs x payload) join via
groupby, verification inside ``map_groups``.

Shared shape for the near-dup verifiers (MinHash-Jaccard in text.py,
embedding-cosine in ann.py).  Previously both fetched every candidate
payload to the driver and verified pairs in a Python loop (r1 weak
items); here the payloads and pair edges meet in a ``groupby(id)``
(the distributed join), then a ``groupby(pair)`` runs the verify
kernel where the two payloads co-locate.  The only driver-side state
is the candidate id set (ints), used for the broadcast semi-filter of
the payload table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


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
):
    """-> Dataset (a_col, b_col, out_col:int64).

    ``payload_ds``: (id_col, payload_col:list<...>) — payload rows for
    AT LEAST the candidate ids (pre-filtering is the caller's choice);
    ``cand_ds``: (a_col, b_col) candidate pairs (a < b, distinct);
    ``verify_fn(payload_a: np.ndarray, payload_b: np.ndarray) ->
    int | None`` — None drops the pair, an int becomes ``out_col``.
    """

    def empty_attached() -> pa.Table:
        return pa.table(
            {
                a_col: pa.array([], pa.int64()),
                b_col: pa.array([], pa.int64()),
                "slot": pa.array([], pa.int8()),
                payload_col: pa.array([], pa.list_(payload_type)),
            }
        )

    def edges(batch: pa.Table) -> pa.Table:
        a = batch[a_col].to_numpy()
        b = batch[b_col].to_numpy()
        return pa.table(
            {
                id_col: pa.array(np.concatenate([a, b])),
                "other": pa.array(np.concatenate([b, a])),
                "slot": pa.array(
                    np.concatenate([np.zeros(len(a), np.int8), np.ones(len(b), np.int8)])
                ),
                payload_col: pa.array([[]] * (2 * len(a)), pa.list_(payload_type)),
            }
        )

    def tag_payload(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                id_col: batch[id_col],
                "other": pa.array(np.zeros(n, np.int64)),
                "slot": pa.array(np.full(n, -1, np.int8)),
                payload_col: batch[payload_col].cast(pa.list_(payload_type)),
            }
        )

    def attach(group: pa.Table) -> pa.Table:
        slot = group["slot"].to_numpy()
        own = np.nonzero(slot == -1)[0]
        e = np.nonzero(slot >= 0)[0]
        if not len(own) or not len(e):
            return empty_attached()
        payload = group[payload_col][int(own[0])].as_py()
        sub = group.take(pa.array(e))
        me = sub[id_col].to_numpy()
        other = sub["other"].to_numpy()
        eslot = sub["slot"].to_numpy()
        return pa.table(
            {
                a_col: pa.array(np.where(eslot == 0, me, other)),
                b_col: pa.array(np.where(eslot == 0, other, me)),
                "slot": sub["slot"],
                payload_col: pa.array([payload] * len(e), pa.list_(payload_type)),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        out_empty = pa.table(
            {
                a_col: pa.array([], pa.int64()),
                b_col: pa.array([], pa.int64()),
                out_col: pa.array([], pa.int64()),
            }
        )
        if group.num_rows != 2:  # an endpoint was missing from payload_ds
            return out_empty
        slot = group["slot"].to_numpy()
        ia = int(np.nonzero(slot == 0)[0][0]) if (slot == 0).any() else 0
        ib = 1 - ia
        pa_ = np.asarray(group[payload_col][ia].as_py())
        pb_ = np.asarray(group[payload_col][ib].as_py())
        v = verify_fn(pa_, pb_)
        if v is None:
            return out_empty
        return pa.table(
            {
                a_col: group[a_col].slice(0, 1),
                b_col: group[b_col].slice(0, 1),
                out_col: pa.array([int(v)], pa.int64()),
            }
        )

    tagged = payload_ds.map_batches(tag_payload, batch_format="pyarrow")
    edge_ds = cand_ds.map_batches(edges, batch_format="pyarrow")
    attached = tagged.union(edge_ds).groupby(id_col).map_groups(
        attach, batch_format="pyarrow"
    )
    return attached.groupby([a_col, b_col]).map_groups(verify, batch_format="pyarrow")


def semi_filter_ids(ds, id_col: str, ids: np.ndarray):
    """Broadcast semi-join: keep rows whose id is in ``ids`` (the id
    set ships once via ray.put; the table streams through a filter)."""
    idref = ray.put(np.asarray(ids))

    def semi(batch: pa.Table) -> pa.Table:
        keep = np.isin(batch[id_col].to_numpy(), ray.get(idref))
        return batch.filter(pa.array(keep))

    return ds.map_batches(semi, batch_format="pyarrow")


def bucket_pairs_capped(ids: np.ndarray, cap: int = 64) -> tuple[np.ndarray, np.ndarray]:
    """Candidate pairs within one LSH bucket, bounded ~O(B).

    Buckets up to ``cap`` members emit all pairs; larger ones emit
    star (min-id to every member) + chain (sorted-adjacent) pairs —
    2B instead of B^2/2 — keeping every true duplicate group connected
    for clustering while bounding the skew-bucket task (a duplicate-
    heavy corpus otherwise makes one bucket quadratic; r1 weak item).
    """
    ids = np.sort(np.asarray(ids, dtype=np.int64))
    n = len(ids)
    if n < 2:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if n <= cap:
        a, b = np.triu_indices(n, k=1)
        return ids[a], ids[b]
    star_a = np.full(n - 1, ids[0], dtype=np.int64)
    star_b = ids[1:]
    chain_a = ids[1:-1]
    chain_b = ids[2:]
    return np.concatenate([star_a, chain_a]), np.concatenate([star_b, chain_b])
