"""Distributed connected components over a near-dup pair graph —
the pair -> cluster resolution step of deduplication (keep one doc
per duplicate cluster).

Design: **tree contraction**.

1. **Block-local contraction** (``map_batches``): each edge block is
   collapsed in memory with a vectorized min-label + pointer-jumping
   kernel (:func:`_local_labels` — O(E·log V) numpy, no Python per
   edge), emitting one *star edge* (node -> block-local root) per
   non-root node.  Chains that fit in a block — the common case for
   the sorted-adjacent pair runs ``pairjoin.bucket_pairs_capped``
   emits — vanish here, before anything leaves the block.
2. **K-ary merge reduction** (raw Ray tasks — the one shape the
   Dataset API can't express: an iterative fixpoint): star tables
   merge ``_FAN_IN`` at a time, re-contracting at every step, until
   one star table remains.  log_K(P) rounds, each task reads its
   inputs zero-copy from the object store.  The star count shrinks
   monotonically (one edge per distinct endpoint of the subtree), so
   intermediate state is bounded by the final result.

Only pair *endpoints* ever enter the reduction; the (typically
enormous) singleton remainder of the corpus joins once at the end
via a single default-self hash-shuffle attach in
:func:`dedup_clusters`.

Scale bound, stated honestly: the root merge holds one (node, root)
int64 pair per distinct pair-endpoint — 16 B/endpoint, i.e. ~16 GB
at 10^9 near-dup endpoints, the worst case for a single task. Below
that it's the cheapest exact shape (no per-round all-to-all); past
it, swap stage 2 for a bucketed BSP pointer-jumping loop — stage 1
and the API don't change.

Reference analog: none (the reference's dedup story stops at pair
emission); this closes the loop near-dup pairs -> duplicate clusters
-> canonical keep set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pkd_tree_ray.pairjoin import _MIX_M1, _MIX_M2

#: merge fan-in for the reduction tree (wider = fewer rounds, larger
#: per-task concat; 8 keeps a 4096-block corpus at 4 rounds)
_FAN_IN = 8

#: target rows per hash bucket in the final singleton attach
_ROWS_PER_BUCKET = 131072
_MAX_BUCKETS = 1024


def _int_table(**cols) -> pa.Table:
    return pa.table({k: pa.array(v, pa.int64()) for k, v in cols.items()})


def _mix_bucket(jkey: np.ndarray, n_buckets: int) -> np.ndarray:
    """splitmix64-mixed bucket id (ids are often sequential; a plain
    modulus would stripe)."""
    z = jkey.astype(np.uint64, copy=True)
    z ^= z >> np.uint64(30)
    z *= _MIX_M1
    z ^= z >> np.uint64(27)
    z *= _MIX_M2
    z ^= z >> np.uint64(31)
    return (z & np.uint64(n_buckets - 1)).astype(np.int64)


def _n_buckets_for(n_rows: int) -> int:
    nb = 1
    while nb < _MAX_BUCKETS and nb * _ROWS_PER_BUCKET < n_rows:
        nb *= 2
    return nb


def _local_labels(key: np.ndarray, other: np.ndarray):
    """In-memory connected components over one edge block: min-label
    propagation + pointer jumping, fully vectorized.  ``key``/``other``
    must already contain both directions of every edge.  Returns
    (nodes, roots): for each distinct endpoint, the min node id
    reachable within this block."""
    nodes, inv = np.unique(np.concatenate([key, other]), return_inverse=True)
    ki, oi = inv[: len(key)], inv[len(key) :]
    lab = np.arange(len(nodes))
    while True:
        cand = lab.copy()
        np.minimum.at(cand, oi, lab[ki])
        # shortcut until stable (labels are indices into `nodes`;
        # cand[i] <= i throughout, so this is monotone decreasing)
        while True:
            nxt = cand[cand]
            if np.array_equal(nxt, cand):
                break
            cand = nxt
        if np.array_equal(cand, lab):
            break
        lab = cand
    return nodes, nodes[lab]


def _contract_stars(node: np.ndarray, root: np.ndarray) -> pa.Table:
    """Star edges (node -> root, node != root) from undirected edges
    given as (node, root) int64 arrays (single direction)."""
    nodes, roots = _local_labels(
        np.concatenate([node, root]), np.concatenate([root, node])
    )
    star = nodes != roots
    return _int_table(node=nodes[star], root=roots[star])


def _merge_stars_task(*tables: pa.Table) -> pa.Table:
    # zero-row blocks can carry an empty schema (Ray Data emits them
    # when a map task produced nothing) — drop before concat
    live = [t for t in tables if t.num_columns]
    if not live:
        return _int_table(node=[], root=[])
    t = pa.concat_tables(live)
    return _contract_stars(
        t["node"].to_numpy().astype(np.int64),
        t["root"].to_numpy().astype(np.int64),
    )


def connected_components(pairs, a_col: str = "doc_a", b_col: str = "doc_b"):
    """-> Dataset (node, lab): lab = min node id reachable from
    ``node`` in the undirected pair graph.  Covers pair *endpoints*
    only — isolated nodes never enter the reduction (attach them
    afterwards with a default-self join, as :func:`dedup_clusters`
    does)."""
    import ray
    import ray.data as rd

    def contract(t: pa.Table) -> pa.Table:
        a = t[a_col].to_numpy().astype(np.int64)
        b = t[b_col].to_numpy().astype(np.int64)
        ns = a != b  # self-pairs carry no structure
        return _contract_stars(a[ns], b[ns])

    edges = pairs.map_batches(contract, batch_format="pyarrow").materialize()
    refs = [
        r
        for bundle in edges.iter_internal_ref_bundles()
        for r in bundle.block_refs
    ]
    merge = ray.remote(num_returns=1)(_merge_stars_task)
    while len(refs) > 1:
        refs = [
            merge.remote(*refs[i : i + _FAN_IN])
            for i in range(0, len(refs), _FAN_IN)
        ]
    if not refs:
        return rd.from_arrow(_int_table(node=[], lab=[]))

    def to_labels(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy()
        root = t["root"].to_numpy()
        self_roots = np.unique(root)  # roots label themselves
        return _int_table(
            node=np.concatenate([node, self_roots]),
            lab=np.concatenate([root, self_roots]),
        )

    return rd.from_arrow_refs(refs).map_batches(
        to_labels, batch_format="pyarrow"
    )


def _attach_label(
    left,
    labels,
    key_col: str,
    carry: list[str],
    out_col: str,
    n_buckets: int,
    default_self: bool = False,
):
    """-> Dataset (carry..., out_col): each left row gains
    ``out_col = lab(key_col)`` via one bucket-hash shuffle with a
    run-segmented numpy kernel per bucket.  ``left`` rows are
    all-int64; ``labels`` is (node, lab) with one row per node.  Left
    rows whose key has no label row are dropped unless
    ``default_self`` (then they get ``lab = key``)."""
    lcols = [c for c in carry if c != key_col] + [key_col]

    def tag_left(t: pa.Table) -> pa.Table:
        jk = t[key_col].to_numpy().astype(np.int64)
        out = {
            "_jbkt": pa.array(_mix_bucket(jk, n_buckets)),
            "_jkey": pa.array(jk),
            "_role": pa.array(np.zeros(len(jk), np.int8)),
            "_lab": pa.array(np.zeros(len(jk), np.int64)),
        }
        for c in lcols:
            out[c] = t[c].cast(pa.int64())
        return pa.table(out)

    def tag_owner(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy().astype(np.int64)
        out = {
            "_jbkt": pa.array(_mix_bucket(node, n_buckets)),
            "_jkey": pa.array(node),
            "_role": pa.array(np.full(len(node), -1, np.int8)),
            "_lab": t["lab"].cast(pa.int64()),
        }
        z = pa.array(np.zeros(len(node), np.int64))
        for c in lcols:
            out[c] = z
        return pa.table(out)

    def attach(group: pa.Table) -> pa.Table:
        jk = group["_jkey"].to_numpy()
        role = group["_role"].to_numpy()
        order = np.lexsort((role, jk))  # owner (-1) heads its run
        jk_s, role_s = jk[order], role[order]
        new_run = np.concatenate([[True], jk_s[1:] != jk_s[:-1]])
        starts = np.flatnonzero(new_run)
        run_id = np.cumsum(new_run) - 1
        owner_ok = role_s[starts] == -1
        head_lab = group["_lab"].to_numpy()[order][starts]
        if default_self:
            keep = role_s >= 0
            lab = np.where(owner_ok[run_id], head_lab[run_id], jk_s)[keep]
        else:
            keep = (role_s >= 0) & owner_ok[run_id]
            lab = head_lab[run_id[keep]]
        sel = pa.array(order[keep])
        out = {c: group[c].take(sel) for c in carry}
        out[out_col] = pa.array(lab, pa.int64())
        return pa.table(out)

    tagged = labels.map_batches(tag_owner, batch_format="pyarrow").union(
        left.map_batches(tag_left, batch_format="pyarrow")
    )
    return tagged.groupby("_jbkt").map_groups(attach, batch_format="pyarrow")


def dedup_clusters(docs, pairs, id_col: str = "doc_id"):
    """-> Dataset (doc_id, component, keep): duplicate-cluster
    assignment for EVERY document (singletons keep themselves);
    ``keep=1`` marks the canonical (minimum-id) member — the rows a
    dedup pass retains.  Only pair endpoints pay the reduction cost;
    the singleton bulk of the corpus joins in one default-self
    attach."""
    lab = connected_components(pairs)
    ids = docs.map_batches(
        lambda t: _int_table(id=t[id_col].to_numpy().astype(np.int64)),
        batch_format="pyarrow",
    )
    nb = _n_buckets_for(docs.count())
    assigned = _attach_label(
        ids, lab, "id", ["id"], "component", nb, default_self=True
    )

    def finish(t: pa.Table) -> pa.Table:
        node = t["id"].to_numpy()
        comp = t["component"].to_numpy()
        return _int_table(
            doc_id=node, component=comp, keep=(node == comp).astype(np.int64)
        )

    return assigned.map_batches(finish, batch_format="pyarrow")


def sql_dedup_clusters(pairs_sql: str, table: str = "documents") -> str:
    """DuckDB recursive-CTE oracle bit-exact vs :func:`dedup_clusters`
    over the pair set produced by ``pairs_sql`` (any query yielding
    doc_a, doc_b)."""
    return f"""
WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM ({pairs_sql}) q),
e AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs),
cc AS (
  SELECT doc_id AS node, doc_id AS lab FROM {table}
  UNION
  SELECT e.dst AS node, cc.lab FROM cc JOIN e ON cc.node = e.src
)
SELECT node AS doc_id, min(lab) AS component,
       CAST(node = min(lab) AS BIGINT) AS keep
FROM cc GROUP BY node
"""
