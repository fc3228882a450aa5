"""Temporal operators over the events stream: as-of join,
sessionization, tumbling-window aggregation.

These extend the engine past the reference's spatial query suite into
the time axis its OSM workload implies (``insertOsmByTime``,
``tests/testFramework.h:817-869`` inserts period batches in time
order; the operators here ANSWER time-ordered questions over such a
stream).  Every operator is a Ray-Data-first composition — a combiner
``map_batches`` pass, ONE hash shuffle on the partition key, and a
vectorized per-group kernel — with a DuckDB-exact SQL twin.

Scale shapes (100 TB):

- ``asof_join`` / ``sessionize`` hash-bucket by the BY key (user),
  so the single shuffle moves each event once and every bucket kernel
  is one vectorized numpy pass (no per-user Python).  A bucket must
  fit in a worker's heap: with ``n_buckets ~ total_bytes / 256 MB``
  that holds by construction; a pathological single hot user bounds a
  bucket from below — document/salt upstream if one user exceeds RAM.
- ``window_agg`` pre-aggregates inside each batch (combiner), so the
  shuffle carries (event_type x window) partials — bounded by key
  cardinality, not event count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pkd_tree_ray.hashing import splitmix64

_BUCKET_SEED = 41


def _epoch_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """timestamp[us] column -> int64 epoch microseconds (zero-copy)."""
    return col.cast(pa.int64()).to_numpy()


def _user_bucket(user: np.ndarray, n_buckets: int) -> np.ndarray:
    return (splitmix64(user.astype(np.uint64), _BUCKET_SEED)
            % np.uint64(n_buckets)).astype(np.int64)


# ----------------------------------------------------------------------
# as-of join
# ----------------------------------------------------------------------

def asof_join(
    events,
    left_type: str,
    right_type: str,
    n_buckets: int = 64,
):
    """For each ``left_type`` event, its user's latest ``right_type``
    event at-or-before it (ties: greatest event_id), inner-joined.

    -> Dataset (event_id, user_id, ts_us, match_id, match_ts_us,
    match_value).

    Kernel: within each user-hash bucket, ONE lexsort of both sides by
    (user, ts, side, event_id) with rights ordered before lefts at
    equal ts (<= is inclusive), then a running maximum over right-row
    positions — each left row's match is the latest right row at or
    before it in sort order, valid iff it belongs to the same user.
    O(n log n) per bucket, zero per-user Python.
    """
    def route(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == left_type) | (et == right_type)
        idx = np.nonzero(keep)[0]
        user = t["user_id"].to_numpy()[idx]
        return pa.table(
            {
                "bkt": pa.array(_user_bucket(user, n_buckets)),
                "user_id": pa.array(user),
                "ts_us": pa.array(_epoch_us(t["ts"])[idx]),
                "event_id": pa.array(t["event_id"].to_numpy()[idx]),
                "side": pa.array((et[idx] == left_type).astype(np.int8)),
                "value": pa.array(t["value"].to_numpy(zero_copy_only=False)[idx]),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        ts = t["ts_us"].to_numpy()
        eid = t["event_id"].to_numpy()
        side = t["side"].to_numpy()
        val = t["value"].to_numpy(zero_copy_only=False)
        # rights before lefts at equal (user, ts): '<=' is inclusive;
        # among equal-(user, ts) rights the LAST in sort order is the
        # max event_id, which the running max then picks
        order = np.lexsort((eid, side, ts, u))
        us, tss, eids, sides = u[order], ts[order], eid[order], side[order]
        n = len(order)
        pos_r = np.where(sides == 0, np.arange(n, dtype=np.int64), -1)
        last_r = np.maximum.accumulate(pos_r)
        li = np.nonzero(sides == 1)[0]
        m = last_r[li]
        ok = (m >= 0) & (us[m.clip(min=0)] == us[li])
        li, m = li[ok], m[ok]
        vals = val[order]
        return pa.table(
            {
                "event_id": pa.array(eids[li], pa.int64()),
                "user_id": pa.array(us[li], pa.int64()),
                "ts_us": pa.array(tss[li], pa.int64()),
                "match_id": pa.array(eids[m], pa.int64()),
                "match_ts_us": pa.array(tss[m], pa.int64()),
                "match_value": pa.array(vals[m], pa.float64()),
            }
        )

    return (
        events.select_columns(["event_id", "ts", "user_id", "event_type", "value"])
        .map_batches(route, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(merge, batch_format="pyarrow")
    )


def sql_asof_join(left_type: str, right_type: str) -> str:
    """DuckDB SQL bit-exact vs :func:`asof_join` over ``events``
    (explicit window-rank form rather than ASOF JOIN so the equal-ts
    tie-break — greatest match event_id — is pinned down)."""
    return f"""
WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
           FROM events WHERE event_type = '{left_type}'),
r AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
      FROM events WHERE event_type = '{right_type}'),
j AS (SELECT l.event_id, l.user_id, l.ts_us,
             r.event_id AS match_id, r.ts_us AS match_ts_us,
             r.value AS match_value,
             row_number() OVER (PARTITION BY l.event_id
                                ORDER BY r.ts_us DESC, r.event_id DESC) AS rnk
      FROM l JOIN r ON l.user_id = r.user_id AND r.ts_us <= l.ts_us)
SELECT event_id, user_id, ts_us, match_id, match_ts_us, match_value
FROM j WHERE rnk = 1
"""


# ----------------------------------------------------------------------
# sessionization
# ----------------------------------------------------------------------

def sessionize(events, gap_s: int = 1800, n_buckets: int = 64):
    """Split each user's event stream into sessions at gaps >
    ``gap_s`` seconds -> Dataset (user_id, session_idx, n_events,
    start_us, end_us); ``session_idx`` is 0-based per user in time
    order.

    Kernel per user-hash bucket: one lexsort by (user, ts, event_id),
    vectorized gap/new-user breaks, a cumulative sum rebased at each
    user's first row, then ``np.add.reduceat`` run aggregation —
    zero per-user or per-session Python.
    """
    gap_us = int(gap_s) * 1_000_000

    def route(t: pa.Table) -> pa.Table:
        user = t["user_id"].to_numpy()
        return pa.table(
            {
                "bkt": pa.array(_user_bucket(user, n_buckets)),
                "user_id": pa.array(user),
                "ts_us": pa.array(_epoch_us(t["ts"])),
                "event_id": pa.array(t["event_id"].to_numpy()),
            }
        )

    def sessions(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        ts = t["ts_us"].to_numpy()
        eid = t["event_id"].to_numpy()
        if not len(u):
            z = pa.array([], pa.int64())
            return pa.table(
                {"user_id": z, "session_idx": z, "n_events": z,
                 "start_us": z, "end_us": z}
            )
        order = np.lexsort((eid, ts, u))
        us, tss = u[order], ts[order]
        n = len(order)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = us[1:] != us[:-1]
        brk = np.zeros(n, dtype=np.int64)
        brk[1:] = (~new_user[1:]) & (tss[1:] - tss[:-1] > gap_us)
        cs = np.cumsum(brk)
        user_start = np.nonzero(new_user)[0]
        base = np.repeat(cs[user_start], np.diff(np.append(user_start, n)))
        sess = cs - base  # 0-based within user (brk at a user start is 0)
        run_start = np.nonzero(new_user | (brk == 1))[0]
        counts = np.diff(np.append(run_start, n))
        return pa.table(
            {
                "user_id": pa.array(us[run_start], pa.int64()),
                "session_idx": pa.array(sess[run_start], pa.int64()),
                "n_events": pa.array(counts, pa.int64()),
                "start_us": pa.array(tss[run_start], pa.int64()),
                "end_us": pa.array(tss[run_start + counts - 1], pa.int64()),
            }
        )

    return (
        events.select_columns(["event_id", "ts", "user_id"])
        .map_batches(route, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(sessions, batch_format="pyarrow")
    )


def sql_sessionize(gap_s: int = 1800) -> str:
    """DuckDB SQL bit-exact vs :func:`sessionize` over ``events``."""
    gap_us = int(gap_s) * 1_000_000
    return f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
o AS (SELECT user_id, ts_us, event_id,
             CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                                ORDER BY ts_us, event_id)
                       > {gap_us}
                  THEN 1 ELSE 0 END AS brk
      FROM e),
s AS (SELECT user_id, ts_us,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                            ROWS UNBOUNDED PRECEDING) AS sess
      FROM o)
SELECT user_id, CAST(sess AS BIGINT) AS session_idx, count(*) AS n_events,
       min(ts_us) AS start_us, max(ts_us) AS end_us
FROM s GROUP BY user_id, sess
"""


# ----------------------------------------------------------------------
# tumbling-window aggregate
# ----------------------------------------------------------------------

def window_agg(events, width_s: int = 3600):
    """Per (event_type, tumbling window) count + integerized value sum
    -> Dataset (event_type, win, n_events, sum_vx1000).

    ``sum_vx1000`` sums ``floor(value * 1000)`` as int64 so the
    aggregate is addition-order independent (a float sum would hash
    differently per merge order).  Combiner inside every batch (key
    cardinality partials, not event rows), then one small multi-key
    ``groupby`` shuffle.
    """
    width_us = int(width_s) * 1_000_000

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        win = _epoch_us(t["ts"]) // width_us
        vx = np.floor(t["value"].to_numpy(zero_copy_only=False) * 1000.0).astype(
            np.int64
        )
        et = t["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes = pc.dictionary_encode(et)
        if isinstance(codes, pa.ChunkedArray):
            codes = codes.combine_chunks()
        ci = codes.indices.to_numpy().astype(np.int64)
        nt = len(codes.dictionary)
        key = win * nt + ci
        uk, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
        sums = np.zeros(len(uk), dtype=np.int64)
        np.add.at(sums, inv, vx)
        return pa.table(
            {
                "event_type": codes.dictionary.take(pa.array(uk % nt)),
                "win": pa.array(uk // nt, pa.int64()),
                "n_events": pa.array(cnt.astype(np.int64)),
                "sum_vx1000": pa.array(sums),
            }
        )

    agg = (
        events.select_columns(["ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "win"])
        .sum(["n_events", "sum_vx1000"])
    )
    names = ["event_type", "win", "n_events", "sum_vx1000"]

    def norm(t: pa.Table) -> pa.Table:
        # Ray's streaming aggregate emits empty ZERO-COLUMN blocks at
        # high parallelism; map them to the canonical empty schema
        # instead of crashing the rename (same class as text._norm_term_cnt).
        if t.num_rows == 0 or t.num_columns != len(names):
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "win": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "sum_vx1000": pa.array([], pa.int64()),
                }
            )
        return t.rename_columns(names)

    return agg.map_batches(norm, batch_format="pyarrow")


def sql_window_agg(width_s: int = 3600) -> str:
    """DuckDB SQL bit-exact vs :func:`window_agg` over ``events``."""
    width_us = int(width_s) * 1_000_000
    return f"""
SELECT event_type, epoch_us(ts) // {width_us} AS win,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_vx1000
FROM events GROUP BY event_type, win
"""
