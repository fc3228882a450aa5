"""Similarity search over the ``embeddings`` table
(``vec_id:int64, embedding:list<float>, label:int32``).

* :func:`ann_bruteforce` — exact top-k by cosine (or quantized L2)
  against a broadcast query matrix: one numpy matmul per batch, then
  per-batch partial top-k and a driver merge — the baseline.
* :func:`ann_ivf` — IVF-style scale path: k-means-lite centroids from
  a sample (driver), rows bucketed by nearest centroid
  (``groupby(bucket)``), queries probe only the ``nprobe`` nearest
  buckets.  Same two-level shape as the spatial index: small broadcast
  routing state + partitioned data.

The quantized-L2 variant (``floor(v * 1000)`` int64 per component) is
bit-exact reproducible in DuckDB (list_transform + list_zip lambdas),
so it carries the oracle check; cosine is float and gets a rows-only
check.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

QUANT = 1_000


def _emb_matrix(batch: pa.Table) -> np.ndarray:
    """(n, d) float32 matrix from the list<float> column, zero-ish
    copy via the flattened values buffer."""
    col = batch["embedding"].combine_chunks()
    arr = col if isinstance(col, pa.ListArray) else col.chunk(0)
    d = len(arr[0])
    flat = np.asarray(arr.values, dtype=np.float32)
    return flat.reshape(len(arr), d)


def _quantize(m: np.ndarray) -> np.ndarray:
    return np.floor(m.astype(np.float64) * QUANT).astype(np.int64)


def ann_bruteforce(
    embeddings,
    query_vecs: np.ndarray,
    k: int,
    metric: str = "l2q",
):
    """Exact top-k neighbors of each query vector.

    -> pa.Table (qid, rank, neighbor, score) where score is int64
    quantized squared L2 (``metric='l2q'``) or negated scaled cosine.
    Per batch: matmul against the broadcast query matrix -> partial
    top-k rows; final merge on the driver (m x k is small).
    """
    qref = ray.put(np.asarray(query_vecs))

    def partial(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)
        pm = _emb_matrix(batch)
        vid = batch["vec_id"].to_numpy()
        if metric == "l2q":
            qq = _quantize(q)
            pq = _quantize(pm)
            # |a-b|^2 = |a|^2 - 2ab + |b|^2 — matmul form, exact in int64
            cross = qq @ pq.T
            score = (
                (qq * qq).sum(axis=1)[:, None]
                - 2 * cross
                + (pq * pq).sum(axis=1)[None, :]
            )
        else:  # cosine distance scaled; float path (rows-only check)
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            pn = pm / np.linalg.norm(pm, axis=1, keepdims=True)
            score = -(qn @ pn.T)
        kk = min(k, score.shape[1])
        part = np.argpartition(score, kk - 1, axis=1)[:, :kk]
        m = score.shape[0]
        return pa.table(
            {
                "qid": np.repeat(np.arange(m, dtype=np.int64), kk),
                "neighbor": vid[part.ravel()],
                "score": np.take_along_axis(score, part, axis=1).ravel()
                if metric == "l2q"
                else np.take_along_axis(score, part, axis=1).ravel(),
            }
        )

    pdf = embeddings.map_batches(partial, batch_format="pyarrow").to_pandas()
    qid = pdf["qid"].to_numpy()
    nb = pdf["neighbor"].to_numpy()
    sc = pdf["score"].to_numpy()
    order = np.lexsort((nb, sc, qid))
    qs = qid[order]
    uq, starts, cnts = np.unique(qs, return_index=True, return_counts=True)
    ranks = np.arange(len(qs), dtype=np.int64) - np.repeat(starts, cnts)
    keep = ranks < k
    rows = order[keep]
    out = pa.table(
        {
            "qid": pa.array(qid[rows], pa.int64()),
            "rank": pa.array(ranks[keep] + 1, pa.int64()),
            "neighbor": pa.array(nb[rows], pa.int64()),
            "score": pa.array(sc[rows]),
        }
    )
    return out


def embedding_neardup(
    embeddings,
    threshold: float = 0.9,
    bits: int = 12,
    bands: int = 4,
    seed: int = 42,
) -> pa.Table:
    """Near-duplicate pairs by embedding cosine >= threshold.

    Scale shape mirrors MinHash-LSH (text.py): random-hyperplane
    signatures (``bands`` bands of ``bits`` sign bits each, planes
    broadcast once) -> ``groupby(band, key)`` bucket shuffle of (id,
    key) pairs only -> within-bucket candidate pairs -> exact cosine
    verification over a broadcast semi-join fetch of just the candidate
    vectors.  Recall < 1 by LSH design; precision exact.
    -> (vec_a, vec_b, cos_permille)
    """
    import pandas as pd

    rng = np.random.RandomState(seed)
    first = embeddings.limit(1).to_pandas()
    d = len(first["embedding"][0])
    planes = rng.standard_normal((bands * bits, d)).astype(np.float32)
    pref = ray.put(planes)
    pow2 = (1 << np.arange(bits, dtype=np.int64))

    def signatures(batch: pa.Table) -> pa.Table:
        pl = ray.get(pref)
        m = _emb_matrix(batch)
        signs = (m @ pl.T) >= 0  # (n, bands*bits)
        out_band, out_key, out_id = [], [], []
        vid = batch["vec_id"].to_numpy()
        for b in range(bands):
            block = signs[:, b * bits: (b + 1) * bits]
            key = (block * pow2[None, :]).sum(axis=1)
            out_band.append(np.full(len(vid), b, dtype=np.int64))
            out_key.append(key)
            out_id.append(vid)
        return pa.table(
            {
                "band": np.concatenate(out_band),
                "key": np.concatenate(out_key),
                "vec_id": np.concatenate(out_id),
            }
        )

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(group["vec_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": []}, dtype=np.int64)
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"vec_a": ids[a], "vec_b": ids[b]})

    from ray.data.aggregate import Count

    cand = (
        embeddings.select_columns(["vec_id", "embedding"])
        .map_batches(signatures, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(pairs, batch_format="pandas")
        .groupby(["vec_a", "vec_b"])
        .aggregate(Count(alias_name="nb"))
        .select_columns(["vec_a", "vec_b"])
        .to_pandas()
    )
    if not len(cand):
        return pa.table(
            {
                "vec_a": pa.array([], pa.int64()),
                "vec_b": pa.array([], pa.int64()),
                "cos_permille": pa.array([], pa.int64()),
            }
        )
    # exact verification: broadcast semi-join fetch of candidate vectors
    cand_ids = np.unique(
        np.concatenate([cand["vec_a"].to_numpy(), cand["vec_b"].to_numpy()])
    )
    idref = ray.put(cand_ids)

    def semi(batch: pa.Table) -> pa.Table:
        ids = ray.get(idref)
        keep = np.isin(batch["vec_id"].to_numpy(), ids)
        return batch.filter(pa.array(keep))

    fetched = (
        embeddings.select_columns(["vec_id", "embedding"])
        .map_batches(semi, batch_format="pyarrow")
        .to_pandas()
    )
    vecs = {
        int(i): np.asarray(v, dtype=np.float64)
        for i, v in zip(fetched["vec_id"], fetched["embedding"])
    }
    out_a, out_b, out_c = [], [], []
    for a, b in zip(cand["vec_a"], cand["vec_b"]):
        va, vb = vecs[int(a)], vecs[int(b)]
        cos = float(va @ vb / max(np.linalg.norm(va) * np.linalg.norm(vb), 1e-30))
        if cos >= threshold:
            out_a.append(int(a))
            out_b.append(int(b))
            out_c.append(int(cos * 1000))
    return pa.table(
        {
            "vec_a": pa.array(out_a, pa.int64()),
            "vec_b": pa.array(out_b, pa.int64()),
            "cos_permille": pa.array(out_c, pa.int64()),
        }
    )


def ann_ivf(
    embeddings,
    query_vecs: np.ndarray,
    k: int,
    n_lists: int = 16,
    nprobe: int = 4,
    sample_rows: int = 2_048,
    seed: int = 42,
):
    """IVF approximate top-k: centroids from a deterministic sample
    (a few Lloyd iterations on the driver), rows assigned to nearest
    centroid inside ``map_batches``, each query scans its ``nprobe``
    nearest lists.  Recall < 1 by design; tested against the
    brute-force baseline for recall, not equality.

    -> pa.Table (qid, rank, neighbor, score)  [score = quantized L2]
    """
    sample = embeddings.limit(sample_rows).to_pandas()
    sm = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    rng = np.random.RandomState(seed)
    cent = sm[rng.choice(len(sm), size=min(n_lists, len(sm)), replace=False)]
    for _ in range(5):  # Lloyd-lite
        d = ((sm[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        a = d.argmin(axis=1)
        for c in range(len(cent)):
            members = sm[a == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    cref = ray.put(cent)
    q = np.asarray(query_vecs, dtype=np.float64)
    qd = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    probes = np.argsort(qd, axis=1)[:, :nprobe]  # (m, nprobe)
    # per-list query sets
    lists: dict[int, np.ndarray] = {
        int(c): np.nonzero((probes == c).any(axis=1))[0] for c in range(len(cent))
    }
    lref = ray.put(lists)
    qref = ray.put(q)

    def partial(batch: pa.Table) -> pa.Table:
        cent_ = ray.get(cref)
        lists_ = ray.get(lref)
        qv = ray.get(qref)
        pm = _emb_matrix(batch).astype(np.float64)
        vid = batch["vec_id"].to_numpy()
        d = ((pm[:, None, :] - cent_[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(axis=1)
        out_q, out_n, out_s = [], [], []
        for c in np.unique(assign):
            qs = lists_.get(int(c), np.empty(0, np.int64))
            if not len(qs):
                continue
            rows = np.nonzero(assign == c)[0]
            pq = _quantize(pm[rows])
            qq = _quantize(qv[qs])
            score = (
                (qq * qq).sum(axis=1)[:, None]
                - 2 * (qq @ pq.T)
                + (pq * pq).sum(axis=1)[None, :]
            )
            kk = min(k, score.shape[1])
            part = np.argpartition(score, kk - 1, axis=1)[:, :kk]
            out_q.append(np.repeat(qs, kk))
            out_n.append(vid[rows[part.ravel()]])
            out_s.append(np.take_along_axis(score, part, axis=1).ravel())
        if not out_q:
            return pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "neighbor": pa.array([], pa.int64()),
                    "score": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "qid": np.concatenate(out_q),
                "neighbor": np.concatenate(out_n),
                "score": np.concatenate(out_s),
            }
        )

    pdf = embeddings.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(pdf):
        return pa.table(
            {
                "qid": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "neighbor": pa.array([], pa.int64()),
                "score": pa.array([], pa.int64()),
            }
        )
    qid = pdf["qid"].to_numpy()
    nb = pdf["neighbor"].to_numpy()
    sc = pdf["score"].to_numpy()
    order = np.lexsort((nb, sc, qid))
    qs = qid[order]
    uq, starts, cnts = np.unique(qs, return_index=True, return_counts=True)
    ranks = np.arange(len(qs), dtype=np.int64) - np.repeat(starts, cnts)
    keep = ranks < k
    rows = order[keep]
    return pa.table(
        {
            "qid": pa.array(qid[rows], pa.int64()),
            "rank": pa.array(ranks[keep] + 1, pa.int64()),
            "neighbor": pa.array(nb[rows], pa.int64()),
            "score": pa.array(sc[rows], pa.int64()),
        }
    )
