"""K-means clustering over an embedding column — the curation
clustering pass (domain balancing, dedup-by-cluster, stratified
eval-set carving) of a training-data pipeline.

Ray-Data shape: centroids broadcast via ``ray.put``; each batch
assigns vectorized (one int64 matmul) and emits PER-CLUSTER partial
sums (k x (d+1) numbers per batch, independent of batch size); the
driver folds the tiny partials and re-broadcasts.  No shuffle at any
point — the only all-to-all-free reduction is the k x d fold, exactly
the combiner-before-shuffle discipline every aggregate here follows.

Determinism: init centroids are the k rows with the smallest
``(splitmix64(vec_id, seed), vec_id)`` (the
:mod:`~pkd_tree_ray.sampling` rank), assignment distances are computed
on ``floor(v * 1000)`` int64-quantized vectors (exact; ties break to
the lowest cluster id), and iteration sums of quantized components
stay below 2**53 so the float64 fold is exact at any corpus size.
:func:`kmeans_assign` (one assignment to the init centroids) is
bit-reproducible in DuckDB — the oracle gate for the whole kernel
chain; the iterative :func:`kmeans` is property-tested (monotone
inertia, partitioning invariance).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from pkd_tree_ray.hashing import splitmix64

QUANT = 1000  # must match ann.QUANT — shared quantization grid


def _emb_quant(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    from pkd_tree_ray.ann import _emb_matrix

    m = _emb_matrix(batch)
    return batch["vec_id"].to_numpy().astype(np.int64), np.floor(
        m.astype(np.float64) * QUANT
    ).astype(np.int64)


def seeded_init(embeddings, k: int, seed: int) -> np.ndarray:
    """(k, d) int64 init centroids: the quantized vectors of the k
    rows with the smallest ``(splitmix64(vec_id, seed), vec_id)``.
    Each batch pre-prunes to its local k, so the driver folds at most
    ``k x n_blocks`` candidate rows."""

    def prune(batch: pa.Table) -> pa.Table:
        ids, q = _emb_quant(batch)
        hv = splitmix64(ids.view(np.uint64), seed).view(np.int64)
        sel = np.lexsort((ids, hv))[:k]
        return pa.table(
            {
                "vec_id": pa.array(ids[sel]),
                "hv": pa.array(hv[sel]),
                "qv": pa.array(list(q[sel]), pa.list_(pa.int64())),
            }
        )

    cand = embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        prune, batch_format="pyarrow"
    ).to_pandas()
    cand = cand.sort_values(["hv", "vec_id"]).head(k)
    return np.stack([np.asarray(v, dtype=np.int64) for v in cand["qv"]])


def kcenter_init(embeddings, k: int, seed: int, n_cand: int = 256) -> np.ndarray:
    """(k, d) float64 init centroids: greedy farthest-point (k-center)
    over a hash-ranked candidate sample — deterministic, robust to the
    two-seeds-in-one-cluster failure mode of plain seeded sampling.
    One pass for the sample (per-batch prune), then O(k * n_cand)
    driver work on the tiny candidate set."""
    cand = seeded_init(embeddings, max(k, n_cand), seed).astype(np.float64)
    chosen = [0]  # the smallest-hash candidate
    d2 = ((cand - cand[0]) ** 2).sum(axis=1)
    while len(chosen) < min(k, len(cand)):
        nxt = int(np.argmax(d2))  # ties -> lowest index: deterministic
        chosen.append(nxt)
        d2 = np.minimum(d2, ((cand - cand[nxt]) ** 2).sum(axis=1))
    return cand[chosen]


def _assign_to(q: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """argmin_j |q - cent_j|^2, ties to the lowest j.  Both int64
    (exact) or q int64 x cent float64 (deterministic float path for
    post-init iterations)."""
    # |q|^2 constant per row — argmin over (-2 q.c + |c|^2) suffices
    cross = q @ cent.T
    cc = np.einsum("ij,ij->i", cent, cent)
    return np.argmin(cc[None, :] - 2 * cross, axis=1)


def kmeans_assign(embeddings, k: int = 8, seed: int = 11):
    """-> Dataset (vec_id, cluster): exact assignment of every vector
    to its nearest seeded-init centroid (one Lloyd half-step) — the
    oracle-checkable kernel of :func:`kmeans`."""
    cref = ray.put(seeded_init(embeddings, k, seed))

    def assign(batch: pa.Table) -> pa.Table:
        ids, q = _emb_quant(batch)
        a = _assign_to(q, ray.get(cref))
        return pa.table(
            {"vec_id": pa.array(ids), "cluster": pa.array(a.astype(np.int64))}
        )

    return embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        assign, batch_format="pyarrow"
    )


def kmeans(
    embeddings, k: int = 8, iters: int = 5, seed: int = 11, init: str = "kcenter"
):
    """Lloyd's k-means.  Returns ``(assignments, centroids, counts)``
    where assignments is a Dataset (vec_id, cluster), centroids a
    (k, d) float64 array on the QUANT grid, counts (k,) int64.

    ``init``: 'kcenter' (default — greedy farthest-point over a
    hash-ranked sample) or 'hash' (the plain seeded sample
    :func:`kmeans_assign` oracles).

    Each iteration is one streaming pass: assign + per-cluster partial
    sums inside ``map_batches``; the k x (d+1) partials fold on the
    driver (exact in float64 — quantized sums stay < 2**53)."""
    emb = embeddings.select_columns(["vec_id", "embedding"]).materialize()
    if init == "kcenter":
        cent = kcenter_init(emb, k, seed)
    else:
        cent = seeded_init(emb, k, seed).astype(np.float64)

    for _ in range(iters):
        cref = ray.put(cent)

        def partials(batch: pa.Table) -> pa.Table:
            _, q = _emb_quant(batch)
            a = _assign_to(q, ray.get(cref))
            sums = np.zeros((k, q.shape[1]), dtype=np.float64)
            np.add.at(sums, a, q.astype(np.float64))
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k, dtype=np.int64)),
                    "n": pa.array(cnt),
                    "s": pa.array(list(sums), pa.list_(pa.float64())),
                }
            )

        pdf = emb.map_batches(partials, batch_format="pyarrow").to_pandas()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros_like(cent)
        for c, n, s in zip(pdf["cluster"], pdf["n"], pdf["s"]):
            counts[c] += int(n)
            sums[c] += np.asarray(s, dtype=np.float64)
        nz = counts > 0
        cent = np.where(nz[:, None], sums / np.maximum(counts, 1)[:, None], cent)

    final = kmeans_assign_to(emb, cent)
    return final, cent, counts


def kmeans_assign_to(embeddings, centroids: np.ndarray):
    """-> Dataset (vec_id, cluster): assignment to a fixed centroid
    matrix (broadcast once)."""
    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        ids, q = _emb_quant(batch)
        a = _assign_to(q.astype(np.float64), ray.get(cref))
        return pa.table(
            {"vec_id": pa.array(ids), "cluster": pa.array(a.astype(np.int64))}
        )

    return embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        assign, batch_format="pyarrow"
    )


def sql_kmeans_assign(k: int = 8, seed: int = 11, table: str = "embeddings") -> str:
    """DuckDB SQL bit-exact vs :func:`kmeans_assign`: same seeded-init
    rank, same quantization, same integer distances, same tie-break."""
    from pkd_tree_ray.hashing import sql_splitmix64, sql_u64_to_i64

    hv = sql_u64_to_i64(sql_splitmix64("vec_id", seed))
    return f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS qv
  FROM {table}),
r AS (SELECT vec_id, qv,
             row_number() OVER (ORDER BY {hv}, vec_id) AS rk
      FROM e),
c AS (SELECT rk - 1 AS cid, qv AS cv FROM r WHERE rk <= {int(k)}),
d AS (
  SELECT e.vec_id, c.cid,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY CAST(list_dot_product(c.cv::DOUBLE[], c.cv::DOUBLE[])
                    - 2 * list_dot_product(e.qv::DOUBLE[], c.cv::DOUBLE[])
                    AS BIGINT),
                    c.cid
         ) AS rnk
  FROM e CROSS JOIN c)
SELECT vec_id, cid AS cluster FROM d WHERE rnk = 1
ORDER BY vec_id
"""


# ----------------------------------------------------------------------
# SemDeDup — semantic dedup with clustering as the blocking stage
# ----------------------------------------------------------------------


def semdedup(embeddings, k: int = 8, seed: int = 11, threshold: float = 0.95):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embeddings, then within each cluster drop every vector that has a
    LOWER-id cluster-mate with cosine >= ``threshold`` (first-wins,
    witness-based: a dropped witness still disqualifies later
    look-alikes, so the kept set is exactly the vectors with no
    earlier near-twin).  -> Dataset (vec_id, cluster, keep).

    Scale shape: clustering IS the blocking strategy — pairwise work
    is confined to clusters, so ``k`` must be sized to the corpus
    (clusters of ~10^4 keep the per-group matmul in-memory; the paper
    runs k=50k over LAION).  One streaming assign pass (centroids
    broadcast), ONE groupby(cluster) exchange carrying (cluster, id,
    qv), one vectorized Python call per cluster.

    Exactness: quantized int64 vectors; the cosine test compares
    dot^2 * 10^6 against thr_pm^2 * |a|^2 * |b|^2 — float64 prefilter
    with arbitrary-precision (object dtype) re-check inside a relative
    1e-9 boundary band, so the decision is integer-exact at any
    magnitude and :func:`sql_semdedup` reproduces it bit-for-bit."""
    cref = ray.put(seeded_init(embeddings, k, seed))
    thr_pm2 = round(threshold * QUANT) ** 2

    def assign_rows(batch: pa.Table) -> pa.Table:
        ids, q = _emb_quant(batch)
        a = _assign_to(q, ray.get(cref))
        return pa.table(
            {
                "cluster": pa.array(a.astype(np.int64)),
                "vec_id": pa.array(ids),
                "qv": pa.array(list(q), pa.list_(pa.int64())),
            }
        )

    rows = embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        assign_rows, batch_format="pyarrow"
    )

    def cluster_dedup(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        Q = np.stack(
            [np.asarray(v, dtype=np.int64) for v in group["qv"].to_pylist()]
        )[order]
        n = len(ids)
        cl = group["cluster"][0].as_py()
        nn = np.einsum("ij,ij->i", Q, Q)
        dropped = np.zeros(n, dtype=bool)
        # i-row chunks keep the gram slab (chunk x n) bounded — never
        # materialize the full n x n matrix or n^2/2 index arrays
        CH = 2048
        for c0 in range(1, n, CH):
            c1 = min(c0 + CH, n)
            Gc = Q[c0:c1] @ Q.T  # (c1-c0, n) int64, exact
            ii_l, jj = np.nonzero(Gc > 0)
            keep_lt = jj < (ii_l + c0)  # pairs (i, j < i) only
            ii_l, jj = ii_l[keep_lt], jj[keep_lt]
            if not len(ii_l):
                continue
            dot = Gc[ii_l, jj]
            ii = ii_l + c0
            lhs = dot.astype(np.float64) ** 2 * 1e6
            rhs = (
                float(thr_pm2)
                * nn[ii].astype(np.float64)
                * nn[jj].astype(np.float64)
            )
            sure_dup = lhs > rhs * (1 + 1e-9)
            border = ~sure_dup & (lhs > rhs * (1 - 1e-9))
            if border.any():
                # integer-exact re-check inside the float boundary band
                do = dot[border].astype(object)
                ro = nn[ii[border]].astype(object) * nn[jj[border]].astype(object)
                sure_dup[border] = (do * do * 1_000_000) >= (thr_pm2 * ro)
            dropped[np.unique(ii[sure_dup])] = True
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "cluster": pa.array(np.full(n, cl, dtype=np.int64)),
                "keep": pa.array((~dropped).astype(np.int64)),
            }
        )

    return rows.groupby("cluster").map_groups(cluster_dedup, batch_format="pyarrow")


def sql_semdedup(k: int = 8, seed: int = 11, threshold: float = 0.95) -> str:
    """DuckDB SQL bit-exact vs :func:`semdedup` over ``embeddings``:
    the kmeans-init assignment CTEs, within-cluster pairs (j < i), and
    the HUGEINT cosine test replayed exactly."""
    from pkd_tree_ray.hashing import sql_splitmix64, sql_u64_to_i64

    thr_pm2 = round(threshold * QUANT) ** 2
    hv = sql_u64_to_i64(sql_splitmix64("vec_id", seed))
    return f"""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS qv
  FROM embeddings),
r AS (SELECT vec_id, qv,
             row_number() OVER (ORDER BY {hv}, vec_id) AS rk
      FROM e),
c AS (SELECT rk - 1 AS cid, qv AS cv FROM r WHERE rk <= {int(k)}),
d AS (
  SELECT e.vec_id, c.cid,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY CAST(list_dot_product(c.cv::DOUBLE[], c.cv::DOUBLE[])
                    - 2 * list_dot_product(e.qv::DOUBLE[], c.cv::DOUBLE[])
                    AS BIGINT),
                    c.cid
         ) AS rnk
  FROM e CROSS JOIN c),
a AS (SELECT vec_id, cid AS cluster FROM d WHERE rnk = 1),
comp AS (SELECT vec_id, unnest(qv) AS ev, generate_subscripts(qv, 1) AS j FROM e),
nrm AS (SELECT vec_id, sum(CAST(ev AS HUGEINT) * ev) AS nn FROM comp GROUP BY vec_id),
pairs AS (
  SELECT ai.vec_id AS i, aj.vec_id AS j
  FROM a ai JOIN a aj ON ai.cluster = aj.cluster AND aj.vec_id < ai.vec_id),
dots AS (
  SELECT p.i, p.j, sum(CAST(ci.ev AS HUGEINT) * cj.ev) AS dot
  FROM pairs p JOIN comp ci ON ci.vec_id = p.i
               JOIN comp cj ON cj.vec_id = p.j AND cj.j = ci.j
  GROUP BY p.i, p.j),
dup AS (
  SELECT DISTINCT d.i
  FROM dots d JOIN nrm na ON na.vec_id = d.i JOIN nrm nb ON nb.vec_id = d.j
  WHERE d.dot > 0
    AND d.dot * d.dot * 1000000 >= {thr_pm2} * na.nn * nb.nn)
SELECT a.vec_id, a.cluster,
       CAST(a.vec_id NOT IN (SELECT i FROM dup) AS BIGINT) AS keep
FROM a
ORDER BY vec_id
"""
