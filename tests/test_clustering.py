"""K-means (clustering.kmeans) — determinism, invariance, convergence."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from pkd_tree_ray.clustering import QUANT, kmeans, kmeans_assign, seeded_init


def _vectors(n=600, d=16, seed=2):
    rng = np.random.RandomState(seed)
    centers = rng.randn(4, d) * 3
    base = centers[np.arange(n) % 4] + rng.randn(n, d) * 0.3
    return pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(base.astype(np.float32)),
        }
    )


def _inertia(tbl, assign_df, cent):
    m = np.stack([np.asarray(v, np.float64) for v in tbl["embedding"].to_pylist()])
    q = np.floor(m * QUANT)
    a = assign_df.sort_values("vec_id")["cluster"].to_numpy()
    return float(((q - cent[a]) ** 2).sum())


class TestKMeans:
    def test_partitioning_invariance(self, ray_session):
        """Same assignments regardless of block layout (the broadcast +
        partial-fold path has no partition-order dependence)."""
        tbl = _vectors()
        a1 = (
            kmeans_assign(rd.from_arrow(tbl).repartition(2), k=6, seed=3)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        a2 = (
            kmeans_assign(rd.from_arrow(tbl).repartition(13), k=6, seed=3)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a1, a2)

    def test_seeded_init_is_hash_rank(self, ray_session):
        from pkd_tree_ray.hashing import splitmix64

        tbl = _vectors(200)
        cent = seeded_init(rd.from_arrow(tbl).repartition(5), 4, seed=9)
        ids = np.arange(200, dtype=np.int64)
        hv = splitmix64(ids.view(np.uint64), 9).view(np.int64)
        want_ids = ids[np.lexsort((ids, hv))[:4]]
        m = np.stack([np.asarray(v, np.float64) for v in tbl["embedding"].to_pylist()])
        want = np.floor(m[want_ids] * QUANT).astype(np.int64)
        assert (cent == want).all()

    def test_lloyd_converges_and_recovers_clusters(self, ray_session):
        tbl = _vectors()
        ds = rd.from_arrow(tbl).repartition(6)
        prev = None
        for iters in (1, 3, 6):
            assign, cent, counts = kmeans(ds, k=4, iters=iters, seed=5)
            inertia = _inertia(tbl, assign.to_pandas(), cent)
            if prev is not None:
                assert inertia <= prev + 1e-6  # Lloyd's monotone descent
            prev = inertia
        # 4 well-separated planted clusters: assignments must agree
        # with the planted labels up to relabeling
        adf = assign.to_pandas().sort_values("vec_id")
        planted = np.arange(len(adf)) % 4
        got = adf["cluster"].to_numpy()
        ct = pd.crosstab(planted, got).to_numpy()
        assert ct.max(axis=1).sum() >= 0.95 * len(adf)
