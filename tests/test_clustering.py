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


class TestSemDedup:
    def _emb_ds(self, vecs, ray_session):
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "vec_id": np.arange(len(vecs), dtype=np.int64),
                    "embedding": pa.array(
                        [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
                    ),
                }
            )
        )

    def test_planted_near_twins_dropped_first_wins(self, ray_session):
        rng = np.random.RandomState(5)
        base = rng.rand(40, 8).astype(np.float32)
        vecs = list(base)
        vecs[17] = vecs[3] * 1.0  # exact twin -> cosine 1
        vecs[29] = vecs[3] + 1e-4  # near twin
        from pkd_tree_ray.clustering import semdedup

        out = (
            semdedup(self._emb_ds(vecs, ray_session), k=4, seed=11, threshold=0.99)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert out.loc[3, "keep"] == 1      # lowest id of the twin set wins
        assert out.loc[17, "keep"] == 0
        assert out.loc[29, "keep"] == 0
        assert out["keep"].sum() >= 30      # random vectors mostly kept

    def test_sql_oracle_parity(self, ray_session):
        import duckdb
        import pandas as pd

        from pkd_tree_ray.clustering import semdedup, sql_semdedup

        rng = np.random.RandomState(9)
        base = rng.rand(60, 8).astype(np.float32)
        vecs = list(base)
        for i in range(0, 60, 10):   # planted near-dup pairs
            vecs[i + 1] = vecs[i] + rng.rand(8).astype(np.float32) * 1e-3
        got = (
            semdedup(self._emb_ds(vecs, ray_session), k=6, seed=11, threshold=0.95)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        df = pd.DataFrame(
            {
                "vec_id": np.arange(60, dtype=np.int64),
                "embedding": [list(map(float, v)) for v in vecs],
            }
        )
        con = duckdb.connect()
        con.register("embeddings", df)
        exp = (
            con.execute(sql_semdedup(k=6, seed=11, threshold=0.95))
            .fetchdf()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["vec_id", "cluster", "keep"]].astype("int64"),
            exp[["vec_id", "cluster", "keep"]].astype("int64"),
        )
