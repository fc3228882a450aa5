"""Deterministic stratified sampling (sampling.sample_per_key)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from pkd_tree_ray.hashing import splitmix64
from pkd_tree_ray.sampling import sample_per_key


def _corpus(n=5000, n_keys=7, seed=3):
    ids = np.arange(n, dtype=np.int64)
    keys = (splitmix64(ids.astype(np.uint64), seed) % np.uint64(n_keys)).astype(
        np.int64
    )
    return pa.table({"doc_id": ids, "k": keys, "payload": ids * 10})


def _oracle(tbl, n_per_key, seed):
    df = tbl.to_pandas()
    hv = splitmix64(
        df["doc_id"].to_numpy().astype(np.uint64), seed
    ).view(np.int64)
    df = df.assign(hv=hv)
    out = (
        df.sort_values(["k", "hv", "doc_id"])
        .groupby("k", sort=True)
        .head(n_per_key)
        .drop(columns="hv")
    )
    return out.sort_values(["k", "doc_id"]).reset_index(drop=True)


class TestSamplePerKey:
    def test_matches_rank_oracle_and_is_deterministic(self, ray_session):
        tbl = _corpus()
        want = _oracle(tbl, 25, seed=11)
        for _ in range(2):  # identical across re-runs
            got = (
                sample_per_key(
                    rd.from_arrow(tbl).repartition(8), "k", "doc_id", 25, seed=11
                )
                .to_pandas()
                .sort_values(["k", "doc_id"])
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(
                got[["doc_id", "k", "payload"]], want[["doc_id", "k", "payload"]]
            )

    def test_string_keys_and_short_strata(self, ray_session):
        ids = np.arange(300, dtype=np.int64)
        keys = np.where(ids % 50 == 0, "rare", np.where(ids % 2 == 0, "a", "b"))
        tbl = pa.table({"doc_id": ids, "k": keys.astype(object)})
        out = (
            sample_per_key(rd.from_arrow(tbl).repartition(4), "k", "doc_id", 10, seed=2)
            .to_pandas()
        )
        counts = out.groupby("k")["doc_id"].count()
        assert counts["a"] == 10 and counts["b"] == 10
        assert counts["rare"] == 6  # stratum smaller than the cap: keep all

    def test_high_cardinality_keys(self, ray_session):
        # 1000 distinct keys through the bucketed combine
        ids = np.arange(4000, dtype=np.int64)
        tbl = pa.table({"doc_id": ids, "k": (ids % 1000).astype(np.int64)})
        out = sample_per_key(
            rd.from_arrow(tbl).repartition(8), "k", "doc_id", 2, seed=5
        ).to_pandas()
        assert len(out) == 2000
        assert (out.groupby("k")["doc_id"].count() == 2).all()
        want = _oracle(tbl, 2, seed=5)
        got = out.sort_values(["k", "doc_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["doc_id", "k"]], want[["doc_id", "k"]])


class TestHashSplit:
    def test_deterministic_and_disjoint(self, ray_session):
        from pkd_tree_ray.sampling import hash_split

        ids = np.arange(5000, dtype=np.int64)
        tbl = pa.table({"doc_id": ids, "payload": ids * 3})
        ds = rd.from_arrow(tbl).repartition(8)
        a = hash_split(ds, "doc_id", 100, seed=21).to_pandas()
        b = hash_split(ds, "doc_id", 100, seed=21).to_pandas()
        a = a.sort_values("doc_id").reset_index(drop=True)
        b = b.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)  # re-runs identical
        frac = (a["split"] == "holdout").mean()
        assert 0.07 < frac < 0.13  # ~10% holdout
        # payload untouched, all rows present exactly once
        assert len(a) == 5000 and (a["payload"] == a["doc_id"] * 3).all()

    def test_matches_duckdb(self, ray_session):
        import duckdb

        from pkd_tree_ray.sampling import hash_split, sql_hash_split

        ids = np.arange(0, 3000, 7, dtype=np.int64)
        tbl = pa.table({"doc_id": ids})
        got = (
            hash_split(rd.from_arrow(tbl).repartition(5), "doc_id", 250, seed=3)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", tbl.to_pandas())
        want = (
            con.execute(sql_hash_split("documents", "doc_id", 250, seed=3))
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["split"].tolist() == want["split"].tolist()

    def test_negative_ids_rejected(self, ray_session):
        from pkd_tree_ray.sampling import hash_split

        tbl = pa.table({"doc_id": pa.array([-1, 2, 3], pa.int64())})
        with pytest.raises(Exception, match="non-negative"):
            hash_split(rd.from_arrow(tbl), "doc_id", 100).to_pandas()
