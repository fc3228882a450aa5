"""Tests for Misra-Gries heavy hitters (sketches.heavy_hitters),
Bloom semi/anti-join (membership.py) and group-wise top-N
(ranking.py)."""

import numpy as np
import pyarrow as pa
import pytest


def _zipf_docs(ray_session, n_docs=400, vocab=5_000, seed=7, n_blocks=9):
    """Zipf-ish corpus: heavy head, long tail — the heavy-hitter regime."""
    import ray.data as rd

    rng = np.random.RandomState(seed)
    ranks = np.arange(1, vocab + 1)
    p = (1.0 / ranks) / np.sum(1.0 / ranks)
    terms = np.array([f"w{i:06d}" for i in range(vocab)])
    texts = [
        " ".join(terms[rng.choice(vocab, size=60, p=p)]) for _ in range(n_docs)
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": np.arange(n_docs, dtype=np.int64),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(n_blocks)
    return ds, texts


class TestHeavyHitters:
    def test_matches_exact_topk(self, ray_session):
        """Sketch+recount == brute-force exact counts on a Zipf corpus."""
        from collections import Counter

        from pkd_tree_ray.sketches import heavy_hitters

        ds, texts = _zipf_docs(ray_session)
        got = heavy_hitters(ds, k=15, cap=256).to_pandas()
        c = Counter(" ".join(texts).split())
        want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
        assert list(zip(got["term"], got["cnt"])) == want

    def test_matches_vocab_topk(self, ray_session):
        """heavy_hitters and the shuffle-based vocab_topk are the same
        function of the corpus — different 100-TB shapes only."""
        from pkd_tree_ray.sketches import heavy_hitters
        from pkd_tree_ray.text import vocab_topk

        ds, _ = _zipf_docs(ray_session, seed=11)
        a = heavy_hitters(ds, k=25, cap=512).to_pandas()
        b = vocab_topk(ds, k=25).to_pandas()
        assert a.equals(b)

    def test_mg_compress_guarantee(self):
        """Residual error of one compression <= n_tokens/(cap+1)."""
        from pkd_tree_ray.sketches import _mg_compress

        rng = np.random.RandomState(0)
        cnts = rng.zipf(1.5, size=3000).astype(np.int64)
        terms = pa.array([f"t{i}" for i in range(len(cnts))])
        cap = 64
        kt, kc = _mg_compress(terms, cnts, cap)
        assert len(kc) <= cap
        # every kept residual under-counts by exactly d <= n/(cap+1)
        kept = {t: c for t, c in zip(kt.to_pylist(), kc)}
        d = max(
            cnts[i] - kept.get(terms[i].as_py(), 0)
            for i in range(len(cnts))
        )
        assert d <= cnts.sum() // (cap + 1)


class TestBloomSemiJoin:
    def _tables(self, ray_session, n_big=20_000, n_keys=300, seed=5):
        import ray.data as rd

        rng = np.random.RandomState(seed)
        big = pa.table(
            {
                "k": rng.randint(0, 2_000, size=n_big).astype(np.int64),
                "v": np.arange(n_big, dtype=np.int64),
            }
        )
        small = pa.table(
            {"sk": rng.choice(2_000, size=n_keys, replace=False).astype(np.int64)}
        )
        return (
            rd.from_arrow(big).repartition(7),
            rd.from_arrow(small).repartition(3),
            big,
            small,
        )

    def test_semi_exact(self, ray_session):
        from pkd_tree_ray.membership import bloom_semi_join

        big, small, bt, st = self._tables(ray_session)
        got = bloom_semi_join(big, "k", small, "sk").to_pandas()
        keys = set(st["sk"].to_pylist())
        want = {v for k, v in zip(bt["k"].to_pylist(), bt["v"].to_pylist()) if k in keys}
        assert set(got["v"]) == want

    def test_anti_is_complement(self, ray_session):
        from pkd_tree_ray.membership import bloom_semi_join

        big, small, bt, _ = self._tables(ray_session, seed=9)
        semi = bloom_semi_join(big, "k", small, "sk").to_pandas()
        anti = bloom_semi_join(big, "k", small, "sk", anti=True).to_pandas()
        assert len(semi) + len(anti) == bt.num_rows
        assert not (set(semi["v"]) & set(anti["v"]))

    def test_bloom_no_false_negatives_and_low_fpp(self):
        from pkd_tree_ray.membership import bloom_test, build_bloom

        rng = np.random.RandomState(1)
        keys = rng.choice(10**9, size=50_000, replace=False).astype(np.int64)
        bits, m, kh, _ = build_bloom(keys)
        assert bloom_test(bits, m, kh, keys).all()  # no false negatives
        probe = rng.choice(10**9, size=100_000).astype(np.int64)
        outside = probe[~np.isin(probe, keys)]
        fpp = bloom_test(bits, m, kh, outside).mean()
        assert fpp < 0.01, fpp  # 16 bits/key, 6 probes -> ~0.05% expected

    def test_empty_small_side(self, ray_session):
        import ray.data as rd

        from pkd_tree_ray.membership import bloom_semi_join

        big = rd.from_arrow(
            pa.table({"k": np.arange(10, dtype=np.int64), "v": np.arange(10, dtype=np.int64)})
        )
        small = rd.from_arrow(pa.table({"sk": pa.array([], pa.int64())}))
        assert bloom_semi_join(big, "k", small, "sk").count() == 0
        assert bloom_semi_join(big, "k", small, "sk", anti=True).count() == 10


class TestTopnPerGroup:
    def _frame(self, n=5_000, groups=37, seed=2):
        rng = np.random.RandomState(seed)
        return pa.table(
            {
                "g": pa.array([f"grp{i:03d}" for i in rng.randint(0, groups, n)]),
                "score": rng.randint(0, 500, n).astype(np.int64),  # many ties
                "rid": np.arange(n, dtype=np.int64),
            }
        )

    def test_matches_pandas_window(self, ray_session):
        import ray.data as rd

        from pkd_tree_ray.ranking import topn_per_group

        t = self._frame()
        got = (
            topn_per_group(rd.from_arrow(t).repartition(11), "g", "score", "rid", n=4)
            .to_pandas()
            .sort_values(["g", "rank"])
            .reset_index(drop=True)
        )
        df = t.to_pandas().sort_values(
            ["g", "score", "rid"], ascending=[True, False, True]
        )
        df["rank"] = df.groupby("g").cumcount() + 1
        want = (
            df[df["rank"] <= 4][["g", "rid", "score", "rank"]]
            .sort_values(["g", "rank"])
            .reset_index(drop=True)
        )
        assert got.equals(want.astype(got.dtypes.to_dict()))

    def test_partition_invariance(self, ray_session):
        import ray.data as rd

        from pkd_tree_ray.ranking import topn_per_group

        t = self._frame(seed=4)
        outs = []
        for nb in (1, 13):
            outs.append(
                topn_per_group(rd.from_arrow(t).repartition(nb), "g", "score", "rid", n=2)
                .to_pandas()
                .sort_values(["g", "rank"])
                .reset_index(drop=True)
            )
        assert outs[0].equals(outs[1])

    def test_group_smaller_than_n(self, ray_session):
        import ray.data as rd

        from pkd_tree_ray.ranking import topn_per_group

        t = pa.table(
            {
                "g": pa.array(["a", "a", "b"]),
                "score": np.array([5, 9, 1], np.int64),
                "rid": np.array([0, 1, 2], np.int64),
            }
        )
        got = (
            topn_per_group(rd.from_arrow(t), "g", "score", "rid", n=10)
            .to_pandas()
            .sort_values(["g", "rank"])
            .reset_index(drop=True)
        )
        assert got["rid"].tolist() == [1, 0, 2]
        assert got["rank"].tolist() == [1, 2, 1]


class TestBroadcastJoin:
    def _tables(self, seed=3, n_big=8_000, n_small=400):
        rng = np.random.RandomState(seed)
        big = pa.table(
            {
                "k": rng.randint(0, 1_000, size=n_big).astype(np.int64),
                "v": np.arange(n_big, dtype=np.int64),
            }
        )
        sk = rng.choice(1_000, size=n_small, replace=False).astype(np.int64)
        small = pa.table(
            {
                "sk": sk,
                "p1": sk * 7,
                "p2": pa.array([f"s{v}" for v in sk]),
            }
        )
        return big, small

    def test_inner_matches_pandas(self, ray_session):
        import ray.data as rd

        from pkd_tree_ray.membership import broadcast_join

        bt, st = self._tables()
        got = (
            broadcast_join(
                rd.from_arrow(bt).repartition(5),
                "k",
                rd.from_arrow(st).repartition(3),
                "sk",
                ["p1", "p2"],
            )
            .to_pandas()
            .sort_values(["v"])
            .reset_index(drop=True)
        )
        want = (
            bt.to_pandas()
            .merge(st.to_pandas(), left_on="k", right_on="sk", how="inner")
            .drop(columns=["sk"])
            .sort_values(["v"])
            .reset_index(drop=True)
        )
        assert got.equals(want.astype(got.dtypes.to_dict()))

    def test_left_nullfills(self, ray_session):
        import ray.data as rd

        from pkd_tree_ray.membership import broadcast_join

        bt, st = self._tables(seed=8)
        got = (
            broadcast_join(
                rd.from_arrow(bt), "k", rd.from_arrow(st), "sk", ["p1"], how="left"
            )
            .to_pandas()
            .sort_values(["v"])
            .reset_index(drop=True)
        )
        assert len(got) == bt.num_rows
        keys = set(st["sk"].to_pylist())
        miss = ~got["k"].isin(keys)
        assert got.loc[miss, "p1"].isna().all()
        assert (got.loc[~miss, "p1"] == got.loc[~miss, "k"] * 7).all()

    def test_duplicate_build_keys_rejected(self, ray_session):
        import ray.data as rd

        from pkd_tree_ray.membership import broadcast_join

        big = rd.from_arrow(pa.table({"k": np.array([1, 2], np.int64)}))
        small = rd.from_arrow(
            pa.table({"sk": np.array([1, 1], np.int64), "p": np.array([5, 6], np.int64)})
        )
        with pytest.raises(ValueError, match="duplicate keys"):
            broadcast_join(big, "k", small, "sk", ["p"])
