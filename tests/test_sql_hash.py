"""SQL-reproducibility of the text-pipeline hash kit: poly64 /
token_hash64 and the fingerprint / SimHash / MinHash-LSH oracle SQL
must be bit-exact vs the Ray implementations — including the capped
star+chain pair generation for oversized LSH buckets, which the
sf-scale fixtures never trigger."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


def _duck_docs(texts):
    import duckdb

    con = duckdb.connect()
    con.register(
        "documents",
        pa.table(
            {
                "doc_id": np.arange(len(texts), dtype=np.int64),
                "text": pa.array(texts, pa.string()),
            }
        ),
    )
    return con


def _docs_ds(texts):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": np.arange(len(texts), dtype=np.int64),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


class TestPoly64:
    def test_matches_duckdb_assorted(self):
        import duckdb

        from pkd_tree_ray.hashing import poly64, sql_poly64, token_hash64, sql_token_hash64

        toks = ["", "a", "Z", "key", "value", "x" * 600, "0", "~!@# $", "héllo", "日本語"]
        con = duckdb.connect()
        con.register("t", pa.table({"tok": pa.array(toks, pa.string())}))
        got = con.sql(
            f"SELECT CAST({sql_poly64('tok')} AS UBIGINT) AS p, "
            f"CAST({sql_token_hash64('tok', 13)} AS UBIGINT) AS th FROM t"
        ).fetchnumpy()
        assert np.array_equal(got["p"].astype(np.uint64), poly64(toks))
        assert np.array_equal(got["th"].astype(np.uint64), token_hash64(toks, 13))

    @settings(max_examples=20, deadline=None)
    @given(st.lists(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126), max_size=40), min_size=1, max_size=30))
    def test_matches_duckdb_random_ascii(self, toks):
        import duckdb

        from pkd_tree_ray.hashing import poly64, sql_poly64

        con = duckdb.connect()
        con.register("t", pa.table({"tok": pa.array(toks, pa.string())}))
        got = con.sql(f"SELECT CAST({sql_poly64('tok')} AS UBIGINT) AS p FROM t").fetchnumpy()
        assert np.array_equal(got["p"].astype(np.uint64), poly64(toks))

    def test_sliced_and_chunked_arrow_input(self):
        from pkd_tree_ray.hashing import poly64

        toks = ["alpha", "bb", "c", "dddd", "ee"]
        arr = pa.array(toks, pa.string())
        assert np.array_equal(poly64(arr.slice(1, 3)), poly64(toks[1:4]))
        ch = pa.chunked_array([arr.slice(0, 2), arr.slice(2, 3)])
        assert np.array_equal(poly64(ch), poly64(toks))


_TEXTS = [
    "",  # empty doc
    "one",  # sub-window
    "two tokens",
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog today",  # near-dup of above
    "completely different content about spark tables and rows",
    "a b",  # punctuation-free short
    "x y z w v u t s r q p",
]


class TestSqlTextOracles:
    def _cmp(self, ray_df, con, sql, sort_cols):
        exp = con.sql(sql).df()
        got = ray_df.sort_values(sort_cols).reset_index(drop=True)
        exp = exp.sort_values(sort_cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[exp.columns.tolist()], exp, check_dtype=False
        )

    def test_fingerprints_parity(self, ray_session):
        from pkd_tree_ray.text import fingerprints, sql_fingerprints

        con = _duck_docs(_TEXTS)
        got = fingerprints(_docs_ds(_TEXTS)).to_pandas()
        self._cmp(got, con, sql_fingerprints(), ["doc_id"])

    def test_simhash_parity(self, ray_session):
        from pkd_tree_ray.text import simhash, sql_simhash

        con = _duck_docs(_TEXTS)
        got = simhash(_docs_ds(_TEXTS)).to_pandas()
        self._cmp(got, con, sql_simhash(), ["doc_id"])

    def test_minhash_parity_small(self, ray_session):
        from pkd_tree_ray.text import minhash_neardup, sql_minhash_neardup

        con = _duck_docs(_TEXTS)
        got = minhash_neardup(_docs_ds(_TEXTS), threshold=0.5).to_pandas()
        self._cmp(got, con, sql_minhash_neardup(0.5), ["doc_a", "doc_b"])

    def test_minhash_parity_oversized_bucket(self, ray_session):
        """>cap identical docs put every band bucket over the 64-doc
        cap, so the Ray side emits the segmented star+chain instead of
        all pairs — the SQL oracle must reproduce exactly that pair
        set (pairjoin.bucket_pairs_capped_runs re-expressed in SQL)."""
        from pkd_tree_ray.text import minhash_neardup, sql_minhash_neardup

        dup = "spark table row value hash merge batch window stream"
        texts = [f"unique doc {i} filler content alpha beta gamma" for i in range(10)]
        texts += [dup] * 150  # one giant duplicate cluster (150 > cap 64)
        con = _duck_docs(texts)
        got = minhash_neardup(_docs_ds(texts), threshold=0.5).to_pandas()
        assert len(got) > 150  # star+chain of the 150-cluster
        self._cmp(got, con, sql_minhash_neardup(0.5), ["doc_a", "doc_b"])


class TestSqlEmbeddingNeardup:
    def _emb_table(self, m, ids=None):
        n = len(m)
        return pa.table(
            {
                "vec_id": pa.array(
                    np.arange(n, dtype=np.int64) if ids is None else ids,
                    pa.int64(),
                ),
                "embedding": pa.array(
                    [row.astype(np.float32) for row in m], pa.list_(pa.float32())
                ),
            }
        )

    def _cmp(self, tbl, threshold):
        import duckdb
        import ray.data as rd

        from pkd_tree_ray.ann import (
            embedding_neardup,
            sql_embedding_neardup,
            sql_quantized_embeddings,
        )

        d = len(tbl["embedding"][0])
        got = embedding_neardup(rd.from_arrow(tbl), threshold=threshold).to_pandas()
        con = duckdb.connect()
        con.register("embeddings", tbl)
        exp = con.sql(
            sql_embedding_neardup(sql_quantized_embeddings(), d, threshold=threshold)
        ).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
        )
        return got

    def test_parity_random_vectors(self, ray_session):
        rng = np.random.RandomState(7)
        base = rng.standard_normal((60, 16))
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        # plant 10 near-dups of the first 10 vectors
        dups = base[:10] + rng.standard_normal((10, 16)) * 0.003
        m = np.vstack([base, dups])
        got = self._cmp(self._emb_table(m), 0.95)
        assert len(got) >= 8  # LSH recall on the planted pairs

    def test_parity_oversized_bucket(self, ray_session):
        """150 identical vectors overflow the 64-doc bucket cap — the
        SQL star+chain must match the Ray pair set exactly."""
        rng = np.random.RandomState(8)
        v = rng.standard_normal(16)
        v /= np.linalg.norm(v)
        m = np.vstack([np.tile(v, (150, 1)), rng.standard_normal((10, 16))])
        got = self._cmp(self._emb_table(m), 0.9)
        assert len(got) > 150
