"""Tests for cross-document duplicated-span detection (spans.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(texts, ray_session):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": np.arange(len(texts), dtype=np.int64),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _run(texts, ray_session, window=4):
    from pkd_tree_ray.spans import dedup_spans

    return (
        dedup_spans(_ds(texts, ray_session), window=window)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


class TestDedupSpans:
    def test_planted_shared_span(self, ray_session):
        shared = "the exact same eight token span appears twice here"
        texts = [
            f"alpha beta gamma {shared} delta epsilon",
            f"{shared} zeta eta theta iota kappa",
            "completely different words without any overlap at all",
        ]
        got = _run(texts, ray_session, window=4)
        assert got["doc_id"].tolist() == [0, 1, 2]
        # docs 0 and 1 share the span's windows; doc 2 shares nothing
        assert got.loc[0, "n_dup_windows"] > 0
        assert got.loc[1, "n_dup_windows"] > 0
        assert got.loc[2, "n_dup_windows"] == 0
        assert got.loc[2, "dup_permille"] == 0
        assert (got["n_windows"] > 0).all()
        assert (
            got["dup_permille"]
            == 1000 * got["n_dup_windows"] // got["n_windows"]
        ).all()

    def test_identical_docs_fully_duplicated(self, ray_session):
        t = "one two three four five six seven eight nine ten"
        got = _run([t, t], ray_session, window=4)
        assert (got["dup_permille"] == 1000).all()
        assert (got["n_dup_windows"] == got["n_windows"]).all()

    def test_subwindow_doc_folds_to_one_window(self, ray_session):
        got = _run(["tiny doc", "tiny doc", "bigger doc with more words here"],
                   ray_session, window=4)
        assert got.loc[0, "n_windows"] == 1
        assert got.loc[0, "n_dup_windows"] == 1  # both tiny docs identical
        assert got.loc[1, "n_dup_windows"] == 1

    def test_intra_doc_repeats_do_not_count(self, ray_session):
        # the repeated span lives in ONE doc only: distinct-per-doc rows
        # mean no other doc holds the hash -> not duplicated
        t = "again again again again again again again again again again"
        got = _run([t, "nothing in common with that other text here"],
                   ray_session, window=4)
        assert got.loc[0, "n_dup_windows"] == 0

    def test_sql_oracle_parity(self, ray_session):
        import duckdb

        from pkd_tree_ray.spans import sql_dedup_spans

        rng = np.random.RandomState(7)
        vocab = [f"w{i}" for i in range(40)]
        texts = []
        for i in range(60):
            n = int(rng.randint(2, 30))
            texts.append(" ".join(rng.choice(vocab, n)))
        # plant cross-doc spans
        texts[5] += " " + texts[11]
        texts[20] = texts[33]
        df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64), "text": texts})
        got = _run(texts, ray_session).reset_index(drop=True)
        con = duckdb.connect()
        con.register("documents", df)
        exp = (
            con.execute(sql_dedup_spans(window=4))
            .fetchdf()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["doc_id", "n_windows", "n_dup_windows", "dup_permille"]],
            exp[["doc_id", "n_windows", "n_dup_windows", "dup_permille"]],
        )

    def test_partition_invariance(self, ray_session):
        import ray.data as rd

        from pkd_tree_ray.spans import dedup_spans

        texts = [f"common prefix words here tail{i} more tail{i}" for i in range(30)]
        base = _run(texts, ray_session)
        ds = _ds(texts, ray_session).repartition(7)
        got = (
            dedup_spans(ds, window=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(base, got)


class TestClassifierScores:
    def test_sql_oracle_parity(self, ray_session):
        import duckdb

        from pkd_tree_ray.text import classifier_scores, sql_classifier_scores

        rng = np.random.RandomState(3)
        vocab = [f"tok{i}" for i in range(500)]
        texts = [" ".join(rng.choice(vocab, int(rng.randint(0, 60))))
                 for _ in range(80)]
        texts[7] = ""   # zero-token doc -> logit 0, keep 0
        df = pd.DataFrame({"doc_id": np.arange(80, dtype=np.int64), "text": texts})
        got = (
            classifier_scores(_ds(texts, ray_session))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", df)
        exp = (
            con.execute(sql_classifier_scores())
            .fetchdf()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["doc_id", "n_tokens", "logit", "keep"]],
            exp[["doc_id", "n_tokens", "logit", "keep"]],
        )
        assert got.loc[7, "n_tokens"] == 0
        assert got.loc[7, "keep"] == 0

    def test_custom_weights_broadcast(self, ray_session):
        from pkd_tree_ray.text import _CLS_BUCKETS, classifier_scores

        # all-positive weights -> every non-empty doc kept
        w = np.ones(_CLS_BUCKETS, dtype=np.int64)
        got = (
            classifier_scores(_ds(["a b c", "d e", ""], ray_session), weights=w)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["logit"].tolist() == [3, 2, 0]
        assert got["keep"].tolist() == [1, 1, 0]
