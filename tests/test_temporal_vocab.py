"""Tests for the temporal operators (as-of join, sessionize,
window_agg) and the vocabulary operators (vocab_topk, tfidf_topk) —
each validated against a brute-force reference on synthetic inputs
(the DuckDB oracle at sf0.01 is driver-side; these run on crafted
edge-case corpora)."""

import numpy as np
import pandas as pd
import pyarrow as pa


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


def _events_ds(rows):
    """rows: (event_id, user_id, ts_us, event_type, value)."""
    import ray.data as rd

    eid, uid, ts, et, val = map(list, zip(*rows))
    return rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "ts": pa.array(np.array(ts, dtype="datetime64[us]")),
                "event_type": pa.array(et, pa.string()),
                "value": pa.array(val, pa.float64()),
            }
        )
    )


class TestVocab:
    def test_vocab_topk_counts_and_ties(self, ray_session):
        from pkd_tree_ray.text import vocab_topk

        texts = ["b a a", "c b", "d d d  a", "", "   "]
        got = vocab_topk(_docs_ds(texts), k=3).to_pandas()
        # counts: a=3, d=3, b=2, c=1 — tie a/d broken by term asc
        assert got["term"].tolist() == ["a", "d", "b"]
        assert got["cnt"].tolist() == [3, 3, 2]

    def test_vocab_topk_k_larger_than_vocab(self, ray_session):
        from pkd_tree_ray.text import vocab_topk

        got = vocab_topk(_docs_ds(["x y", "y"]), k=100).to_pandas()
        assert got["term"].tolist() == ["y", "x"]
        assert got["cnt"].tolist() == [2, 1]

    def test_tfidf_matches_bruteforce(self, ray_session):
        from pkd_tree_ray.text import tfidf_topk

        rng = np.random.default_rng(7)
        vocab = [f"w{i}" for i in range(30)]
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(0, 40)))
            for _ in range(60)
        ]
        got = (
            tfidf_topk(_docs_ds(texts), k=4)
            .to_pandas()
            .sort_values(["doc_id", "rank"])
            .reset_index(drop=True)
        )
        # brute force
        n = len(texts)
        df: dict[str, int] = {}
        tfs = []
        for t in texts:
            toks = t.split()
            cnt: dict[str, int] = {}
            for w in toks:
                cnt[w] = cnt.get(w, 0) + 1
            tfs.append(cnt)
            for w in cnt:
                df[w] = df.get(w, 0) + 1
        rows = []
        for d, cnt in enumerate(tfs):
            scored = sorted(
                ((tf * ((n * 1000) // df[w]), w, tf) for w, tf in cnt.items()),
                key=lambda s: (-s[0], s[1]),
            )[:4]
            for r, (sc, w, tf) in enumerate(scored, start=1):
                rows.append((d, w, tf, sc, r))
        exp = pd.DataFrame(
            rows, columns=["doc_id", "term", "tf", "score", "rank"]
        )
        got = got[["doc_id", "term", "tf", "score", "rank"]]
        pd.testing.assert_frame_equal(
            got, exp.astype({"doc_id": np.int64, "tf": np.int64,
                             "score": np.int64, "rank": np.int64})
        )

    def test_tfidf_empty_docs_emit_nothing(self, ray_session):
        from pkd_tree_ray.text import tfidf_topk

        got = tfidf_topk(_docs_ds(["", "a a b", "  "]), k=5).to_pandas()
        assert set(got["doc_id"]) == {1}
        assert len(got) == 2  # terms a, b

    def test_tfidf_shuffle_fallback_identical(self, ray_session):
        """Amplified-vocab path: vocab_cap=8 forces the term-hash
        shuffle-join arm; it must be bit-identical to the broadcast
        arm on the same corpus (including ties and rank order)."""
        from pkd_tree_ray.text import tfidf_topk

        rng = np.random.default_rng(13)
        vocab = [f"tok{i:03d}" for i in range(80)]
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(0, 25)))
            for _ in range(70)
        ] + ["", "   ", "tok000 tok000 tok001"]

        def run(**kw):
            return (
                tfidf_topk(_docs_ds(texts), k=4, **kw)
                .to_pandas()
                .sort_values(["doc_id", "rank"])
                .reset_index(drop=True)
            )

        broadcast = run()                       # vocab 80 << default cap
        shuffled = run(vocab_cap=8, n_buckets=5)
        pd.testing.assert_frame_equal(
            shuffled[broadcast.columns.tolist()], broadcast
        )


class TestAsofJoin:
    def test_matches_bruteforce(self, ray_session):
        from pkd_tree_ray.temporal import asof_join

        rng = np.random.default_rng(11)
        rows = []
        for i in range(400):
            rows.append(
                (
                    i,
                    int(rng.integers(0, 12)),
                    int(rng.integers(0, 10_000) * 1_000_000),
                    str(rng.choice(["buy", "click", "other"])),
                    float(i) / 8.0,
                )
            )
        got = (
            asof_join(_events_ds(rows), "buy", "click", n_buckets=5)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        lefts = [r for r in rows if r[3] == "buy"]
        rights = [r for r in rows if r[3] == "click"]
        exp = []
        for eid, uid, ts, _, _ in lefts:
            cands = [r for r in rights if r[1] == uid and r[2] <= ts]
            if not cands:
                continue
            m = max(cands, key=lambda r: (r[2], r[0]))
            exp.append((eid, uid, ts, m[0], m[2], m[4]))
        exp = pd.DataFrame(
            sorted(exp),
            columns=["event_id", "user_id", "ts_us", "match_id",
                     "match_ts_us", "match_value"],
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_equal_ts_is_inclusive_and_tiebroken_by_id(self, ray_session):
        from pkd_tree_ray.temporal import asof_join

        rows = [
            (1, 7, 1000, "click", 0.5),
            (2, 7, 1000, "click", 0.9),  # same ts: max event_id wins
            (3, 7, 1000, "buy", 0.0),    # r.ts <= l.ts is inclusive
            (4, 7, 999, "buy", 0.0),     # before any click: no match
        ]
        got = asof_join(_events_ds(rows), "buy", "click").to_pandas()
        assert got["event_id"].tolist() == [3]
        assert got["match_id"].tolist() == [2]
        assert got["match_value"].tolist() == [0.9]


class TestSessionize:
    def test_gap_splits_sessions(self, ray_session):
        from pkd_tree_ray.temporal import sessionize

        us = 1_000_000
        rows = [
            # user 1: 3 events tight, gap, 2 events
            (1, 1, 0 * us, "e", 0.0),
            (2, 1, 10 * us, "e", 0.0),
            (3, 1, 20 * us, "e", 0.0),
            (4, 1, 4000 * us, "e", 0.0),
            (5, 1, 4100 * us, "e", 0.0),
            # user 2: single event
            (6, 2, 50 * us, "e", 0.0),
        ]
        got = (
            sessionize(_events_ds(rows), gap_s=1800)
            .to_pandas()
            .sort_values(["user_id", "session_idx"])
            .reset_index(drop=True)
        )
        assert got["user_id"].tolist() == [1, 1, 2]
        assert got["session_idx"].tolist() == [0, 1, 0]
        assert got["n_events"].tolist() == [3, 2, 1]
        assert got["start_us"].tolist() == [0, 4000 * us, 50 * us]
        assert got["end_us"].tolist() == [20 * us, 4100 * us, 50 * us]

    def test_boundary_gap_exactly_equal_keeps_session(self, ray_session):
        from pkd_tree_ray.temporal import sessionize

        us = 1_000_000
        rows = [
            (1, 1, 0, "e", 0.0),
            (2, 1, 1800 * us, "e", 0.0),      # == gap: same session
            (3, 1, 3600 * us + 1, "e", 0.0),  # > gap by 1us: new session
        ]
        got = (
            sessionize(_events_ds(rows), gap_s=1800)
            .to_pandas()
            .sort_values("session_idx")
            .reset_index(drop=True)
        )
        assert got["n_events"].tolist() == [2, 1]


class TestWindowAgg:
    def test_matches_bruteforce(self, ray_session):
        from pkd_tree_ray.temporal import window_agg

        rng = np.random.default_rng(3)
        rows = [
            (
                i,
                0,
                int(rng.integers(0, 50_000) * 1_000_000),
                str(rng.choice(["a", "b"])),
                float(rng.normal()),
            )
            for i in range(500)
        ]
        got = (
            window_agg(_events_ds(rows), width_s=3600)
            .to_pandas()
            .sort_values(["event_type", "win"])
            .reset_index(drop=True)
        )
        df = pd.DataFrame(rows, columns=["eid", "uid", "ts", "et", "v"])
        df["win"] = df["ts"] // (3600 * 1_000_000)
        df["vx"] = np.floor(df["v"] * 1000).astype(np.int64)
        exp = (
            df.groupby(["et", "win"])
            .agg(n_events=("eid", "size"), sum_vx1000=("vx", "sum"))
            .reset_index()
            .rename(columns={"et": "event_type"})
            .sort_values(["event_type", "win"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
