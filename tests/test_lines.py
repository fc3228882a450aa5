"""Tests for corpus-level line deduplication (lines.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


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


def _run(texts, ray_session, **kw):
    from pkd_tree_ray.lines import dedup_lines

    return (
        dedup_lines(_ds(texts, ray_session), **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


class TestDedupLines:
    def test_first_occurrence_wins(self, ray_session):
        dup = "a line that is duplicated across documents"
        texts = [
            f"{dup}\nunique first line",
            f"other content\n{dup}",
            f"{dup}",
        ]
        got = _run(texts, ray_session)
        assert got["text_clean"].tolist() == [
            texts[0],
            "other content",
            "",
        ]
        assert got["n_dropped"].tolist() == [0, 1, 1]
        assert got["n_lines"].tolist() == [2, 2, 1]

    def test_intra_doc_dups_collapse(self, ray_session):
        got = _run(["same long line here\nsame long line here\nend line ok"],
                   ray_session)
        assert got["text_clean"][0] == "same long line here\nend line ok"
        assert got["n_dropped"][0] == 1

    def test_short_lines_never_deduped(self, ray_session):
        texts = ["short\n\nshort", "short\n"]
        got = _run(texts, ray_session, min_len=8)
        # every line is < 8 chars -> untouched
        assert got["text_clean"].tolist() == texts
        assert got["n_dropped"].tolist() == [0, 0]

    def test_min_len_boundary(self, ray_session):
        eight = "12345678"
        texts = [eight, eight, "1234567", "1234567"]
        got = _run(texts, ray_session, min_len=8)
        assert got["text_clean"].tolist() == [eight, "", "1234567", "1234567"]

    def test_matches_duckdb_adversarial(self, ray_session):
        """Exact parity with the SQL oracle on blanks, trailing
        newlines, unicode, empty docs and heavy cross-doc overlap."""
        import duckdb

        from pkd_tree_ray.lines import dedup_lines, sql_dedup_lines

        rng = np.random.RandomState(11)
        pool = [
            "the shared corpus line number %d" % i for i in range(12)
        ] + ["", "tiny", "número unicode de línea compartida"]
        texts = [
            "\n".join(pool[j] for j in rng.randint(0, len(pool), size=rng.randint(0, 9)))
            for _ in range(60)
        ] + ["", "\n", "trailing\n"]
        df = pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
        got = (
            dedup_lines(_ds(texts, ray_session))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", df)
        want = (
            con.execute(sql_dedup_lines())
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for col in ("text_clean", "n_lines", "n_dropped"):
            assert got[col].tolist() == want[col].tolist(), col

    def test_null_text(self, ray_session):
        import ray.data as rd

        from pkd_tree_ray.lines import dedup_lines

        t = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["real line content here", None], pa.string()),
            }
        )
        got = (
            dedup_lines(rd.from_arrow(t))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["text_clean"].tolist() == ["real line content here", ""]


class TestRepetitionScores:
    def test_basic(self, ray_session):
        from pkd_tree_ray.lines import repetition_scores

        texts = [
            "dup line content\ndup line content\nother line",  # 1/3 dup lines
            "a b a b a b",  # bigrams: "a b" x3, "b a" x2 -> top 3/5
            "",
        ]
        got = (
            repetition_scores(_ds(texts, ray_session))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["dup_line_permille"].tolist() == [333, 0, 0]
        # dup chars 16 of (16+16+10)=42 -> 380
        assert got["dup_line_char_permille"][0] == 1000 * 16 // 42
        # doc0 tokens span newlines: 8 tokens -> 7 bigrams, "dup line"
        # and "line content" each x2 -> top 2/7
        assert got["top_bigram_permille"].tolist() == [2000 // 7, 600, 0]
        assert got["n_bigrams"].tolist() == [7, 5, 0]

    def test_exotic_whitespace_matches_duckdb(self, ray_session):
        """Tokenization parity on codepoints where Unicode whitespace
        and RE2 ``\\s`` DISAGREE (VT, U+001C..1F, NBSP, U+0085,
        U+2028, U+3000): the kernel must split exactly like the
        oracle's ``regexp_extract_all(t, '\\S+')`` — the r4 driver
        hash-mismatch class."""
        import duckdb

        from pkd_tree_ray.lines import repetition_scores, sql_repetition_scores

        texts = [
            "a\x0bb a\x0bb c c",            # VT joins tokens under RE2
            "x\x1cy x\x1cy",                # file separator
            "n m n m end",        # NBSP
            "pq pq",            # NEL
            "i j k　l i j k　l",
            "plain ascii repeated plain ascii repeated",
            "\x1f\x1e \x1f\x1e",
            "",
        ]
        df = pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
        got = (
            repetition_scores(_ds(texts, ray_session))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", df)
        want = (
            con.execute(sql_repetition_scores())
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for col in got.columns:
            assert got[col].astype("int64").tolist() == want[col].astype(
                "int64"
            ).tolist(), col

    def test_tokenize_flat_re2_identity(self):
        """tokenize_flat == DuckDB regexp_extract_all('\\S+') token by
        token on divergence-prone inputs (slow path) AND pure-ASCII
        inputs (fast path)."""
        import duckdb

        from pkd_tree_ray.text import tokenize_flat

        con = duckdb.connect()
        batches = [
            ["a\x0bb", "a\x1cb", "n m", "pq", "i j",
             "k　l", " \x1f ", "", "mix \x0b end"],
            ["plain", "two words", "", " x y "],
        ]
        for batch in batches:
            flat, counts = tokenize_flat(pa.array(batch, pa.string()))
            toks = flat.to_pylist()
            pos = 0
            for s, c in zip(batch, counts):
                want = con.execute(
                    "select regexp_extract_all(?, ?)", [s, r"\S+"]
                ).fetchone()[0]
                assert toks[pos: pos + int(c)] == want, repr(s)
                pos += int(c)

    def test_matches_duckdb(self, ray_session):
        import duckdb

        from pkd_tree_ray.lines import repetition_scores, sql_repetition_scores

        rng = np.random.RandomState(5)
        words = ["x", "yy", "zzz", "wwww"]
        texts = []
        for _ in range(50):
            toks = [words[j] for j in rng.randint(0, 4, size=rng.randint(0, 30))]
            t = " ".join(toks).replace(" zzz ", "\n")
            texts.append(t)
        texts += ["", "\n\n", "solo"]
        df = pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
        got = (
            repetition_scores(_ds(texts, ray_session))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", df)
        want = (
            con.execute(sql_repetition_scores())
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for col in got.columns:
            assert got[col].astype("int64").tolist() == want[col].astype(
                "int64"
            ).tolist(), col
