"""Tests for the training-data operators: dedup, token/quality stats,
language id, MinHash/SimHash, fingerprints, ANN."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_ds(texts, ray_session):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": np.arange(len(texts), dtype=np.int64),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


class TestDedup:
    def test_exact_dedup(self, ray_session):
        from pkd_tree_ray.text import exact_dedup

        texts = ["aaa", "bbb", "aaa", "ccc", "bbb", "aaa"]
        got = (
            exact_dedup(_docs_ds(texts, ray_session))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["doc_id"].tolist() == [0, 1, 3]
        assert got["dup_cnt"].tolist() == [3, 2, 1]

    def test_dedup_survives_single_lane_collision(self, ray_session, monkeypatch):
        """128-bit composite key (VERDICT r2 #4): when one 64-bit lane
        collides for EVERY document (worst case, simulated by pinning
        lane-lo to a constant), distinct texts must still be kept
        distinct by the second lane."""
        import pkd_tree_ray.text as textmod
        from pkd_tree_ray.text import exact_dedup

        real = textmod._text_hash128

        def collided(col):
            lo, hi = real(col)
            return np.zeros_like(lo), hi  # total lane-lo collision

        monkeypatch.setattr(textmod, "_text_hash128", collided)
        texts = ["aaa", "bbb", "aaa", "ccc", "bbb", "aaa"]
        got = (
            exact_dedup(_docs_ds(texts, ray_session))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got["doc_id"].tolist() == [0, 1, 3]
        assert got["dup_cnt"].tolist() == [3, 2, 1]

        # control proving the patch reaches the workers: with BOTH
        # lanes pinned, everything must merge into one group — if the
        # monkeypatch did not propagate, this fails and the lane test
        # above proves nothing
        def all_collided(col):
            lo, hi = real(col)
            return np.zeros_like(lo), np.zeros_like(hi)

        monkeypatch.setattr(textmod, "_text_hash128", all_collided)
        got2 = exact_dedup(_docs_ds(texts, ray_session)).to_pandas()
        assert len(got2) == 1 and int(got2["dup_cnt"].iloc[0]) == 6

    def test_minhash_finds_near_dups(self, ray_session):
        from pkd_tree_ray.text import jaccard_verify, minhash_candidates

        base = "the quick brown fox jumps over the lazy dog again and again today"
        texts = [
            base,
            base + " extra",  # near-dup of 0
            "completely different words entirely unrelated content here now",
            base.replace("quick", "quickest"),  # near-dup of 0
            "another unrelated document with distinct vocabulary present",
        ]
        docs = _docs_ds(texts, ray_session)
        cand = minhash_candidates(docs).to_pandas()
        verified = jaccard_verify(docs, cand, threshold=0.4)
        pairs = set(zip(verified["doc_a"], verified["doc_b"]))
        assert (0, 1) in pairs
        assert not any(2 in p for p in pairs)

    def test_minhash_batch_matches_scalar(self):
        # the flat-token batch kernel must be bit-identical to the
        # per-doc scalar path for every doc shape (empty, None,
        # sub-window, repeated tokens, long)
        import numpy as np
        import pandas as pd

        from pkd_tree_ray.text import MinHasher

        mh = MinHasher()
        texts = [
            "", None, "one", "two words", "three word doc",
            "the quick brown fox jumps over the lazy dog",
            "a a a a a a", "x y z " * 50, "unique tokens everywhere " * 7,
        ]
        sig_b = mh.signatures_batch(pd.Series(texts))
        for i, t in enumerate(texts):
            assert np.array_equal(sig_b[i], mh.signature(t)), f"doc {i}"

    def test_simhash_similar_texts_close(self, ray_session):
        from pkd_tree_ray.text import simhash

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        texts = [base, base + " lambda", "one two three four five six seven"]
        df = simhash(_docs_ds(texts, ray_session)).to_pandas().sort_values("doc_id")
        h = df["simhash"].to_numpy().astype(np.uint64)
        d01 = bin(int(h[0] ^ h[1])).count("1")
        d02 = bin(int(h[0] ^ h[2])).count("1")
        assert d01 < d02

    def test_fingerprint_deterministic(self, ray_session):
        from pkd_tree_ray.text import fingerprints

        texts = ["a b c d e f g", "a b c d e f g", "x y z w v u t"]
        df = fingerprints(_docs_ds(texts, ray_session)).to_pandas().sort_values("doc_id")
        fp = df["fingerprint"].tolist()
        assert fp[0] == fp[1] != fp[2]


class TestTextStats:
    def test_token_stats(self, ray_session):
        from pkd_tree_ray.text import token_stats

        texts = ["one two  three", " lead trail ", "dup dup dup"]
        df = token_stats(_docs_ds(texts, ray_session)).to_pandas().sort_values("doc_id")
        assert df["n_tokens"].tolist() == [3, 2, 3]
        assert df["n_uniq"].tolist() == [3, 2, 1]
        assert df["n_alpha"].tolist() == [11, 9, 9]

    def test_quality_scores(self, ray_session):
        from pkd_tree_ray.text import quality_scores

        texts = ["the cat sat on the mat", "unique words only here"]
        df = quality_scores(_docs_ds(texts, ray_session)).to_pandas().sort_values("doc_id")
        # 2x "the" in 6 tokens -> floor(2000/6) = 333
        assert df["stop_permille"].tolist()[0] == 333
        assert df["uniq_permille"].tolist()[1] == 1000

    def test_bpe_count_matches_duckdb(self):
        """n_bpe's Python regex must agree with the DuckDB RE2 pattern
        in oracle_sql() on adversarial inputs (unicode, >3-digit runs,
        punctuation runs, mixed alnum) — the driver compares them."""
        import duckdb
        import pandas as pd

        from pkd_tree_ray.text import TextStats

        texts = [
            "abc1234567def!!??  x9y",
            "número 100000 — ça va? 日本語テスト 12345",
            "a1b2c3 ... $$$ 999 9999 99999",
            "",
            "   ",
            "tabs\tand\nnewlines 42",
        ]
        ts = TextStats()
        got = ts(pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))[
            "n_bpe"
        ].tolist()
        con = duckdb.connect()
        want = [
            con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [t, TextStats.BPE_RE]
            ).fetchone()[0]
            for t in texts
        ]
        assert got == want

    def test_lang_id(self, ray_session):
        from pkd_tree_ray.text import lang_id

        texts = [
            "the cat and the dog is here to stay",
            "der hund und die katze ist da",
            "le chat et les chiens des villes",
            "没有外部数据",
        ]
        df = lang_id(_docs_ds(texts, ray_session)).to_pandas().sort_values("doc_id")
        assert df["pred_lang"].tolist() == ["en", "de", "fr", "zh"]

    def test_doc_profile_matches_standalone_ops(self, ray_session):
        """The fused one-pass profiler must emit exactly the standalone
        operators' values, reshaped long-form."""
        import pandas as pd

        from pkd_tree_ray.text import (
            classifier_scores,
            doc_profile,
            lang_id,
            quality_scores,
            token_stats,
        )

        texts = [
            "the cat and the dog is here to stay",
            "der hund und die katze ist da",
            "numbers 123456789 and punct!!! runs",
            "",
            "   ",
        ]
        got = (
            doc_profile(_docs_ds(texts, ray_session))
            .to_pandas()
            .sort_values(["doc_id", "metric"])
            .reset_index(drop=True)
        )
        ds = _docs_ds(texts, ray_session)
        want_rows = []
        for df, metrics, rename in [
            (token_stats(ds).to_pandas(),
             ["n_tokens", "n_uniq", "n_alpha", "n_bpe"], {}),
            (quality_scores(ds).to_pandas(),
             ["stop_permille", "uniq_permille"], {}),
            (classifier_scores(ds).to_pandas(),
             ["n_tokens", "logit", "keep"], {"n_tokens": "cls_n_tokens"}),
            (lang_id(ds).to_pandas(), ["pred_lang"], {}),
        ]:
            for _, row in df.iterrows():
                for m in metrics:
                    want_rows.append(
                        (int(row["doc_id"]), rename.get(m, m), str(row[m]))
                    )
        want = (
            pd.DataFrame(want_rows, columns=["doc_id", "metric", "value"])
            .sort_values(["doc_id", "metric"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)

    def test_doc_profile_exotic_whitespace_matches_duckdb(self, ray_session):
        """TextStats/QualityScore (Python re) vs the RE2 SQL oracle on
        codepoints where Python's Unicode \\s and RE2's ASCII \\s
        disagree (VT, NBSP, U+001C): the explicit character classes in
        _TOKEN_RE/BPE_RE make the two engines tokenize identically."""
        import duckdb
        import pandas as pd

        import __ray_entry__ as entrymod
        from pkd_tree_ray.text import doc_profile

        texts = [
            "a\x0bb the a\x0bb",      # VT inside tokens
            "n\xa0m the n\xa0m end",  # NBSP
            "x\x1cy \x1f\x1e",        # information separators
            "plain the text",
            "",
        ]
        ids = np.arange(len(texts), dtype=np.int64)
        got = (
            doc_profile(_docs_ds(texts, ray_session))
            .to_pandas()
            .sort_values(["doc_id", "metric"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", pd.DataFrame({"doc_id": ids, "text": texts}))
        want = (
            con.execute(entrymod._doc_profile_sql())
            .df()
            .sort_values(["doc_id", "metric"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)

    def test_redact_pii(self, ray_session):
        from pkd_tree_ray.text import redact_pii

        texts = [
            "mail me at bob.smith+x@example.co.uk or call +1 (555) 123-4567",
            "server at 10.0.255.3 and 192.168.1.1, no phone",
            "plain text, nothing sensitive",
        ]
        df = (
            redact_pii(_docs_ds(texts, ray_session))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert df["n_email"].tolist() == [1, 0, 0]
        assert df["n_ip"].tolist() == [0, 2, 0]
        assert df["n_phone"].tolist() == [1, 0, 0]
        r0 = df["text_redacted"][0]
        assert "<EMAIL>" in r0 and "<PHONE>" in r0
        assert "example" not in r0 and "4567" not in r0
        assert df["text_redacted"][1] == "server at <IP> and <IP>, no phone"
        assert df["text_redacted"][2] == texts[2]

    def test_redact_pii_matches_duckdb(self):
        """The sequential scrub chain must agree with the SQL oracle on
        adversarial inputs: an email whose host looks like an IP, a
        phone adjacent to an IP, digit runs at rule boundaries."""
        import duckdb

        from pkd_tree_ray.text import PiiRedactor, sql_redact_pii

        texts = [
            "x@10.0.0.1.example.com then 10.0.0.1 then +44 20 7946 0958",
            "1.2.3.4.5.6 overlong, phone-ish 0123456789, a@b.co",
            "edge (555)1234567 and 999.999.999.999",
            "",
            "no digits here at all",
        ]
        df = pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
        got = PiiRedactor()(df).sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("documents", df)
        want = (
            con.execute(sql_redact_pii())
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for col in ("n_email", "n_ip", "n_phone", "text_redacted"):
            assert got[col].tolist() == want[col].tolist(), col


class TestAnn:
    @pytest.fixture()
    def emb_ds(self, ray_session):
        import ray.data as rd

        rng = np.random.RandomState(7)
        vecs = rng.randn(300, 16).astype(np.float32)
        t = pa.table(
            {
                "vec_id": np.arange(300, dtype=np.int64),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
                "label": np.zeros(300, dtype=np.int32),
            }
        )
        return rd.from_arrow(t), vecs

    def test_bruteforce_matches_numpy(self, emb_ds):
        from pkd_tree_ray.ann import QUANT, ann_bruteforce

        ds, vecs = emb_ds
        q = vecs[:5]
        got = ann_bruteforce(ds, q, k=10).to_pandas().sort_values(["qid", "rank"])
        qq = np.floor(q.astype(np.float64) * QUANT).astype(np.int64)
        pq = np.floor(vecs.astype(np.float64) * QUANT).astype(np.int64)
        d2 = ((qq[:, None, :] - pq[None, :, :]) ** 2).sum(-1)
        for qi in range(5):
            order = np.lexsort((np.arange(300), d2[qi]))[:10]
            sub = got[got["qid"] == qi]
            assert sub["score"].tolist() == d2[qi][order].tolist()
            assert sub["rank"].tolist() == list(range(1, 11))

    def test_ivf_recall(self, emb_ds):
        from pkd_tree_ray.ann import ann_bruteforce, ann_ivf

        ds, vecs = emb_ds
        q = vecs[:10]
        exact = ann_bruteforce(ds, q, k=5).to_pandas()
        approx = ann_ivf(ds, q, k=5, n_lists=8, nprobe=3).to_pandas()
        hits = 0
        for qi in range(10):
            e = set(exact[exact["qid"] == qi]["neighbor"])
            a = set(approx[approx["qid"] == qi]["neighbor"])
            hits += len(e & a) / len(e)
        assert hits / 10 >= 0.6  # recall with 3/8 probes

    def test_ivf_exhaustive_equals_bruteforce(self, emb_ds):
        """nprobe = n_lists probes every list -> the IVF
        partition/scan/merge must reproduce brute force bit-for-bit
        (incl. (score, neighbor) tie-breaks at the kth boundary)."""
        from pkd_tree_ray.ann import ann_bruteforce, ann_ivf

        ds, vecs = emb_ds
        q = vecs[:8]
        exact = (
            ann_bruteforce(ds, q, k=5)
            .to_pandas()
            .sort_values(["qid", "rank"])
            .reset_index(drop=True)
        )
        full = (
            ann_ivf(ds, q, k=5, n_lists=8, nprobe=8)
            .to_pandas()
            .sort_values(["qid", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(exact, full)


class TestEmbeddingNearDup:
    def test_finds_planted_duplicates(self, ray_session):
        import ray.data as rd
        import pyarrow as pa

        from pkd_tree_ray.ann import embedding_neardup

        rng = np.random.RandomState(7)
        base = rng.standard_normal((300, 32)).astype(np.float32)
        # plant near-dups: rows 300..319 are tiny perturbations of 0..19
        dup = base[:20] + rng.standard_normal((20, 32)).astype(np.float32) * 0.01
        mat = np.concatenate([base, dup])
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(len(mat)), pa.int64()),
                "embedding": pa.array(list(mat), pa.list_(pa.float32())),
            }
        )
        out = embedding_neardup(rd.from_arrow(tbl), threshold=0.98).to_pandas()
        found = set(zip(out["vec_a"], out["vec_b"]))
        planted = {(i, 300 + i) for i in range(20)}
        # LSH recall: expect the vast majority of planted pairs
        assert len(planted & found) >= 16
        # precision exact: every reported pair really has cos >= 0.98
        for a, b, c in zip(out["vec_a"], out["vec_b"], out["cos_permille"]):
            va, vb = mat[a].astype(np.float64), mat[b].astype(np.float64)
            cos = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
            assert cos >= 0.98
            assert int(cos * 1000) == c


class TestNearDupScale:
    def test_degenerate_identical_corpus_bounded(self, ray_session):
        """An all-identical corpus (worst-case LSH skew: every doc in
        every bucket) must finish with pair counts bounded ~O(n), not
        O(n^2) — the star+chain bucket cap (r1 weak item)."""
        import pandas as pd
        import ray.data as rd

        from pkd_tree_ray.text import minhash_candidates, minhash_neardup

        n = 3_000
        texts = ["identical boilerplate text repeated in every document body"] * n
        docs = rd.from_pandas(
            pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})
        )
        cand = minhash_candidates(docs).to_pandas()
        # all-pairs would be n*(n-1)/2 = 4.5M; star+chain bounds each
        # band's bucket at 2n pairs, deduped across 16 bands
        assert 0 < len(cand) <= 4 * n
        out = minhash_neardup(docs, threshold=0.9, candidates=rd.from_pandas(cand)).to_pandas()
        # every emitted pair verifies at jaccard 1000 (identical)
        assert (out["jaccard_permille"] == 1000).all()
        # the dup GROUP stays fully connected through star pairs
        assert (out["doc_a"] == 0).sum() >= 1

    def test_bucket_pairs_bounded_degree_and_connected(self):
        """Segmented star+chain: O(B) edges, per-doc degree <= cap+2,
        and the bucket stays one connected component (the clustering
        invariant).  A single global star center (r2) concentrated
        O(B) payload copies in one attach task."""
        from pkd_tree_ray.pairjoin import bucket_pairs_capped

        rng = np.random.RandomState(3)
        ids = rng.choice(10_000_000, size=5_000, replace=False).astype(np.int64)
        a, b = bucket_pairs_capped(ids, cap=64)
        assert len(a) <= 2 * len(ids)
        deg = np.bincount(
            np.searchsorted(np.sort(ids), np.concatenate([a, b]))
        )
        assert deg.max() <= 64 + 2
        # connectivity via union-find
        parent = {int(i): int(i) for i in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for x, y in zip(a, b):
            parent[find(int(x))] = find(int(y))
        assert len({find(int(i)) for i in ids}) == 1

    def test_batch_verify_matches_scalar_jaccard(self, ray_session):
        """The vectorized batch Jaccard kernel must agree exactly with
        the per-pair scalar verify_fn it replaced."""
        import pyarrow as pa

        from pkd_tree_ray.pairjoin import list_flat

        rng = np.random.RandomState(11)
        sets = [
            np.unique(rng.choice(2_000, size=rng.randint(1, 120)).astype(np.int64))
            for _ in range(200)
        ]
        pa_col = pa.array([s.tolist() for s in sets[:100]], pa.list_(pa.int64()))
        pb_col = pa.array([s.tolist() for s in sets[100:]], pa.list_(pa.int64()))
        va, ia = list_flat(pa_col)
        vb, ib = list_flat(pb_col)
        n = 100
        la = np.bincount(ia, minlength=n)
        lb = np.bincount(ib, minlength=n)
        pi = np.concatenate([ia, ib])
        tok = np.concatenate([va, vb])
        order = np.lexsort((tok, pi))
        pi_s, tok_s = pi[order], tok[order]
        dup = (pi_s[1:] == pi_s[:-1]) & (tok_s[1:] == tok_s[:-1])
        inter = np.bincount(pi_s[1:][dup], minlength=n)
        for j in range(n):
            want = len(np.intersect1d(sets[j], sets[100 + j], assume_unique=True))
            assert inter[j] == want

    def test_distributed_verify_matches_threshold_semantics(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from pkd_tree_ray.text import minhash_neardup

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
        texts = [base, base + " nu", "unrelated totally different words here"]
        docs = rd.from_pandas(
            pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64), "text": texts})
        )
        out = minhash_neardup(docs, threshold=0.4).to_pandas()
        pairs = set(zip(out["doc_a"], out["doc_b"]))
        assert (0, 1) in pairs
        assert not any(2 in p for p in pairs)


class TestIvfPersistence:
    def test_query_reads_only_probed_lists(self, ray_session, tmp_path):
        """The persisted IVF layout must answer a query by reading only
        the nprobe probed lists' files (r1 weak item: the old path
        re-scanned the whole corpus per query call)."""
        import pandas as pd
        import ray.data as rd

        from pkd_tree_ray.ann import IvfIndex

        rng = np.random.RandomState(5)
        n, d = 2_000, 16
        vecs = rng.standard_normal((n, d)).astype(np.float32)
        ds = rd.from_pandas(
            pd.DataFrame(
                {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(vecs)}
            )
        )
        idx = IvfIndex.build(ds, str(tmp_path), n_lists=8)
        assert len(idx.list_files) >= 4
        out = idx.query(vecs[:5], k=3, nprobe=2)
        assert out.num_rows == 15
        # each of the 5 queries probes 2 lists -> at most 10 distinct
        # files; must be a strict subset of all list files
        assert 0 < len(idx.last_files_read) <= min(10, len(idx.list_files))
        assert len(idx.last_files_read) < len(idx.list_files) or len(idx.list_files) <= 10

    def test_reopen_and_requery(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data as rd

        from pkd_tree_ray.ann import IvfIndex

        rng = np.random.RandomState(6)
        n, d = 1_000, 8
        vecs = rng.standard_normal((n, d)).astype(np.float32)
        ds = rd.from_pandas(
            pd.DataFrame(
                {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(vecs)}
            )
        )
        idx = IvfIndex.build(ds, str(tmp_path), n_lists=4)
        a = idx.query(vecs[:3], k=5).to_pandas()
        re = IvfIndex.open(str(tmp_path))
        b = re.query(vecs[:3], k=5).to_pandas()
        pd.testing.assert_frame_equal(a, b)


class TestSimhashNearDup:
    def test_popcount64(self):
        from pkd_tree_ray.text import popcount64

        rng = np.random.default_rng(7)
        x = rng.integers(-(2**62), 2**62, size=1000, dtype=np.int64)
        ref = np.array([bin(int(v) & 0xFFFFFFFFFFFFFFFF).count("1") for v in x])
        assert np.array_equal(popcount64(x), ref)
        assert popcount64(np.zeros(0, np.int64)).shape == (0,)

    def test_finds_hamming_close_pairs(self, ray_session):
        """Near-identical texts must land within the Hamming ball;
        unrelated texts must not."""
        from pkd_tree_ray.text import popcount64, simhash, simhash_neardup

        rng = np.random.default_rng(3)
        words = [f"tok{i}" for i in range(400)]
        base = [
            " ".join(rng.choice(words, size=60).tolist()) for _ in range(40)
        ]
        # doc 40+i = doc i with ONE word changed -> SimHash within a
        # few bits of its source
        mutated = []
        for t in base:
            parts = t.split()
            parts[7] = "zzz" + parts[7]
            mutated.append(" ".join(parts))
        docs = _docs_ds(base + mutated, ray_session)
        out = simhash_neardup(docs, max_hamming=3).to_pandas()
        found = set(zip(out["doc_a"], out["doc_b"]))
        # ground truth from the signatures themselves: every pair
        # within hamming<=3 MUST be reported (pigeonhole = recall 1
        # modulo the bucket cap, which this corpus stays far below)
        sims = (
            simhash(docs).to_pandas().sort_values("doc_id")["simhash"].to_numpy()
        )
        n = len(sims)
        ii, jj = np.triu_indices(n, k=1)
        hm = popcount64(sims[ii] ^ sims[jj])
        truth = {(int(a), int(b)) for a, b in zip(ii[hm <= 3], jj[hm <= 3])}
        assert found == truth
        # a one-word edit usually (not always) stays within 3 bits
        assert len(truth & {(i, 40 + i) for i in range(40)}) >= 15

    def test_hamming_values_exact(self, ray_session):
        from pkd_tree_ray.text import popcount64, simhash, simhash_neardup

        texts = ["a b c d e f g h"] * 3 + ["a b c d e f g x", "q r s t u v w"]
        docs = _docs_ds(texts, ray_session)
        out = simhash_neardup(docs, max_hamming=8).to_pandas()
        sims = (
            simhash(docs).to_pandas().sort_values("doc_id")["simhash"].to_numpy()
        )
        for _, r in out.iterrows():
            expect = int(popcount64(np.array([sims[r.doc_a] ^ sims[r.doc_b]]))[0])
            assert r.hamming == expect <= 8
        # identical texts: hamming 0 pairs all present
        assert {(0, 1), (0, 2), (1, 2)} <= set(zip(out["doc_a"], out["doc_b"]))


class TestNgramJaccardNearDup:
    def test_exact_recall_vs_bruteforce(self, ray_session):
        """No-MinHash exact dedup: output == brute-force all-pairs
        Jaccard over the same shingle sets (corpus below the hot-
        shingle cap)."""
        from pkd_tree_ray.text import _shingle_hashes, ngram_jaccard_neardup

        rng = np.random.default_rng(11)
        words = [f"w{i}" for i in range(500)]
        texts = []
        for i in range(30):
            t = rng.choice(words, size=40).tolist()
            texts.append(" ".join(t))
            # planted near-dup: drop 3 words
            texts.append(" ".join(t[:-3]))
        docs = _docs_ds(texts, ray_session)
        out = ngram_jaccard_neardup(docs, threshold=0.5).to_pandas()
        got = {
            (int(r.doc_a), int(r.doc_b), int(r.jaccard_permille))
            for _, r in out.iterrows()
        }
        sets = [_shingle_hashes(t, 3) for t in texts]
        expect = set()
        for a in range(len(texts)):
            for b in range(a + 1, len(texts)):
                inter = len(np.intersect1d(sets[a], sets[b], assume_unique=True))
                union = max(1, len(sets[a]) + len(sets[b]) - inter)
                if inter * 1000 >= 500 * union:
                    expect.add((a, b, (inter * 1000) // union))
        assert got == expect
        # all 30 planted pairs found
        assert len({(2 * i, 2 * i + 1) for i in range(30)} & {(a, b) for a, b, _ in got}) == 30


class TestAmplifiedFixtures:
    """The bench-scale corpus amplifiers: deterministic, unique docs,
    planted near-dup signal."""

    def test_amplified_documents_shape_and_signal(self, ray_session):
        from pkd_tree_ray.fixtures import amplified_documents

        docs = amplified_documents("/root/testdata/sf0.001", rep=4).materialize()
        import pyarrow as pa

        t = pa.concat_tables(
            [pa.table(b) for b in docs.iter_batches(batch_format="pyarrow", batch_size=None)]
        )
        base_n = 500  # sf0.001 documents rows
        assert t.num_rows == base_n * 4
        ids = np.sort(t["doc_id"].to_numpy())
        assert ids[0] == 0 and len(np.unique(ids)) == len(ids)
        texts = dict(zip(t["doc_id"].to_numpy(), t["text"].to_pylist()))
        # replica 0 is the base text; doc 0's replica 1 is the planted
        # near-dup (doc_id % 100 == 0 at neardup_every=100); other
        # replicas are word-permutations (same multiset, different order)
        assert texts[1] == texts[0] + " pkdnear"
        for j in (2, 3):
            assert texts[j] != texts[0]
            assert sorted(texts[j].split()) == sorted(texts[0].split())
        # determinism
        docs2 = amplified_documents("/root/testdata/sf0.001", rep=4)
        t2 = pa.concat_tables(
            [pa.table(b) for b in docs2.iter_batches(batch_format="pyarrow", batch_size=None)]
        )
        assert sorted(t2["text"].to_pylist()) == sorted(t["text"].to_pylist())

    def test_amplified_embeddings_noise_bounded(self, ray_session):
        from pkd_tree_ray.fixtures import amplified_embeddings

        emb = amplified_embeddings("/root/testdata/sf0.001", rep=3, noise=0.05).materialize()
        import pyarrow as pa

        t = pa.concat_tables(
            [pa.table(b) for b in emb.iter_batches(batch_format="pyarrow", batch_size=None)]
        )
        ids = t["vec_id"].to_numpy()
        mats = {i: np.asarray(v, dtype=np.float32) for i, v in zip(ids, t["embedding"].to_pylist())}
        base = mats[0]  # vec 0 replica 0
        for j in (1, 2):
            d = np.abs(mats[j] - base)
            assert d.max() <= 0.05 + 1e-6 and d.max() > 0


class TestCurateCorpus:
    def test_gate_then_dedup_matches_brute(self, ray_session):
        """Composite = filter(quality) then exact-dedup, verified
        against a driver-side recomputation."""
        import re

        import pandas as pd
        import ray.data as rd

        from pkd_tree_ray.text import _STOPWORDS, curate_corpus

        texts = (
            ["the a and of to unique words here"] * 3  # high stop, dup x3
            + ["the the the the"]  # high stop, LOW uniqueness
            + ["alpha beta gamma delta"]  # zero stopwords
            + ["the quick brown fox of a kind and more to come"] * 2
        )
        df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
        got = (
            curate_corpus(rd.from_pandas(df), 60, 300)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

        tok = re.compile(r"\S+")
        keep = []
        for _, r in df.iterrows():
            t = tok.findall(r.text)
            n = max(len(t), 1)
            sp = sum(w in _STOPWORDS for w in t) * 1000 // n
            up = len(set(t)) * 1000 // n
            if sp >= 60 and up >= 300:
                keep.append(r)
        kd = pd.DataFrame(keep)
        want = (
            kd.groupby("text")
            .agg(doc_id=("doc_id", "min"), dup_cnt=("doc_id", "size"))
            .reset_index(drop=True)
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert got.astype(want.dtypes.to_dict()).equals(want)
