"""Empty-input and block-fragmentation hardening.

The r4 driver (num_cpus=32) crashed vocab_topk/tfidf_topk on empty
ZERO-COLUMN aggregate blocks that local low-parallelism runs never
produce.  These tests force that block shape deliberately: tiny
corpora repartitioned into 64 blocks give every aggregate stage many
empty input blocks — the same class the driver's parallelism creates —
plus literal empty and 1-row corpora for the degenerate paths.
"""

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(texts, n_blocks=None):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": np.arange(len(texts), dtype=np.int64),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    if n_blocks:
        ds = ds.repartition(n_blocks)
    return ds


def _events_ds(n, n_blocks=None):
    import ray.data as rd

    ts = np.arange(n, dtype=np.int64) * 400_000_000  # 400 s apart
    ds = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "user_id": pa.array(np.arange(n, dtype=np.int64) % 3),
                "ts": pa.array(ts.astype("datetime64[us]")),
                "event_type": pa.array(
                    ["click" if i % 2 else "purchase" for i in range(n)],
                    pa.string(),
                ),
                "value": pa.array(np.linspace(0, 5, n)),
            }
        )
    )
    if n_blocks:
        ds = ds.repartition(n_blocks)
    return ds


def _emb_ds(n, dim=8, n_blocks=None):
    import ray.data as rd

    rng = np.random.RandomState(3)
    mats = rng.rand(n, dim).astype(np.float32)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(mats), pa.list_(pa.float32())),
            }
        )
    )
    if n_blocks:
        ds = ds.repartition(n_blocks)
    return ds


_TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "",
    "   ",
    "one",
] * 3  # 18 docs -> 64 blocks = mostly empty blocks


def _doc_ops():
    from pkd_tree_ray import lines, sketches, text

    return {
        "vocab_topk": lambda d: text.vocab_topk(d, k=5),
        "tfidf_topk": lambda d: text.tfidf_topk(d, k=3).to_pandas(),
        "tfidf_topk_shuffle": lambda d: text.tfidf_topk(
            d, k=3, vocab_cap=1, n_buckets=3
        ).to_pandas(),
        "heavy_hitters": lambda d: sketches.heavy_hitters(d, k=5, cap=16),
        "hll_tokens": lambda d: sketches.hll_tokens(d).to_pandas(),
        "exact_dedup": lambda d: text.exact_dedup(d).to_pandas(),
        "curate_corpus": lambda d: text.curate_corpus(d).to_pandas(),
        "token_stats": lambda d: text.token_stats(d).to_pandas(),
        "quality_scores": lambda d: text.quality_scores(d).to_pandas(),
        "classifier_scores": lambda d: text.classifier_scores(d).to_pandas(),
        "lang_id": lambda d: text.lang_id(d).to_pandas(),
        "redact_pii": lambda d: text.redact_pii(d).to_pandas(),
        "simhash": lambda d: text.simhash(d).to_pandas(),
        "fingerprints": lambda d: text.fingerprints(d).to_pandas(),
        "minhash_neardup": lambda d: text.minhash_neardup(d, threshold=0.5).to_pandas(),
        "simhash_neardup": lambda d: text.simhash_neardup(d, max_hamming=3).to_pandas(),
        "ngram_neardup": lambda d: text.ngram_jaccard_neardup(
            d, threshold=0.5
        ).to_pandas(),
        "dedup_lines": lambda d: lines.dedup_lines(d).to_pandas(),
        "repetition_scores": lambda d: lines.repetition_scores(d).to_pandas(),
        "doc_profile": lambda d: text.doc_profile(d).to_pandas(),
    }


class TestFragmentedBlocks:
    """18-doc corpus over 64 blocks: every groupby sees mostly-empty
    input blocks, the exact shape behind the r4 32-CPU crashes."""

    @pytest.mark.parametrize("op", sorted(_doc_ops()))
    def test_doc_op_survives(self, ray_session, op):
        out = _doc_ops()[op](_docs_ds(_TEXTS, n_blocks=64))
        assert out is not None
        n = out.num_rows if isinstance(out, pa.Table) else len(out)
        assert n >= 0  # no crash, sane result object

    def test_vocab_topk_values(self, ray_session):
        from pkd_tree_ray.text import vocab_topk

        got = vocab_topk(_docs_ds(_TEXTS, n_blocks=64), k=2).to_pandas()
        # 'the' x2 per copy x6 copies = 12; the other first-sentence
        # words tie at 6, broken (cnt DESC, term ASC) -> 'brown'
        assert got["term"].tolist() == ["the", "brown"]
        assert got["cnt"].tolist() == [12, 6]

    def test_temporal_ops_survive(self, ray_session):
        from pkd_tree_ray.temporal import asof_join, sessionize, window_agg

        ev = _events_ds(12, n_blocks=64)
        assert len(window_agg(ev, width_s=3600).to_pandas()) > 0
        # 400 s inter-event gaps < 1800 s -> one session per user
        assert len(sessionize(ev, gap_s=1800).to_pandas()) == 3
        assert asof_join(ev, "purchase", "click").to_pandas() is not None

    def test_embedding_ops_survive(self, ray_session):
        from pkd_tree_ray.clustering import kmeans_assign, semdedup

        emb = _emb_ds(40, n_blocks=64)
        assert len(kmeans_assign(emb, k=4, seed=1).to_pandas()) == 40
        assert len(semdedup(emb, k=4, seed=1, threshold=0.99).to_pandas()) == 40


_AGG_OPS = [
    "vocab_topk", "tfidf_topk", "tfidf_topk_shuffle", "heavy_hitters",
    "hll_tokens", "exact_dedup", "dedup_lines", "repetition_scores",
]


class TestDegenerateCorpora:
    @pytest.mark.parametrize("op", _AGG_OPS)
    @pytest.mark.parametrize("texts", [["solo doc with words"], [""]],
                             ids=["one_row", "one_empty_row"])
    def test_agg_op_survives(self, ray_session, op, texts):
        out = _doc_ops()[op](_docs_ds(texts, n_blocks=8))
        assert out is not None
