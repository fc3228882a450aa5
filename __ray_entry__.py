"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship pipeline smoke at sf0.001.
``queries()`` — one callable per implemented pipeline (SURVEY.md §2);
each takes ``sf_dir`` and returns a Dataset / DataFrame / pyarrow
Table.  ``oracle_sql()`` — the DuckDB-equivalent SQL for every
SQL-expressible query (identical literal workloads, identical
SQL-exact coordinate derivation — see
:mod:`pkd_tree_ray.sources` / :mod:`pkd_tree_ray.workloads`).

Ray is initialised by the driver BEFORE this module is imported; no
``ray.init``/``ray.shutdown`` anywhere down this import tree.

Spatial queries run over points derived from the ``lineitem`` /
``orders`` / ``customer`` tables with multiplicative hashes that DuckDB
reproduces exactly (BIGINT arithmetic, no overflow at test scales).
Indexes are built once per (sf_dir, variant) into /tmp and cached
in-process; the on-disk layout is resumable so repeated runs reuse
finished cells.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pkd_tree_ray.config import EngineConfig
from pkd_tree_ray import sources, workloads
from pkd_tree_ray.index import PkdIndex

_CFG = EngineConfig(target_cell_rows=8_192, batch_size=32_768)
#: d=3 engine config — the reference's headline dimensionality
#: (build/kNN baselines are d=3, script/data/build.csv); dimension is a
#: runtime parameter here vs the reference's compile-time dispatch
#: (tests/test.cpp:569-617)
_CFG3 = EngineConfig(dims=("x", "y", "z"), target_cell_rows=8_192, batch_size=32_768)
_INDEX_CACHE: dict[tuple, Any] = {}


def _code_fingerprint() -> str:
    """Hash of the engine source files.  Baked into every /tmp cache
    path so on-disk state written by a DIFFERENT code revision (a prior
    round's driver pass) is never trusted — the r2 empty-CORRECTNESS
    postmortem's prime suspect was cross-round /tmp reuse."""
    import glob

    h = hashlib.sha1()
    root = os.path.dirname(os.path.abspath(__file__))
    files = sorted(glob.glob(os.path.join(root, "pkd_tree_ray", "*.py")))
    files.append(os.path.abspath(__file__))
    for f in files:
        with open(f, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()[:10]


_CODE_FP = _code_fingerprint()


def _idx_path(sf_dir: str, variant: str) -> str:
    slug = hashlib.sha1(f"{sf_dir}:{variant}:{_CODE_FP}".encode()).hexdigest()[:16]
    return f"/tmp/pkd_idx/{slug}"


def _build_robust(points_factory, path: str, cfg, id_col: str = "point_id") -> PkdIndex:
    """Build with resume; if anything on the cached path is poisoned
    (stale/corrupt part files, mismatched manifest), wipe the directory
    and rebuild from scratch ONCE — a single query entry must never
    take down the whole driver correctness pass."""
    import shutil

    try:
        return PkdIndex.build(points_factory(), path, cfg, id_col=id_col)
    except Exception:
        shutil.rmtree(path, ignore_errors=True)
        return PkdIndex.build(points_factory(), path, cfg, id_col=id_col, resume=False)


def _base_index(sf_dir: str) -> PkdIndex:
    key = (sf_dir, "lineitem")
    if key not in _INDEX_CACHE:
        _INDEX_CACHE[key] = _build_robust(
            lambda: sources.lineitem_points(sf_dir), _idx_path(sf_dir, "lineitem"), _CFG
        )
    return _INDEX_CACHE[key]


def _base_index_3d(sf_dir: str) -> PkdIndex:
    key = (sf_dir, "lineitem3d")
    if key not in _INDEX_CACHE:
        _INDEX_CACHE[key] = _build_robust(
            lambda: sources.lineitem_points_3d(sf_dir),
            _idx_path(sf_dir, "lineitem3d"),
            _CFG3,
        )
    return _INDEX_CACHE[key]


def _base_index_float(sf_dir: str) -> PkdIndex:
    """Index over the float64-derived, grid-quantized point table (the
    harness' coord=double variant, testFramework.h:18-19)."""
    key = (sf_dir, "lineitem_float")
    if key not in _INDEX_CACHE:
        def pts():
            return sources.lineitem_points_float(sf_dir).map_batches(
                lambda t: t.select(["point_id", "x", "y"]), batch_format="pyarrow"
            )

        _INDEX_CACHE[key] = _build_robust(
            pts, _idx_path(sf_dir, "lineitem_float"), _CFG
        )
    return _INDEX_CACHE[key]


def _base_index_float_native(sf_dir: str) -> PkdIndex:
    """Float-NATIVE index: raw double coordinates indexed without
    quantization via order-preserving keys (floatindex.build_float) —
    the reference's true coord=double semantics (comparator.h:10-79)."""
    from pkd_tree_ray.floatindex import build_float

    key = (sf_dir, "lineitem_float_native")
    if key not in _INDEX_CACHE:
        import shutil

        path = _idx_path(sf_dir, "lineitem_float_native")

        def pts():
            return sources.lineitem_points_float(sf_dir).map_batches(
                lambda t: t.select(["point_id", "xf", "yf"]), batch_format="pyarrow"
            )

        try:
            _INDEX_CACHE[key] = build_float(
                pts(), path, _CFG, float_dims=("xf", "yf"), id_col="point_id"
            )
        except Exception:
            shutil.rmtree(path, ignore_errors=True)
            _INDEX_CACHE[key] = build_float(
                pts(), path, _CFG, float_dims=("xf", "yf"), id_col="point_id",
                resume=False,
            )
    return _INDEX_CACHE[key]


def _inserted_index(sf_dir: str) -> PkdIndex:
    """Base index + batch insert of the orders-derived points."""
    key = (sf_dir, "inserted")
    if key not in _INDEX_CACHE:
        import shutil

        path = _idx_path(sf_dir, "inserted")
        shutil.rmtree(path, ignore_errors=True)
        base = PkdIndex.build(
            sources.lineitem_points(sf_dir), path, _CFG, id_col="point_id"
        )
        _INDEX_CACHE[key] = base.insert(sources.orders_points(sf_dir))
    return _INDEX_CACHE[key]


def _deleted_index(sf_dir: str) -> PkdIndex:
    """Base index minus rows with point_id % 10 == 0 (FullCovered:
    delete rows drawn FROM the table, batch_delete.hpp:81-91)."""
    key = (sf_dir, "deleted")
    if key not in _INDEX_CACHE:
        import shutil

        path = _idx_path(sf_dir, "deleted")
        shutil.rmtree(path, ignore_errors=True)
        base = PkdIndex.build(
            sources.lineitem_points(sf_dir), path, _CFG, id_col="point_id"
        )
        victims = sources.lineitem_points(sf_dir).map_batches(
            lambda t: t.filter(pa.array(t["point_id"].to_numpy() % 10 == 0)),
            batch_format="pyarrow",
        )
        _INDEX_CACHE[key] = base.delete(victims, strict=True)
    return _INDEX_CACHE[key]


# ----------------------------------------------------------------------
# query implementations
# ----------------------------------------------------------------------

def _q_selfcheck(sf_dir: str) -> pa.Table:
    """Cheap environment probe, run FIRST by the driver: reads one tiny
    parquet through Ray Data and touches the /tmp scratch root.  If
    this entry fails or mismatches, the whole round's correctness pass
    is suspect for environmental (not operator) reasons — r2's
    CORRECTNESS came back empty with every operator green on re-run."""
    import ray.data as rd

    n = sources.read_parquet_clean(f"{sf_dir}/region.parquet").count()
    os.makedirs("/tmp/pkd_idx", exist_ok=True)
    probe = f"/tmp/pkd_idx/.probe-{os.getpid()}"
    with open(probe, "w") as f:
        f.write("ok")
    os.remove(probe)
    return pa.table(
        {
            "n_region": pa.array([int(n)], pa.int64()),
            "tmp_writable": pa.array([1], pa.int64()),
        }
    )


def _q_build_summary(sf_dir: str) -> pa.Table:
    idx = _base_index(sf_dir)
    live = idx.directory.counts > 0
    bb = idx.directory.bboxes[live]
    return pa.table(
        {
            "n": pa.array([idx.total_rows], pa.int64()),
            "min_x": pa.array([int(bb[:, 0].min())], pa.int64()),
            "min_y": pa.array([int(bb[:, 1].min())], pa.int64()),
            "max_x": pa.array([int(bb[:, 2].max())], pa.int64()),
            "max_y": pa.array([int(bb[:, 3].max())], pa.int64()),
        }
    )


def _q_range_count(sf_dir: str) -> pa.Table:
    from pkd_tree_ray.queries import range_count

    return range_count(_base_index(sf_dir), workloads.range_boxes())


def _q_range_report(sf_dir: str):
    from pkd_tree_ray.queries import range_report

    return range_report(_base_index(sf_dir), workloads.report_boxes())


def _q_circle_count(sf_dir: str) -> pa.Table:
    from pkd_tree_ray.queries import circle_count

    return circle_count(_base_index(sf_dir), workloads.circles())


def _q_knn(sf_dir: str, k: int):
    from pkd_tree_ray.queries import knn

    qx, qy = workloads.knn_query_points()
    return knn(_base_index(sf_dir), qx, qy, k)


def _q_knn_visit_stats(sf_dir: str):
    """Per-query kNN work diagnostics (qid, cells_scanned,
    nodes_visited, rows_scanned) — the reference's per-query
    visited-node counter (tests/testFramework.h:516).  Rows-only
    check: counters depend on tree shape, not on a SQL-expressible
    quantity."""
    from pkd_tree_ray.queries import knn_stats

    qx, qy = workloads.knn_query_points()
    Q = np.stack([qx, qy], axis=1)
    return knn_stats(_base_index(sf_dir), Q, 10)


def _q_knn_d3(sf_dir: str, k: int):
    from pkd_tree_ray.queries import knn_nd

    return knn_nd(_base_index_3d(sf_dir), workloads.knn_query_points_3d(), k)


def _q_range_count_d3(sf_dir: str) -> pa.Table:
    from pkd_tree_ray.queries import range_count

    return range_count(_base_index_3d(sf_dir), workloads.range_boxes_3d())


def _q_circle_count_d3(sf_dir: str) -> pa.Table:
    from pkd_tree_ray.queries import circle_count

    return circle_count(_base_index_3d(sf_dir), workloads.circles_3d())


def _q_knn_float(sf_dir: str, k: int):
    from pkd_tree_ray.queries import knn

    qx, qy = workloads.knn_query_points_float()
    return knn(_base_index_float(sf_dir), qx, qy, k)


def _q_knn_float_native(sf_dir: str, k: int) -> pa.Table:
    """kNN over raw double coordinates (no grid) — exact IEEE-double
    distances, ties by (dist2, neighbor id)."""
    from pkd_tree_ray.floatindex import knn_float

    qx, qy = workloads.knn_query_points_float_native()
    return knn_float(
        _base_index_float_native(sf_dir), np.stack([qx, qy], axis=1), k
    )


def _q_range_count_float_native(sf_dir: str) -> pa.Table:
    from pkd_tree_ray.floatindex import range_count_float

    return range_count_float(
        _base_index_float_native(sf_dir), workloads.range_boxes_float_native()
    ).rename_columns(["qid", "cnt"])


def _q_range_count_float(sf_dir: str) -> pa.Table:
    from pkd_tree_ray.queries import range_count

    return range_count(_base_index_float(sf_dir), workloads.range_boxes_float())


def _q_insert_range_count(sf_dir: str) -> pa.Table:
    from pkd_tree_ray.queries import range_count

    return range_count(_inserted_index(sf_dir), workloads.range_boxes())


def _q_delete_range_count(sf_dir: str) -> pa.Table:
    from pkd_tree_ray.queries import range_count

    return range_count(_deleted_index(sf_dir), workloads.range_boxes())


def _compacted_index(sf_dir: str) -> PkdIndex:
    """Base index minus 40% of rows (point_id % 5 <= 1) — past
    ``tomb_compact_frac`` in every cell but above the sibling-merge
    threshold, so the delete exercises the DIRECTORY-STABLE
    shuffle-free compaction path (``index._compact_cells_task``:
    per-cell rewrite tasks, no groupby exchange)."""
    key = (sf_dir, "compacted")
    if key not in _INDEX_CACHE:
        import shutil

        path = _idx_path(sf_dir, "compacted")
        shutil.rmtree(path, ignore_errors=True)
        base = PkdIndex.build(
            sources.lineitem_points(sf_dir), path, _CFG, id_col="point_id"
        )
        victims = sources.lineitem_points(sf_dir).map_batches(
            lambda t: t.filter(pa.array(t["point_id"].to_numpy() % 5 <= 1)),
            batch_format="pyarrow",
        )
        _INDEX_CACHE[key] = base.delete(victims, strict=True)
    return _INDEX_CACHE[key]


def _q_delete_compact_range_count(sf_dir: str) -> pa.Table:
    from pkd_tree_ray.queries import range_count

    return range_count(_compacted_index(sf_dir), workloads.range_boxes())


def _q_tile_counts(sf_dir: str):
    from pkd_tree_ray.joins import tile_stats

    return tile_stats(sources.lineitem_points(sf_dir), workloads.TILE_SHIFT)


def _q_pip_count(sf_dir: str) -> pa.Table:
    from pkd_tree_ray.joins import point_in_polygon_count

    return point_in_polygon_count(_base_index(sf_dir), workloads.polygons())


def _q_pip_join(sf_dir: str):
    from pkd_tree_ray.joins import point_in_polygon_join

    return point_in_polygon_join(_base_index(sf_dir), workloads.polygons())


def _q_pip_concave_count(sf_dir: str) -> pa.Table:
    """Point-in-polygon over NON-convex simple polygons — the even-odd
    crossing path (``geometry.points_in_polygon``) with the
    edge-vs-bbox contained-cell shortcut."""
    from pkd_tree_ray.joins import point_in_polygon_count

    return point_in_polygon_count(_base_index(sf_dir), workloads.concave_polygons())


def _q_knn_join(sf_dir: str):
    from pkd_tree_ray.joins import knn_join

    left = sources.customer_points(sf_dir).map_batches(
        lambda t: t.filter(pa.array(t["c_custkey"].to_numpy() % 30 == 0)),
        batch_format="pyarrow",
    )
    # Dataset left: knn_join enforces the broadcast-small cap itself
    return knn_join(_base_index(sf_dir), left, "c_custkey", k=3)


RADIUS_JOIN_R = 1000  # ~300 qualifying pairs at sf0.01


def _q_radius_join(sf_dir: str):
    from pkd_tree_ray.joins import radius_join

    out = radius_join(
        sources.customer_points(sf_dir),
        sources.lineitem_points(sf_dir),
        RADIUS_JOIN_R,
        a_id="c_custkey",
        b_id="point_id",
    ).to_pandas()
    if out.empty:  # all-empty blocks may drop the schema entirely
        import pandas as pd

        return pd.DataFrame(
            {c: pd.Series(dtype="int64") for c in ("c_custkey", "point_id", "dist2")}
        )
    return out.sort_values(["c_custkey", "point_id"]).reset_index(drop=True)


# --- training-data ops (documents / embeddings tables) -----------------

def _docs(sf_dir: str):
    import ray.data as rd

    return sources.read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def _q_exact_dedup(sf_dir: str):
    from pkd_tree_ray.text import exact_dedup

    return exact_dedup(_docs(sf_dir))


def _q_token_stats(sf_dir: str):
    from pkd_tree_ray.text import token_stats

    return token_stats(_docs(sf_dir))


def _q_quality(sf_dir: str):
    from pkd_tree_ray.text import quality_scores

    return quality_scores(_docs(sf_dir))


def _q_lang_id(sf_dir: str):
    from pkd_tree_ray.text import lang_id

    return lang_id(_docs(sf_dir))


def _q_redact_pii(sf_dir: str):
    """The synthetic corpus carries no natural PII, so every 5th doc
    gets a deterministic doc_id-derived PII suffix (email + IP +
    phone) before the scrub — the SQL oracle appends the identical
    suffix, so the driver check exercises non-zero counts and real
    replacements, not a no-op."""
    import pandas as pd

    from pkd_tree_ray.text import redact_pii

    def add_pii(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        sfx = (
            " mail u" + pd.Series(ids).astype(str)
            + "@ex.org ip 10.0." + pd.Series(ids % 256).astype(str)
            + ".7 tel +1 555-000-" + pd.Series(1000 + ids % 9000).astype(str)
        )
        batch = batch.copy()
        batch["text"] = batch["text"].fillna("") + sfx.where(
            pd.Series(ids % 5 == 0), ""
        ).to_numpy()
        return batch

    docs = _docs(sf_dir).map_batches(add_pii, batch_format="pandas")
    return redact_pii(docs)


#: SQL twin of the deterministic PII suffix in :func:`_q_redact_pii`.
_PII_DOCS_SQL = """
SELECT doc_id,
       coalesce(text, '') || CASE WHEN doc_id % 5 = 0 THEN
         ' mail u' || doc_id || '@ex.org ip 10.0.' || (doc_id % 256)
         || '.7 tel +1 555-000-' || (1000 + doc_id % 9000)
       ELSE '' END AS text
FROM documents
"""


def _lineified_docs(sf_dir: str):
    """The synthetic docs are single-line, so line-level checks derive
    a corpus deterministically: the frequent token ``table`` becomes a
    line break (yielding naturally-colliding lines from the small
    vocabulary) and every 3rd doc gains a shared boilerplate footer —
    the classic C4 boilerplate-removal signal.  ``_LINES_DOCS_SQL`` is
    the identical derivation for the oracles."""
    import pandas as pd

    def to_lines(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        t = batch["text"].fillna("").str.replace(" table ", "\n", regex=False)
        ids = batch["doc_id"].to_numpy()
        batch["text"] = t + pd.Series(
            ids % 3 == 0, index=t.index
        ).map({True: "\nfollow us for more updates and like this page", False: ""})
        return batch

    return _docs(sf_dir).map_batches(to_lines, batch_format="pandas")


def _q_dedup_lines(sf_dir: str):
    from pkd_tree_ray.lines import dedup_lines

    out = dedup_lines(_lineified_docs(sf_dir)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


#: SQL twin of the line-ified corpus in :func:`_q_dedup_lines`.
_LINES_DOCS_SQL = """
SELECT doc_id,
       replace(coalesce(text, ''), ' table ', chr(10))
       || CASE WHEN doc_id % 3 = 0
          THEN chr(10) || 'follow us for more updates and like this page'
          ELSE '' END AS text
FROM documents
"""


def _q_hll_tokens(sf_dir: str):
    """Merged HLL registers over the corpus tokens — the sketch STATE
    is deterministic given the SQL-exact token hash, so it oracles
    bit-exactly; the float estimator is pytest-tested instead."""
    from pkd_tree_ray.sketches import hll_tokens

    out = hll_tokens(_docs(sf_dir)).to_pandas()
    return out.sort_values("bucket").reset_index(drop=True)


def _q_repetition_scores(sf_dir: str):
    """Gopher repetition rules over the same line-ified corpus as
    :func:`_q_dedup_lines` (the raw docs are single-line, which would
    zero the line metrics)."""
    from pkd_tree_ray.lines import repetition_scores

    return repetition_scores(_lineified_docs(sf_dir))


def _q_simhash(sf_dir: str):
    from pkd_tree_ray.text import simhash

    return simhash(_docs(sf_dir))


def _q_fingerprints(sf_dir: str):
    from pkd_tree_ray.text import fingerprints

    return fingerprints(_docs(sf_dir))


def _q_minhash_neardup(sf_dir: str):
    from pkd_tree_ray.text import minhash_neardup

    docs = _docs(sf_dir)
    out = minhash_neardup(docs, threshold=0.5).to_pandas()
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _q_simhash_neardup(sf_dir: str):
    from pkd_tree_ray.text import simhash_neardup

    out = simhash_neardup(_docs(sf_dir), max_hamming=3).to_pandas()
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _q_ngram_jaccard_neardup(sf_dir: str):
    from pkd_tree_ray.text import ngram_jaccard_neardup

    out = ngram_jaccard_neardup(_docs(sf_dir), threshold=0.5).to_pandas()
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _q_classifier_scores(sf_dir: str):
    from pkd_tree_ray.text import classifier_scores

    return classifier_scores(_docs(sf_dir))


def _q_dedup_spans(sf_dir: str):
    from pkd_tree_ray.spans import dedup_spans

    out = dedup_spans(_docs(sf_dir), window=4).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_dedup_clusters(sf_dir: str):
    from pkd_tree_ray.components import dedup_clusters
    from pkd_tree_ray.text import ngram_jaccard_neardup

    docs = _docs(sf_dir)
    pairs = ngram_jaccard_neardup(docs, threshold=0.5)
    out = dedup_clusters(docs, pairs).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


DECON_BENCH_MOD = 25  # eval set = doc_id % 25 == 0


def _q_decontaminate(sf_dir: str):
    from pkd_tree_ray.text import decontaminate

    def split(keep_bench: bool):
        want = 0 if keep_bench else 1

        def f(t: pa.Table) -> pa.Table:
            m = (t["doc_id"].to_numpy() % DECON_BENCH_MOD == 0) == (want == 0)
            return t.filter(pa.array(m))

        return _docs(sf_dir).map_batches(f, batch_format="pyarrow")

    out = decontaminate(split(False), split(True), window=4).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_vocab_topk(sf_dir: str):
    from pkd_tree_ray.text import vocab_topk

    return vocab_topk(_docs(sf_dir), k=50)


def _q_tfidf_topk(sf_dir: str):
    from pkd_tree_ray.text import tfidf_topk

    return tfidf_topk(_docs(sf_dir), k=5)


def _q_heavy_hitters(sf_dir: str):
    """Exact top-20 tokens via Misra-Gries candidates + recount —
    same answer as vocab_topk with no vocabulary shuffle."""
    from pkd_tree_ray.sketches import heavy_hitters

    return heavy_hitters(_docs(sf_dir), k=20, cap=1024)


#: build side of the semi/anti-join queries: high-value orders.
_SEMI_PRICE_CUT = 150000.0


def _semi_sides(sf_dir: str):
    import pyarrow.compute as pc

    li = sources.read_parquet_clean(f"{sf_dir}/lineitem.parquet")

    def filt(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["o_totalprice"], _SEMI_PRICE_CUT))

    od = sources.read_parquet_clean(f"{sf_dir}/orders.parquet").map_batches(
        filt, batch_format="pyarrow"
    )
    return li, od


def _q_semi_join(sf_dir: str, anti: bool = False):
    from pkd_tree_ray.membership import bloom_semi_join

    li, od = _semi_sides(sf_dir)
    out = (
        bloom_semi_join(li, "l_orderkey", od, "o_orderkey", anti=anti)
        .select_columns(["l_orderkey", "l_linenumber"])
        .to_pandas()
    )
    return out.sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)


def _q_broadcast_join(sf_dir: str):
    """Inner broadcast join: enrich lineitem rows with order payload
    columns from the high-value-orders build side (no shuffle)."""
    from pkd_tree_ray.membership import broadcast_join

    li, od = _semi_sides(sf_dir)
    out = (
        broadcast_join(
            li.select_columns(["l_orderkey", "l_linenumber"]),
            "l_orderkey",
            od,
            "o_orderkey",
            ["o_custkey", "o_orderpriority"],
        )
        .to_pandas()
    )
    return out.sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)


def _q_curate_corpus(sf_dir: str):
    """Composite pipeline: integer quality gate -> exact dedup of the
    survivors (one read, one hash-only shuffle)."""
    from pkd_tree_ray.text import curate_corpus

    out = curate_corpus(_docs(sf_dir)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_topn_per_group(sf_dir: str):
    from pkd_tree_ray.ranking import topn_per_group

    docs = sources.read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    out = topn_per_group(docs, "lang", "n_chars", "doc_id", n=3).to_pandas()
    return out.sort_values(["lang", "rank"]).reset_index(drop=True)


def _events(sf_dir: str):
    return sources.read_parquet_clean(f"{sf_dir}/events.parquet")


def _q_asof_join(sf_dir: str):
    from pkd_tree_ray.temporal import asof_join

    return asof_join(_events(sf_dir), "purchase", "click")


def _q_sessionize(sf_dir: str):
    from pkd_tree_ray.temporal import sessionize

    return sessionize(_events(sf_dir), gap_s=1800)


def _q_window_agg(sf_dir: str):
    from pkd_tree_ray.temporal import window_agg

    return window_agg(_events(sf_dir), width_s=3600)


_QUANTILE_QS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _docs_nchars(sf_dir: str):
    return sources.read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )


def _q_quantiles(sf_dir: str):
    from pkd_tree_ray.quantiles import quantiles

    return quantiles(_docs_nchars(sf_dir), "n_chars", _QUANTILE_QS)


def _q_percentile_filter(sf_dir: str):
    from pkd_tree_ray.quantiles import percentile_filter

    out = percentile_filter(_docs_nchars(sf_dir), "n_chars", 0.9).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _ann_queries(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Self-query set: embedding rows with vec_id % 50 == 0 (driver-side;
    the query side of an ANN batch is small by definition)."""
    import ray.data as rd

    q = (
        sources.read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        .map_batches(
            lambda t: t.filter(pa.array(t["vec_id"].to_numpy() % 50 == 0)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    return q["vec_id"].to_numpy(), np.stack(q["embedding"].to_numpy()).astype(np.float32)


def _q_ann_l2q(sf_dir: str):
    """Brute-force exact top-5 by quantized squared L2 (SQL-exact)."""
    import ray.data as rd

    from pkd_tree_ray.ann import ann_bruteforce

    qids, qv = _ann_queries(sf_dir)
    emb = sources.read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = ann_bruteforce(emb, qv, k=5, metric="l2q")
    # positional qid -> the query row's vec_id (oracle joins on vec_id)
    return out.set_column(
        out.schema.get_field_index("qid"),
        "qid",
        pa.array(qids[out["qid"].to_numpy()], pa.int64()),
    )


_EMB_DIM = 64
_PLANT_SEED = 123


def _q_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-dup pairs (random-hyperplane LSH ->
    bucket groupby -> integer-exact quantized-cosine verify; DuckDB
    oracle re-derives the whole pipeline including the planted dups).

    The synthetic embeddings table has no natural near-dups (max
    pairwise cosine ~0.51), so the pipeline input is the table UNION a
    deterministic perturbed copy of every 50th vector (dup_id =
    vec_id + 10^7, splitmix64 integer noise * 0.001) — the dedup
    workload shape with known planted duplicates."""
    import ray.data as rd

    from pkd_tree_ray.ann import embedding_neardup
    from pkd_tree_ray.hashing import splitmix64

    emb = sources.read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def planted(batch: pa.Table) -> pa.Table:
        vid = batch["vec_id"].to_numpy()
        keep = vid % 50 == 0
        sub = batch.filter(pa.array(keep))
        if sub.num_rows == 0:
            return sub
        col = sub["embedding"].combine_chunks()
        mats = np.stack(
            [np.asarray(v, dtype=np.float32) for v in col.to_pylist()]
        ).astype(np.float64)
        svid = sub["vec_id"].to_numpy()
        idx = (
            svid[:, None].astype(np.uint64) * np.uint64(_EMB_DIM)
            + np.arange(_EMB_DIM, dtype=np.uint64)[None, :]
        )
        eps = (
            (splitmix64(idx.ravel(), _PLANT_SEED) % np.uint64(11)).astype(np.int64)
            - 5
        ).reshape(mats.shape) * 0.001
        mats = (mats + eps).astype(np.float32)
        return pa.table(
            {
                "vec_id": pa.array(svid + 10_000_000, pa.int64()),
                "embedding": pa.array(list(mats), pa.list_(pa.float32())),
            }
        )

    dups = emb.map_batches(planted, batch_format="pyarrow")
    return embedding_neardup(emb.union(dups), threshold=0.95)


def _embedding_neardup_sql() -> str:
    """Oracle for :func:`_q_embedding_neardup`: quantized base table
    UNION the splitmix64-perturbed planted dups, fed to the exact
    pipeline SQL (pkd_tree_ray.ann.sql_embedding_neardup)."""
    from pkd_tree_ray.ann import sql_embedding_neardup, sql_quantized_embeddings
    from pkd_tree_ray.hashing import sql_splitmix64

    sm = sql_splitmix64(f"vec_id * {_EMB_DIM} + (j - 1)", _PLANT_SEED)
    dup_qv = (
        f"list_transform(range(1, {_EMB_DIM} + 1), j -> "
        f"CAST(floor(CAST(CAST(CAST(embedding[CAST(j AS INTEGER)] AS DOUBLE) + "
        f"(CAST({sm} % 11 AS DOUBLE) - 5) * 0.001 AS FLOAT) AS DOUBLE) * 1000) "
        f"AS BIGINT))"
    )
    src = (
        f"{sql_quantized_embeddings()} UNION ALL "
        f"SELECT vec_id + 10000000 AS vec_id, {dup_qv} AS qv "
        f"FROM embeddings WHERE vec_id % 50 = 0"
    )
    return sql_embedding_neardup(src, _EMB_DIM, threshold=0.95)


def _q_ann_ivf(sf_dir: str):
    """IVF approximate top-5 (recall < 1 by design -> rows-only check;
    recall vs brute force is asserted in tests/test_text_ann.py)."""
    import ray.data as rd

    from pkd_tree_ray.ann import ann_ivf

    qids, qv = _ann_queries(sf_dir)
    emb = sources.read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = ann_ivf(emb, qv, k=5, path=_idx_path(sf_dir, "ivf"))
    return out.set_column(
        out.schema.get_field_index("qid"),
        "qid",
        pa.array(qids[out["qid"].to_numpy()], pa.int64()),
    )


def _q_ann_ivf_exact(sf_dir: str):
    """IVF with exhaustive probes (nprobe = n_lists): must equal the
    brute-force top-k bit-for-bit — the oracle-checked proof that the
    IVF partition -> per-list scan -> merge machinery is lossless, so
    recall < 1 in `ann_ivf` comes only from probe pruning."""
    from pkd_tree_ray.ann import ann_ivf

    qids, qv = _ann_queries(sf_dir)
    emb = sources.read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = ann_ivf(emb, qv, k=5, n_lists=16, nprobe=16, path=_idx_path(sf_dir, "ivf"))
    return out.set_column(
        out.schema.get_field_index("qid"),
        "qid",
        pa.array(qids[out["qid"].to_numpy()], pa.int64()),
    )


def _q_knn_graph(sf_dir: str):
    """Self-kNN graph sink (generate_knn analog): every indexed point's
    5 nearest OTHER points as an edge table, written per-cell
    (resumable) and returned as the edge Dataset."""
    import shutil

    from pkd_tree_ray.joins import knn_graph

    key = (sf_dir, "customer_idx")
    if key not in _INDEX_CACHE:
        path = _idx_path(sf_dir, "customer_idx")
        shutil.rmtree(path, ignore_errors=True)
        pts = sources.customer_points(sf_dir).map_batches(
            lambda t: pa.table(
                {"point_id": t["c_custkey"], "x": t["x"], "y": t["y"]}
            ),
            batch_format="pyarrow",
        )
        _INDEX_CACHE[key] = PkdIndex.build(
            pts, path, _CFG, id_col="point_id"
        )
    out = _idx_path(sf_dir, "customer_graph")
    import shutil as _sh

    _sh.rmtree(out, ignore_errors=True)
    return knn_graph(_INDEX_CACHE[key], out, k=5)


# --- sliding-window stream (events table) -------------------------------

_WINDOW_LEN = 5
_WINDOW_STEPS = 7  # periods 0..6 inserted -> live window = periods 2..6


def _q_window_range_count(sf_dir: str) -> pa.Table:
    """Sliding-window update stream (insertOsmByTime analog): insert
    period batches 0..6 with a 5-period window (expiring 0 and 1), then
    range-count over the live window."""
    from pkd_tree_ray.queries import range_count
    from pkd_tree_ray.window import SlidingWindowIndex

    key = (sf_dir, "window")
    if key not in _INDEX_CACHE:
        import shutil

        path = _idx_path(sf_dir, "window")
        shutil.rmtree(path, ignore_errors=True)
        idx = PkdIndex.build(
            sources.events_points(sf_dir, 0), path, _CFG, id_col="point_id"
        )
        swi = SlidingWindowIndex(idx, window_len=_WINDOW_LEN)
        swi.live_periods.append((0, sources.events_points(sf_dir, 0)))
        for p in range(1, _WINDOW_STEPS):
            swi.step(p, sources.events_points(sf_dir, p))
        _INDEX_CACHE[key] = swi.index
    return range_count(_INDEX_CACHE[key], workloads.range_boxes())


# --- image-table flagship (input_hint shape; oracle-checked) ------------

def _image_n(sf_dir: str) -> int:
    """Image-table row count for an sf dir: lineitem rows / 10 (600 at
    sf0.001) — derived from the data so the static oracle SQL can
    compute the identical count from the registered lineitem view."""
    import pyarrow.parquet as pq

    return pq.read_metadata(f"{sf_dir.rstrip('/')}/lineitem.parquet").num_rows // 10


def _q_image_knn(sf_dir: str):
    """Flagship image pipeline: synthetic Lance-style image table
    (image_id, bytes, w, h, fmt, caption, phash) -> decode-verify
    (PSNR inf for PNG) -> geotag from phash -> spatial index -> self-kNN
    k=10.  Oracle-checked: phash/geotag are splitmix64-derived, which
    hashing.sql_splitmix64 reproduces bit-exactly in DuckDB."""
    from pkd_tree_ray.fixtures import image_table_dataset, phash_to_xy
    from pkd_tree_ray.queries import knn
    from pkd_tree_ray.sources import geotag_images

    n = _image_n(sf_dir)
    images = image_table_dataset(n)
    pts = geotag_images(images).map_batches(
        lambda t: pa.table(
            {
                # image_id "img%012d" -> int64 id (Arrow-native slice+cast)
                "point_id": pc.cast(
                    pc.utf8_slice_codeunits(t["image_id"], 3, 99), pa.int64()
                ),
                "x": t["x"],
                "y": t["y"],
            }
        ),
        batch_format="pyarrow",
    )
    key = (sf_dir, "image")
    if key not in _INDEX_CACHE:
        import shutil

        path = _idx_path(sf_dir, "image")
        shutil.rmtree(path, ignore_errors=True)
        _INDEX_CACHE[key] = PkdIndex.build(pts, path, _CFG, id_col="point_id")
    idx = _INDEX_CACHE[key]
    qph = np.arange(0, n, max(1, n // 256), dtype=np.uint64)
    from pkd_tree_ray.hashing import splitmix64

    qx, qy = phash_to_xy(splitmix64(qph, 42).view(np.int64))
    return knn(idx, qx, qy, 10)


def _q_image_decode_stats(sf_dir: str):
    """Multimodal decode pipeline over the synthetic Lance-style image
    table: actor-pool DecodeImage (bytes -> pixels, PSNR-lossless PNG)
    -> per-image mean-channel features -> global integer channel sums.
    Per-image mean_c = k/64 is an exact float (w*h = 64 pixels), so
    mean_c * (w*h) recovers the integer byte sum exactly and the DuckDB
    oracle can re-derive it from the splitmix64 pixel stream."""
    from pkd_tree_ray.fixtures import image_table_dataset
    from pkd_tree_ray.multimodal import decode_features

    n = _image_n(sf_dir)
    feats = decode_features(image_table_dataset(n), concurrency=(1, 4))

    def agg(batch: pa.Table) -> pa.Table:
        px = (
            batch["w"].to_numpy().astype(np.float64)
            * batch["h"].to_numpy().astype(np.float64)
        )
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "sum_r": pa.array(
                    [int(round(float(np.sum(batch["mean_r"].to_numpy() * px))))],
                    pa.int64(),
                ),
                "sum_g": pa.array(
                    [int(round(float(np.sum(batch["mean_g"].to_numpy() * px))))],
                    pa.int64(),
                ),
                "sum_b": pa.array(
                    [int(round(float(np.sum(batch["mean_b"].to_numpy() * px))))],
                    pa.int64(),
                ),
            }
        )

    pdf = feats.map_batches(agg, batch_format="pyarrow").to_pandas()
    return pa.table(
        {
            "n_images": pa.array([int(pdf["n"].sum())], pa.int64()),
            "sum_r": pa.array([int(pdf["sum_r"].sum())], pa.int64()),
            "sum_g": pa.array([int(pdf["sum_g"].sum())], pa.int64()),
            "sum_b": pa.array([int(pdf["sum_b"].sum())], pa.int64()),
        }
    )


def _q_sample_per_lang(sf_dir: str):
    """Deterministic stratified sample: 20 docs per language by seeded
    hash-rank — the curation operator (per-stratum caps) every
    training-data pipeline runs before training.  Re-runs reproduce
    the identical sample; DuckDB re-derives it via row_number() over
    the same splitmix64 rank."""
    from pkd_tree_ray.sampling import sample_per_key

    docs = sources.read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source"]
    )
    out = sample_per_key(docs, "lang", "doc_id", 20, seed=7).to_pandas()
    return (
        out[["lang", "doc_id", "source"]]
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
    )


def _q_corpus_split(sf_dir: str):
    """Deterministic train/holdout split (10% holdout by seeded id
    hash) — the stable split every pretraining pipeline runs before
    training; re-runs and resumed shards select identical membership."""
    from pkd_tree_ray.sampling import hash_split

    docs = sources.read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    out = hash_split(docs, "doc_id", holdout_permille=100, seed=21).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_pack_sequences(sf_dir: str):
    """Concat-and-chunk sequence packing into 2048-token budgets —
    doc -> (seq_id, tok_offset) via a distributed prefix sum (bucketed
    token totals + broadcast offsets), the final stage of a
    pretraining-data pipeline.  Exact: one DuckDB window cumsum
    reproduces it."""
    from pkd_tree_ray.packing import pack_sequences

    out = pack_sequences(_docs(sf_dir), budget=2048).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_kmeans_assign(sf_dir: str):
    """One exact Lloyd half-step: every embedding assigned to its
    nearest seeded-init centroid (quantized-int distances, ties to the
    lowest cluster id) — the oracle gate for the k-means kernel chain
    (init rank, quantization, distance, tie-break)."""
    from pkd_tree_ray.clustering import kmeans_assign

    emb = sources.read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = kmeans_assign(emb, k=8, seed=11).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def _q_semdedup(sf_dir: str):
    from pkd_tree_ray.clustering import semdedup

    emb = sources.read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = semdedup(emb, k=8, seed=11, threshold=0.95).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def _q_image_ahash_neardup(sf_dir: str):
    """Image near-duplicate detection: PNG decode (actor pool) ->
    64-bit average-hash -> pigeonhole 16-bit block LSH -> distributed
    exact-Hamming verify — the image arm of the dedup suite, over the
    fixture table with planted near-dups (``dup_every=16``: every 16th
    image copies its predecessor's pixels with one byte's high bit
    flipped).  Oracle-checked: the pixel stream, the perturbation and
    the integer-exact aHash are all splitmix64-derived and re-derived
    bit-exactly in DuckDB."""
    from pkd_tree_ray.fixtures import image_table_dataset
    from pkd_tree_ray.multimodal import image_ahash_neardup

    n = _image_n(sf_dir)
    images = image_table_dataset(n, dup_every=16)
    out = image_ahash_neardup(images, max_hamming=3).to_pandas()
    return out.sort_values(["img_a", "img_b"]).reset_index(drop=True)


def _q_image_mse_neardup(sf_dir: str):
    """Pixel-exact image near-dup: aHash block-LSH candidates verified
    on the EXACT integer sum-of-squared-errors of the decoded pixels —
    PSNR >= 20 dB keeps the planted high-bit-flip dups (28.8 dB) and
    rejects unrelated images (~5 dB apart)."""
    from pkd_tree_ray.fixtures import image_table_dataset
    from pkd_tree_ray.multimodal import image_mse_neardup

    n = _image_n(sf_dir)
    images = image_table_dataset(n, dup_every=16)
    out = image_mse_neardup(images, min_psnr_db=20).to_pandas()
    return out.sort_values(["img_a", "img_b"]).reset_index(drop=True)


# ----------------------------------------------------------------------
# variant folding: the driver's correctness pass populates a bounded
# number of registry rows (50 in r4), so redundant per-variant entries
# are folded into single multi-variant queries — each variant's result
# is tagged with a discriminator column and unioned, and the oracle SQL
# is the matching UNION ALL.  Every operator family now fits inside the
# driver's window; nothing loses oracle coverage.
# ----------------------------------------------------------------------

def _to_table(obj) -> pa.Table:
    """Materialize a query result (pa.Table / pandas / Dataset) as one
    Arrow table, preserving Arrow dtypes.  Folded variants are
    driver-side-small by construction (counts, top-k, capped pairs)."""
    import pandas as pd

    import ray

    if isinstance(obj, pa.Table):
        return obj
    if isinstance(obj, pd.DataFrame):
        return pa.Table.from_pandas(obj, preserve_index=False)
    all_tabs = ray.get(obj.to_arrow_refs())
    tabs = [t for t in all_tabs if t.num_rows]
    if tabs:
        return pa.concat_tables(tabs, promote_options="default")
    # legitimately-empty result (e.g. a near-dup arm with no pairs):
    # return an empty table that still CARRIES the schema so the
    # tagged projection downstream works.  Concat ALL schema-bearing
    # empty blocks with promotion (mirroring the non-empty path) so a
    # multi-schema fold surfaces the promoted union, not whichever
    # arm's block happened first; zero-column blocks (the
    # high-parallelism aggregate artifact) are dropped.
    schema_bearing = [t for t in all_tabs if t.num_columns]
    if schema_bearing:
        return pa.concat_tables(schema_bearing, promote_options="default")
    return pa.table({})


def _parallel_results(thunks):
    """Run independent variant pipelines CONCURRENTLY from driver
    threads — each thunk owns its own Dataset execution, so a folded
    entry pays one pipeline's fixed orchestration latency instead of
    the sum (text_neardup: 3 near-dup pipelines at ~6-8 s each)."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as ex:
        return [f.result() for f in [ex.submit(t) for t in thunks]]


def _tag_cols(t: pa.Table, tag_col: str, tag, cols, casts=None) -> pa.Table:
    """(tag, *cols) projection of ``t`` with optional per-column casts."""
    tag_arr = (
        pa.array(np.full(t.num_rows, tag, dtype=np.int64))
        if isinstance(tag, int)
        else pa.array([tag] * t.num_rows, pa.string())
    )
    out = {tag_col: tag_arr}
    for spec in cols:
        name, src = (spec, spec) if isinstance(spec, str) else spec
        col = t[src]
        if casts and name in casts:
            col = pc.cast(col, casts[name])
        out[name] = col
    return pa.table(out)


def _q_knn_multi(sf_dir: str) -> pa.Table:
    """kNN k in {1, 10, 100} over ONE shared base index, k-tagged."""
    return pa.concat_tables(
        _tag_cols(_to_table(_q_knn(sf_dir, k)), "k", k,
                  ["qid", "rank", "neighbor", "dist2"])
        for k in (1, 10, 100)
    )


def _q_knn_k10_variants(sf_dir: str) -> pa.Table:
    """k=10 kNN across the dimension/coordinate-type variants (d3,
    grid-quantized float, native IEEE float); dist2 cast to double so
    the integer variants union with the float-native one (dist2 <=
    3e12 << 2^53, exact)."""
    parts = [
        ("d3", _q_knn_d3(sf_dir, 10)),
        ("float", _q_knn_float(sf_dir, 10)),
        ("float_native", _q_knn_float_native(sf_dir, 10)),
    ]
    return pa.concat_tables(
        _tag_cols(_to_table(obj), "variant", tag,
                  ["qid", "rank", "neighbor", "dist2"],
                  casts={"dist2": pa.float64()})
        for tag, obj in parts
    )


def _q_range_count_variants(sf_dir: str) -> pa.Table:
    parts = [
        ("d3", _q_range_count_d3(sf_dir)),
        ("float", _q_range_count_float(sf_dir)),
        ("float_native", _q_range_count_float_native(sf_dir)),
    ]
    return pa.concat_tables(
        _tag_cols(_to_table(obj), "variant", tag, ["qid", "cnt"])
        for tag, obj in parts
    )


def _q_circle_count_multi(sf_dir: str) -> pa.Table:
    parts = [("d2", _q_circle_count(sf_dir)), ("d3", _q_circle_count_d3(sf_dir))]
    return pa.concat_tables(
        _tag_cols(_to_table(obj), "variant", tag, ["qid", "cnt"])
        for tag, obj in parts
    )


def _q_update_range_count(sf_dir: str) -> pa.Table:
    """The three update lifecycles (batch insert; strict batch delete;
    delete past the compaction threshold) verified by the same
    range-count workload, phase-tagged."""
    parts = [
        ("insert", _q_insert_range_count(sf_dir)),
        ("delete", _q_delete_range_count(sf_dir)),
        ("compact", _q_delete_compact_range_count(sf_dir)),
    ]
    return pa.concat_tables(
        _tag_cols(_to_table(obj), "phase", tag, ["qid", "cnt"])
        for tag, obj in parts
    )


def _q_pip_count_multi(sf_dir: str) -> pa.Table:
    parts = [
        ("convex", _q_pip_count(sf_dir)),
        ("concave", _q_pip_concave_count(sf_dir)),
    ]
    return pa.concat_tables(
        _tag_cols(_to_table(obj), "shape", tag, ["poly_id", "cnt"])
        for tag, obj in parts
    )


def _q_membership_join(sf_dir: str) -> pa.Table:
    parts = [
        ("semi", _q_semi_join(sf_dir)),
        ("anti", _q_semi_join(sf_dir, anti=True)),
    ]
    return pa.concat_tables(
        _tag_cols(_to_table(obj), "mode", tag, ["l_orderkey", "l_linenumber"])
        for tag, obj in parts
    )


def _q_text_neardup(sf_dir: str) -> pa.Table:
    """The three text near-dup detectors, method-tagged; ``metric`` is
    each method's own integer score (jaccard permille / Hamming)."""
    results = _parallel_results(
        [
            lambda: _q_minhash_neardup(sf_dir),
            lambda: _q_simhash_neardup(sf_dir),
            lambda: _q_ngram_jaccard_neardup(sf_dir),
        ]
    )
    parts = [
        ("minhash", results[0], "jaccard_permille"),
        ("simhash", results[1], "hamming"),
        ("ngram", results[2], "jaccard_permille"),
    ]
    return pa.concat_tables(
        _tag_cols(_to_table(obj), "method", tag,
                  ["doc_a", "doc_b", ("metric", src)])
        for tag, obj, src in parts
    )


def _q_image_neardup(sf_dir: str) -> pa.Table:
    results = _parallel_results(
        [
            lambda: _q_image_ahash_neardup(sf_dir),
            lambda: _q_image_mse_neardup(sf_dir),
        ]
    )
    parts = [("ahash", results[0], "hamming"), ("mse", results[1], "sse")]
    return pa.concat_tables(
        _tag_cols(_to_table(obj), "method", tag,
                  ["img_a", "img_b", ("metric", src)])
        for tag, obj, src in parts
    )


def _q_ann_exact(sf_dir: str) -> pa.Table:
    """Brute-force exact top-5 AND exhaustive-probe IVF (which must
    reproduce it bit-for-bit), method-tagged — one row set proves the
    scan kernel, the other that IVF partition->scan->merge is
    lossless."""
    results = _parallel_results(
        [lambda: _q_ann_l2q(sf_dir), lambda: _q_ann_ivf_exact(sf_dir)]
    )
    parts = [("brute", results[0]), ("ivf_exact", results[1])]
    return pa.concat_tables(
        _tag_cols(_to_table(obj), "method", tag,
                  ["qid", "rank", "neighbor", "score"])
        for tag, obj in parts
    )


def _q_doc_signatures(sf_dir: str) -> pa.Table:
    """Per-doc signature kit in long form (doc_id, kind, sig):
    simhash + its 16-bit LSH block and the rolling-window
    fingerprint."""
    sh = _to_table(_q_simhash(sf_dir))
    fp = _to_table(_q_fingerprints(sf_dir))
    return pa.concat_tables(
        [
            _tag_cols(sh, "kind", "simhash", ["doc_id", ("sig", "simhash")]),
            _tag_cols(sh, "kind", "bucket16", ["doc_id", ("sig", "bucket16")]),
            _tag_cols(fp, "kind", "fingerprint", ["doc_id", ("sig", "fingerprint")]),
        ]
    )


def _q_doc_profile(sf_dir: str):
    """Per-doc scalar profiling suite in long form (doc_id, metric,
    value): token stats, quality heuristics, the linear classifier and
    language-ID from ONE streaming corpus pass
    (:func:`pkd_tree_ray.text.doc_profile` fuses the four standalone
    kernels into a single actor, so the corpus is read once)."""
    from pkd_tree_ray.text import doc_profile

    return doc_profile(_docs(sf_dir))


def _q_quantile_suite(sf_dir: str) -> pa.Table:
    """Exact distributed quantiles + the p90 percentile filter in one
    (kind, id, value) long-form row set."""
    q = _to_table(_q_quantiles(sf_dir))
    f = _to_table(_q_percentile_filter(sf_dir))
    return pa.concat_tables(
        [
            _tag_cols(q, "kind", "q", [("id", "q_permille"), "value"]),
            _tag_cols(f, "kind", "doc", [("id", "doc_id"), ("value", "n_chars")]),
        ]
    )


def entry() -> Any:
    """Flagship: build the spatial index over sf0.001 lineitem-derived
    points, run the k=10 kNN batch, return the result Dataset."""
    return _q_knn("/root/testdata/sf0.001", 10)


def queries() -> dict[str, Callable[[str], Any]]:
    """EXACTLY 50 entries — every operator family inside the driver's
    50-row correctness window (r4 populated only the first 50 of 69,
    leaving the ANN/image/temporal/sampling tail unchecked).  The
    window is FULL: adding a query requires folding an existing pair
    first, or the new entry silently falls outside the checked window.
    Redundant per-variant entries are FOLDED into tagged multi-variant
    queries (see the ``_q_*_variants`` / ``*_multi`` helpers); each
    fold keeps full oracle coverage via a matching UNION ALL in
    :func:`oracle_sql`."""
    return {
        "selfcheck": _q_selfcheck,
        "build_summary": _q_build_summary,
        "range_count": _q_range_count,
        "range_report": _q_range_report,
        "circle_count": _q_circle_count_multi,
        "knn_multi": _q_knn_multi,
        "knn_k10_variants": _q_knn_k10_variants,
        "range_count_variants": _q_range_count_variants,
        "update_range_count": _q_update_range_count,
        "tile_counts": _q_tile_counts,
        "pip_count": _q_pip_count_multi,
        "pip_join": _q_pip_join,
        "knn_join": _q_knn_join,
        "radius_join": _q_radius_join,
        "window_range_count": _q_window_range_count,
        "exact_dedup": _q_exact_dedup,
        "curate_corpus": _q_curate_corpus,
        "doc_profile": _q_doc_profile,
        "redact_pii": _q_redact_pii,
        "dedup_lines": _q_dedup_lines,
        "repetition_scores": _q_repetition_scores,
        "hll_tokens": _q_hll_tokens,
        "doc_signatures": _q_doc_signatures,
        "text_neardup": _q_text_neardup,
        "dedup_spans": _q_dedup_spans,
        "dedup_clusters": _q_dedup_clusters,
        "decontaminate": _q_decontaminate,
        "vocab_topk": _q_vocab_topk,
        "heavy_hitters": _q_heavy_hitters,
        "membership_join": _q_membership_join,
        "broadcast_join": _q_broadcast_join,
        "topn_per_group": _q_topn_per_group,
        "tfidf_topk": _q_tfidf_topk,
        "quantile_suite": _q_quantile_suite,
        "asof_join": _q_asof_join,
        "sessionize": _q_sessionize,
        "window_agg": _q_window_agg,
        "ann_exact": _q_ann_exact,
        "ann_ivf": _q_ann_ivf,
        "embedding_neardup": _q_embedding_neardup,
        "image_knn": _q_image_knn,
        "image_decode_stats": _q_image_decode_stats,
        "image_neardup": _q_image_neardup,
        "sample_per_lang": _q_sample_per_lang,
        "corpus_split": _q_corpus_split,
        "pack_sequences": _q_pack_sequences,
        "kmeans_assign": _q_kmeans_assign,
        "semdedup": _q_semdedup,
        "knn_graph": _q_knn_graph,
        "knn_visit_stats": _q_knn_visit_stats,
    }


# ----------------------------------------------------------------------
# DuckDB oracles
# ----------------------------------------------------------------------

def _knn_sql(k: int) -> str:
    qx, qy = workloads.knn_query_points()
    return f"""
WITH pts AS ({sources.sql_lineitem_points()}),
q AS (SELECT * FROM {workloads.sql_values_points(qx, qy)}),
d AS (
  SELECT q.qid, p.point_id AS neighbor,
         (p.x - q.qx) * (p.x - q.qx) + (p.y - q.qy) * (p.y - q.qy) AS dist2,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY (p.x - q.qx) * (p.x - q.qx) + (p.y - q.qy) * (p.y - q.qy),
                    p.point_id
         ) AS "rank"
  FROM pts p CROSS JOIN q
)
SELECT qid, "rank", neighbor, dist2 FROM d WHERE "rank" <= {k}
"""


def _knn_d3_sql(k: int) -> str:
    Q = workloads.knn_query_points_3d()
    d2 = (
        "(p.x - q.qx) * (p.x - q.qx) + (p.y - q.qy) * (p.y - q.qy)"
        " + (p.z - q.qz) * (p.z - q.qz)"
    )
    return f"""
WITH pts AS ({sources.sql_lineitem_points_3d()}),
q AS (SELECT * FROM {workloads.sql_values_points_3d(Q)}),
d AS (
  SELECT q.qid, p.point_id AS neighbor, {d2} AS dist2,
         row_number() OVER (
           PARTITION BY q.qid ORDER BY {d2}, p.point_id
         ) AS "rank"
  FROM pts p CROSS JOIN q
)
SELECT qid, "rank", neighbor, dist2 FROM d WHERE "rank" <= {k}
"""


def _range_count_d3_sql() -> str:
    boxes = workloads.range_boxes_3d()
    return f"""
WITH pts AS ({sources.sql_lineitem_points_3d()}),
q AS (SELECT * FROM {workloads.sql_values_boxes_3d(boxes)})
SELECT q.qid,
       (SELECT count(*) FROM pts p
        WHERE p.x BETWEEN q.min_x AND q.max_x
          AND p.y BETWEEN q.min_y AND q.max_y
          AND p.z BETWEEN q.min_z AND q.max_z) AS cnt
FROM q
"""


def _circle_count_d3_sql() -> str:
    circ = workloads.circles_3d()
    return f"""
WITH pts AS ({sources.sql_lineitem_points_3d()}),
q AS (SELECT * FROM {workloads.sql_values_circles_3d(circ)})
SELECT q.qid,
       (SELECT count(*) FROM pts p
        WHERE (p.x - q.cx) * (p.x - q.cx) + (p.y - q.cy) * (p.y - q.cy)
              + (p.z - q.cz) * (p.z - q.cz)
              <= CAST(q.r AS BIGINT) * q.r) AS cnt
FROM q
"""


def _knn_float_sql(k: int) -> str:
    qx, qy = workloads.knn_query_points_float()
    return f"""
WITH pts AS ({sources.sql_lineitem_points_float()}),
q AS (SELECT * FROM {workloads.sql_values_points(qx, qy)}),
d AS (
  SELECT q.qid, p.point_id AS neighbor,
         (p.x - q.qx) * (p.x - q.qx) + (p.y - q.qy) * (p.y - q.qy) AS dist2,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY (p.x - q.qx) * (p.x - q.qx) + (p.y - q.qy) * (p.y - q.qy),
                    p.point_id
         ) AS "rank"
  FROM pts p CROSS JOIN q
)
SELECT qid, "rank", neighbor, dist2 FROM d WHERE "rank" <= {k}
"""


def _knn_float_native_sql(k: int) -> str:
    qx, qy = workloads.knn_query_points_float_native()
    return f"""
WITH pts AS ({sources.sql_lineitem_points_float_native()}),
q AS (SELECT * FROM {workloads.sql_values_points_float(qx, qy)}),
d AS (
  SELECT q.qid, p.point_id AS neighbor,
         (p.xf - q.qx) * (p.xf - q.qx) + (p.yf - q.qy) * (p.yf - q.qy) AS dist2,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY (p.xf - q.qx) * (p.xf - q.qx) + (p.yf - q.qy) * (p.yf - q.qy),
                    p.point_id
         ) AS "rank"
  FROM pts p CROSS JOIN q
)
SELECT qid, "rank", neighbor, dist2 FROM d WHERE "rank" <= {k}
"""


def _range_count_float_native_sql() -> str:
    boxes = workloads.range_boxes_float_native()
    return f"""
WITH pts AS ({sources.sql_lineitem_points_float_native()}),
q AS (SELECT * FROM {workloads.sql_values_boxes_float(boxes)})
SELECT q.qid,
       (SELECT count(*) FROM pts p
        WHERE p.xf BETWEEN q.min_x AND q.max_x
          AND p.yf BETWEEN q.min_y AND q.max_y) AS cnt
FROM q
"""


def _range_count_float_sql() -> str:
    boxes = workloads.range_boxes_float()
    return f"""
WITH pts AS ({sources.sql_lineitem_points_float()}),
q AS (SELECT * FROM {workloads.sql_values_boxes(boxes)})
SELECT q.qid,
       (SELECT count(*) FROM pts p
        WHERE p.x BETWEEN q.min_x AND q.max_x
          AND p.y BETWEEN q.min_y AND q.max_y) AS cnt
FROM q
"""


def _range_count_sql(pts_sql: str) -> str:
    boxes = workloads.range_boxes()
    return f"""
WITH pts AS ({pts_sql}),
q AS (SELECT * FROM {workloads.sql_values_boxes(boxes)})
SELECT q.qid,
       (SELECT count(*) FROM pts p
        WHERE p.x BETWEEN q.min_x AND q.max_x
          AND p.y BETWEEN q.min_y AND q.max_y) AS cnt
FROM q
"""


def _image_ids_ctes() -> str:
    """Shared CTEs deriving the image-table row ids (0..n-1, with
    n = lineitem rows / 10, mirroring ``_image_n``) from the registered
    lineitem view — the oracle SQL is static, so the image-table size
    must be computable from the data."""
    return """
nn AS (SELECT count(*) // 10 AS n FROM lineitem),
ids AS (
  SELECT i FROM (
    SELECT CAST(row_number() OVER () - 1 AS BIGINT) AS i FROM lineitem
  ) WHERE i < (SELECT n FROM nn)
)"""


def _image_knn_sql(k: int) -> str:
    """Brute-force kNN over the geotagged image table: phash =
    splitmix64(i, 42) and (x, y) = phash_to_xy(phash), both re-derived
    bit-exactly in SQL (hashing.sql_splitmix64 / sql_phash_xy).  Query
    points are the self-sample at id multiples of max(1, n // 256)."""
    from pkd_tree_ray.hashing import sql_phash_xy, sql_splitmix64

    xe, ye = sql_phash_xy(sql_splitmix64("i", 42))
    step = "greatest(1, (SELECT n FROM nn) // 256)"
    return f"""
WITH {_image_ids_ctes()},
pts AS (SELECT i AS point_id, {xe} AS x, {ye} AS y FROM ids),
q AS (
  SELECT point_id // {step} AS qid, x AS qx, y AS qy
  FROM pts WHERE point_id % {step} = 0
),
d AS (
  SELECT q.qid, p.point_id AS neighbor,
         (p.x - q.qx) * (p.x - q.qx) + (p.y - q.qy) * (p.y - q.qy) AS dist2,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY (p.x - q.qx) * (p.x - q.qx) + (p.y - q.qy) * (p.y - q.qy),
                    p.point_id
         ) AS "rank"
  FROM pts p CROSS JOIN q
)
SELECT qid, "rank", neighbor, dist2 FROM d WHERE "rank" <= {k}
"""


def _image_decode_stats_sql() -> str:
    """Global per-channel byte sums of the decoded image pixels,
    re-derived from the generator: pixels of image i are the first 192
    bytes of the little-endian words splitmix64(i*1000 + j, 49) for
    j in [0, 24), laid out (h, w, 3) — so byte k of word j belongs to
    channel (8*j + k) % 3 (fixtures.image_pixels)."""
    from pkd_tree_ray.hashing import sql_splitmix64

    wv = sql_splitmix64("ids.i * 1000 + wj.j", 49)
    shifts = ", ".join(f"({kk}, {1 << (8 * kk)})" for kk in range(8))
    return f"""
WITH {_image_ids_ctes()},
words AS (
  SELECT ids.i AS img, wj.j AS j, {wv} AS wv
  FROM ids CROSS JOIN range(0, 24) wj(j)
),
b AS (
  SELECT (8 * j + bk.k) % 3 AS ch,
         CAST((wv // bk.dv) % 256 AS BIGINT) AS v
  FROM words CROSS JOIN (VALUES {shifts}) AS bk(k, dv)
)
SELECT (SELECT n FROM nn) AS n_images,
       CAST(sum(CASE WHEN ch = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
       CAST(sum(CASE WHEN ch = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
       CAST(sum(CASE WHEN ch = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b
FROM b
"""


def _image_ahash_neardup_sql(
    max_hamming: int = 3, cap: int = 64, dup_every: int = 16
) -> str:
    """Bit-exact DuckDB mirror of :func:`_q_image_ahash_neardup`:
    re-derive each image's pixel stream (splitmix64 words, planted-dup
    rows reuse the predecessor's stream with one byte's high bit
    flipped), compute the integer-exact 64-bit average-hash
    (bit p set iff gray_p * 64 > sum(gray)), then the SAME pigeonhole
    16-bit block LSH + capped candidate pairs + Hamming verify as the
    engine (``pairjoin.sql_capped_pairs_ctes``)."""
    from pkd_tree_ray.hashing import sql_splitmix64, sql_u64_to_i64
    from pkd_tree_ray.pairjoin import sql_capped_pairs_ctes

    qv = sql_splitmix64("ids.i", 55)  # byte-perturbation position, seed 42+13
    wv = sql_splitmix64("imgs.base * 1000 + wj.j", 49)  # pixel words, seed 42+7
    shifts = ", ".join(f"({kk}, {1 << (8 * kk)})" for kk in range(8))
    pw_rows = ", ".join(f"({p}, CAST({1 << p} AS HUGEINT))" for p in range(64))
    dv_rows = ", ".join(
        f"({bi}, CAST({1 << (16 * bi)} AS HUGEINT))" for bi in range(4)
    )
    de = int(dup_every)
    return f"""
WITH {_image_ids_ctes()},
imgs AS (
  SELECT ids.i AS i,
         CASE WHEN ids.i > 0 AND ids.i % {de} = {de - 1}
              THEN ids.i - 1 ELSE ids.i END AS base,
         CASE WHEN ids.i > 0 AND ids.i % {de} = {de - 1}
              THEN CAST(({qv}) % 192 AS BIGINT) ELSE -1 END AS q
  FROM ids
),
words AS (
  SELECT imgs.i AS img, imgs.q AS q, wj.j AS j, {wv} AS wvv
  FROM imgs CROSS JOIN range(0, 24) wj(j)
),
bytes_v AS (
  SELECT img, (8 * j + bk.k) // 3 AS px,
         CASE WHEN 8 * j + bk.k = q
              THEN CASE WHEN (wvv // bk.dv) % 256 >= 128
                        THEN (wvv // bk.dv) % 256 - 128
                        ELSE (wvv // bk.dv) % 256 + 128 END
              ELSE (wvv // bk.dv) % 256 END AS v
  FROM words CROSS JOIN (VALUES {shifts}) AS bk(k, dv)
),
gray AS (SELECT img, px, sum(v) AS g FROM bytes_v GROUP BY img, px),
tot AS (SELECT img, sum(g) AS t FROM gray GROUP BY img),
ah AS (
  SELECT gray.img AS img_id,
         sum(CASE WHEN gray.g * 64 > tot.t THEN pw.w
                  ELSE CAST(0 AS HUGEINT) END) AS hu
  FROM gray JOIN tot USING (img)
       JOIN (VALUES {pw_rows}) pw(px, w) ON pw.px = gray.px
  GROUP BY gray.img
),
sigs AS (SELECT img_id, {sql_u64_to_i64('hu')} AS ahash FROM ah),
blocks AS (
  SELECT dv.bi AS block_id,
         CAST((ah.hu // dv.d) % 65536 AS BIGINT) AS block_val,
         ah.img_id
  FROM ah CROSS JOIN (VALUES {dv_rows}) dv(bi, d)
),
{sql_capped_pairs_ctes('blocks', ('block_id', 'block_val'), 'img_id', cap)}
SELECT c.a AS img_a, c.b AS img_b,
       CAST(bit_count(xor(sa.ahash, sb.ahash)) AS BIGINT) AS hamming
FROM cand c JOIN sigs sa ON sa.img_id = c.a
            JOIN sigs sb ON sb.img_id = c.b
WHERE bit_count(xor(sa.ahash, sb.ahash)) <= {int(max_hamming)}
ORDER BY img_a, img_b
"""


def _image_mse_neardup_sql(
    cap: int = 64, dup_every: int = 16, psnr_db: int = 20
) -> str:
    """Bit-exact DuckDB mirror of :func:`_q_image_mse_neardup`:
    re-derive the byte stream per POSITION (0..191) including the
    planted-dup perturbation, the integer aHash + block LSH + capped
    pairs (same CTEs as the aHash oracle), then join the two byte
    streams of each candidate pair on position and keep pairs with
    sse * 10^(p/10) <= 255^2 * n_values — all int64 arithmetic."""
    from pkd_tree_ray.hashing import sql_splitmix64
    from pkd_tree_ray.pairjoin import sql_capped_pairs_ctes

    scale = 10 ** (int(psnr_db) // 10)
    qv = sql_splitmix64("ids.i", 55)
    wv = sql_splitmix64("imgs.base * 1000 + wj.j", 49)
    shifts = ", ".join(f"({kk}, {1 << (8 * kk)})" for kk in range(8))
    pw_rows = ", ".join(f"({p}, CAST({1 << p} AS HUGEINT))" for p in range(64))
    dv_rows = ", ".join(
        f"({bi}, CAST({1 << (16 * bi)} AS HUGEINT))" for bi in range(4)
    )
    de = int(dup_every)
    return f"""
WITH {_image_ids_ctes()},
imgs AS (
  SELECT ids.i AS i,
         CASE WHEN ids.i > 0 AND ids.i % {de} = {de - 1}
              THEN ids.i - 1 ELSE ids.i END AS base,
         CASE WHEN ids.i > 0 AND ids.i % {de} = {de - 1}
              THEN CAST(({qv}) % 192 AS BIGINT) ELSE -1 END AS q
  FROM ids
),
words AS (
  SELECT imgs.i AS img, imgs.q AS q, wj.j AS j, {wv} AS wvv
  FROM imgs CROSS JOIN range(0, 24) wj(j)
),
bytes_v AS (
  SELECT img, 8 * j + bk.k AS pos,
         CASE WHEN 8 * j + bk.k = q
              THEN CASE WHEN (wvv // bk.dv) % 256 >= 128
                        THEN (wvv // bk.dv) % 256 - 128
                        ELSE (wvv // bk.dv) % 256 + 128 END
              ELSE (wvv // bk.dv) % 256 END AS v
  FROM words CROSS JOIN (VALUES {shifts}) AS bk(k, dv)
),
gray AS (SELECT img, pos // 3 AS px, sum(v) AS g FROM bytes_v GROUP BY img, pos // 3),
tot AS (SELECT img, sum(g) AS t FROM gray GROUP BY img),
ah AS (
  SELECT gray.img AS img_id,
         sum(CASE WHEN gray.g * 64 > tot.t THEN pw.w
                  ELSE CAST(0 AS HUGEINT) END) AS hu
  FROM gray JOIN tot USING (img)
       JOIN (VALUES {pw_rows}) pw(px, w) ON pw.px = gray.px
  GROUP BY gray.img
),
blocks AS (
  SELECT dv.bi AS block_id,
         CAST((ah.hu // dv.d) % 65536 AS BIGINT) AS block_val,
         ah.img_id
  FROM ah CROSS JOIN (VALUES {dv_rows}) dv(bi, d)
),
{sql_capped_pairs_ctes('blocks', ('block_id', 'block_val'), 'img_id', cap)},
sse_t AS (
  SELECT c.a AS img_a, c.b AS img_b,
         CAST(sum((ba.v - bb.v) * (ba.v - bb.v)) AS BIGINT) AS sse,
         count(*) AS nv
  FROM cand c
  JOIN bytes_v ba ON ba.img = c.a
  JOIN bytes_v bb ON bb.img = c.b AND bb.pos = ba.pos
  GROUP BY c.a, c.b
)
SELECT img_a, img_b, sse FROM sse_t
WHERE sse * {scale} <= 65025 * nv
ORDER BY img_a, img_b
"""


# explicit whitespace classes (identical to text._TOKEN_RE /
# TextStats.BPE_RE) so the Python-re kernels and the RE2 oracle can
# never disagree on a codepoint's whitespace-ness
_TOKEN_STATS_SQL = r"""
SELECT doc_id,
  len(regexp_extract_all(text, '[^\t\n\f\r ]+')) AS n_tokens,
  len(list_distinct(regexp_extract_all(text, '[^\t\n\f\r ]+'))) AS n_uniq,
  length(regexp_replace(text, '[\t\n\f\r ]', '', 'g')) AS n_alpha,
  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]{1,3}|[^\t\n\f\r a-zA-Z0-9]+')) AS n_bpe
FROM documents
"""

_QUALITY_SQL = r"""
WITH t AS (SELECT doc_id, regexp_extract_all(text, '[^\t\n\f\r ]+') AS toks FROM documents)
SELECT doc_id,
  (len(list_filter(toks, w -> w IN ('the','a','and','of','to'))) * 1000)
    // greatest(len(toks), 1) AS stop_permille,
  (len(list_distinct(toks)) * 1000) // greatest(len(toks), 1) AS uniq_permille
FROM t
"""


def _doc_profile_sql() -> str:
    """Long-form (doc_id, metric, value) union of the four per-doc
    profiling oracles — the SQL twin of :func:`_q_doc_profile`
    (integers CAST to VARCHAR identically on both sides)."""
    from pkd_tree_ray.text import sql_classifier_scores, sql_lang_id

    def unpivot(sql: str, metrics, rename=None):
        return [
            f"SELECT doc_id, '{(rename or {}).get(m, m)}' AS metric, "
            f"CAST({m} AS VARCHAR) AS value FROM ({sql})"
            for m in metrics
        ]

    parts = (
        unpivot(_TOKEN_STATS_SQL, ["n_tokens", "n_uniq", "n_alpha", "n_bpe"])
        + unpivot(_QUALITY_SQL, ["stop_permille", "uniq_permille"])
        + unpivot(
            sql_classifier_scores(),
            ["n_tokens", "logit", "keep"],
            {"n_tokens": "cls_n_tokens"},
        )
        + [
            "SELECT doc_id, 'pred_lang' AS metric, pred_lang AS value "
            f"FROM ({sql_lang_id()})"
        ]
    )
    return "\nUNION ALL\n".join(parts)


def _sql_tagged(tagcol: str, parts) -> str:
    """UNION ALL of ``(tag_literal, select_body, inner_sql)`` triples —
    the SQL twin of the Ray-side variant folds (``_tag_cols``)."""
    return "\nUNION ALL\n".join(
        f"SELECT {tag} AS {tagcol}, {body} FROM ({sql})"
        for tag, body, sql in parts
    )


def oracle_sql() -> dict[str, str]:
    from pkd_tree_ray.clustering import sql_kmeans_assign, sql_semdedup
    from pkd_tree_ray.packing import sql_pack_sequences
    from pkd_tree_ray.sampling import sql_hash_split, sql_sample_per_key

    boxes_rep = workloads.report_boxes()
    circ = workloads.circles()
    polys = workloads.polygons()
    pip_count_sql = "\nUNION ALL\n".join(
        f"SELECT {i} AS poly_id, count(*) AS cnt FROM pts WHERE "
        + workloads.sql_polygon_predicate(v)
        for i, v in enumerate(polys)
    )
    pip_join_sql = "\nUNION ALL\n".join(
        f"SELECT {i} AS poly_id, point_id FROM pts WHERE "
        + workloads.sql_polygon_predicate(v, "x", "y")
        for i, v in enumerate(polys)
    )
    from pkd_tree_ray.geometry import sql_point_in_polygon
    from pkd_tree_ray.components import sql_dedup_clusters
    from pkd_tree_ray.spans import sql_dedup_spans
    from pkd_tree_ray.lines import sql_dedup_lines, sql_repetition_scores
    from pkd_tree_ray.sketches import sql_heavy_hitters, sql_hll_tokens
    from pkd_tree_ray.quantiles import sql_percentile_filter, sql_quantiles
    from pkd_tree_ray.temporal import sql_asof_join, sql_sessionize, sql_window_agg
    from pkd_tree_ray.text import (
        sql_classifier_scores,
        sql_decontaminate,
        sql_fingerprints,
        sql_lang_id,
        sql_minhash_neardup,
        sql_ngram_jaccard_neardup,
        sql_redact_pii,
        sql_simhash,
        sql_simhash_neardup,
        sql_curate_corpus,
        sql_tfidf_topk,
        sql_vocab_topk,
    )
    from pkd_tree_ray.membership import sql_broadcast_join, sql_semi_join
    from pkd_tree_ray.ranking import sql_topn_per_group

    pip_concave_sql = "\nUNION ALL\n".join(
        f"SELECT {i} AS poly_id, count(*) AS cnt FROM pts WHERE "
        + sql_point_in_polygon("x", "y", v)
        for i, v in enumerate(workloads.concave_polygons())
    )
    out = {
        "selfcheck": """
SELECT count(*) AS n_region, CAST(1 AS BIGINT) AS tmp_writable FROM region
""",
        "build_summary": f"""
WITH pts AS ({sources.sql_lineitem_points()})
SELECT count(*) AS n, min(x) AS min_x, min(y) AS min_y,
       max(x) AS max_x, max(y) AS max_y FROM pts
""",
        "range_count": _range_count_sql(sources.sql_lineitem_points()),
        "range_report": f"""
WITH pts AS ({sources.sql_lineitem_points()}),
q AS (SELECT * FROM {workloads.sql_values_boxes(boxes_rep)})
SELECT q.qid, p.point_id, p.x, p.y
FROM pts p JOIN q
  ON p.x BETWEEN q.min_x AND q.max_x AND p.y BETWEEN q.min_y AND q.max_y
""",
        "circle_count": _sql_tagged(
            "variant",
            [
                ("'d2'", "qid, cnt", f"""
WITH pts AS ({sources.sql_lineitem_points()}),
q AS (SELECT * FROM {workloads.sql_values_circles(circ)})
SELECT q.qid,
       (SELECT count(*) FROM pts p
        WHERE (p.x - q.cx) * (p.x - q.cx) + (p.y - q.cy) * (p.y - q.cy)
              <= CAST(q.r AS BIGINT) * q.r) AS cnt
FROM q
"""),
                ("'d3'", "qid, cnt", _circle_count_d3_sql()),
            ],
        ),
        "knn_multi": _sql_tagged(
            "k",
            [
                (f"CAST({k} AS BIGINT)", 'qid, "rank", neighbor, dist2', _knn_sql(k))
                for k in (1, 10, 100)
            ],
        ),
        "knn_k10_variants": _sql_tagged(
            "variant",
            [
                (f"'{tag}'",
                 'qid, "rank", neighbor, CAST(dist2 AS DOUBLE) AS dist2',
                 sql)
                for tag, sql in [
                    ("d3", _knn_d3_sql(10)),
                    ("float", _knn_float_sql(10)),
                    ("float_native", _knn_float_native_sql(10)),
                ]
            ],
        ),
        "range_count_variants": _sql_tagged(
            "variant",
            [
                ("'d3'", "qid, cnt", _range_count_d3_sql()),
                ("'float'", "qid, cnt", _range_count_float_sql()),
                ("'float_native'", "qid, cnt", _range_count_float_native_sql()),
            ],
        ),
        "update_range_count": _sql_tagged(
            "phase",
            [
                ("'insert'", "qid, cnt", _range_count_sql(
                    f"{sources.sql_lineitem_points()} UNION ALL {sources.sql_orders_points()}"
                )),
                ("'delete'", "qid, cnt", _range_count_sql(
                    f"SELECT * FROM ({sources.sql_lineitem_points()}) WHERE point_id % 10 <> 0"
                )),
                ("'compact'", "qid, cnt", _range_count_sql(
                    f"SELECT * FROM ({sources.sql_lineitem_points()}) WHERE point_id % 5 > 1"
                )),
            ],
        ),
        "tile_counts": f"""
WITH pts AS ({sources.sql_lineitem_points()})
SELECT x // {workloads.TILE_SHIFT} AS tile_x, y // {workloads.TILE_SHIFT} AS tile_y,
       count(*) AS cnt
FROM pts GROUP BY 1, 2
""",
        "pip_count": _sql_tagged(
            "shape",
            [
                ("'convex'", "poly_id, cnt",
                 f"WITH pts AS ({sources.sql_lineitem_points()})\n" + pip_count_sql),
                ("'concave'", "poly_id, cnt",
                 f"WITH pts AS ({sources.sql_lineitem_points()})\n" + pip_concave_sql),
            ],
        ),
        "pip_join": f"WITH pts AS ({sources.sql_lineitem_points()})\n" + pip_join_sql,
        "knn_join": f"""
WITH pts AS ({sources.sql_lineitem_points()}),
q AS (SELECT * FROM ({sources.sql_customer_points()}) WHERE c_custkey % 30 = 0),
d AS (
  SELECT q.c_custkey, p.point_id AS neighbor,
         (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y) AS dist2,
         row_number() OVER (
           PARTITION BY q.c_custkey
           ORDER BY (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y),
                    p.point_id
         ) AS "rank"
  FROM pts p CROSS JOIN q
)
SELECT c_custkey, "rank", neighbor, dist2 FROM d WHERE "rank" <= 3
""",
        "radius_join": f"""
WITH a AS ({sources.sql_customer_points()}),
b AS ({sources.sql_lineitem_points()})
SELECT a.c_custkey, b.point_id,
       (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
FROM a CROSS JOIN b
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      <= {RADIUS_JOIN_R * RADIUS_JOIN_R}
""",
        "window_range_count": _range_count_sql(
            sources.sql_events_points(
                _WINDOW_STEPS - _WINDOW_LEN, _WINDOW_STEPS - 1
            )
        ),
        "exact_dedup": """
SELECT min(doc_id) AS doc_id, count(*) AS dup_cnt
FROM documents GROUP BY text
""",
        "curate_corpus": sql_curate_corpus() + " ORDER BY doc_id",
        "doc_profile": _doc_profile_sql(),
        # quantized-L2 exact top-5: scores are integers exactly
        # representable in DOUBLE (|q|<=1000-ish, d=64), so
        # list_dot_product arithmetic is bit-exact
        "knn_graph": f"""
WITH pts AS ({sources.sql_customer_points()}),
d AS (
  SELECT a.c_custkey AS src, b.c_custkey AS dst,
         (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2,
         row_number() OVER (
           PARTITION BY a.c_custkey
           ORDER BY (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y),
                    b.c_custkey
         ) AS "rank"
  FROM pts a JOIN pts b ON a.c_custkey <> b.c_custkey
)
SELECT src, "rank", dst, dist2 FROM d WHERE "rank" <= 5
""",
        "ann_l2q": """
WITH e AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
  FROM embeddings
),
q AS (SELECT vec_id AS qvid, qv FROM e WHERE vec_id % 50 = 0),
d AS (
  SELECT q.qvid AS qid, e.vec_id AS neighbor,
         CAST(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])
              - 2 * list_dot_product(q.qv::DOUBLE[], e.qv::DOUBLE[])
              + list_dot_product(e.qv::DOUBLE[], e.qv::DOUBLE[]) AS BIGINT) AS score,
         row_number() OVER (
           PARTITION BY q.qvid
           ORDER BY CAST(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[])
                    - 2 * list_dot_product(q.qv::DOUBLE[], e.qv::DOUBLE[])
                    + list_dot_product(e.qv::DOUBLE[], e.qv::DOUBLE[]) AS BIGINT),
                    e.vec_id
         ) AS "rank"
  FROM e CROSS JOIN q
)
SELECT qid, "rank", neighbor, score FROM d WHERE "rank" <= 5
""",
        "image_knn": _image_knn_sql(10),
        "image_decode_stats": _image_decode_stats_sql(),
        "image_neardup": _sql_tagged(
            "method",
            [
                ("'ahash'", "img_a, img_b, hamming AS metric",
                 _image_ahash_neardup_sql(max_hamming=3, cap=64)),
                ("'mse'", "img_a, img_b, sse AS metric",
                 _image_mse_neardup_sql(cap=64, dup_every=16, psnr_db=20)),
            ],
        ),
        "sample_per_lang": sql_sample_per_key(
            "documents", "lang", "doc_id", 20, seed=7,
            cols="lang, doc_id, source",
        ) + " ORDER BY lang, doc_id",
        "corpus_split": sql_hash_split(
            "documents", "doc_id", 100, seed=21, cols="doc_id, lang"
        ) + " ORDER BY doc_id",
        "pack_sequences": sql_pack_sequences(2048) + " ORDER BY doc_id",
        "kmeans_assign": sql_kmeans_assign(k=8, seed=11),
        "semdedup": sql_semdedup(k=8, seed=11, threshold=0.95),
        "redact_pii": sql_redact_pii(_PII_DOCS_SQL),
        "dedup_lines": sql_dedup_lines(docs_sql=_LINES_DOCS_SQL),
        "repetition_scores": sql_repetition_scores(docs_sql=_LINES_DOCS_SQL),
        "hll_tokens": sql_hll_tokens(),
        "doc_signatures": _sql_tagged(
            "kind",
            [
                ("'simhash'", "doc_id, simhash AS sig", sql_simhash()),
                ("'bucket16'", "doc_id, bucket16 AS sig", sql_simhash()),
                ("'fingerprint'", "doc_id, fingerprint AS sig", sql_fingerprints()),
            ],
        ),
        "text_neardup": _sql_tagged(
            "method",
            [
                ("'minhash'", "doc_a, doc_b, jaccard_permille AS metric",
                 sql_minhash_neardup(threshold=0.5)),
                ("'simhash'", "doc_a, doc_b, hamming AS metric",
                 sql_simhash_neardup(max_hamming=3)),
                ("'ngram'", "doc_a, doc_b, jaccard_permille AS metric",
                 sql_ngram_jaccard_neardup(threshold=0.5)),
            ],
        ),
        "dedup_spans": sql_dedup_spans(window=4),
        "dedup_clusters": sql_dedup_clusters(
            sql_ngram_jaccard_neardup(threshold=0.5)
        ),
        "decontaminate": sql_decontaminate(
            window=4, bench_mod=DECON_BENCH_MOD
        ),
        "vocab_topk": sql_vocab_topk(k=50),
        "heavy_hitters": sql_heavy_hitters(k=20),
        "membership_join": _sql_tagged(
            "mode",
            [
                ("'semi'", "l_orderkey, l_linenumber", sql_semi_join(
                    "SELECT l_orderkey, l_linenumber FROM lineitem",
                    "l_orderkey",
                    f"SELECT o_orderkey FROM orders WHERE o_totalprice > {_SEMI_PRICE_CUT}",
                    "o_orderkey",
                )),
                ("'anti'", "l_orderkey, l_linenumber", sql_semi_join(
                    "SELECT l_orderkey, l_linenumber FROM lineitem",
                    "l_orderkey",
                    f"SELECT o_orderkey FROM orders WHERE o_totalprice > {_SEMI_PRICE_CUT}",
                    "o_orderkey",
                    anti=True,
                )),
            ],
        ),
        "broadcast_join": sql_broadcast_join(
            "SELECT l_orderkey, l_linenumber FROM lineitem",
            "l_orderkey",
            "SELECT o_orderkey, o_custkey, o_orderpriority FROM orders "
            f"WHERE o_totalprice > {_SEMI_PRICE_CUT}",
            "o_orderkey",
            ["o_custkey", "o_orderpriority"],
        )
        + " ORDER BY l_orderkey, l_linenumber",
        "topn_per_group": sql_topn_per_group("lang", "n_chars", "doc_id", n=3)
        + ' ORDER BY lang, "rank"',
        "tfidf_topk": sql_tfidf_topk(k=5),
        "quantile_suite": _sql_tagged(
            "kind",
            [
                ("'q'", "q_permille AS id, value",
                 sql_quantiles("n_chars", _QUANTILE_QS)),
                ("'doc'", "doc_id AS id, n_chars AS value",
                 sql_percentile_filter("n_chars", 0.9)),
            ],
        ),
        "asof_join": sql_asof_join("purchase", "click"),
        "sessionize": sql_sessionize(gap_s=1800),
        "window_agg": sql_window_agg(width_s=3600),
        "embedding_neardup": _embedding_neardup_sql(),
    }
    # exhaustive-probe IVF must reproduce brute force bit-for-bit, so
    # both arms of ann_exact share the brute-force SQL
    out["ann_exact"] = _sql_tagged(
        "method",
        [
            ("'brute'", 'qid, "rank", neighbor, score', out["ann_l2q"]),
            ("'ivf_exact'", 'qid, "rank", neighbor, score', out["ann_l2q"]),
        ],
    )
    del out["ann_l2q"]
    return out
