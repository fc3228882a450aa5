"""decontaminate: broadcast bench-window membership scan.

Planted overlaps: training docs that embed an exact n-token span of a
bench doc must flag; docs sharing only shorter spans must not; the
sub-window whole-doc fold path must match full short docs exactly.
"""

import numpy as np
import pyarrow as pa

from pkd_tree_ray.text import decontaminate


def _ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
            }
        )
    ).repartition(2)


def test_planted_overlap(ray_session):
    bench = _ds([(1, "alpha beta gamma delta epsilon zeta"), (2, "one two")])
    docs = _ds(
        [
            # embeds a 4-token bench span twice (overlapping windows)
            (10, "xx beta gamma delta epsilon zeta yy"),
            # shares only 3 consecutive bench tokens -> clean at w=4
            (11, "beta gamma delta xx yy zz"),
            (12, "nothing shared here at all"),
            # short doc == short bench doc: whole-doc fold must match
            (13, "one two"),
            # short doc, different tokens
            (14, "one three"),
            (15, ""),
        ]
    )
    out = (
        decontaminate(docs, bench, window=4)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [10, 11, 12, 13, 14, 15]
    assert out.loc[10, "contaminated"] == 1 and out.loc[10, "n_hits"] == 2
    assert out.loc[11, "contaminated"] == 0
    assert out.loc[12, "contaminated"] == 0
    assert out.loc[13, "contaminated"] == 1 and out.loc[13, "n_hits"] == 1
    assert out.loc[14, "contaminated"] == 0
    assert out.loc[15, "contaminated"] == 0 and out.loc[15, "n_hits"] == 0


def test_empty_bench(ray_session):
    docs = _ds([(1, "a b c d e")])
    out = decontaminate(docs, _ds([]), window=4).to_pandas()
    assert len(out) == 1 and out["contaminated"].sum() == 0
