"""Tests for the resumable partitioned corpus sink (corpus_io.py)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from pkd_tree_ray.corpus_io import read_corpus, write_corpus


def _corpus(n=500):
    ids = np.arange(n, dtype=np.int64)
    return pa.table(
        {
            "doc_id": ids,
            "text": pa.array([f"doc {i} body" for i in ids], pa.string()),
            "split": pa.array(
                np.where(ids % 10 == 0, "holdout", "train"), pa.string()
            ),
        }
    )


class TestWriteCorpus:
    def test_roundtrip_partitioned(self, ray_session, tmp_path):
        tbl = _corpus()
        root = str(tmp_path / "out")
        man = write_corpus(
            rd.from_arrow(tbl).repartition(6), root, partition_cols=("split",)
        )
        assert man["n_rows"] == 500 and man["n_skipped"] == 0
        assert os.path.exists(os.path.join(root, "_manifest.json"))
        assert os.path.isdir(os.path.join(root, "split=train"))
        back = (
            read_corpus(root)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = tbl.to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert back["doc_id"].tolist() == want["doc_id"].tolist()
        assert back["text"].tolist() == want["text"].tolist()
        # Hive partition value re-derived on read
        assert back["split"].tolist() == want["split"].tolist()

    def test_resume_skips_existing_parts(self, ray_session, tmp_path):
        tbl = _corpus()
        root = str(tmp_path / "out2")
        ds = rd.from_arrow(tbl).repartition(6)
        write_corpus(ds, root, partition_cols=("split",))
        # record every part file's mtime, then re-run the identical job
        files = {}
        for dirp, _, names in os.walk(root):
            for nm in names:
                if nm.endswith(".parquet"):
                    p = os.path.join(dirp, nm)
                    files[p] = os.stat(p).st_mtime_ns
        man2 = write_corpus(ds, root, partition_cols=("split",))
        assert man2["n_skipped"] == man2["n_parts"] > 0  # nothing rewritten
        for p, mt in files.items():
            assert os.stat(p).st_mtime_ns == mt, p

    def test_partial_resume_writes_only_missing(self, ray_session, tmp_path):
        tbl = _corpus()
        root = str(tmp_path / "out3")
        ds = rd.from_arrow(tbl).repartition(6)
        write_corpus(ds, root, partition_cols=("split",))
        # simulate a killed run: delete one part file
        victims = []
        for dirp, _, names in os.walk(root):
            for nm in names:
                if nm.endswith(".parquet"):
                    victims.append(os.path.join(dirp, nm))
        os.remove(victims[0])
        man = write_corpus(ds, root, partition_cols=("split",))
        assert man["n_parts"] - man["n_skipped"] == 1  # exactly the hole
        back = read_corpus(root).to_pandas()
        assert len(back) == 500

    def test_unpartitioned(self, ray_session, tmp_path):
        tbl = _corpus(120)
        root = str(tmp_path / "flat")
        man = write_corpus(rd.from_arrow(tbl).repartition(3), root)
        assert man["n_rows"] == 120
        back = read_corpus(root).to_pandas().sort_values("doc_id")
        assert back["doc_id"].tolist() == list(range(120))

    def test_stale_tmp_never_reaches_readers(self, ray_session, tmp_path):
        """A killed writer's torn .tmp must not crash or duplicate rows
        on read, and a resumed run removes it."""
        tbl = _corpus(100)
        root = str(tmp_path / "torn")
        ds = rd.from_arrow(tbl).repartition(2)
        write_corpus(ds, root, partition_cols=("split",))
        torn = os.path.join(root, "split=train", "part-deadbeef.parquet.tmp")
        with open(torn, "wb") as f:
            f.write(b"not parquet")
        # reader ignores tmp files outright
        assert len(read_corpus(root).to_pandas()) == 100
        # resumed run vacuums it (not in the manifest's live set)
        write_corpus(ds, root, partition_cols=("split",))
        assert not os.path.exists(torn)

    def test_changed_content_rewrites_parts(self, ray_session, tmp_path):
        """Same ids, different row content -> different fingerprints:
        the new data is written and the stale parts vacuumed, never
        silently skipped."""
        root = str(tmp_path / "chg")
        ids = np.arange(60, dtype=np.int64)

        def mk(suffix):
            return rd.from_arrow(
                pa.table(
                    {
                        "doc_id": ids,
                        "text": pa.array([f"doc {i} {suffix}" for i in ids]),
                    }
                )
            ).repartition(2)

        write_corpus(mk("v1"), root)
        man2 = write_corpus(mk("v2"), root)
        assert man2["n_skipped"] == 0  # content changed -> all rewritten
        back = read_corpus(root).to_pandas().sort_values("doc_id")
        assert len(back) == 60  # stale v1 parts vacuumed, no duplicates
        assert back["text"].iloc[0].endswith("v2")

    def test_partition_value_validation(self, ray_session, tmp_path):
        import pytest

        bad = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "split": pa.array(["a/b", "ok"], pa.string()),
            }
        )
        with pytest.raises(Exception, match="must not"):
            write_corpus(
                rd.from_arrow(bad), str(tmp_path / "bad"),
                partition_cols=("split",),
            )
        withnull = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "split": pa.array(["ok", None], pa.string()),
            }
        )
        with pytest.raises(Exception, match="null"):
            write_corpus(
                rd.from_arrow(withnull), str(tmp_path / "bad2"),
                partition_cols=("split",),
            )
