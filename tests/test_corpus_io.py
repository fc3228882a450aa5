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
