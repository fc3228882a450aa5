"""Sequence packing (packing.pack_sequences) — distributed prefix sum."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from pkd_tree_ray.packing import pack_sequences


def _docs_tbl(n=400, seed=9):
    rng = np.random.RandomState(seed)
    ids = np.arange(n, dtype=np.int64) * 3 + 1  # non-contiguous ids
    texts = [
        " ".join(f"w{j}" for j in range(rng.randint(1, 40))) for _ in range(n)
    ]
    return pa.table({"doc_id": ids, "text": texts})


def _oracle(tbl, budget):
    from pkd_tree_ray.text import TextStats

    df = tbl.to_pandas().sort_values("doc_id").reset_index(drop=True)
    stats = TextStats()(df)
    n_tok = stats["n_bpe"].to_numpy(np.int64)
    before = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_tok": n_tok,
            "seq_id": before // budget,
            "tok_offset": before % budget,
        }
    )


class TestPackSequences:
    def test_matches_serial_oracle_across_buckets(self, ray_session):
        tbl = _docs_tbl()
        want = _oracle(tbl, budget=128)
        # bucket_rows=100 forces ~12 buckets; repartition scrambles
        # batch boundaries relative to buckets
        got = (
            pack_sequences(
                rd.from_arrow(tbl).repartition(7), budget=128, bucket_rows=100
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)

    def test_offsets_are_a_valid_chunking(self, ray_session):
        tbl = _docs_tbl(150, seed=4)
        out = (
            pack_sequences(rd.from_arrow(tbl), budget=64, bucket_rows=64)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        # reconstruct the global token stream: offsets must be the
        # running total mod budget and seq_ids non-decreasing
        before = out["seq_id"].to_numpy() * 64 + out["tok_offset"].to_numpy()
        assert (np.diff(before) == out["n_tok"].to_numpy()[:-1]).all()
        assert (out["tok_offset"] < 64).all()
