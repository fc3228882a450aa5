"""Tests for the HyperLogLog distinct-count sketch (sketches.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(texts, ray_session, n_blocks: int = 1):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": np.arange(len(texts), dtype=np.int64),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def _corpus(n_distinct: int, n_docs: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    vocab = np.array([f"tok{i:07d}" for i in range(n_distinct)])
    return [
        " ".join(vocab[rng.randint(0, n_distinct, size=40)])
        for _ in range(n_docs)
    ]


class TestHll:
    @pytest.mark.parametrize("n_distinct", [50, 2_000, 60_000])
    def test_estimate_accuracy(self, ray_session, n_distinct):
        from pkd_tree_ray.sketches import HLL_P, hll_estimate, hll_tokens

        # enough docs that every vocab word is (almost surely) seen
        texts = _corpus(n_distinct, max(200, n_distinct // 4))
        seen = len(set(" ".join(texts).split()))
        regs = hll_tokens(_ds(texts, ray_session, n_blocks=8)).to_pandas()
        est = hll_estimate(regs)
        sigma = 1.04 / np.sqrt(1 << HLL_P)
        assert abs(est - seen) <= max(4 * sigma * seen, 3.0), (est, seen)

    def test_partition_invariance(self, ray_session):
        """The merged registers must not depend on block layout."""
        from pkd_tree_ray.sketches import hll_tokens

        texts = _corpus(500, 300, seed=3)
        a = (
            hll_tokens(_ds(texts, ray_session, n_blocks=1))
            .to_pandas()
            .sort_values("bucket")
            .reset_index(drop=True)
        )
        b = (
            hll_tokens(_ds(texts, ray_session, n_blocks=13))
            .to_pandas()
            .sort_values("bucket")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_registers_match_duckdb(self, ray_session):
        import duckdb

        from pkd_tree_ray.sketches import hll_tokens, sql_hll_tokens

        texts = _corpus(300, 100, seed=7) + ["", "  ", "único par"]
        df = pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
        got = (
            hll_tokens(_ds(texts, ray_session, n_blocks=5))
            .to_pandas()
            .sort_values("bucket")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", df)
        want = (
            con.execute(sql_hll_tokens())
            .df()
            .sort_values("bucket")
            .reset_index(drop=True)
        )
        assert got["bucket"].tolist() == want["bucket"].tolist()
        assert got["rho"].tolist() == want["rho"].tolist()

    def test_rho_kernel(self):
        """rho = 1 + leading zeros of the low 52 bits; exact at the
        edges (w = 0, 1, 2**51, 2**52 - 1)."""
        from pkd_tree_ray.sketches import _rho_and_bucket

        p = 12
        h = np.array(
            [0, 1, 1 << 51, (1 << 52) - 1, (1 << 52) * 5 + 3],
            dtype=np.uint64,
        )
        bucket, rho = _rho_and_bucket(h, p)
        # w = 3 -> bit_length 2 -> rho = 52 + 1 - 2 = 51
        assert rho.tolist() == [53, 52, 1, 1, 51]
        assert bucket.tolist() == [0, 0, 0, 0, 5]
