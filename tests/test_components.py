"""Distributed connected components vs a driver-side union-find."""

import numpy as np
import pyarrow as pa
import pytest

from pkd_tree_ray.components import connected_components, dedup_clusters


def _uf_components(n_nodes: int, edges: np.ndarray) -> np.ndarray:
    parent = np.arange(n_nodes)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id representative per component
    reps = np.array([find(i) for i in range(n_nodes)])
    out = np.empty(n_nodes, dtype=np.int64)
    for c in np.unique(reps):
        out[reps == c] = np.min(np.nonzero(reps == c)[0])
    return out


def _pairs_ds(edges: np.ndarray, n_blocks: int = 1):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array(edges[:, 0], pa.int64()),
                "doc_b": pa.array(edges[:, 1], pa.int64()),
            }
        )
    )
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


@pytest.mark.usefixtures("ray_session")
def test_random_graph_matches_union_find():
    # edges scattered over 8 blocks: the block-local contraction only
    # sees fragments, so the distributed rounds must do real merging
    rng = np.random.default_rng(3)
    n = 400
    edges = rng.integers(0, n, size=(300, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    exp = _uf_components(n, edges)
    import ray.data as rd

    docs = rd.from_arrow(pa.table({"doc_id": pa.array(np.arange(n), pa.int64())}))
    got = (
        dedup_clusters(docs, _pairs_ds(edges, n_blocks=8))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == list(range(n))
    assert got["component"].tolist() == exp.tolist()
    assert got["keep"].tolist() == (np.arange(n) == exp).astype(int).tolist()


@pytest.mark.usefixtures("ray_session")
def test_cross_block_chain_converges():
    # a 600-node path shuffled over 20 blocks (> _FAN_IN, so the merge
    # tree has depth >1): each block contracts its fragments locally;
    # the residual star graph still chains across blocks and must be
    # stitched by the k-ary reduction
    n = 600
    edges = np.stack([np.arange(n - 1), np.arange(1, n)], axis=1)
    edges = edges[np.random.default_rng(7).permutation(n - 1)]
    got = (
        connected_components(_pairs_ds(edges, n_blocks=20))
        .to_pandas()
        .sort_values("node")
    )
    assert got["lab"].nunique() == 1 and got["lab"].iloc[0] == 0
    assert len(got) == n


@pytest.mark.usefixtures("ray_session")
def test_dedup_clusters_keep_flags():
    import ray.data as rd

    edges = np.array([[1, 4], [4, 7], [2, 5]])
    docs = rd.from_arrow(pa.table({"doc_id": pa.array(np.arange(8), pa.int64())}))
    out = (
        dedup_clusters(docs, _pairs_ds(edges))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["component"].tolist() == [0, 1, 2, 3, 1, 2, 6, 1]
    assert out["keep"].tolist() == [1, 1, 1, 1, 0, 0, 1, 0]
