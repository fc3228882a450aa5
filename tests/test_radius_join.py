"""radius_join: grid-bucketed epsilon-distance join vs brute force.

Covers the grid edge cases brute force won't forgive: points on exact
cell borders, pairs at exactly dist = r (boundary inclusive), the
chunked candidate sweep on a deliberately hot cell, and empty results.
"""

import numpy as np
import pyarrow as pa
import pytest

import pkd_tree_ray.joins as joins
from pkd_tree_ray.joins import radius_join


def _brute(ax, ay, aid, bx, by, bid, r):
    dx = ax[:, None] - bx[None, :]
    dy = ay[:, None] - by[None, :]
    d2 = dx * dx + dy * dy
    ai, bi = np.nonzero(d2 <= r * r)
    return sorted(zip(aid[ai].tolist(), bid[bi].tolist(), d2[ai, bi].tolist()))


def _run(ray_session, ax, ay, bx, by, r):
    import ray.data as rd

    aid = np.arange(len(ax), dtype=np.int64)
    bid = np.arange(len(bx), dtype=np.int64) + 10_000
    a = rd.from_arrow(
        pa.table({"a_id": aid, "x": ax.astype(np.int64), "y": ay.astype(np.int64)})
    ).repartition(4)
    b = rd.from_arrow(
        pa.table({"b_id": bid, "x": bx.astype(np.int64), "y": by.astype(np.int64)})
    ).repartition(4)
    out = radius_join(a, b, r).to_pandas()
    if out.empty:  # all-empty blocks may drop the schema entirely
        got = []
    else:
        got = sorted(zip(out["a_id"], out["b_id"], out["dist2"]))
    want = _brute(ax, ay, aid, bx, by, bid, r)
    assert got == want
    return len(got)


def test_random_vs_brute(ray_session):
    rng = np.random.default_rng(11)
    n = 600
    ax, ay = rng.integers(0, 100_000, n), rng.integers(0, 100_000, n)
    bx, by = rng.integers(0, 100_000, 2 * n), rng.integers(0, 100_000, 2 * n)
    hits = _run(ray_session, ax, ay, bx, by, r=4000)
    assert hits > 50  # the fixture actually exercises matches


def test_cell_borders_and_exact_radius(ray_session):
    # A at a grid corner; B ring at exactly r along the axes and
    # diagonally at r+1 (excluded), plus same-point dist 0.
    r = 1000
    ax = np.array([3000, 0])
    ay = np.array([2000, 0])
    bx = np.array([3000 + r, 3000 - r, 3000, 3000, 3000, 3000 + r, 0])
    by = np.array([2000, 2000, 2000 + r, 2000 - r, 2000, 2000 + r, 0])
    hits = _run(ray_session, ax, ay, bx, by, r)
    # axis ring (4) + coincident (1) + origin pair (1); diagonal out
    assert hits == 6


def test_hot_cell_chunked_sweep(ray_session, monkeypatch):
    # one cell holds everything -> candidate count 300*900 far above
    # the patched chunk cap, forcing the multi-chunk path
    monkeypatch.setattr(joins, "_RJ_CHUNK_PAIRS", 1 << 12)
    rng = np.random.default_rng(5)
    ax, ay = rng.integers(0, 900, 300), rng.integers(0, 900, 300)
    bx, by = rng.integers(0, 900, 900), rng.integers(0, 900, 900)
    _run(ray_session, ax, ay, bx, by, r=1000)


def test_no_matches(ray_session):
    ax, ay = np.array([0]), np.array([0])
    bx, by = np.array([500_000]), np.array([500_000])
    assert _run(ray_session, ax, ay, bx, by, r=10) == 0


def test_r_validation():
    with pytest.raises(ValueError):
        radius_join(None, None, 0)
