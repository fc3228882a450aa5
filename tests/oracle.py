"""Brute-force numpy oracle — plays the role CGAL plays for the
reference (``tests/checkCorrectParallel.cpp:41-137``)."""

from __future__ import annotations

import numpy as np


def knn_oracle(
    px: np.ndarray, py: np.ndarray, pid: np.ndarray, qx, qy, k: int
) -> list[list[tuple[int, int]]]:
    """Per query: list of (dist2, id) of the k nearest, tie-broken by
    (dist2, id) ascending — matching the engine and the SQL oracle."""
    out = []
    for x0, y0 in zip(np.atleast_1d(qx), np.atleast_1d(qy)):
        d2 = (px - np.int64(x0)) ** 2 + (py - np.int64(y0)) ** 2
        order = np.lexsort((pid, d2))[: min(k, len(px))]
        out.append([(int(d2[i]), int(pid[i])) for i in order])
    return out


def range_count_oracle(px, py, box) -> int:
    m = (px >= box[0]) & (px <= box[2]) & (py >= box[1]) & (py <= box[3])
    return int(m.sum())


def range_report_oracle(px, py, pid, box) -> set[int]:
    m = (px >= box[0]) & (px <= box[2]) & (py >= box[1]) & (py <= box[3])
    return set(int(v) for v in pid[m])


def circle_count_oracle(px, py, cx, cy, r) -> int:
    d2 = (px - np.int64(cx)) ** 2 + (py - np.int64(cy)) ** 2
    return int((d2 <= np.int64(r) * np.int64(r)).sum())
