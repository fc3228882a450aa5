"""Box / circle / polygon algebra and distance kernels (pure numpy).

Semantics mirror the reference exactly:

* boxes are **closed** intervals — inclusive on every face
  (``include/cpdd/utility/box_op.hpp:33-42``);
* all distances are **squared** Euclidean — no sqrt anywhere
  (``include/cpdd/query_op/nn_search.hpp:9-16``);
* point-to-box min/max distances follow
  ``nn_search.hpp:18-45`` (clamp per dimension).

Everything is vectorized over numpy arrays; coordinates are int64 so
comparisons are exact (the reference's float-epsilon comparator,
``include/cpdd/comparator.h:10-79``, is unnecessary for the int64
default the reference itself recommends, ``README.md:137``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class Box:
    """Axis-aligned closed rectangle (min corner, max corner) —
    ``std::pair<point, point>`` at ``kdTreeParallel.h:28``."""

    min_x: int
    min_y: int
    max_x: int
    max_y: int

    def legal(self) -> bool:  # box_op.hpp:7-12
        return self.min_x <= self.max_x and self.min_y <= self.max_y

    def as_array(self) -> np.ndarray:
        return np.array([self.min_x, self.min_y, self.max_x, self.max_y], dtype=np.int64)


@dataclass(frozen=True)
class Circle:
    """Ball (center, radius) — ``kdTreeParallel.h:30``; membership is
    ``dist2(p, c) <= r*r`` (``box_op.hpp:104-112``)."""

    cx: int
    cy: int
    r: int


# --- point predicates (vectorized over point arrays) --------------------

def within_box(x: np.ndarray, y: np.ndarray, box) -> np.ndarray:
    """Inclusive containment mask — ``box_op.hpp:33-42``.

    ``box`` is a Box or a (min_x, min_y, max_x, max_y) 4-sequence.
    """
    mnx, mny, mxx, mxy = _box4(box)
    return (x >= mnx) & (x <= mxx) & (y >= mny) & (y <= mxy)


def within_circle(x: np.ndarray, y: np.ndarray, circle: Circle) -> np.ndarray:
    dx = x - np.int64(circle.cx)
    dy = y - np.int64(circle.cy)
    return dx * dx + dy * dy <= np.int64(circle.r) * np.int64(circle.r)


def _coord_dt(*arrays) -> type:
    """float64 when any operand is floating (the reference's double
    harness default), else the exact int64 grid."""
    return (
        np.float64
        if any(np.issubdtype(np.asarray(a).dtype, np.floating) for a in arrays)
        else np.int64
    )


# --- box/box relations (vectorized over box arrays) ---------------------
# Box arrays are (n, 2d) int64: columns [min_0..min_{d-1}, max_0..max_{d-1}]
# (min_x, min_y, max_x, max_y at d=2).  Dimension is inferred from the
# box width, so the same kernels serve every configured dimensionality.

def boxes_intersect(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise (broadcasting) closed-interval overlap —
    ``box_op.hpp:44-56``.  a: (n,2d) or (2d,), b: (m,2d) or (2d,);
    returns (n, m) mask."""
    dt = _coord_dt(a, b)
    a = np.atleast_2d(np.asarray(a, dtype=dt))
    b = np.atleast_2d(np.asarray(b, dtype=dt))
    d = a.shape[1] // 2
    out = np.ones((a.shape[0], b.shape[0]), dtype=bool)
    for j in range(d):
        out &= a[:, j, None] <= b[None, :, d + j]
        out &= b[None, :, j] <= a[:, d + j, None]
    return out


def box_contains_box(outer: np.ndarray, inner: np.ndarray) -> np.ndarray:
    """outer (n,2d) fully contains inner (m,2d) -> (n, m) mask —
    ``box_op.hpp:24-31`` (within_box(box, box))."""
    dt = _coord_dt(outer, inner)
    o = np.atleast_2d(np.asarray(outer, dtype=dt))
    i = np.atleast_2d(np.asarray(inner, dtype=dt))
    d = o.shape[1] // 2
    out = np.ones((o.shape[0], i.shape[0]), dtype=bool)
    for j in range(d):
        out &= o[:, j, None] <= i[None, :, j]
        out &= o[:, d + j, None] >= i[None, :, d + j]
    return out


# --- distances ----------------------------------------------------------

def p2p_dist2(x1, y1, x2, y2) -> np.ndarray:
    """Squared Euclidean — ``nn_search.hpp:9-16``."""
    dx = np.asarray(x1, dtype=np.int64) - np.asarray(x2, dtype=np.int64)
    dy = np.asarray(y1, dtype=np.int64) - np.asarray(y2, dtype=np.int64)
    return dx * dx + dy * dy


def p2b_min_dist2(qx, qy, boxes: np.ndarray) -> np.ndarray:
    """Min squared distance from 2-D points (qx, qy) to boxes (m,4);
    broadcasting (n,1) x (1,m) -> (n,m).  ``nn_search.hpp:18-31``."""
    Q = np.stack(
        [np.atleast_1d(np.asarray(qx, dtype=np.int64)),
         np.atleast_1d(np.asarray(qy, dtype=np.int64))],
        axis=1,
    )
    return pnd_b_min_dist2(Q, boxes)


def p2b_max_dist2(qx, qy, boxes: np.ndarray) -> np.ndarray:
    """Max squared distance 2-D point -> box (farthest corner) —
    ``nn_search.hpp:33-45``."""
    Q = np.stack(
        [np.atleast_1d(np.asarray(qx, dtype=np.int64)),
         np.atleast_1d(np.asarray(qy, dtype=np.int64))],
        axis=1,
    )
    return pnd_b_max_dist2(Q, boxes)


def pnd_b_min_dist2(Q: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """Min squared distance from d-dim points Q (n,d) to boxes (m,2d)
    -> (n,m).  Per-dimension clamp, ``nn_search.hpp:18-31``."""
    dt = _coord_dt(Q, boxes)
    Q = np.atleast_2d(np.asarray(Q, dtype=dt))
    b = np.atleast_2d(np.asarray(boxes, dtype=dt))
    d = b.shape[1] // 2
    out = np.zeros((Q.shape[0], b.shape[0]), dtype=dt)
    for j in range(d):
        q = Q[:, j, None]
        dj = np.maximum(np.maximum(b[None, :, j] - q, q - b[None, :, d + j]), 0)
        out += dj * dj
    return out


def pnd_b_max_dist2(Q: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """Max squared distance d-dim point -> box (farthest corner) —
    ``nn_search.hpp:33-45``."""
    dt = _coord_dt(Q, boxes)
    Q = np.atleast_2d(np.asarray(Q, dtype=dt))
    b = np.atleast_2d(np.asarray(boxes, dtype=dt))
    d = b.shape[1] // 2
    out = np.zeros((Q.shape[0], b.shape[0]), dtype=dt)
    for j in range(d):
        q = Q[:, j, None]
        dj = np.maximum(np.abs(q - b[None, :, j]), np.abs(q - b[None, :, d + j]))
        out += dj * dj
    return out


def circle_intersect_box(circle: Circle, boxes: np.ndarray) -> np.ndarray:
    """Ball overlaps box — ``box_op.hpp:114-125`` (min dist <= r)."""
    d2 = p2b_min_dist2(circle.cx, circle.cy, boxes)[0]
    return d2 <= np.int64(circle.r) * np.int64(circle.r)


def circle_contains_box(circle: Circle, boxes: np.ndarray) -> np.ndarray:
    """Ball fully contains box (max dist <= r) — used for the
    contained-cell shortcut in circular range count
    (``range_count.hpp:108-115``)."""
    d2 = p2b_max_dist2(circle.cx, circle.cy, boxes)[0]
    return d2 <= np.int64(circle.r) * np.int64(circle.r)


def bbox_of(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Min/max reduce -> (4,) box; ``get_box(slice)`` at
    ``box_op.hpp:70-80``."""
    return np.array(
        [x.min(), y.min(), x.max(), y.max()], dtype=np.int64
    )


# --- float (double) coordinate kit --------------------------------------
# The reference's harness default is ``coord = double`` with an
# epsilon-aware comparator (``include/cpdd/comparator.h:10-79``); its
# README recommends int64 storage.  The engine mirrors that split:
# float64 inputs are QUANTIZED onto the int64 grid at ingestion
# (``quantize_coords``) and the epsilon comparators below provide the
# Num_Comparator semantics for float-space pre/post-processing.

FLOAT_EPS = 1e-9


def num_eq(a, b, eps: float = FLOAT_EPS) -> np.ndarray:
    """|a - b| <= eps — ``Num_Comparator::Eq`` (comparator.h:24-31)."""
    return np.abs(np.asarray(a, dtype=np.float64) - np.asarray(b, dtype=np.float64)) <= eps


def num_lt(a, b, eps: float = FLOAT_EPS) -> np.ndarray:
    """a < b - eps — strict less with tolerance (comparator.h:33-45)."""
    return np.asarray(a, dtype=np.float64) < np.asarray(b, dtype=np.float64) - eps


def num_gt(a, b, eps: float = FLOAT_EPS) -> np.ndarray:
    return np.asarray(a, dtype=np.float64) > np.asarray(b, dtype=np.float64) + eps


def quantize_coords(v: np.ndarray, scale: int) -> np.ndarray:
    """float64 -> int64 grid: floor(v * scale).  IEEE multiplication +
    floor is deterministic across numpy and DuckDB (both double), so a
    SQL oracle applying the identical expression is bit-exact; two
    floats within 1/scale of each other land on the same or adjacent
    grid cell (the quantized analog of the epsilon comparator)."""
    return np.floor(np.asarray(v, dtype=np.float64) * float(scale)).astype(np.int64)


# --- convex polygons ----------------------------------------------------

def points_in_convex_polygon(x: np.ndarray, y: np.ndarray, verts: np.ndarray) -> np.ndarray:
    """Membership of points in a convex polygon given as CCW vertices
    (k, 2) int64; boundary-inclusive (all cross products >= 0).

    This is the half-plane conjunction form — each edge contributes
    ``(x2-x1)*(y-y1) - (y2-y1)*(x-x1) >= 0`` — chosen because the exact
    same conjunction is expressible in ANSI SQL for the DuckDB oracle.
    """
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    verts = np.asarray(verts, dtype=np.int64)
    mask = np.ones(x.shape, dtype=bool)
    k = len(verts)
    for i in range(k):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % k]
        mask &= (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1) >= 0
    return mask


def points_in_polygon(x: np.ndarray, y: np.ndarray, verts: np.ndarray) -> np.ndarray:
    """Membership of points in an arbitrary SIMPLE polygon (convex or
    not) given as vertices (k, 2) int64 — the even-odd crossing rule,
    integer-exact (the slope comparison is cross-multiplied, never
    divided) so the IDENTICAL arithmetic is expressible in ANSI SQL
    for the DuckDB oracle (see ``sql_point_in_polygon``).

    A rightward ray from the query crosses edge (v1, v2) iff the edge
    spans the query's y (half-open: y1 > qy XOR y2 > qy — shared
    vertices count once) and the edge's x at qy lies strictly right of
    qx.  Boundary points get the deterministic parity of the formula —
    the same on both sides of the oracle."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    verts = np.asarray(verts, dtype=np.int64)
    # the cross-multiplied edge test forms products of two coordinate
    # DIFFERENCES; |coords| <= 2^30 keeps every product within int64
    # exactly (numpy would wrap silently while the SQL twin errors,
    # silently diverging the two oracle sides).  The engine grid is
    # [0, 1e6], far inside the bound.
    lim = np.int64(1) << 30
    if (
        (len(x) and max(abs(int(x.max(initial=0))), abs(int(x.min(initial=0)))) >= lim)
        or (len(y) and max(abs(int(y.max(initial=0))), abs(int(y.min(initial=0)))) >= lim)
        or (len(verts) and int(np.abs(verts).max()) >= lim)
    ):
        raise ValueError("points_in_polygon: |coordinates| must be < 2^30")
    inside = np.zeros(x.shape, dtype=bool)
    k = len(verts)
    for i in range(k):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % k]
        spans = (y1 > y) != (y2 > y)
        # qx < x1 + (x2-x1)(qy-y1)/(y2-y1), cross-multiplied by
        # (y2-y1) with the sign flip folded in
        lhs = (x - x1) * (y2 - y1)
        rhs = (x2 - x1) * (y - y1)
        crosses = np.where(y2 > y1, lhs < rhs, lhs > rhs)
        inside ^= spans & crosses
    return inside


def sql_point_in_polygon(x_expr: str, y_expr: str, verts) -> str:
    """ANSI-SQL predicate computing the same even-odd membership as
    :func:`points_in_polygon` — one integer-exact CASE term per edge,
    odd parity of the sum."""
    import numpy as _np

    v = _np.asarray(verts, dtype=_np.int64)
    terms = []
    k = len(v)
    for i in range(k):
        x1, y1 = int(v[i][0]), int(v[i][1])
        x2, y2 = int(v[(i + 1) % k][0]), int(v[(i + 1) % k][1])
        spans = f"(({y1} > {y_expr}) <> ({y2} > {y_expr}))"
        lhs = f"(({x_expr}) - {x1}) * {y2 - y1}"
        rhs = f"{x2 - x1} * (({y_expr}) - {y1})"
        crosses = f"({lhs} {'<' if y2 > y1 else '>'} {rhs})"
        terms.append(f"CASE WHEN {spans} AND {crosses} THEN 1 ELSE 0 END")
    return "((" + " + ".join(terms) + ") % 2 = 1)"


def is_convex(verts: np.ndarray) -> bool:
    """True when the polygon is convex (all nonzero consecutive-edge
    cross products share a sign) — picks the boundary-inclusive
    half-plane membership over the even-odd crossing rule."""
    v = np.asarray(verts, dtype=np.int64)
    k = len(v)
    a = v[np.arange(1, k + 1) % k] - v
    b = v[np.arange(2, k + 2) % k] - v[np.arange(1, k + 1) % k]
    cross = a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]
    nz = cross[cross != 0]
    return len(nz) == 0 or bool((nz > 0).all() or (nz < 0).all())


def segments_intersect_box(verts: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """For each box (m, 4): does ANY polygon edge intersect it?  Used
    by the contained-cell shortcut for non-convex polygons (a bbox is
    fully inside a simple polygon iff one corner is inside and no edge
    crosses the bbox).  Conservative (separating-axis on the segment
    bbox + line side test): may report an intersection where none
    exists — the cell then merely takes the scan path."""
    v = np.asarray(verts, dtype=np.int64)
    b = np.atleast_2d(np.asarray(boxes, dtype=np.int64))
    m = len(b)
    hit = np.zeros(m, dtype=bool)
    k = len(v)
    cx = np.stack([b[:, 0], b[:, 2], b[:, 0], b[:, 2]], axis=1)  # corners x
    cy = np.stack([b[:, 1], b[:, 1], b[:, 3], b[:, 3]], axis=1)
    for i in range(k):
        x1, y1 = v[i]
        x2, y2 = v[(i + 1) % k]
        # segment bbox overlaps box bbox (closed intervals)
        sb = (
            (np.minimum(x1, x2) <= b[:, 2])
            & (np.maximum(x1, x2) >= b[:, 0])
            & (np.minimum(y1, y2) <= b[:, 3])
            & (np.maximum(y1, y2) >= b[:, 1])
        )
        if not sb.any():
            continue
        # line through the segment separates the box corners?
        side = (x2 - x1) * (cy - y1) - (y2 - y1) * (cx - x1)
        straddles = (side.max(axis=1) >= 0) & (side.min(axis=1) <= 0)
        hit |= sb & straddles
    return hit


def polygon_bbox(verts: np.ndarray) -> np.ndarray:
    v = np.asarray(verts, dtype=np.int64)
    return np.array([v[:, 0].min(), v[:, 1].min(), v[:, 0].max(), v[:, 1].max()], dtype=np.int64)


def _box4(box) -> tuple:
    if isinstance(box, Box):
        return (np.int64(box.min_x), np.int64(box.min_y), np.int64(box.max_x), np.int64(box.max_y))
    a = np.asarray(box, dtype=np.int64)
    return (a[0], a[1], a[2], a[3])
