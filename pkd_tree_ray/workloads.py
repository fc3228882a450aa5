"""Deterministic query workloads shared by the Ray pipelines and the
DuckDB oracle.

All constants are generated once from fixed seeds (mirroring the
reference's ``srand(10)`` query generation,
``tests/testFramework.h:136``) and embedded as literals into BOTH the
Ray query arrays and the oracle SQL — guaranteeing the two sides
answer the identical workload.
"""

from __future__ import annotations

import numpy as np

from pkd_tree_ray.hashing import COORD_MOD

C = COORD_MOD - 1  # max coordinate


def _rng(seed: int) -> np.random.RandomState:
    return np.random.RandomState(seed)


def range_boxes() -> np.ndarray:
    """12 boxes: 4 size tiers (reference brackets small/med/large +
    full-ish, README.md:166-171) at seeded positions."""
    rng = _rng(10)
    spans = [C // 100, C // 20, C // 5, (3 * C) // 5]
    out = []
    for span in spans:
        for _ in range(3):
            x0 = int(rng.randint(0, C - span))
            y0 = int(rng.randint(0, C - span))
            out.append([x0, y0, x0 + span, y0 + span])
    return np.array(out, dtype=np.int64)


def report_boxes() -> np.ndarray:
    """4 small boxes for range report (output stays small)."""
    rng = _rng(11)
    span = C // 40
    out = []
    for _ in range(4):
        x0 = int(rng.randint(0, C - span))
        y0 = int(rng.randint(0, C - span))
        out.append([x0, y0, x0 + span, y0 + span])
    return np.array(out, dtype=np.int64)


def circles() -> np.ndarray:
    """8 balls, radii from 1% to 40% of the extent."""
    rng = _rng(12)
    out = []
    for r in [C // 100, C // 25, C // 10, (2 * C) // 5]:
        for _ in range(2):
            out.append([int(rng.randint(0, C)), int(rng.randint(0, C)), r])
    return np.array(out, dtype=np.int64)


def knn_query_points(m: int = 20) -> tuple[np.ndarray, np.ndarray]:
    """m query points at seeded positions (OOD-style: uniform queries
    regardless of the build distribution, ``tests/test.cpp:494-509``)."""
    rng = _rng(13)
    return (
        rng.randint(0, C, m).astype(np.int64),
        rng.randint(0, C, m).astype(np.int64),
    )


def range_boxes_3d() -> np.ndarray:
    """12 cubes in [mins..., maxs...] layout — the d=3 mirror of
    :func:`range_boxes` (the reference's range baselines run d=2,3,5;
    ``script/data/range_count.csv``)."""
    rng = _rng(20)
    spans = [C // 50, C // 10, C // 4, (3 * C) // 5]
    out = []
    for span in spans:
        for _ in range(3):
            mins = [int(rng.randint(0, C - span)) for _ in range(3)]
            out.append(mins + [m + span for m in mins])
    return np.array(out, dtype=np.int64)


def circles_3d() -> np.ndarray:
    """8 balls (cx, cy, cz, r)."""
    rng = _rng(21)
    out = []
    for r in [C // 20, C // 8, C // 4, (2 * C) // 5]:
        for _ in range(2):
            out.append([int(rng.randint(0, C)) for _ in range(3)] + [r])
    return np.array(out, dtype=np.int64)


def knn_query_points_3d(m: int = 20) -> np.ndarray:
    """(m, 3) uniform query matrix (OOD convention as in 2-D)."""
    rng = _rng(22)
    return rng.randint(0, C, (m, 3)).astype(np.int64)


#: quantized float-space extent: floor((C/7) * 4) (sources.FLOAT_QUANT)
C_FLOAT = (C // 7) * 4


def range_boxes_float() -> np.ndarray:
    """10 boxes over the quantized float-coordinate space."""
    rng = _rng(23)
    spans = [C_FLOAT // 50, C_FLOAT // 10, C_FLOAT // 4, (3 * C_FLOAT) // 5]
    out = []
    for span in spans[:2]:
        for _ in range(3):
            x0 = int(rng.randint(0, C_FLOAT - span))
            y0 = int(rng.randint(0, C_FLOAT - span))
            out.append([x0, y0, x0 + span, y0 + span])
    for span in spans[2:]:
        for _ in range(2):
            x0 = int(rng.randint(0, C_FLOAT - span))
            y0 = int(rng.randint(0, C_FLOAT - span))
            out.append([x0, y0, x0 + span, y0 + span])
    return np.array(out, dtype=np.int64)


def knn_query_points_float(m: int = 20) -> tuple[np.ndarray, np.ndarray]:
    rng = _rng(24)
    return (
        rng.randint(0, C_FLOAT, m).astype(np.int64),
        rng.randint(0, C_FLOAT, m).astype(np.int64),
    )


def knn_query_points_float_native(m: int = 20) -> tuple[np.ndarray, np.ndarray]:
    """Raw-double query points for the float-NATIVE index: the
    quantized-grid points mapped back to float space plus an exact
    binary fraction (3/8), so the coordinates are genuinely
    non-integral yet print/parse round-trip exactly in SQL."""
    qx, qy = knn_query_points_float(m)
    return qx.astype(np.float64) / 4.0 + 0.375, qy.astype(np.float64) / 4.0 + 0.375


def range_boxes_float_native() -> np.ndarray:
    """Float-space boxes: the quantized boxes divided by the (power of
    two) quantization scale — exact in binary."""
    return range_boxes_float().astype(np.float64) / 4.0


def polygons() -> list[np.ndarray]:
    """3 convex CCW polygons (triangle, quad, hexagon) — literal
    vertices for the point-in-polygon join, expressible as half-plane
    conjunctions in SQL."""
    rng = _rng(14)
    polys = []
    for k in (3, 4, 6):
        cx, cy = rng.randint(C // 4, (3 * C) // 4, 2)
        radius = rng.randint(C // 10, C // 4)
        ang = np.sort(rng.rand(k) * 2 * np.pi)
        vx = (cx + radius * np.cos(ang)).astype(np.int64)
        vy = (cy + radius * np.sin(ang)).astype(np.int64)
        polys.append(np.stack([np.clip(vx, 0, C), np.clip(vy, 0, C)], axis=1))
    return polys


def concave_polygons() -> list[np.ndarray]:
    """2 deterministic NON-convex simple polygons (an 8-point star and
    an L-shape) for the even-odd crossing path — exactly expressible in
    SQL via ``geometry.sql_point_in_polygon``."""
    rng = _rng(15)
    polys = []
    # star: alternating outer/inner radius around a random center
    cx, cy = rng.randint(C // 3, (2 * C) // 3, 2)
    r_out, r_in = C // 4, C // 10
    ang = np.linspace(0, 2 * np.pi, 16, endpoint=False)
    rad = np.where(np.arange(16) % 2 == 0, r_out, r_in)
    vx = np.clip((cx + rad * np.cos(ang)).astype(np.int64), 0, C)
    vy = np.clip((cy + rad * np.sin(ang)).astype(np.int64), 0, C)
    polys.append(np.stack([vx, vy], axis=1))
    # L-shape (rectilinear hexagon)
    x0, y0 = rng.randint(C // 8, C // 4, 2)
    w, h, t = C // 2, C // 2, C // 6
    polys.append(
        np.array(
            [
                [x0, y0],
                [x0 + w, y0],
                [x0 + w, y0 + t],
                [x0 + t, y0 + t],
                [x0 + t, y0 + h],
                [x0, y0 + h],
            ],
            dtype=np.int64,
        )
    )
    return polys


TILE_SHIFT = 65_536  # fixed raster tile side => 16x16 grid over [0, 1e6]


# --- SQL fragments ------------------------------------------------------

def sql_values_boxes(boxes: np.ndarray) -> str:
    rows = ", ".join(
        f"({i}, {b[0]}, {b[1]}, {b[2]}, {b[3]})" for i, b in enumerate(boxes)
    )
    return f"(VALUES {rows}) AS q(qid, min_x, min_y, max_x, max_y)"


def sql_values_circles(cs: np.ndarray) -> str:
    rows = ", ".join(f"({i}, {c[0]}, {c[1]}, {c[2]})" for i, c in enumerate(cs))
    return f"(VALUES {rows}) AS q(qid, cx, cy, r)"


def sql_values_points(qx: np.ndarray, qy: np.ndarray) -> str:
    rows = ", ".join(f"({i}, {x}, {y})" for i, (x, y) in enumerate(zip(qx, qy)))
    return f"(VALUES {rows}) AS q(qid, qx, qy)"


def sql_values_points_float(qx: np.ndarray, qy: np.ndarray) -> str:
    """Float VALUES rows; ``repr`` of a double round-trips exactly
    through DuckDB's decimal-literal parser."""
    rows = ", ".join(
        f"({i}, {float(x)!r}, {float(y)!r})" for i, (x, y) in enumerate(zip(qx, qy))
    )
    return f"(VALUES {rows}) AS q(qid, qx, qy)"


def sql_values_boxes_float(boxes: np.ndarray) -> str:
    rows = ", ".join(
        f"({i}, {float(b[0])!r}, {float(b[1])!r}, {float(b[2])!r}, {float(b[3])!r})"
        for i, b in enumerate(boxes)
    )
    return f"(VALUES {rows}) AS q(qid, min_x, min_y, max_x, max_y)"


def sql_values_boxes_3d(boxes: np.ndarray) -> str:
    rows = ", ".join(
        f"({i}, {b[0]}, {b[1]}, {b[2]}, {b[3]}, {b[4]}, {b[5]})"
        for i, b in enumerate(boxes)
    )
    return (
        f"(VALUES {rows}) AS q(qid, min_x, min_y, min_z, max_x, max_y, max_z)"
    )


def sql_values_circles_3d(cs: np.ndarray) -> str:
    rows = ", ".join(
        f"({i}, {c[0]}, {c[1]}, {c[2]}, {c[3]})" for i, c in enumerate(cs)
    )
    return f"(VALUES {rows}) AS q(qid, cx, cy, cz, r)"


def sql_values_points_3d(Q: np.ndarray) -> str:
    rows = ", ".join(
        f"({i}, {p[0]}, {p[1]}, {p[2]})" for i, p in enumerate(Q)
    )
    return f"(VALUES {rows}) AS q(qid, qx, qy, qz)"


def sql_polygon_predicate(verts: np.ndarray, xcol: str = "x", ycol: str = "y") -> str:
    """Half-plane conjunction for a convex CCW polygon — the same
    boundary-inclusive test as
    :func:`pkd_tree_ray.geometry.points_in_convex_polygon`."""
    terms = []
    k = len(verts)
    for i in range(k):
        x1, y1 = int(verts[i][0]), int(verts[i][1])
        x2, y2 = int(verts[(i + 1) % k][0]), int(verts[(i + 1) % k][1])
        terms.append(
            f"({x2 - x1}) * ({ycol} - {y1}) - ({y2 - y1}) * ({xcol} - {x1}) >= 0"
        )
    return "(" + " AND ".join(terms) + ")"
