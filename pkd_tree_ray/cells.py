"""Morton (Z-order) cells: the distributed space-filling partitioner.

This layer replaces the reference's sampled top-6-level pivot skeleton
(``include/cpdd/batch_op/build_tree.hpp:19-70``: sample 2048 points,
build a 6-level pivot tree, route every point to one of 64 buckets).
Here the "buckets" are leaves of an **adaptive 2^d-ary tree over
d-dimensional Morton codes** (quadtree at d=2, octree at d=3, ...):
every point gets a full-depth Morton code once (vectorized bit
interleave), and the directory is a set of variable-depth leaves, each
covering a contiguous Morton range.  Assignment is then a single
``np.searchsorted`` — the vectorized analog of ``find_bucket``
(``build_tree.hpp:72-81``).  Dimension count is a runtime parameter
(``EngineConfig.dims``), mirroring the reference's compile-time
dimension dispatch (``tests/test.cpp:569-617``).

Skew handling: leaves are split while their (sampled or exact) count
exceeds ``EngineConfig.split_threshold`` — the distributed mirror of
the weight-balance imbalance rebuild
(``include/cpdd/batch_op/inner_tree.hpp:78-148``); clustered (varden)
inputs therefore get many fine cells in dense regions and few coarse
cells elsewhere.

Box layout convention throughout the engine: a d-dimensional box is a
flat (2d,) int64 vector ``[min_0..min_{d-1}, max_0..max_{d-1}]`` —
identical to the historical (min_x, min_y, max_x, max_y) at d=2.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from pkd_tree_ray.config import EngineConfig, DEFAULT_CONFIG

_U = np.uint64


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 into even bit positions."""
    v = v & _U(0xFFFFFFFF)
    v = (v | (v << _U(16))) & _U(0x0000FFFF0000FFFF)
    v = (v | (v << _U(8))) & _U(0x00FF00FF00FF00FF)
    v = (v | (v << _U(4))) & _U(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << _U(2))) & _U(0x3333333333333333)
    v = (v | (v << _U(1))) & _U(0x5555555555555555)
    return v


def morton_code(
    x: np.ndarray, y: np.ndarray, depth: int, coord_bits: int = 20
) -> np.ndarray:
    """2-D fast path: interleaved Morton code of the top ``depth`` bits
    of each coordinate -> int64 in [0, 4**depth)."""
    shift = _U(coord_bits - depth)
    xs = np.asarray(x, dtype=np.uint64) >> shift
    ys = np.asarray(y, dtype=np.uint64) >> shift
    code = (_part1by1(xs) << _U(1)) | _part1by1(ys)
    return code.astype(np.int64)


def morton_code_nd(
    coords: Sequence[np.ndarray], depth: int, coord_bits: int = 20
) -> np.ndarray:
    """d-way interleaved Morton code of the top ``depth`` bits of each
    coordinate -> int64 in [0, (2**d)**depth).  Bit significance: level
    by level from the MSB, dimension 0 first within a level — the d=2
    case is bit-identical to :func:`morton_code`."""
    d = len(coords)
    if d == 2:
        return morton_code(coords[0], coords[1], depth, coord_bits)
    if d * depth > 62:
        raise ValueError(f"morton code would need {d * depth} bits (> 62)")
    arrs = [np.asarray(c, dtype=np.uint64) >> _U(coord_bits - depth) for c in coords]
    code = np.zeros(len(arrs[0]), dtype=np.uint64)
    one = _U(1)
    for b in range(depth - 1, -1, -1):  # MSB level first
        for a in arrs:
            code = (code << one) | ((a >> _U(b)) & one)
    return code.astype(np.int64)


def morton_cell_box(prefix: int, depth: int, coord_bits: int = 20) -> tuple[int, int, int, int]:
    """2-D spatial box (min_x, min_y, max_x, max_y) covered by the node
    ``(prefix, depth)`` (prefix = Morton code at that depth)."""
    b = morton_cell_box_nd(prefix, depth, 2, coord_bits)
    return (int(b[0]), int(b[1]), int(b[2]), int(b[3]))


def morton_cell_box_nd(
    prefix: int, depth: int, ndim: int, coord_bits: int = 20
) -> np.ndarray:
    """(2d,) spatial box [mins..., maxs...] covered by the 2^d-ary node
    ``(prefix, depth)``."""
    c = [0] * ndim
    for level in range(depth):
        bits = (prefix >> (ndim * (depth - 1 - level))) & ((1 << ndim) - 1)
        for j in range(ndim):
            c[j] = (c[j] << 1) | ((bits >> (ndim - 1 - j)) & 1)
    side = 1 << (coord_bits - depth)
    out = np.empty(2 * ndim, dtype=np.int64)
    for j in range(ndim):
        out[j] = c[j] * side
        out[ndim + j] = c[j] * side + side - 1
    return out


class CellDirectory:
    """Adaptive 2^d-ary leaves over Morton space + per-cell stats.

    The directory is the small broadcastable state of the index — the
    analog of the reference's InnerTree skeleton
    (``include/cpdd/batch_op/inner_tree.hpp:8-172``).  Leaves are
    identified by their Morton range start at ``max_depth`` resolution
    ("cell id"); each leaf knows (depth, count, exact bbox).

    Invariant: leaves exactly tile [0, (2**d)**max_depth) — assignment
    by searchsorted is total.
    """

    def __init__(
        self,
        starts: np.ndarray,
        depths: np.ndarray,
        config: EngineConfig = DEFAULT_CONFIG,
        counts: np.ndarray | None = None,
        bboxes: np.ndarray | None = None,
    ):
        order = np.argsort(starts, kind="stable")
        self.starts = np.asarray(starts, dtype=np.int64)[order]
        self.depths = np.asarray(depths, dtype=np.int64)[order]
        self.config = config
        nd = config.ndim
        n = len(self.starts)
        self.counts = (
            np.zeros(n, dtype=np.int64) if counts is None else np.asarray(counts, dtype=np.int64)[order]
        )
        # bbox = exact bounding box of the rows in the cell (tightened
        # after the build shuffle); initialised to the cell's spatial
        # extent.
        if bboxes is None:
            self.bboxes = self.spatial_boxes()
        else:
            self.bboxes = np.asarray(bboxes, dtype=np.int64)[order]
            assert self.bboxes.shape == (n, 2 * nd)

    # -- construction ----------------------------------------------------

    @classmethod
    def from_counts(
        cls,
        codes: np.ndarray,
        weights: np.ndarray | None,
        config: EngineConfig = DEFAULT_CONFIG,
        scale: float = 1.0,
        depth_cap: int | None = None,
    ) -> "CellDirectory":
        """Build adaptive leaves from (sampled) full-depth Morton codes.

        ``codes`` are Morton codes at ``config.max_depth``; ``weights``
        optional per-code multiplicities (int or float — sampled
        planners pass fractional population weights); ``scale``
        inflates sampled counts to full-population estimates.  Mirrors
        ``pick_pivots`` + ``divide_rotate`` (``build_tree.hpp:18-70``):
        recursively split any node whose estimated population exceeds
        the split threshold.
        """
        nd = config.ndim
        fanout = 1 << nd
        codes = np.asarray(codes, dtype=np.int64)
        if weights is None:
            weights = np.ones(len(codes), dtype=np.float64)
        codes_sorted = np.sort(codes, kind="stable")
        order = np.argsort(codes, kind="stable")
        w_sorted = np.asarray(weights, dtype=np.float64)[order]
        cum = np.concatenate([[0.0], np.cumsum(w_sorted)])

        # bulk build splits down to the target row count; the coarser
        # split_threshold (split_factor x target) is hysteresis used only
        # for update-triggered hot-cell splits.
        threshold = max(config.target_cell_rows / max(scale, 1e-12), 1.0)
        max_depth = config.max_depth
        cap = max_depth if depth_cap is None else min(depth_cap, max_depth)
        starts: list[int] = []
        depths: list[int] = []

        def count_in(lo: int, hi: int) -> float:
            i = np.searchsorted(codes_sorted, lo, side="left")
            j = np.searchsorted(codes_sorted, hi, side="left")
            return float(cum[j] - cum[i])

        stack = [(0, 0)]  # (prefix, depth)
        while stack:
            prefix, depth = stack.pop()
            span = 1 << (nd * (max_depth - depth))
            lo = prefix * span
            c = count_in(lo, lo + span)
            if depth < cap and c > threshold:
                for q in range(fanout):
                    stack.append((prefix * fanout + q, depth + 1))
            else:
                starts.append(lo)
                depths.append(depth)
        return cls(
            np.array(starts, dtype=np.int64), np.array(depths, dtype=np.int64), config
        )

    @classmethod
    def uniform(cls, depth: int, config: EngineConfig = DEFAULT_CONFIG) -> "CellDirectory":
        """Fixed-resolution grid directory (raster tiling)."""
        nd = config.ndim
        n = (1 << nd) ** depth
        span = 1 << (nd * (config.max_depth - depth))
        starts = np.arange(n, dtype=np.int64) * span
        return cls(starts, np.full(n, depth, dtype=np.int64), config)

    # -- assignment ------------------------------------------------------

    def assign_codes(self, codes: np.ndarray) -> np.ndarray:
        """Map full-depth Morton codes -> cell id (= leaf range start).
        Vectorized ``find_bucket`` / ``retrive_tag``
        (``build_tree.hpp:72-81``, ``batch_helpers.hpp:71-82``)."""
        idx = np.searchsorted(self.starts, np.asarray(codes, dtype=np.int64), side="right") - 1
        return self.starts[idx]

    def assign(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        return self.assign_codes(
            morton_code(x, y, self.config.max_depth, self.config.coord_bits)
        )

    def assign_nd(self, coords: Sequence[np.ndarray]) -> np.ndarray:
        return self.assign_codes(
            morton_code_nd(coords, self.config.max_depth, self.config.coord_bits)
        )

    # -- stats / serialization ------------------------------------------

    def __len__(self) -> int:
        return len(self.starts)

    def index_of(self, cell_ids: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(self.starts, np.asarray(cell_ids, dtype=np.int64))
        return idx

    def spatial_boxes(self) -> np.ndarray:
        """(n, 2d) spatial extents of the leaves (not tightened)."""
        nd = self.config.ndim
        if not len(self):
            return np.zeros((0, 2 * nd), dtype=np.int64)
        return np.stack(
            [
                morton_cell_box_nd(
                    int(s) >> (nd * (self.config.max_depth - int(d))),
                    int(d),
                    nd,
                    self.config.coord_bits,
                )
                for s, d in zip(self.starts, self.depths)
            ]
        )

    def to_records(self) -> list[dict]:
        return [
            {
                "cell": int(s),
                "depth": int(d),
                "count": int(c),
                "bbox": [int(v) for v in bb],
            }
            for s, d, c, bb in zip(self.starts, self.depths, self.counts, self.bboxes)
        ]

    @classmethod
    def from_records(cls, records: list[dict], config: EngineConfig) -> "CellDirectory":
        if not records:
            return cls(np.zeros(0, np.int64), np.zeros(0, np.int64), config)
        return cls(
            np.array([r["cell"] for r in records], dtype=np.int64),
            np.array([r["depth"] for r in records], dtype=np.int64),
            config,
            counts=np.array([r["count"] for r in records], dtype=np.int64),
            bboxes=np.array([r["bbox"] for r in records], dtype=np.int64),
        )


def pick_base_depth(n_rows: int, config: EngineConfig = DEFAULT_CONFIG) -> int:
    """Resolution so that uniform data yields ~ n / target_cell_rows
    cells (the analog of choosing BUILD_DEPTH_ONCE rounds)."""
    import math

    if n_rows <= config.target_cell_rows:
        return 0
    return min(
        config.max_depth,
        max(0, math.ceil(math.log(n_rows / config.target_cell_rows, 1 << config.ndim))),
    )
