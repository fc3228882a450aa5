"""Per-partition in-memory kd-tree kernel (pure numpy), d-dimensional.

This is the in-actor analog of the reference's recursive subtree build
and query kernels — one of these lives below every directory cell,
exactly as a recursively-built subtree lives below every bucket of the
reference's pivot skeleton:

* build: median split via ``np.argpartition`` with the max-stretch
  split-dimension rule (``include/cpdd/batch_op/build_tree.hpp:136-274``,
  ``include/cpdd/utility/dimensinality.hpp:7-33``), leaf wrap
  ``EngineConfig.leaf_size`` (LEAVE_WRAP=32, kdTreeParallel.h:39);
* kNN: guided descent with a bounded candidate set, pruning siblings
  whose box min-distance exceeds the current kth distance
  (``include/cpdd/query_op/nn_search.hpp:81-126``); distances are
  squared (``nn_search.hpp:9-16``);
* range count / report: disjoint -> 0, contained -> subtree size with
  no scan, partial -> recurse; leaf scans use inclusive bounds
  (``include/cpdd/query_op/range_count.hpp:8-96``,
  ``range_query.hpp:28-119``).

Dimensionality is a runtime parameter (the reference dispatches it at
compile time, ``tests/test.cpp:569-617``); :class:`KDTree2D` is the
d=2 specialization keeping the historical (x, y) call signatures.

The tree is stored as flat numpy arrays (node table + a permutation of
the point indices), not Python node objects, so building is vectorized
per level and the whole structure is cheap to hold in an actor.
Duplicate points are handled naturally: the builder falls back to a
"dummy leaf" — a single leaf holding all copies — when a split cannot
separate identical coordinates (``build_tree.hpp:183-186``).

Boxes are flat (2d,) int64 vectors [mins..., maxs...].
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from pkd_tree_ray.config import EngineConfig, DEFAULT_CONFIG

# node table columns
_LEFT = 0  # left child node id (-1 for leaf)
_RIGHT = 1
_DIM = 2  # split dimension index
_VAL = 3  # split value: left = coords[dim] < val, right = >= val
_LO = 4  # [lo, hi) range into the permutation array
_HI = 5
_SIZE = 6  # hi - lo


def _argsort_d2_key(d2: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """argsort by (d2, key) lexicographic — two stable argsorts, so it
    also accepts object/string key arrays (np.lexsort rejects some)."""
    o1 = np.argsort(keys, kind="stable")
    return o1[np.argsort(d2[o1], kind="stable")]


def _cut_topk_tied(dd: np.ndarray, ii: np.ndarray, kk: int, tie_key) -> tuple[np.ndarray, np.ndarray]:
    """Per-row top-kk by (dist2, neighbor key).

    Distance-only ``argpartition`` first; rows whose kth-distance tie
    group straddles the cut are repaired by preferring the smaller key
    (neighbor id).  Without this a fragment can emit an arbitrary
    subset of boundary ties, dropping the smaller-id neighbor before
    the id-aware global merge — violating the documented
    '(dist2, neighbor id)' order the oracles enforce (ADVICE r1).
    ``tie_key`` maps a point index to its key; None = the index itself.
    Returns (sel_idx, sel_d2), each (n_rows, kk)."""
    part = np.argpartition(dd, kk - 1, axis=1)[:, :kk]
    sel_d = np.take_along_axis(dd, part, axis=1)
    sel_i = np.take_along_axis(ii, part, axis=1)
    kth = sel_d.max(axis=1)
    bad = np.nonzero((dd <= kth[:, None]).sum(axis=1) > kk)[0]
    for r in bad:
        d_row, i_row = dd[r], ii[r]
        lt = np.nonzero(d_row < kth[r])[0]
        eq = np.nonzero(d_row == kth[r])[0]
        keys = i_row[eq] if tie_key is None else tie_key[i_row[eq]]
        pick = eq[np.argsort(keys, kind="stable")[: kk - len(lt)]]
        sel = np.concatenate([lt, pick])
        sel_d[r] = d_row[sel]
        sel_i[r] = i_row[sel]
    return sel_i, sel_d


class KDTreeND:
    """Static balanced kd-tree over int64 points in d dimensions.

    ``coords``: sequence of d equal-length int64 arrays (one per
    dimension).  ``tie_key`` (optional, aligned with the coordinate
    arrays) supplies the neighbor id used for (dist2, id) tie-breaking
    inside the bounded kNN queue; defaults to positional index."""

    def __init__(
        self,
        coords: Sequence[np.ndarray],
        config: EngineConfig = DEFAULT_CONFIG,
        tie_key: np.ndarray | None = None,
    ):
        self.C = [np.ascontiguousarray(c, dtype=np.int64) for c in coords]
        self.d = len(self.C)
        self.tie_key = tie_key
        self.config = config
        n = len(self.C[0])
        self.perm = np.arange(n, dtype=np.int64)
        # worst case #nodes for leaf_size >= 1 is < 4n/leaf_size + O(log n)
        cap = max(8, 4 * (n // max(config.leaf_size, 1) + 2))
        self.nodes = np.empty((cap, 7), dtype=np.int64)
        self.n_nodes = 0
        # per-node bbox (tight), filled during build
        self.node_box = np.empty((cap, 2 * self.d), dtype=np.int64)
        if n:
            self._build(0, n)

    # -- build -----------------------------------------------------------

    def _new_node(self) -> int:
        if self.n_nodes == len(self.nodes):
            self.nodes = np.concatenate([self.nodes, np.empty_like(self.nodes)])
            self.node_box = np.concatenate([self.node_box, np.empty_like(self.node_box)])
        nid = self.n_nodes
        self.n_nodes += 1
        return nid

    def _build(self, lo: int, hi: int) -> int:
        """Iterative (explicit stack) median-split build over
        perm[lo:hi); returns root node id."""
        leaf_size = self.config.leaf_size
        C, perm, d = self.C, self.perm, self.d
        rotate = self.config.split_rule == "rotate"
        root = self._new_node()
        stack = [(root, lo, hi, 0)]
        box = np.empty(2 * d, dtype=np.int64)
        while stack:
            nid, lo, hi, depth = stack.pop()
            seg = perm[lo:hi]
            segc = [c[seg] for c in C]
            for j in range(d):
                box[j] = segc[j].min()
                box[d + j] = segc[j].max()
            self.node_box[nid] = box
            node = self.nodes[nid]
            node[_LO], node[_HI], node[_SIZE] = lo, hi, hi - lo
            stretch = box[d:] - box[:d]
            # leaf: small enough, or all points identical (dummy leaf,
            # build_tree.hpp:183-186)
            if hi - lo <= leaf_size or not stretch.any():
                node[_LEFT] = node[_RIGHT] = -1
                node[_DIM] = -1
                node[_VAL] = 0
                continue
            # split dimension policy (dimensinality.hpp:7-33):
            # MAX_STRETCH_DIM (default) or ROTATE_DIM by depth
            if rotate:
                dim = depth % d
                # degenerate: no stretch on the rotation dim -> fall
                # back to the widest one (pick_rebuild_dim behavior)
                if stretch[dim] == 0:
                    dim = int(np.argmax(stretch))
            else:
                dim = int(np.argmax(stretch))
            coords = segc[dim]
            mid = (hi - lo) // 2
            part = np.argpartition(coords, mid)
            split_val = coords[part[mid]]
            # left = strictly < split_val; handles duplicate medians like
            # serial_build_recursive (build_tree.hpp:149-181): if the
            # median value crowds one side, re-split on the value
            # boundary so both sides are non-empty (the chosen dim has
            # stretch > 0, so a non-trivial boundary exists).
            left_mask = coords < split_val
            n_left = int(left_mask.sum())
            if n_left == 0:
                # split_val is the minimum; move boundary above it
                split_val = split_val + 1
                left_mask = coords < split_val
                n_left = int(left_mask.sum())
            # stable partition of the segment
            order = np.argsort(~left_mask, kind="stable")
            perm[lo:hi] = seg[order]
            node[_DIM] = dim
            node[_VAL] = split_val
            lid = self._new_node()
            rid = self._new_node()
            # re-read: _new_node may have reallocated the table
            self.nodes[nid, _LEFT] = lid
            self.nodes[nid, _RIGHT] = rid
            stack.append((lid, lo, lo + n_left, depth + 1))
            stack.append((rid, lo + n_left, hi, depth + 1))
        return root

    def __len__(self) -> int:
        return len(self.C[0])

    # -- kNN -------------------------------------------------------------

    def knn_point(self, q: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray, int]:
        """k nearest point indices by squared distance to q (d,).

        Returns (indices_into_original_arrays, dist2, nodes_visited),
        unsorted.  Guided descent + sibling pruning as in
        ``nn_search.hpp:81-126``; kth-distance ties keep the smaller
        tie_key (ADVICE r1)."""
        n = len(self)
        if n == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64), 0
        k = min(k, n)
        d = self.d
        q = np.asarray(q, dtype=np.int64)
        best_idx = np.full(k, -1, dtype=np.int64)
        best_d2 = np.full(k, np.iinfo(np.int64).max, dtype=np.int64)
        kth = np.iinfo(np.int64).max
        visited = 0
        stack = [(0, 0)]  # (node id, lower-bound dist2 when pushed)
        nodes = self.nodes
        boxes = self.node_box
        C, perm = self.C, self.perm
        n_found = 0
        while stack:
            nid, lb = stack.pop()
            if n_found >= k and lb > kth:
                continue
            visited += 1
            node = nodes[nid]
            if node[_LEFT] == -1:
                seg = perm[node[_LO]: node[_HI]]
                dj = C[0][seg] - q[0]
                d2 = dj * dj
                for j in range(1, d):
                    dj = C[j][seg] - q[j]
                    d2 += dj * dj
                # merge into bounded candidate set (kBoundedQueue analog,
                # nn_search_helpers.h:18-93)
                all_idx = np.concatenate([best_idx[:n_found], seg])
                all_d2 = np.concatenate([best_d2[:n_found], d2])
                if len(all_d2) > k:
                    sel = np.argpartition(all_d2, k - 1)[:k]
                    kth_v = all_d2[sel].max()
                    if int((all_d2 <= kth_v).sum()) > k:
                        keys = all_idx if self.tie_key is None else self.tie_key[all_idx]
                        sel = _argsort_d2_key(all_d2, keys)[:k]
                    all_idx, all_d2 = all_idx[sel], all_d2[sel]
                n_found = len(all_d2)
                best_idx[:n_found] = all_idx
                best_d2[:n_found] = all_d2
                if n_found >= k:
                    kth = int(all_d2.max())
                continue
            lid, rid = int(node[_LEFT]), int(node[_RIGHT])
            lb_l = _box_min_d2(q, boxes[lid], d)
            lb_r = _box_min_d2(q, boxes[rid], d)
            # visit nearer child first (guided descent)
            if lb_l <= lb_r:
                near, far, lbn, lbf = lid, rid, lb_l, lb_r
            else:
                near, far, lbn, lbf = rid, lid, lb_r, lb_l
            if n_found < k or lbf <= kth:
                stack.append((far, lbf))
            if n_found < k or lbn <= kth:
                stack.append((near, lbn))
        return best_idx[:n_found], best_d2[:n_found], visited

    # -- orthogonal range ------------------------------------------------

    def range_count(self, box) -> int:
        """Inclusive-box count; contained subtrees contribute size with
        no scan (``range_count.hpp:64-96``).  box: (2d,)."""
        if len(self) == 0:
            return 0
        d = self.d
        qb = np.asarray(box, dtype=np.int64)
        total = 0
        stack = [0]
        nodes, boxes = self.nodes, self.node_box
        C, perm = self.C, self.perm
        while stack:
            nid = stack.pop()
            b = boxes[nid]
            if (b[:d] > qb[d:]).any() or (b[d:] < qb[:d]).any():
                continue  # disjoint
            if (qb[:d] <= b[:d]).all() and (b[d:] <= qb[d:]).all():
                total += int(nodes[nid, _SIZE])  # contained
                continue
            node = nodes[nid]
            if node[_LEFT] == -1:
                seg = perm[node[_LO]: node[_HI]]
                m = (C[0][seg] >= qb[0]) & (C[0][seg] <= qb[d])
                for j in range(1, d):
                    m &= (C[j][seg] >= qb[j]) & (C[j][seg] <= qb[d + j])
                total += int(m.sum())
            else:
                stack.append(int(node[_LEFT]))
                stack.append(int(node[_RIGHT]))
        return total

    def range_report(self, box) -> np.ndarray:
        """Indices (into the original arrays) of points inside the
        inclusive box (``range_query.hpp:70-119``)."""
        if len(self) == 0:
            return np.empty(0, np.int64)
        d = self.d
        qb = np.asarray(box, dtype=np.int64)
        out: list[np.ndarray] = []
        stack = [0]
        nodes, boxes = self.nodes, self.node_box
        C, perm = self.C, self.perm
        while stack:
            nid = stack.pop()
            b = boxes[nid]
            if (b[:d] > qb[d:]).any() or (b[d:] < qb[:d]).any():
                continue
            node = nodes[nid]
            if (qb[:d] <= b[:d]).all() and (b[d:] <= qb[d:]).all():
                out.append(perm[node[_LO]: node[_HI]])  # flatten (batch_helpers.hpp:10-56)
                continue
            if node[_LEFT] == -1:
                seg = perm[node[_LO]: node[_HI]]
                m = (C[0][seg] >= qb[0]) & (C[0][seg] <= qb[d])
                for j in range(1, d):
                    m &= (C[j][seg] >= qb[j]) & (C[j][seg] <= qb[d + j])
                out.append(seg[m])
            else:
                stack.append(int(node[_LEFT]))
                stack.append(int(node[_RIGHT]))
        return np.concatenate(out) if out else np.empty(0, np.int64)

    def ball_count(self, center: np.ndarray, r: int) -> int:
        """Ball count (``range_count.hpp:98-131``): disjoint/contained
        tests via box min/max distance, leaf scan by dist2 <= r^2."""
        if len(self) == 0:
            return 0
        d = self.d
        q = np.asarray(center, dtype=np.int64)
        r2 = np.int64(r) * np.int64(r)
        total = 0
        stack = [0]
        nodes, boxes = self.nodes, self.node_box
        C, perm = self.C, self.perm
        while stack:
            nid = stack.pop()
            b = boxes[nid]
            if _box_min_d2(q, b, d) > r2:
                continue
            if _box_max_d2(q, b, d) <= r2:
                total += int(nodes[nid, _SIZE])
                continue
            node = nodes[nid]
            if node[_LEFT] == -1:
                seg = perm[node[_LO]: node[_HI]]
                dj = C[0][seg] - q[0]
                d2 = dj * dj
                for j in range(1, d):
                    dj = C[j][seg] - q[j]
                    d2 += dj * dj
                total += int((d2 <= r2).sum())
            else:
                stack.append(int(node[_LEFT]))
                stack.append(int(node[_RIGHT]))
        return total

    # -- invariants / metrics (validation.hpp:8-124) ---------------------

    def validate(self) -> None:
        """Mirrors ``validate()`` (``validation.hpp:49-70``): every
        node's box covers its points; child sizes sum; weight balance
        within alpha for interior nodes above the leaf threshold."""
        assert self.n_nodes >= 1 or len(self) == 0
        alpha = self.config.imbalance_alpha
        d = self.d
        for nid in range(self.n_nodes):
            node = self.nodes[nid]
            lo, hi = int(node[_LO]), int(node[_HI])
            seg = self.perm[lo:hi]
            b = self.node_box[nid]
            for j in range(d):
                pj = self.C[j][seg]
                assert pj.min() >= b[j] and pj.max() <= b[d + j]
            if node[_LEFT] != -1:
                ls = int(self.nodes[node[_LEFT], _SIZE])
                rs = int(self.nodes[node[_RIGHT], _SIZE])
                assert ls + rs == int(node[_SIZE])
                if ls + rs > 4 * self.config.leaf_size:
                    frac = ls / (ls + rs)
                    assert alpha - 0.05 <= frac <= 1 - alpha + 0.05, (
                        f"imbalanced node {nid}: {frac}"
                    )

    def height(self) -> int:
        """Max depth (``validation.hpp:72-85``)."""
        if len(self) == 0:
            return 0
        depth = np.zeros(self.n_nodes, dtype=np.int64)
        h = 0
        for nid in range(self.n_nodes):
            node = self.nodes[nid]
            if node[_LEFT] != -1:
                depth[node[_LEFT]] = depth[nid] + 1
                depth[node[_RIGHT]] = depth[nid] + 1
            else:
                h = max(h, int(depth[nid]))
        return h


class KDTree2D(KDTreeND):
    """d=2 specialization keeping the historical (x, y) signatures."""

    def __init__(self, x: np.ndarray, y: np.ndarray, config: EngineConfig = DEFAULT_CONFIG, tie_key: np.ndarray | None = None):
        super().__init__([x, y], config, tie_key)
        self.x = self.C[0]
        self.y = self.C[1]

    def knn(self, qx: int, qy: int, k: int) -> tuple[np.ndarray, np.ndarray, int]:
        return self.knn_point(np.array([qx, qy], dtype=np.int64), k)

    def circle_count(self, cx: int, cy: int, r: int) -> int:
        return self.ball_count(np.array([cx, cy], dtype=np.int64), r)


def _box_min_d2(q: np.ndarray, b: np.ndarray, d: int):
    t = 0
    for j in range(d):
        dj = b[j] - q[j]
        if dj < 0:
            dj = q[j] - b[d + j]
            if dj < 0:
                continue
        t += dj * dj
    return t


def _box_max_d2(q: np.ndarray, b: np.ndarray, d: int):
    t = 0
    for j in range(d):
        lo = q[j] - b[j]
        hi = b[d + j] - q[j]
        dj = lo if lo > hi else hi
        if dj < 0:
            dj = -dj
        t += dj * dj
    return t


# --- vectorized brute-force kernels (the SERIAL_BUILD_CUTOFF analog) ----

def brute_range_filter_nd(
    P: Sequence[np.ndarray],
    Q: Sequence[np.ndarray],
    r2: np.ndarray,
    q_chunk: int = 64,
    p_chunk: int = 1_024,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All (query, point) pairs with squared distance <= r2[query] —
    the ball-overlap emit used for NON-home candidate cells in kNN: a
    neighboring cell contributes only the sliver of its points inside
    the query ball, so emitting the filtered rows (instead of a full
    top-k) cuts both the argpartition work and the partial-row volume
    that transits the object store.  Same L2-resident tiling as
    :func:`brute_knn_nd`.  P/Q: per-dim coordinate arrays.
    Returns (q_idx, p_idx, d2)."""
    d = len(P)
    n, m = len(P[0]), len(Q[0])
    if n == 0 or m == 0:
        return (np.empty(0, np.int64),) * 3
    # dtype-generic like brute_knn_nd: float-native doubles run the
    # identical kernel with float64 squared distances
    coord_dt = (
        np.float64
        if any(np.issubdtype(np.asarray(c).dtype, np.floating) for c in (*P, *Q))
        else np.int64
    )
    P = [np.asarray(c, dtype=coord_dt) for c in P]
    Q = [np.asarray(c, dtype=coord_dt) for c in Q]
    out_q: list[np.ndarray] = []
    out_p: list[np.ndarray] = []
    out_d: list[np.ndarray] = []
    ws1 = np.empty((min(q_chunk, m), p_chunk), dtype=coord_dt)
    ws2 = np.empty((min(q_chunk, m), p_chunk), dtype=coord_dt)
    for s in range(0, m, q_chunk):
        e = min(s + q_chunk, m)
        qc = [Q[j][s:e, None] for j in range(d)]
        r2c = r2[s:e, None]
        for ps in range(0, n, p_chunk):
            pe = min(ps + p_chunk, n)
            d2 = ws1[: e - s, : pe - ps]
            dj = ws2[: e - s, : pe - ps]
            np.subtract(qc[0], P[0][None, ps:pe], out=d2)
            d2 *= d2
            for j in range(1, d):
                np.subtract(qc[j], P[j][None, ps:pe], out=dj)
                dj *= dj
                d2 += dj
            qi, pi = np.nonzero(d2 <= r2c)
            if len(qi):
                out_q.append(qi + s)
                out_p.append(pi + ps)
                out_d.append(d2[qi, pi])
    if not out_q:
        return (np.empty(0, np.int64),) * 3
    return np.concatenate(out_q), np.concatenate(out_p), np.concatenate(out_d)


def brute_range_filter(
    px: np.ndarray,
    py: np.ndarray,
    qx: np.ndarray,
    qy: np.ndarray,
    r2: np.ndarray,
    q_chunk: int = 64,
    p_chunk: int = 1_024,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """2-D wrapper over :func:`brute_range_filter_nd`."""
    return brute_range_filter_nd([px, py], [qx, qy], r2, q_chunk, p_chunk)


def brute_knn_nd(
    P: Sequence[np.ndarray],
    Q: Sequence[np.ndarray],
    k: int,
    q_chunk: int = 64,
    p_chunk: int = 1_024,
    tie_key: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k per query over a point block, vectorized AND cache-blocked.

    P/Q: per-dimension coordinate arrays (d of them each).  Returns
    (idx, d2) each of shape (n_queries, k_eff), k_eff = min(k,
    n_points); idx are indices into the P arrays.  kth-distance ties
    prefer the smaller ``tie_key`` (defaults to index).

    Both axes are tiled so every distance sub-matrix
    (q_chunk x p_chunk x 8B = 512 KiB) stays L2-resident: a naive
    (m x n) int64 matrix makes the stage DRAM-bandwidth-bound the
    moment a full actor pool runs it concurrently.  Measured on the
    32-vCPU shared-bandwidth target: 128x4096 tiles inflate 3.6->5.0s
    per task from 8 to 32 concurrent; 64x1024 tiles run 3.5->3.1s —
    no contention, near-linear concurrency scaling.  Per point-tile
    top-k candidates are merged once at the end.
    """
    d = len(P)
    n = len(P[0])
    m = len(Q[0])
    # dtype-generic: float64 coordinates (the reference harness default,
    # tests/testFramework.h:18-19) run the identical kernel with float64
    # squared distances; everything else stays on the int64 grid.
    coord_dt = (
        np.float64
        if any(np.issubdtype(np.asarray(c).dtype, np.floating) for c in (*P, *Q))
        else np.int64
    )
    k_eff = min(k, n)
    if n == 0 or m == 0:
        return (np.empty((m, 0), np.int64), np.empty((m, 0), coord_dt))
    P = [np.asarray(c, dtype=coord_dt) for c in P]
    Q = [np.asarray(c, dtype=coord_dt) for c in Q]
    out_idx = np.empty((m, k_eff), dtype=np.int64)
    out_d2 = np.empty((m, k_eff), dtype=coord_dt)
    n_tiles = -(-n // p_chunk)
    # preallocated tile workspaces: the naive expression allocates
    # (d+3) q_chunk x p_chunk temporaries per tile — multiplying the
    # memory traffic — and measured 2.1x slower than in-place ops on
    # reused buffers
    ws1 = np.empty((min(q_chunk, m), p_chunk), dtype=coord_dt)
    ws2 = np.empty((min(q_chunk, m), p_chunk), dtype=coord_dt)
    for s in range(0, m, q_chunk):
        e = min(s + q_chunk, m)
        qc = [Q[j][s:e, None] for j in range(d)]
        cand_idx: list[np.ndarray] = []
        cand_d2: list[np.ndarray] = []
        for t in range(n_tiles):
            ps, pe = t * p_chunk, min((t + 1) * p_chunk, n)
            d2 = ws1[: e - s, : pe - ps]
            dj = ws2[: e - s, : pe - ps]
            np.subtract(qc[0], P[0][None, ps:pe], out=d2)
            d2 *= d2
            for j in range(1, d):
                np.subtract(qc[j], P[j][None, ps:pe], out=dj)
                dj *= dj
                d2 += dj
            kk = min(k_eff, pe - ps)
            if kk < pe - ps:
                ii = np.broadcast_to(np.arange(ps, pe, dtype=np.int64), d2.shape)
                si, sd = _cut_topk_tied(d2, ii, kk, tie_key)
                cand_d2.append(sd)
                cand_idx.append(si)
            else:
                cand_d2.append(d2.copy())  # d2 is a reused workspace view
                cand_idx.append(
                    np.broadcast_to(np.arange(ps, pe, dtype=np.int64), d2.shape)
                )
        if n_tiles == 1:
            dd, ii = cand_d2[0], np.ascontiguousarray(cand_idx[0])
        else:
            dd = np.concatenate(cand_d2, axis=1)
            ii = np.concatenate(cand_idx, axis=1)
        if k_eff < dd.shape[1]:
            si, sd = _cut_topk_tied(dd, ii, k_eff, tie_key)
            out_d2[s:e] = sd
            out_idx[s:e] = si
        else:
            out_d2[s:e] = dd
            out_idx[s:e] = ii
    return out_idx, out_d2


def brute_knn_batch(
    px: np.ndarray,
    py: np.ndarray,
    qx: np.ndarray,
    qy: np.ndarray,
    k: int,
    q_chunk: int = 64,
    p_chunk: int = 1_024,
    tie_key: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """2-D wrapper over :func:`brute_knn_nd`."""
    return brute_knn_nd([px, py], [qx, qy], k, q_chunk, p_chunk, tie_key)


# --- sub-cell block pruning (the kd-tree prune, vectorized coarse) ----
#
# A directory cell is large (10^4-10^5 rows) so a routed query that
# brute-scans its whole cell does ~35k point-distances where the
# reference's tree descent visits ~50-240 nodes
# (``script/data/knn.csv``).  The shard slices each resident cell into
# kd-ordered BLOCKS (~2k rows, tight bboxes — the top levels of
# ``serial_build_recursive`` without the deep tree) and kNN kernels
# apply the sibling-prune test (``nn_search.hpp:121-124``) per block:
# seed on the nearest blocks holding >= k rows for an exact kth bound
# from real points, then scan only blocks whose bbox min-distance is
# within it.  Everything stays vectorized; only the ~n/2048-entry
# block loop is Python.


def topk_per_qid(qid: np.ndarray, dist2: np.ndarray, neighbor: np.ndarray, k: int):
    """Vectorized per-qid top-k with (dist2, neighbor) tie-break.
    Returns (row_indices, ranks 1-based) — no per-group Python calls."""
    order = np.lexsort((neighbor, dist2, qid))
    qs = qid[order]
    uq, starts, cnts = np.unique(qs, return_index=True, return_counts=True)
    ranks = np.arange(len(qs), dtype=np.int64) - np.repeat(starts, cnts)
    keep = ranks < k
    return order[keep], ranks[keep] + 1


def cum_nearest_prefix(d2: np.ndarray, counts: np.ndarray, k: int):
    """Per query (row of ``d2``), the nearest items (by d2) whose
    cumulative ``counts`` reach ``k`` -> pair arrays (q_idx, item_idx).

    A full per-query argsort over all C items costs O(m*C log C); the
    distance-sorted prefix is found progressively instead: argpartition
    the T nearest, sort only those T, escalate T (x4) for just the
    queries whose T-prefix still holds < k — with items sized >> k,
    T=4 satisfies essentially every query in one pass."""
    m, C = d2.shape
    out_i: list[np.ndarray] = []
    out_q: list[np.ndarray] = []
    active = np.arange(m, dtype=np.int64)
    T = min(4, C)
    while len(active):
        da = d2[active]
        if T >= C:
            sub = np.argsort(da, axis=1, kind="stable")
        else:
            part = np.argpartition(da, T - 1, axis=1)[:, :T]
            so = np.argsort(np.take_along_axis(da, part, axis=1), axis=1, kind="stable")
            sub = np.take_along_axis(part, so, axis=1)
        csum = np.cumsum(counts[sub], axis=1)
        enough = csum >= k
        sat = enough.any(axis=1)
        done = np.nonzero(sat if T < C else np.ones(len(active), bool))[0]
        if len(done):
            last = np.where(sat[done], np.argmax(enough[done], axis=1), sub.shape[1] - 1)
            qi, pos = np.nonzero(np.arange(sub.shape[1])[None, :] <= last[:, None])
            out_i.append(sub[done[qi], pos])
            out_q.append(active[done[qi]])
        if T >= C:
            break
        active = active[~sat]
        T = min(T * 4, C)
    if not out_i:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return np.concatenate(out_q), np.concatenate(out_i)


def kd_block_partition(
    fc: Sequence[np.ndarray], block_rows: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Median-split a point set into kd-ordered blocks of <= block_rows.

    Returns (order, blk_lo, blk_hi, blk_boxes): ``order`` permutes the
    input arrays so each block is a contiguous [lo, hi) slice with a
    TIGHT bbox (2d flat, mins then maxs).  Max-stretch split rule;
    identical-coordinate segments stop splitting (dummy-leaf analog).
    dtype-generic (int64 grid or float-native doubles)."""
    d = len(fc)
    n = len(fc[0])
    perm = np.arange(n, dtype=np.int64)
    spans: list[tuple[int, int]] = []
    stack = [(0, n)]
    while stack:
        lo, hi = stack.pop()
        seg = perm[lo:hi]
        if hi - lo <= block_rows:
            spans.append((lo, hi))
            continue
        best_dim, best_stretch = 0, None
        mins = np.empty(d, dtype=np.float64)
        for j in range(d):
            cj = fc[j][seg]
            mn, mx = cj.min(), cj.max()
            s = float(mx) - float(mn)
            if best_stretch is None or s > best_stretch:
                best_dim, best_stretch = j, s
        if not best_stretch:
            spans.append((lo, hi))  # all points identical
            continue
        coords = fc[best_dim][seg]
        mid = (hi - lo) // 2
        split_val = np.partition(coords, mid)[mid]
        left = coords < split_val
        n_left = int(left.sum())
        if n_left == 0:
            # split_val is the minimum; move the boundary just above it
            if np.issubdtype(coords.dtype, np.floating):
                split_val = np.nextafter(split_val, np.inf)
            else:
                split_val = split_val + 1
            left = coords < split_val
            n_left = int(left.sum())
        order = np.argsort(~left, kind="stable")
        perm[lo:hi] = seg[order]
        stack.append((lo, lo + n_left))
        stack.append((lo + n_left, hi))
    spans.sort()
    blo = np.array([s for s, _ in spans], dtype=np.int64)
    bhi = np.array([e for _, e in spans], dtype=np.int64)
    dt = fc[0].dtype
    boxes = np.empty((len(spans), 2 * d), dtype=dt)
    for b in range(len(spans)):
        for j in range(d):
            cj = fc[j][perm[blo[b]: bhi[b]]]
            boxes[b, j] = cj.min()
            boxes[b, d + j] = cj.max()
    return perm, blo, bhi, boxes


def _bounds_from_triplets(q: np.ndarray, d2: np.ndarray, nb: np.ndarray, m: int, k: int):
    """Per-query kth (d2, id)-ordered distance over scanned triplets —
    a valid upper bound on the true kth distance (subset argument);
    +inf-equivalent where fewer than k rows were seen."""
    inf = (
        np.float64(np.inf)
        if np.issubdtype(d2.dtype, np.floating)
        else np.iinfo(np.int64).max
    )
    bounds = np.full(m, inf, dtype=d2.dtype)
    if len(q):
        rows, _ = topk_per_qid(q, d2, nb, k)
        qs, ds = q[rows], d2[rows]
        uq, st, ct = np.unique(qs, return_index=True, return_counts=True)
        full = ct >= k
        bounds[uq[full]] = ds[st[full] + k - 1]
    return bounds


def block_knn_triplets(
    fc: Sequence[np.ndarray],
    ids: np.ndarray,
    blo: np.ndarray,
    bhi: np.ndarray,
    bboxes: np.ndarray,
    Qc: Sequence[np.ndarray],
    k: int,
    exact: bool = True,
    init_bounds: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Within-cell top-k via block pruning -> triplets
    (q_idx, neighbor_id, dist2), already cut to per-query top-k under
    the global (dist2, id) tie order.

    Phase A: scan each query's nearest blocks holding >= k rows
    (usually ONE) -> exact kth bound; phase B: sliver-filter only the
    unscanned blocks whose bbox min-distance is within the bound.
    Exact: the bound is the kth smallest distance among scanned rows
    (>= the true kth), and candidate inclusion is <=, so every true
    top-k row (ties included) is emitted before the final cut.

    ``init_bounds`` (per-query, aligned with Qc): an EXTERNAL upper
    bound on the distance any caller-relevant row can have (a provable
    global-kth bound on the serving path).  Seed blocks outside it are
    never scanned and the phase-B bound is capped by it — a non-seed
    cell whose nearest blocks sit beyond the global bound costs one
    vectorized compare instead of a brute scan.  Rows beyond the
    caller's bound were going to be discarded by the bound-verified
    merge anyway, so exactness is unchanged (a too-small caller bound
    is already repaired by the found/kth verification).

    ``exact=False`` skips phase B: the result is the top-k among the
    seed blocks only — points whose true rank is k-th but who live in
    a neighboring block can be missed.  Use ONLY where any nearby k
    rows suffice (e.g. picking candidate cells for a provable
    directory bound)."""
    from pkd_tree_ray.geometry import pnd_b_min_dist2

    m = len(Qc[0])
    n = len(fc[0])
    if m == 0 or n == 0:
        z = np.zeros(0, np.int64)
        return z, z, np.zeros(0, fc[0].dtype if n else np.int64)
    Qm = np.stack([np.asarray(c) for c in Qc], axis=1)
    bd2 = pnd_b_min_dist2(Qm, bboxes)
    sizes = bhi - blo
    sq, sb = cum_nearest_prefix(bd2, sizes, min(k, n))
    if init_bounds is not None:
        ib = np.asarray(init_bounds, dtype=np.float64)
        keep_seed = bd2[sq, sb] <= ib[sq]
        sq, sb = sq[keep_seed], sb[keep_seed]
    B = len(blo)
    out_q: list[np.ndarray] = []
    out_n: list[np.ndarray] = []
    out_d: list[np.ndarray] = []
    seeded = np.zeros((m, B), dtype=bool)
    seeded[sq, sb] = True
    order = np.argsort(sb, kind="stable")
    sb_s, sq_s = sb[order], sq[order]
    ub, st = np.unique(sb_s, return_index=True)
    st = np.append(st, len(sb_s))
    for t in range(len(ub)):
        b = int(ub[t])
        qs = sq_s[st[t]: st[t + 1]]
        lo, hi = int(blo[b]), int(bhi[b])
        idx, d2 = brute_knn_nd(
            [c[lo:hi] for c in fc], [c[qs] for c in Qc], k, tie_key=ids[lo:hi]
        )
        k_eff = idx.shape[1]
        out_q.append(np.repeat(qs, k_eff))
        out_n.append(ids[lo + idx.ravel()])
        out_d.append(d2.ravel())
    if out_q:
        q1 = np.concatenate(out_q)
        n1 = np.concatenate(out_n)
        d1 = np.concatenate(out_d)
    else:
        q1 = np.zeros(0, np.int64)
        n1 = np.zeros(0, ids.dtype)
        d1 = np.zeros(0, np.int64)
    if not exact:
        rows0, _ = topk_per_qid(q1, d1, n1, k)
        return q1[rows0], n1[rows0], d1[rows0]
    bounds = _bounds_from_triplets(q1, d1, n1, m, min(k, n))
    if init_bounds is not None:
        bounds = np.minimum(bounds.astype(np.float64), ib)
    cand = (bd2 <= bounds[:, None]) & ~seeded
    for b in range(B):
        qs2 = np.nonzero(cand[:, b])[0]
        if not len(qs2):
            continue
        lo, hi = int(blo[b]), int(bhi[b])
        qi, pi, d2f = brute_range_filter_nd(
            [c[lo:hi] for c in fc], [c[qs2] for c in Qc], bounds[qs2]
        )
        if not len(qi):
            continue
        nb = ids[lo + pi]
        if len(qi) > 4 * k * len(qs2):
            # duplicate-heavy data can tie a whole block at the bound;
            # only each block's per-query top-k can survive the cut
            rows, _ = topk_per_qid(qi, d2f, nb, k)
            qi, nb, d2f = qi[rows], nb[rows], d2f[rows]
        out_q.append(qs2[qi])
        out_n.append(nb)
        out_d.append(d2f)
    if not out_q:
        return q1, n1, d1
    q = np.concatenate(out_q)
    nbr = np.concatenate(out_n)
    dd = np.concatenate(out_d)
    rows, _ = topk_per_qid(q, dd, nbr, k)
    return q[rows], nbr[rows], dd[rows]


def block_range_triplets(
    fc: Sequence[np.ndarray],
    ids: np.ndarray,
    blo: np.ndarray,
    bhi: np.ndarray,
    bboxes: np.ndarray,
    Qc: Sequence[np.ndarray],
    bounds: np.ndarray,
    k_cap: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All (query, point) pairs within per-query squared-distance
    bounds, scanning only blocks whose bbox min-distance is within the
    query's bound (the sliver-filter fast path for foreign cells) ->
    triplets (q_idx, neighbor_id, dist2).  ``k_cap`` caps the emitted
    rows per (block, query) batch at top-k when a loose bound admits a
    whole cluster."""
    from pkd_tree_ray.geometry import pnd_b_min_dist2

    m = len(Qc[0])
    n = len(fc[0])
    if m == 0 or n == 0:
        z = np.zeros(0, np.int64)
        return z, z, np.zeros(0, fc[0].dtype if n else np.int64)
    Qm = np.stack([np.asarray(c) for c in Qc], axis=1)
    bd2 = pnd_b_min_dist2(Qm, bboxes)
    cand = bd2 <= bounds[:, None]
    out_q: list[np.ndarray] = []
    out_n: list[np.ndarray] = []
    out_d: list[np.ndarray] = []
    for b in range(len(blo)):
        qs = np.nonzero(cand[:, b])[0]
        if not len(qs):
            continue
        lo, hi = int(blo[b]), int(bhi[b])
        qi, pi, d2f = brute_range_filter_nd(
            [c[lo:hi] for c in fc], [c[qs] for c in Qc], bounds[qs]
        )
        if not len(qi):
            continue
        nb = ids[lo + pi]
        if k_cap is not None and len(qi) > 4 * k_cap * len(qs):
            rows, _ = topk_per_qid(qi, d2f, nb, k_cap)
            qi, nb, d2f = qi[rows], nb[rows], d2f[rows]
        out_q.append(qs[qi])
        out_n.append(nb)
        out_d.append(d2f)
    if not out_q:
        z = np.zeros(0, np.int64)
        return z, z, np.zeros(0, bounds.dtype)
    return np.concatenate(out_q), np.concatenate(out_n), np.concatenate(out_d)
