"""Engine configuration.

Single dataclass replacing the reference's compile-time constants
(``include/cpdd/kdTreeParallel.h:36-48``: BUILD_DEPTH_ONCE=6,
LEAVE_WRAP=32, SERIAL_BUILD_CUTOFF=1024, INBALANCE_RATIO=30) and env
knobs (``tests/test.cpp:248-249``).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class EngineConfig:
    # --- coordinate space -------------------------------------------------
    #: coordinates are int64 in [0, 2**coord_bits); fixtures use [0, 1e6]
    #: matching the reference generator's integer cube
    #: (tests/data_generate.cpp:33-42).
    coord_bits: int = 20
    #: coordinate column names, one per dimension — the runtime analog of
    #: the reference's compile-time dimension dispatch
    #: (``tests/test.cpp:569-617``, d in {2,3,5,7,9,10,12,16}).  The cell
    #: layer requires ndim * max_depth <= 62 so a full-depth Morton code
    #: fits an int64 (d=3 @ depth 16 = 48 bits; raise by lowering
    #: max_depth for higher d).
    dims: tuple[str, ...] = ("x", "y")

    # --- distributed partitioner (cell layer) ----------------------------
    #: Morton-code depth of the finest cell the adaptive directory may use.
    max_depth: int = 16
    #: rows a cell should hold; directory resolution is picked so that
    #: cells ~ target_cell_rows (analog of choosing how many 6-level
    #: rounds to build, kdTreeParallel.h:37).
    target_cell_rows: int = 65_536
    #: a cell whose count exceeds split_factor * target_cell_rows is split
    #: one Morton level deeper (hot-cell handling; the distributed mirror
    #: of the weight-balance rebuild, tree_node.hpp:117-131).
    split_factor: float = 4.0
    #: a cell whose count drops below merge_factor * target_cell_rows is a
    #: candidate for merging with its siblings on the next compaction
    #: (mirror of THIN_LEAVE_WRAP, kdTreeParallel.h:40).
    merge_factor: float = 0.125

    # --- per-cell kd-tree kernel -----------------------------------------
    #: leaf wrap of the in-partition kd-tree (LEAVE_WRAP=32,
    #: kdTreeParallel.h:39).
    leaf_size: int = 32
    #: below this many rows a partition skips the tree and brute-forces
    #: (SERIAL_BUILD_CUTOFF analog, kdTreeParallel.h:43).
    brute_force_cutoff: int = 2_048
    #: a cell accumulates insert sidecar files (O(delta) batch insert,
    #: the leaves-absorb path of batch_insert.hpp:139-155) until it has
    #: this many files; the next insert/delete compacts it into one
    #: (the flatten+rebuild analog, batch_insert.hpp:94-105).
    max_cell_files: int = 8
    #: a delete is absorbed as an O(delta) per-cell tombstone sidecar
    #: until tombstoned rows would exceed this fraction of the cell's
    #: live rows; then the cell compacts (mark_tomb -> rebuild,
    #: batch_delete.hpp:147-265).
    tomb_compact_frac: float = 0.3
    #: a planned cell bigger than salt_factor x target_cell_rows that
    #: the directory could not split (depth cap or duplicate-coordinate
    #: point mass) is salted over ceil(count/target) sub-partitions in
    #: the build shuffle so no groupby task becomes a straggler.
    salt_factor: float = 2.0
    #: split-dimension policy of the in-partition kd-tree:
    #: "max_stretch" (MAX_STRETCH_DIM, the reference default) or
    #: "rotate" (ROTATE_DIM by depth) — kdTreeParallel.h:78,245-246.
    split_rule: str = "max_stretch"
    #: weight-balance alpha: left subtree must hold within
    #: [alpha, 1-alpha] of the node (INBALANCE_RATIO=30 -> 0.3,
    #: tree_node.hpp:117-124).  Only used by the invariant checker; the
    #: median-split builder is always balanced.
    imbalance_alpha: float = 0.3

    # --- Ray execution ----------------------------------------------------
    #: rows per Arrow batch in map_batches stages.
    batch_size: int = 65_536
    #: actor-pool size for stateful query stages; None -> let Ray size it.
    query_concurrency: int | None = None
    #: run query scan kernels as an actor pool (True) or as stateless
    #: tasks over warm workers with a per-worker broadcast cache
    #: (False, default).  Pools amortize per-actor state on long jobs;
    #: tasks win on short query jobs where pool spin-up dominates
    #: (measured ~1-2s x pool size per job on this sandbox).
    use_actor_pools: bool = False

    # --- misc -------------------------------------------------------------
    seed: int = 42

    @property
    def coord_max(self) -> int:
        return (1 << self.coord_bits) - 1

    @property
    def ndim(self) -> int:
        return len(self.dims)

    @property
    def split_threshold(self) -> int:
        return int(self.split_factor * self.target_cell_rows)

    def with_(self, **kw) -> "EngineConfig":
        return replace(self, **kw)


DEFAULT_CONFIG = EngineConfig()

#: config tuned for the sandbox test scales (1e3..1e6 rows on <=32 cpus):
#: smaller cells so there are >= 2-4x cells per worker.
SMALL_CONFIG = EngineConfig(target_cell_rows=8_192, batch_size=16_384)
