"""PkdIndex — the distributed two-level spatial index.

Architecture (SURVEY.md §7.1): the reference's single shared-memory
kd-tree (``include/cpdd/kdTreeParallel.h:242-247``) splits into

1. a **cell layer**: the adaptive Morton directory
   (:class:`pkd_tree_ray.cells.CellDirectory`) — small driver-side
   state, broadcast to workers via ``ray.put``; the analog of the
   sampled pivot skeleton (``build_tree.hpp:19-70``) and the InnerTree
   update router (``inner_tree.hpp:8-172``);
2. a **partition layer**: one Parquet file per cell holding
   ``(cell, <id>, x, y)`` — narrow index rows only; payload columns
   (image bytes, captions) never transit the shuffle and are re-joined
   by id at report time (SURVEY.md §7.4.5).  Per-cell kd-trees are
   (re)built *inside* query actors from these rows.

Build is the one big shuffle: assign cell (vectorized ``find_bucket``)
-> ``groupby("cell")`` -> per-cell write (the analog of the blocked
counting-sort ``partition``, ``build_tree.hpp:83-121``, with Ray's hash
shuffle replacing the hand-rolled scatter).

Batch insert/delete (``batch_insert.hpp:59-191``,
``batch_delete.hpp:74-359``) become delta pipelines that rewrite ONLY
the affected cells and bump a manifest version; hot cells split into
child cells (the distributed mirror of the weight-balance rebuild,
``tree_node.hpp:117-131``).  The manifest (JSON, atomically swapped)
records per-cell lineage — rows, bbox, file, latency — so a killed run
resumes at partition granularity: finished cell files of the target
version are detected and skipped.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from pkd_tree_ray.cells import CellDirectory, morton_code_nd, pick_base_depth
from pkd_tree_ray.hashing import splitmix64
from pkd_tree_ray.config import DEFAULT_CONFIG, EngineConfig

_OP_KEEP = 0
#: bytes of assigned delta the driver may hold for the fast update
#: path — byte-based, not row-based, so a wide schema cannot turn the
#: cap into a multi-GiB driver spike (r2 verdict)
_SMALL_DELTA_BYTES = 256 * 1024 * 1024
_OP_INSERT = 1
_OP_DELETE = 2


def _in_sorted(values: np.ndarray, sset: np.ndarray) -> np.ndarray:
    """Membership mask of ``values`` in the SORTED array ``sset``.
    ``np.isin`` re-sorts its second argument on every call — a
    931-cell delete-verification sweep paid 931 sorts of the same
    2M-id delete set; one searchsorted per cell is ~5x cheaper."""
    out = np.zeros(len(values), dtype=bool)
    if not len(sset) or not len(values):
        return out
    pos = np.searchsorted(sset, values, side="left")
    ok = pos < len(sset)
    out[ok] = sset[pos[ok]] == values[ok]
    return out


def _cell_file(path: str, cell: int, depth: int, version: int) -> str:
    # depth is part of the identity: a Morton range start is shared by
    # cells of different depths (cell 0 at depth 1 vs depth 3), and a
    # resumed build with a re-planned directory must never reuse a file
    # written for a different cell extent.
    return os.path.join(path, "parts", f"cell-{cell:012x}-d{depth}-v{version}.parquet")


def _fp_columns(group: pa.Table) -> list[str]:
    """Columns usable for the content fingerprint: numeric 8-byte."""
    return [
        name
        for name, typ in zip(group.schema.names, group.schema.types)
        if name != "cell" and (pa.types.is_integer(typ) or pa.types.is_floating(typ))
    ]


def _content_token(group: pa.Table, cols: list[str]) -> str:
    """Order-insensitive 32-bit content hash of the group (splitmix64
    xor-fold per column)."""
    acc = np.uint64(group.num_rows)
    for j, c in enumerate(cols):
        v = group[c].to_numpy(zero_copy_only=False)
        bits = v.astype(np.float64).view(np.uint64) if v.dtype.kind == "f" else v.astype(np.int64).view(np.uint64)
        h = splitmix64(bits, seed=j + 1)
        if len(h):
            acc ^= np.bitwise_xor.reduce(h)
    return f"{int(acc) & 0xFFFFFFFF:08x}"


#: Parquet footer key carrying the writer's content token — exact
#: resume verification (ADVICE r2: footer min/max stats alone cannot
#: distinguish two same-version deltas with coinciding count+extrema,
#: e.g. tombstones {1,5,9} vs {1,6,9})
_TOKEN_KEY = b"pkd_content_token"


def _resume_matches(final: str, group: pa.Table, cols: list[str], token: str | None = None) -> bool:
    """True iff the existing file holds exactly this group's content.

    Primary check: the content token written into the Parquet footer
    key-value metadata at write time — exact, order-insensitive.
    Legacy files (written before the token existed) fall back to row
    count + per-column min/max footer stats."""
    try:
        md = pq.read_metadata(final)
    except Exception:
        return False
    if md.num_rows != group.num_rows:
        return False
    kv = md.metadata or {}
    if token is not None and _TOKEN_KEY in kv:
        return kv[_TOKEN_KEY].decode() == token
    if group.num_rows == 0 or not cols:
        return True
    want = {}
    for c in cols:
        v = group[c].to_numpy(zero_copy_only=False)
        want[c] = (v.min(), v.max())
    got: dict[str, list] = {c: [None, None] for c in want}
    for i in range(md.num_row_groups):
        rg = md.row_group(i)
        for j in range(rg.num_columns):
            cc = rg.column(j)
            name = cc.path_in_schema
            if name in got:
                st = cc.statistics
                if st is None or not st.has_min_max:
                    return False  # cannot verify -> do not trust
                lo, hi = got[name]
                got[name][0] = st.min if lo is None else min(lo, st.min)
                got[name][1] = st.max if hi is None else max(hi, st.max)
    for c, (lo, hi) in want.items():
        glo, ghi = got[c]
        if glo is None or glo != lo or ghi != hi:
            return False
    return True


def _resolve_update_file(final: str, group: pa.Table, resume: bool) -> tuple[str, bool, str]:
    """Pick the path an update group writes to and whether the write
    may be skipped (verified resume hit).  Returns
    ``(path, skip, content_token)`` — the token must be embedded in the
    footer by the writer so a later resume can verify exactly.

    Functional-update hazard (r2): two different updates branched off
    the SAME index version collide on the version-numbered file name;
    blindly resuming silently drops the second delta, and overwriting
    corrupts the sibling index that references the file.  An existing
    file is therefore reused only when its footer token (or, for
    legacy files, footer stats) matches the group; otherwise the group
    diverts to a deterministic content-token name (stable across
    crash-resume of this update, disjoint from the sibling's)."""
    cols = _fp_columns(group)
    token = _content_token(group, cols)
    if not os.path.exists(final):
        return final, False, token
    if resume and _resume_matches(final, group, cols, token):
        return final, True, token
    alt = final.replace(".parquet", f"-u{token}.parquet")
    if resume and os.path.exists(alt) and _resume_matches(alt, group, cols, token):
        return alt, True, token
    return alt, False, token


def _empty_bbox(dims: tuple[str, ...]) -> list[int]:
    """Canonical empty box: mins=0, maxs=-1 (never covers anything)."""
    return [0] * len(dims) + [-1] * len(dims)


def _group_bbox(group: pa.Table, dims: tuple[str, ...]) -> list[int]:
    mins, maxs = [], []
    for dcol in dims:
        v = group[dcol].to_numpy()
        mins.append(int(v.min()))
        maxs.append(int(v.max()))
    return mins + maxs


def _file_bbox(final: str, dims: tuple[str, ...]) -> list[int]:
    """[mins..., maxs...] of an existing cell file, from parquet
    row-group statistics (free) with a column-read fallback.  Used on
    the resume path: a skipped cell's lineage must describe the file
    actually kept, not the in-memory group a re-planned build produced
    (ADVICE r1)."""
    md = pq.read_metadata(final)
    if md.num_rows == 0:
        return _empty_bbox(dims)
    mins: dict[str, int] = {}
    maxs: dict[str, int] = {}
    ok = True
    for rg in range(md.num_row_groups):
        for ci in range(md.row_group(rg).num_columns):
            col = md.row_group(rg).column(ci)
            name = col.path_in_schema
            if name not in dims:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            mins[name] = min(mins.get(name, st.min), st.min)
            maxs[name] = max(maxs.get(name, st.max), st.max)
        if not ok:
            break
    if ok and all(dcol in mins for dcol in dims):
        return [int(mins[dc]) for dc in dims] + [int(maxs[dc]) for dc in dims]
    t = pq.read_table(final, columns=list(dims))
    return _group_bbox(t, dims)


def _atomic_write_table(table: pa.Table, final: str, token: str | None = None) -> None:
    if token is not None:
        meta = dict(table.schema.metadata or {})
        meta[_TOKEN_KEY] = token.encode()
        table = table.replace_schema_metadata(meta)
    tmp = final + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, final)


def _atomic_write_json(obj, final: str) -> None:
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, final)


class PkdIndex:
    """Handle to a built index: directory + on-disk cell partitions."""

    def __init__(
        self,
        path: str,
        directory: CellDirectory,
        config: EngineConfig,
        id_col: str,
        id_type: str,
        version: int,
        cell_files: dict[int, list[str]],
        lineage: list[dict] | None = None,
        tomb_files: dict[int, list[str]] | None = None,
    ):
        self.path = path
        self.directory = directory
        self.config = config
        self.id_col = id_col
        self.id_type = id_type
        self.version = version
        self.cell_files = cell_files
        self.lineage = lineage or []
        #: per-cell delete-tombstone sidecars: ids logically removed
        #: from the cell's files until the next compaction
        self.tomb_files = tomb_files or {}
        #: optional resident serving layer (shards.ShardedQueryPool);
        #: attached by the pool itself, never persisted.
        self.pool = None

    def with_config(self, **overrides) -> "PkdIndex":
        """Functional handle with policy overrides (e.g.
        ``imbalance_alpha`` — the INBALANCE_RATIO sweep of
        ``tests/test.cpp`` bit10 / ``script/run.sh:13-17`` tunes the
        rebuild policy per run).  Shares the on-disk layout; copies the
        in-memory directory and file maps so branched updates never
        alias mutable state."""
        import copy
        from dataclasses import replace as _dc_replace

        return PkdIndex(
            self.path,
            copy.deepcopy(self.directory),
            _dc_replace(self.config, **overrides),
            self.id_col,
            self.id_type,
            self.version,
            {c: list(v) for c, v in self.cell_files.items()},
            [dict(r) for r in self.lineage],
            {c: list(v) for c, v in self.tomb_files.items()},
        )

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    @classmethod
    def build(
        cls,
        points,
        path: str,
        config: EngineConfig = DEFAULT_CONFIG,
        id_col: str = "point_id",
        resume: bool = True,
    ) -> "PkdIndex":
        """Bulk build from a Dataset with columns (id_col, *config.dims).

        Pipeline: exact Morton histogram at a capped depth (partial
        aggregate inside map_batches, then a tiny groupby — the
        pre-aggregation pattern) -> adaptive directory -> cell assign
        (broadcast directory) -> groupby(cell) shuffle -> one Parquet
        file per cell + manifest.
        """
        os.makedirs(os.path.join(path, "parts"), exist_ok=True)
        t0 = time.perf_counter()

        directory, n = cls._plan_directory(points, config)

        version = 0
        # hot-key salting: cells the directory could not split further
        # (depth cap / duplicate-coordinate point masses) spread over
        # ceil(count/target) deterministic sub-partitions
        salts = {
            int(c): int(-(-int(n) // config.target_cell_rows))
            for c, n in zip(directory.starts, directory.counts)
            if int(n) > config.salt_factor * config.target_cell_rows
        }
        tagged = _assign_cells(points, directory, config, id_col=id_col, salts=salts or None)
        cell_files, lineage = cls._write_cells(
            tagged, path, directory, config, id_col, version, resume=resume
        )
        idx = cls(
            path,
            directory,
            config,
            id_col,
            _arrow_type_name(points.schema(), id_col),
            version,
            cell_files,
            lineage,
        )
        idx._refresh_directory_stats()
        idx.save_manifest(build_sec=time.perf_counter() - t0, n_input=n)
        return idx

    @staticmethod
    def _plan_directory(points, config: EngineConfig, sample_per_batch: int = 1_024):
        """ONE sampled pass — the true ``pick_pivots`` analog
        (``build_tree.hpp:48-70``: sample 2048 points, build the pivot
        skeleton from the sample alone).

        Each input batch contributes an evenly-strided subsample of its
        full-depth Morton codes, weighted by ``batch_rows /
        sample_rows`` so per-node population estimates are unbiased;
        skewed (varden) inputs are handled automatically because the
        sample is density-proportional.  The earlier exact-histogram
        planner made 2+ full passes over the data before the build
        shuffle and anti-scaled with CPU count (r1 bench: build 4.97s
        @8 -> 5.65s @32); this pass does O(1k) work per batch beyond
        the column read.  Planned counts are estimates only — the
        post-shuffle ``_refresh_directory_stats`` replaces them with
        written-file truth, and correctness never depends on the plan
        (any total tiling of Morton space routes every row somewhere).

        Returns (directory, n_rows).
        """
        bits = config.coord_bits
        dims = config.dims

        def sample(batch: pa.Table) -> pa.Table:
            n_rows = batch.num_rows
            if n_rows == 0:
                return pa.table(
                    {"code": pa.array([], pa.int64()), "w": pa.array([], pa.float64())}
                )
            step = max(1, n_rows // sample_per_batch)
            sel = np.arange(0, n_rows, step)
            cs = [batch[dc].to_numpy()[sel] for dc in dims]
            codes = morton_code_nd(cs, config.max_depth, bits)
            w = np.full(len(sel), n_rows / len(sel), dtype=np.float64)
            return pa.table({"code": codes, "w": w})

        pdf = (
            points.select_columns(list(dims))
            .map_batches(sample, batch_format="pyarrow")
            .to_pandas()
        )
        n = int(round(pdf["w"].sum()))
        codes = pdf["code"].to_numpy(dtype=np.int64)
        weights = pdf["w"].to_numpy(dtype=np.float64)
        directory = CellDirectory.from_counts(codes, weights, config)
        # planned per-cell counts (estimates; refreshed after the write)
        cidx = np.searchsorted(directory.starts, codes, side="right") - 1
        planned = np.zeros(len(directory), dtype=np.float64)
        np.add.at(planned, cidx, weights)
        directory.counts = planned.round().astype(np.int64)
        return directory, n

    @staticmethod
    def _write_cells(
        tagged,
        path: str,
        directory: CellDirectory,
        config: EngineConfig,
        id_col: str,
        version: int,
        resume: bool,
        old_index: "PkdIndex | None" = None,
    ) -> tuple[dict[int, str], list[dict]]:
        """groupby(cell) -> apply ops -> write one file per cell.

        ``tagged`` has columns (cell, id_col, *dims, __op).  Returns
        ({cell: file}, lineage rows).  Idempotent per cell: an existing
        file of the target version is kept as-is (resume).
        """

        dims = config.dims
        depth_ref = ray.put((directory.starts, directory.depths))

        def write_group(group: pa.Table) -> pa.Table:
            t_start = time.perf_counter()
            cell = int(group["cell"][0].as_py())
            part = int(group["__part"][0].as_py()) if "__part" in group.column_names else 0
            starts, depths = ray.get(depth_ref)
            depth = int(depths[np.searchsorted(starts, cell)])
            final = _cell_file(path, cell, depth, version)
            if part:
                final = final.replace(".parquet", f"-p{part}.parquet")
            ops = group["__op"].to_numpy()
            if (ops == _OP_DELETE).any():
                group = _apply_deletes(group, id_col, dims)
            group = group.drop_columns(
                [c for c in ("__op", "__part") if c in group.column_names]
            )
            final, skip, token = _resolve_update_file(final, group, resume)
            if skip:
                rows = pq.read_metadata(final).num_rows
                status = "skipped"
                # bbox/lineage must describe the file KEPT, not the new
                # in-memory group (a resumed build may have re-planned
                # slightly different groups)
                bbox = _file_bbox(final, dims) if rows else _empty_bbox(dims)
            else:
                rows = group.num_rows
                if rows:
                    _atomic_write_table(group, final, token)
                    bbox = _group_bbox(group, dims)
                else:
                    bbox = _empty_bbox(dims)
                status = "written"
            return pa.table(
                {
                    "cell": pa.array([cell], pa.int64()),
                    "rows": pa.array([rows], pa.int64()),
                    "bbox": pa.array([bbox], pa.list_(pa.int64())),
                    "file": pa.array([final if rows else ""], pa.string()),
                    "status": pa.array([status], pa.string()),
                    "sec": pa.array([time.perf_counter() - t_start], pa.float64()),
                }
            )

        group_keys = ["cell"]
        if "__part" in tagged.schema().names:
            group_keys = ["cell", "__part"]
        manifest_rows = (
            tagged.groupby(group_keys)
            .map_groups(write_group, batch_format="pyarrow")
            .to_pandas()
        )
        cell_files: dict[int, list[str]] = {}
        lineage: list[dict] = []
        for rec in manifest_rows.to_dict("records"):
            if rec["rows"] > 0:
                cell_files.setdefault(int(rec["cell"]), []).append(rec["file"])
            lineage.append(
                {
                    "cell": int(rec["cell"]),
                    "rows": int(rec["rows"]),
                    "bbox": [int(v) for v in rec["bbox"]],
                    "file": rec["file"],
                    "status": rec["status"],
                    "sec": float(rec["sec"]),
                    "version": version,
                }
            )
        return cell_files, lineage

    def _refresh_directory_stats(self) -> None:
        """Tighten directory counts/bboxes from lineage (the
        ``update_inner_tree`` analog, ``batch_helpers.hpp:124-142``).
        A cell may carry several lineage records (base file + insert
        sidecars): counts add, bboxes union."""
        nd = self.config.ndim
        pos = {int(c): i for i, c in enumerate(self.directory.starts)}
        counts = np.zeros(len(self.directory), dtype=np.int64)
        bboxes = self.directory.spatial_boxes()
        seen = np.zeros(len(self.directory), dtype=bool)
        neg = np.zeros(len(self.directory), dtype=np.int64)
        for rec in self.lineage:
            i = pos.get(int(rec["cell"]))
            if i is None:
                continue
            if rec["rows"] < 0:  # tombstone record
                neg[i] += rec["rows"]
                continue
            if rec["rows"] == 0:
                continue
            counts[i] += rec["rows"]
            b = np.asarray(rec["bbox"], dtype=np.int64)
            if not seen[i]:
                bboxes[i] = b
                seen[i] = True
            else:
                bboxes[i, :nd] = np.minimum(bboxes[i, :nd], b[:nd])
                bboxes[i, nd:] = np.maximum(bboxes[i, nd:], b[nd:])
        counts[~seen] = 0
        counts = np.maximum(counts + neg, 0)
        self.directory.counts = counts
        self.directory.bboxes = bboxes

    # ------------------------------------------------------------------
    # manifest / open
    # ------------------------------------------------------------------

    def save_manifest(self, **extra) -> None:
        manifest = {
            "format": "pkd_tree_ray/1",
            "version": self.version,
            "id_col": self.id_col,
            "id_type": self.id_type,
            "config": {
                "coord_bits": self.config.coord_bits,
                "dims": list(self.config.dims),
                "max_depth": self.config.max_depth,
                "target_cell_rows": self.config.target_cell_rows,
                "split_factor": self.config.split_factor,
                "merge_factor": self.config.merge_factor,
                "leaf_size": self.config.leaf_size,
            },
            "directory": self.directory.to_records(),
            "cell_files": {str(k): v for k, v in self.cell_files.items()},
            "tomb_files": {str(k): v for k, v in self.tomb_files.items()},
            "lineage": self.lineage,
            "extra": extra,
        }
        _atomic_write_json(manifest, os.path.join(self.path, "manifest.json"))

    def vacuum(self) -> dict:
        """Drop part files not referenced by THIS version — superseded
        base files, compacted-away sidecars and applied tombstones
        accumulate across functional updates until vacuumed.

        Collapses the version history: older ``PkdIndex`` handles (and
        any index sharing this directory tree) become invalid.  Returns
        {files_removed, bytes_freed}."""
        import glob

        referenced = {f for fs in self.cell_files.values() for f in fs}
        referenced |= {f for fs in self.tomb_files.values() for f in fs}
        removed = 0
        freed = 0
        for f in glob.glob(os.path.join(self.path, "parts", "*.parquet")):
            if f not in referenced:
                try:
                    freed += os.path.getsize(f)
                    os.remove(f)
                    removed += 1
                except OSError:  # pragma: no cover — concurrent cleanup
                    pass
        return {"files_removed": removed, "bytes_freed": freed}

    @classmethod
    def open(cls, path: str) -> "PkdIndex":
        with open(os.path.join(path, "manifest.json")) as f:
            m = json.load(f)
        cfg = EngineConfig(
            coord_bits=m["config"]["coord_bits"],
            dims=tuple(m["config"].get("dims", ("x", "y"))),
            max_depth=m["config"]["max_depth"],
            target_cell_rows=m["config"]["target_cell_rows"],
            split_factor=m["config"]["split_factor"],
            merge_factor=m["config"]["merge_factor"],
            leaf_size=m["config"]["leaf_size"],
        )
        directory = CellDirectory.from_records(m["directory"], cfg)
        return cls(
            path,
            directory,
            cfg,
            m["id_col"],
            m["id_type"],
            m["version"],
            {int(k): (v if isinstance(v, list) else [v]) for k, v in m["cell_files"].items()},
            m["lineage"],
            {int(k): v for k, v in m.get("tomb_files", {}).items()},
        )

    # ------------------------------------------------------------------
    # scans
    # ------------------------------------------------------------------

    @property
    def total_rows(self) -> int:
        return int(self.directory.counts.sum())

    def scan_cells(self, cell_ids, columns: list[str] | None = None):
        """Dataset over the given cells' partitions — file-level pruning
        (the distributed analog of descending only into overlapping
        subtrees)."""
        import ray.data as rd

        files = [
            f for c in cell_ids for f in self.cell_files.get(int(c), [])
        ]
        if not files:
            schema = pa.schema(
                [("cell", pa.int64()), (self.id_col, _type_from_name(self.id_type))]
                + [(dc, pa.int64()) for dc in self.config.dims]
            )
            empty = pa.table({f.name: pa.array([], f.type) for f in schema})
            if columns:
                empty = empty.select(columns)
            return rd.from_arrow(empty)
        tombs = tuple(
            sorted(
                f
                for c in cell_ids
                for f in self.tomb_files.get(int(c), [])
            )
        )

        def _read_schema(read_cols):
            # Part files carry a per-file content token in their footer
            # schema metadata (resume verification); left in place, every
            # file yields a DISTINCT (and unhashable) Arrow schema, which
            # defeats Ray's block-schema dedup and spams "Failed to hash
            # the schemas" / "RefBundle with a different schema" warnings.
            # Pass one metadata-free schema, projected to the selection.
            full = pq.read_schema(files[0]).remove_metadata()
            if read_cols is None:
                return full
            return pa.schema([full.field(c) for c in read_cols])

        if not tombs:
            return rd.read_parquet(
                files, columns=columns, schema=_read_schema(columns)
            )
        # logical deletes: drop tombstoned ids after the read (the ids
        # are worker-cached per tombstone-file set)
        id_col = self.id_col
        read_cols = columns
        drop_id = False
        if read_cols is not None and id_col not in read_cols:
            read_cols = list(read_cols) + [id_col]
            drop_id = True
        ds = rd.read_parquet(files, columns=read_cols, schema=_read_schema(read_cols))

        def drop_tombs(batch: pa.Table) -> pa.Table:
            dead = _tomb_ids_cached(tombs, id_col)
            if len(dead):
                keep = ~_in_sorted(batch[id_col].to_numpy(zero_copy_only=False), dead)
                batch = batch.filter(pa.array(keep))
            if drop_id:
                batch = batch.drop_columns([id_col])
            return batch

        return ds.map_batches(drop_tombs, batch_format="pyarrow")

    def scan_all(self, columns: list[str] | None = None):
        return self.scan_cells([int(c) for c in self.cell_files], columns)

    def validate(self) -> dict:
        """Distributed invariant check (``validate``,
        ``include/cpdd/utility/validation.hpp:49-70``): per-cell file
        rows match directory counts, every row's coordinates fall inside
        its cell's directory bbox, and ids are globally unique.  Returns
        the tree metrics the reference prints with every benchmark line
        (``validation.hpp:72-124``): total rows, live cells, avg/max
        per-cell kd-tree height (estimated from cell sizes and
        leaf_size).  Raises AssertionError on violation."""
        dims = self.config.dims
        nd = self.config.ndim
        ref = ray.put((self.directory.starts, self.directory.bboxes))

        def check(batch: pa.Table) -> pa.Table:
            starts, bboxes = ray.get(ref)
            cellv = batch["cell"].to_numpy()
            i = np.searchsorted(starts, cellv)
            assert (starts[i] == cellv).all(), "row routed to unknown cell"
            bb = bboxes[i]
            for j, dc in enumerate(dims):
                v = batch[dc].to_numpy()
                assert (
                    (v >= bb[:, j]) & (v <= bb[:, nd + j])
                ).all(), "row outside its cell bbox"
            u, c = np.unique(cellv, return_counts=True)
            return pa.table({"cell": u, "n": c.astype(np.int64)})

        pdf = (
            self.scan_all(columns=["cell", self.id_col, *dims])
            .map_batches(check, batch_format="pyarrow")
            .to_pandas()
        )
        per_cell = pdf.groupby("cell")["n"].sum()
        pos = {int(c): i for i, c in enumerate(self.directory.starts)}
        for cell, n in per_cell.items():
            assert int(self.directory.counts[pos[int(cell)]]) == int(n), (
                f"cell {cell}: directory count "
                f"{int(self.directory.counts[pos[int(cell)]])} != rows {int(n)}"
            )
        assert int(per_cell.sum()) == self.total_rows
        # per-cell balanced-tree heights (median-split tree is balanced:
        # height = ceil(log2(n / leaf_size)) + 1)
        sizes = self.directory.counts[self.directory.counts > 0]
        leaf = max(1, self.config.leaf_size)
        heights = np.ceil(np.log2(np.maximum(sizes / leaf, 1))) + 1
        return {
            "rows": self.total_rows,
            "cells": int(len(sizes)),
            "avg_tree_height": float(heights.mean()) if len(sizes) else 0.0,
            "max_tree_height": int(heights.max()) if len(sizes) else 0,
            "avg_cell_rows": float(sizes.mean()) if len(sizes) else 0.0,
        }

    # ------------------------------------------------------------------
    # batch updates
    # ------------------------------------------------------------------

    def insert(self, delta, resume: bool = True) -> "PkdIndex":
        """Batch insert (``batch_insert.hpp:59-191``): route the delta
        through the directory, rewrite only affected cells, split cells
        that exceed the imbalance threshold.  Returns a NEW PkdIndex
        (functional update; old version's files remain until vacuum)."""
        return self._update(delta, op=_OP_INSERT, strict=False, resume=resume)

    def delete(self, delta, strict: bool = True, resume: bool = True) -> "PkdIndex":
        """Batch delete.  ``strict=True`` = FullCoveredTag semantics
        (every delete row must exist — ``batch_delete.hpp:74-91``;
        raises on miss); ``strict=False`` = PartialCoverTag (skip
        missing rows, ``batch_delete.hpp:93-107``).  Matching is by id
        when the delta carries the id column, else by coordinate
        multiset (one delete row removes one instance, the dummy-leaf
        multiplicity rule, ``batch_delete.hpp:172-177``)."""
        return self._update(delta, op=_OP_DELETE, strict=strict, resume=resume)

    def _update(self, delta, op: int, strict: bool, resume: bool) -> "PkdIndex":
        t0 = time.perf_counter()
        new_version = self.version + 1
        cfg = self.config

        # 1. route the delta (retrive_tag analog) ONCE — materialized so
        #    the count / filter / write consumers below never recompute
        #    the assignment — then per-cell delta counts
        #    (InnerTree::reduce_sums, inner_tree.hpp:33-76).  A delta
        #    small enough for the driver (<= _SMALL_DELTA_BYTES) is
        #    pulled down and partitioned with numpy; partition tasks do
        #    the writes — skipping the full groupby machinery whose
        #    fixed cost dwarfs a small delta.
        delta_assigned = _assign_cells(
            delta, self.directory, cfg, op=op, id_col=self.id_col
        ).materialize()
        n_delta_total = delta_assigned.count()
        small = (delta_assigned.size_bytes() or 0) <= _SMALL_DELTA_BYTES
        delta_tbl: pa.Table | None = None
        if small:
            import ray.data as _rd

            delta_tbl = pa.concat_tables(
                [pa.table(b) for b in delta_assigned.iter_batches(batch_format="pyarrow", batch_size=None)]
            )
            cellv = delta_tbl["cell"].to_numpy()
            order = np.argsort(cellv, kind="stable")
            delta_tbl = delta_tbl.take(pa.array(order))
            affected, dcnt = np.unique(cellv, return_counts=True)
        else:
            from ray.data.aggregate import Sum

            delta_counts = (
                delta_assigned.select_columns(["cell"])
                .map_batches(
                    lambda t: pa.table(
                        {
                            "cell": np.unique(t["cell"].to_numpy(), return_counts=True)[0],
                            "cnt": np.unique(t["cell"].to_numpy(), return_counts=True)[1].astype(np.int64),
                        }
                    ),
                    batch_format="pyarrow",
                )
                .groupby("cell")
                .aggregate(Sum("cnt", alias_name="cnt"))
                .to_pandas()
            )
            affected = delta_counts["cell"].to_numpy(dtype=np.int64)
            dcnt = delta_counts["cnt"].to_numpy(dtype=np.int64)
        affected_set = set(int(a) for a in affected)

        # 2. new directory + per-cell plan (tag_inbalance_node analog,
        #    inner_tree.hpp:78-148): an INSERT delta is absorbed as an
        #    O(delta) per-cell sidecar file (the leaves-absorb path,
        #    batch_insert.hpp:139-155) UNLESS the cell must be compacted
        #    — it split (weight-balance violation) or it already carries
        #    max_cell_files fragments (the flatten+rebuild analog,
        #    batch_insert.hpp:94-105).  DELETE always compacts its
        #    affected cells (the anti-join rewrite).
        directory = self.directory
        if op == _OP_INSERT:
            # _split_hot_cells returns the cells it actually split —
            # identity by directory position, NOT by Morton start,
            # because child 0 of a split shares the parent's start
            # (ADVICE r1: a start-membership test never detects splits,
            # stranding the parent's rows under an aliased cell id)
            directory, split_parents = _split_hot_cells(directory, affected, dcnt, cfg)
            many_files = {
                c
                for c in affected_set
                if len(self.cell_files.get(c, [])) + 1 > cfg.max_cell_files
            }
            tombed = {c for c in affected_set if self.tomb_files.get(c)}
            # weight-balance rebuild policy (tag_inbalance_node,
            # inner_tree.hpp:78-148; INBALANCE_RATIO sweep, test.cpp
            # bit10): a cell whose UNINDEXED sidecar rows would exceed
            # imbalance_alpha of its total compacts now — its per-cell
            # kd-tree is rebuilt over base+sidecars, the distributed
            # mirror of rebuilding an alpha-imbalanced subtree.
            alpha = cfg.imbalance_alpha
            pos_of_ins = {int(c): i for i, c in enumerate(self.directory.starts)}
            live_ins = self.directory.counts
            dcnt_of_ins = {int(c): int(k) for c, k in zip(affected, dcnt)}
            side_now: dict[int, int] = {}
            for r in self.lineage:
                # "-delta" as a basename substring, NOT a suffix:
                # branched updates divert to ...-delta-u<token>.parquet
                # (_resolve_update_file) and must still count toward
                # the imbalance trigger (ADVICE r2)
                if (
                    r["cell"] in affected_set
                    and r["rows"] > 0
                    and "-delta" in os.path.basename(r["file"])
                ):
                    side_now[r["cell"]] = side_now.get(r["cell"], 0) + r["rows"]
            alpha_violated = {
                c
                for c in affected_set
                if side_now.get(c, 0) + dcnt_of_ins[c]
                > alpha * (int(live_ins[pos_of_ins[c]]) + dcnt_of_ins[c])
            }
            compact_set = split_parents | many_files | tombed | alpha_violated
            sidecar_set = affected_set - compact_set
            tomb_set: set[int] = set()
            needs_reassign = bool(split_parents)
        else:
            # DELETE: O(delta) tombstone sidecars when the delta carries
            # the id column; a cell compacts when its tombstones would
            # exceed tomb_compact_frac of its live rows or its file
            # budget (the mark_tomb -> rebuild rule,
            # batch_delete.hpp:147-265)
            has_id = self.id_col in delta.schema().names
            if has_id:
                pos_of = {int(c): i for i, c in enumerate(self.directory.starts)}
                live = self.directory.counts
                old_tombs = {
                    c: len(self.tomb_files.get(c, [])) for c in affected_set
                }
                dcnt_of = {int(c): int(n) for c, n in zip(affected, dcnt)}
                compact_set = {
                    c
                    for c in affected_set
                    if old_tombs[c] + 1 > cfg.max_cell_files
                    or dcnt_of[c] + self._tomb_rows(c)
                    > cfg.tomb_compact_frac * max(1, int(live[pos_of.get(c, 0)]))
                }
                tomb_set = affected_set - compact_set
            else:
                compact_set = set(affected_set)
                tomb_set = set()
            sidecar_set = set()
            # THIN_LEAVE_WRAP analog (kdTreeParallel.h:40): sibling
            # groups that drop below merge_factor x target after this
            # delete coarsen into their parent cell; members join the
            # compaction so their rows re-file under the parent id
            directory, merged = _merge_cold_cells(
                directory, affected_set, dict(zip(map(int, affected), map(int, dcnt))), cfg
            )
            needs_reassign = bool(merged)
            if merged:
                compact_set |= merged
                tomb_set -= merged

        side_lineage: list[dict] = []
        comp_lineage: list[dict] = []
        tomb_lineage: list[dict] = []

        # 3a. sidecar path: write ONE delta file per cell — touches only
        #     the delta rows, never the resident data
        if sidecar_set:
            if delta_tbl is not None:
                side_tbl = _filter_cells_tbl(delta_tbl, sidecar_set) if compact_set else delta_tbl
                side_lineage = self._write_parts_driver(
                    side_tbl, directory, new_version, resume, "-delta.parquet", "delta", None
                )
            else:
                side = delta_assigned
                if compact_set:
                    side = _filter_cells(side, sidecar_set)
                side_lineage = self._write_sidecars(side, directory, new_version, resume)

        # 3a'. tombstone path (DELETE): verify matches with a read-only
        #      scan (live rows only — existing tombstones already
        #      applied), then write one (cell, id) tombstone file per
        #      cell — never rewriting resident data
        if tomb_set:
            if delta_tbl is not None:
                tomb_tbl = _filter_cells_tbl(delta_tbl, tomb_set) if compact_set else delta_tbl
                tomb_ids = np.unique(tomb_tbl[self.id_col].to_numpy(zero_copy_only=False))
                matched = self._count_matches_ids(sorted(tomb_set), tomb_ids)
            else:
                tomb_delta = (
                    _filter_cells(delta_assigned, tomb_set) if compact_set else delta_assigned
                )
                matched = self._count_matches(sorted(tomb_set), tomb_delta)
            if strict:
                want = int(sum(n for c, n in zip(affected, dcnt) if int(c) in tomb_set))
                got = int(sum(matched.values()))
                if got != want:
                    raise ValueError(
                        f"strict (FullCovered) delete: {want} rows requested but "
                        f"only {got} exist (use strict=False for PartialCover semantics)"
                    )
            if delta_tbl is not None:
                tomb_lineage = self._write_parts_driver(
                    tomb_tbl, directory, new_version, resume, "-tomb.parquet", "tomb", matched
                )
            else:
                tomb_lineage = self._write_tombstones(
                    tomb_delta, directory, new_version, resume, matched
                )

        # 3b. compaction path: old rows (base + sidecars, tombstones
        #     applied) of the compact cells + their delta, re-assigned
        #     under the NEW directory, one fresh file per cell
        if compact_set:
            other = sidecar_set | tomb_set
            # directory-stable small-delta compaction skips the shuffle
            # entirely: every compacted cell keeps its id/extent, so it
            # rewrites from its own files via raw per-cell tasks
            # (``_compact_cells_task``) — incremental compaction
            # (VERDICT r3 #7; the coordinate-multiset delete, which
            # needs ``_apply_deletes``'s per-instance semantics, and
            # any split/merge update keep the groupby path)
            direct = (
                delta_tbl is not None
                and not needs_reassign
                and len(directory) == len(self.directory)
                and self.id_col in delta_tbl.column_names
                and (op == _OP_INSERT or delta_tbl[self.id_col].null_count == 0)
            )
            if direct:
                comp_tbl = (
                    _filter_cells_tbl(delta_tbl, compact_set) if other else delta_tbl
                )
                comp_lineage = self._compact_cells_direct(
                    sorted(compact_set), comp_tbl, op, new_version, resume
                )
            elif delta_tbl is not None:
                import ray.data as _rd

                comp_delta = _rd.from_arrow(
                    _filter_cells_tbl(delta_tbl, compact_set) if other else delta_tbl
                )
            else:
                comp_delta = (
                    _filter_cells(delta_assigned, compact_set) if other else delta_assigned
                )
            if not direct:
                old_rows = self.scan_cells(sorted(compact_set))  # tombstones applied

                def _tag_old(t: pa.Table) -> pa.Table:
                    if "__part" not in t.column_names:
                        t = t.append_column("__part", pa.array(np.zeros(t.num_rows, np.int32)))
                    if "__op" not in t.column_names:
                        t = t.append_column("__op", pa.array(np.full(t.num_rows, 0, np.int8)))
                    return t

                old_tagged = old_rows.map_batches(_tag_old, batch_format="pyarrow")
                union = old_tagged.union(comp_delta)
                if needs_reassign or len(directory) != len(self.directory):
                    union = _reassign_cells(union, directory, cfg)
                _, comp_lineage = self._write_cells(
                    union, self.path, directory, cfg, self.id_col, new_version, resume=resume
                )

        lineage = side_lineage + comp_lineage + tomb_lineage

        # strict-delete postcondition on the compacted part: rows
        # removed there == delta routed there (tombstoned cells were
        # verified above)
        if op == _OP_DELETE and strict and compact_set:
            comp_cells = np.array(sorted(compact_set), dtype=np.int64)
            old_in_affected = int(
                self.directory.counts[self.directory.index_of(comp_cells)].sum()
            )
            new_in_affected = sum(r["rows"] for r in comp_lineage)
            n_delta = int(sum(n for c, n in zip(affected, dcnt) if int(c) in compact_set))
            if old_in_affected - new_in_affected != n_delta:
                raise ValueError(
                    f"strict (FullCovered) delete: {n_delta} rows requested but "
                    f"{old_in_affected - new_in_affected} removed — some delete rows "
                    "do not exist (use strict=False for PartialCover semantics)"
                )

        # 4. stitch: unaffected cells keep old files; compacted cells
        #    are replaced; sidecar cells append (update_inner_tree)
        new_files = {c: list(v) for c, v in self.cell_files.items()}
        new_tombs = {c: list(v) for c, v in self.tomb_files.items()}
        for cell in compact_set:
            new_files.pop(cell, None)
            new_tombs.pop(cell, None)  # compaction physically applied them
        for rec in comp_lineage:
            if rec["rows"] > 0:
                new_files[rec["cell"]] = [rec["file"]]
        for rec in side_lineage:
            if rec["rows"] > 0:
                new_files.setdefault(rec["cell"], []).append(rec["file"])
        for rec in tomb_lineage:
            if rec["rows"] < 0 and rec["file"]:
                new_tombs.setdefault(rec["cell"], []).append(rec["file"])

        merged_lineage = [
            r
            for r in self.lineage
            if r["cell"] not in compact_set and r["cell"] in new_files
        ] + lineage
        if directory is self.directory:
            # functional update: never mutate the old handle's directory
            directory = CellDirectory(
                directory.starts.copy(),
                directory.depths.copy(),
                cfg,
                counts=directory.counts.copy(),
                bboxes=directory.bboxes.copy(),
            )
        idx = PkdIndex(
            self.path, directory, cfg, self.id_col, self.id_type, new_version,
            new_files, merged_lineage, new_tombs,
        )
        idx._refresh_directory_stats()
        idx.save_manifest(update_sec=time.perf_counter() - t0, op="insert" if op == _OP_INSERT else "delete")
        return idx


    def _tomb_rows(self, cell: int) -> int:
        """Rows already tombstoned in a cell (from lineage)."""
        return -sum(
            r["rows"] for r in self.lineage if r["cell"] == cell and r["rows"] < 0
        )

    def _count_matches(self, cells: list[int], tomb_delta) -> dict[int, int]:
        """Per-cell count of LIVE rows whose id appears in the delete
        delta — a read-only verification scan (no shuffle, no write).
        Served from the resident shard pool when one is attached, else
        the parallel file-group sweep (see _count_matches_ids)."""
        del_ids = np.unique(
            tomb_delta.select_columns([self.id_col]).to_pandas()[self.id_col].to_numpy()
        )
        return self._count_matches_ids(cells, del_ids)

    def _write_tombstones(
        self, tomb_delta, directory, version: int, resume: bool, matched: dict[int, int]
    ) -> list[dict]:
        """One (cell, id) tombstone Parquet per cell; lineage rows carry
        NEGATIVE row counts (the verified number of live rows the
        tombstone removes)."""
        path = self.path
        id_col = self.id_col
        depth_ref = ray.put((directory.starts, directory.depths))

        def write_group(group: pa.Table) -> pa.Table:
            t_start = time.perf_counter()
            cell = int(group["cell"][0].as_py())
            starts, depths = ray.get(depth_ref)
            depth = int(depths[np.searchsorted(starts, cell)])
            final = _cell_file(path, cell, depth, version).replace(
                ".parquet", "-tomb.parquet"
            )
            group = group.select(["cell", id_col])
            final, skip, token = _resolve_update_file(final, group, resume)
            if not skip:
                _atomic_write_table(group, final, token)
            return pa.table(
                {
                    "cell": pa.array([cell], pa.int64()),
                    "file": pa.array([final], pa.string()),
                    "sec": pa.array([time.perf_counter() - t_start], pa.float64()),
                }
            )

        rows = (
            tomb_delta.groupby("cell")
            .map_groups(write_group, batch_format="pyarrow")
            .to_pandas()
        )
        return [
            {
                "cell": int(r["cell"]),
                "rows": -matched.get(int(r["cell"]), 0),
                "bbox": _empty_bbox(self.config.dims),
                "file": r["file"],
                "status": "tomb",
                "sec": float(r["sec"]),
                "version": version,
            }
            for r in rows.to_dict("records")
        ]

    def _count_matches_ids(self, cells: list[int], del_ids: np.ndarray) -> dict[int, int]:
        """_count_matches with the delete id set already on the driver;
        uses the resident shard pool when attached, else parallel raw
        tasks over per-cell file groups — an id-column sweep needs no
        Dataset planning/scheduling machinery (it alone made a 0.1%
        strict delete cost ~4.4 s of its ~5 s)."""
        if self.pool is not None and self.pool.index is self:
            matched = self.pool.count_matches(del_ids)
            wanted = set(int(c) for c in cells)
            return {c: n for c, n in matched.items() if c in wanted}
        dref = ray.put(np.unique(del_ids))
        entries = [
            (int(c), list(self.cell_files.get(int(c), [])), list(self.tomb_files.get(int(c), [])))
            for c in cells
        ]
        try:
            cpus = int(ray.cluster_resources().get("CPU", 4))
        except Exception:  # pragma: no cover
            cpus = 4
        n_tasks = max(1, min(2 * cpus, len(entries)))
        chunk = -(-len(entries) // n_tasks)
        refs = [
            _count_matches_task.remote(entries[s: s + chunk], dref, self.id_col)
            for s in range(0, len(entries), chunk)
        ]
        out: dict[int, int] = {}
        for part in ray.get(refs):
            out.update(part)
        return out

    def _write_parts_driver(
        self,
        tbl: pa.Table,
        directory,
        version: int,
        resume: bool,
        suffix: str,
        status: str,
        matched: dict[int, int] | None,
    ) -> list[dict]:
        """Driver-partitioned sidecar/tombstone writes for small deltas:
        numpy run-split by cell (tbl is cell-sorted), then one write
        task per chunk of cells — no Dataset groupby overhead."""
        if tbl.num_rows == 0:
            return []
        cellv = tbl["cell"].to_numpy()
        uc, starts = np.unique(cellv, return_index=True)
        ends = np.append(starts[1:], len(cellv))
        files = []
        for c in uc:
            depth = int(directory.depths[np.searchsorted(directory.starts, c)])
            files.append(
                _cell_file(self.path, int(c), depth, version).replace(".parquet", suffix)
            )
        select = ["cell", self.id_col] if status == "tomb" else [
            c for c in tbl.column_names if c not in ("__op", "__part")
        ]
        try:
            cpus = int(ray.cluster_resources().get("CPU", 4))
        except Exception:  # pragma: no cover
            cpus = 4
        n_tasks = max(1, min(cpus, len(uc)))
        chunk = -(-len(uc) // n_tasks)
        refs = []
        for s0 in range(0, len(uc), chunk):
            e0 = min(s0 + chunk, len(uc))
            sub = tbl.slice(int(starts[s0]), int(ends[e0 - 1] - starts[s0])).select(select)
            refs.append(
                _write_parts_task.remote(
                    sub,
                    uc[s0:e0],
                    starts[s0:e0] - starts[s0],
                    ends[s0:e0] - starts[s0],
                    files[s0:e0],
                    resume,
                    status,
                    self.config.dims,
                )
            )
        recs = [r for part in ray.get(refs) for r in part]
        if status == "tomb":
            for r in recs:
                r["rows"] = -int((matched or {}).get(r["cell"], 0))
                r["bbox"] = _empty_bbox(self.config.dims)
        for r in recs:
            r["version"] = version
        return recs

    def _write_sidecars(self, side_tagged, directory, version: int, resume: bool) -> list[dict]:
        """One O(delta) Parquet sidecar per cell (the leaves-absorb
        insert path).  Same lineage-row schema as ``_write_cells``;
        idempotent per (cell, version)."""
        path = self.path
        dims = self.config.dims
        depth_ref = ray.put((directory.starts, directory.depths))

        def write_group(group: pa.Table) -> pa.Table:
            t_start = time.perf_counter()
            cell = int(group["cell"][0].as_py())
            starts, depths = ray.get(depth_ref)
            depth = int(depths[np.searchsorted(starts, cell)])
            final = _cell_file(path, cell, depth, version).replace(
                ".parquet", "-delta.parquet"
            )
            group = group.drop_columns(
                [c for c in ("__op", "__part") if c in group.column_names]
            )
            final, skip, token = _resolve_update_file(final, group, resume)
            if skip:
                rows = pq.read_metadata(final).num_rows
                status = "skipped"
                bbox = _file_bbox(final, dims) if rows else _empty_bbox(dims)
            else:
                rows = group.num_rows
                if rows:
                    _atomic_write_table(group, final, token)
                    bbox = _group_bbox(group, dims)
                else:
                    bbox = _empty_bbox(dims)
                status = "delta"
            return pa.table(
                {
                    "cell": pa.array([cell], pa.int64()),
                    "rows": pa.array([rows], pa.int64()),
                    "bbox": pa.array([bbox], pa.list_(pa.int64())),
                    "file": pa.array([final if rows else ""], pa.string()),
                    "status": pa.array([status], pa.string()),
                    "sec": pa.array([time.perf_counter() - t_start], pa.float64()),
                }
            )

        rows = (
            side_tagged.groupby("cell")
            .map_groups(write_group, batch_format="pyarrow")
            .to_pandas()
        )
        return [
            {
                "cell": int(r["cell"]),
                "rows": int(r["rows"]),
                "bbox": [int(v) for v in r["bbox"]],
                "file": r["file"],
                "status": r["status"],
                "sec": float(r["sec"]),
                "version": version,
            }
            for r in rows.to_dict("records")
        ]

    def _compact_cells_direct(
        self, compact_cells: list[int], delta_tbl: pa.Table, op: int,
        version: int, resume: bool,
    ) -> list[dict]:
        """Directory-stable compaction without a shuffle: one raw Ray
        task per chunk of cells rewrites those cells from their own
        files + the (cell-sorted, driver-resident) delta slice.  Only
        valid when no cell split/merged this update — every compacted
        cell keeps its id and extent, so its new file is a pure
        function of its old files and its delta rows."""
        cellv = delta_tbl["cell"].to_numpy()
        uc, ustarts = np.unique(cellv, return_index=True)
        uends = np.append(ustarts[1:], len(cellv))
        pos = {int(c): i for i, c in enumerate(uc)}
        sel = [c for c in delta_tbl.column_names if c not in ("__op", "__part")]
        entries = []
        for c in compact_cells:
            ci = pos.get(int(c))
            s0, e0 = (int(ustarts[ci]), int(uends[ci])) if ci is not None else (0, 0)
            depth = int(
                self.directory.depths[np.searchsorted(self.directory.starts, c)]
            )
            entries.append(
                (
                    int(c),
                    s0,
                    e0,
                    list(self.cell_files.get(int(c), [])),
                    tuple(sorted(self.tomb_files.get(int(c), []))),
                    _cell_file(self.path, int(c), depth, version),
                )
            )
        try:
            cpus = int(ray.cluster_resources().get("CPU", 4))
        except Exception:  # pragma: no cover
            cpus = 4
        n_tasks = max(1, min(2 * cpus, len(entries)))
        chunk = -(-len(entries) // n_tasks)
        refs = []
        for s in range(0, len(entries), chunk):
            es = entries[s: s + chunk]
            spans = [(s0, e0) for _, s0, e0, _, _, _ in es if e0 > s0]
            lo = min((s0 for s0, _ in spans), default=0)
            hi = max((e0 for _, e0 in spans), default=0)
            sub = delta_tbl.slice(lo, hi - lo).select(sel)
            refs.append(
                _compact_cells_task.remote(
                    sub,
                    [e[0] for e in es],
                    np.array([max(e[1] - lo, 0) for e in es], dtype=np.int64),
                    np.array([max(e[2] - lo, 0) for e in es], dtype=np.int64),
                    [e[3] for e in es],
                    [e[4] for e in es],
                    [e[5] for e in es],
                    op,
                    self.id_col,
                    self.config.dims,
                    resume,
                )
            )
        recs = [r for part in ray.get(refs) for r in part]
        for r in recs:
            r["version"] = version
        return recs


# ----------------------------------------------------------------------
# helpers
# ----------------------------------------------------------------------


def _filter_cells(tagged, cell_set: set[int]):
    """Keep only rows routed to the given cells (broadcast once)."""
    ref = ray.put(np.array(sorted(cell_set), dtype=np.int64))

    def flt(batch: pa.Table) -> pa.Table:
        keep_cells = ray.get(ref)
        cellv = batch["cell"].to_numpy()
        i = np.searchsorted(keep_cells, cellv)
        i = np.minimum(i, len(keep_cells) - 1)
        return batch.filter(pa.array(keep_cells[i] == cellv))

    return tagged.map_batches(flt, batch_format="pyarrow")



def _assign_cells(
    points,
    directory: CellDirectory,
    config: EngineConfig,
    op: int = _OP_KEEP,
    id_col: str | None = None,
    salts: dict[int, int] | None = None,
):
    """Add the ``cell`` routing column (vectorized find_bucket,
    ``build_tree.hpp:72-81``), a ``__part`` salt column, and an ``__op``
    tag, putting columns in the canonical (cell, <id>, *dims, __part,
    __op) order so tagged datasets union cleanly.  ``salts`` maps HOT
    cells (too big for one task yet unsplittable — depth cap or
    duplicate-coordinate point masses) to a part count: their rows
    spread deterministically (id hash) over that many sub-partitions,
    so no single groupby task becomes a straggler — the hot-key
    salting the north rule calls for.  The broadcast state ships once
    via ``ray.put``."""
    dims = config.dims
    ref = ray.put(
        (directory.starts, config.max_depth, config.coord_bits, salts or {})
    )

    def assign(batch: pa.Table) -> pa.Table:
        starts, max_depth, bits, salts_ = ray.get(ref)
        codes = morton_code_nd([batch[dc].to_numpy() for dc in dims], max_depth, bits)
        idx = np.searchsorted(starts, codes, side="right") - 1
        cells = starts[idx]
        out = batch
        if "cell" in out.column_names:
            out = out.drop_columns(["cell"])
        out = out.append_column("cell", pa.array(cells, pa.int64()))
        part = np.zeros(out.num_rows, dtype=np.int32)
        if salts_ and id_col and id_col in out.column_names:
            idv = out[id_col]
            if pa.types.is_integer(idv.type):
                hv = splitmix64(idv.to_numpy().view(np.uint64), 1234)
            else:
                from pandas.util import hash_array

                hv = hash_array(
                    idv.to_numpy(zero_copy_only=False).astype(object),
                    hash_key="pkd_salt_0000000",
                )
            for c, nparts in salts_.items():
                m = cells == c
                if m.any():
                    part[m] = (hv[m] % np.uint64(nparts)).astype(np.int32)
        if "__part" not in out.column_names:
            out = out.append_column("__part", pa.array(part, pa.int32()))
        if "__op" not in out.column_names:
            out = out.append_column("__op", pa.array(np.full(out.num_rows, op, np.int8)))
        front = ["cell"] + ([id_col] if id_col and id_col in out.column_names else [])
        front += list(dims)
        rest = [c for c in out.column_names if c not in front + ["__part", "__op"]]
        out = out.select(front + rest + ["__part", "__op"])
        # strip schema metadata: rd.from_pandas deltas carry a pandas
        # footer blob that makes every block schema unhashable, defeating
        # Ray's schema dedup downstream ("Failed to hash the schemas")
        return out.replace_schema_metadata(None) if out.schema.metadata else out

    return points.map_batches(assign, batch_format="pyarrow")


def _reassign_cells(tagged, directory: CellDirectory, config: EngineConfig):
    dims = config.dims
    ref = ray.put((directory.starts, config.max_depth, config.coord_bits))

    def assign(batch: pa.Table) -> pa.Table:
        starts, max_depth, bits = ray.get(ref)
        codes = morton_code_nd([batch[dc].to_numpy() for dc in dims], max_depth, bits)
        idx = np.searchsorted(starts, codes, side="right") - 1
        return batch.set_column(
            batch.column_names.index("cell"), "cell", pa.array(starts[idx], pa.int64())
        )

    return tagged.map_batches(assign, batch_format="pyarrow")


def _split_hot_cells(
    directory: CellDirectory, affected: np.ndarray, delta_counts: np.ndarray, config: EngineConfig
) -> tuple[CellDirectory, set[int]]:
    """Replace overfull leaves with children deep enough that a uniform
    spread of the new count meets the target (hot-cell split — the
    weight-balance rebuild analog).

    Returns (new_directory, split_cell_ids): the Morton starts of the
    cells that were actually split.  The caller MUST compact those
    cells so their resident rows re-route under the new directory —
    child 0 of a split keeps the parent's start, so the split is
    invisible to any start-set comparison (ADVICE r1)."""
    import math

    nd = config.ndim
    fanout = 1 << nd
    idx = directory.index_of(affected)
    new_counts = directory.counts[idx] + delta_counts
    over = new_counts > config.split_threshold
    if not over.any():
        return directory, set()
    starts = list(directory.starts)
    pos_to_remove = []
    additions: list[tuple[int, int]] = []
    for pos, cnt in zip(idx[over], new_counts[over]):
        depth = int(directory.depths[pos])
        levels = max(1, math.ceil(math.log(cnt / config.target_cell_rows, fanout)))
        new_depth = min(config.max_depth, depth + levels)
        if new_depth == depth:
            continue
        span = 1 << (nd * (config.max_depth - new_depth))
        base = int(directory.starts[pos])
        n_children = fanout ** (new_depth - depth)
        pos_to_remove.append(pos)
        additions.extend((base + q * span, new_depth) for q in range(n_children))
    if not pos_to_remove:
        return directory, set()
    split_cells = {int(directory.starts[p]) for p in pos_to_remove}
    keep = np.ones(len(starts), dtype=bool)
    keep[pos_to_remove] = False
    new_starts = np.concatenate(
        [directory.starts[keep], np.array([a[0] for a in additions], dtype=np.int64)]
    )
    new_depths = np.concatenate(
        [directory.depths[keep], np.array([a[1] for a in additions], dtype=np.int64)]
    )
    return CellDirectory(new_starts, new_depths, config), split_cells


def _merge_cold_cells(
    directory: CellDirectory,
    affected_set: set[int],
    removal_by_cell: dict[int, int],
    config: EngineConfig,
) -> tuple[CellDirectory, set[int]]:
    """Coarsen sibling groups that fall below ``merge_factor x
    target_cell_rows`` after a delete — the distributed mirror of the
    THIN_LEAVE_WRAP shrink rebuild (``kdTreeParallel.h:40``,
    delete-triggered rebuild ``batch_delete.hpp:113-143``).

    A group merges only when (a) one of its members is affected by
    this delete, (b) all 2^d siblings exist as leaves at the same
    depth, and (c) their combined predicted post-delete count fits one
    target cell.  Returns (new_directory, merged_leaf_cell_ids); the
    caller must compact the merged leaves so their rows re-file under
    the parent (child 0 aliases the parent's start — same re-route
    rule as hot-cell splits)."""
    nd = config.ndim
    fanout = 1 << nd
    thresh = config.merge_factor * config.target_cell_rows
    starts, depths, counts = directory.starts, directory.depths, directory.counts
    pos_of = {int(s): i for i, s in enumerate(starts)}
    post = counts.astype(np.float64).copy()
    for c, r in removal_by_cell.items():
        i = pos_of.get(int(c))
        if i is not None:
            post[i] = max(0.0, post[i] - r)
    merged_leaves: set[int] = set()
    additions: list[tuple[int, int]] = []
    visited: set[tuple[int, int]] = set()
    for c in affected_set:
        i = pos_of.get(int(c))
        if i is None:
            continue
        dd = int(depths[i])
        if dd == 0 or post[i] >= thresh:
            continue
        span_child = 1 << (nd * (config.max_depth - dd))
        span_parent = span_child * fanout
        p = (int(starts[i]) // span_parent) * span_parent
        if (p, dd) in visited:
            continue
        visited.add((p, dd))
        sib_pos = []
        ok = True
        for q in range(fanout):
            j = pos_of.get(p + q * span_child)
            if j is None or int(depths[j]) != dd or int(starts[j]) in merged_leaves:
                ok = False
                break
            sib_pos.append(j)
        if not ok:
            continue
        if sum(post[j] for j in sib_pos) > config.target_cell_rows:
            continue
        merged_leaves.update(int(starts[j]) for j in sib_pos)
        additions.append((p, dd - 1))
    if not additions:
        return directory, set()
    keep = np.array([int(s) not in merged_leaves for s in starts], dtype=bool)
    new_starts = np.concatenate(
        [starts[keep], np.array([a[0] for a in additions], dtype=np.int64)]
    )
    new_depths = np.concatenate(
        [depths[keep], np.array([a[1] for a in additions], dtype=np.int64)]
    )
    return CellDirectory(new_starts, new_depths, config), merged_leaves


def _apply_deletes(group: pa.Table, id_col: str, dims: tuple[str, ...] = ("x", "y")) -> pa.Table:
    """Anti-join within one cell.  Id-based when delete rows carry a
    non-null id; else coordinate-multiset (each delete row removes one
    instance — dummy-leaf multiplicity, ``batch_delete.hpp:172-177``)."""
    ops = group["__op"].to_numpy()
    keep_mask = ops != _OP_DELETE
    existing = group.filter(pa.array(keep_mask))
    deletes = group.filter(pa.array(~keep_mask))
    if deletes.num_rows == 0:
        return group
    ids = deletes[id_col]
    if ids.null_count == deletes.num_rows:
        # coordinate-multiset delete
        dcols = list(dims)
        ex = existing.to_pandas()
        dl = deletes.to_pandas()
        ex["_ord"] = ex.groupby(dcols).cumcount()
        dl["_need"] = dl.groupby(dcols).cumcount() + 1
        need = dl.groupby(dcols)["_need"].max()
        key = list(zip(*(ex[dc] for dc in dcols)))
        thresh = need.reindex(key, fill_value=0).to_numpy()
        keep = ex["_ord"].to_numpy() >= thresh
        return pa.Table.from_pandas(
            ex[keep].drop(columns=["_ord"]), preserve_index=False
        ).cast(existing.schema)
    mask = pc.invert(pc.is_in(existing[id_col], value_set=ids.combine_chunks()))
    return existing.filter(mask)


def _arrow_type_name(schema, col: str) -> str:
    """Ray's Dataset.schema() wraps names/types; map col -> type name."""
    if schema is None:
        return "int64"
    try:
        return str(dict(zip(schema.names, schema.types))[col])
    except Exception:
        return "int64"


def _type_from_name(name: str) -> pa.DataType:
    return {"string": pa.string(), "large_string": pa.large_string()}.get(name, pa.int64())


_TOMB_CACHE: dict = {}


def _tomb_ids_cached(tomb_files: tuple, id_col: str) -> np.ndarray:
    """Worker-process cache of tombstoned ids for a tombstone-file set
    (files are immutable once written)."""
    key = (tomb_files, id_col)
    if key not in _TOMB_CACHE:
        if len(_TOMB_CACHE) > 32:
            _TOMB_CACHE.clear()
        parts = [
            pq.read_table(f, columns=[id_col])[id_col].to_numpy(zero_copy_only=False)
            for f in tomb_files
        ]
        _TOMB_CACHE[key] = (
            np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
        )
    return _TOMB_CACHE[key]


def _read_ids_pruned(f: str, id_col: str, dead: np.ndarray) -> np.ndarray | None:
    """Read the id column of ``f``, pruning row groups whose min/max id
    statistics admit NO candidate from the sorted ``dead`` array (the
    footer read is O(KB) vs the column's O(rows); a delete of
    recently-inserted or otherwise id-clustered rows skips every base
    fragment).  Returns None when the whole file is pruned."""
    import pyarrow.parquet as pq

    if dead.dtype.kind not in "iuf" or not len(dead):
        return pq.read_table(f, columns=[id_col])[id_col].to_numpy(zero_copy_only=False)
    pf = pq.ParquetFile(f)
    try:
        ci = pf.schema_arrow.names.index(id_col)
    except ValueError:
        return pq.read_table(f, columns=[id_col])[id_col].to_numpy(zero_copy_only=False)
    keep = []
    for rg in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(rg).column(ci).statistics
        if st is None or not st.has_min_max:
            keep.append(rg)
            continue
        lo = np.searchsorted(dead, st.min, side="left")
        hi = np.searchsorted(dead, st.max, side="right")
        if hi > lo:
            keep.append(rg)
    if not keep:
        return None
    return pf.read_row_groups(keep, columns=[id_col])[id_col].to_numpy(
        zero_copy_only=False
    )


@ray.remote(num_cpus=1)
def _count_matches_task(entries, del_ids_ref, id_col: str) -> dict:
    """Count LIVE rows whose id is in the delete set, for a chunk of
    cells — raw parquet id-column reads (base + sidecar files,
    tombstones applied, row groups pruned by id statistics), mirroring
    IndexShard.sync's live-row rule."""
    import pyarrow.parquet as pq

    dead = ray.get(del_ids_ref) if isinstance(del_ids_ref, ray.ObjectRef) else del_ids_ref
    out: dict[int, int] = {}
    for cell, files, tombs in entries:
        if not files:
            continue
        parts = [_read_ids_pruned(f, id_col, dead) for f in files]
        parts = [p for p in parts if p is not None]
        if not parts:
            continue
        ids = np.concatenate(parts)
        if tombs:
            gone = np.unique(
                np.concatenate(
                    [
                        pq.read_table(f, columns=[id_col])[id_col].to_numpy(zero_copy_only=False)
                        for f in tombs
                    ]
                )
            )
            ids = ids[~_in_sorted(ids, gone)]
        n = int(_in_sorted(ids, dead).sum())
        if n:
            out[int(cell)] = n
    return out


@ray.remote(num_cpus=1)
def _compact_cells_task(
    delta: pa.Table,
    cells: list[int],
    dstarts: np.ndarray,
    dends: np.ndarray,
    files_list: list[list[str]],
    tombs_list: list[tuple],
    finals: list[str],
    op: int,
    id_col: str,
    dims: tuple[str, ...],
    resume: bool,
) -> list[dict]:
    """Rewrite a chunk of compacted cells IN PLACE (no shuffle): each
    cell's rows already live in its own base+sidecar files, so the
    task reads them, applies existing tombstones plus this update's
    delta (anti-join for DELETE, append for INSERT), and atomically
    writes the single new cell file.  The groupby(cell) exchange in
    ``_write_cells`` moves every row of every compacted cell across
    the cluster only to land exactly where it started — which made a
    10% delete ~5x the cost of a 10% insert (VERDICT r3 #7); this is
    the incremental-compaction path for directory-stable updates."""
    recs = []
    for i, cell in enumerate(cells):
        t_start = time.perf_counter()
        tabs = [pq.read_table(f).replace_schema_metadata(None) for f in files_list[i]]
        base = tabs[0]
        old = (
            pa.concat_tables([base] + [t.select(base.column_names).cast(base.schema) for t in tabs[1:]])
            if len(tabs) > 1
            else base
        )
        dead = _tomb_ids_cached(tuple(tombs_list[i]), id_col)
        g = delta.slice(int(dstarts[i]), int(dends[i] - dstarts[i]))
        if op == _OP_DELETE and g.num_rows:
            del_ids = g[id_col].to_numpy(zero_copy_only=False)
            dead = np.concatenate([dead, del_ids]) if len(dead) else del_ids
        if len(dead):
            keep = ~_in_sorted(
                old[id_col].to_numpy(zero_copy_only=False), np.sort(dead)
            )
            old = old.filter(pa.array(keep))
        if op == _OP_INSERT and g.num_rows:
            group = pa.concat_tables(
                [old, g.select(old.column_names).cast(old.schema)]
            )
        else:
            group = old
        final, skip, token = _resolve_update_file(finals[i], group, resume)
        if skip:
            rows = pq.read_metadata(final).num_rows
            status = "skipped"
            bbox = _file_bbox(final, dims) if rows else _empty_bbox(dims)
        else:
            rows = group.num_rows
            if rows:
                _atomic_write_table(group, final, token)
                bbox = _group_bbox(group, dims)
            else:
                bbox = _empty_bbox(dims)
            status = "written"
        recs.append(
            {
                "cell": int(cell),
                "rows": int(rows),
                "bbox": bbox,
                "file": final if rows else "",
                "status": status,
                "sec": time.perf_counter() - t_start,
            }
        )
    return recs


@ray.remote(num_cpus=1)
def _write_parts_task(
    tbl: pa.Table,
    cells: np.ndarray,
    starts: np.ndarray,
    ends: np.ndarray,
    files: list[str],
    resume: bool,
    status: str,
    dims: tuple[str, ...] = ("x", "y"),
) -> list[dict]:
    """Write a chunk of per-cell sidecar slices (idempotent per file)."""
    recs = []
    for c, s0, e0, f in zip(cells, starts, ends, files):
        t_start = time.perf_counter()
        g = tbl.slice(int(s0), int(e0 - s0))
        f, skip, token = _resolve_update_file(f, g, resume)
        if skip:
            rows = pq.read_metadata(f).num_rows
            st = "skipped" if status != "tomb" else status
        else:
            rows = g.num_rows
            if rows:
                _atomic_write_table(g, f, token)
            st = status
        if g.num_rows and status != "tomb":
            bbox = _group_bbox(g, dims)
        else:
            bbox = _empty_bbox(dims)
        recs.append(
            {
                "cell": int(c),
                "rows": int(rows),
                "bbox": bbox,
                "file": f if rows else "",
                "status": st,
                "sec": time.perf_counter() - t_start,
            }
        )
    return recs


def _filter_cells_tbl(tbl: pa.Table, cell_set: set[int]) -> pa.Table:
    """Driver-side variant of _filter_cells for a materialized delta."""
    keep_cells = np.array(sorted(cell_set), dtype=np.int64)
    cellv = tbl["cell"].to_numpy()
    i = np.minimum(np.searchsorted(keep_cells, cellv), len(keep_cells) - 1)
    return tbl.filter(pa.array(keep_cells[i] == cellv))
