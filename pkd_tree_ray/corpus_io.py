"""Resumable partitioned corpus sink.

The spatial index writes per-cell Parquet with atomic renames and
cell-granular resume (``index._write_cells``); this module applies the
same discipline — via the same atomic-write helpers — to
CURATED-CORPUS output, the final stage of a training-data pipeline.
Output layout::

    <root>/<col>=<value>/.../part-<fingerprint>.parquet
    <root>/_manifest.json

- **Partitioned**: one directory level per partition column (Hive
  layout, so any engine prunes partitions at read time — e.g. a
  ``split=holdout`` read never touches train files).  Partition
  values must be non-null strings free of ``/`` and ``=`` (validated,
  not escaped — a silent mangled layout is worse than an error).
- **Deterministic CONTENT-fingerprinted part names**: each output
  file is named by a hash of its rows' ids AND its data buffers, so a
  re-run of the same deterministic pipeline regenerates the identical
  file set, while a re-run with CHANGED upstream data writes new
  files (never silently keeps stale bytes under an unchanged name).
- **Resumable**: a part file that already exists is SKIPPED; a killed
  run resumes by writing only the missing parts.  Stale ``.tmp`` files
  from a killed writer are removed, and a completed run vacuums parts
  no longer in the manifest, so resumed/changed runs never leave torn
  or duplicate rows behind.
- **Lineage manifest**: ``_manifest.json`` (atomic swap) records every
  part's path, row count and id range — per-partition lineage +
  metrics.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

import numpy as np
import pyarrow as pa

from pkd_tree_ray.index import _atomic_write_json, _atomic_write_table

_MANIFEST = "_manifest.json"


def _part_name(ids: np.ndarray, body: pa.Table, pdir: str) -> str:
    """Content fingerprint over the id array AND every column's data
    buffers — ids alone would let a re-run with changed row CONTENT
    (same ids) collide into the old filename and silently skip the
    rewrite.  One pass over bytes the writer is about to touch anyway."""
    h = hashlib.sha1(pdir.encode())
    h.update(np.ascontiguousarray(ids, dtype=np.int64).tobytes())
    for col in body.columns:
        for chunk in col.chunks:
            for buf in chunk.buffers():
                if buf is not None:
                    h.update(buf)
    return f"part-{h.hexdigest()[:16]}.parquet"


def _partition_slices(t: pa.Table, pcols: list[str], id_col: str):
    """(pdir, sub_table) per distinct partition-value combination —
    vectorized: factorize each column, combine codes, one argsort, one
    take, contiguous slices.  Validates the Hive-layout contract."""
    cols = []
    for c in pcols:
        arr = t[c]
        if arr.null_count:
            raise ValueError(f"write_corpus: partition column {c!r} has nulls")
        vals = arr.to_numpy(zero_copy_only=False).astype(str)
        bad = np.char.find(vals, "/") >= 0
        bad |= np.char.find(vals, "=") >= 0
        if bad.any():
            raise ValueError(
                f"write_corpus: partition column {c!r} values must not "
                "contain '/' or '=' (Hive key=value layout)"
            )
        cols.append(vals)
    combo = cols[0]
    for v in cols[1:]:
        combo = np.char.add(np.char.add(combo, "\x00"), v)
    uniq, inv = np.unique(combo, return_inverse=True)
    order = np.argsort(inv, kind="stable")
    sorted_t = t.take(pa.array(order))
    counts = np.bincount(inv, minlength=len(uniq))
    bounds = np.concatenate([[0], np.cumsum(counts)])
    out = []
    for i, u in enumerate(uniq):
        parts = u.split("\x00")
        pdir = "/".join(f"{c}={v}" for c, v in zip(pcols, parts))
        out.append((pdir, sorted_t.slice(bounds[i], counts[i])))
    return out


def write_corpus(
    ds,
    root: str,
    id_col: str = "doc_id",
    partition_cols: tuple[str, ...] = (),
    vacuum: bool = True,
):
    """Write ``ds`` under ``root`` as partitioned Parquet with atomic,
    deterministic, resumable part files.  Returns the manifest dict
    (also written to ``<root>/_manifest.json``).

    Each input block splits by its partition values and writes one
    file per (block, partition) — blocks stream through workers, so no
    driver materialization; only the tiny per-file manifest rows come
    back.  At 100 TB the unit of resume is one block file, and
    finished parts cost one ``os.path.exists`` each on re-run.
    ``vacuum=True`` (default) removes part files not in this run's
    manifest after a successful pass — stale tmps from killed writers
    and superseded parts from a changed upstream never reach readers.
    """
    os.makedirs(root, exist_ok=True)
    pcols = list(partition_cols)

    def write_block(t: pa.Table) -> pa.Table:
        out = {"path": [], "rows": [], "min_id": [], "max_id": [], "skipped": []}
        items = (
            _partition_slices(t, pcols, id_col)
            if (pcols and t.num_rows)
            else ([("", t)] if t.num_rows else [])
        )
        for pdir, sub in items:
            ids = sub[id_col].to_numpy()
            body = sub.drop_columns(pcols) if pcols else sub
            d = os.path.join(root, pdir) if pdir else root
            os.makedirs(d, exist_ok=True)
            final = os.path.join(d, _part_name(ids, body, pdir))
            # a killed writer can leave torn .tmp siblings; remove them
            # so readers and the vacuum never see them
            for stale in glob.glob(final + ".tmp*"):
                os.remove(stale)
            skipped = 1
            if not os.path.exists(final):
                _atomic_write_table(body, final)
                skipped = 0
            out["path"].append(os.path.relpath(final, root))
            out["rows"].append(sub.num_rows)
            out["min_id"].append(int(ids.min()))
            out["max_id"].append(int(ids.max()))
            out["skipped"].append(skipped)
        return pa.table(
            {
                "path": pa.array(out["path"], pa.string()),
                "rows": pa.array(out["rows"], pa.int64()),
                "min_id": pa.array(out["min_id"], pa.int64()),
                "max_id": pa.array(out["max_id"], pa.int64()),
                "skipped": pa.array(out["skipped"], pa.int64()),
            }
        )

    entries = (
        ds.map_batches(write_block, batch_format="pyarrow")
        .to_pandas()
        .sort_values("path")
        .reset_index(drop=True)
    )
    manifest = {
        "n_parts": int(len(entries)),
        "n_rows": int(entries["rows"].sum()),
        "n_skipped": int(entries["skipped"].sum()),
        "parts": entries.to_dict("records"),
    }
    if vacuum:
        live = {os.path.join(root, p) for p in entries["path"]}
        for f in glob.glob(os.path.join(root, "**", "*.parquet*"), recursive=True):
            if f not in live:
                os.remove(f)
    _atomic_write_json(manifest, os.path.join(root, _MANIFEST))
    return manifest


def read_corpus(root: str, columns: list[str] | None = None):
    """Read a :func:`write_corpus` output back as a Ray Dataset (Hive
    partition values are re-derived from the directory names).  Only
    ``*.parquet`` files are discovered, so a stale tmp from a killed
    non-vacuumed writer can never contribute torn or duplicate rows."""
    import ray.data as rd

    return rd.read_parquet(root, columns=columns, file_extensions=["parquet"])
