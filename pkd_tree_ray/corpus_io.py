"""Resumable partitioned corpus sink.

The spatial index writes per-cell Parquet with atomic renames and
cell-granular resume (``index._write_cells``); this module applies the
same discipline to CURATED-CORPUS output — the final stage of a
training-data pipeline.  Output layout::

    <root>/<col>=<value>/.../part-<fingerprint>.parquet
    <root>/_manifest.json

- **Partitioned**: one directory level per partition column (Hive
  layout, so any engine prunes partitions at read time — e.g. a
  ``split=holdout`` read never touches train files).
- **Deterministic part names**: each output file is named by a content
  fingerprint of its rows' id range + count + partition value, so a
  re-run of the same deterministic pipeline regenerates the identical
  file set.
- **Resumable**: a part file that already exists is SKIPPED (its bytes
  are never rewritten); a killed run resumes by only writing the
  missing parts.  Files land via tmp + ``os.replace`` so readers and
  resumed writers never observe a torn file.
- **Lineage manifest**: ``_manifest.json`` (atomic swap) records every
  part's path, row count and id range — the per-partition lineage +
  metrics record the north rule asks for.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _part_name(ids: np.ndarray, pdir: str) -> str:
    """Content fingerprint over the FULL id array (not just its range
    and count — two different id sets sharing (min, max, count) must
    not collide into one filename, which would silently skip rows on
    resume).  Deterministic pipelines with the same blocking reproduce
    identical names; a run with different blocking simply writes a
    disjoint file set and the stale parts are vacuumable."""
    h = hashlib.sha1(
        pdir.encode() + np.ascontiguousarray(ids, dtype=np.int64).tobytes()
    ).hexdigest()[:16]
    return f"part-{h}.parquet"


def write_corpus(
    ds,
    root: str,
    id_col: str = "doc_id",
    partition_cols: tuple[str, ...] = (),
):
    """Write ``ds`` under ``root`` as partitioned Parquet with atomic,
    deterministic, resumable part files.  Returns the manifest dict
    (also written to ``<root>/_manifest.json``).

    Each input block splits by its partition values and writes one
    file per (block, partition) — blocks stream through workers, so no
    driver materialization; only the tiny per-file manifest rows come
    back.  At 100 TB the unit of resume is one block file (~the block
    size), and finished partitions cost one ``os.path.exists`` each on
    re-run.
    """
    os.makedirs(root, exist_ok=True)
    pcols = list(partition_cols)

    def write_block(t: pa.Table) -> pa.Table:
        out = {"path": [], "rows": [], "min_id": [], "max_id": [], "skipped": []}
        if t.num_rows == 0:
            return pa.table(
                {
                    "path": pa.array([], pa.string()),
                    "rows": pa.array([], pa.int64()),
                    "min_id": pa.array([], pa.int64()),
                    "max_id": pa.array([], pa.int64()),
                    "skipped": pa.array([], pa.int64()),
                }
            )
        if pcols:
            import pyarrow.compute as pc

            keys = [t[c].to_numpy(zero_copy_only=False).astype(str) for c in pcols]
            combo = np.array(["/".join(f"{c}={v}" for c, v in zip(pcols, vs))
                              for vs in zip(*keys)], dtype=object)
            groups = {}
            for i, g in enumerate(combo):
                groups.setdefault(g, []).append(i)
            items = [
                (g, t.take(pa.array(np.array(ix, dtype=np.int64))))
                for g, ix in groups.items()
            ]
        else:
            items = [("", t)]
        for pdir, sub in items:
            ids = sub[id_col].to_numpy()
            d = os.path.join(root, pdir) if pdir else root
            os.makedirs(d, exist_ok=True)
            final = os.path.join(d, _part_name(ids, pdir))
            body = sub.drop_columns(pcols) if pcols else sub
            skipped = 1
            if not os.path.exists(final):
                tmp = final + f".tmp-{os.getpid()}"
                pq.write_table(body, tmp)
                os.replace(tmp, final)
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
    tmp = os.path.join(root, "_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(root, "_manifest.json"))
    return manifest


def read_corpus(root: str, columns: list[str] | None = None):
    """Read a :func:`write_corpus` output back as a Ray Dataset (Hive
    partition values are re-derived from the directory names)."""
    import ray.data as rd

    return rd.read_parquet(root, columns=columns)
