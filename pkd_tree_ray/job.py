"""Resumable flagship job — the ``ray job submit`` entry point.

    python -m pkd_tree_ray.job --images /data/images_parquet \\
        --workdir /out/run1 [--n-synthetic 100000] [--k 10] [--resume]

Pipeline (the north-star job graph): Lance-style image+caption table
(image_id, bytes, w, h, fmt, caption, phash) -> decode-verify sample ->
geotag from phash -> bulk-build the two-level spatial index -> serving
pool -> query suite (self-kNN k=1/10/100 sample, range count, tile
stats) -> self-kNN graph sink.

Every stage checkpoints under ``--workdir``:

* the index build writes one Parquet file per cell + ``manifest.json``
  with per-cell lineage (rows, bbox, file, latency) — a killed run
  re-invoked with ``--resume`` skips finished cells;
* the kNN graph writes one edge file per cell, idempotently;
* ``job_metrics.json`` records per-stage wall time and row counts.

The same job graph runs unchanged at any cluster size: nothing in the
cell layout or shard assignment depends on CPU count.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", help="parquet dir/file of the image table")
    ap.add_argument("--n-synthetic", type=int, default=100_000,
                    help="rows of synthetic image table when --images is absent")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--graph", action="store_true", help="also write the self-kNN graph")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="only used when this process owns ray.init")
    ap.add_argument("--target-cell-rows", type=int, default=None,
                    help="override EngineConfig.target_cell_rows (cell "
                    "granularity = resume/checkpoint granularity)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():  # ray job submit usually pre-inits
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pkd_tree_ray.config import EngineConfig
    from pkd_tree_ray.index import PkdIndex
    from pkd_tree_ray.multimodal import DecodeImage
    from pkd_tree_ray.queries import knn, range_count
    from pkd_tree_ray.shards import ShardedQueryPool
    from pkd_tree_ray.sources import geotag_images
    from pkd_tree_ray.joins import tile_stats

    os.makedirs(args.workdir, exist_ok=True)
    metrics: dict = {"stages": {}}
    resume = not args.no_resume

    def stage(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *exc):
                metrics["stages"][name] = round(time.perf_counter() - self.t0, 3)

        return _T()

    # -- source ----------------------------------------------------------
    if args.images:
        from pkd_tree_ray.sources import read_parquet_clean

        images = read_parquet_clean(args.images)
    else:
        from pkd_tree_ray.fixtures import image_table_dataset

        images = image_table_dataset(args.n_synthetic, parallelism=32)

    # -- decode-verify a sample (per-row invariant gate) ------------------
    with stage("decode_verify"):
        sample = images.limit(256)
        feats = sample.map_batches(
            DecodeImage, batch_format="pyarrow", batch_size=64, concurrency=(1, 4)
        )
        n_decoded = feats.count()
    metrics["decoded_sample_rows"] = n_decoded

    # -- geotag + index build (resumable at cell granularity) -------------
    def to_points(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "point_id": pa.array(
                    np.asarray([int(s[3:]) if s[:3] == "img" else abs(hash(s))
                                for s in t["image_id"].to_pylist()], dtype=np.int64)
                ),
                "x": t["x"],
                "y": t["y"],
            }
        )

    pts = geotag_images(images).map_batches(to_points, batch_format="pyarrow")
    cfg = EngineConfig()
    if args.target_cell_rows:
        from dataclasses import replace

        cfg = replace(cfg, target_cell_rows=args.target_cell_rows)
    with stage("build"):
        idx = PkdIndex.build(
            pts, os.path.join(args.workdir, "index"), cfg,
            id_col="point_id", resume=resume,
        )
    metrics["index_rows"] = idx.total_rows
    metrics["index_cells"] = len(idx.cell_files)
    metrics["cells_skipped_by_resume"] = sum(
        1 for r in idx.lineage if r.get("status") == "skipped"
    )

    # -- serving pool + query suite --------------------------------------
    with stage("pool_load"):
        pool = ShardedQueryPool(idx)
    qn = min(10_000, max(1, idx.total_rows // 100))
    rng = np.random.RandomState(42)
    probe = rng.randint(0, 1 << cfg.coord_bits, (qn, 2)).astype(np.int64)
    for k in (1, args.k):
        with stage(f"knn_k{k}"):
            res = knn(idx, probe[:, 0], probe[:, 1], k)
            n_rows = res.num_rows if hasattr(res, "num_rows") else res.count()
        metrics[f"knn_k{k}_rows"] = int(n_rows)
    with stage("range_count"):
        span = (1 << cfg.coord_bits) // 64
        b0 = rng.randint(0, (1 << cfg.coord_bits) - span, (1_000, 2))
        boxes = np.concatenate([b0, b0 + span], axis=1).astype(np.int64)
        rc = range_count(idx, boxes)
    metrics["range_count_total"] = int(
        np.sum(rc["cnt"].to_numpy()) if hasattr(rc, "column_names") else 0
    )
    with stage("tile_stats"):
        metrics["tiles"] = int(tile_stats(pts, 1 << (cfg.coord_bits - 4)).count())

    # -- optional kNN graph sink -----------------------------------------
    if args.graph:
        from pkd_tree_ray.joins import knn_graph

        with stage("knn_graph"):
            edges = knn_graph(idx, os.path.join(args.workdir, "graph"), args.k)
            metrics["graph_edges"] = edges.count()

    pool.shutdown()
    metrics["total_sec"] = round(sum(metrics["stages"].values()), 3)
    out = os.path.join(args.workdir, "job_metrics.json")
    with open(out, "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
