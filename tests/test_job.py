"""End-to-end resume test for the ``ray job submit`` entry point
(``pkd_tree_ray.job``): a killed run re-invoked with resume must skip
finished cells, regenerate only what is missing, and produce identical
results — the north rule's partition-granular checkpoint contract."""

import glob
import json
import os

import numpy as np

from pkd_tree_ray.job import main as job_main


def _metrics(workdir):
    with open(os.path.join(workdir, "job_metrics.json")) as f:
        return json.load(f)


def test_job_runs_and_resumes_at_cell_granularity(ray_session, tmp_path):
    wd = str(tmp_path / "job")
    args = ["--workdir", wd, "--n-synthetic", "4000", "--k", "5", "--graph",
            "--target-cell-rows", "512"]
    rc = job_main(args)
    assert rc == 0
    m1 = _metrics(wd)
    assert m1["index_rows"] == 4000
    assert m1["decoded_sample_rows"] == 256
    assert m1["knn_k5_rows"] > 0
    assert m1["graph_edges"] == 4000 * 5
    assert m1["cells_skipped_by_resume"] == 0

    # simulate a partial failure: delete one cell file and one graph
    # edge file; every other artifact must be reused (mtime unchanged)
    cell_files = sorted(glob.glob(os.path.join(wd, "index", "parts", "cell-*.parquet")))
    edge_files = sorted(glob.glob(os.path.join(wd, "graph", "edges", "cell-*.parquet")))
    assert len(cell_files) > 2 and len(edge_files) > 2
    os.remove(cell_files[0])
    os.remove(edge_files[0])
    keep_cell, keep_edge = cell_files[-1], edge_files[-1]
    mt_cell, mt_edge = os.path.getmtime(keep_cell), os.path.getmtime(keep_edge)

    rc = job_main(args)
    assert rc == 0
    m2 = _metrics(wd)
    # resumed run: the untouched cells were skipped, the missing ones
    # regenerated, and the results are identical
    assert m2["cells_skipped_by_resume"] == m1["index_cells"] - 1
    assert os.path.exists(cell_files[0]) and os.path.exists(edge_files[0])
    assert os.path.getmtime(keep_cell) == mt_cell
    assert os.path.getmtime(keep_edge) == mt_edge
    assert m2["index_rows"] == m1["index_rows"]
    assert m2["graph_edges"] == m1["graph_edges"]
    assert m2["knn_k5_rows"] == m1["knn_k5_rows"]
    assert m2["range_count_total"] == m1["range_count_total"]
