"""Incremental build / delete drivers (SURVEY.md §2.5):
``incrementalBuild`` builds by repeated batchInsert steps,
``incrementalDelete`` bulk-builds P∪Q then step-deletes Q
(``tests/testFramework.h:208-304``); interleaved insert + kNN probes
mirror ``incrementalBuildAndQuery`` (``testFramework.h:871-928``)."""

import numpy as np
import pandas as pd

from pkd_tree_ray.config import EngineConfig
from pkd_tree_ray.fixtures import point_pair_boxes, varden_xy
from pkd_tree_ray.index import PkdIndex

CFG = EngineConfig(target_cell_rows=512, batch_size=4_096)
N = 8_000


def _pts(lo, hi):
    import ray.data as rd

    pid = np.arange(lo, hi, dtype=np.int64)
    x, y = varden_xy(pid, seed=41)
    return rd.from_pandas(pd.DataFrame({"point_id": pid, "x": x, "y": y}))


class TestIncremental:
    def test_incremental_build_matches_bulk(self, ray_session, tmp_path):
        from pkd_tree_ray.queries import range_count

        # steps 10% / 20% / 25% / 45% (the reference's step ratios)
        steps = [0, int(0.1 * N), int(0.3 * N), int(0.55 * N), N]
        idx = PkdIndex.build(_pts(steps[0], steps[1]), str(tmp_path / "i"), CFG, id_col="point_id")
        for lo, hi in zip(steps[1:-1], steps[2:]):
            idx = idx.insert(_pts(lo, hi))
        assert idx.total_rows == N

        bulk = PkdIndex.build(_pts(0, N), str(tmp_path / "b"), CFG, id_col="point_id")
        pid = np.arange(N, dtype=np.int64)
        x, y = varden_xy(pid, seed=41)
        boxes = point_pair_boxes(x, y, 25)
        a = range_count(idx, boxes).to_pandas()
        b = range_count(bulk, boxes).to_pandas()
        pd.testing.assert_frame_equal(a, b)

    def test_incremental_delete_matches_smaller_build(self, ray_session, tmp_path):
        from pkd_tree_ray.queries import range_count

        # build P ∪ Q, step-delete Q in two batches -> equals build(P)
        idx = PkdIndex.build(_pts(0, N), str(tmp_path / "d"), CFG, id_col="point_id")
        idx = idx.delete(_pts(6_000, 7_000), strict=True)
        idx = idx.delete(_pts(7_000, N), strict=True)
        assert idx.total_rows == 6_000

        small = PkdIndex.build(_pts(0, 6_000), str(tmp_path / "s"), CFG, id_col="point_id")
        pid = np.arange(6_000, dtype=np.int64)
        x, y = varden_xy(pid, seed=41)
        boxes = point_pair_boxes(x, y, 25)
        a = range_count(idx, boxes).to_pandas()
        b = range_count(small, boxes).to_pandas()
        pd.testing.assert_frame_equal(a, b)

    def test_interleaved_insert_and_knn_probes(self, ray_session, tmp_path):
        from pkd_tree_ray.queries import knn

        idx = PkdIndex.build(_pts(0, 2_000), str(tmp_path / "q"), CFG, id_col="point_id")
        for lo, hi in [(2_000, 4_000), (4_000, 8_000)]:
            idx = idx.insert(_pts(lo, hi))
            pid = np.arange(hi, dtype=np.int64)
            x, y = varden_xy(pid, seed=41)
            res = knn(idx, x[:30].copy(), y[:30].copy(), 1).to_pandas()
            assert (res["dist2"] == 0).all()  # every point finds itself
            assert idx.total_rows == hi
