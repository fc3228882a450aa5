"""Sliding-window update stream — the engine's streaming-shaped
workload, mirroring ``insertOsmByTime``
(``tests/testFramework.h:817-869``): for each time period, insert that
period's batch, delete the batch that fell out of the
``window_len``-period window, optionally run a kNN checkpoint.

Ordering assumption (same as the reference): period batches arrive in
period order; there are no watermarks or late data.  Incremental state
is the PkdIndex (per-cell Parquet + directory) plus the period ->
delta bookkeeping kept in the step metrics manifest, so a killed run
can resume from the last completed period.
"""

from __future__ import annotations

import time
from collections import deque

import numpy as np

from pkd_tree_ray.index import PkdIndex


class SlidingWindowIndex:
    """Maintains an index over the last ``window_len`` period batches."""

    def __init__(self, index: PkdIndex, window_len: int = 5):
        self.index = index
        self.window_len = window_len
        self.live_periods: deque[tuple[int, object]] = deque()  # (period, delta source)
        self.metrics: list[dict] = []

    def step(self, period: int, delta, knn_probe=None, k: int = 10) -> dict:
        """Insert ``delta`` (a Dataset of (id, x, y)), expire the
        oldest period beyond the window, optionally checkpoint with a
        kNN batch.  ``delta`` must be re-creatable (it is re-scanned
        for the expiry delete), matching the reference's replay of
        period files."""
        rec: dict = {"period": period}
        t0 = time.perf_counter()
        self.index = self.index.insert(delta)
        rec["insert_sec"] = time.perf_counter() - t0
        rec["rows_after_insert"] = self.index.total_rows
        self.live_periods.append((period, delta))

        if len(self.live_periods) > self.window_len:
            old_period, old_delta = self.live_periods.popleft()
            t0 = time.perf_counter()
            self.index = self.index.delete(old_delta, strict=True)
            rec["expired_period"] = old_period
            rec["delete_sec"] = time.perf_counter() - t0
        rec["rows"] = self.index.total_rows

        if knn_probe is not None:
            from pkd_tree_ray.queries import knn

            qx, qy = knn_probe
            t0 = time.perf_counter()
            res = knn(self.index, qx, qy, k)
            rec["knn_sec"] = time.perf_counter() - t0
            rec["knn_rows"] = res.num_rows if hasattr(res, "num_rows") else res.count()
        self.metrics.append(rec)
        return rec
