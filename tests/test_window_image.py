"""Sliding-window update stream + image-table flagship pipeline.

Window semantics mirror ``insertOsmByTime``
(``tests/testFramework.h:817-869``): insert period batches in order,
expire the batch that falls out of the window, query the live index.
The image pipeline verifies the per-row invariant from BASELINE.json:
decoded pixels allclose (PSNR = inf for lossless PNG) + caption
equality through decode/resize stages.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pkd_tree_ray.config import EngineConfig
from pkd_tree_ray.fixtures import (
    decode_png_rgb,
    image_batch,
    image_pixels,
    image_table_dataset,
    psnr,
    varden_xy,
)
from pkd_tree_ray.index import PkdIndex

CFG = EngineConfig(target_cell_rows=512, batch_size=4096)


def _period_delta(period: int, per_period: int = 400):
    import ray.data as rd

    pid = np.arange(period * per_period, (period + 1) * per_period, dtype=np.int64)
    x, y = varden_xy(pid, seed=3)
    return rd.from_pandas(pd.DataFrame({"point_id": pid, "x": x, "y": y}))


class TestSlidingWindow:
    def test_window_contents_match_live_periods(self, ray_session, tmp_path):
        from pkd_tree_ray.queries import range_count
        from pkd_tree_ray.window import SlidingWindowIndex

        idx = PkdIndex.build(_period_delta(0), str(tmp_path / "w"), CFG, id_col="point_id")
        swi = SlidingWindowIndex(idx, window_len=3)
        swi.live_periods.append((0, _period_delta(0)))
        n_steps = 5
        for p in range(1, n_steps):
            rec = swi.step(p, _period_delta(p))
            assert rec["rows"] == swi.index.total_rows
        # live = periods 2..4
        assert swi.index.total_rows == 3 * 400
        live_pid = np.arange(2 * 400, 5 * 400, dtype=np.int64)
        lx, ly = varden_xy(live_pid, seed=3)
        boxes = np.array([[0, 0, 10**6, 10**6], [100, 100, 500_000, 400_000]], dtype=np.int64)
        got = range_count(swi.index, boxes).to_pandas().sort_values("qid")["cnt"].to_numpy()
        for bi, b in enumerate(boxes):
            exp = int(np.sum((lx >= b[0]) & (lx <= b[2]) & (ly >= b[1]) & (ly <= b[3])))
            assert got[bi] == exp
        # metrics manifest: one record per step, insert timing present
        assert len(swi.metrics) == n_steps - 1
        assert all("insert_sec" in m and "rows" in m for m in swi.metrics)


class TestImagePipeline:
    def test_decode_preserves_pixels_and_caption(self, ray_session):
        from pkd_tree_ray.multimodal import DecodeImage

        ds = image_table_dataset(300, parallelism=4)
        feats = ds.map_batches(
            DecodeImage, batch_format="pyarrow", batch_size=64,
            concurrency=(1, 2), fn_constructor_kwargs={"emit_pixels": True},
        ).to_pandas().set_index("image_id")
        src = image_batch(0, 300)
        for i in (0, 7, 150, 299):
            iid = src["image_id"][i].as_py()
            orig = image_pixels(i)
            back = np.frombuffer(feats.loc[iid, "pixels"], dtype=np.uint8).reshape(orig.shape)
            assert psnr(orig, back) == float("inf")  # PNG lossless >= 40 dB bar

    def test_resize_roundtrip_and_caption_equality(self, ray_session):
        from pkd_tree_ray.multimodal import resize_images

        ds = image_table_dataset(120, parallelism=2)
        out = resize_images(ds, 4, 4, concurrency=(1, 2)).to_pandas().set_index("image_id")
        src = image_batch(0, 120)
        for i in (0, 50, 119):
            iid = src["image_id"][i].as_py()
            row = out.loc[iid]
            assert row["caption"] == src["caption"][i].as_py()
            assert row["phash"] == src["phash"][i].as_py()
            px = decode_png_rgb(row["bytes"])
            assert px.shape == (4, 4, 3)
            # nearest-neighbor: every output pixel exists in the source
            orig = image_pixels(i).reshape(-1, 3)
            for p in px.reshape(-1, 3):
                assert (orig == p).all(axis=1).any()

    def test_video_stub_raises(self, ray_session):
        from pkd_tree_ray.multimodal import SampleFrames

        with pytest.raises(NotImplementedError):
            SampleFrames()(pa.table({"bytes": pa.array([b""], pa.binary())}))

    def test_read_image_table_formats(self, ray_session, tmp_path):
        """Parquet path reads with pruned columns; a .lance path either
        uses the lance reader or raises the documented ImportError (the
        package is not bundled in this environment)."""
        from pkd_tree_ray.fixtures import image_table_dataset
        from pkd_tree_ray.sources import read_image_table

        p = str(tmp_path / "imgs")
        image_table_dataset(64).write_parquet(p)
        ds = read_image_table(p, columns=["image_id", "phash"])
        assert ds.count() == 64
        assert set(ds.schema().names) == {"image_id", "phash"}
        try:
            read_image_table(str(tmp_path / "imgs.lance"))
            lance_available = True
        except ImportError as e:
            lance_available = False
            assert "lance" in str(e)
        if lance_available:  # pragma: no cover - env without lance
            pass

    def test_geotag_flagship_knn(self, ray_session, tmp_path):
        """image table -> phash geotag -> index -> self-kNN k=1 finds
        each image at distance 0 (every point is its own NN)."""
        from pkd_tree_ray.fixtures import phash_to_xy
        from pkd_tree_ray.queries import knn
        from pkd_tree_ray.sources import geotag_images

        n = 500
        ds = image_table_dataset(n, parallelism=4)
        pts = geotag_images(ds).map_batches(
            lambda t: pa.table(
                {
                    "point_id": pa.array(
                        np.asarray([int(s[3:]) for s in t["image_id"].to_pylist()], dtype=np.int64)
                    ),
                    "x": t["x"],
                    "y": t["y"],
                }
            ),
            batch_format="pyarrow",
        )
        idx = PkdIndex.build(pts, str(tmp_path / "img"), CFG, id_col="point_id")
        assert idx.total_rows == n
        src = image_batch(0, n)
        qx, qy = phash_to_xy(src["phash"].to_numpy())
        res = knn(idx, qx[:40].copy(), qy[:40].copy(), 1).to_pandas()
        assert (res["dist2"] == 0).all()


class TestImageAHashNearDup:
    def test_ahash_kernel_properties(self):
        """aHash: deterministic, bit p tracks pixel p's gray vs mean,
        planted single-byte perturbation stays within a few bits."""
        from pkd_tree_ray.fixtures import image_pixels
        from pkd_tree_ray.multimodal import ahash64

        px = image_pixels(7)
        h = ahash64(px)
        assert h == ahash64(px.copy())
        gray = px.reshape(-1, 3).astype(np.int64).sum(axis=1)
        bits = gray * 64 > gray.sum()
        for p in (0, 13, 63):
            assert bool((np.uint64(h) >> np.uint64(p)) & np.uint64(1)) == bool(bits[p])
        # planted dup: one byte's high bit flipped -> small hamming
        base = ahash64(image_pixels(14, dup_every=16))
        dup = ahash64(image_pixels(15, dup_every=16))
        ham = bin(np.uint64(base) ^ np.uint64(dup)).count("1")
        assert ham <= 8

    def test_dup_every_zero_is_original(self):
        """dup_every=0 (the default) leaves the fixture byte-identical —
        the existing image oracles depend on it."""
        from pkd_tree_ray.fixtures import image_batch

        a = image_batch(0, 64)
        b = image_batch(0, 64, dup_every=0)
        assert a.equals(b)
        c = image_batch(0, 64, dup_every=16)
        diff = [
            i
            for i in range(64)
            if a["bytes"][i].as_py() != c["bytes"][i].as_py()
        ]
        assert diff == [15, 31, 47, 63]

    def test_planted_pairs_exact(self, ray_session):
        """image_ahash_neardup over a planted-dup corpus finds exactly
        the planted consecutive pairs, no false positives."""
        from pkd_tree_ray.multimodal import image_ahash_neardup

        n = 512
        ds = image_table_dataset(n, parallelism=4, dup_every=16)
        out = image_ahash_neardup(ds, max_hamming=3).to_pandas()
        got = set(zip(out["img_a"], out["img_b"]))
        planted = {(i - 1, i) for i in range(15, n, 16)}
        assert got <= planted
        assert len(got) >= 0.9 * len(planted)
        assert (out["hamming"] <= 3).all()


class TestImageMseNearDup:
    def test_planted_pairs_and_exact_sse(self, ray_session):
        """20 dB keeps the planted high-bit-flip dups (sse = 128^2);
        40 dB (the north-rule invariant) rejects them — the threshold
        is exact integer arithmetic, not a float comparison."""
        from pkd_tree_ray.fixtures import image_table_dataset
        from pkd_tree_ray.multimodal import image_mse_neardup

        n = 320
        imgs = image_table_dataset(n, dup_every=16)
        out = (
            image_mse_neardup(imgs, min_psnr_db=20)
            .to_pandas()
            .sort_values(["img_a", "img_b"])
            .reset_index(drop=True)
        )
        want = [(i - 1, i) for i in range(1, n) if i % 16 == 15]
        assert list(zip(out["img_a"], out["img_b"])) == want
        assert (out["sse"] == 128 * 128).all()
        assert image_mse_neardup(imgs, min_psnr_db=40).count() == 0

    def test_exact_duplicates_pass_40db(self, ray_session):
        """Byte-identical images have sse = 0 and survive ANY PSNR
        threshold (0/0 convention: 'infinite' PSNR)."""
        import ray.data as rd

        from pkd_tree_ray.fixtures import encode_png_rgb, image_pixels
        from pkd_tree_ray.multimodal import image_mse_neardup

        rows = []
        for i in range(40):
            base = i - 1 if i % 8 == 7 and i > 0 else i  # every 8th = copy
            px = image_pixels(base)
            rows.append(
                {
                    "image_id": f"img{i}",
                    "bytes": encode_png_rgb(px),
                    "w": 8,
                    "h": 8,
                    "fmt": "png",
                    "caption": f"c{i}",
                    "phash": 0,
                }
            )
        imgs = rd.from_pandas(__import__("pandas").DataFrame(rows))
        out = (
            image_mse_neardup(imgs, min_psnr_db=40)
            .to_pandas()
            .sort_values(["img_a", "img_b"])
            .reset_index(drop=True)
        )
        want = [(i - 1, i) for i in range(1, 40) if i % 8 == 7]
        assert list(zip(out["img_a"], out["img_b"])) == want
        assert (out["sse"] == 0).all()

    def test_psnr_threshold_must_be_decade(self):
        from pkd_tree_ray.multimodal import image_mse_neardup

        import pytest as _pytest

        with _pytest.raises(ValueError, match="multiple of 10"):
            image_mse_neardup(None, min_psnr_db=35)
