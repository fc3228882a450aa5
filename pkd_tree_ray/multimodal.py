"""Multimodal column stages: image/audio/video as opaque ``binary``
columns with typed metadata (the Lance-style table of
BASELINE.json ``input_hint``).

The Ray-side plumbing — schema, batch sizing, actor signature, output
layout — is real and tested; the PNG path decodes for real via the
stdlib codec in :mod:`pkd_tree_ray.fixtures`.  Codecs this container
lacks (JPEG/WebP/audio/video) are STUBBED behind
``NotImplementedError`` with the dispatch structure in place.

Batch-size discipline: rows carry multi-KB..MB payloads, so these
stages run with SMALL batch sizes (``MM_BATCH``) and actor pools —
setup (codec tables) once per actor, decode per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pkd_tree_ray.fixtures import decode_png_rgb, encode_png_rgb

MM_BATCH = 256  # payload rows per batch: keep batch x pool in worker heap


def _mm_stage(images_ds, cls, ctor_args, concurrency):
    """Attach a payload kernel to the image Dataset.  Default
    (``concurrency=None``): STATELESS TASKS with a per-worker instance
    cache (``text.worker_cached``) — codec tables are trivial state,
    and stateless tasks ride the warm worker pool at full cluster
    width with no actor spin-up (a hard (1, 8) actor cap left 3/4 of
    a 32-CPU node idle; autoscaling pools paid ~2-3 s of ramp on
    short jobs).  An explicit ``concurrency`` tuple still runs a real
    actor pool for memory-constrained deployments."""
    from pkd_tree_ray.text import worker_cached

    if concurrency is None:
        return images_ds.map_batches(
            worker_cached(cls, *ctor_args),
            batch_format="pyarrow",
            batch_size=MM_BATCH,
        )
    return images_ds.map_batches(
        cls,
        fn_constructor_args=ctor_args,
        batch_format="pyarrow",
        batch_size=MM_BATCH,
        concurrency=concurrency,
    )


class DecodeImage:
    """Actor: bytes -> decoded pixel stats (+ optionally pixels).

    Output: (image_id, w, h, mean_r, mean_g, mean_b) — a feature
    extraction; decoding real formats other than PNG raises
    NotImplementedError (no imaging libs in this container).
    """

    def __init__(self, emit_pixels: bool = False):
        self.emit_pixels = emit_pixels
        self.decoders = {"png": decode_png_rgb}

    def decode(self, data: bytes, fmt: str) -> np.ndarray:
        dec = self.decoders.get(fmt)
        if dec is None:
            raise NotImplementedError(
                f"decoder for format {fmt!r} not available in this environment"
            )
        return dec(data)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs = [], [], []
        means = []
        pixels = []
        for i in range(batch.num_rows):
            px = self.decode(
                batch["bytes"][i].as_py(), batch["fmt"][i].as_py()
            )
            ids.append(batch["image_id"][i].as_py())
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            means.append(px.reshape(-1, 3).mean(axis=0))
            if self.emit_pixels:
                pixels.append(px.tobytes())
        mean_arr = np.stack(means) if means else np.zeros((0, 3))
        cols = {
            "image_id": pa.array(ids, pa.string()),
            "w": pa.array(np.array(ws, dtype=np.int32)),
            "h": pa.array(np.array(hs, dtype=np.int32)),
            "mean_r": pa.array(mean_arr[:, 0], pa.float64()),
            "mean_g": pa.array(mean_arr[:, 1], pa.float64()),
            "mean_b": pa.array(mean_arr[:, 2], pa.float64()),
        }
        if self.emit_pixels:
            cols["pixels"] = pa.array(pixels, pa.binary())
        return pa.table(cols)


def ahash64(px: np.ndarray) -> int:
    """64-bit average-hash of an (h, w, 3) uint8 image with h*w == 64
    pixels: bit p (LSB order, row-major pixel p) is set iff pixel p's
    gray value exceeds the image mean.  Integer-exact — the comparison
    is ``gray_p * 64 > sum(gray)``, no float division — so DuckDB
    re-derives it bit-for-bit from the generator stream."""
    gray = px.reshape(-1, 3).astype(np.int64).sum(axis=1)
    n = gray.shape[0]
    bits = gray * n > gray.sum()
    weights = np.left_shift(np.uint64(1), np.arange(n, dtype=np.uint64))
    h = np.bitwise_or.reduce(np.where(bits, weights, np.uint64(0)))
    return int(np.asarray([h], dtype=np.uint64).view(np.int64)[0])


class ImageAHash:
    """Actor: PNG bytes -> (img_id:int64, ahash:int64).

    The perceptual-hash stage of the image near-dup pipeline: decode
    (real PNG via the stdlib codec), 8x8 grayscale average-hash.  The
    numeric id is parsed from the ``imgNNN`` image_id once per batch
    with Arrow kernels; decoding is necessarily per-row (PNG framing),
    the hash kernel is numpy.
    """

    def __init__(self) -> None:
        self.decoders = {"png": decode_png_rgb}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 3, 99), pa.int64()
        )
        hashes = np.empty(batch.num_rows, dtype=np.int64)
        fmts = batch["fmt"].to_pylist()
        data = batch["bytes"].to_pylist()
        for i in range(batch.num_rows):
            dec = self.decoders.get(fmts[i])
            if dec is None:
                raise NotImplementedError(
                    f"decoder for format {fmts[i]!r} not available"
                )
            hashes[i] = ahash64(dec(data[i]))
        return pa.table({"img_id": ids, "ahash": pa.array(hashes, pa.int64())})


def image_ahashes(images_ds, concurrency=None):
    """images table -> (img_id, ahash) rows (actor pool, small batches
    for the binary payload column)."""
    return _mm_stage(images_ds, ImageAHash, (), concurrency)


def image_ahash_neardup(
    images_ds, max_hamming: int = 3, cap: int = 64, concurrency=None
):
    """-> Dataset (img_a, img_b, hamming): image pairs whose 64-bit
    average-hash differs in at most ``max_hamming`` bits.

    The image arm of the near-duplicate suite: actor-pool decode +
    aHash (this module) feeding the SAME pigeonhole block-LSH +
    distributed exact-Hamming verify as the text SimHash path
    (:func:`pkd_tree_ray.text.hamming64_neardup_sigs`) — signatures are
    the only materialized table (16 B/image), payload bytes never
    transit a shuffle."""
    from pkd_tree_ray.text import coalesce_sigs, hamming64_neardup_sigs

    sigs = coalesce_sigs(
        image_ahashes(images_ds, concurrency=concurrency).materialize()
    )
    return hamming64_neardup_sigs(
        sigs,
        id_col="img_id",
        hash_col="ahash",
        a_col="img_a",
        b_col="img_b",
        max_hamming=max_hamming,
        cap=cap,
    )


class ResizeImage:
    """Actor: nearest-neighbor resize, re-encoded as PNG.  Output keeps
    the input schema (image_id, bytes, w, h, fmt, caption, phash)."""

    def __init__(self, out_w: int, out_h: int):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_bytes = []
        for i in range(batch.num_rows):
            fmt = batch["fmt"][i].as_py()
            if fmt != "png":
                raise NotImplementedError(f"resize for format {fmt!r}")
            px = decode_png_rgb(batch["bytes"][i].as_py())
            h, w, _ = px.shape
            yi = (np.arange(self.out_h) * h) // self.out_h
            xi = (np.arange(self.out_w) * w) // self.out_w
            out = px[yi][:, xi]
            out_bytes.append(encode_png_rgb(out))
        n = batch.num_rows
        return pa.table(
            {
                "image_id": batch["image_id"],
                "bytes": pa.array(out_bytes, pa.binary()),
                "w": pa.array(np.full(n, self.out_w, dtype=np.int32)),
                "h": pa.array(np.full(n, self.out_h, dtype=np.int32)),
                "fmt": batch["fmt"],
                "caption": batch["caption"],
                "phash": batch["phash"],
            }
        )


class SampleFrames:
    """Actor STUB: video bytes -> frame sample.  The container has no
    video codec; the stage signature, batch sizing and output schema
    are the real plumbing."""

    def __init__(self, every_n: int = 30):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "video frame sampling requires a codec not present in this environment"
        )


def decode_features(images_ds, concurrency=None):
    """images table -> per-image decoded feature rows (actor pool,
    small batches for wide payload rows)."""
    return _mm_stage(images_ds, DecodeImage, (), concurrency)


def resize_images(images_ds, out_w: int, out_h: int, concurrency=None):
    return _mm_stage(images_ds, ResizeImage, (out_w, out_h), concurrency)


class ImageAHashPixels:
    """Actor: PNG bytes -> (img_id:int64, ahash:int64, px:list<int64>).

    ONE decode per image feeds BOTH the LSH blocking signature and the
    exact pixel payload (the flat RGB byte stream) — the pixel-exact
    near-dup pipeline never decodes twice."""

    def __init__(self) -> None:
        self.decoders = {"png": decode_png_rgb}

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], 3, 99), pa.int64()
        )
        n = batch.num_rows
        hashes = np.empty(n, dtype=np.int64)
        flats = []
        fmts = batch["fmt"].to_pylist()
        data = batch["bytes"].to_pylist()
        for i in range(n):
            dec = self.decoders.get(fmts[i])
            if dec is None:
                raise NotImplementedError(
                    f"decoder for format {fmts[i]!r} not available"
                )
            px = dec(data[i])
            hashes[i] = ahash64(px)
            flats.append(px.reshape(-1).astype(np.int64))
        if flats:
            vals = np.concatenate(flats)
            offs = np.zeros(n + 1, dtype=np.int32)
            np.cumsum([len(f) for f in flats], out=offs[1:])
        else:
            vals = np.zeros(0, np.int64)
            offs = np.zeros(1, np.int32)
        return pa.table(
            {
                "img_id": ids,
                "ahash": pa.array(hashes, pa.int64()),
                "px": pa.ListArray.from_arrays(pa.array(offs), pa.array(vals)),
            }
        )


def image_mse_neardup(
    images_ds, min_psnr_db: int = 40, cap: int = 64, concurrency=None
):
    """-> Dataset (img_a, img_b, sse): image pairs whose decoded pixels
    match at PSNR >= ``min_psnr_db``, verified on the EXACT integer
    sum-of-squared-errors — the north-rule per-row invariant
    (decoded-pixel PSNR) promoted to a first-class dedup operator.

    PSNR >= p dB  <=>  sse * 10^(p/10) <= 255^2 * n_values, which is
    pure int64 arithmetic when p is a multiple of 10 (enforced) — so
    the whole pipeline, pixels included, oracles bit-exactly in SQL
    over the generated corpus.

    100-TB shape: one actor-pool decode emits (ahash, flat byte
    payload) per image; blocking is the SAME pigeonhole 16-bit aHash
    block-LSH as :func:`image_ahash_neardup` (recall contract: a
    qualifying pair must share at least one aHash block — pixel-near
    images do, asserted on planted duplicates in pytest); the capped
    candidate pairs then take ONE groupby payload-attach + a
    vectorized SSE kernel (`np.add.reduceat` over the flat diffs).
    Full images transit the exchange only for candidate pairs, never
    for the corpus at large.
    """
    if int(min_psnr_db) != min_psnr_db or int(min_psnr_db) % 10:
        raise ValueError(
            "min_psnr_db must be a multiple of 10 for the integer-exact threshold"
        )
    scale = 10 ** (int(min_psnr_db) // 10)

    from pkd_tree_ray.pairjoin import list_flat, pairwise_join_verify
    from pkd_tree_ray.text import coalesce_sigs, hamming64_candidates

    tbl = coalesce_sigs(
        _mm_stage(images_ds, ImageAHashPixels, (), concurrency).materialize(),
        rows_per_block=100_000,  # ~1.6 KB/row with the pixel payload
    )
    sigs = tbl.select_columns(["img_id", "ahash"])
    cand = hamming64_candidates(sigs, "img_id", "ahash", "img_a", "img_b", cap)
    payload = tbl.select_columns(["img_id", "px"])

    def verify_fn(a: np.ndarray, b: np.ndarray):
        if len(a) != len(b):
            return None  # PSNR undefined across differing dimensions
        d = a.astype(np.int64) - b.astype(np.int64)
        sse = int((d * d).sum())
        return sse if sse * scale <= 65025 * len(a) else None

    def verify_batch_fn(col_a, col_b):
        # list_flat -> (flat values, owner row index per value)
        va, ia = list_flat(col_a)
        vb, ib = list_flat(col_b)
        n = len(col_a)
        vals = np.zeros(n, np.int64)
        keep = np.zeros(n, bool)
        if len(va) == len(vb) and np.array_equal(ia, ib):
            d = va.astype(np.int64) - vb.astype(np.int64)
            np.add.at(vals, ia, d * d)
            widths = np.bincount(ia, minlength=n).astype(np.int64)
            keep[:] = (widths > 0) & (vals * scale <= 65025 * widths)
        else:  # mixed image sizes in one batch: the scalar path
            for i in range(n):
                v = verify_fn(
                    np.asarray(col_a[i].as_py()), np.asarray(col_b[i].as_py())
                )
                if v is not None:
                    vals[i] = v
                    keep[i] = True
        return vals, keep

    return pairwise_join_verify(
        payload,
        cand,
        "img_id",
        "img_a",
        "img_b",
        "px",
        pa.int64(),
        verify_fn,
        "sse",
        verify_batch_fn=verify_batch_fn,
    )
