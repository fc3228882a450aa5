"""Deterministic synthetic fixtures.

Generates the Lance-style image+caption table from
``BASELINE.json.input_hint`` — columns ``(image_id:string, bytes:binary,
w:int32, h:int32, fmt:string, caption:string, phash:int64)`` — plus the
query workloads the reference's harness generates:

* uniform points in the integer cube [0, 1e6]^2, the reference
  generator (``tests/data_generate.cpp:30-64``,
  ``tests/testFramework.h:966-989``);
* "varden"-style clustered skew (``script/gen_ss_varden.sh``) — hash
  -assigned Gaussian-ish clusters for hot-cell exercise;
* known-cardinality query rectangles via seeded recursive splitting,
  whose true result size is recorded at generation
  (``tests/testFramework.h:47-149``; size brackets small/medium/large
  = [0, n^1/4), [n^1/4, n^1/2), [n^1/2, n), ``README.md:166-171``);
* point-pair boxes ``bbox(p_i, p_{(i+n/2) mod n})``
  (``tests/testFramework.h:539``).

Everything derives from ``splitmix64(seed, i)`` — byte-identical for a
given (seed, n).  Image payloads are tiny real PNGs (stdlib zlib) so
the PSNR/caption per-row invariant is checkable without external
imaging libraries.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

from pkd_tree_ray.hashing import splitmix64

COORD_RANGE = 1_000_001  # coords in [0, 1e6] inclusive


# --- tiny deterministic PNG codec (stdlib only) -------------------------

def encode_png_rgb(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a minimal valid PNG."""
    h, w, _ = pixels.shape
    raw = b"".join(b"\x00" + pixels[r].tobytes() for r in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def decode_png_rgb(data: bytes) -> np.ndarray:
    """Decode a PNG produced by :func:`encode_png_rgb` (filter 0 only)."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos: pos + 4])
        tag = data[pos + 4: pos + 8]
        body = data[pos + 8: pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", body[:10])
            assert bit_depth == 8 and color_type == 2, "only 8-bit RGB supported"
        elif tag == b"IDAT":
            idat += body
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    rows = []
    for r in range(h):
        line = raw[r * stride: (r + 1) * stride]
        assert line[0] == 0, "only filter type 0 supported"
        rows.append(np.frombuffer(line[1:], dtype=np.uint8).reshape(w, 3))
    return np.stack(rows)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


# --- coordinates --------------------------------------------------------

def phash_to_xy(phash: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Geotag: derive int64 coords in [0, 1e6] from the phash column.

    This is the scale path (works at any row count); the oracle-checked
    pipelines use the SQL-exact :func:`pkd_tree_ray.hashing.mulhash_coord`
    instead.
    """
    h = np.asarray(phash).astype(np.int64).view(np.uint64)
    x = (h & np.uint64(0xFFFFFFFF)) % np.uint64(COORD_RANGE)
    y = ((h >> np.uint64(32)) & np.uint64(0xFFFFFFFF)) % np.uint64(COORD_RANGE)
    return x.astype(np.int64), y.astype(np.int64)


def uniform_xy(i: np.ndarray, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    return phash_to_xy(splitmix64(i, seed).view(np.int64))


N_CLUSTERS = 10
CLUSTER_SPREAD = 5_000  # half-width of a cluster in coord units


def varden_xy(i: np.ndarray, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Clustered skew: hash-assigned cluster center + narrow offset
    (analog of the varden generator, ``script/gen_ss_varden.sh:26-54``)."""
    i = np.asarray(i, dtype=np.uint64)
    h = splitmix64(i, seed)
    c = (h % np.uint64(N_CLUSTERS)).astype(np.int64)
    ch = splitmix64(c.view(np.uint64), seed + 1)
    cx = (ch & np.uint64(0xFFFFFFFF)) % np.uint64(COORD_RANGE)
    cy = ((ch >> np.uint64(32)) & np.uint64(0xFFFFFFFF)) % np.uint64(COORD_RANGE)
    oh = splitmix64(i, seed + 2)
    ox = (oh & np.uint64(0xFFFFFFFF)) % np.uint64(2 * CLUSTER_SPREAD + 1)
    oy = ((oh >> np.uint64(32)) & np.uint64(0xFFFFFFFF)) % np.uint64(2 * CLUSTER_SPREAD + 1)
    x = np.clip(cx.astype(np.int64) + ox.astype(np.int64) - CLUSTER_SPREAD, 0, COORD_RANGE - 1)
    y = np.clip(cy.astype(np.int64) + oy.astype(np.int64) - CLUSTER_SPREAD, 0, COORD_RANGE - 1)
    return x, y


# --- the image table ----------------------------------------------------

IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def image_pixels(
    i: int, seed: int = 42, w: int = 8, h: int = 8, dup_every: int = 0
) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pixels for row i.

    ``dup_every > 0`` plants NEAR-DUPLICATES: every row with
    ``i % dup_every == dup_every - 1`` (i > 0) reuses row ``i-1``'s
    pixel stream with ONE byte perturbed (position
    ``splitmix64(i, seed+13) % (w*h*3)``, high bit flipped) — a
    deterministic corpus for the perceptual-hash near-dup operator
    that DuckDB can re-derive bit-exactly.  ``dup_every = 0`` (the
    default) is byte-identical to the original generator.
    """
    base = i
    dup = dup_every > 0 and i > 0 and i % dup_every == dup_every - 1
    if dup:
        base = i - 1
    nbytes = w * h * 3
    words = splitmix64(
        np.arange(base * 1000, base * 1000 + (nbytes + 7) // 8, dtype=np.uint64),
        seed + 7,
    )
    flat = words.view(np.uint8)[:nbytes].copy()
    if dup:
        # int() BEFORE the modulo: np.uint64 % python-int promotes to
        # float64 and silently loses low bits
        q = int(splitmix64(np.array([i], dtype=np.uint64), seed + 13)[0]) % nbytes
        flat[q] ^= 0x80
    return flat.reshape(h, w, 3)


def image_batch(
    start: int, n: int, seed: int = 42, w: int = 8, h: int = 8, dup_every: int = 0
) -> pa.Table:
    """Rows [start, start+n) of the synthetic image table."""
    idx = np.arange(start, start + n, dtype=np.uint64)
    phash = splitmix64(idx, seed).view(np.int64)
    caption_salt = (phash.view(np.uint64) % np.uint64(997)).astype(np.int64)
    return pa.table(
        {
            "image_id": pa.array([f"img{i:012d}" for i in range(start, start + n)], pa.string()),
            "bytes": pa.array(
                [
                    encode_png_rgb(image_pixels(i, seed, w, h, dup_every))
                    for i in range(start, start + n)
                ],
                pa.binary(),
            ),
            "w": pa.array(np.full(n, w, dtype=np.int32)),
            "h": pa.array(np.full(n, h, dtype=np.int32)),
            "fmt": pa.array(["png"] * n, pa.string()),
            "caption": pa.array(
                [f"caption {i} {s}" for i, s in zip(range(start, start + n), caption_salt)],
                pa.string(),
            ),
            "phash": pa.array(phash, pa.int64()),
        },
        schema=IMAGE_SCHEMA,
    )


def image_table_dataset(
    n: int, seed: int = 42, parallelism: int = 8, dup_every: int = 0
):
    """The image table as a lazily-generated ray.data.Dataset —
    ``ray.data.range(n)`` fanned through a batch generator, so no
    driver-side materialization (the 1e12-scale generation path)."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        return image_batch(int(ids[0]), len(ids), seed, dup_every=dup_every)

    return (
        rd.range(n, override_num_blocks=parallelism)
        .map_batches(gen, batch_format="pyarrow", batch_size=max(1, n // parallelism))
    )


def write_image_table(path: str, n: int, seed: int = 42, rows_per_file: int = 100_000) -> None:
    """Write the fixture table as Parquet part files (driver-side; used
    for test/bench inputs only)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    part = 0
    for start in range(0, n, rows_per_file):
        cnt = min(rows_per_file, n - start)
        pq.write_table(image_batch(start, cnt, seed), f"{path}/part-{part:05d}.parquet")
        part += 1


# --- query workloads ----------------------------------------------------

def point_pair_boxes(x: np.ndarray, y: np.ndarray, n_queries: int) -> np.ndarray:
    """(m, 4) boxes spanned by point pairs (p_i, p_{(i+n/2) mod n}) —
    ``tests/testFramework.h:539``."""
    n = len(x)
    i = np.arange(n_queries, dtype=np.int64) % n
    j = (i + n // 2) % n
    return np.stack(
        [
            np.minimum(x[i], x[j]),
            np.minimum(y[i], y[j]),
            np.maximum(x[i], x[j]),
            np.maximum(y[i], y[j]),
        ],
        axis=1,
    )


def known_cardinality_boxes(
    x: np.ndarray, y: np.ndarray, n_queries: int, bracket: str = "medium", seed: int = 10
) -> tuple[np.ndarray, np.ndarray]:
    """Seeded recursive splitting producing boxes whose true hit count
    is recorded by construction (``tests/testFramework.h:47-149``,
    seeded srand(10) at line 136).

    bracket: 'small' -> [1, n^1/4), 'medium' -> [n^1/4, n^1/2),
    'large' -> [n^1/2, n].  Returns (boxes (m,4), expected_counts (m,)).
    """
    n = len(x)
    lo_hi = {
        "small": (1, max(2, int(n**0.25))),
        "medium": (max(1, int(n**0.25)), max(2, int(n**0.5))),
        "large": (max(1, int(n**0.5)), n + 1),
    }[bracket]
    rng = np.random.RandomState(seed)
    boxes = []
    counts = []
    # recursive splitting: start from the full extent; randomly halve
    # the point set along the wider dimension until the count falls in
    # the bracket; the box is the bbox of the surviving points.
    while len(boxes) < n_queries:
        sel = np.arange(n)
        guard = 0
        while len(sel) >= lo_hi[1] and guard < 64:
            sx, sy = x[sel], y[sel]
            if sx.max() - sx.min() >= sy.max() - sy.min():
                c = sx
            else:
                c = sy
            pivot = np.percentile(c, 25 + 50 * rng.rand())
            keep = c <= pivot if rng.rand() < 0.5 else c > pivot
            if keep.sum() == 0 or keep.sum() == len(sel):
                guard += 1
                continue
            sel = sel[keep]
            guard += 1
        if lo_hi[0] <= len(sel) < lo_hi[1] or (bracket == "large" and len(sel) >= lo_hi[0]):
            sx, sy = x[sel], y[sel]
            box = np.array([sx.min(), sy.min(), sx.max(), sy.max()], dtype=np.int64)
            # expected count = ALL points in the box (not just survivors)
            m = (x >= box[0]) & (x <= box[2]) & (y >= box[1]) & (y <= box[3])
            boxes.append(box)
            counts.append(int(m.sum()))
    return np.stack(boxes), np.array(counts, dtype=np.int64)


def self_query_sample(
    x: np.ndarray, y: np.ndarray, ratio: float = 0.01, seed: int = 42, max_queries: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """1% self-query sample (batchQueryRatio=0.01,
    ``tests/testFramework.h:24``) — hash-selected, deterministic."""
    n = len(x)
    m = max(1, int(n * ratio))
    if max_queries:
        m = min(m, max_queries)
    idx = (splitmix64(np.arange(m, dtype=np.uint64), seed + 5) % np.uint64(n)).astype(np.int64)
    return x[idx], y[idx]


def amplified_documents(sf_dir: str, rep: int, neardup_every: int = 100):
    """``documents.parquet`` amplified ``rep``x into UNIQUE documents
    (the text analog of :func:`~pkd_tree_ray.sources.lineitem_points_amplified`):
    replica ``j > 0`` deterministically permutes the base doc's word
    order (argsort of splitmix64 keyed by (doc, j, word position)),
    which rewrites its n-gram shingle set — replicas are NOT
    near-duplicates of each other or of the base.  Every
    ``neardup_every``-th base doc's replica 1 instead appends one
    token to the base text: a planted near-dup pair per cluster, so a
    near-dup pipeline over the amplified corpus has known signal.

    ``doc_id' = doc_id * rep + j`` (disjoint, reversible).  Returns a
    Ray Dataset with the base table's columns."""
    from pkd_tree_ray.sources import read_parquet_clean

    base = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )

    def amplify(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        srcs = batch["source"].to_pylist()
        out_id, out_tx, out_lg, out_sc = [], [], [], []
        for i, t in enumerate(texts):
            words = t.split()
            nw = len(words)
            warr = np.array(words, dtype=object)
            for j in range(rep):
                did = int(ids[i]) * rep + j
                if j == 0:
                    tx = t
                elif j == 1 and int(ids[i]) % neardup_every == 0:
                    tx = t + " pkdnear"  # planted near-dup of replica 0
                else:
                    keys = splitmix64(
                        np.arange(nw, dtype=np.uint64), seed=did & 0x7FFFFFFF
                    )
                    tx = " ".join(warr[np.argsort(keys)])
                out_id.append(did)
                out_tx.append(tx)
                out_lg.append(langs[i])
                out_sc.append(srcs[i])
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "text": pa.array(out_tx, pa.string()),
                "lang": pa.array(out_lg, pa.string()),
                "source": pa.array(out_sc, pa.string()),
            }
        )

    return base.map_batches(amplify, batch_format="pyarrow", batch_size=256)


def amplified_embeddings(sf_dir: str, rep: int, noise: float = 0.05):
    """``embeddings.parquet`` amplified ``rep``x: replica ``j`` adds
    deterministic splitmix64 uniform noise (``+- noise``) per
    coordinate, so replicas are distinct vectors clustered around
    their base — a realistic ANN corpus shape (near-neighbor structure
    survives, exact duplicates don't).  ``vec_id' = vec_id * rep + j``."""
    from pkd_tree_ray.sources import read_parquet_clean

    base = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )

    def amplify(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        emb = np.stack(
            [np.asarray(v, dtype=np.float32) for v in batch["embedding"].to_pylist()]
        )
        lab = batch["label"].to_numpy()
        n, d = emb.shape
        out = []
        for j in range(rep):
            did = ids * rep + j
            if j == 0:
                pert = emb
            else:
                du = did.astype(np.uint64)
                flat = splitmix64(
                    (du[:, None] * np.uint64(d) + np.arange(d, dtype=np.uint64)).ravel(),
                    seed=j,
                )
                u = flat.astype(np.float64) / float(2**64) - 0.5
                pert = emb + (2.0 * noise * u.reshape(n, d)).astype(np.float32)
            out.append(
                pa.table(
                    {
                        "vec_id": pa.array(did, pa.int64()),
                        "embedding": pa.array(list(pert), pa.list_(pa.float32())),
                        "label": pa.array(lab, pa.int32()),
                    }
                )
            )
        return pa.concat_tables(out)

    return base.map_batches(amplify, batch_format="pyarrow", batch_size=512)
