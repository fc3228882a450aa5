"""Deterministic vectorized hashing.

All randomness in the engine is derived from row keys through these
hashes — never ``random()`` in a worker — mirroring the reference's
hash-based sampling (``include/cpdd/utility/random_support.hpp:8-18``,
a splitmix-style 64-bit mix) and its seeded query generation
(``tests/testFramework.h:136``).

Two families:

* :func:`splitmix64` — full-quality 64-bit mix, used by the fixture
  generator (phash, pixels, varden cluster assignment).
* :func:`mulhash_coord` — Knuth multiplicative hash reduced mod M.
  Deliberately weaker but expressible as exact BIGINT arithmetic in
  ANSI SQL, so the DuckDB oracle can derive the very same coordinates:
  ``(id * A) % M`` with no intermediate exceeding 2**63.
"""

from __future__ import annotations

import numpy as np

_U = np.uint64

# splitmix64 constants (public domain; Steele et al., "Fast splittable
# pseudorandom number generators").
_SM_GAMMA = _U(0x9E3779B97F4A7C15)
_SM_M1 = _U(0xBF58476D1CE4E5B9)
_SM_M2 = _U(0x94D049BB133111EB)


def splitmix64(x: np.ndarray | int, seed: int = 0) -> np.ndarray:
    """Vectorized splitmix64 of ``x + seed*GAMMA`` -> uint64 array."""
    offset = _U((int(seed) * 0x9E3779B97F4A7C15) % (1 << 64))
    z = np.asarray(x, dtype=np.uint64) + offset
    z = (z + _SM_GAMMA)
    z = (z ^ (z >> _U(30))) * _SM_M1
    z = (z ^ (z >> _U(27))) * _SM_M2
    return z ^ (z >> _U(31))


# SQL-expressible coordinate derivation ---------------------------------
# x = (id * XA) % COORD_MOD ; y = (id * YA) % COORD_MOD.  Exact in both
# numpy int64 and DuckDB BIGINT for id < 2**63 / YA ~ 4.1e9 (far above
# any sandbox scale; the 1e12-scale path derives coords from phash via
# splitmix64 instead).
COORD_MOD = 1_000_001  # coords in [0, 1e6], reference's cube (data_generate.cpp:33-42)
XA = 2_654_435_761  # Knuth's 2**32 * golden ratio
YA = 2_246_822_519  # xxhash PRIME32_2
ZA = 3_266_489_917  # xxhash PRIME32_3 — third axis for d=3 derivations


def mulhash_coord(ids: np.ndarray, mult: int, mod: int = COORD_MOD) -> np.ndarray:
    ids = np.asarray(ids, dtype=np.int64)
    if ids.size and int(ids.max(initial=0)) > (2**62) // mult:
        raise OverflowError("id too large for SQL-exact multiplicative hash")
    return (ids * np.int64(mult)) % np.int64(mod)


def sql_coord_exprs(id_expr: str) -> tuple[str, str]:
    """DuckDB SQL expressions producing the same (x, y) as
    :func:`mulhash_coord` for a BIGINT id expression."""
    return (
        f"(({id_expr}) * {XA}) % {COORD_MOD}",
        f"(({id_expr}) * {YA}) % {COORD_MOD}",
    )


def sql_coord_exprs_3d(id_expr: str) -> tuple[str, str, str]:
    """Same for (x, y, z) — the d=3 derivation (the reference's kNN /
    build baselines are d=3, ``script/data/build.csv``)."""
    x, y = sql_coord_exprs(id_expr)
    return (x, y, f"(({id_expr}) * {ZA}) % {COORD_MOD}")


# SQL-expressible splitmix64 ---------------------------------------------
# DuckDB lacks wrapping 64-bit arithmetic (BIGINT/UBIGINT ops error on
# overflow), so the mix is carried in HUGEINT (int128): multiplication
# mod 2**64 splits the multiplicand into 32-bit halves (each partial
# product < 2**96, well inside int128), xor-shift stages round-trip
# through UBIGINT where xor is defined.  Bit-exact vs :func:`splitmix64`
# (validated for i up to 6e6 in tests/test_window_image.py).

_SQL_M = 1 << 64


def _sql_mulmod64(z: str, c: int) -> str:
    """HUGEINT expr for ``(z * c) mod 2**64`` (z in [0, 2**64), c < 2**64)."""
    return (
        f"(((({z}) % 4294967296) * {c} + "
        f"(((({z}) // 4294967296) * {c}) % 4294967296) * 4294967296) % {_SQL_M})"
    )


def _sql_xorshift(z: str, n: int) -> str:
    """HUGEINT expr for ``z ^ (z >> n)`` on a uint64 value."""
    return (
        f"CAST(xor(CAST(({z}) AS UBIGINT), "
        f"CAST((({z}) // {1 << n}) AS UBIGINT)) AS HUGEINT)"
    )


def sql_splitmix64(x_expr: str, seed: int = 0) -> str:
    """DuckDB HUGEINT expression computing ``splitmix64(x_expr, seed)``
    bit-exactly (result in [0, 2**64); wrap in CAST(... AS UBIGINT) to
    fetch).  ``x_expr`` must be a non-negative BIGINT expression."""
    off = (int(seed) * 0x9E3779B97F4A7C15 + 0x9E3779B97F4A7C15) % _SQL_M
    z = f"((CAST(({x_expr}) AS HUGEINT) + {off}) % {_SQL_M})"
    z = _sql_mulmod64(_sql_xorshift(z, 30), int(_SM_M1))
    z = _sql_mulmod64(_sql_xorshift(z, 27), int(_SM_M2))
    return _sql_xorshift(z, 31)


def sql_mulmod64_vars(z: str, a: str) -> str:
    """HUGEINT expr for ``(z * a) mod 2**64`` where BOTH operands are
    HUGEINT expressions in [0, 2**64) (the constant-multiplier form is
    :func:`_sql_mulmod64`).  Splits ``z`` into 32-bit halves so every
    partial product stays below 2**96."""
    zh = f"CAST(({z}) AS HUGEINT)"
    ah = f"CAST(({a}) AS HUGEINT)"
    return (
        f"((({zh} % 4294967296) * {ah} + "
        f"((({zh} // 4294967296) * {ah}) % 4294967296) * 4294967296) % {_SQL_M})"
    )


def sql_xor64(a: str, b: str) -> str:
    """HUGEINT expr for ``a ^ b`` over two uint64-valued expressions
    (xor is only defined on UBIGINT in DuckDB)."""
    return (
        f"CAST(xor(CAST(({a}) AS UBIGINT), CAST(({b}) AS UBIGINT)) AS HUGEINT)"
    )


def sql_u64_to_i64(v: str) -> str:
    """BIGINT expr reinterpreting a HUGEINT uint64 value as a SIGNED
    64-bit integer (numpy's ``.view(np.int64)``)."""
    return (
        f"CAST(CASE WHEN ({v}) >= {1 << 63} THEN ({v}) - {_SQL_M} "
        f"ELSE ({v}) END AS BIGINT)"
    )


# SQL-expressible token hashing --------------------------------------------
# The text operators (fingerprints / simhash / MinHash-LSH) hash TOKENS.
# pandas' hash_array (siphash) is not SQL-reproducible, so token identity
# uses a codepoint polynomial fold finalised by splitmix64:
#
#     poly(t) = fold_{c in codepoints(t)} acc -> (acc * POLY_P + c) mod 2**64
#     token_hash(t, seed) = splitmix64(poly(t), seed)
#
# The fold is exact in DuckDB (HUGEINT carry + the 32-bit-half multiply);
# the splitmix64 finaliser restores full 64-bit mixing quality on top of
# the weak-but-exact polynomial.

POLY_P = 0x9E3779B97F4A7C15  # splitmix64 increment (public domain), odd
_POLY_P_U = _U(POLY_P)


def poly64(tokens) -> np.ndarray:
    """Vectorized codepoint polynomial fold of a string sequence ->
    uint64 array.  The input is dictionary-encoded first (natural text
    is Zipfian — a batch's distinct-token count is far below its token
    count), then the distinct tokens take a zero-copy Arrow-buffer
    ASCII path (bytes == codepoints); any non-ASCII token falls back
    to an exact per-token UTF-32 decode of the same codepoint fold."""
    import pyarrow as pa

    if isinstance(tokens, (pa.Array, pa.ChunkedArray)):
        arr = tokens.combine_chunks() if isinstance(tokens, pa.ChunkedArray) else tokens
        arr = arr.cast(pa.string())
    elif isinstance(tokens, np.ndarray) and tokens.dtype == object:
        arr = pa.array(tokens, type=pa.string())
    else:
        arr = pa.array(list(tokens), type=pa.string())
    if len(arr) == 0:
        return np.zeros(0, dtype=np.uint64)
    if arr.null_count:
        arr = arr.fill_null("")
    enc = arr.dictionary_encode()
    hu = _poly64_flat(enc.dictionary)
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return hu[idx]


def _poly64_flat(arr) -> np.ndarray:
    """The fold kernel over a null-free Arrow StringArray."""
    n = len(arr)
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset: arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lo, hi = int(off[0]), int(off[-1])
    flat = data[lo:hi]
    if flat.size and int(flat.max()) >= 128:
        return _poly64_codepoints_slow(arr)
    starts = off[:-1] - lo
    ends = off[1:] - lo
    lens = ends - starts
    maxlen = int(lens.max(initial=0))
    pw = np.ones(max(maxlen, 1), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(1, maxlen):
            pw[i] = pw[i - 1] * _POLY_P_U
        exp = (np.repeat(ends, lens) - 1) - np.arange(hi - lo, dtype=np.int64)
        terms = flat.astype(np.uint64) * pw[exp]
        csum = np.zeros(flat.size + 1, dtype=np.uint64)
        np.cumsum(terms, out=csum[1:])
        return csum[ends] - csum[starts]  # wraparound subtraction == mod 2**64


def _poly64_codepoints_slow(arr) -> np.ndarray:
    out = np.zeros(len(arr), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, tok in enumerate(arr.to_pylist()):
            if not tok:
                continue
            cps = np.frombuffer(tok.encode("utf-32-le"), dtype="<u4").astype(np.uint64)
            h = _U(0)
            for c in cps:
                h = h * _POLY_P_U + c
            out[i] = h
    return out


def token_hash64(tokens, seed: int = 0) -> np.ndarray:
    """SQL-reproducible 64-bit token hash: splitmix64(poly64(t), seed)."""
    return splitmix64(poly64(tokens), seed)


def sql_isqrt(v: str) -> str:
    """HUGEINT expr for ``math.isqrt(v)`` (floor integer square root of
    a non-negative HUGEINT expression): float sqrt seeds the answer,
    a +-1 correction removes the float rounding (for v < 2**90 the
    double-precision seed is within 1 of the true root)."""
    m = f"CAST(floor(sqrt(CAST(({v}) AS DOUBLE))) AS HUGEINT)"
    return (
        f"(CASE WHEN ({m} + 1) * ({m} + 1) <= ({v}) THEN {m} + 1 "
        f"WHEN {m} * {m} > ({v}) THEN {m} - 1 ELSE {m} END)"
    )


def sql_poly64(tok_expr: str) -> str:
    """DuckDB HUGEINT expression computing :func:`poly64` of a VARCHAR
    expression bit-exactly (list_reduce codepoint fold)."""
    fold = _sql_mulmod64("acc", POLY_P)
    return (
        f"list_reduce(list_prepend(CAST(0 AS HUGEINT), "
        f"list_transform(range(1, length({tok_expr}) + 1), "
        f"i -> CAST(unicode(substr({tok_expr}, CAST(i AS INTEGER), 1)) AS HUGEINT))), "
        f"(acc, c) -> ({fold} + c) % {_SQL_M})"
    )


def sql_token_hash64(tok_expr: str, seed: int = 0) -> str:
    """DuckDB expr for :func:`token_hash64` (HUGEINT in [0, 2**64))."""
    return sql_splitmix64(sql_poly64(tok_expr), seed)


def sql_phash_xy(h_expr: str) -> tuple[str, str]:
    """SQL (x, y) exprs matching :func:`pkd_tree_ray.fixtures.phash_to_xy`
    for a HUGEINT uint64-valued hash expression: low 32 bits mod
    COORD_MOD for x, high 32 bits mod COORD_MOD for y."""
    return (
        f"CAST((({h_expr}) % 4294967296) % {COORD_MOD} AS BIGINT)",
        f"CAST((({h_expr}) // 4294967296) % {COORD_MOD} AS BIGINT)",
    )
