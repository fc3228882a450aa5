"""Driver-simulation: run every queries() entry and its oracle_sql()
side-by-side on an sf dir, compare row count + column names + an
order-insensitive value hash (columns sorted by name, rows sorted),
mirroring CORRECTNESS_r{N}.json.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")


def normalize(obj) -> "pandas.DataFrame":
    import pandas as pd

    if hasattr(obj, "to_pandas"):
        df = obj.to_pandas()
    elif isinstance(obj, pd.DataFrame):
        df = obj
    else:
        df = pd.DataFrame(obj)
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


def value_hash(df) -> str:
    body = df.to_csv(index=False, float_format="%.9g").encode()
    return hashlib.sha1(body).hexdigest()[:16]


def main() -> int:
    import duckdb

    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for tbl in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = normalize(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:<22} ray error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        ray_sec = time.perf_counter() - t0
        if name not in oracles:
            print(f"OK?   {name:<22} rows={len(got)} (rows-only, no oracle) {ray_sec:.1f}s")
            continue
        try:
            exp = normalize(con.execute(oracles[name]).fetch_arrow_table())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name:<22} oracle error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = []
        if list(got.columns) != list(exp.columns):
            problems.append(f"cols {list(got.columns)} != {list(exp.columns)}")
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if not problems:
            hg, he = value_hash(got), value_hash(exp)
            if hg != he:
                problems.append(f"hash {hg} != {he}")
                diff = got.compare(exp) if got.shape == exp.shape else None
                if diff is not None and len(diff):
                    problems.append(f"first diffs:\n{diff.head(5)}")
        if problems:
            print(f"FAIL  {name:<22} " + "; ".join(str(p) for p in problems))
            n_fail += 1
        else:
            print(f"PASS  {name:<22} rows={len(got)} {ray_sec:.1f}s")
    return n_fail


if __name__ == "__main__":
    rc = main()
    import ray

    ray.shutdown()
    sys.exit(1 if rc else 0)
