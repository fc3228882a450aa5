"""pkd_tree_ray — a Ray-Data-native spatial-join + tiling engine.

From-scratch re-expression of the capability surface of ucrparlay/Pkd-tree
(SIGMOD'25 parallel kd-tree, see /root/repo/SURVEY.md) as distributed
``ray.data.Dataset`` pipelines over zero-copy Arrow batches:

- two-level spatial index: Morton/quadkey cells as the distributed
  partitioner (the analog of the reference's top-level pivot skeleton,
  ``include/cpdd/batch_op/build_tree.hpp:19-70``) + per-cell in-memory
  kd-trees built inside stateful actor-pool ``map_batches`` stages
  (the analog of the recursive subtree build,
  ``build_tree.hpp:136-274``);
- query suite: kNN (k = 1/10/100), orthogonal range count / report,
  circular range count (``include/cpdd/query_op/``);
- batch insert / delete with hot-cell split (the distributed analog of
  the weight-balance-triggered rebuild,
  ``include/cpdd/batch_op/batch_insert.hpp`` / ``batch_delete.hpp``);
- spatial joins: point-in-polygon, kNN join, raster-tile <-> vector
  assignment;
- large-scale training-data ops over text / embedding / image tables:
  dedup (exact, MinHash-LSH, SimHash), ANN search, text quality /
  language-id / token stats, multimodal decode plumbing.

Nothing here calls ``ray.init``; pipelines run under whatever session
the caller owns (driver, pytest fixture, bench.py).
"""

def _patch_fsspec_http() -> None:
    # aiohttp is not installed in this environment, which makes
    # ``fsspec.implementations.http`` a *failing* import.  Ray Data's path
    # resolution runs that import inside every read task; under threaded
    # Dataset execution two threads can race the failing import and one of
    # them surfaces a plain ImportError that Ray does not catch.  Install a
    # harmless stub module once, up front, so the import always succeeds and
    # ``isinstance(fs, HTTPFileSystem)`` is simply False for local reads.
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except Exception:
        import sys
        import types

        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # pragma: no cover - stub, never instantiated
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


_patch_fsspec_http()

from pkd_tree_ray.config import EngineConfig


def __getattr__(name):
    # lazy re-exports: keep `import pkd_tree_ray` light (no Ray import)
    if name == "PkdIndex":
        from pkd_tree_ray.index import PkdIndex

        return PkdIndex
    if name == "ShardedQueryPool":
        from pkd_tree_ray.shards import ShardedQueryPool

        return ShardedQueryPool
    raise AttributeError(name)


__all__ = ["EngineConfig", "PkdIndex", "ShardedQueryPool"]
__version__ = "0.1.0"
