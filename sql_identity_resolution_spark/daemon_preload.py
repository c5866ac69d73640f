"""PySpark worker daemon with heavy imports preloaded before the fork.

Set ``spark.python.daemon.module=sql_identity_resolution_spark.daemon_preload``
and every forked python worker inherits warm numpy/pandas/pyarrow imports via
copy-on-write instead of re-importing them per process (~4.3 CPU-seconds per
worker on this box; x n_cores workers spawned by the first pandas-UDF action).

``pyspark.daemon`` resolves the worker entrypoint from ``sys.argv[1]`` at
import time; running this module via ``python -m`` preserves that argv
contract, so the delegation below is transparent to Spark.
"""

for _mod in ("numpy", "pandas", "pyarrow"):
    try:
        __import__(_mod)
    except ImportError:  # pragma: no cover - optional at runtime
        pass

from pyspark.daemon import manager  # noqa: E402  (argv-dispatch happens here)

if __name__ == "__main__":
    manager()
