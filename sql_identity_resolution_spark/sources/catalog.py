"""Versioned table catalog: durable MERGE-able tables on plain parquet.

The reference persists its outputs in warehouse-native MERGE targets
(Delta ``MERGE INTO`` on Databricks — ``sql/databricks/core/IDR_Run.py:452-463``;
INSERT-where-not-exists + UPDATE on DuckDB — ``sql/duckdb/core/idr_run.py:370-394``).
On a cluster this engine uses Iceberg ``MERGE INTO`` through ``spark.sql`` (see
``iceberg_merge_sql``); the sandbox image has no Iceberg jars, so the default
backend is a small snapshot-versioned parquet format with the same semantics:

- every commit writes a NEW immutable version directory ``<table>/v<NNNN>``,
- ``<table>/_CURRENT`` is an atomically-replaced pointer file (os.replace),
- reads go through the pointer ⇒ readers never see partial writes,
- old versions are retained ⇒ snapshot isolation, time travel, and the
  resume-from-checkpoint-boundary requirement (a failed run never corrupts
  the published state; re-running re-derives from the last committed snapshot).

MERGE is emulated declaratively (anti-join + join + union) so Catalyst plans it;
there is no driver-side row loop anywhere.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_POINTER = "_CURRENT"


class Catalog:
    def __init__(self, spark: SparkSession, warehouse: str, keep_versions: int = 3):
        self.spark = spark
        self.warehouse = warehouse
        self.keep_versions = keep_versions
        os.makedirs(warehouse, exist_ok=True)

    # ------------------------------------------------------------------ paths
    def _tdir(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def _pointer_path(self, name: str) -> str:
        return os.path.join(self._tdir(name), _POINTER)

    def _pointer(self, name: str) -> dict | None:
        p = self._pointer_path(name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def current_version(self, name: str) -> str | None:
        meta = self._pointer(name)
        return meta["version"] if meta else None

    def exists(self, name: str) -> bool:
        return self.current_version(name) is not None

    # ------------------------------------------------------------------- read
    def read(self, name: str, schema: T.StructType | None = None) -> DataFrame:
        """Read the current snapshot; empty DF with ``schema`` if table absent.
        Append tables are a manifest of immutable part versions — read them all."""
        meta = self._pointer(name)
        if meta is None:
            if schema is None:
                raise FileNotFoundError(f"table {name} does not exist and no schema given")
            return self.spark.createDataFrame([], schema)
        parts = meta.get("parts")
        tdir = self._tdir(name)
        if parts:
            return self.spark.read.option("mergeSchema", "false").parquet(
                *[os.path.join(tdir, p) for p in parts]
            )
        return self.spark.read.parquet(os.path.join(tdir, meta["version"]))

    # ------------------------------------------------------------------ write
    def _commit(self, name: str, df: DataFrame) -> None:
        tdir = self._tdir(name)
        os.makedirs(tdir, exist_ok=True)
        version = f"v{int(time.time() * 1000):016d}_{uuid.uuid4().hex[:6]}"
        out = os.path.join(tdir, version)
        df.write.mode("overwrite").parquet(out)
        tmp = os.path.join(tdir, f".ptr_{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump({"version": version, "committed_at": time.time()}, f)
        os.replace(tmp, self._pointer_path(name))  # atomic publish
        self._vacuum(name, keep=version)

    def _vacuum(self, name: str, keep: str) -> None:
        tdir = self._tdir(name)
        versions = sorted(d for d in os.listdir(tdir) if d.startswith("v"))
        excess = [v for v in versions if v != keep][: max(0, len(versions) - self.keep_versions)]
        for v in excess:
            shutil.rmtree(os.path.join(tdir, v), ignore_errors=True)

    def overwrite(self, name: str, df: DataFrame) -> None:
        self._commit(name, df)

    def append(self, name: str, df: DataFrame) -> None:
        """Append-only sinks (run_history, stage_metrics, audit, lineage —
        reference idr_out append tables, sql/common/02_ddl_observability.sql:5-53).

        True append: each call writes a NEW immutable part dir and atomically
        publishes an extended manifest — never rewrites history (an O(history)
        rewrite per run would dominate at scale). ≙ Iceberg fast append."""
        tdir = self._tdir(name)
        os.makedirs(tdir, exist_ok=True)
        meta = self._pointer(name) or {}
        parts = meta.get("parts") or ([meta["version"]] if meta.get("version") else [])
        version = f"v{int(time.time() * 1000):016d}_{uuid.uuid4().hex[:6]}"
        df.write.mode("overwrite").parquet(os.path.join(tdir, version))
        parts.append(version)
        tmp = os.path.join(tdir, f".ptr_{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump({"version": version, "parts": parts, "committed_at": time.time()}, f)
        os.replace(tmp, self._pointer_path(name))

    def merge_upsert(
        self,
        name: str,
        source: DataFrame,
        keys: list[str],
        update_cols: list[str] | None = None,
    ) -> None:
        """``MERGE INTO target USING source ON keys WHEN MATCHED THEN UPDATE SET
        update_cols WHEN NOT MATCHED THEN INSERT *`` — the reference's sink
        pattern (sql/databricks/core/IDR_Run.py:452-463).

        ``update_cols=None`` ⇒ update every non-key column (full-row upsert).
        Emulated as: kept = target ⟕anti source; matched = target ⋈ source
        (non-updated cols from target, updated from source); inserted = source
        ⟕anti target. All declarative — one shuffle on ``keys`` shared by the
        three branches.
        """
        if not self.exists(name):
            self._commit(name, source)
            return
        target = self.read(name)
        cols = target.columns
        if update_cols is None:
            update_cols = [c for c in cols if c not in keys]

        src = source.select(*cols)
        kept = target.join(src.select(*keys).distinct(), keys, "left_anti")
        t, s = target.alias("t"), src.alias("s")
        matched = t.join(s, keys, "inner").select(
            *[F.col(f"s.{c}" if (c in update_cols or c in keys) else f"t.{c}").alias(c) for c in cols]
        )
        inserted = src.join(target.select(*keys).distinct(), keys, "left_anti")
        self._commit(name, kept.unionByName(matched).unionByName(inserted))

    def delete_insert(self, name: str, source: DataFrame, keys: list[str]) -> None:
        """DELETE-matching-then-INSERT (reference clusters sink,
        sql/duckdb/core/idr_run.py:544-552)."""
        if not self.exists(name):
            self._commit(name, source)
            return
        target = self.read(name)
        kept = target.join(source.select(*keys).distinct(), keys, "left_anti")
        self._commit(name, kept.unionByName(source.select(*target.columns)))

    def drop(self, name: str) -> None:
        shutil.rmtree(self._tdir(name), ignore_errors=True)


def iceberg_merge_sql(target_fqn: str, source_view: str, keys: list[str], update_cols: list[str]) -> str:
    """The exact MERGE this catalog emulates, for real Iceberg deployments
    (spark-submit with iceberg-spark-runtime on the classpath)."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    sets = ", ".join(f"t.{c} = s.{c}" for c in update_cols)
    return (
        f"MERGE INTO {target_fqn} t USING {source_view} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT *"
    )
