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

Bucketed MERGE (the scale path): pass ``bucket_col`` to ``merge_upsert`` /
``delete_insert`` / ``overwrite`` and the table is hash-partitioned into
``n_buckets`` by ``pmod(xxhash64(bucket_col), n)``; a merge rewrites ONLY the
buckets its source rows hash into — O(delta·buckets) IO instead of O(table)
per commit (≙ Iceberg bucket-partitioned MERGE with partition pruning). The
pointer maps each bucket to the version directory that last rewrote it, so
untouched buckets are shared across snapshots (same idea as Iceberg manifests
reusing unchanged data files). ``bucket_col`` must be one of (a deterministic
function of) the merge keys so matching target/source rows land in the same
bucket.

Sizing ``n_buckets``: a delta touching k distinct keys rewrites
min(k, n_buckets) buckets, so the win requires n_buckets ≫ typical delta key
count ÷ desired rewrite fraction. The sandbox default (32) suits streaming
micro-batches; a 10⁹-row membership table on a cluster wants
n_buckets ≈ table_bytes / target_file_bytes (e.g. 4096 × 256 MB), exactly how
Iceberg bucket partitioning is sized.

Insert-only fast append: a MERGE source whose keys match NO existing row in a
bucket is a pure INSERT there — the commit appends a new part file to that
bucket (the pointer maps a bucket to a LIST of version dirs) and the kept rows
never leave disk, ≙ Iceberg MERGE writing only new data files for match-free
partitions plus a fast-append manifest. This makes new-entity INCR deltas
(the common streaming shape: most arriving entities are brand new) O(delta)
write IO even though their keys hash into every bucket. Buckets that
accumulate ``max_parts_per_bucket`` part files are folded into the next
merge's rewrite set (inline compaction, ≙ Iceberg rewrite_data_files).

Merge-on-read (``merge_upsert(..., merge_on_read=True)``): buckets whose keys
DO match existing rows normally rewrite (copy-on-write — correct but O(bucket)
write IO even for a one-row update, e.g. refreshing ``last_seen_ts`` on a
re-observed identity edge scattered across every bucket). With MoR the commit
instead appends a small *update part* holding only the post-merge rows for the
SOURCE keys (matched rows merged with their target values, new rows as-is) and
marks it in the pointer (``upd: {bucket: [versions]}``); ``read()`` reconciles
such buckets by anti-joining the base parts against the update-part keys
(newest update part wins per key — AQE broadcasts the delta-sized key set).
Write IO is O(delta) regardless of match placement — ≙ Iceberg MERGE with
``write.merge.mode=merge-on-read`` (equality deletes + data files), including
the read-time merge and the compaction cadence: a bucket reaching
``max_parts_per_bucket`` parts is compacted back to a single reconciled
rewrite on its next touch.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_POINTER = "_CURRENT"


def _parquet_rows(path: str) -> int:
    """Row count of a parquet dir from file footers only — driver-side metadata
    read (O(files), no Spark job), ≙ Iceberg collecting manifest record counts
    at commit time."""
    import pyarrow.parquet as pq

    total = 0
    for root, _, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, fn)).metadata.num_rows
    return total


def _parquet_rows_by_bucket(out_dir: str) -> dict[str, int]:
    """Per-bucket row counts for one version dir written with
    ``partitionBy("_bucket")`` — ONE directory walk + footer reads fanned out
    over a small thread pool (footer fetches are tiny independent IO; the
    per-bucket ``_parquet_rows`` loop paid 2×n_buckets serial walks+reads —
    ~0.25 s of driver time per 256-bucket commit, twice per run)."""
    import pyarrow.parquet as pq

    files: list[tuple[str, str]] = []
    for root, _, fns in os.walk(out_dir):
        b = None
        base = os.path.basename(root)
        if base.startswith("_bucket="):
            b = base.split("=", 1)[1]
        for fn in fns:
            if fn.endswith(".parquet") and b is not None:
                files.append((b, os.path.join(root, fn)))
    counts: dict[str, int] = {}
    if not files:
        return counts
    if len(files) > 8:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=8) as ex:
            rows = list(ex.map(lambda bf: (bf[0], pq.ParquetFile(bf[1]).metadata.num_rows), files))
    else:
        rows = [(b, pq.ParquetFile(f).metadata.num_rows) for b, f in files]
    for b, n in rows:
        counts[b] = counts.get(b, 0) + int(n)
    return counts


class Catalog:
    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        keep_versions: int = 3,
        n_buckets: int = 32,
        table_buckets: dict[str, int] | None = None,
        max_parts_per_bucket: int = 8,
    ):
        self.spark = spark
        self.warehouse = warehouse
        self.keep_versions = keep_versions
        self.n_buckets = n_buckets
        # insert-only merges append part files to a bucket instead of
        # rewriting it; at this many parts the bucket compacts on next touch
        self.max_parts_per_bucket = max_parts_per_bucket
        # merge-on-read planning: when a delta's keys hash into at least this
        # fraction of a table's buckets, the matched-bucket probe (a key scan
        # of every touched bucket) is skipped — see _plan_bucketed_merge
        self.mor_probe_max_fraction = 0.5
        # per-table override for NEW tables: big fact tables (membership, edges)
        # want many buckets; tiny dimension stores want few (fewer files + fewer
        # rewritten slices per delta). Existing tables always keep the modulus
        # recorded in their pointer (see _table_buckets).
        self.table_buckets = dict(table_buckets or {})
        # per-table stats of the LAST bucketed commit this Catalog performed
        # ({table: {n_buckets, touched_buckets, rewritten_fraction}}) — the
        # pipeline surfaces these as store-commit metrics (≙ Iceberg snapshot
        # summary's changed-partition-count).
        self.last_commit_stats: dict[str, dict] = {}
        os.makedirs(warehouse, exist_ok=True)

    def _table_buckets(self, name: str, meta: dict | None) -> int:
        """Effective bucket count for ``name``: the modulus stored in the
        pointer if the table already exists bucketed (a Catalog constructed
        with a different default must NOT recompute buckets under a new
        modulus — rows would be looked up in the wrong slices), else the
        per-table override, else the catalog default."""
        if meta is not None and meta.get("n_buckets") is not None:
            return int(meta["n_buckets"])
        return int(self.table_buckets.get(name, self.n_buckets))

    def _bucket_expr(self, bucket_col: str, n_buckets: int):
        return F.pmod(F.xxhash64(F.col(bucket_col).cast("string")), F.lit(n_buckets)).cast("int")

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

    def row_count(self, name: str) -> int | None:
        """Exact current row count from pointer metadata — zero Spark jobs.

        Bucketed tables maintain per-bucket counts at every commit (rewritten
        buckets are re-counted from parquet footers, untouched buckets keep
        their recorded counts — ≙ Iceberg snapshot summary `total-records`);
        append tables sum per-part counts. Returns None for a missing table,
        a legacy pointer written before counts were recorded, or a table with
        lazily-counted merge-on-read update parts (``unrec`` buckets — see
        delete_insert: their recorded counts are gross, exactness is restored
        at that bucket's next compaction/rewrite). Callers fall back."""
        meta = self._pointer(name)
        if meta is None:
            return None
        if meta.get("unrec"):
            # delete_insert MoR buckets whose superseded-row count was
            # deliberately NOT scanned at commit time (O(delta) commit path)
            return None
        if meta.get("bucket_rows") is not None:
            # counts are only trustworthy when every live bucket has one (a
            # legacy pointer upgraded mid-history would miss untouched buckets)
            if set(meta["bucket_rows"]) == set(meta.get("buckets") or {}):
                return int(sum(meta["bucket_rows"].values()))
            return None
        if meta.get("part_rows") is not None:
            return int(sum(meta["part_rows"]))
        if meta.get("rows") is not None:
            return int(meta["rows"])
        return None

    def exists(self, name: str) -> bool:
        return self.current_version(name) is not None

    # ------------------------------------------------------------------- read
    @staticmethod
    def _bucket_versions(val) -> list[str]:
        """Pointer bucket value → list of version dirs holding its part files
        (str for a single rewrite, list once fast-appends accumulated)."""
        if val is None:
            return []
        return [val] if isinstance(val, str) else list(val)

    def _bucket_paths(self, name: str, meta: dict, buckets: list[int] | None = None) -> list[str]:
        tdir = self._tdir(name)
        bmap: dict = meta["buckets"]  # {bucket_str: version | [versions]}
        items = bmap.items() if buckets is None else ((str(b), bmap[str(b)]) for b in buckets if str(b) in bmap)
        return [
            os.path.join(tdir, v, f"_bucket={b}")
            for b, vs in items
            for v in self._bucket_versions(vs)
        ]

    def read(
        self, name: str, schema: T.StructType | None = None, buckets: list[int] | None = None
    ) -> DataFrame:
        """Read the current snapshot; empty DF with ``schema`` if table absent.
        Append tables are a manifest of immutable part versions — read them all.
        Bucketed tables read one path per (selected) bucket — partition
        pruning: pass ``buckets`` to scan only the touched slices."""
        meta = self._pointer(name)
        if meta is None:
            if schema is None:
                raise FileNotFoundError(f"table {name} does not exist and no schema given")
            return self.spark.createDataFrame([], schema)
        tdir = self._tdir(name)
        # reads supply the schema RECORDED AT COMMIT (≙ Iceberg reading its
        # table metadata, never file footers): with many bucket-part paths a
        # schema-inferring read costs a driver footer fetch per path — 20+
        # catalog reads per INCR run made that seconds of pure driver time
        reader = self.spark.read.option("mergeSchema", "false")
        stored = meta.get("schema")
        if stored is not None:
            reader = reader.schema(T.StructType.fromJson(stored))
        if meta.get("buckets") is not None:
            paths = self._bucket_paths(name, meta, buckets)
            if not paths:
                # empty table or fully-pruned read: schema from the pointer
                if schema is None and stored is not None:
                    schema = T.StructType.fromJson(stored)
                if schema is None:
                    raise FileNotFoundError(f"bucketed table {name} is empty and no schema given")
                return self.spark.createDataFrame([], schema)
            umap = meta.get("upd") or {}
            if umap:
                return self._read_reconciled(name, meta, buckets, reader)
            return reader.parquet(*paths)
        parts = meta.get("parts")
        if parts:
            return reader.parquet(*[os.path.join(tdir, p) for p in parts])
        return reader.parquet(os.path.join(tdir, meta["version"]))

    def _read_reconciled(self, name: str, meta: dict, buckets, reader) -> DataFrame:
        """Bucketed read when some buckets carry merge-on-read update parts.

        Buckets WITHOUT update parts stream through untouched (zero overhead).
        For buckets WITH them: the newest update part wins per merge key
        (update parts are totally ordered by version — commits to one table
        are serialized), then base parts drop any key an update part holds
        (anti-join; the update side is delta-sized, so AQE broadcasts it).
        Keys never cross buckets (same hash ⇒ same bucket), so one global
        anti-join over the update-carrying buckets is exact."""
        tdir = self._tdir(name)
        umap: dict = meta.get("upd") or {}
        keys: list[str] = meta["mor_keys"]
        bmap: dict = meta["buckets"]
        items = (
            bmap.items() if buckets is None else ((str(b), bmap[str(b)]) for b in buckets if str(b) in bmap)
        )
        plain_paths: list[str] = []
        base_paths: list[str] = []
        upd_by_version: dict[str, list[str]] = {}
        for b, vs in items:
            versions = self._bucket_versions(vs)
            upd_vs = set(umap.get(b) or ())
            if not upd_vs:
                plain_paths += [os.path.join(tdir, v, f"_bucket={b}") for v in versions]
                continue
            for v in versions:
                p = os.path.join(tdir, v, f"_bucket={b}")
                if v in upd_vs:
                    upd_by_version.setdefault(v, []).append(p)
                else:
                    base_paths.append(p)
        frames: list[DataFrame] = []
        upd_df = None
        if upd_by_version:
            # authoritative commit order from the pointer (upd_order); name
            # sort only for legacy pointers predating it (name order can
            # tie-break randomly within one millisecond)
            pos = {v: i for i, v in enumerate(meta.get("upd_order") or [])}
            ordered = sorted(upd_by_version, key=lambda v: (pos.get(v, -1), v))
            upd_df = reader.parquet(*upd_by_version[ordered[-1]])
            if len(ordered) > 1:
                from functools import reduce

                from pyspark.sql import Window

                tagged = [
                    reader.parquet(*upd_by_version[v]).withColumn("_mor_seq", F.lit(i))
                    for i, v in enumerate(ordered)
                ]
                w = Window.partitionBy(*keys).orderBy(F.desc("_mor_seq"))
                upd_df = (
                    reduce(lambda a, b: a.unionByName(b), tagged)
                    .withColumn("_mor_rn", F.row_number().over(w))
                    .where(F.col("_mor_rn") == 1)
                    .drop("_mor_rn", "_mor_seq")
                )
            frames.append(upd_df)
        if base_paths:
            base = reader.parquet(*base_paths)
            if upd_df is not None:
                base = base.join(upd_df.select(*keys).distinct(), keys, "left_anti")
            frames.append(base)
        if plain_paths:
            frames.append(reader.parquet(*plain_paths))
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out

    # ------------------------------------------------------------------ write
    def _commit(self, name: str, df: DataFrame, defer_publish: bool = False):
        tdir = self._tdir(name)
        os.makedirs(tdir, exist_ok=True)
        version = f"v{int(time.time() * 1000):016d}_{uuid.uuid4().hex[:6]}"
        out = os.path.join(tdir, version)
        df.write.mode("overwrite").parquet(out)
        ptr = {"version": version, "rows": _parquet_rows(out),
               "schema": df.schema.jsonValue(), "committed_at": time.time()}

        def _publish():
            tmp = os.path.join(tdir, f".ptr_{uuid.uuid4().hex[:8]}")
            with open(tmp, "w") as f:
                json.dump(ptr, f)
            os.replace(tmp, self._pointer_path(name))  # atomic publish
            self._vacuum(name, keep=version)

        if defer_publish:
            return _publish
        _publish()
        return None

    def _vacuum(self, name: str, keep: str) -> None:
        tdir = self._tdir(name)
        meta = self._pointer(name) or {}
        referenced = {keep}
        for vs in (meta.get("buckets") or {}).values():
            referenced.update(self._bucket_versions(vs))
        versions = sorted(d for d in os.listdir(tdir) if d.startswith("v"))
        excess = [v for v in versions if v not in referenced][
            : max(0, len(versions) - self.keep_versions)
        ]
        for v in excess:
            shutil.rmtree(os.path.join(tdir, v), ignore_errors=True)

    def _commit_buckets(
        self,
        name: str,
        df: DataFrame,
        bucket_col: str,
        base: dict | None,
        touched: set[int] | None = None,
        append_b: set[int] | None = None,
        mor_b: set[int] | None = None,
        mor_insert_rows: dict[str, int] | None = None,
        mor_keys: list[str] | None = None,
        defer_publish: bool = False,
        approx_rows: int | None = None,
    ):
        """Write ``df`` partitioned by bucket into ONE new version dir.
        ``df`` carries the FULL post-merge content of every bucket in
        ``touched`` (rewritten: pointer maps them to just this version) plus
        ONLY the new rows of every bucket in ``append_b`` (fast-append: this
        version is added to the bucket's part list, prior parts stay live)
        plus ONLY the post-merge rows of the SOURCE keys for every bucket in
        ``mor_b`` (merge-on-read update part: appended like fast-append but
        flagged in the pointer so reads reconcile it against the base parts;
        ``mor_insert_rows`` carries how many of its rows are genuinely new —
        matched rows supersede rather than add, keeping bucket_rows exact.
        ``mor_insert_rows=None`` with a non-empty ``mor_b`` = LAZY counting:
        the update part's own footer count is recorded as-is and the bucket
        is marked ``unrec`` — superseded target rows are deliberately NOT
        scanned at commit time, so the commit stays O(delta); exactness is
        restored when the bucket next rewrites/compacts).
        Untouched buckets keep their prior versions (shared, never rewritten).
        A rewritten bucket with no surviving rows is dropped from the map.

        ``defer_publish=True``: all write work runs now, but the atomic
        pointer swap (+vacuum) is returned as a zero-argument closure instead
        of executing — the caller orders publishes across tables (the
        pipeline's membership-last crash barrier) without serializing the
        writes themselves. Returns None when publishing inline."""
        n_buckets = self._table_buckets(name, base)
        tdir = self._tdir(name)
        os.makedirs(tdir, exist_ok=True)
        version = f"v{int(time.time() * 1000):016d}_{uuid.uuid4().hex[:6]}"
        out = os.path.join(tdir, version)
        # repartition ON the bucket before partitionBy: otherwise every task
        # opens a writer per bucket it sees (shuffle_partitions × n_buckets
        # small files + per-task partition sort — measured 3× slower commits).
        # Task count = touched-bucket count (a 48-bucket delta merge is a
        # 48-task job, not an n_buckets-task job), capped at 4× parallelism
        # for big initial writes — hash-aligned, so a task still writes only
        # its own buckets (n/k writers per task, k chosen so that stays ≤~4).
        k = (len(touched) if touched is not None else n_buckets) + len(append_b or ()) + len(mor_b or ())
        k = max(1, min(n_buckets, k, 4 * max(8, self.spark.sparkContext.defaultParallelism)))
        if approx_rows is not None:
            # caller-supplied size hint (the pipeline already holds exact
            # counts from its checkpoint Observations): a small frame doesn't
            # need one task per bucket — cap the writer task count at ~200k
            # rows/task (floor 8 so a many-bucket write never serializes on
            # one writer opening every bucket file). Hash-aligned repartition
            # keeps each task writing only its own buckets either way; file
            # count (one per bucket) is unchanged.
            k = min(k, max(8, int(approx_rows) // 200_000 + 1))
        (
            df.withColumn("_bucket", self._bucket_expr(bucket_col, n_buckets))
            .repartition(k, "_bucket")
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(out)
        )
        written = {d.split("=", 1)[1] for d in os.listdir(out) if d.startswith("_bucket=")}
        bmap = dict((base or {}).get("buckets") or {})
        brows = dict((base or {}).get("bucket_rows") or {})
        unrec = {str(b) for b in ((base or {}).get("unrec") or [])}
        umap = {k_: list(v) for k_, v in ((base or {}).get("upd") or {}).items()}
        # monotonic commit order of update-part versions: version DIR names
        # sort by millisecond + random hex, so two serialized commits inside
        # one ms could tie-break randomly and let an older update part win
        # newest-wins reconciliation — this list is the authoritative order
        uorder = [v for v in ((base or {}).get("upd_order") or [])]
        append_strs = {str(b) for b in (append_b or set())}
        mor_strs = {str(b) for b in (mor_b or set())}
        for b in touched or set():
            bmap.pop(str(b), None)
            brows.pop(str(b), None)
            umap.pop(str(b), None)
            unrec.discard(str(b))
        new_rows = _parquet_rows_by_bucket(out)
        for b in written:
            n_new = new_rows.get(b, 0)
            if b in append_strs or b in mor_strs:
                prior = self._bucket_versions(bmap.get(b))
                if b in mor_strs and prior:
                    umap[b] = umap.get(b, []) + [version]
                    # matched rows supersede, only genuine inserts add (a
                    # bucket absent from the insert counts had none). With
                    # lazy counting (mor_insert_rows=None) the gross part
                    # count is recorded and the bucket marked unreconciled —
                    # no target scan at commit time.
                    if mor_insert_rows is not None:
                        n_new = int(mor_insert_rows.get(b, 0))
                    else:
                        unrec.add(b)
                bmap[b] = prior + [version] if prior else version
                if b in brows:
                    brows[b] = int(brows[b]) + n_new
                elif not prior:
                    brows[b] = n_new
                # else: prior parts with unknown count — leave the count
                # missing so row_count() reports None and callers re-scan
            else:
                bmap[b] = version
                brows[b] = n_new
                umap.pop(b, None)
                unrec.discard(b)
        ptr = {
            "version": version,
            "buckets": bmap,
            "bucket_rows": brows,
            "bucket_col": bucket_col,
            "n_buckets": n_buckets,
            "schema": df.schema.jsonValue(),
            "committed_at": time.time(),
        }
        if umap:
            ptr["upd"] = umap
            ptr["mor_keys"] = mor_keys if mor_keys is not None else (base or {}).get("mor_keys")
            live_upd = {v for vs in umap.values() for v in vs}
            uorder = [v for v in uorder if v in live_upd]
            if mor_strs and version in live_upd:
                uorder.append(version)
            ptr["upd_order"] = uorder
        unrec &= set(bmap)
        if unrec:
            ptr["unrec"] = sorted(unrec)
        rewrote = len(touched) if touched is not None else len(written)
        self.last_commit_stats[name] = {
            "n_buckets": n_buckets,
            "touched_buckets": rewrote,
            "appended_buckets": len(append_b or ()),
            "rewritten_fraction": round(rewrote / n_buckets, 4) if n_buckets else 1.0,
        }
        if mor_b:
            self.last_commit_stats[name]["upd_buckets"] = len(mor_b)

        def _publish():
            tmp = os.path.join(tdir, f".ptr_{uuid.uuid4().hex[:8]}")
            with open(tmp, "w") as f:
                json.dump(ptr, f)
            os.replace(tmp, self._pointer_path(name))
            self._vacuum(name, keep=version)

        if defer_publish:
            return _publish
        _publish()
        return None

    def overwrite(
        self, name: str, df: DataFrame, bucket_col: str | None = None,
        defer_publish: bool = False, approx_rows: int | None = None,
    ):
        if bucket_col is not None:
            return self._commit_buckets(
                name, df, bucket_col, base=None, defer_publish=defer_publish,
                approx_rows=approx_rows,
            )
        return self._commit(name, df, defer_publish=defer_publish)

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
        part_rows = meta.get("part_rows") if len(meta.get("part_rows") or []) == len(parts) else None
        version = f"v{int(time.time() * 1000):016d}_{uuid.uuid4().hex[:6]}"
        out = os.path.join(tdir, version)
        df.write.mode("overwrite").parquet(out)
        parts.append(version)
        if part_rows is not None:
            part_rows = [*part_rows, _parquet_rows(out)]
        elif len(parts) == 1:
            part_rows = [_parquet_rows(out)]
        tmp = os.path.join(tdir, f".ptr_{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump(
                {"version": version, "parts": parts, "part_rows": part_rows,
                 "schema": df.schema.jsonValue(), "committed_at": time.time()}, f
            )
        os.replace(tmp, self._pointer_path(name))

    def read_rows(self, name: str) -> list[dict] | None:
        """Driver-side read of a TINY table as a list of dicts — zero Spark
        jobs (pyarrow over the pointer's part files; ≙ reading Iceberg
        metadata instead of launching a scan job). None when absent. Use only
        for metadata-scale tables (run_state, engine_config_state): the rows
        are materialized on the driver. Timestamps are normalized to the
        naive-UTC representation the engine uses throughout (session tz and
        the driver clock are both UTC)."""
        import pyarrow.parquet as pq

        meta = self._pointer(name)
        if meta is None:
            return None
        tdir = self._tdir(name)
        if meta.get("buckets") is not None:
            srcs = [
                os.path.join(v, f"_bucket={b}")
                for b, vs in meta["buckets"].items()
                for v in self._bucket_versions(vs)
            ]
        else:
            srcs = meta.get("parts") or [meta["version"]]
        out: list[dict] = []
        for part in srcs:
            pdir = os.path.join(tdir, part)
            for root, _, files in os.walk(pdir):
                for fn in sorted(files):
                    if not fn.endswith(".parquet"):
                        continue
                    for row in pq.read_table(os.path.join(root, fn)).to_pylist():
                        out.append({
                            k: (v.replace(tzinfo=None)
                                if isinstance(v, datetime) and v.tzinfo is not None else v)
                            for k, v in row.items()
                        })
        return out

    def merge_upsert_rows(
        self, name: str, rows: list[tuple], keys: list[str], schema: T.StructType | str
    ) -> None:
        """Driver-side MERGE for TINY single-digit-row state tables
        (run_state, engine_config_state): the upsert runs as a pyarrow
        read-modify-write on the driver — zero Spark jobs — and publishes the
        same snapshot-versioned pointer shape as ``merge_upsert`` (new
        immutable version dir + atomic pointer swap), so readers and the
        resume contract are unchanged. The Spark emulation spent ~0.3-0.5 s
        of pure scheduler floor per state merge (x2 per run: watermark +
        match-signature) on tables that never exceed one row per source."""
        import pyarrow.parquet as pq

        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        names = [f.name for f in schema.fields]
        kidx = [names.index(k) for k in keys]
        current: dict[tuple, tuple] = {}
        meta = self._pointer(name)
        if meta is not None:
            stored = meta.get("schema")
            if stored is not None:
                names_stored = [f["name"] for f in stored["fields"]]
                if names_stored != names:
                    raise ValueError(
                        f"merge_upsert_rows {name}: schema mismatch {names_stored} vs {names}"
                    )
            tdir = self._tdir(name)
            srcs = meta.get("parts") or [meta["version"]]
            for part in srcs:
                pdir = os.path.join(tdir, part)
                for root, _, files in os.walk(pdir):
                    for fn in files:
                        if not fn.endswith(".parquet"):
                            continue
                        t = pq.read_table(os.path.join(root, fn))
                        for row in t.to_pylist():
                            # normalize tz-aware timestamps back to the naive
                            # UTC representation the writers use
                            vals = tuple(
                                v.replace(tzinfo=None)
                                if isinstance(v, datetime) and v.tzinfo is not None
                                else v
                                for v in (row[c] for c in names)
                            )
                            current[tuple(vals[i] for i in kidx)] = vals
        for row in rows:
            current[tuple(row[i] for i in kidx)] = tuple(row)
        self.append_rows(name, sorted(current.values(), key=lambda r: tuple(str(r[i]) for i in kidx)),
                         schema, overwrite=True)

    def append_rows(
        self, name: str, rows: list[tuple], schema: T.StructType | str, overwrite: bool = False
    ) -> None:
        """Driver-side fast append for TINY observability frames (run_history,
        stage_metrics, metrics_export, store-commit stats: a handful of rows
        the driver already holds as Python values).

        Writes the parquet part directly with pyarrow — zero Spark jobs — and
        publishes the same pointer shape as :meth:`append`, so readers are
        indistinguishable (the stored Spark schema is authoritative at read
        time, exactly like every other commit). A run previously paid one
        full Spark write job (~0.3 s of scheduler floor each) per one-row
        observability append — 4+ jobs of pure fixed cost per pipeline run."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        _ARROW = {
            "string": pa.string(),
            "long": pa.int64(),
            "integer": pa.int32(),
            "double": pa.float64(),
            "boolean": pa.bool_(),
            # session timezone is UTC (session.py); naive datetimes here are
            # UTC wall times by construction (run_ts), so annotate as UTC
            # micros — Spark reads them back identically to its own writer
            "timestamp": pa.timestamp("us", tz="UTC"),
        }
        arrow_schema = pa.schema(
            [(f.name, _ARROW[f.dataType.typeName()]) for f in schema.fields]
        )
        cols = list(zip(*rows)) if rows else [[] for _ in schema.fields]
        table = pa.Table.from_arrays(
            [pa.array(list(c), type=t) for c, t in zip(cols, arrow_schema.types)],
            schema=arrow_schema,
        )
        tdir = self._tdir(name)
        os.makedirs(tdir, exist_ok=True)
        meta = {} if overwrite else (self._pointer(name) or {})
        parts = meta.get("parts") or ([meta["version"]] if meta.get("version") else [])
        part_rows = meta.get("part_rows") if len(meta.get("part_rows") or []) == len(parts) else None
        version = f"v{int(time.time() * 1000):016d}_{uuid.uuid4().hex[:6]}"
        out = os.path.join(tdir, version)
        os.makedirs(out)
        pq.write_table(table, os.path.join(out, "part-00000.parquet"))
        parts.append(version)
        if part_rows is not None:
            part_rows = [*part_rows, len(rows)]
        elif len(parts) == 1:
            part_rows = [len(rows)]
        tmp = os.path.join(tdir, f".ptr_{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            json.dump(
                {"version": version, "parts": parts, "part_rows": part_rows,
                 "schema": schema.jsonValue(), "committed_at": time.time()}, f
            )
        os.replace(tmp, self._pointer_path(name))
        if overwrite:
            self._vacuum(name, keep=version)

    def _touched_buckets(self, source: DataFrame, bucket_col: str, n_buckets: int) -> set[int]:
        """Distinct buckets the source rows hash into — a ≤n_buckets-row
        collect (the one legitimate driver-side scalar of a bucketed MERGE,
        ≙ Iceberg's partition-predicate planning)."""
        return {
            r["b"]
            for r in source.select(
                self._bucket_expr(bucket_col, n_buckets).alias("b")
            ).distinct().collect()
        }

    def read_slice_for(
        self,
        name: str,
        source: DataFrame,
        bucket_col: str,
        schema: T.StructType | str | None = None,
    ) -> DataFrame:
        """Current rows of ``name`` restricted to the buckets that ``source``'s
        ``bucket_col`` values hash into — the same partition pruning a bucketed
        MERGE plans, exposed as a read (≙ Iceberg partition-predicate pushdown
        for a delta-driven lookup). Falls back to a full read for unbucketed
        tables; returns an empty frame with ``schema`` when the table is absent."""
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        meta = self._pointer(name)
        if meta is None or meta.get("buckets") is None:
            return self.read(name, schema)
        touched = self._touched_buckets(source, bucket_col, self._table_buckets(name, meta))
        return self.read(name, buckets=sorted(touched))

    def _merge_target(
        self, name: str, source: DataFrame, bucket_col: str | None
    ) -> tuple[DataFrame, dict | None, set[int] | None]:
        """(target slice to merge against, pointer meta, touched buckets).
        The touched-bucket computation uses the modulus STORED in the table's
        pointer, never the catalog default — a mismatch would read the wrong
        target slices and duplicate keys on upsert."""
        meta = self._pointer(name)
        if bucket_col is not None and meta and meta.get("buckets") is not None:
            touched = self._touched_buckets(source, bucket_col, self._table_buckets(name, meta))
            return self.read(name, buckets=sorted(touched)), meta, touched
        return self.read(name), meta, None

    def _plan_bucketed_merge(
        self, name: str, source: DataFrame, keys: list[str], bucket_col: str | None,
        merge_on_read: bool = False,
    ):
        """Split a bucketed merge's touched buckets into REWRITE vs APPEND-only.

        Copy-on-write: a touched bucket where no target key matches any source
        key is a pure INSERT — its kept rows never leave disk and the commit
        fast-appends a new part file (≙ Iceberg MERGE emitting only new data
        files for match-free partitions). Detecting it costs one key-column
        semi-join over the touched slice — O(touched-bucket keys), paid back
        many times over by not rewriting the bucket's data.

        Merge-on-read (``merge_on_read=True``) with the delta touching MOST
        buckets (≥ ``mor_probe_max_fraction`` of them): the matched-bucket
        probe is SKIPPED — a MoR commit appends a delta-sized update part
        either way, and an update part whose keys match nothing reconciles to
        a no-op at read time (the anti-join drops nothing), so classifying
        "matched" vs "pure insert" buys no write IO while costing what is
        then a near-FULL-table key scan per commit (membership's chained-INCR
        shape: 32/32 buckets touched — the last O(corpus) term on that path).
        Every non-compaction touched bucket becomes an update-part append and
        planning touches ONLY the delta + pointer metadata. When the delta
        touches a minority of buckets the probe stays: it is bucket-pruned
        (delta-proportional) and lets unmatched buckets commit as clean
        fast-appends with exact counts. Buckets that already hold
        ``max_parts_per_bucket`` part files are folded into the rewrite set
        (inline compaction). Returns ``(meta, bexpr, rewrite_b, append_b,
        cols, matched_b, over_b, probed)`` — ``rewrite_b = matched_b ∪
        over_b`` for copy-on-write; a merge-on-read caller instead rewrites
        only ``over_b`` and appends update parts for ``matched_b - over_b``;
        ``probed`` says whether matched_b is exact (scanned) or the
        conservative touched-minus-compaction superset — or None when the
        table isn't in bucketed layout (caller falls back to the full-table
        merge)."""
        meta = self._pointer(name)
        if bucket_col is None or not meta or meta.get("buckets") is None:
            return None
        n_buckets = self._table_buckets(name, meta)
        touched = self._touched_buckets(source, bucket_col, n_buckets)
        bexpr = self._bucket_expr(bucket_col, n_buckets)
        bmap = meta["buckets"]
        over = {
            b
            for b in touched
            if len(self._bucket_versions(bmap.get(str(b)))) >= self.max_parts_per_bucket
        }
        if merge_on_read and len(touched) >= self.mor_probe_max_fraction * n_buckets:
            # probe would be a near-full-table scan: skip it, treat every
            # non-compaction touched bucket as an update-part append
            cols = [f["name"] for f in (meta.get("schema") or {}).get("fields", [])]
            if not cols:  # legacy pointer without a stored schema
                cols = self.read(name).columns
            matched_b = touched - over
            return meta, bexpr, over, set(), cols, matched_b, over, False
        tgt_touched = self.read(name, buckets=sorted(touched))
        matched_b = {
            r["b"]
            for r in tgt_touched.join(source.select(*keys).distinct(), keys, "left_semi")
            .select(bexpr.alias("b"))
            .distinct()
            .collect()
        }
        rewrite_b = matched_b | over
        return meta, bexpr, rewrite_b, touched - rewrite_b, tgt_touched.columns, matched_b, over, True

    def merge_upsert(
        self,
        name: str,
        source: DataFrame,
        keys: list[str],
        update_cols: list[str] | None = None,
        bucket_col: str | None = None,
        merge_on_read: bool = False,
        defer_publish: bool = False,
    ):
        """``MERGE INTO target USING source ON keys WHEN MATCHED THEN UPDATE SET
        update_cols WHEN NOT MATCHED THEN INSERT *`` — the reference's sink
        pattern (sql/databricks/core/IDR_Run.py:452-463).

        ``update_cols=None`` ⇒ update every non-key column (full-row upsert).
        Emulated as: kept = target ⟕anti source; matched = target ⋈ source
        (non-updated cols from target, updated from source); inserted = source
        ⟕anti target. All declarative — one shuffle on ``keys`` shared by the
        three branches.

        ``bucket_col`` (must be among ``keys``, or a deterministic function of
        them) switches the table to bucketed layout: only the buckets the
        source touches are read, merged, and rewritten — O(delta·buckets),
        not O(table), per commit.

        ``merge_on_read=True`` (bucketed tables only): matched buckets append
        a delta-sized update part instead of rewriting — O(delta) write IO
        even when matched keys scatter across every bucket (≙ Iceberg
        ``write.merge.mode=merge-on-read``; see module docstring). All
        merges of one table must then use the same ``keys``.
        """
        if not self.exists(name):
            if bucket_col is not None:
                return self._commit_buckets(
                    name, source, bucket_col, base=None, defer_publish=defer_publish
                )
            return self._commit(name, source, defer_publish=defer_publish)
        plan = self._plan_bucketed_merge(name, source, keys, bucket_col, merge_on_read=merge_on_read)
        if plan is None:
            target, meta, touched = self._merge_target(name, source, bucket_col)
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
            merged = kept.unionByName(matched).unionByName(inserted)
            return self._commit_merged(name, merged, bucket_col, meta, touched, defer_publish)
        meta, bexpr, rewrite_b, append_b, cols, matched_b, over_b, _probed = plan
        if update_cols is None:
            update_cols = [c for c in cols if c not in keys]
        mor_b: set[int] = set()
        ins_counts: dict[str, int] = {}
        if merge_on_read:
            prior_keys = meta.get("mor_keys")
            if prior_keys is not None and list(prior_keys) != list(keys):
                raise ValueError(
                    f"merge_on_read table {name} was merged on keys {prior_keys}, got {keys}"
                )
            # matched buckets become update-part appends; only buckets at the
            # compaction threshold still rewrite (reconciled by read())
            mor_b = matched_b - over_b
            rewrite_b = over_b
        src = source.select(*cols)
        merged = None
        if rewrite_b:
            target = self.read(name, buckets=sorted(rewrite_b))
            src_rw = src.where(bexpr.isin([int(b) for b in rewrite_b]))
            kept = target.join(src_rw.select(*keys).distinct(), keys, "left_anti")
            t, s = target.alias("t"), src_rw.alias("s")
            matched = t.join(s, keys, "inner").select(
                *[F.col(f"s.{c}" if (c in update_cols or c in keys) else f"t.{c}").alias(c) for c in cols]
            )
            inserted = src_rw.join(target.select(*keys).distinct(), keys, "left_anti")
            merged = kept.unionByName(matched).unionByName(inserted)
        if mor_b:
            # update part: post-merge rows for the SOURCE keys only — matched
            # rows take non-updated columns from the target, inserts pass
            # through. Delta-sized; checkpointed so the insert-count job and
            # the write run the target join once.
            nonupd = [c for c in cols if c not in update_cols and c not in keys]
            tgt = self.read(name, buckets=sorted(mor_b))
            t_side = tgt.select(
                *keys,
                *[F.col(c).alias(f"_t_{c}") for c in nonupd],
                F.lit(True).alias("_mor_m"),
            )
            src_mor = src.where(bexpr.isin([int(b) for b in mor_b]))
            joined = src_mor.join(t_side, keys, "left").localCheckpoint(eager=True)
            ins_counts = {
                str(r["b"]): r["cnt"]
                for r in joined.where(F.col("_mor_m").isNull())
                .groupBy(bexpr.alias("b"))
                .agg(F.count("*").alias("cnt"))
                .collect()
            }
            upd_rows = joined.select(
                *[
                    F.col(c)
                    if (c in keys or c in update_cols)
                    else F.when(F.col("_mor_m").isNotNull(), F.col(f"_t_{c}")).otherwise(F.col(c)).alias(c)
                    for c in cols
                ]
            )
            merged = upd_rows if merged is None else merged.unionByName(upd_rows)
        if append_b:
            # buckets with zero key matches: every source row there is an
            # INSERT by construction — fast-append, kept rows stay on disk
            appends = src.where(bexpr.isin([int(b) for b in append_b]))
            merged = appends if merged is None else merged.unionByName(appends)
        if merged is None:  # empty source: nothing to write
            n_buckets = self._table_buckets(name, meta)
            self.last_commit_stats[name] = {
                "n_buckets": n_buckets, "touched_buckets": 0,
                "appended_buckets": 0, "rewritten_fraction": 0.0,
            }
            return None
        return self._commit_buckets(
            name, merged, bucket_col, base=meta, touched=rewrite_b, append_b=append_b,
            mor_b=mor_b, mor_insert_rows=ins_counts, mor_keys=keys if merge_on_read else None,
            defer_publish=defer_publish,
        )

    def delete_insert(
        self,
        name: str,
        source: DataFrame,
        keys: list[str],
        bucket_col: str | None = None,
        merge_on_read: bool = False,
        defer_publish: bool = False,
        approx_rows: int | None = None,
    ):
        """DELETE-matching-then-INSERT (reference clusters sink,
        sql/duckdb/core/idr_run.py:544-552). ``bucket_col``: see merge_upsert.

        ``merge_on_read=True`` (bucketed tables only): matched buckets append
        a delta-sized update part instead of rewriting. The update part for a
        delete+insert is simply the SOURCE rows (they ARE the post-merge
        content for their keys — no target join needed); ``read()``
        reconciles by dropping every base row whose key an update part holds,
        which is exactly DELETE-matching semantics even for keys with
        multiple prior rows. Write IO becomes O(delta) instead of O(touched
        buckets' content) — the term that capped chained-INCR latency when
        the membership sink rewrote 32/32 buckets per micro-batch.

        When the delta's keys hash into ~every bucket (the chained-INCR
        membership shape) the commit runs ZERO target-table jobs: the
        matched-bucket probe is skipped (see _plan_bucketed_merge) and no
        superseded-row count scan runs — the pointer records the update
        part's own (gross) row count and marks the bucket unreconciled
        (``unrec``); ``row_count`` answers None until the bucket's next
        compaction/rewrite restores an exact footer count. Planning cost is
        then the delta-sized touched-bucket collect plus pointer metadata —
        O(delta) end-to-end. When the delta touches a minority of buckets the
        probe and the superseded count both run bucket-pruned (delta-
        proportional) and pointer counts stay exact."""
        if not self.exists(name):
            if bucket_col is not None:
                return self._commit_buckets(
                    name, source, bucket_col, base=None, defer_publish=defer_publish
                )
            return self._commit(name, source, defer_publish=defer_publish)
        plan = self._plan_bucketed_merge(name, source, keys, bucket_col, merge_on_read=merge_on_read)
        if plan is None:
            target, meta, touched = self._merge_target(name, source, bucket_col)
            kept = target.join(source.select(*keys).distinct(), keys, "left_anti")
            merged = kept.unionByName(source.select(*target.columns))
            return self._commit_merged(name, merged, bucket_col, meta, touched, defer_publish)
        meta, bexpr, rewrite_b, append_b, cols, matched_b, over_b, probed = plan
        mor_b: set[int] = set()
        ins_counts: dict[str, int] | None = None
        if merge_on_read:
            prior_keys = meta.get("mor_keys")
            if prior_keys is not None and list(prior_keys) != list(keys):
                raise ValueError(
                    f"merge_on_read table {name} was merged on keys {prior_keys}, got {keys}"
                )
            mor_b = matched_b - over_b
            rewrite_b = over_b
        src = source.select(*cols)
        merged = None
        if rewrite_b:
            target = self.read(name, buckets=sorted(rewrite_b))
            src_rw = src.where(bexpr.isin([int(b) for b in rewrite_b]))
            kept = target.join(src_rw.select(*keys).distinct(), keys, "left_anti")
            merged = kept.unionByName(src_rw)
        if mor_b:
            # update part = the source rows themselves (they ARE the
            # post-merge content for their keys — no target join needed)
            src_mor = src.where(bexpr.isin([int(b) for b in mor_b]))
            if probed:
                # probe ran (bucket-pruned, minority of buckets): keep exact
                # pointer counts — NET delta per bucket = inserted source
                # rows minus superseded target rows, both delta-/pruned-sized
                src_mor = src_mor.localCheckpoint(eager=True)
                added = {
                    str(r["b"]): r["cnt"]
                    for r in src_mor.groupBy(bexpr.alias("b")).agg(F.count("*").alias("cnt")).collect()
                }
                superseded = {
                    str(r["b"]): r["cnt"]
                    for r in self.read(name, buckets=sorted(mor_b))
                    .join(src_mor.select(*keys).distinct(), keys, "left_semi")
                    .groupBy(bexpr.alias("b"))
                    .agg(F.count("*").alias("cnt"))
                    .collect()
                }
                ins_counts = {b: added.get(b, 0) - superseded.get(b, 0) for b in added}
            # probe skipped (delta touches ~every bucket): ZERO target jobs —
            # ins_counts stays None and the commit records gross counts with
            # the unrec marker (lazy; exactness restored at compaction)
            merged = src_mor if merged is None else merged.unionByName(src_mor)
        if append_b:
            # no key in these buckets matches ⇒ nothing to delete: fast-append
            appends = src.where(bexpr.isin([int(b) for b in append_b]))
            merged = appends if merged is None else merged.unionByName(appends)
        if merged is None:
            n_buckets = self._table_buckets(name, meta)
            self.last_commit_stats[name] = {
                "n_buckets": n_buckets, "touched_buckets": 0,
                "appended_buckets": 0, "rewritten_fraction": 0.0,
            }
            return None
        return self._commit_buckets(
            name, merged, bucket_col, base=meta, touched=rewrite_b, append_b=append_b,
            mor_b=mor_b, mor_insert_rows=ins_counts, mor_keys=keys if merge_on_read else None,
            defer_publish=defer_publish, approx_rows=approx_rows,
        )

    def _commit_merged(
        self, name: str, merged: DataFrame, bucket_col: str | None, meta: dict | None, touched,
        defer_publish: bool = False,
    ):
        if bucket_col is None:
            return self._commit(name, merged, defer_publish=defer_publish)
        if touched is None:
            # table exists in unbucketed layout → one-time full conversion
            return self._commit_buckets(name, merged, bucket_col, base=None, defer_publish=defer_publish)
        return self._commit_buckets(
            name, merged, bucket_col, base=meta, touched=touched, defer_publish=defer_publish
        )

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
