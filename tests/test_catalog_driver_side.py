"""Focused tests for the round-6 driver-side catalog paths: append_rows /
merge_upsert_rows / read_rows write metadata-scale tables with pyarrow (zero
Spark jobs) but must stay indistinguishable from Spark-written commits for
every reader (stored-schema reads, timestamps, row counts, upsert semantics,
snapshot-pointer shape)."""

from __future__ import annotations

import json
import os
from datetime import datetime

from sql_identity_resolution_spark.sources.catalog import Catalog

SCHEMA = (
    "run_id string, n bigint, frac double, flag boolean, small int, ts timestamp, note string"
)


def test_append_rows_spark_readback_roundtrip(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    t1 = datetime(2026, 3, 1, 12, 30, 45, 123456)
    rows = [
        ("r1", 10, 0.5, True, 3, t1, "hello"),
        ("r2", -2, float("1e18"), False, None, None, None),  # NULLs survive
    ]
    cat.append_rows("obs", rows, SCHEMA)
    got = {r["run_id"]: r for r in cat.read("obs").collect()}
    assert got["r1"]["n"] == 10 and got["r1"]["flag"] is True and got["r1"]["small"] == 3
    assert got["r1"]["ts"] == t1  # microsecond-exact through parquet
    assert got["r2"]["small"] is None and got["r2"]["ts"] is None and got["r2"]["note"] is None
    # schema forced from the pointer, exactly like Spark-written commits
    assert dict(cat.read("obs").dtypes)["n"] == "bigint"
    assert dict(cat.read("obs").dtypes)["ts"] == "timestamp"
    assert cat.row_count("obs") == 2

    # appends extend the same manifest; Spark-written appends interleave
    cat.append_rows("obs", [("r3", 1, 0.0, False, 1, t1, "x")], SCHEMA)
    cat.append("obs", spark.createDataFrame([("r4", 2, 0.0, True, 2, t1, "y")], SCHEMA))
    assert cat.read("obs").count() == 4
    assert cat.row_count("obs") == 4


def test_merge_upsert_rows_semantics_and_read_rows(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    sch = "table_id string, wm timestamp, run string"
    t1, t2 = datetime(2026, 1, 1), datetime(2026, 2, 1)
    cat.merge_upsert_rows("state", [("a", t1, "r1"), ("b", t1, "r1")], keys=["table_id"], schema=sch)
    cat.merge_upsert_rows("state", [("b", t2, "r2"), ("c", t2, "r2")], keys=["table_id"], schema=sch)
    # driver-side read (zero Spark jobs)
    rows = {r["table_id"]: r for r in cat.read_rows("state")}
    assert rows["a"]["wm"] == t1 and rows["b"]["wm"] == t2 and rows["c"]["run"] == "r2"
    # Spark read agrees
    got = {r["table_id"]: (r["wm"], r["run"]) for r in cat.read("state").collect()}
    assert got == {"a": (t1, "r1"), "b": (t2, "r2"), "c": (t2, "r2")}
    assert cat.read_rows("missing_table") is None


def test_merge_upsert_rows_over_spark_written_table(spark, tmp_path):
    """A legacy Spark-written state table upserts correctly through the
    driver-side path (mixed history)."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    sch = "k string, v string"
    cat.overwrite("cfg", spark.createDataFrame([("sig", "old"), ("other", "keep")], sch))
    cat.merge_upsert_rows("cfg", [("sig", "new")], keys=["k"], schema=sch)
    got = {r["k"]: r["v"] for r in cat.read("cfg").collect()}
    assert got == {"sig": "new", "other": "keep"}


def test_append_rows_pointer_shape_is_snapshot_versioned(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.append_rows("t", [("a", 1, 0.0, True, 1, None, None)], SCHEMA)
    meta = json.load(open(os.path.join(cat._tdir("t"), "_CURRENT")))
    assert meta["parts"] and meta["part_rows"] == [1] and meta.get("schema")
    v0 = meta["version"]
    cat.append_rows("t", [("b", 2, 0.0, True, 2, None, None)], SCHEMA)
    meta2 = json.load(open(os.path.join(cat._tdir("t"), "_CURRENT")))
    assert meta2["parts"] == [v0, meta2["version"]]  # immutable part history
