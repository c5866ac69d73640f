"""Streaming sessionization: built-in session_window path + the
applyInPandasWithState stateful path (stable per-user session ordinals)."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
import pytest

from sql_identity_resolution_spark.datagen import write_parquet

EVENTS_DDL = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _events(rows):
    return pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "user_id": [r[2] for r in rows],
            "event_type": ["click"] * len(rows),
            "value": [r[3] for r in rows],
        }
    )


@pytest.fixture()
def stream_dirs(tmp_path):
    ind = tmp_path / "in"
    ind.mkdir()
    t = datetime
    # batch 1: user 1 session#1 (2 events), user 2 session#1 (1 event)
    write_parquet(
        _events([
            (1, t(2026, 1, 1, 10, 0), 1, 1.5),
            (2, t(2026, 1, 1, 10, 10), 1, 2.5),
            (3, t(2026, 1, 1, 10, 5), 2, 7.0),
        ]),
        str(ind / "b1.parquet"),
    )
    # batch 2: user 1 opens session#2 (gap > 30min closes #1 in-stream);
    # user 2 opens session#2 with two events
    write_parquet(
        _events([
            (4, t(2026, 1, 1, 12, 0), 1, 4.0),
            (5, t(2026, 1, 1, 11, 50), 2, 1.0),
            (6, t(2026, 1, 1, 11, 55), 2, 2.0),
        ]),
        str(ind / "b2.parquet"),
    )
    # batch 3: far-future event pushes the watermark past every open session
    write_parquet(_events([(7, t(2026, 1, 1, 20, 0), 99, 0.0)]), str(ind / "b3.parquet"))
    return ind, tmp_path


def _run_stream(spark, df, ckpt, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_streaming_sessionize_stateful(spark, stream_dirs):
    from sql_identity_resolution_spark.streaming.sessions import streaming_sessionize_stateful

    ind, tmp = stream_dirs
    events = (
        spark.readStream.schema(EVENTS_DDL).option("maxFilesPerTrigger", 1).parquet(str(ind))
    )
    out = streaming_sessionize_stateful(events, gap_seconds=1800, watermark="0 seconds")
    rows = _run_stream(spark, out, str(tmp / "ck1"), "sess_stateful")
    got = {(r["user_id"], r["session_seq"]): (r["n_events"], round(r["total_value"], 4)) for r in rows}
    # user 1: session 1 = events 1,2 (closed in-stream by the 12:00 event);
    #         session 2 = event 4 (closed by event-time timeout after b3)
    assert got[(1, 1)] == (2, 4.0)
    assert got[(1, 2)] == (1, 4.0)
    # user 2: session 1 = event 3; session 2 = events 5,6
    assert got[(2, 1)] == (1, 7.0)
    assert got[(2, 2)] == (2, 3.0)
    # user 99's session is still open -> never emitted
    assert not any(u == 99 for u, _ in got)


def test_streaming_sessionize_builtin(spark, stream_dirs):
    from sql_identity_resolution_spark.streaming.sessions import streaming_sessionize

    ind, tmp = stream_dirs
    events = (
        spark.readStream.schema(EVENTS_DDL).option("maxFilesPerTrigger", 1).parquet(str(ind))
    )
    out = streaming_sessionize(events, gap="30 minutes", watermark="0 seconds")
    rows = _run_stream(spark, out, str(tmp / "ck2"), "sess_builtin")
    got = {(r["user_id"], r["session_start"]): (r["n_events"], r["total_value"]) for r in rows}
    t = datetime
    assert got[(1, t(2026, 1, 1, 10, 0))] == (2, 4.0)
    assert got[(1, t(2026, 1, 1, 12, 0))] == (1, 4.0)
    assert got[(2, t(2026, 1, 1, 10, 5))] == (1, 7.0)
    assert got[(2, t(2026, 1, 1, 11, 50))] == (2, 3.0)
