"""Streaming sessionization over the events stream.

Two formulations, chosen Spark-first:

- ``streaming_sessionize`` — the BUILT-IN path: ``withWatermark`` +
  ``F.session_window(ts, gap)`` grouped aggregation. Catalyst owns the state
  store, late-data handling, and session merging; this is the right answer
  whenever window bounds + aggregates are all you need.

- ``streaming_sessionize_stateful`` — ``applyInPandasWithState`` for the one
  thing the built-in cannot express: a stable per-user session ORDINAL
  (``session_seq`` 1,2,3… in event-time order), matching the batch
  ``sessionization`` operator (plans/testdata_queries.py:q_sessionization)
  so a streaming consumer can join against batch-produced history. State per
  user = (next_seq, open-session aggregate); a session closes — and only
  then emits — when a gap > ``gap_seconds`` arrives or the state times out
  past the watermark. Out-of-order events inside the watermark are handled
  by sorting each micro-batch group before folding AND, across micro-batch
  boundaries, by only ever WIDENING the open session (start=min, end=max) —
  a late event never moves the session end backwards, so a following
  on-time event cannot see a spurious gap. Known limit (documented, same as
  the built-in's append mode): a late event older than one gap before the
  open session's start merges into the open session rather than reopening
  an already-emitted one — emitted ordinals stay stable.

At 100 TB the stream is partitioned by user_id into the state store exactly
like the batch window partitions; state size is O(open sessions), not
O(events).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_seq", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("next_seq", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def streaming_sessionize(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Built-in session windows: one row per closed session (append mode emits
    a session once the watermark passes its close)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("session"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(38,6)")), 4).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def _sessionize_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Tuple[Any], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # watermark passed: flush the open session and drop the state
            next_seq, n_ev, total, start_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_seq": [next_seq - 1],
                    "n_events": [n_ev],
                    "total_value": [total],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                }
            )
            return

        rows = pd.concat(list(pdfs)).sort_values("ts")
        if state.exists:
            next_seq, n_ev, total, start_us, last_us = state.get
        else:
            next_seq, n_ev, total, start_us, last_us = 1, 0, 0.0, None, None

        out: dict[str, list] = {k: [] for k in ("user_id", "session_seq", "n_events", "total_value", "session_start", "session_end")}
        for ts, value in zip(rows["ts"], rows["value"]):
            ts_us = int(pd.Timestamp(ts).value // 1000)
            if n_ev > 0 and ts_us - last_us > gap_us:
                out["user_id"].append(user_id)
                out["session_seq"].append(next_seq - 1)  # ordinal assigned at open
                out["n_events"].append(n_ev)
                out["total_value"].append(total)
                out["session_start"].append(pd.Timestamp(start_us, unit="us"))
                out["session_end"].append(pd.Timestamp(last_us, unit="us"))
                n_ev, total = 0, 0.0
            if n_ev == 0:
                start_us = last_us = ts_us
                next_seq += 1
            else:
                # out-of-order event (inside the watermark) that sorts before
                # the open session's end — or before its start across a
                # micro-batch boundary: extend the session in BOTH directions;
                # never move its end backwards (a later on-time event would
                # otherwise see a spurious gap and wrongly split the session).
                start_us = min(start_us, ts_us)
                last_us = max(last_us, ts_us)
            n_ev += 1
            total += float(value) if value is not None else 0.0

        state.update((next_seq, n_ev, total, start_us, last_us))
        # keep the open session alive one gap past the newest event
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        if out["user_id"]:
            yield pd.DataFrame(out)

    return fn


def streaming_sessionize_stateful(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "1 hour"
) -> DataFrame:
    """Custom stateful sessionization with stable per-user session ordinals
    (the built-in session_window cannot number sessions). Sessions emit when
    CLOSED — by an in-stream gap, or by event-time timeout once the watermark
    moves one gap past the open session's last event."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
