"""Stateful streaming sessionization — the custom-stateful-operator
pattern (`applyInPandasWithState`) the reference never needed (its only
"streaming" is a 60 s polling loop, ``table_ocr/batch.py:221-247``) but
a production event pipeline does.

Per user, events are folded into gap-delimited sessions; a session
CLOSES when the next event arrives more than ``gap_seconds`` later, and
the still-open session is carried in group state across micro-batches
(so a restart from checkpoint resumes mid-session). Emission is
append-mode: only closed sessions are output.

Batch equivalence: the ``sessionize`` query in ``__spark_entry__``
(lag + cumulative-sum windows) computes the same sessions over a
static table; this operator is its incremental twin.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)
# open-session state: (start_us, last_us, n_events)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("cnt", T.LongType()),
    ]
)


def _make_fn(gap_us: int):
    def fn(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start, last, cnt = state.get
        else:
            start = last = None
            cnt = 0
        parts = [pdf["ts"] for pdf in pdfs]
        ts = pd.concat(parts).sort_values() if parts else pd.Series([], dtype="datetime64[ns]")
        closed = []
        for t in ts:
            if pd.isna(t):
                continue  # null ts carries no order information: dropped
            us = t.value // 1000  # pandas ns -> us
            if start is None:
                start, last, cnt = us, us, 1
            elif us - last > gap_us:
                closed.append((user_id, start, last, cnt))
                start, last, cnt = us, us, 1
            else:
                # a LATE event (us <= last, possible across micro-batches
                # — the stream carries no watermark) folds into the open
                # session WITHOUT regressing `last` (which would corrupt
                # the span and prematurely close on the next on-time
                # event) and may extend the session start backwards
                if us > last:
                    last = us
                if us < start:
                    start = us
                cnt += 1
        if start is not None:
            state.update((int(start), int(last), int(cnt)))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": pd.to_datetime([c[1] for c in closed], unit="us"),
                    "session_end": pd.to_datetime([c[2] for c in closed], unit="us"),
                    "n_events": [c[3] for c in closed],
                }
            )

    return fn


def streaming_sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """``events`` must be a STREAMING DataFrame with (user_id, ts).
    Returns the append-mode stream of closed sessions."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_fn(gap_seconds * 1_000_000),
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def streaming_hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window rollup (late data beyond the
    watermark is dropped; state for closed windows is reclaimed).
    Batch twin: the ``hourly_event_rollup`` query."""
    from pyspark.sql import functions as F

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("hour_ts"), "event_type", "n_events")
    )
