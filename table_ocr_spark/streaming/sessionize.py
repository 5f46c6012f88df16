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
static table; this operator is its incremental twin. Two documented
deviations, both inherent to append-mode without a watermark:

- an event so late that its session was ALREADY EMITTED in an earlier
  micro-batch cannot retract it — the event starts (or joins) a new
  session instead; everything still in hand (carried state + the
  batch) gets exact batch semantics via an interval-merge fold;
- by default the FINAL open session per user is never emitted
  (NoTimeout: state only advances on new data for that key). Pass
  ``idle_flush_seconds`` to close it by idleness instead: a
  ProcessingTimeTimeout flushes any session whose user has been quiet
  for that long (wall clock, so a later very-late event for the user
  starts a NEW session — the already-emitted deviation above). For a
  bounded drain where exact trailing sessions matter, run the batch
  twin over the full table — the streaming contract is the
  infinite-stream shape.
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


def _make_fn(gap_us: int, idle_flush_ms: int | None = None):
    def fn(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if idle_flush_ms is not None and state.hasTimedOut:
            # invoked with NO new data for this key: the user has been
            # idle past the flush horizon — emit the open session and
            # drop the state (a later event starts a new session)
            if state.exists:
                start, last, cnt = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_start": pd.to_datetime([start], unit="us"),
                        "session_end": pd.to_datetime([last], unit="us"),
                        "n_events": [cnt],
                    }
                )
            return
        if state.exists:
            start, last, cnt = state.get
        else:
            start = last = None
            cnt = 0
        parts = [pdf["ts"] for pdf in pdfs]
        ts = pd.concat(parts).sort_values() if parts else pd.Series([], dtype="datetime64[ns]")
        # interval-merge fold — the batch twin's gap algorithm applied
        # to (carried open interval + this batch's events) in TIME
        # order, so late events (the stream carries no watermark) get
        # exactly batch semantics over everything still in hand: an
        # event within gap of the open session folds in (possibly
        # extending start backwards by at most gap), a chain of very
        # late events forms its OWN gap-delimited sessions, and a
        # chain that reaches within gap of the open session merges
        # into it. What append mode cannot do is retract sessions
        # already emitted in earlier micro-batches — an event later
        # than that is the documented deviation from the batch twin.
        items = []
        for t in ts:
            if pd.isna(t):
                continue  # null ts carries no order information: dropped
            us = t.value // 1000  # pandas ns -> us
            items.append((us, us, 1))
        if start is not None:
            import bisect

            bisect.insort(items, (start, last, cnt))
        closed = []
        cur = None
        for s, e, c in items:
            if cur is None:
                cur = [s, e, c]
            elif s - cur[1] > gap_us:
                closed.append((user_id, cur[0], cur[1], cur[2]))
                cur = [s, e, c]
            else:
                cur[1] = max(cur[1], e)
                cur[2] += c
        if cur is not None:
            state.update((int(cur[0]), int(cur[1]), int(cur[2])))
            if idle_flush_ms is not None:
                # timeouts are cleared on every invocation for the key;
                # re-arm so the open session flushes after idleness
                state.setTimeoutDuration(idle_flush_ms)
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


def streaming_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    idle_flush_seconds: int | None = None,
) -> DataFrame:
    """``events`` must be a STREAMING DataFrame with (user_id, ts).
    Returns the append-mode stream of closed sessions.

    ``idle_flush_seconds``: if set, a user's open session is flushed
    after that much PROCESSING time with no new events for the user
    (state is removed, so memory is bounded by active users rather
    than all users ever seen). The engine keeps running no-data
    micro-batches while timers are armed, so the flush fires even if
    no further events ever arrive — which is also why this mode is
    for CONTINUOUSLY-RUNNING streams only: under
    ``trigger(availableNow=True)`` those timer batches prevent the
    drain from ever terminating (observed on Spark 4.1; the bounded
    drain's answer is the batch twin, per the module docstring)."""
    if idle_flush_seconds is not None and idle_flush_seconds <= 0:
        raise ValueError("idle_flush_seconds must be positive")
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_flush_seconds is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    idle_ms = None if idle_flush_seconds is None else idle_flush_seconds * 1000
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_fn(gap_seconds * 1_000_000, idle_ms),
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            timeout,
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
