"""As-of and time-range joins — operators Spark's DataFrame API lacks
natively, built as compositions of built-ins (the task's preferred
path (a): never a Python kernel, never a cartesian product).

``asof_join``: each left row matched to the LATEST right row with
``right.ts <= left.ts`` within the same key (DuckDB ``ASOF JOIN``
semantics, which the oracle uses directly). Plan: union the two sides
with a side tag, one window pass per key ordered by (ts, side) carrying
the last-seen right payload forward, then keep left rows. ONE shuffle
on the key — no inequality join, no per-key sort-merge explosion; at
10^12 rows this is the only shape that survives (an inequality join
would be quadratic per key).

``time_range_join``: all (left, right) pairs with the same key and
``right.ts`` in ``[left.ts - window, left.ts]``. Plan: equi-join on
(key, time_bucket) with the left side exploded to the two candidate
buckets its window spans, then an exact range filter. Shuffles on
(key, bucket) — bounded fanout (2x), skew handled by AQE; this is the
bucketed-band pattern, not a theta join.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _orderable(dt) -> bool:
    """True iff Spark can ORDER BY a column of this type (maps are the
    unorderable case; arrays/structs inherit from their elements)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: List[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Inner as-of join (left rows without any prior right row drop,
    matching DuckDB ``ASOF JOIN``). ``right_cols`` are the right-side
    payload columns to carry (default: all but key/ts).

    Unorderable payload types (maps, and arrays/structs containing
    maps) are carried in the matched-row struct but EXCLUDED from the
    deterministic tie-break sort key — ordering by them would raise
    AnalysisException. Consequence: two right rows sharing (key, ts)
    AND identical on every orderable payload column but differing only
    in a map column are tie-broken arbitrarily; all other ties stay
    pinned."""
    if right_cols is None:  # explicit [] means 'carry only ts'
        right_cols = [c for c in right.columns if c not in (on, ts)]
    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.select(
        on, ts, *right_cols
    ).withColumn("_side", F.lit(0))
    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # ONE struct carries ts + all payload columns of the matched right
    # row together. Per-column F.last(col, ignorenulls=True) would skip
    # a NULL payload value in the matched row and smear in the value
    # from an EARLIER right row — output mixing two right rows, which
    # diverges from DuckDB ASOF JOIN (the pinned semantics: the matched
    # row is carried wholly, NULLs included). The struct itself is only
    # NULL on left rows, so ignorenulls finds the latest right ROW, and
    # all fields unpack from that same row. Also one Window projection
    # instead of len(right_cols)+1, keeping the analyzed plan flat for
    # wide right sides.
    payload = F.when(
        F.col("_side") == 0,
        F.struct(F.col(ts).alias("_ts"), *[F.col(c) for c in right_cols]),
    )
    # ordering is PINNED three-deep: right rows sort before left at
    # equal ts (side 0 < 1 => '<=' semantics), and among right rows
    # sharing (key, ts) the greatest ORDERABLE-payload struct wins —
    # without the third key the matched row would depend on shuffle
    # order (nondeterministic output). Left rows all carry a NULL
    # tie-break struct, so the third key never reorders them relative
    # to each other. The tie-break struct contains only orderable
    # columns (a map-typed payload column in ORDER BY raises
    # AnalysisException); the carried payload struct keeps every column.
    rtypes = {f.name: f.dataType for f in right.schema.fields}
    tie_cols = [c for c in right_cols if _orderable(rtypes[c])]
    tiebreak = F.when(
        F.col("_side") == 0,
        F.struct(F.col(ts).alias("_ts"), *[F.col(c) for c in tie_cols]),
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), tiebreak.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(
        "_match", F.last(payload, ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("_side") == 1)
        .filter(F.col("_match").isNotNull())  # inner as-of
        .select(
            *left.columns,
            F.col("_match._ts").alias(f"{ts}{suffix}"),
            *[F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in right_cols],
        )
    )


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    window_seconds: int = 3600,
    right_cols: List[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """All pairs with ``left.ts - window <= right.ts <= left.ts`` per
    key, via bucketed equi-join (bucket width = the window, so a left
    row's admissible range spans at most 2 buckets)."""
    if right_cols is None:  # explicit [] means 'carry only ts'
        right_cols = [c for c in right.columns if c not in (on, ts)]
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    win_us = window_seconds * 1_000_000
    bucket = F.floor(us / win_us)

    r_b = right.select(
        F.col(on), F.col(ts).alias(f"{ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    ).withColumn(
        "_bucket",
        F.floor(F.unix_micros(F.col(f"{ts}{suffix}").cast("timestamp")) / win_us),
    )
    l_b = left.withColumn(
        "_bucket", F.explode(F.array(bucket - 1, bucket))
    )
    joined = l_b.join(r_b, [on, "_bucket"])
    r_us = F.unix_micros(F.col(f"{ts}{suffix}").cast("timestamp"))
    l_us = F.unix_micros(F.col(ts).cast("timestamp"))
    return joined.filter(
        (r_us <= l_us) & (r_us >= l_us - win_us)
    ).drop("_bucket")
