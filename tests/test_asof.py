"""As-of and time-range join operators vs hand expectations: '<='
boundary semantics, no-prior-match drop, window boundaries."""

import datetime as dt

from table_ocr_spark.operators.asof import asof_join, time_range_join

T0 = dt.datetime(2024, 6, 1, 12, 0, 0)


def m(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 100, m(10)),   # matches click at 10 (equal ts -> '<=')
            (1, 101, m(45)),   # matches click at 30
            (1, 102, m(5)),    # no prior click -> dropped (inner as-of)
            (2, 200, m(20)),   # matches user 2's click at 0
        ],
        "user_id long, event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 900, m(10)),
            (1, 901, m(30)),
            (2, 902, m(0)),
            (3, 903, m(0)),    # other key: never leaks
        ],
        "user_id long, event_id long, ts timestamp",
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _frames(spark)
    got = {r["event_id"]: r for r in asof_join(left, right, on="user_id").collect()}
    assert set(got) == {100, 101, 200}  # 102 dropped: no prior click
    assert got[100]["event_id_right"] == 900 and got[100]["ts_right"] == m(10)
    assert got[101]["event_id_right"] == 901 and got[101]["ts_right"] == m(30)
    assert got[200]["event_id_right"] == 902


def test_time_range_join_boundaries(spark):
    left, right = _frames(spark)
    got = time_range_join(
        left, right, on="user_id", window_seconds=1800
    ).collect()
    pairs = {(r["event_id"], r["event_id_right"]) for r in got}
    # purchase@45 window [15,45] -> click@30 only;
    # purchase@10 window [-20,10] -> click@10 (inclusive upper bound);
    # purchase@20 (user2) window [-10,20] -> click@0 (exactly -20min in? 0 >= 20-30 ✓)
    assert pairs == {(101, 901), (100, 900), (200, 902)}


def test_asof_never_cartesian(spark):
    left, right = _frames(spark)
    plan = asof_join(left, right, on="user_id")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "Window" in plan


def test_asof_null_payload_from_matched_row_not_smeared(spark):
    # ADVICE (round 1): per-column last(ignorenulls) carried a non-NULL
    # value from an EARLIER right row when the matched row's payload
    # column was NULL — mixing two right rows. DuckDB ASOF JOIN returns
    # the matched row wholly, NULL included; so must we.
    left = spark.createDataFrame(
        [(1, m(40))], "user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, m(10), "early", 7),
            (1, m(30), None, None),  # the as-of match: payload is NULL
        ],
        "user_id long, ts timestamp, tag string, v long",
    )
    rows = asof_join(left, right, on="user_id").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["ts_right"] == m(30)
    assert r["tag_right"] is None       # not "early"
    assert r["v_right"] is None         # not 7


def test_asof_duplicate_ts_right_rows_deterministic(spark):
    # among right rows sharing (key, ts) the greatest payload struct is
    # the pinned winner — repartitioning must not change the match
    left = spark.createDataFrame([(1, m(20))], "user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, m(10), "a", 1), (1, m(10), "b", 2), (1, m(10), "b", 1)],
        "user_id long, ts timestamp, tag string, v long",
    )
    expect = ("b", 2)  # greatest (ts, tag, v) struct
    for reparted in (right, right.repartition(7), right.repartition(1)):
        rows = asof_join(left, reparted, on="user_id").collect()
        assert len(rows) == 1
        assert (rows[0]["tag_right"], rows[0]["v_right"]) == expect


def test_asof_empty_right_cols_carries_only_ts(spark):
    left = spark.createDataFrame([(1, 9, m(20))], "user_id long, x long, ts timestamp")
    right = spark.createDataFrame(
        [(1, m(10), "payload")], "user_id long, ts timestamp, tag string"
    )
    out = asof_join(left, right, on="user_id", right_cols=[])
    assert out.columns == ["user_id", "x", "ts", "ts_right"]
    assert out.collect()[0]["ts_right"] == m(10)


def test_asof_map_typed_payload_carried(spark):
    # ADVICE (round 2): ordering the window by the whole payload struct
    # required every right column to be orderable — a map-typed payload
    # raised AnalysisException. Maps now ride in the carried struct but
    # stay out of the tie-break sort key.
    from pyspark.sql import functions as F

    left = spark.createDataFrame([(1, m(20))], "user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, m(10), "x")], "user_id long, ts timestamp, tag string"
    ).withColumn("attrs", F.create_map(F.lit("k"), F.lit("v")))
    rows = asof_join(left, right, on="user_id").collect()
    assert len(rows) == 1
    assert rows[0]["tag_right"] == "x"
    assert rows[0]["attrs_right"] == {"k": "v"}
    # determinism among (key, ts) ties still pinned by orderable cols
    right2 = right.unionByName(
        spark.createDataFrame(
            [(1, m(10), "z")], "user_id long, ts timestamp, tag string"
        ).withColumn("attrs", F.create_map(F.lit("k"), F.lit("w")))
    )
    for reparted in (right2, right2.repartition(5)):
        got = asof_join(left, reparted, on="user_id").collect()
        assert got[0]["tag_right"] == "z"
