"""Unit semantics of the generic as-of join (the registered
attribution/range queries are parity-checked in test_operators): LEFT
nulls when nothing precedes, inclusive same-instant match, latest-wins
among multiple candidates, deterministic tie-break."""

import datetime as dt

from pyspark.sql import functions as F

from duckdb_wasm_spark.operators.temporal import asof_join


def _t(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    quotes = spark.createDataFrame(
        [
            (1, _t("2024-01-01 10:00:00"), 100.0, 1),
            (1, _t("2024-01-01 10:05:00"), 101.0, 2),
            # two quotes at the same instant: tie_break picks qid 4
            (1, _t("2024-01-01 10:10:00"), 102.0, 3),
            (1, _t("2024-01-01 10:10:00"), 103.0, 4),
            (2, _t("2024-01-01 09:00:00"), 50.0, 5),
        ],
        "sym int, ts timestamp, px double, qid int",
    )
    trades = spark.createDataFrame(
        [
            (1, _t("2024-01-01 10:04:00"), "a"),   # -> 100.0
            (1, _t("2024-01-01 10:05:00"), "b"),   # same instant -> 101.0
            (1, _t("2024-01-01 10:20:00"), "c"),   # -> tie winner 103.0
            (2, _t("2024-01-01 08:00:00"), "d"),   # nothing before -> NULL
            (3, _t("2024-01-01 12:00:00"), "e"),   # key never quoted -> NULL
        ],
        "sym int, ts timestamp, tid string",
    )
    out = asof_join(
        trades,
        quotes,
        on=["sym"],
        right_cols=["px", "qid"],
        tie_break=["qid"],
    )
    got = {r.tid: (r.px, r.qid) for r in out.collect()}
    assert got == {
        "a": (100.0, 1),
        "b": (101.0, 2),
        "c": (103.0, 4),
        "d": (None, None),
        "e": (None, None),
    }
    assert out.count() == trades.count()  # every left row survives


def test_asof_join_single_shuffle(spark):
    quotes = spark.createDataFrame(
        [(1, _t("2024-01-01 10:00:00"), 1.0)], "sym int, ts timestamp, px double"
    )
    trades = spark.createDataFrame(
        [(1, _t("2024-01-01 11:00:00"), "x")], "sym int, ts timestamp, tid string"
    )
    plan = (
        asof_join(trades, quotes, on=["sym"], right_cols=["px"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "Join" not in plan


def test_range_join_semantics(spark):
    pts = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 25.0), (4, -1.0)], "pid int, v double"
    )
    iv = spark.createDataFrame(
        [(0, 0.0, 10.0), (1, 10.0, 20.0)], "band int, lo double, hi double"
    )
    from duckdb_wasm_spark.operators.temporal import range_join

    inner = {
        (r.pid, r.band) for r in range_join(pts, iv, "v").collect()
    }
    assert inner == {(1, 0), (2, 1)}  # hi-exclusive; out-of-range drop
    left = range_join(pts, iv, "v", how="left")
    assert left.count() == 4  # unmatched points survive with NULL band
    plan = left._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # tiny side broadcast
    import pytest

    with pytest.raises(ValueError):
        range_join(pts, iv, "v", how="full")
