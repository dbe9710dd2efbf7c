"""Co-located bucketed joins: after bucketing lineitem and orders on
the order key, their join must plan with NO shuffle exchange on either
side (the 100 TB repeated-join layout), and results must match the
unbucketed join."""

import pytest
from pyspark.sql import functions as F

from duckdb_wasm_spark.tables import load_table, write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # managed tables land in the session's warehouse dir (static conf);
    # DROP TABLE/DATABASE below removes the files
    write_bucketed(
        spark,
        sf_dir,
        {"lineitem": "l_orderkey", "orders": "o_orderkey"},
        n_buckets=4,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS bucketed.lineitem")
    spark.sql("DROP TABLE IF EXISTS bucketed.orders")
    spark.sql("DROP DATABASE IF EXISTS bucketed")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    li = spark.table("bucketed.lineitem")
    orders = spark.table("bucketed.orders")
    # disable broadcast so the join strategy decision is about buckets,
    # not table size at toy SF
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    join_part = plan.split("HashAggregate")[-1]  # below the final agg
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in join_part, (
        "bucketed join re-shuffled a bucketed side:\n" + join_part[:2000]
    )


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed):
    li_b = spark.table("bucketed.lineitem")
    o_b = spark.table("bucketed.orders")
    got = (
        li_b.join(o_b, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    want = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
