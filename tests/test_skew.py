"""Salted joins must be result-identical to plain joins while spreading
each hot key over n_salts partitions."""

import pytest
from pyspark.sql import functions as F

from duckdb_wasm_spark.skew import salted_join
from duckdb_wasm_spark.tables import load_tables


def test_salted_join_same_key_name(spark):
    """Identical key names on both sides must not be ambiguous."""
    left = spark.range(100).withColumnRenamed("id", "k")
    right = spark.range(10).withColumnRenamed("id", "k").withColumn(
        "tag", F.col("k") * 2
    )
    out = salted_join(left, right.select("k", "tag"), "k", "k", n_salts=4)
    assert out.count() == 10


def test_salted_join_rejects_right_full(spark):
    df = spark.range(5).withColumnRenamed("id", "k")
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError):
            salted_join(df, df, "k", "k", how=how)


def test_salted_join_matches_plain(spark, sf_dir):
    t = load_tables(spark, sf_dir, "lineitem", "orders")
    li = t["lineitem"].select("l_orderkey", "l_linenumber")
    orders = t["orders"].select("o_orderkey", "o_orderstatus")
    plain = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(li, orders, "l_orderkey", "o_orderkey", n_salts=8)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salt_actually_spreads(spark, sf_dir):
    """A hot key's rows must land in >1 salt bucket."""
    t = load_tables(spark, sf_dir, "lineitem", "orders")
    li = t["lineitem"]
    hot = li.groupBy("l_orderkey").count().orderBy(F.col("count").desc()).first()
    salted = salted_join(
        li, t["orders"], "l_orderkey", "o_orderkey", n_salts=8
    )
    # recompute the salts the utility assigns for the hot key
    salts = (
        li.where(F.col("l_orderkey") == hot["l_orderkey"])
        .select(
            F.pmod(
                F.hash(F.col("l_orderkey"), F.monotonically_increasing_id()),
                F.lit(8),
            ).alias("s")
        )
        .distinct()
        .count()
    )
    assert salts > 1 or hot["count"] == 1
