"""Stretch operator classes the reference ENGINE supports but its
shipped workload never exercises (SURVEY §2.5 windows, §2.7 set ops,
§2.3 note on FULL OUTER/CROSS; "all are Spark built-ins if we extend").
Registered so the coverage inventory has a green query per class.

All plain built-ins; oracles are the same ANSI SQL in DuckDB.

Scale notes: ranking windows shuffle by the partition key then sort
within partitions (bounded by partition size, not table size); set ops
are hash-based (union = no shuffle until the next op; intersect/except
→ one shuffle each); rollup is a grouping-sets expansion feeding one
hash aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_wasm_spark.plans._util import dec, dsum, sql_dec, sql_dsum
from duckdb_wasm_spark.tables import load_table, load_tables

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def _q(name):
    def reg(fn):
        QUERIES[name] = fn
        return fn

    return reg


# ----------------------------------------------------- extra_window_rank
@_q("extra_window_rank")
def extra_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 orders by totalprice within each order
    priority (row_number; ties broken by o_orderkey so the pick is
    total)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
    )


ORACLE["extra_window_rank"] = """
select o_orderpriority, rn, o_orderkey, o_totalprice
from (
  select o_orderpriority, o_orderkey, o_totalprice,
         row_number() over (partition by o_orderpriority
                            order by o_totalprice desc, o_orderkey asc) rn
  from orders)
where rn <= 3
"""


# ------------------------------------------------------ extra_window_lag
@_q("extra_window_lag")
def extra_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window: per-user event-to-event value delta via lag()
    (restricted to user_id < 20 to keep the result compact)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return (
        ev.where(F.col("user_id") < 20)
        .select(
            "user_id",
            "event_id",
            (dec("value") - F.lag(dec("value")).over(w))
            .cast("double")
            .alias("delta"),
        )
    )


ORACLE["extra_window_lag"] = f"""
select user_id, event_id,
       cast({sql_dec('value')}
            - lag({sql_dec('value')}) over (partition by user_id
                                            order by event_id) as double)
         delta
from events
where user_id < 20
"""


# --------------------------------------------------------- extra_set_ops
@_q("extra_union_all")
def extra_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "supplier")
    a = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    b = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return a.unionAll(b).groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n")
    )


ORACLE["extra_union_all"] = """
select nationkey, count(*) n from (
  select c_nationkey nationkey from customer
  union all
  select s_nationkey from supplier)
group by 1
"""


@_q("extra_intersect")
def extra_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations having both customers with high balance and suppliers
    with high balance (INTERSECT = distinct set semantics)."""
    t = load_tables(spark, sf_dir, "customer", "supplier")
    a = t["customer"].where(F.col("c_acctbal") > 5000).select(
        F.col("c_nationkey").alias("nationkey")
    )
    b = t["supplier"].where(F.col("s_acctbal") > 5000).select(
        F.col("s_nationkey").alias("nationkey")
    )
    return a.intersect(b)


ORACLE["extra_intersect"] = """
select c_nationkey nationkey from customer where c_acctbal > 5000
intersect
select s_nationkey from supplier where s_acctbal > 5000
"""


@_q("extra_except")
def extra_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "supplier")
    a = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    b = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return a.exceptAll(b).groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n")
    )


ORACLE["extra_except"] = """
select nationkey, count(*) n from (
  select c_nationkey nationkey from customer
  except all
  select s_nationkey from supplier)
group by 1
"""


# ---------------------------------------------------------- extra_rollup
@_q("extra_rollup")
def extra_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) with exact decimal sums —
    grouping-sets expansion into one hash aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(dec("l_quantity")).alias("sum_qty"),
        )
    )


ORACLE["extra_rollup"] = f"""
select l_returnflag, l_linestatus, count(*) n,
       {sql_dsum(sql_dec('l_quantity'))} sum_qty
from lineitem
group by rollup (l_returnflag, l_linestatus)
"""


# ------------------------------------------------------ extra_full_outer
@_q("extra_full_outer")
def extra_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of per-nation customer vs supplier counts (some
    nations lack one side at small SF)."""
    t = load_tables(spark, sf_dir, "customer", "supplier")
    c = (
        t["customer"]
        .where(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("cn"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        t["supplier"]
        .where(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("sn"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, F.col("cn") == F.col("sn"), "full_outer")
        .select(
            F.coalesce(F.col("cn"), F.col("sn")).alias("nationkey"),
            "n_cust",
            "n_supp",
        )
    )


ORACLE["extra_full_outer"] = """
with c as (select c_nationkey cn, count(*) n_cust from customer
           where c_acctbal > 9000 group by 1),
s as (select s_nationkey sn, count(*) n_supp from supplier
      where s_acctbal > 9000 group by 1)
select coalesce(cn, sn) nationkey, n_cust, n_supp
from c full outer join s on cn = sn
"""
