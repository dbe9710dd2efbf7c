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


# ------------------------------------------------------------ extra_cube
@_q("extra_cube")
def extra_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderpriority, orderstatus): all four grouping levels
    in one grouping-sets expansion feeding a single hash aggregate.
    GROUPING markers (cast int both engines) disambiguate a cube NULL
    from a data NULL."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(dec("o_totalprice")).alias("sum_price"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
            F.grouping("o_orderstatus").cast("int").alias("g_stat"),
        )
        .select(
            "o_orderpriority", "o_orderstatus", "n", "sum_price",
            "g_prio", "g_stat",
        )
    )


ORACLE["extra_cube"] = f"""
select o_orderpriority, o_orderstatus, count(*) n,
       {sql_dsum(sql_dec('o_totalprice'))} sum_price,
       cast(grouping(o_orderpriority) as integer) g_prio,
       cast(grouping(o_orderstatus) as integer) g_stat
from orders
group by cube (o_orderpriority, o_orderstatus)
"""


# --------------------------------------------------- extra_window_frames
@_q("extra_window_frames")
def extra_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-clause window coverage beyond rank/lag: running decimal
    sum, ntile, first/last value over an explicit full frame, and lead
    with a default — one (custkey-partitioned, date+key-ordered) window
    family, single shuffle."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_custkey") % 1000 == 0
    )
    order_cols = [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    wo = Window.partitionBy("o_custkey").orderBy(*order_cols)
    running = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = wo.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(running).cast("double").alias(
            "run_price"
        ),
        F.ntile(4).over(wo).alias("quartile"),
        F.first("o_orderkey").over(full).alias("first_key"),
        F.last("o_orderkey").over(full).alias("last_key"),
        F.lead("o_orderkey", 1, -1).over(wo).alias("next_key"),
    )


ORACLE["extra_window_frames"] = f"""
select o_custkey, o_orderkey, o_orderdate,
       cast(sum({sql_dec('o_totalprice')}) over
            (partition by o_custkey order by o_orderdate, o_orderkey
             rows unbounded preceding) as double) run_price,
       ntile(4) over w quartile,
       first_value(o_orderkey) over
           (partition by o_custkey order by o_orderdate, o_orderkey
            rows between unbounded preceding and unbounded following)
           first_key,
       last_value(o_orderkey) over
           (partition by o_custkey order by o_orderdate, o_orderkey
            rows between unbounded preceding and unbounded following)
           last_key,
       coalesce(lead(o_orderkey, 1) over w, -1) next_key
from orders
where o_custkey % 1000 = 0
window w as (partition by o_custkey order by o_orderdate, o_orderkey)
"""


# ------------------------------------------------------ extra_string_fns
@_q("extra_string_fns")
def extra_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String + regex scalar-function corpus: case mapping, trim/pad,
    replace, split, search, slicing, levenshtein, regex extract /
    global replace / match-flag — one narrow projection (regex columns
    folded in from the former extra_regex_fns: same table, same filter,
    so one registered query carries both corpora; the single-purpose
    originals remain pytest-gated in ALL_QUERIES)."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") <= 200
    )
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.length("c_name").alias("name_len"),
        F.lpad("c_name", 25, "*").alias("padded"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
            "replaced"
        ),
        F.size(F.split("c_name", "#")).alias("n_parts"),
        F.instr(F.col("c_name"), "#").alias("hash_at"),
        F.reverse(F.col("c_mktsegment")).alias("rev"),
        F.substring("c_mktsegment", 2, 3).alias("seg_mid"),
        F.repeat(F.lit("ab"), 3).alias("rep"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("lev"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("joined"),
        F.regexp_extract("c_name", r"(\d+)", 1).alias("digits"),
        F.regexp_replace("c_name", r"0+", "#").alias("zero_runs"),
        F.col("c_name").rlike(r"Customer#0*1\d$").cast("int").alias(
            "ends_teenish"
        ),
    )


ORACLE["extra_string_fns"] = r"""
select c_custkey,
       upper(c_name) up,
       lower(c_mktsegment) lo,
       length(c_name) name_len,
       lpad(c_name, 25, '*') padded,
       replace(c_name, 'Customer', 'Cust') replaced,
       len(string_split(c_name, '#')) n_parts,
       instr(c_name, '#') hash_at,
       reverse(c_mktsegment) rev,
       substring(c_mktsegment, 2, 3) seg_mid,
       repeat('ab', 3) rep,
       levenshtein(c_mktsegment, 'BUILDING') lev,
       concat_ws('|', c_mktsegment, c_name) joined,
       regexp_extract(c_name, '(\d+)', 1) digits,
       regexp_replace(c_name, '0+', '#', 'g') zero_runs,
       cast(regexp_matches(c_name, 'Customer#0*1\d$') as integer)
           ends_teenish
from customer
where c_custkey <= 200
"""


# -------------------------------------------------------- extra_date_fns
@_q("extra_date_fns")
def extra_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date scalar-function corpus: truncation, month arithmetic with
    end-of-month clamping, day arithmetic, diffs, and part extraction."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") <= 400
    )
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        d.alias("d"),
        F.trunc(d, "month").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.add_months(d, 2).alias("plus_2mo"),
        F.date_add(d, 30).alias("plus_30d"),
        F.datediff(F.lit("1998-12-01").cast("date"), d).alias("days_to_cut"),
        F.year(d).alias("y"),
        F.quarter(d).alias("q"),
        (F.dayofweek(d) - 1).alias("dow_sun0"),
        F.dayofyear(d).alias("doy"),
    )


ORACLE["extra_date_fns"] = """
select o_orderkey,
       od d,
       cast(date_trunc('month', od) as date) month_start,
       last_day(od) month_end,
       cast(od + interval 2 month as date) plus_2mo,
       od + 30 plus_30d,
       cast(datediff('day', od, date '1998-12-01') as integer) days_to_cut,
       cast(year(od) as integer) y,
       cast(quarter(od) as integer) q,
       cast(dayofweek(od) as integer) dow_sun0,
       cast(dayofyear(od) as integer) doy
from (select o_orderkey, cast(o_orderdate as date) od from orders
      where o_orderkey <= 400)
"""


# ------------------------------------------------------- extra_quantiles
@_q("extra_quantiles")
def extra_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles (Spark `percentile` ≡ DuckDB
    `quantile_cont`: both index q·(n−1) into the sorted values and
    linearly interpolate — verified bit-equal on this corpus).

    Scale: exact percentile sorts each group's values; the scale path
    for wide groups is approx_percentile (t-digest sketch, no sort) —
    not registered because its sketch is engine-specific."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", 0.5).alias("med_qty"),
            F.percentile("l_quantity", 0.9).alias("p90_qty"),
            F.percentile("l_extendedprice", 0.25).alias("p25_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


ORACLE["extra_quantiles"] = """
select l_returnflag,
       quantile_cont(l_quantity, 0.5) med_qty,
       quantile_cont(l_quantity, 0.9) p90_qty,
       quantile_cont(l_extendedprice, 0.25) p25_price,
       count(*) n
from lineitem
group by l_returnflag
"""


# ------------------------------------------------------- extra_regex_fns
@_q("extra_regex_fns")
def extra_regex_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar corpus: extract, global replace, and match-flag.
    Patterns stay in the Java∩RE2 common subset (no backrefs or
    lookaround), where the engines agree."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") <= 200
    )
    return cust.select(
        "c_custkey",
        F.regexp_extract("c_name", r"(\d+)", 1).alias("digits"),
        F.regexp_replace("c_name", r"0+", "#").alias("zero_runs"),
        F.col("c_name").rlike(r"Customer#0*1\d$").cast("int").alias(
            "ends_teenish"
        ),
    )


ORACLE["extra_regex_fns"] = r"""
select c_custkey,
       regexp_extract(c_name, '(\d+)', 1) digits,
       regexp_replace(c_name, '0+', '#', 'g') zero_runs,
       cast(regexp_matches(c_name, 'Customer#0*1\d$') as integer)
           ends_teenish
from customer
where c_custkey <= 200
"""


# ------------------------------------------------------- extra_array_fns
@_q("extra_array_fns")
def extra_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation + functions: collect per-region nation names
    (sorted — collect order is partition-dependent, the sorted list is
    not), then join/index/membership. String-joined output so the
    value hash is representation-independent across engines."""
    nation = load_table(spark, sf_dir, "nation")
    sorted_names = F.array_sort(F.collect_list("n_name"))
    return (
        nation.groupBy("n_regionkey")
        .agg(
            F.array_join(sorted_names, ",").alias("names_csv"),
            F.size(sorted_names).cast("int").alias("n_nations"),
            F.element_at(sorted_names, 1).alias("first_name"),
            F.array_contains(F.collect_list("n_name"), "NATION_7")
            .cast("int")
            .alias("has_7"),
        )
    )


ORACLE["extra_array_fns"] = """
select n_regionkey,
       array_to_string(list_sort(list(n_name)), ',') names_csv,
       cast(len(list(n_name)) as integer) n_nations,
       list_sort(list(n_name))[1] first_name,
       cast(list_contains(list(n_name), 'NATION_7') as integer) has_7
from nation
group by n_regionkey
"""


# -------------------------------------------------------- extra_json_fns
@_q("extra_json_fns")
def extra_json_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction over the events.props JSON column
    (JSONPath `$.k`), feeding typed aggregation — path extraction and
    the cast both stay JVM-side (get_json_object)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return (
        ev.select("event_type", k.alias("k_str"), k.cast("int").alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k_str").alias("min_k_str"),
            F.max("k_str").alias("max_k_str"),
        )
    )


ORACLE["extra_json_fns"] = """
select event_type, count(*) n,
       cast(sum(cast(json_extract_string(props, '$.k') as integer))
            as bigint) sum_k,
       min(json_extract_string(props, '$.k')) min_k_str,
       max(json_extract_string(props, '$.k')) max_k_str
from events
group by event_type
"""


# ------------------------------------------------------ extra_variant_json
@_q("extra_variant_json")
def extra_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT-typed semi-structured extraction over
    events.props: parse_json builds the binary variant encoding ONCE,
    then variant_get does typed path extraction from the encoded form
    — the modern scale path for JSON columns (the string is parsed
    once per row, not once per extraction; shredded variant columns
    push this into the scan at the storage layer). Same aggregate
    surface as extra_json_fns' string-path version so the two gates
    pin identical semantics through both APIs; absent-path extraction
    must yield NULL, pinned by n_missing == n.

    Oracle: DuckDB json_extract on the raw string — variant encoding
    is representation, not semantics."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    ).select(
        "event_type",
        F.expr("variant_get(v, '$.k', 'int')").alias("k"),
        F.expr("variant_get(v, '$.absent', 'int')").alias("absent"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("long").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count(F.when(F.col("absent").isNull(), 1)).alias("n_missing"),
    )


ORACLE["extra_variant_json"] = """
select event_type, count(*) n,
       cast(sum(cast(json_extract_string(props, '$.k') as integer))
            as bigint) sum_k,
       min(cast(json_extract_string(props, '$.k') as integer)) min_k,
       max(cast(json_extract_string(props, '$.k') as integer)) max_k,
       count(case when json_extract_string(props, '$.absent') is null
                  then 1 end) n_missing
from events
group by event_type
"""


# ----------------------------------------------------------- extra_pivot
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@_q("extra_pivot")
def extra_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event counts spread into one column per event
    type (explicit value list — Spark then skips the extra distinct
    scan, and the output schema is static as the oracle requires)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves absent combinations NULL; the conditional-aggregation
    # oracle counts them as 0. n_-prefixed aliases: a bare `view` column
    # name is a reserved word on the oracle side
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES],
    )


ORACLE["extra_pivot"] = f"""
select user_id,
       {', '.join(f"count(case when event_type = '{t}' then 1 end) n_{t}"
                  for t in _EVENT_TYPES)}
from events
where user_id < 50
group by user_id
"""


# -------------------------------------------------- extra_recursive_walk
_RECURSIVE_WALK_SQL = """
WITH RECURSIVE edges AS (
  SELECT n_regionkey region, n_nationkey src,
         lead(n_nationkey) OVER (PARTITION BY n_regionkey
                                 ORDER BY n_nationkey) dst
  FROM nation),
heads AS (
  SELECT n_regionkey region, min(n_nationkey) head FROM nation GROUP BY 1),
walk(region, nationkey, depth) AS (
  SELECT region, head, 0 FROM heads
  UNION ALL
  SELECT w.region, e.dst, w.depth + 1
  FROM walk w JOIN edges e ON e.region = w.region AND e.src = w.nationkey
  WHERE e.dst IS NOT NULL)
SELECT region, nationkey, depth FROM walk
"""


@_q("extra_recursive_walk")
def extra_recursive_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 UnionLoop): walk each region's nation
    chain via precomputed successor edges, one depth level per
    iteration. The IDENTICAL SQL text is the oracle — the engines'
    recursive-CTE semantics are compared directly. The correlated work
    lives OUTSIDE the recursion (a lead() window builds the successor
    edges once); the recursive step is then a plain equi-join, the
    shape Spark's recursion supports and the shape that scales (each
    iteration shuffles only the frontier).

    Job-floor measurement (round-5 verdict task #5): the ~1s wall at
    sf0.1 vs DuckDB's 0.01s is per-iteration DRIVER scheduling —
    UnionLoop replans and schedules each depth level as its own job.
    Swept at sf0.1/local[32], best-of-3: baseline 1.33s;
    shuffle.partitions=1 → 1.06s; AQE initialPartitionNum=1 → 0.97s;
    AQE off → 1.41s; edges/heads pre-materialized via localCheckpoint
    outside the loop (loop body no longer rescans parquet or re-runs
    the window) → 1.15s; /*+ COALESCE(1) */ inside the recursive
    member → 1.41s. Nothing reaches 0.4s: the floor is the sequential
    per-level job round-trip, irreducible without collapsing the
    recursion driver-side (a .collect() loop — a scale anti-pattern
    this repo bans). Kept the config-free single-SQL form; the gap is
    fixed overhead, flat in data size."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(_RECURSIVE_WALK_SQL)


ORACLE["extra_recursive_walk"] = _RECURSIVE_WALK_SQL


# -------------------------------------------------- extra_bool_argmax
@_q("extra_bool_argmax")
def extra_bool_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (bool_and/bool_or) and argmin/argmax
    (max_by/min_by ≡ arg_max/arg_min). The ordering key encodes
    (price cents, orderkey) into one bigint — this engine's arg_max
    takes only scalar keys, and a composite integer key makes the
    pick total (price ties broken by key) so both engines select the
    identical row."""
    orders = load_table(spark, sf_dir, "orders")
    key = (
        F.round(F.col("o_totalprice") * 100).cast("long") * F.lit(10_000_000)
        + F.col("o_orderkey")
    )
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.bool_and(F.col("o_totalprice") > 100000).alias("all_big"),
            F.bool_or(F.col("o_orderstatus") == "F").alias("any_f"),
            F.max_by("o_orderkey", key).alias("top_key"),
            F.min_by("o_orderkey", key).alias("bot_key"),
        )
    )


ORACLE["extra_bool_argmax"] = """
select o_orderpriority,
       bool_and(o_totalprice > 100000) all_big,
       bool_or(o_orderstatus = 'F') any_f,
       arg_max(o_orderkey,
               cast(round(o_totalprice * 100) as bigint) * 10000000
               + o_orderkey) top_key,
       arg_min(o_orderkey,
               cast(round(o_totalprice * 100) as bigint) * 10000000
               + o_orderkey) bot_key
from orders
group by o_orderpriority
"""


# ---------------------------------------------------- extra_listagg
@_q("extra_listagg")
def extra_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: ANSI listagg(...) WITHIN GROUP ≡
    DuckDB string_agg(... order by ...). The explicit order makes the
    concatenation deterministic (an unordered string_agg is
    partition-order-dependent in both engines)."""
    sup = load_table(spark, sf_dir, "supplier").where(F.col("s_suppkey") <= 40)
    sup.createOrReplaceTempView("sup_small")
    return spark.sql(
        "select s_nationkey, "
        "listagg(s_name, '|') within group (order by s_name) s_names "
        "from sup_small group by s_nationkey"
    )


ORACLE["extra_listagg"] = """
select s_nationkey, string_agg(s_name, '|' order by s_name) s_names
from supplier
where s_suppkey <= 40
group by s_nationkey
"""


# ---------------------------------------------- extra_grouping_sets
_GSETS_SQL = """
select o_orderpriority, o_orderstatus, count(*) n,
       cast(sum(cast(o_totalprice as decimal(15,2))) as double) sum_price,
       cast(grouping(o_orderpriority) as integer) g_prio,
       cast(grouping(o_orderstatus) as integer) g_stat
from orders
group by grouping sets ((o_orderpriority), (o_orderstatus), ())
"""


@_q("extra_grouping_sets")
def extra_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form ROLLUP/CUBE desugar
    to): per-priority, per-status, and grand-total levels in one hash
    aggregate — identical SQL text on both engines."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GSETS_SQL)


ORACLE["extra_grouping_sets"] = _GSETS_SQL


# --------------------------------------------------------- extra_corr
@_q("extra_corr")
def extra_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Pearson correlation (quantity vs extendedprice per
    returnflag) from exact decimal second moments: the built-in corr()
    accumulates in floating point (partition-order-dependent), so both
    engines instead compute the five decimal sums exactly and apply
    the identical closed-form double expression once per group."""
    li = load_table(spark, sf_dir, "lineitem")
    q, p = dec("l_quantity"), dec("l_extendedprice")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(q * p).cast("double").alias("sxy"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p * p).cast("double").alias("syy"),
    )
    corr = (agg["n"] * agg["sxy"] - agg["sx"] * agg["sy"]) / (
        F.sqrt(agg["n"] * agg["sxx"] - agg["sx"] * agg["sx"])
        * F.sqrt(agg["n"] * agg["syy"] - agg["sy"] * agg["sy"])
    )
    # round(…,12): the five sums are exact decimals, but casting a
    # >2^53 decimal to double is not bit-identical across engines
    # (int128→double vs BigDecimal→double round differently in the
    # last ulp); 12 decimals is far past statistical meaning
    return agg.select(
        "l_returnflag", F.round(corr, 12).alias("corr_qty_price")
    )


ORACLE["extra_corr"] = f"""
with m as (
  select l_returnflag,
         cast(count(*) as double) n,
         cast(sum({sql_dec('l_quantity')}) as double) sx,
         cast(sum({sql_dec('l_extendedprice')}) as double) sy,
         cast(sum({sql_dec('l_quantity')} * {sql_dec('l_extendedprice')})
              as double) sxy,
         cast(sum({sql_dec('l_quantity')} * {sql_dec('l_quantity')})
              as double) sxx,
         cast(sum({sql_dec('l_extendedprice')} * {sql_dec('l_extendedprice')})
              as double) syy
  from lineitem
  group by l_returnflag)
select l_returnflag,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 12)
         corr_qty_price
from m
"""


# =====================================================================
# Consolidated coverage queries (round-4, verdict task #3): the driver's
# correctness window is ~50 rows/round, so the 21 single-purpose queries
# above are folded into the combined queries below wherever they share a
# table and grain. The singles stay in ALL_QUERIES as the pytest parity
# corpus (coverage unchanged); only the combined set is emitted to the
# driver registry.
# =====================================================================


# ---------------------------------------------------- extra_windows
@_q("extra_windows")
def extra_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three window classes in ONE custkey-partitioned window
    family (single shuffle): ranking (row_number), analytic (lag
    delta, lead with default), frames (running decimal sum, ntile,
    first/last over an explicit full frame). Combines the former
    extra_window_rank / extra_window_lag / extra_window_frames."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_custkey") % 1000 == 0
    )
    order_cols = [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    wo = Window.partitionBy("o_custkey").orderBy(*order_cols)
    running = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = wo.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.row_number().over(wo).alias("rn"),
        (dec("o_totalprice") - F.lag(dec("o_totalprice")).over(wo))
        .cast("double")
        .alias("price_delta"),
        F.sum(dec("o_totalprice")).over(running).cast("double").alias(
            "run_price"
        ),
        F.ntile(4).over(wo).alias("quartile"),
        F.first("o_orderkey").over(full).alias("first_key"),
        F.last("o_orderkey").over(full).alias("last_key"),
        F.lead("o_orderkey", 1, -1).over(wo).alias("next_key"),
    )


ORACLE["extra_windows"] = f"""
select o_custkey, o_orderkey, o_orderdate,
       row_number() over w rn,
       cast({sql_dec('o_totalprice')}
            - lag({sql_dec('o_totalprice')}) over w as double) price_delta,
       cast(sum({sql_dec('o_totalprice')}) over
            (partition by o_custkey order by o_orderdate, o_orderkey
             rows unbounded preceding) as double) run_price,
       ntile(4) over w quartile,
       first_value(o_orderkey) over
           (partition by o_custkey order by o_orderdate, o_orderkey
            rows between unbounded preceding and unbounded following)
           first_key,
       last_value(o_orderkey) over
           (partition by o_custkey order by o_orderdate, o_orderkey
            rows between unbounded preceding and unbounded following)
           last_key,
       coalesce(lead(o_orderkey, 1) over w, -1) next_key
from orders
where o_custkey % 1000 = 0
window w as (partition by o_custkey order by o_orderdate, o_orderkey)
"""


# ---------------------------------------------------- extra_set_ops
@_q("extra_set_ops")
def extra_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + INTERSECT + EXCEPT ALL over the same customer/
    supplier nation keys, tagged and stacked into one result (combines
    the former extra_union_all / extra_intersect / extra_except)."""
    t = load_tables(spark, sf_dir, "customer", "supplier")
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    u = (
        c.unionAll(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("union_all").alias("op"), "nationkey", "n")
    )
    ch = t["customer"].where(F.col("c_acctbal") > 5000).select(
        F.col("c_nationkey").alias("nationkey")
    )
    sh = t["supplier"].where(F.col("s_acctbal") > 5000).select(
        F.col("s_nationkey").alias("nationkey")
    )
    i = ch.intersect(sh).select(
        F.lit("intersect").alias("op"),
        "nationkey",
        F.lit(1).cast("long").alias("n"),
    )
    e = (
        c.exceptAll(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "nationkey", "n")
    )
    return u.unionByName(i).unionByName(e)


ORACLE["extra_set_ops"] = """
select 'union_all' op, nationkey, count(*) n from (
  select c_nationkey nationkey from customer
  union all
  select s_nationkey from supplier)
group by 2
union all
select 'intersect', nationkey, cast(1 as bigint) from (
  select c_nationkey nationkey from customer where c_acctbal > 5000
  intersect
  select s_nationkey from supplier where s_acctbal > 5000)
union all
select 'except_all', nationkey, count(*) from (
  select c_nationkey nationkey from customer
  except all
  select s_nationkey from supplier)
group by 2
"""


# ---------------------------------------------------- extra_grouping
_GROUPING_COMBINED_SQL = """
select 'rollup' src, o_orderpriority, o_orderstatus, count(*) n,
       cast(sum(cast(o_totalprice as decimal(15,2))) as double) sum_price,
       cast(grouping(o_orderpriority) as integer) g_prio,
       cast(grouping(o_orderstatus) as integer) g_stat,
       bool_and(o_totalprice > 100000) all_big,
       bool_or(o_orderstatus = 'F') any_f,
       max_by(o_orderkey,
              cast(round(o_totalprice * 100) as bigint) * 10000000
              + o_orderkey) top_key,
       min_by(o_orderkey,
              cast(round(o_totalprice * 100) as bigint) * 10000000
              + o_orderkey) bot_key
from orders
group by rollup (o_orderpriority, o_orderstatus)
union all
select 'cube', o_orderpriority, o_orderstatus, count(*),
       cast(sum(cast(o_totalprice as decimal(15,2))) as double),
       cast(grouping(o_orderpriority) as integer),
       cast(grouping(o_orderstatus) as integer),
       bool_and(o_totalprice > 100000),
       bool_or(o_orderstatus = 'F'),
       max_by(o_orderkey,
              cast(round(o_totalprice * 100) as bigint) * 10000000
              + o_orderkey),
       min_by(o_orderkey,
              cast(round(o_totalprice * 100) as bigint) * 10000000
              + o_orderkey)
from orders
group by cube (o_orderpriority, o_orderstatus)
union all
select 'gsets', o_orderpriority, o_orderstatus, count(*),
       cast(sum(cast(o_totalprice as decimal(15,2))) as double),
       cast(grouping(o_orderpriority) as integer),
       cast(grouping(o_orderstatus) as integer),
       bool_and(o_totalprice > 100000),
       bool_or(o_orderstatus = 'F'),
       max_by(o_orderkey,
              cast(round(o_totalprice * 100) as bigint) * 10000000
              + o_orderkey),
       min_by(o_orderkey,
              cast(round(o_totalprice * 100) as bigint) * 10000000
              + o_orderkey)
from orders
group by grouping sets ((o_orderpriority), (o_orderstatus), ())
"""


@_q("extra_grouping")
def extra_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP + CUBE + explicit GROUPING SETS over orders, each level
    tagged, with GROUPING markers, boolean aggregates, and
    deterministic argmin/argmax per group — IDENTICAL SQL text on both
    engines (max_by/min_by, bool_and/bool_or, grouping() are shared
    names). Combines the former extra_rollup / extra_cube /
    extra_grouping_sets / extra_bool_argmax; each branch is one
    grouping-sets expansion feeding one hash aggregate."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GROUPING_COMBINED_SQL)


ORACLE["extra_grouping"] = _GROUPING_COMBINED_SQL


# ------------------------------------------------------- extra_stats
# two-level radix split of exact money cents: window frames at level 1
# are bounded by the VALUE DOMAIN (max cents >> RADIX buckets; money
# columns are schema-bounded), at level 2 by 2^RADIX distinct low
# bits — both corpus-independent
_PRICE_RADIX = 12


def _radix_quantile(
    df: DataFrame, keys: list[str], p: float, out: str
) -> DataFrame:
    """Exact interpolated p-quantile of a 2-decimal money column `v`
    per `keys` group via the two-level radix split (extra_stats
    docstring).  `df` must be a narrow (keys..., v) projection; hi =
    round(v*100) >> _PRICE_RADIX is a pure monotone function of the
    value, so the global cumulative count factorizes exactly as
    bucket-offset + in-bucket running count, both window levels are
    bounded by the VALUE DOMAIN (<= max_cents/2^RADIX buckets;
    <= 2^RADIX distinct low bits per bucket) at any corpus size, and
    the whole thing is one lazy DAG — no checkpoint, no self-join.
    The pick reads the ORIGINAL doubles, so exactness never depends
    on the cents round-trip."""
    hi = F.shiftright(
        F.round(F.col("v") * 100).cast("long"), _PRICE_RADIX
    ).alias("hi")
    # level 1: bucket counts (map-side combine: corpus → <= #buckets
    # rows) + per-key running count over DOMAIN-BOUNDED buckets
    hih = (
        df.select(*keys, hi)
        .groupBy(*keys, "hi")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wh = Window.partitionBy(*keys)
    hcum = hih.select(
        *keys,
        "hi",
        F.sum("c").over(wh.orderBy("hi")).alias("cum"),
        (F.sum("c").over(wh.orderBy("hi")) - F.col("c")).alias("off"),
        F.sum("c").over(wh).alias("n_h"),
    )
    # winning buckets: the (at most two, possibly equal) buckets
    # holding the floor/ceil ranks of (n-1)*p — selected PER ROW from
    # (off, cum, n_h), no self-join back onto the bucket frame
    pos = (F.col("n_h") - 1).cast("double") * F.lit(p)
    fr = F.floor(pos).cast("bigint") + 1
    cr = F.ceil(pos).cast("bigint") + 1
    pre = F.broadcast(
        hcum.where(
            ((F.col("off") < fr) & (fr <= F.col("cum")))
            | ((F.col("off") < cr) & (cr <= F.col("cum")))
        ).select(*keys, "hi", "off", "n_h")
    )
    # level 2: rows of the winning buckets only (inner broadcast-join
    # filter), distinct-value counts cumulated WITHIN the bucket —
    # frames bounded by the 2^RADIX low-bit domain whatever the
    # corpus holds; off + running count = exact global cumulative
    # count
    inb = (
        df.select(*keys, "v", hi)
        .join(pre, [*keys, "hi"])
        .groupBy(*keys, "hi", "v")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.max("off").alias("off"),
            F.max("n_h").alias("n_h"),
        )
    )
    wv = Window.partitionBy(*keys, "hi").orderBy("v")
    rv = inb.select(
        *keys,
        "v",
        "n_h",
        (F.col("off") + F.sum("c").over(wv)).alias("cum"),
    )
    return rv.groupBy(*keys).agg(_rank_pick(p, out))


def _rank_pick(p: float, out: str):
    """Interpolated percentile from per-group cumulative ranks: the
    value at 0-based rank r is the smallest value whose cumulative
    count (`cum`) reaches r+1; quantile_cont's rank is (n-1)*p,
    interpolated between its floor and ceil ranks. Works over either a
    cumulative HISTOGRAM (cum = running count of a distinct value) or
    unique per-row RANKS (cum = rn) — both satisfy 'smallest v with
    cum >= r+1 is the order statistic at r'."""
    pos = (F.col("n_h") - 1).cast("double") * F.lit(p)
    lo = F.min(F.when(F.col("cum") >= F.floor(pos).cast("bigint") + 1, F.col("v")))
    hi = F.min(F.when(F.col("cum") >= F.ceil(pos).cast("bigint") + 1, F.col("v")))
    frac = F.max(pos - F.floor(pos))
    return (lo + (hi - lo) * frac).alias(out)


@_q("extra_stats")
def extra_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles + deterministic Pearson correlation
    per returnflag (combines the former extra_quantiles / extra_corr).

    Two independent passes, each in its cheapest shape:

    * Moments: ONE map-side-combining hash aggregate straight off the
      base table — no explode, no window.  Decimal sums are
      associative-exact, so the values are bit-identical to any
      row-order evaluation.
    * Quantiles, per column class (round-10 verdict #1 — the former
      single (flag, which)-partitioned cumulative window put the
      near-unique price histogram's CORPUS-scale frame through one
      task per flag, the same defect class as the pre-r10 zonemap,
      hidden behind a 6-value partition key):
        - l_quantity is DOMAIN-BOUNDED (50 distinct values): groupBy
          (flag, v) → count reduces the corpus map-side to <= 150
          histogram rows, and the cumulative window's per-partition
          frame is <= 50 rows BY VALUE-DOMAIN BOUND, corpus-
          independent (allowlisted in the low-cardinality window
          guard with that justification).
        - l_extendedprice is CONTINUOUS (distinct count grows with
          the corpus) but MONEY — exactly 2 fractional digits, so its
          cents are schema-bounded integers.  A TWO-LEVEL RADIX SPLIT
          (hi = cents >> 12) makes the global cumulative count
          factorize exactly as bucket-offset + in-bucket running
          count, with BOTH window levels bounded by the value domain,
          never the corpus:
            level 1: groupBy (flag, hi) → map-side combine reduces
              the corpus to <= max_cents/2^12 bucket rows; one
              running-count window per flag over those buckets
              (~2.6k frames for a <= $168k price domain).  The
              winning (floor/ceil-rank) buckets and their exclusive
              offsets fall out of the SAME windowed frame row-wise —
              no self-join, no diamond, no recompute.
            level 2: an inner broadcast-join against the <= 2
              winning buckets per flag filters the second scan;
              groupBy (flag, hi, v) then a running count within the
              bucket — at most 2^12 distinct low-bit values per
              frame AT ANY CORPUS SIZE.
          hi is a PURE function of the value — no data-dependent
          binning parameters, no min/max pre-pass, no broadcast of
          per-flag statistics, no localCheckpoint: the whole query is
          one lazy DAG (unlike spark_partition_id() two-phase ranking,
          which must checkpoint).  Monotone: v1 <= v2 → cents(v1) <=
          cents(v2) → hi(v1) <= hi(v2), so buckets partition the
          value axis order-consistently; the pick reads the ORIGINAL
          double v carried through level 2, so exactness never
          depends on the cents round-trip.
      Both shapes feed the same conditional-min rank pick: the value
      at 0-based rank r is the smallest v whose cumulative count
      reaches r+1 (quantile_cont's (n-1)*p interpolation between
      floor/ceil ranks).  This also replaces Spark's exact
      `percentile` aggregate, which buffers every group value in
      executor memory — an OOM hazard once a group holds billions of
      rows.

    Interpolation is written out explicitly and the oracle carries the
    identical expression text: DuckDB's quantile_cont differs from the
    written-out form by 1 ulp at fractional ranks (measured
    26913.252499999995 vs ...2525), so both engines run the same
    explicit formula rather than their native aggregate.

    corr from the exact decimal moments + one closed-form double
    expression, rounded past the representable-ulp zone (unchanged).

    Job-floor sweep (r11 verdict #3, the extra_recursive_walk
    discipline; sf0.1/local[32], best-of-3 warm): baseline 2.45s
    (fresh session; 1.95s in the long-lived ORACLE_BENCH session);
    shuffle.partitions=1 → 1.96s; AQE initialPartitionNum=1 → 1.67s;
    AQE off → 2.39s; FUSING the qty histogram and the price level-1
    buckets into one explode-(which,key) scan → 2.80–3.20s (SLOWER —
    the Expand doubles the corpus rows before the map-side combine
    and the shared frame needs a checkpoint, costing more than the
    saved scan, so the fusion was measured and rejected). The
    single-aggregate floor in the same session is 0.17s, and this DAG
    is ~10 sequential stage rounds (three corpus scans that cannot
    share a shuffle, the winning-bucket broadcast barrier, and the
    tiny window/join stages), so ~1.7–2.0s IS the local-mode
    scheduling floor — config-level wins (initialPartitionNum=1)
    are session-global knobs a registered query must not mutate.
    Every frame past the map-side combines is bounded by the VALUE
    DOMAIN, so the gap is fixed overhead, flat in corpus size —
    exactly the overhead 1000-executor scheduling absorbs."""
    li = load_table(spark, sf_dir, "lineitem")
    q_d, p_d = dec("l_quantity"), dec("l_extendedprice")
    # products narrowed to decimal(18,4): exact (q*p <= 5.25e6,
    # p*p <= 1.2e10 — 4 fractional digits preserved losslessly) and
    # long-backed per value instead of 128-bit decimal(31,4), which
    # halves the moments-pass cost
    d18 = "decimal(18,4)"
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.sum(q_d).cast("double").alias("sx"),
        F.sum(p_d).cast("double").alias("sy"),
        F.sum((q_d * p_d).cast(d18)).cast("double").alias("sxy"),
        F.sum((q_d * q_d).cast(d18)).cast("double").alias("sxx"),
        F.sum((p_d * p_d).cast(d18)).cast("double").alias("syy"),
    )
    # qty: cumulative histogram, window frames bounded by the 50-value
    # domain of l_quantity (corpus-independent)
    qhist = li.groupBy(
        "l_returnflag", F.col("l_quantity").alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    wq = Window.partitionBy("l_returnflag")
    rq = qhist.select(
        "l_returnflag",
        "v",
        F.sum("c").over(wq.orderBy("v")).alias("cum"),
        F.sum("c").over(wq).alias("n_h"),
    )
    qq = rq.groupBy("l_returnflag").agg(
        _rank_pick(0.5, "med_qty"),
        _rank_pick(0.9, "p90_qty"),
    )
    # price: two-level radix over exact money cents (see docstring)
    pq = _radix_quantile(
        li.select(
            "l_returnflag", F.col("l_extendedprice").alias("v")
        ),
        ["l_returnflag"],
        0.25,
        "p25_price",
    )
    agg = m.join(qq, "l_returnflag").join(pq, "l_returnflag")
    corr = (agg["nd"] * agg["sxy"] - agg["sx"] * agg["sy"]) / (
        F.sqrt(agg["nd"] * agg["sxx"] - agg["sx"] * agg["sx"])
        * F.sqrt(agg["nd"] * agg["syy"] - agg["sy"] * agg["sy"])
    )
    return agg.select(
        "l_returnflag",
        "med_qty",
        "p90_qty",
        "p25_price",
        "n",
        F.round(corr, 12).alias("corr_qty_price"),
    )


def _sql_rank_pick(which: str, p: float, out: str) -> str:
    return f"""
    min(case when which = '{which}'
              and cum >= cast(floor((cast(n_h - 1 as double)) * {p}) as bigint) + 1
             then v end)
    + (min(case when which = '{which}'
                 and cum >= cast(ceil((cast(n_h - 1 as double)) * {p}) as bigint) + 1
                then v end)
       - min(case when which = '{which}'
                   and cum >= cast(floor((cast(n_h - 1 as double)) * {p}) as bigint) + 1
                  then v end))
      * max(case when which = '{which}'
                 then (cast(n_h - 1 as double)) * {p}
                      - floor((cast(n_h - 1 as double)) * {p}) end) {out}"""


ORACLE["extra_stats"] = f"""
with m as (
  select l_returnflag,
         count(*) n,
         cast(count(*) as double) nd,
         cast(sum({sql_dec('l_quantity')}) as double) sx,
         cast(sum({sql_dec('l_extendedprice')}) as double) sy,
         cast(sum({sql_dec('l_quantity')} * {sql_dec('l_extendedprice')})
              as double) sxy,
         cast(sum({sql_dec('l_quantity')} * {sql_dec('l_quantity')})
              as double) sxx,
         cast(sum({sql_dec('l_extendedprice')} * {sql_dec('l_extendedprice')})
              as double) syy
  from lineitem
  group by l_returnflag),
hist as (
  select l_returnflag, l_quantity v, count(*) c
  from lineitem group by l_returnflag, l_quantity),
cum as (
  select l_returnflag, 'qty' which, v,
         sum(c) over (partition by l_returnflag order by v) cum,
         sum(c) over (partition by l_returnflag) n_h
  from hist),
qq as (
  select l_returnflag,
         {_sql_rank_pick('qty', 0.5, 'med_qty')},
         {_sql_rank_pick('qty', 0.9, 'p90_qty')}
  from cum
  group by l_returnflag),
pr as (
  select l_returnflag, 'price' which, l_extendedprice v,
         row_number() over (partition by l_returnflag
                            order by l_extendedprice) cum,
         count(*) over (partition by l_returnflag) n_h
  from lineitem),
pq as (
  select l_returnflag,
         {_sql_rank_pick('price', 0.25, 'p25_price')}
  from pr
  group by l_returnflag),
quant as (
  select qq.l_returnflag, qq.med_qty, qq.p90_qty, pq.p25_price
  from qq join pq on qq.l_returnflag = pq.l_returnflag)
select q.l_returnflag, q.med_qty, q.p90_qty, q.p25_price, m.n,
       round((m.nd * m.sxy - m.sx * m.sy)
             / (sqrt(m.nd * m.sxx - m.sx * m.sx)
                * sqrt(m.nd * m.syy - m.sy * m.sy)), 12)
         corr_qty_price
from quant q join m on q.l_returnflag = m.l_returnflag
"""


# ------------------------------------------------- extra_string_aggs
@_q("extra_string_aggs")
def extra_string_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (ANSI listagg WITHIN GROUP) plus the
    array-aggregation corpus (sorted collect, join, size, index,
    membership) over one supplier grouping — combines the former
    extra_listagg / extra_array_fns function coverage at a single
    grain. The sorted list makes every output order-independent."""
    sup = load_table(spark, sf_dir, "supplier").where(F.col("s_suppkey") <= 40)
    sup.createOrReplaceTempView("sup_small")
    return spark.sql(
        "select s_nationkey, "
        "listagg(s_name, '|') within group (order by s_name) s_names, "
        "array_join(array_sort(collect_list(s_name)), ',') names_csv, "
        "cast(size(collect_list(s_name)) as int) n_sup, "
        "element_at(array_sort(collect_list(s_name)), 1) first_name, "
        "cast(array_contains(collect_list(s_name), 'Supplier#000000007') "
        "     as int) has_7 "
        "from sup_small group by s_nationkey"
    )


ORACLE["extra_string_aggs"] = """
select s_nationkey,
       string_agg(s_name, '|' order by s_name) s_names,
       array_to_string(list_sort(list(s_name)), ',') names_csv,
       cast(len(list(s_name)) as integer) n_sup,
       list_sort(list(s_name))[1] first_name,
       cast(list_contains(list(s_name), 'Supplier#000000007') as integer)
           has_7
from supplier
where s_suppkey <= 40
group by s_nationkey
"""


# ------------------------------------------------- extra_pivot_json
@_q("extra_pivot_json")
def extra_pivot_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (explicit value list, static schema) + JSON-path
    extraction feeding typed aggregation, per user — combines the
    former extra_pivot / extra_json_fns. Two aggregates on the same
    user_id key joined back: co-partitioned, so the join adds no
    exchange beyond the aggregation shuffles."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    k = F.get_json_object("props", "$.k")
    j = (
        ev.select("user_id", k.alias("k_str"), k.cast("int").alias("k"))
        .groupBy("user_id")
        .agg(
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k_str").alias("min_k_str"),
            F.max("k_str").alias("max_k_str"),
        )
    )
    return pivoted.join(j, "user_id").select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES],
        "sum_k",
        "min_k_str",
        "max_k_str",
    )


ORACLE["extra_pivot_json"] = f"""
select user_id,
       {', '.join(f"count(case when event_type = '{t}' then 1 end) n_{t}"
                  for t in _EVENT_TYPES)},
       cast(sum(cast(json_extract_string(props, '$.k') as integer))
            as bigint) sum_k,
       min(json_extract_string(props, '$.k')) min_k_str,
       max(json_extract_string(props, '$.k')) max_k_str
from events
where user_id < 50
group by user_id
"""


# ----------------------------------------------------- extra_lateral
_LATERAL_SQL = """
select n.n_name, l.c_name, l.c_acctbal
from nation n, lateral (
  select c_name, c_acctbal from customer c
  where c.c_nationkey = n.n_nationkey
  order by c_acctbal desc, c_name asc limit 2) l
"""


@_q("extra_lateral")
def extra_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 customers per nation by
    account balance, ties on name so the pick is total) — the
    per-row-subquery surface DuckDB and Spark 4 both speak natively.
    Same SQL text in both engines; Spark plans the correlated LIMIT as
    a ranked window under the hood (DecorrelateInnerQuery), so the
    execution is one customer shuffle by nationkey + per-key top-k —
    no per-outer-row re-execution at any scale."""
    for t in ("nation", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)


ORACLE["extra_lateral"] = _LATERAL_SQL


# ----------------------------------------------------- extra_unpivot
@_q("extra_unpivot")
def extra_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT — the wide→long reshape (the inverse of extra_pivot_json's
    PIVOT): three per-returnflag measures melt into (measure, value)
    rows. Spark's native `DataFrame.unpivot` (the melt/stack operator)
    against DuckDB's SQL-standard `UNPIVOT (value FOR measure IN …)` —
    same measure names (the column names), values unified to double.

    Scale: unpivot is a zero-shuffle per-row map (each input row emits
    k rows); the only shuffle is the upstream aggregate's."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        dsum(dec("l_quantity")).alias("sum_qty"),
        dsum(dec("l_extendedprice")).alias("sum_price"),
        F.count(F.lit(1)).cast("double").alias("n_items"),
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "n_items"],
        variableColumnName="measure",
        valueColumnName="value",
    )


ORACLE["extra_unpivot"] = f"""
with agg as (
  select l_returnflag,
         {sql_dsum(sql_dec('l_quantity'))} sum_qty,
         {sql_dsum(sql_dec('l_extendedprice'))} sum_price,
         cast(count(*) as double) n_items
  from lineitem group by l_returnflag)
select l_returnflag, measure, value
from agg unpivot (value for measure in (sum_qty, sum_price, n_items))
"""


# =====================================================================
# Registry split: ALL_QUERIES/ALL_ORACLE carry every query above (the
# pytest parity corpus — tests/test_extras.py walks this); QUERIES/
# ORACLE export only the driver-registered consolidated set.
# =====================================================================
ALL_QUERIES: dict = dict(QUERIES)
ALL_ORACLE: dict[str, str] = dict(ORACLE)

_REGISTERED = (
    "extra_windows",        # rank + lag + frames
    "extra_set_ops",        # union all + intersect + except all
    "extra_grouping",       # rollup + cube + grouping sets + bool/argmax
    "extra_string_fns",     # string + regex corpus
    "extra_date_fns",
    "extra_stats",          # quantiles + corr
    "extra_string_aggs",    # listagg + array corpus
    "extra_pivot_json",     # pivot + JSON extraction
    "extra_full_outer",
    "extra_recursive_walk",
    "extra_lateral",        # correlated LATERAL subquery
    "extra_unpivot",        # wide→long melt (inverse of PIVOT)
    "extra_variant_json",   # Spark 4 VARIANT typed extraction
)
QUERIES = {k: ALL_QUERIES[k] for k in _REGISTERED}
ORACLE = {k: ALL_ORACLE[k] for k in _REGISTERED}


# ------------------------------------------------------ extra_udtf_ngrams
UDTF_N = 3
UDTF_TOPK = 20


def _register_ngrams_udtf(spark: SparkSession) -> None:
    """Idempotent per-session registration of the positional-n-gram
    Python UDTF (Arrow-optimized)."""
    if spark.__dict__.get("_dws_udtf_registered"):
        return
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, gram: string", useArrow=True)
    class NgramUDTF:
        def eval(self, text: str, n: int):
            toks = [t for t in (text or "").split(" ") if t]
            for i in range(len(toks) - n + 1):
                yield i, " ".join(toks[i : i + n])

    spark.udtf.register("ngrams_udtf", NgramUDTF)
    spark.__dict__["_dws_udtf_registered"] = True


@_q("extra_udtf_ngrams")
def extra_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF gate (the second Spark 4 Python extension surface
    after the DataSource): a user-defined TABLE function yielding
    positional n-grams is invoked through SQL as a correlated LATERAL
    table reference, and the top-20 gram counts (with position spread)
    are hash-checked against a DuckDB oracle that replays the same
    positional shingling via range+list indexing. What this gates:
    UDTF registration, the lateral-join plan (one generator call per
    input row, no driver round trip), Arrow-optimized batch transfer,
    and the yield contract.

    Scale/honesty note: a UDTF is Python-side row generation — the
    registered hot path for shingling remains the codegen slice/zip
    builder (operators/_text.py ngrams); this query exists because the
    reference's users can extend the engine with table functions, and
    THIS is Spark's equivalent extension point, gated on values."""
    _register_ngrams_udtf(spark)
    return spark.sql(
        f"""
        select g.gram,
               count(*) as n,
               min(g.pos) as min_pos,
               max(g.pos) as max_pos
        from parquet.`{sf_dir}/documents.parquet` d,
             lateral ngrams_udtf(d.text, {UDTF_N}) g
        group by g.gram
        order by n desc, g.gram
        limit {UDTF_TOPK}
        """
    )


ORACLE["extra_udtf_ngrams"] = f"""
with toks as (
  select doc_id, list_filter(string_split(text, ' '), x -> x != '') t
  from documents),
grams as (
  select doc_id, cast(u.i as int) pos,
         t[u.i + 1] || ' ' || t[u.i + 2] || ' ' || t[u.i + 3] gram
  from toks, unnest(range(0, greatest(len(t) - {UDTF_N - 1}, 0))) u(i))
select gram, count(*) n,
       min(pos) min_pos,
       max(pos) max_pos
from grams
group by gram
order by n desc, gram
limit {UDTF_TOPK}
"""


# defined after the registry split, so mirror it into the pytest corpus
ALL_QUERIES["extra_udtf_ngrams"] = extra_udtf_ngrams
ALL_ORACLE["extra_udtf_ngrams"] = ORACLE["extra_udtf_ngrams"]
