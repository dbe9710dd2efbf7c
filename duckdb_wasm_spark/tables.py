"""Loaders for the driver-generated test tables (TESTDATA.md).

The tables are one parquet file per name under a scale-factor directory.
All timestamp columns were written as UTC instants; we pin the session
timezone to UTC on every load so `year()`, `cast(ts as date)` and
string-literal timestamp comparisons agree with DuckDB's naive-UTC reads
(SURVEY §7 hard-part 6).

Scale notes (100 TB framing): `spark.read.parquet` is a plain
FileSourceScanExec — filter/column pushdown and partition pruning apply
untouched. At cluster scale the same loader works over a directory of many
files / hive partitions; nothing here materializes or collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor
# (region=5 rows, nation=25 rows always; supplier/part/customer grow with SF
# but stay far below fact tables).
BROADCAST_DIMS = ("region", "nation")


def _ensure_session_conf(spark: SparkSession) -> None:
    """One-time session configuration (guarded — no repeated global
    mutation per load call):
      - UTC session timezone (DuckDB reads naive-UTC; SURVEY §7.6)
      - nanosAsLong: events.parquet carries TIMESTAMP(NANOS), which the
        Spark parquet reader rejects natively; read as long and convert
        (see load_table)."""
    if getattr(spark, "_dws_conf_done", False):
        return
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark._dws_conf_done = True


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table as a DataFrame (lazy scan, no materialization).

    events.ts arrives as INT64 nanoseconds (nanosAsLong) and is converted
    to a microsecond timestamp with integer `div` (a double division
    would lose precision above 2^53 ns) — matching DuckDB's own ns→us
    truncation of the same column."""
    _ensure_session_conf(spark)
    # memoize the lazy plan per session: re-loading the same table used
    # to re-list files and re-read parquet footers for every query in a
    # corpus run (58 queries × N tables of pure driver-side setup). The
    # DataFrame is an immutable plan — sharing it changes nothing about
    # execution, pushdown, or pruning.
    memo: dict = spark.__dict__.setdefault("_dws_table_memo", {})
    key = (sf_dir, name)
    if key not in memo:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events" and dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        memo[key] = df
    return memo[key]


def load_tables(
    spark: SparkSession, sf_dir: str, *names: str
) -> dict[str, DataFrame]:
    """Load several tables; defaults to all of TABLES."""
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}


def write_events_daily(spark: SparkSession, sf_dir: str, out_path: str) -> str:
    """Materialize `events` hive-partitioned by calendar day
    (`event_date=YYYY-MM-DD/` directories) — the append-only layout for
    event streams at scale: each day's micro-batches land in one
    partition directory, and any time-bounded query prunes to the days
    it touches instead of scanning the full history (100 TB of events →
    a per-day read).

    The pre-write `repartition(event_date)` gives one writer task per
    day instead of (input_partitions × days) small files."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    (
        ev.repartition("event_date")
        .write.partitionBy("event_date")
        .mode("overwrite")
        .parquet(out_path)
    )
    return out_path


def write_bucketed(
    spark: SparkSession,
    sf_dir: str,
    names_and_keys: dict[str, str],
    n_buckets: int = 8,
    database: str = "bucketed",
) -> None:
    """Materialize tables bucketed (and sorted) by their join key into a
    catalog database — the co-located-join layout for repeated fact-fact
    joins at scale: two tables bucketed on the same key with the same
    bucket count join with NO exchange on either side (the shuffle is
    paid once at write time, then amortized over every subsequent join).

    At 100 TB this is the difference between re-shuffling the fact table
    per query and a partition-local sort-merge join; on the cluster the
    same call writes to the shared warehouse/metastore.
    """
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    for name, key in names_and_keys.items():
        df = load_table(spark, sf_dir, name)
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(f"{database}.{name}")
        )
