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


def _pin_utc(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table as a DataFrame (lazy scan, no materialization)."""
    _pin_utc(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, *names: str
) -> dict[str, DataFrame]:
    """Load several tables; defaults to all of TABLES."""
    _pin_utc(spark)
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}
