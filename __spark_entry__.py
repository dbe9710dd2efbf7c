"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The queries live in ``duckdb_wasm_spark.plans`` / ``.operators``; this
module only aggregates their registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (adapted TPC-H q1) on /root/testdata/sf0.001."""
    from duckdb_wasm_spark.plans import tpch

    return tpch.QUERIES["q1"](spark, "/root/testdata/sf0.001")


def _registries():
    """One registry module per query family. Imports are guarded
    per-module and only for the module's OWN absence (a broken
    transitive import must surface, not silently drop its queries from
    the correctness gate)."""
    from duckdb_wasm_spark.plans import tpch

    modules = [tpch]
    for modname in (
        "duckdb_wasm_spark.plans.micro",
        "duckdb_wasm_spark.plans.extras",
        "duckdb_wasm_spark.plans.reference_sql",
        "duckdb_wasm_spark.operators.registry",
        "duckdb_wasm_spark.streaming.windows",
    ):
        try:
            mod = __import__(modname, fromlist=["QUERIES"])
        except ModuleNotFoundError as e:
            if e.name != modname:
                raise
            continue
        modules.append(mod)
    return modules


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so every oracle-backed query precedes the rows-only
    (no-oracle) ones: the driver walks this dict in insertion order
    with a global time budget, so an expensive no-oracle ML query in
    the middle must never starve oracle-gated entries behind it
    (round-2 verdict finding #1)."""
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for m in _registries():
        merged.update(m.QUERIES)
        oracles.update(m.ORACLE)
    out = {k: v for k, v in merged.items() if k in oracles}
    out.update({k: v for k, v in merged.items() if k not in oracles})
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    out: dict[str, str] = {}
    for m in _registries():
        out.update(m.ORACLE)
    return out
