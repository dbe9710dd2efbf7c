"""Shared expression helpers for the query corpus.

Deterministic-float policy
--------------------------
The driver hash-compares our Spark results against a DuckDB oracle
(value-exact). Floating-point SUM/AVG are order-dependent and Spark sums in
partition order, so a naive `sum(double)` can differ from DuckDB in the last
ulp. Every money/rate aggregate therefore accumulates in exact DECIMAL
(inputs have ≤2 decimal digits; products ≤6), and only the final value is
cast to double — bit-identical in any summation order and in both engines.
AVG is expressed as decimal-sum cast to double divided by COUNT (double/long
→ double, deterministic), never as a float `avg()`.

MIN/MAX/COUNT over doubles are order-independent and used directly.

This costs nothing at scale: decimal hash-aggregation is still JVM
whole-stage-codegen, partial+final, no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(15,2)"


def dec(c: str | Column) -> Column:
    """Exact decimal view of a 2-decimal money/rate column stored as double."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def one() -> Column:
    """Literal 1 as decimal(15,2) (lazy: needs an active SparkSession)."""
    return F.lit(1).cast(DEC)


def revenue() -> Column:
    """l_extendedprice * (1 - l_discount), exact (decimal(31,4))."""
    return dec("l_extendedprice") * (one() - dec("l_discount"))


def charge() -> Column:
    """revenue * (1 + l_tax), exact; intermediate narrowed to decimal(18,4)
    so Spark's product precision stays ≤38 (values ≪ 1e14, no overflow)."""
    return revenue().cast("decimal(18,4)") * (one() + dec("l_tax"))


def dsum(e: Column) -> Column:
    """Deterministic double SUM via exact decimal accumulation."""
    return F.sum(e).cast("double")


def davg(e: Column) -> Column:
    """Deterministic double AVG: exact decimal sum / row count."""
    return F.sum(e).cast("double") / F.count(F.lit(1))


def ts(literal: str) -> Column:
    """Timestamp literal pinned to UTC parsing (session TZ is UTC)."""
    return F.to_timestamp(F.lit(literal))


# ---- matching DuckDB SQL fragments (oracle side) --------------------------

SQL_DEC = "cast({c} as decimal(15,2))"
SQL_REV = (
    "cast(l_extendedprice as decimal(15,2))"
    " * (1 - cast(l_discount as decimal(15,2)))"
)
SQL_CHARGE = (
    f"cast({SQL_REV} as decimal(18,4)) * (1 + cast(l_tax as decimal(15,2)))"
)


def sql_dsum(expr: str) -> str:
    return f"cast(sum({expr}) as double)"


def sql_davg(expr: str) -> str:
    return f"cast(sum({expr}) as double) / count(*)"


def sql_dec(c: str) -> str:
    return SQL_DEC.format(c=c)
