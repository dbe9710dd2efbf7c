"""The reference's sqlite-dialect TPC-H variants, registered as
driver-gated queries (round-2 verdict #6).

The reference benchmarks ship alternate texts for q7/q8/q9/q22 that use
sqlite's `strftime('%Y', d)` instead of `extract(year from d)`
(packages/benchmarks/scripts/tpch/7-sqlite.sql, 8-sqlite.sql,
22-sqlite.sql; issued by
packages/benchmarks/src/system/sqljs_benchmarks.ts). Registering them
exercises the dialect translator's strftime→date_format path under the
driver's hash-exact correctness gate, not just pytest.

9-sqlite.sql is excluded (references `partsupp`) and 22-sqlite.sql is
excluded (references `customer.c_phone`) — neither exists in the
driver's test schema (same dynamic-discovery rule as
tests/test_reference_sql.py, which skips them for the same reason).

Determinism: the verbatim texts accumulate SUMs in double, whose
partition-order nondeterminism cannot hash-match across engines. Each
registered pair therefore applies the SAME textual transform to BOTH
the Spark input and the DuckDB oracle: every float SUM accumulates in
DECIMAL(25,8) and casts to double once (the repo-wide policy,
plans/_util.py). The doubles being summed are within ~1e-12 of exact
4-decimal values, so the 8-decimal cast is unambiguous and identical
in both engines. Everything else — strftime, comma joins, correlated
subqueries — runs verbatim through `dialect.translate`.

Plan audit (round 7, sf0.1 local[32]): the r6 ORACLE_BENCH row showed
ref_q8_sqlite at 2.451s vs 0.56s in the same round's plain BENCH_FULL
run on identical data. `explain("formatted")` of the translated text
shows the plan is already the one a hand-built q8 gets: a pure
BroadcastHashJoin chain — part/supplier/orders/customer/nation×2/
region all broadcast, lineitem as the streamed probe side, every
filter pushed into the parquet scans (`PushedFilters` on o_orderdate
range and r_name), single shuffle at the o_year aggregate. Measured
split: plan build 0.08s, warm execution 0.65s, first-touch 2.5s
(cold parquet footers + broadcast construction — paid once per
session, not per query). The 2.451s artifact row was therefore
bench-context noise in the DuckDB-interleaved run (both best-of-2
attempts landed on the cold path), not a translate-path plan defect;
there is nothing for the translator to add — Catalyst already
broadcasts every dim without hints. Kept under gate rotation so the
r7 artifact re-measures it.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from duckdb_wasm_spark.dialect import translate
from duckdb_wasm_spark.tables import load_table

TPCH_DIR = "/root/reference/packages/benchmarks/scripts/tpch"
_TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
)

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def _dec_sum(expr: str, alias: str | None = None) -> str:
    out = f"cast(sum(cast({expr} as decimal(25,8))) as double)"
    return f"{out} as {alias}" if alias else out


# per-file determinizing rewrites: (pattern, replacement), DOTALL regex
_REWRITES: dict[str, list[tuple[str, str]]] = {
    "7-sqlite.sql": [
        (r"sum\(volume\) as revenue", _dec_sum("volume", "revenue")),
    ],
    "8-sqlite.sql": [
        (
            r"sum\(\s*case\s+when nation = 'BRAZIL' then volume\s+"
            r"else 0\s+end\s*\)\s*/\s*sum\(volume\) as mkt_share",
            _dec_sum("case when nation = 'BRAZIL' then volume else 0 end")
            + " / "
            + _dec_sum("volume")
            + " as mkt_share",
        ),
    ],
}


_TEXT_CACHE: dict[str, str] = {}


def _determinized_text(fname: str) -> str:
    if fname not in _TEXT_CACHE:
        with open(os.path.join(TPCH_DIR, fname)) as f:
            text = f.read()
        for pat, repl in _REWRITES[fname]:
            text, n = re.subn(pat, repl, text, flags=re.DOTALL)
            assert n == 1, f"{fname}: rewrite {pat!r} matched {n} times"
        _TEXT_CACHE[fname] = text.rstrip().rstrip(";")
    return _TEXT_CACHE[fname]


def _register(name: str, fname: str) -> None:
    if not os.path.exists(os.path.join(TPCH_DIR, fname)):
        return  # reference corpus not mounted

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        for tbl in _TPCH_TABLES:
            load_table(spark, sf_dir, tbl).createOrReplaceTempView(tbl)
        t = translate(_determinized_text(fname))
        assert t.kind == "query"
        return spark.sql(t.sql)

    fn.__name__ = name
    fn.__doc__ = (
        f"Reference sqlite-dialect text {fname} run verbatim through the "
        f"dialect translator (strftime→date_format), decimal-determinized."
    )
    QUERIES[name] = fn
    ORACLE[name] = _determinized_text(fname)


_register("ref_q7_sqlite", "7-sqlite.sql")
_register("ref_q8_sqlite", "8-sqlite.sql")
