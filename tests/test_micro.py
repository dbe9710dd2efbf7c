"""Micro-benchmark corpus: oracle parity + the reference's embedded
cardinality asserts (duckdb_sync_benchmarks.ts:222-630 equivalents)."""

import pytest

from duckdb_wasm_spark.plans import micro
from duckdb_wasm_spark.testing import assert_parity


@pytest.mark.parametrize("name", sorted(micro.QUERIES))
def test_micro_parity(name, spark, sf_dir, oracle):
    assert name in micro.ORACLE
    assert_parity(micro.QUERIES[name](spark, sf_dir), micro.ORACLE[name], oracle, name)


def test_micro_cardinality_contract(spark, sf_dir):
    expected = micro.CARDINALITY(spark, sf_dir)
    for name, want in expected.items():
        got = micro.QUERIES[name](spark, sf_dir).count()
        assert got == want, f"{name}: rows {got} != contract {want}"
        assert want > 0, f"{name}: degenerate empty contract"


def test_topk_plan_is_take_ordered(spark, sf_dir):
    """The ORDER BY + LIMIT must fuse to TakeOrderedAndProject — a full
    global sort materialization would be the wrong plan at scale."""
    plan = (
        micro.QUERIES["micro_topk"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_topk_per_group_plan(spark, sf_dir):
    """micro_topk_per_group's executed plan must carry WindowGroupLimit
    (rank-limit pushdown: only K rows per group survive the partial
    stage) — without it the window materializes every group's full
    sorted row set."""
    from duckdb_wasm_spark.plans import micro

    df = micro.QUERIES["micro_topk_per_group"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:1200]
