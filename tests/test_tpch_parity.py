"""Adapted TPC-H q1–q22: Spark result must exactly match the DuckDB oracle
(the driver's t2 gate, replicated locally at sf0.001)."""

import pytest

from duckdb_wasm_spark.plans import tpch
from duckdb_wasm_spark.testing import assert_parity


@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_tpch_parity(name, spark, sf_dir, oracle):
    df = tpch.QUERIES[name](spark, sf_dir)
    assert_parity(df, tpch.ORACLE[name], oracle, name)
    assert name in tpch.ORACLE
