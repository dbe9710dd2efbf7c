"""Stretch operator classes (windows / set ops / rollup / full outer):
oracle parity."""

import pytest

from duckdb_wasm_spark.plans import extras
from duckdb_wasm_spark.testing import assert_parity


@pytest.mark.parametrize("name", sorted(extras.QUERIES))
def test_extras_parity(name, spark, sf_dir, oracle):
    assert name in extras.ORACLE
    assert_parity(
        extras.QUERIES[name](spark, sf_dir), extras.ORACLE[name], oracle, name
    )
