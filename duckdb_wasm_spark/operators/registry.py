"""Aggregated QUERIES/ORACLE registries for the LLM-pipeline operators —
merged into the driver contract by __spark_entry__.py."""

from __future__ import annotations

from duckdb_wasm_spark.operators import (
    dedup,
    ml_lsh,
    multimodal,
    pipeline,
    similarity,
    text,
)

QUERIES: dict = {}
ORACLE: dict[str, str] = {}
for _m in (text, dedup, similarity, multimodal, ml_lsh, pipeline):
    QUERIES.update(_m.QUERIES)
    ORACLE.update(_m.ORACLE)
