"""Aggregated QUERIES/ORACLE registries for the LLM-pipeline operators —
merged into the driver contract by __spark_entry__.py."""

from __future__ import annotations

from duckdb_wasm_spark.operators import (
    dedup,
    graph,
    ml_lsh,
    multimodal,
    pipeline,
    selection,
    similarity,
    sketches,
    temporal,
    text,
)

QUERIES: dict = {}
ORACLE: dict[str, str] = {}
# ml_lsh (the only no-oracle, rows-only queries) is merged LAST so the
# driver's ordered correctness walk exercises every oracle-backed query
# before the expensive ML comparison points (round-2 verdict #1).
for _m in (text, dedup, similarity, multimodal, pipeline, temporal, sketches, graph, selection, ml_lsh):
    QUERIES.update(_m.QUERIES)
    ORACLE.update(_m.ORACLE)
