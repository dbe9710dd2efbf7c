"""duckdb_wasm_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the duckdb-wasm reference (see SURVEY.md).

Architecture (Spark-first, not a port):
  - ``session``    WebDB-shaped API (SparkDB/Connection) over a SparkSession
                   (reference: lib/src/webdb.cc WebDB / WebDB::Connection).
  - ``dialect``    DuckDB→Spark SQL translation (``::`` casts, parquet_scan,
                   generate_series, PRAGMA, COPY TO — SURVEY §4.2).
  - ``sources``    CSV / JSON (row-array + column-object w/ inference
                   lattice) / Arrow ingestion (reference lib/src/json_*.cc).
  - ``plans``      the query corpus: adapted TPC-H q1–q22, micro-benchmarks,
                   window/set-op extensions (reference
                   packages/benchmarks/scripts/tpch/*.sql).
  - ``operators``  LLM-data-pipeline extensions: dedup (exact / MinHash-LSH /
                   SimHash / n-gram Jaccard), similarity search, text
                   analysis, multimodal column plumbing.
  - ``streaming``  Structured Streaming over the events table (extension
                   scope, SURVEY §7 phase 5).

Everything is DataFrame/Spark-SQL declarative so Catalyst does pushdown,
pruning, join selection, and AQE; Python UDFs appear only where built-ins
cannot express the semantics (and then as Arrow-batched pandas UDFs).
"""

from duckdb_wasm_spark.tables import TABLES, load_table, load_tables

__all__ = ["TABLES", "load_table", "load_tables"]
__version__ = "0.1.0"
