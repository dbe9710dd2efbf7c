"""Query corpus: adapted TPC-H (tpch), micro-benchmarks (micro), and
window/set-op/events extensions (extras). Each module exposes

  QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
  ORACLE:  dict[str, str]   # DuckDB-runnable ANSI SQL equivalents

which ``__spark_entry__.py`` merges for the driver's correctness gate.
"""
