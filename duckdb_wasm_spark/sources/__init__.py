"""Ingestion layer: CSV / JSON / Arrow → Spark DataFrames.

  typenames      the reference's user-facing type-name grammar →
                 Spark DataTypes (ref lib/src/json_typedef.cc:201-261)
  json_analyzer  JSON table-shape detection (ROW_ARRAY vs COLUMN_OBJECT)
                 + the type-promotion lattice, reimplemented pure-Python
                 (ref lib/src/json_analyzer.cc:140-296; goldens
                 lib/test/json_analyzer_test.cc:66-407)
  json_source    read_json: row-shape via Spark's multiLine JSON reader
                 (scale path), column-shape via the analyzer + transpose
  csv_source     read_csv with the reference option surface
                 (ref lib/src/webdb.cc:339-404, csv_insert_options.cc)
  arrow_source   Arrow Table / IPC-stream ingestion (ref webdb.cc:280-337)
"""
