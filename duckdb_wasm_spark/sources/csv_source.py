"""CSV ingestion with the reference's option surface (ref
WebDB::Connection::InsertCSVFromPath lib/src/webdb.cc:339-404; option
packing lib/src/csv_insert_options.cc; TS surface
packages/duckdb-wasm/src/bindings/insert_options.ts:20-36; test corpus
packages/duckdb-wasm/test/insert_csv.test.ts).

Options → Spark reader mapping:
  header            → header (auto-sniffed when auto_detect and unset)
  delimiter         → sep
  quote / escape    → quote / escape
  skip              → leading-line drop (no native Spark option: the file
                      is read as a line dataset, the first N lines are
                      filtered positionally, and the CSV parser runs over
                      the remainder — still distributed)
  dateformat        → dateFormat
  timestampformat   → timestampFormat
  columns           → explicit StructType via the type-name grammar
  auto_detect       → inferSchema + header sniffing

DuckDB names headerless columns column0..columnN-1; Spark names them
_c0.._cN-1 — renamed to match the reference.
"""

from __future__ import annotations

import csv as _csv
import io

from pyspark.sql import DataFrame, SparkSession

from duckdb_wasm_spark.sources.typenames import parse_columns


def _sniff_header(sample_lines: list[str], delimiter: str, quote: str) -> bool:
    """DuckDB-ish header sniff: the first row is a header iff none of its
    fields parses as a number while at least one field of some later row
    does. A single-row file is data, not header (insert_csv.test.ts
    'integers_auto_3')."""
    if len(sample_lines) < 2:
        return False

    def fields(line):
        return next(
            _csv.reader(io.StringIO(line), delimiter=delimiter, quotechar=quote)
        )

    def is_num(s):
        try:
            float(s)
            return True
        except ValueError:
            return False

    try:
        first = fields(sample_lines[0])
        if any(is_num(f) for f in first):
            return False
        for line in sample_lines[1:]:
            if any(is_num(f) for f in fields(line)):
                return True
    except StopIteration:
        return False
    return False


def read_csv(
    spark: SparkSession,
    path: str | None = None,
    text: str | None = None,
    header: bool | None = None,
    delimiter: str = ",",
    quote: str = '"',
    escape: str | None = None,
    skip: int = 0,
    dateformat: str | None = None,
    timestampformat: str | None = None,
    columns: dict | None = None,
    auto_detect: bool = True,
) -> DataFrame:
    """Scan a CSV file (or literal text) as a DataFrame with the
    reference's read_csv option semantics."""
    if (text is None) == (path is None):
        raise ValueError("pass exactly one of text= or path=")

    if text is not None:
        lines = text.splitlines()
        if skip:
            lines = lines[skip:]
        sample = lines[:64]
    else:
        # only a prefix is read driver-side (sniffing); the data scan
        # stays a distributed spark.read
        with open(path, "r", encoding="utf-8") as f:
            sample = [ln.rstrip("\r\n") for _, ln in zip(range(skip + 64), f)]
        sample = sample[skip:]
        lines = None

    if header is None:
        header = auto_detect and _sniff_header(sample, delimiter, quote)

    opts = {
        "header": str(bool(header)).lower(),
        "sep": delimiter,
        "quote": quote,
        "mode": "PERMISSIVE",
    }
    if escape is not None:
        opts["escape"] = escape
    if dateformat is not None:
        opts["dateFormat"] = dateformat
    if timestampformat is not None:
        opts["timestampFormat"] = timestampformat

    schema = parse_columns(columns) if columns else None
    if schema is None and auto_detect:
        opts["inferSchema"] = "true"

    reader = spark.read.options(**opts)
    if schema is not None:
        reader = reader.schema(schema)
    if lines is None and not skip:
        # scale path: native distributed file scan
        df = reader.csv(path)
    else:
        if lines is None:
            # path + skip: drop the first N physical lines positionally,
            # then run the same executor-parallel CSV parser over the
            # remaining line dataset
            rdd = (
                spark.sparkContext.textFile(path)
                .zipWithIndex()
                .filter(lambda t: t[1] >= skip)
                .map(lambda t: t[0])
            )
        else:
            rdd = spark.sparkContext.parallelize(lines)
        df = reader.csv(rdd)

    if schema is None:
        # match DuckDB's generated names for headerless files
        renames = {
            c: f"column{i}" for i, c in enumerate(df.columns) if c == f"_c{i}"
        }
        for old, new in renames.items():
            df = df.withColumnRenamed(old, new)
    elif not header and columns:
        df = df.toDF(*columns.keys())
    return df
