"""JSON ingestion → Spark DataFrame (ref WebDB::Connection::
InsertJSONFromPath, lib/src/webdb.cc:406-447; readers
lib/src/json_table.cc:146-330).

Shape handling:
  ROW_ARRAY      the scale path — handed to Spark's native JSON reader
                 (`multiLine` for a top-level array document, NDJSON
                 works too); with an inferred or explicit schema applied
                 so the promotion lattice, not Spark's inference, decides
                 types.
  COLUMN_OBJECT  inherently a single-document transpose; parsed
                 driver-side via the analyzer's column boundaries and
                 built with spark.createDataFrame. (In the reference
                 this shape arrives as an in-memory browser buffer —
                 it is small by construction; huge corpora arrive as
                 row-shaped files, which stay distributed here.)
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from duckdb_wasm_spark.sources.json_analyzer import (
    Shape,
    TableType,
    analyze_json,
    loads_lenient,
    normalize_json_text,
)
from duckdb_wasm_spark.sources.typenames import parse_columns


class JSONShapeError(ValueError):
    pass


# timestamp[s] inputs the analyzer accepts (_is_timestamp_string:
# date, or date + HH:MM[:SS], ' ' or 'T' separator) plus epoch-seconds
# integers (the mixed int+timestamp goldens)
_TS_FORMATS = ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M", "%Y-%m-%d")
_TS_SQL_FORMATS = (
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm",
    "yyyy-MM-dd'T'HH:mm",
    "yyyy-MM-dd",
)


def _to_datetime(v):
    """Driver-side timestamp coercion matching the analyzer's accepted
    shapes; unparseable values become NULL (PERMISSIVE semantics)."""
    from datetime import datetime, timezone

    if v is None:
        return None
    if isinstance(v, datetime):
        return v
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return datetime.fromtimestamp(int(v), tz=timezone.utc).replace(
            tzinfo=None
        )
    if isinstance(v, str):
        s = v.replace("T", " ")
        for fmt in _TS_FORMATS:
            try:
                return datetime.strptime(s, fmt)
            except ValueError:
                pass
    return None


def _parse_timestamp_columns(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Columns read as strings (see _stringify_timestamps) → real
    timestamps via a lenient format chain + epoch-seconds fallback,
    entirely JVM-side (top-level fields only, like the inference)."""
    from pyspark.sql import functions as F

    exprs = []
    for f in schema:
        if isinstance(f.dataType, T.TimestampType):
            c = F.col(f.name)
            exprs.append(
                F.coalesce(
                    *[F.try_to_timestamp(c, F.lit(fmt)) for fmt in _TS_SQL_FORMATS],
                    F.timestamp_seconds(c.try_cast("bigint")),
                ).alias(f.name)
            )
        else:
            exprs.append(F.col(f.name))
    return df.select(*exprs)


def _stringify_timestamps(schema: T.StructType) -> T.StructType:
    return T.StructType(
        [
            T.StructField(
                f.name,
                T.StringType()
                if isinstance(f.dataType, T.TimestampType)
                else f.dataType,
                True,
            )
            for f in schema
        ]
    )


def _strip_nulltype(schema: T.StructType) -> T.StructType:
    """Spark cannot materialize NullType columns from JSON input; they
    surface as all-null strings (the reference keeps a real null type —
    arrow has one, Spark doesn't)."""
    return T.StructType(
        [
            T.StructField(
                f.name,
                T.StringType() if isinstance(f.dataType, T.NullType) else f.dataType,
                True,
            )
            for f in schema
        ]
    )


def read_json(
    spark: SparkSession,
    text: str | None = None,
    path: str | None = None,
    shape: str | None = None,
    columns: dict | None = None,
) -> DataFrame:
    """Ingest a JSON document (text or file path) as a DataFrame.

    shape: 'rows' | 'columns' | None (auto-detect, ref
    json_insert_options.h:17-26 AUTO). columns: explicit {name: type}
    (type-name grammar) overriding inference.
    """
    if (text is None) == (path is None):
        raise ValueError("pass exactly one of text= or path=")
    if text is None:
        with open(path, "rb") as f:
            text = f.read().decode("utf-8")
    raw_text = text
    text = normalize_json_text(text)
    if text is not raw_text:
        path = None  # lenient cleanup: scan the normalized buffer, not the file

    table: TableType = analyze_json(text)
    if shape == "rows":
        if not text.lstrip().startswith("["):
            raise JSONShapeError("expected a top-level JSON array for shape=rows")
        table.shape = Shape.ROW_ARRAY
    elif shape == "columns":
        if table.shape != Shape.COLUMN_OBJECT:
            raise JSONShapeError("document is not a column-object")
    elif table.shape == Shape.UNRECOGNIZED:
        raise JSONShapeError("unrecognized JSON table shape")

    if columns is not None:
        schema = parse_columns(columns)
    else:
        schema = _strip_nulltype(table.type.to_spark())

    if table.shape == Shape.ROW_ARRAY:
        # timestamp columns are read as strings, then parsed with a
        # lenient format chain (Spark's default timestampFormat silently
        # NULLs e.g. '2007-08-31 16:47' and raw epoch ints)
        read_schema = _stringify_timestamps(schema)
        if path is not None:
            # scale path: Spark's distributed multiLine JSON scan (the
            # analyzer only sampled the document for the schema)
            raw = spark.read.schema(read_schema).option(
                "multiLine", "true"
            ).json(path)
            return _parse_timestamp_columns(raw, schema)
        # text buffer: parse via from_json over a one-element dataset
        ds = spark.createDataFrame([(text,)], ["value"])
        from pyspark.sql import functions as F

        parsed = ds.select(
            F.explode(
                F.from_json(
                    F.col("value"), T.ArrayType(read_schema), {"mode": "PERMISSIVE"}
                )
            ).alias("row")
        )
        return _parse_timestamp_columns(parsed.select("row.*"), schema)

    # COLUMN_OBJECT: transpose driver-side using the analyzer's spans
    doc = loads_lenient(text)
    names = [f.name for f in schema]
    ts_cols = {
        f.name for f in schema if isinstance(f.dataType, T.TimestampType)
    }
    arrays = {k: doc.get(k, []) for k in names}
    for k in ts_cols:  # coerce strings/epoch-ints to datetime driver-side
        arrays[k] = [_to_datetime(v) for v in arrays[k]]
    n_rows = max((len(v) for v in arrays.values()), default=0)
    rows = [
        tuple(
            arrays[k][i] if i < len(arrays[k]) else None for k in names
        )
        for i in range(n_rows)
    ]
    return spark.createDataFrame(rows, schema=schema) if rows else (
        spark.createDataFrame([], schema=schema)
    )
