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
        if path is not None:
            # scale path: Spark's distributed multiLine JSON scan (the
            # analyzer only sampled the document for the schema)
            return spark.read.schema(schema).option("multiLine", "true").json(
                path
            )
        # text buffer: parse via from_json over a one-element dataset
        ds = spark.createDataFrame([(text,)], ["value"])
        from pyspark.sql import functions as F

        parsed = ds.select(
            F.explode(
                F.from_json(
                    F.col("value"), T.ArrayType(schema), {"mode": "PERMISSIVE"}
                )
            ).alias("row")
        )
        return parsed.select("row.*")

    # COLUMN_OBJECT: transpose driver-side using the analyzer's spans
    doc = loads_lenient(text)
    names = [f.name for f in schema]
    arrays = {k: doc.get(k, []) for k in names}
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
