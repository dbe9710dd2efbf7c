"""Ingestion layer: CSV option surface (insert_csv.test.ts cases), JSON
row/column readers (insert_json behaviors), Arrow table + chunked IPC
ingestion (insert_arrow.test.ts:115-140), and the type-name grammar."""

import pyarrow as pa
import pytest
from pyspark.sql import types as T

from duckdb_wasm_spark.sources import arrow_source, csv_source, json_source
from duckdb_wasm_spark.sources.typenames import TypeNameError, parse_type


# ------------------------------------------------------------------ CSV
def test_csv_auto_header(spark):
    # insert_csv.test.ts 'integers_auto_1': quoted header + int data
    df = csv_source.read_csv(
        spark, text='"a","b","c"\n1,2,3\n4,5,6\n7,8,9\n'
    )
    assert df.columns == ["a", "b", "c"]
    assert [r.a for r in df.orderBy("a").collect()] == [1, 4, 7]


def test_csv_single_line_is_data(spark):
    # 'integers_auto_3': one line only → data row, generated names
    df = csv_source.read_csv(spark, text="a,b,c")
    assert df.columns == ["column0", "column1", "column2"]
    assert df.collect()[0][0] == "a"


def test_csv_explicit_columns(spark):
    # 'options_1': no header, explicit types, utf8 keeps "3" a string
    df = csv_source.read_csv(
        spark,
        text="1,2,3\n4,5,6\n7,8,9\n",
        header=False,
        auto_detect=False,
        columns={"a": "int16", "b": "int32", "c": "utf8"},
    )
    assert df.schema == T.StructType(
        [
            T.StructField("a", T.ShortType(), True),
            T.StructField("b", T.IntegerType(), True),
            T.StructField("c", T.StringType(), True),
        ]
    )
    rows = df.orderBy("a").collect()
    assert rows[0].c == "3" and rows[2].a == 7


def test_csv_delimiter_and_dateformat(spark):
    # 'options_2': pipe delimiter + dateformat
    df = csv_source.read_csv(
        spark,
        text="1|2|01/02/2020\n4|5|01/03/2020\n",
        header=False,
        delimiter="|",
        dateformat="MM/dd/yyyy",
        columns={"a": "int32", "b": "int32", "d": "date"},
    )
    rows = df.orderBy("a").collect()
    assert str(rows[0].d) == "2020-01-02"


def test_csv_skip_lines(spark, tmp_path):
    p = tmp_path / "skip.csv"
    p.write_text("garbage line\n# more garbage\na,b\n1,2\n3,4\n")
    df = csv_source.read_csv(spark, path=str(p), skip=2)
    assert df.columns == ["a", "b"]
    assert df.count() == 2


# ----------------------------------------------------------------- JSON
def test_json_rows(spark):
    df = json_source.read_json(
        spark, text='[{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]'
    )
    assert [f.name for f in df.schema] == ["a", "b"]
    assert df.schema["a"].dataType == T.IntegerType()
    assert {(r.a, r.b) for r in df.collect()} == {(1, "x"), (2, "y")}


def test_json_columns_shape(spark):
    df = json_source.read_json(
        spark, text='{"a": [1, 2, 3], "b": ["x", "y", "z"]}'
    )
    assert df.count() == 3
    assert {r.b for r in df.collect()} == {"x", "y", "z"}


def test_json_rows_from_file_distributed(spark, tmp_path):
    p = tmp_path / "rows.json"
    p.write_text('[{"a": 1}, {"a": 2}, {"a": 2147483648}]')
    df = json_source.read_json(spark, path=str(p))
    # uint32 inference widens to long in Spark
    assert df.schema["a"].dataType == T.LongType()
    assert df.count() == 3


_TS_GOLDEN_COLS = (
    '{ "a": ["2007-08-31 16:47", "2007-12-24 18:21",'
    ' "2008-02-01 09:00:22", "2009-01-01 12:00:00",'
    ' "2009-06-30 18:30:00"] }'
)


def test_json_cols_timestamp_golden_materializes(spark):
    # ADVICE r2: the cols_timestamp_1 golden must INGEST (not just
    # analyze) — parsed timestamps, no TypeError, no silent NULLs
    df = json_source.read_json(spark, text=_TS_GOLDEN_COLS)
    assert df.schema["a"].dataType == T.TimestampType()
    vals = sorted(str(r.a) for r in df.collect())
    assert vals[0] == "2007-08-31 16:47:00"
    assert None not in {r.a for r in df.collect()}


def test_json_rows_timestamp_from_file(spark, tmp_path):
    p = tmp_path / "ts.json"
    p.write_text(
        '[ {"a": "2007-08-31 16:47"}, {"a": "2007-12-24 18:21"},'
        ' {"a": "2008-02-01 09:00:22"} ]'
    )
    df = json_source.read_json(spark, path=str(p))
    assert df.schema["a"].dataType == T.TimestampType()
    got = sorted(str(r.a) for r in df.collect())
    assert got == [
        "2007-08-31 16:47:00", "2007-12-24 18:21:00", "2008-02-01 09:00:22",
    ]


def test_json_timestamp_mixed_int_epoch(spark):
    # cols_timestamp_mixed_1: raw ints are epoch seconds
    df = json_source.read_json(
        spark,
        text='{ "a": [1, 2, "2008-02-01 09:00:22"] }',
    )
    assert df.schema["a"].dataType == T.TimestampType()
    got = sorted(str(r.a) for r in df.collect())
    assert got[0] == "1970-01-01 00:00:01"
    assert got[2] == "2008-02-01 09:00:22"


def test_json_unrecognized_raises(spark):
    with pytest.raises(json_source.JSONShapeError):
        json_source.read_json(spark, text='{"a": 1}')


def test_json_explicit_columns_override(spark):
    df = json_source.read_json(
        spark, text='[{"a": 1}, {"a": 2}]', columns={"a": "float64"}
    )
    assert df.schema["a"].dataType == T.DoubleType()


# ---------------------------------------------------------------- Arrow
def test_arrow_table_insert(spark):
    tbl = pa.table({"x": pa.array([1, 2, 3], pa.int32()), "y": ["a", "b", "c"]})
    df = arrow_source.insert_arrow_table(spark, tbl)
    assert df.count() == 3
    assert df.schema["x"].dataType == T.IntegerType()


def test_arrow_unsigned_widening(spark):
    tbl = pa.table(
        {
            "u32": pa.array([1, 2**32 - 1], pa.uint32()),
            "u64": pa.array([1, 2**64 - 1], pa.uint64()),
        }
    )
    df = arrow_source.insert_arrow_table(spark, tbl)
    assert df.schema["u32"].dataType == T.LongType()
    assert df.schema["u64"].dataType == T.DecimalType(20, 0)
    got = df.orderBy("u32").collect()[-1]
    assert got.u32 == 2**32 - 1 and int(got.u64) == 2**64 - 1


def test_arrow_chunked_ipc_stream(spark):
    # insert_arrow.test.ts:115-140 — multi-batch stream fed in chunks
    tbl = pa.table({"v": list(range(100))})
    ipc = arrow_source.table_to_ipc(tbl)
    ins = arrow_source.ArrowIPCInserter(spark)
    third = len(ipc) // 3
    ins.consume(ipc[:third])
    ins.consume(ipc[third : 2 * third])
    ins.consume(ipc[2 * third :])
    df = ins.finish()
    assert df.count() == 100


# ------------------------------------------------------------ typenames
def test_typename_grammar():
    assert parse_type("int32") == T.IntegerType()
    assert parse_type("utf8") == T.StringType()
    assert parse_type("timestamp[s]") == T.TimestampType()
    assert parse_type("uint64") == T.DecimalType(20, 0)
    assert parse_type(
        {"type": "list", "children": [{"type": "int64"}]}
    ) == T.ArrayType(T.LongType())
    assert parse_type(
        {
            "type": "struct",
            "children": [
                {"name": "a", "type": "bool"},
                {"name": "b", "type": "double"},
            ],
        }
    ) == T.StructType(
        [
            T.StructField("a", T.BooleanType(), True),
            T.StructField("b", T.DoubleType(), True),
        ]
    )
    with pytest.raises(TypeNameError):
        parse_type("union")
    with pytest.raises(TypeNameError):
        parse_type("no_such_type")


def test_pydatasource_partitions_and_values(spark):
    """Custom Python DataSource (docrange): partition planning must
    honor the option (contiguous non-overlapping ranges), values must
    follow the declared arithmetic, and a partitions count that
    doesn't divide n must not drop or duplicate rows."""
    from duckdb_wasm_spark.sources import pydatasource

    pydatasource.register(spark)
    df = (
        spark.read.format("docrange")
        .option("n", 103)  # deliberately not divisible by partitions
        .option("partitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = df.collect()
    assert len(rows) == 103
    ids = sorted(r.id for r in rows)
    assert ids == list(range(103))
    for r in rows:
        assert r.grp == r.id % 10
        assert r.val == (r.id * r.id) % pydatasource.DOCRANGE_MOD


def test_docrange_stream_offsets_replay():
    """The streaming half's exactly-once contract, pinned without an
    engine: read(start) and readBetweenOffsets(start, end) must yield
    the identical rows, offsets advance by `batch` and clamp at n."""
    from duckdb_wasm_spark.sources.pydatasource import DocRangeStreamReader

    r = DocRangeStreamReader({"n": "100", "batch": "30"})
    assert r.initialOffset() == {"i": 0}
    it, off = r.read({"i": 0})
    rows1 = list(it)
    assert off == {"i": 30} and len(rows1) == 30
    assert rows1 == list(r.readBetweenOffsets({"i": 0}, off))
    # clamp: final partial batch stops exactly at n
    it, off = r.read({"i": 90})
    assert off == {"i": 100} and len(list(it)) == 10
    # drained source: no rows, offset unchanged (processAllAvailable halts)
    it, off = r.read({"i": 100})
    assert off == {"i": 100} and list(it) == []
