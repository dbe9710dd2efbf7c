"""Arrow ingestion: Tables and chunked IPC streams → Spark DataFrames
(ref WebDB::Connection::InsertArrowFromIPCStream lib/src/webdb.cc:
280-337; decoder lib/src/arrow_stream_buffer.cc; multi-batch append
test packages/duckdb-wasm/test/insert_arrow.test.ts:115-140).

The reference accumulates IPC bytes until end-of-stream, then scans the
whole stream as one arrow_scan. Here the IPC stream is decoded with
pyarrow and handed to spark.createDataFrame (Arrow-accelerated).
Unsigned columns are widened per the policy in sources/typenames.py —
same schema change the reference's BigInt patching implies.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession


_WIDEN = {
    pa.uint8(): pa.int16(),
    pa.uint16(): pa.int32(),
    pa.uint32(): pa.int64(),
    pa.uint64(): pa.decimal128(20, 0),
}


def _widen_unsigned(table: pa.Table) -> pa.Table:
    """Spark has no unsigned ints; widen them losslessly (SURVEY §1.3a)."""
    fields = []
    changed = False
    for f in table.schema:
        tgt = _WIDEN.get(f.type)
        if tgt is not None:
            fields.append(pa.field(f.name, tgt, f.nullable))
            changed = True
        else:
            fields.append(f)
    if not changed:
        return table
    return table.cast(pa.schema(fields))


def insert_arrow_table(spark: SparkSession, table: pa.Table) -> DataFrame:
    """Arrow Table → DataFrame (ref insertArrowTable)."""
    return spark.createDataFrame(_widen_unsigned(table))


class ArrowIPCInserter:
    """Chunked IPC-stream ingestion (ref BufferingArrowIPCStreamDecoder):
    feed consume() arbitrary byte chunks; finish() decodes the complete
    stream and returns the DataFrame."""

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._chunks: list[bytes] = []

    def consume(self, chunk: bytes) -> None:
        self._chunks.append(bytes(chunk))

    def finish(self) -> DataFrame:
        buf = b"".join(self._chunks)
        self._chunks.clear()
        with pa.ipc.open_stream(buf) as reader:
            table = reader.read_all()
        return insert_arrow_table(self._spark, table)


def table_to_ipc(table: pa.Table) -> bytes:
    """Serialize a Table as one IPC stream (test/utility helper — the
    egress format of the reference API, webdb.cc:101-118)."""
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema) as w:
        for batch in table.to_batches():
            w.write_batch(batch)
    return sink.getvalue().to_pybytes()
