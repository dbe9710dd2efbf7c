"""True Structured Streaming pipelines over the events data:

  stream_tumbling_counts  file-source readStream → watermark → windowed
                          aggregation → memory sink; processes all
                          available input and must equal the batch form
  run_stateful_counts     applyInPandasWithState custom stateful
                          operator: per-event-type running totals kept
                          in GroupState across micro-batches

Scale notes: the file source feeds micro-batches per file
(maxFilesPerTrigger); watermark bounds state for late data; the
stateful operator's state is per-group and partition-local — the same
code runs against a Kafka source on a cluster unchanged.
"""

from __future__ import annotations

import os
import tempfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from duckdb_wasm_spark.tables import load_table


def _staged_stream_source(
    spark: SparkSession, sf_dir: str, n_files: int = 4
) -> tuple[str, T.StructType]:
    """Stage the events table as N parquet files so the file stream
    source delivers several micro-batches."""
    ev = load_table(spark, sf_dir, "events")
    # watermarks require TIMESTAMP (with zone): the naive-parquet ts
    # column arrives as TIMESTAMP_NTZ, which EventTimeWatermark rejects.
    # Cast at the staging boundary — session tz is UTC, so the mapping
    # is the identity a naive event log means.
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    out = tempfile.mkdtemp(prefix="events_stream_")
    ev.repartition(n_files).write.mode("overwrite").parquet(out)
    return out, ev.schema


def stream_tumbling_counts(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Run the 1-hour tumbling count as a real stream (watermarked) into
    a memory sink; returns (streamed_result, batch_expected)."""
    src_dir, schema = _staged_stream_source(spark, sf_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    name = f"tumbling_{os.getpid()}_{abs(hash(src_dir)) % 10000}"
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table(name)
    expected = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    return got, expected


_STATE_SCHEMA = T.StructType([T.StructField("total", T.LongType())])
_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("total", T.LongType()),
    ]
)


def _running_count(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    """Custom stateful operator: accumulate a per-key event count in
    GroupState and emit the running total each micro-batch."""
    n = sum(len(pdf) for pdf in pdfs)
    (total,) = state.get if state.exists else (0,)
    total += n
    state.update((total,))
    yield pd.DataFrame({"event_type": [key[0]], "total": [total]})


def run_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState running per-type counts over the staged
    event stream; returns the final memory-sink table (last update per
    key = total count)."""
    src_dir, schema = _staged_stream_source(spark, sf_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .groupBy("event_type")
        .applyInPandasWithState(
            _running_count,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = f"stateful_{os.getpid()}_{abs(hash(src_dir)) % 10000}"
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def stream_dedup_keys(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Streaming exact dedup: watermarked
    ``dropDuplicatesWithinWatermark`` over the (user_id, event_type)
    key — the streaming form of the batch exact-dedup operator. The
    watermark delay bounds the dedup state (keys older than the delay
    are evicted — the property that makes streaming dedup viable on an
    unbounded 100 TB feed); the delay here exceeds the staged data's
    span, so the kept KEY SET equals the batch distinct exactly.
    Returns (streamed keys, batch expected keys)."""
    src_dir, schema = _staged_stream_source(spark, sf_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .select("user_id", "event_type", "ts")
        .withWatermark("ts", "60 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    name = f"dedup_{os.getpid()}_{abs(hash(src_dir)) % 10000}"
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table(name)
    expected = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    return got, expected


def stream_session_counts(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Run the 10-minute-gap session count as a real watermarked stream
    (session_window is the stateful streaming session operator; batch
    events_session runs the same operator in batch mode). The watermark
    delay exceeds the staged data's span so no session is dropped and
    the final memory sink equals the batch result exactly.
    Returns (streamed_result, batch_expected)."""
    src_dir, schema = _staged_stream_source(spark, sf_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .withWatermark("ts", "365 days")
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n"
        )
    )
    name = f"session_{os.getpid()}_{abs(hash(src_dir)) % 10000}"
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table(name)
    expected = (
        load_table(spark, sf_dir, "events")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n"
        )
    )
    return got, expected
