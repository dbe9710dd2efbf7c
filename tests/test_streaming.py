"""Streaming: window-aggregation oracle parity (batch form of the
streaming operators) and real Structured Streaming runs (file source →
watermark/state → memory sink) checked against batch results."""

import pytest
from pyspark.sql import functions as F

from duckdb_wasm_spark.streaming import live, windows
from duckdb_wasm_spark.testing import assert_parity


@pytest.mark.parametrize("name", sorted(windows.QUERIES))
def test_window_parity(name, spark, sf_dir, oracle):
    assert name in windows.ORACLE
    assert_parity(
        windows.QUERIES[name](spark, sf_dir), windows.ORACLE[name], oracle, name
    )


def test_stream_tumbling_equals_batch(spark, sf_dir):
    got, expected = live.stream_tumbling_counts(spark, sf_dir)
    g = {(r.window_start, r.event_type): r.n for r in got.collect()}
    e = {(r.window_start, r.event_type): r.n for r in expected.collect()}
    assert g == e and len(g) > 0


def test_stateful_running_counts(spark, sf_dir):
    sink = live.run_stateful_counts(spark, sf_dir)
    # last update per key is the final running total == batch count
    final = {
        r.event_type: r.total
        for r in sink.groupBy("event_type")
        .agg(F.max("total").alias("total"))
        .collect()
    }
    from duckdb_wasm_spark.tables import load_table

    batch = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert final == batch


def test_stream_dedup_equals_batch_distinct(spark, sf_dir):
    # streaming dropDuplicatesWithinWatermark must keep exactly the
    # batch-distinct key set (watermark delay > data span; which ROW
    # survives per key is batch-order-dependent, the key set is not)
    from duckdb_wasm_spark.streaming import live

    got, expected = live.stream_dedup_keys(spark, sf_dir)
    g = {(r.user_id, r.event_type) for r in got.collect()}
    e = {(r.user_id, r.event_type) for r in expected.collect()}
    assert g == e and len(g) == got.count()


def test_stream_session_equals_batch(spark, sf_dir):
    """session_window as a real watermarked stream must converge to the
    batch session result once all files are processed (the watermark
    exceeds the data span, so no session is evicted early)."""
    from duckdb_wasm_spark.streaming.live import stream_session_counts

    got, expected = stream_session_counts(spark, sf_dir)
    g = {tuple(r) for r in got.collect()}
    e = {tuple(r) for r in expected.collect()}
    assert g == e and len(e) > 0


def test_stream_late_data_dropped_by_watermark(spark):
    """The late-data SEMANTICS, not just the happy path (round-5
    verdict task #7): a late row behind the watermark must be DROPPED
    by the stream; the batch form reproduces the stream only after
    filtering rows behind their micro-batch's watermark, and the naive
    batch (late row included) must DIFFER — proving the watermark did
    the dropping."""
    from duckdb_wasm_spark.streaming.live import stream_late_data_drop

    got, batch_filtered, batch_naive = stream_late_data_drop(spark)
    g = {tuple(r) for r in got.collect()}
    f = {tuple(r) for r in batch_filtered.collect()}
    n = {tuple(r) for r in batch_naive.collect()}
    assert g == f, f"stream != watermark-filtered batch: {g} vs {f}"
    assert g != n, "late row leaked: stream equals the naive batch"
    # exactly one finalized session (user 1) with the late row excluded
    assert len(g) == 1
    ((user_id, _start, count),) = g
    assert user_id == 1 and count == 3


def test_upsert_store_replay_idempotent(spark, tmp_path):
    """The upsert gate's exactly-once story: a re-delivered
    foreachBatch append (same batch_id, same content) must collapse in
    the last-writer-wins resolution — resolved state is identical with
    and without the replay."""
    store = str(tmp_path / "store")
    b0 = spark.createDataFrame(
        [(1, 3, 300), (2, 1, 100)],
        "user_id long, n_events long, sum_value_micros long",
    ).withColumn("_batch", F.lit(0))
    b1 = spark.createDataFrame(
        [(1, 5, 520)],
        "user_id long, n_events long, sum_value_micros long",
    ).withColumn("_batch", F.lit(1))
    b0.write.mode("append").parquet(store)
    b1.write.mode("append").parquet(store)
    before = sorted(
        map(tuple, live._resolve_upsert_store(spark, store).collect())
    )
    b1.write.mode("append").parquet(store)  # replayed delivery
    after = sorted(
        map(tuple, live._resolve_upsert_store(spark, store).collect())
    )
    assert before == after == [(1, 5, 520), (2, 1, 100)]
