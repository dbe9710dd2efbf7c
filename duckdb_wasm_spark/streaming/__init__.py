"""Streaming over the `events` table (extension scope — the reference's
"streaming" is result-cursor streaming only, SURVEY §2.10; event-time
processing is the driver-mandated extension, SURVEY §7 phase 5).

  windows   event-time window aggregations (tumbling / sliding /
            session) as BATCH DataFrame queries with DuckDB oracles —
            the same expressions Structured Streaming executes
            incrementally, registered in the driver correctness gate
  live      true Structured Streaming pipelines: file-source readStream
            with watermark + windowed aggregation into a memory sink,
            and an applyInPandasWithState custom stateful operator;
            exercised in tests (a streaming sink can't be hash-compared
            by the batch oracle driver)
"""
