"""Custom Python DataSource (Spark 4 extension point) — a deterministic
partitioned row generator.

The reference engine's extensibility surface is its registered table
functions (`generate_series`, `parquet_scan`, file registrations);
Spark's modern equivalent for NEW sources is the Python DataSource API
(SPARK-44076): a pure-Python connector that declares a schema, splits
itself into InputPartitions, and yields rows per partition — the
harness runs it Arrow-batched on the executors, so a 1000-partition
read parallelizes like any file scan. `docrange` generates the rows
arithmetically so the driver's DuckDB oracle can replay them from
generate_series — gating the whole extension point (registration,
option plumbing, schema, partition planning, per-partition reads)
end-to-end on values, not just row counts.

Scale note: partition count is an option; each partition yields its
contiguous range independently (no driver materialization), which is
the same contract a real connector (REST cursor, queue shard, KV
range) implements.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

DOCRANGE_MOD = 997  # val = (i * i) % DOCRANGE_MOD — replayable in SQL


class DocRangeReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("partitions", 8))

    def partitions(self):
        step = -(-self.n // self.parts)
        return [
            InputPartition((i * step, min((i + 1) * step, self.n)))
            for i in range(self.parts)
            if i * step < self.n
        ]

    def read(self, partition: InputPartition):
        lo, hi = partition.value
        for i in range(lo, hi):
            yield (i, i % 10, (i * i) % DOCRANGE_MOD)


class DocRangeSource(DataSource):
    """spark.read.format("docrange").option("n", N) -> N deterministic
    rows (id, grp = id % 10, val = id^2 % 997) split over
    `partitions` contiguous ranges."""

    @classmethod
    def name(cls) -> str:
        return "docrange"

    def schema(self) -> str:
        return "id bigint, grp int, val bigint"

    def reader(self, schema) -> DocRangeReader:
        return DocRangeReader(self.options)

    def simpleStreamReader(self, schema):
        return DocRangeStreamReader(self.options)


def register(spark) -> None:
    """Idempotent per-session registration of the docrange format."""
    if not spark.__dict__.get("_dws_docrange_registered"):
        spark.dataSource.register(DocRangeSource)
        spark.__dict__["_dws_docrange_registered"] = True


# ------------------------------------------------- streaming extension
try:  # Spark >= 4: python streaming sources
    from pyspark.sql.datasource import SimpleDataSourceStreamReader
except ImportError:  # pragma: no cover - older runtime
    SimpleDataSourceStreamReader = object


class DocRangeStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of `docrange`: offsets are plain row positions;
    each micro-batch advances the offset by `batch` rows and yields
    the same arithmetic rows the batch reader generates, so stream
    output is REPLAYABLE from any (start, end) offset pair — the
    contract that makes checkpoint recovery exactly-once.

    The Simple reader variant reads on the driver and lets Spark
    distribute/prefetch — the right shape for a bounded control
    stream (cursor polling, change feeds). A partition-planned
    DataSourceStreamReader is the high-volume path; the BATCH half of
    this source already demonstrates executor-side partitioned reads,
    so the two halves together cover both shapes."""

    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.batch = int(options.get("batch", max(1, self.n // 4)))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start: dict):
        lo = int(start["i"])
        hi = min(lo + self.batch, self.n)
        return self._rows(lo, hi), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["i"]), int(end["i"]))

    @staticmethod
    def _rows(lo: int, hi: int):
        # a LIST ITERATOR, not a generator: Spark's runner wants an
        # iterator, and its prefetch cache copy.copy()s it for replay
        # — list iterators copy, generators don't
        return iter([(i, i % 10, (i * i) % DOCRANGE_MOD) for i in range(lo, hi)])
