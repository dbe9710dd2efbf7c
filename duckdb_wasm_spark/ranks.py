"""Two-phase distributed global rank (round-9 verdict #2/#3).

A `row_number() OVER (ORDER BY ...)` with no partition spec funnels the
whole corpus through ONE task — fine in a single-node columnar engine
(the DuckDB oracles keep that form: it is the reference semantics, not
our plan), a non-starter on a 1000-executor cluster. The distributed
equivalent: range-repartition on the sort key so rank blocks are
contiguous, rank WITHIN partitions (a window partitioned by the
physical partition id — embarrassingly parallel), then add per-
partition offsets (a prefix sum over <= RANK_PARTS rows, broadcast
back).

Correctness notes:
  - The frame is localCheckpoint'd: spark_partition_id() depends on
    the sampled range boundaries, so the lineage must evaluate ONCE —
    the offsets and the local ranks must observe the same pids. The
    ranks themselves are boundary-independent (offset + local rank is
    exact for ANY contiguous split of the sorted order).
  - Ties in the sort key make row-level rank assignment
    nondeterministic ACROSS tied rows; the VALUE of the ordered
    columns at a given rank is still exact and deterministic. Callers
    therefore read only the ordered columns at a picked rank (the
    order-statistic use), never row identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Rank blocks per corpus. At 100 TB this would follow the executor
# count; the offsets window stays a <= RANK_PARTS-row frame either way.
RANK_PARTS = 32


def global_ranks(df: DataFrame, cols: list[str]) -> DataFrame:
    """`df` (narrow: project to the sort columns first) plus a global
    1-based `rn` rank column under ORDER BY `cols`, with no
    partition-less corpus window in the executed plan."""
    part = df.repartitionByRange(RANK_PARTS, *cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    loc = part.withColumn(
        "_rn_local",
        F.row_number().over(Window.partitionBy("_pid").orderBy(*cols)),
    ).localCheckpoint()
    counts = loc.groupBy("_pid").agg(F.max("_rn_local").alias("_c"))
    # prefix sum over <= RANK_PARTS rows — bounded by construction
    offs = counts.select(
        "_pid",
        F.coalesce(
            F.sum("_c").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("_off"),
    )
    return (
        loc.join(F.broadcast(offs), "_pid")
        .withColumn("rn", F.col("_rn_local") + F.col("_off"))
        .drop("_pid", "_rn_local", "_off")
    )
