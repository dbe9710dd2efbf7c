"""Direct unit tests for ranks.global_ranks (two-phase distributed
rank, round-9 verdict #2/#3) — previously pinned only transitively
through the zonemap/hist oracle gates. Cases are the adversarial
shapes for a range-repartition + offset scheme: duplicates (rank
blocks split MID-tie), all-equal keys (every row one range bucket),
presorted/reversed input (degenerate sampling), single row, and a
two-column tie-broken order."""

import pytest
from pyspark.sql import functions as F

from duckdb_wasm_spark import ranks


CASES = {
    "duplicates": [5, 3, 5, 1, 5, 3, 9, 5, 0, 5],
    "all_equal": [7] * 40,
    "presorted": list(range(30)),
    "reversed": list(range(30, 0, -1)),
    "single": [42],
    "skewed_dups": [1] * 25 + [2] * 3 + [3] * 12,
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_global_ranks_match_sorted_order(spark, name):
    vals = CASES[name]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    ).repartition(7)  # physical layout unrelated to the sort key
    got = ranks.global_ranks(df.select("v"), ["v"]).collect()
    assert sorted(r["rn"] for r in got) == list(range(1, len(vals) + 1))
    # the ORDERED-COLUMN VALUE at each rank is the order statistic —
    # exactly what the zonemap/hist consumers read (row identity at
    # tied ranks is explicitly out of contract, see ranks.py)
    by_rank = [r["v"] for r in sorted(got, key=lambda r: r["rn"])]
    assert by_rank == sorted(vals)


def test_global_ranks_two_column_order(spark):
    rows = [(g, v) for g in (2, 1, 3) for v in (9, 9, 1, 4, 4, 4)]
    df = spark.createDataFrame(rows, "g long, v long").repartition(5)
    got = ranks.global_ranks(df, ["g", "v"]).collect()
    by_rank = [
        (r["g"], r["v"]) for r in sorted(got, key=lambda r: r["rn"])
    ]
    assert by_rank == sorted(rows)


def test_global_ranks_plan_has_no_partitionless_corpus_window(spark):
    """The point of the helper: the only partition-less Window in its
    executed plan is the <= RANK_PARTS-row offset prefix sum; the
    corpus-sized rank window must be partitioned (by _pid)."""
    import re

    df = spark.range(10_000).select(F.col("id").alias("v"))
    ranked = ranks.global_ranks(df, ["v"])
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    pat = re.compile(r"windowspecdefinition\([^,()]+ (?:ASC|DESC) NULLS")
    # exactly ONE partition-less window survives in the result plan:
    # the offsets prefix sum, whose input is the per-_pid counts
    # aggregate (<= RANK_PARTS rows by construction — the allowlisted
    # bounded-frame shape). The corpus-sized rank window ran inside
    # the checkpoint, partitioned by _pid (pinned below).
    nopart = pat.findall(plan)
    assert len(nopart) == 1 and "_pid" in nopart[0], plan[:1200]
    assert "sum(_c" in plan, plan[:1200]
    part = df.repartitionByRange(ranks.RANK_PARTS, "v").withColumn(
        "_pid", F.spark_partition_id()
    )
    from pyspark.sql.window import Window

    loc = part.withColumn(
        "_rn_local",
        F.row_number().over(Window.partitionBy("_pid").orderBy("v")),
    )
    lplan = loc._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(_pid" in lplan

@pytest.mark.parametrize("name", sorted(CASES))
def test_keyed_ranks_match_per_group_sorted_order(spark, name):
    """keys= variant: rn restarts per key group and equals the
    in-group sorted position — checked against a python groupby over
    the same adversarial value shapes as the global cases."""
    vals = CASES[name]
    rows = [(i % 3, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(7)
    got = ranks.global_ranks(df, ["v"], keys=["k"]).collect()
    for k in {r[0] for r in rows}:
        grp = sorted(v for kk, v in rows if kk == k)
        got_k = sorted(
            (r["rn"], r["v"]) for r in got if r["k"] == k
        )
        assert [rn for rn, _ in got_k] == list(range(1, len(grp) + 1))
        assert [v for _, v in got_k] == grp


def test_keyed_ranks_plan_is_fully_partitioned(spark):
    """With keys, even the offsets prefix sum is partitioned (by the
    keys) — the executed plan contains NO partition-less window at
    all, and the rank window partitions by (_pid, key)."""
    import re

    df = spark.range(10_000).select(
        (F.col("id") % 4).alias("k"), F.col("id").alias("v")
    )
    ranked = ranks.global_ranks(df, ["v"], keys=["k"])
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    pat = re.compile(r"windowspecdefinition\([^,()]+ (?:ASC|DESC) NULLS")
    assert pat.findall(plan) == [], plan[:1500]
    assert "windowspecdefinition(_pid" in plan or "windowspecdefinition(k" in plan
