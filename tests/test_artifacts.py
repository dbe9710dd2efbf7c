"""Unit tests for the disk-persisted index-artifact store
(duckdb_wasm_spark/artifacts.py, round-10 verdict #4): the lifecycle
properties the ANN/LSH consumers rely on — build-once, reload
value-identical, session-memo identity, fingerprint invalidation on
source change, supersession of stale fingerprints — tested directly
against a scratch source table so a regression cannot hide behind the
operator gates."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from duckdb_wasm_spark import artifacts


@pytest.fixture()
def scratch_sf(tmp_path, spark):
    """A miniature sf_dir with one 'embeddings' table."""
    d = tmp_path / "sf"
    d.mkdir()
    spark.range(20).select(
        F.col("id").alias("vec_id"), (F.col("id") * 2).alias("v")
    ).coalesce(1).write.parquet(str(d / "embeddings.parquet"))
    return str(d)


def _clean(kind):
    shutil.rmtree(os.path.join(artifacts._ROOT, kind), ignore_errors=True)


def test_build_once_then_reload_identical(spark, scratch_sf):
    _clean("t_basic")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return {
            "a": spark.range(5).select(F.col("id").alias("x")),
            "b": spark.range(3).select((F.col("id") + 10).alias("y")),
        }

    got1 = artifacts.persisted_frames(
        spark, "t_basic", scratch_sf, ("embeddings",), build
    )
    assert calls["n"] == 1
    assert sorted(r["x"] for r in got1["a"].collect()) == [0, 1, 2, 3, 4]
    # same session: memo identity, no rebuild, no re-read
    got2 = artifacts.persisted_frames(
        spark, "t_basic", scratch_sf, ("embeddings",), build
    )
    assert calls["n"] == 1
    assert got2["a"] is got1["a"]
    # fresh "session" (drop the memo): reload from disk, still no build
    spark.__dict__.pop("_dws_disk_artifacts")
    got3 = artifacts.persisted_frames(
        spark, "t_basic", scratch_sf, ("embeddings",), build
    )
    assert calls["n"] == 1
    assert sorted(r["y"] for r in got3["b"].collect()) == [10, 11, 12]


def test_fingerprint_invalidates_on_source_change(spark, scratch_sf):
    _clean("t_stale")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return {"a": spark.range(2).select(F.col("id").alias("x"))}

    artifacts.persisted_frames(
        spark, "t_stale", scratch_sf, ("embeddings",), build
    )
    fp1 = artifacts._fingerprint(scratch_sf, ("embeddings",))
    # regenerate the source table (the driver does this between
    # rounds): mtime/size change -> new fingerprint -> rebuild, and
    # the superseded fingerprint dir is deleted
    src = os.path.join(scratch_sf, "embeddings.parquet")
    os.utime(src, (1, 1))
    fp2 = artifacts._fingerprint(scratch_sf, ("embeddings",))
    assert fp2 != fp1
    spark.__dict__.pop("_dws_disk_artifacts")
    artifacts.persisted_frames(
        spark, "t_stale", scratch_sf, ("embeddings",), build
    )
    assert calls["n"] == 2
    src_dir = os.path.join(
        artifacts._ROOT, "t_stale", artifacts._source_key(scratch_sf)
    )
    got = sorted(
        d for d in os.listdir(src_dir) if not d.startswith("_")
    )
    assert got == [fp2], "superseded fingerprint not cleaned"


def test_partial_build_is_not_served(spark, scratch_sf):
    """A dir without the commit marker (torn build: the process died
    mid-write) must rebuild, never serve partial frames."""
    _clean("t_torn")
    fp = artifacts._fingerprint(scratch_sf, ("embeddings",))
    base = os.path.join(artifacts._ROOT, "t_torn", fp)
    os.makedirs(os.path.join(base, "a"), exist_ok=True)  # no marker
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return {"a": spark.range(4).select(F.col("id").alias("x"))}

    got = artifacts.persisted_frames(
        spark, "t_torn", scratch_sf, ("embeddings",), build
    )
    assert calls["n"] == 1
    assert got["a"].count() == 4


def test_two_source_dirs_coexist_and_dead_sources_prune(
    spark, tmp_path
):
    """Artifacts for DIFFERENT sf_dirs of the same kind must coexist
    (the flat first cut wiped sf0.01's store whenever sf0.1 built);
    source keys whose directory vanished (temp staged bench layouts)
    are pruned on the next build."""
    _clean("t_coex")
    dirs = []
    for name in ("sfA", "sfB"):
        d = tmp_path / name
        d.mkdir()
        spark.range(5).select(F.col("id").alias("vec_id")).coalesce(
            1
        ).write.parquet(str(d / "embeddings.parquet"))
        dirs.append(str(d))
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return {"a": spark.range(3).select(F.col("id").alias("x"))}

    for d in dirs:
        artifacts.persisted_frames(
            spark, "t_coex", d, ("embeddings",), build
        )
    assert calls["n"] == 2
    # both coexist: a fresh session serves BOTH without rebuilding
    spark.__dict__.pop("_dws_disk_artifacts")
    for d in dirs:
        artifacts.persisted_frames(
            spark, "t_coex", d, ("embeddings",), build
        )
    assert calls["n"] == 2, "coexisting artifact was wiped"
    # kill sfA's source dir: the next build prunes its subtree
    shutil.rmtree(dirs[0])
    spark.__dict__.pop("_dws_disk_artifacts")
    c = tmp_path / "sfC"
    c.mkdir()
    spark.range(2).select(F.col("id").alias("vec_id")).coalesce(
        1
    ).write.parquet(str(c / "embeddings.parquet"))
    artifacts.persisted_frames(
        spark, "t_coex", str(c), ("embeddings",), build
    )
    kind_dir = os.path.join(artifacts._ROOT, "t_coex")
    keys = set(os.listdir(kind_dir))
    assert artifacts._source_key(dirs[0]) not in keys, "dead source kept"
    assert artifacts._source_key(dirs[1]) in keys
    assert artifacts._source_key(str(c)) in keys


def test_layout_respread_hash_partitions_named_frames(spark, scratch_sf):
    """The `layout` spec (r12, graph edge frames) must bring named
    frames back hash-partitioned on the given columns and leave
    unnamed frames round-robin — and reload must stay value-identical
    either way."""
    _clean("t_layout")

    def build():
        return {
            "keyed": spark.range(40).select(
                (F.col("id") % 7).alias("k"), F.col("id").alias("v")
            ),
            "plain": spark.range(9).select(F.col("id").alias("x")),
        }

    got = artifacts.persisted_frames(
        spark,
        "t_layout",
        scratch_sf,
        ("embeddings",),
        build,
        layout={"keyed": ["k"]},
    )
    # hash partitioning: all rows of one key land in one partition
    parts = (
        got["keyed"]
        .select("k", F.spark_partition_id().alias("pid"))
        .groupBy("k")
        .agg(F.count_distinct("pid").alias("np"))
        .collect()
    )
    assert all(r["np"] == 1 for r in parts), parts
    assert sorted(r["x"] for r in got["plain"].collect()) == list(range(9))
    # values identical to a fresh build
    fresh = build()
    assert got["keyed"].exceptAll(fresh["keyed"]).count() == 0
    assert fresh["keyed"].exceptAll(got["keyed"]).count() == 0
    _clean("t_layout")


def test_graph_edges_reload_equals_rebuild(spark, sf_dir):
    """The disk-persisted graph edge frames (r11 verdict #4) must
    serve exactly what a fresh derivation computes, for every shape
    the family consumes."""
    from duckdb_wasm_spark.operators import graph
    from duckdb_wasm_spark.tables import load_table

    served_cs = graph._edges(spark, sf_dir, "cs")
    fresh_cs = graph._trade_pairs(spark, sf_dir).select(
        F.col("a").alias("cust"), F.col("b").alias("supp")
    )
    assert served_cs.exceptAll(fresh_cs).count() == 0
    assert fresh_cs.exceptAll(served_cs).count() == 0

    served_deg = graph._edges(spark, sf_dir, "deg_sym")
    sym = graph._edges(spark, sf_dir, "sym")
    fresh_deg = (
        sym.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .select(F.col("src").alias("node"), "outdeg")
    )
    assert served_deg.exceptAll(fresh_deg).count() == 0
    assert fresh_deg.exceptAll(served_deg).count() == 0

    served_symw = graph._edges(spark, sf_dir, "symw")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    wsym = pairs.selectExpr("a src", "b dst", "w").unionByName(
        pairs.selectExpr("b src", "a dst", "w")
    )
    fresh_symw = wsym.unionByName(
        wsym.select("src")
        .distinct()
        .selectExpr("src", "src dst", "cast(1 as bigint) w")
    )
    assert served_symw.exceptAll(fresh_symw).count() == 0
    assert fresh_symw.exceptAll(served_symw).count() == 0


def test_kmeanspp_cand_reload_equals_rebuild(spark, sf_dir):
    """The disk-persisted k-means|| candidate set (r11 verdict #4) must
    serve exactly what a fresh derivation of the KPP_T oversampling
    rounds computes."""
    from duckdb_wasm_spark.operators import similarity as sim

    served = sim._kmeanspp_cand_memo(spark, sf_dir).select("cid")
    fresh = sim._kmeanspp_cand_build(spark, sf_dir).select("cid")
    assert served.exceptAll(fresh).count() == 0
    assert fresh.exceptAll(served).count() == 0


def test_cc_labels_reload_equals_rebuild(spark, sf_dir):
    """The disk-persisted cluster-assignment tables (r12) must serve
    exactly the labels a fresh pointer-jumping run computes, for both
    candidate generators."""
    from duckdb_wasm_spark.operators import dedup
    from duckdb_wasm_spark.operators.dedup import connected_components

    for kind, builder in (
        ("cc_labels_minhash", dedup._minhash_cc_nodes_edges),
        ("cc_labels_emb", dedup._emb_cc_nodes_edges),
    ):
        served = dedup._cc_labels_memo(
            spark,
            sf_dir,
            kind,
            ("documents",) if "minhash" in kind else ("embeddings",),
            lambda: builder(spark, sf_dir),
        )
        nodes, edges = builder(spark, sf_dir)
        fresh = connected_components(nodes, edges)
        assert served.exceptAll(fresh).count() == 0, kind
        assert fresh.exceptAll(served).count() == 0, kind
