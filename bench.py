#!/usr/bin/env python
"""Benchmark entry point (driver contract, BASELINE.md "bench").

Runs the registered query corpus at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and
prints exactly ONE JSON line on stdout:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Methodology: one warm-up action first (parquet scans + JVM/codegen
warm-up is session overhead, not plan cost — the reference's
benchmark.js harness likewise samples warm), then each query timed as
plan-build + execute-to-driver (collect). Everything else (logs, Spark
chatter) goes to stderr so stdout stays machine-parseable.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    try:
        return float(m.group(1)) if m else -1.0
    except ValueError:
        return -1.0


def _build_session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("duckdb_wasm_spark-bench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _stage_layout(spark, sf_dir: str, cpus: int) -> str:
    """Rewrite each table once into a cpus-way multi-file layout.

    The generator's parquet files carry ONE row group per table, and a
    row group is the indivisible unit of parallel read in both engines —
    so every scan of the original layout is effectively single-threaded
    no matter how many cores the session has. That is an artifact of the
    tiny test files, not of the queries: at the 100 TB design point a
    table is thousands of files × row groups and scan parallelism is the
    norm. Staging restores the representative layout for a one-time
    cost reported in the JSON (excluded from per-query timings, like
    the JVM warm-up); BOTH engines then read the SAME staged files, so
    the DuckDB side-by-side stays apples-to-apples.

    Measured tradeoff at sf0.1/32 cpus (see ORACLE_BENCH*.json): the
    staged layout speeds individual heavy scans ~3x in Spark but adds
    32-way task-scheduling overhead to every small query, a wash over
    this corpus (57.8s vs 57.0s), while DuckDB's near-zero per-row-
    group cost cuts its total 69.0s -> 27.0s. Default is therefore OFF
    (SPARK_GRAFT_STAGE=1 opts in) — the raw layout is also what the
    driver's round-over-round BENCH comparisons assume.

    PERSISTENT (r12): the staged copy lives in a fingerprinted
    warehouse dir (the stream-layout discipline, live._layout_dir's
    shape) instead of a fresh tempdir per run. A fresh tempdir
    invalidated every index-artifact fingerprint on every staged run —
    the r11 staged-cold column was mostly one-time index builds
    against a layout that would never be seen again. The staged copy
    IS environment setup (the multi-file landing layout a deployment
    already has), so it persists and the artifacts built against it
    persist with it; regenerated testdata re-stages automatically via
    the source fingerprint."""
    from duckdb_wasm_spark.artifacts import (
        _ROOT,
        _fingerprint,
        _prune_dead_sources,
        _source_key,
        process_lock,
    )
    from duckdb_wasm_spark.tables import TABLES

    fp = _fingerprint(sf_dir, tuple(TABLES))
    base = os.path.normpath(os.path.join(_ROOT, "..", "bench_staged"))
    src_dir = os.path.join(base, _source_key(sf_dir))
    out = os.path.join(src_dir, f"{fp}_c{cpus}")
    marker = os.path.join(out, "_STAGED_COMMITTED")
    if os.path.exists(marker):
        return out
    import shutil

    # cross-process exclusion, same as persisted_frames' build (two
    # staged benches racing would tear this rmtree-then-write too)
    with process_lock("bench_staged"):
        if os.path.exists(marker):  # built while we waited
            return out
        # Supersede ONLY this sf_dir's stale-fingerprint layouts (same
        # discipline as live._layout_dir / artifacts.persisted_frames —
        # an early version rmtree'd the whole base, so alternating
        # staged benches over sf0.01 and sf0.1 re-staged every run and
        # orphaned every index artifact fingerprinted against the
        # deleted dirs). Same-fingerprint layouts for OTHER cpu counts
        # stay: they are not stale, just differently sliced.
        for entry in os.listdir(src_dir) if os.path.isdir(src_dir) else []:
            if entry != "_SOURCE_DIR" and not entry.startswith(f"{fp}_c"):
                shutil.rmtree(
                    os.path.join(src_dir, entry), ignore_errors=True
                )
        _prune_dead_sources(base)
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(src_dir, "_SOURCE_DIR"), "w") as fh:
            fh.write(os.path.abspath(sf_dir))
        for t in TABLES:
            (
                spark.read.parquet(f"{sf_dir}/{t}.parquet")
                .repartition(cpus)
                .write.mode("overwrite")
                .parquet(f"{out}/{t}.parquet")
            )
        with open(marker, "w") as fh:
            fh.write("ok")
    return out


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1").rstrip("/")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_from_dir(sf_dir)

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = _build_session(cpus)

    stage = os.environ.get("SPARK_GRAFT_STAGE", "0") == "1"
    stage_sec = 0.0
    if stage:
        t0 = time.perf_counter()
        sf_dir = _stage_layout(spark, sf_dir, cpus)
        stage_sec = round(time.perf_counter() - t0, 3)

    # Warm-up: touch the fact table & spin up codegen/shuffle machinery once,
    # and spawn the Python/Arrow worker pool (otherwise the corpus's first
    # mapInPandas query pays the whole per-core worker fork — session
    # overhead, not plan cost).
    from duckdb_wasm_spark.tables import load_table

    load_table(spark, sf_dir, "lineitem").count()
    spark.range(cpus * 4, numPartitions=cpus).mapInPandas(
        lambda it: it, "id long"
    ).count()

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")))
    # DuckDB side-by-side setup happens BEFORE the main loop because
    # the two engines now run INTERLEAVED per query (r13 verdict #4):
    # the old all-Spark-then-all-DuckDB order let OS page-cache state
    # accumulated by one engine's full pass systematically favor the
    # other (the staged artifact's 257s→175s DuckDB swing between
    # passes), so the committed ratio depended on which engine ran
    # last. Alternating the within-query engine order (ABBA: query i
    # even = Spark first, odd = DuckDB first, cold+warm both sides
    # each turn) makes cache exposure symmetric by construction.
    duck_enabled = os.environ.get("SPARK_GRAFT_DUCKDB") == "1"
    osql: dict[str, str] = {}
    duck: dict[str, float] = {}
    duck_cold: dict[str, float] = {}
    con = None
    if duck_enabled:
        import duckdb

        from duckdb_wasm_spark.tables import TABLES

        con = duckdb.connect()
        con.execute(f"set threads = {cpus}")
        # staged tables are DIRECTORIES of part files; original
        # layout is a single file per table
        glob = "/*.parquet" if stage else ""
        for t in TABLES:
            con.execute(
                f"create view {t} as "
                f"select * from read_parquet('{sf_dir}/{t}.parquet{glob}')"
            )
        osql = entrymod.oracle_sql()

    def _run_duck(name: str) -> None:
        best = None
        for i in range(runs):
            t0 = time.perf_counter()
            try:
                con.execute(osql[name]).fetchall()
                dt = time.perf_counter() - t0
                if i == 0:
                    duck_cold[name] = round(dt, 3)
                best = dt if best is None else min(best, dt)
            except Exception as exc:
                print(f"[bench] duckdb {name} FAILED: {exc}", file=sys.stderr)
                best = -1.0
                duck_cold.pop(name, None)
                break
        duck[name] = round(best, 3)

    timings: dict[str, float] = {}
    # COLD vs WARM (r9 advice, medium): the session memos
    # (graph._edges, dedup._emb_sigs_memo) build during run 1 of their
    # first consumer, so a best-of-N "warm" number never contains the
    # build wall. Both walls are therefore recorded: cold = run 1
    # (memo builds and all), warm = best-of-N. The headline stays warm
    # (the production shape: one build amortizes over every family
    # consumer in the session), but the cold total rides next to it in
    # every artifact so the amortization is explicit, and the DuckDB
    # side records the same cold/warm split symmetrically.
    cold: dict[str, float] = {}
    # build = fn(spark, sf_dir) wall (plan construction: py4j round
    # trips + any training actions the plan runs eagerly, e.g.
    # localCheckpoint rounds); exec = collect() wall. The split is the
    # r6→r7 overhead ledger: for iterative queries build rivals exec
    # (the memory-pinned py4j finding), and the F.expr fast paths are
    # judged against exactly this number. Recorded from the SAME run
    # that produced the best total, so build+exec ≈ timings[name].
    build_exec: dict[str, list[float]] = {}
    def _run_spark(name, fn) -> None:
        best = None
        df = None
        for i in range(runs):  # best-of-N: smooths scheduler/GC noise
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                t_built = time.perf_counter()
                df.collect()
                t1 = time.perf_counter()
                dt = t1 - t0
                if i == 0:
                    cold[name] = round(dt, 3)
                if best is None or dt < best:
                    best = dt
                    build_exec[name] = [
                        round(t_built - t0, 3), round(t1 - t_built, 3)
                    ]
            except Exception as exc:  # pragma: no cover - must not die mid-run
                print(f"[bench] {name} FAILED: {exc}", file=sys.stderr)
                best = -1.0
                cold.pop(name, None)
                build_exec.pop(name, None)
                break
        timings[name] = round(best, 3)
        # UNTIMED inter-query hygiene (standard benchmark practice, like
        # gc.collect() between timeit repeats): drop Python-side
        # DataFrame refs and force one JVM GC so the ContextCleaner
        # releases broadcast/localCheckpoint debris from the previous
        # query instead of letting it inflate the NEXT query's GC time.
        df = None  # noqa: F841 — release the Dataset ref BEFORE the GC
        # At 107 queries the corpus measured 126.8s without this vs
        # 121.4s with it, with the recovery concentrated in the
        # late-corpus rows (dedup_embedding_lsh 4.69s → 3.18s) — the
        # r4/r5 "corpus-neighborhood interference" finding, mitigated.
        import gc as _gc

        _gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # pragma: no cover - hygiene must never fail
            pass

    for qi, (name, fn) in enumerate(qs.items()):
        # ABBA engine order (r13 verdict #4): odd-indexed queries run
        # DuckDB first so neither engine systematically inherits the
        # other's page-cache warm-up; identical to the old behavior
        # when the side-by-side is off
        duck_here = duck_enabled and name in osql
        if duck_here and qi % 2 == 1:
            _run_duck(name)
            _run_spark(name, fn)
        else:
            _run_spark(name, fn)
            if duck_here:
                _run_duck(name)

    ok = {k: v for k, v in timings.items() if v >= 0}
    total = round(sum(ok.values()), 3)
    total_cold = round(sum(cold.values()), 3)
    # The driver captures only the TAIL of stdout (~2000 chars) and
    # parses the line it finds there — BENCH_r03/r04 both lost the
    # parse because the full 87-entry per-query dict pushed the line
    # past the window (round-4 verdict task #4). Keep the LINE small
    # enough to always parse: 2-decimal timings, only the slowest
    # BENCH_LINE_TOPK queries plus every failure inline, and the full
    # 3-decimal map in a committed sidecar (BENCH_FULL.json) next to
    # this script. Per-query dict still precedes the scalars so the
    # headline survives even if the window ever shrinks again.
    topk = int(os.environ.get("SPARK_GRAFT_BENCH_LINE_TOPK", "20"))
    slowest = dict(
        sorted(ok.items(), key=lambda kv: kv[1], reverse=True)[:topk]
    )
    line_queries = {
        k: round(v, 2) if v >= 0 else v
        for k, v in timings.items()
        if k in slowest or v < 0
    }
    # the canonical committed artifact name is reserved for the
    # documented methodology (default sf0.1 dir, DEFAULT 32 cpus, raw
    # layout, NO DuckDB interleave — r14 code review: with ABBA, a
    # DUCKDB=1 run executes DuckDB between the Spark runs of each
    # query, which perturbs the Spark walls; such a run must not
    # overwrite the numbers round-over-round comparisons assume); any
    # other config writes a suffixed sidecar so a quick sf0.01,
    # staged, side-by-side, or low-core scaling run can never silently
    # replace the committed numbers (round-5 ADVICE; the cpus term is
    # r15 verdict #4 — the driver's 8-core scaling probe silently
    # overwrote BENCH_FULL.json because the guard checked SF_DIR/
    # stage/duckdb but not cpus)
    canonical = (
        os.environ.get("SPARK_GRAFT_SF_DIR") in (None, "/root/testdata/sf0.1")
        and cpus == 32
        and not stage
        and not duck_enabled
    )
    # the ORACLE_BENCH.json name needs its own flag WITHOUT the
    # duck_enabled term: that term only exists to keep interleaved runs
    # off BENCH_FULL.json, but the oracle artifact is BY DEFINITION an
    # interleaved run — sharing `canonical` made the `elif canonical`
    # branch below unreachable and the committed ORACLE_BENCH.json
    # could never be regenerated by bench.py (r14 ADVICE)
    oracle_canonical = (
        os.environ.get("SPARK_GRAFT_SF_DIR") in (None, "/root/testdata/sf0.1")
        and cpus == 32
        and not stage
    )
    full_name = (
        "BENCH_FULL.json"
        if canonical
        else f"BENCH_FULL_sf{sf}_c{cpus}"
        f"{'_staged' if stage else ''}"
        f"{'_duckdb' if duck_enabled else ''}.json"
    )
    with open(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), full_name
        ),
        "w",
    ) as f:
        json.dump(
            {
                "queries": timings,
                "queries_cold": cold,
                "build_exec": build_exec,
                "sf": sf,
                "cpus": cpus,
                "value": total,
                "value_cold": total_cold,
                # Spark walls taken with DuckDB oracle runs interleaved
                # between them (ABBA) — not comparable to duckdb=false
                # runs round-over-round
                "duckdb_interleaved": duck_enabled,
                # Core-scaling honesty (r15 verdict #4/#7): at sf0.1
                # most walls are CORE-COUNT-INSENSITIVE FLOORS — job/
                # stage scheduling, streaming micro-batch commits,
                # artifact-reload jobs, single-row-group scans, py4j
                # plan construction — so 8-vs-32-core ratios near 1.0
                # name a floor, not ignored parallelism (the session
                # master honors $SPARK_GRAFT_CPUS; see the _c8 sidecar
                # for the measured low-core run). r15 measured ratios:
                # core-sensitive (>=1.2): knn_graph_recall 1.53,
                # events_stream_outer_join 1.22, dedup_minhash_ml 1.25,
                # dedup_edit_verify 1.21; floor-bound (~1.0): most of
                # the corpus; over-parallelized tiny stages (<0.9):
                # ann_brp_ml 0.80 (~2M-row candidate shuffle across 32
                # partitions — ANN_BRP_ATTRIBUTION_r16.json),
                # lsh_candidate_growth 0.85, source_pydatasource_stream
                # 0.84 (driver-side Python read), dedup_lsh_tuning
                # 0.87. Genuine scaling signal needs sf >= 1.
                "scaling_note": (
                    "sf0.1 walls are mostly per-query fixed floors "
                    "(scheduling, micro-batch commits, reload jobs); "
                    "8v32-core ratios near 1.0 are floor-bound rows, "
                    "not fake parallelism — see comment in bench.py "
                    "and BENCH_FULL_sf0.1_c8.json"
                ),
            },
            f,
            indent=1,
            sort_keys=True,
        )
    out = {
        "queries": line_queries,
        "queries_full": full_name,
        "metric": "query_corpus_total_wall",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "value_cold": total_cold,
        "n_queries": len(timings),
        "n_failed": len(timings) - len(ok),
        "cpus": cpus,
        "staged_layout": stage,
        "stage_sec": stage_sec,
    }

    # Optional DuckDB side-by-side (round-3 verdict task #5): with
    # SPARK_GRAFT_DUCKDB=1, time every oracle_sql() on the same parquet
    # with the same thread count + best-of-N methodology, and write the
    # full comparison to ORACLE_BENCH.json (the committed artifact the
    # SURVEY §8 ratio claim is audited against).
    if duck_enabled:
        duck_ok = {k: v for k, v in duck.items() if v >= 0}
        spark_comparable = round(
            sum(v for k, v in ok.items() if k in duck_ok), 3
        )
        spark_comparable_cold = round(
            sum(v for k, v in cold.items() if k in duck_ok), 3
        )
        duck_total = round(sum(duck_ok.values()), 3)
        duck_total_cold = round(
            sum(v for k, v in duck_cold.items() if k in duck_ok), 3
        )
        side = {
            "sf": sf,
            "cpus": cpus,
            "runs": runs,
            # ABBA per-query engine interleave (r13 verdict #4): the
            # ratio no longer depends on which engine's full pass ran
            # last in the process
            "interleaved": True,
            # free-text run annotation (e.g. which pass of a staged
            # build/steady pair this is) so the artifact itself names
            # its conditions instead of a commit message doing it
            "note": os.environ.get("SPARK_GRAFT_BENCH_NOTE", ""),
            "n_comparable": len(duck_ok),
            "spark_total_sec": spark_comparable,
            "duckdb_total_sec": duck_total,
            "ratio_spark_over_duckdb": round(
                spark_comparable / duck_total, 3
            ) if duck_total else None,
            # cold = run-1 walls on BOTH sides: the Spark cold total
            # contains every session-memo build (r9 advice — the
            # warm ratio alone compared warm-memo Spark to per-run
            # DuckDB); the cold/cold ratio is the no-amortization view
            "spark_total_cold_sec": spark_comparable_cold,
            "duckdb_total_cold_sec": duck_total_cold,
            "ratio_cold_spark_over_duckdb": round(
                spark_comparable_cold / duck_total_cold, 3
            ) if duck_total_cold else None,
            # cold-residual decomposition (r14 verdict #5): cold -
            # warm per engine IS each engine's per-session floor
            # (Spark: artifact reload + whole-stage-codegen JIT on
            # first run of each plan, flat in data per the graph
            # ledger; DuckDB: buffer re-reads). The staged cold ratio
            # exceeding the warm ratio is exactly this pair of
            # premiums — named here with the run's own numbers so the
            # artifact pins its residual instead of a commit message
            # asserting it.
            "cold_premium": {
                "spark_sec": round(
                    spark_comparable_cold - spark_comparable, 3
                ),
                "duckdb_sec": round(duck_total_cold - duck_total, 3),
            },
            "per_query": {
                k: {
                    "spark": timings.get(k),
                    "spark_cold": cold.get(k),
                    "duckdb": duck[k],
                    "duckdb_cold": duck_cold.get(k),
                }
                for k in duck
            },
        }
        side["staged_layout"] = stage
        side["stage_sec"] = stage_sec
        if stage:
            artifact = "ORACLE_BENCH_STAGED.json"
        elif oracle_canonical:
            artifact = "ORACLE_BENCH.json"
        else:  # same guard as BENCH_FULL: never clobber the committed name
            artifact = f"ORACLE_BENCH_sf{sf}_c{cpus}.json"
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         artifact), "w"
        ) as f:
            json.dump(side, f, indent=1, sort_keys=True)
        # headline scalars ride the stdout tail; the full per-query
        # comparison lives in the committed artifact, never the line
        out = {**out,
               "duckdb_value": duck_total,
               "spark_comparable_value": spark_comparable}

    print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
