#!/usr/bin/env python
"""Same-day A/B harness for wall-regression attribution (r14 verdict #1).

Usage:
    python scripts/ab_regression.py <tree> q1,q2,...   [env SPARK_GRAFT_*]

Runs the named registry queries from the code at <tree> (a git worktree
or the live repo root) in a FRESH session with bench.py's exact warm-up
and inter-query hygiene, and prints one JSON line with per-query walls
(run 1 = cold, rest = warm candidates). The tree's own
`spark-warehouse` artifact store is used (artifacts._ROOT derives from
the imported module's location), so pre-warm the worktree once with a
throwaway pass before trusting its warm numbers.

The orchestration (fresh process per arm, ABBA order HEAD/old/old/HEAD
so neither tree systematically inherits the other's page cache) lives
in the calling shell; this script is one arm.
"""

import json
import os
import subprocess
import sys
import time


def main() -> int:
    tree = os.path.abspath(sys.argv[1])
    names = sys.argv[2].split(",")
    runs = int(os.environ.get("SPARK_GRAFT_AB_RUNS", "3"))
    sys.path.insert(0, tree)
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    ).rstrip("/")
    import __spark_entry__ as entrymod
    from bench import _build_session

    from duckdb_wasm_spark.tables import load_table

    sha = subprocess.run(
        ["git", "-C", tree, "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True,
    ).stdout.strip()
    qs = entrymod.queries()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _build_session(cpus)
    load_table(spark, sf_dir, "lineitem").count()
    spark.range(cpus * 4, numPartitions=cpus).mapInPandas(
        lambda it: it, "id long"
    ).count()

    out = {"tree": tree, "sha": sha, "runs": runs, "queries": {}}
    for n in names:
        walls = []
        for _ in range(runs):
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).collect()
            walls.append(round(time.perf_counter() - t0, 3))
        out["queries"][n] = walls
        # bench.py's untimed inter-query hygiene, verbatim
        import gc

        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
    print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
