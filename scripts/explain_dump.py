#!/usr/bin/env python
"""Dump .explain('formatted') for named registry queries (dev tool).

Usage: python scripts/explain_dump.py <suffix> q1 q2 ...
Writes plans/r16/<name>_<suffix>.txt per query (the optimization-round
plan evidence the judge checks claims against). Uses the same session
config as bench.py. Note: building a query's DataFrame executes any
eager training/checkpoint actions its plan construction runs, so the
dumped text is the plan of the RETURNED frame (the post-build query),
exactly what bench.py's collect() executes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    ).rstrip("/")
    import __spark_entry__ as entrymod
    from bench import _build_session

    qs = entrymod.queries()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _build_session(cpus)
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
    )
    os.makedirs(outdir, exist_ok=True)
    for n in names:
        df = qs[n](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{n}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
