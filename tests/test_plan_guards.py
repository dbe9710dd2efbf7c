"""Scale-guard regression over the EXECUTED PLANS of every registered
query: the plan properties that keep the corpus viable at 1000-executor
scale must not silently regress.

  - No CartesianProduct anywhere: an unconditioned fact-fact cross join
    is a 100 TB non-starter.
  - BroadcastNestedLoopJoin only where a genuinely tiny side is
    broadcast on a non-equi condition (documented allowlist).
  - Selective scans push their filters into the parquet scan
    (PushedFilters non-empty for the spot-checked selective queries).
"""

import pytest

import __spark_entry__ as entry

# Non-equi joins against a broadcast side that is small by construction.
# Every entry MUST state the size bound of the broadcast side — why it
# stays constant (or near-constant) as the corpus scales to 100 TB —
# so the allowlist cannot silently accumulate unaudited BNLJs (r6
# verdict task #8). The failure message below quotes this contract.
BNLJ_ALLOWED = {
    "q11": "scalar-subquery threshold: exactly 1 row broadcast to the agg",
    "graph_pagerank": (
        "node-count scalar `n`: exactly 1 row cross-joined into each "
        "unrolled iteration (the generated-SQL form of the old driver "
        "count literal)"
    ),
    "q22": "scalar-subquery avg balance: exactly 1 row broadcast",
    "sim_topk_brute": "query panel: N_QUERIES=50 rows, fixed by the API",
    "knn_graph_recall": (
        "truth build: KNNR_QUERIES=50-row audit panel broadcast, fixed "
        "by the API — the per-config candidate joins are equi-joins"
    ),
    "embed_dim_truncation_audit": (
        "per-config 50-row query panel broadcast (the sim_topk_brute "
        "shape), fixed by the API — the corpus side streams"
    ),
    "sim_topk_ivf": "centroid panel: IVF_CELLS=8 rows, a config constant",
    "sim_topk_ivf_probe": "same 8-row centroid panel, probe variant",
    "sim_topk_ivf_trained": "same 8-row panel per Lloyd iteration",
    "ivf_centroid_refine": "same 8-row centroid panel",
    "embed_cluster_purity": "trained centroids: IVF_CELLS=8 rows",
    "range_join_price_bands": "derived band table: 12 rows, fixed grid",
    "text_tfidf_topk": "corpus-size scalar: exactly 1 row for idf",
    "text_lm_score": "vocab-size scalar: exactly 1 row for smoothing",
    "text_bpe_merge": "winning-pair scalar: exactly 1 row per merge",
    "embed_abtt": "mean + top component: two 1-row vector broadcasts",
    "embed_covariance": "shared centering mean: exactly 1 row",
    "text_pmi_topk": "total-bigram-count scalar: exactly 1 row",
    "events_key_skew": "1-row stats frame x 1-row top-k scalar",
    "sketch_hll_merge": (
        "two 1-row HLL estimate folds x 1-row exact count — all scalar "
        "frames by construction"
    ),
    "corpus_source_divergence": (
        "post-aggregate |sources| x top-100k-capped-vocab zero-fill "
        "grid — both sides aggregates bounded by DIV_VOCAB_CAP, never "
        "the corpus; the cross IS the design"
    ),
    "sketch_kmv_jaccard": (
        "source pair grid: both sides the distinct-source list (dozens "
        "of rows at any corpus size) — the sketch rows it fans out are "
        "capped at |sources| x k, never the vocabulary"
    ),
    "graph_triangle_count": (
        "three 1-row aggregate frames (node stats x edge count x "
        "triangle count) scalar-crossed into the output row"
    ),
    "sketch_hist_quantiles": (
        "3-row quantile grid x 1-row total, range-joined against the "
        "~max_len/W-bin merged histogram — every side bounded by "
        "construction, never the corpus"
    ),
    "source_zonemap_skip": (
        "1-row rank-picked bounds frame crossed into the zone map and "
        "the scan; final 1-row x 1-row scalar cross"
    ),
}

# queries whose WHERE is selective on a scanned column — parquet scan
# must show pushed filters
PUSHDOWN_SPOT_CHECKS = {
    "q6": "lineitem",
    "q19": "part",
    "micro_regex": "part",
    "q4": "orders",
}


def _plan(spark, name, sf_dir):
    df = entry.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    return {name: _plan(spark, name, sf_dir) for name in entry.queries()}


def test_no_cartesian_product(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert offenders == [], f"cartesian joins crept in: {offenders}"


def test_bnlj_only_on_allowlist(plans):
    offenders = [
        n
        for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in BNLJ_ALLOWED
    ]
    assert offenders == [], (
        f"non-equi broadcast joins outside the audited allowlist: "
        f"{offenders}. A BNLJ is only acceptable against a side whose "
        f"size is BOUNDED BY CONSTRUCTION (a scalar aggregate, a "
        f"config-constant panel) — if this one qualifies, add it to "
        f"BNLJ_ALLOWED with a one-line size-bound justification like "
        f"the existing entries; if not, restructure the join."
    )
    stale = sorted(set(BNLJ_ALLOWED) - set(plans))
    assert stale == [], f"BNLJ_ALLOWED entries no longer registered: {stale}"


def test_filters_pushed_to_scan(plans):
    for name in PUSHDOWN_SPOT_CHECKS:
        plan = plans[name]
        assert "PushedFilters: [" in plan, name
        # at least one scan carries a real pushed filter
        pushed = [
            seg.split("]")[0]
            for seg in plan.split("PushedFilters: [")[1:]
        ]
        assert any(seg.strip() for seg in pushed), f"{name}: no pushed filters"


def test_bucketed_gate_join_is_exchange_free(plans):
    """source_bucketed_join: both scans must read `Bucketed: true` and
    NO exchange may sit between a scan and the SortMergeJoin — the
    co-located layout is the thing the query gates, so a silent
    regression to shuffle-both-sides must fail here even though the
    result hash would still match."""
    plan = plans["source_bucketed_join"]
    assert plan.count("Bucketed: true") == 2, plan
    assert "SortMergeJoin" in plan, plan
    join_input = plan.split("SortMergeJoin", 1)[1]
    # the subtree printed after the join node is its two children;
    # hashpartitioning exchanges there would mean buckets were ignored
    assert "Exchange hashpartitioning" not in join_input, join_input
