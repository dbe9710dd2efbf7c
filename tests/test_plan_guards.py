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

# non-equi joins against a broadcast side that is small by construction
BNLJ_ALLOWED = {
    "q11",  # scalar-subquery threshold (1 row) broadcast to the agg
    "q22",  # scalar-subquery avg balance (1 row) broadcast
    "sim_topk_brute",  # 50-vector query panel broadcast (self != cond)
    "sim_topk_ivf",  # 8-centroid panel broadcast for assignment
    "sim_topk_ivf_probe",  # same 8-centroid broadcast assignment fan-out
    "sim_topk_ivf_trained",  # same broadcast fan-out, per Lloyd iteration
    "ivf_centroid_refine",  # same 8-centroid broadcast assignment fan-out
    "embed_cluster_purity",  # same trained-centroid broadcast assignment
    "range_join_price_bands",  # 12-row derived band table broadcast
    "text_tfidf_topk",  # 1-row corpus-size scalar broadcast for idf
    "text_lm_score",  # 1-row vocab-size scalar broadcast for smoothing
    "text_bpe_merge",  # 1-row winning-pair scalar broadcast (merge apply)
    "embed_abtt",  # 1-row mean + 1-row component vector broadcasts
    "embed_covariance",  # same 1-row mean broadcast (shared centering)
    "text_pmi_topk",  # 1-row total-bigram-count scalar broadcast
    "events_key_skew",  # 1-row stats × 1-row top-k scalar broadcast
    "corpus_source_divergence",  # dense sources×vocab grid: both sides
    #   are POST-AGGREGATE frames (|sources| × |vocab types|), never the
    #   corpus — the zero-fill support cross is the operator's design
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
        f"non-equi broadcast joins outside the audited allowlist: {offenders}"
    )


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
