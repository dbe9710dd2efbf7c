"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The queries live in ``duckdb_wasm_spark.plans`` / ``.operators``; this
module only aggregates their registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (adapted TPC-H q1) on /root/testdata/sf0.001."""
    from duckdb_wasm_spark.plans import tpch

    return tpch.QUERIES["q1"](spark, "/root/testdata/sf0.001")


def _registries():
    """One registry module per query family. Imports are guarded
    per-module and only for the module's OWN absence (a broken
    transitive import must surface, not silently drop its queries from
    the correctness gate)."""
    from duckdb_wasm_spark.plans import tpch

    modules = [tpch]
    for modname in (
        "duckdb_wasm_spark.plans.micro",
        "duckdb_wasm_spark.plans.extras",
        "duckdb_wasm_spark.plans.reference_sql",
        "duckdb_wasm_spark.operators.registry",
        "duckdb_wasm_spark.streaming.windows",
    ):
        try:
            mod = __import__(modname, fromlist=["QUERIES"])
        except ModuleNotFoundError as e:
            if e.name != modname:
                raise
            continue
        modules.append(mod)
    return modules


# Emission priority for the driver's bounded correctness walk (~50
# rows/round, insertion order).  Round-3 verdict finding #2: the long-
# green TPC-H/micro/extras queries sat first and starved every LLM-
# pipeline operator out of the window for two rounds running.  Order is
# therefore: (a) queries the driver has NEVER gated, (b) queries whose
# implementation changed after their last green row, then (c) the
# long-stable corpus — TPC-H/micro/extras — and finally the rows-only
# (no-oracle) ML comparison points.  Revisit each round: move anything
# newly green out of (a)/(b) and anything rewritten back into (b).
#
# ROUND-5 ROTATION (applied): CORRECTNESS_r04 gated 50 rows — 44 LLM/
# extension rows green, q1–q4 green, and SIX reds (corpus_stats,
# sample_token_budget, sample_split, corpus_mix_weights,
# sample_pack_sequences, text_lm_score — an oracle HUGEINT typing bug,
# fixed r5 with cast(sum(…) as bigint)).  The r4-green names fall to
# tier (c); the window below is exactly the 41 registry names WITHOUT
# an r4-green row: the 6 fixed reds first (their oracles changed — must
# re-certify before anything else), the 6 consolidated extra_* queries
# the driver has never seen under their current names, then the
# r3-certified stable corpus (q5–q22, micro_*, the 4 unchanged-name
# extras) whose rows are now two rounds old.
#
# ROUND-6 ROTATION (applied): CORRECTNESS_r05 came back 50/50 green,
# so every oracle-backed query now has a green row dated r4 or r5.
# This window is therefore: (a) new/rewritten in round 6 —
# sim_topk_ivf_trained (new) and text_tfidf_topk (plan rewritten:
# explode-trap fix + broadcast-df); (b) the 41 r4-green names without
# an r5 row, oldest rows first — led by the two embedding-LSH queries
# whose shared oracle text was refactored in r5 (verdict "what's
# wrong" #1), then the TPC-H/reference stragglers, then the r4 LLM
# corpus in its original emission order.  The 50 r5-green names fall
# to tier (c) registry order.
#
# ROUND-7 ROTATION: if CORRECTNESS_r06 shows the names below green,
# every query's newest green row is dated r5 or r6 — replace this
# list with (a) anything rewritten in round 7, then (b) the r5-green
# corpus (oldest rows first).  If any r6 row is RED, keep it at the
# head instead.  Note the r6 head grew mid-round: the continuation
# sessions added the never-gated names in tier (a) below (everything
# from dedup_substring through text_tfidf_topk, incl. the extra_stats
# rewrite and the two real-streaming gates) — if the r6 window cut off
# the tail of tier (b''), those tail names lead tier (b) next round.
_GATE_PRIORITY = [
    # (a) new / rewritten in round 6 — never gated in current form
    "dedup_substring",  # new: exact-LCS substring dedup
    "quality_buckets",  # new: fixed-decile quality bucketing
    "sim_topk_ivfpq",  # new: IVF-PQ composite ANN
    "embed_pca_power",  # new: matrix-free PCA power iteration
    "text_bpe_merge",  # new: full BPE merge iteration (count-merge-recount)
    "corpus_source_divergence",  # new: pairwise JS divergence between sources
    "embed_abtt",  # new: all-but-the-top postprocessing
    "dedup_containment",  # new: asymmetric containment near-dup
    "extra_lateral",  # new: correlated LATERAL subquery
    "events_stream_tumbling",  # new: REAL streaming execution, driver-gated
    "events_stream_session",  # new: streaming session_window merge, gated
    "events_stream_stateful",  # new: applyInPandasWithState, driver-gated
    "dedup_winnowing",  # new: MOSS winnowing fingerprint candidates
    "text_pmi_topk",  # new: PMI collocation top-k
    "embed_cluster_purity",  # new: trained-quantizer purity vs labels
    "embed_covariance",  # new: exact upper-triangle covariance matrix
    # (rewritten late-r6: mapInPandas partial sums, 2.4s -> 1.0s)
    "events_key_skew",  # new: exact join-key skew audit (salting decision)
    "extra_unpivot",  # new: UNPIVOT wide-to-long melt
    "extra_stats",  # quantiles rewritten: histogram/rank-pick, new oracle
    "sim_topk_ivf_trained",
    "sim_topk_pq",
    "sim_topk_pq_rerank",
    "text_ngram_entropy",
    "corpus_zipf_slope",
    "embed_random_projection",
    "text_bpe_pair_counts",
    "text_tfidf_topk",
    # (b) r4-green, oracle text refactored in r5 (_emb_lsh_sql_prefix)
    "dedup_embedding_lsh",
    "dedup_embedding_clusters",
    # (b') r4-green TPC-H / reference-dialect stragglers
    "q2",
    "q3",
    "q4",
    "ref_q7_sqlite",
    "ref_q8_sqlite",
    # (b'') r4-green LLM corpus, original r4 emission order
    "pipeline_clean_corpus",
    "sample_balanced",
    "decontaminate_ngram",
    "asof_click_attribution",
    "range_join_price_bands",
    "events_retention",
    "events_funnel",
    "events_tumbling",
    "events_sliding",
    "events_session",
    "events_daily_pruned",
    "events_rolling",
    "dedup_ngram_jaccard_capped",
    "dedup_clusters",
    "embed_centroid_outliers",
    "text_vocab_topk",
    "text_repetition",
    "multimodal_thumbnail",
    "multimodal_frames",
    "text_pii_scan",
    "events_anomaly",
    "embed_quantize_int8",
    "dedup_ngram_jaccard",
    "text_langid",
    "text_fingerprint",
    "text_tokens",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "sim_topk_brute",
    "sim_topk_ivf",
    "multimodal_meta",
    "multimodal_features",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Emission order = _GATE_PRIORITY first, then the remaining
    oracle-backed queries in registry order, then rows-only
    (no-oracle) queries last — the driver walks this dict in insertion
    order under a bounded correctness window, so the order IS the
    gating policy (round-2 finding #1, round-3 finding #2)."""
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for m in _registries():
        merged.update(m.QUERIES)
        oracles.update(m.ORACLE)
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for k in _GATE_PRIORITY:
        if k in merged and k in oracles:
            out[k] = merged[k]
    out.update({k: v for k, v in merged.items() if k in oracles})
    out.update({k: v for k, v in merged.items() if k not in oracles})
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    out: dict[str, str] = {}
    for m in _registries():
        out.update(m.ORACLE)
    return out
