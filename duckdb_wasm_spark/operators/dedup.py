"""Deduplication operators over the `documents` / `embeddings` tables.

  dedup_exact          hash-groupBy exact dedup (md5 of normalized text)
  dedup_ngram_jaccard  EXACT near-dup: trigram-shingle inverted-index join
                       + Jaccard threshold (the ground truth the LSH
                       variants approximate)
  dedup_minhash        banded MinHash-LSH near-dup (16 md5 hash funcs,
                       4 bands × 4 rows) — candidates from band-bucket
                       joins, verified with exact Jaccard
  dedup_simhash        60-bit SimHash over shingles, banded (4×15 bits)
                       candidate join, Hamming-distance verify
  dedup_embedding_lsh  random-hyperplane (signed-projection) LSH over the
                       embedding column, banded buckets, exact-cosine
                       verify

Cross-engine determinism: hash functions are md5-derived (both engines
hash utf-8 bytes identically); float reductions are left folds with a 0.0
init (Spark `aggregate` ≡ DuckDB `list_reduce`, bit-identical); signature
and band arithmetic is pure integer. So even the "randomized" LSH
operators have exact DuckDB oracles — the oracle reproduces the same
approximation, and the EXACT variants (`dedup_exact`,
`dedup_ngram_jaccard`) pin the ground truth.

Scale notes (100 TB):
  - Nothing here is an all-pairs cross join. Candidate generation is
    always an equi-join on a derived key (gram, band bucket) — an
    inverted-index / LSH-bucket shuffle whose cost follows the number of
    true collisions, not n².
  - The shingle inverted index (dedup_ngram_jaccard) is the one with a
    skew hazard: a stop-gram shared by millions of docs explodes the
    join. At scale add a document-frequency cap on grams (drop grams with
    df > k) — standard near-dup practice; kept off here so the oracle
    stays a pure Jaccard definition.
  - Band/bucket parameters are per-operator arguments; larger corpora
    want more bits per band (fewer random collisions per bucket).

Reference parity note: the reference engine (duckdb-wasm) has no dedup
surface; these are the driver-mandated LLM-pipeline extensions
(SURVEY.md §7 phase 5).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_wasm_spark.operators._text import (
    ngrams_all,
    sql_gram_concat,
    sql_ngrams_all,
    sql_tok_hash60,
    sql_toks,
    sql_trigrams,
    tok_hash60,
    toks,
    trigrams,
)
from duckdb_wasm_spark.tables import load_table

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def _q(name):
    def reg(fn):
        QUERIES[name] = fn
        return fn

    return reg


# ----------------------------------------------------------- dedup_exact
@_q("dedup_exact")
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by md5(lower(trim(text))), keep the smallest
    doc_id per group. One hash-shuffle on the fingerprint — the canonical
    distributed exact dedup."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.md5(F.lower(F.trim(F.col("text")))).alias("fp"), "doc_id"
        )
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


ORACLE["dedup_exact"] = """
select md5(lower(trim(text))) fp,
       min(doc_id) keeper_doc_id,
       count(*) n_copies
from documents
group by 1
"""


# -------------------------------------------------- dedup_ngram_jaccard
JACCARD_THRESHOLD = 0.2


def _gram_arrays(docs: DataFrame) -> DataFrame:
    """(doc_id, grams): materialized distinct trigram-shingle array.
    Tokens are materialized first so the shingle builder's element_at
    references a column, not a re-evaluated split expression."""
    return docs.withColumn("_t", toks()).select(
        "doc_id", trigrams(F.col("_t")).alias("grams")
    )


def _gram_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, gram) exploded distinct trigram shingles."""
    return _gram_arrays(docs).select(
        "doc_id", F.explode(F.col("grams")).alias("gram")
    )


def _posting_pair_overlaps(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, n_a, n_b, n_common) over distinct trigram
    shingles via inverted-index posting lists: |set| rides along
    inside the posting struct (the trigram array is already distinct)
    so no separate size aggregate; per-gram candidate pairs expand
    JVM-side from the posting array. SHARED by dedup_ngram_jaccard
    (uncapped) and dedup_containment — one pipeline, two measures."""
    grams = _gram_arrays(docs).select(
        "doc_id",
        F.size("grams").alias("n"),
        F.explode("grams").alias("gram"),
    )
    posts = grams.groupBy("gram").agg(
        F.collect_list(F.struct("doc_id", "n")).alias("ds")
    )
    pairs = posts.select(
        F.explode(
            F.expr(
                "flatten(transform(ds, x -> "
                "  transform(filter(ds, y -> x.doc_id < y.doc_id), "
                "            y -> struct(x.doc_id as doc_a, x.n as n_a,"
                "                        y.doc_id as doc_b, y.n as n_b"
                "))))"
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b", "p.n_a", "p.n_b")
    return pairs.groupBy("doc_a", "doc_b", "n_a", "n_b").agg(
        F.count(F.lit(1)).alias("n_common")
    )


@_q("dedup_ngram_jaccard")
def dedup_ngram_jaccard(
    spark: SparkSession, sf_dir: str, max_df: int | None = None
) -> DataFrame:
    """Exact trigram-shingle Jaccard near-dup pairs (ground truth for the
    LSH variants). Inverted-index POSTING LISTS: one shingle pipeline
    pass, one shuffle by gram, then the per-gram candidate pairs are
    expanded JVM-side from the posting array (filter/transform/flatten
    in codegen) — pairs that share no shingle are never materialized.
    Round-4 rework: the previous exploded self-join ran the expensive
    tokenize→shingle→explode map side TWICE (Catalyst cannot
    ReuseExchange across the two differently-aliased branches) and
    shuffled the exploded grams twice; posting lists measured 2.5s vs
    4.1s at sf0.1 (and beat the DuckDB oracle's 2.8s), identical
    results.

    max_df: skew guard for scale — drop shingles appearing in more than
    max_df documents (a stop-gram shared by millions of docs otherwise
    makes one posting array, and its pair expansion, quadratic-huge;
    the cap bounds every key's fan-out at max_df²). Off by default so
    the registered query stays the pure Jaccard definition the oracle
    states (bounded-df corpora only — the capped variant is the 100 TB
    entry point); candidates lost to the cap can only REMOVE result
    pairs whose overlap rode solely on stop-grams. The capped path
    keeps the count-over-window + exploded-join formulation: its
    post-filter size aggregate forces a second consumer of the
    filtered grams, and measured at sf0.1 the window form (2.33s)
    beats posting lists with recompute (2.96s) or with a checkpoint
    (2.73s)."""
    docs = load_table(spark, sf_dir, "documents")
    if max_df is None:
        inter = _posting_pair_overlaps(docs)
    else:
        # Set sizes CANNOT ride along here: the measure is Jaccard over
        # the CAPPED shingle sets (the registered capped oracle sizes
        # post-filter sets), so |set| must be counted AFTER the df
        # filter — a pre-filter F.size("grams") silently switches the
        # denominator to uncapped sizes whenever the cap binds
        # (round-3 ADVICE, high). Sizes come from a partial-combining
        # groupBy (one tiny row per doc after map-side combine) joined
        # onto the pair frame. The window df filter leaves the grams
        # hash-partitioned by gram — the partitioning the self-join
        # needs; a stop-gram's rows land on one sort partition only to
        # be counted and dropped (spill-safe, gone before the join).
        from pyspark.sql.window import Window

        grams = _gram_sets(docs)
        grams = (
            grams.withColumn(
                "_df", F.count(F.lit(1)).over(Window.partitionBy("gram"))
            )
            .where(F.col("_df") <= max_df)
            .drop("_df")
        )
        sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        a = grams.select(F.col("doc_id").alias("doc_a"), "gram")
        b = grams.select(F.col("doc_id").alias("doc_b"), "gram")
        inter = (
            a.join(b, "gram")
            .where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
            .join(
                sizes.select(
                    F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")
                ),
                "doc_a",
            )
            .join(
                sizes.select(
                    F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")
                ),
                "doc_b",
            )
        )
    return (
        inter.withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


_SQL_GRAM_SETS = f"""
  select distinct doc_id, g gram
  from (select doc_id,
               unnest({sql_trigrams(sql_toks('text'))}) g
        from documents)
"""

# shared oracle prefix: distinct-shingle sets → per-doc sizes →
# pairwise intersection counts (consumed by jaccard AND containment)
_SQL_PAIR_OVERLAPS = f"""
with grams as ({_SQL_GRAM_SETS}),
sizes as (select doc_id, count(*) n from grams group by 1),
inter as (
  select a.doc_id doc_a, b.doc_id doc_b, count(*) n_common
  from grams a join grams b on a.gram = b.gram and a.doc_id < b.doc_id
  group by 1, 2)"""

ORACLE["dedup_ngram_jaccard"] = f"""{_SQL_PAIR_OVERLAPS}
select doc_a, doc_b,
       cast(n_common as double) / (sa.n + sb.n - n_common) jaccard
from inter
join sizes sa on doc_a = sa.doc_id
join sizes sb on doc_b = sb.doc_id
where cast(n_common as double) / (sa.n + sb.n - n_common)
      >= {JACCARD_THRESHOLD}
"""


NGRAM_MAX_DF = 100


@_q("dedup_ngram_jaccard_capped")
def dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RECOMMENDED near-dup entry point at scale: identical
    inverted-index Jaccard with the df skew cap ON (shingles in more
    than NGRAM_MAX_DF docs are dropped before the self-join, bounding
    every join key's fan-out at NGRAM_MAX_DF²). The cap changes the
    measure — Jaccard over capped shingle sets — so this variant is
    registered with its own oracle stating exactly that semantics
    (round-2 verdict #4); the uncapped query remains the pure-Jaccard
    ground truth."""
    return dedup_ngram_jaccard(spark, sf_dir, max_df=NGRAM_MAX_DF)


def capped_oracle_sql(max_df: int) -> str:
    """Capped-Jaccard oracle with the df cap as a parameter — the
    registered query binds NGRAM_MAX_DF; tests bind a tiny cap so the
    filter actually fires at sf0.001 (max trigram df there is ~9, far
    below the production cap, so only a small cap exercises the
    post-filter set-size semantics)."""
    return f"""
with grams0 as ({_SQL_GRAM_SETS}),
rare as (select gram from grams0 group by gram
         having count(*) <= {max_df}),
grams as (select g0.doc_id, g0.gram from grams0 g0 join rare using (gram)),
sizes as (select doc_id, count(*) n from grams group by 1),
inter as (
  select a.doc_id doc_a, b.doc_id doc_b, count(*) n_common
  from grams a join grams b on a.gram = b.gram and a.doc_id < b.doc_id
  group by 1, 2)
select doc_a, doc_b,
       cast(n_common as double) / (sa.n + sb.n - n_common) jaccard
from inter
join sizes sa on doc_a = sa.doc_id
join sizes sb on doc_b = sb.doc_id
where cast(n_common as double) / (sa.n + sb.n - n_common)
      >= {JACCARD_THRESHOLD}
"""


ORACLE["dedup_ngram_jaccard_capped"] = capped_oracle_sql(NGRAM_MAX_DF)


# --------------------------------------------------------- dedup_minhash
N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS
MH_PRIME = 2147483647  # 2^31 - 1; Carter-Wegman universal family mod p


def _mh_a(j: int) -> int:
    return 2 * j + 1  # odd, in [1, p-1]


def _mh_b(j: int) -> int:
    return 7919 * j + 13


def _minhash_sigs(docs: DataFrame) -> DataFrame:
    """(doc_id, s0..s15): per-doc MinHash signature. Each shingle is
    md5-hashed ONCE to a 60-bit int; the 16 hash functions are the
    Carter-Wegman family h_j(g) = (a_j·(g mod p) + b_j) mod p — pure
    codegen integer arithmetic instead of 16 interpreted md5 array
    folds (products < 2^62, no overflow in either engine).

    Plan shape: shingles exploded once, 16 min() map-side-combining
    aggregates over a single shuffle by doc_id."""
    g = _gram_sets(docs).withColumn(
        "gh", tok_hash60(F.col("gram")) % MH_PRIME
    )
    # F.expr strings, not Column chains — one JVM parse per hash fn
    # instead of ~5 py4j round trips each (see _simhash_bands note)
    return g.groupBy("doc_id").agg(
        *[
            F.expr(
                f"min(({_mh_a(j)}L * gh + {_mh_b(j)}L) % {MH_PRIME}L)"
            ).alias(f"s{j}")
            for j in range(N_HASHES)
        ]
    )


@_q("dedup_minhash")
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH near-dup: signature → band keys → bucket join →
    exact-Jaccard verify. Candidate generation is an equi-join on
    (band, key): cost scales with real collisions, never all pairs.

    Plan shape: the band-bucket join shuffles only (doc_id, band, key) —
    the shingle arrays are joined back per candidate doc afterwards, so
    the wide payload never rides the bucket shuffle."""
    return minhash_pairs(load_table(spark, sf_dir, "documents"))


def minhash_pairs(docs: DataFrame) -> DataFrame:
    """dedup_minhash's pipeline over an arbitrary (doc_id, text) frame —
    pure code motion so pipeline compositions (near-dedup over a
    quality-filtered corpus) run the identical plan on a subset."""
    sigs = _minhash_sigs(docs)
    gram_sets = _gram_arrays(docs)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"s{b * ROWS_PER_BAND + r}").cast("string")
                            for r in range(ROWS_PER_BAND)
                        ],
                    )
                ).alias("key"),
            )
            for b in range(N_BANDS)
        ]
    )
    bands = sigs.select(
        "doc_id", F.explode(band_structs).alias("bk")
    ).select("doc_id", "bk.band", "bk.key")
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "key")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .join(
            gram_sets.select(
                F.col("doc_id").alias("doc_a"), F.col("grams").alias("grams_a")
            ),
            "doc_a",
        )
        .join(
            gram_sets.select(
                F.col("doc_id").alias("doc_b"), F.col("grams").alias("grams_b")
            ),
            "doc_b",
        )
    )
    inter = F.size(F.array_intersect(F.col("grams_a"), F.col("grams_b")))
    union = F.size("grams_a") + F.size("grams_b") - inter
    return (
        cand.withColumn("jaccard", inter.cast("double") / union)
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


def _minhash_ctes() -> str:
    """The shared CTE chain (docs → shingle hashes → signatures → bands →
    verified candidates) used by the dedup_minhash oracle and reused by
    the dedup_clusters oracle."""
    return _minhash_sql_parts()[0]


def _minhash_sql_parts(source: str = "documents") -> tuple[str, str]:
    """source: the table/CTE the doc frame reads from — "documents"
    for the registered queries, a filtered CTE name for pipeline
    compositions (the chain text is otherwise identical)."""
    sigs = ",\n       ".join(
        f"min(({_mh_a(j)} * gh + {_mh_b(j)}) % {MH_PRIME}) s{j}"
        for j in range(N_HASHES)
    )
    band_rows = "\n  union all\n".join(
        "  select doc_id, {b} band, md5({expr}) bkey from sigs".format(
            b=b,
            expr
            =" || '|' || ".join(
                f"cast(s{b * ROWS_PER_BAND + r} as varchar)"
                for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(N_BANDS)
    )
    return f"""
with docs as (
  select doc_id, {sql_trigrams(sql_toks('text'))} grams from {source}),
gh as (
  select doc_id, {sql_tok_hash60('g')} % {MH_PRIME} gh
  from (select doc_id, unnest(grams) g from docs)),
sigs as (
  select doc_id,
       {sigs}
  from gh group by doc_id),
bands as (
{band_rows}),
cand as (
  select distinct a.doc_id doc_a, b.doc_id doc_b
  from bands a join bands b
    on a.band = b.band and a.bkey = b.bkey and a.doc_id < b.doc_id),
candg as (
  select doc_a, doc_b, ga.grams grams_a, gb.grams grams_b
  from cand
  join docs ga on doc_a = ga.doc_id
  join docs gb on doc_b = gb.doc_id)""", f"""
select doc_a, doc_b,
       cast(len(list_intersect(grams_a, grams_b)) as double)
         / (len(grams_a) + len(grams_b)
            - len(list_intersect(grams_a, grams_b))) jaccard
from candg
where cast(len(list_intersect(grams_a, grams_b)) as double)
        / (len(grams_a) + len(grams_b)
           - len(list_intersect(grams_a, grams_b)))
      >= {JACCARD_THRESHOLD}
"""


def _minhash_sql() -> str:
    ctes, final = _minhash_sql_parts()
    return ctes + final


ORACLE["dedup_minhash"] = _minhash_sql()


# -------------------------------------------------------- dedup_clusters
CC_MAX_ITERS = 15


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_iters: int = CC_MAX_ITERS,
    raise_on_nonconverged: bool = True,
) -> DataFrame:
    """Distributed connected components: (doc_id) nodes + symmetric
    (src, dst) edges → (doc_id, cluster_id = min reachable doc_id).

    Each round does min-label propagation over edges (one edge join +
    one min-aggregate) THEN a pointer-jump (label ← label-of-label, one
    self-join) — the path-compression half of the large-star/small-star
    family, so an L-hop chain converges in O(log L) rounds instead of
    O(L) (round-3 verdict #7: a 20-hop chain used to exhaust
    CC_MAX_ITERS and silently return partial labels). Labels are
    monotone non-increasing and bounded by the component minimum, so
    the label sum strictly decreases until fixpoint — one scalar action
    per round is the convergence test. Every round localCheckpoints so
    lineage stays flat and each round's shuffles are O(edges), not
    O(edges · round).

    If max_iters rounds pass without reaching the fixpoint the result
    is NOT a partition into components — raise (default) rather than
    hand partially-merged clusters to a dedup pipeline that would then
    delete the wrong documents.
    """
    labels = nodes.select("doc_id", F.col("doc_id").alias("cluster_id"))
    labels = labels.localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("cluster_id")).first()[0]
    for _ in range(max_iters):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("doc_id").alias("src"),
                    F.col("cluster_id").alias("src_label"),
                ),
                "src",
            )
            .groupBy("dst")
            .agg(F.min("src_label").alias("nbr_label"))
        )
        propagated = (
            labels.join(nbr_min, labels["doc_id"] == nbr_min["dst"], "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nbr_label"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
        jump = propagated.select(
            F.col("doc_id").alias("j_doc"),
            F.col("cluster_id").alias("j_label"),
        )
        labels = (
            propagated.join(
                jump, propagated["cluster_id"] == jump["j_doc"], "left"
            )
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("j_label"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("cluster_id")).first()[0]
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    if raise_on_nonconverged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "— component diameter exceeds the iteration budget; raise "
            "max_iters (rounds needed ≈ log2(diameter) with pointer "
            "jumping)"
        )
    return labels


@_q("dedup_clusters")
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the MinHash near-dup pairs, with
    canonical-document selection — the last stage of a dedup pipeline:
    every document gets a cluster_id (the min doc_id reachable through
    near-dup edges) and is_keeper marks the one document per cluster
    that survives; singletons keep themselves.

    Spark side: connected_components() — min-label propagation with
    pointer jumping (see its docstring); converges in O(log diameter)
    rounds and RAISES if the budget runs out rather than returning
    partially-merged clusters. At 100 TB the same loop holds (edges
    shuffle by src, labels by doc_id).

    Oracle: recursive-CTE transitive closure over the identical pair
    SQL, min(reachable) per doc — exponentially more work than the
    Spark form but exact and tiny at test SF."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    # materialize the symmetric edge list ONCE (the propagation loop
    # must not re-run the whole MinHash pipeline per iteration)
    edges = (
        pairs.union(
            pairs.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        )
        .toDF("src", "dst")
        .localCheckpoint(eager=True)
    )
    labels = connected_components(docs, edges)
    return labels.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper"),
    )


def _clusters_sql() -> str:
    ctes, pair_select = _minhash_sql_parts()
    ctes = ctes.lstrip()
    assert ctes.startswith("with ")
    return f"""
with recursive {ctes[len("with "):]},
pairs as ({pair_select}),
edges as (
  select doc_a src, doc_b dst from pairs
  union
  select doc_b src, doc_a dst from pairs),
reach(a, b) as (
  select doc_id, doc_id from documents
  union
  select r.a, e.dst from reach r join edges e on r.b = e.src)
select a doc_id, min(b) cluster_id, a = min(b) is_keeper
from reach
group by a
"""


ORACLE["dedup_clusters"] = _clusters_sql()


# --------------------------------------------------------- dedup_simhash
SIM_BITS = 60
SIM_BANDS = 4
SIM_BAND_BITS = SIM_BITS // SIM_BANDS  # 15
HAMMING_MAX = 10


def _simhash_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash, band, band_val): 60-bit SimHash over shingle
    hash60s, split into 4 15-bit bands. Pure integer arithmetic — exact
    in both engines.

    Plan shape: shingle hashes are EXPLODED and the 60 bit votes are 60
    map-side-combining SUM aggregates over one shuffle by doc_id —
    whole-stage-codegen hash-agg instead of 60 interpreted per-row array
    folds (integer sums are order-insensitive, so the result is
    unchanged)."""
    # All generated expressions are F.expr STRINGS, not Column-builder
    # chains: the 60 vote sums + 64 band/simhash terms cost ~500 py4j
    # round trips as Columns (~1.5s of plan-build wall per call,
    # measured r7) vs one JVM parse each as strings — identical trees.
    exploded = _gram_sets(docs).select(
        "doc_id", tok_hash60(F.col("gram")).alias("h")
    )
    votes = exploded.groupBy("doc_id").agg(
        *[
            # majority-vote accumulator for bit b: +1 if set else -1
            F.expr(f"sum((shiftright(h, {b}) & 1) * 2 - 1)").alias(f"v{b}")
            for b in range(SIM_BITS)
        ]
    )

    def bit_sql(b: int) -> str:
        # majority vote of bit b across shingle hashes: 1 if >= 0 votes
        return f"(case when v{b} >= 0 then 1L else 0L end)"

    band_vals = [
        F.expr(
            " + ".join(
                f"{bit_sql(band * SIM_BAND_BITS + i)} * {1 << i}L"
                for i in range(SIM_BAND_BITS)
            )
        ).alias(f"band_{band}")
        for band in range(SIM_BANDS)
    ]
    d = votes.select("doc_id", *band_vals)
    simhash = F.expr(
        " + ".join(
            f"band_{band} * {1 << (band * SIM_BAND_BITS)}L"
            for band in range(SIM_BANDS)
        )
    ).alias("simhash")
    bands = F.expr(
        "array("
        + ", ".join(
            f"struct({band} as band, band_{band} as band_val)"
            for band in range(SIM_BANDS)
        )
        + ")"
    )
    return d.select("doc_id", simhash, F.explode(bands).alias("bk")).select(
        "doc_id", "simhash", "bk.band", "bk.band_val"
    )


@_q("dedup_simhash")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: banded bucket join on 15-bit sub-signatures, then
    Hamming-distance verify on the full 60-bit signature. A pair within
    Hamming distance 3 of 60 is guaranteed caught (pigeonhole over 4
    bands); this run uses a looser HAMMING_MAX so the verify matters."""
    docs = load_table(spark, sf_dir, "documents")
    bands = _simhash_bands(docs)
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"),
        "band", "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"),
        "band", "band_val",
    )
    return (
        a.join(b, ["band", "band_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn(
            "hamming",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))),
        )
        .where(F.col("hamming") <= HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
    )


def _simhash_sql() -> str:
    def bit(b: int) -> str:
        return (
            f"(case when list_sum(list_transform(hs, "
            f"h -> ((h >> {b}) & 1) * 2 - 1)) >= 0 then 1 else 0 end)"
        )

    band_vals = ",\n       ".join(
        "("
        + " + ".join(
            f"{bit(band * SIM_BAND_BITS + i)} * {1 << i}::bigint"
            for i in range(SIM_BAND_BITS)
        )
        + f") band_{band}"
        for band in range(SIM_BANDS)
    )
    simhash = " + ".join(
        f"band_{band} * {1 << (band * SIM_BAND_BITS)}::bigint"
        for band in range(SIM_BANDS)
    )
    band_rows = "\n  union all\n".join(
        f"  select doc_id, simhash, {band} band, band_{band} band_val from sh"
        for band in range(SIM_BANDS)
    )
    return f"""
with docs as (
  select doc_id,
         list_transform({sql_trigrams(sql_toks('text'))},
                        g -> {sql_tok_hash60('g')}) hs
  from documents),
bv as (
  select doc_id,
       {band_vals}
  from docs),
sh as (select *, {simhash} simhash from bv),
bands as (
{band_rows}),
cand as (
  select distinct a.doc_id doc_a, b.doc_id doc_b,
         a.simhash sim_a, b.simhash sim_b
  from bands a join bands b
    on a.band = b.band and a.band_val = b.band_val and a.doc_id < b.doc_id)
select doc_a, doc_b, bit_count(xor(sim_a, sim_b)) hamming
from cand
where bit_count(xor(sim_a, sim_b)) <= {HAMMING_MAX}
"""


ORACLE["dedup_simhash"] = _simhash_sql()


# --------------------------------------------------- dedup_embedding_lsh
COS_THRESHOLD = 0.4
EMB_DIM = 64
HP_BANDS = 12
HP_BITS = 4
N_PLANES = HP_BANDS * HP_BITS


def dot_fold(a, b):
    """Deterministic double dot product: cast-to-double elementwise, left
    fold with 0.0 init — bit-identical to DuckDB's list_reduce (0.0+x ≡ x,
    so the missing-init fold matches too).

    Stays the higher-order `aggregate` form deliberately: an expanded
    64-term element_at chain looks codegen-friendly but exceeds the JIT
    method-size budget and runs SLOWER (measured 2-3×); the biggest
    lever is evaluating it once per pair over precomputed norms.

    Accepts plain column NAMES (both args str) as a fast path: the
    Python-lambda `F.aggregate` form costs ~27 ms of py4j round trips
    PER CALL to construct (measured), which dominated wall time for the
    iterative queries that build it once per Lloyd/power iteration —
    `F.expr` hands the JVM one string to parse (~1 ms) and resolves to
    the same ArrayAggregate/ZipWith tree, so results are bit-identical.
    Lambda params are underscore-prefixed to dodge any real column."""
    if (
        isinstance(a, str)
        and isinstance(b, str)
        # Names are interpolated into raw SQL, so only plain
        # identifiers qualify — a dotted/spaced name would parse wrong
        # or resolve elsewhere; those take the slow path. Backtick
        # quoting makes SQL-keyword names (e.g. `order`) safe too.
        and a.isidentifier()
        and b.isidentifier()
    ):
        return F.expr(
            f"aggregate(zip_with(`{a}`, `{b}`, (_dx, _dy) -> "
            f"cast(_dx as double) * cast(_dy as double)), 0.0D, "
            f"(_dacc, _dv) -> _dacc + _dv)"
        )
    if isinstance(a, str):
        a = F.col(a)
    if isinstance(b, str):
        b = F.col(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> cast(p[1] as double) * cast(p[2] as double)), "
        f"(acc, v) -> acc + v)"
    )


def cosine(a, b):
    return dot_fold(a, b) / (
        F.sqrt(dot_fold(a, a)) * F.sqrt(dot_fold(b, b))
    )


def sql_cosine(a: str, b: str) -> str:
    return (
        f"{sql_dot(a, b)} / (sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)}))"
    )


def _plane_weight(p, d):
    """Pseudo-random hyperplane weight in [-1, 1): md5-derived 32-bit
    uniform. Identical formula in the SQL oracle, so 'randomness' is
    reproducible cross-engine."""
    h = F.md5(F.concat(F.lit("p"), p.cast("string"), F.lit("d"), d.cast("string")))
    u = F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
    return u / F.lit(2147483648.0) - F.lit(1.0)


SQL_PLANE_W = (
    "(('0x' || substr(md5('p' || cast({p} as varchar) "
    "|| 'd' || cast({d} as varchar)), 1, 8))::bigint "
    "/ 2147483648.0) - 1.0"
)


def _plane_matrix():
    """The same md5-derived hyperplane weights as _plane_weight /
    SQL_PLANE_W, materialized as an (N_PLANES × EMB_DIM) float64 numpy
    matrix for the Arrow-batched signature pass. hashlib.md5 and the
    engines' md5() agree byte-for-byte, so all three derivations are
    identical."""
    import hashlib

    import numpy as np

    w = np.empty((N_PLANES, EMB_DIM), dtype=np.float64)
    for p in range(N_PLANES):
        for d in range(EMB_DIM):
            h = hashlib.md5(f"p{p}d{d}".encode()).hexdigest()[:8]
            w[p, d] = int(h, 16) / 2147483648.0 - 1.0
    return w


def _columnar_fold_dot(A, B):
    """Dot products of row-pairs of two (n × d) float64 matrices with the
    EXACT rounding order of the sequential left fold (dot_fold /
    DuckDB's list_reduce): iterate dimensions, one vectorized
    multiply-add per dimension — `acc + A[:,d]*B[:,d]` rounds the
    product, then the sum, per element, exactly like
    `(acc, v) -> acc + v` over `zip_with(a, b, (x, y) -> x*y)`. A BLAS
    matmul would be faster but reorders the additions, and a flipped
    last-ulp sign near a hyperplane (or a cosine straddling the
    threshold) would diverge from the SQL oracle."""
    import numpy as np

    acc = np.zeros(len(A), dtype=np.float64)
    for d in range(A.shape[1]):
        acc = acc + A[:, d] * B[:, d]
    return acc


def _emb_signatures(emb: DataFrame) -> DataFrame:
    """(vec_id, band, band_val, norm, embedding): hyperplane sign bits,
    band keys, and the precomputed norm, in ONE Arrow-batched pass over
    the embeddings (mapInPandas) instead of a 48-way broadcast join of
    interpreted dot folds — the measured hot spot of this operator at
    sf0.1 (round-2 verdict perf note). Numerics are bit-identical to
    the fold form (see _columnar_fold_dot)."""
    import numpy as np
    import pandas as pd

    planes = _plane_matrix()

    def batches(it):
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            norm = np.sqrt(_columnar_fold_dot(E, E))
            band_vals = np.zeros((n, HP_BANDS), dtype=np.int64)
            for p in range(N_PLANES):
                proj = _columnar_fold_dot(E, np.broadcast_to(planes[p], E.shape))
                bit = (proj >= 0.0).astype(np.int64)
                band_vals[:, p // HP_BITS] += bit << (p % HP_BITS)
            out = pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy().repeat(HP_BANDS),
                    "band": np.tile(
                        np.arange(HP_BANDS, dtype=np.int32), n
                    ),
                    "band_val": band_vals.reshape(-1),
                    "norm": norm.repeat(HP_BANDS),
                }
            )
            yield out

    # scalar-only output: replicating the embedding array 12× per vector
    # through Arrow + the band-bucket shuffle measured ~2× slower than
    # re-joining candidates to the embeddings table afterwards
    return emb.select("vec_id", "embedding").mapInPandas(
        batches,
        "vec_id long, band int, band_val long, norm double",
    )


def _emb_sigs_memo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized, localCheckpoint'd hyperplane signatures per (session,
    sf_dir) — the graph._edges discipline applied to the embedding
    index: the LSH consumers each re-derived the mapInPandas signature
    pass per query. Consumers opt in EXPLICITLY (a memoized plan is a
    plan change that re-gates the query, so only rotation-windowed
    names switched in r9: embed_knn_graph, knn_graph_recall,
    decontaminate_semantic; dedup_embedding_lsh/_clusters switch in
    r10 when their window slot comes up). The memo dies with the
    SparkSession, like every checkpoint memo in this repo."""
    memo: dict = spark.__dict__.setdefault("_dws_emb_sigs", {})
    if sf_dir not in memo:
        emb = load_table(spark, sf_dir, "embeddings")
        memo[sf_dir] = _emb_signatures(emb).localCheckpoint()
    return memo[sf_dir]


def _hyperplanes(spark: SparkSession) -> DataFrame:
    """32 hyperplanes × 64 dims, built driver-free from spark.range —
    a tiny broadcast-able relation."""
    return spark.range(N_PLANES).select(
        F.col("id").cast("int").alias("p"),
        F.transform(
            F.sequence(F.lit(0), F.lit(EMB_DIM - 1)),
            lambda d: _plane_weight(F.col("id"), d),
        ).alias("w"),
    )


@_q("dedup_embedding_lsh")
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup via signed-random-projection LSH: 48 hyperplane
    sign bits → 12 bands × 4 bits → bucket join → exact-cosine verify at
    COS_THRESHOLD. The hyperplane table is broadcast; signatures are one
    narrow pass over embeddings; candidates come from band-bucket
    equi-joins only.

    Plan shape: signatures + norms come from ONE Arrow-batched
    mapInPandas pass (columnar fold — bit-identical numerics, see
    _columnar_fold_dot); candidates from band-bucket equi-joins; the
    per-pair verify dot is a vectorized pandas_udf. Per-vector norms
    are precomputed once, so each candidate pair evaluates ONE dot."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def pair_dot(ea: pd.Series, eb: pd.Series) -> pd.Series:
        import numpy as np

        if len(ea) == 0:
            return pd.Series([], dtype=np.float64)
        A = np.stack(ea.to_numpy()).astype(np.float64)
        B = np.stack(eb.to_numpy()).astype(np.float64)
        return pd.Series(_columnar_fold_dot(A, B))

    emb = load_table(spark, sf_dir, "embeddings")
    sigs = _emb_signatures(emb)
    a = sigs.select(
        F.col("vec_id").alias("a_id"), F.col("norm").alias("norm_a"),
        "band", "band_val",
    )
    b = sigs.select(
        F.col("vec_id").alias("b_id"), F.col("norm").alias("norm_b"),
        "band", "band_val",
    )
    cand = (
        a.join(b, ["band", "band_val"])
        .where(F.col("a_id") < F.col("b_id"))
        .dropDuplicates(["a_id", "b_id"])
        .select("a_id", "b_id", "norm_a", "norm_b")
    )
    ea = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("ea"))
    eb = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("eb"))
    return (
        cand.join(ea, "a_id")
        .join(eb, "b_id")
        .withColumn(
            "sim",
            pair_dot(F.col("ea"), F.col("eb"))
            / (F.col("norm_a") * F.col("norm_b")),
        )
        .where(F.col("sim") >= COS_THRESHOLD)
        .select("a_id", "b_id", "sim")
    )


def _emb_lsh_sql_prefix() -> str:
    """CTE chain up to `we` (per-vector band keys + embedding + norm) —
    shared by the pair oracle, the clusters oracle, and the semantic
    decontamination oracle."""
    w = SQL_PLANE_W.format(p="p", d="d")
    return f"""
with planes as (
  select p, list_transform(range(0, {EMB_DIM}), d -> {w}) w
  from (select unnest(range(0, {N_PLANES})) p)),
signed as (
  select vec_id, embedding, p,
         case when {sql_dot('embedding', 'w')} >= 0 then 1 else 0 end sgn
  from embeddings, planes),
bands as (
  select vec_id, cast(floor(p / {HP_BITS}) as int) band,
         sum(sgn * cast(pow(2.0, p % {HP_BITS}) as bigint)) band_val
  from signed group by 1, 2),
normed as (
  select vec_id, embedding, sqrt({sql_dot('embedding', 'embedding')}) nrm
  from embeddings),
we as (select b.*, e.embedding, e.nrm
       from bands b join normed e using (vec_id))"""


def _emb_lsh_sql_parts() -> tuple[str, str]:
    """(ctes, final_select) so the clusters oracle can reuse the pair
    pipeline inside its own recursive CTE."""
    ctes = _emb_lsh_sql_prefix() + f""",
cand as (
  select distinct a.vec_id a_id, b.vec_id b_id,
         a.embedding ea, b.embedding eb, a.nrm norm_a, b.nrm norm_b
  from we a join we b
    on a.band = b.band and a.band_val = b.band_val and a.vec_id < b.vec_id)"""
    final = f"""
select a_id, b_id, {sql_dot('ea', 'eb')} / (norm_a * norm_b) sim
from cand
where {sql_dot('ea', 'eb')} / (norm_a * norm_b) >= {COS_THRESHOLD}
"""
    return ctes, final


def _emb_lsh_sql() -> str:
    ctes, final = _emb_lsh_sql_parts()
    return ctes + final


ORACLE["dedup_embedding_lsh"] = _emb_lsh_sql()


# ---------------------------------------------- dedup_embedding_clusters
@_q("dedup_embedding_clusters")
def dedup_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup clustering: connected components over the
    hyperplane-LSH cosine near-dup pairs — every vector gets a
    cluster_id (min vec_id reachable through near-dup edges) and
    is_keeper marks the surviving representative; singletons keep
    themselves. Second consumer of the hardened connected_components
    loop (pointer jumping, loud non-convergence — see its docstring),
    composing it with a different candidate generator than the MinHash
    clusters. Oracle: recursive-CTE closure over the identical pair
    SQL."""
    vecs = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id")
    )
    pairs = dedup_embedding_lsh(spark, sf_dir).select("a_id", "b_id")
    edges = (
        pairs.union(
            pairs.select(
                F.col("b_id").alias("a_id"), F.col("a_id").alias("b_id")
            )
        )
        .toDF("src", "dst")
        .localCheckpoint(eager=True)
    )
    labels = connected_components(vecs, edges)
    return labels.select(
        F.col("doc_id").alias("vec_id"),
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper"),
    )


def _emb_clusters_sql() -> str:
    ctes, pair_select = _emb_lsh_sql_parts()
    ctes = ctes.lstrip()
    assert ctes.startswith("with ")
    return f"""
with recursive {ctes[len("with "):]},
pairs as ({pair_select}),
edges as (
  select a_id src, b_id dst from pairs
  union
  select b_id src, a_id dst from pairs),
reach(a, b) as (
  select vec_id, vec_id from embeddings
  union
  select r.a, e.dst from reach r join edges e on r.b = e.src)
select a vec_id, min(b) cluster_id, a = min(b) is_keeper
from reach
group by a
"""


ORACLE["dedup_embedding_clusters"] = _emb_clusters_sql()


# ---------------------------------------------- decontaminate_semantic
SEM_EVAL_MOD = 20  # held-out split: vec_id % SEM_EVAL_MOD == 0
SEM_COS_THRESHOLD = COS_THRESHOLD  # contamination = LSH near-dup cosine


@_q("decontaminate_semantic")
def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination: flag TRAINING vectors
    whose cosine to any held-out ("benchmark") vector reaches
    SEM_COS_THRESHOLD — the semantic complement of the 5-gram overlap
    check (decontaminate_ngram catches verbatim leaks; this catches
    paraphrases that share no shingles). The held-out split is the
    deterministic vec_id % SEM_EVAL_MOD == 0 slice, mirroring the
    n-gram variant.

    Candidates come from the SAME hyperplane band buckets as
    dedup_embedding_lsh (recall bounded by the LSH family exactly as
    there; the oracle reproduces the identical approximation), so cost
    follows bucket collisions, never |train|·|eval|. The eval side is
    tiny relative to the corpus (that is the point of the check) and is
    broadcast: the train-side signatures never shuffle. Verification is
    one vectorized pair dot per candidate over precomputed norms."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def pair_dot(ea: pd.Series, eb: pd.Series) -> pd.Series:
        import numpy as np

        if len(ea) == 0:
            return pd.Series([], dtype=np.float64)
        A = np.stack(ea.to_numpy()).astype(np.float64)
        B = np.stack(eb.to_numpy()).astype(np.float64)
        return pd.Series(_columnar_fold_dot(A, B))

    emb = load_table(spark, sf_dir, "embeddings")
    sigs = _emb_sigs_memo(spark, sf_dir)
    ev = sigs.where(F.col("vec_id") % SEM_EVAL_MOD == 0).select(
        F.col("vec_id").alias("eval_id"), F.col("norm").alias("norm_e"),
        "band", "band_val",
    )
    tr = sigs.where(F.col("vec_id") % SEM_EVAL_MOD != 0).select(
        F.col("vec_id").alias("train_id"), F.col("norm").alias("norm_t"),
        "band", "band_val",
    )
    cand = (
        tr.join(F.broadcast(ev), ["band", "band_val"])
        .dropDuplicates(["train_id", "eval_id"])
        .select("train_id", "eval_id", "norm_t", "norm_e")
    )
    et = emb.select(
        F.col("vec_id").alias("train_id"), F.col("embedding").alias("et")
    )
    ee = emb.select(
        F.col("vec_id").alias("eval_id"), F.col("embedding").alias("ee")
    )
    return (
        cand.join(et, "train_id")
        .join(F.broadcast(ee), "eval_id")
        .withColumn(
            "sim",
            pair_dot(F.col("et"), F.col("ee"))
            / (F.col("norm_t") * F.col("norm_e")),
        )
        .where(F.col("sim") >= SEM_COS_THRESHOLD)
        .groupBy("train_id")
        .agg(
            F.count(F.lit(1)).alias("n_eval_matches"),
            F.max("sim").alias("max_sim"),
        )
    )


ORACLE["decontaminate_semantic"] = _emb_lsh_sql_prefix() + f""",
ev as (select vec_id eval_id, embedding ee, nrm norm_e, band, band_val
       from we where vec_id % {SEM_EVAL_MOD} = 0),
tr as (select vec_id train_id, embedding et, nrm norm_t, band, band_val
       from we where vec_id % {SEM_EVAL_MOD} != 0),
cand as (
  select distinct train_id, eval_id, et, ee, norm_t, norm_e
  from tr join ev using (band, band_val)),
hits as (
  select train_id, eval_id,
         {sql_dot('et', 'ee')} / (norm_t * norm_e) sim
  from cand
  where {sql_dot('et', 'ee')} / (norm_t * norm_e)
        >= {SEM_COS_THRESHOLD})
select train_id, count(*) n_eval_matches, max(sim) max_sim
from hits
group by train_id
"""


# ----------------------------------------------------- dedup_substring
DUP_SUBSTR_N = 12  # window width (tokens): the seed length for LCS runs


@_q("dedup_substring")
def dedup_substring(
    spark: SparkSession, sf_dir: str, max_df: int | None = None
) -> DataFrame:
    """Exact-substring dedup (the "Deduplicating Training Data Makes
    Language Models Better" signal, Lee et al. 2021): for every doc
    pair sharing at least one exact DUP_SUBSTR_N-token window, report
    the EXACT length of their longest common token substring plus the
    match-volume counters used to rank removal candidates.

    Lee et al. build a single-machine suffix array — which does not
    distribute. The scalable reformulation: positional windows
    (doc_id, pos, 12-gram) → inverted-index posting lists keyed by
    window text (pair expansion JVM-side from the posting array, the
    dedup_ngram_jaccard round-4 shape — never all-pairs, and the
    tokenize→window map runs ONCE) → matched (pa, pb) positions fall
    on diagonals (diag = pa - pb); a run of consecutive pa on one
    diagonal IS a common substring, recovered exactly with the
    gap-and-islands trick (grp = pa - row_number), and
    lcs_tokens = longest_run + N - 1.

    Determinism: pure integer arithmetic end-to-end; islands are
    well-defined because per (pair, diag) each pa appears exactly once
    (pb = pa - diag is determined).

    Scale (100 TB): cost follows true window collisions, not n² — a
    12-token exact window is near-unique outside genuine reuse. The
    skew hazard is boilerplate windows shared by millions of docs;
    production adds the max_df stop-gram cap exactly as
    dedup_ngram_jaccard_capped does (kept off here so the oracle
    states the pure definition; dedup_substring_capped is the scale
    entry point — max_df drops windows with more than max_df postings
    BEFORE pair expansion, bounding every key's fan-out at max_df²;
    a capped pair's runs can only shrink or split, never grow, which
    tests/test_operators.py pins). The islands window shuffles by
    (doc_a, doc_b, diag) — collision-bounded, never corpus-bounded.

    The window key is the 12-token ARRAY SLICE, not a joined string:
    the gram is purely internal (only integer counters leave the
    operator), array slices skip ngrams_all's 11 chained concat
    passes (~1M string builds; windows stage 1.38s → 0.60s at sf0.1),
    and slice equality ≡ space-joined-string equality because split
    tokens cannot contain the separator — so the match set, and hence
    every output row, is unchanged vs the oracle's gram strings."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    n = DUP_SUBSTR_N
    w = (
        docs.select("doc_id", toks().alias("tk"))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"if(size(tk) < {n}, array(), "
                    f"transform(sequence(1, size(tk) - {n - 1}), "
                    f"i -> slice(tk, i, {n})))"
                )
            ).alias("pos0", "gram"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    )
    posts = w.groupBy("gram").agg(
        F.collect_list(F.struct("doc_id", "pos")).alias("ds")
    )
    if max_df is not None:
        # stop-window guard: a boilerplate window shared by max_df+
        # postings would make its pair expansion quadratic-huge; the
        # posting array already exists, so the cap is one size() test
        posts = posts.where(F.size("ds") <= max_df)
    m = (
        posts.select(
            F.explode(
                F.expr(
                    "flatten(transform(ds, x -> "
                    "  transform(filter(ds, y -> x.doc_id < y.doc_id), "
                    "            y -> struct(x.doc_id as doc_a, x.pos as pa,"
                    "                        y.doc_id as doc_b, y.pos as pb"
                    "))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b", "p.pa", "p.pb")
        .withColumn("diag", F.col("pa") - F.col("pb"))
    )
    iw = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    runs = (
        m.withColumn("grp", F.col("pa") - F.row_number().over(iw))
        .groupBy("doc_a", "doc_b", "diag", "grp")
        .agg(F.count(F.lit(1)).alias("run"))
    )
    return runs.groupBy("doc_a", "doc_b").agg(
        (F.max("run") + F.lit(DUP_SUBSTR_N - 1)).alias("lcs_tokens"),
        F.count(F.lit(1)).alias("n_runs"),
        F.sum("run").alias("n_window_matches"),
    )


def _sql_pos_ngrams(t: str, n: int) -> str:
    """DuckDB positional NON-distinct n-grams as a struct list
    [{pos (1-based), gram}] — the oracle-side mirror of
    posexplode(ngrams_all(...)) + 1. Gram text comes from the shared
    sql_gram_concat fragment so it cannot fork from sql_ngrams_all."""
    gram = sql_gram_concat(t, n)
    return (
        f"list_transform(range(1, greatest(len({t}) - {n - 2}, 1)), "
        f"i -> {{'pos': i, 'gram': {gram}}})"
    )


def substring_oracle_sql(max_df: int | None = None) -> str:
    """dedup_substring oracle; max_df mirrors the Spark-side posting
    cap (windows with more than max_df postings dropped before the
    pair join). Tests bind a tiny cap so the filter fires at
    sf0.001; the registered capped query binds SUBSTR_MAX_DF."""
    if max_df is None:
        w_cte = f"""w as (
  select doc_id, u.s.pos pos, u.s.gram gram
  from t, unnest({_sql_pos_ngrams('toks', DUP_SUBSTR_N)}) u(s))"""
    else:
        w_cte = f"""w0 as (
  select doc_id, u.s.pos pos, u.s.gram gram
  from t, unnest({_sql_pos_ngrams('toks', DUP_SUBSTR_N)}) u(s)),
rare as (select gram from w0 group by gram
         having count(*) <= {max_df}),
w as (select w0.* from w0 join rare using (gram))"""
    return f"""
with t as (select doc_id, {sql_toks('text')} toks from documents),
{w_cte},
m as (
  select a.doc_id doc_a, b.doc_id doc_b, a.pos pa, b.pos pb,
         a.pos - b.pos diag
  from w a join w b using (gram)
  where a.doc_id < b.doc_id),
i as (
  select doc_a, doc_b, diag, pa,
         pa - row_number() over (partition by doc_a, doc_b, diag
                                 order by pa) grp
  from m),
r as (
  select doc_a, doc_b, diag, grp, count(*) run
  from i group by doc_a, doc_b, diag, grp)
select doc_a, doc_b,
       cast(max(run) + {DUP_SUBSTR_N - 1} as bigint) lcs_tokens,
       count(*) n_runs,
       cast(sum(run) as bigint) n_window_matches
from r
group by doc_a, doc_b
"""


ORACLE["dedup_substring"] = substring_oracle_sql()


SUBSTR_MAX_DF = 100  # posting cap: bounds any window's fan-out at 100²


@_q("dedup_substring_capped")
def dedup_substring_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB entry point for exact-substring dedup: identical
    positional-window inverted index with the posting cap ON — windows
    carried by more than SUBSTR_MAX_DF (doc, pos) postings (license
    headers, boilerplate navigation) are dropped before pair
    expansion, bounding every key's fan-out at SUBSTR_MAX_DF² where
    the uncapped query goes quadratic on hot boilerplate. The cap
    changes the measure (runs riding solely on stop-windows shrink or
    vanish), so this variant carries its own oracle stating exactly
    that semantics; capped pairs/runs are always a subset of the
    uncapped result (pytest-pinned)."""
    return dedup_substring(spark, sf_dir, max_df=SUBSTR_MAX_DF)


ORACLE["dedup_substring_capped"] = substring_oracle_sql(SUBSTR_MAX_DF)


# -------------------------------------------------- dedup_containment
CONTAINMENT_THRESHOLD = 0.5  # max(|A∩B|/|A|, |A∩B|/|B|) cut


@_q("dedup_containment")
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric CONTAINMENT near-dup pairs: c(A→B) = |A∩B| / |A| over
    distinct trigram shingles, keeping pairs where either direction
    reaches CONTAINMENT_THRESHOLD. Containment catches the
    subset-duplicate class Jaccard structurally misses — a short doc
    quoted whole inside a long one has tiny Jaccard (union is
    long-doc-sized) but containment ≈ 1 from the short side; C4 /
    RealNews-style curation dedups on exactly this signal.

    Plan shape: identical to dedup_ngram_jaccard's posting lists (one
    shingle pass, one shuffle by gram, JVM-side pair expansion with
    both set sizes riding the posting struct) — only the final measure
    differs, so every scale property (collision-bounded cost, max_df
    cap as the stop-gram guard) carries over unchanged.

    Determinism: integer counts; the two divisions are single IEEE
    ops, and the threshold compares each direction separately (no
    float max needed in the filter; the output max is one
    greatest())."""
    docs = load_table(spark, sf_dir, "documents")
    inter = _posting_pair_overlaps(docs)
    c_ab = F.col("n_common").cast("double") / F.col("n_a").cast("double")
    c_ba = F.col("n_common").cast("double") / F.col("n_b").cast("double")
    return (
        inter.where(
            (c_ab >= CONTAINMENT_THRESHOLD) | (c_ba >= CONTAINMENT_THRESHOLD)
        )
        .select(
            "doc_a",
            "doc_b",
            c_ab.alias("containment_ab"),
            c_ba.alias("containment_ba"),
            F.greatest(c_ab, c_ba).alias("containment"),
        )
    )


ORACLE["dedup_containment"] = f"""{_SQL_PAIR_OVERLAPS},
m as (
  select doc_a, doc_b,
         cast(n_common as double) / cast(sa.n as double) containment_ab,
         cast(n_common as double) / cast(sb.n as double) containment_ba
  from inter
  join sizes sa on doc_a = sa.doc_id
  join sizes sb on doc_b = sb.doc_id)
select doc_a, doc_b, containment_ab, containment_ba,
       greatest(containment_ab, containment_ba) containment
from m
where containment_ab >= {CONTAINMENT_THRESHOLD}
   or containment_ba >= {CONTAINMENT_THRESHOLD}
"""


# ---------------------------------------------------- dedup_winnowing
WIN_K = 5  # gram width in tokens
WIN_W = 4  # winnowing window in consecutive gram hashes


@_q("dedup_winnowing")
def dedup_winnowing(
    spark: SparkSession, sf_dir: str, max_df: int | None = None
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    scheme): hash every WIN_K-token gram, keep the MINIMUM hash of
    each WIN_W-wide window of consecutive gram hashes, and report doc
    pairs sharing fingerprints. The winnowing guarantee: any shared
    token run of length ≥ WIN_K + WIN_W − 1 (= 8 here) is caught by at
    least one shared fingerprint — so this is the SAMPLED companion to
    dedup_substring's exhaustive window index, with the index ~1/W the
    size (what production plagiarism/near-dup systems actually ship at
    scale; the LCS pass then runs only on winnowing candidates).

    Determinism: hashes are the md5-derived 60-bit fold (engine-
    identical); window minima are pure integer least(); the distinct
    fingerprint SET makes pair counts order-independent.

    Plan: per-row array pipeline (grams → hashes → shifted-slice zip
    minima → distinct) entirely inside codegen — the token and hash
    arrays are MATERIALIZED columns before any lambda touches them
    (trigrams() re-evaluation trap) — then one explode + the standard
    posting-list pair expansion. Same collision-bounded scale story as
    every inverted index here; the min-sampling cuts posting volume
    ~W× before the shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    d = (
        docs.withColumn("_t", toks())
        .select("doc_id", ngrams_all(F.col("_t"), WIN_K).alias("grams"))
        .select(
            "doc_id",
            F.transform("grams", lambda g: tok_hash60(g)).alias("hs"),
        )
    )
    m = F.greatest(F.size("hs") - (WIN_W - 1), F.lit(0))
    acc = F.slice("hs", 1, m)
    for j in range(1, WIN_W):
        acc = F.zip_with(
            acc, F.slice(F.col("hs"), j + 1, m), lambda x, y: F.least(x, y)
        )
    fps = d.select("doc_id", F.explode(F.array_distinct(acc)).alias("fp"))
    posts = fps.groupBy("fp").agg(F.collect_list("doc_id").alias("ds"))
    if max_df is not None:
        # stop-fingerprint guard: a boilerplate fingerprint shared by
        # max_df+ docs would go quadratic in the pair expansion; ds is
        # per-doc distinct, so size(ds) IS the document frequency
        posts = posts.where(F.size("ds") <= max_df)
    pairs = posts.select(
        F.explode(
            F.expr(
                "flatten(transform(ds, x -> "
                "  transform(filter(ds, y -> x < y), "
                "            y -> struct(x as doc_a, y as doc_b))))"
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    return pairs.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_shared_fp")
    )


def winnowing_oracle_sql(max_df: int | None = None) -> str:
    """dedup_winnowing oracle; max_df mirrors the Spark-side cap
    (fingerprints in more than max_df docs dropped before the pair
    join — fps are per-doc distinct, so plain count(*) is df)."""
    if max_df is None:
        e_cte = "e as (select doc_id, unnest(fps) fp from m)"
    else:
        e_cte = f"""e0 as (select doc_id, unnest(fps) fp from m),
rare as (select fp from e0 group by fp having count(*) <= {max_df}),
e as (select e0.* from e0 join rare using (fp))"""
    return f"""
with t as (select doc_id, {sql_toks('text')} toks from documents),
g as (select doc_id, {sql_ngrams_all('toks', WIN_K)} grams from t),
h as (
  select doc_id,
         list_transform(grams, x -> {sql_tok_hash60('x')}) hs
  from g),
m as (
  select doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(hs) - {WIN_W - 2}, 1)),
           i -> least({', '.join(f'hs[i+{j}]' for j in range(WIN_W))}))) fps
  from h),
{e_cte}
select a.doc_id doc_a, b.doc_id doc_b, count(*) n_shared_fp
from e a join e b on a.fp = b.fp and a.doc_id < b.doc_id
group by 1, 2
"""


ORACLE["dedup_winnowing"] = winnowing_oracle_sql()


WIN_MAX_DF = 100  # fingerprint df cap: bounds any key's fan-out at 100²


@_q("dedup_winnowing_capped")
def dedup_winnowing_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB entry point for winnowing near-dup: identical
    fingerprint index with the df cap ON — a fingerprint present in
    more than WIN_MAX_DF documents (boilerplate the min-sampling
    happened to keep) is dropped before pair expansion, bounding every
    key's fan-out at WIN_MAX_DF² where the uncapped query goes
    quadratic on hot boilerplate. Capped pairs are a subset of the
    uncapped result with n_shared_fp never larger (pytest-pinned);
    the variant carries its own oracle stating the capped measure."""
    return dedup_winnowing(spark, sf_dir, max_df=WIN_MAX_DF)


ORACLE["dedup_winnowing_capped"] = winnowing_oracle_sql(WIN_MAX_DF)


# ------------------------------------------------------- dedup_lsh_tuning
LSH_TUNE_CONFIGS = ((16, 1), (8, 2), (4, 4), (2, 8))


@_q("dedup_lsh_tuning")
def dedup_lsh_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAND-CONFIGURATION SWEEP for the MinHash index — the tuning
    table a pipeline owner reads before fixing (bands, rows): for
    each way of splitting the 16-hash signature, the candidate-pair
    count (cost) and how many true Jaccard>=0.2 pairs the banding
    catches (recall). More rows per band = sharper threshold, fewer
    candidates, lower recall — this query MEASURES that curve on the
    actual corpus instead of trusting the 1-(1-s^r)^b formula.

    Plan: signatures are built once and localCheckpoint'd (each config
    re-bands the same 16 columns — md5 of the row-concat per band);
    per config the candidate join is the same (band, key) equi-join as
    dedup_minhash, and the truth set (the posting-list exact query,
    checkpointed once) flags true positives via a left join. Every
    per-config frame ends in a 1-row aggregate, so the sweep's output
    is |configs| rows regardless of corpus size; the only corpus-scale
    work is the signature build and the exact ground truth — both
    single-pass plans documented on their own operators. One driver
    scalar (the truth count) rides into the recall expression as a
    literal, CC-loop-style."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = _minhash_sigs(docs).localCheckpoint()
    truth = (
        dedup_ngram_jaccard(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    n_true = truth.count()
    outs = []
    for nb, rpb in LSH_TUNE_CONFIGS:
        band_structs = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"s{b * rpb + r}").cast("string")
                                for r in range(rpb)
                            ],
                        )
                    ).alias("key"),
                )
                for b in range(nb)
            ]
        )
        bands = sigs.select(
            "doc_id", F.explode(band_structs).alias("bk")
        ).select("doc_id", "bk.band", "bk.key")
        a = bands.select(F.col("doc_id").alias("doc_a"), "band", "key")
        b2 = bands.select(F.col("doc_id").alias("doc_b"), "band", "key")
        cand = (
            a.join(b2, ["band", "key"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        flagged = cand.join(
            truth.withColumn("is_true", F.lit(1)),
            ["doc_a", "doc_b"],
            "left",
        )
        outs.append(
            flagged.agg(
                F.count(F.lit(1)).alias("n_candidates"),
                F.coalesce(F.sum("is_true"), F.lit(0))
                .cast("long")
                .alias("n_true_pos"),
            ).select(
                F.lit(nb).alias("n_bands"),
                F.lit(rpb).alias("rows_per_band"),
                "n_candidates",
                "n_true_pos",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    recall = F.when(
        F.lit(n_true) > 0,
        F.col("n_true_pos").cast("double") / F.lit(n_true),
    )
    return out.select(
        "n_bands",
        "rows_per_band",
        "n_candidates",
        "n_true_pos",
        F.lit(n_true).cast("long").alias("n_true"),
        recall.alias("recall"),
    ).orderBy(F.col("n_bands").desc())


def _lsh_tuning_sql() -> str:
    sigs = ",\n       ".join(
        f"min(({_mh_a(j)} * gh + {_mh_b(j)}) % {MH_PRIME}) s{j}"
        for j in range(N_HASHES)
    )
    ctes = [
        f"""with grams as ({_SQL_GRAM_SETS}),
sizes as (select doc_id, count(*) n from grams group by 1),
inter as (
  select a.doc_id doc_a, b.doc_id doc_b, count(*) n_common
  from grams a join grams b on a.gram = b.gram and a.doc_id < b.doc_id
  group by 1, 2),
truth as (
  select doc_a, doc_b from inter
  join sizes sa on doc_a = sa.doc_id
  join sizes sb on doc_b = sb.doc_id
  where cast(n_common as double) / (sa.n + sb.n - n_common)
        >= {JACCARD_THRESHOLD}),
gh as (
  select doc_id, {sql_tok_hash60('gram')} % {MH_PRIME} gh from grams),
sigs as (
  select doc_id,
       {sigs}
  from gh group by doc_id),"""
    ]
    stats = []
    for i, (nb, rpb) in enumerate(LSH_TUNE_CONFIGS):
        band_rows = "\n  union all\n".join(
            "  select doc_id, {b} band, md5({expr}) bkey from sigs".format(
                b=b,
                expr=" || '|' || ".join(
                    f"cast(s{b * rpb + r} as varchar)" for r in range(rpb)
                ),
            )
            for b in range(nb)
        )
        ctes.append(f"bands_{i} as (\n{band_rows}),")
        ctes.append(
            f"""cand_{i} as (
  select distinct a.doc_id doc_a, b.doc_id doc_b
  from bands_{i} a join bands_{i} b
    on a.band = b.band and a.bkey = b.bkey and a.doc_id < b.doc_id),"""
        )
        ctes.append(
            f"""stat_{i} as (
  select {nb} n_bands, {rpb} rows_per_band,
         count(*) n_candidates,
         cast(coalesce(sum(case when t.doc_a is not null
                                then 1 end), 0) as bigint) n_true_pos
  from cand_{i} c left join truth t using (doc_a, doc_b)),"""
        )
        stats.append(f"select * from stat_{i}")
    body = "\n".join(ctes).rstrip(",")
    union = "\nunion all\n".join(stats)
    return f"""{body},
stats as (
{union})
select n_bands, rows_per_band, n_candidates, n_true_pos,
       cast((select count(*) from truth) as bigint) n_true,
       case when (select count(*) from truth) > 0
            then cast(n_true_pos as double)
                 / (select count(*) from truth) end recall
from stats
order by n_bands desc"""


ORACLE["dedup_lsh_tuning"] = _lsh_tuning_sql()


def _pair_dot_udf():
    """Vectorized exact dot product over candidate pairs (Arrow batch,
    columnar fold — bit-identical to the oracle's list_reduce left
    fold, see _columnar_fold_dot). Shared by embed_knn_graph and its
    recall audit."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def pair_dot(ea: pd.Series, eb: pd.Series) -> pd.Series:
        import numpy as np

        if len(ea) == 0:
            return pd.Series([], dtype=np.float64)
        A = np.stack(ea.to_numpy()).astype(np.float64)
        B = np.stack(eb.to_numpy()).astype(np.float64)
        return pd.Series(_columnar_fold_dot(A, B))

    return pair_dot


# -------------------------------------------------------- embed_knn_graph
KNN_K = 5


@_q("embed_knn_graph")
def embed_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate k-NN GRAPH over the embedding column — per vector,
    its top-5 cosine neighbors among the hyperplane-LSH bucket
    candidates. The near-dup operators emit threshold PAIRS; the k-NN
    graph is the other consumer of the same index (semantic
    clustering, graph-based agglomeration, link-prediction features)
    and is approximate BY CONSTRUCTION: a neighbor never sharing any
    of the 12 band buckets is invisible, which is the stated LSH
    recall trade (same bands as dedup_embedding_lsh, so the two
    operators' candidate sets are identical and auditable together).

    Plan: one signature pass, symmetric band-bucket equi-join (cost =
    real collisions), ONE exact dot per candidate pair (vectorized
    pandas_udf, columnar fold — bit-identical to the oracle's
    list_reduce), then a per-vector rank-filtered window that executes
    as WindowGroupLimit (map-side partial top-k). Output is <= K rows
    per vector at any scale.

    Determinism: sim ties rank by neighbor id; the dot is the same
    IEEE left fold in both engines."""
    from pyspark.sql.window import Window

    pair_dot = _pair_dot_udf()
    emb = load_table(spark, sf_dir, "embeddings")
    sigs = _emb_sigs_memo(spark, sf_dir)
    # bare (vec_id, band, band_val) through the bucket join and the
    # dedup — at gated scale the 4-bit bands are dense (2.1M candidate
    # pairs from 2k vectors), so the distinct's shuffle width is the
    # dominant byte volume; carrying the two norm doubles through it
    # measured +30% wall (r9). Norms re-join AFTER dedup with the
    # embeddings, the same post-join the payload already pays.
    a = sigs.select(F.col("vec_id").alias("src"), "band", "band_val")
    b = sigs.select(F.col("vec_id").alias("nbr"), "band", "band_val")
    cand = (
        a.join(b, ["band", "band_val"])
        .where(F.col("src") != F.col("nbr"))
        .dropDuplicates(["src", "nbr"])
        .select("src", "nbr")
    )
    norms = sigs.where(F.col("band") == 0).select("vec_id", "norm")
    ea = emb.select(F.col("vec_id").alias("src"), F.col("embedding").alias("ea"))
    eb = emb.select(F.col("vec_id").alias("nbr"), F.col("embedding").alias("eb"))
    na = norms.select(F.col("vec_id").alias("src"), F.col("norm").alias("norm_a"))
    nb_ = norms.select(F.col("vec_id").alias("nbr"), F.col("norm").alias("norm_b"))
    sims = (
        cand.join(ea.join(na, "src"), "src")
        .join(eb.join(nb_, "nbr"), "nbr")
        .withColumn(
            "sim",
            pair_dot(F.col("ea"), F.col("eb"))
            / (F.col("norm_a") * F.col("norm_b")),
        )
        .select("src", "nbr", "sim")
    )
    w = Window.partitionBy("src").orderBy(F.col("sim").desc(), F.col("nbr"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= KNN_K)
        .select(F.col("src").alias("vec_id"), "rank",
                F.col("nbr").alias("nbr_id"), "sim")
        .orderBy("vec_id", "rank")
    )


def _knn_graph_sql() -> str:
    prefix = _emb_lsh_sql_prefix()
    return f"""{prefix},
cand as (
  select distinct a.vec_id src, b.vec_id nbr,
         a.embedding ea, b.embedding eb, a.nrm norm_a, b.nrm norm_b
  from we a join we b
    on a.band = b.band and a.band_val = b.band_val
   and a.vec_id != b.vec_id),
sims as (
  select src, nbr, {sql_dot('ea', 'eb')} / (norm_a * norm_b) sim
  from cand),
ranked as (
  select src, nbr, sim,
         row_number() over (partition by src
                            order by sim desc, nbr) rnk
  from sims)
select src vec_id, cast(rnk as int) rank, nbr nbr_id, sim
from ranked
where rnk <= {KNN_K}
order by vec_id, rank
"""


ORACLE["embed_knn_graph"] = _knn_graph_sql()


# ------------------------------------------------------- knn_graph_recall
KNNR_QUERIES = 50  # audit panel: vec_id < 50 (sim_topk_brute's panel)
KNNR_CONFIGS = (3, 6, 9, 12)  # hyperplane band-prefix counts swept


@_q("knn_graph_recall")
def knn_graph_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED recall@K of the hyperplane-LSH k-NN graph against the
    exact brute-force neighbors — the missing audit between
    embed_knn_graph (which is approximate BY CONSTRUCTION) and
    sim_topk_brute (the exact baseline): for each prefix of the 12
    band keys, how many of the true top-5 cosine neighbors of the
    50-vector query panel survive in the LSH candidate top-5, and at
    what candidate-pair cost. The same empirical-curve discipline
    dedup_lsh_tuning established for MinHash banding (r8), applied to
    the embedding index: the owner reads THIS table, not the
    1-(1-s^r)^b formula, before fixing the band count.

    Plan: signatures built once (mapInPandas, localCheckpoint'd),
    exact panel truth built once (broadcast 50-row panel x corpus,
    WindowGroupLimit top-k, checkpointed); per config the candidate
    join is the same (band, band_val) equi-join as embed_knn_graph
    restricted to band < n_bands, ranked by the SAME vectorized exact
    dot, and ONE 1-row aggregate emits (cost, hits) — so the output is
    |configs| rows at any corpus size and the only corpus-scale work
    is the two single-pass builds. One driver scalar (the truth count)
    rides into the recall expression, CC-loop-style.

    Determinism: sims are the identical IEEE left fold in both
    engines; rank ties break on neighbor id; hit counts are exact
    integers."""
    from pyspark.sql.window import Window

    pair_dot = _pair_dot_udf()
    emb = load_table(spark, sf_dir, "embeddings")
    sigs = _emb_sigs_memo(spark, sf_dir)
    norms = sigs.where(F.col("band") == 0).select("vec_id", "norm")
    ea = emb.select(
        F.col("vec_id").alias("src"), F.col("embedding").alias("ea")
    )
    eb = emb.select(
        F.col("vec_id").alias("nbr"), F.col("embedding").alias("eb")
    )
    na = norms.select(F.col("vec_id").alias("src"), F.col("norm").alias("norm_a"))
    nb_ = norms.select(F.col("vec_id").alias("nbr"), F.col("norm").alias("norm_b"))
    w = Window.partitionBy("src").orderBy(F.col("sim").desc(), F.col("nbr"))
    # exact ground truth: brute-force top-K for the panel
    truth = (
        F.broadcast(ea.where(F.col("src") < KNNR_QUERIES).join(na, "src"))
        .join(eb.join(nb_, "nbr"), F.col("src") != F.col("nbr"))
        .withColumn(
            "sim",
            pair_dot(F.col("ea"), F.col("eb"))
            / (F.col("norm_a") * F.col("norm_b")),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= KNN_K)
        .select("src", "nbr")
        .localCheckpoint()
    )
    n_true = truth.count()
    outs = []
    for nbands in KNNR_CONFIGS:
        pa = sigs.where(
            (F.col("band") < nbands) & (F.col("vec_id") < KNNR_QUERIES)
        ).select(F.col("vec_id").alias("src"), "band", "band_val",
                 F.col("norm").alias("norm_a"))
        pb = sigs.where(F.col("band") < nbands).select(
            F.col("vec_id").alias("nbr"), "band", "band_val",
            F.col("norm").alias("norm_b"),
        )
        cand = (
            pa.join(pb, ["band", "band_val"])
            .where(F.col("src") != F.col("nbr"))
            .dropDuplicates(["src", "nbr"])
            .select("src", "nbr", "norm_a", "norm_b")
        )
        ranked = (
            cand.join(ea, "src")
            .join(eb, "nbr")
            .withColumn(
                "sim",
                pair_dot(F.col("ea"), F.col("eb"))
                / (F.col("norm_a") * F.col("norm_b")),
            )
            .withColumn("rank", F.row_number().over(w))
        )
        flagged = ranked.join(
            truth.withColumn("is_true", F.lit(1)), ["src", "nbr"], "left"
        )
        outs.append(
            flagged.agg(
                F.count(F.lit(1)).alias("n_candidates"),
                F.coalesce(
                    F.sum(
                        F.when(
                            (F.col("rank") <= KNN_K)
                            & F.col("is_true").isNotNull(),
                            1,
                        ).otherwise(0)
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias("n_hits"),
            ).select(
                F.lit(nbands).alias("n_bands"), "n_candidates", "n_hits"
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    recall = F.when(
        F.lit(n_true) > 0, F.col("n_hits").cast("double") / F.lit(n_true)
    )
    return out.select(
        "n_bands",
        "n_candidates",
        "n_hits",
        F.lit(n_true).cast("long").alias("n_true"),
        recall.alias("recall"),
    ).orderBy("n_bands")


def _knn_recall_sql() -> str:
    prefix = _emb_lsh_sql_prefix()
    ctes = [
        prefix
        + f""",
truthp as (
  select src, nbr from (
    select a.vec_id src, b.vec_id nbr,
           row_number() over (
             partition by a.vec_id
             order by {sql_dot('a.embedding', 'b.embedding')}
                      / (a.nrm * b.nrm) desc, b.vec_id) rnk
    from normed a join normed b on a.vec_id != b.vec_id
    where a.vec_id < {KNNR_QUERIES})
  where rnk <= {KNN_K}),"""
    ]
    stats = []
    for i, nbands in enumerate(KNNR_CONFIGS):
        ctes.append(
            f"""cand_{i} as (
  select distinct a.vec_id src, b.vec_id nbr,
         a.embedding ea, b.embedding eb, a.nrm na, b.nrm nb
  from we a join we b
    on a.band = b.band and a.band_val = b.band_val
   and a.vec_id != b.vec_id
  where a.band < {nbands} and a.vec_id < {KNNR_QUERIES}),"""
        )
        ctes.append(
            f"""ranked_{i} as (
  select src, nbr,
         row_number() over (partition by src
                            order by {sql_dot('ea', 'eb')} / (na * nb)
                                     desc, nbr) rnk
  from cand_{i}),"""
        )
        ctes.append(
            f"""stat_{i} as (
  select {nbands} n_bands, count(*) n_candidates,
         cast(coalesce(sum(case when rnk <= {KNN_K}
                                 and t.src is not null
                                then 1 else 0 end), 0) as bigint) n_hits
  from ranked_{i} c left join truthp t using (src, nbr)),"""
        )
        stats.append(f"select * from stat_{i}")
    body = "\n".join(ctes).rstrip(",")
    union = "\nunion all\n".join(stats)
    return f"""{body},
stats as (
{union})
select n_bands, n_candidates, n_hits,
       cast((select count(*) from truthp) as bigint) n_true,
       case when (select count(*) from truthp) > 0
            then cast(n_hits as double)
                 / (select count(*) from truthp) end recall
from stats
order by n_bands"""


ORACLE["knn_graph_recall"] = _knn_recall_sql()


# ---------------------------------------------------- dedup_jaccard_prefix
# prefix length for Jaccard >= 1/5: p = n - ceil(n/5) + 1, all-integer
PFX_T_DEN = 5  # threshold as the exact rational 1/5 == JACCARD_THRESHOLD


@_q("dedup_jaccard_prefix")
def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trigram-Jaccard near-dup pairs via PREFIX FILTERING
    (AllPairs/PPJoin, Bayardo et al., WWW 2007) — the third candidate
    generator over the same ground truth as dedup_ngram_jaccard
    (posting lists) and dedup_minhash (LSH), and the one that is both
    LOSSLESS and sub-posting-list cheap: under a global rarest-first
    token order, two sets can reach Jaccard >= t only if their first
    p = n - ceil(t*n) + 1 ordered tokens share an element, so only
    PREFIX tokens enter the candidate join — the stop-gram postings
    that dominate the full inverted index never expand at all
    (frequent grams sort LAST and rarely make a prefix).

    Plan: one shingle pass (arrays checkpointed once for its three
    consumers), a document-frequency aggregate, a per-doc rank window
    ordered (df, gram) — rarest first, total order so both engines cut
    identical prefixes — then the candidate equi-join on prefix grams
    only, and an array_intersect verify per candidate pair (JVM
    codegen, O(n) per pair, no re-shuffle of the gram stream).
    Threshold arithmetic is all-integer (ceil(n/5) = (n+4) div 5), so
    the prefix boundary is engine-exact.

    At 100 TB: candidate volume is bounded by PREFIX postings
    (~(1-t)·n per doc, and biased to RARE grams — the df skew that
    makes full posting lists quadratic works FOR the filter here);
    the verify touches only surviving pairs. The lossless guarantee
    is pytest-pinned: result set identical to dedup_ngram_jaccard.

    Cites the same reference workload as dedup_ngram_jaccard
    (SURVEY.md §2 dedup family)."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    arrays = (
        _gram_arrays(docs)
        .select("doc_id", "grams", F.size("grams").alias("n"))
        .localCheckpoint()
    )
    grams = arrays.select(
        "doc_id", "n", F.explode("grams").alias("gram")
    )
    dfc = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "gram")
    prefix = (
        grams.join(dfc, "gram")
        .withColumn("rn", F.row_number().over(w))
        .where(
            F.col("rn")
            <= F.col("n")
            - F.expr(f"(n + {PFX_T_DEN - 1}) div {PFX_T_DEN}")
            + F.lit(1)
        )
        .select("doc_id", "gram")
    )
    cand = (
        prefix.select(F.col("doc_id").alias("doc_a"), "gram")
        .join(prefix.select(F.col("doc_id").alias("doc_b"), "gram"), "gram")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    verified = (
        cand.join(
            arrays.select(
                F.col("doc_id").alias("doc_a"),
                F.col("grams").alias("ga"),
                F.col("n").alias("n_a"),
            ),
            "doc_a",
        )
        .join(
            arrays.select(
                F.col("doc_id").alias("doc_b"),
                F.col("grams").alias("gb"),
                F.col("n").alias("n_b"),
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("ga", "gb")).alias("n_common"),
            "n_a",
            "n_b",
        )
    )
    return (
        verified.withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


ORACLE["dedup_jaccard_prefix"] = f"""
with grams as ({_SQL_GRAM_SETS}),
sizes as (select doc_id, count(*) n from grams group by 1),
dfc as (select gram, count(*) df from grams group by 1),
ranked as (
  select g.doc_id, g.gram, s.n,
         row_number() over (partition by g.doc_id
                            order by d.df, g.gram) rn
  from grams g
  join dfc d using (gram)
  join sizes s using (doc_id)),
prefix as (
  select doc_id, gram from ranked
  where rn <= n - (n + {PFX_T_DEN - 1}) // {PFX_T_DEN} + 1),
cand as (
  select distinct a.doc_id doc_a, b.doc_id doc_b
  from prefix a join prefix b on a.gram = b.gram and a.doc_id < b.doc_id),
inter as (
  select c.doc_a, c.doc_b, count(*) n_common
  from cand c
  join grams ga on ga.doc_id = c.doc_a
  join grams gb on gb.doc_id = c.doc_b and gb.gram = ga.gram
  group by 1, 2)
select i.doc_a, i.doc_b,
       cast(n_common as double) / (sa.n + sb.n - n_common) jaccard
from inter i
join sizes sa on i.doc_a = sa.doc_id
join sizes sb on i.doc_b = sb.doc_id
where cast(n_common as double) / (sa.n + sb.n - n_common)
      >= {JACCARD_THRESHOLD}
"""


# -------------------------------------------------- dedup_incremental_ingest
INGEST_MOD = 5  # doc_id % 5 == 4 -> incoming batch (20%); rest = index


@_q("dedup_incremental_ingest")
def dedup_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL near-dup ingest — the production shape of MinHash
    dedup once a corpus is LIVE: a new crawl batch (here the stable
    20% slice doc_id % 5 = 4) is deduplicated AGAINST the existing
    index (the other 80%), never against itself and never re-joining
    the index to itself. Per incoming doc the verdict is (dup_of =
    best-matching index doc | null, jaccard, is_dup) — exactly what an
    ingest pipeline writes to its admission log.

    Why this is its own operator and not dedup_minhash on a union: at
    100 TB the index's band postings are PRECOMPUTED and stored (built
    once, appended per batch); each ingest probes |batch| signatures
    against them via the same (band, key) equi-join — cost scales with
    the batch and its real collisions, not the corpus. Re-running the
    full self-join per batch (the naive alternative) re-pays the whole
    corpus every day. The asymmetric join also halves candidate count
    (no index x index, no batch x batch pairs — those were settled at
    their own ingest time).

    Same constants as dedup_minhash (16 hashes, 4 bands, Jaccard >=
    0.2 verify on exact trigram sets), so its recall curve is the one
    dedup_lsh_tuning measured. Best-match ties break on index doc id;
    output is |batch| rows at any scale (left join keeps non-dups)."""
    docs = load_table(spark, sf_dir, "documents")
    newd = docs.where(F.expr(f"doc_id % {INGEST_MOD} = {INGEST_MOD - 1}"))
    oldd = docs.where(F.expr(f"doc_id % {INGEST_MOD} <> {INGEST_MOD - 1}"))

    def bands_of(sigs: DataFrame) -> DataFrame:
        band_structs = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"s{b * ROWS_PER_BAND + r}").cast(
                                    "string"
                                )
                                for r in range(ROWS_PER_BAND)
                            ],
                        )
                    ).alias("key"),
                )
                for b in range(N_BANDS)
            ]
        )
        return sigs.select(
            "doc_id", F.explode(band_structs).alias("bk")
        ).select("doc_id", "bk.band", "bk.key")

    bn = bands_of(_minhash_sigs(newd)).select(
        F.col("doc_id").alias("new_id"), "band", "key"
    )
    bo = bands_of(_minhash_sigs(oldd)).select(
        F.col("doc_id").alias("old_id"), "band", "key"
    )
    cand = (
        bn.join(bo, ["band", "key"]).select("new_id", "old_id").distinct()
    )
    gn = _gram_arrays(newd).select(
        F.col("doc_id").alias("new_id"), F.col("grams").alias("grams_n")
    )
    go = _gram_arrays(oldd).select(
        F.col("doc_id").alias("old_id"), F.col("grams").alias("grams_o")
    )
    inter = F.size(F.array_intersect(F.col("grams_n"), F.col("grams_o")))
    union = F.size("grams_n") + F.size("grams_o") - inter
    ver = (
        cand.join(gn, "new_id")
        .join(go, "old_id")
        .withColumn("jaccard", inter.cast("double") / union)
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("new_id", "old_id", "jaccard")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("new_id").orderBy(
        F.col("jaccard").desc(), F.col("old_id")
    )
    best = (
        ver.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("new_id", F.col("old_id").alias("dup_of"), "jaccard")
    )
    return (
        newd.select(F.col("doc_id").alias("new_id"))
        .join(best, "new_id", "left")
        .select(
            "new_id",
            "dup_of",
            "jaccard",
            F.col("dup_of").isNotNull().alias("is_dup"),
        )
        .orderBy("new_id")
    )


def _incremental_sql() -> str:
    """Oracle: the same asymmetric probe, generated from the SAME
    constants as _minhash_sql_parts so the two texts cannot drift."""
    sigs_sql = ",\n       ".join(
        f"min(({_mh_a(j)} * gh + {_mh_b(j)}) % {MH_PRIME}) s{j}"
        for j in range(N_HASHES)
    )

    def band_rows(sigs_cte: str) -> str:
        return "\n  union all\n".join(
            "  select doc_id, {b} band, md5({expr}) bkey from {cte}".format(
                b=b,
                cte=sigs_cte,
                expr=" || '|' || ".join(
                    f"cast(s{b * ROWS_PER_BAND + r} as varchar)"
                    for r in range(ROWS_PER_BAND)
                ),
            )
            for b in range(N_BANDS)
        )

    side = """
gh_{k} as (
  select doc_id, {h} % {p} gh
  from (select doc_id, unnest(grams) g from {src})),
sigs_{k} as (
  select doc_id,
       {sigs}
  from gh_{k} group by doc_id),
bands_{k} as (
{bands})"""
    parts = [
        f"""with alldocs as (
  select doc_id, {sql_trigrams(sql_toks('text'))} grams from documents),
newd as (select * from alldocs where doc_id % {INGEST_MOD} = {INGEST_MOD - 1}),
oldd as (select * from alldocs where doc_id % {INGEST_MOD} <> {INGEST_MOD - 1}),"""
    ]
    for k, src in (("new", "newd"), ("old", "oldd")):
        parts.append(
            side.format(
                k=k,
                src=src,
                h=sql_tok_hash60("g"),
                p=MH_PRIME,
                sigs=sigs_sql,
                bands=band_rows(f"sigs_{k}"),
            )
            + ","
        )
    parts.append(
        f"""cand as (
  select distinct n.doc_id new_id, o.doc_id old_id
  from bands_new n join bands_old o
    on n.band = o.band and n.bkey = o.bkey),
ver as (
  select new_id, old_id,
         cast(len(list_intersect(gn.grams, go.grams)) as double)
           / (len(gn.grams) + len(go.grams)
              - len(list_intersect(gn.grams, go.grams))) jaccard
  from cand
  join newd gn on new_id = gn.doc_id
  join oldd go on old_id = go.doc_id
  where cast(len(list_intersect(gn.grams, go.grams)) as double)
          / (len(gn.grams) + len(go.grams)
             - len(list_intersect(gn.grams, go.grams)))
        >= {JACCARD_THRESHOLD}),
best as (
  select new_id, old_id dup_of, jaccard
  from (select new_id, old_id, jaccard,
               row_number() over (partition by new_id
                                  order by jaccard desc, old_id) rn
        from ver)
  where rn = 1)
select n.doc_id new_id, b.dup_of, b.jaccard,
       b.dup_of is not null is_dup
from newd n left join best b on n.doc_id = b.new_id
order by new_id"""
    )
    return "\n".join(parts)


ORACLE["dedup_incremental_ingest"] = _incremental_sql()
