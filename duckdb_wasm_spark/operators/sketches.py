"""Probabilistic-sketch operators — the compressed summaries a 100 TB
curation pipeline runs where exact state would not fit:

  sketch_hll_distinct        HyperLogLog distinct-shingle estimate per
                             source, reported NEXT TO the exact count so
                             the gate checks the estimator itself
  sketch_cms_heavy_hitters   Count-Min sketch point estimates for the
                             true top-20 shingles (overestimate-only
                             guarantee, pytest-pinned)
  sketch_bloom_decontaminate Bloom-filter membership pre-filter for
                             benchmark decontamination, reported next to
                             exact membership (no false negatives,
                             pytest-pinned)

Every sketch here is md5-derived and therefore REPRODUCIBLE in the
DuckDB oracle: the "randomness" of register assignment, row hashing and
bit positions is the same 60-bit md5 fold both engines compute
identically (operators/_text.py tok_hash60), so even the approximate
answers are hash-exact across engines — the same discipline as the
MinHash/SimHash/LSH family in operators/dedup.py.

Scale notes (100 TB):
  - HLL state is sources × 256 registers regardless of corpus size; the
    register max is a map-side-combining aggregate, one shuffle by
    (source, register), then a 256-row-per-source fold. This is the
    shape of every production distinct-counter (BigQuery APPROX_*,
    Spark's own approx_count_distinct) — reimplemented openly so the
    oracle can replay it (engine-native HLLs use incompatible hashes).
  - CMS state is d×w = 4×256 counters total, map-side combined; point
    queries touch d rows per key. Heavy-hitter extraction joins the
    top-k frame (bounded) against the tiny sketch — never the corpus.
  - The Bloom bitset is ≤ m = 65536 set-bit rows built from the EVAL
    side (tiny by design), broadcast to the train scan exactly like
    decontaminate_ngram's inverted index; the probe is an equi-join on
    bit position. The win at scale: the broadcast is capped at m bits
    no matter how large the eval suite grows.

Float determinism: the only floating-point output is the HLL estimate;
its register fold is summed as EXACT bigints (2^(53-M_j) is an integer
for M_j ≤ 53) and converted to double once, so the IEEE operation
sequence is identical in both engines (see _hll docstrings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_wasm_spark.operators._text import (
    ngrams,
    ngrams_all,
    sql_ngrams,
    sql_ngrams_all,
    sql_toks,
    toks,
)
from duckdb_wasm_spark.tables import load_table

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def _q(name):
    def reg(fn):
        QUERIES[name] = fn
        return fn

    return reg


# ------------------------------------------------------ sketch_hll_distinct
HLL_P = 8  # 2^8 = 256 registers
HLL_M = 1 << HLL_P
# bias constant for m >= 128 (Flajolet et al. 2007); computed HERE and
# embedded as the same literal in both engines' texts
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_N = 3  # shingle width the estimator counts


@_q("sketch_hll_distinct")
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-trigram estimate per source, next to the
    exact count and relative error — gating the ESTIMATOR, not just a
    number: a wrong register split, rho, or fold changes the estimate
    and fails the hash.

    Construction (per shingle): h = 60-bit md5 fold; register =
    h % 256; the remaining 52 bits v = h // 256 give rho = 53 -
    bitlen(v) (rho = 53 for v = 0) — the 1-based position of the first
    set bit from the top of the 52-bit window. Register state M_j =
    max rho. Estimate E = alpha * m^2 / sum_j 2^(-M_j).

    Determinism: bitlen via length(bin(v)) / length(to_base(v, 2)) —
    integer-exact in both engines; the register fold sums the INTEGERS
    2^(53-M_j) (max 256 * 2^53 < 2^63) and divides by 2^53 once, so
    the float value of the fold is exact and order-independent, and E
    is the same three IEEE ops in both engines. The standard
    small-range linear-counting correction (E <= 2.5m with empty
    registers -> m * ln(m/V)) is implemented in both texts for
    correctness, but its ln() is the one cross-engine non-determinism
    risk — unreachable at the gated scales, where every source carries
    >= 1000 distinct trigrams >= 4m (the estimator sits in its
    bias-corrected sweet spot; a testdata regeneration shrinking
    sources below ~640 distinct shingles would need this row demoted
    to rows-only).

    Scale: state is |sources| x 256 registers, corpus-size-free."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "source", F.explode(ngrams(toks(), HLL_N)).alias("gram")
    )
    hashed = grams.select(
        "source",
        F.expr(
            "conv(substring(md5(gram), 1, 15), 16, 10)"
        ).cast("long").alias("h"),
    )
    regs = (
        hashed.select(
            "source",
            (F.col("h") % HLL_M).alias("register"),
            F.expr(
                f"if(h div {HLL_M} = 0, 53, "
                f"53 - length(bin(h div {HLL_M})))"
            ).alias("rho"),
        )
        .groupBy("source", "register")
        .agg(F.max("rho").alias("m_j"))
    )
    # zero-fill the 256-register grid per source WITHOUT a cross join:
    # explode a literal sequence on the (tiny, post-aggregate) source list
    grid = (
        regs.select("source")
        .distinct()
        .select(
            "source",
            F.explode(F.sequence(F.lit(0), F.lit(HLL_M - 1))).alias(
                "register"
            ),
        )
    )
    filled = grid.join(regs, ["source", "register"], "left").select(
        "source", F.coalesce(F.col("m_j"), F.lit(0)).alias("m_j")
    )
    per_source = filled.groupBy("source").agg(
        # exact bigint fold of 2^(53 - M_j); / 2^53 once => exact double
        F.expr("sum(cast(pow(2, 53 - m_j) as bigint))").alias("s_int"),
        F.expr("sum(if(m_j = 0, 1, 0))").alias("v_zero"),
    )
    est = per_source.select(
        "source",
        F.expr(
            # alpha is cast to double BEFORE multiplying: a bare
            # decimal literal times 65536 overflows DuckDB's DECIMAL
            # parse and would make the two engines' op sequences differ
            f"cast({HLL_ALPHA!r} as double) * {HLL_M * HLL_M} "
            f"/ (cast(s_int as double) / cast(pow(2, 53) as bigint))"
        ).alias("e_raw"),
        "v_zero",
    ).select(
        "source",
        F.expr(
            f"if(e_raw <= {2.5 * HLL_M!r} and v_zero > 0, "
            f"{HLL_M} * ln({HLL_M} / cast(v_zero as double)), e_raw)"
        ).alias("n_hll"),
    )
    exact = grams.groupBy("source").agg(
        F.countDistinct("gram").alias("n_exact")
    )
    return est.join(exact, "source").select(
        "source",
        "n_hll",
        "n_exact",
        ((F.col("n_hll") - F.col("n_exact")) / F.col("n_exact")).alias(
            "rel_err"
        ),
    )


ORACLE["sketch_hll_distinct"] = f"""
with grams as (
  select source, unnest({sql_ngrams(sql_toks('text'), HLL_N)}) gram
  from documents),
hashed as (
  select source, ('0x' || substr(md5(gram), 1, 15))::bigint h
  from grams),
regs as (
  select source, h % {HLL_M} register,
         max(case when h // {HLL_M} = 0 then 53
                  else 53 - length(to_base(h // {HLL_M}, 2)) end) m_j
  from hashed group by 1, 2),
grid as (
  select source, r.register
  from (select distinct source from regs),
       (select unnest(range(0, {HLL_M})) register) r),
filled as (
  select g.source, coalesce(m_j, 0) m_j
  from grid g left join regs using (source, register)),
per_source as (
  select source,
         sum(cast(2 ** (53 - m_j) as bigint)) s_int,
         sum(case when m_j = 0 then 1 else 0 end) v_zero
  from filled group by 1),
est as (
  select source,
         cast({HLL_ALPHA!r} as double) * {HLL_M * HLL_M}
           / (cast(s_int as double) / cast(2 ** 53 as double)) e_raw,
         v_zero
  from per_source),
corrected as (
  select source,
         case when e_raw <= {2.5 * HLL_M!r} and v_zero > 0
              then {HLL_M} * ln({HLL_M} / cast(v_zero as double))
              else e_raw end n_hll
  from est),
exact as (
  select source, count(distinct gram) n_exact from grams group by 1)
select source, n_hll, n_exact,
       (n_hll - n_exact) / n_exact rel_err
from corrected join exact using (source)
"""


# -------------------------------------------------- sketch_cms_heavy_hitters
CMS_D = 4  # hash rows
CMS_W = 256  # counters per row
CMS_TOPK = 20


def _cms_col_expr(i: int, gram: str) -> str:
    """Row-i counter index for a shingle — Spark SQL text."""
    return (
        f"cast(conv(substring(md5(concat('cms{i} ', {gram})), 1, 15), "
        f"16, 10) as bigint) % {CMS_W}"
    )


def _sql_cms_col(i: int, gram: str) -> str:
    """Same index in DuckDB."""
    return f"('0x' || substr(md5('cms{i} ' || {gram}), 1, 15))::bigint % {CMS_W}"


@_q("sketch_cms_heavy_hitters")
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point estimates for the true top-20 trigrams (by
    occurrence), next to exact counts: cms_n >= n_exact always (the
    one-sided CMS guarantee, pytest-pinned), with the overestimate
    column showing the collision error a d=4 x w=256 sketch pays on
    this corpus — the sketch is deliberately small relative to the
    shingle vocabulary so collisions actually occur and the gate
    checks real CMS behavior, not a perfect hash.

    Plan: one shingle pass fans out d=4 (row, counter) updates per
    occurrence, map-side combined into the <= 1024-cell sketch; the
    top-k frame (TakeOrderedAndProject, ties broken by gram) joins the
    sketch on (row, counter) — bounded x bounded, never the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.select("doc_id", F.explode(ngrams_all(toks(), 3)).alias("gram"))
    cells = " , ".join(
        f"struct({i} as i, {_cms_col_expr(i, 'gram')} as col)"
        for i in range(CMS_D)
    )
    cms = (
        g.select(F.expr(f"explode(array({cells}))").alias("rc"))
        .groupBy("rc.i", "rc.col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = (
        g.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), F.col("gram").asc())
        .limit(CMS_TOPK)
    )
    probes = top.select(
        "gram", "n_exact", F.expr(f"explode(array({cells}))").alias("rc")
    ).select("gram", "n_exact", "rc.i", "rc.col")
    return (
        probes.join(cms, ["i", "col"])
        .groupBy("gram")
        .agg(
            F.any_value("n_exact").alias("n_exact"),
            F.min("cnt").alias("cms_n"),
        )
        .select(
            "gram",
            "n_exact",
            "cms_n",
            (F.col("cms_n") - F.col("n_exact")).alias("overestimate"),
        )
    )


def _sql_cms_cells(gram: str) -> str:
    return ", ".join(
        f"{{'i': {i}, 'col': {_sql_cms_col(i, gram)}}}" for i in range(CMS_D)
    )


ORACLE["sketch_cms_heavy_hitters"] = f"""
with g as (
  select doc_id, unnest({sql_ngrams_all(sql_toks('text'), 3)}) gram
  from documents),
upd as (
  select u.c.i i, u.c.col col
  from g, unnest([{_sql_cms_cells('gram')}]) u(c)),
cms as (select i, col, count(*) cnt from upd group by 1, 2),
top as (
  select gram, count(*) n_exact from g group by 1
  order by n_exact desc, gram limit {CMS_TOPK}),
probes as (
  select gram, n_exact, u.c.i i, u.c.col col
  from top, unnest([{_sql_cms_cells('gram')}]) u(c))
select gram, any_value(n_exact) n_exact, min(cnt) cms_n,
       min(cnt) - any_value(n_exact) overestimate
from probes join cms using (i, col)
group by gram
"""


# ------------------------------------------------ sketch_bloom_decontaminate
BLOOM_K = 7  # hash functions
BLOOM_M = 65536  # bits
BLOOM_N = 5  # shingle width (decontaminate_ngram's DECON_N)
BLOOM_EVAL_MOD = 20  # held-out split (decontaminate_ngram's)


def _bloom_pos_expr(j: int, gram: str) -> str:
    return (
        f"cast(conv(substring(md5(concat('bloom{j} ', {gram})), 1, 15), "
        f"16, 10) as bigint) % {BLOOM_M}"
    )


def _sql_bloom_pos(j: int, gram: str) -> str:
    return (
        f"('0x' || substr(md5('bloom{j} ' || {gram}), 1, 15))::bigint "
        f"% {BLOOM_M}"
    )


@_q("sketch_bloom_decontaminate")
def sketch_bloom_decontaminate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bloom-filter membership pre-filter for decontamination, reported
    next to exact membership: per train doc, how many of its distinct
    5-gram shingles the k=7 / m=65536 Bloom filter built from the eval
    split calls "maybe present", vs how many truly are. Bloom admits
    no false negatives (n_bloom_hits >= n_exact_hits, pytest-pinned);
    n_false_pos is the price of compressing the eval shingle set to m
    bits. Same eval split as decontaminate_ngram (doc_id % 20 == 0).

    Scale: the bitset is <= m = 65536 set-bit rows NO MATTER how large
    the eval suite grows — where decontaminate_ngram's broadcast
    inverted index grows with the eval set, the Bloom broadcast is
    capped; the probe is an equi-join on bit position, and a gram
    survives only if all k probes hit (count(k) == k)."""
    docs = load_table(spark, sf_dir, "documents")
    shingled = docs.select(
        "doc_id", F.explode(ngrams(toks(), BLOOM_N)).alias("gram")
    )
    ev = shingled.where(F.col("doc_id") % BLOOM_EVAL_MOD == 0)
    train = shingled.where(F.col("doc_id") % BLOOM_EVAL_MOD != 0).select(
        F.col("doc_id").alias("train_id"), "gram"
    )
    poss = ", ".join(_bloom_pos_expr(j, "gram") for j in range(BLOOM_K))
    bits = (
        ev.select(F.expr(f"explode(array({poss}))").alias("pos"))
        .distinct()
    )
    probe = train.select(
        "train_id", "gram", F.expr(f"explode(array({poss}))").alias("pos")
    )
    bloom_hits = (
        probe.join(F.broadcast(bits), "pos")
        .groupBy("train_id", "gram")
        .agg(F.count(F.lit(1)).alias("k_hit"))
        .where(F.col("k_hit") == BLOOM_K)
        .groupBy("train_id")
        .agg(F.count(F.lit(1)).alias("n_bloom_hits"))
    )
    exact_hits = (
        train.join(
            ev.select("gram").distinct(), "gram", "left_semi"
        )
        .groupBy("train_id")
        .agg(F.count(F.lit(1)).alias("n_exact_hits"))
    )
    per_doc = train.groupBy("train_id").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    return (
        per_doc.join(bloom_hits, "train_id", "left")
        .join(exact_hits, "train_id", "left")
        .select(
            "train_id",
            "n_grams",
            F.coalesce("n_bloom_hits", F.lit(0)).alias("n_bloom_hits"),
            F.coalesce("n_exact_hits", F.lit(0)).alias("n_exact_hits"),
            (
                F.coalesce("n_bloom_hits", F.lit(0))
                - F.coalesce("n_exact_hits", F.lit(0))
            ).alias("n_false_pos"),
        )
    )


ORACLE["sketch_bloom_decontaminate"] = f"""
with shingled as (
  select doc_id, unnest({sql_ngrams(sql_toks('text'), BLOOM_N)}) gram
  from documents),
ev as (select * from shingled where doc_id % {BLOOM_EVAL_MOD} = 0),
train as (select doc_id train_id, gram from shingled
          where doc_id % {BLOOM_EVAL_MOD} != 0),
bits as (
  select distinct u.p pos
  from ev, unnest([{", ".join(_sql_bloom_pos(j, "gram") for j in range(BLOOM_K))}]) u(p)),
probe as (
  select train_id, gram, u.p pos
  from train, unnest([{", ".join(_sql_bloom_pos(j, "gram") for j in range(BLOOM_K))}]) u(p)),
bloom_hits as (
  select train_id, count(*) n_bloom_hits from (
    select train_id, gram
    from probe join bits using (pos)
    group by train_id, gram
    having count(*) = {BLOOM_K})
  group by train_id),
exact_hits as (
  select train_id, count(*) n_exact_hits
  from train semi join (select distinct gram from ev) e using (gram)
  group by train_id),
per_doc as (select train_id, count(*) n_grams from train group by 1)
select p.train_id, n_grams,
       coalesce(n_bloom_hits, 0) n_bloom_hits,
       coalesce(n_exact_hits, 0) n_exact_hits,
       coalesce(n_bloom_hits, 0) - coalesce(n_exact_hits, 0) n_false_pos
from per_doc p
left join bloom_hits using (train_id)
left join exact_hits using (train_id)
"""
