"""Similarity search over the `embeddings` table (vec_id, embedding
list<float>[64], label).

  sim_topk_brute  exact cosine top-k for a restricted query set — the
                  correctness baseline every ANN variant is judged against
  sim_topk_ivf    IVF-partitioned ANN: vectors are assigned to the nearest
                  of C deterministic centroids (coarse quantizer); a query
                  searches only its own cell — the classic
                  inverted-file trade of recall for a C× fan-in cut

Determinism: cosine is the shared left-fold double dot product
(bit-identical to the DuckDB oracle's list_reduce, see dedup.dot_fold);
rank ties break on neighbor id, so top-k is total and hash-stable.

Scale notes (100 TB):
  - sim_topk_brute is O(|Q|·N) by construction; it exists to pin
    correctness for a small query panel, not as the scale path. The
    queries side is broadcast; the big side streams — no shuffle of the
    vector corpus.
  - sim_topk_ivf is the scale path: centroids broadcast, assignment is a
    narrow map over the corpus, search joins only within a cell
    (equi-join on cell id ⇒ partition-local after one shuffle by cell).
    Real deployments train centroids with k-means and probe >1 cell;
    centroid *training* is an offline batch job — here centroids are a
    deterministic subset so the oracle can reproduce them.
  - dedup.dedup_embedding_lsh is the third ANN family (hyperplane LSH)
    registered with the dedup operators.

Reference parity note: no similarity surface exists in the reference;
driver-mandated extension (SURVEY.md §7 phase 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_wasm_spark.operators.dedup import dot_fold, sql_dot
from duckdb_wasm_spark.tables import load_table

QUERIES: dict = {}
ORACLE: dict[str, str] = {}

N_QUERIES = 50  # query panel: vec_id < 50
TOP_K = 5
N_CENTROIDS = 8  # IVF coarse cells: centroids = vec_id < 8


def _q(name):
    def reg(fn):
        QUERIES[name] = fn
        return fn

    return reg


# -------------------------------------------------------- sim_topk_brute
@_q("sim_topk_brute")
def sim_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k neighbors by cosine for the query panel (vec_id <
    N_QUERIES), self excluded. Ties break on neighbor id."""
    emb = load_table(spark, sf_dir, "embeddings")
    normed = emb.select(
        "vec_id",
        "embedding",
        F.sqrt(dot_fold(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    q = normed.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("eq"),
        F.col("nrm").alias("nq"),
    )
    n = normed.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("en"),
        F.col("nrm").alias("nn"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        F.broadcast(q)
        .join(n, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot_fold(F.col("eq"), F.col("en")) / (F.col("nq") * F.col("nn")))
            .alias("sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


ORACLE["sim_topk_brute"] = f"""
with normed as (
  select vec_id, embedding,
         sqrt({sql_dot('embedding', 'embedding')}) nrm
  from embeddings),
q as (select vec_id query_id, embedding eq, nrm nq from normed
      where vec_id < {N_QUERIES}),
n as (select vec_id neighbor_id, embedding en, nrm nn from normed),
sims as (
  select query_id, neighbor_id, {sql_dot('eq', 'en')} / (nq * nn) sim
  from q join n on query_id <> neighbor_id),
ranked as (
  select *, row_number() over (partition by query_id
                               order by sim desc, neighbor_id asc) rank
  from sims)
select query_id, neighbor_id, rank, sim from ranked where rank <= {TOP_K}
"""


# ---------------------------------------------------------- sim_topk_ivf
@_q("sim_topk_ivf")
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: assign every vector to its nearest centroid (cosine,
    tie → smaller centroid id), then answer each panel query from its own
    cell only. Returns the per-cell top-k (approximate vs
    sim_topk_brute — that recall gap IS the IVF trade)."""
    emb = load_table(spark, sf_dir, "embeddings")
    normed = emb.select(
        "vec_id",
        "embedding",
        F.sqrt(dot_fold(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    cent = normed.where(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("ec"),
        F.col("nrm").alias("nc"),
    )
    aw = Window.partitionBy("vec_id").orderBy(
        F.col("c_sim").desc(), F.col("c_id").asc()
    )
    assigned = (
        normed.join(F.broadcast(cent))
        .select(
            "vec_id",
            "embedding",
            "nrm",
            "c_id",
            (
                dot_fold(F.col("embedding"), F.col("ec"))
                / (F.col("nrm") * F.col("nc"))
            ).alias("c_sim"),
        )
        .withColumn("arn", F.row_number().over(aw))
        .where(F.col("arn") == 1)
        .select("vec_id", "embedding", "nrm", F.col("c_id").alias("cell"))
    )
    q = assigned.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("eq"),
        F.col("nrm").alias("nq"), "cell",
    )
    n = assigned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("en"),
        F.col("nrm").alias("nn"), "cell",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        q.join(n, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "cell",
            "neighbor_id",
            (dot_fold(F.col("eq"), F.col("en")) / (F.col("nq") * F.col("nn")))
            .alias("sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "cell", "neighbor_id", "rank", "sim")
    )


ORACLE["sim_topk_ivf"] = f"""
with normed as (
  select vec_id, embedding,
         sqrt({sql_dot('embedding', 'embedding')}) nrm
  from embeddings),
cent as (select vec_id c_id, embedding ec, nrm nc from normed
         where vec_id < {N_CENTROIDS}),
assigned as (
  select vec_id, embedding, nrm, cell from (
    select e.vec_id, e.embedding, e.nrm, c.c_id cell,
           row_number() over (
             partition by e.vec_id
             order by {sql_dot('e.embedding', 'c.ec')} / (e.nrm * c.nc) desc,
                      c.c_id asc) arn
    from normed e, cent c)
  where arn = 1),
q as (select vec_id query_id, embedding eq, nrm nq, cell from assigned
      where vec_id < {N_QUERIES}),
n as (select vec_id neighbor_id, embedding en, nrm nn, cell from assigned),
sims as (
  select query_id, q.cell, neighbor_id, {sql_dot('eq', 'en')} / (nq * nn) sim
  from q join n using (cell)
  where query_id <> neighbor_id),
ranked as (
  select *, row_number() over (partition by query_id
                               order by sim desc, neighbor_id asc) rank
  from sims)
select query_id, cell, neighbor_id, rank, sim from ranked
where rank <= {TOP_K}
"""
