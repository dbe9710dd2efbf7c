"""LLM-data-pipeline operators over the `documents` and `embeddings` tables.

Modules
-------
  text        token counting, text statistics/quality, language-ID
              heuristic, document fingerprinting, vocabulary top-k
  dedup       exact dedup, n-gram Jaccard near-dup, banded MinHash-LSH,
              SimHash, embedding-cosine near-dup via random-hyperplane
              LSH, connected-component clustering
  similarity  brute-force cosine top-k (baseline) and IVF-partitioned ANN
  multimodal  binary-payload column plumbing (decode stubbed, Spark-side
              schema/batching real) via Arrow-batched mapInPandas:
              metadata, features, thumbnail resize, frame sampling
  pipeline    curation compositions (quality cut → dedup), corpus
              rollups, deterministic sampling (balanced cap, token
              budget, stratified train/val/test split)
  temporal    as-of join and range join — registered queries plus the
              reusable `asof_join` / `range_join` DataFrame APIs
  ml_lsh      stock Spark-ML MinHashLSH / BucketedRandomProjectionLSH
              comparison points (rows-only: JVM-internal hash families)

Cross-engine determinism: every operator that is SQL-expressible ships a
DuckDB oracle built from the SAME primitives — md5 for hashing,
left-fold `aggregate`/`list_reduce` for float reductions, integer bit
ops for signatures — so results hash-match bit-for-bit (the driver's
correctness gate). Approximate operators (LSH family) are deterministic
too: their "randomness" is md5-derived, so the oracle reproduces the
same approximation.

Scale stance (100 TB): no driver-side collects; candidate generation is
always banded/bucketed joins (inverted-index style), never all-pairs —
the one all-pairs query (`sim_topk_brute`) is the restricted-query-set
correctness baseline for the ANN path, not the scale path.
"""
