"""LLM-data-pipeline operators over the `documents` and `embeddings` tables.

Modules
-------
  text        token counting, text statistics/quality, language-ID
              heuristic, document fingerprinting
  dedup       exact dedup, n-gram Jaccard near-dup, banded MinHash-LSH,
              SimHash, embedding-cosine near-dup via random-hyperplane LSH
  similarity  brute-force cosine top-k (baseline) and IVF-partitioned ANN
  multimodal  binary-payload column plumbing (decode stubbed, Spark-side
              schema/batching real) via Arrow-batched mapInPandas

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
