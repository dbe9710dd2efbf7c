"""Structural properties of the continuation-session operators that
the SQL oracle can't express — two kinds:

- laws on the driver testdata: SemDeDup's greedy-order semantics vs a
  brute-force numpy replay, silhouette range/accounting, DSIR's
  target-domain lift, perplexity-tercile partition/order, LPA's
  pre-flood community structure, MMR's shortlist/divergence laws, and
  k-means|| seeds beating naive seeding on quantization cost;
- full pure-Python replays on SEEDED RANDOM corpora written to temp
  parquet layouts (span removal, DSIR, k-means||, weighted LPA) —
  edge cases and exact arithmetic (md5 recipes, fixed-point floors,
  fold association) pinned independently of both engines.

(Exact oracle parity for every operator is covered by
tests/test_operators.py::test_operator_parity via the registry.)"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_wasm_spark.operators import selection


def test_semdedup_matches_numpy_replay(spark, sf_dir):
    """Recompute the upper-triangular prior-dup counts from the raw
    vectors in numpy, following the exact rank order the operator
    emitted — the pairwise-stage semantics (Abbas et al. 2023, §2)
    pinned independently of both engines' SQL."""
    out = selection.QUERIES["dedup_semdedup"](spark, sf_dir)
    rows = out.collect()
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    by_cell: dict = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    seen = 0
    for cell, members in by_cell.items():
        members.sort(key=lambda r: r["rn"])
        # rn is a 1-based permutation within the cell
        assert [m["rn"] for m in members] == list(
            range(1, len(members) + 1)
        )
        vecs = [emb[m["vec_id"]] for m in members]
        norms = [np.linalg.norm(v) for v in vecs]
        for i, m in enumerate(members):
            n_prior = sum(
                1
                for j in range(i)
                if float(vecs[i] @ vecs[j]) / (norms[i] * norms[j])
                >= selection.SEMDEDUP_TAU
            )
            assert m["n_prior_dups"] == n_prior, (
                f"cell {cell} rn {m['rn']}: {m['n_prior_dups']} != {n_prior}"
            )
            assert m["kept"] == (n_prior == 0)
            seen += 1
    assert seen == len(emb), "every vector must appear exactly once"


def test_semdedup_rank_one_always_kept(spark, sf_dir):
    out = selection.QUERIES["dedup_semdedup"](spark, sf_dir)
    bad = out.where((F.col("rn") == 1) & (~F.col("kept"))).count()
    assert bad == 0, "the first member of a cell has no priors"


def test_silhouette_accounting_and_range(spark, sf_dir):
    out = selection.QUERIES["embed_silhouette"](spark, sf_dir).collect()
    n_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r["n_vecs"] for r in out) == n_emb
    for r in out:
        assert 0 <= r["n_neg"] <= r["n_vecs"]
        assert -1.0 <= r["mean_sil"] <= 1.0
        # fixed-point floor bias is < 1/2^20 per vector
        if r["n_neg"] == 0:
            assert r["mean_sil"] > -1.0 / (1 << 20)


def test_dsir_prefers_target_domain(spark, sf_dir):
    """The importance weight is the target/raw log-likelihood ratio, so
    English (the target slice) must score higher on average than the
    rest — the method's defining behavior."""
    scored = selection.QUERIES["sample_dsir"](spark, sf_dir)
    rows = scored.collect()
    assert len(rows) <= selection.DSIR_K
    assert len({r["doc_id"] for r in rows}) == len(rows)
    en = [r["w_fp"] for r in rows if r["lang"] == "en"]
    rest = [r["w_fp"] for r in rows if r["lang"] != "en"]
    if en and rest:
        assert np.mean(en) > np.mean(rest)


def test_ppl_buckets_partition_and_order(spark, sf_dir):
    """Per language: the three buckets partition the scored docs, and
    the tercile boundaries are order-consistent (every head doc is at
    least as fluent as every middle doc, etc.)."""
    out = selection.QUERIES["corpus_ppl_buckets"](spark, sf_dir).collect()
    from duckdb_wasm_spark.operators.text import QUERIES as TEXT_Q

    lm_n = TEXT_Q["text_lm_score"](spark, sf_dir).count()
    assert sum(r["n_docs"] for r in out) == lm_n
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    for lang, buckets in by_lang.items():
        if {"head", "middle", "tail"} <= set(buckets):
            assert buckets["head"]["min_prob"] >= buckets["middle"]["max_prob"]
            assert buckets["middle"]["min_prob"] >= buckets["tail"]["max_prob"]
        for r in buckets.values():
            assert r["min_prob"] <= r["max_prob"]


def test_lpa_stays_pre_flood(spark, sf_dir):
    """Weighted LPA's round count is chosen to stop BEFORE the giant
    community floods the graph (the documented LPA failure mode on
    dense graphs — unweighted votes collapse to a 1500-member
    community at sf0.01). Pin the operating point: the largest
    community must hold under half the graph's nodes, and communities
    must have >= 2 members at the top."""
    from duckdb_wasm_spark.operators import graph

    out = graph.QUERIES["graph_label_propagation"](spark, sf_dir).collect()
    assert out, "no communities"
    edges = graph._edges(spark, sf_dir, "sym")
    n_nodes = edges.select("src").distinct().count()
    if n_nodes >= 1000:
        # the flood bound holds at the gated scales (86/1600 at
        # sf0.01, 266/15999 at sf0.1); the 160-node sf0.001 graph is
        # so dense every node is ~2 hops from every other, so two
        # rounds legitimately merge most of it (126/160) — density,
        # not an operator defect
        assert out[0]["n_members"] < 0.5 * n_nodes, (
            f"giant community flood: {out[0]['n_members']}/{n_nodes}"
        )
    assert out[0]["n_members"] >= 2
    assert len(out) >= 5, "community structure collapsed"
    # sizes are emitted largest-first with a total tie-break
    sizes = [r["n_members"] for r in out]
    assert sizes == sorted(sizes, reverse=True)


def test_span_removal_matches_python_replay(spark, sf_dir):
    """Replay the whole removal algorithm in pure Python (tokenize,
    positional windows, corpus-first canonical, coverage union, rebuild)
    and require identical cleaned texts — pins the greedy semantics
    independently of both engines' SQL."""
    from duckdb_wasm_spark.operators import dedup

    N = dedup.DUP_SUBSTR_N
    docs = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t != ""]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    first: dict = {}
    for d in sorted(docs):
        tk = docs[d]
        for i in range(len(tk) - N + 1):
            g = tuple(tk[i : i + N])
            if g not in first:
                first[g] = (d, i + 1)
    expected = {}
    for d in sorted(docs):
        tk = docs[d]
        cover = set()
        for i in range(len(tk) - N + 1):
            if first[tuple(tk[i : i + N])] != (d, i + 1):
                cover.update(range(i + 1, i + 1 + N))
        if cover:
            kept = [t for p, t in enumerate(tk, 1) if p not in cover]
            expected[d] = (len(tk), len(cover & set(range(1, len(tk) + 1))),
                           " ".join(kept))
    out = {
        r["doc_id"]: (r["n_before"], r["n_removed"], r["cleaned_text"])
        for r in dedup.QUERIES["dedup_span_removal"](spark, sf_dir).collect()
    }
    assert set(out) == set(expected)
    for d, exp in expected.items():
        assert out[d] == exp, f"doc {d}: {out[d][:2]} != {exp[:2]}"


def test_kmeanspp_seeds_beat_naive_cost(spark, sf_dir):
    """The point of k-means|| seeding: the quantization cost
    sum_x min_c d2(x, c) of the chosen seeds must beat the naive
    first-k seeding the Lloyd gates start from (numpy, exact)."""
    from duckdb_wasm_spark.operators import similarity

    seeds = [
        r["cid"]
        for r in similarity.QUERIES["ivf_kmeanspp_init"](
            spark, sf_dir
        ).collect()
    ]
    assert len(seeds) == similarity.N_CENTROIDS
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    X = np.stack([emb[i] for i in sorted(emb)])

    def cost(centroid_ids):
        C = np.stack([emb[i] for i in centroid_ids])
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return d2.min(axis=1).sum()

    naive = list(range(similarity.N_CENTROIDS))
    assert cost(seeds) < cost(naive), (
        f"kpp cost {cost(seeds):.2f} !< naive {cost(naive):.2f}"
    )


def test_mmr_diversifies_within_shortlist(spark, sf_dir):
    """MMR laws: picks per query are MMR_K distinct members of the
    cosine shortlist; step 1 IS the plain top-1; and the greedy
    re-ranking must actually fire somewhere (some query's pick set or
    order differs from the plain top-K) — otherwise the redundancy
    term is dead code on this corpus."""
    from duckdb_wasm_spark.operators import similarity

    out = similarity.QUERIES["sim_topk_mmr"](spark, sf_dir).collect()
    brute = similarity.QUERIES["sim_topk_brute"](spark, sf_dir).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in brute if r["rank"] == 1}
    topk = {}
    for r in sorted(brute, key=lambda r: (r["query_id"], r["rank"])):
        topk.setdefault(r["query_id"], []).append(r["neighbor_id"])
    by_q = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["step"])):
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    diverged = 0
    for qid, picks in by_q.items():
        assert len(picks) == similarity.MMR_K
        assert len(set(picks)) == similarity.MMR_K
        assert picks[0] == top1[qid], "step 1 must be the plain top-1"
        if picks != topk[qid][: similarity.MMR_K]:
            diverged += 1
    assert diverged > 0, "MMR never re-ranked — redundancy term dead"


def test_span_removal_randomized_corpora(spark, tmp_path):
    """Seeded random corpora (shared blocks + noise, intra-doc repeats,
    docs shorter than the window, full duplicates) written to a temp
    parquet layout and checked against the pure-Python replay — the
    edge cases the fixed testdata may not contain."""
    import random

    from duckdb_wasm_spark.operators import dedup

    N = dedup.DUP_SUBSTR_N
    for seed in range(4):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(12)]
        block = [rng.choice(vocab) for _ in range(N + 3)]
        docs = {}
        for d in range(12):
            style = d % 4
            if style == 0:  # shared block + noise
                tk = block + [rng.choice(vocab) for _ in range(rng.randint(0, 8))]
            elif style == 1:  # short doc (< window)
                tk = [rng.choice(vocab) for _ in range(rng.randint(1, N - 1))]
            elif style == 2:  # intra-doc repeat of its own window
                base = [rng.choice(vocab) for _ in range(N)]
                tk = base + [rng.choice(vocab)] + base
            else:  # full duplicate of the shared block
                tk = list(block)
            docs[d] = tk
        rows = [
            (d, " ".join(tk), "en", "src0", len(" ".join(tk)))
            for d, tk in docs.items()
        ]
        out_dir = str(tmp_path / f"corpus{seed}")
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{out_dir}/documents.parquet"
        )
        first: dict = {}
        for d in sorted(docs):
            tk = docs[d]
            for i in range(len(tk) - N + 1):
                first.setdefault(tuple(tk[i : i + N]), (d, i + 1))
        expected = {}
        for d in sorted(docs):
            tk = docs[d]
            cover = set()
            for i in range(len(tk) - N + 1):
                if first[tuple(tk[i : i + N])] != (d, i + 1):
                    cover.update(range(i + 1, i + 1 + N))
            if cover:
                kept = [t for p, t in enumerate(tk, 1) if p not in cover]
                expected[d] = (len(tk), len(cover), " ".join(kept))
        got = {
            r["doc_id"]: (r["n_before"], r["n_removed"], r["cleaned_text"])
            for r in dedup.QUERIES["dedup_span_removal"](
                spark, out_dir
            ).collect()
        }
        assert got == expected, f"seed {seed}: {got} != {expected}"


def test_dsir_matches_python_replay_on_random_corpus(spark, tmp_path):
    """Full pure-Python replay of DSIR (bucket hashing, Laplace
    smoothing, fixed-point log-ratio weights, Gumbel keys, top-k) on a
    seeded random corpus written to a temp parquet layout — pins the
    arithmetic end-to-end, including the md5 bucket/coin recipes."""
    import hashlib
    import math
    import random

    from duckdb_wasm_spark.operators import selection

    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(30)]
    rows = []
    for d in range(40):
        lang = "en" if d % 3 == 0 else "xx"
        n = rng.randint(2, 25)
        text = " ".join(rng.choice(vocab) for _ in range(n))
        rows.append((d, text, lang, "src0", len(text)))
    out_dir = str(tmp_path / "dsir")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    B, S = selection.DSIR_B, selection._SCALE

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    feats, raw, tgt = {}, {}, {}
    for d, text, lang, _, _ in rows:
        tk = [t for t in text.split(" ") if t]
        fs = [bucket(f"{a} {b}") for a, b in zip(tk, tk[1:])]
        feats[d] = fs
        for f in fs:
            raw[f] = raw.get(f, 0) + 1
            if lang == "en":
                tgt[f] = tgt.get(f, 0) + 1
    tot_r, tot_t = sum(raw.values()), sum(tgt.values())
    term = {
        f: math.floor(
            (
                math.log((tgt.get(f, 0) + 1) / (tot_t + B))
                - math.log((cr + 1) / (tot_r + B))
            )
            * S
        )
        for f, cr in raw.items()
    }
    expected = []
    for d, text, lang, _, _ in rows:
        if not feats[d]:
            continue
        w = sum(term[f] for f in feats[d])
        h = int(
            hashlib.md5(f"dsir{d}".encode()).hexdigest()[:15], 16
        )
        u = float(h) / float(1 << 60)
        g = math.floor(-math.log(-math.log(u)) * S)
        expected.append((d, lang, w, w + g))
    expected.sort(key=lambda r: (-r[3], r[0]))
    expected = expected[: selection.DSIR_K]
    got = [
        (r["doc_id"], r["lang"], r["w_fp"], r["score_fp"])
        for r in selection.QUERIES["sample_dsir"](spark, out_dir).collect()
    ]
    assert got == expected


def test_kmeanspp_matches_python_replay_on_random_corpus(spark, tmp_path):
    """Pure-Python replay of the whole k-means|| chain (fold dots, d²
    association, fixed-point φ, md5 selection coins, argmin
    assignment, weight top-k) on seeded random float32 vectors —
    every constant and operation order must match the operator."""
    import hashlib
    import math

    from duckdb_wasm_spark.operators import similarity as sim

    rng = np.random.RandomState(11)
    vecs = rng.randn(60, 8).astype(np.float32)
    rows = [(int(i), [float(x) for x in vecs[i]], int(i % 3)) for i in range(60)]
    out_dir = str(tmp_path / "kpp")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    emb = {i: [float(x) for x in vecs[i]] for i in range(60)}
    xx = {i: fold_dot(emb[i], emb[i]) for i in emb}
    cand = [(0, emb[0], xx[0])]
    S = sim._KPP_SCALE
    for t in range(1, sim.KPP_T + 1):
        d2 = {
            i: min((xx[i] - 2.0 * fold_dot(emb[i], ec)) + cxx
                   for _, ec, cxx in cand)
            for i in emb
        }
        phi = sum(int(math.floor(d2[i] * S)) for i in emb)
        phi_d = float(phi) / float(S)
        sel = []
        for i in sorted(emb):
            h = int(hashlib.md5(f"kpp{t}-{i}".encode()).hexdigest()[:15], 16)
            u = float(h) / float(1 << 60)
            if u * phi_d < float(sim.KPP_L) * d2[i]:
                sel.append((i, emb[i], xx[i]))
        cand = cand + sel
    weights = {}
    for i in sorted(emb):
        best = min(
            ((xx[i] - 2.0 * fold_dot(emb[i], ec)) + cxx, cid)
            for cid, ec, cxx in cand
        )
        weights[best[1]] = weights.get(best[1], 0) + 1
    expected = sorted(weights.items(), key=lambda kv: (-kv[1], kv[0]))[
        : sim.N_CENTROIDS
    ]
    got = [
        (r["cid"], r["weight"])
        for r in sim.QUERIES["ivf_kmeanspp_init"](spark, out_dir).collect()
    ]
    assert got == expected


def test_lpa_matches_python_replay_on_random_graph(spark, tmp_path):
    """Pure-Python replay of the weighted LPA rounds on a seeded random
    trade graph written as temp lineitem/orders parquet — vote sums,
    self-loops, and the (cnt desc, lbl asc) winner pick must match."""
    import random

    from duckdb_wasm_spark.operators import graph

    rng = random.Random(3)
    orders = [(ok, rng.randint(0, 11)) for ok in range(120)]
    lineitem = [
        (rng.choice(orders)[0], rng.randint(0, 7))
        for _ in range(400)
    ]
    out_dir = str(tmp_path / "lpa")
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")
    spark.createDataFrame(
        lineitem, "l_orderkey long, l_suppkey long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{out_dir}/lineitem.parquet"
    )
    ocust = dict(orders)
    w: dict = {}
    for ok, sk in lineitem:
        a, b = ocust[ok] * 2, sk * 2 + 1
        w[(a, b)] = w.get((a, b), 0) + 1
    edges: dict = {}
    for (a, b), wt in w.items():
        edges[(a, b)] = edges.get((a, b), 0) + wt
        edges[(b, a)] = edges.get((b, a), 0) + wt
    nodes = {a for a, _ in edges}
    for n in nodes:
        edges[(n, n)] = edges.get((n, n), 0) + 1
    lbl = {n: n for n in nodes}
    for _ in range(graph.LPA_ITERS):
        votes: dict = {}
        for (src, dst), wt in edges.items():
            key = (dst, lbl[src])
            votes[key] = votes.get(key, 0) + wt
        new = {}
        for (node, label), cnt in votes.items():
            cur = new.get(node)
            if cur is None or (cnt, -label) > (cur[0], -cur[1]):
                new[node] = (cnt, label)
        lbl = {n: v[1] for n, v in new.items()}
    sizes: dict = {}
    for n, l in lbl.items():
        sizes[l] = sizes.get(l, 0) + 1
    expected = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))[
        : graph.LPA_TOPK
    ]
    got = [
        (r["community"], r["n_members"])
        for r in graph.QUERIES["graph_label_propagation"](
            spark, out_dir
        ).collect()
    ]
    assert got == expected


def test_mmr_matches_numpy_greedy_replay(spark, sf_dir):
    """Replay the full MMR greedy (shortlist build, lambda score, max
    redundancy to picked set, total tie-breaks) in numpy from the raw
    vectors and require identical pick sequences per query."""
    from duckdb_wasm_spark.operators import similarity as sim

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    nrm = {i: float(np.linalg.norm(v)) for i, v in emb.items()}

    def cos(a, b):
        return float(emb[a] @ emb[b]) / (nrm[a] * nrm[b])

    expected = {}
    for q in range(sim.N_QUERIES):
        cands = sorted(
            ((cos(q, n), n) for n in emb if n != q),
            key=lambda t: (-t[0], t[1]),
        )[: sim.MMR_CAND]
        picks = [cands[0][1]]
        simq = dict((n, s) for s, n in cands)
        while len(picks) < sim.MMR_K:
            best = None
            for s, n in cands:
                if n in picks:
                    continue
                red = max(cos(n, p) for p in picks)
                score = sim.MMR_LAMBDA * s - (1.0 - sim.MMR_LAMBDA) * red
                key = (-score, n)
                if best is None or key < best[0]:
                    best = (key, n)
            picks.append(best[1])
        expected[q] = picks
    got = {}
    rows = sim.QUERIES["sim_topk_mmr"](spark, sf_dir).collect()
    for r in sorted(rows, key=lambda r: (r["query_id"], r["step"])):
        got.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert got == expected


def test_edit_verify_matches_python_dp(spark, sf_dir):
    """Recompute the Levenshtein DP in pure Python for every candidate
    pair and require identical distances and flags."""
    from duckdb_wasm_spark.operators import dedup

    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    rows = dedup.QUERIES["dedup_edit_verify"](spark, sf_dir).collect()
    assert rows, "no candidate pairs at this scale"
    for r in rows:
        a, b = texts[r["doc_a"]], texts[r["doc_b"]]
        d = lev(a, b)
        assert r["edit_distance"] == d
        exp_sim = 1.0 - float(d) / float(max(len(a), len(b)))
        assert r["edit_sim"] == exp_sim
        assert r["is_fuzzy_dup"] == (exp_sim >= dedup.EDIT_SIM_MIN)


# ------------------------------------------------- round-12 additions
def _fold_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def _replay_trained_centroids(emb, seed_ids, iters):
    """Pure-Python replay of similarity._trained_centroids: seeded
    centroids, then `iters` exact fixed-point Lloyd iterations (argmax
    cosine with ties to the smaller cell id; per-component mean of
    floor(v·2^20) summed exactly as ints)."""
    import math

    S = float(1 << 20)  # similarity._FP_SCALE
    nrm = {i: math.sqrt(_fold_dot(emb[i], emb[i])) for i in emb}
    cur = [
        (i, [float(x) for x in emb[i]], nrm[i]) for i in sorted(seed_ids)
    ]
    for _ in range(iters):
        cells: dict = {}
        for i in sorted(emb):
            best = max(
                (_fold_dot(emb[i], ec) / (nrm[i] * nc), -cid)
                for cid, ec, nc in cur
            )
            cells.setdefault(-best[1], []).append(i)
        nxt = []
        for cid in sorted(cells):
            members = cells[cid]
            dim = len(emb[members[0]])
            ec = []
            for p in range(dim):
                sv = sum(
                    int(math.floor(float(emb[i][p]) * S)) for i in members
                )
                ec.append(float(sv) / float(len(members)) / S)
            nxt.append((cid, ec, math.sqrt(_fold_dot(ec, ec))))
        cur = nxt
    return cur


def _replay_assign(emb, cents):
    """arn=1 hard assignment: (cell, c_sim) per vector, ties to the
    smaller cell id — the _assign_cells rule."""
    import math

    out = {}
    for i in sorted(emb):
        nrm = math.sqrt(_fold_dot(emb[i], emb[i]))
        best = max(
            (_fold_dot(emb[i], ec) / (nrm * nc), -cid)
            for cid, ec, nc in cents
        )
        out[i] = (-best[1], best[0])
    return out


def _write_random_embeddings(spark, out_dir, n=64, dim=8, seed=3):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dim).astype(np.float32)
    rows = [
        (int(i), [float(x) for x in vecs[i]], int(i % 3)) for i in range(n)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )
    return {i: [float(x) for x in vecs[i]] for i in range(n)}


def test_semdedup_cell_growth_law(spark, sf_dir):
    """The scale law dedup_semdedup's docstring claims, EXECUTED (r11
    verdict #1, the lsh_candidate_growth mold): doubling the corpus
    with the cell count doubled must keep members-per-cell ~O(1) and
    grow the within-cell pair count SUB-quadratically (< 4x is the
    budget an unscaled C would exactly spend; measured ~2.0x at
    sf0.01 and sf0.1)."""
    rows = {
        r["subset"]: r
        for r in selection.QUERIES["semdedup_cell_growth"](
            spark, sf_dir
        ).collect()
    }
    full, half = rows["full"], rows["half"]
    assert full["n_vectors"] >= 2 * half["n_vectors"] - 1
    assert full["n_cells"] == 2 * half["n_cells"]
    pair_growth = full["n_within_pairs"] / max(1, half["n_within_pairs"])
    assert pair_growth < 4.0, (
        f"within-cell pair growth {pair_growth:.2f}x per corpus "
        f"doubling — the quadratic regime cell scaling must prevent"
    )
    # members-per-cell stays a sizing constant: the max cell of the
    # doubled corpus is bounded by the half corpus's max times skew
    # slack, NOT by 2x (which would mean C scaling bought nothing)
    assert full["max_cell_members"] <= 1.5 * half["max_cell_members"], (
        full["max_cell_members"],
        half["max_cell_members"],
    )
    # each subset's mean occupancy matches n/C exactly
    for r in (full, half):
        assert r["n_within_pairs"] >= 0
        assert r["max_cell_members"] >= r["n_vectors"] / r["n_cells"]


def test_semdedup_index_artifact_reload_equals_rebuild(spark, sf_dir):
    """The persisted SemDeDup index (r11 verdict #1) must serve
    exactly what a fresh derivation computes, for BOTH frames — the
    rank key is total, so row identity is deterministic and the
    parity is row-for-row; the dup verdicts are exact fold dots over
    that deterministic order."""
    idx = selection._semdedup_index_memo(spark, sf_dir)
    served = idx["ranked"].select("vec_id", "cell", "rn")
    fresh_ranked = selection._semdedup_ranked_build(spark, sf_dir)
    fresh = fresh_ranked.select("vec_id", "cell", "rn")
    assert served.exceptAll(fresh).count() == 0
    assert fresh.exceptAll(served).count() == 0
    fresh_dups = selection._semdedup_dups_build(spark, fresh_ranked)
    assert idx["dups"].exceptAll(fresh_dups).count() == 0
    assert fresh_dups.exceptAll(idx["dups"]).count() == 0


def test_semdedup_matches_python_replay_on_random_corpus(spark, tmp_path):
    """FULL pure-Python replay of the SemDeDup chain — fixed-point
    Lloyd training from the first-C seeds, tie-broken hard assignment,
    (c_sim, vec_id) rank order, upper-triangular prior-dup counts —
    on a seeded random corpus written to a temp parquet layout (the
    stronger replay form DSIR/k-means|| got in r11; r11 verdict #7)."""
    from duckdb_wasm_spark.operators import similarity as sim

    out_dir = str(tmp_path / "semdedup")
    emb = _write_random_embeddings(spark, out_dir, n=64, dim=8, seed=3)
    cents = _replay_trained_centroids(
        emb, [i for i in sorted(emb) if i < sim.N_CENTROIDS], sim.TRAIN_ITERS
    )
    assign = _replay_assign(emb, cents)
    import math

    nrm = {i: math.sqrt(_fold_dot(emb[i], emb[i])) for i in emb}
    by_cell: dict = {}
    for i, (cell, c_sim) in assign.items():
        by_cell.setdefault(cell, []).append((c_sim, i))
    expected = {}
    for cell, members in by_cell.items():
        members.sort()
        for rank, (_, i) in enumerate(members, 1):
            n_prior = sum(
                1
                for _, j in members[: rank - 1]
                if _fold_dot(emb[i], emb[j]) / (nrm[i] * nrm[j])
                >= selection.SEMDEDUP_TAU
            )
            expected[i] = (cell, rank, n_prior, n_prior == 0)
    got = {
        r["vec_id"]: (r["cell"], r["rn"], r["n_prior_dups"], r["kept"])
        for r in selection.QUERIES["dedup_semdedup"](
            spark, out_dir
        ).collect()
    }
    assert got == expected


def test_silhouette_matches_python_replay_on_random_corpus(spark, tmp_path):
    """Pure-Python replay of the simplified silhouette (a/b from the
    trained codebook, fixed-point floor BEFORE the per-cell sum) on a
    seeded random corpus (r11 verdict #7)."""
    import math

    from duckdb_wasm_spark.operators import similarity as sim

    out_dir = str(tmp_path / "sil")
    emb = _write_random_embeddings(spark, out_dir, n=48, dim=8, seed=5)
    cents = _replay_trained_centroids(
        emb, [i for i in sorted(emb) if i < sim.N_CENTROIDS], sim.TRAIN_ITERS
    )
    S = float(selection._SCALE)
    agg: dict = {}
    for i in sorted(emb):
        nrm = math.sqrt(_fold_dot(emb[i], emb[i]))
        sims = sorted(
            (
                (_fold_dot(emb[i], ec) / (nrm * nc), -cid)
                for cid, ec, nc in cents
            ),
            reverse=True,
        )
        cell = -sims[0][1]
        a = 1.0 - sims[0][0]
        b = 1.0 - sims[1][0]
        s = 0.0 if max(a, b) == 0 else (b - a) / max(a, b)
        fp = int(math.floor(s * S))
        n, neg, tot = agg.get(cell, (0, 0, 0))
        agg[cell] = (n + 1, neg + (1 if fp < 0 else 0), tot + fp)
    expected = {
        cell: (n, neg, float(tot) / S / n)
        for cell, (n, neg, tot) in agg.items()
    }
    got = {
        r["cell"]: (r["n_vecs"], r["n_neg"], r["mean_sil"])
        for r in selection.QUERIES["embed_silhouette"](
            spark, out_dir
        ).collect()
    }
    assert got == expected


def test_ppl_buckets_matches_python_replay_on_random_corpus(spark, tmp_path):
    """Pure-Python replay of the CCNet tercile chain — the bigram-LM
    score (add-alpha smoothing, 12-decimal HALF_UP rounding, exact
    decimal sum) and the per-language integer tercile boundaries — on
    a seeded random corpus (r11 verdict #7)."""
    import random
    from decimal import ROUND_HALF_UP, Decimal

    from duckdb_wasm_spark.operators import text as text_ops

    rng = random.Random(13)
    vocab = [f"t{i}" for i in range(18)]
    rows = []
    docs = {}
    for d in range(36):
        lang = ("en", "de", "fr")[d % 3]
        n = rng.randint(2, 20)
        tk = [rng.choice(vocab) for _ in range(n)]
        docs[d] = (lang, tk)
        rows.append((d, " ".join(tk), lang, "src0", len(" ".join(tk))))
    out_dir = str(tmp_path / "ppl")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    alpha = text_ops.LM_ALPHA
    vocab_seen = {t for _, tk in docs.values() for t in tk}
    cb: dict = {}
    cp: dict = {}
    per_doc: dict = {}
    for d, (_, tk) in docs.items():
        for w1, w2 in zip(tk, tk[1:]):
            g = f"{w1} {w2}"
            cb[g] = cb.get(g, 0) + 1
            cp[w1] = cp.get(w1, 0) + 1
            key = (d, w1, g)
            per_doc[key] = per_doc.get(key, 0) + 1
    scored = {}
    for d, (lang, tk) in docs.items():
        if len(tk) < 2:
            continue
        tot = Decimal(0)
        n_bg = 0
        for (dd, w1, g), k in per_doc.items():
            if dd != d:
                continue
            p = float(k) * (
                (float(cb[g]) + alpha)
                / (float(cp[w1]) + alpha * len(vocab_seen))
            )
            kp = Decimal(repr(p)).quantize(
                Decimal("1e-12"), rounding=ROUND_HALF_UP
            )
            tot += kp
            n_bg += k
        scored[d] = (lang, n_bg, float(tot) / n_bg)
    by_lang: dict = {}
    for d, (lang, n_bg, avg) in scored.items():
        by_lang.setdefault(lang, []).append((avg, d, n_bg))
    expected: dict = {}
    for lang, lst in by_lang.items():
        lst.sort()
        n = len(lst)
        for rn, (avg, d, n_bg) in enumerate(lst, 1):
            if rn * 3 <= n:
                bucket = "tail"
            elif rn * 3 <= 2 * n:
                bucket = "middle"
            else:
                bucket = "head"
            key = (lang, bucket)
            cnt, bgs, mn, mx = expected.get(
                key, (0, 0, float("inf"), float("-inf"))
            )
            expected[key] = (
                cnt + 1,
                bgs + n_bg,
                min(mn, avg),
                max(mx, avg),
            )
    got = {
        (r["lang"], r["bucket"]): (
            r["n_docs"],
            r["n_bigrams"],
            r["min_prob"],
            r["max_prob"],
        )
        for r in selection.QUERIES["corpus_ppl_buckets"](
            spark, out_dir
        ).collect()
    }
    assert got == expected


def test_bm25_ranking_laws(spark, sf_dir):
    """Structural BM25 laws the oracle hash can't articulate: every
    query returns <= K results, never itself; scores are positive and
    strictly rank-ordered under the total (score desc, doc_id asc)
    key; and a query's top hit shares at least one query term with the
    query document (it scored, so it must)."""
    from duckdb_wasm_spark.operators import text as text_ops

    rows = text_ops.QUERIES["text_bm25_topk"](spark, sf_dir).collect()
    assert rows
    toks_by_doc = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    by_q: dict = {}
    for r in rows:
        assert r["doc_id"] != r["query_id"]
        assert r["score"] > 0
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, hits in by_q.items():
        assert len(hits) <= text_ops.BM25_TOPK
        hits.sort(key=lambda r: r["rk"])
        assert [h["rk"] for h in hits] == list(range(1, len(hits) + 1))
        for lo, hi in zip(hits, hits[1:]):
            assert (lo["score"], -lo["doc_id"]) >= (hi["score"], -hi["doc_id"])
        qterms = set(toks_by_doc[qid][: text_ops.BM25_QTOK])
        assert qterms & set(toks_by_doc[hits[0]["doc_id"]])


def test_novelty_first_doc_and_accounting(spark, sf_dir):
    """Novelty laws: the rollup accounts for every document with >= 3
    tokens (shorter docs have no trigram); deciles are in [0, 9]; and
    the smallest doc_id with shingles is fully novel by construction
    (its shingles' first occurrence can only be itself), so its
    source must have docs in decile 9."""
    from duckdb_wasm_spark.operators import text as text_ops

    out = text_ops.QUERIES["corpus_novelty"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    eligible = [
        r for r in docs if len([t for t in r["text"].split(" ") if t]) >= 3
    ]
    assert sum(r["n_docs"] for r in out) == len(eligible)
    for r in out:
        assert 0 <= r["decile"] <= 9
        assert r["novel_shingles"] >= 0
    first = min(eligible, key=lambda r: r["doc_id"])
    nines = {r["source"] for r in out if r["decile"] == 9}
    assert first["source"] in nines


def test_bm25_matches_python_replay_on_random_corpus(spark, tmp_path):
    """Full pure-Python replay of the BM25 chain (tokenize, tf/df/dl,
    avgdl, idf, 12-decimal HALF_UP term rounding, exact decimal sum,
    total-order rank cut) on a seeded random corpus — pins the
    arithmetic end-to-end independently of both engines."""
    import math
    import random
    from decimal import ROUND_HALF_UP, Decimal

    from duckdb_wasm_spark.operators import text as text_ops

    rng = random.Random(29)
    vocab = [f"t{i}" for i in range(25)]
    docs = {}
    rows = []
    for d in range(40):
        n = rng.randint(1, 30)
        tk = [rng.choice(vocab) for _ in range(n)]
        docs[d] = tk
        rows.append((d, " ".join(tk), "en", "src0", len(" ".join(tk))))
    out_dir = str(tmp_path / "bm25")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    k1, b = text_ops.BM25_K1, text_ops.BM25_B
    n_docs = len(docs)
    avgdl = float(sum(len(tk) for tk in docs.values())) / float(n_docs)
    df: dict = {}
    for tk in docs.values():
        for t in set(tk):
            df[t] = df.get(t, 0) + 1
    expected: dict = {}
    for qid in range(min(text_ops.BM25_NQ, n_docs)):
        qterms = []
        for t in docs[qid][: text_ops.BM25_QTOK]:
            if t not in qterms:
                qterms.append(t)
        scored = []
        for d, tk in docs.items():
            if d == qid:
                continue
            tot = Decimal(0)
            hit = False
            for t in qterms:
                tf = tk.count(t)
                if tf == 0:
                    continue
                hit = True
                idf = math.log(
                    1.0 + (float(n_docs) - df[t] + 0.5) / (float(df[t]) + 0.5)
                )
                part = (float(tf) * (k1 + 1.0)) / (
                    float(tf) + k1 * (1.0 - b + b * float(len(tk)) / avgdl)
                )
                tot += Decimal(repr(idf * part)).quantize(
                    Decimal("1e-12"), rounding=ROUND_HALF_UP
                )
            if hit:
                scored.append((-float(tot), d))
        scored.sort()
        for rk, (negs, d) in enumerate(scored[: text_ops.BM25_TOPK], 1):
            expected[(qid, rk)] = (d, -negs)
    got = {
        (r["query_id"], r["rk"]): (r["doc_id"], r["score"])
        for r in text_ops.QUERIES["text_bm25_topk"](spark, out_dir).collect()
    }
    assert got == expected


def test_novelty_matches_python_replay_on_random_corpus(spark, tmp_path):
    """Pure-Python replay of the novelty rollup (first-occurrence
    trigram index, per-doc novel/total counts, integer decile floor)
    on a seeded random corpus with planted duplicates."""
    import random

    from duckdb_wasm_spark.operators import text as text_ops

    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(10)]
    docs = {}
    rows = []
    for d in range(30):
        if d % 5 == 4:  # planted full duplicate of an earlier doc
            tk = list(docs[d - 2])
        else:
            tk = [rng.choice(vocab) for _ in range(rng.randint(1, 15))]
        docs[d] = tk
        src = f"s{d % 3}"
        rows.append((d, " ".join(tk), "en", src, len(" ".join(tk))))
    out_dir = str(tmp_path / "novelty")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    first: dict = {}
    for d in sorted(docs):
        for g in {
            tuple(docs[d][i : i + 3]) for i in range(len(docs[d]) - 2)
        }:
            if g not in first:
                first[g] = d
    expected: dict = {}
    for d in sorted(docs):
        grams = {tuple(docs[d][i : i + 3]) for i in range(len(docs[d]) - 2)}
        if not grams:
            continue
        novel = sum(1 for g in grams if first[g] == d)
        decile = min(9, (novel * 10) // len(grams))
        key = (f"s{d % 3}", decile)
        nd, ns = expected.get(key, (0, 0))
        expected[key] = (nd + 1, ns + novel)
    got = {
        (r["source"], r["decile"]): (r["n_docs"], r["novel_shingles"])
        for r in text_ops.QUERIES["corpus_novelty"](spark, out_dir).collect()
    }
    assert got == expected
