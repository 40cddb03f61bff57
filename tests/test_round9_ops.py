"""Independent ground-truth tests for round-9 operators: plain-Python /
numpy answers, deliberately NOT the shared Spark/DuckDB oracle formulas
— when both engines share a formula, the sweep cannot catch a formula
bug (the round-3 review's blind spot, closed per-round since)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq

import metadata_extractors_api_spark as mdx


def _docs(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet")
    return {
        int(i): s.split(" ")
        for i, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    }


def _embs(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    return {
        int(i): np.asarray(v, dtype=np.float64)
        for i, v in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())
    }


def _dot_scaled(a, b):
    # exact scaled-int dot: sum of floor(x*y*1e12) per dimension
    return int(sum(math.floor(float(x) * float(y) * 1e12) for x, y in zip(a, b)))


def _cos(a, b):
    d = _dot_scaled(a, b)
    na, nb = _dot_scaled(a, a), _dot_scaled(b, b)
    return round((d / 1e12) / (math.sqrt(na / 1e12) * math.sqrt(nb / 1e12)), 6)


# --- sim_hybrid_rrf ----------------------------------------------------------


def test_rrf_fusion_matches_python_replay(spark, sf_dir):
    """Full replay of both retrieval lists and the RRF fusion in plain
    Python (Counter-based lexical scores as RATIONALS via fractions,
    numpy cosines), vs the registered query."""
    from fractions import Fraction

    from metadata_extractors_api_spark.operators.llm import (
        RRF_K,
        RRF_POOL,
        RRF_TERMS,
    )

    docs = _docs(sf_dir)
    n_docs = len(docs)
    df = {t: sum(1 for tk in docs.values() if t in tk) for t in RRF_TERMS}
    lex_scores = {}
    for d, tk in docs.items():
        s = sum(
            Fraction(tk.count(t) * n_docs, df[t]) for t in RRF_TERMS if df[t]
        )
        if s > 0:
            lex_scores[d] = s
    lex_order = sorted(lex_scores, key=lambda d: (-lex_scores[d], d))[:RRF_POOL]
    lex_rank = {d: i + 1 for i, d in enumerate(lex_order)}

    embs = _embs(sf_dir)
    q = embs[0]
    cos = {v: _cos(e, q) for v, e in embs.items()}
    vec_order = sorted(cos, key=lambda v: (-cos[v], v))[:RRF_POOL]
    vec_rank = {v: i + 1 for i, v in enumerate(vec_order)}

    fused = {}
    for d, r in lex_rank.items():
        fused[d] = fused.get(d, 0) + 10**9 // (RRF_K + r)
    for v, r in vec_rank.items():
        fused[v] = fused.get(v, 0) + 10**9 // (RRF_K + r)
    want = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    got = [
        (r["doc_id"], r["rrf_e9"])
        for r in mdx.QUERIES["sim_hybrid_rrf"](spark, sf_dir)
        .orderBy("doc_id")
        .collect()
    ]
    assert sorted(got) == sorted(want)


# --- dedup_semantic_cluster --------------------------------------------------


def test_semantic_cluster_prune_matches_numpy_lloyd(spark, sf_dir):
    """Lloyd's k-means re-run in exact integer numpy (quantized coords,
    floor-divide centroid update — the same determinism contract), then
    the TOP-2 MULTI-PROBE SemDeDup min-id prune replayed brute-force:
    a lower-id member prunes a higher-id one when they share ANY of
    their two nearest centroids and cosine >= SEM_T (the production
    rule this round promoted from dedup_semantic_multiprobe_audit)."""
    from metadata_extractors_api_spark.operators.pipeline import (
        KM_ITERS,
        KM_SCALE,
        SEM_T,
        SEM_TARGET_CLUSTER,
    )

    embs = _embs(sf_dir)
    ids = sorted(embs)
    # Data-adaptive SemDeDup K (the paper's K ∝ N contract), computed
    # independently from the corpus census.
    km_k = -(-len(ids) // SEM_TARGET_CLUSTER)
    X = np.array(
        [[math.floor(float(x) * KM_SCALE) for x in embs[i]] for i in ids],
        dtype=object,  # exact ints
    )
    cent = {c: X[ids.index(c + 1)].copy() for c in range(km_k)}

    def probes(n):
        """n nearest centroids per vector, ties to the lower cluster."""
        out = {}
        for r, i in enumerate(ids):
            ranked = sorted(
                range(km_k),
                key=lambda c: (int(sum((X[r] - cent[c]) ** 2)), c),
            )
            out[i] = ranked[:n]
        return out

    for _ in range(KM_ITERS):
        a = {i: p[0] for i, p in probes(1).items()}
        for c in range(km_k):
            rows = [X[ids.index(i)] for i in ids if a[i] == c]
            if rows:
                s = np.sum(rows, axis=0)
                cent[c] = np.array(
                    [int(v) // len(rows) for v in s], dtype=object
                )
    top2 = probes(2)
    prim = {i: p[0] for i, p in top2.items()}
    probe_pop = {}
    for p in top2.values():
        for c in p:
            probe_pop[c] = probe_pop.get(c, 0) + 1

    pruned = set()
    for i in ids:
        for j in ids:
            if j >= i:
                break
            shared = set(top2[j]) & set(top2[i])
            if shared and _cos(embs[j], embs[i]) >= SEM_T:
                pruned.add(i)
                break

    rows = mdx.QUERIES["dedup_semantic_cluster"](spark, sf_dir).collect()
    got_assign = {r["vec_id"]: r["cluster"] for r in rows}
    got_pruned = {r["vec_id"] for r in rows if r["action"] == "prune"}
    got_pop = {r["vec_id"]: r["n_members"] for r in rows}
    assert all(r["action"] != "quarantine" for r in rows)  # cap inert here
    assert got_assign == prim
    assert got_pruned == pruned
    assert got_pop == {i: probe_pop[prim[i]] for i in ids}


# --- text_phrase_search ------------------------------------------------------


def test_phrase_search_matches_python_scan(spark, sf_dir):
    """Naive sliding-window phrase scan per document (no index), vs the
    positional-index join plan."""
    from metadata_extractors_api_spark.operators.corpus import PHRASE

    docs = _docs(sf_dir)
    want = {}
    k = len(PHRASE)
    for d, tk in docs.items():
        hits = [
            i + 1
            for i in range(len(tk) - k + 1)
            if tuple(tk[i : i + k]) == PHRASE
        ]
        if hits:
            want[d] = (len(hits), hits[0])
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in mdx.QUERIES["text_phrase_search"](spark, sf_dir).collect()
    }
    assert got == want


# --- graph_link_prediction / graph_bfs_landmarks -----------------------------


def _co_supply_edges(sf_dir, min_qty):
    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity"],
    )
    by_part = {}
    for p, s, q in zip(
        t["l_partkey"].to_pylist(),
        t["l_suppkey"].to_pylist(),
        t["l_quantity"].to_pylist(),
    ):
        if float(q) >= min_qty:
            by_part.setdefault(p, set()).add(s)
    edges = set()
    for sup in by_part.values():
        ss = sorted(sup)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                edges.add((ss[i], ss[j]))
    return edges


def test_link_prediction_matches_python_wedges(spark, sf_dir):
    from metadata_extractors_api_spark.operators.corpus import (
        LP_MIN_QTY,
        LP_TOP,
    )

    edges = _co_supply_edges(sf_dir, LP_MIN_QTY)
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    scores = []
    nodes = sorted(adj)
    # brute force: every non-adjacent pair with >=1 common neighbor
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if (a, b) in edges:
                continue
            cn = len(adj[a] & adj[b])
            if cn:
                jac = cn * 10**6 // (len(adj[a]) + len(adj[b]) - cn)
                scores.append((-cn, -jac, a, b))
    want = [
        (a, b, -ncn, -njac)
        for ncn, njac, a, b in sorted(scores)[:LP_TOP]
    ]
    got = [
        (r["s1"], r["s2"], r["cn"], r["jaccard_e6"])
        for r in mdx.QUERIES["graph_link_prediction"](spark, sf_dir).collect()
    ]
    assert got == want


def test_bfs_landmarks_matches_python_bfs(spark, sf_dir):
    from collections import deque

    from metadata_extractors_api_spark.operators.corpus import (
        BFS_LANDMARKS,
        BFS_ROUNDS,
        LP_MIN_QTY,
    )

    edges = _co_supply_edges(sf_dir, LP_MIN_QTY)
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {}
    dq = deque()
    for s in BFS_LANDMARKS:
        if s in adj:
            dist[s] = 0
            dq.append(s)
    while dq:
        u = dq.popleft()
        if dist[u] >= BFS_ROUNDS:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    hist = {}
    for d in dist.values():
        hist[d] = hist.get(d, 0) + 1
    n_unreached = len(adj) - len(dist)
    n_changed = sum(1 for d in dist.values() if d == BFS_ROUNDS)

    rows = mdx.QUERIES["graph_bfs_landmarks"](spark, sf_dir).collect()
    got_hist = {r["dist"]: r["n_at_dist"] for r in rows}
    assert got_hist == hist
    assert all(r["n_unreached"] == n_unreached for r in rows)
    assert all(r["n_changed"] == n_changed for r in rows)


# --- embedding_random_projection ----------------------------------------------


def test_random_projection_matches_numpy(spark, sf_dir):
    from metadata_extractors_api_spark.operators.pipeline import (
        RP_OUT,
        RP_SCALE,
        RP_SIGNS,
    )

    embs = _embs(sf_dir)
    S = np.array(RP_SIGNS, dtype=object)  # RP_OUT x 64, exact ints
    rows = mdx.QUERIES["embedding_random_projection"](spark, sf_dir).collect()
    assert len(rows) == len(embs)
    for r in rows[:50]:
        x = embs[r["vec_id"]]
        xs = np.array([math.floor(float(v) * RP_SCALE) for v in x], dtype=object)
        p = S @ xs
        assert [r[f"p{j}"] for j in range(RP_OUT)] == list(p)
        norm_in = int(xs @ xs)
        norm_out = int(p @ p)
        assert r["norm_in"] == norm_in and r["norm_out"] == norm_out
        want_ratio = (norm_out // (1 << 20)) * 10**6 // (RP_OUT * (norm_in // (1 << 20)))
        assert r["jl_ratio_e6"] == want_ratio
    # JL sanity: a single 8-dim projection has chi-square(8) spread, so
    # individual ratios roam widely — but the MEAN over vectors must
    # concentrate near 1e6 (E[y_j^2] = ||x||^2 for ±1 signs)
    mean_ratio = sum(r["jl_ratio_e6"] for r in rows) / len(rows)
    assert 800_000 < mean_ratio < 1_200_000


# --- tokenizer_unigram_em_step -------------------------------------------------


def test_unigram_em_step_matches_python_recount(spark, tmp_path_factory):
    """Hand corpus: python trains the merges, runs the position-DP
    Viterbi per word (same tuple compare as the round-8 test), then the
    hard-EM recount — explode winning paths weighted by word count —
    and the top-EM_TOP report must match exactly."""
    import collections

    from metadata_extractors_api_spark.operators.corpus import (
        BPE_MARKER,
        BPE_TRAIN_ROUNDS,
        EM_TOP,
        WP_MAX_CHARS,
        WP_MAXP,
    )
    from tests.test_round7_ops import _py_bpe_train

    docs = [
        "ab abc ab abc ab",
        "abx aby abz abc ab",
        "ba bab bba ab abc",
        "ccc ccc ccc c cc",
    ]
    d = str(tmp_path_factory.mktemp("emcorpus"))
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    ).write.parquet(f"{d}/documents.parquet")

    wc = collections.Counter(w for t in docs for w in t.split(" ") if w)
    merges = _py_bpe_train(dict(wc), BPE_TRAIN_ROUNDS)
    syms = {w: " " + " ".join(list(BPE_MARKER + w)) + " " for w in wc}
    for _k, a, b, _n in merges:
        for w in syms:
            syms[w] = syms[w].replace(f" {a} {b} ", f" {a}{b} ")
    weight = collections.Counter()
    for w, s in syms.items():
        for p in s.split():
            if len(p) <= WP_MAXP:
                weight[p] += wc[w]
    chars = {c for w in wc if len(w) <= WP_MAX_CHARS for c in BPE_MARKER + w}
    vocab = dict(weight)
    for c in chars:
        vocab.setdefault(c, 0)

    def viterbi(word):
        padded = BPE_MARKER + word
        best = {1: (0, 0, "")}
        for pos in range(1, len(padded) + 1):
            if pos not in best:
                continue
            sc, np_, path = best[pos]
            for ln in range(1, min(WP_MAXP, len(padded) - pos + 1) + 1):
                piece = padded[pos - 1 : pos - 1 + ln]
                if piece not in vocab:
                    continue
                cand = (
                    sc + vocab[piece],
                    np_ + 1,
                    piece if not path else f"{path} {piece}",
                )
                tgt = pos + ln
                cur = best.get(tgt)
                if cur is None or (-cand[0], cand[1], cand[2]) < (
                    -cur[0],
                    cur[1],
                    cur[2],
                ):
                    best[tgt] = cand
        return best[len(padded) + 1]

    new_mass = collections.Counter()
    for w, n in wc.items():
        if len(w) > WP_MAX_CHARS:
            continue
        _sc, _np, path = viterbi(w)
        for p in path.split(" "):
            if p:
                new_mass[p] += n
    ranked = sorted(new_mass.items(), key=lambda kv: (-kv[1], kv[0]))[:EM_TOP]
    want = [
        (sym, vocab.get(sym, 0), m, m - vocab.get(sym, 0), i + 1)
        for i, (sym, m) in enumerate(ranked)
    ]
    got = [
        (r["symbol"], r["old_weight"], r["new_mass"], r["delta"], r["rk"])
        for r in mdx.QUERIES["tokenizer_unigram_em_step"](spark, d)
        .orderBy("rk")
        .collect()
    ]
    assert got == want


# --- timeseries_ohlc_bars / trend_theil_sen ------------------------------------


def _orders(sf_dir):
    t = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
    )
    out = []
    for k, d, p in zip(
        t["o_orderkey"].to_pylist(),
        t["o_orderdate"].to_pylist(),
        t["o_totalprice"].to_pylist(),
    ):
        epoch_us = int(d.timestamp() * 1e6) if hasattr(d, "timestamp") else None
        # timestamps are tz-naive; compute epoch days from the date parts
        import datetime

        day = (d.date() - datetime.date(1970, 1, 1)).days
        out.append((int(k), day, round(float(p) * 100)))
    return out


def test_ohlc_bars_match_python_fold(spark, sf_dir):
    rows = _orders(sf_dir)
    bars = {}
    for k, day, cents in rows:
        b = bars.setdefault(day // 7, [])
        b.append((day, k, cents))
    want = {}
    for bar, pts in bars.items():
        pts.sort()
        want[bar] = (
            pts[0][2],
            max(c for _, _, c in pts),
            min(c for _, _, c in pts),
            pts[-1][2],
            len(pts),
            sum(c for _, _, c in pts),
        )
    got = {
        r["bar"]: (
            r["open_cents"],
            r["high_cents"],
            r["low_cents"],
            r["close_cents"],
            r["n_orders"],
            r["volume_cents"],
        )
        for r in mdx.QUERIES["timeseries_ohlc_bars"](spark, sf_dir).collect()
    }
    assert got == want


def test_theil_sen_matches_python_median_of_slopes(spark, sf_dir):
    from fractions import Fraction

    rows = _orders(sf_dir)
    monthly = {}
    # month grain = epoch_us div 2592000000000 = epoch_day*86400e6 div 2592e9
    for _, day, _ in rows:
        m = (day * 86400 * 10**6) // 2592000000000
        monthly[m] = monthly.get(m, 0) + 1
    ms = sorted(monthly)
    slopes = []
    for i, m1 in enumerate(ms):
        for m2 in ms[i + 1 :]:
            slopes.append(
                (Fraction(monthly[m2] - monthly[m1], m2 - m1), m1, m2)
            )
    slopes.sort()
    n = len(slopes)
    med = slopes[(n + 1) // 2 - 1]
    r = mdx.QUERIES["trend_theil_sen"](spark, sf_dir).collect()
    assert len(r) == 1
    got = r[0]
    assert got["n_pairs"] == n
    assert Fraction(got["slope_num"], got["slope_den"]) == med[0]


# --- graph_ppr -----------------------------------------------------------------


def test_ppr_matches_python_power_iteration(spark, sf_dir):
    """Integer power iteration replayed in plain Python over the
    nation trade graph built with dict joins (not SQL)."""
    from metadata_extractors_api_spark.operators.pipeline import (
        PPR_SEEDS,
        PR_BASE,
        PR_ITERS,
        PR_SCALE,
    )

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    o2c = dict(zip(orders["o_orderkey"].to_pylist(), orders["o_custkey"].to_pylist()))
    c2n = dict(zip(cust["c_custkey"].to_pylist(), cust["c_nationkey"].to_pylist()))
    s2n = dict(zip(supp["s_suppkey"].to_pylist(), supp["s_nationkey"].to_pylist()))
    edges = {
        (c2n[o2c[ok]], s2n[sk])
        for ok, sk in zip(
            li["l_orderkey"].to_pylist(), li["l_suppkey"].to_pylist()
        )
    }
    nodes = sorted(nation["n_nationkey"].to_pylist())
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    seeds = set(PPR_SEEDS)
    rank = {n: (PR_SCALE if n in seeds else 0) for n in nodes}
    prev = dict(rank)
    for _ in range(PR_ITERS):
        contrib = {n: 0 for n in nodes}
        for s, t in edges:
            contrib[t] += (85 * (rank[s] // deg[s])) // 100
        prev = dict(rank)
        rank = {
            n: (PR_BASE if n in seeds else 0) + contrib[n] for n in nodes
        }
    residual = sum(abs(rank[n] - prev[n]) for n in nodes)

    rows = mdx.QUERIES["graph_ppr"](spark, sf_dir).collect()
    got = {r["node"]: (r["rank_units"], r["is_seed"], r["residual_units"]) for r in rows}
    want = {n: (rank[n], n in seeds, residual) for n in nodes}
    assert got == want
    # personalization sanity: total mass concentrates on/near seeds —
    # every seed outranks the global minimum
    mn = min(rank.values())
    assert all(rank[s] > mn for s in seeds if s in rank)


def test_semantic_apply_census_consistent_with_cluster_verdicts(spark, sf_dir):
    """The apply census re-derived from the detect operator's own rows
    (collected independently), plus invariants: kept+pruned+quarantined
    == members, and at least one cluster actually pruned something."""
    det = mdx.QUERIES["dedup_semantic_cluster"](spark, sf_dir).collect()
    embs_lab = {
        int(i): int(l)
        for i, l in zip(
            pq.read_table(f"{sf_dir}/embeddings.parquet")["vec_id"].to_pylist(),
            pq.read_table(f"{sf_dir}/embeddings.parquet")["label"].to_pylist(),
        )
    }
    want = {}
    for r in det:
        c = want.setdefault(r["cluster"], [0, 0, 0, 0, 0])
        c[0] += 1
        if r["action"] == "keep":
            c[1] += 1
            c[4] += embs_lab[r["vec_id"]]
        elif r["action"] == "prune":
            c[2] += 1
        else:
            c[3] += 1
    got = {
        r["cluster"]: [
            r["n_members"],
            r["n_kept"],
            r["n_pruned"],
            r["n_quarantined"],
            r["kept_label_mass"],
        ]
        for r in mdx.QUERIES["dedup_semantic_apply"](spark, sf_dir).collect()
    }
    assert got == want
    assert all(v[1] + v[2] + v[3] == v[0] for v in got.values())
    assert any(v[2] > 0 for v in got.values()), "prune phase was vacuous"


# --- orders_supplier_hhi / scan_fixed_width -------------------------------------


def test_hhi_matches_python_shares(spark, sf_dir):
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_extendedprice"]
    )
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    s2n = dict(zip(supp["s_suppkey"].to_pylist(), supp["s_nationkey"].to_pylist()))
    names = dict(zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist()))
    rev = {}
    for sk, p in zip(li["l_suppkey"].to_pylist(), li["l_extendedprice"].to_pylist()):
        key = (s2n[sk], sk)
        # mirror the operator's whole-dollar HALF_UP rounding (python's
        # round() is banker's — floor(x+0.5) matches Spark/DuckDB here)
        rev[key] = rev.get(key, 0) + math.floor(float(p) + 0.5)
    by_nation = {}
    for (n, _s), r in rev.items():
        e = by_nation.setdefault(n, [0, 0, 0, 0])  # t, sum_sq, n, top
        e[0] += r
        e[1] += r * r
        e[2] += 1
        e[3] = max(e[3], r)
    want = {
        names[n]: (e[2], round(e[1] / (e[0] * e[0]), 6), round(e[3] / e[0], 6))
        for n, e in by_nation.items()
    }
    got = {
        r["nation_name"]: (r["n_suppliers"], r["hhi"], r["top_share"])
        for r in mdx.QUERIES["orders_supplier_hhi"](spark, sf_dir).collect()
    }
    assert got == want
    # sanity: HHI lives in [1/n, 1]
    for n, h, _ in got.values():
        assert 1 / n - 1e-9 <= h <= 1.0


def test_fixed_width_roundtrip_is_lossless(spark, sf_dir):
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    want = sorted(
        zip(
            nat["n_nationkey"].to_pylist(),
            nat["n_name"].to_pylist(),
            nat["n_regionkey"].to_pylist(),
        )
    )
    got = sorted(
        (r["n_nationkey"], r["n_name"], r["n_regionkey"])
        for r in mdx.QUERIES["scan_fixed_width"](spark, sf_dir).collect()
    )
    assert got == want


# --- multimodal_audio_frames ----------------------------------------------------


def test_audio_frames_match_python_framing(spark, sf_dir):
    from metadata_extractors_api_spark.operators.llm import (
        AUDIO_FRAME,
        AUDIO_HOP,
    )

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    want = {}
    for d, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        samples = [ord(c) - 64 for c in text]
        n = len(samples)
        nf = (n - AUDIO_FRAME) // AUDIO_HOP + 1 if n >= AUDIO_FRAME else 0
        fe = [
            sum(v * v for v in samples[i * AUDIO_HOP : i * AUDIO_HOP + AUDIO_FRAME])
            for i in range(nf)
        ]
        want[d] = (
            n,
            nf,
            sum(fe),
            max(fe) if fe else -1,
            fe.index(max(fe)) + 1 if fe else 0,
        )
    got = {
        r["doc_id"]: (
            r["n_samples"],
            r["n_frames"],
            r["total_energy"],
            r["max_frame_energy"],
            r["argmax_frame"],
        )
        for r in mdx.QUERIES["multimodal_audio_frames"](spark, sf_dir).collect()
    }
    assert got == want


# --- stream_pattern_funnel automaton ------------------------------------------


def test_funnel_automaton_equals_regex_exhaustive():
    """The constant-size funnel automaton vs Python's re engine,
    exhaustively over every code string of length <= 6 on the event
    alphabet (19,531 strings) — the independent differential for the
    round-9 state-bounding rewrite (search semantics, absorbing match,
    [^pe]* span survival)."""
    import itertools
    import re

    from metadata_extractors_api_spark.operators.extended import (
        FUNNEL_PATTERN,
    )
    from metadata_extractors_api_spark.streaming.windows import (
        _funnel_automaton_step,
    )

    pat = re.compile(FUNNEL_PATTERN)
    for n in range(7):
        for tup in itertools.product("svcpe", repeat=n):
            mask, matched = 0, False
            for ch in tup:
                mask, matched = _funnel_automaton_step(mask, matched, ch)
            s = "".join(tup)
            assert matched == bool(pat.search(s)), s


# --- decode_wav / multimodal_audio_frames -------------------------------------


def test_decode_wav_reads_stdlib_wave_output():
    """decode_wav vs Python's stdlib `wave` writer — a fully
    independent RIFF/WAV encoder (not _wav_payload): samples written
    through wave.open must round-trip bit-exactly, including rate."""
    import io
    import wave

    from metadata_extractors_api_spark.operators.llm import decode_wav

    samples = np.array([0, 1, -1, 32767, -32768, 64, -513], dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(samples.tobytes())
    dec = decode_wav(buf.getvalue())
    assert dec["rate"] == 44100
    assert np.array_equal(dec["samples"], samples)


def test_decode_wav_failure_classes():
    import struct

    from metadata_extractors_api_spark.operators.llm import (
        _wav_payload,
        decode_wav,
    )

    good = _wav_payload("hello world tokens")
    assert len(decode_wav(good)["samples"]) == len("hello world tokens")
    # wrong container magic
    try:
        decode_wav(b"FORM" + good[4:])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert str(e).startswith("unsupported container")
    # truncated data chunk
    try:
        decode_wav(good[:-3])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert str(e).startswith("truncated WAV data")
    # stereo rejected
    stereo = (
        good[:20]
        + struct.pack("<HH", 1, 2)
        + good[24:]
    )
    try:
        decode_wav(stereo)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert str(e).startswith("only PCM16 mono")


def test_audio_frames_match_naive_python(spark, sf_dir):
    """Framing/energy replayed with a naive per-frame loop over the
    raw code points (no prefix sums, no WAV round-trip), vs the
    registered decode-then-frame query."""
    from metadata_extractors_api_spark.operators.llm import (
        AUDIO_FRAME,
        AUDIO_HOP,
    )

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    want = {}
    for d, text in texts.items():
        s = [ord(c) - 64 for c in text]
        fes = []
        i = 0
        while i + AUDIO_FRAME <= len(s):
            fes.append(sum(v * v for v in s[i : i + AUDIO_FRAME]))
            i += AUDIO_HOP
        want[d] = (
            len(s),
            len(fes),
            sum(fes),
            max(fes) if fes else -1,
            fes.index(max(fes)) + 1 if fes else 0,
        )
    got = {
        r["doc_id"]: (
            r["n_samples"],
            r["n_frames"],
            r["total_energy"],
            r["max_frame_energy"],
            r["argmax_frame"],
        )
        for r in mdx.QUERIES["multimodal_audio_frames"](
            spark, sf_dir
        ).collect()
    }
    assert got == want


# --- sim_hybrid_rrf_ann --------------------------------------------------------


def test_rrf_ann_fusion_matches_python_ivf_replay(spark, sf_dir):
    """The ANN-backed hybrid: numpy exact-int Lloyd (kmeans_train's
    fixed K), probe the query's IVF_TRAINED_NPROBE nearest clusters,
    cosine-rank ONLY the probed members, fuse with the same lexical
    list — all replayed independently in plain Python."""
    from fractions import Fraction

    from metadata_extractors_api_spark.operators.llm import (
        RRF_K,
        RRF_POOL,
        RRF_TERMS,
    )
    from metadata_extractors_api_spark.operators.pipeline import (
        IVF_TRAINED_NPROBE,
        KM_ITERS,
        KM_K,
        KM_SCALE,
    )

    docs = _docs(sf_dir)
    n_docs = len(docs)
    df = {t: sum(1 for tk in docs.values() if t in tk) for t in RRF_TERMS}
    lex_scores = {}
    for d, tk in docs.items():
        s = sum(
            Fraction(tk.count(t) * n_docs, df[t]) for t in RRF_TERMS if df[t]
        )
        if s > 0:
            lex_scores[d] = s
    lex_order = sorted(lex_scores, key=lambda d: (-lex_scores[d], d))[:RRF_POOL]
    lex_rank = {d: i + 1 for i, d in enumerate(lex_order)}

    embs = _embs(sf_dir)
    ids = sorted(embs)
    X = np.array(
        [[math.floor(float(x) * KM_SCALE) for x in embs[i]] for i in ids],
        dtype=object,
    )
    cent = {c: X[ids.index(c + 1)].copy() for c in range(KM_K)}

    def assign():
        return {
            i: min(
                range(KM_K),
                key=lambda c: (int(sum((X[r] - cent[c]) ** 2)), c),
            )
            for r, i in enumerate(ids)
        }

    for _ in range(KM_ITERS):
        a = assign()
        for c in range(KM_K):
            rows = [X[ids.index(i)] for i in ids if a[i] == c]
            if rows:
                s = np.sum(rows, axis=0)
                cent[c] = np.array(
                    [int(v) // len(rows) for v in s], dtype=object
                )
    a = assign()
    # probe: the query vector's nearest IVF_TRAINED_NPROBE clusters
    q_row = ids.index(0)
    probe = sorted(
        range(KM_K),
        key=lambda c: (int(sum((X[q_row] - cent[c]) ** 2)), c),
    )[:IVF_TRAINED_NPROBE]
    q = embs[0]
    cand = [v for v in ids if a[v] in probe]
    cos = {v: _cos(embs[v], q) for v in cand}
    vec_order = sorted(cand, key=lambda v: (-cos[v], v))[:RRF_POOL]
    vec_rank = {v: i + 1 for i, v in enumerate(vec_order)}

    fused = {}
    for d, r in lex_rank.items():
        fused[d] = fused.get(d, 0) + 10**9 // (RRF_K + r)
    for v, r in vec_rank.items():
        fused[v] = fused.get(v, 0) + 10**9 // (RRF_K + r)
    want = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    got = [
        (r["doc_id"], r["rrf_e9"])
        for r in mdx.QUERIES["sim_hybrid_rrf_ann"](spark, sf_dir).collect()
    ]
    assert sorted(got) == sorted(want)


# --- tokenizer_unigram_em_train ------------------------------------------------


def test_unigram_em_train_matches_python_loop(spark, tmp_path_factory):
    """The full unrolled hard-EM loop replayed in plain Python on a
    hand corpus: BPE-weighted init vocab, EM_TRAIN_ROUNDS alternations
    of position-DP Viterbi (tuple compare: score desc, fewest pieces,
    lexicographic) and mass recount (multi-char pieces die when unused,
    chars persist), with the L1 residual per round."""
    import collections

    from metadata_extractors_api_spark.operators.corpus import (
        BPE_MARKER,
        BPE_TRAIN_ROUNDS,
        EM_TOP,
        EM_TRAIN_ROUNDS,
        WP_MAX_CHARS,
        WP_MAXP,
    )
    from tests.test_round7_ops import _py_bpe_train

    docs = [
        "ab abc ab abc ab",
        "abx aby abz abc ab",
        "ba bab bba ab abc",
        "ccc ccc ccc c cc",
        "abcab abcab cabc",
    ]
    d = str(tmp_path_factory.mktemp("emcorpus"))
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    ).write.parquet(f"{d}/documents.parquet")

    wc = collections.Counter(w for t in docs for w in t.split(" ") if w)
    merges = _py_bpe_train(dict(wc), BPE_TRAIN_ROUNDS)
    syms = {w: " " + " ".join(list(BPE_MARKER + w)) + " " for w in wc}
    for _k, a, b, _n in merges:
        for w in syms:
            syms[w] = syms[w].replace(f" {a} {b} ", f" {a}{b} ")
    weight = collections.Counter()
    for w, s in syms.items():
        for p in s.split():
            if len(p) <= WP_MAXP:
                weight[p] += wc[w]
    chars = {c for w in wc if len(w) <= WP_MAX_CHARS for c in BPE_MARKER + w}
    vocab = dict(weight)
    for c in chars:
        vocab.setdefault(c, 0)

    def viterbi(word, voc):
        padded = BPE_MARKER + word
        best = {1: (0, 0, "")}
        for pos in range(1, len(padded) + 1):
            if pos not in best:
                continue
            sc, np_, path = best[pos]
            for ln in range(1, min(WP_MAXP, len(padded) - pos + 1) + 1):
                piece = padded[pos - 1 : pos - 1 + ln]
                if piece not in voc:
                    continue
                cand = (
                    sc + voc[piece],
                    np_ + 1,
                    piece if not path else f"{path} {piece}",
                )
                tgt = pos + ln
                cur = best.get(tgt)
                if cur is None or (-cand[0], cand[1], cand[2]) < (
                    -cur[0],
                    cur[1],
                    cur[2],
                ):
                    best[tgt] = cand
        return best[len(padded) + 1]

    residuals = []
    cur = vocab
    for _round in range(EM_TRAIN_ROUNDS):
        counts = collections.Counter()
        for w, n in wc.items():
            if len(w) > WP_MAX_CHARS:
                continue
            _sc, _np, path = viterbi(w, cur)
            for p in path.split(" "):
                if p:
                    counts[p] += n
        new = {s: m for s, m in counts.items() if len(s) > 1}
        for c in chars:
            new[c] = counts.get(c, 0)
        residuals.append(
            sum(
                abs(new.get(s, 0) - cur.get(s, 0))
                for s in set(new) | set(cur)
            )
        )
        cur = new
    ranked = sorted(cur.items(), key=lambda kv: (-kv[1], kv[0]))[:EM_TOP]
    want = [
        (s, m, i + 1, residuals[0], residuals[1])
        for i, (s, m) in enumerate(ranked)
    ]
    got = [
        (r["symbol"], r["mass"], r["rk"], r["res1_units"], r["res2_units"])
        for r in mdx.QUERIES["tokenizer_unigram_em_train"](spark, d).collect()
    ]
    assert sorted(got) == sorted(want)


# --- multimodal_audio_silence_split / multimodal_audio_fingerprint -------------


def _naive_frame_energies(text, frame, hop):
    s = [ord(c) - 64 for c in text]
    fes, i = [], 0
    while i + frame <= len(s):
        fes.append(sum(v * v for v in s[i : i + frame]))
        i += hop
    return fes


def test_audio_silence_split_matches_naive_islands(spark, sf_dir):
    """Segments recomputed with a naive linear scan (no windows, no
    islands transform): walk the frame energies, open a segment on a
    voiced frame, close on an unvoiced one."""
    from metadata_extractors_api_spark.operators.llm import (
        AUDIO_FRAME,
        AUDIO_HOP,
        AUDIO_VOICE_T,
    )

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    want = []
    for d, text in texts.items():
        fes = _naive_frame_energies(text, AUDIO_FRAME, AUDIO_HOP)
        segs, cur = [], None
        for i, e in enumerate(fes):
            if e > AUDIO_VOICE_T:
                if cur is None:
                    cur = [i, 0, 0]
                cur[1] += 1
                cur[2] += e
            elif cur is not None:
                segs.append(cur)
                cur = None
        if cur is not None:
            segs.append(cur)
        for k, (start, ln, en) in enumerate(segs):
            want.append((d, k + 1, start, ln, en))
    got = [
        (r["doc_id"], r["seg_idx"], r["seg_start"], r["seg_len"],
         r["seg_energy"])
        for r in mdx.QUERIES["multimodal_audio_silence_split"](
            spark, sf_dir
        ).collect()
    ]
    assert sorted(got) == sorted(want)


def test_audio_fingerprint_matches_naive_bits(spark, sf_dir):
    from metadata_extractors_api_spark.operators.llm import (
        AUDIO_FP_BITS,
        AUDIO_FRAME,
        AUDIO_HOP,
    )

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    want = {}
    fps = {}
    for d, text in texts.items():
        fes = _naive_frame_energies(text, AUDIO_FRAME, AUDIO_HOP)
        rising = [fes[i + 1] > fes[i] for i in range(len(fes) - 1)]
        fp = sum(1 << i for i, r in enumerate(rising[:AUDIO_FP_BITS]) if r)
        want[d] = (len(fes), fp, sum(rising))
        fps[d] = fp
    from collections import Counter

    buckets = Counter(fps.values())
    got = {
        r["doc_id"]: (
            r["n_frames"], r["fp"], r["n_rising"], r["bucket_size"]
        )
        for r in mdx.QUERIES["multimodal_audio_fingerprint"](
            spark, sf_dir
        ).collect()
    }
    assert got == {
        d: (nf, fp, nr, buckets[fp]) for d, (nf, fp, nr) in want.items()
    }


# --- dedup_semantic_recall_audit ------------------------------------------------


def test_semantic_recall_audit_matches_numpy(spark, sf_dir):
    """Truth and found sets replayed brute-force in numpy: exact
    all-pairs cosine over the audit slice, adaptive-K integer Lloyd
    clustering, found = truth pairs sharing ANY top-2 probe cluster
    whose probe population is under the cap (the production multiprobe
    detect rule the audit now tracks)."""
    from metadata_extractors_api_spark.operators.pipeline import (
        KM_ITERS,
        KM_SCALE,
        SEM_AUDIT_N,
        SEM_CLUSTER_CAP,
        SEM_T,
        SEM_TARGET_CLUSTER,
    )

    embs = _embs(sf_dir)
    ids = sorted(embs)
    km_k = -(-len(ids) // SEM_TARGET_CLUSTER)
    X = np.array(
        [[math.floor(float(x) * KM_SCALE) for x in embs[i]] for i in ids],
        dtype=object,
    )
    cent = {c: X[ids.index(c + 1)].copy() for c in range(km_k)}

    def order(i):
        r = ids.index(i)
        return sorted(
            range(km_k), key=lambda c: (int(sum((X[r] - cent[c]) ** 2)), c)
        )

    for _ in range(KM_ITERS):
        a = {i: order(i)[0] for i in ids}
        for c in range(km_k):
            rows = [X[ids.index(i)] for i in ids if a[i] == c]
            if rows:
                s = np.sum(rows, axis=0)
                cent[c] = np.array(
                    [int(v) // len(rows) for v in s], dtype=object
                )
    top2 = {i: set(order(i)[:2]) for i in ids}
    from collections import Counter

    probe_pop = Counter(c for p in top2.values() for c in p)

    sl = [i for i in ids if i < SEM_AUDIT_N]
    truth = {
        (i, j)
        for ix, i in enumerate(sl)
        for j in sl[ix + 1 :]
        if _cos(embs[i], embs[j]) >= SEM_T
    }
    found = {
        (i, j)
        for (i, j) in truth
        if any(
            probe_pop[c] <= SEM_CLUSTER_CAP for c in top2[i] & top2[j]
        )
    }
    r = mdx.QUERIES["dedup_semantic_recall_audit"](spark, sf_dir).collect()[0]
    assert r["n_truth"] == len(truth)
    assert r["n_found"] == len(found)
    assert r["n_missed"] == len(truth) - len(found)
    assert r["recall_e6"] == len(found) * 10**6 // max(len(truth), 1)


def test_semantic_multiprobe_audit_matches_numpy(spark, sf_dir):
    """Top-2 soft assignment replayed in exact integer numpy; top2
    visibility = any shared cluster among each side's two probes."""
    from metadata_extractors_api_spark.operators.pipeline import (
        KM_ITERS,
        KM_SCALE,
        SEM_AUDIT_N,
        SEM_T,
        SEM_TARGET_CLUSTER,
    )

    embs = _embs(sf_dir)
    ids = sorted(embs)
    km_k = -(-len(ids) // SEM_TARGET_CLUSTER)
    X = np.array(
        [[math.floor(float(x) * KM_SCALE) for x in embs[i]] for i in ids],
        dtype=object,
    )
    cent = {c: X[ids.index(c + 1)].copy() for c in range(km_k)}

    def order(i):
        r = ids.index(i)
        return sorted(
            range(km_k), key=lambda c: (int(sum((X[r] - cent[c]) ** 2)), c)
        )

    for _ in range(KM_ITERS):
        a = {i: order(i)[0] for i in ids}
        for c in range(km_k):
            rows = [X[ids.index(i)] for i in ids if a[i] == c]
            if rows:
                s = np.sum(rows, axis=0)
                cent[c] = np.array(
                    [int(v) // len(rows) for v in s], dtype=object
                )
    top2 = {i: set(order(i)[:2]) for i in ids}
    top1 = {i: order(i)[0] for i in ids}

    sl = [i for i in ids if i < SEM_AUDIT_N]
    truth = {
        (i, j)
        for ix, i in enumerate(sl)
        for j in sl[ix + 1 :]
        if _cos(embs[i], embs[j]) >= SEM_T
    }
    n1 = sum(1 for (i, j) in truth if top1[i] == top1[j])
    n2 = sum(1 for (i, j) in truth if top2[i] & top2[j])
    r = mdx.QUERIES["dedup_semantic_multiprobe_audit"](
        spark, sf_dir
    ).collect()[0]
    assert (r["n_truth"], r["n_top1"], r["n_top2"]) == (len(truth), n1, n2)
    assert r["recall_top1_e6"] == n1 * 10**6 // max(len(truth), 1)
    assert r["recall_top2_e6"] == n2 * 10**6 // max(len(truth), 1)
