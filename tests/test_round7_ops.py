"""Independent ground-truth tests for round-7 operators: plain-Python
or hand-computed answers, deliberately NOT the shared Spark/DuckDB
oracle formulas — when both engines share a formula, the sweep cannot
catch a formula bug (the round-3 review's blind spot, closed per-round
since)."""

from __future__ import annotations

import collections

from metadata_extractors_api_spark.operators.corpus import (
    BPE_MARKER,
    _bpe_train_merges,
)


def _py_bpe_train(word_counts: dict[str, int], rounds: int):
    """Plain-Python BPE trainer, independent of the Spark kernel:
    census via collections.Counter over symbol LISTS (the kernel uses
    zip_with/explode/groupBy), argmax via min() on (-n, 'a b') (the
    kernel uses TakeOrdered), merge application via the padded-string
    literal replace — the spec both engines implement (left-to-right
    non-overlapping; the boundary-space consumption means consecutive
    same-pair runs merge alternately, see tokenizer_bpe_encode's
    docstring)."""
    syms = {
        w: " " + " ".join(list(BPE_MARKER + w)) + " " for w in word_counts
    }
    merges = []
    for k in range(1, rounds + 1):
        census = collections.Counter()
        for w, n in word_counts.items():
            tk = syms[w].split()
            for a, b in zip(tk, tk[1:]):
                census[f"{a} {b}"] += n
        if not census:
            break
        pair, n = min(census.items(), key=lambda kv: (-kv[1], kv[0]))
        a, b = pair.split(" ")
        merges.append((k, a, b, n))
        for w in syms:
            syms[w] = syms[w].replace(f" {a} {b} ", f" {a}{b} ")
    return merges


HAND_CORPUS = {
    # Sennrich-style toy vocabulary: shared suffixes force cascading
    # merges (e+s, es+t, l+o, lo+w ...), and 'aaaa' exercises the
    # alternating same-pair-run semantics.
    "low": 5,
    "lower": 2,
    "newest": 6,
    "widest": 3,
    "aaaa": 4,
    "x": 1,  # single-char word: 2 symbols after marker prefix
}


def test_bpe_train_kernel_matches_python_reference(spark):
    words = spark.createDataFrame(
        list(HAND_CORPUS.items()), "word string, cnt bigint"
    )
    got = _bpe_train_merges(words, 10)
    want = _py_bpe_train(HAND_CORPUS, 10)
    assert got == want
    # sanity on the reference itself: marker+e+s... the first merge
    # must be the highest weighted pair; 'es' appears in newest(6) +
    # widest(3) = 9, 'lo' in low(5) + lower(2) = 7, 'aa' in aaaa
    # contributes 3 adjacent pairs * 4 = 12 -> first merge is (a, a).
    assert (want[0][1], want[0][2], want[0][3]) == ("a", "a", 12)
    # after ' a a ' -> ' aa ' the run '▁ a a a a ' merges ONCE into
    # '▁ aa a a ' (boundary-space consumption), so round 2's
    # (e, s)=9 beats any aa-family pair (<=4).
    assert (want[1][1], want[1][2], want[1][3]) == ("e", "s", 9)


def test_bpe_train_same_pair_run_semantics(spark):
    """The same-pair-run case pinned exactly: ' ▁ a a a a ' under
    merge (a, a) becomes [▁, aa, a, a], NOT [▁, aa, aa] — each
    replace consumes its trailing boundary space, so the scan resumes
    one symbol later and a run of length 4 merges once per pass at
    this position (verified literally: ' ▁ a a a a '.replace(
    ' a a ', ' aa ') == ' ▁ aa a a ')."""
    words = spark.createDataFrame([("aaaa", 1)], "word string, cnt bigint")
    got = _bpe_train_merges(words, 2)
    # round 1: pairs {▁ a:1, a a:3} -> (a, a) wins with 3.
    assert got[0] == (1, "a", "a", 3)
    # round 2 state is ' ▁ aa a a ': pairs {▁ aa:1, aa a:1, a a:1}
    # -> tie at 1; 'a a' is the lexicographic minimum (space < 'a').
    assert got[1] == (2, "a", "a", 1)


def test_bpe_train_pair_exhaustion_stops_early(spark):
    """A vocabulary that fully merges before the round budget: the
    kernel stops instead of emitting phantom rows."""
    words = spark.createDataFrame([("ab", 3)], "word string, cnt bigint")
    got = _bpe_train_merges(words, 10)
    # '▁ a b' -> merges until one symbol: (a,b) or (▁,a) first by
    # tie-break: pairs {▁ a:3, a b:3} -> 'a b' < '▁ a' wins; then
    # {▁ ab:3}; then exhausted at 1 symbol.
    assert got == [(1, "a", "b", 3), (2, "▁", "ab", 3)]
    assert len(got) == 2  # stopped early, no phantom rounds


def test_graph_hits_matches_python_reference(spark, sf_dir):
    """HITS recomputed with plain-Python dict arithmetic (same integer
    max-normalization spec, independent join/agg machinery) from the
    raw parquet edge list."""
    from metadata_extractors_api_spark.operators.corpus import (
        HITS_ITERS,
        HITS_SCALE,
        HITS_TOP,
    )
    import metadata_extractors_api_spark as mdx

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    edges = sorted(
        set(
            (r["o_custkey"], r["l_suppkey"])
            for r in o.join(li, o.o_orderkey == li.l_orderkey).collect()
        )
    )
    hub = {c: HITS_SCALE for c, _ in edges}
    auth = {}
    for _ in range(HITS_ITERS):
        auth = {}
        for c, s in edges:
            auth[s] = auth.get(s, 0) + hub[c]
        amax = max(auth.values())
        auth = {s: v * HITS_SCALE // amax for s, v in auth.items()}
        hub = {}
        for c, s in edges:
            hub[c] = hub.get(c, 0) + auth[s]
        hmax = max(hub.values())
        hub = {c: v * HITS_SCALE // hmax for c, v in hub.items()}

    def top(d):
        return sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))[:HITS_TOP]

    want = [
        ("authority", n, v, i + 1) for i, (n, v) in enumerate(top(auth))
    ] + [("hub", n, v, i + 1) for i, (n, v) in enumerate(top(hub))]
    got = [
        (r["role"], r["node"], r["score_units"], r["rk"])
        for r in mdx.QUERIES["graph_hits"](spark, sf_dir).collect()
    ]
    assert sorted(got) == sorted(want)


def test_mmr_rerank_matches_numpy_reference(spark, sf_dir):
    """MMR recomputed from raw parquet floats with numpy: cosines via
    the same floor-scaled integer dot spec, then an independent greedy
    loop. Also asserts the diversity property that makes MMR MMR: the
    selection is NOT simply the top-MMR_K by query similarity unless
    the pool is degenerate."""
    import numpy as np

    import metadata_extractors_api_spark as mdx
    from metadata_extractors_api_spark.operators.llm import (
        MMR_CAND,
        MMR_K,
    )

    rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}

    def dot_scaled(a, b):
        return int(np.floor(a * b * 1e12).sum())

    def cos_e6(a, b):
        c = (dot_scaled(a, b) / 1e12) / (
            np.sqrt(dot_scaled(a, a) / 1e12) * np.sqrt(dot_scaled(b, b) / 1e12)
        )
        return int(np.round(np.round(c, 6) * 1e6))

    q = vecs[0]
    simq = {vid: cos_e6(v, q) for vid, v in vecs.items()}
    cand = sorted(simq, key=lambda v: (-simq[v], v))[:MMR_CAND]
    selected = [min(cand, key=lambda v: (-simq[v], v))]
    trace = [(1, selected[0], simq[selected[0]], 10 * simq[selected[0]])]
    for k in range(2, MMR_K + 1):
        best = None
        for v in cand:
            if v in selected:
                continue
            pen = max(cos_e6(vecs[v], vecs[s]) for s in selected)
            score = 7 * simq[v] - 3 * pen
            if best is None or (-score, v) < best[0]:
                best = ((-score, v), v, simq[v], score)
        trace.append((k, best[1], best[2], best[3]))
        selected.append(best[1])

    got = [
        (r["rk"], r["vec_id"], r["simq_e6"], r["mmr10_e6"])
        for r in mdx.QUERIES["sim_mmr_rerank"](spark, sf_dir).collect()
    ]
    assert sorted(got) == sorted(trace)
    # diversity property: selection order diverges from pure top-k
    topk = sorted(cand, key=lambda v: (-simq[v], v))[:MMR_K]
    assert [t[1] for t in trace] != topk


def test_mix_domain_reweight_matches_python_reference(spark, sf_dir):
    """Multiplicative-weights chain recomputed with plain-Python dict
    arithmetic from the raw parquet, plus the monotonicity property:
    domains with larger excess signal must end with weight >= the
    uniform start, and weights must sum to ~1e6 (floor-division
    shortfall < n_src units)."""
    import metadata_extractors_api_spark as mdx
    from metadata_extractors_api_spark.operators.training import (
        REWEIGHT_ETA_E6,
        REWEIGHT_STEPS,
    )

    rows = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    stats = {}
    for r in rows:
        toks = len(r["text"].split(" "))
        n, t = stats.get(r["source"], (0, 0))
        stats[r["source"]] = (n + 1, t + toks)
    docs_all = sum(n for n, _ in stats.values())
    toks_all = sum(t for _, t in stats.values())
    corpus_mean = toks_all * 1_000_000 // docs_all
    excess = {
        s: max(t * 1_000_000 // n - corpus_mean, 0)
        for s, (n, t) in stats.items()
    }
    emax = max(max(excess.values()), 1)
    excess_n = {s: e * 1_000_000 // emax for s, e in excess.items()}
    w = {s: 1_000_000 // len(stats) for s in stats}
    for _ in range(REWEIGHT_STEPS):
        u = {
            s: w[s] * (1_000_000 + REWEIGHT_ETA_E6 * excess_n[s] // 1_000_000) // 1000
            for s in stats
        }
        z = sum(u.values())
        w = {s: u[s] * 1_000_000 // z for s in stats}

    got = {
        r["source"]: (r["n_docs"], r["toks"], r["excess_n_e6"], r["w_final_e6"])
        for r in mdx.QUERIES["mix_domain_reweight"](spark, sf_dir).collect()
    }
    for s, (n, t) in stats.items():
        assert got[s] == (n, t, excess_n[s], w[s]), s
    total = sum(v[3] for v in got.values())
    assert 1_000_000 - len(stats) < total <= 1_000_000
    uniform = 1_000_000 // len(stats)
    top = max(stats, key=lambda s: excess_n[s])
    assert got[top][3] >= uniform


def test_textrank_matches_python_reference(spark, sf_dir):
    """TextRank recomputed with plain-Python dicts from the raw
    parquet: adjacency census, weighted degrees, and the damped
    integer iteration — independent of the Spark join/agg machinery."""
    import metadata_extractors_api_spark as mdx
    from metadata_extractors_api_spark.operators.corpus import (
        TR_BASE,
        TR_ITERS,
        TR_SCALE,
        TR_TOP,
    )

    rows = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    w = {}
    for r in rows:
        tk = r["text"].split(" ")
        for a, b in zip(tk, tk[1:]):
            if a == b:
                continue
            u, v = min(a, b), max(a, b)
            w[(u, v)] = w.get((u, v), 0) + 1
    edges = [(u, v, c) for (u, v), c in w.items()] + [
        (v, u, c) for (u, v), c in w.items()
    ]
    wd = {}
    for s, _, c in edges:
        wd[s] = wd.get(s, 0) + c
    rank = {n: TR_SCALE for n in wd}
    for _ in range(TR_ITERS):
        contrib = {}
        for s, d, c in edges:
            contrib[d] = contrib.get(d, 0) + (85 * ((rank[s] * c) // wd[s])) // 100
        rank = {n: TR_BASE + contrib.get(n, 0) for n in wd}
    want = [
        (n, r, i + 1)
        for i, (n, r) in enumerate(
            sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))[:TR_TOP]
        )
    ]
    got = [
        (r["token"], r["rank_units"], r["rk"])
        for r in mdx.QUERIES["text_keyphrase_textrank"](spark, sf_dir).collect()
    ]
    assert sorted(got) == sorted(want)


def test_changepoint_matches_numpy_sse_argmax(spark, sf_dir):
    """The chosen split recomputed from the SSE DEFINITION with numpy:
    for every candidate split of the daily-count series, compute
    SSE_total - (SSE_left + SSE_right) in floats and check the
    operator's integer-argmax day maximizes it (and the reported
    means/gain match the direct construction)."""
    import numpy as np

    import metadata_extractors_api_spark as mdx

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("ts").collect()
    days = {}
    for r in ev:
        d = int(r["ts"].timestamp() * 1e6) // 86_400_000_000
        days[d] = days.get(d, 0) + 1
    ds = sorted(days)
    cnt = np.array([days[d] for d in ds], dtype=np.float64)
    n = len(cnt)

    def sse(x):
        return float(((x - x.mean()) ** 2).sum()) if len(x) else 0.0

    total = sse(cnt)
    gains = [total - sse(cnt[: i + 1]) - sse(cnt[i + 1 :]) for i in range(n - 1)]
    best = int(np.argmax(gains))

    row = mdx.QUERIES["events_changepoint_binary"](spark, sf_dir).collect()[0]
    assert row["split_day"] == ds[best]
    assert row["n_left"] == best + 1
    assert row["n_right"] == n - best - 1
    s1 = int(cnt[: best + 1].sum())
    s2 = int(cnt[best + 1 :].sum())
    assert row["mean_left_e6"] == s1 * 1_000_000 // (best + 1)
    assert row["mean_right_e6"] == s2 * 1_000_000 // (n - best - 1)
    # the e6 gain agrees with the float SSE reduction to quantization
    assert abs(row["gain_e6"] / 1e6 - gains[best]) < 1e-3


def test_cms_invariant_and_python_reference(spark, sf_dir):
    """The CMS one-sided error invariant (est >= true for EVERY
    reported key) plus a full plain-Python sketch replay from raw
    parquet counts."""
    import hashlib

    import metadata_extractors_api_spark as mdx
    from metadata_extractors_api_spark.operators.stats import CMS_D, CMS_W

    rows = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_custkey").collect()
    true = {}
    for r in rows:
        k = str(r["o_custkey"])
        true[k] = true.get(k, 0) + 1

    def bucket(d, key):
        return int(hashlib.md5(f"cms{d}:{key}".encode()).hexdigest()[:8], 16) % CMS_W

    sketch = [[0] * CMS_W for _ in range(CMS_D)]
    for k, c in true.items():
        for d in range(CMS_D):
            sketch[d][bucket(d, k)] += c
    top = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    want = {
        k: (c, min(sketch[d][bucket(d, k)] for d in range(CMS_D)))
        for k, c in top
    }
    got = {
        r["key"]: (r["true_cnt"], r["est_cnt"], r["overest"])
        for r in mdx.QUERIES["agg_cms_heavy_hitters"](spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for k, (tc, ec, ov) in got.items():
        assert (tc, ec) == want[k]
        assert ov == ec - tc
        assert ov >= 0  # the CMS invariant


def test_hll_python_reference_and_error_bound(spark, sf_dir):
    """Portable-HLL registers replayed in plain Python from raw
    parquet; the estimate must also land within 3 standard errors
    (1.04/sqrt(m)) of the exact distinct — the HLL accuracy contract."""
    import hashlib

    import metadata_extractors_api_spark as mdx
    from metadata_extractors_api_spark.operators.stats import HLL_LC_LUT, HLL_M

    rows = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_custkey").collect()
    keys = {str(r["o_custkey"]) for r in rows}
    regs = {}
    for k in keys:
        hv = int(hashlib.md5(f"hll:{k}".encode()).hexdigest()[:15], 16)
        b, rest = hv % HLL_M, hv // HLL_M
        mj = 53 if rest == 0 else 52 - rest.bit_length() + 1
        regs[b] = max(regs.get(b, 0), mj)
    sum_scaled = sum(
        2 ** max(50 - regs[b], 0) if b in regs else 2**50 for b in range(HLL_M)
    )
    est = round(718272.0 * HLL_M * HLL_M * float(2**50) / (1e6 * float(sum_scaled)))
    empty = HLL_M - len(regs)
    if est <= HLL_M * 5 // 2 and empty > 0:
        est = HLL_LC_LUT[empty - 1]  # linear-counting small-range branch

    row = mdx.QUERIES["agg_hll_distinct"](spark, sf_dir).collect()[0]
    assert row["n_exact"] == len(keys)
    assert row["n_filled"] == len(regs)
    assert row["sum_scaled"] == sum_scaled
    assert row["est"] == est
    rel_err = abs(row["est"] - len(keys)) / len(keys)
    assert rel_err < 3 * 1.04 / (HLL_M ** 0.5), rel_err


def test_wilson_matches_python_reference(spark, sf_dir):
    """Wilson lower bounds recomputed in plain Python (math.sqrt, same
    z) from raw parquet joins, plus the ordering property: the bound
    must never exceed the point estimate."""
    import math

    import metadata_extractors_api_spark as mdx

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_returnflag"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    rows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .select("n_name", "l_returnflag")
        .collect()
    )
    agg = {}
    for r in rows:
        nn, k = agg.get(r["n_name"], (0, 0))
        agg[r["n_name"]] = (nn + 1, k + (r["l_returnflag"] == "R"))

    got = {
        r["n_name"]: r
        for r in mdx.QUERIES["orders_return_rate_wilson"](spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    for name, (nn, k) in agg.items():
        p = k / nn
        lb = (
            p
            + 3.8416 / (2.0 * nn)
            - 1.96 * math.sqrt((p * (1.0 - p) + 3.8416 / (4.0 * nn)) / nn)
        ) / (1.0 + 3.8416 / nn)
        r = got[name]
        assert r["n"] == nn and r["k"] == k
        assert r["rate_e6"] == k * 1_000_000 // nn
        assert abs(r["wilson_lb_e6"] - round(lb * 1e6)) <= 1, name
        assert r["wilson_lb_e6"] <= r["rate_e6"]  # bound below estimate


def test_funnel_time_bound_python_replay(spark, sf_dir):
    """Greedy first-touch funnel replayed in plain Python per user
    from the raw events parquet."""
    import metadata_extractors_api_spark as mdx
    from metadata_extractors_api_spark.operators.extended import (
        FUNNEL_GAP_US,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_type", "ts"
    ).collect()
    per_user = {}
    for r in ev:
        per_user.setdefault(r["user_id"], []).append(
            (int(r["ts"].timestamp() * 1e6), r["event_type"][0])
        )
    want = {}
    for uid, evs in per_user.items():
        s = [t for t, c in evs if c == "s"]
        if not s:
            continue
        t1 = min(s)
        ts_chain = [t1]
        for code in ("v", "c", "p"):
            prev = ts_chain[-1]
            if prev is None:
                ts_chain.append(None)
                continue
            cand = [
                t for t, cd in evs
                if cd == code and t > prev and t - prev <= FUNNEL_GAP_US
            ]
            ts_chain.append(min(cand) if cand else None)
        depth = sum(1 for t in ts_chain if t is not None)
        want[uid] = (*ts_chain, depth, ts_chain[3] is not None)

    got = {
        r["user_id"]: (r["t1"], r["t2"], r["t3"], r["t4"], r["depth"], r["converted"])
        for r in mdx.QUERIES["events_funnel_time_bound"](spark, sf_dir).collect()
    }
    assert got == want
