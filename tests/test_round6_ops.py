"""Independent ground-truth tests for round-6 operators: numpy or
hand-computed answers, deliberately NOT the shared Spark/DuckDB oracle
formulas — when both engines share a formula, the sweep cannot catch a
formula bug (the round-3 review's blind spot, closed per-round since)."""

from __future__ import annotations

import collections
import math

import numpy as np

import metadata_extractors_api_spark as mdx


def _orders_cents(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_totalprice", "o_orderpriority")
        .collect()
    )
    xa = sorted(
        int(round(r["o_totalprice"] * 100))
        for r in rows
        if r["o_orderpriority"] == "1-URGENT"
    )
    xb = sorted(
        int(round(r["o_totalprice"] * 100))
        for r in rows
        if r["o_orderpriority"] == "5-LOW"
    )
    return xa, xb


def test_mann_whitney_matches_direct_rank_construction(spark, sf_dir):
    """U statistic recomputed by literally building the pooled midrank
    vector with numpy (rankdata semantics), not the prefix-sum
    identity the query and oracle share. Also cross-checks U via the
    pairwise-comparison definition U = #(a > b) + 0.5 * #(a == b)."""
    xa, xb = _orders_cents(spark, sf_dir)
    pooled = np.array(xa + xb, dtype=np.int64)
    order = np.argsort(pooled, kind="stable")
    ranks = np.empty(len(pooled), dtype=np.float64)
    sorted_vals = pooled[order]
    i = 0
    pos = 0
    while i < len(sorted_vals):
        j = i
        while j < len(sorted_vals) and sorted_vals[j] == sorted_vals[i]:
            j += 1
        midrank = (i + 1 + j) / 2.0  # average of positions i+1..j
        ranks[order[i:j]] = midrank
        i = j
        pos += 1
    ra = float(ranks[: len(xa)].sum())
    u = ra - len(xa) * (len(xa) + 1) / 2.0

    # pairwise definition as a second independent construction
    xb_arr = np.array(xb, dtype=np.int64)
    gt = sum(int(np.count_nonzero(xb_arr < a)) for a in xa)
    eq = sum(int(np.count_nonzero(xb_arr == a)) for a in xa)
    assert u == gt + eq / 2.0

    r = mdx.QUERIES["dq_mann_whitney"](spark, sf_dir).first()
    assert r["n_a"] == len(xa) and r["n_b"] == len(xb)
    assert r["u2"] == int(round(2 * u))

    # z-score against the textbook tie-corrected formula in floats
    n = len(xa) + len(xb)
    _, counts = np.unique(pooled, return_counts=True)
    tie_sum = int((counts.astype(np.int64) ** 3 - counts).sum())
    assert r["tie_sum"] == tie_sum
    mu = len(xa) * len(xb) / 2.0
    sigma = math.sqrt(
        len(xa) * len(xb) / 12.0 * ((n + 1) - tie_sum / (n * (n - 1)))
    )
    assert abs(r["z"] - (u - mu) / sigma) < 1e-5


def test_chi2_matches_scipy_style_contingency(spark, sf_dir):
    """Chi-square recomputed from a pandas crosstab with plain float
    expected counts (no e6 quantization): the quantized statistic must
    sit within n_cells quantization ulps of the float one, and the
    integer parts (n, dof, cells) must agree exactly."""
    pdf = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_mktsegment", "c_nationkey")
        .toPandas()
    )
    ct = collections.Counter(zip(pdf["c_mktsegment"], pdf["c_nationkey"]))
    segs = sorted({k[0] for k in ct})
    nats = sorted({k[1] for k in ct})
    obs = np.array([[ct.get((s, t), 0) for t in nats] for s in segs], float)
    # chi2 over OCCUPIED cells only (the query aggregates the sparse
    # contingency relation; empty cells contribute 0 either way only
    # if every (seg, nat) pair occurs — assert that instead of hiding)
    n_occupied = int((obs > 0).sum())
    row = obs.sum(axis=1, keepdims=True)
    col = obs.sum(axis=0, keepdims=True)
    n = obs.sum()
    exp = row @ col / n
    chi2 = float((((obs - exp) ** 2 / exp)[obs > 0]).sum())

    r = mdx.QUERIES["dq_chi2_independence"](spark, sf_dir).first()
    assert r["n"] == int(n)
    assert r["n_cells"] == n_occupied
    assert r["dof"] == (len(segs) - 1) * (len(nats) - 1)
    # floor-quantization undershoots by < 1 ulp(e6) per cell
    assert 0 <= chi2 - r["chi2_e6"] / 1e6 < r["n_cells"] * 1e-6 + 1e-9
    v = math.sqrt(chi2 / (n * min(len(segs) - 1, len(nats) - 1)))
    assert abs(r["cramers_v"] - v) < 1e-5


def test_mutual_information_matches_float_construction(spark, sf_dir):
    """MI recomputed with plain float p*log(p/(q*r)) sums over the
    joint distribution — the quantized e9 statistic must match to the
    quantization budget (1e-9 per occupied cell, count-weighted)."""
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("event_type AS x", "hour(ts) AS y")
        .collect()
    )
    joint = collections.Counter((r["x"], r["y"]) for r in rows)
    mx = collections.Counter()
    my = collections.Counter()
    for (x, y), c in joint.items():
        mx[x] += c
        my[y] += c
    n = sum(joint.values())
    mi = sum(
        c / n * math.log(c * n / (mx[x] * my[y]))
        for (x, y), c in joint.items()
    )
    r = mdx.QUERIES["dq_mutual_information"](spark, sf_dir).first()
    assert r["n_events"] == n
    assert r["n_cells"] == len(joint)
    # each cell's ln is floored at e9, weighted by its count: the
    # total undershoot is < sum(count)/n * 1e-9 = 1e-9... per cell
    assert 0 <= mi - r["mi_e9_sum"] / 1e9 / n < 1e-7
    assert abs(r["mi_nats"] - mi) < 1e-6


def test_entropy_matches_scipy_style(spark, sf_dir):
    """Per-document entropy recomputed with the direct
    -sum(p*log(p)) float formula (not the ln(n) - s1/n identity)."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    got = {
        r["doc_id"]: r
        for r in mdx.QUERIES["text_entropy_unigram"](spark, sf_dir).collect()
    }
    assert len(got) == len([d for d in docs if len(d["text"]) > 0])
    checked = 0
    for d in docs[:50]:
        if not d["text"]:
            continue
        toks = d["text"].split(" ")
        counts = collections.Counter(toks)
        n = len(toks)
        h = -sum((c / n) * math.log(c / n) for c in counts.values())
        r = got[d["doc_id"]]
        assert r["n_tokens"] == n
        assert r["n_types"] == len(counts)
        assert abs(r["entropy"] - h) < 1e-5
        assert abs(r["ttr"] - len(counts) / n) < 1e-6
        checked += 1
    assert checked >= 40


def test_zipf_slope_matches_numpy_polyfit(spark, sf_dir):
    """Zipf fit recomputed with np.polyfit over float ln(rank)/ln(cnt)
    of an independently-built frequency table."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .collect()
    )
    tc = collections.Counter()
    for d in docs:
        tc.update(d["text"].split(" "))
    head = sorted(tc.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    x = np.log(np.arange(1, len(head) + 1, dtype=float))
    y = np.log(np.array([c for _, c in head], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    ss_res = float(((y - (slope * x + intercept)) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    r2 = 1 - ss_res / ss_tot

    r = mdx.QUERIES["text_zipf_slope"](spark, sf_dir).first()
    assert r["n_terms"] == len(head)
    assert abs(r["slope"] - slope) < 1e-4
    assert abs(r["intercept_ln"] - intercept) < 1e-4
    assert abs(r["r2"] - r2) < 1e-4
    # the fixture corpus draws from a small near-uniform vocabulary,
    # so it is deliberately NOT Zipfian: slope is shallow-negative and
    # r2 low — exactly the "machine-generated text" signature the
    # operator exists to flag. Assert the direction and valid range
    # rather than a natural-language profile.
    assert r["slope"] <= 0
    assert 0.0 <= r["r2"] <= 1.0


def test_degree_stats_matches_pandas_construction(spark, sf_dir):
    """Degree histogram recomputed via pandas merge + value_counts and
    int.bit_length (not the SQL bin()-string trick)."""
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_custkey")
        .toPandas()
    )
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_suppkey")
        .toPandas()
    )
    e = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    deg = (
        e[["o_custkey", "l_suppkey"]]
        .drop_duplicates()
        .groupby("o_custkey")
        .size()
    )
    buckets = collections.defaultdict(list)
    for d in deg:
        buckets[int(d).bit_length()].append(int(d))
    got = {
        r["bucket"]: r
        for r in mdx.QUERIES["graph_degree_stats"](spark, sf_dir).collect()
    }
    assert set(got) == set(buckets)
    for b, ds in buckets.items():
        r = got[b]
        assert r["n_nodes"] == len(ds)
        assert r["min_deg"] == min(ds)
        assert r["max_deg"] == max(ds)
        assert r["sum_deg"] == sum(ds)


def test_dim_variance_matches_numpy(spark, sf_dir):
    """Per-dimension moments recomputed with numpy mean/var over the
    RAW float embeddings — the e6 quantization must stay within its
    documented error envelope, and n/dim bookkeeping must be exact."""
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("embedding")
        .collect()
    )
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    got = {
        r["dim"]: r
        for r in mdx.QUERIES["embedding_dim_variance_audit"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(range(1, m.shape[1] + 1))
    for d in range(m.shape[1]):
        r = got[d + 1]
        assert r["n"] == m.shape[0]
        # floor(v*1e6) shifts each value < 1e-6: mean shifts < 1e-6,
        # variance of values in [-O(1), O(1)] shifts < ~4e-6
        assert abs(r["mean"] - m[:, d].mean()) < 2e-6
        assert abs(r["variance"] - m[:, d].var()) < 1e-5
        assert not r["is_dead"]  # fixture embeddings are random-ish


def test_bpe_encode_hand_example(spark, sf_dir):
    """The merge chain applied by hand to a constructed document:
    'table value scan' must come out as exactly 5 symbols
    (table, ▁, value, ▁, scan) under the declared merge table, and
    the per-rule single-pass semantics must hold on an adjacent-repeat
    case ('t a t a t a' alternation)."""
    from metadata_extractors_api_spark.operators.corpus import (
        BPE_MARKER,
        BPE_MERGES,
    )

    def encode(text: str) -> list[str]:
        syms = list(text.replace(" ", BPE_MARKER))
        s = " " + " ".join(syms) + " "
        for a, b in BPE_MERGES:
            s = s.replace(f" {a} {b} ", f" {a}{b} ")
        return s.split()

    # Exact expected outputs, derived by hand:
    #   table: t+a -> ta; b+l -> bl; ta+bl -> tabl; tabl+e -> table
    #   value: v+a -> va; l+u -> lu; va+lu -> valu; valu+e -> value
    #   scan:  s+c -> sc; a+n -> an; sc+an -> scan
    assert encode("table value scan") == [
        "table", BPE_MARKER, "value", BPE_MARKER, "scan"
    ]
    # single-pass alternation artifact, documented semantics: the
    # ' t a ' rule consumes its trailing space, so of three adjacent
    # 't a' pairs the middle one survives the pass
    assert encode("tatata") == ["ta", "t", "a", "ta"]

    # and the registered query agrees with this reference encoder on
    # real fixture documents
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(25)
        .collect()
    )
    got = {
        r["doc_id"]: r
        for r in mdx.QUERIES["tokenizer_bpe_encode"](spark, sf_dir).collect()
    }
    for d in docs:
        if not d["text"]:
            continue
        toks = encode(d["text"])
        r = got[d["doc_id"]]
        assert r["n_chars"] == len(d["text"])
        assert r["n_tokens"] == len(toks)
        assert abs(r["compression"] - len(d["text"]) / len(toks)) < 1e-5


def test_tile_stats_matches_independent_pixel_replay(spark, sf_dir):
    """Quadrant sums recomputed from the raster FORMULA directly (pure
    python loops, no decode_image, no numpy slicing) for 5 docs."""
    from metadata_extractors_api_spark.operators.llm import _PIXEL_ORACLE_DOCS

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(f"doc_id < {_PIXEL_ORACLE_DOCS}")
        .limit(5)
        .collect()
    )
    got = {}
    for r in mdx.QUERIES["multimodal_tile_stats"](spark, sf_dir).collect():
        got[(r["doc_id"], r["quadrant"])] = r
    for d in docs:
        text = d["text"]
        L = len(text)
        w = 64 + (13 * L) % 321
        h = 64 + (29 * L) % 321
        acc = {
            (q, c): 0 for q in range(4) for c in range(3)
        }
        npx = collections.Counter()
        for p in range(w * h):
            row, col = p // w, p % w
            q = 2 * (row >= h // 2) + (col >= w // 2)
            npx[q] += 1
            for c in range(3):
                j = 3 * p + c
                val = (ord(text[(j * 31 + 7) % L]) + j) % 256
                acc[(q, c)] += val
        for q in range(4):
            r = got[(d["doc_id"], q)]
            assert r["n_px"] == npx[q]
            assert r["sum_r"] == acc[(q, 0)]
            assert r["sum_g"] == acc[(q, 1)]
            assert r["sum_b"] == acc[(q, 2)]


def test_aspect_bucket_nearest_is_true_float_argmin(spark, sf_dir):
    """The integer cross-multiplied bucket choice must equal the plain
    float |w/h - bw/bh| argmin (with the same priority tie-break),
    and bucket counts must add up to the corpus size."""
    from metadata_extractors_api_spark.operators.llm import ASPECT_BUCKETS

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("length(text) AS L")
        .collect()
    )
    counts = collections.Counter()
    px = collections.Counter()
    for d in docs:
        L = d["L"]
        w = 64 + (13 * L) % 321
        h = 64 + (29 * L) % 321
        best = None
        for name, bw, bh, _ in ASPECT_BUCKETS:
            dist = abs(w / h - bw / bh)
            if best is None or dist < best[0] - 1e-12:
                best = (dist, name)
        counts[best[1]] += 1
        px[best[1]] += w * h
    got = {
        r["bucket"]: r
        for r in mdx.QUERIES["multimodal_aspect_bucket"](
            spark, sf_dir
        ).collect()
    }
    assert sum(r["n_images"] for r in got.values()) == len(docs)
    for name, n in counts.items():
        assert got[name]["n_images"] == n
        assert got[name]["sum_px"] == px[name]
        assert got[name]["n_batches32"] == (n + 31) // 32
        assert got[name]["pad_waste"] == ((n + 31) // 32) * 32 - n


def test_win_distinct_rolling_matches_pandas_rolling(spark, sf_dir):
    """Rolling distinct recomputed with a pure-python sliding window
    over pandas-sorted per-user event sequences."""
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "ts", "event_type")
        .toPandas()
    )
    expected = {}
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        types = list(g["event_type"])
        ids = list(g["event_id"])
        for i in range(len(types)):
            lo = max(0, i - 9)
            expected[ids[i]] = len(set(types[lo : i + 1]))
    got = {
        r["event_id"]: r["n_distinct10"]
        for r in mdx.QUERIES["win_distinct_rolling"](spark, sf_dir).collect()
    }
    assert got == expected


def test_importance_hash_matches_hashlib(spark, sf_dir):
    """Keep set recomputed with Python hashlib md5 and exact integer
    keep probabilities — plus the semantic property that keep RATE
    rises with document length."""
    import hashlib

    from metadata_extractors_api_spark.operators.training import (
        IMPORTANCE_CHAR_TARGET,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    expected = {}
    for d in docs:
        u6 = (
            int(hashlib.md5(f"imp|{d['doc_id']}".encode()).hexdigest()[:8], 16)
            % 1_000_000
        )
        p_e6 = min(
            1_000_000,
            math.floor(len(d["text"]) * 1_000_000 / IMPORTANCE_CHAR_TARGET),
        )
        if u6 < p_e6:
            expected[d["doc_id"]] = (len(d["text"]), u6, p_e6)
    got = {
        r["doc_id"]: (r["n_chars"], r["u6"], r["p_e6"])
        for r in mdx.QUERIES["sample_importance_hash"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected
    assert 0 < len(got) < len(docs)  # neither empty nor keep-everything


def test_vocab_coverage_matches_counter(spark, sf_dir):
    """Coverage rows recomputed from a plain Counter + sorted
    cumulative sum (no prefix-sum encoding)."""
    from metadata_extractors_api_spark.operators.stats import (
        VOCAB_COVERAGE_KS,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .collect()
    )
    tc = collections.Counter()
    for d in docs:
        tc.update(d["text"].split(" "))
    ordered = sorted(tc.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(tc.values())
    cum = 0
    expected = {}
    for i, (_, c) in enumerate(ordered, start=1):
        cum += c
        if i in VOCAB_COVERAGE_KS or i == len(ordered):
            expected[i] = cum
    got = {
        r["rank_k"]: r
        for r in mdx.QUERIES["text_vocab_coverage_curve"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(expected)
    for k, cum_k in expected.items():
        r = got[k]
        assert r["cum_tokens"] == cum_k
        assert r["total_tokens"] == total
        assert r["vocab_n"] == len(ordered)
        assert abs(r["coverage"] - cum_k / total) < 1e-6


def test_langid_confusion_consistency(spark, sf_dir):
    """The confusion matrix must exactly re-aggregate the registered
    classifier's per-document output, cover every document, and have
    row fractions that sum to 1 per labeled language."""
    pred = mdx.QUERIES["text_langid"](spark, sf_dir).collect()
    cells = collections.Counter((r["lang"], r["pred_lang"]) for r in pred)
    rows = collections.Counter(r["lang"] for r in pred)
    got = mdx.QUERIES["text_langid_confusion"](spark, sf_dir).collect()
    assert sum(r["n"] for r in got) == len(pred)
    for r in got:
        assert r["n"] == cells[(r["lang"], r["pred_lang"])]
        assert abs(r["row_frac"] - r["n"] / rows[r["lang"]]) < 1e-6
    by_lang = collections.defaultdict(float)
    for r in got:
        by_lang[r["lang"]] += r["row_frac"]
    for lang, s in by_lang.items():
        assert abs(s - 1.0) < 1e-4, (lang, s)


def test_sim_distribution_matches_numpy_histogram(spark, sf_dir):
    """Cosine histogram recomputed with plain numpy float dot products
    (not the scaled-int64 arithmetic), binned on the 6-dp-rounded
    value exactly as specified."""
    from metadata_extractors_api_spark.operators.llm import SIM_DIST_PROBES

    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    probes = np.where(ids < SIM_DIST_PROBES)[0]
    counts = collections.Counter()
    for pi in probes:
        cos = m @ m[pi] / (norms * norms[pi])
        cos = np.round(np.delete(cos, np.where(ids == ids[pi])[0]), 6)
        bins = np.clip(np.floor((cos + 1) * 8).astype(int), 0, 15)
        counts.update(bins.tolist())
    got = {
        r["bin"]: r
        for r in mdx.QUERIES["sim_distribution_audit"](spark, sf_dir).collect()
    }
    assert sum(r["n_pairs"] for r in got.values()) == sum(counts.values())
    for b, n in counts.items():
        # scaled-int vs float cosine can flip a pair across a bin edge
        # only within the 6-dp rounding quantum; allow 1% slack per bin
        assert abs(got[b]["n_pairs"] - n) <= max(2, 0.01 * n), (b, n)


def test_channel_correlation_matches_numpy_corrcoef(spark, sf_dir):
    """Channel correlations recomputed with np.corrcoef over decoded
    float pixel planes (not the integer-moment Cramer form)."""
    from metadata_extractors_api_spark.operators.llm import (
        _PIXEL_ORACLE_DOCS,
        _ppm_payload,
        decode_image,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(f"doc_id < {_PIXEL_ORACLE_DOCS}")
        .limit(8)
        .collect()
    )
    got = {
        r["doc_id"]: r
        for r in mdx.QUERIES["multimodal_channel_correlation"](
            spark, sf_dir
        ).collect()
    }
    for d in docs:
        px = decode_image(_ppm_payload(d["text"]))["pixels"].astype(float)
        r = got[d["doc_id"]]
        assert r["n"] == px.shape[0] * px.shape[1]
        crg = np.corrcoef(px[:, :, 0].ravel(), px[:, :, 1].ravel())[0, 1]
        cgb = np.corrcoef(px[:, :, 1].ravel(), px[:, :, 2].ravel())[0, 1]
        assert abs(r["corr_rg"] - crg) < 1e-5
        assert abs(r["corr_gb"] - cgb) < 1e-5


def test_winnowing_reference_implementation(spark, sf_dir):
    """Fingerprints recomputed with the textbook winnowing loop
    (hashlib k-gram hashes, explicit sliding-window min) for 20 docs,
    and the structural guarantee: two documents sharing a run of
    k+w-1 tokens share at least one fingerprint."""
    import hashlib

    from metadata_extractors_api_spark.operators.llm import (
        WINNOW_K,
        WINNOW_W,
    )

    def winnow(text: str) -> set:
        toks = text.split(" ")
        if len(toks) < WINNOW_K:
            return set()
        hs = [
            int(
                hashlib.md5(
                    " ".join(toks[i : i + WINNOW_K]).encode()
                ).hexdigest()[:8],
                16,
            )
            for i in range(len(toks) - WINNOW_K + 1)
        ]
        out = set()
        for i in range(max(1, len(hs) - WINNOW_W + 1)):
            out.add(min(hs[i : i + WINNOW_W]))
        return out

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(20)
        .collect()
    )
    got = collections.defaultdict(set)
    for r in mdx.QUERIES["text_winnowing_fingerprint"](
        spark, sf_dir
    ).collect():
        got[r["doc_id"]].add(r["fp"])
    for d in docs:
        assert got[d["doc_id"]] == winnow(d["text"]), d["doc_id"]
    # shared-run guarantee on a constructed pair
    shared = " ".join(f"s{i}" for i in range(WINNOW_K + WINNOW_W - 1))
    a = winnow("x1 x2 x3 " + shared)
    b = winnow(shared + " y1 y2 y3")
    assert a & b


def test_bigram_cond_entropy_matches_float_construction(spark, sf_dir):
    """H(W2|W1) recomputed with plain float joint/conditional
    probabilities over an independently built bigram table."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .collect()
    )
    bc = collections.Counter()
    for d in docs:
        toks = d["text"].split(" ")
        bc.update(zip(toks, toks[1:]))
    n1 = collections.Counter()
    for (w1, _), c in bc.items():
        n1[w1] += c
    n = sum(bc.values())
    h = -sum(c / n * math.log(c / n1[w1]) for (w1, _), c in bc.items())
    r = mdx.QUERIES["text_bigram_cond_entropy"](spark, sf_dir).first()
    assert r["n_bigrams"] == n
    assert r["n_contexts"] == len(n1)
    assert abs(r["h_cond"] - h) < 1e-6
    assert 0 <= r["h_cond"] <= math.log(len(n1) + 1) + 1


def test_asof_tolerance_matches_pandas_merge_asof(spark, sf_dir):
    """Tolerance as-of matches recomputed with a per-user sorted scan
    in plain python (pandas merge_asof semantics: latest click at or
    before each purchase, null beyond the tolerance)."""
    from metadata_extractors_api_spark.operators.relational import (
        ASOF_TOLERANCE_S,
    )

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "ts", "event_type")
        .collect()
    )
    by_user = collections.defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    expected = {}
    for rows in by_user.values():
        # clicks before purchases at equal ts; equal-ts clicks by id
        rows.sort(
            key=lambda r: (r["ts"], r["event_type"] != "click", r["event_id"])
        )
        last_click = None
        for r in rows:
            if r["event_type"] == "click":
                last_click = r
            elif r["event_type"] == "purchase":
                if last_click is not None:
                    lag_us = int(
                        (
                            r["ts"] - last_click["ts"]
                        ).total_seconds() * 1_000_000
                    )
                    if lag_us <= ASOF_TOLERANCE_S * 1_000_000:
                        expected[r["event_id"]] = (
                            last_click["event_id"],
                            lag_us // 1_000_000,
                        )
                        continue
                expected[r["event_id"]] = (None, None)
    got = {
        r["event_id"]: (r["click_id"], r["lag_s"])
        for r in mdx.QUERIES["join_asof_tolerance"](spark, sf_dir).collect()
    }
    assert got == expected


def test_markov_attribution_matches_float_simulation(spark, sf_dir):
    """Removal-effect attribution recomputed independently: paths
    built with plain python dict walks, transition matrix in floats,
    and the SAME 16-step horizon simulated with numpy float matrix
    algebra (no e6/e9 quantization). The integer-quantized
    probabilities must sit within the accumulated quantization budget
    of the float simulation, and effects must be non-negative (removal
    can only lose conversion mass at every unrolled depth)."""
    from metadata_extractors_api_spark.operators.corpus import MARKOV_K

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "ts", "event_type")
        .collect()
    )
    by_user = collections.defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    edges = collections.Counter()
    for rows in by_user.values():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        prev = "start"
        converted = False
        for r in rows:
            state = "conv" if r["event_type"] == "purchase" else r["event_type"]
            edges[(prev, state)] += 1
            if state == "conv":
                converted = True
                break
            prev = state
        if not converted:
            edges[(prev, "null")] += 1

    out = collections.Counter()
    for (s, _), c in edges.items():
        out[s] += c
    channels = sorted(
        {r["event_type"] for r in ev if r["event_type"] != "purchase"}
    )

    def absorb(removed):
        # float value iteration, same horizon, same removal semantics
        p = collections.defaultdict(float)
        for _ in range(MARKOV_K):
            nxt = {}
            for s in out:
                tot = 0.0
                for (s2, t), c in edges.items():
                    if s2 != s or t == removed:
                        continue
                    pv = 1.0 if t == "conv" else (
                        0.0 if t == "null" else p[t]
                    )
                    tot += (c / out[s]) * pv
                nxt[s] = tot
            p = collections.defaultdict(float, nxt)
        return p["start"]

    base = absorb(None)
    got = {
        r["channel"]: r
        for r in mdx.QUERIES["events_markov_attribution"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(channels)
    # e6 transition quantization accumulates across <= K steps and
    # |states| terms: budget ~ K * states * 1e-6, call it 2e-4
    effects = {}
    for c in channels:
        r = got[c]
        assert abs(r["p_conv_e9"] / 1e9 - base) < 2e-4
        pr = absorb(c)
        assert abs(r["p_removed_e9"] / 1e9 - pr) < 2e-4
        assert r["effect_e9"] >= 0
        effects[c] = base - pr
    te = sum(effects.values())
    if te > 0:
        for c in channels:
            assert abs(got[c]["share"] - effects[c] / te) < 5e-3


def test_pattern_funnel_matches_python_re(spark, sf_dir):
    """Funnel matches recomputed with python re over independently
    sorted per-user sequences."""
    import re as _re

    from metadata_extractors_api_spark.operators.extended import (
        FUNNEL_PATTERN,
    )

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "ts", "event_type")
        .collect()
    )
    by_user = collections.defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    pat = _re.compile(FUNNEL_PATTERN)
    expected = {}
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        s = "".join(r["event_type"][0] for r in rows)
        expected[uid] = (len(rows), bool(pat.search(s)))
    got = {
        r["user_id"]: (r["n_events"], r["matched"])
        for r in mdx.QUERIES["win_pattern_funnel_regex"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected
    # the fixture must exercise both outcomes or the test is vacuous
    assert {m for _, m in got.values()} == {True, False}


def test_decode_errors_routes_real_decoder_failures(spark, sf_dir):
    """Every document must be routed; corrupted slots must carry the
    error class the REAL decoder raises (verified by corrupting and
    decoding here too), good rows must carry true dimensions."""
    from metadata_extractors_api_spark.operators.llm import (
        _CORRUPT_MAGIC_MOD,
        _CORRUPT_TRUNC_MOD,
        _ppm_payload,
        decode_image,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    got = {
        r["doc_id"]: r
        for r in mdx.QUERIES["multimodal_decode_errors"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == {d["doc_id"] for d in docs}
    n_bad = 0
    for d in docs:
        r = got[d["doc_id"]]
        if d["doc_id"] % _CORRUPT_TRUNC_MOD == 0:
            assert r["status"] == "truncated_raster"
            assert r["width"] is None and r["height"] is None
            n_bad += 1
        elif d["doc_id"] % _CORRUPT_MAGIC_MOD == 0:
            assert r["status"] == "unsupported_codec"
            n_bad += 1
        else:
            m = decode_image(_ppm_payload(d["text"]))
            assert r["status"] == "ok"
            assert (r["width"], r["height"]) == (m["width"], m["height"])
    assert n_bad > 0  # the corruption slots must actually fire


def test_kcore_matches_networkx_style_peeling(spark, sf_dir):
    """Peel trajectory recomputed with a plain python adjacency-dict
    loop run to FIXPOINT — the query's final round must agree with
    the true k-core (its converged flag asserts the horizon reached
    it), and every intermediate round must match the reference peel."""
    from metadata_extractors_api_spark.operators.corpus import (
        KCORE_K,
        KCORE_ROUNDS,
    )

    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_custkey")
        .collect()
    )
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_suppkey")
        .collect()
    )
    cust_by_order = {r["o_orderkey"]: r["o_custkey"] for r in o}
    edges = set()
    for r in li:
        cu = cust_by_order.get(r["l_orderkey"])
        if cu is not None:
            edges.add((cu * 2, r["l_suppkey"] * 2 + 1))
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    alive = set(adj)
    trajectory = []
    for _ in range(KCORE_ROUNDS):
        nxt = {
            n for n in alive if len(adj[n] & alive) >= KCORE_K
        }
        alive = nxt
        n_edges = sum(len(adj[n] & alive) for n in alive) // 2
        trajectory.append((len(alive), n_edges))

    got = sorted(
        (
            (r["round"], r["n_nodes"], r["n_edges"], r["converged"])
            for r in mdx.QUERIES["graph_kcore"](spark, sf_dir).collect()
        )
    )
    for rnd, n_nodes, n_edges, _ in got:
        assert (n_nodes, n_edges) == trajectory[rnd - 1], rnd
    # final round must be the true fixpoint and say so
    assert got[-1][3] is True
    final = set(alive)
    while True:
        nxt = {n for n in final if len(adj[n] & final) >= KCORE_K}
        if nxt == final:
            break
        final = nxt
    assert len(final) == got[-1][1]


def test_ffd_matches_reference_and_invariants(spark, sf_dir):
    """pack_bin_ffd (rows-only registry entry) replayed against a
    pure-python reference FFD per shard, plus the packing invariants:
    token conservation, no in-capacity bin overfilled, bin count sane
    vs the ceil(total/cap) lower bound."""
    from metadata_extractors_api_spark.operators.training import (
        PACK_FFD_CAP,
        PACK_FFD_SHARDS,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    by_shard = collections.defaultdict(list)
    for d in docs:
        t = len(d["text"].split(" "))
        by_shard[d["doc_id"] % PACK_FFD_SHARDS].append((t, d["doc_id"]))

    def ffd(items):
        items = sorted(items, key=lambda x: (-x[0], x[1]))
        fills, assign = [], {}
        for t, doc in items:
            placed = None
            if t < PACK_FFD_CAP:
                for i, f in enumerate(fills):
                    if f + t <= PACK_FFD_CAP:
                        placed = i
                        break
            if placed is None:
                fills.append(t)
                placed = len(fills) - 1
            else:
                fills[placed] += t
            assign[doc] = placed
        return assign, fills

    got = collections.defaultdict(dict)
    for r in mdx.QUERIES["pack_bin_ffd"](spark, sf_dir).collect():
        got[r["shard"]][r["doc_id"]] = (r["tokens"], r["bin_id"])
    assert set(got) == set(by_shard)
    for shard, items in by_shard.items():
        assign, fills = ffd(items)
        g = got[shard]
        assert {d: b for d, (_, b) in g.items()} == assign, shard
        # invariants
        total = sum(t for t, _ in items)
        assert sum(fills) == total
        small = [f for f in fills if f <= PACK_FFD_CAP]
        assert all(f <= PACK_FFD_CAP for f in small)
        assert len(fills) >= -(-total // PACK_FFD_CAP) - len(
            [t for t, _ in items if t >= PACK_FFD_CAP]
        )


def test_neyman_allocation_matches_float_apportionment(spark, sf_dir):
    """Allocation recomputed with plain float Neyman weights and a
    float largest-remainder apportionment; the e6-quantized integer
    apportionment must agree exactly (weights are far from ties at
    every fixture SF) and sum exactly to the budget."""
    from metadata_extractors_api_spark.operators.training import (
        NEYMAN_BUDGET,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("source", "length(text) AS L")
        .collect()
    )
    by_src = collections.defaultdict(list)
    for d in docs:
        by_src[d["source"]].append(d["L"])
    w = {
        s: len(v) * float(np.std(np.array(v, dtype=float)))
        for s, v in by_src.items()
    }
    tw = sum(w.values())
    base = {s: int(NEYMAN_BUDGET * wv // tw) for s, wv in w.items()}
    rems = sorted(
        ((NEYMAN_BUDGET * wv / tw) % 1.0, s) for s, wv in w.items()
    )
    r = NEYMAN_BUDGET - sum(base.values())
    winners = {s for _, s in sorted(rems, key=lambda x: (-x[0], x[1]))[:r]}
    expected = {s: base[s] + (1 if s in winners else 0) for s in w}

    got = {
        row["source"]: row
        for row in mdx.QUERIES["sample_stratified_neyman"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(by_src)
    assert sum(row["alloc"] for row in got.values()) == NEYMAN_BUDGET
    for s, rows in by_src.items():
        row = got[s]
        assert row["n_docs"] == len(rows)
        assert abs(row["sigma"] - float(np.std(np.array(rows, float)))) < 1e-4
        assert row["alloc"] == expected[s], s


def test_stream_pattern_funnel_equals_batch_twin(spark, sf_dir):
    """The streaming funnel's final state must equal the batch
    operator row-for-row (the module's batch/stream symmetry
    contract), having genuinely crossed micro-batches."""
    batch = {
        r["user_id"]: (r["n_events"], r["matched"])
        for r in mdx.QUERIES["win_pattern_funnel_regex"](
            spark, sf_dir
        ).collect()
    }
    stream = {
        r["user_id"]: (r["n_events"], r["matched"])
        for r in mdx.QUERIES["stream_pattern_funnel"](
            spark, sf_dir
        ).collect()
    }
    assert stream == batch
    assert {m for _, m in stream.values()} == {True, False}


def test_theil_matches_float_construction_and_decomposition(spark, sf_dir):
    """Theil T recomputed with plain float sums, plus the decomposition
    identity T_total = T_between + sum_g (S_g/S) T_g checked against
    independently computed within-group Theils."""
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey", "o_totalprice")
        .collect()
    )
    c = {
        r["c_custkey"]: r["c_nationkey"]
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_nationkey")
        .collect()
    }
    rev = collections.Counter()
    for r in o:
        if r["o_custkey"] in c:
            rev[r["o_custkey"]] += int(round(r["o_totalprice"] * 100))
    xs = np.array([v for v in rev.values() if v > 0], dtype=float)
    n, s = len(rev), sum(rev.values())
    mu = s / n
    t_total = float(np.sum((xs / s) * np.log(xs * n / s)))

    by_nation = collections.defaultdict(list)
    for cust, v in rev.items():
        by_nation[c[cust]].append(v)
    t_between = 0.0
    t_within_weighted = 0.0
    for g in by_nation.values():
        sg, ng = sum(g), len(g)
        t_between += (sg / s) * math.log((sg / s) / (ng / n))
        gx = np.array([v for v in g if v > 0], dtype=float)
        tg = float(np.sum((gx / sg) * np.log(gx * ng / sg)))
        t_within_weighted += (sg / s) * tg

    r = mdx.QUERIES["dq_theil_index"](spark, sf_dir).first()
    assert r["n"] == n and r["total_cents"] == s
    assert abs(r["theil_total"] - t_total) < 1e-5
    assert abs(r["theil_between"] - t_between) < 1e-5
    assert abs(r["theil_within"] - t_within_weighted) < 1e-5
    # decomposition identity on the query's own numbers
    assert abs(
        r["theil_total"] - (r["theil_between"] + r["theil_within"])
    ) < 2e-6
    assert r["theil_total"] >= 0 and mu > 0


def test_interval_coalesce_matches_python_sweep(spark, sf_dir):
    """Islands recomputed with the textbook sort-and-sweep merge."""
    from metadata_extractors_api_spark.operators.extended import (
        COALESCE_WINDOW_DAYS,
    )

    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr(
            "o_custkey",
            "o_orderkey",
            "unix_micros(CAST(o_orderdate AS TIMESTAMP))"
            " div 86400000000 AS d",
        )
        .collect()
    )
    by_cust = collections.defaultdict(list)
    for r in o:
        by_cust[r["o_custkey"]].append((r["d"], r["o_orderkey"]))
    expected = {}
    for cust, rows in by_cust.items():
        rows.sort()
        islands = []
        for s, _ in rows:
            e = s + COALESCE_WINDOW_DAYS
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
                islands[-1][2] += 1
            else:
                islands.append([s, e, 1])
        for i, (s, e, n) in enumerate(islands, start=1):
            expected[(cust, i)] = (s, e, n)
    got = {
        (r["o_custkey"], r["island"]): (
            r["start_day"],
            r["end_day"],
            r["n_orders"],
        )
        for r in mdx.QUERIES["win_interval_coalesce"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected
    # genuinely merges: some island must hold >1 order
    assert any(n > 1 for _, _, n in got.values())
    assert any(n == 1 for _, _, n in got.values())


def test_survival_km_matches_lifelines_style_construction(spark, sf_dir):
    """KM risk sets and log-survival recomputed with the direct
    product-limit loop (float ln products, no quantization)."""
    from metadata_extractors_api_spark.operators.stats import (
        KM_CENSOR_DAYS,
    )

    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr(
            "o_custkey",
            "unix_micros(CAST(o_orderdate AS TIMESTAMP))"
            " div 86400000000 AS d",
        )
        .collect()
    )
    first = {}
    last = {}
    for r in o:
        c, d = r["o_custkey"], r["d"]
        first[c] = min(first.get(c, d), d)
        last[c] = max(last.get(c, d), d)
    max_d = max(last.values())
    obs = [
        (last[c] - first[c], 0 if last[c] > max_d - KM_CENSOR_DAYS else 1)
        for c in first
    ]
    n_total = len(obs)
    by_dur = collections.defaultdict(lambda: [0, 0])  # deaths, censored
    for dur, ev in obs:
        by_dur[dur][0 if ev else 1] += 1
    at_risk = n_total
    ln_s = 0.0
    expected = {}
    for dur in sorted(by_dur):
        d_ev, c_cen = by_dur[dur]
        if d_ev > 0:
            if d_ev < at_risk:
                ln_s += math.log((at_risk - d_ev) / at_risk)
                expected[dur] = (at_risk, d_ev, c_cen, ln_s)
            else:
                expected[dur] = (at_risk, d_ev, c_cen, None)
        at_risk -= d_ev + c_cen

    got = {
        r["duration_days"]: r
        for r in mdx.QUERIES["orders_survival_km"](spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for dur, (n_risk, d_ev, c_cen, ln_s_f) in expected.items():
        r = got[dur]
        assert r["n_at_risk"] == n_risk
        assert r["d_events"] == d_ev
        assert r["c_censored"] == c_cen
        if ln_s_f is None:
            assert r["ln_surv_e9"] is None
        else:
            # per-term floor(1e-9) undershoot accumulates over terms
            assert 0 <= ln_s_f - r["ln_surv_e9"] / 1e9 < 1e-5
    # the censoring mechanism must fire (dataset-tail customers exist)
    assert sum(c for _, _, c, _ in expected.values()) > 0


def test_psi_matches_float_construction(spark, sf_dir):
    """PSI recomputed with plain float smoothed proportions."""
    from metadata_extractors_api_spark.operators.stats import (
        PSI_ALERT,
        PSI_BIN_CENTS,
        PSI_BINS,
    )

    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_totalprice", "o_orderpriority")
        .collect()
    )
    ca = collections.Counter()
    cb = collections.Counter()
    for r in o:
        b = min(PSI_BINS - 1, int(round(r["o_totalprice"] * 100)) // PSI_BIN_CENTS)
        if r["o_orderpriority"] == "1-URGENT":
            ca[b] += 1
        elif r["o_orderpriority"] == "5-LOW":
            cb[b] += 1
    bins = sorted(set(ca) | set(cb))
    sa = {b: ca.get(b, 0) + 1 for b in bins}
    sb = {b: cb.get(b, 0) + 1 for b in bins}
    na, nb = sum(sa.values()), sum(sb.values())
    psi = sum(
        (sa[b] / na - sb[b] / nb) * math.log((sa[b] / na) / (sb[b] / nb))
        for b in bins
    )
    r = mdx.QUERIES["dq_psi_drift"](spark, sf_dir).first()
    assert r["n_a"] == na - len(bins) and r["n_b"] == nb - len(bins)
    assert r["n_bins"] == len(bins)
    assert abs(r["psi"] - psi) < 1e-5
    assert r["drifted"] == (r["psi"] > PSI_ALERT)
    assert psi >= 0


def test_holt_matches_float_statsmodels_style(spark, sf_dir):
    """Holt smoothing recomputed with plain float recursions (no e6
    quantization) — the integer states must track within the
    accumulated quantization budget, and the bookkeeping (yearly
    revenue, init) must be exact."""
    from metadata_extractors_api_spark.operators.stats import (
        HOLT_ALPHA_E6,
        HOLT_BETA_E6,
        HOLT_YEARS,
    )

    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr(
            "year(o_orderdate) AS yr",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .collect()
    )
    y = collections.Counter()
    for r in o:
        y[r["yr"]] += r["cents"]
    ys = [y.get(yr, 0) for yr in HOLT_YEARS]
    a, B = HOLT_ALPHA_E6 / 1e6, HOLT_BETA_E6 / 1e6
    lvl, tr = float(ys[1]), float(ys[1] - ys[0])
    expected = {HOLT_YEARS[1]: (ys[1], lvl, tr)}
    for i, yr in enumerate(HOLT_YEARS[2:], start=2):
        l_new = a * ys[i] + (1 - a) * (lvl + tr)
        tr = B * (l_new - lvl) + (1 - B) * tr
        lvl = l_new
        expected[yr] = (ys[i], lvl, tr)

    got = {
        r["year"]: r
        for r in mdx.QUERIES["orders_holt_forecast"](spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for yr, (yv, lv, tv) in expected.items():
        r = got[yr]
        assert r["y_cents"] == yv
        # floor-quantization drifts < #steps units per state
        assert abs(r["level_q"] - lv) < max(10, 1e-9 * abs(lv))
        assert abs(r["trend_q"] - tv) < max(10, 1e-9 * abs(lv))
        assert r["fc1_q"] == r["level_q"] + r["trend_q"]
    # the fixture's history is genuinely trending (nonzero trend state)
    assert any(abs(r["trend_q"]) > 0 for r in got.values())


def test_simpson_screen_matches_numpy_signs(spark, sf_dir):
    """Association signs recomputed with numpy covariance numerators
    per nation and pooled."""
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey", "o_totalprice")
        .collect()
    )
    c = {
        r["c_custkey"]: (r["c_nationkey"], int(round(r["c_acctbal"] * 100)))
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_nationkey", "c_acctbal")
        .collect()
    }
    rev = collections.Counter()
    for r in o:
        if r["o_custkey"] in c:
            rev[r["o_custkey"]] += int(round(r["o_totalprice"] * 100))
    by_nation = collections.defaultdict(list)
    for cust, yv in rev.items():
        nat, x = c[cust]
        by_nation[nat].append((x, yv))

    def sign(pts):
        n = len(pts)
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        v = n * sxy - sx * sy
        return (v > 0) - (v < 0)

    pooled = [p for pts in by_nation.values() for p in pts]
    overall = sign(pooled)
    signs = [sign(pts) for pts in by_nation.values()]
    n_pos = sum(1 for s in signs if s == 1)
    n_neg = sum(1 for s in signs if s == -1)
    n_rev = sum(1 for s in signs if s != 0 and s != overall)

    r = mdx.QUERIES["dq_simpson_screen"](spark, sf_dir).first()
    assert r["overall_sign"] == overall
    assert r["n_customers"] == len(rev)
    assert r["n_groups"] == len(by_nation)
    assert r["n_pos"] == n_pos and r["n_neg"] == n_neg
    assert r["n_reversed"] == n_rev
    assert r["simpson_flag"] == (n_rev * 2 > len(by_nation))


def test_funnel_steps_matches_python_and_is_monotone(spark, sf_dir):
    """Stage counts recomputed with python re over independently
    sorted sequences; monotonicity asserted."""
    import re as _re

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "ts", "event_type")
        .collect()
    )
    by_user = collections.defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    pats = [
        _re.compile("s"),
        _re.compile("s[^pe]*v"),
        _re.compile("s[^pe]*v[^pe]*c"),
        _re.compile("s[^pe]*v[^pe]*c[^pe]*p"),
    ]
    counts = [0, 0, 0, 0]
    for rows in by_user.values():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        s = "".join(r["event_type"][0] for r in rows)
        for i, p in enumerate(pats):
            if p.search(s):
                counts[i] += 1
    r = mdx.QUERIES["events_funnel_steps"](spark, sf_dir).first()
    assert r["n_users"] == len(by_user)
    assert (r["n_signup"], r["n_view"], r["n_click"], r["n_purchase"]) == tuple(
        counts
    )
    assert r["n_signup"] >= r["n_view"] >= r["n_click"] >= r["n_purchase"]
    assert abs(r["conversion"] - counts[3] / counts[0]) < 1e-6
