"""Independent ground-truth tests for round-10 operators: plain-Python /
numpy answers, deliberately NOT the shared Spark/DuckDB oracle formulas
— when both engines share a formula, the sweep cannot catch a formula
bug (the round-3 review's blind spot, closed per-round since)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq

import metadata_extractors_api_spark as mdx


def _embs(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    return {
        int(i): np.asarray(v, dtype=np.float64)
        for i, v in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())
    }


def _dot_scaled(a, b):
    return int(
        sum(math.floor(float(x) * float(y) * 1e12) for x, y in zip(a, b))
    )


def _cos(a, b):
    d = _dot_scaled(a, b)
    na, nb = _dot_scaled(a, a), _dot_scaled(b, b)
    return round((d / 1e12) / (math.sqrt(na / 1e12) * math.sqrt(nb / 1e12)), 6)


def _sem_model(embs):
    """Adaptive-K integer Lloyd replay shared by the semantic tests:
    returns (ids, ranked-centroid-order function, exact per-vector
    distance list)."""
    from metadata_extractors_api_spark.operators.pipeline import (
        KM_ITERS,
        KM_SCALE,
        SEM_TARGET_CLUSTER,
    )

    ids = sorted(embs)
    km_k = -(-len(ids) // SEM_TARGET_CLUSTER)
    X = np.array(
        [[math.floor(float(x) * KM_SCALE) for x in embs[i]] for i in ids],
        dtype=object,  # exact ints
    )
    cent = {c: X[ids.index(c + 1)].copy() for c in range(km_k)}

    def dists(i):
        r = ids.index(i)
        return {c: int(sum((X[r] - cent[c]) ** 2)) for c in range(km_k)}

    def order(i):
        d = dists(i)
        return sorted(range(km_k), key=lambda c: (d[c], c))

    for _ in range(KM_ITERS):
        a = {i: order(i)[0] for i in ids}
        for c in range(km_k):
            rows = [X[ids.index(i)] for i in ids if a[i] == c]
            if rows:
                s = np.sum(rows, axis=0)
                cent[c] = np.array(
                    [int(v) // len(rows) for v in s], dtype=object
                )
    return ids, order, dists


# --- dedup_semantic_boundary_audit -------------------------------------------


def test_semantic_boundary_audit_matches_numpy(spark, sf_dir):
    """Third-probe boundary audit replayed brute-force: exact integer
    Lloyd, per-vector (d1, d2) gap gate, probe sets top-2 vs
    top-2-plus-boundary-third, slice-truth visibility AND full-corpus
    distinct candidate-pair budgets."""
    from metadata_extractors_api_spark.operators.pipeline import (
        SEM_AUDIT_N,
        SEM_BOUNDARY_DEN,
        SEM_T,
    )

    embs = _embs(sf_dir)
    ids, order, dists = _sem_model(embs)

    top2, p3, boundary = {}, {}, set()
    for i in ids:
        o = order(i)
        d = dists(i)
        d1, d2 = d[o[0]], d[o[1]]
        top2[i] = set(o[:2])
        if (d2 - d1) * SEM_BOUNDARY_DEN <= d1:
            boundary.add(i)
            p3[i] = set(o[:3])
        else:
            p3[i] = set(o[:2])

    def cand(probes):
        by_c = {}
        for i, cs in probes.items():
            for c in cs:
                by_c.setdefault(c, []).append(i)
        pairs = set()
        for mem in by_c.values():
            mem.sort()
            for x in range(len(mem)):
                for y in range(x + 1, len(mem)):
                    pairs.add((mem[x], mem[y]))
        return len(pairs)

    sl = [i for i in ids if i < SEM_AUDIT_N]
    truth = {
        (i, j)
        for ix, i in enumerate(sl)
        for j in sl[ix + 1 :]
        if _cos(embs[i], embs[j]) >= SEM_T
    }
    v2 = sum(1 for (i, j) in truth if top2[i] & top2[j])
    v3 = sum(1 for (i, j) in truth if p3[i] & p3[j])

    r = mdx.QUERIES["dedup_semantic_boundary_audit"](
        spark, sf_dir
    ).collect()[0]
    assert r["n_truth"] == len(truth)
    assert (r["n_top2"], r["n_top3b"]) == (v2, v3)
    assert r["recall_top2_e6"] == v2 * 10**6 // max(len(truth), 1)
    assert r["recall_top3b_e6"] == v3 * 10**6 // max(len(truth), 1)
    assert r["n_boundary_vecs"] == len(boundary)
    assert (r["n_cand_top2"], r["n_cand_top3b"]) == (
        cand(top2),
        cand(p3),
    )
    # the third probe can only ADD visibility and budget
    assert v3 >= v2 and r["n_cand_top3b"] >= r["n_cand_top2"]

# --- tokenizer_unigram_prune --------------------------------------------------


def test_unigram_prune_matches_python_loop(spark, tmp_path_factory):
    """The prune round replayed in plain Python on a hand corpus:
    BPE-weighted init vocab, E1 Viterbi, M1 recount, rank-prune the
    lightest UNIGRAM_PRUNE_PCT% multi-char pieces (chars persist),
    E2 Viterbi under the pruned vocab, M2 recount, L1 residual."""
    import collections

    from metadata_extractors_api_spark.operators.corpus import (
        BPE_MARKER,
        BPE_TRAIN_ROUNDS,
        EM_TOP,
        UNIGRAM_PRUNE_PCT,
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
    d = str(tmp_path_factory.mktemp("prunecorpus"))
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

    def recount(voc):
        counts = collections.Counter()
        for w, n in wc.items():
            if len(w) > WP_MAX_CHARS:
                continue
            _sc, _np, path = viterbi(w, voc)
            for p in path.split(" "):
                if p:
                    counts[p] += n
        new = {s: m for s, m in counts.items() if len(s) > 1}
        for c in chars:
            new[c] = counts.get(c, 0)
        return new

    voc1 = recount(vocab)
    multi = sorted(
        ((s, m) for s, m in voc1.items() if len(s) > 1),
        key=lambda kv: (kv[1], kv[0]),
    )
    n_multi = len(multi)
    k = n_multi * UNIGRAM_PRUNE_PCT // 100
    pruned = {s: m for s, m in multi[k:]}
    for c in chars:
        pruned[c] = voc1.get(c, 0)
    voc2 = recount(pruned)
    res = sum(
        abs(voc2.get(s, 0) - pruned.get(s, 0))
        for s in set(voc2) | set(pruned)
    )
    ranked = sorted(voc2.items(), key=lambda kv: (-kv[1], kv[0]))[:EM_TOP]
    want = [
        (s, m, i + 1, n_multi, k, res) for i, (s, m) in enumerate(ranked)
    ]
    got = [
        (
            r["symbol"],
            r["mass"],
            r["rk"],
            r["n_multi_before"],
            r["n_pruned"],
            r["res_after_prune_units"],
        )
        for r in mdx.QUERIES["tokenizer_unigram_prune"](spark, d).collect()
    ]
    assert sorted(got) == sorted(want)
    # prune sanity: something actually died and the survivors re-absorb
    assert k > 0 and res > 0

# --- multimodal_audio_resample --------------------------------------------------


def test_audio_resample_matches_naive_stride(spark, sf_dir):
    """Decimation witnesses recomputed with a naive character walk (no
    numpy stride tricks, no decoder): manual sample list, manual
    every-Nth selection, manual running sums — plus the dead-letter
    routing for the corruption slots."""
    from metadata_extractors_api_spark.operators.llm import (
        _CORRUPT_MAGIC_MOD,
        _CORRUPT_TRUNC_MOD,
        AUDIO_DECIM,
    )

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    want = {}
    for d, text in texts.items():
        if d % _CORRUPT_TRUNC_MOD == 0 and len(text) > 0:
            want[d] = ("truncated_data", None, None, None, None, None)
            continue
        if d % _CORRUPT_MAGIC_MOD == 0:
            want[d] = ("unsupported_container", None, None, None, None, None)
            continue
        s = [ord(c) - 64 for c in text]
        kept = []
        for i, v in enumerate(s):
            if i % AUDIO_DECIM == 0:
                kept.append(v)
        want[d] = (
            "ok",
            len(s),
            len(kept),
            sum(v * v for v in s),
            sum(v * v for v in kept),
            sum(v * (k + 1) for k, v in enumerate(kept)),
        )
    got = {
        r["doc_id"]: (
            r["status"],
            r["n_in"],
            r["n_out"],
            r["energy_in"],
            r["energy_out"],
            r["wsum_out"],
        )
        for r in mdx.QUERIES["multimodal_audio_resample"](
            spark, sf_dir
        ).collect()
    }
    assert got == want
    # decimation sanity on the ok rows: output strictly smaller, energy
    # never grows
    oks = [v for v in got.values() if v[0] == "ok" and v[1] and v[1] > 1]
    assert oks and all(v[2] < v[1] and v[4] <= v[3] for v in oks)

# --- multimodal_audio_autocorr --------------------------------------------------


def test_audio_autocorr_matches_naive_loops(spark, sf_dir):
    """Autocorrelation sums, zero crossings, and dominant lag recomputed
    with naive python loops (no numpy views, no decoder)."""
    from metadata_extractors_api_spark.operators.llm import AUDIO_AC_LAGS

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    want = {}
    for d, text in texts.items():
        s = [ord(c) - 64 for c in text]
        acs = {}
        for L in AUDIO_AC_LAGS:
            acs[L] = sum(
                s[i] * s[i + L] for i in range(max(len(s) - L, 0))
            )
        best = max(acs.values())
        dom = next(L for L in AUDIO_AC_LAGS if acs[L] == best)
        zc = sum(
            1 for i in range(max(len(s) - 1, 0)) if s[i] * s[i + 1] < 0
        )
        want[d] = (
            len(s),
            sum(v * v for v in s),
            tuple(acs[L] for L in AUDIO_AC_LAGS),
            zc,
            dom,
        )
    got = {
        r["doc_id"]: (
            r["n_samples"],
            r["ac0"],
            tuple(r[f"ac{L}"] for L in AUDIO_AC_LAGS),
            r["n_zero_cross"],
            r["dominant_lag"],
        )
        for r in mdx.QUERIES["multimodal_audio_autocorr"](
            spark, sf_dir
        ).collect()
    }
    assert got == want
    # Cauchy-Schwarz sanity: no lagged sum exceeds the energy
    assert all(all(a <= v[1] for a in v[2]) for v in got.values())


# --- embedding_int8_quant_audit -------------------------------------------------


def test_int8_quant_audit_matches_python_replay(spark, sf_dir):
    """SQ8 quantize/reconstruct replayed with plain-python integer
    arithmetic (magnitude/sign-split divisions, no numpy)."""
    from metadata_extractors_api_spark.operators.pipeline import (
        INT8_PEAK,
        KM_SCALE,
    )

    embs = _embs(sf_dir)
    want = {}
    for vid, vec in embs.items():
        xs = [math.floor(float(x) * KM_SCALE) for x in vec]
        scale = max(max(abs(v) for v in xs), 1)
        norm = sum(v * v for v in xs)

        def sdiv(a, b):
            return -((-a) // b) if a < 0 else a // b

        qs = [sdiv(v * INT8_PEAK, scale) for v in xs]
        rs = [sdiv(c * scale, INT8_PEAK) for c in qs]
        sq = sum((x - r) ** 2 for x, r in zip(xs, rs))
        want[vid] = (
            scale,
            norm,
            sq,
            sq * 10**6 // max(norm, 1),
            sum(1 for c in qs if abs(c) == INT8_PEAK),
        )
    got = {
        r["vec_id"]: (
            r["scale"],
            r["norm"],
            r["sq_err"],
            r["rel_err_e6"],
            r["n_peak"],
        )
        for r in mdx.QUERIES["embedding_int8_quant_audit"](
            spark, sf_dir
        ).collect()
    }
    assert got == want
    # SQ8 sanity: every vector saturates at least its own max coord,
    # and relative error is small but nonzero somewhere
    assert all(v[4] >= 1 for v in got.values())
    assert any(v[2] > 0 for v in got.values())


# --- multimodal_audio_spectral_bands ---------------------------------------------


def test_audio_spectral_bands_matches_naive_dft(spark, sf_dir):
    """Band powers recomputed with a NAIVE complex-DFT loop (cmath
    exp(-jwi) rounded back to exact integers at the integer-twiddle
    bins) — not the sign-pattern shortcut the operator and oracle
    share, so a wrong sign cycle in the shared formula fails here."""
    import cmath

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    want = {}
    for d, text in texts.items():
        s = [ord(c) - 64 for c in text]
        comps = {}
        for band, w in (("dc", 0.0), ("quarter", math.pi / 2),
                        ("nyquist", math.pi)):
            z = sum(v * cmath.exp(-1j * w * i) for i, v in enumerate(s))
            comps[band] = (round(z.real), round(z.imag))
        powers = {b: re * re + im * im for b, (re, im) in comps.items()}
        best = max(powers.values())
        dom = next(
            b for b in ("dc", "quarter", "nyquist") if powers[b] == best
        )
        want[d] = (
            len(s),
            comps["dc"][0],
            comps["nyquist"][0],
            comps["quarter"][0],
            comps["quarter"][1],
            powers["dc"],
            powers["quarter"],
            powers["nyquist"],
            dom,
        )
    got = {
        r["doc_id"]: (
            r["n_samples"],
            r["dc"],
            r["ny_re"],
            r["q_re"],
            r["q_im"],
            r["p_dc"],
            r["p_quarter"],
            r["p_nyquist"],
            r["dominant_band"],
        )
        for r in mdx.QUERIES["multimodal_audio_spectral_bands"](
            spark, sf_dir
        ).collect()
    }
    assert got == want
    # Parseval-flavored sanity: each bin power is bounded by n * energy
    for d, text in texts.items():
        s = [ord(c) - 64 for c in text]
        bound = max(len(s), 1) * sum(v * v for v in s)
        assert max(want[d][5], want[d][6], want[d][7]) <= bound


# --- dq_benford_screen ------------------------------------------------------------


def test_benford_screen_matches_python_replay(spark, sf_dir):
    """Digit census + deviations replayed with plain-python ints from
    the raw parquet (str() of the floored total, no SQL, no numpy)."""
    from metadata_extractors_api_spark.operators.stats import (
        BENFORD_ALERT_E6,
        BENFORD_E6,
    )

    t = pq.read_table(f"{sf_dir}/orders.parquet")
    prices = t["o_totalprice"].to_pylist()
    counts = {d: 0 for d in range(1, 10)}
    for p in prices:
        counts[int(str(math.floor(p))[0])] += 1
    n_total = sum(counts.values())
    assert n_total == len(prices)  # every first digit is 1..9
    want = {}
    for d in range(1, 10):
        expected = n_total * BENFORD_E6[d]
        dev = counts[d] * 10**6 - expected
        rel = (abs(dev) // n_total) * 10**6 // BENFORD_E6[d]
        want[d] = (
            counts[d], n_total, BENFORD_E6[d], expected, dev, rel,
            rel > BENFORD_ALERT_E6,
        )
    got = {
        r["digit"]: (
            r["n_obs"], r["n_total"], r["benford_e6"], r["expected_e6"],
            r["dev_e6"], r["rel_abs_dev_e6"], r["flagged"],
        )
        for r in mdx.QUERIES["dq_benford_screen"](spark, sf_dir).collect()
    }
    assert got == want
    # the screen must actually FIRE on the non-Benford TPC-H totals
    assert any(v[6] for v in want.values())
    # and the signed deviations must cancel (both shares sum to 1e6)
    assert sum(v[4] for v in want.values()) == 0


# --- round-10 optimization-pass rewrites: independent replays ---------------


def test_referential_integrity_matches_python_sets(spark, sf_dir):
    """Orphan counts replayed with plain-python sets (literal NOT
    EXISTS), guarding the left-join-against-distinct-keys rewrite."""
    li = pq.read_table(f"{sf_dir}/lineitem.parquet")
    o = pq.read_table(f"{sf_dir}/orders.parquet")
    okeys = set(o["o_orderkey"].to_pylist())
    pkeys = set(
        pq.read_table(f"{sf_dir}/part.parquet")["p_partkey"].to_pylist()
    )
    skeys = set(
        pq.read_table(f"{sf_dir}/supplier.parquet")["s_suppkey"].to_pylist()
    )
    ckeys = set(
        pq.read_table(f"{sf_dir}/customer.parquet")["c_custkey"].to_pylist()
    )
    lo = li["l_orderkey"].to_pylist()
    lp = li["l_partkey"].to_pylist()
    ls = li["l_suppkey"].to_pylist()
    oc = o["o_custkey"].to_pylist()
    want = {
        "lineitem->orders": (len(lo), sum(1 for k in lo if k not in okeys)),
        "lineitem->part": (len(lo), sum(1 for k in lp if k not in pkeys)),
        "lineitem->supplier": (len(lo), sum(1 for k in ls if k not in skeys)),
        "orders->customer": (len(oc), sum(1 for k in oc if k not in ckeys)),
    }
    got = {
        r["relation"]: (r["fk_rows"], r["orphans"])
        for r in mdx.QUERIES["dq_referential_integrity"](
            spark, sf_dir
        ).collect()
    }
    assert got == want


def test_domain_reweight_matches_relational_replay(spark, sf_dir):
    """The driver-replayed multiplicative-weights loop checked against
    an independent plain-python replay of the ORIGINAL relational
    rounds (per-source rollup from raw parquet, exact floor
    divisions)."""
    from metadata_extractors_api_spark.operators.training import (
        REWEIGHT_ETA_E6,
        REWEIGHT_STEPS,
    )

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    stats = {}
    for src, text in zip(t["source"].to_pylist(), t["text"].to_pylist()):
        n, k = stats.get(src, (0, 0))
        stats[src] = (n + 1, k + len(text.split(" ")))
    toks_all = sum(k for _, k in stats.values())
    docs_all = sum(n for n, _ in stats.values())
    n_src = len(stats)
    mean_all = toks_all * 1_000_000 // docs_all
    excess = {
        s: max(k * 1_000_000 // n - mean_all, 0)
        for s, (n, k) in stats.items()
    }
    emax = max(excess.values())
    exn = {s: e * 1_000_000 // max(emax, 1) for s, e in excess.items()}
    w = {s: 1_000_000 // n_src for s in stats}
    for _ in range(REWEIGHT_STEPS):
        wu = {
            s: w[s]
            * (1_000_000 + REWEIGHT_ETA_E6 * exn[s] // 1_000_000)
            // 1000
            for s in w
        }
        z = sum(wu.values())
        w = {s: wu[s] * 1_000_000 // z for s in wu}
    got = {
        r["source"]: (r["excess_n_e6"], r["w_final_e6"])
        for r in mdx.QUERIES["mix_domain_reweight"](spark, sf_dir).collect()
    }
    assert got == {s: (exn[s], w[s]) for s in stats}


def test_e2e_curation_funnel_matches_python(spark, sf_dir):
    """The one-pass conditional-aggregation funnel replayed literally:
    normalize -> md5 min-doc_id dedup -> quality gate -> greedy packing
    over the FILTERED per-language sequence (the semantics the fused
    window must preserve bit-for-bit)."""
    import hashlib
    import re as _re

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    rows = sorted(
        zip(
            t["doc_id"].to_pylist(),
            t["lang"].to_pylist(),
            t["text"].to_pylist(),
        )
    )
    norm = {}
    for doc_id, lang, text in rows:
        nt = _re.sub(" +", " ", _re.sub("[^a-z0-9 ]", "", text.lower()))
        norm[doc_id] = (lang, nt.strip())
    first = {}
    for doc_id in sorted(norm):
        h = hashlib.md5(norm[doc_id][1].encode()).hexdigest()
        first.setdefault(h, doc_id)
    kept = set(first.values())
    want = {}
    by_lang = {}
    for doc_id in sorted(norm):
        lang, nt = norm[doc_id]
        cell = want.setdefault(lang, [0, 0, 0, set()])
        cell[0] += 1
        if doc_id in kept:
            cell[1] += 1
            n_tok = len(nt.split(" "))
            if 10 <= n_tok <= 1000:
                cell[2] += 1
                run = by_lang.get(lang, 0) + n_tok
                by_lang[lang] = run
                cell[3].add((run - 1) // 2048)
    expect = {
        lang: (c[0], c[1], c[2], len(c[3])) for lang, c in want.items()
    }
    got = {
        r["lang"]: (
            r["n_docs_in"],
            r["n_after_dedup"],
            r["n_after_quality"],
            r["n_bins"],
        )
        for r in mdx.QUERIES["pipeline_e2e_curation"](spark, sf_dir).collect()
    }
    assert got == expect


def test_bloom_prefilter_matches_python_replay(spark, sf_dir):
    """The cnt-weighted audit replayed with hashlib ints: per-key Bloom
    verdicts from the same md5 double-hash, fact tallies as
    count-weighted sums over keys (the rewrite under test)."""
    import hashlib

    from metadata_extractors_api_spark.operators.scale import (
        _BLOOM_BITS,
        _BLOOM_K,
        _BLOOM_WORD,
    )

    def h32(salt, key):
        return int(
            hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:8], 16
        )

    c = pq.read_table(f"{sf_dir}/customer.parquet")
    keys = {
        k
        for k, seg in zip(
            c["c_custkey"].to_pylist(), c["c_mktsegment"].to_pylist()
        )
        if seg == "BUILDING"
    }
    words = {}
    for k in keys:
        h1, h2 = h32("b1", k), h32("b2", k)
        for i in range(_BLOOM_K):
            p = (h1 + i * h2) % _BLOOM_BITS
            words[p // _BLOOM_WORD] = words.get(p // _BLOOM_WORD, 0) | (
                1 << (p % _BLOOM_WORD)
            )
    o = pq.read_table(f"{sf_dir}/orders.parquet")["o_custkey"].to_pylist()
    cnt = {}
    for k in o:
        cnt[k] = cnt.get(k, 0) + 1
    n_probe = n_pass = n_true = n_fp = 0
    for k, n in cnt.items():
        h1, h2 = h32("b1", k), h32("b2", k)
        ok = all(
            words.get(((h1 + i * h2) % _BLOOM_BITS) // _BLOOM_WORD, 0)
            >> (((h1 + i * h2) % _BLOOM_BITS) % _BLOOM_WORD)
            & 1
            for i in range(_BLOOM_K)
        )
        n_probe += n
        if ok:
            n_pass += n
        if k in keys:
            n_true += n
        if ok and k not in keys:
            n_fp += n
    row = mdx.QUERIES["agg_bloom_prefilter"](spark, sf_dir).collect()[0]
    assert (
        row["n_probe"],
        row["n_pass"],
        row["n_true"],
        row["n_false_pos"],
    ) == (n_probe, n_pass, n_true, n_fp)
    assert row["bits_set"] == sum(bin(w).count("1") for w in words.values())
