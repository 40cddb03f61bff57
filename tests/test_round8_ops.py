"""Independent ground-truth tests for round-8 operators: plain-Python
or hand-computed answers, deliberately NOT the shared Spark/DuckDB
oracle formulas — when both engines share a formula, the sweep cannot
catch a formula bug (the round-3 review's blind spot, closed per-round
since)."""

from __future__ import annotations

import collections
import hashlib

import metadata_extractors_api_spark as mdx
from pyspark.sql import functions as F


# --- consistent-hash ring ----------------------------------------------------


def _py_ring(n_shards: int, vnodes: int) -> list[tuple[int, int]]:
    pts = []
    for s in range(n_shards):
        for v in range(vnodes):
            h = hashlib.md5(f"ring:{s}:{v}".encode()).hexdigest()[:8]
            pts.append((int(h, 16), s))
    return sorted(pts)


def _py_assign(key: str, ring: list[tuple[int, int]]) -> int:
    h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    for pos, s in ring:
        if pos >= h:
            return s
    return ring[0][1]


def test_shard_col_matches_python_ring(spark):
    """The Spark ring expression recomputed per key with an
    independent hashlib walk (linear scan successor, not
    filter/array_min)."""
    from metadata_extractors_api_spark.operators.training import (
        SHARD_N,
        SHARD_VNODES,
        _shard_col,
    )

    ring = _py_ring(SHARD_N, SHARD_VNODES)
    keys = [str(k) for k in range(500)] + ["", "x", "▁weird", "a b c"]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {
        r["key"]: r["shard"]
        for r in df.select(
            "key", _shard_col(F.col("key")).alias("shard")
        ).collect()
    }
    want = {k: _py_assign(k, ring) for k in keys}
    assert got == want


def test_consistent_hash_remap_rate_bounded_on_shard_add():
    """THE property consistent hashing buys: growing the fleet from
    SHARD_N to SHARD_N+1 remaps roughly 1/(N+1) of keys (new shard
    claims its arc), never the ~N/(N+1) modular hashing would."""
    from metadata_extractors_api_spark.operators.training import (
        SHARD_N,
        SHARD_VNODES,
    )

    ring_a = _py_ring(SHARD_N, SHARD_VNODES)
    ring_b = _py_ring(SHARD_N + 1, SHARD_VNODES)
    keys = [str(k) for k in range(20_000)]
    moved = sum(
        1 for k in keys if _py_assign(k, ring_a) != _py_assign(k, ring_b)
    )
    frac = moved / len(keys)
    ideal = 1 / (SHARD_N + 1)
    assert frac < 2.5 * ideal, (frac, ideal)
    # every moved key moved TO the new shard (old arcs are untouched)
    assert all(
        _py_assign(k, ring_b) == SHARD_N
        for k in keys
        if _py_assign(k, ring_a) != _py_assign(k, ring_b)
    )
    # modular hashing, for contrast, remaps the vast majority
    def mod_assign(k: str, n: int) -> int:
        return int(hashlib.md5(k.encode()).hexdigest()[:8], 16) % n

    mod_moved = sum(
        1
        for k in keys
        if mod_assign(k, SHARD_N) != mod_assign(k, SHARD_N + 1)
    )
    assert mod_moved / len(keys) > 0.8


# --- label propagation -------------------------------------------------------


def test_label_propagation_matches_python_reference(spark, sf_dir):
    """LPA recomputed with plain-Python dicts from the raw parquet
    edge list: same half-round schedule, plurality with (count DESC,
    label ASC) tie-break via min() on (-n, lbl)."""
    from metadata_extractors_api_spark.operators.corpus import (
        LPA_MIN_QTY,
        LPA_ROUNDS,
        LPA_TOP,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    edges = sorted(
        set(
            (r["o_custkey"] * 2, r["l_suppkey"] * 2 + 1)
            for r in o.join(
                li.filter(F.col("l_quantity") >= LPA_MIN_QTY),
                o.o_orderkey == li.l_orderkey,
            ).collect()
        )
    )
    lc = {c: c for c, _ in edges}
    ls = {s: s for _, s in edges}

    def half(src_lbls, by_dst):
        out = {}
        for dst, srcs in by_dst.items():
            cnt = collections.Counter(src_lbls[u] for u in srcs)
            out[dst] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        return out

    by_s = collections.defaultdict(list)
    by_c = collections.defaultdict(list)
    for c, s in edges:
        by_s[s].append(c)
        by_c[c].append(s)
    prev_lc = prev_ls = None
    for _ in range(LPA_ROUNDS):
        prev_ls = ls
        ls = half(lc, by_s)
        prev_lc = lc
        lc = half(ls, by_c)
    census = collections.Counter(list(lc.values()) + list(ls.values()))
    ranked = sorted(census.items(), key=lambda kv: (-kv[1], kv[0]))[:LPA_TOP]
    n_changed = sum(1 for n in lc if lc[n] != prev_lc[n]) + sum(
        1 for n in ls if ls[n] != prev_ls[n]
    )
    want = [
        (lbl, n, i + 1, n_changed) for i, (lbl, n) in enumerate(ranked)
    ]
    got = [
        (r["community"], r["n_members"], r["rk"], r["n_changed"])
        for r in mdx.QUERIES["graph_label_propagation"](
            spark, sf_dir
        ).collect()
    ]
    assert sorted(got) == sorted(want)


# --- WordPiece greedy encode -------------------------------------------------


def test_wordpiece_encode_matches_python_greedy(spark, tmp_path_factory):
    """The full wordpiece pipeline on a hand corpus: python trains the
    merges (independent trainer from test_round7_ops' spec), builds
    the vocab, greedy-encodes every word with a plain loop, and the
    census must equal the Spark query's."""
    from metadata_extractors_api_spark.operators.corpus import (
        BPE_MARKER,
        BPE_TRAIN_ROUNDS,
        WP_MAX_CHARS,
        WP_MAXP,
        WP_STEPS,
        WP_TOP,
    )
    from tests.test_round7_ops import _py_bpe_train

    docs = [
        "the cat sat on the mat",
        "the cat ate the rat",
        "a cataract on the catamaran",  # 'catamaran' has 9 chars; fits
        "supercalifragilistic stays skipped entirely",  # >12 chars word
        "mat rat cat bat",
    ]
    d = str(tmp_path_factory.mktemp("wpcorpus"))
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    ).write.parquet(f"{d}/documents.parquet")

    wc = collections.Counter(
        w for t in docs for w in t.split(" ") if w
    )
    merges = _py_bpe_train(dict(wc), BPE_TRAIN_ROUNDS)
    syms = {w: " " + " ".join(list(BPE_MARKER + w)) + " " for w in wc}
    for _k, a, b, _n in merges:
        for w in syms:
            syms[w] = syms[w].replace(f" {a} {b} ", f" {a}{b} ")
    vocab = {
        p
        for s in syms.values()
        for p in s.split()
        if p and len(p) <= WP_MAXP
    }

    def greedy(word: str) -> list[str]:
        rest = BPE_MARKER + word
        out = []
        steps = 0
        while rest and steps < WP_STEPS:
            steps += 1
            for ln in range(min(len(rest), WP_MAXP), 0, -1):
                if rest[:ln] in vocab:
                    out.append(rest[:ln])
                    rest = rest[ln:]
                    break
            else:
                out.append("?")
                rest = rest[1:]
        assert not rest, (word, rest)
        return out

    census = collections.Counter()
    skipped = 0
    for w, n in wc.items():
        if len(w) > WP_MAX_CHARS:
            skipped += 1
            continue
        for p in greedy(w):
            census[p] += n
    ranked = sorted(census.items(), key=lambda kv: (-kv[1], kv[0]))[:WP_TOP]
    want = [
        (p, n, len(p), i + 1, skipped) for i, (p, n) in enumerate(ranked)
    ]
    got = [
        (r["piece"], r["uses"], r["n_chars"], r["rk"], r["n_words_skipped"])
        for r in mdx.QUERIES["tokenizer_wordpiece_encode"](spark, d).collect()
    ]
    assert sorted(got) == sorted(want)
    assert skipped == 1  # the planted long word was censused, not lost


# --- dispatch diff -----------------------------------------------------------


def test_dispatch_diff_classifies_every_mutation_kind(spark):
    """Snapshot B plants exactly one mutation of each kind; the diff
    must classify the right files under the right status, and the
    installation bump (yadg~=5.0 -> 5.1) must NOT surface — dispatch
    consumes usage+template, not installation."""
    rows = {
        r["file_id"]: r
        for r in mdx.QUERIES["extract_dispatch_diff"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    # biologic files 1-3: same extractor, template-changed rendering
    for fid in (1, 2, 3):
        r = rows[fid]
        assert r["status"] == "changed", r
        assert r["extractor_a"] == r["extractor_b"] == "yadg"
        assert "'biologic-mpr'" in r["rendered_a"]
        assert "'mpr-v2'" in r["rendered_b"]
    # example-csv files 4, 6: extractor deregistered
    for fid in (4, 6):
        assert rows[fid]["status"] == "removed", rows[fid]
        assert rows[fid]["extractor_b"] is None
    # orphan file 5: newly dispatchable
    assert rows[5]["status"] == "added", rows[5]
    assert rows[5]["extractor_a"] is None
    assert rows[5]["extractor_b"] == "bin-extract"
    assert set(rows) == {1, 2, 3, 4, 5, 6}


# --- Bloom membership ----------------------------------------------------------


def test_bloom_membership_invariant_and_python_replay(spark, sf_dir):
    """The Bloom one-sided guarantee (NO false negatives, ever) plus a
    plain-Python bitmap replay: an independent hashlib/set build of the
    same sketch must agree on every probe verdict and the fill count."""
    from metadata_extractors_api_spark.operators.stats import (
        BLOOM_K,
        BLOOM_WORDS,
    )

    rows = mdx.QUERIES["agg_bloom_membership"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        if r["true_member"]:
            assert r["claimed_member"], r  # false negatives are impossible

    bits = BLOOM_WORDS * 63
    keys = set(
        str(r["o_custkey"])
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey")
        .collect()
    )

    def positions(key: str):
        return [
            int(hashlib.md5(f"bloom{j}:{key}".encode()).hexdigest()[:8], 16)
            % bits
            for j in range(BLOOM_K)
        ]

    bitset = set(p for k in keys for p in positions(k))
    probes = sorted(keys)[:10] + [f"absent:{i}" for i in range(10)]
    want = {
        k: all(p in bitset for p in positions(k)) for k in probes
    }
    got = {r["key"]: r["claimed_member"] for r in rows}
    assert got == want
    assert rows[0]["n_set_bits"] == len(bitset)


# --- Viterbi segmentation ------------------------------------------------------


def test_viterbi_segment_matches_python_dp(spark, tmp_path_factory):
    """Full pipeline on a hand corpus: python trains merges, builds the
    weighted vocab (+ 0-weight char backstop), runs a classic position
    DP per word (maximize score, then fewest pieces, then lexicographic
    path — tuple compare), and the path census must match."""
    from metadata_extractors_api_spark.operators.corpus import (
        BPE_MARKER,
        BPE_TRAIN_ROUNDS,
        VIT_TOP,
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
    d = str(tmp_path_factory.mktemp("vitcorpus"))
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

    def viterbi(word: str):
        padded = BPE_MARKER + word
        best = {1: (0, 0, "")}  # pos -> (-score is handled via compare)
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

    census = {}
    for w, n in wc.items():
        if len(w) > WP_MAX_CHARS:
            continue
        _sc, np_, path = viterbi(w)
        e = census.setdefault(path, [np_, 0, 0])
        e[1] += 1
        e[2] += n
    ranked = sorted(census.items(), key=lambda kv: (-kv[1][2], kv[0]))[
        :VIT_TOP
    ]
    want = [
        (path, np_, nw, mass, i + 1)
        for i, (path, (np_, nw, mass)) in enumerate(ranked)
    ]
    got = [
        (r["path"], r["n_pieces"], r["n_words"], r["mass"], r["rk"])
        for r in mdx.QUERIES["tokenizer_viterbi_segment"](spark, d).collect()
    ]
    assert sorted(got) == sorted(want)


# --- install-plan walk ---------------------------------------------------------


def test_install_plan_reject_over_skip_semantics(spark):
    """The reference's install() RAISES on the first non-pip spec (it
    does not skip to a later pip spec — __init__.py:193-216); the
    fixture's conda-first alt-extractor pins exactly that: classified
    unsupported at index 1 even though a pip spec follows at index 2."""
    rows = {
        r["extractor_id"]: r
        for r in mdx.QUERIES["extract_install_plan"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert rows["alt-extractor"]["status"] == "error_method_unsupported"
    assert rows["alt-extractor"]["chosen_method"] == "conda"
    assert rows["alt-extractor"]["chosen_idx"] == 1
    for eid, pkgs, reqpy in (
        ("yadg", "yadg~=5.0", ">=3.9"),
        ("csv-extract", "csvx>=1", None),
    ):
        r = rows[eid]
        assert r["status"] == "ok_pip", r
        assert r["chosen_method"] == "pip"
        assert r["packages"] == pkgs
        assert r["requires_python"] == reqpy
    assert set(rows) == {"yadg", "alt-extractor", "csv-extract"}
