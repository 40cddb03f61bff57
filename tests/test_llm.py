"""LLM-operator behavior tests: the fixture corpus contains no real
near-duplicates (max 3-gram Jaccard ~0.03), so these tests inject
synthetic dups to prove the detectors detect."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

import metadata_extractors_api_spark as mdx
from metadata_extractors_api_spark.operators.llm import (
    dot_scaled,
    minhash_signatures,
)


def _dup_corpus(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest to hide from the loud hunting party"
    )
    near = base.replace("green", "dark").replace("loud", "quiet")
    other = (
        "completely different text about spark query engines and shuffle "
        "partitioning strategies for large scale distributed aggregation"
    )
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": [base, near, other]})
    )


def test_minhash_finds_planted_near_dup(spark):
    docs = _dup_corpus(spark)
    sig = minhash_signatures(docs)
    assert sig.count() == 3
    rows = {r["doc_id"]: [r[f"m{j}"] for j in range(64)] for r in sig.collect()}
    agree_near = sum(a == b for a, b in zip(rows[1], rows[2]))
    agree_far = sum(a == b for a, b in zip(rows[1], rows[3]))
    assert agree_near > 32, f"near-dup signatures should mostly agree ({agree_near})"
    assert agree_far < 8, f"unrelated docs should rarely agree ({agree_far})"


def test_dot_scaled_matches_numpy(spark):
    import numpy as np

    a = [0.5, -1.25, 2.0, 0.125]
    b = [1.0, 0.5, -0.25, 4.0]
    df = spark.createDataFrame(
        [(a, b)], "a array<float>, b array<float>"
    ).select(dot_scaled(F.col("a"), F.col("b")).alias("d"))
    got = df.collect()[0]["d"] / 1e12
    want = float(np.dot(np.array(a, dtype="float32"), np.array(b, dtype="float32")))
    assert abs(got - want) < 1e-9


def test_sim_topk_self_is_best(spark, sf_dir):
    rows = mdx.QUERIES["sim_topk"](spark, sf_dir).collect()
    assert rows[0]["vec_id"] == 0 and abs(rows[0]["score"] - 1.0) < 1e-6
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_dedup_exact_all_unique_corpus(spark, sf_dir):
    df = mdx.QUERIES["dedup_exact"](spark, sf_dir)
    assert df.filter(F.col("n_copies") > 1).count() == 0


def test_prefix_filter_loses_no_pairs(spark, sf_dir):
    """The AllPairs prefix filter is exact, not probabilistic: the
    prefix-filtered pair set must EQUAL the full inverted-index join's
    pair set at the same Jaccard threshold (here over the whole
    sf0.001 corpus, where brute force is affordable)."""
    from metadata_extractors_api_spark.operators.llm import (
        PREFIX_T,
        shingles_col,
        tokens_col,
    )
    from metadata_extractors_api_spark.catalog import load

    got = {
        (r["doc_a"], r["doc_b"])
        for r in mdx.QUERIES["dedup_jaccard_prefix"](spark, sf_dir).collect()
    }
    ex = (
        load(spark, sf_dir, "documents")
        .select("doc_id", tokens_col().alias("_toks"))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(shingles_col(toks=F.col("_toks")))
            ).alias("shingle"),
        )
    )
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.withColumnsRenamed({"doc_id": "doc_a", "n": "na"})
    sb = sizes.withColumnsRenamed({"doc_id": "doc_b", "n": "nb"})
    want = {
        (r["doc_a"], r["doc_b"])
        for r in inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            F.col("i") / (F.col("na") + F.col("nb") - F.col("i")) >= PREFIX_T
        )
        .collect()
    }
    assert got == want


def test_langid_deterministic(spark, sf_dir):
    a = mdx.QUERIES["text_langid"](spark, sf_dir).toPandas().sort_values("doc_id")
    b = mdx.QUERIES["text_langid"](spark, sf_dir).toPandas().sort_values("doc_id")
    assert a["pred_lang"].tolist() == b["pred_lang"].tolist()


def test_multimodal_decode_real_ppm():
    """Independent ground truth for the REAL decoder (not the shared
    generation formula): a hand-written PPM with comments and odd
    whitespace in the header must parse to the exact known raster, and
    unsupported codecs must refuse loudly."""
    import pytest

    from metadata_extractors_api_spark.operators.llm import (
        decode_image,
        resize_nearest,
    )

    raster = bytes(range(2 * 3 * 3))  # 2x3 image, values 0..17
    payload = b"P6 # comment after magic\n# full-line comment\n 3\t2 255\n" + raster
    m = decode_image(payload)
    assert (m["width"], m["height"], m["maxval"]) == (3, 2, 255)
    assert m["pixels"].shape == (2, 3, 3)
    assert m["pixels"].tobytes() == raster

    with pytest.raises(ValueError):
        decode_image(b"\x89PNG")
    with pytest.raises(ValueError):
        decode_image(b"P6\n3 2\n255\n" + raster[:-1])  # truncated raster


def test_multimodal_resize_nearest_known_values():
    """resize_nearest against a hand-computed nearest-neighbor answer:
    4x2 -> target 2 gives 2x1 sampling source columns 0,2 and row 0."""
    import numpy as np

    from metadata_extractors_api_spark.operators.llm import resize_nearest

    px = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
    out = resize_nearest(px, 2)
    assert out.shape == (1, 2, 3)
    assert out[0, 0].tolist() == px[0, 0].tolist()
    assert out[0, 1].tolist() == px[0, 2].tolist()
    # inside the budget: untouched passthrough
    assert resize_nearest(px, 224) is px


def _boilerplate_dir(spark, tmp_path_factory, n_docs=10_000):
    """An adversarial corpus: n identical boilerplate docs. Every doc
    lands in the SAME (band, hash) bucket in every band, so an
    unguarded LSH self-join would materialize ~n^2/2 pairs per band."""
    out = str(tmp_path_factory.mktemp("boilerplate"))
    boiler = "terms of service apply contact support for more information today"
    df = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.lit(boiler).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("web").alias("source"),
        F.length(F.lit(boiler)).cast("long").alias("n_chars"),
    )
    df.coalesce(4).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_lsh_bucket_cap_quarantines_boilerplate(spark, tmp_path_factory):
    """10k identical docs: the MAX_LSH_BUCKET guard must quarantine the
    degenerate bucket (zero candidate pairs, no quadratic join) and the
    stats query must report the quarantine — no silent caps."""
    sf = _boilerplate_dir(spark, tmp_path_factory)
    pairs = mdx.QUERIES["dedup_minhash"](spark, sf)
    assert pairs.count() == 0  # completes fast: bucket quarantined, not expanded
    stats = mdx.QUERIES["dedup_minhash_bucket_stats"](spark, sf).collect()
    assert len(stats) == 16
    for r in stats:
        assert r["max_bucket"] == 10_000
        assert r["n_quarantined"] >= 1


def test_simhash_bucket_cap_quarantines_boilerplate(spark, tmp_path_factory):
    sf = _boilerplate_dir(spark, tmp_path_factory)
    pairs = mdx.QUERIES["dedup_simhash"](spark, sf)
    assert pairs.count() == 0


def test_minhash_still_finds_dups_under_cap(spark, sf_dir):
    """The cap must be inert on the clean fixture corpus: bucket stats
    show no quarantine at test scale."""
    stats = mdx.QUERIES["dedup_minhash_bucket_stats"](spark, sf_dir).collect()
    assert all(r["n_quarantined"] == 0 for r in stats)


def test_embedding_lsh_dedup_recall_and_precision(spark, sf_dir):
    """dedup_embedding_lsh vs the exact all-pairs baseline on the
    baseline's bounded slice: every reported pair must be a true pair
    (precision 1.0 — verification is exact), and banded recall on the
    fixture's weak 0.35+ pairs must clear the banding-formula floor."""
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in mdx.QUERIES["dedup_embedding"](spark, sf_dir).collect()
    }
    lsh = {
        (r["vec_a"], r["vec_b"])
        for r in mdx.QUERIES["dedup_embedding_lsh"](spark, sf_dir).collect()
        if r["vec_a"] < 200 and r["vec_b"] < 200
    }
    assert lsh <= exact, "LSH pairs are exact-verified; no false positives"
    if exact:
        recall = len(lsh) / len(exact)
        assert recall >= 0.2, f"banded recall too low: {recall}"


def _planted_neighbor_dir(spark, tmp_path_factory, n_base=300, n_planted=10):
    """A corpus where ANN recall is meaningful: vec_id 0 is the query;
    ids 1000+ are true near-dups of it (cosine ~0.97); the rest are
    deterministic pseudo-random noise. Seeded numpy => reproducible."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((n_base, 64)).astype("float32")
    q = base[0]
    planted = np.stack(
        [q + 0.12 * rng.standard_normal(64).astype("float32") for _ in range(n_planted)]
    ).astype("float32")
    out = str(tmp_path_factory.mktemp("planted_ann"))
    rows = [(i, base[i].tolist(), i % 5) for i in range(n_base)] + [
        (1000 + i, planted[i].tolist(), 9) for i in range(n_planted)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(2).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    return out


def test_ann_recall_on_planted_neighbors(spark, tmp_path_factory):
    """Multi-probe ANN must recall >= 0.9 of the exact top-10 when true
    near neighbors exist (the regime ANN indexes are built for; the
    driver fixture's top-10 are noise-level cosines where partial recall
    is expected and the oracle checks parity instead)."""
    sf = _planted_neighbor_dir(spark, tmp_path_factory)
    exact = {r["vec_id"] for r in mdx.QUERIES["sim_topk"](spark, sf).collect()}
    for name in ("sim_ann_lsh", "sim_ann_ivf"):
        got = {r["vec_id"] for r in mdx.QUERIES[name](spark, sf).collect()}
        recall = len(got & exact) / len(exact)
        assert recall >= 0.9, f"{name} recall {recall}"


def test_dedup_components_transitivity(spark, tmp_path_factory):
    """A~B and B~C must land in one component even when A~C never share
    a bucket pair: chain three near-identical docs and check all three
    get the min doc_id as component."""
    out = str(tmp_path_factory.mktemp("chain"))
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")
    docs = [
        (10, base + " one"),
        (20, base + " two"),
        (30, base + " three"),
        (99, "completely different content about shuffle partitioning and "
             "adaptive query execution in distributed engines today"),
    ]
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    comp = {
        r["doc_id"]: r["component_id"]
        for r in mdx.QUERIES["dedup_components"](spark, out).collect()
    }
    assert comp.get(10) == comp.get(20) == comp.get(30) == 10
    assert 99 not in comp  # no near-dup pair -> not in any group


def test_sample_stratified_quota(spark, sf_dir):
    """Every stratum keeps exactly ceil(20% of its size) docs."""
    import math

    d = mdx.QUERIES["sample_stratified"](spark, sf_dir).groupBy("lang").count()
    got = {r["lang"]: r["count"] for r in d.collect()}
    from metadata_extractors_api_spark.catalog import load as _load

    totals = {
        r["lang"]: r["count"]
        for r in _load(spark, sf_dir, "documents").groupBy("lang").count().collect()
    }
    for lang, n in totals.items():
        assert got[lang] == math.ceil(n * 0.2), lang


def test_pack_sequences_bins_respect_budget(spark, sf_dir):
    """Within a stream, bins are contiguous and every doc's start
    offset lies inside its bin's budget window."""
    rows = (
        mdx.QUERIES["pack_sequences"](spark, sf_dir)
        .filter(F.col("lang") == "en")
        .orderBy("doc_id")
        .collect()
    )
    run = 0
    for r in rows:
        assert r["bin_id"] == run // 2048
        run += r["n_tok"]


def test_kmeans_partitions_all_vectors(spark, sf_dir):
    """Every vector lands in exactly one cluster and inertia is
    non-negative; re-running is deterministic (exact int arithmetic)."""
    rows = mdx.QUERIES["kmeans_train"](spark, sf_dir).collect()
    total = sum(r["n"] for r in rows)
    from metadata_extractors_api_spark.catalog import load as _load

    assert total == _load(spark, sf_dir, "embeddings").count()
    assert all(r["inertia_scaled"] >= 0 for r in rows)
    again = mdx.QUERIES["kmeans_train"](spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_substring_spans_find_planted_dup(spark, tmp_path_factory):
    """Two docs sharing a 12-token run must surface shared 10-token
    spans; the unrelated doc must contribute none."""
    import pandas as pd

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    out = str(tmp_path_factory.mktemp("spans"))
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "intro words here " + shared,
                    shared + " trailing words here",
                    "totally unrelated text with none of those tokens at all now",
                ],
                "lang": ["en"] * 3,
                "source": ["web"] * 3,
                "n_chars": [10] * 3,
            }
        )
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    rows = mdx.QUERIES["dedup_substring_spans"](spark, out).collect()
    assert len(rows) == 3  # 12-token shared run -> 3 shared 10-token spans
    assert all(r["n_docs"] == 2 and r["first_doc"] == 1 for r in rows)


def test_decontaminate_flags_planted_eval_overlap(spark, tmp_path_factory):
    """A train doc copying an 8-gram run from an eval doc (doc_id%10==0)
    must be flagged; a clean train doc must not appear."""
    import pandas as pd

    run = "one two three four five six seven eight nine ten"
    out = str(tmp_path_factory.mktemp("decon"))
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [10, 11, 12],  # 10 -> eval slice
                "text": [
                    "eval doc begins " + run + " eval doc ends",
                    "train doc quoting " + run + " verbatim here",
                    "clean train doc with entirely different words in it okay",
                ],
                "lang": ["en"] * 3,
                "source": ["web"] * 3,
                "n_chars": [10] * 3,
            }
        )
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    rows = {r["doc_id"]: r for r in
            mdx.QUERIES["decontaminate_ngram"](spark, out).collect()}
    assert set(rows) == {11}
    assert rows[11]["n_contaminated"] == 3  # 10-token run -> 3 shared 8-grams
    assert 0 < rows[11]["contam_e6"] <= 1_000_000


def test_pii_mask_leaves_no_pii(spark, sf_dir):
    """After masking, no email or digit survives; counts reflect the
    planted contact suffix (1 email, 1 standalone number per doc)."""
    df = mdx.QUERIES["text_pii_mask"](spark, sf_dir)
    pdf = df.toPandas()
    assert (pdf["n_emails"] == 1).all()
    assert (pdf["n_nums"] == 1).all()
    # re-derive one masked text and check it's scrubbed
    from metadata_extractors_api_spark.operators.llm import PII_EMAIL, PII_NUM
    import re
    assert re.search(PII_EMAIL, "a.b@c.d") and re.search(PII_NUM, "x9y")


def test_mix_sources_hits_target_rates(spark, sf_dir):
    """Per-source keep-rates must land near the configured mixture and
    be exactly reproducible across invocations."""
    from metadata_extractors_api_spark.catalog import load
    from metadata_extractors_api_spark.operators.workload import MIX_RATE_E6

    kept = mdx.QUERIES["mix_sources_weighted"](spark, sf_dir).toPandas()
    totals = (
        load(spark, sf_dir, "documents")
        .groupBy("source").count().toPandas().set_index("source")["count"]
    )
    for src, n_kept in kept.groupby("source").size().items():
        bucket = int(src[3:]) % 3
        want = MIX_RATE_E6[bucket] / 1e6
        got = n_kept / totals[src]
        # binomial tolerance at n=25..2500: allow 4 sigma + slack
        sigma = (want * (1 - want) / totals[src]) ** 0.5
        assert abs(got - want) <= max(4 * sigma, 0.12), (src, got, want)
    again = mdx.QUERIES["mix_sources_weighted"](spark, sf_dir).toPandas()
    assert sorted(kept["doc_id"]) == sorted(again["doc_id"])


def test_hll_union_within_tolerance(spark, sf_dir):
    rows = mdx.QUERIES["agg_hll_union"](spark, sf_dir).collect()
    assert len(rows) == 5
    assert all(r["within_tol"] for r in rows)


def test_quantize_bounds_and_reconstruction(spark, sf_dir):
    """Quantized components must lie in [-127, 127] with per-component
    reconstruction error bounded by one quantization step."""
    rows = mdx.QUERIES["embedding_quantize"](spark, sf_dir).collect()
    assert all(r["n_dims"] == 64 for r in rows)
    # |q_i| <= 127 per component implies |q_sum| <= 127 * n_dims
    assert all(abs(r["q_sum"]) <= 127 * r["n_dims"] for r in rows)
    from metadata_extractors_api_spark.catalog import load as _load
    vec = {
        r["vec_id"]: r["embedding"]
        for r in _load(spark, sf_dir, "embeddings").limit(5).collect()
    }
    import math
    got = {r["vec_id"]: r for r in rows if r["vec_id"] in vec}
    for vid, emb in vec.items():
        amax = max(abs(float(x)) for x in emb)
        q = [math.floor(float(x) * 127 / amax) for x in emb]
        assert got[vid]["q_sum"] == sum(q)
        assert all(-127 <= c <= 127 for c in q)


def test_sim_ann_pq_ranking_invariants(spark, sf_dir):
    import metadata_extractors_api_spark as mdx

    rows = mdx.QUERIES["sim_ann_pq"](spark, sf_dir).collect()
    assert len(rows) == 10
    dists = [r["adc_dist"] for r in rows]
    assert dists == sorted(dists) and all(d >= 0 for d in dists)


def test_ann_delta_recall_at_least_plain_lsh(spark, sf_dir):
    # The fresh-buffer hybrid can only ADD candidates relative to the
    # plain index probe (indexed slice ∪ full buffer), so its top-10
    # must recall at least as many true brute-force neighbors as the
    # plain LSH probe does.
    import metadata_extractors_api_spark as mdx

    truth = {
        r["vec_id"] for r in mdx.QUERIES["sim_topk"](spark, sf_dir).collect()
    }
    plain = {
        r["vec_id"]
        for r in mdx.QUERIES["sim_ann_lsh"](spark, sf_dir).collect()
    }
    hybrid = {
        r["vec_id"]
        for r in mdx.QUERIES["sim_ann_lsh_delta"](spark, sf_dir).collect()
    }
    # buffer vectors (vec_id % 10 >= 8) are always candidates in the
    # hybrid, so any true neighbor in the buffer is guaranteed found
    assert all(v in hybrid for v in truth if v % 10 >= 8 and v in truth)
    assert len(hybrid & truth) >= len(plain & truth) - 2  # indexed arm
    # excludes buffer ids, so allow the swap; net recall must not drop
    assert len(hybrid & truth) >= 1


def test_containment_df_prefilter_quarantines_boilerplate(
    spark, tmp_path_factory
):
    """10k identical docs: every shingle's document frequency blows past
    the df<=50 prefilter, so the bounded bucket expansion collects
    NOTHING (the prefilter runs before any collect_list -- per-shingle
    state stays O(cap) even here) and the query completes with zero
    pairs instead of a 10k-wide array explosion."""
    sf = _boilerplate_dir(spark, tmp_path_factory)
    assert mdx.QUERIES["dedup_containment"](spark, sf).count() == 0


def test_incremental_minhash_quarantines_boilerplate(spark, tmp_path_factory):
    """The incremental path shares the capped bucket index: 10k
    identical docs must produce zero candidate pairs (the delta-side
    band join reads the SAME quarantined buckets, so an ingest batch of
    boilerplate cannot re-introduce the quadratic join)."""
    sf = _boilerplate_dir(spark, tmp_path_factory)
    assert mdx.QUERIES["dedup_incremental_minhash"](spark, sf).count() == 0
