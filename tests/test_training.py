"""Tests for operators/training.py: packing conservation, permutation
properties, stratified-sample exactness + the WindowGroupLimit partial
pushdown, snapshot-diff classification, skew-census sanity, and
incremental-dedup containment in the full dedup result."""

from __future__ import annotations

from pyspark.sql import functions as F

import metadata_extractors_api_spark as mdx
from metadata_extractors_api_spark.catalog import load
from metadata_extractors_api_spark.operators.training import (
    DELTA_MOD,
    PACK_CHUNK,
    STRATUM_K,
)


def test_pack_chunks_conserves_tokens_and_docs(spark, sf_dir):
    out = mdx.QUERIES["pack_concat_chunks"](spark, sf_dir).cache()
    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    total_tok = docs.select(
        F.sum(F.size(F.split("text", " "))).cast("bigint")
    ).first()[0]
    # Every doc starts in exactly one chunk.
    assert out.select(F.sum("n_starts")).first()[0] == n_docs
    # Chunk ids are the contiguous range covering all tokens.
    n_chunks = (total_tok + PACK_CHUNK - 1) // PACK_CHUNK
    assert out.count() == n_chunks
    ids = [r[0] for r in out.select("chunk_id").orderBy("chunk_id").collect()]
    assert ids == list(range(n_chunks))
    # Each chunk touches at least one doc.
    assert out.filter(F.col("n_docs") < 1).count() == 0


def test_shuffle_deterministic_is_a_permutation(spark, sf_dir):
    out = mdx.QUERIES["shuffle_deterministic"](spark, sf_dir).cache()
    n = load(spark, sf_dir, "documents").count()
    assert out.count() == n
    # Positions are exactly 1..n with no collisions.
    agg = out.agg(
        F.min("position").alias("lo"),
        F.max("position").alias("hi"),
        F.countDistinct("position").alias("d"),
    ).first()
    assert (agg["lo"], agg["hi"], agg["d"]) == (1, n, n)
    # Rerun is bit-identical (seeded, no RNG state).
    again = mdx.QUERIES["shuffle_deterministic"](spark, sf_dir)
    assert out.exceptAll(again).count() == 0


def test_stratified_sample_exact_k(spark, sf_dir):
    out = mdx.QUERIES["sample_stratified_exact"](spark, sf_dir).cache()
    docs = load(spark, sf_dir, "documents")
    per_lang = {r["lang"]: r["n"] for r in
                docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in per_lang.items():
        assert got.get(lang, 0) == min(n, STRATUM_K)
    # Ranks are 1..k dense per stratum.
    assert out.filter(F.col("sample_rank") > STRATUM_K).count() == 0


def test_stratified_sample_pushes_window_group_limit(spark, sf_dir):
    plan = (
        mdx.QUERIES["sample_stratified_exact"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # Spark 3.5+ WindowGroupLimit: the rank filter prunes to k rows per
    # (partition, stratum) BEFORE the exchange — the property that makes
    # the plan skew-proof at scale.
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan


def test_snapshot_diff_classes_are_exhaustive(spark, sf_dir):
    out = {r["change_type"]: r["n_rows"]
           for r in mdx.QUERIES["table_snapshot_diff"](spark, sf_dir).collect()}
    n = load(spark, sf_dir, "orders").count()
    assert set(out) == {"added", "removed", "changed", "unchanged"}
    # added = in B only (k%7==0, k%5!=0); removed = in A only; the four
    # classes tile the union of the two snapshots.
    base = load(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    in_a = base.filter(F.col("k") % 7 != 0)
    in_b = base.filter(F.col("k") % 5 != 0)
    union_n = in_a.unionByName(in_b).distinct().count()
    assert sum(out.values()) == union_n
    assert out["added"] == in_b.exceptAll(in_a.intersect(in_b)).count()
    assert n >= union_n


def test_skew_census_shapes(spark, sf_dir):
    rows = {r["key_name"]: r
            for r in mdx.QUERIES["skew_diagnose_keys"](spark, sf_dir).collect()}
    li = load(spark, sf_dir, "lineitem")
    r = rows["lineitem.l_orderkey"]
    assert r["n_rows"] == li.count()
    assert r["max_rows_per_key"] >= 1
    assert r["hot_key_ratio"] >= 1.0  # max >= mean always
    # l_orderkey is the finest key of the three lineitem keys.
    assert rows["lineitem.l_orderkey"]["n_keys"] >= rows["lineitem.l_suppkey"]["n_keys"]


def test_incremental_minhash_is_the_delta_slice_of_full_dedup(spark, sf_dir):
    inc = mdx.QUERIES["dedup_incremental_minhash"](spark, sf_dir).cache()
    full = mdx.QUERIES["dedup_minhash"](spark, sf_dir)
    # Every incremental pair involves a delta doc.
    bad = inc.filter(
        (F.col("doc_a") % DELTA_MOD != 0) & (F.col("doc_b") % DELTA_MOD != 0)
    )
    assert bad.count() == 0
    # And equals exactly the delta-involving slice of the full run
    # (same buckets, same cap, same verification).
    full_delta = full.filter(
        (F.col("doc_a") % DELTA_MOD == 0) | (F.col("doc_b") % DELTA_MOD == 0)
    ).select("doc_a", "doc_b")
    sym = inc.select("doc_a", "doc_b").exceptAll(full_delta).unionAll(
        full_delta.exceptAll(inc.select("doc_a", "doc_b"))
    )
    assert sym.count() == 0


def test_hard_negatives_exclude_query_label(spark, sf_dir):
    out = mdx.QUERIES["sample_hard_negatives"](spark, sf_dir).cache()
    emb = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("qid"), F.col("label").alias("qlabel")
    )
    joined = out.join(emb, "qid")
    assert joined.filter(F.col("neg_label") == F.col("qlabel")).count() == 0
    # Exactly 5 per query, ranks dense.
    per_q = out.groupBy("qid").agg(F.count("*").alias("n"), F.max("rk").alias("m"))
    assert per_q.filter((F.col("n") != 5) | (F.col("m") != 5)).count() == 0


def test_basket_affinity_pair_space_is_per_order(spark, sf_dir):
    out = mdx.QUERIES["orders_basket_affinity"](spark, sf_dir).cache()
    # Every reported pair truly co-occurs >= 2 times, ordered (a < b).
    assert out.filter(F.col("part_a") >= F.col("part_b")).count() == 0
    assert out.filter(F.col("co_count") < 2).count() == 0
    # Lift of the hottest pair is positive and exact-integer.
    assert out.agg(F.min("lift_e6")).first()[0] > 0


def test_domain_stats_shares_sum_to_one(spark, sf_dir):
    out = mdx.QUERIES["corpus_domain_stats"](spark, sf_dir).cache()
    n_src = load(spark, sf_dir, "documents").select("source").distinct().count()
    assert out.count() == n_src
    total_share = out.agg(F.sum("token_share_e6")).first()[0]
    # Integer floor division loses < 1 millionth per source.
    assert 1_000_000 - n_src <= total_share <= 1_000_000
    tot = out.agg(F.sum("total_tokens")).first()[0]
    ref = load(spark, sf_dir, "documents").select(
        F.sum(F.size(F.split("text", " ")))
    ).first()[0]
    assert tot == ref


def test_chunk_windows_cover_every_token(spark, sf_dir):
    from metadata_extractors_api_spark.operators.training import CHUNK_S, CHUNK_W

    out = mdx.QUERIES["chunk_overlap_windows"](spark, sf_dir).cache()
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tok")
    )
    # Per doc: chunk count = floor((n-1)/S)+1, last chunk reaches n.
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.max(F.col("start_tok") + F.col("chunk_len")).alias("covered"),
    )
    j = per_doc.join(docs, "doc_id")
    bad = j.filter(
        (F.col("n_chunks") != F.floor((F.col("n_tok") - 1) / CHUNK_S) + 1)
        | (F.col("covered") != F.col("n_tok"))
    )
    assert bad.count() == 0
    # Overlap: consecutive chunks share W - S tokens (when full-width).
    assert out.filter(F.col("chunk_len") > CHUNK_W).count() == 0
    assert out.filter(F.col("first_token").isNull()).count() == 0


def test_dedup_normalized_supersets_exact(spark, sf_dir):
    # Normalization can only MERGE exact-dup groups, never split them:
    # the number of normalized groups <= number of byte-exact groups,
    # and total doc coverage is identical.
    norm = mdx.QUERIES["dedup_normalized"](spark, sf_dir).cache()
    exact = mdx.QUERIES["dedup_exact"](spark, sf_dir)
    n_docs = load(spark, sf_dir, "documents").count()
    assert norm.agg(F.sum("n_copies")).first()[0] == n_docs
    assert norm.count() <= exact.count()


def test_abc_pareto_classes_tile_revenue(spark, sf_dir):
    out = {r["abc_class"]: r
           for r in mdx.QUERIES["orders_abc_pareto"](spark, sf_dir).collect()}
    li = load(spark, sf_dir, "lineitem")
    total = li.select(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
    ).first()[0]
    n_parts = li.select("l_partkey").distinct().count()
    assert set(out) <= {"A", "B", "C"} and "A" in out
    assert sum(r["revenue_cents"] for r in out.values()) == total
    assert sum(r["n_parts"] for r in out.values()) == n_parts
    # Pareto shape: the A head earns at least its share of parts.
    a = out["A"]
    assert a["revenue_share_e6"] >= a["n_parts"] * 1_000_000 // n_parts


def test_centroid_stats_match_numpy(spark, sf_dir):
    import math

    out = mdx.QUERIES["embedding_centroid_stats"](spark, sf_dir)
    rows = out.filter((F.col("label") == 0) & (F.col("dim") == 1)).collect()
    assert len(rows) == 1
    r = rows[0]
    vecs = [
        x["embedding"][0]
        for x in load(spark, sf_dir, "embeddings")
        .filter(F.col("label") == 0)
        .select("embedding")
        .collect()
    ]
    assert r["n_vecs"] == len(vecs)
    assert r["sum_e6"] == sum(math.floor(float(v) * 1e6) for v in vecs)
    assert r["sumsq_e12"] == sum(
        math.floor(float(v) * float(v) * 1e12) for v in vecs
    )


def test_temperature_sharpens_the_mixture(spark, sf_dir):
    out = mdx.QUERIES["mix_temperature_sampling"](spark, sf_dir).cache()
    rows = out.collect()
    # Squaring shares sharpens: the largest source gains share, the
    # smallest loses (strictly, unless the mixture is exactly uniform).
    big = max(rows, key=lambda r: r["share_e6"])
    small = min(rows, key=lambda r: r["share_e6"])
    if big["share_e6"] != small["share_e6"]:
        assert big["t05_share_e6"] >= big["share_e6"]
        assert small["t05_share_e6"] <= small["share_e6"]
    # Both share columns are (floor-)normalized to one.
    n = len(rows)
    for col in ("share_e6", "t05_share_e6"):
        tot = sum(r[col] for r in rows)
        assert 1_000_000 - n <= tot <= 1_000_000


def test_scd2_asof_probe_matches_at_most_one_version(spark, sf_dir):
    out = mdx.QUERIES["join_scd2_asof"](spark, sf_dir)
    total_matched = out.agg(F.sum("n_purchases")).first()[0]
    n_purchases = (
        load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase").count()
    )
    # Intervals partition the timeline: matched probes <= probes, and
    # each probe contributes at most once (no interval overlap blowup).
    assert total_matched <= n_purchases
    assert total_matched > 0
