"""Training-data pipeline composition operators (SURVEY.md §2.B.11
extensions, round 2): the steps a corpus pipeline runs AFTER the
per-document operators — stratified sampling, token-budget sequence
packing, and transitive dedup-group resolution.

Scale design notes:
- sample_stratified is one window pass partitioned by the stratum key:
  no collect of group sizes, no two-pass sampling.
- pack_sequences is a running sum per stream (one shuffle on the
  stream key); the bin id falls out of integer arithmetic, so packing
  100 TB of documents is exactly as parallel as a windowed sum.
- dedup_components is distributed label propagation (the Pregel/
  GraphX pattern): every step is a join + aggregate on the cluster;
  the driver only coordinates the convergence test. Dup clusters have
  tiny diameters, so it converges in a handful of rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metadata_extractors_api_spark.catalog import load
from metadata_extractors_api_spark.operators.llm import (
    _minhash_pairs_ctes,
    dedup_minhash,
    tokens_col,
)
from metadata_extractors_api_spark.registry import register

SAMPLE_FRACTION = 0.2
PACK_BUDGET = 2048  # tokens per packed context window


@register(
    "sample_stratified",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS n
      FROM documents)
    SELECT doc_id, lang FROM ranked
    WHERE rn <= CAST(ceil(n * {SAMPLE_FRACTION}) AS BIGINT)
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact stratified sampling: ceil(20%) of every lang stratum,
    selected deterministically by md5 rank (reproducible across runs
    and engines, unlike rand()-based sampleBy). One window pass
    partitioned by the stratum — the per-stratum quota needs no
    driver-side group-size collection, so it holds at any stratum
    count. The per-class twin of sample_hash's global Bernoulli form."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    n = Window.partitionBy("lang")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(n))
        .filter(F.col("rn") <= F.ceil(F.col("n") * F.lit(SAMPLE_FRACTION)))
        .select("doc_id", "lang")
    )


@register(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             len(str_split(text, ' ')) AS n_tok
      FROM documents),
    r AS (
      SELECT doc_id, lang, n_tok,
             SUM(n_tok) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM t)
    SELECT doc_id, lang, CAST(n_tok AS INT) AS n_tok,
           CAST(floor((run - n_tok) / {PACK_BUDGET}.0) AS BIGINT) AS bin_id
    FROM r
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: assign each document to a
    fixed-budget context-window bin within its lang stream — the
    sharding step that turns a corpus into training sequences. The bin
    id is floor(start_offset / budget) over a running token sum, so
    packing is a windowed sum (one shuffle on the stream key) with no
    sequential driver loop; contiguous-by-doc_id keeps it deterministic
    and restartable at any scale."""
    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", F.size(tokens_col()).alias("n_tok"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.select(
        "doc_id",
        "lang",
        F.col("n_tok").cast("int").alias("n_tok"),
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(float(PACK_BUDGET)))
        .cast("bigint")
        .alias("bin_id"),
    )


@register(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE {_minhash_pairs_ctes().strip().removeprefix("WITH ")},
    nodes AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM mh_pairs
        UNION ALL SELECT doc_b FROM mh_pairs)),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM mh_pairs
      UNION ALL SELECT doc_b, doc_a FROM mh_pairs),
    walk(u, lbl) AS (
      SELECT doc_id, doc_id FROM nodes
      UNION
      SELECT e.u, w.lbl FROM edges e JOIN walk w ON w.u = e.v)
    SELECT u AS doc_id, MIN(lbl) AS component_id
    FROM walk GROUP BY u
    """,
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup-group resolution: connected components over the
    minhash near-dup pairs (A~B, B~C => one group even when A~C never
    met in a bucket) — the step a real dedup pipeline needs between
    pairing and keeper selection. Distributed min-label propagation
    (the Pregel pattern): each round joins labels across edges and
    keeps the minimum; the driver only tests convergence (one count
    per round — the data never leaves the cluster). localCheckpoint
    truncates the iterative lineage; on a real cluster use reliable
    checkpointing. The oracle recomputes the same components with a
    recursive min-label walk over the identically generated pairs."""
    pairs = dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
    ).unionByName(pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v")))
    edges = edges.localCheckpoint()
    labels = (
        edges.select(F.col("u").alias("doc_id"))
        .distinct()
        .withColumn("lbl", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(20):
        nb = (
            edges.join(labels, edges.v == labels.doc_id)
            .groupBy("u")
            .agg(F.min("lbl").alias("nb_lbl"))
        )
        updated = (
            labels.join(nb, labels.doc_id == nb.u, "left")
            .select(
                "doc_id",
                F.least(F.col("lbl"), F.coalesce(F.col("nb_lbl"), F.col("lbl"))).alias(
                    "new_lbl"
                ),
                "lbl",
            )
        ).localCheckpoint()
        changed = updated.filter(F.col("new_lbl") != F.col("lbl")).count()
        labels = updated.select("doc_id", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            break
    return labels.select("doc_id", F.col("lbl").alias("component_id"))
