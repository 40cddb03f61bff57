"""UDF / UDAF / UDTF surface (SURVEY.md §2.B.10): the faithful port of
the reference's extractor-execution model onto Spark's Python-worker
architecture.

The reference runs extractors as subprocesses with results pickled
through shared memory (A15, __init__.py:348-368) or CLI pipes (A13,
:296-306). Spark's equivalent is exactly this worker model done right:
Arrow-batched pandas UDFs (vectorized, streaming, no 1 GiB cap) and
mapInPandas + subprocess for CLI extractors -- per PARTITION, not per
file, so process-spawn overhead amortizes across thousands of rows.
"""

from __future__ import annotations

import subprocess
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from metadata_extractors_api_spark.catalog import load
from metadata_extractors_api_spark.functions.callparse import dequote
from metadata_extractors_api_spark.registry import register


@register(
    "udf_scalar",
    oracle="""
    WITH q AS (
      SELECT p_partkey,
             CASE WHEN p_partkey % 3 = 0 THEN '''' || p_name || ''''
                  WHEN p_partkey % 3 = 1 THEN '''' || p_name
                  ELSE p_name || '''' END AS quoted
      FROM part)
    SELECT p_partkey, quoted,
           CASE WHEN quoted LIKE '''%' OR quoted LIKE '%'''
                THEN trim(regexp_replace(regexp_replace(quoted, '^''', ''), '''$', ''))
                ELSE trim(quoted) END AS dequoted
    FROM q
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar UDF running the reference's asymmetric
    dequote rule (A10, __init__.py:319-327) over a column of
    deliberately mis-quoted strings."""

    @pandas_udf("string")
    def dequote_udf(s: pd.Series) -> pd.Series:
        return s.map(dequote)

    p = load(spark, sf_dir, "part")
    quoted = (
        F.when(F.col("p_partkey") % 3 == 0, F.concat(F.lit("'"), "p_name", F.lit("'")))
        .when(F.col("p_partkey") % 3 == 1, F.concat(F.lit("'"), F.col("p_name")))
        .otherwise(F.concat(F.col("p_name"), F.lit("'")))
    )
    return p.select(
        "p_partkey",
        quoted.alias("quoted"),
        dequote_udf(quoted).alias("dequoted"),
    )


@register(
    "udf_grouped_map",
    oracle="""
    SELECT event_id,
           round((value - avg(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 4) AS znorm
    FROM events
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group pandas transform (applyInPandas): normalize the value
    channel within each event_type -- the port of per-file extraction
    post-processing (A15). Each group becomes one Arrow batch in the
    Python worker; the 4-dp round absorbs summation-association noise
    between numpy and the oracle."""

    def znorm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        z = (v - v.mean()) / v.std(ddof=1)
        return pd.DataFrame({"event_id": pdf["event_id"], "znorm": z.round(4)})

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.groupBy("event_type").applyInPandas(znorm, "event_id long, znorm double")


@register(
    "udaf_pandas",
    oracle="""
    SELECT p_brand,
           round(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) / 100.0
                 / SUM(CAST(l_quantity AS BIGINT)), 6) AS weighted_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF: quantity-weighted mean price per
    brand. Sums run in exact int64 cents (order-independent, so the
    shuffle's arrival order can't perturb the result); one IEEE division
    at the end matches the oracle bit-for-bit."""

    @pandas_udf("double")
    def weighted_price(price: pd.Series, qty: pd.Series) -> float:
        cents = (price * 100).round().astype("int64").sum()
        q = qty.astype("int64").sum()
        return round(cents / 100.0 / q, 6)

    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(weighted_price("l_extendedprice", "l_quantity").alias("weighted_price"))
    )


@register(
    "udtf_explode_extract",
    oracle="""
    WITH toks AS (SELECT doc_id, str_split(text, ' ') AS tokens
                  FROM documents WHERE doc_id < 50)
    SELECT doc_id,
           CAST(generate_subscripts(tokens, 1) AS INT) AS pos,
           unnest(tokens) AS token
    FROM toks
    """,
)
def udtf_explode_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row in -> N typed rows out (origin: an extractor emitting a
    table per file, A15). Expressed with posexplode so the expansion
    stays JVM-side and codegen'd; the UDF-backed variants live in
    udf_grouped_map/pipe_cli."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "token")
    ).select("doc_id", (F.col("pos0") + 1).cast("int").alias("pos"), "token")


@register(
    "pipe_cli",
    oracle="SELECT doc_id, replace(text, ' ', '_') AS piped FROM documents",
)
def pipe_cli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLI extractor port (A13, __init__.py:296-306): pipe rows through
    an external subprocess. One subprocess per Arrow batch (not per row,
    not per file): at cluster scale each task pays a single process
    spawn for tens of thousands of rows. Uses ``sed`` as the
    deterministic stand-in extractor binary."""

    def run_pipe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf["text"].tolist()
            out = subprocess.run(
                ["sed", "s/ /_/g"],
                input="\n".join(texts),
                capture_output=True,
                text=True,
                check=True,
            )
            lines = out.stdout.split("\n")
            if lines and lines[-1] == "" and len(lines) == len(texts) + 1:
                lines = lines[:-1]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "piped": lines})

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(run_pipe, "doc_id long, piped string")


@register(
    "udf_arrow_scalar",
    oracle="""
    SELECT doc_id,
           CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT)
               AS n_words_udf
    FROM documents
    """,
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (Spark 4 ``useArrow=True``):
    the third rung of the Python-execution ladder -- row-pickled UDF
    (never used here) < arrow-optimized scalar UDF (this: per-row
    Python logic, Arrow-batched transfer) < pandas UDF (vectorized
    compute, udf_scalar). The per-row function stays when the logic
    genuinely cannot vectorize (branchy extractor code, C extensions
    taking scalars); Arrow batching removes the serialization tax even
    then. Word counting stands in for such logic, and the oracle
    recomputes it relationally."""
    from pyspark.sql.functions import udf

    @udf("int", useArrow=True)
    def n_words(text: str) -> int:
        return len(text.split(" "))

    d = load(spark, sf_dir, "documents", parallelize=True)
    return d.select("doc_id", n_words("text").alias("n_words_udf"))


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
           CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(l_quantity AS BIGINT) AS line_cents
    FROM lineitem
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow (Spark 4): the zero-copy rung of the Python ladder --
    the worker hands pyarrow RecordBatches straight to the function, no
    pandas conversion at all. The right surface when the Python side is
    itself Arrow-native (pyarrow.compute kernels, Arrow-backed ML
    featurizers, Arrow Flight shipping). Here a pyarrow.compute kernel
    derives exact integer cents (round half-away matching SQL ROUND)
    and an int64 product, and the relational oracle recomputes both --
    proving the Arrow batch path is value-faithful, not just typed
    correctly. Scale: per-batch vectorized C++ kernels, no Python
    per-row cost."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def cents(batches):
        for b in batches:
            price = b.column(b.schema.get_field_index("l_extendedprice"))
            qty = b.column(b.schema.get_field_index("l_quantity"))
            pcents = pc.cast(
                pc.round(
                    pc.multiply(price, pa.scalar(100.0)),
                    options=pc.RoundOptions(
                        ndigits=0, round_mode="half_towards_infinity"
                    ),
                ),
                pa.int64(),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index("l_orderkey")),
                    pc.cast(
                        b.column(b.schema.get_field_index("l_linenumber")),
                        pa.int64(),
                    ),
                    pcents,
                    pc.multiply(pcents, pc.cast(qty, pa.int64())),
                ],
                ["l_orderkey", "l_linenumber", "price_cents", "line_cents"],
            )

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"
    )
    return li.mapInArrow(
        cents,
        "l_orderkey long, l_linenumber long, price_cents long, line_cents long",
    )


@register(
    "udf_iterator_series",
    oracle="""
    SELECT doc_id,
           CAST(('0x' || substr(md5('model-7:' || text), 1, 8))::BIGINT
                % 1000 AS BIGINT) AS score
    FROM documents
    """,
)
def udf_iterator_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series pandas UDF — the rung of the Python ladder
    built for EXPENSIVE ONE-TIME STATE: the function receives an
    iterator over Arrow batches, so model loading / dictionary
    construction happens ONCE per worker task and every batch reuses
    it (a plain pandas UDF re-enters per batch with no init hook —
    the difference between loading a tokenizer 1x vs 100x per task).
    Here the "model" is a deterministic md5-based scorer whose
    initialized prefix ('model-7:') stands in for loaded weights, so
    the oracle can recompute the scores relationally and catch any
    batch where the initialized state was wrong or missing."""
    import hashlib
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # expensive init happens ONCE per task, before the first batch
        model_prefix = "model-" + str(sum([7]))  # stands in for weights
        for texts in batches:
            yield texts.map(
                lambda t: int(
                    hashlib.md5((model_prefix + ":" + t).encode()).hexdigest()[
                        :8
                    ],
                    16,
                )
                % 1000
            )

    d = load(spark, sf_dir, "documents", parallelize=True)
    return d.select("doc_id", score("text").alias("score"))
