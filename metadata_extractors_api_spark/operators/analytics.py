"""Additional analytics operators: percentiles, positional window
functions, bitwise expressions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metadata_extractors_api_spark.catalog import load
from metadata_extractors_api_spark.registry import register


@register(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           round(quantile_cont(l_quantity, 0.25), 4) AS qty_p25
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (4-dp round absorbs the
    engines' differing-but-equivalent interpolation formulas). At 100 TB
    the approx_percentile sketch is the single-pass variant; exact
    percentile is the correctness baseline."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("l_quantity", F.lit(0.25)), 4).alias("qty_p25"),
    )


@register(
    "win_first_last",
    oracle="""
    SELECT event_id,
           first_value(value) OVER w AS first_val,
           last_value(value) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_val,
           nth_value(value, 2) OVER w AS second_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional window functions: first/last/nth value per user's
    event-time order (last_value over the full-partition frame -- the
    default running frame is a classic correctness trap both engines
    share)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w_full).alias("last_val"),
        F.nth_value("value", 2).over(w).alias("second_val"),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey & 255 AS BIGINT) AS k_and,
           CAST(l_orderkey | 4096 AS BIGINT) AS k_or,
           CAST(xor(l_orderkey, l_linenumber) AS BIGINT) AS k_xor,
           CAST(l_linenumber << 4 AS BIGINT) AS ln_shl,
           CAST(l_orderkey >> 3 AS BIGINT) AS k_shr
    FROM lineitem
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise expression surface (hash/bucket arithmetic primitives
    used by the LSH operators, exposed directly)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_orderkey").bitwiseAND(F.lit(255)).cast("bigint").alias("k_and"),
        F.col("l_orderkey").bitwiseOR(F.lit(4096)).cast("bigint").alias("k_or"),
        F.col("l_orderkey")
        .bitwiseXOR(F.col("l_linenumber").cast("bigint"))
        .cast("bigint")
        .alias("k_xor"),
        F.shiftleft(F.col("l_linenumber"), 4).cast("bigint").alias("ln_shl"),
        F.shiftright(F.col("l_orderkey"), 3).cast("bigint").alias("k_shr"),
    )


@register(
    "agg_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS INT) AS bucket,
           COUNT(*) AS n,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram as a bucketized groupBy (the profiling
    primitive; one shuffle on the bucket id)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy(
        F.floor(F.col("o_totalprice") / 50000).cast("int").alias("bucket")
    ).agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
    )


@register("agg_approx_percentile")
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile sketch (single-pass, fixed memory): the 100 TB
    form of agg_percentile. Sketch internals are engine-specific ->
    rows-only check; agg_percentile is the exact cross-checked twin."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "p50_approx"
        ),
        F.approx_percentile("l_extendedprice", F.lit(0.9), F.lit(10000)).alias(
            "p90_approx"
        ),
    )
