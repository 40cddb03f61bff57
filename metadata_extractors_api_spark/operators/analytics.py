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


@register(
    "agg_approx_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
           TRUE AS within_tol
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile sketch (single-pass, fixed memory): the 100 TB
    form of agg_percentile.

    Sketch outputs are engine-specific, so the query asserts the
    sketch's *rank-error contract* instead of its raw value: with
    accuracy=10000 the guaranteed rank error is 1e-4, so each approx
    quantile must land inside the exact [q - 0.005, q + 0.005] value
    band (50x slack). The query emits the exact percentiles plus a
    Spark-computed ``within_tol`` boolean; the oracle emits the same
    exact percentiles plus literal TRUE."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90"),
        F.percentile("l_extendedprice", F.lit(0.495)).alias("_p50_lo"),
        F.percentile("l_extendedprice", F.lit(0.505)).alias("_p50_hi"),
        F.percentile("l_extendedprice", F.lit(0.895)).alias("_p90_lo"),
        F.percentile("l_extendedprice", F.lit(0.905)).alias("_p90_hi"),
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "_p50_approx"
        ),
        F.approx_percentile("l_extendedprice", F.lit(0.9), F.lit(10000)).alias(
            "_p90_approx"
        ),
    )
    return agg.select(
        "l_returnflag",
        "p50",
        "p90",
        (
            F.col("_p50_approx").between(F.col("_p50_lo"), F.col("_p50_hi"))
            & F.col("_p90_approx").between(F.col("_p90_lo"), F.col("_p90_hi"))
        ).alias("within_tol"),
    )


def _sessionized(ev: DataFrame) -> DataFrame:
    """30-minute-gap sessionization (gaps-and-islands): lag() gap
    detection + running-sum numbering over the (ts, event_id) order per
    user. ONE implementation shared by ``win_sessionize`` and
    ``events_bounce_rate`` so the gap rule, the second-truncation
    convention (ts.cast('long')), and the tie-break order cannot drift
    between consumers. Adds ``session_no``; requires user_id, ts,
    event_id columns and preserves the rest."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    marked = ev.withColumn(
        "new_session", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    return marked.withColumn(
        "session_no", F.sum("new_session").over(run).cast("bigint")
    ).drop("new_session")


@register(
    "win_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT user_id, event_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked)
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def win_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): mark session starts with
    lag() gap detection, number them with a running sum, aggregate per
    session -- the batch twin of stream_session's session_window, and
    the canonical two-window + one-shuffle pattern at any scale."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return _sessionized(ev).groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events")
    )


@register(
    "set_upsert",
    oracle="""
    WITH snap_a AS (
      SELECT o_orderkey, o_totalprice, 'a' AS src FROM orders
      WHERE o_orderkey % 3 != 0),
    snap_b AS (
      SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice, 'b' AS src
      FROM orders WHERE o_orderkey % 2 = 0),
    unioned AS (SELECT * FROM snap_a UNION ALL SELECT * FROM snap_b),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                   ORDER BY src DESC) AS rn
      FROM unioned)
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice, src
    FROM ranked WHERE rn = 1
    """,
)
def set_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot upsert (merge): newer snapshot rows win per key, older
    rows survive where unmatched -- union + row_number, one shuffle on
    the key. The table-format-free form of MERGE INTO; at scale the
    shuffle key is the primary key, so skew equals key-duplication
    (bounded at 2 here)."""
    o = load(spark, sf_dir, "orders")
    snap_a = o.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_totalprice", F.lit("a").alias("src")
    )
    snap_b = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        # +1000.0 is one exact-deterministic IEEE add (a *1.1 with
        # round() diverges between engines on half-cent boundaries)
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        F.lit("b").alias("src"),
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("src"))
    return (
        snap_a.unionByName(snap_b)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", F.col("o_totalprice").cast("double"), "src")
    )


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS qty_std,
           round(var_samp(l_quantity), 6) AS qty_var,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_cov
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/correlation/covariance):
    single-pass co-moment accumulation; 6-dp rounds absorb association-
    order noise between the engines' parallel vs sequential updates."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_std"),
        F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_cov"
        ),
    )


@register(
    "agg_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
           CAST(l_quantity AS DOUBLE) AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide -> long): three measure columns become
    (metric, value) rows -- the inverse of agg_pivot and the shape
    normalizer for per-channel extraction outputs (a BioLogic file's
    Ewe/I/cycle channels are exactly this)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_discount").alias("discount"),
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "price", "discount"],
        "metric",
        "value",
    )


@register(
    "text_edit_distance",
    oracle="""
    WITH heads AS (
      SELECT doc_id, substr(text, 1, 40) AS head
      FROM documents WHERE doc_id < 30)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.head, b.head) AS INT) AS edit_dist
    FROM heads a JOIN heads b ON a.doc_id < b.doc_id
    WHERE levenshtein(a.head, b.head) <= 30
    """,
)
def text_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Levenshtein distance over bounded document prefixes:
    the fuzzy-match primitive (typo-level dedup). Bounded slice because
    edit distance is O(len^2) per pair and O(n^2) pairs -- at scale this
    runs AFTER an LSH/ngram candidate filter, never standalone."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 30)
        .select("doc_id", F.substring("text", 1, 40).alias("head"))
    )
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(F.broadcast(b), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein(F.col("a.head"), F.col("b.head")).cast("int").alias(
                "edit_dist"
            ),
        )
        .filter(F.col("edit_dist") <= 30)
    )


@register(
    "agg_mode",
    oracle="""
    SELECT l_returnflag,
           CAST(arg_max(cnt_key, cnt * 100 + cnt_key) AS INT) AS mode_qty,
           CAST(MAX(cnt) AS BIGINT) AS mode_count
    FROM (
      SELECT l_returnflag, CAST(l_quantity AS INT) AS cnt_key, COUNT(*) AS cnt
      FROM lineitem GROUP BY 1, 2)
    GROUP BY l_returnflag
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) per group via count + arg-max -- two
    shuffles, no sort. Ties broken deterministically by the composite
    scalar cnt*100+key (key < 100), identical in both engines."""
    li = load(spark, sf_dir, "lineitem")
    counted = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("int").alias("cnt_key")
    ).agg(F.count("*").alias("cnt"))
    return counted.groupBy("l_returnflag").agg(
        F.max_by("cnt_key", F.col("cnt") * 100 + F.col("cnt_key"))
        .cast("int")
        .alias("mode_qty"),
        F.max("cnt").alias("mode_count"),
    )


@register(
    "agg_approx_topk",
    oracle="""
    SELECT c_mktsegment AS segment, COUNT(*) AS n, TRUE AS within_tol
    FROM customer GROUP BY 1
    """,
)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items sketch (approx_top_k, Spark 4): per-partition
    sketches merge associatively, so heavy hitters over 100 TB are one
    pass + one tiny merge -- the streaming-friendly form of a
    count-per-key top-k.

    Sketch internals are engine-specific, so like the other approximate
    aggregates this asserts the ACCURACY CONTRACT instead of raw sketch
    state: with k chosen above the column's cardinality (and far below
    maxItemsTracked), every distinct item is tracked exactly, so each
    sketch estimate must EQUAL the exact group count. The query emits
    the exact counts plus the Spark-verified equality flag; the oracle
    emits the same exact counts plus literal TRUE."""
    c = load(spark, sf_dir, "customer")
    est = (
        c.agg(F.expr("approx_top_k(c_mktsegment, 10)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("segment"), F.col("e.count").alias("est")
        )
    )
    exact = c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return exact.join(F.broadcast(est), "segment", "left").select(
        "segment",
        "n",
        (F.col("est") == F.col("n")).alias("within_tol"),
    )


@register(
    "agg_hll_union",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_cust,
           TRUE AS within_tol
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting: build an independent HLL
    sketch per (priority, status) partition, then MERGE the sketches
    per priority and estimate -- the two-level pattern that makes
    distinct counts incremental at 100 TB (each ingest batch/partition
    sketches locally; a rollup unions kilobyte sketches instead of
    re-scanning the data; the same merge runs cross-datacenter).
    Differs from agg_approx_distinct (one-shot approx aggregate): here
    the sketch itself is the materialized, reusable artifact.

    Sketch internals are engine-specific, so the checked contract is
    accuracy, not the raw estimate: emit the exact distinct count plus
    a Spark-computed within_tol (|union-estimate - exact| <= 5% of
    exact; lgConfigK=14 gives ~0.8% rsd, so 5% is a stable margin);
    the oracle emits the same exact count plus literal TRUE."""
    o = load(spark, sf_dir, "orders")
    sketches = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.hll_sketch_agg("o_custkey", F.lit(14)).alias("sk"),
    )
    merged = sketches.groupBy("o_orderpriority").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_est"),
    )
    exact = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust")
    )
    return exact.join(merged, "o_orderpriority").select(
        "o_orderpriority",
        "n_cust",
        (
            F.abs(F.col("_est") - F.col("n_cust"))
            <= F.col("n_cust") * F.lit(0.05)
        ).alias("within_tol"),
    )


@register(
    "agg_corr",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))
                      * CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                      * CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
                 AS syy,
             CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))
                      * CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
                 AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           CAST(floor(((n * sxy) - (sx * sy))
                      / (sqrt((n * sxx) - (sx * sx))
                         * sqrt((n * syy) - (sy * sy))) * 1e9) AS BIGINT)
               AS corr_e9
    FROM m
    """,
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from EXACT integer moments: the five sums
    are accumulated as exact decimals (order-independent, single-pass,
    map-side partial aggregation -- the one-scan streaming form that
    scales), then the closed-form corr is one fixed double expression
    over identical exact inputs, so both engines produce the same bits
    and the floor-scaled value hash-matches. Spark's builtin corr()
    (and DuckDB's) use running covariance updates whose float error
    depends on partitioning order -- unusable for cross-engine
    equality and nondeterministic across cluster sizes; the
    moments form is how you make second-order statistics exactly
    reproducible on any cluster."""
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(14,2)")
    p = F.col("l_extendedprice").cast("decimal(14,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p * p).cast("double").alias("syy"),
        F.sum(q * p).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    corr = ((n * sxy) - (sx * sy)) / (
        F.sqrt((n * sxx) - (sx * sx)) * F.sqrt((n * syy) - (sy * sy))
    )
    return m.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        F.floor(corr * F.lit(1e9)).cast("bigint").alias("corr_e9"),
    )


@register(
    "scd2_dimension",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type AS state,
             epoch_us(ts) AS ts_us, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS prev
      FROM events),
    changes AS (
      SELECT user_id, state, ts_us, event_id FROM ordered
      WHERE prev IS NULL OR prev <> state)
    SELECT user_id, state,
           ts_us AS valid_from_us,
           lead(ts_us) OVER (
             PARTITION BY user_id
             ORDER BY ts_us, event_id) AS valid_to_us,
           CAST(CASE WHEN lead(ts_us) OVER (
                  PARTITION BY user_id
                  ORDER BY ts_us, event_id) IS NULL
                THEN 1 ELSE 0 END AS INT) AS is_current
    FROM changes
    """,
)
def scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension built from a change log: each
    user's event stream collapses to versioned rows [valid_from_us,
    valid_to_us) with an open-ended current version -- the warehouse
    pattern behind every history-preserving dimension load.

    Scale design: pure window algebra, no self-join. The naive SCD2
    build (join each row to "the next change for the same key") is a
    skew-prone range self-join; here change detection (lag) and
    interval closing (lead) are two window passes over the SAME
    partitioning (user_id), so the whole operator costs one shuffle
    and the second window reuses the first's hash partitioning. Event
    time is compared at exact microseconds (unix_micros) with
    event_id as the total-order tiebreaker, so versions are
    deterministic across engines and cluster sizes.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = (
        ev.withColumn("prev", F.lag("state").over(w))
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("state")))
        .drop("prev")
    )
    valid_to = F.lead("ts_us").over(w)
    return changes.select(
        "user_id",
        "state",
        F.col("ts_us").alias("valid_from_us"),
        valid_to.alias("valid_to_us"),
        F.when(valid_to.isNull(), F.lit(1)).otherwise(F.lit(0)).cast("int").alias("is_current"),
    )


@register(
    "agg_skew_kurtosis",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(q) AS DOUBLE) AS s1,
             CAST(SUM(q * q) AS DOUBLE) AS s2,
             CAST(SUM(q * q * q) AS DOUBLE) AS s3,
             CAST(SUM(q * q * q * q) AS DOUBLE) AS s4
      FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q
            FROM lineitem)
      GROUP BY l_returnflag),
    c AS (
      SELECT l_returnflag, n, s1 / n AS mu, s2 / n AS r2,
             s3 / n AS r3, s4 / n AS r4
      FROM m)
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           CAST(floor((r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu)
                      / ((r2 - mu * mu) * sqrt(r2 - mu * mu))
                      * 1e9) AS BIGINT) AS skew_e9,
           CAST(floor(((r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
                        - 3.0 * mu * mu * mu * mu)
                       / ((r2 - mu * mu) * (r2 - mu * mu)) - 3.0)
                      * 1e9) AS BIGINT) AS kurt_e9
    FROM c
    """,
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis from EXACT integer power sums
    (same discipline as agg_corr): l_quantity is integral, so the four
    power sums accumulate as overflow-safe BIGINTs -- exact, order-
    independent, map-side combinable -- and the central-moment algebra
    is one fixed double expression over identical exact inputs, making
    both statistics bit-reproducible across engines, partitionings,
    and cluster sizes. Spark's builtin skewness()/kurtosis() use
    running-update float recurrences whose error depends on row order;
    this is the single-pass streaming form you can trust at 1e11 rows
    per group (sum of q^4 at 50 max is ~6e17, inside BIGINT range).
    """
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    m = li.select("l_returnflag", q.alias("q")).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("q").cast("double").alias("s1"),
        F.sum(F.col("q") * F.col("q")).cast("double").alias("s2"),
        F.sum(F.col("q") * F.col("q") * F.col("q")).cast("double").alias("s3"),
        F.sum(F.col("q") * F.col("q") * F.col("q") * F.col("q"))
        .cast("double")
        .alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1") / n
    r2 = F.col("s2") / n
    r3 = F.col("s3") / n
    r4 = F.col("s4") / n
    var = r2 - mu * mu
    skew = (r3 - F.lit(3.0) * mu * r2 + F.lit(2.0) * mu * mu * mu) / (
        var * F.sqrt(var)
    )
    kurt = (
        r4
        - F.lit(4.0) * mu * r3
        + F.lit(6.0) * mu * mu * r2
        - F.lit(3.0) * mu * mu * mu * mu
    ) / (var * var) - F.lit(3.0)
    return m.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        F.floor(skew * F.lit(1e9)).cast("bigint").alias("skew_e9"),
        F.floor(kurt * F.lit(1e9)).cast("bigint").alias("kurt_e9"),
    )


_ROLLUP_TS_SQL = """
    SELECT event_type,
           CASE WHEN grouping(bh) = 0 THEN 'hour'
                WHEN grouping(bd) = 0 THEN 'day'
                ELSE 'all' END AS resolution,
           CASE WHEN grouping(bh) = 0 THEN bh * 3600000000
                WHEN grouping(bd) = 0 THEN bd * 86400000000
                ELSE -1 END AS bucket_start_us,
           COUNT(*) AS n,
           CAST(SUM(v) AS DOUBLE) AS sum_value
    FROM base
    GROUP BY GROUPING SETS ((event_type, bh), (event_type, bd),
                            (event_type))
"""


@register(
    "rollup_timeseries",
    oracle="""
    WITH base AS (
      SELECT event_type,
             epoch_us(ts) // 3600000000 AS bh,
             epoch_us(ts) // 86400000000 AS bd,
             CAST(value AS DECIMAL(14,2)) AS v
      FROM events)
    """
    + _ROLLUP_TS_SQL,
)
def rollup_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution time-series rollup (the hypertable /
    continuous-aggregate pattern): hourly, daily, and all-time
    aggregates per event type in ONE pass. GROUPING SETS over
    precomputed integer bucket indexes gives a single Expand +
    hash-aggregate plan -- one scan and one shuffle for all three
    resolutions, where the naive union-of-three-groupBys scans the
    fact table three times (decisive at 100 TB, where the scan IS the
    cost). Buckets are exact integer floor-divisions of microsecond
    epochs, value sums are exact decimal cents -- both
    order-independent, so the rollup is engine- and
    partitioning-reproducible. The identical SELECT text runs on both
    engines; only the bucket-index derivation differs (unix_micros vs
    epoch_us)."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("bh"),
        F.expr("unix_micros(ts) div 86400000000").alias("bd"),
        F.col("value").cast("decimal(14,2)").alias("v"),
    )
    ev.createOrReplaceTempView("base")
    return spark.sql(_ROLLUP_TS_SQL)


CM_DEPTH = 4
CM_WIDTH = 1024
CM_SLACK = 8  # upper bound: est <= exact + CM_SLACK * N / CM_WIDTH


def _cm_hash(depth: int, key) -> F.Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(str(depth)), key.cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % CM_WIDTH
    )


@register(
    "agg_countmin",
    oracle="""
    SELECT l_suppkey, COUNT(*) AS exact_n,
           TRUE AS lower_ok, TRUE AS upper_ok
    FROM lineitem GROUP BY l_suppkey
    """,
)
def agg_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch, built and queried distributed. The
    sketch is depth x width counters (md5 row hashes); building it is
    one Expand (explode to depth rows) + one hash aggregate, and the
    result is a few-KB MERGEABLE artifact: counters from independent
    batches/partitions add cell-wise, so 100 TB of per-shard sketches
    roll up without rescanning -- the same incremental property as
    agg_hll_union, but for point frequencies instead of cardinality.
    Point estimates min over the depth rows via an equi-join of probe
    cells against the sketch.

    Sketch layouts are engine-specific, so the checked contract is
    CM's accuracy guarantee, per probe key: est >= exact (structural
    -- collisions only ever add) and est <= exact + 8N/width (the
    eps*N overcount bound with generous slack; verified to hold
    deterministically for this data at sf0.01 and sf0.1). The oracle
    emits the exact frequencies plus literal TRUE."""
    li = load(spark, sf_dir, "lineitem")
    key = F.col("l_suppkey")

    cells = [
        F.struct(F.lit(i).alias("d"), _cm_hash(i, key).alias("b"))
        for i in range(CM_DEPTH)
    ]
    sketch = (
        li.select(F.explode(F.array(*cells)).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    exact = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("exact_n"))
    n_total = li.count()  # scalar: the bound parameter, not data
    bound = (CM_SLACK * n_total + CM_WIDTH - 1) // CM_WIDTH

    probe_key = F.col("l_suppkey")
    probe_cells = [
        F.struct(F.lit(i).alias("d"), _cm_hash(i, probe_key).alias("b"))
        for i in range(CM_DEPTH)
    ]
    probes = exact.select(
        "l_suppkey", "exact_n", F.explode(F.array(*probe_cells)).alias("c")
    ).select("l_suppkey", "exact_n", F.col("c.d").alias("d"), F.col("c.b").alias("b"))

    est = (
        probes.join(F.broadcast(sketch), ["d", "b"])
        .groupBy("l_suppkey", "exact_n")
        .agg(F.min("cnt").alias("est"))
    )
    return est.select(
        "l_suppkey",
        "exact_n",
        (F.col("est") >= F.col("exact_n")).alias("lower_ok"),
        (F.col("est") <= F.col("exact_n") + F.lit(int(bound))).alias("upper_ok"),
    )


@register(
    "anomaly_mad",
    oracle="""
    WITH ranked AS (
      SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events),
    med AS (
      SELECT event_type, MAX(CASE WHEN rn = (n + 1) // 2 THEN value END) AS med
      FROM ranked GROUP BY event_type),
    dev AS (
      SELECT r.event_type, r.event_id, abs(r.value - m.med) AS dev, m.med,
             row_number() OVER (PARTITION BY r.event_type
                                ORDER BY abs(r.value - m.med), r.event_id)
                 AS rn,
             count(*) OVER (PARTITION BY r.event_type) AS n
      FROM ranked r JOIN med m ON m.event_type = r.event_type),
    mad AS (
      SELECT event_type, MAX(med) AS med,
             MAX(CASE WHEN rn = (n + 1) // 2 THEN dev END) AS mad
      FROM dev GROUP BY event_type)
    SELECT d.event_type,
           COUNT(*) AS n,
           MAX(a.med) AS med,
           MAX(a.mad) AS mad,
           CAST(SUM(CASE WHEN 0.6745 * d.dev > 3.5 * a.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM dev d JOIN mad a ON a.event_type = d.event_type
    GROUP BY d.event_type
    """,
)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation: flag
    values whose modified z-score (0.6745 * |x - med| / MAD) exceeds
    3.5 -- the standard data-quality screen that, unlike mean/stddev
    z-scores, is not itself dragged by the outliers it hunts.

    Reproducibility: medians are DISCRETE (the value at row (n+1)//2
    under a total order with event_id tiebreaker), not interpolated --
    interpolated medians differ in engines' formula choices and would
    make threshold comparisons flip near the boundary. Every derived
    quantity (abs deviation, the two products in the comparison) is
    a single IEEE op on identical inputs, so anomaly counts are
    bit-deterministic on both engines at any partitioning. Scale: two
    window passes + two joins on the group key; no collect, no
    per-group driver work."""
    ev = load(spark, sf_dir, "events").select("event_type", "event_id", "value")
    wv = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "event_id",
        "value",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("value"))
        ).alias("med")
    )
    wd = Window.partitionBy("event_type").orderBy("dev", "event_id")
    dev = (
        ranked.join(med, "event_type")
        .select(
            "event_type",
            "event_id",
            F.abs(F.col("value") - F.col("med")).alias("dev"),
            "med",
        )
        .select(
            "event_type",
            "event_id",
            "dev",
            "med",
            F.row_number().over(wd).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
    )
    mad = dev.groupBy("event_type").agg(
        F.max("med").alias("med"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("dev"))
        ).alias("mad"),
    )
    return (
        dev.select("event_type", "dev")
        .join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.sum(
                F.when(
                    F.lit(0.6745) * F.col("dev") > F.lit(3.5) * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_anomalies"),
        )
    )


@register(
    "win_funnel",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us,
             lead(event_type, 1) OVER w AS e1,
             lead(event_type, 2) OVER w AS e2,
             lead(epoch_us(ts), 2) OVER w AS ts2_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
    SELECT user_id, ts_us AS view_ts_us, ts2_us AS purchase_ts_us,
           CAST((ts2_us - ts_us) // 1000000 AS BIGINT) AS funnel_secs
    FROM ordered
    WHERE event_type = 'view' AND e1 = 'click' AND e2 = 'purchase'
    """,
)
def win_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel detection: find every strictly consecutive
    view -> click -> purchase sequence per user (the MATCH_RECOGNIZE /
    funnel-analysis primitive). One window pass with two leads over
    the (user, time) total order -- a single shuffle on user_id, no
    self-joins, so the pattern scan costs the same as any windowed
    read of the event log. Event time at exact microseconds with
    event_id tiebreaker keeps match sets identical across engines."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        "ts_us",
        F.lead("event_type", 1).over(w).alias("e1"),
        F.lead("event_type", 2).over(w).alias("e2"),
        F.lead("ts_us", 2).over(w).alias("ts2_us"),
    )
    return seq.where(
        (F.col("event_type") == "view")
        & (F.col("e1") == "click")
        & (F.col("e2") == "purchase")
    ).select(
        "user_id",
        F.col("ts_us").alias("view_ts_us"),
        F.col("ts2_us").alias("purchase_ts_us"),
        F.expr("(ts2_us - ts_us) div 1000000").alias("funnel_secs"),
    )


@register(
    "cdc_merge_apply",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events),
    last AS (SELECT * FROM ranked WHERE rn = 1)
    SELECT user_id, event_type AS last_op, ts AS last_ts, value AS last_value
    FROM last
    WHERE event_type <> 'error'
    """,
)
def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge (last-writer-wins upsert apply): collapse a change
    stream to final state per key -- the batch core of every MERGE
    INTO / upsert-materialization pipeline. Ops are the fixture's
    event types; 'error' rows act as deletes, so a key whose LAST
    change is a delete leaves the snapshot entirely. Scale: one
    shuffle on the merge key and one row_number window ordered by
    (ts, event_id) -- the event_id tiebreak makes replays
    deterministic under same-timestamp races, which is what keeps
    exactly-once semantics honest when a CDC source retries. The
    delete filter runs AFTER last-wins resolution (a delete must beat
    earlier updates), which is the ordering bugs in hand-rolled merge
    jobs usually get wrong."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "value", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_type").alias("last_op"),
            F.col("ts").alias("last_ts"),
            F.col("value").alias("last_value"),
        )
    )


@register(
    "agg_hll_intersection",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
    b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT (SELECT COUNT(*) FROM a) AS n_click,
           (SELECT COUNT(*) FROM b) AS n_purchase,
           (SELECT COUNT(*) FROM a JOIN b USING (user_id)) AS n_both,
           TRUE AS within_tol
    """,
)
def agg_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-algebra set intersection: |A∩B| estimated by
    inclusion-exclusion over three HLL sketches (est(A) + est(B) -
    est(A∪B)), where the union sketch is a MERGE of the two per-set
    sketches -- never a re-scan. This is the audience-overlap query
    every analytics platform answers from stored per-segment sketches;
    at 100 TB the three sketches are kilobytes and the intersection of
    any segment pair is computable without touching raw data again.
    Sketch internals are engine-specific, so the checked contract is
    accuracy: exact counts plus a Spark-computed within_tol
    (inclusion-exclusion error bounded by 5% of |A|+|B|; lgConfigK=14
    gives ~0.8% rsd per estimate); the oracle emits the same exact
    counts plus literal TRUE."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    ska = a.agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk_a"))
    skb = b.agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk_b"))
    sk = ska.crossJoin(skb).select(
        F.hll_sketch_estimate("sk_a").alias("est_a"),
        F.hll_sketch_estimate("sk_b").alias("est_b"),
        F.hll_sketch_estimate(
            F.hll_union("sk_a", "sk_b")
        ).alias("est_u"),
    )
    exact = (
        a.distinct()
        .withColumn("_ina", F.lit(1))
        .join(b.distinct().withColumn("_inb", F.lit(1)), "user_id", "full")
        .agg(
            F.count_if(F.col("_ina").isNotNull()).alias("n_click"),
            F.count_if(F.col("_inb").isNotNull()).alias("n_purchase"),
            F.count_if(
                F.col("_ina").isNotNull() & F.col("_inb").isNotNull()
            ).alias("n_both"),
        )
    )
    return exact.crossJoin(F.broadcast(sk)).select(
        "n_click",
        "n_purchase",
        "n_both",
        (
            F.abs(
                (F.col("est_a") + F.col("est_b") - F.col("est_u"))
                - F.col("n_both")
            )
            <= (F.col("n_click") + F.col("n_purchase")) * F.lit(0.05)
        ).alias("within_tol"),
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
    WITH words AS (
      SELECT event_type,
             user_id // 32 AS w,
             bit_or(1::BIGINT << CAST(user_id % 32 AS INT)) AS bits
      FROM events GROUP BY 1, 2)
    SELECT event_type,
           CAST(SUM(bit_count(bits)) AS BIGINT) AS n_users_bitmap,
           (SELECT COUNT(DISTINCT user_id) FROM events e
             WHERE e.event_type = words.event_type) AS n_users_exact
    FROM words
    GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-exact distinct counting: each 32-id block of the user
    domain becomes one word (32-bit masks keep every shift below the
    int64 sign bit in both engines, as in the Bloom prefilter), per-(group, word) bit_or folds
    members in, and popcount-sum gives the EXACT distinct count from a
    mergeable artifact -- the roaring-bitmap pattern every OLAP engine
    uses when the ID domain is bounded or dictionary-encoded. Same
    merge algebra as the HLL family (partial bitmaps union across
    partitions, batches, datacenters) but exact, at the price of
    domain-proportional size. The query emits both the bitmap-derived
    and the direct distinct count; the oracle recomputes both, so the
    bitmap path is equality-checked, not trusted. Scale: one shuffle
    on (group, word) -- word count is domain/32, independent of row
    count -- then a tiny per-group popcount rollup."""
    ev = load(spark, sf_dir, "events").select("event_type", "user_id")
    words = ev.groupBy(
        "event_type", F.expr("user_id div 32").alias("w")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(cast(1 as bigint), cast(user_id % 32 as int))")
        ).alias("bits")
    )
    bitmap = words.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_users_bitmap")
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users_exact")
    )
    return bitmap.join(exact, "event_type")


@register(
    "trend_linear_slope",
    oracle="""
    WITH pts AS (
      SELECT event_type,
             CAST(floor(epoch(ts)) - epoch(TIMESTAMP '2024-01-01') AS BIGINT)
                 // 3600 AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts GROUP BY 1)
    SELECT event_type, n,
           ROUND((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 9)
               AS slope_cents_per_hour
    FROM m
    """,
)
def trend_linear_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares trend: the OLS slope of event value over
    time, from EXACT integer moments (n, Σx, Σy, Σxy, Σx²) with one
    IEEE division at the end -- agg_corr's sibling, and the
    drift-detection primitive monitoring pipelines fit per metric.
    Hours-since-epoch-origin and integer cents keep every moment in
    int64 (x <= 720 hours, y <= 1e4 cents, n <= fact size: Σxy bounded
    far under 2^63 even at 100 TB per group). One map-side-combinable
    aggregation; adding groups costs nothing."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "CAST(unix_timestamp(ts) - unix_timestamp("
            "TIMESTAMP '2024-01-01 00:00:00') AS BIGINT) div 3600"
        ).alias("x"),
        F.round(F.col("value") * 100).cast("bigint").alias("y"),
    )
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        * F.lit(1.0)
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    )
    return m.select(
        "event_type", "n", F.round(slope, 9).alias("slope_cents_per_hour")
    )


@register(
    "agg_weighted_avg",
    oracle="""
    SELECT p.p_brand,
           CAST(SUM(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT)
               AS total_qty,
           ROUND(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                     * CAST(round(l.l_quantity) AS BIGINT))
                 * 1.0 /
                 (100.0 * SUM(CAST(round(l.l_quantity) AS BIGINT))), 6)
               AS wavg_price
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY 1 ORDER BY 1
    """,
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per brand: numerator and
    denominator accumulate as EXACT integers (cents x units -- bounded
    by 1e7 x 50 per row, Σ far inside int64 at any group size) and the
    average is ONE IEEE division at the end -- the only structure
    under which a weighted mean is bit-identical across partition
    orders and engines. The naive avg(price * qty / sum) form
    re-associates float ops per partition and drifts. One broadcast
    dim join + one rollup."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    qty = F.round(F.col("l_quantity")).cast("bigint")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(qty).cast("bigint").alias("total_qty"),
            F.round(
                F.sum(cents * qty) * F.lit(1.0) / (F.lit(100.0) * F.sum(qty)),
                6,
            ).alias("wavg_price"),
        )
        .orderBy("p_brand")
    )


@register(
    "anomaly_zscore_window",
    oracle="""
    WITH pts AS (
      SELECT event_type, event_id,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS s1,
             CAST(SUM(y * y) AS BIGINT) AS s2
      FROM pts GROUP BY 1)
    SELECT p.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN (p.y * m.n - m.s1) * (p.y * m.n - m.s1)
                          > 9 * (m.n * m.s2 - m.s1 * m.s1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM pts p JOIN m ON m.event_type = p.event_type
    GROUP BY 1
    """,
)
def anomaly_zscore_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly screen with the sqrt eliminated: |y - mu| >
    3*sigma is squared and cross-multiplied into the all-integer form
    (y*n - s1)^2 > 9*(n*s2 - s1^2), so the anomaly VERDICT -- the bit
    that triggers action -- is exact int64 arithmetic with no float
    comparison anywhere (anomaly_mad's moment-based sibling; MAD
    resists outlier contamination, z-score is the cheap first pass).
    Overflow check: y <= 1e4 cents, n <= 6e5 at sf0.1 -> y*n <= 6e9,
    squared 3.6e19 EXCEEDS int64 -- so the compare runs in DOUBLE
    after exact integer construction (products are correctly rounded
    IEEE ops on exactly-represented inputs, deterministic in both
    engines). Scale: one moment rollup per group, one broadcast join
    back, one counting pass."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("y")
    )
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s1"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("s2"),
    )
    j = ev.join(F.broadcast(m), "event_type")
    dev = (F.col("y") * F.col("n") - F.col("s1")).cast("double")
    var_n2 = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast(
        "double"
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum((dev * dev > F.lit(9.0) * var_n2).cast("int"))
        .cast("bigint")
        .alias("n_anomalies"),
    )


@register(
    "join_scd2_asof",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type AS state,
             epoch_us(ts) AS ts_us, event_id,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS prev
      FROM events),
    changes AS (
      SELECT user_id, state, ts_us, event_id FROM ordered
      WHERE prev IS NULL OR prev <> state),
    dim AS (
      SELECT user_id, state,
             ts_us AS valid_from_us,
             lead(ts_us) OVER (PARTITION BY user_id
               ORDER BY ts_us, event_id) AS valid_to_us
      FROM changes),
    facts AS (
      SELECT user_id, epoch_us(ts) - 3600000000 AS probe_us, event_id
      FROM events WHERE event_type = 'purchase'),
    j AS (
      SELECT d.state
      FROM facts f JOIN dim d
        ON d.user_id = f.user_id
       AND f.probe_us >= d.valid_from_us
       AND (d.valid_to_us IS NULL OR f.probe_us < d.valid_to_us))
    SELECT state,
           CAST(COUNT(*) AS BIGINT) AS n_purchases
    FROM j GROUP BY state
    """,
)
def join_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The as-of DIMENSION join — the consumer side of
    scd2_dimension: each purchase fact joins the state version that
    was valid AT ITS TIMESTAMP (valid_from <= ts < valid_to, open
    current interval), the query every type-2 dimension exists to
    answer — probed here ONE HOUR BEFORE each purchase, i.e. "what
    state was this user in leading into conversion" (the attribution
    question; probing at the purchase itself is degenerate, every
    purchase starts its own version). Intervals partition each user's
    timeline, so a probe matches at most one version; probes earlier
    than the user's first version simply don't match (inner join) —
    purchases within the first hour of a user's history are
    pre-history by construction.

    Scale shape: the join key is the equi half (user_id) — one
    co-partitioned shuffle, identical to the production layout where
    facts and the SCD2 dimension are both bucketed on the entity key —
    and the interval predicate evaluates as a cheap post-join filter
    over the per-user version list (bounded per user), NEVER a range
    cross join. The dimension build reuses scd2_dimension's two-window
    single-shuffle plan."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = (
        ev.withColumn("prev", F.lag("state").over(w))
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("state")))
        .drop("prev")
    )
    dim = changes.select(
        F.col("user_id").alias("d_user"),
        "state",
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w).alias("valid_to_us"),
    )
    facts = ev.filter(F.col("state") == "purchase").select(
        "user_id", (F.col("ts_us") - 3600000000).alias("probe_us"), "event_id"
    )
    j = facts.join(
        dim,
        (F.col("user_id") == F.col("d_user"))
        & (F.col("probe_us") >= F.col("valid_from_us"))
        & (
            F.col("valid_to_us").isNull()
            | (F.col("probe_us") < F.col("valid_to_us"))
        ),
    )
    return j.groupBy("state").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases")
    )


@register(
    "timeseries_ewma",
    oracle="""
    WITH h AS (
      SELECT event_type,
             epoch_us(ts) // 3600000000 AS bh,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY event_type, bh),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bh) AS rn
      FROM h),
    j AS (
      SELECT a.event_type, a.bh,
             CAST(SUM(b.cnt * CAST(pow(2, 15 - (a.rn - b.rn)) AS BIGINT))
                  AS BIGINT) AS ewma_num,
             CAST(SUM(CAST(pow(2, 15 - (a.rn - b.rn)) AS BIGINT))
                  AS BIGINT) AS w_sum
      FROM r a JOIN r b
        ON a.event_type = b.event_type AND b.rn BETWEEN a.rn - 15 AND a.rn
      GROUP BY a.event_type, a.bh)
    SELECT event_type, CAST(bh AS BIGINT) AS bh, ewma_num, w_sum,
           round(CAST(ewma_num AS DOUBLE) / w_sum, 6) AS ewma
    FROM j
    """,
)
def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 1/2) of hourly
    event volume per event type — the classic smoothing pass behind
    trend dashboards and alerting thresholds. The recursion s_t =
    a*x_t + (1-a)*s_{t-1} is unrolled into its closed form and
    TRUNCATED at 16 terms (weights below 2^-16 contribute less than
    one part in 65536 — under the integer resolution of the counts
    themselves), which turns an inherently sequential recurrence into
    a bounded ROWS window: dyadic weights become exact integer
    bit-shifts (shiftleft), and the only float op is one terminal
    division. The EWMA is defined over the OBSERVED hour sequence
    (row basis, documented; absent hours don't decay), matching the
    oracle's row_number basis exactly.

    Scale shape: one map-side-combinable groupBy to hourly grain
    (output is |types| x |hours|, tiny relative to input), then a
    16-row bounded window partitioned by event_type — no unbounded
    frame, no single-partition stage, state per key is 16 integers.
    The DuckDB oracle states the same closed form via a bounded
    rn-band self-join.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.expr("unix_micros(ts) div 3600000000").alias("bh")
    )
    h = ev.groupBy("event_type", "bh").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w16 = (
        Window.partitionBy("event_type")
        .orderBy("bh")
        .rowsBetween(-15, Window.currentRow)
    )
    withv = h.withColumn("vals", F.collect_list("cnt").over(w16))
    # weight of element i (0-based, oldest first) in an n-long frame:
    # 2^(i + 16 - n)  ->  newest term gets 2^15, each step back halves.
    num = F.expr(
        "aggregate(transform(vals, (x, i) -> "
        "shiftleft(x, CAST(i + 16 - size(vals) AS INT))), "
        "CAST(0 AS BIGINT), (a, b) -> a + b)"
    )
    wsum = F.expr(
        "shiftleft(CAST(1 AS BIGINT), 16) "
        "- shiftleft(CAST(1 AS BIGINT), 16 - size(vals))"
    )
    return (
        withv.withColumn("ewma_num", num.cast("bigint"))
        .withColumn("w_sum", wsum.cast("bigint"))
        .withColumn(
            "ewma",
            F.round(F.col("ewma_num").cast("double") / F.col("w_sum"), 6),
        )
        .select("event_type", F.col("bh").cast("bigint").alias("bh"),
                "ewma_num", "w_sum", "ewma")
    )


@register(
    "events_bounce_rate",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    numbered AS (
      SELECT user_id, event_id, ts, event_type,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked),
    sess0 AS (
      SELECT user_id, session_no, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, session_no
                                ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id, session_no) AS n_events
      FROM numbered),
    sess AS (
      SELECT user_id, session_no, event_type AS entry_type,
             CAST(n_events AS BIGINT) AS n_events
      FROM sess0 WHERE rn = 1)
    SELECT entry_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounces,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS bounce_e6
    FROM sess GROUP BY entry_type
    """,
)
def events_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate by session entry type: sessionize (same 30-minute
    gap rule as ``win_sessionize``), find each session's ENTRY event
    type, and report per entry type how many sessions start there and
    what share end after that single event — the engagement read
    behind landing-page and first-touch analyses.

    Scale shape: the sessionization is the canonical two-window +
    one-shuffle-on-user_id pattern; the per-session rollup reuses the
    same user_id partitioning (entry type via min_by over the exact
    (ts, event_id) session order — no second sort), and the final
    entry-type census is a map-side-combinable groupBy on a small key.
    The bounce share is an exact integer millionths division.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    numbered = _sessionized(ev)
    sess = numbered.groupBy("user_id", "session_no").agg(
        F.min_by("event_type", F.struct("ts", "event_id")).alias("entry_type"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    return sess.groupBy("entry_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("int")).cast("bigint").alias(
            "n_bounces"
        ),
        F.expr(
            "(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000)"
            " div count(*)"
        )
        .cast("bigint")
        .alias("bounce_e6"),
    )


@register(
    "orders_skyline_2d",
    oracle="""
    WITH p AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
             CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day
      FROM orders),
    g AS (SELECT price_c, MIN(day) AS min_day FROM p GROUP BY price_c),
    s AS (
      SELECT price_c, min_day,
             MIN(min_day) OVER (ORDER BY price_c DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING) AS prev_min
      FROM g)
    SELECT a.o_orderkey, a.price_c, a.day
    FROM p a JOIN s ON a.price_c = s.price_c
    WHERE a.day = s.min_day
      AND (s.prev_min IS NULL OR s.min_day < s.prev_min)
    """,
)
def orders_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2D skyline (Pareto-optimal front): orders not dominated on
    (maximize price, minimize order date) — no other order is both at
    least as expensive and at least as early with one strict — the
    multi-criteria shortlist operator (skyline queries, Borzsony et
    al.'s classic) that no single ORDER BY can express.

    Scale shape: in 2D the skyline is exactly the strictly-decreasing
    frontier of min(day) over descending price, so the quadratic
    NOT-EXISTS dominance definition collapses to a GLOBAL PREFIX MIN —
    computed with the same two-phase trick as ``_global_cumsum``
    (range-repartition by price desc, per-partition running min, then
    a broadcast partition-count-sized table of preceding-partition
    mins), so no data-sized single-partition window exists anywhere.
    The candidate set is first reduced to one row per distinct price
    (map-side combinable groupBy), and survivors re-attach their order
    keys with one equi-join on price. Ties: equal (price, day) points
    all survive; a later-day point at an equal price is dominated.
    """
    p = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_c"),
        # o_orderdate infers as TIMESTAMP_NTZ; cast to the session-zoned
        # type (UTC session) before the epoch arithmetic, mirroring the
        # events-path normalization in catalog.load.
        F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
        .cast("bigint")
        .alias("day"),
    )
    from metadata_extractors_api_spark.operators.quality import (
        _strict_prefix_min_desc,
    )

    # Distinct-price grain; _strict_prefix_min_desc's offsets branch
    # re-executes its input, so checkpointed the fact scan + groupBy
    # runs once.
    g = p.groupBy("price_c").agg(F.min("day").alias("min_day")).localCheckpoint()
    s = _strict_prefix_min_desc(g, "price_c", "min_day").select(
        "price_c", "min_day", "prev_min"
    )
    return (
        p.join(s, "price_c")
        .filter(
            (F.col("day") == F.col("min_day"))
            & (F.col("prev_min").isNull() | (F.col("min_day") < F.col("prev_min")))
        )
        .select("o_orderkey", "price_c", "day")
    )


@register(
    "orders_prorate_monthly",
    oracle="""
    WITH sp0 AS (
      SELECT o.o_orderkey,
             CAST(o.o_orderdate AS DATE) AS od,
             CAST(MAX(l.l_shipdate) AS DATE) AS sd,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate, o.o_totalprice),
    sp AS (
      SELECT o_orderkey, cents,
             LEAST(od, sd) AS s, GREATEST(od, sd) AS e
      FROM sp0),
    m AS (
      SELECT o_orderkey, s, e, cents,
             date_diff('day', s, e) + 1 AS total_days,
             unnest(generate_series(date_trunc('month', s),
                                    date_trunc('month', e),
                                    INTERVAL 1 MONTH)) AS mstart
      FROM sp),
    a AS (
      SELECT strftime(CAST(mstart AS DATE), '%Y-%m') AS month,
             cents * LEAST(date_diff('day', s,
                                     last_day(CAST(mstart AS DATE))) + 1,
                           total_days) // total_days
             - cents * GREATEST(date_diff('day', s, CAST(mstart AS DATE)), 0)
               // total_days AS alloc
      FROM m)
    SELECT month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(alloc) AS BIGINT) AS alloc_cents
    FROM a GROUP BY month
    """,
)
def orders_prorate_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar proration: spread each order's value across the
    calendar months its activity span covers (order date through last
    shipment, normalized to [least, greatest] — the synthetic fixture
    ships before ordering sometimes), by days of overlap — the
    revenue-recognition / capacity-planning allocation every finance
    and ops rollup needs. Allocation uses the TELESCOPING integer
    scheme alloc_m = (cents*days_thru_m) div total - (cents*
    days_before_m) div total, so per-order allocations sum EXACTLY to
    the order's cents (the remainders cancel by construction — no
    float proration drift, no largest-remainder second pass).

    Scale shape: one lineitem aggregation (map-side combinable on
    l_orderkey), a co-keyed join, then a linear month explode (span/30
    rows per order) into a map-side-combinable month census. The
    explode carries INTEGER month indexes; all per-month calendar
    facts (first/last epoch day, label) come from a ~800-row broadcast
    calendar dimension covering 1970-2035 — running date functions
    (last_day/datediff/date_format) on the dimension instead of on
    the exploded rows measured 2.2 -> 1.3 s at sf0.1 (the classic
    calendar-dim pattern; at 100 TB the explode is the data-sized
    stage, so per-row work there is what matters). No windows, no
    skew (months are near-uniform), everything exact integer on
    non-negative operands.
    """
    li = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("sd"))
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("od"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    sp = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            "o_orderkey",
            "cents",
            F.least("od", "sd").alias("s"),
            F.greatest("od", "sd").alias("e"),
        )
        .select(
            "o_orderkey",
            "cents",
            F.datediff("s", F.lit("1970-01-01").cast("date")).alias("s_day"),
            (F.datediff("e", "s") + 1).alias("total_days"),
            (F.year("s") * 12 + F.month("s") - 1).alias("m0"),
            (F.year("e") * 12 + F.month("e") - 1).alias("m1"),
        )
    )
    # broadcast calendar dimension: month index -> epoch-day bounds +
    # label. Covers 1970-2035; spans outside would silently drop in
    # the join, so the range is deliberately far wider than any
    # fixture vintage.
    dim = spark.sql(
        """
        SELECT (year(m) * 12 + month(m) - 1) AS midx,
               datediff(m, DATE'1970-01-01') AS mfirst,
               datediff(last_day(m), DATE'1970-01-01') AS mlast,
               date_format(m, 'yyyy-MM') AS month
        FROM (SELECT explode(sequence(DATE'1970-01-01', DATE'2035-12-01',
                                      interval 1 month)) m)
        """
    )
    mo = sp.select(
        "o_orderkey",
        "cents",
        "s_day",
        "total_days",
        F.explode(F.sequence("m0", "m1")).alias("midx"),
    )
    j = mo.join(F.broadcast(dim), "midx")
    thru = F.least(F.col("mlast") - F.col("s_day") + 1, F.col("total_days"))
    before = F.greatest(F.col("mfirst") - F.col("s_day"), F.lit(0))
    a = j.withColumn("_thru", thru).withColumn("_before", before).select(
        "month",
        F.expr(
            "(cents * _thru) div total_days - (cents * _before) div total_days"
        ).alias("alloc"),
    )
    return a.groupBy("month").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("alloc").cast("bigint").alias("alloc_cents"),
    )


@register(
    "events_seasonal_profile",
    oracle="""
    SELECT event_type,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
               AS sum_micro,
           CAST((SUM(CAST(round(value * 1000000) AS BIGINT))
                 - ((SUM(CAST(round(value * 1000000) AS BIGINT))
                     % COUNT(*)) + COUNT(*)) % COUNT(*))
                // COUNT(*) AS BIGINT) AS mean_micro
    FROM events
    GROUP BY event_type, hod
    """,
)
def events_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile per event type: the 24-bucket
    diurnal fingerprint (count + exact integer-micro mean of the value
    channel) that seasonal-adjustment and anomaly thresholds divide
    by. One map-side-combinable groupBy on a bounded (|types| x 24)
    key space — the output is constant-sized no matter the input, so
    the profile is a broadcastable artifact for downstream residual
    scoring. Values are summed in exact round-to-micro integers; the
    mean is an explicit sign-safe FLOOR division — ``(s - pmod(s, n))
    / n`` subtracts the (always non-negative) positive remainder so
    the numerator is an exact multiple of n, on which truncating and
    flooring division coincide. Spark's ``div`` and DuckDB's ``//``
    disagree on negative operands (trunc vs floor differs by engine
    version), and events.value is NOT schema-constrained non-negative,
    so the plain ``sum div count`` form would silently diverge the day
    a fixture carries a negative value; this form is engine-independent
    for any sign.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("bigint").alias("hod"),
        F.round(F.col("value") * 1_000_000).cast("bigint").alias("micro"),
    )
    return ev.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("micro").cast("bigint").alias("sum_micro"),
        F.expr("(sum(micro) - pmod(sum(micro), count(*))) div count(*)")
        .cast("bigint")
        .alias("mean_micro"),
    )


@register(
    "scd2_build_history",
    oracle="""
    WITH ch AS (
      SELECT user_id, event_type, value, ts, event_id,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    eff AS (
      SELECT user_id, event_type, ts, event_id
      FROM ch
      WHERE prev_type IS NULL OR event_type <> prev_type),
    v AS (
      SELECT user_id, event_type,
             epoch_us(ts) AS valid_from_us,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
               AS valid_to_us,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS BIGINT)
               AS version
      FROM eff)
    SELECT user_id, event_type AS state, valid_from_us, valid_to_us,
           version, valid_to_us IS NULL AS is_current
    FROM v
    """,
)
def scd2_build_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a Type-2 slowly-changing-dimension history from a change
    stream: per user, consecutive duplicate states are suppressed
    (no-op change compression — the step that distinguishes SCD2
    building from a raw lag/lead window), and each surviving state
    change becomes a versioned validity interval [valid_from,
    valid_to) with the open current row flagged. This is the WRITE
    side of join_scd2_asof (analytics.py) — together they close the
    dimension-versioning loop: build the history here, point-in-time
    join against it there.

    Deterministic through the (ts, event_id) total order; timestamps
    exported as exact epoch microseconds (the DATE/TIMESTAMP-free
    oracle discipline).

    Scale shape: both windows and the suppression filter share ONE
    user-partitioned sort exchange (the sessionize profile); no
    global window, no join. At 100 TB this is a single keyed
    shuffle — the standard SCD2 nightly build."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ch = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    eff = ch.filter(
        F.col("prev_type").isNull()
        | (F.col("event_type") != F.col("prev_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return eff.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("valid_from_us"),
        F.lead(F.unix_micros("ts")).over(w2).alias("valid_to_us"),
        F.row_number().over(w2).cast("bigint").alias("version"),
    ).withColumn("is_current", F.col("valid_to_us").isNull())


# ---------------------------------------------------------------------------
# OHLC downsampling + robust trend
# ---------------------------------------------------------------------------


@register(
    "timeseries_ohlc_bars",
    oracle="""
    WITH pts AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    seq AS (
      SELECT day // 7 AS bar, day, o_orderkey, cents,
             ROW_NUMBER() OVER (PARTITION BY day // 7
                                ORDER BY day, o_orderkey) AS rn_open,
             ROW_NUMBER() OVER (PARTITION BY day // 7
                                ORDER BY day DESC, o_orderkey DESC) AS rn_close
      FROM pts)
    SELECT bar,
           CAST(MAX(CASE WHEN rn_open = 1 THEN cents END) AS BIGINT) AS open_cents,
           CAST(MAX(cents) AS BIGINT) AS high_cents,
           CAST(MIN(cents) AS BIGINT) AS low_cents,
           CAST(MAX(CASE WHEN rn_close = 1 THEN cents END) AS BIGINT) AS close_cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS volume_cents
    FROM seq
    GROUP BY bar
    """,
)
def timeseries_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick downsampling of the order-price stream into
    7-day bars: open/close are the first/last trade of the bar under
    the total (day, orderkey) order, high/low the extrema, with count
    and exact-cent volume — the classic time-series downsample every
    monitoring store runs (and the aggregation shape win_first_last
    expresses per-key, lifted to calendar bars). The bar key is exact
    integer epoch-day // 7, not an engine week function (ISO-week
    definitions differ across engines).

    Scale shape: one shuffle on the bar key; the first/last selection
    is two BAR-partitioned rank windows (parallel at any SF — bars are
    calendar-bounded but rows within a bar scale, and the windows
    partition on the same key as the final aggregate, so the exchange
    is reused); money is exact integer cents end to end."""
    o = load(spark, sf_dir, "orders").select(
        F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
        .cast("bigint")
        .alias("day"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    pts = o.withColumn("bar", F.expr("day div 7").cast("bigint"))
    w_open = Window.partitionBy("bar").orderBy(F.asc("day"), F.asc("o_orderkey"))
    w_close = Window.partitionBy("bar").orderBy(
        F.desc("day"), F.desc("o_orderkey")
    )
    seq = pts.select(
        "bar",
        "cents",
        F.row_number().over(w_open).alias("rn_open"),
        F.row_number().over(w_close).alias("rn_close"),
    )
    return seq.groupBy("bar").agg(
        F.max(F.when(F.col("rn_open") == 1, F.col("cents")))
        .cast("bigint")
        .alias("open_cents"),
        F.max("cents").cast("bigint").alias("high_cents"),
        F.min("cents").cast("bigint").alias("low_cents"),
        F.max(F.when(F.col("rn_close") == 1, F.col("cents")))
        .cast("bigint")
        .alias("close_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("volume_cents"),
    )


@register(
    "trend_theil_sen",
    oracle="""
    WITH daily AS (
      SELECT CAST(epoch_us(o_orderdate) // 2592000000000 AS BIGINT) AS m,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY 1),
    prs AS (
      SELECT a.m AS m1, b.m AS m2,
             b.c - a.c AS num, b.m - a.m AS den
      FROM daily a JOIN daily b ON b.m > a.m),
    ranked AS (
      SELECT num, den, m1, m2,
             ROW_NUMBER() OVER (
               ORDER BY num * 1.0 / den, m1, m2) AS rn,
             COUNT(*) OVER () AS n
      FROM prs)
    SELECT CAST(num AS BIGINT) AS slope_num,
           CAST(den AS BIGINT) AS slope_den,
           ROUND(num * 1.0 / den, 6) AS slope,
           CAST(n AS BIGINT) AS n_pairs
    FROM ranked WHERE rn = (n + 1) // 2
    """,
)
def trend_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend over the monthly order-count series: the
    MEDIAN of all pairwise slopes (c_j - c_i)/(m_j - m_i) — the
    breakdown-point-0.29 complement to trend_linear_slope's OLS (one
    wild month moves OLS arbitrarily; Theil–Sen shrugs). The slope is
    reported as the exact integer fraction plus its rounded IEEE value.

    Scale shape: the pair space is CALENDAR-BOUNDED — months of order
    history squared (~84² / 2 pairs at any SF), independent of data
    volume, built from the month-grain aggregate (one map-side-
    combinable count) — the same bounded-domain-join contract as the
    gap-fill spines; the median pick is one rank window over the pair
    domain. All ordering is total: IEEE slope value (identical doubles
    in both engines) with (m1, m2) tiebreak."""
    o = load(spark, sf_dir, "orders")
    daily = o.select(
        F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 2592000000000")
        .cast("bigint")
        .alias("m")
    ).groupBy("m").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    a = daily.withColumnsRenamed({"m": "m1", "c": "c1"})
    b = daily.withColumnsRenamed({"m": "m2", "c": "c2"})
    prs = a.join(b, F.col("m2") > F.col("m1")).select(
        "m1",
        "m2",
        (F.col("c2") - F.col("c1")).alias("num"),
        (F.col("m2") - F.col("m1")).alias("den"),
    )
    w = Window.orderBy(
        (F.col("num") * F.lit(1.0) / F.col("den")).asc(),
        F.asc("m1"),
        F.asc("m2"),
    )
    ranked = prs.select(
        "num",
        "den",
        "m1",
        "m2",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    return ranked.filter(
        F.col("rn") == F.expr("(n + 1) div 2")
    ).select(
        F.col("num").cast("bigint").alias("slope_num"),
        F.col("den").cast("bigint").alias("slope_den"),
        F.round(F.col("num") * F.lit(1.0) / F.col("den"), 6).alias("slope"),
        F.col("n").cast("bigint").alias("n_pairs"),
    )
