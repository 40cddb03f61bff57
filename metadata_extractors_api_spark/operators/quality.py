"""Data-quality audits and distribution analytics: referential
integrity, inequality (Gini), quantile binning, path mining, and
vocabulary coverage.

These are the checks a curation pipeline runs BEFORE training on a
corpus and the reports an analyst runs on the warehouse the corpus is
joined against. Everything is expressed as Catalyst column algebra --
the one genuinely global-order computation (exact Gini ranking) uses a
range-repartitioned two-phase rank so no stage ever serializes the
dataset through a single partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from metadata_extractors_api_spark.catalog import load
from metadata_extractors_api_spark.registry import register


@register(
    "dq_referential_integrity",
    oracle="""
    SELECT * FROM (
      SELECT 'lineitem->orders' AS relation,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS fk_rows,
             CAST((SELECT COUNT(*) FROM lineitem l
                   WHERE NOT EXISTS (SELECT 1 FROM orders o
                                     WHERE o.o_orderkey = l.l_orderkey))
                  AS BIGINT) AS orphans
      UNION ALL
      SELECT 'lineitem->part',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
             CAST((SELECT COUNT(*) FROM lineitem l
                   WHERE NOT EXISTS (SELECT 1 FROM part p
                                     WHERE p.p_partkey = l.l_partkey))
                  AS BIGINT)
      UNION ALL
      SELECT 'lineitem->supplier',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
             CAST((SELECT COUNT(*) FROM lineitem l
                   WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                     WHERE s.s_suppkey = l.l_suppkey))
                  AS BIGINT)
      UNION ALL
      SELECT 'orders->customer',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
             CAST((SELECT COUNT(*) FROM orders o
                   WHERE NOT EXISTS (SELECT 1 FROM customer c
                                     WHERE c.c_custkey = o.o_custkey))
                  AS BIGINT)
    ) ORDER BY relation
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for every FK edge of
    the star schema in one result. Each edge is a null-match count
    over a left join against the DISTINCT dimension keys
    (fanout-proof, so exactly NOT EXISTS) -- dimension sides (part,
    supplier, customer) broadcast, and the one fact-to-fact edge
    (lineitem->orders) shuffles on the order key exactly as its
    production join would, so the audit costs what ONE run of the real
    query costs and nothing more: all of a fact's edges aggregate in a
    single pass over it. The report rows are exploded map-side from
    the two one-row aggregates; nothing is collected on the driver. (Origin: the reference validates inputs
    exist before extraction, __init__.py:241-258; this is the
    set-oriented version of that contract.)"""

    # ONE pass per fact table instead of two per edge: the old
    # total-count + anti-join-count pair re-scanned lineitem 6x and
    # orders 3x (12 scans total in the final plan). Each FK edge is now
    # a left join against the DISTINCT dimension keys (distinct makes
    # the null-match count fanout-proof — exactly NOT EXISTS — without
    # trusting PK uniqueness) and all of a fact's edges aggregate in
    # the same pass as its row count. The lineitem->orders edge still
    # shuffles on the order key exactly as its production join would.
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    p = load(spark, sf_dir, "part")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")

    def orphan_sum(key: str) -> Column:
        return (
            F.coalesce(
                F.sum(F.col(key).isNull().cast("bigint")), F.lit(0)
            )
            .cast("bigint")
        )

    li_agg = (
        li.select("l_orderkey", "l_partkey", "l_suppkey")
        .join(
            o.select("o_orderkey").distinct(),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .join(
            F.broadcast(p.select("p_partkey").distinct()),
            F.col("l_partkey") == F.col("p_partkey"),
            "left",
        )
        .join(
            F.broadcast(s.select("s_suppkey").distinct()),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("li_rows"),
            orphan_sum("o_orderkey").alias("orph_o"),
            orphan_sum("p_partkey").alias("orph_p"),
            orphan_sum("s_suppkey").alias("orph_s"),
        )
    )
    o_agg = (
        o.select("o_custkey")
        .join(
            F.broadcast(c.select("c_custkey").distinct()),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("o_rows"),
            orphan_sum("c_custkey").alias("orph_c"),
        )
    )
    return (
        li_agg.crossJoin(o_agg)
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("lineitem->orders").alias("relation"),
                        F.col("li_rows").alias("fk_rows"),
                        F.col("orph_o").alias("orphans"),
                    ),
                    F.struct(
                        F.lit("lineitem->part").alias("relation"),
                        F.col("li_rows").alias("fk_rows"),
                        F.col("orph_p").alias("orphans"),
                    ),
                    F.struct(
                        F.lit("lineitem->supplier").alias("relation"),
                        F.col("li_rows").alias("fk_rows"),
                        F.col("orph_s").alias("orphans"),
                    ),
                    F.struct(
                        F.lit("orders->customer").alias("relation"),
                        F.col("o_rows").alias("fk_rows"),
                        F.col("orph_c").alias("orphans"),
                    ),
                )
            ).alias("r")
        )
        .select("r.relation", "r.fk_rows", "r.orphans")
        .orderBy("relation")
    )


def _global_rank(df: DataFrame, value_col: str, key_col: str) -> DataFrame:
    """Exact global rank WITHOUT a single-partition window.

    Range-repartition on (value, key) so partition i holds values
    wholly <= partition i+1, rank locally per partition (parallel
    windows), then add each partition's starting offset -- a prefix sum
    over the per-partition counts, which is partition-count-sized, not
    data-sized. This is the scalable form of ROW_NUMBER() OVER (ORDER
    BY ...): at 100 TB the per-partition windows stay parallel and the
    offset table stays tiny. Adds columns ``i`` (1-based rank) and
    ``n`` (total count).

    Known, measured trade: the offsets branch and the data branch
    both recompute the scan + range exchange (their column pruning
    diverges, so ReuseExchange never unifies them). A lazy
    localCheckpoint of the ranged frame removes the duplication but
    benched DEAD EVEN at sf0.1 (within-session A/B, medians 1.16-1.34s
    both ways on the cumsum twin) — materialization I/O cancels the
    saved recompute at this width — so the lineage-preserving form
    stays. On a cluster where the duplicated branch re-reads remote
    storage, re-measure; the checkpoint is a one-line change.

    CORRECTNESS REQUIREMENT (not just a perf trade): because the data
    branch and the offsets branch each re-execute the sampled
    repartitionByRange exchange, both executions MUST derive identical
    range bounds, or a row could be ranked in partition i while the
    offset table was built as if it were in partition j. Spark's range
    bounds come from deterministic reservoir sampling seeded by
    partition id (ShuffleExchangeExec passes a fixed seed), so
    re-execution over the same input yields the same bounds — verified
    empirically at 500k rows with AQE on and off. Any refactor that
    breaks that determinism (e.g. a nondeterministic upstream narrow
    transform, or sampling seeded by attempt id) must first materialize
    the ranged frame (localCheckpoint) so both branches read ONE
    execution."""
    ranged = df.repartitionByRange(F.col(value_col), F.col(key_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    local_w = Window.partitionBy("_pid").orderBy(value_col, key_col)
    local = ranged.withColumn("_lrank", F.row_number().over(local_w))
    sizes = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(off_w), F.lit(0)).alias("_off"),
        F.sum("_cnt").over(Window.partitionBy()).alias("n"),
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("i", (F.col("_off") + F.col("_lrank")).cast("bigint"))
        .drop("_pid", "_lrank", "_off")
    )


def _ntile_from_rank(i, n, k: int):
    """NTILE(k) as pure arithmetic over ``_global_rank``'s (i, n) --
    the scalable replacement for ``F.ntile(k).over(Window.orderBy(...))``
    whose single-partition sort dies at fact scale.

    SQL-standard NTILE split: with q = n div k and r = n mod k, buckets
    1..r hold q+1 rows and buckets r+1..k hold q rows. For 1-based rank
    i under a TOTAL order (``_global_rank`` always tie-breaks by key,
    so i == row_number == rank):

        bucket = ceil(i / (q+1))                 if i <= (q+1)*r
                 r + ceil((i - (q+1)*r) / q)     otherwise

    The divisions are exact: counts stay far below 2^53, and IEEE
    division of exactly-representable operands with an integral true
    quotient is exact, so F.ceil never sees an off-by-epsilon. When
    n < k (q == 0) every row lands in the first branch (bucket = i),
    matching NTILE's one-row-per-leading-bucket behavior."""
    q = F.floor(n / F.lit(k)).cast("bigint")
    r = (n % F.lit(k)).cast("bigint")
    fat = (q + F.lit(1)) * r  # rows covered by the size-(q+1) buckets
    return (
        F.when(i <= fat, F.ceil(i / (q + F.lit(1))))
        .otherwise(r + F.ceil((i - fat) / q))
        .cast("int")
    )


@register(
    "revenue_gini",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
      FROM orders GROUP BY 1),
    r AS (
      SELECT o_custkey, cents,
             ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS i,
             COUNT(*) OVER () AS n
      FROM cust)
    SELECT CAST(MAX(n) AS BIGINT) AS n_cust,
           ROUND(CAST(SUM((2 * CAST(i AS HUGEINT) - n - 1)
                          * CAST(cents AS HUGEINT)) AS DOUBLE)
                 / CAST(MAX(n) * (SELECT SUM(CAST(cents AS HUGEINT))
                                  FROM cust)
                        AS DOUBLE), 6) AS gini
    FROM r
    """,
)
def revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient of per-customer revenue -- the standard
    inequality/concentration KPI (and, on a corpus, the duplication-
    concentration screen). Uses the sorted-rank identity
    G = sum((2i - n - 1) x_i) / (n sum(x)) over exact integer cents,
    with the global rank computed by the range-repartitioned two-phase
    rank in ``_global_rank`` -- no single-partition window anywhere, so
    the plan survives a customer dimension of any size. All sums run in
    DECIMAL(38,0); the one division happens at the very end on two
    exact integers, so both engines round the same double."""
    o = load(spark, sf_dir, "orders")
    # Measured trade (round-10): checkpointing the customer-grain
    # revenue before _global_rank (its offsets branch re-executes the
    # input) benched ~1.1x slower at sf0.1 — same verdict as
    # _global_rank's own docstring trade; lineage kept.
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    ranked = _global_rank(cust, "cents", "o_custkey")
    big = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = F.sum(
        (F.lit(2) * big("i") - big("n") - F.lit(1)) * big("cents")
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_cust"),
        F.round(
            num.cast("double")
            / (F.max("n") * F.sum(big("cents"))).cast("double"),
            6,
        ).alias("gini"),
    )


@register(
    "feature_quantile_bin",
    oracle="""
    WITH b AS (
      SELECT [quantile_cont(o_totalprice, 0.1), quantile_cont(o_totalprice, 0.2),
              quantile_cont(o_totalprice, 0.3), quantile_cont(o_totalprice, 0.4),
              quantile_cont(o_totalprice, 0.5), quantile_cont(o_totalprice, 0.6),
              quantile_cont(o_totalprice, 0.7), quantile_cont(o_totalprice, 0.8),
              quantile_cont(o_totalprice, 0.9)] AS bnds
      FROM orders)
    SELECT len(list_filter(b.bnds, x -> x <= o.o_totalprice)) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(o.o_totalprice) AS lo,
           MAX(o.o_totalprice) AS hi
    FROM orders o CROSS JOIN b
    GROUP BY 1 ORDER BY 1
    """,
)
def feature_quantile_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile discretization (the feature-engineering bucketizer):
    decile boundaries from one exact-percentile aggregate, then every
    row assigned bin = number of boundaries <= value via an array
    higher-order function against the BROADCAST 9-element boundary
    list. Two passes over the fact (boundary estimation + assignment),
    zero joins wider than one row, and the assignment arithmetic is
    identical interpolated doubles on both engines because both
    implement the same linear-interpolation quantile definition."""
    o = load(spark, sf_dir, "orders")
    qs = [i / 10.0 for i in range(1, 10)]
    bnds = o.agg(
        F.percentile("o_totalprice", F.array(*[F.lit(q) for q in qs])).alias("bnds")
    )
    return (
        o.crossJoin(F.broadcast(bnds))
        .select(
            F.size(
                F.filter("bnds", lambda x: x <= F.col("o_totalprice"))
            ).alias("bin"),
            "o_totalprice",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("bin")
    )


@register(
    "events_top_paths",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             LEAD(event_type, 1) OVER w AS e2,
             LEAD(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT e1 || '>' || e2 || '>' || e3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path
    LIMIT 20
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: the top 3-step event-type sequences across all user
    journeys (the "what do users actually do" report behind funnel
    design). One window partitioned by user -- parallel across users at
    any scale -- two LEADs, then a count-per-path aggregate feeding a
    TakeOrderedAndProject top-20. Tie-broken by (ts, event_id) so the
    sequence extraction is deterministic under equal timestamps."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "e1", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(20)
    )


@register(
    "text_oov_rate",
    oracle="""
    WITH occ AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS token FROM documents),
    vocab AS (
      SELECT token FROM (
        SELECT token, COUNT(*) AS cnt,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rk
        FROM occ GROUP BY token)
      WHERE rk <= 1000),
    per_doc AS (
      SELECT o.doc_id,
             COUNT(*) AS n_tok,
             SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS n_oov
      FROM occ o LEFT JOIN vocab v ON v.token = o.token
      GROUP BY 1)
    SELECT ROUND(FLOOR(n_oov * 10.0 / n_tok) / 10.0, 1) AS oov_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens
    FROM per_doc
    GROUP BY 1 ORDER BY 1
    """,
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage: build the top-1000 token vocabulary (count
    desc, token asc -- a TakeOrderedAndProject, never a global-order
    shuffle), broadcast it, and report how much of each document falls
    outside it, bucketed by out-of-vocabulary rate. The tokenizer-
    coverage check run before committing to a vocab/BPE size. The only
    data-sized shuffles are the token count and the per-doc aggregate;
    the vocab join is a 1000-row broadcast."""
    docs = load(spark, sf_dir, "documents")
    occ = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    vocab = (
        occ.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(1000)
        .select("token", F.lit(True).alias("_in_vocab"))
    )
    per_doc = (
        occ.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(
                F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
    )
    return (
        per_doc.select(
            F.round(
                F.floor(F.col("n_oov") * 10.0 / F.col("n_tok")) / 10.0, 1
            ).alias("oov_bucket"),
            "n_tok",
        )
        .groupBy("oov_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
        )
        .orderBy("oov_bucket")
    )


@register(
    "win_rolling_median",
    oracle="""
    SELECT event_type, event_id, value,
           quantile_disc(value, 0.5) OVER w AS med7,
           quantile_disc(value, 0.9) OVER w AS p90_7
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling EXACT order statistics (7-row median and p90 per event
    type) -- the robust smoother used where a rolling mean would chase
    outliers. Spark has no windowed percentile, so the frame is
    materialized as a collect_list over a bounded ROWS window, sorted,
    and indexed at the type-1 DISCRETE quantile position ceil(q*n)
    (1-based) -- bit-identical to DuckDB's quantile_disc because both
    select an actual element (no interpolation arithmetic to disagree
    on), and q*n never lands on an integer rounding ambiguity for the
    frame sizes 1..7 used here.
    Scale: the window partitions by event_type and the frame is
    bounded (7 elements), so state per row is O(7) and partitions
    parallelize; cost is sort-of-7 per row, all in codegen'd
    expressions."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    arr = F.array_sort(F.collect_list("value").over(w))

    def disc(a, q):  # type-1 quantile: sorted[ceil(q*n)], 1-based
        idx = F.greatest(F.ceil(F.size(a) * F.lit(q)), F.lit(1))
        return F.element_at(a, idx.cast("int"))

    return ev.select(
        "event_type",
        "event_id",
        "value",
        disc(arr, 0.5).alias("med7"),
        disc(arr, 0.9).alias("p90_7"),
    )


@register(
    "orders_repeat_interval",
    oracle="""
    WITH g AS (
      SELECT o_custkey,
             date_diff('day',
                       LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey),
                       o_orderdate) AS gap_days
      FROM orders)
    SELECT CAST(gap_days AS BIGINT) AS gap_days,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM g WHERE gap_days IS NOT NULL
    GROUP BY 1 ORDER BY 1
    """,
)
def orders_repeat_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence: the corpus-wide distribution of days
    between a customer's consecutive orders (the input to churn windows
    and reorder forecasting). One LAG over a per-customer window
    (parallel across customers), an integer day difference, and a
    histogram aggregate on the gap -- gap cardinality is bounded by
    the calendar, so the final groupBy is tiny no matter how large
    orders grows."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    return (
        gaps.groupBy(F.col("gap_days").cast("bigint").alias("gap_days"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("gap_days")
    )


@register(
    "events_markov_transition",
    oracle="""
    WITH tr AS (
      SELECT event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events)
    SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY src), 6)
               AS p
    FROM tr WHERE dst IS NOT NULL
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def events_markov_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event streams:
    P(next event type | current) -- the behavioral model behind
    next-action prediction and anomalous-session scoring. One LEAD per
    user (parallel window), a (src, dst) count aggregate, then row
    normalization via a window over the TINY transition matrix
    (|event types|^2 rows), not the fact. The division is a single
    IEEE op on two exact counts, ordered identically in the oracle."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    counts = tr.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot_w = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "n",
        F.round(F.col("n") * F.lit(1.0) / F.sum("n").over(tot_w), 6).alias("p"),
    ).orderBy("src", "dst")


@register(
    "orders_weekday_seasonality",
    oracle="""
    SELECT CAST(strftime(o_orderdate, '%w') AS BIGINT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE)
               AS revenue
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def orders_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality: order count and exact DECIMAL revenue
    per weekday (0 = Sunday on both engines: Spark's dayofweek is
    1-based Sunday-first, DuckDB's %w is 0-based Sunday-first, so the
    -1 shift aligns them). The grouping key has 7 values -- partial
    aggregation collapses everything map-side and the exchange carries
    at most 7 rows per task at any scale."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("dow")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(14,2)")), 2)
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("dow")
    )


@register(
    "embedding_norm_audit",
    oracle="""
    WITH nn AS (
      SELECT vec_id,
             CAST(list_sum(list_transform(embedding, (x,i) ->
               CAST(floor(CAST(x AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
                          * 1e12) AS BIGINT))) AS BIGINT) AS nsq
      FROM embeddings)
    SELECT CAST(floor(sqrt(nsq / 1e12) * 10) AS BIGINT) AS norm_decile,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(MIN(nsq) AS BIGINT) AS min_nsq,
           CAST(MAX(nsq) AS BIGINT) AS max_nsq
    FROM nn GROUP BY 1 ORDER BY 1
    """,
)
def embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-health audit: the distribution of vector L2 norms,
    bucketed to 0.1 -- the first check before any cosine pipeline
    (near-zero or wildly varying norms mean a broken encoder or an
    unnormalized mix of models). Squared norms are computed in the
    engine's standard scaled-int64 form (exact, order-independent);
    the single sqrt happens on the exact integer, so both engines
    bucket identically. One codegen map pass + a tiny aggregate."""
    from metadata_extractors_api_spark.operators.llm import dot_scaled

    e = load(spark, sf_dir, "embeddings")
    nn = e.select(
        dot_scaled(F.col("embedding"), F.col("embedding")).alias("nsq")
    )
    return (
        nn.groupBy(
            F.floor(F.sqrt(F.col("nsq") / F.lit(1e12)) * 10)
            .cast("bigint")
            .alias("norm_decile")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.min("nsq").cast("bigint").alias("min_nsq"),
            F.max("nsq").cast("bigint").alias("max_nsq"),
        )
        .orderBy("norm_decile")
    )


@register(
    "events_hourly_autocorr",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    lagged AS (
      SELECT event_type, n AS x,
             LAG(n) OVER (PARTITION BY event_type ORDER BY h) AS y,
             CASE WHEN date_diff('hour',
                     LAG(h) OVER (PARTITION BY event_type ORDER BY h), h) = 1
                  THEN 1 ELSE 0 END AS consec
      FROM hourly),
    pairs AS (SELECT event_type, x, y FROM lagged
              WHERE y IS NOT NULL AND consec = 1),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY 1)
    SELECT event_type, cnt AS n_pairs,
           ROUND((CAST(cnt AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (sqrt(CAST(cnt AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * sqrt(CAST(cnt AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy)), 6) AS lag1_autocorr
    FROM m ORDER BY event_type
    """,
)
def events_hourly_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the hourly event-count series per event
    type -- the periodicity/trend screen run before forecasting or
    anomaly thresholds. The series is the (tiny) hourly rollup, so the
    LAG window runs over calendar-sized data; only CONSECUTIVE hours
    pair (a gap breaks the lag, rather than silently pairing across
    it). Correlation uses the engine's exact-integer-moments form
    (counts are integers, all six sums are exact bigints) with one
    fixed double expression at the end -- bit-stable at any
    parallelism, same as agg_corr."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = hourly.select(
        "event_type",
        F.col("n").alias("x"),
        F.lag("n").over(w).alias("y"),
        (
            (
                F.unix_timestamp("h")
                - F.unix_timestamp(F.lag("h").over(w))
            )
            == 3600
        ).alias("consec"),
    )
    pairs = lagged.filter(F.col("y").isNotNull() & F.col("consec"))
    m = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return m.select(
        "event_type",
        F.col("cnt").alias("n_pairs"),
        F.round(
            (d("cnt") * F.col("sxy") - d("sx") * F.col("sy"))
            / (
                F.sqrt(d("cnt") * F.col("sxx") - d("sx") * F.col("sx"))
                * F.sqrt(d("cnt") * F.col("syy") - d("sy") * F.col("sy"))
            ),
            6,
        ).alias("lag1_autocorr"),
    ).orderBy("event_type")


@register(
    "events_new_vs_returning",
    oracle="""
    WITH fs AS (
      SELECT user_id, date_trunc('month', MIN(ts)) AS first_m
      FROM events GROUP BY 1),
    mu AS (
      SELECT DISTINCT date_trunc('month', ts) AS m, user_id FROM events)
    SELECT strftime(mu.m, '%Y-%m') AS month,
           CAST(SUM(CASE WHEN mu.m = fs.first_m THEN 1 ELSE 0 END)
                AS BIGINT) AS new_users,
           CAST(SUM(CASE WHEN mu.m = fs.first_m THEN 0 ELSE 1 END)
                AS BIGINT) AS returning_users
    FROM mu JOIN fs USING (user_id)
    GROUP BY 1 ORDER BY 1
    """,
)
def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: monthly active users split into first-ever
    (new) vs returning -- the decomposition behind every "is growth
    acquisition or retention" question. Two aggregates over the same
    user_id shuffle (first-seen month per user; distinct active
    (month, user) pairs) joined on the user key, then a tiny monthly
    rollup. At scale both aggregates partial-combine and the join is
    user-cardinality, never event-cardinality."""
    ev = load(spark, sf_dir, "events")
    fs = ev.groupBy("user_id").agg(
        F.date_trunc("month", F.min("ts")).alias("first_m")
    )
    mu = ev.select(
        F.date_trunc("month", "ts").alias("m"), "user_id"
    ).distinct()
    is_new = F.col("m") == F.col("first_m")
    return (
        mu.join(fs, "user_id")
        .groupBy(F.date_format("m", "yyyy-MM").alias("month"))
        .agg(
            F.sum(F.when(is_new, 1).otherwise(0))
            .cast("bigint")
            .alias("new_users"),
            F.sum(F.when(is_new, 0).otherwise(1))
            .cast("bigint")
            .alias("returning_users"),
        )
        .orderBy("month")
    )


@register(
    "brand_supplier_hhi",
    oracle="""
    WITH bs AS (
      SELECT p.p_brand, l.l_suppkey,
             CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS HUGEINT) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2),
    agg AS (
      SELECT p_brand,
             SUM(cents * cents) AS sum_sq,
             SUM(cents) AS tot,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers
      FROM bs GROUP BY 1)
    SELECT p_brand, n_suppliers,
           ROUND(CAST(sum_sq AS DOUBLE)
                 / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)), 6) AS hhi
    FROM agg ORDER BY p_brand
    """,
)
def brand_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-concentration screen: the Herfindahl-Hirschman index of
    supplier revenue share within each brand (1/n = perfectly spread,
    1.0 = single-sourced -- the procurement-risk flag). HHI =
    sum(cents_i^2) / (sum(cents_i))^2 is computed entirely in exact
    integers -- squares run in DECIMAL(38,0) because cents^2 overflows
    int64 at ~$90M per (brand, supplier) -- with ONE double division at
    the end, so shares are never floating-point-summed. Two partial-
    aggregable rollups on (brand, supplier) then brand; the part dim
    broadcasts."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    bs = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("decimal(38,0)")
            .alias("cents")
        )
    )
    agg = bs.groupBy("p_brand").agg(
        F.sum(F.col("cents") * F.col("cents")).alias("sum_sq"),
        F.sum("cents").alias("tot"),
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
    )
    return agg.select(
        "p_brand",
        "n_suppliers",
        F.round(
            F.col("sum_sq").cast("double")
            / (F.col("tot").cast("double") * F.col("tot").cast("double")),
            6,
        ).alias("hhi"),
    ).orderBy("p_brand")


@register(
    "ivm_merge_agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents,
           strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_date,
           strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_date
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def ivm_merge_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: a materialized aggregate is
    updated by MERGING the existing state with the delta batch's
    partial state -- never recomputing from the base table. Here the
    'snapshot' (80%% of orders) and the 'delta' (the other 20%%,
    split deterministically by key) each produce the same mergeable
    state (count, exact cents sum, min/max date); a full-outer join +
    combine (sum+sum, least/greatest, coalesced counts) yields the
    maintained view, and the ORACLE aggregates the whole table
    directly -- proving merge(state(A), state(B)) == state(A ∪ B).
    This algebra is what keeps a 100 TB rollup fresh at delta cost:
    only ever aggregate the new partition, merge states of rollup
    cardinality. (Same mergeability contract the HLL/bitmap sketch
    ops satisfy for approximate state.)"""
    o = load(spark, sf_dir, "orders")

    def state(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("total_cents"),
            F.min("o_orderdate").alias("first_date"),
            F.max("o_orderdate").alias("last_date"),
        )

    snap = state(o.filter(F.col("o_orderkey") % 5 != 0)).select(
        "o_orderpriority",
        F.col("n").alias("n_a"),
        F.col("total_cents").alias("c_a"),
        F.col("first_date").alias("f_a"),
        F.col("last_date").alias("l_a"),
    )
    delta = state(o.filter(F.col("o_orderkey") % 5 == 0)).select(
        "o_orderpriority",
        F.col("n").alias("n_b"),
        F.col("total_cents").alias("c_b"),
        F.col("first_date").alias("f_b"),
        F.col("last_date").alias("l_b"),
    )
    merged = snap.join(delta, "o_orderpriority", "full_outer")
    zero = F.lit(0).cast("bigint")
    return merged.select(
        "o_orderpriority",
        (F.coalesce("n_a", zero) + F.coalesce("n_b", zero)).alias("n"),
        (F.coalesce("c_a", zero) + F.coalesce("c_b", zero)).alias(
            "total_cents"
        ),
        F.date_format(F.least("f_a", "f_b"), "yyyy-MM-dd").alias("first_date"),
        F.date_format(F.greatest("l_a", "l_b"), "yyyy-MM-dd").alias(
            "last_date"
        ),
    ).orderBy("o_orderpriority")


@register(
    "agg_bitmap_native",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nd_users
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def agg_bitmap_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE bitmap aggregate functions (bitmap_bucket_number /
    bitmap_bit_position / bitmap_construct_agg / bitmap_count) doing
    exact distinct counting -- the built-in counterpart to the
    engine's hand-rolled mergeable bitmaps (agg_bitmap_distinct). The
    value space is sharded into 32768-bit buckets first, a bitmap is
    constructed per (group, bucket), and the per-bucket exact counts
    sum to the distinct count because buckets partition the id space.
    Bitmaps are mergeable state: the same two-level shape maintains a
    100 TB distinct-count rollup incrementally. Oracle: plain
    COUNT(DISTINCT)."""
    ev = load(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type",
        F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
    ).agg(
        F.expr(
            "bitmap_count(bitmap_construct_agg(bitmap_bit_position(user_id)))"
        ).alias("nd")
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(F.sum("nd").cast("bigint").alias("nd_users"))
        .orderBy("event_type")
    )


@register(
    "fn_url_parse",
    oracle="""
    SELECT p_partkey,
           'example.com' AS host,
           '/parts/' || replace(p_name, ' ', '-') AS path,
           CAST(p_partkey AS VARCHAR) AS id_param
    FROM part ORDER BY p_partkey
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing surface: build deterministic URLs from the part dim,
    then round-trip them through Spark's parse_url (HOST / PATH /
    QUERY-parameter extraction) -- the crawl-pipeline primitive behind
    domain mix, path routing, and tracking-param hygiene. DuckDB has no
    parse_url, so the oracle states the EXPECTED decomposition
    relationally; any parsing drift (encoding, query splitting) breaks
    the match. All codegen string ops, no UDFs."""
    p = load(spark, sf_dir, "part")
    url = F.concat(
        F.lit("https://example.com/parts/"),
        F.regexp_replace("p_name", " ", "-"),
        F.lit("?id="),
        F.col("p_partkey"),
    )
    return p.select(
        "p_partkey",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("id")).alias("id_param"),
    ).orderBy("p_partkey")


@register(
    "join_cardinality_estimate",
    oracle="""
    WITH sampled AS (
      SELECT l_orderkey FROM lineitem WHERE l_orderkey % 100 = 0),
    est AS (
      SELECT CAST(COUNT(*) * 100 AS BIGINT) AS est_rows
      FROM sampled s JOIN orders o ON o.o_orderkey = s.l_orderkey),
    act AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS actual_rows
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
    SELECT est.est_rows, act.actual_rows,
           ROUND(CAST(est.est_rows AS DOUBLE)
                 / CAST(act.actual_rows AS DOUBLE), 4) AS ratio
    FROM est CROSS JOIN act
    """,
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampling-based join-cardinality estimation: join a deterministic
    1% key-sample of the fact to the dimension-of-the-join and scale
    the count by the sampling rate -- the planner-style estimate you
    run BEFORE committing a 100 TB join to a shuffle strategy (and the
    cheap pre-check for join-key health: a ratio far from 1 on a
    supposedly uniform key means skew or orphans). The sample is
    key-deterministic (orderkey % 100), so both engines compute the
    IDENTICAL estimate and the oracle carries the exact same three
    numbers; the actual count is computed alongside for the audit.
    Cost: the estimate side scans 1% of keys after pushdown."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey")
    est = (
        li.filter(F.col("l_orderkey") % 100 == 0)
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .agg((F.count(F.lit(1)) * 100).cast("bigint").alias("est_rows"))
    )
    act = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("actual_rows")
    )
    return est.crossJoin(act).select(
        "est_rows",
        "actual_rows",
        F.round(
            F.col("est_rows").cast("double")
            / F.col("actual_rows").cast("double"),
            4,
        ).alias("ratio"),
    )


@register(
    "events_cusum_drift",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    tot AS (
      SELECT event_type, CAST(SUM(x) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM hourly GROUP BY 1),
    c AS (
      SELECT hourly.event_type, h,
             SUM(hourly.x * tot.m - tot.s)
                 OVER (PARTITION BY hourly.event_type ORDER BY h) AS cusum_m
      FROM hourly JOIN tot USING (event_type)),
    mx AS (
      SELECT event_type, h, cusum_m,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY abs(cusum_m) DESC, h) AS rk
      FROM c)
    SELECT event_type,
           CAST(cusum_m AS BIGINT) AS peak_cusum_m,
           strftime(h, '%Y-%m-%d %H') AS peak_hour
    FROM mx WHERE rk = 1
    ORDER BY event_type
    """,
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point screen: for each event type, the cumulative
    sum of deviations from the series mean peaks at the most likely
    change point -- the sequential-analysis primitive behind drift
    alarms. Exactness trick: instead of x_t - mean (a float), accumulate
    m*x_t - S (counts scaled by the series length), which is the same
    curve scaled by m in EXACT integers -- no floating-point
    accumulation to drift between engines or partitionings. The series
    is the hourly rollup (calendar-sized), the cumsum window partitions
    by event type, and the peak is a per-type rank -- everything after
    the first aggregate is tiny."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    tot = hourly.groupBy("event_type").agg(
        F.sum("x").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    wc = Window.partitionBy("event_type").orderBy("h")
    c = hourly.join(F.broadcast(tot), "event_type").withColumn(
        "cusum_m", F.sum(F.col("x") * F.col("m") - F.col("s")).over(wc)
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.abs("cusum_m").desc(), F.asc("h")
    )
    return (
        c.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("cusum_m").cast("bigint").alias("peak_cusum_m"),
            F.date_format("h", "yyyy-MM-dd HH").alias("peak_hour"),
        )
        .orderBy("event_type")
    )


@register(
    "orders_life_table",
    oracle="""
    WITH g AS (
      SELECT date_diff('day',
               LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS t
      FROM orders),
    hist AS (
      SELECT CAST(t AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS d
      FROM g WHERE t IS NOT NULL GROUP BY 1),
    lt AS (
      SELECT t, d,
             CAST(SUM(d) OVER (ORDER BY t DESC) AS BIGINT) AS n_at_risk
      FROM hist)
    SELECT t, d, n_at_risk,
           ROUND(CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE), 6) AS hazard
    FROM lt ORDER BY t
    """,
)
def orders_life_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival-analysis life table over repeat-purchase gaps: for each
    waiting time t, the number of customers who reordered at exactly t
    (d) and the number still 'at risk' (gaps >= t, a REVERSE cumulative
    sum over the gap histogram), plus the discrete hazard d/n -- the
    exact-integer inputs a Kaplan-Meier curve multiplies up (the
    product itself is left to the consumer; chained float products
    are not hash-stable, count tables are). The reverse cumsum runs
    over the calendar-bounded histogram, not the fact table, so the
    single-partition window touches at most a few thousand rows at
    any corpus size."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
            "t"
        )
    ).filter(F.col("t").isNotNull())
    hist = gaps.groupBy(F.col("t").cast("bigint").alias("t")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    wr = Window.orderBy(F.desc("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        hist.withColumn("n_at_risk", F.sum("d").over(wr).cast("bigint"))
        .select(
            "t",
            "d",
            "n_at_risk",
            F.round(
                F.col("d").cast("double") / F.col("n_at_risk").cast("double"),
                6,
            ).alias("hazard"),
        )
        .orderBy("t")
    )


@register(
    "corpus_yield_curve",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(floor(len(list_distinct(str_split(text, ' '))) * 10.0
                        / len(str_split(text, ' '))) AS BIGINT) AS div_bucket
      FROM documents),
    b AS (
      SELECT div_bucket,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS toks
      FROM d GROUP BY 1),
    t AS (SELECT CAST(SUM(toks) AS BIGINT) AS total FROM b)
    SELECT b.div_bucket, b.n_docs, b.toks,
           CAST(SUM(b.toks) OVER (ORDER BY b.div_bucket DESC) AS BIGINT)
               AS cum_toks,
           ROUND(CAST(SUM(b.toks) OVER (ORDER BY b.div_bucket DESC) AS DOUBLE)
                 / CAST(t.total AS DOUBLE), 6) AS cum_share
    FROM b CROSS JOIN t
    ORDER BY b.div_bucket DESC
    """,
)
def corpus_yield_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation yield curve: if you keep only documents above each
    quality threshold (here lexical-diversity deciles: distinct tokens
    / total tokens), how many tokens survive? The cumulative-share
    column, read top bucket down, is the size-vs-quality tradeoff a
    data lead prices before fixing a filter threshold. Per-doc signals
    are one codegen map pass; the curve itself is a cumulative window
    over at most 11 bucket rows. Exact integer token counts; one
    terminal share division."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    d = docs.select(
        F.size(toks).cast("bigint").alias("n_tok"),
        F.floor(
            F.size(F.array_distinct(toks)) * 10.0 / F.size(toks)
        )
        .cast("bigint")
        .alias("div_bucket"),
    )
    b = d.groupBy("div_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("toks"),
    )
    t = b.agg(F.sum("toks").cast("bigint").alias("total"))
    wc = Window.orderBy(F.desc("div_bucket")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        b.crossJoin(F.broadcast(t))
        .withColumn("cum_toks", F.sum("toks").over(wc).cast("bigint"))
        .select(
            "div_bucket",
            "n_docs",
            "toks",
            "cum_toks",
            F.round(
                F.col("cum_toks").cast("double") / F.col("total").cast("double"),
                6,
            ).alias("cum_share"),
        )
        .orderBy(F.desc("div_bucket"))
    )


def _strict_prefix_min_desc(
    df: DataFrame, key_col: str, val_col: str
) -> DataFrame:
    """Strict prefix-min of ``val_col`` over DESCENDING ``key_col``
    order, without a single-partition window: range-repartition on the
    key desc, running min per partition (strictly-preceding frame),
    then a broadcast partition-count-sized table of preceding-partition
    mins — the same two-phase shape as ``_global_cumsum``. Requires
    key values unique per row (pre-aggregate first). Adds
    ``prev_min`` (NULL for the global maximum key). Third member of
    the two-phase family beside ``_global_rank`` and ``_global_cumsum``
    (same scaffold, min-aggregate + strict frame + descending order);
    the duplicated-branch/localCheckpoint trade measured on the other
    two (see ``_global_rank``) applies unchanged here."""
    ranged = df.repartitionByRange(F.col(key_col).desc()).withColumn(
        "_pid", F.spark_partition_id()
    )
    lw = (
        Window.partitionBy("_pid")
        .orderBy(F.col(key_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = ranged.withColumn("_lmin", F.min(val_col).over(lw))
    sizes = ranged.groupBy("_pid").agg(F.min(val_col).alias("_pmin"))
    ow = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select("_pid", F.min("_pmin").over(ow).alias("_omin"))
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(
            "prev_min",
            F.when(F.col("_lmin").isNull(), F.col("_omin"))
            .when(F.col("_omin").isNull(), F.col("_lmin"))
            .otherwise(F.least("_lmin", "_omin")),
        )
        .drop("_pid", "_lmin", "_omin")
    )


def _global_cumsum(
    df: DataFrame, value_col: str, key_col: str, weight_col: str
) -> DataFrame:
    """Scalable global prefix sum: inclusive cumulative ``weight_col``
    in (value, key) order, without a single-partition window -- the
    same two-phase shape as ``_global_rank`` (range repartition, local
    window cumsum per partition, partition-count-sized offset table of
    weight totals). Adds ``cw`` (inclusive cumulative weight) and
    ``tw`` (grand total).

    Known trade-off, measured: the local window needs a second
    data-sized exchange (hashpartitioning(_pid) — Catalyst cannot know
    the range partitioning already satisfies it). The alternative that
    drops it — sortWithinPartitions + a mapInPandas pass carrying the
    running sum across Arrow batches — produced bit-identical output
    but was ~20% SLOWER at sf0.1 (Arrow transit > the extra local
    exchange at this width), so the JVM-side form stays; on a cluster
    where the second exchange crosses the network, re-measure.

    Same measured duplicated-branch trade as ``_global_rank`` (see its
    docstring): a lazy localCheckpoint of the ranged frame benched
    dead even at sf0.1, so recompute-with-lineage stays."""
    ranged = df.repartitionByRange(F.col(value_col), F.col(key_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(value_col, key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("_lcw", F.sum(weight_col).over(local_w))
    sizes = ranged.groupBy("_pid").agg(F.sum(weight_col).alias("_w"))
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select(
        "_pid",
        F.coalesce(F.sum("_w").over(off_w), F.lit(0)).alias("_off"),
        F.sum("_w").over(Window.partitionBy()).alias("tw"),
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("cw", F.col("_off") + F.col("_lcw"))
        .drop("_pid", "_lcw", "_off")
    )


@register(
    "agg_weighted_median",
    oracle="""
    WITH v AS (
      SELECT l_orderkey, l_linenumber,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(l_quantity AS BIGINT) AS w
      FROM lineitem),
    c AS (
      SELECT cents, w,
             SUM(w) OVER (ORDER BY cents, l_orderkey, l_linenumber) AS cw,
             SUM(w) OVER () AS tw
      FROM v)
    SELECT CAST(MIN(cents) AS BIGINT) AS weighted_median_cents,
           CAST(MIN(tw) AS BIGINT) AS total_weight
    FROM c WHERE cw * 2 >= tw
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median (price weighted by quantity): the first
    value whose inclusive cumulative weight reaches half the total --
    computed with ``_global_cumsum``, the scalable prefix-sum
    generalization of the two-phase rank, so the data-sized cumsum
    never serializes through one partition. The threshold compare is
    cw*2 >= tw in exact integers (quantities are integral, prices in
    cents) -- no midpoint division, no floats anywhere. The oracle
    states the same definition with a plain window."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    keyed = li.withColumn(
        "k",
        F.concat_ws(
            "-", F.col("l_orderkey"), F.col("l_linenumber")
        ),
    )
    c = _global_cumsum(keyed, "cents", "k", "w")
    return (
        c.filter(F.col("cw") * 2 >= F.col("tw"))
        .agg(
            F.min("cents").cast("bigint").alias("weighted_median_cents"),
            F.min("tw").cast("bigint").alias("total_weight"),
        )
    )


@register(
    "observe_metrics",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents,
           CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_discounted
    FROM lineitem
    """,
)
def observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's Observation API: named metrics piggyback on a query's
    EXISTING pass over the data (df.observe + accumulators) instead of
    costing a second scan -- how production pipelines emit row counts,
    quality tallies, and reconciliation sums from the same job that
    does the work. Here the observed job is a plain pass over lineitem
    (noop sink); the observed metrics become the result row, and the
    oracle recomputes them relationally -- so the check proves the
    observation channel itself is value-faithful. All three metrics
    are exact integers."""
    from pyspark.sql import Observation

    li = load(spark, sf_dir, "lineitem")
    obs = Observation("mdx_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("total_cents"),
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0))
        .cast("bigint")
        .alias("n_discounted"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["total_cents"], m["n_discounted"])],
        "n_rows bigint, total_cents bigint, n_discounted bigint",
    )


@register(
    "join_hint_shuffle_hash",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1 ORDER BY 1
    """,
)
def join_hint_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit physical join-strategy control: the SHUFFLE_HASH hint
    forces a ShuffledHashJoin where the planner would default to
    broadcast or sort-merge -- the knob you reach for at scale when
    one side fits a task's memory after partitioning but not a
    broadcast, and sorting 100 TB for SMJ would dominate the job. The
    hint changes ONLY the physical operator; the oracle confirms the
    result is identical to the unhinted logical join. (Plan shape is
    pinned in tests/test_scale_plans.py.)"""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines"))
        .orderBy("o_orderpriority")
    )


@register(
    "ps_pandas_api",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
)
def ps_pandas_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas API on Spark (pyspark.pandas): the same groupby-agg
    written as a pandas program but EXECUTED as distributed Spark
    plans -- the migration path for pandas-fluent users of the
    reference. The flow stays lazy end to end (no toPandas
    materialization); to_spark() hands back the DataFrame plan and the
    oracle checks the values match the relational form exactly (cents
    kept integral through the pandas layer)."""
    import pyspark.pandas as ps

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    pdf = li.pandas_api()
    out = (
        pdf.groupby("l_returnflag")
        .agg(n=("cents", "count"), cents=("cents", "sum"))
        .reset_index()
    )
    sdf = out.to_spark()
    return sdf.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.col("cents").cast("bigint").alias("cents"),
    ).orderBy("l_returnflag")


@register(
    "orders_yoy_growth",
    oracle="""
    WITH m AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS rev_cents
      FROM orders GROUP BY 1),
    l AS (
      SELECT month, rev_cents,
             LAG(rev_cents, 12) OVER (ORDER BY month) AS prev_year_cents
      FROM m)
    SELECT month, rev_cents, prev_year_cents,
           ROUND(CAST(rev_cents AS DOUBLE)
                 / CAST(prev_year_cents AS DOUBLE) - 1, 6) AS yoy_growth
    FROM l WHERE prev_year_cents IS NOT NULL
    ORDER BY month
    """,
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth per month: exact integer-cents monthly
    revenue, a 12-step LAG over the month series, one terminal ratio.
    The YoY form is the seasonality-free growth number every revenue
    review opens with (month-over-month confounds seasonality; the
    12-lag compares like months). The window runs over the
    calendar-sized monthly rollup; the fixture's contiguous months
    make lag-12 equal same-month-last-year (the general form joins on
    month-minus-a-year instead)."""
    o = load(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
            "month"
        )
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents")
    )
    w = Window.orderBy("month")
    return (
        m.withColumn("prev_year_cents", F.lag("rev_cents", 12).over(w))
        .filter(F.col("prev_year_cents").isNotNull())
        .select(
            "month",
            "rev_cents",
            "prev_year_cents",
            F.round(
                F.col("rev_cents").cast("double")
                / F.col("prev_year_cents").cast("double")
                - 1,
                6,
            ).alias("yoy_growth"),
        )
        .orderBy("month")
    )


@register(
    "dq_benford_audit",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM lineitem
      WHERE l_extendedprice > 0),
    c AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
    SELECT c.digit, c.n,
           ROUND(CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE), 6) AS share
    FROM c CROSS JOIN t
    ORDER BY c.digit
    """,
)
def dq_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen: the first-significant-digit distribution
    of monetary amounts -- the classic fabricated-data / unit-mixup
    detector (organically-generated amounts lean log-uniform, ~30.1%
    leading 1s; synthetic uniform generators, price floors, or a
    currency mixed in at the wrong scale all bend the curve). Exact
    integer-cents digit extraction, exact counts, one terminal share
    division; the judgment against log10(1+1/d) stays with the
    consumer because those reference constants are irrational. One
    scan, 9-row aggregate."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    d = li.select(
        F.substring(
            F.round(F.col("l_extendedprice") * 100).cast("bigint").cast("string"),
            1,
            1,
        )
        .cast("bigint")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    t = c.agg(F.sum("n").cast("bigint").alias("total"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            F.round(
                F.col("n").cast("double") / F.col("total").cast("double"), 6
            ).alias("share"),
        )
        .orderBy("digit")
    )


@register(
    "events_dispersion_index",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(x * x) AS BIGINT) AS ss
      FROM hourly GROUP BY 1)
    SELECT event_type, m AS n_hours, s AS n_events,
           ROUND(CAST(m * ss - s * s AS DOUBLE)
                 / CAST(s * (m - 1) AS DOUBLE), 6) AS dispersion
    FROM m ORDER BY event_type
    """,
)
def events_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion screen: variance-to-mean ratio of the hourly
    count series per event type. A Poisson-like arrival process sits
    near 1; bursty traffic (or a bot) pushes it well above, and a
    rate-limited/quantized source pushes it below -- the one-number
    triage before reaching for the burst detector's window machinery.
    Identity used: var/mean = (m*ss - s^2) / (s*(m-1)) over exact
    integer moments, one terminal division -- bit-stable at any
    parallelism."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    m = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("ss"),
    )
    return m.select(
        "event_type",
        F.col("m").alias("n_hours"),
        F.col("s").alias("n_events"),
        F.round(
            (F.col("m") * F.col("ss") - F.col("s") * F.col("s")).cast("double")
            / (F.col("s") * (F.col("m") - 1)).cast("double"),
            6,
        ).alias("dispersion"),
    ).orderBy("event_type")


@register(
    "agg_corr_matrix",
    oracle="""
    WITH v AS (
      SELECT CAST(l_quantity AS HUGEINT) AS x,
             CAST(round(l_extendedprice * 100) AS HUGEINT) AS y,
             CAST(round(l_discount * 100) AS HUGEINT) AS z
      FROM lineitem),
    m AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(z) AS sz,
             SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(z*z) AS szz,
             SUM(x*y) AS sxy, SUM(x*z) AS sxz, SUM(y*z) AS syz
      FROM v)
    SELECT pair,
           ROUND(CAST(num AS DOUBLE)
                 / (sqrt(CAST(da AS DOUBLE)) * sqrt(CAST(db AS DOUBLE))),
                 6) AS corr
    FROM (
      SELECT 'quantity~price' AS pair, n*sxy - sx*sy AS num,
             n*sxx - sx*sx AS da, n*syy - sy*sy AS db FROM m
      UNION ALL
      SELECT 'quantity~discount', n*sxz - sx*sz,
             n*sxx - sx*sx, n*szz - sz*sz FROM m
      UNION ALL
      SELECT 'price~discount', n*syz - sy*sz,
             n*syy - sy*sy, n*szz - sz*sz FROM m)
    ORDER BY pair
    """,
)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass correlation MATRIX: every pairwise Pearson correlation
    among quantity, price, and discount from a SINGLE aggregate that
    accumulates all ten exact integer moments at once -- the scalable
    form (k columns cost one scan and k(k+1)/2 moment sums, vs k^2/2
    separate corr() scans), and the bit-reproducible form (Spark's
    streaming-covariance corr() is partitioning-dependent; moments are
    not). Squared-cents sums overflow int64 (~6e19 at sf0.1), so
    moments run in DECIMAL(38,0)/HUGEINT; each correlation is one
    fixed double expression at the end."""
    li = load(spark, sf_dir, "lineitem")
    big = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    v = li.select(
        big(F.col("l_quantity")).alias("x"),
        big(F.round(F.col("l_extendedprice") * 100)).alias("y"),
        big(F.round(F.col("l_discount") * 100)).alias("z"),
    )
    m = v.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("z").alias("sz"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("z")).alias("sxz"),
        F.sum(F.col("y") * F.col("z")).alias("syz"),
    )

    def row(pair, s_ab, s_a, s_b, s_aa, s_bb):
        num = F.col("n") * F.col(s_ab) - F.col(s_a) * F.col(s_b)
        da = F.col("n") * F.col(s_aa) - F.col(s_a) * F.col(s_a)
        db = F.col("n") * F.col(s_bb) - F.col(s_b) * F.col(s_b)
        return m.select(
            F.lit(pair).alias("pair"),
            F.round(
                num.cast("double")
                / (F.sqrt(da.cast("double")) * F.sqrt(db.cast("double"))),
                6,
            ).alias("corr"),
        )

    out = (
        row("quantity~price", "sxy", "sx", "sy", "sxx", "syy")
        .unionAll(row("quantity~discount", "sxz", "sx", "sz", "sxx", "szz"))
        .unionAll(row("price~discount", "syz", "sy", "sz", "syy", "szz"))
    )
    return out.orderBy("pair")


@register(
    "win_max_drawdown",
    oracle="""
    WITH s AS (
      SELECT user_id, value,
             MAX(value) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS runmax
      FROM events)
    SELECT user_id,
           ROUND(MAX(runmax - value), 6) AS max_drawdown,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s GROUP BY 1 ORDER BY 1
    """,
)
def win_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user series: the largest peak-to-trough
    drop of the value signal -- the running-extreme composite behind
    risk reports and engagement-decay alerts (a running max window,
    one subtraction, one max aggregate). Windows partition per user
    (parallel at any scale) and every operation is a comparison or a
    single subtraction of identical operands on both engines, so no
    accumulation drift is possible despite double inputs."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "value",
        F.max("value").over(w).alias("runmax"),
    )
    return (
        s.groupBy("user_id")
        .agg(
            F.round(F.max(F.col("runmax") - F.col("value")), 6).alias(
                "max_drawdown"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        .orderBy("user_id")
    )


@register(
    "events_user_lifespan",
    oracle="""
    WITH u AS (
      SELECT user_id,
             date_diff('day', MIN(ts), MAX(ts)) AS span_days
      FROM events GROUP BY 1)
    SELECT CAST(floor(span_days / 7.0) AS BIGINT) AS week_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MIN(span_days) AS BIGINT) AS min_days,
           CAST(MAX(span_days) AS BIGINT) AS max_days
    FROM u GROUP BY 1 ORDER BY 1
    """,
)
def events_user_lifespan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-lifespan distribution: days between each user's first and
    last event, bucketed by week -- the observed-lifetime histogram
    that anchors LTV and retention models (and exposes single-visit
    users as the zero bucket). One user-keyed aggregate (two timestamp
    extremes -- map-side-combinable), then a calendar-bounded
    histogram."""
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.datediff(F.max("ts"), F.min("ts")).alias("span_days")
    )
    return (
        u.groupBy(
            F.floor(F.col("span_days") / 7).cast("bigint").alias("week_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.min("span_days").cast("bigint").alias("min_days"),
            F.max("span_days").cast("bigint").alias("max_days"),
        )
        .orderBy("week_bucket")
    )


@register(
    "dq_catalog_coverage",
    oracle="""
    SELECT * FROM (
      SELECT 'part' AS dimension,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM part) AS n_total,
             CAST((SELECT COUNT(*) FROM part p
                   WHERE EXISTS (SELECT 1 FROM lineitem l
                                 WHERE l.l_partkey = p.p_partkey))
                  AS BIGINT) AS n_used
      UNION ALL
      SELECT 'customer',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM customer),
             CAST((SELECT COUNT(*) FROM customer c
                   WHERE EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_custkey = c.c_custkey))
                  AS BIGINT)
      UNION ALL
      SELECT 'supplier',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM supplier),
             CAST((SELECT COUNT(*) FROM supplier s
                   WHERE EXISTS (SELECT 1 FROM lineitem l
                                 WHERE l.l_suppkey = s.s_suppkey))
                  AS BIGINT)
    ) ORDER BY dimension
    """,
)
def dq_catalog_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-coverage audit: the mirror image of referential
    integrity -- not "do facts point at real dimensions" but "which
    dimension entries does the business actually use" (dead SKUs,
    dormant customers, idle suppliers). Each dimension is a LEFT SEMI
    count against its fact; the fact side reads one key column and the
    semi-join stops at first match. Coverage ratios are left to the
    consumer; the counts are the exact artifact."""

    def cov(dim: DataFrame, fact: DataFrame, cond, name: str) -> DataFrame:
        total = dim.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
        used = dim.join(fact, cond, "left_semi").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_used")
        )
        return total.crossJoin(used).select(
            F.lit(name).alias("dimension"), "n_total", "n_used"
        )

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    rows = [
        cov(
            load(spark, sf_dir, "part"),
            li.select("l_partkey"),
            F.col("p_partkey") == F.col("l_partkey"),
            "part",
        ),
        cov(
            load(spark, sf_dir, "customer"),
            o.select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "customer",
        ),
        cov(
            load(spark, sf_dir, "supplier"),
            li.select("l_suppkey"),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "supplier",
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("dimension")


@register(
    "orders_abc_pareto",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
      FROM lineitem GROUP BY l_partkey),
    c AS (
      SELECT l_partkey, cents,
             CAST(SUM(cents) OVER (ORDER BY cents DESC, l_partkey) AS BIGINT)
                 AS cw,
             CAST(SUM(cents) OVER () AS BIGINT) AS tw
      FROM rev),
    cls AS (
      SELECT CASE WHEN cw * 100 <= tw * 80 THEN 'A'
                  WHEN cw * 100 <= tw * 95 THEN 'B'
                  ELSE 'C' END AS abc_class,
             cents, tw
      FROM c)
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents,
           CAST((SUM(cents) * 1000000) // MIN(tw) AS BIGINT) AS revenue_share_e6
    FROM cls GROUP BY abc_class
    """,
)
def orders_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto inventory classification: parts are ranked by
    revenue and split at the classic 80% / 95% cumulative-share
    knees — class A is the head that earns 80% of revenue, C the long
    tail. The report (parts + revenue + share per class) is the
    fact behind "20% of SKUs drive 80% of revenue" decisions.

    Scale shape: revenue per part is one map-side-combinable groupBy;
    the cumulative ranking uses ``_global_cumsum`` on the NEGATED
    revenue (range repartition + local window + broadcast offsets), so
    the descending Pareto order is computed without a single-partition
    window; class assignment and shares are exact integer compares
    (cw*100 <= tw*80 — no float thresholds)."""
    li = load(spark, sf_dir, "lineitem")
    # Part-grain revenue; _global_cumsum's offsets branch re-executes
    # its input, so checkpointed the fact scan + groupBy runs once.
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    ).localCheckpoint()
    c = _global_cumsum(
        rev.withColumn("neg", -F.col("cents")), "neg", "l_partkey", "cents"
    )
    cls = c.select(
        F.when(F.col("cw") * 100 <= F.col("tw") * 80, F.lit("A"))
        .when(F.col("cw") * 100 <= F.col("tw") * 95, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
        "cents",
        "tw",
    )
    return cls.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
        F.expr("(sum(cents) * 1000000) div min(tw)")
        .cast("bigint")
        .alias("revenue_share_e6"),
    )


@register(
    "dq_uniqueness_audit",
    oracle="""
    SELECT * FROM (
      SELECT 'customer.c_custkey' AS key_name,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_rows,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM
               (SELECT c_custkey FROM customer GROUP BY c_custkey))
                 AS n_keys,
             (SELECT CAST(MAX(c) AS BIGINT) FROM
               (SELECT COUNT(*) AS c FROM customer GROUP BY c_custkey))
                 AS max_rows_per_key
      UNION ALL
      SELECT 'documents.doc_id',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM documents),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM
               (SELECT doc_id FROM documents GROUP BY doc_id)),
             (SELECT CAST(MAX(c) AS BIGINT) FROM
               (SELECT COUNT(*) AS c FROM documents GROUP BY doc_id))
      UNION ALL
      SELECT 'events.event_id',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM events),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM
               (SELECT event_id FROM events GROUP BY event_id)),
             (SELECT CAST(MAX(c) AS BIGINT) FROM
               (SELECT COUNT(*) AS c FROM events GROUP BY event_id))
      UNION ALL
      SELECT 'lineitem.(l_orderkey,l_linenumber)',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM
               (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)),
             (SELECT CAST(MAX(c) AS BIGINT) FROM
               (SELECT COUNT(*) AS c FROM lineitem
                GROUP BY l_orderkey, l_linenumber))
      UNION ALL
      SELECT 'orders.o_orderkey',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM
               (SELECT o_orderkey FROM orders GROUP BY o_orderkey)),
             (SELECT CAST(MAX(c) AS BIGINT) FROM
               (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey))
    ) ORDER BY key_name
    """,
)
def dq_uniqueness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit: for every declared key (including
    lineitem's COMPOSITE key) the row count, distinct-key count, and
    worst duplication factor — the twin of dq_referential_integrity
    (that one checks edges point somewhere; this one checks the
    pointed-at side is unique, which is what makes those joins
    non-exploding). A max_rows_per_key > 1 on a "unique" key is the
    single most common silent row-multiplier in warehouse joins.
    NULL keys COUNT as a key group on both engines (the oracle counts
    grouped keys, not COUNT(DISTINCT), which would silently drop
    NULLs — a NULL PK is a defect this audit must surface, not hide).

    Scale shape: per key, one map-side-combinable groupBy(key).count()
    whose exchange carries one row per distinct key, then a single-row
    rollup; unioned into a keys-count-sized report."""

    out = _key_census(load(spark, sf_dir, "customer"), ["c_custkey"],
                      "customer.c_custkey")
    for tbl, cols, name in [
        ("documents", ["doc_id"], "documents.doc_id"),
        ("events", ["event_id"], "events.event_id"),
        ("lineitem", ["l_orderkey", "l_linenumber"],
         "lineitem.(l_orderkey,l_linenumber)"),
        ("orders", ["o_orderkey"], "orders.o_orderkey"),
    ]:
        out = out.unionByName(_key_census(load(spark, sf_dir, tbl), cols, name))
    return out


def _key_census(df: DataFrame, cols: list[str], name: str) -> DataFrame:
    """One key's census rollup: groupBy(key).count() (the exchange
    carries one row per distinct key; NULL keys form a group like any
    other) folded to a single labeled row of n_rows / n_keys /
    max_rows_per_key. Shared by dq_uniqueness_audit and
    skew_diagnose_keys so the two reports cannot drift."""
    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("c"))
    return counts.agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("c").cast("bigint").alias("max_rows_per_key"),
    ).select(F.lit(name).alias("key_name"), "n_rows", "n_keys",
             "max_rows_per_key")


@register(
    "orders_backlog_sweepline",
    oracle="""
    WITH o AS (
      SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS open_day,
             CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT)
               + 3 + (o_orderkey % 10) AS close_day
      FROM orders),
    ev AS (
      SELECT open_day AS day, 1 AS delta FROM o
      UNION ALL
      SELECT close_day AS day, -1 AS delta FROM o),
    net AS (
      SELECT day, CAST(SUM(delta) AS BIGINT) AS net_change
      FROM ev GROUP BY day)
    SELECT day, net_change,
           CAST(SUM(net_change) OVER (ORDER BY day) AS BIGINT) AS open_at_eod
    FROM net
    """,
)
def orders_backlog_sweepline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-open-orders curve via the sweep-line trick: each
    order contributes +1 at its open day and -1 at its (deterministic,
    priority-independent) close day; the running sum of per-day net
    change IS the number of simultaneously open orders at each day's
    end — interval-overlap counting with no interval self-join (the
    naive day x open-interval join is quadratic in busy windows).

    Scale shape: the +1/-1 event relation is 2 rows per order; the
    groupBy(day) collapses it to CALENDAR cardinality (a few thousand
    days even for decades), after which the cumulative sum over days
    is a deliberately small single-partition window — aggregating to
    the report grain FIRST is what makes a plain window acceptable
    here, unlike the corpus-sized windows `_global_cumsum` exists
    for."""
    o = load(spark, sf_dir, "orders").select(
        F.floor(F.col("o_orderdate").cast("timestamp").cast("long") / 86400)
        .cast("bigint")
        .alias("open_day"),
        (
            F.floor(F.col("o_orderdate").cast("timestamp").cast("long") / 86400)
            + 3
            + F.col("o_orderkey") % 10
        )
        .cast("bigint")
        .alias("close_day"),
    )
    ev = o.select(F.col("open_day").alias("day"), F.lit(1).alias("delta")).unionByName(
        o.select(F.col("close_day").alias("day"), F.lit(-1).alias("delta"))
    )
    net = ev.groupBy("day").agg(F.sum("delta").cast("bigint").alias("net_change"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return net.select(
        "day",
        "net_change",
        F.sum("net_change").over(w).cast("bigint").alias("open_at_eod"),
    )


@register(
    "orders_fulfillment_lag",
    oracle="""
    WITH j AS (
      SELECT o.o_orderpriority AS priority,
             CAST(floor(epoch(l.l_shipdate) / 86400)
                  - floor(epoch(o.o_orderdate) / 86400) AS BIGINT) AS lag_days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(MIN(lag_days) AS BIGINT) AS min_days,
           CAST(MAX(lag_days) AS BIGINT) AS max_days,
           CAST(SUM(lag_days) AS BIGINT) AS total_days
    FROM j GROUP BY priority
    """,
)
def orders_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship fulfillment lag per priority class: the
    operational SLA readout (does urgent actually ship faster?). Lag
    is exact integer days between the order date and each line's ship
    date; the report carries min/max/total so the mean is one client-
    side division and the sum stays hash-exact.

    Scale shape: THE canonical fact-to-fact join (lineitem x orders on
    the order key) — at warehouse scale both sides are bucketed on
    o_orderkey and the exchange disappears (SCALING.md §2); unbucketed,
    it is one co-partitioned shuffle with AQE skew handling. The
    priority rollup is map-side combinable on a 5-value key."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.floor(F.col("l_shipdate").cast("timestamp").cast("long") / 86400)
        .cast("bigint")
        .alias("ship_day"),
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_orderpriority").alias("priority"),
        F.floor(F.col("o_orderdate").cast("timestamp").cast("long") / 86400)
        .cast("bigint")
        .alias("open_day"),
    )
    j = li.join(o, "l_orderkey").select(
        "priority", (F.col("ship_day") - F.col("open_day")).alias("lag_days")
    )
    return j.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.min("lag_days").cast("bigint").alias("min_days"),
        F.max("lag_days").cast("bigint").alias("max_days"),
        F.sum("lag_days").cast("bigint").alias("total_days"),
    )


@register(
    "events_ab_test_lift",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CASE WHEN ('0x' || substr(md5('exp1:' ||
                    CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS arm
      FROM (SELECT DISTINCT user_id FROM events)),
    m AS (
      SELECT u.arm,
             u.user_id,
             CAST(MAX(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS converted
      FROM u JOIN events e ON e.user_id = u.user_id
      GROUP BY u.arm, u.user_id)
    SELECT arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           CAST((SUM(converted) * 1000000) // COUNT(*) AS BIGINT)
               AS conv_rate_e6
    FROM m GROUP BY arm
    """,
)
def events_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with DETERMINISTIC hash assignment:
    arm = md5(salt || user_id) parity — the industry-standard bucketing
    that is stable across sessions/devices, reproducible by any engine
    auditing the experiment, and free of RNG-state coupling between
    assignment and analysis. Conversion is user-level (any purchase),
    so event-count skew between arms cannot masquerade as lift; rates
    are exact integer millionths and the z-test is one client-side
    formula over the four reported exact counts.

    Scale shape: the distinct-user relation and the metric join both
    shuffle on user_id (one co-partitioned key, the same partitioning
    the sessionize/retention family uses); the arm rollup is map-side
    combinable on a 2-value key (no skew: md5 parity splits ~50/50 by
    construction)."""
    ev = load(spark, sf_dir, "events")
    u = ev.select("user_id").distinct().select(
        "user_id",
        F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 2
            == 0,
            F.lit("control"),
        )
        .otherwise(F.lit("treatment"))
        .alias("arm"),
    )
    m = (
        u.join(ev, "user_id")
        .groupBy("arm", "user_id")
        .agg(
            F.max((F.col("event_type") == "purchase").cast("int"))
            .cast("bigint")
            .alias("converted")
        )
    )
    return m.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        F.expr("(sum(converted) * 1000000) div count(*)")
        .cast("bigint")
        .alias("conv_rate_e6"),
    )


@register(
    "dq_k_anonymity",
    oracle="""
    WITH q AS (
      SELECT c_nationkey,
             c_mktsegment,
             (CAST(round(c_acctbal * 100) AS BIGINT) + 10000000) // 100000 - 100
                 AS bal_band
      FROM customer),
    g AS (
      SELECT c_nationkey, c_mktsegment, bal_band,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM q GROUP BY c_nationkey, c_mktsegment, bal_band)
    SELECT k,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(k) AS BIGINT) AS n_rows
    FROM g GROUP BY k
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity census over a quasi-identifier tuple — the privacy
    re-identification audit a training-data release runs before
    shipping: for QID = (nation, market segment, $1000 account-balance
    band), how many equivalence classes exist at each group size k?
    Rows living in k=1 (singleton) classes are directly
    re-identifiable; the k<5 bands are the disclosure-risk mass a
    suppression/generalization pass must remove.

    Scale shape: two stacked map-side-combinable groupBys (QID census,
    then k census) — both partial-aggregate before any shuffle, and
    the second input is already |distinct QIDs|-sized, so the audit
    costs one pass over the table regardless of scale. The balance
    band is exact-integer (cents // 100000), never a float division,
    so band edges agree bit-for-bit across engines.
    """
    q = load(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        # Shift to a non-negative domain before the integer division:
        # balances can be negative, and DuckDB's // truncates toward
        # zero while floor() rounds down -- on positives they agree.
        (
            F.floor(
                (F.round(F.col("c_acctbal") * 100).cast("bigint") + 10_000_000)
                / F.lit(100000)
            ).cast("bigint")
            - 100
        ).alias("bal_band"),
    )
    g = q.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    return g.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum("k").cast("bigint").alias("n_rows"),
    )


@register(
    "dq_freshness_audit",
    oracle="""
    WITH t AS (
      SELECT 'events' AS relation, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(MAX(epoch_us(ts) // 86400000000) AS BIGINT) AS max_day
      FROM events
      UNION ALL
      SELECT 'orders', CAST(COUNT(*) AS BIGINT),
             CAST(MAX(epoch_us(CAST(o_orderdate AS TIMESTAMP))
                      // 86400000000) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
             CAST(MAX(epoch_us(CAST(l_shipdate AS TIMESTAMP))
                      // 86400000000) AS BIGINT)
      FROM lineitem),
    w AS (SELECT MAX(max_day) AS wm FROM t)
    SELECT relation, n_rows, max_day,
           CAST(w.wm - max_day AS BIGINT) AS lag_days
    FROM t, w
    """,
)
def dq_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness audit: per relation, its newest event day and the lag
    behind the fleet-wide high-water mark — the staleness dashboard a
    multi-source ingest pipeline gates promotions on (a feed whose
    lag_days grows is silently stuck).

    Scale shape: one agg-only pass per relation (count + max collapse
    map-side to one row per relation before any movement), a 3-row
    union, and a broadcast 1-row watermark join — audit cost is scan
    bound and output is O(relations) regardless of table sizes. Day
    arithmetic is integer epoch-days, identical in both engines (UTC
    session).
    """
    def one(rel: str, df: DataFrame, ts_expr: str) -> DataFrame:
        return df.agg(
            F.lit(rel).alias("relation"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.max(F.expr(ts_expr)).cast("bigint").alias("max_day"),
        )

    t = (
        one("events", load(spark, sf_dir, "events"),
            "unix_micros(ts) div 86400000000")
        .unionByName(
            one("orders", load(spark, sf_dir, "orders"),
                "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
        )
        .unionByName(
            one("lineitem", load(spark, sf_dir, "lineitem"),
                "unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")
        )
    )
    w = t.agg(F.max("max_day").alias("wm"))
    return t.crossJoin(F.broadcast(w)).select(
        "relation",
        "n_rows",
        "max_day",
        (F.col("wm") - F.col("max_day")).cast("bigint").alias("lag_days"),
    )


#: continuous-percentile probe points (percent).
PCTL_CONT_PS = [50, 90, 99]


@register(
    "agg_percentile_cont",
    oracle=f"""
    WITH v AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    r AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS i,
             COUNT(*) OVER () AS n
      FROM v),
    ps AS (SELECT unnest([{", ".join(str(p) for p in PCTL_CONT_PS)}]) AS p),
    tgt AS (
      SELECT ps.p,
             (SELECT MAX(n) FROM r) AS n,
             ((SELECT MAX(n) FROM r) - 1) * ps.p // 100 + 1 AS lo_rank,
             ((SELECT MAX(n) FROM r) - 1) * ps.p % 100 AS rem
      FROM ps),
    j AS (
      SELECT t.p, t.rem,
             MAX(CASE WHEN r.i = t.lo_rank THEN r.cents END) AS lo,
             MAX(CASE WHEN r.i = t.lo_rank + 1 THEN r.cents END) AS hi
      FROM tgt t JOIN r ON r.i IN (t.lo_rank, t.lo_rank + 1)
      GROUP BY t.p, t.rem)
    SELECT CAST(p AS BIGINT) AS p,
           CAST(lo * 100 + (COALESCE(hi, lo) - lo) * rem AS BIGINT)
               AS pct_value_e4
    FROM j
    """,
)
def agg_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT continuous (interpolated) percentiles — percentile_cont
    semantics: position (n-1)*p/100 on the sorted axis, linear
    interpolation between the two bracketing values — computed with
    rational integer arithmetic only (rank via integer div/mod, the
    interpolation as lo*100 + (hi-lo)*rem in hundredth-of-cent
    units), so the result is bit-identical across engines, unlike
    float percentile interpolation. Complements `agg_percentile`
    (discrete) and `agg_approx_percentile` (sketch + contract).

    Scale shape: the sorted axis comes from the range-partitioned
    two-phase ``_global_rank`` (no single-partition window — the
    oracle's plain ROW_NUMBER states the semantics only); the three
    bracket ranks arrive as a broadcast handful of rows, and the
    bracket probe is a broadcast join filtered to <= 2 rows per
    percentile before a tiny final aggregate.
    """
    v = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    # r has two external consumers (the n census and the bracket
    # probe) on top of _global_rank's internal offsets/data double
    # execution: un-checkpointed, the final plan executed the ranged
    # sort FOUR times (4 scans / 30 Exchange measured). _global_rank's
    # own docstring trade ("checkpoint benched dead even") covered the
    # single-consumer case only.
    r = _global_rank(v, "cents", "o_orderkey").localCheckpoint()
    tot = r.agg(F.max("n").alias("n"))
    ps = spark.createDataFrame([(p,) for p in PCTL_CONT_PS], "p bigint")
    tgt = ps.crossJoin(F.broadcast(tot)).select(
        "p",
        F.expr("(n - 1) * p div 100 + 1").alias("lo_rank"),
        F.expr("(n - 1) * p % 100").alias("rem"),
    )
    j = r.join(
        F.broadcast(tgt),
        (F.col("i") == F.col("lo_rank")) | (F.col("i") == F.col("lo_rank") + 1),
    )
    agg = j.groupBy("p", "rem").agg(
        F.max(F.when(F.col("i") == F.col("lo_rank"), F.col("cents"))).alias("lo"),
        F.max(
            F.when(F.col("i") == F.col("lo_rank") + 1, F.col("cents"))
        ).alias("hi"),
    )
    return agg.select(
        F.col("p").cast("bigint").alias("p"),
        F.expr(
            "CAST(lo * 100 + (coalesce(hi, lo) - lo) * rem AS BIGINT)"
        ).alias("pct_value_e4"),
    )


@register(
    "events_diff_in_diff",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type,
             epoch_us(ts) // 3600000000 AS bh
      FROM events),
    th AS (SELECT (MIN(bh) + MAX(bh)) // 2 AS mid FROM ev),
    tagged AS (
      SELECT CASE WHEN ('0x' || substr(md5('exp1:' ||
                        CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS arm,
             CASE WHEN bh <= th.mid THEN 'pre' ELSE 'post' END AS period,
             user_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS purch
      FROM ev, th),
    u AS (
      SELECT arm, period, user_id, MAX(purch) AS converted
      FROM tagged GROUP BY arm, period, user_id),
    cell AS (
      SELECT arm, period,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_conv,
             CAST(SUM(converted) * 1000000 // COUNT(*) AS BIGINT) AS rate_e6
      FROM u GROUP BY arm, period)
    SELECT
      CAST(MAX(CASE WHEN arm='control' AND period='pre' THEN rate_e6 END)
           AS BIGINT) AS ctrl_pre_e6,
      CAST(MAX(CASE WHEN arm='control' AND period='post' THEN rate_e6 END)
           AS BIGINT) AS ctrl_post_e6,
      CAST(MAX(CASE WHEN arm='treatment' AND period='pre' THEN rate_e6 END)
           AS BIGINT) AS treat_pre_e6,
      CAST(MAX(CASE WHEN arm='treatment' AND period='post' THEN rate_e6 END)
           AS BIGINT) AS treat_post_e6,
      CAST((MAX(CASE WHEN arm='treatment' AND period='post' THEN rate_e6 END)
            - MAX(CASE WHEN arm='treatment' AND period='pre' THEN rate_e6 END))
           - (MAX(CASE WHEN arm='control' AND period='post' THEN rate_e6 END)
              - MAX(CASE WHEN arm='control' AND period='pre' THEN rate_e6 END))
           AS BIGINT) AS did_e6
    FROM cell
    """,
)
def events_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences treatment-effect readout: conversion
    lift of the treatment arm corrected by the control arm's own
    pre/post drift — the causal-inference upgrade of
    ``events_ab_test_lift`` (which reads post-period lift only and
    cannot distinguish treatment effect from seasonality). Periods
    split at the observed time-range midpoint; arms use the same
    deterministic md5-parity assignment as the A/B query, so the two
    readouts are directly comparable. All four cell rates are exact
    integer millionths (one integer division per cell), and the DiD
    estimate is pure integer subtraction — reproducible bit-for-bit
    at any parallelism.

    Scale shape: one scalar (min, max) aggregate broadcast back as the
    period threshold, one map-side-combinable per-(arm, period, user)
    rollup on the user_id shuffle key, a 4-row cell census, and a
    1-row pivot — cost is one pass over events regardless of scale.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("unix_micros(ts) div 3600000000").alias("bh"),
    )
    th = ev.agg(
        F.expr("(min(bh) + max(bh)) div 2").alias("mid")
    )
    arm = (
        F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 2
            == 0,
            F.lit("control"),
        )
        .otherwise(F.lit("treatment"))
    )
    tagged = ev.crossJoin(F.broadcast(th)).select(
        arm.alias("arm"),
        F.when(F.col("bh") <= F.col("mid"), "pre").otherwise("post").alias(
            "period"
        ),
        "user_id",
        (F.col("event_type") == "purchase").cast("int").alias("purch"),
    )
    u = tagged.groupBy("arm", "period", "user_id").agg(
        F.max("purch").alias("converted")
    )
    cell = u.groupBy("arm", "period").agg(
        F.expr("CAST(sum(converted) * 1000000 div count(*) AS BIGINT)").alias(
            "rate_e6"
        )
    )
    pick = lambda a, p: F.max(
        F.when((F.col("arm") == a) & (F.col("period") == p), F.col("rate_e6"))
    )
    return cell.agg(
        pick("control", "pre").cast("bigint").alias("ctrl_pre_e6"),
        pick("control", "post").cast("bigint").alias("ctrl_post_e6"),
        pick("treatment", "pre").cast("bigint").alias("treat_pre_e6"),
        pick("treatment", "post").cast("bigint").alias("treat_post_e6"),
        (
            (pick("treatment", "post") - pick("treatment", "pre"))
            - (pick("control", "post") - pick("control", "pre"))
        )
        .cast("bigint")
        .alias("did_e6"),
    )


@register(
    "dq_outlier_iqr",
    oracle="""
    WITH v AS (
      SELECT event_type, event_id,
             CAST(round(value * 1000000) AS BIGINT) AS micro
      FROM events),
    r AS (
      SELECT event_type, micro,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY micro, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM v),
    q AS (
      SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
             CAST(MAX(CASE WHEN rn = (n + 3) // 4 THEN micro END)
                  AS BIGINT) AS q1_micro,
             CAST(MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN micro END)
                  AS BIGINT) AS q3_micro
      FROM r GROUP BY event_type)
    SELECT q.event_type, q.n, q.q1_micro, q.q3_micro,
           CAST(SUM(CASE WHEN 2 * v.micro < 5 * q.q1_micro - 3 * q.q3_micro
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(SUM(CASE WHEN 2 * v.micro > 5 * q.q3_micro - 3 * q.q1_micro
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM q JOIN v ON v.event_type = q.event_type
    GROUP BY q.event_type, q.n, q.q1_micro, q.q3_micro
    """,
)
def dq_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR-fence outlier audit per event type — the third
    classic screen beside ``anomaly_zscore_window`` (parametric) and
    ``anomaly_mad`` (robust location): values beyond Q1/Q3 ∓ 1.5*IQR.
    Quartiles are DISCRETE rank-selected values (rank ceil(n/4) and
    ceil(3n/4) in the (value, id) order), so no interpolation and no
    engine-specific percentile definition is involved; the 1.5*IQR
    fences are cross-multiplied into pure integers (2*x < 5*q1 - 3*q3)
    — no halves, no floats, bit-identical across engines.

    Scale shape: the rank window partitions by event_type (parallel
    across the bounded type key space — this is per-GROUP ranking, not
    the global-rank case that needs the two-phase form), the quartile
    census is |types|-sized and broadcastable, and the fence count is
    one co-keyed join + map-side-combinable aggregate over the data.
    """
    v = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 1_000_000).cast("bigint").alias("micro"),
    )
    w = Window.partitionBy("event_type").orderBy("micro", "event_id")
    cw = Window.partitionBy("event_type")
    r = v.select(
        "event_type",
        "micro",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cw).alias("n"),
    )
    q = r.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 3) div 4"), F.col("micro"))
        )
        .cast("bigint")
        .alias("q1_micro"),
        F.max(
            F.when(F.col("rn") == F.expr("(3 * n + 3) div 4"), F.col("micro"))
        )
        .cast("bigint")
        .alias("q3_micro"),
    )
    j = v.join(F.broadcast(q), "event_type")
    return j.groupBy("event_type", "n", "q1_micro", "q3_micro").agg(
        F.sum(
            (2 * F.col("micro") < 5 * F.col("q1_micro") - 3 * F.col("q3_micro"))
            .cast("int")
        )
        .cast("bigint")
        .alias("n_low"),
        F.sum(
            (2 * F.col("micro") > 5 * F.col("q3_micro") - 3 * F.col("q1_micro"))
            .cast("int")
        )
        .cast("bigint")
        .alias("n_high"),
    )


@register(
    "dq_books_balance",
    oracle="""
    WITH li AS (
      SELECT l_orderkey,
             CAST(SUM(
               CAST(round(l_extendedprice * 100) AS BIGINT)
               * (10000 + CAST(round(l_tax * 10000) AS BIGINT))
               * (10000 - CAST(round(l_discount * 10000) AS BIGINT))
               // 100000000) AS BIGINT) AS gross_cents
      FROM lineitem GROUP BY l_orderkey),
    j AS (
      SELECT o.o_orderkey,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
             li.gross_cents,
             ABS(CAST(round(o.o_totalprice * 100) AS BIGINT)
                 - li.gross_cents) AS diff_cents
      FROM orders o JOIN li ON li.l_orderkey = o.o_orderkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN diff_cents = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_exact,
           CAST(SUM(CASE WHEN diff_cents * 100 <= total_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_within_1pct,
           CAST(MAX(diff_cents) AS BIGINT) AS max_abs_diff_cents,
           CAST(SUM(diff_cents) AS BIGINT) AS sum_abs_diff_cents
    FROM j
    """,
)
def dq_books_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-level reconciliation audit (books balance): does each
    order header's total equal the recomputed sum of its line items'
    gross (extended price x (1+tax) x (1-discount))? The companion to
    ``dq_referential_integrity`` one level deeper — that audit finds
    orphaned KEYS, this one finds inconsistent VALUES, the class of
    corruption a denormalized ingest or partial update leaves behind.
    Reports the exact-match count, a 1%-tolerance band (cross-
    multiplied integer compare, no division), and the worst/total
    absolute drift in cents. Line gross is computed entirely in
    scaled integers (cents x basis points div 1e8), so both engines
    agree bit-for-bit on every per-order difference.

    Scale shape: one map-side-combinable lineitem rollup on its
    l_orderkey shuffle key, one co-keyed join to the header, and a
    single global aggregate — audit cost is one pass over each table.
    """
    li = (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            F.expr(
                "CAST(round(l_extendedprice * 100) AS BIGINT)"
                " * (10000 + CAST(round(l_tax * 10000) AS BIGINT))"
                " * (10000 - CAST(round(l_discount * 10000) AS BIGINT))"
                " div 100000000"
            ).alias("line_gross"),
        )
        .groupBy("l_orderkey")
        .agg(F.sum("line_gross").cast("bigint").alias("gross_cents"))
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("total_cents"),
    )
    j = o.join(li, o.o_orderkey == li.l_orderkey).withColumn(
        "diff_cents", F.abs(F.col("total_cents") - F.col("gross_cents"))
    )
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum((F.col("diff_cents") == 0).cast("int")).cast("bigint").alias(
            "n_exact"
        ),
        F.sum(
            (F.col("diff_cents") * 100 <= F.col("total_cents")).cast("int")
        )
        .cast("bigint")
        .alias("n_within_1pct"),
        F.max("diff_cents").cast("bigint").alias("max_abs_diff_cents"),
        F.sum("diff_cents").cast("bigint").alias("sum_abs_diff_cents"),
    )


@register(
    "agg_ols_regression",
    oracle="""
    WITH pc AS (
      SELECT o_custkey,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS y
      FROM orders GROUP BY o_custkey),
    j AS (
      SELECT c.c_nationkey,
             CAST(round(c.c_acctbal * 100) AS BIGINT) AS x, pc.y
      FROM customer c JOIN pc ON c.c_custkey = pc.o_custkey),
    m AS (
      SELECT c_nationkey,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(19,0)) * y) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(19,0)) * x) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(19,0)) * y) AS DECIMAL(38,0)) AS syy
      FROM j GROUP BY c_nationkey),
    d AS (
      SELECT c_nationkey, n,
             CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov_n,
             CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS var_x_n,
             CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS var_y_n,
             CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
      FROM m)
    SELECT CAST(c_nationkey AS BIGINT) AS nation, n,
           ROUND(cov_n / var_x_n, 6) AS slope,
           ROUND((syd - (cov_n / var_x_n) * sxd) / n, 6) AS intercept,
           ROUND((cov_n * cov_n) / (var_x_n * var_y_n), 6) AS r2
    FROM d
    WHERE var_x_n > 0 AND var_y_n > 0
    """,
)
def agg_ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped ordinary-least-squares: per nation, regress each
    customer's lifetime order revenue (y) on their account balance (x),
    emitting slope / intercept / R^2 — the one-pass sufficient-statistics
    closed form (n, Σx, Σy, Σxy, Σx², Σy²) every feature-vs-outcome
    screen reduces to.

    Scale/determinism shape: the moments are EXACT — integer cents,
    pairwise products in DECIMAL(19,0), sums in DECIMAL(38,0) (never a
    float accumulation, so the result is partitioning-invariant) — and
    only the final closed form drops to IEEE doubles, where both
    engines perform the identical operation sequence on identical
    inputs. One fact groupBy (orders → per-customer revenue), one
    dimension join, one map-side-combinable moments groupBy; nothing
    grows with SF but the two shuffles' key cardinality."""
    o = load(spark, sf_dir, "orders")
    pc = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("y")
    )
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("x"),
    )
    j = c.join(pc, c.c_custkey == pc.o_custkey).select("c_nationkey", "x", "y")
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    m = j.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(xd * yd).cast("decimal(38,0)").alias("sxy"),
        F.sum(xd * xd).cast("decimal(38,0)").alias("sxx"),
        F.sum(yd * yd).cast("decimal(38,0)").alias("syy"),
    )
    nD = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    cov_n = nD * F.col("sxy").cast("double") - sxd * syd
    var_x_n = nD * F.col("sxx").cast("double") - sxd * sxd
    var_y_n = nD * F.col("syy").cast("double") - syd * syd
    slope = cov_n / var_x_n
    # Degenerate-group guard (round-4 ADVICE item 3): a group with a
    # single customer or constant x (or y) has zero variance, where the
    # closed form divides by zero and Spark/DuckDB Inf/NaN (and
    # round()-of-them) semantics are not guaranteed to agree. Both the
    # Spark query and the oracle exclude such groups identically; the
    # fixture previously avoided them only by data shape.
    m = m.filter((var_x_n > 0) & (var_y_n > 0))
    return m.select(
        F.col("c_nationkey").cast("bigint").alias("nation"),
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((syd - slope * sxd) / nD, 6).alias("intercept"),
        F.round((cov_n * cov_n) / (var_x_n * var_y_n), 6).alias("r2"),
    )


#: declarative DQ rules: (rule_id, description, SQL predicate over
#: orders). The predicate dialect is the ANSI intersection both engines
#: parse identically -- rules are DATA (the reference README's "rules
#: added to the schemas" posture, README.md:94, applied to quality).
DQ_RULES: list[tuple[str, str, str]] = [
    ("totalprice_positive", "order total must be positive",
     "o_totalprice > 0"),
    ("status_domain", "status within the documented domain",
     "o_orderstatus IN ('O', 'F', 'P')"),
    ("date_in_range", "order date inside the business horizon",
     "o_orderdate BETWEEN TIMESTAMP '1992-01-01' "
     "AND TIMESTAMP '1998-12-31'"),
    ("priority_wellformed", "priority label carries a rank prefix",
     "o_orderpriority LIKE '%-%'"),
]


def _rule_engine_oracle() -> str:
    arms = "\n    UNION ALL\n".join(
        f"""    SELECT '{rid}' AS rule_id, '{desc}' AS description,
           CAST(COUNT(*) AS BIGINT) AS n_checked,
           CAST(SUM(CASE WHEN NOT ({pred}) THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations
    FROM orders"""
        for rid, desc, pred in DQ_RULES
    )
    return arms


@register("dq_rule_engine", oracle=_rule_engine_oracle())
def dq_rule_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality rule engine: boolean predicates live in
    a RULES TABLE (expression-as-data), and ONE pass over the fact
    evaluates all of them — each row explodes to |rules| (rule_id,
    violated) pairs folded by a map-side-combinable groupBy, so adding
    a rule never adds a scan. The predicate strings compile via
    ``F.expr`` on the Spark side and are spliced verbatim into the
    DuckDB oracle, so the rules' SEMANTICS (not a re-implementation)
    are what both engines execute — any dialect divergence or
    mis-binding surfaces as a value diff. The same shape at 100 TB:
    rule count is bounded, the fact is touched once."""
    o = load(spark, sf_dir, "orders")
    checks = F.array(
        *[
            F.struct(
                F.lit(rid).alias("rule_id"),
                F.lit(desc).alias("description"),
                (~F.expr(pred)).cast("int").alias("violated"),
            )
            for rid, desc, pred in DQ_RULES
        ]
    )
    return (
        o.select(F.explode(checks).alias("c"))
        .groupBy("c.rule_id", "c.description")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_checked"),
            F.sum("c.violated").cast("bigint").alias("n_violations"),
        )
    )


@register(
    "events_seasonal_anomaly",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
             strftime(ts, '%Y-%m-%d') AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2, 3),
    prof AS (
      SELECT event_type, hod,
             CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(x * x) AS BIGINT) AS q
      FROM daily GROUP BY 1, 2)
    SELECT d.event_type, d.hod, d.day, d.x
    FROM daily d JOIN prof p
      ON d.event_type = p.event_type AND d.hod = p.hod
    WHERE p.m >= 3
      AND (d.x * p.m - p.s) * (d.x * p.m - p.s)
          > 4 * (p.m * p.q - p.s * p.s)
    """,
)
def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-residual anomaly screen: daily (type, hour) counts
    flagged when they sit more than 2 standard deviations from that
    type-hour's own diurnal profile — the detector
    ``events_seasonal_profile`` exists to feed, closed into one query.
    EXACT integer test: |x - S/m| > 2σ cross-multiplies to
    (x·m - S)² > 4·(m·Q - S²) with S=Σx, Q=Σx², m=days — no floats,
    no engine-divergence surface, and the m>=3 guard drops degenerate
    profiles. Two stacked combinable groupBys + one profile join
    (profile is (types x 24)-bounded -> broadcast at any scale)."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").cast("bigint").alias("hod"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    daily = ev.groupBy("event_type", "hod", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    prof = daily.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("q"),
    )
    j = daily.join(F.broadcast(prof), ["event_type", "hod"])
    resid = F.col("x") * F.col("m") - F.col("s")
    return j.filter(
        (F.col("m") >= 3)
        & (resid * resid > 4 * (F.col("m") * F.col("q") - F.col("s") * F.col("s")))
    ).select("event_type", "hod", "day", "x")


@register(
    "dq_histogram_drift",
    oracle="""
    WITH b AS (
      SELECT CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END AS cohort,
             LEAST(9, GREATEST(0,
               CAST(floor(value / 10) AS BIGINT))) AS bucket
      FROM events),
    h AS (
      SELECT bucket,
             CAST(SUM(CASE WHEN cohort = 'a' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n1,
             CAST(SUM(CASE WHEN cohort = 'b' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n2
      FROM b GROUP BY bucket),
    t AS (SELECT CAST(SUM(n1) AS BIGINT) AS t1,
                 CAST(SUM(n2) AS BIGINT) AS t2 FROM h)
    SELECT h.bucket, h.n1, h.n2,
           abs(h.n1 * t.t2 - h.n2 * t.t1) * 100 > 5 * t.t1 * t.t2
               AS drifted
    FROM h CROSS JOIN t
    """,
)
def dq_histogram_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift screen between two cohorts (the PSI/KS
    question answered exactly): bucket the value channel, histogram
    each cohort (even/odd event_id stands in for
    reference-window/current-window), and flag buckets whose share
    differs by more than 5 percentage points using the fully
    CROSS-MULTIPLIED integer test |n1·T2 - n2·T1|·100 > 5·T1·T2 — no
    divisions, no logs, no float drift surface (PSI's ln(p/q) is
    deliberately avoided: libm differences across engines make it
    unverifiable bit-for-bit). One combinable histogram groupBy + one
    broadcast totals scalar; bucket count is fixed, so the report is
    constant-sized at any SF."""
    ev = load(spark, sf_dir, "events").select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias(
            "cohort"
        ),
        F.least(
            F.lit(9),
            F.greatest(
                F.lit(0), F.floor(F.col("value") / 10).cast("bigint")
            ),
        ).alias("bucket"),
    )
    h = ev.groupBy("bucket").agg(
        F.sum((F.col("cohort") == "a").cast("int")).cast("bigint").alias("n1"),
        F.sum((F.col("cohort") == "b").cast("int")).cast("bigint").alias("n2"),
    )
    t = h.agg(
        F.sum("n1").cast("bigint").alias("t1"),
        F.sum("n2").cast("bigint").alias("t2"),
    )
    return h.crossJoin(F.broadcast(t)).select(
        "bucket",
        "n1",
        "n2",
        (
            F.abs(F.col("n1") * F.col("t2") - F.col("n2") * F.col("t1")) * 100
            > 5 * F.col("t1") * F.col("t2")
        ).alias("drifted"),
    )


@register(
    "agg_ols_two_features",
    oracle="""
    WITH pc AS (
      SELECT o_custkey,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS y,
             CAST(COUNT(*) AS BIGINT) AS x2
      FROM orders GROUP BY o_custkey),
    j AS (
      SELECT c.c_nationkey,
             CAST(round(c.c_acctbal * 100) AS BIGINT) AS x1, pc.x2, pc.y
      FROM customer c JOIN pc ON c.c_custkey = pc.o_custkey),
    m AS (
      SELECT c_nationkey,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x1) AS DECIMAL(38,0)) AS s1,
             CAST(SUM(x2) AS DECIMAL(38,0)) AS s2,
             CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x1 AS DECIMAL(19,0)) * x1) AS DECIMAL(38,0)) AS s11,
             CAST(SUM(CAST(x1 AS DECIMAL(19,0)) * x2) AS DECIMAL(38,0)) AS s12,
             CAST(SUM(CAST(x2 AS DECIMAL(19,0)) * x2) AS DECIMAL(38,0)) AS s22,
             CAST(SUM(CAST(x1 AS DECIMAL(19,0)) * y) AS DECIMAL(38,0)) AS s1y,
             CAST(SUM(CAST(x2 AS DECIMAL(19,0)) * y) AS DECIMAL(38,0)) AS s2y,
             CAST(SUM(CAST(y AS DECIMAL(19,0)) * y) AS DECIMAL(38,0)) AS syy
      FROM j GROUP BY c_nationkey),
    d AS (
      SELECT c_nationkey, n,
             CAST(n AS DOUBLE) AS nd,
             CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
             CAST(sy AS DOUBLE) AS syd,
             CAST(s11 AS DOUBLE) AS s11d, CAST(s12 AS DOUBLE) AS s12d,
             CAST(s22 AS DOUBLE) AS s22d,
             CAST(s1y AS DOUBLE) AS s1yd, CAST(s2y AS DOUBLE) AS s2yd,
             CAST(syy AS DOUBLE) AS syyd
      FROM m),
    s AS (
      SELECT c_nationkey, n, syd, s1yd, s2yd, syyd, nd,
             nd * (s11d * s22d - s12d * s12d)
               - s1d * (s1d * s22d - s12d * s2d)
               + s2d * (s1d * s12d - s11d * s2d) AS det,
             syd * (s11d * s22d - s12d * s12d)
               - s1d * (s1yd * s22d - s12d * s2yd)
               + s2d * (s1yd * s12d - s11d * s2yd) AS det0,
             nd * (s1yd * s22d - s12d * s2yd)
               - syd * (s1d * s22d - s12d * s2d)
               + s2d * (s1d * s2yd - s1yd * s2d) AS det1,
             nd * (s11d * s2yd - s1yd * s12d)
               - s1d * (s1d * s2yd - s1yd * s2d)
               + syd * (s1d * s12d - s11d * s2d) AS det2
      FROM d),
    f AS (
      SELECT c_nationkey, n,
             det0 / det AS b0, det1 / det AS b1, det2 / det AS b2,
             syyd - syd * syd / nd AS sst,
             syyd - (det0 / det) * syd - (det1 / det) * s1yd
                  - (det2 / det) * s2yd AS sse
      FROM s WHERE det > 0),
    r AS (SELECT * FROM f WHERE sst > 0)
    SELECT CAST(c_nationkey AS BIGINT) AS nation, n,
           ROUND(b0, 6) AS intercept,
           ROUND(b1, 6) AS beta_acctbal,
           ROUND(b2, 6) AS beta_n_orders,
           ROUND(1 - sse / sst, 6) AS r2
    FROM r
    """,
)
def agg_ols_two_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-feature grouped least squares (multiple regression): per
    nation, regress customer lifetime revenue on (account balance,
    order count) via the normal equations — solved in closed form with
    Cramer's rule over the 3x3 Gram matrix of EXACT sufficient
    statistics (integer cents, DECIMAL(19,0) pairwise products summed
    in DECIMAL(38,0); one pass, map-side combinable, no per-row
    residual pass — SSE comes from the same statistics). Only the
    final determinant arithmetic drops to doubles, where both engines
    execute the IDENTICAL operation tree on identical inputs, so 6-dp
    rounding hash-matches. Degenerate groups (singular Gram matrix or
    zero outcome variance) are excluded identically on both sides —
    agg_ols_regression's guard, generalized. At 100 TB: the plan is
    one fact groupBy + one dimension join + one moments groupBy,
    nothing grows but key cardinality; adding features grows the
    statistics vector O(k^2), never the pass count."""
    o = load(spark, sf_dir, "orders")
    pc = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("y"),
        F.count(F.lit(1)).cast("bigint").alias("x2"),
    )
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("x1"),
    )
    j = c.join(pc, c.c_custkey == pc.o_custkey).select(
        "c_nationkey", "x1", "x2", "y"
    )
    d19 = lambda col: F.col(col).cast("decimal(19,0)")  # noqa: E731
    m = j.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast("decimal(38,0)").alias("s1"),
        F.sum("x2").cast("decimal(38,0)").alias("s2"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(d19("x1") * F.col("x1")).cast("decimal(38,0)").alias("s11"),
        F.sum(d19("x1") * F.col("x2")).cast("decimal(38,0)").alias("s12"),
        F.sum(d19("x2") * F.col("x2")).cast("decimal(38,0)").alias("s22"),
        F.sum(d19("x1") * F.col("y")).cast("decimal(38,0)").alias("s1y"),
        F.sum(d19("x2") * F.col("y")).cast("decimal(38,0)").alias("s2y"),
        F.sum(d19("y") * F.col("y")).cast("decimal(38,0)").alias("syy"),
    )
    nd = F.col("n").cast("double")
    s1d, s2d, syd = (F.col(c_).cast("double") for c_ in ("s1", "s2", "sy"))
    s11d, s12d, s22d = (
        F.col(c_).cast("double") for c_ in ("s11", "s12", "s22")
    )
    s1yd, s2yd, syyd = (
        F.col(c_).cast("double") for c_ in ("s1y", "s2y", "syy")
    )
    det = (
        nd * (s11d * s22d - s12d * s12d)
        - s1d * (s1d * s22d - s12d * s2d)
        + s2d * (s1d * s12d - s11d * s2d)
    )
    det0 = (
        syd * (s11d * s22d - s12d * s12d)
        - s1d * (s1yd * s22d - s12d * s2yd)
        + s2d * (s1yd * s12d - s11d * s2yd)
    )
    det1 = (
        nd * (s1yd * s22d - s12d * s2yd)
        - syd * (s1d * s22d - s12d * s2d)
        + s2d * (s1d * s2yd - s1yd * s2d)
    )
    det2 = (
        nd * (s11d * s2yd - s1yd * s12d)
        - s1d * (s1d * s2yd - s1yd * s2d)
        + syd * (s1d * s12d - s11d * s2d)
    )
    b0, b1, b2 = det0 / det, det1 / det, det2 / det
    sst = syyd - syd * syd / nd
    sse = syyd - b0 * syd - b1 * s1yd - b2 * s2yd
    return (
        m.filter(det > 0)
        .filter(sst > 0)
        .select(
            F.col("c_nationkey").cast("bigint").alias("nation"),
            "n",
            F.round(b0, 6).alias("intercept"),
            F.round(b1, 6).alias("beta_acctbal"),
            F.round(b2, 6).alias("beta_n_orders"),
            F.round(1 - sse / sst, 6).alias("r2"),
        )
    )


@register(
    "dq_ks_two_sample",
    oracle="""
    WITH pooled AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderkey AS rid,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_a
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
    c AS (
      SELECT cents,
             SUM(is_a) OVER (ORDER BY cents, rid
                             ROWS UNBOUNDED PRECEDING) AS cum_a,
             ROW_NUMBER() OVER (ORDER BY cents, rid) AS i
      FROM pooled),
    lastv AS (
      SELECT cents, MAX(cum_a) AS cum_a, MAX(i) AS i
      FROM c GROUP BY cents),
    n AS (
      SELECT CAST(SUM(is_a) AS BIGINT) AS n_a,
             CAST(COUNT(*) - SUM(is_a) AS BIGINT) AS n_b
      FROM pooled),
    d AS (
      SELECT MAX(ABS(l.cum_a * n.n_b - (l.i - l.cum_a) * n.n_a)) AS ks_num
      FROM lastv l CROSS JOIN n)
    SELECT n.n_a, n.n_b,
           CAST(d.ks_num AS BIGINT) AS ks_num,
           CAST(d.ks_num * 1000000 // (n.n_a * n.n_b) AS BIGINT) AS ks_e6
    FROM n CROSS JOIN d
    """,
)
def dq_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic, EXACT: the max
    ECDF gap between urgent-priority and low-priority order values,
    computed as max over distinct values of
    |cum_a * n_b - cum_b * n_a| (integer cross-multiplication — no
    float ECDFs, so the statistic hash-matches any engine; divide
    once at the end for the e6-scaled D). The distribution-drift gate
    between two cohorts/snapshots that dq_histogram_drift approximates
    with fixed bins, done exactly.

    Scale shape: ONE two-phase ``_global_cumsum`` computes BOTH
    running counts via an encoded weight (is_a * 2^31 + 1: the
    inclusive sum decodes as cum_a = cw div 2^31, pooled position
    i = cw mod 2^31, cum_b = i - cum_a) — a single data-sized ordered
    prefix sum, parallel per range partition, no single-partition
    window. Tie groups collapse to their LAST row (per-cents MAX is
    map-side combinable) so the ECDF is evaluated only after a whole
    tie group, which is the KS definition. The encode holds to
    2^31 pooled rows (~2.1x10^9): the packed position ``i = cw mod
    2^31`` wraps into the cum_a bits at exactly 2^31 rows, so past
    that, split into two prefix sums (one-line change, same plan
    family). The assert below makes the migration trigger fire loudly
    instead of silently corrupting cum_a."""
    pooled = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
            F.col("o_orderkey").alias("rid"),
            (F.col("o_orderpriority") == "1-URGENT")
            .cast("bigint")
            .alias("is_a"),
        )
    )
    big = F.lit(1 << 31).cast("bigint")
    enc = pooled.withColumn("w", F.col("is_a") * big + 1)
    c = _global_cumsum(enc, "cents", "rid", "w")
    lastv = (
        c.select(
            "cents",
            F.expr(f"cw div {1 << 31}").alias("cum_a"),
            F.expr(f"cw % {1 << 31}").alias("i"),
        )
        .groupBy("cents")
        .agg(F.max("cum_a").alias("cum_a"), F.max("i").alias("i"))
    )
    n = pooled.agg(
        F.sum("is_a").cast("bigint").alias("n_a"),
        (F.count(F.lit(1)) - F.sum("is_a")).cast("bigint").alias("n_b"),
    )
    d = lastv.crossJoin(F.broadcast(n)).agg(
        F.max(
            F.abs(
                F.col("cum_a") * F.col("n_b")
                - (F.col("i") - F.col("cum_a")) * F.col("n_a")
            )
        ).alias("ks_num")
    )
    # Refuse loudly at the encoding's true limit: position i wraps into
    # the cum_a bits once n_a + n_b reaches 2^31.  assert_true returns
    # NULL on success, so folding it into the kept column forces the
    # check to survive column pruning without changing the output.
    guard = F.assert_true(
        F.col("n_a") + F.col("n_b") < F.lit(1 << 31).cast("bigint"),
        F.lit(
            "dq_ks_two_sample: pooled rows >= 2^31 — the packed "
            "prefix-sum encoding wraps; split into two prefix sums"
        ),
    )
    return n.crossJoin(d).select(
        "n_a",
        "n_b",
        F.when(guard.isNull(), F.col("ks_num"))
        .cast("bigint")
        .alias("ks_num"),
        F.expr("ks_num * 1000000 div (n_a * n_b)").cast("bigint").alias("ks_e6"),
    )


@register(
    "text_readability",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS n_words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS BIGINT) AS n_sentences,
             CAST(greatest(len(regexp_extract_all(lower(text),
                                                  '[aeiouy]+')), 1)
                  AS BIGINT) AS n_syllables
      FROM documents WHERE length(text) > 0)
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CAST(390 * n_words // n_sentences
                + 11800 * n_syllables // n_words - 15590 AS BIGINT)
               AS fk_grade_e3
    FROM f
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid grade-level readability per document — the
    classic text-quality feature every corpus filter bank includes
    next to the Gopher rules: grade = 0.39*(words/sentence) +
    11.8*(syllables/word) - 15.59, with syllables approximated by
    vowel-group runs ([aeiouy]+, the standard cheap heuristic) and
    sentences by terminal-punctuation runs (floored at 1 for
    fragment-only documents, which the synthetic corpus is).

    Exactness: the grade quantizes to e3 via two integer floor
    divisions applied in fixed order (390*w//s + 11800*sy//w - 15590)
    — no float ratios, so both engines agree bitwise; the regex
    counts use a character-class pattern every regex engine matches
    identically.

    Scale shape: pure per-row regexp_count/split expressions inside
    whole-stage codegen — zero shuffles, zero UDFs; one map pass at
    any corpus size (the per-document screen profile)."""
    d = load(spark, sf_dir, "documents", parallelize=True).filter(
        F.length("text") > 0
    )
    f = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_words"),
        F.greatest(
            F.regexp_count("text", F.lit(r"[.!?]+")), F.lit(1)
        )
        .cast("bigint")
        .alias("n_sentences"),
        F.greatest(
            F.regexp_count(F.lower("text"), F.lit(r"[aeiouy]+")), F.lit(1)
        )
        .cast("bigint")
        .alias("n_syllables"),
    )
    return f.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.expr(
            "390 * n_words div n_sentences"
            " + 11800 * n_syllables div n_words - 15590"
        )
        .cast("bigint")
        .alias("fk_grade_e3"),
    )
