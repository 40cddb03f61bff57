"""Extended relational surface: operators beyond the §2.B core that a
user of a full analytics engine expects -- subqueries (Catalyst
decorrelation), pivot-style conditional aggregation, deterministic
sampling, arg-max selection, rank distributions, full outer join, and
the A1 URL-vs-local classification as a set operation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from metadata_extractors_api_spark.catalog import load
from metadata_extractors_api_spark.operators.relational import dsum, money
from metadata_extractors_api_spark.registry import register
from metadata_extractors_api_spark.sources import registry as reg


@register(
    "join_full_outer",
    oracle="""
    SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
           COUNT(c.c_custkey) AS n_cust,
           COUNT(s.s_suppkey) AS n_supp
    FROM (SELECT c_custkey, c_nationkey FROM customer WHERE c_nationkey < 20) c
    FULL OUTER JOIN (SELECT s_suppkey, s_nationkey FROM supplier) s
      ON c.c_nationkey = s.s_nationkey AND c.c_custkey % 3 = 0
    GROUP BY 1
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join preserving unmatched rows on BOTH sides (origin:
    reconciling two registry snapshots where either may have entries the
    other lacks)."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") < 20)
        .select("c_custkey", "c_nationkey")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    joined = c.join(
        s,
        (c.c_nationkey == s.s_nationkey) & (c.c_custkey % 3 == 0),
        "full_outer",
    )
    return joined.groupBy(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey")
    ).agg(
        F.count("c_custkey").alias("n_cust"),
        F.count("s_suppkey").alias("n_supp"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP (subtotals along one drill path, vs CUBE's
    full lattice in agg_rollup_cube)."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count("*").alias("n"),
    )


@register(
    "subq_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.5
    """,
)
def subq_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in a predicate (compiles to a
    broadcast of the 1-row aggregate). Uses spark.sql to exercise the
    SQL front door of the engine."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders_v
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders_v) * 1.5
        """
    )


@register(
    "subq_exists",
    oracle="""
    SELECT p_partkey, p_brand
    FROM part p
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
    """,
)
def subq_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS -> Catalyst decorrelates to a left-semi join."""
    load(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT p_partkey, p_brand
        FROM part_v p
        WHERE EXISTS (SELECT 1 FROM lineitem_v l
                      WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
        """
    )


@register(
    "win_ntile_percent",
    oracle="""
    SELECT c_custkey,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
)
def win_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-distribution analytics: ntile / percent_rank / cume_dist
    (ties broken by key so both engines see one total order).

    Scale shape: the customer relation is SF-proportional, so instead
    of ``Window.orderBy(...)`` (a single-partition global sort) the
    global rank comes from the range-repartitioned two-phase
    ``_global_rank``; under a total order all three rank statistics are
    pure arithmetic over (i, n): ntile via ``_ntile_from_rank``,
    percent_rank = (i-1)/(n-1), cume_dist = i/n."""
    from metadata_extractors_api_spark.operators.quality import (
        _global_rank,
        _ntile_from_rank,
    )

    c = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    r = _global_rank(c, "c_acctbal", "c_custkey")
    i, n = F.col("i"), F.col("n")
    return r.select(
        "c_custkey",
        _ntile_from_rank(i, n, 4).alias("quartile"),
        F.round((i - 1) / (n - 1), 6).alias("pct_rank"),
        F.round(i / n, 6).alias("cume"),
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT l_linestatus,
           CAST(ROUND(SUM(CASE WHEN l_returnflag = 'A'
                 THEN CAST(l_quantity AS DECIMAL(14,2)) ELSE 0 END), 2) AS DOUBLE) AS qty_A,
           CAST(ROUND(SUM(CASE WHEN l_returnflag = 'N'
                 THEN CAST(l_quantity AS DECIMAL(14,2)) ELSE 0 END), 2) AS DOUBLE) AS qty_N,
           CAST(ROUND(SUM(CASE WHEN l_returnflag = 'R'
                 THEN CAST(l_quantity AS DECIMAL(14,2)) ELSE 0 END), 2) AS DOUBLE) AS qty_R
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation): one pass, one shuffle --
    the set-oriented replacement for per-category loops."""
    li = load(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum(money("l_quantity")), 2).cast("double"))
    )
    return piv.select(
        "l_linestatus",
        F.col("A").alias("qty_A"),
        F.col("N").alias("qty_N"),
        F.col("R").alias("qty_R"),
    )


@register(
    "sample_hash",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 10 = 3
    """,
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sampling by key hash: reproducible across
    engines/runs/cluster sizes (unlike rng-based Bernoulli sampling),
    the right primitive for repeatable data audits at scale."""
    o = load(spark, sf_dir, "orders")
    h = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
    return o.filter(h.cast("bigint") % 10 == 3).select("o_orderkey", "o_totalprice")


@register(
    "agg_argmax",
    oracle="""
    SELECT o_orderpriority, o_orderkey AS top_order,
           CAST(o_totalprice AS DOUBLE) AS top_price
    FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
          FROM orders)
    WHERE rn = 1
    """,
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-max selection per group in a single aggregation (no window,
    no self-join) -- the cheapest form of A4's pick-one-per-key at
    scale. Tie-broken by orderkey via a (price, key) struct ordering."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", F.struct("o_totalprice", "o_orderkey")).alias(
            "top_order"
        ),
        F.max("o_totalprice").cast("double").alias("top_price"),
    )


@register(
    "scan_files_url",
    oracle=f"""
    WITH files AS (SELECT * FROM {reg.files_values_sql()})
    SELECT file_id, path,
           regexp_matches(path, '^http[s]?://') AS is_remote,
           CASE WHEN regexp_matches(path, '^http[s]?://')
                THEN regexp_extract(path, '^http[s]?://([^/]+)', 1)
                ELSE NULL END AS host
    FROM files
    """,
)
def scan_files_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1's URL-vs-local-path branch (__init__.py:81-89) as a set
    operation: classify every input and extract the host for remote
    ones (the download step becomes a distributed fetch per partition
    at scale)."""
    f = reg.files_df(spark)
    is_remote = F.col("path").rlike("^http[s]?://")
    return f.select(
        "file_id",
        "path",
        is_remote.alias("is_remote"),
        F.when(is_remote, F.regexp_extract("path", "^http[s]?://([^/]+)", 1))
        .otherwise(F.lit(None))
        .alias("host"),
    )


@register(
    "multimodal_frames",
    oracle="""
    WITH f AS (
      SELECT doc_id, text, CAST(length(text) AS INT) AS n
      FROM documents WHERE length(text) >= 30),
    idx AS (SELECT unnest(range(0, 3)) AS frame_idx)
    SELECT doc_id,
           CAST(frame_idx AS INT) AS frame_idx,
           md5(substr(text, CAST(1 + frame_idx * (n // 3) AS INT), 10)) AS frame_digest
    FROM f CROSS JOIN idx
    """,
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: sample 3 fixed
    offsets per payload, digest each chunk. The text column stands in
    for the byte stream (decoders are stubbed per environment); the
    distributed shape -- explode fixed frame indexes, slice, digest --
    is exactly the real pipeline's."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.length("text") >= 30)
        .select("doc_id", "text", F.length("text").cast("int").alias("n"))
    )
    frames = d.select(
        "doc_id",
        "text",
        "n",
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("frame_idx"),
    )
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.md5(
            F.expr("substr(text, 1 + frame_idx * CAST(n / 3 AS INT), 10)")
        ).alias("frame_digest"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag, l_linestatus) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS: exactly the requested aggregation
    levels, no more (ROLLUP/CUBE are the derived conveniences; the
    hand-picked set is what production report jobs run because each
    extra level is a full extra pass at 100 TB). One Expand +
    hash-aggregate plan: the input is replicated once per set, then
    aggregated in a single shuffle -- cheaper than unioning three
    separate groupBys, which would scan the fact table three times.
    grouping_id disambiguates genuine NULL keys from subtotal rows."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE)
                   AS sum_qty
        FROM lineitem_v
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


@register(
    "multimodal_audio_windows",
    oracle="""
    WITH f AS (
      SELECT doc_id, text, CAST(length(text) AS INT) AS n
      FROM documents WHERE length(text) >= 16),
    idx AS (SELECT unnest(range(0, 200)) AS w)
    SELECT doc_id,
           CAST(w AS INT) AS w_idx,
           CAST(list_reduce(
             list_transform(range(1, 17),
                            i -> ascii(text[CAST(w*8+i AS INT):CAST(w*8+i AS INT)])),
             (a, b) -> a + b) AS BIGINT) AS energy
    FROM f CROSS JOIN idx
    WHERE w <= (n - 16) // 8
    """,
)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-windowing plumbing: overlapping fixed-length windows
    (length 16, hop 8 -- the STFT frame layout) over each payload,
    with a per-window energy feature (exact integer sum of sample
    codes, the RMS stand-in; real PCM decoders are stubbed per
    environment, as with the image/video slots). Completes the
    multimodal triple: image (multimodal_meta/resize/features), video
    (multimodal_frames), audio (this). Scale shape: per-row window
    explosion is bounded by payload length / hop; the feature is a
    codegen'd HOF over the slice -- no UDF, no shuffle; on real audio
    the same plan runs with a Pandas-UDF decode slot in front."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.length("text") >= 16)
        .select("doc_id", "text", F.length("text").cast("int").alias("n"))
    )
    wins = d.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(F.lit(0), F.expr("CAST((n - 16) / 8 AS INT)"))
        ).alias("w_idx"),
    )
    return wins.select(
        "doc_id",
        F.col("w_idx").cast("int").alias("w_idx"),
        F.expr(
            "CAST(aggregate(transform(sequence(1, 16),"
            " i -> ascii(substr(text, w_idx * 8 + i, 1))),"
            " CAST(0 AS BIGINT), (a, b) -> a + b) AS BIGINT)"
        ).alias("energy"),
    )


@register(
    "join_null_safe",
    oracle="""
    WITH ev AS (
      SELECT CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) < 10
                  THEN NULL
                  ELSE CAST(json_extract_string(props, '$.k') AS INT) // 10
             END AS kb,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    dim(kb, label) AS (VALUES
      (NULL, 'unknown'), (1, 'b1'), (2, 'b2'), (3, 'b3'), (4, 'b4'),
      (5, 'b5'), (6, 'b6'), (7, 'b7'), (8, 'b8'), (9, 'b9'))
    SELECT d.label,
           COUNT(*) AS n,
           CAST(SUM(ev.cents) AS BIGINT) AS cents
    FROM ev JOIN dim d ON ev.kb IS NOT DISTINCT FROM d.kb
    GROUP BY 1
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): the join
    semantic plain equality silently breaks -- rows whose key is NULL
    vanish from an equi-join, which is exactly wrong when NULL is a
    meaningful category ('unknown' bucket) that must map to a dim row.
    Here a derived nullable bucket joins a dimension whose NULL row
    labels the unknowns; Spark's eqNullSafe compiles to the same
    hash-join machinery as = (NULL hashes as a regular value), so the
    null-safe form costs nothing at scale -- it is a correctness
    choice, not a performance trade."""
    ev = load(spark, sf_dir, "events").select(
        F.when(
            F.get_json_object("props", "$.k").cast("int") < 10, F.lit(None)
        )
        .otherwise(F.expr("CAST(get_json_object(props, '$.k') AS INT) div 10"))
        .cast("int")
        .alias("kb"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    dim = spark.createDataFrame(
        [(None, "unknown")] + [(i, f"b{i}") for i in range(1, 10)],
        "kb int, label string",
    )
    return (
        ev.join(F.broadcast(dim), ev.kb.eqNullSafe(dim.kb))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )


@register(
    "sql_recursive_tree",
    oracle="""
    WITH RECURSIVE d(k, depth) AS (
      SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
      UNION ALL
      SELECT s.s_suppkey, d.depth + 1
      FROM supplier s JOIN d ON CAST(floor((s.s_suppkey - 1) / 2) AS BIGINT) = d.k
      WHERE s.s_suppkey <> 0)
    SELECT CAST(depth AS BIGINT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(CAST(round(s.s_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS bal_cents
    FROM d JOIN supplier s ON s.s_suppkey = d.k
    GROUP BY 1 ORDER BY 1
    """,
)
def sql_recursive_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): traverse the implicit
    binary-heap hierarchy over suppliers (parent(k) = (k-1)/2 -- a
    deterministic tree with no extra fixture) and report per-depth
    node counts and exact balance totals. Recursion in Spark executes
    as iterated joins with AQE between steps; depth is O(log n), so a
    100 TB dimension hierarchy is ~40 iterations of dimension-sized
    joins, not a driver loop. DuckDB runs the IDENTICAL statement."""
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
        WITH RECURSIVE d(k, depth) AS (
          SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
          UNION ALL
          SELECT s.s_suppkey, d.depth + 1
          FROM supplier s JOIN d
            ON CAST(floor((s.s_suppkey - 1) / 2) AS BIGINT) = d.k
          WHERE s.s_suppkey <> 0)
        SELECT CAST(depth AS BIGINT) AS depth,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(CAST(round(s.s_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS bal_cents
        FROM d JOIN supplier s ON s.s_suppkey = d.k
        GROUP BY 1 ORDER BY 1
        """
    )


@register(
    "subq_lateral_topn",
    oracle="""
    SELECT r.r_name, l.n_name, l.bal_cents
    FROM region r, LATERAL (
      SELECT n.n_name,
             CAST(SUM(CAST(round(s.s_acctbal * 100) AS BIGINT)) AS BIGINT)
                 AS bal_cents
      FROM nation n JOIN supplier s ON s.s_nationkey = n.n_nationkey
      WHERE n.n_regionkey = r.r_regionkey
      GROUP BY n.n_name
      ORDER BY bal_cents DESC, n.n_name
      LIMIT 2) l
    ORDER BY r.r_name, l.bal_cents DESC, l.n_name
    """,
)
def subq_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL subquery: per-region top-2 nations by exact supplier
    balance -- the correlated top-n-per-group written the way an
    analyst writes it, with the correlation (r.r_regionkey) inside the
    lateral body. Catalyst decorrelates this to the same
    aggregate-then-rank plan a window formulation produces; the query
    exists to pin that the LATERAL surface itself works and stays
    driver-loop-free. DuckDB runs the IDENTICAL statement."""
    load(spark, sf_dir, "region").createOrReplaceTempView("region")
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(
        """
        SELECT r.r_name, l.n_name, l.bal_cents
        FROM region r, LATERAL (
          SELECT n.n_name,
                 CAST(SUM(CAST(round(s.s_acctbal * 100) AS BIGINT)) AS BIGINT)
                     AS bal_cents
          FROM nation n JOIN supplier s ON s.s_nationkey = n.n_nationkey
          WHERE n.n_regionkey = r.r_regionkey
          GROUP BY n.n_name
          ORDER BY bal_cents DESC, n.n_name
          LIMIT 2) l
        ORDER BY r.r_name, l.bal_cents DESC, l.n_name
        """
    )


@register(
    "join_null_safe_classes",
    oracle="""
    WITH a AS (
      SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END AS k,
             o_orderkey
      FROM orders WHERE o_orderkey % 3 = 0),
    b AS (
      SELECT CASE WHEN o_orderkey % 89 = 0 THEN NULL ELSE o_custkey END AS k,
             o_orderkey
      FROM orders WHERE o_orderkey % 3 = 1),
    j AS (
      SELECT CASE WHEN a.k IS NULL THEN 'null-null' ELSE 'val-val' END
                 AS match_class
      FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k)
    SELECT match_class, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM j GROUP BY match_class
    """,
)
def join_null_safe_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of silently dropping — the semantic a
    late-arriving-dimension pipeline needs when "unknown" rows must
    still pair up (standard equality would discard every NULL-keyed
    row from an inner join with no error). The report splits matched
    pairs into null-null vs val-val so the NULL-match volume is
    visible, because null-safe semantics also CONCENTRATE every NULL
    into one join key.

    Scale shape: Spark plans ``eqNullSafe`` as an ordinary hash join
    (the key's null flag joins as part of the key), so the usual
    shuffle/broadcast machinery applies unchanged — but the null
    bucket is a guaranteed hot key at scale; cap or pre-split it (the
    skew playbook, SCALING.md §4) when NULL rates are material."""
    base = load(spark, sf_dir, "orders")
    a = base.filter(F.col("o_orderkey") % 3 == 0).select(
        F.when(F.col("o_orderkey") % 97 == 0, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("ka"),
    )
    b = base.filter(F.col("o_orderkey") % 3 == 1).select(
        F.when(F.col("o_orderkey") % 89 == 0, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("kb"),
    )
    j = a.join(b, F.col("ka").eqNullSafe(F.col("kb")))
    return (
        j.select(
            F.when(F.col("ka").isNull(), F.lit("null-null"))
            .otherwise(F.lit("val-val"))
            .alias("match_class")
        )
        .groupBy("match_class")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


@register(
    "win_distinct_rolling",
    oracle="""
    SELECT event_id, user_id,
           CAST(len(list_distinct(
             list(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))) AS INT)
             AS n_distinct10
    FROM events
    """,
)
def win_distinct_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling DISTINCT count over a row frame -- per user, how many
    distinct event types occurred in the last 10 events. Spark has no
    COUNT(DISTINCT) OVER (frame) (Catalyst rejects DISTINCT in window
    aggregates), so the operator composes what Spark DOES have:
    collect_list over the frame, array_distinct, size -- all JVM-side
    expressions. The behavior-diversity signal session-risk scoring
    uses (1 = monotone bot-like activity, high = varied engagement).

    Scale shape: one hash exchange on user_id + per-user sort; the
    frame is 10 rows, so the window state is O(1) per row and the
    collect_list never exceeds 10 elements -- this is NOT the
    unbounded-frame collect anti-pattern. Partitioned window, so the
    plan audit needs no allowlist entry."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.array_distinct(F.collect_list("event_type").over(w)))
        .cast("int")
        .alias("n_distinct10"),
    )


#: Funnel pattern over per-user event-code sequences: the clean
#: onboarding funnel — signup, then view, then click, then purchase,
#: with neither a purchase nor an error intervening anywhere in the
#: run (first clean conversion semantics).
FUNNEL_PATTERN = "s[^pe]*v[^pe]*c[^pe]*p"


@register(
    "win_pattern_funnel_regex",
    oracle=f"""
    WITH seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY ts, event_id) AS s,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id)
    SELECT user_id, n_events,
           regexp_matches(s, '{FUNNEL_PATTERN}') AS matched
    FROM seq
    """,
)
def win_pattern_funnel_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern matching over per-user event histories — the
    MATCH_RECOGNIZE surface Spark lacks, composed from what it has:
    each user's events collapse to an ordered single-char code string
    (v/c/p/s/e by first letter — distinct across the event-type
    domain) and the funnel 'signup, later view, later click, later
    purchase, with no purchase or error anywhere in the run' is one
    regex over it. Row-pattern queries
    (SQL:2016 MATCH_RECOGNIZE, Flink CEP) reduce to exactly this
    collapse-then-regex for patterns without measures.

    Ordering is total (ts, event_id), so the aggregated string is
    deterministic: Spark sorts an array of (ts, event_id, code)
    structs (struct comparison is field-ordered) where DuckDB uses
    ordered string_agg — same sequence, same regex engine semantics
    on a character-class-only pattern.

    Scale shape: one hash exchange on user_id + per-user sort (the
    sessionize profile); the per-user string is history-bounded. A
    100 TB deployment bounds it with a time window exactly as
    sessionization does."""
    ev = load(spark, sf_dir, "events")
    seq = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts"),
                F.col("event_id"),
                F.substring("event_type", 1, 1).alias("code"),
            ).alias("rec"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.array_join(
                F.expr("transform(array_sort(collect_list(rec)), x -> x.code)"),
                "",
            ).alias("s"),
        )
    )
    return seq.select(
        "user_id",
        "n_events",
        F.col("s").rlike(FUNNEL_PATTERN).alias("matched"),
    )


#: Coverage window each order opens, in days (interval coalescing).
COALESCE_WINDOW_DAYS = 30


@register(
    "win_interval_coalesce",
    oracle=f"""
    WITH iv AS (
      SELECT o_custkey AS cust, o_orderkey AS okey,
             epoch_us(o_orderdate) // 86400000000 AS s,
             epoch_us(o_orderdate) // 86400000000
               + {COALESCE_WINDOW_DAYS} AS e
      FROM orders),
    flagged AS (
      SELECT cust, okey, s, e,
             CASE WHEN s <= COALESCE(MAX(e) OVER (
                    PARTITION BY cust ORDER BY s, okey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    s - 1)
                  THEN 0 ELSE 1 END AS new_island
      FROM iv),
    isl AS (
      SELECT cust, s, e,
             SUM(new_island) OVER (PARTITION BY cust ORDER BY s, okey
                                   ROWS UNBOUNDED PRECEDING) AS island
      FROM flagged)
    SELECT cust AS o_custkey, CAST(island AS BIGINT) AS island,
           CAST(MIN(s) AS BIGINT) AS start_day,
           CAST(MAX(e) AS BIGINT) AS end_day,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM isl GROUP BY cust, island
    """,
)
def win_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing (union of overlapping validity windows):
    each order opens a 30-day coverage interval for its customer, and
    overlapping or touching intervals merge into maximal coverage
    islands — the classic SCD/entitlement-maintenance primitive
    (contract coverage, subscription stitching, on-call overlap) that
    win_gap_islands' equal-spacing streaks cannot express because
    interval EXTENTS, not row adjacency, decide the merge.

    The merge is one ordered window per key: an interval starts a new
    island iff its start exceeds the running MAX of all prior ends
    (plain cumulative max — overlapping chains can extend past the
    previous row's end, so lag(end) alone is wrong); the island id is
    the running sum of those flags. All arithmetic in integer epoch
    DAYS (both engines floor the µs epoch once), no date types in the
    output (oracle-compare constraint).

    Scale shape: one hash exchange on customer + per-key sort, frame
    state O(1) — the sessionize profile. At 100 TB the window is
    day-partition-pruned before the exchange."""
    o = load(spark, sf_dir, "orders")
    iv = o.select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderkey").alias("okey"),
        F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").alias("s"),
        (
            F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
            + COALESCE_WINDOW_DAYS
        ).alias("e"),
    )
    w_prev = (
        Window.partitionBy("cust")
        .orderBy("s", "okey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "new_island",
        F.when(
            F.col("s")
            <= F.coalesce(F.max("e").over(w_prev), F.col("s") - 1),
            0,
        ).otherwise(1),
    )
    w_run = (
        Window.partitionBy("cust")
        .orderBy("s", "okey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = flagged.withColumn("island", F.sum("new_island").over(w_run))
    return isl.groupBy(
        F.col("cust").alias("o_custkey"),
        F.col("island").cast("bigint").alias("island"),
    ).agg(
        F.min("s").cast("bigint").alias("start_day"),
        F.max("e").cast("bigint").alias("end_day"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )


@register(
    "events_funnel_steps",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY ts, event_id) AS s
      FROM events GROUP BY user_id),
    depth AS (
      SELECT CASE
               WHEN regexp_matches(s, 's[^pe]*v[^pe]*c[^pe]*p') THEN 4
               WHEN regexp_matches(s, 's[^pe]*v[^pe]*c') THEN 3
               WHEN regexp_matches(s, 's[^pe]*v') THEN 2
               WHEN regexp_matches(s, 's') THEN 1
               ELSE 0 END AS d
      FROM seq)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN d >= 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_signup,
           CAST(SUM(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_view,
           CAST(SUM(CASE WHEN d >= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_click,
           CAST(SUM(CASE WHEN d >= 4 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_purchase,
           round(CAST(SUM(CASE WHEN d >= 4 THEN 1 ELSE 0 END) AS DOUBLE)
                 / SUM(CASE WHEN d >= 1 THEN 1 ELSE 0 END), 6)
             AS conversion
    FROM depth
    """,
)
def events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel TABLE on top of the row-pattern machinery: how many
    users reach each prefix of the clean onboarding funnel (signup ->
    view -> click -> purchase, no intervening purchase/error), plus
    end-to-end conversion — the product-analytics report
    win_pattern_funnel_regex's per-user booleans feed. Depth is the
    longest matched PATTERN PREFIX (each stage regex extends the
    last), so stage counts are monotone by construction.

    Same determinism as the pattern twin: total (ts, event_id) order,
    identical regex semantics on character-class-only patterns, one
    final single-row aggregate (no windows, no joins after the
    per-user collapse)."""
    ev = load(spark, sf_dir, "events")
    seq = (
        ev.select(
            "user_id",
            F.struct(
                F.col("ts"),
                F.col("event_id"),
                F.substring("event_type", 1, 1).alias("code"),
            ).alias("rec"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(rec)), x -> x.code)"
                ),
                "",
            ).alias("s")
        )
    )
    depth = seq.select(
        F.when(F.col("s").rlike("s[^pe]*v[^pe]*c[^pe]*p"), 4)
        .when(F.col("s").rlike("s[^pe]*v[^pe]*c"), 3)
        .when(F.col("s").rlike("s[^pe]*v"), 2)
        .when(F.col("s").rlike("s"), 1)
        .otherwise(0)
        .alias("d")
    )
    reach = lambda k: F.sum(  # noqa: E731
        F.when(F.col("d") >= k, 1).otherwise(0)
    ).cast("bigint")
    return depth.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        reach(1).alias("n_signup"),
        reach(2).alias("n_view"),
        reach(3).alias("n_click"),
        reach(4).alias("n_purchase"),
        F.round(
            F.sum(F.when(F.col("d") >= 4, 1).otherwise(0)).cast("double")
            / F.sum(F.when(F.col("d") >= 1, 1).otherwise(0)),
            6,
        ).alias("conversion"),
    )


#: Max gap between consecutive funnel steps, in microseconds (6 h).
FUNNEL_GAP_US = 21_600_000_000


@register(
    "events_funnel_time_bound",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, substr(event_type, 1, 1) AS c,
             epoch_us(ts) AS tus
      FROM events),
    s1 AS (SELECT user_id, MIN(tus) AS t1 FROM ev WHERE c = 's' GROUP BY 1),
    s2 AS (SELECT e.user_id, MIN(e.tus) AS t2
           FROM ev e JOIN s1 ON s1.user_id = e.user_id
           WHERE e.c = 'v' AND e.tus > s1.t1
             AND e.tus - s1.t1 <= {FUNNEL_GAP_US}
           GROUP BY 1),
    s3 AS (SELECT e.user_id, MIN(e.tus) AS t3
           FROM ev e JOIN s2 ON s2.user_id = e.user_id
           WHERE e.c = 'c' AND e.tus > s2.t2
             AND e.tus - s2.t2 <= {FUNNEL_GAP_US}
           GROUP BY 1),
    s4 AS (SELECT e.user_id, MIN(e.tus) AS t4
           FROM ev e JOIN s3 ON s3.user_id = e.user_id
           WHERE e.c = 'p' AND e.tus > s3.t3
             AND e.tus - s3.t3 <= {FUNNEL_GAP_US}
           GROUP BY 1)
    SELECT s1.user_id, s1.t1, s2.t2, s3.t3, s4.t4,
           CAST(1 + (s2.t2 IS NOT NULL)::INT + (s3.t3 IS NOT NULL)::INT
                + (s4.t4 IS NOT NULL)::INT AS BIGINT) AS depth,
           s4.t4 IS NOT NULL AS converted
    FROM s1
    LEFT JOIN s2 ON s2.user_id = s1.user_id
    LEFT JOIN s3 ON s3.user_id = s1.user_id
    LEFT JOIN s4 ON s4.user_id = s1.user_id
    """,
)
def events_funnel_time_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained funnel: s -> v -> c -> p where each step must
    follow the previous within FUNNEL_GAP_US (6 h) — the conversion
    window product analytics actually uses, and the semantics the
    regex funnel (win_pattern_funnel_regex) cannot express because
    regular expressions see order but not elapsed time. Anchoring is
    greedy-first-touch (each step takes the EARLIEST qualifying
    event), the standard product-analytics convention; reported per
    user: step timestamps in exact epoch micros, reached depth, and
    conversion flag.

    Scale shape: four keyed min-aggregations chained by equi-joins on
    user_id — every stage shuffles on the same key (one exchange
    family, co-partitioned joins), no windows, no time-range
    self-join blowup (the per-step bound is a filter against the
    joined anchor, not an interval join). At 100 TB this is 4 cheap
    keyed passes over a type-filtered fraction of the corpus."""
    base = load(spark, sf_dir, "events")

    def typed(code):
        # startswith on the BASE column (not a derived substring) so the
        # predicate reaches the scan as a pushed StringStartsWith filter
        return base.filter(F.col("event_type").startswith(code)).select(
            "user_id", F.unix_micros("ts").alias("tus")
        )

    def step(prev, code, tprev, tcol):
        e = typed(code)
        return (
            e.join(prev.select("user_id", tprev), "user_id")
            .filter(
                (F.col("tus") > F.col(tprev))
                & (F.col("tus") - F.col(tprev) <= FUNNEL_GAP_US)
            )
            .groupBy("user_id")
            .agg(F.min("tus").alias(tcol))
        )

    # Known, measured trade (round-10 optimization pass): each step
    # feeds BOTH the next step and the final left-join tail, so the
    # lineage form re-derives the chain per branch — events scanned
    # 1+2+3+4 = 10x in the final plan. Checkpointing s1-s3 (user-grain)
    # cuts that to the docstring's four type-pruned passes but benched
    # CONSISTENTLY SLOWER at sf0.1 (alternating A/B medians 1.21-1.39 s
    # lineage vs 1.49-1.50 s checkpointed): the type-pruned re-scans
    # are cheaper than three materialization barriers at this scale.
    # On a cluster where events re-reads hit remote storage the
    # checkpoints win; they are a three-line change.
    s1 = typed("s").groupBy("user_id").agg(F.min("tus").alias("t1"))
    s2 = step(s1, "v", "t1", "t2")
    s3 = step(s2, "c", "t2", "t3")
    s4 = step(s3, "p", "t3", "t4")
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .join(s4, "user_id", "left")
        .select(
            "user_id",
            "t1",
            "t2",
            "t3",
            "t4",
            (
                F.lit(1)
                + F.col("t2").isNotNull().cast("int")
                + F.col("t3").isNotNull().cast("int")
                + F.col("t4").isNotNull().cast("int")
            )
            .cast("bigint")
            .alias("depth"),
            F.col("t4").isNotNull().alias("converted"),
        )
    )
