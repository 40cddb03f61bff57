"""Composite workload queries: TPC-H-style multi-operator plans
(adapted to the fixture schema) and corpus-level text statistics.
These exercise operator COMPOSITION -- the plans a real user runs --
on top of the per-operator coverage elsewhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from metadata_extractors_api_spark.catalog import load
from metadata_extractors_api_spark.operators.relational import (
    davg,
    dsum,
    money,
    rate,
)
from metadata_extractors_api_spark.registry import register


@register(
    "tpch_q3_shipping",
    oracle="""
    SELECT l.l_orderkey,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(6,2)))), 2) AS DOUBLE)
               AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS odate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority, adapted to fixture columns):
    3-way join, pushed date filters on both fact scans, grouped revenue,
    global top-10. Dims broadcast; the only growing exchange is the
    group-by on l_orderkey."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    rev = money("l_extendedprice") * (F.lit(1) - rate("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q10_returns",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(6,2)))), 2) AS DOUBLE)
               AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item revenue per customer): 4-way join
    with a selective pushed filter on the fact, top-20 customers."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    rev = money("l_extendedprice") * (F.lit(1) - rate("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "text_bigrams",
    oracle="""
    WITH toks AS (SELECT doc_id, str_split(text, ' ') AS tk FROM documents),
    big AS (
      SELECT unnest(list_transform(range(1, greatest(len(tk) - 1, 1) + 1),
                    i -> tk[i] || ' ' || tk[i+1])) AS bigram
      FROM toks WHERE len(tk) >= 2),
    uni AS (
      SELECT unnest(tk) AS token FROM toks),
    bc AS (SELECT bigram, COUNT(*) AS cnt FROM big GROUP BY bigram),
    uc AS (SELECT token, COUNT(*) AS n1 FROM uni GROUP BY token)
    SELECT bc.bigram, bc.cnt,
           round(bc.cnt * 1.0 / uc.n1, 6) AS p_next
    FROM bc JOIN uc ON str_split(bc.bigram, ' ')[1] = uc.token
    ORDER BY bc.cnt DESC, bc.bigram
    LIMIT 30
    """,
)
def text_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram statistics with conditional probability
    P(w2|w1) = count(w1 w2)/count(w1) -- the n-gram-LM building block.
    Two aggregations + one join on the leading token; at scale both
    aggregations shuffle on their n-gram key (no skew: hash keys).
    Both passes (bigram + unigram census) read the session-memoized
    tokenized corpus (_tokdocs_rel) instead of re-scanning parquet and
    re-splitting text per pass."""
    from metadata_extractors_api_spark.operators.llm import _tokdocs_rel

    d = _tokdocs_rel(spark, sf_dir)
    toked = d.select("tk").filter(F.size("tk") >= 2)
    bigrams = toked.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size("tk") - 1, F.lit(1))),
                lambda i: F.concat_ws(
                    " ", F.try_element_at("tk", i), F.try_element_at("tk", i + 1)
                ),
            )
        ).alias("bigram")
    )
    unigrams = d.select(F.explode("tk").alias("token"))
    bc = bigrams.groupBy("bigram").agg(F.count("*").alias("cnt"))
    uc = unigrams.groupBy("token").agg(F.count("*").alias("n1"))
    return (
        bc.join(uc, F.split(bc.bigram, " ").getItem(0) == uc.token)
        .select(
            "bigram",
            "cnt",
            F.round(F.col("cnt") / F.col("n1"), 6).alias("p_next"),
        )
        .orderBy(F.desc("cnt"), F.asc("bigram"))
        .limit(30)
    )


@register(
    "text_quality_filter",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(str_split(text, ' ')) AS INT) AS n_tokens,
             CAST(len(list_filter(str_split(text, ' '),
                  t -> list_contains(['the','and','of','to','a'], t))) AS INT) AS n_stop
      FROM documents)
    SELECT doc_id, lang, n_tokens
    FROM t
    WHERE n_tokens >= 30
      AND n_stop * 1.0 / n_tokens >= 0.05
    """,
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pre-training filter: quality signals -> keep
    decision. At 100 TB this is the pattern that discards most of the
    corpus before any expensive stage, entirely in codegen'd column
    expressions."""
    from metadata_extractors_api_spark.operators.llm import STOPWORDS

    d = load(spark, sf_dir, "documents")
    tk = F.split("text", " ")
    stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    t = d.select(
        "doc_id",
        "lang",
        F.size(tk).cast("int").alias("n_tokens"),
        F.size(F.filter(tk, lambda x: F.array_contains(stop, x)))
        .cast("int")
        .alias("n_stop"),
    )
    return t.filter(
        (F.col("n_tokens") >= 30)
        & (F.col("n_stop") / F.col("n_tokens") >= 0.05)
    ).select("doc_id", "lang", "n_tokens")


Q18_MIN_QTY = 250  # ~top 1% of fixture orders by total quantity


@register(
    "tpch_q18_large_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > {Q18_MIN_QTY})
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS odate,
           o.o_totalprice, b.sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): aggregate lineitem once
    per order, keep orders whose total quantity clears the threshold,
    then decorate with orders + customer. The classic Q18 formulation
    re-joins lineitem against its own HAVING subquery; since every
    output column is order-grained, the aggregate IS the fact side here
    — one pass over lineitem, and the joins run on the ~1% surviving
    key set (customer broadcast, orders semi-reduced by the join).
    Quantities are integral doubles, summed as exact BIGINT."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
        .filter(F.col("sum_qty") > Q18_MIN_QTY)
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "tpch_q5_local_supplier",
    oracle="""
    SELECT n.n_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(6,2)))), 2) AS DOUBLE)
               AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local-supplier volume): the 6-table join with the
    customer-nation = supplier-nation cycle constraint. All four
    dimension sides broadcast, the region filter prunes nation before
    it reaches the fact join, and the date window is pushed into the
    orders scan — the only data-sized exchange is the final 5-row
    per-nation aggregate. Exact DECIMAL revenue per the money/rate
    convention."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = money("l_extendedprice") * (F.lit(1) - rate("l_discount"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(c),
            (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
    )


@register(
    "text_doc_logprob",
    oracle="""
    WITH toks AS (SELECT doc_id, str_split(text, ' ') AS tk FROM documents),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(tk)),
                                   i -> tk[i] || ' ' || tk[i+1])) AS bigram
      FROM toks WHERE len(tk) >= 2),
    uni AS (SELECT unnest(tk) AS token FROM toks),
    bc AS (SELECT bigram, COUNT(*) AS cnt FROM bg GROUP BY 1),
    uc AS (SELECT token, COUNT(*) AS n1 FROM uni GROUP BY 1),
    sc AS (
      SELECT g.doc_id,
             CAST(floor(ln(bc.cnt * 1.0 / uc.n1) * 1e9) AS BIGINT) AS s
      FROM bg g
      JOIN bc USING (bigram)
      JOIN uc ON str_split(g.bigram, ' ')[1] = uc.token)
    SELECT doc_id, COUNT(*) AS n_bigrams,
           CAST(SUM(s) AS BIGINT) AS logprob_e9,
           CAST(floor(CAST(SUM(s) AS DOUBLE) / COUNT(*)) AS BIGINT)
               AS avg_logprob_e9
    FROM sc GROUP BY doc_id
    """,
)
def text_doc_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram-LM fluency score: each document's bigrams
    scored by the corpus-wide transition probability P(w2|w1) =
    count(w1 w2)/count(w1), summed as log-probs -- the classic
    cheap-LM quality signal for corpus filtering (low avg log-prob =
    disfluent/boilerplate text). Two corpus aggregations build the
    model, one join scores every document against it; all shuffles key
    on n-gram/token hashes. Cross-engine exactness: each log-prob is
    quantized floor(ln(p)*1e9) BEFORE summation -- ln() agrees
    bitwise between the JVM and DuckDB on these rational inputs
    (verified over the fixture's full ratio domain), and integer sums
    are order-independent, so the parallel aggregation hash-matches."""
    d = load(spark, sf_dir, "documents", parallelize=True)
    toked = d.select("doc_id", F.split("text", " ").alias("tk")).filter(
        F.size("tk") >= 2
    )
    bg = toked.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - 1),
                lambda i: F.concat_ws(
                    " ", F.try_element_at("tk", i), F.try_element_at("tk", i + 1)
                ),
            )
        ).alias("bigram"),
    )
    uni = d.select(F.explode(F.split("text", " ")).alias("token"))
    bc = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("cnt"))
    uc = uni.groupBy("token").agg(F.count(F.lit(1)).alias("n1"))
    scored = (
        bg.join(bc, "bigram")
        .join(uc, F.split(F.col("bigram"), " ").getItem(0) == uc.token)
        .select(
            "doc_id",
            F.floor(F.log(F.col("cnt") / F.col("n1")) * F.lit(1e9))
            .cast("bigint")
            .alias("s"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("s").alias("logprob_e9"),
        F.floor(F.sum("s").cast("double") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("avg_logprob_e9"),
    )


# Domain-mixture spec: target keep-rate per source bucket (i % 3), as
# parts-per-million. Thresholds against the 32-bit md5 prefix are
# precomputed in exact integer arithmetic so the Spark filter and the
# generated oracle compare against literally the same numbers.
MIX_RATE_E6 = {0: 500_000, 1: 200_000, 2: 100_000}
MIX_THRESHOLDS = {
    bucket: (rate * (1 << 32)) // 1_000_000
    for bucket, rate in MIX_RATE_E6.items()
}


def _mix_weights_values() -> str:
    rows = ", ".join(
        f"('src{i}', {MIX_THRESHOLDS[i % 3]})" for i in range(20)
    )
    return f"(VALUES {rows}) AS w(source, threshold)"


@register(
    "mix_sources_weighted",
    oracle=f"""
    SELECT d.doc_id, d.source
    FROM documents d
    JOIN {_mix_weights_values()} USING (source)
    WHERE ('0x' || substr(md5('mix' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
          < w.threshold
    """,
)
def mix_sources_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling: down-sample each source to a target
    keep-rate so the retained corpus matches a prescribed domain
    mixture (the re-weighting step every pre-training data recipe
    runs). Sampling is deterministic hash-gating, not RNG: a doc is
    kept iff its salted 32-bit md5 prefix falls below the source's
    precomputed integer threshold, so the sample is reproducible
    across runs, engines, and cluster sizes, and composes with
    incremental ingestion (a doc's verdict never changes). The weights
    table is dimension-sized -> broadcast hash join against the corpus
    scan; no shuffle at all (the filter is map-side), which is the
    100 TB plan: one pass, each executor keeps its own slice."""
    d = load(spark, sf_dir, "documents", parallelize=True)
    weights = spark.createDataFrame(
        [(f"src{i}", MIX_THRESHOLDS[i % 3]) for i in range(20)],
        "source string, threshold long",
    )
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("mix"), F.col("doc_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return (
        d.join(F.broadcast(weights), "source")
        .filter(u32 < F.col("threshold"))
        .select("doc_id", "source")
    )


@register(
    "tpch_q7_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(strftime(l.l_shipdate, '%Y') AS BIGINT) AS l_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(6,2)))), 2)
                AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def tpch_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations, adapted to
    fixture columns): the 6-relation join with a disjunctive cross-
    nation predicate, grouped by nation pair and ship year. Scale: all
    four dimensions (supplier, customer, nation x2) broadcast, so the
    ONLY growing exchange is lineitem joining orders on the order key;
    the nation filter cannot be pushed into either fact scan (it spans
    both sides of the disjunction) but the supplier/customer broadcasts
    carry their nation keys, so rows drop at the first two map-side
    joins -- the same early-reduction Catalyst picks for the official
    Q7. Year extraction is a string formatting, not a timezone-
    dependent EXTRACT, to stay oracle-portable."""
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    rev = money("l_extendedprice") * (F.lit(1) - rate("l_discount"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.date_format("l_shipdate", "yyyy").cast("bigint").alias("l_year"),
        )
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q14_promo",
    oracle="""
    SELECT strftime(l.l_shipdate, '%Y-%m') AS ship_month,
           CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO'
                          THEN CAST(l.l_extendedprice AS DECIMAL(14,2))
                               * (1 - CAST(l.l_discount AS DECIMAL(6,2)))
                          ELSE 0 END), 2) AS DOUBLE) AS promo_revenue,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(6,2)))), 2)
                AS DOUBLE) AS total_revenue,
           ROUND(100.0 * CAST(ROUND(SUM(CASE WHEN p.p_type = 'PROMO'
                          THEN CAST(l.l_extendedprice AS DECIMAL(14,2))
                               * (1 - CAST(l.l_discount AS DECIMAL(6,2)))
                          ELSE 0 END), 2) AS DOUBLE)
                 / CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(6,2)))), 2)
                        AS DOUBLE), 4) AS promo_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion revenue share, adapted: the fixture's
    p_type domain is flat labels, so the predicate is equality on
    'PROMO' and the result is broken out monthly instead of one
    global row -- more rows to hash-check). Scale: part broadcasts
    (dimension), so the plan is scan -> map-side join -> one grouped
    aggregation; the conditional revenue uses the same exact-DECIMAL
    sums as every money aggregate here, and the percentage is a single
    IEEE division of the two already-rounded doubles (bit-stable)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    rev = money("l_extendedprice") * (F.lit(1) - rate("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(14,2)")
    )
    promo_d = F.round(F.sum(promo), 2).cast("double")
    total_d = F.round(F.sum(rev), 2).cast("double")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(
            promo_d.alias("promo_revenue"),
            total_d.alias("total_revenue"),
            F.round(F.lit(100.0) * promo_d / total_d, 4).alias("promo_pct"),
        )
        .orderBy("ship_month")
    )


@register(
    "tpch_q8_market_share",
    oracle="""
    SELECT CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) AS o_year,
           CAST(ROUND(SUM(CASE WHEN n1.n_name = 'NATION_1'
                          THEN CAST(l.l_extendedprice AS DECIMAL(14,2))
                               * (1 - CAST(l.l_discount AS DECIMAL(6,2)))
                          ELSE 0 END), 2) AS DOUBLE) AS nation_revenue,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(6,2)))), 2)
                AS DOUBLE) AS total_revenue,
           ROUND(CAST(ROUND(SUM(CASE WHEN n1.n_name = 'NATION_1'
                          THEN CAST(l.l_extendedprice AS DECIMAL(14,2))
                               * (1 - CAST(l.l_discount AS DECIMAL(6,2)))
                          ELSE 0 END), 2) AS DOUBLE)
                 / CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(6,2)))), 2)
                        AS DOUBLE), 6) AS mkt_share
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n2.n_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY 1
    ORDER BY 1
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share inside one region's
    demand): the 7-relation join where one nation role filters the
    CUSTOMER side (via region) and the other labels the SUPPLIER side
    inside a conditional aggregate. Scale: every dimension broadcasts;
    lineitem-orders is again the only shuffled join, and the region
    filter reaches the customer broadcast BEFORE the fact join, so
    non-ASIA demand drops map-side. Share = one IEEE division of the
    two exact-DECIMAL sums."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select("n_nationkey", "n_regionkey")
    cust_asia = (
        c.join(F.broadcast(n2), c.c_nationkey == n2.n_nationkey)
        .join(F.broadcast(r), n2.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    rev = money("l_extendedprice") * (F.lit(1) - rate("l_discount"))
    nat_rev = F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(
        F.lit(0).cast("decimal(14,2)")
    )
    nat_d = F.round(F.sum(nat_rev), 2).cast("double")
    tot_d = F.round(F.sum(rev), 2).cast("double")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_asia), o.o_custkey == F.col("c_custkey"))
        .groupBy(
            F.date_format("o_orderdate", "yyyy").cast("bigint").alias("o_year")
        )
        .agg(
            nat_d.alias("nation_revenue"),
            tot_d.alias("total_revenue"),
            F.round(nat_d / tot_d, 6).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


@register(
    "tpch_q19_disjunctive",
    oracle="""
    SELECT p.p_brand,
           COUNT(*) AS n_items,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(6,2)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    GROUP BY 1
    ORDER BY 1
    """,
)
def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue under an OR-of-ANDs
    predicate spanning both join sides). The optimizer lesson this
    query encodes: the disjunction itself cannot be pushed whole, but
    Catalyst extracts the common-factor conjuncts per side --
    l_quantity BETWEEN 1 AND 30 reaches the fact SCAN as a pushed
    range and the brand/size disjuncts prune the part broadcast --
    so the join sees a fraction of both inputs even though the full
    predicate only resolves after the join. Verified in
    tests/test_scale_plans.py (PushedFilters on l_quantity)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = money("l_extendedprice") * (F.lit(1) - rate("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
        )
        .orderBy("p_brand")
    )


@register(
    "tpch_q2_min_cost",
    oracle="""
    WITH cost AS (
      SELECT l.l_partkey, l.l_suppkey,
             CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cost_cents
      FROM lineitem l GROUP BY 1, 2),
    best AS (
      SELECT l_partkey, l_suppkey, cost_cents,
             ROW_NUMBER() OVER (PARTITION BY l_partkey
                                ORDER BY cost_cents, l_suppkey) AS rn
      FROM cost)
    SELECT p.p_partkey, p.p_brand, s.s_name, s.s_acctbal, b.cost_cents
    FROM best b
    JOIN part p ON p.p_partkey = b.l_partkey
    JOIN supplier s ON s.s_suppkey = b.l_suppkey
    WHERE b.rn = 1 AND p.p_size BETWEEN 10 AND 20
    ORDER BY b.cost_cents, p.p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier per part, adapted: the
    fixture has no partsupp, so per-(part, supplier) cost aggregates
    from lineitem). The signature pattern is the per-group argmin over
    a grouped relation -- one shuffle on l_partkey serves BOTH the
    (part, supplier) rollup and the argmin window, because the window
    key is a prefix of the aggregation key; the dimension joins happen
    AFTER the argmin collapses the relation to one row per part, so
    only winners join (broadcast). Cost is exact integer cents."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_size").between(10, 20))
    s = load(spark, sf_dir, "supplier")
    # Repartition on l_partkey ALONE before the rollup: hash-clustering
    # by the part key satisfies both the (part, supplier) aggregation
    # (same pair -> same partition) and the argmin window's
    # partitioning requirement, so the plan carries ONE exchange where
    # the naive compound-key groupBy pays a second window re-shuffle
    # (asserted in tests/test_scale_plans.py).
    cost = (
        li.repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
                "cost_cents"
            )
        )
    )
    w = Window.partitionBy("l_partkey").orderBy("cost_cents", "l_suppkey")
    best = (
        cost.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .select("p_partkey", "p_brand", "s_name", "s_acctbal", "cost_cents")
        .orderBy("cost_cents", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q22_antijoin",
    oracle="""
    WITH avg_bal AS (
      SELECT SUM(c_acctbal) / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0),
    rich AS (
      SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
      FROM customer c CROSS JOIN avg_bal
      WHERE c.c_acctbal > avg_bal.a),
    inactive AS (
      SELECT r.* FROM rich r
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = r.c_custkey
                          AND o.o_orderstatus = 'P'))
    SELECT n.n_name,
           COUNT(*) AS n_cust,
           CAST(ROUND(SUM(CAST(i.c_acctbal AS DECIMAL(14,2))), 2) AS DOUBLE)
               AS total_bal
    FROM inactive i JOIN nation n ON n.n_nationkey = i.c_nationkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def tpch_q22_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (high-balance customers with no PENDING order -- the no-orders form is empty on the fixture's dense order coverage, so the anti-join target is the status slice): a
    scalar aggregate broadcast into the filter, then an ANTI join
    against the fact. Scale: the anti join is the one growing exchange
    and Spark runs it as a broadcast/shuffled hash anti depending on
    the filtered side's AQE-observed size; the scalar average is a
    1-row broadcast, never a recomputation per row. The average is one
    IEEE division of an exact sum (stable across engines); balances
    aggregate as exact DECIMAL."""
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select("o_custkey")
    )
    n = load(spark, sf_dir, "nation")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum("c_acctbal") / F.count(F.lit(1))).alias("a")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("a")
    )
    inactive = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (
        inactive.join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(14,2)")), 2)
            .cast("double")
            .alias("total_bal"),
        )
        .orderBy("n_name")
    )


@register(
    "latency_ship_percentiles",
    oracle="""
    WITH lat AS (
      SELECT o.o_orderpriority,
             datediff('day', o.o_orderdate, l.l_shipdate) AS days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= o.o_orderdate)
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(quantile_disc(days, 0.5) AS BIGINT) AS p50,
           CAST(quantile_disc(days, 0.9) AS BIGINT) AS p90,
           CAST(quantile_disc(days, 0.99) AS BIGINT) AS p99,
           CAST(MAX(days) AS BIGINT) AS p_max
    FROM lat GROUP BY 1
    """,
)
def latency_ship_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational latency report: exact discrete percentiles of
    order-to-ship days per priority class -- the SLA dashboard query.
    Exact integer day differences make discrete percentiles
    bit-comparable across engines (continuous interpolation would hit
    cross-engine float averaging; discrete selection cannot). Scale:
    the join shuffles once on the order key; percentiles aggregate on
    the tiny priority dimension, and percentile_approx is the
    documented swap-in when per-group cardinality outgrows exact
    selection (agg_approx_percentile shows that contract)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey",
                                             "o_orderdate", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lat = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            "o_orderpriority",
            F.datediff("l_shipdate", "o_orderdate").alias("days"),
        )
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(percentile_approx(days, 0.5, 2147483647) AS BIGINT)").alias("p50"),
        F.expr("CAST(percentile_approx(days, 0.9, 2147483647) AS BIGINT)").alias("p90"),
        F.expr("CAST(percentile_approx(days, 0.99, 2147483647) AS BIGINT)").alias("p99"),
        F.max("days").cast("bigint").alias("p_max"),
    )


@register(
    "market_basket_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM items),
    item_supp AS (
      SELECT l_partkey, COUNT(*) AS supp FROM items GROUP BY 1),
    pairs AS (
      SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
             COUNT(*) AS pair_supp
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 3)
    SELECT p.item_a, p.item_b, p.pair_supp,
           sa.supp AS supp_a, sb.supp AS supp_b,
           ROUND(p.pair_supp * 1.0 / sa.supp, 6) AS confidence,
           ROUND((p.pair_supp * 1.0 * n.n) / (sa.supp * 1.0 * sb.supp), 6)
               AS lift
    FROM pairs p
    JOIN item_supp sa ON sa.l_partkey = p.item_a
    JOIN item_supp sb ON sb.l_partkey = p.item_b
    CROSS JOIN n_orders n
    """,
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules at the pair level (frequent
    itemsets, support >= 3): which parts co-occur in the same order
    more than independence predicts, with confidence and lift -- the
    recommendation/affinity workload. Scale shape: the pair space is
    generated by an equi-join on the basket key (bounded by
    items-per-basket squared, never corpus²; the same per-key
    quadratic bound as the LSH bucket join, with the same skew-guard
    applicability for pathological baskets), supports are map-side-
    combinable counts, and the final scoring joins are on the
    item dimension. Confidence and lift are single IEEE divisions of
    exact integers."""
    items = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = items.agg(
        F.count_distinct("l_orderkey").alias("n")
    )
    item_supp = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("supp"))
    a = items.withColumnsRenamed({"l_partkey": "item_a"})
    b = items.withColumnsRenamed(
        {"l_partkey": "item_b", "l_orderkey": "b_orderkey"}
    )
    pairs = (
        a.join(
            b,
            (a.l_orderkey == b.b_orderkey)
            & (F.col("item_a") < F.col("item_b")),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_supp"))
        .filter(F.col("pair_supp") >= 3)
    )
    sa = item_supp.withColumnsRenamed({"l_partkey": "item_a", "supp": "supp_a"})
    sb = item_supp.withColumnsRenamed({"l_partkey": "item_b", "supp": "supp_b"})
    return (
        pairs.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "item_a",
            "item_b",
            "pair_supp",
            "supp_a",
            "supp_b",
            F.round(F.col("pair_supp") / F.col("supp_a"), 6).alias("confidence"),
            F.round(
                (F.col("pair_supp") * F.lit(1.0) * F.col("n"))
                / (F.col("supp_a") * F.lit(1.0) * F.col("supp_b")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "rfm_segmentation",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS monetary_cents
      FROM orders GROUP BY 1),
    scored AS (
      SELECT o_custkey, frequency, monetary_cents,
             NTILE(5) OVER (ORDER BY last_order, o_custkey) AS r_score,
             NTILE(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
             NTILE(5) OVER (ORDER BY monetary_cents, o_custkey) AS m_score
      FROM rfm)
    SELECT r_score, f_score, m_score,
           COUNT(*) AS n_customers,
           CAST(SUM(monetary_cents) AS BIGINT) AS segment_cents
    FROM scored
    GROUP BY 1, 2, 3
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency / frequency / monetary
    quintiles per customer, rolled up into the 125-cell segment grid
    with population and revenue mass -- the CRM workload that layers
    global NTILE windows over per-key aggregates. Determinism: every
    NTILE ordering carries the customer key as tiebreak (equal scores
    would otherwise land in engine-dependent tiles); money is exact
    integer cents.

    Scale shape: each quintile is one ``_global_rank`` pass (range
    repartition + parallel per-partition windows) with NTILE recovered
    arithmetically from (i, n) via ``_ntile_from_rank`` -- never a
    single-partition global NTILE sort, so the plan holds even when the
    customer dimension itself is billions of rows. The three score
    branches each project only (key, value) and join back on the
    customer key -- ordinary hash joins on the aggregate, all parallel."""
    from metadata_extractors_api_spark.operators.quality import (
        _global_rank,
        _ntile_from_rank,
    )

    o = load(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("monetary_cents"),
    )

    def score(value_col: str, out: str):
        ranked = _global_rank(
            rfm.select("o_custkey", value_col), value_col, "o_custkey"
        )
        return ranked.select(
            "o_custkey",
            _ntile_from_rank(F.col("i"), F.col("n"), 5).alias(out),
        )

    scored = (
        rfm.select("o_custkey", "monetary_cents")
        .join(score("last_order", "r_score"), "o_custkey")
        .join(score("frequency", "f_score"), "o_custkey")
        .join(score("monetary_cents", "m_score"), "o_custkey")
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("monetary_cents").cast("bigint").alias("segment_cents"),
    )


@register(
    "orders_open_backlog",
    oracle="""
    WITH spans AS (
      SELECT o.o_orderkey,
             CAST(o.o_orderdate AS DATE) AS d_open,
             CAST(MAX(l.l_shipdate) AS DATE) AS d_close
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
      HAVING CAST(MAX(l.l_shipdate) AS DATE) >= CAST(o.o_orderdate AS DATE)),
    deltas AS (
      SELECT d_open AS d, 1 AS delta FROM spans
      UNION ALL
      SELECT d_close + INTERVAL 1 DAY, -1 FROM spans),
    daily AS (
      SELECT CAST(d AS DATE) AS d, CAST(SUM(delta) AS BIGINT) AS delta
      FROM deltas GROUP BY 1)
    SELECT strftime(d, '%Y-%m-%d') AS day,
           delta AS net_change,
           CAST(SUM(delta) OVER (ORDER BY d
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open_orders
    FROM daily
    """,
)
def orders_open_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap counting via the delta + prefix-sum trick: how
    many orders are OPEN (placed, not yet fully shipped) on each day.
    The naive form joins every day against every order span (days x
    orders); the scale form converts each span to +1/-1 boundary
    deltas, aggregates deltas per day, and takes one running sum over
    the CALENDAR-sized rollup -- the same transformation that turns
    concurrent-sessions, room-occupancy, and connection-count queries
    from quadratic overlap joins into two shuffles. The running sum is
    a single-partition window over calendar rows, exact integers
    throughout."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    spans = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("d_open"))
        .agg(F.max(F.to_date("l_shipdate")).alias("d_close"))
        .filter(F.col("d_close") >= F.col("d_open"))
    )
    deltas = spans.select(
        F.col("d_open").alias("d"), F.lit(1).alias("delta")
    ).unionByName(
        spans.select(
            F.date_add("d_close", 1).alias("d"), F.lit(-1).alias("delta")
        )
    )
    daily = deltas.groupBy("d").agg(
        F.sum("delta").cast("bigint").alias("net_change")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "net_change",
        F.sum("net_change").over(w).cast("bigint").alias("open_orders"),
    )


@register(
    "part_abc_pareto",
    oracle="""
    WITH rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
      FROM lineitem GROUP BY 1),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t FROM rev),
    ranked AS (
      SELECT l_partkey, cents,
             CAST(SUM(cents) OVER (ORDER BY cents DESC, l_partkey
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
      FROM rev),
    classed AS (
      SELECT l_partkey, cents,
             CASE WHEN run * 100 <= t.t * 80 THEN 'A'
                  WHEN run * 100 <= t.t * 95 THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked CROSS JOIN tot t)
    SELECT abc,
           COUNT(*) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS class_cents
    FROM classed GROUP BY 1 ORDER BY 1
    """,
)
def part_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification: parts ranked by revenue, classified
    A/B/C at the cumulative 80% / 95% boundaries -- the inventory-
    concentration analysis behind every 'top SKUs drive the business'
    decision. The class boundaries compare in exact integers
    (run*100 <= total*80, never a float share), revenue is exact
    cents, and the (cents DESC, partkey) ordering makes the cumulative
    walk engine-independent through ties.

    Scale shape: the descending cumulative revenue comes from
    ``_global_cumsum`` over the NEGATED cents (same trick as its
    sibling ``orders_abc_pareto``) -- range repartition + parallel
    per-partition windows, never a single-partition global sort, so
    the plan holds even when the part dimension is billions of rows;
    the grand total ``tw`` falls out of the same pass (no separate
    rollup + crossJoin)."""
    from metadata_extractors_api_spark.operators.quality import _global_cumsum

    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    ).withColumn("_neg", -F.col("cents"))
    c = _global_cumsum(rev, "_neg", "l_partkey", "cents")
    classed = c.select(
        "cents",
        F.when(F.col("cw") * 100 <= F.col("tw") * 80, "A")
        .when(F.col("cw") * 100 <= F.col("tw") * 95, "B")
        .otherwise("C")
        .alias("abc"),
    )
    return (
        classed.groupBy("abc")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("cents").cast("bigint").alias("class_cents"),
        )
        .orderBy("abc")
    )


@register(
    "orders_priority_mix_shift",
    oracle="""
    WITH monthly AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderpriority,
             COUNT(*) AS n
      FROM orders GROUP BY 1, 2),
    tot AS (
      SELECT month, CAST(SUM(n) AS BIGINT) AS mn FROM monthly GROUP BY 1),
    share AS (
      SELECT m.month, m.o_orderpriority, m.n,
             ROUND(m.n * 1.0 / t.mn, 6) AS share
      FROM monthly m JOIN tot t ON t.month = m.month)
    SELECT month, o_orderpriority, n, share,
           ROUND(share - LAG(share) OVER (PARTITION BY o_orderpriority
                                          ORDER BY month), 6) AS share_delta
    FROM share
    """,
)
def orders_priority_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix-shift monitor: each priority class's monthly share of orders
    and its month-over-month delta -- the composition-drift report
    that separates 'volume grew' from 'the mix changed' in any KPI
    review. Share is count over a per-month total (broadcast-joined,
    one IEEE division); the delta is a lag window over the
    class's own monthly series. Scale: two rollups on
    calendar-dimension keys and one window over months-x-classes
    rows -- nothing fact-sized past the first aggregation."""
    o = load(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        "o_orderpriority",
    )
    monthly = o.groupBy("month", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = monthly.groupBy("month").agg(F.sum("n").cast("bigint").alias("mn"))
    share = monthly.join(F.broadcast(tot), "month").select(
        "month",
        "o_orderpriority",
        "n",
        F.round(F.col("n") * F.lit(1.0) / F.col("mn"), 6).alias("share"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("month")
    return share.withColumn(
        "share_delta", F.round(F.col("share") - F.lag("share").over(w), 6)
    )


@register(
    "tpch_q4_priority",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY 1 ORDER BY 1
    """,
)
def tpch_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking), adapted: the fixture
    has no commit/receipt dates, so "late" is l_shipdate more than 60
    days after the order date. The signature pattern is the correlated
    EXISTS -> LEFT SEMI join with a non-equi residual: one equi shuffle
    on the order key carries the date comparison as the join residual,
    then a 5-group aggregate. The quarter filter is pushed to the
    orders scan; the lineitem side is pruned to two columns."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    hit = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        hit.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q6_forecast",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                          * CAST(l_discount AS DECIMAL(6,2))), 2) AS DOUBLE)
               AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): the pure scan-aggregate
    plan. Every predicate (date range, discount band, quantity cap) is
    a parquet-pushable comparison on a scan column, so at cluster
    scale this is a partition-pruned, row-group-skipped scan feeding a
    partial/final sum with no shuffle of fact rows at all -- the
    cheapest possible 100 TB query, and a pushdown regression canary.
    Revenue is summed in DECIMAL for exact, order-independent totals."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(money("l_extendedprice") * rate("l_discount")), 2)
        .cast("double")
        .alias("revenue")
    )


@register(
    "tpch_q9_profit",
    oracle="""
    SELECT n.n_name,
           CAST(strftime(o.o_orderdate, '%Y') AS BIGINT) AS o_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(6,2)))
                          - CAST(p.p_retailprice AS DECIMAL(14,2))
                            * CAST(0.5 AS DECIMAL(3,2))
                            * CAST(l.l_quantity AS DECIMAL(6,2))), 2)
                AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY 1, 2
    ORDER BY n.n_name, o_year DESC
    """,
)
def tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation and year),
    adapted: no partsupp table, so supply cost is modeled as half the
    part's retail price. Five-way join where every dimension
    (supplier, nation, filtered part) broadcasts and only
    lineitem-orders shuffles on the order key; profit arithmetic runs
    entirely in DECIMAL so the group totals are exact and
    order-independent. The LIKE filter prunes the part build side
    before broadcast."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    o = load(spark, sf_dir, "orders")
    profit = money("l_extendedprice") * (F.lit(1) - rate("l_discount")) - money(
        "p_retailprice"
    ) * F.lit(0.5).cast("decimal(3,2)") * F.col("l_quantity").cast("decimal(6,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
        .orderBy(F.asc("n_name"), F.desc("o_year"))
    )


@register(
    "tpch_q11_stock_value",
    oracle="""
    WITH eu AS (
      SELECT s.s_suppkey
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'),
    val AS (
      SELECT l.l_partkey,
             CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                      * CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS value_cents
      FROM lineitem l
      WHERE l.l_suppkey IN (SELECT s_suppkey FROM eu)
      GROUP BY 1),
    tot AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS t FROM val)
    SELECT v.l_partkey, v.value_cents
    FROM val v CROSS JOIN tot
    WHERE v.value_cents * 1000 > tot.t
    ORDER BY v.value_cents DESC, v.l_partkey
    """,
)
def tpch_q11_stock_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock), adapted: per-part inventory
    value aggregates price*quantity from lineitem for suppliers in one
    region. The signature pattern is the global-scalar threshold: the
    per-part aggregate is computed once, its grand total reduces to a
    single row that broadcasts back as a cross join, and the filter
    compares exact integer cents (value*1000 > total, i.e. >0.1%% of
    total) -- no floating point anywhere, so the threshold cannot
    flake at any scale. At 100 TB the supplier filter is a broadcast
    semi-join and the only fact shuffle is the partkey aggregate.
    Cents*1000 stays under int64 to ~1e15 total cents; past that,
    promote to DECIMAL(38,0)."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey")
    )
    li = load(spark, sf_dir, "lineitem").join(
        F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint") * F.col(
        "l_quantity"
    ).cast("bigint")
    val = li.groupBy("l_partkey").agg(
        F.sum(cents).cast("bigint").alias("value_cents")
    )
    tot = val.agg(F.sum("value_cents").cast("bigint").alias("t"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("value_cents") * 1000 > F.col("t"))
        .select("l_partkey", "value_cents")
        .orderBy(F.desc("value_cents"), F.asc("l_partkey"))
    )


@register(
    "tpch_q12_latemode",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1 ORDER BY 1
    """,
)
def tpch_q12_latemode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority split), adapted: the
    fixture has no ship mode or commit/receipt dates, so the grouping
    key is the return flag and "late" is shipping >60 days after the
    order date. Signature pattern: conditional aggregation (a
    CASE-guarded pair of sums in ONE pass) over an equi-join whose
    residual is a non-equi date comparison. The year filter is pushed
    to the lineitem scan; the join shuffles both sides on the order
    key once."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias(
                "low_line_count"
            ),
        )
        .orderBy("l_returnflag")
    )


@register(
    "tpch_q13_custdist",
    oracle="""
    WITH co AS (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY 1)
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM co GROUP BY 1
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): the two-level
    aggregation. A LEFT OUTER join (customers with zero qualifying
    orders must appear with count 0 -- COUNT of the null-extended key
    gives exactly that) with the filter folded into the JOIN
    CONDITION, not the WHERE clause, then a re-aggregation of counts
    into a histogram. First aggregate shuffles on the customer key;
    the second input is already tiny (distinct counts)."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    co = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        co.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                            * (1 - CAST(l_discount AS DECIMAL(6,2)))), 2)
                  AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY 1),
    m AS (SELECT MAX(total_revenue) AS mr FROM rev)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.supplier_no
    CROSS JOIN m
    WHERE r.total_revenue = m.mr
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the view + scalar-max pattern. The
    quarterly per-supplier revenue aggregate is computed once; its MAX
    reduces to one row that broadcasts back so the filter runs
    distributed (no driver round-trip, ties preserved). Revenue is an
    exact DECIMAL sum rounded once to 2 places on both engines, so
    the double equality against the max is bit-identical by
    construction. One fact shuffle on the supplier key; the supplier
    dim broadcasts."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(money("l_extendedprice") * (F.lit(1) - rate("l_discount"))), 2
            )
            .cast("double")
            .alias("total_revenue")
        )
    )
    m = rev.agg(F.max("total_revenue").alias("mr"))
    s = load(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(m))
        .filter(F.col("total_revenue") == F.col("mr"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship), adapted: the
    part-supplier pairs come from lineitem and the excluded suppliers
    are those with negative balance (no comment column). Signature
    pattern: NOT IN -> broadcast LEFT ANTI join on the fact before the
    join to the filtered part dim (also broadcast after its three
    pushed predicates), then COUNT(DISTINCT) per brand/type/size --
    Spark expands that to a two-phase distinct aggregate, partials
    first, so the shuffle carries distinct pairs, not raw rows."""
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    li = load(spark, sf_dir, "lineitem").join(
        F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
    )


@register(
    "tpch_q17_small_qty",
    oracle="""
    WITH pa AS (
      SELECT l_partkey, SUM(l_quantity) / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY 1)
    SELECT CAST(ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2)))
                           AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < 0.4 * pa.avg_qty
    """,
)
def tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): the correlated
    per-group average, decorrelated the way Catalyst would -- the
    per-part mean quantity is a separate aggregate joined back to the
    fact. The mean relation is part-cardinality (dimension-sized at
    any scale), so it broadcasts; the brand filter prunes the part
    build side before its broadcast. Quantities are integral doubles,
    so SUM/COUNT and the 0.4x threshold are bit-deterministic IEEE on
    both engines; the revenue total itself is an exact DECIMAL sum."""
    li = load(spark, sf_dir, "lineitem")
    pa = li.groupBy("l_partkey").agg(
        (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty")
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            F.broadcast(pa.withColumnRenamed("l_partkey", "pa_partkey")),
            F.col("l_partkey") == F.col("pa_partkey"),
        )
        .filter(F.col("l_quantity") < 0.4 * F.col("avg_qty"))
        .agg(
            F.round(F.sum(money("l_extendedprice")).cast("double") / 7.0, 2)
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register(
    "tpch_q20_promo_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2)
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
      SELECT sh.l_suppkey
      FROM shipped sh JOIN part p ON p.p_partkey = sh.l_partkey
      WHERE p.p_name LIKE 'small%' AND sh.qty > 50)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion), adapted: a supplier
    qualifies if it shipped more than 50 units of any 'small%' part in
    1997 (no partsupp availability to halve). Signature pattern: the
    nested IN -> a year-filtered per-(supplier, part) aggregate,
    semi-joined to the filtered part dim, then a LEFT SEMI from the
    supplier dim to the distinct qualifying suppliers. Quantities are
    integral, so the BIGINT sum and threshold are exact. One fact
    shuffle on the compound key; everything else broadcasts."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty")
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    cand = (
        shipped.join(F.broadcast(p), shipped.l_partkey == p.p_partkey)
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        s.join(cand, s.s_suppkey == cand.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q21_waiting",
    oracle="""
    WITH ol AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'),
    po AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS nsupp,
             COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS nlate,
             MAX(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
      FROM ol GROUP BY 1)
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM po
    JOIN supplier s ON s.s_suppkey = po.late_supp
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE po.nsupp > 1 AND po.nlate = 1 AND n.n_name = 'NATION_3'
    GROUP BY 1
    ORDER BY numwait DESC, s.s_name
    """,
)
def tpch_q21_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted:
    "late" is shipping >60 days after the order date, and the unit
    counted is waiting ORDERS per supplier. The spec's EXISTS +
    NOT-EXISTS self-join pair is rewritten as ONE per-order aggregate
    -- multi-supplier order (nsupp > 1) whose sole late supplier
    (nlate = 1) is this one -- turning two extra fact shuffles into
    none: the rewrite needs only the single orderkey aggregate it
    already pays for. The oracle states the same rewrite, so both
    engines compute identical semantics. The two COUNT(DISTINCT)s are
    computed as a two-level aggregate (dedupe (order, supplier) pairs
    first, then plain counts) rather than multi-distinct in one
    GROUP BY -- that form forces Catalyst into an Expand that
    triples the aggregated rows; two-level measures ~40%% faster and
    map-side-combines both levels."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    ol = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .cast("int")
        .alias("late"),
    )
    per_pair = ol.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("late_any")
    )
    po = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("nsupp"),
        F.sum("late_any").alias("nlate"),
        F.max(F.when(F.col("late_any") == 1, F.col("l_suppkey"))).alias(
            "late_supp"
        ),
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        po.filter((F.col("nsupp") > 1) & (F.col("nlate") == 1))
        .join(F.broadcast(s), F.col("late_supp") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
    )


@register(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(14,2))), 2) AS DOUBLE)
               AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))), 2)
                AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                          * (1 - CAST(l_discount AS DECIMAL(6,2)))), 2)
                AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                          * (1 - CAST(l_discount AS DECIMAL(6,2)))
                          * (1 + CAST(l_tax AS DECIMAL(6,2)))), 2)
                AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE)
                 / COUNT(l_quantity), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE)
                 / COUNT(l_extendedprice), 6) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(6,2))) AS DOUBLE)
                 / COUNT(l_discount), 6) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) — the canonical scan-heavy
    single-table rollup the suite was missing. One pushed date filter,
    one map-side-combinable groupBy on a 6-ish-value key: the shuffle
    carries |groups| x |partial-agg| rows no matter the scale factor,
    which is why Q1 is the canonical 100 TB throughput probe (the scan
    IS the cost). Money stays DECIMAL through the product chains
    (disc_price, charge) per the engine's exactness policy; averages
    are exact-decimal sums over counts in IEEE double, rounded
    identically in both engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    price = money("l_extendedprice")
    disc = F.lit(1).cast("decimal(6,2)") - rate("l_discount")
    tax = F.lit(1).cast("decimal(6,2)") + rate("l_tax")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(money("l_quantity"), "sum_qty"),
            dsum(price, "sum_base_price"),
            dsum(price * disc, "sum_disc_price"),
            dsum(price * disc * tax, "sum_charge"),
            davg(money("l_quantity"), "avg_qty"),
            davg(price, "avg_price"),
            davg(rate("l_discount"), "avg_disc"),
            F.count(F.lit(1)).cast("bigint").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "orders_cohort_ltv",
    oracle="""
    WITH first AS (
      SELECT o_custkey,
             MIN(epoch_us(o_orderdate) // 2592000000000) AS cohort_m
      FROM orders GROUP BY 1),
    rev AS (
      SELECT o.o_custkey, f.cohort_m,
             epoch_us(o.o_orderdate) // 2592000000000 - f.cohort_m AS age_m,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN first f ON f.o_custkey = o.o_custkey),
    cohort_sizes AS (
      SELECT cohort_m, CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM first GROUP BY 1),
    cell AS (
      SELECT cohort_m, age_m, CAST(SUM(cents) AS BIGINT) AS rev_cents
      FROM rev GROUP BY 1, 2),
    cum AS (
      SELECT cohort_m, age_m, rev_cents,
             CAST(SUM(rev_cents) OVER (PARTITION BY cohort_m
                                       ORDER BY age_m) AS BIGINT)
                 AS cum_rev_cents
      FROM cell)
    SELECT CAST(c.cohort_m AS BIGINT) AS cohort_m,
           CAST(c.age_m AS BIGINT) AS age_m,
           s.n_customers, c.rev_cents, c.cum_rev_cents,
           CAST(c.cum_rev_cents // s.n_customers AS BIGINT)
               AS ltv_per_cust_cents
    FROM cum c JOIN cohort_sizes s ON s.cohort_m = c.cohort_m
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers cohorted by first-order
    month (fixed 30-day epoch grain — engine-portable integer month
    arithmetic, the win_retention discipline), each cohort's revenue
    accumulated by customer age in months, and per-customer LTV as
    exact integer cents — the (cohort x age) triangle every
    subscription/repeat-purchase business reads (and the payback-
    period input for acquisition spend).

    Scale shape: one keyed aggregation for first-order months, one
    broadcast-joinable cohort-size rollup, one (cohort, age) cell
    aggregation, and the cumulative sum runs in a window PARTITIONED
    BY COHORT (keyed, parallel — never global). Money stays in exact
    cents; the per-customer division is integer floor."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 2592000000000").alias("m"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    # Measured trade (round-10): checkpointing the customer-grain
    # cohorts (two consumers) benched ~1.1x slower at sf0.1 — barrier
    # cost exceeds one column-pruned fact re-scan here; lineage kept.
    first = o.groupBy("o_custkey").agg(F.min("m").alias("cohort_m"))
    sizes = first.groupBy("cohort_m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )
    rev = o.join(first, "o_custkey").select(
        "cohort_m", (F.col("m") - F.col("cohort_m")).alias("age_m"), "cents"
    )
    cell = rev.groupBy("cohort_m", "age_m").agg(
        F.sum("cents").cast("bigint").alias("rev_cents")
    )
    w = Window.partitionBy("cohort_m").orderBy("age_m")
    cum = cell.withColumn(
        "cum_rev_cents", F.sum("rev_cents").over(w).cast("bigint")
    )
    return cum.join(F.broadcast(sizes), "cohort_m").select(
        F.col("cohort_m").cast("bigint"),
        F.col("age_m").cast("bigint"),
        "n_customers",
        "rev_cents",
        "cum_rev_cents",
        F.expr("cum_rev_cents div n_customers")
        .cast("bigint")
        .alias("ltv_per_cust_cents"),
    )


@register(
    "orders_supplier_hhi",
    oracle="""
    WITH rev AS (
      SELECT s.s_nationkey AS nation, l.l_suppkey AS supp,
             CAST(SUM(CAST(round(l.l_extendedprice) AS BIGINT)) AS BIGINT)
                 AS r
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1, 2),
    tot AS (
      SELECT nation, CAST(SUM(r) AS BIGINT) AS t,
             CAST(SUM(r * r) AS BIGINT) AS sum_sq,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             CAST(MAX(r) AS BIGINT) AS top_r
      FROM rev GROUP BY 1)
    SELECT n.n_name AS nation_name,
           n_suppliers,
           ROUND(sum_sq * 1.0 / (t * 1.0 * t), 6) AS hhi,
           ROUND(top_r * 1.0 / t, 6) AS top_share
    FROM tot JOIN nation n ON n.n_nationkey = tot.nation
    """,
)
def orders_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index of supplier revenue per
    nation (plus the single-supplier top share): the antitrust /
    supply-risk lens the inequality family lacked — Gini and Theil
    measure dispersion, HHI measures CONCENTRATION (sum of squared
    market shares; 1/n at perfect competition, 1.0 at monopoly).

    Exactness: revenue in whole-dollar integers, sum-of-squares and
    totals as exact int64 aggregates (whole dollars keep r^2 sums
    under int64 through sf1; the cents-precision variant would
    down-scale first), HHI as ONE IEEE division of exact integers —
    the lift/confidence discipline. Scale shape: two
    map-side-combinable aggregations (supplier grain, then nation
    grain) and a broadcast join to the 25-row nation dim."""
    li = load(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("nation"), F.col("l_suppkey"))
        .agg(
            F.sum(F.round("l_extendedprice").cast("bigint"))
            .cast("bigint")
            .alias("r")
        )
    )
    tot = rev.groupBy("nation").agg(
        F.sum("r").cast("bigint").alias("t"),
        F.sum(F.col("r") * F.col("r")).cast("bigint").alias("sum_sq"),
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.max("r").cast("bigint").alias("top_r"),
    )
    return tot.join(
        F.broadcast(nation), tot.nation == nation.n_nationkey
    ).select(
        F.col("n_name").alias("nation_name"),
        "n_suppliers",
        F.round(
            F.col("sum_sq") * F.lit(1.0) / (F.col("t") * F.lit(1.0) * F.col("t")),
            6,
        ).alias("hhi"),
        F.round(F.col("top_r") * F.lit(1.0) / F.col("t"), 6).alias("top_share"),
    )
