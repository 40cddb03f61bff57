"""Statistical-inference and corpus-statistics operators: independence
and rank tests, information-theoretic dependency and entropy measures,
power-law fits, and structural audits of graphs and embedding matrices.

These are the hypothesis-test / distribution-shape primitives a data
platform runs between ingestion and training: "did the segment mix
change?" (chi-square), "did the paid cohort shift?" (Mann-Whitney),
"does event type depend on hour?" (mutual information), "is this
corpus natural language?" (entropy, Zipf), "are embedding dimensions
alive?" (per-dimension variance).

Cross-engine exactness discipline (same as the rest of the package):
counts stay integers end to end; every logarithm is quantized
``floor(ln(x) * 1e9)`` to an int64 BEFORE any cross-row summation so
parallel aggregation order can't drift a float sum; final test
statistics are computed once, from exact moments, with the IDENTICAL
double expression tree on the Spark and DuckDB sides (every IEEE
+,-,*,/,sqrt on identical inputs is correctly rounded, so the trees
agree bitwise) and rounded to 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from metadata_extractors_api_spark.catalog import load
from metadata_extractors_api_spark.operators.quality import _global_cumsum
from metadata_extractors_api_spark.registry import register


@register(
    "dq_chi2_independence",
    oracle="""
    WITH obs AS (
      SELECT c_mktsegment AS seg, c_nationkey AS nat,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM customer GROUP BY 1, 2),
    rowt AS (SELECT seg, CAST(SUM(o) AS BIGINT) AS rt FROM obs GROUP BY 1),
    colt AS (SELECT nat, CAST(SUM(o) AS BIGINT) AS ct FROM obs GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(o) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_seg,
             CAST(COUNT(DISTINCT nat) AS BIGINT) AS n_nat
      FROM obs),
    cells AS (
      SELECT o.o, r.rt, c.ct, t.n, t.n_seg, t.n_nat
      FROM obs o JOIN rowt r USING (seg) JOIN colt c USING (nat)
      CROSS JOIN tot t)
    SELECT CAST(MIN(n) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(MIN((n_seg - 1) * (n_nat - 1)) AS BIGINT) AS dof,
           CAST(SUM(CAST(floor(
             (o - CAST(rt AS DOUBLE) * ct / n)
             * (o - CAST(rt AS DOUBLE) * ct / n)
             / (CAST(rt AS DOUBLE) * ct / n) * 1e6) AS BIGINT)) AS BIGINT)
             AS chi2_e6,
           round(sqrt(
             (CAST(SUM(CAST(floor(
               (o - CAST(rt AS DOUBLE) * ct / n)
               * (o - CAST(rt AS DOUBLE) * ct / n)
               / (CAST(rt AS DOUBLE) * ct / n) * 1e6) AS BIGINT)) AS DOUBLE)
              / 1e6)
             / (CAST(MIN(n) AS DOUBLE)
                * least(MIN(n_seg) - 1, MIN(n_nat) - 1))), 6) AS cramers_v
    FROM cells
    """,
)
def dq_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between market segment
    and nation over the customer dimension, plus Cramer's V effect
    size — the categorical-drift gate (is the segment mix the same
    across nations / across two snapshots?) that complements
    dq_histogram_drift's numeric bins.

    Exactness: observed counts are integers; each cell's contribution
    (o - e)^2 / e (e = row*col/n in double) is quantized to an e6
    int64 BEFORE the sum, so the 125-term reduction is
    order-independent and both engines add the same integers. The
    expected-count expression is inlined verbatim in both engines —
    identical IEEE tree, bitwise-identical cells.

    Scale shape: ONE map-side-combinable groupBy over the fact
    (seg x nat cells: |segments| x |nations|, a constant-bounded
    contingency table); margins and totals re-aggregate the CELLS, not
    the data, and every join after the first groupBy is
    broadcast-sized. At 100 TB nothing but the first aggregation
    touches the fact table."""
    cust = load(spark, sf_dir, "customer")
    obs = (
        cust.groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("c_nationkey").alias("nat"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    rowt = obs.groupBy("seg").agg(F.sum("o").cast("bigint").alias("rt"))
    colt = obs.groupBy("nat").agg(F.sum("o").cast("bigint").alias("ct"))
    tot = obs.agg(
        F.sum("o").cast("bigint").alias("n"),
        F.count_distinct("seg").cast("bigint").alias("n_seg"),
        F.count_distinct("nat").cast("bigint").alias("n_nat"),
    )
    cells = (
        obs.join(F.broadcast(rowt), "seg")
        .join(F.broadcast(colt), "nat")
        .crossJoin(F.broadcast(tot))
    )
    cell_e6 = (
        "CAST(floor((o - CAST(rt AS DOUBLE) * ct / n)"
        " * (o - CAST(rt AS DOUBLE) * ct / n)"
        " / (CAST(rt AS DOUBLE) * ct / n) * 1e6) AS BIGINT)"
    )
    return cells.agg(
        F.min("n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.min((F.col("n_seg") - 1) * (F.col("n_nat") - 1))
        .cast("bigint")
        .alias("dof"),
        F.sum(F.expr(cell_e6)).cast("bigint").alias("chi2_e6"),
        F.round(
            F.sqrt(
                (F.sum(F.expr(cell_e6)).cast("double") / F.lit(1e6))
                / (
                    F.min("n").cast("double")
                    * F.least(F.min("n_seg") - 1, F.min("n_nat") - 1)
                )
            ),
            6,
        ).alias("cramers_v"),
    )


@register(
    "dq_mann_whitney",
    oracle="""
    WITH v AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS a
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
    g AS (
      SELECT cents, CAST(SUM(a) AS BIGINT) AS cnt_a,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM v GROUP BY cents),
    c AS (
      SELECT cents, cnt_a, cnt,
             SUM(cnt) OVER (ORDER BY cents) AS cw
      FROM g),
    s AS (
      SELECT CAST(SUM(cnt_a * (2 * (cw - cnt) + cnt + 1)) AS BIGINT) AS ra2,
             CAST(SUM(cnt_a) AS BIGINT) AS n_a,
             CAST(SUM(cnt - cnt_a) AS BIGINT) AS n_b,
             CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_sum
      FROM c)
    SELECT n_a, n_b,
           CAST(ra2 - n_a * (n_a + 1) AS BIGINT) AS u2,
           tie_sum,
           round(
             (CAST(ra2 - n_a * (n_a + 1) AS DOUBLE) / 2
              - CAST(n_a AS DOUBLE) * n_b / 2)
             / sqrt(CAST(n_a AS DOUBLE) * n_b / 12
                    * ((n_a + n_b + 1)
                       - CAST(tie_sum AS DOUBLE)
                         / (CAST(n_a + n_b AS DOUBLE)
                            * (n_a + n_b - 1)))), 6) AS z
    FROM s
    """,
)
def dq_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test between urgent- and low-priority
    order values — the nonparametric location-shift companion to
    dq_ks_two_sample's max-gap statistic (same cohorts, different
    question: KS asks "any distributional difference?", U asks "does
    one cohort stochastically dominate?").

    Exact integer ranks with ties: group by distinct value, prefix-sum
    the group sizes, and give every member of a tie group the DOUBLED
    midrank 2*start + t + 1 (an integer even when the classical
    midrank is a half), so the rank sum ra2 = 2*R_a and the statistic
    u2 = 2*U are exact int64s that hash-match any engine. The z-score
    (with the standard tie-corrected variance) is one double tree over
    five exact moments, identical on both sides, rounded to 6 dp.

    Scale shape: groupBy distinct value (map-side combinable), then
    ``_global_cumsum`` over the value-grouped relation — the two-phase
    range-partitioned prefix sum, so no stage serializes the data
    through one partition (needs its _GLOBAL_WINDOW_ALLOWLIST entry
    like every _global_cumsum user). The final reduction is a single
    map-side-combinable global agg."""
    pooled = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
            (F.col("o_orderpriority") == "1-URGENT")
            .cast("bigint")
            .alias("a"),
        )
    )
    # Distinct-value grain with _global_cumsum's internal offsets/data
    # double execution downstream: checkpointed, the fact scan +
    # groupBy runs once.
    g = pooled.groupBy("cents").agg(
        F.sum("a").cast("bigint").alias("cnt_a"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    ).localCheckpoint()
    c = _global_cumsum(g, "cents", "cents", "cnt")
    s = c.agg(
        F.sum(
            F.col("cnt_a")
            * (2 * (F.col("cw") - F.col("cnt")) + F.col("cnt") + 1)
        )
        .cast("bigint")
        .alias("ra2"),
        F.sum("cnt_a").cast("bigint").alias("n_a"),
        F.sum(F.col("cnt") - F.col("cnt_a")).cast("bigint").alias("n_b"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        )
        .cast("bigint")
        .alias("tie_sum"),
    )
    return s.select(
        "n_a",
        "n_b",
        (F.col("ra2") - F.col("n_a") * (F.col("n_a") + 1))
        .cast("bigint")
        .alias("u2"),
        "tie_sum",
        F.round(
            F.expr(
                "(CAST(ra2 - n_a * (n_a + 1) AS DOUBLE) / 2"
                " - CAST(n_a AS DOUBLE) * n_b / 2)"
                " / sqrt(CAST(n_a AS DOUBLE) * n_b / 12"
                "        * ((n_a + n_b + 1)"
                "           - CAST(tie_sum AS DOUBLE)"
                "             / (CAST(n_a + n_b AS DOUBLE)"
                "                * (n_a + n_b - 1))))"
            ),
            6,
        ).alias("z"),
    )


@register(
    "dq_mutual_information",
    oracle="""
    WITH e AS (
      SELECT event_type AS x, hour(ts) AS y FROM events),
    joint AS (
      SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cxy FROM e GROUP BY 1, 2),
    mx AS (SELECT x, CAST(SUM(cxy) AS BIGINT) AS cx FROM joint GROUP BY 1),
    my AS (SELECT y, CAST(SUM(cxy) AS BIGINT) AS cy FROM joint GROUP BY 1),
    tot AS (SELECT CAST(SUM(cxy) AS BIGINT) AS n FROM joint),
    cells AS (
      SELECT j.cxy, x.cx, y.cy, t.n
      FROM joint j JOIN mx x USING (x) JOIN my y USING (y) CROSS JOIN tot t)
    SELECT CAST(MIN(n) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(cxy * CAST(floor(ln(
             CAST(cxy AS DOUBLE) * n / (CAST(cx AS DOUBLE) * cy))
             * 1e9) AS BIGINT)) AS BIGINT) AS mi_e9_sum,
           round(CAST(SUM(cxy * CAST(floor(ln(
             CAST(cxy AS DOUBLE) * n / (CAST(cx AS DOUBLE) * cy))
             * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 / MIN(n), 6) AS mi_nats
    FROM cells
    """,
)
def dq_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(event_type; hour-of-day) in nats — the
    model-free dependency measure between two categorical columns
    ("does WHAT users do depend on WHEN?"), the screening statistic
    feature stores run to rank candidate features and leakage checks
    run to catch a label sneaking into a timestamp.

    Exactness: every cell's pointwise term ln(p(x,y)/(p(x)p(y))) is
    computed on the exact count ratio (one double tree, inlined
    identically in both engines), quantized to an e9 int64, and
    weighted by the INTEGER joint count before summation — the
    same quantize-then-sum discipline as text_doc_logprob, so the
    reduction order can't drift the statistic.

    Scale shape: one map-side-combinable groupBy over events into a
    |types| x 24 contingency table; marginals re-aggregate the cells;
    all joins after the first aggregation are broadcast-sized."""
    e = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("x"), F.hour("ts").alias("y")
    )
    # |types| x 24 contingency cells with FOUR consumers (mx, my, tot,
    # cells): checkpointed so the events scan + groupBy runs once.
    joint = e.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("cxy")
    ).localCheckpoint()
    mx = joint.groupBy("x").agg(F.sum("cxy").cast("bigint").alias("cx"))
    my = joint.groupBy("y").agg(F.sum("cxy").cast("bigint").alias("cy"))
    tot = joint.agg(F.sum("cxy").cast("bigint").alias("n"))
    cells = (
        joint.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
    )
    term = (
        "cxy * CAST(floor(ln("
        "CAST(cxy AS DOUBLE) * n / (CAST(cx AS DOUBLE) * cy)) * 1e9)"
        " AS BIGINT)"
    )
    return cells.agg(
        F.min("n").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(F.expr(term)).cast("bigint").alias("mi_e9_sum"),
        F.round(
            F.sum(F.expr(term)).cast("double") / F.lit(1e9) / F.min("n"), 6
        ).alias("mi_nats"),
    )


@register(
    "text_entropy_unigram",
    oracle="""
    WITH occ AS (
      SELECT doc_id, unnest(str_split(text, ' ')) AS token
      FROM documents WHERE length(text) > 0),
    tc AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM occ GROUP BY 1, 2),
    d AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(cnt * CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1e9)
                                 AS BIGINT)) AS BIGINT) AS s1_e9
      FROM tc GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_types,
           round(ln(CAST(n_tokens AS DOUBLE))
                 - CAST(s1_e9 AS DOUBLE) / 1e9 / n_tokens, 6) AS entropy,
           round(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr
    FROM d
    """,
)
def text_entropy_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram Shannon entropy (nats) and type-token
    ratio — the lexical-diversity quality signals (near-zero entropy =
    a single token repeated = boilerplate/spam; natural prose sits in
    a narrow band) that corpus filters threshold alongside
    text_repetition_ratio and text_gopher_rules.

    Uses H = ln(n) - (1/n) * sum(c_w * ln(c_w)): the inner sum is
    quantized per TERM (floor(ln(cnt)*1e9), int64) before aggregation
    so cross-row float order can't drift it; the outer expression is
    one identical double tree per doc, rounded to 6 dp. cnt = 1 terms
    contribute exactly 0 in both engines (ln 1 == 0).

    Scale shape: explode + two map-side-combinable groupBys keyed
    (doc, token) then (doc) — the same heavy-aggregation profile as
    text_term_df; per-doc token counts are bounded by document length,
    so no skew tricks are needed."""
    d = load(spark, sf_dir, "documents", parallelize=True).filter(
        F.length("text") > 0
    )
    occ = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    tc = occ.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    per_doc = tc.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(
            F.col("cnt")
            * F.expr("CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1e9) AS BIGINT)")
        )
        .cast("bigint")
        .alias("s1_e9"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_types",
        F.round(
            F.expr(
                "ln(CAST(n_tokens AS DOUBLE))"
                " - CAST(s1_e9 AS DOUBLE) / 1e9 / n_tokens"
            ),
            6,
        ).alias("entropy"),
        F.round(F.expr("CAST(n_types AS DOUBLE) / n_tokens"), 6).alias("ttr"),
    )


ZIPF_TOP_TERMS = 1000  # report-sized head of the frequency spectrum


@register(
    "text_zipf_slope",
    oracle=f"""
    WITH occ AS (
      SELECT unnest(str_split(text, ' ')) AS token FROM documents),
    tc AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM occ GROUP BY token
      ORDER BY cnt DESC, token LIMIT {ZIPF_TOP_TERMS}),
    rk AS (
      SELECT cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rnk
      FROM tc),
    pts AS (
      SELECT CAST(floor(ln(CAST(rnk AS DOUBLE)) * 1e9) AS BIGINT) AS x,
             CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1e9) AS BIGINT) AS y
      FROM rk),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(19,0)) * x) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(CAST(x AS DECIMAL(19,0)) * y) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(CAST(y AS DECIMAL(19,0)) * y) AS DECIMAL(38,0)) AS syy
      FROM pts)
    SELECT n AS n_terms,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
           round((CAST(sy AS DOUBLE)
                  - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) / 1e9, 6) AS intercept_ln,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
    FROM m
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf power-law fit over the corpus frequency spectrum: OLS of
    ln(frequency) on ln(rank) over the top-1000 terms — natural
    language sits near slope -1 with high r2; machine-generated or
    template text bends the curve. The corpus-level companion to the
    per-document entropy signal.

    Exactness: ranks and counts are exact integers; ln() of each is
    quantized to e9 int64 per TERM; the five regression moments
    accumulate in DECIMAL(38,0) (x^2 ~ 5e19 overflows int64), and
    slope/intercept/r2 are one identical double tree over the exact
    moments, rounded to 6 dp.

    Scale shape: the vocabulary aggregation is map-side combinable;
    the top-1000 head is a TakeOrdered (no global sort materializes
    the vocab), and the rank window runs over the LIMIT-bounded
    1000-row report — pinned in _GLOBAL_WINDOW_ALLOWLIST like
    text_bpe_pair_census's top-20 rank."""
    d = load(spark, sf_dir, "documents", parallelize=True)
    tc = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(ZIPF_TOP_TERMS)
    )
    rk = tc.withColumn(
        "rnk", F.row_number().over(Window.orderBy(F.desc("cnt"), "token"))
    )
    pts = rk.select(
        F.expr("CAST(floor(ln(CAST(rnk AS DOUBLE)) * 1e9) AS BIGINT)").alias(
            "x"
        ),
        F.expr("CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1e9) AS BIGINT)").alias(
            "y"
        ),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("sxy"),
        F.sum(F.col("y").cast("decimal(19,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("syy"),
    )
    num = (
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    den_x = (
        "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    )
    den_y = (
        "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    return m.select(
        F.col("n").alias("n_terms"),
        F.round(F.expr(f"{num} / {den_x}"), 6).alias("slope"),
        F.round(
            F.expr(
                f"(CAST(sy AS DOUBLE) - {num} / {den_x} * CAST(sx AS DOUBLE))"
                " / CAST(n AS DOUBLE) / 1e9"
            ),
            6,
        ).alias("intercept_ln"),
        F.round(F.expr(f"{num} * {num} / ({den_x} * {den_y})"), 6).alias(
            "r2"
        ),
    )


@register(
    "graph_degree_stats",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT o.o_custkey AS src, l.l_suppkey AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    deg AS (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src)
    SELECT CAST(length(bin(CAST(deg AS INT))) AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN(deg) AS BIGINT) AS min_deg,
           CAST(MAX(deg) AS BIGINT) AS max_deg,
           CAST(SUM(deg) AS BIGINT) AS sum_deg
    FROM deg GROUP BY 1
    """,
)
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the customer->supplier trade graph in
    power-of-two buckets — the first structural audit run on any graph
    before iterative algorithms (pagerank, components): a heavy-tailed
    histogram warns that edge joins need skew handling, a missing tail
    says broadcast is safe.

    Bucketing is exact integer bit-length (length of the binary
    representation: deg 1 -> bucket 1, 2-3 -> 2, 4-7 -> 3, ...) — no
    float log2 at bucket boundaries, so both engines bin identically.

    Scale shape: edge dedup is one shuffle on (src, dst); degree is a
    map-side-combinable groupBy on src; the histogram re-aggregates
    the per-node relation by a computed constant-range key. The join
    itself keys on orderkey — the co-partitioned fact-to-fact join
    every TPC-H plan already pays."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    return deg.groupBy(
        F.expr("CAST(length(bin(CAST(deg AS INT))) AS INT)").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.min("deg").cast("bigint").alias("min_deg"),
        F.max("deg").cast("bigint").alias("max_deg"),
        F.sum("deg").cast("bigint").alias("sum_deg"),
    )


@register(
    "embedding_dim_variance_audit",
    oracle="""
    WITH flat AS (
      SELECT unnest(range(1, len(embedding) + 1)) AS dim, embedding
      FROM embeddings),
    q AS (
      SELECT CAST(dim AS INT) AS dim,
             CAST(floor(CAST(embedding[dim] AS DOUBLE) * 1e6) AS BIGINT) AS vq
      FROM flat),
    m AS (
      SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(vq AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
             CAST(SUM(CAST(vq AS DECIMAL(19,0)) * vq) AS DECIMAL(38,0)) AS ss
      FROM q GROUP BY dim)
    SELECT dim, n,
           round(CAST(s AS DOUBLE) / n / 1e6, 6) AS mean,
           round((CAST(ss AS DOUBLE)
                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                 / n / 1e12, 6) AS variance,
           (round((CAST(ss AS DOUBLE)
                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                  / n / 1e12, 6) < 1e-6) AS is_dead
    FROM m
    """,
)
def embedding_dim_variance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/variance over the embedding matrix with a
    dead-dimension flag — the health check run before ANN indexing and
    PCA (a collapsed dimension wastes index bits and breaks whitening;
    a huge-variance one dominates L2). Complements embedding_norm_audit
    (per-ROW norms) with the per-COLUMN view.

    Exactness: each float32 component widens to double exactly and is
    quantized floor(v*1e6) to int64 BEFORE cross-row aggregation;
    moments accumulate in DECIMAL(38,0) (headroom past int64 at corpus
    scale); mean/variance are one identical double tree, 6 dp.

    Scale shape: posexplode fans N rows into N*64; the groupBy on dim
    is map-side combinable into exactly 64 groups — the aggregate
    output is dimension-sized, never data-sized. At 100 TB this is the
    textbook partial-agg profile; no skew (dims are uniform by
    construction)."""
    e = load(spark, sf_dir, "embeddings", parallelize=True)
    q = e.select(
        F.posexplode("embedding").alias("pos", "v")
    ).select(
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.expr("CAST(floor(CAST(v AS DOUBLE) * 1e6) AS BIGINT)").alias("vq"),
    )
    m = q.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("vq").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("s"),
        F.sum(F.col("vq").cast("decimal(19,0)") * F.col("vq"))
        .cast("decimal(38,0)")
        .alias("ss"),
    )
    var_expr = (
        "(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)"
        " / n / 1e12"
    )
    return m.select(
        "dim",
        "n",
        F.round(F.expr("CAST(s AS DOUBLE) / n / 1e6"), 6).alias("mean"),
        F.round(F.expr(var_expr), 6).alias("variance"),
        (F.round(F.expr(var_expr), 6) < 1e-6).alias("is_dead"),
    )


#: Vocabulary-size checkpoints reported by the coverage curve.
VOCAB_COVERAGE_KS = (10, 100, 1000)


@register(
    "text_vocab_coverage_curve",
    oracle=f"""
    WITH occ AS (
      SELECT unnest(str_split(text, ' ')) AS token FROM documents),
    tc AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM occ GROUP BY token),
    c AS (
      SELECT cnt,
             SUM(cnt) OVER (ORDER BY cnt DESC, token) AS cum_tokens,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS i,
             SUM(cnt) OVER () AS total_tokens,
             COUNT(*) OVER () AS vocab_n
      FROM tc)
    SELECT CAST(i AS BIGINT) AS rank_k,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           CAST(total_tokens AS BIGINT) AS total_tokens,
           CAST(vocab_n AS BIGINT) AS vocab_n,
           round(CAST(cum_tokens AS DOUBLE) / total_tokens, 6) AS coverage
    FROM c
    WHERE i IN ({", ".join(str(k) for k in VOCAB_COVERAGE_KS)})
       OR i = vocab_n
    """,
)
def text_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction of the corpus's token
    mass is covered by the top-10 / top-100 / top-1000 most frequent
    terms (plus the full-vocabulary row) — THE table a tokenizer
    budget is designed from ("how big must the vocab be before OOV
    mass is negligible?"), and the corpus-concentration companion to
    text_zipf_slope's parametric fit.

    Scale shape: the frequency-ranked cumulative sum runs as ONE
    two-phase ``_global_cumsum`` with dq_ks_two_sample's encoded-weight
    trick (w = cnt * 2^31 + 1: the inclusive prefix decodes as
    cum_tokens = cw div 2^31 and rank i = cw mod 2^31), so rank and
    cumulative mass come out of a single range-partitioned prefix sum
    — no single-partition window over the vocabulary (allowlisted
    offsets branch only). The encode is exact while total tokens
    < 2^32 and vocab < 2^31; the assert_true guard folded into the
    kept column refuses loudly past that, where the one-line split
    into two prefix sums applies (same migration note as the KS
    statistic).

    Ranked DESCENDING by frequency via the negated-count sort key
    (the prefix-sum primitive orders ascending)."""
    d = load(spark, sf_dir, "documents", parallelize=True)
    # Vocab-grain census; _global_cumsum's offsets branch re-executes
    # its input, so checkpointed the corpus explode runs once.
    tc = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint()
    )
    big = F.lit(1 << 31).cast("bigint")
    enc = tc.select(
        (-F.col("cnt")).alias("nc"),
        "token",
        (F.col("cnt") * big + 1).alias("w"),
    )
    c = _global_cumsum(enc, "nc", "token", "w")
    ks = ", ".join(str(k) for k in VOCAB_COVERAGE_KS)
    dec = c.select(
        F.expr(f"cw div {1 << 31}").alias("cum_tokens"),
        F.expr(f"cw % {1 << 31}").alias("i"),
        F.expr(f"tw div {1 << 31}").alias("total_tokens"),
        F.expr(f"tw % {1 << 31}").alias("vocab_n"),
    ).filter(F.expr(f"i IN ({ks}) OR i = vocab_n"))
    guard = F.assert_true(
        F.col("total_tokens") < F.lit(1 << 32).cast("bigint"),
        F.lit(
            "text_vocab_coverage_curve: total tokens >= 2^32 — the packed "
            "prefix-sum encoding wraps; split into two prefix sums"
        ),
    )
    return dec.select(
        F.col("i").cast("bigint").alias("rank_k"),
        F.when(guard.isNull(), F.col("cum_tokens"))
        .cast("bigint")
        .alias("cum_tokens"),
        F.col("total_tokens").cast("bigint").alias("total_tokens"),
        F.col("vocab_n").cast("bigint").alias("vocab_n"),
        F.round(
            F.expr("CAST(cum_tokens AS DOUBLE) / total_tokens"), 6
        ).alias("coverage"),
    )


@register(
    "text_bigram_cond_entropy",
    oracle="""
    WITH toks AS (
      SELECT doc_id, str_split(text, ' ') AS tk FROM documents),
    bg AS (
      SELECT unnest(list_transform(range(1, len(tk)),
                                   i -> tk[i] || ' ' || tk[i+1])) AS bigram
      FROM toks WHERE len(tk) >= 2),
    bc AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY 1),
    uc AS (
      SELECT str_split(bigram, ' ')[1] AS w1,
             CAST(SUM(c) AS BIGINT) AS n1,
             CAST(COUNT(*) AS BIGINT) AS n_successors
      FROM bc GROUP BY 1),
    terms AS (
      SELECT bc.c,
             CAST(floor(ln(CAST(bc.c AS DOUBLE) / uc.n1) * 1e9) AS BIGINT)
               AS lnq
      FROM bc JOIN uc ON str_split(bc.bigram, ' ')[1] = uc.w1)
    SELECT CAST(SUM(c) AS BIGINT) AS n_bigrams,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM uc) AS n_contexts,
           CAST(-SUM(c * lnq) AS BIGINT) AS s_e9,
           round(CAST(-SUM(c * lnq) AS DOUBLE) / 1e9 / SUM(c), 6) AS h_cond
    FROM terms
    """,
)
def text_bigram_cond_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram conditional entropy H(W2 | W1) in nats — the
    entropy RATE of the corpus under its own bigram model, the
    single-number predictability measure ("how compressible / how
    templated is this corpus?") that complements the per-document
    unigram entropy: natural text sits well above machine-generated
    boilerplate, whose next-token distribution is near-deterministic.

    H(W2|W1) = -sum over bigrams of (c/N) * ln(c / n1), with c the
    bigram count and n1 its context's total continuations. Same
    quantize-then-sum discipline as text_doc_logprob: each ln of an
    exact count ratio is floored to an e9 int64 and weighted by the
    INTEGER bigram count before any cross-row sum.

    Scale shape: two map-side-combinable aggregations (bigram counts,
    then context totals re-aggregating the BIGRAM relation, not the
    corpus), one vocabulary-keyed join, one global reduction. The
    joins key on n-gram hashes — the LM-building profile
    text_doc_logprob already established, minus its per-doc scoring
    pass."""
    d = load(spark, sf_dir, "documents", parallelize=True)
    toked = d.select(F.split("text", " ").alias("tk")).filter(
        F.size("tk") >= 2
    )
    bg = toked.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(tk) - 1),"
                " i -> concat(tk[i-1], ' ', tk[i]))"
            )
        ).alias("bigram")
    )
    # Bigram census (histogram-sized) feeds uc AND terms; uc feeds
    # terms AND the context count — checkpointed, the corpus bigram
    # explode runs once instead of three times.
    bc = (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()
    )
    uc = (
        bc.groupBy(F.split(F.col("bigram"), " ").getItem(0).alias("w1"))
        .agg(
            F.sum("c").cast("bigint").alias("n1"),
            F.count(F.lit(1)).cast("bigint").alias("n_successors"),
        )
        .localCheckpoint()
    )
    terms = bc.join(
        uc, F.split(bc.bigram, " ").getItem(0) == uc.w1
    ).select(
        "c",
        F.expr(
            "CAST(floor(ln(CAST(c AS DOUBLE) / n1) * 1e9) AS BIGINT)"
        ).alias("lnq"),
    )
    n_contexts = uc.agg(F.count(F.lit(1)).cast("bigint").alias("n_contexts"))
    return (
        terms.agg(
            F.sum("c").cast("bigint").alias("n_bigrams"),
            (-F.sum(F.col("c") * F.col("lnq"))).cast("bigint").alias("s_e9"),
        )
        .crossJoin(F.broadcast(n_contexts))
        .select(
            "n_bigrams",
            "n_contexts",
            "s_e9",
            F.round(
                F.expr("CAST(s_e9 AS DOUBLE) / 1e9 / n_bigrams"), 6
            ).alias("h_cond"),
        )
    )


@register(
    "dq_theil_index",
    oracle="""
    WITH cust AS (
      SELECT o.o_custkey,
             CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS x,
             MIN(c.c_nationkey) AS nation
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY o.o_custkey),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
      FROM cust),
    rowq AS (
      SELECT c.x,
             CAST(floor(ln(CAST(c.x AS DOUBLE) * t.n / t.s) * 1e9)
                  AS BIGINT) AS lnq
      FROM cust c CROSS JOIN tot t WHERE c.x > 0),
    total_t AS (
      SELECT CAST(SUM(CAST(x AS DECIMAL(19,0)) * lnq) AS DECIMAL(38,0)) AS st
      FROM rowq),
    grp AS (
      SELECT nation, CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(x) AS BIGINT) AS sg
      FROM cust GROUP BY nation),
    grpq AS (
      SELECT CAST(SUM(CAST(sg AS DECIMAL(19,0))
               * CAST(floor(ln((CAST(sg AS DOUBLE) * t.n)
                               / (CAST(t.s AS DOUBLE) * ng)) * 1e9)
                      AS BIGINT)) AS DECIMAL(38,0)) AS sb
      FROM grp CROSS JOIN tot t WHERE sg > 0)
    SELECT t.n, t.s AS total_cents,
           round(CAST(tt.st AS DOUBLE) / 1e9 / t.s, 6) AS theil_total,
           round(CAST(gq.sb AS DOUBLE) / 1e9 / t.s, 6) AS theil_between,
           round(CAST(tt.st AS DOUBLE) / 1e9 / t.s
                 - CAST(gq.sb AS DOUBLE) / 1e9 / t.s, 6) AS theil_within
    FROM tot t CROSS JOIN total_t tt CROSS JOIN grpq gq
    """,
)
def dq_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of customer lifetime revenue, DECOMPOSED
    into between-nation and within-nation components — the property
    Gini famously lacks (revenue_gini gives one number; Theil tells you
    whether inequality lives across markets or inside them, which is
    what a mix-rebalancing decision needs). T = (1/N) sum (x/mu)
    ln(x/mu); T_between substitutes each nation's mean; T_within is the
    exact remainder.

    Same quantization discipline as every log statistic here: each ln
    of an exact count/sum ratio is floored to e9 int64 per ROW (or per
    group for the between term), weighted by the exact integer revenue,
    summed in DECIMAL(38,0) (x * lnq overflows int64 at warehouse
    scale), and divided once at the end with the identical double tree.

    Scale shape: one fact groupBy to customer grain (+ broadcast
    dimension join), one 1-row total broadcast back, one
    map-side-combinable reduction; the nation decomposition
    re-aggregates the CUSTOMER relation. No windows, no pair joins."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    # cust (customer-grain) has FOUR consumers (tot, rowq, grp, the
    # final row) and tot has three; without the checkpoints the final
    # plan re-ran the fact scan + broadcast join + groupBy once per
    # consumer (10 parquet scans / 40 Exchange measured).
    cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("x"),
            F.min("c_nationkey").alias("nation"),
        )
        .localCheckpoint()
    )
    tot = cust.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    ).localCheckpoint()
    rowq = (
        cust.crossJoin(F.broadcast(tot))
        .filter(F.col("x") > 0)
        .select(
            "x",
            F.expr(
                "CAST(floor(ln(CAST(x AS DOUBLE) * n / s) * 1e9) AS BIGINT)"
            ).alias("lnq"),
        )
    )
    total_t = rowq.agg(
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("lnq"))
        .cast("decimal(38,0)")
        .alias("st")
    )
    grp = cust.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum("x").cast("bigint").alias("sg"),
    )
    grpq = (
        grp.crossJoin(F.broadcast(tot))
        .filter(F.col("sg") > 0)
        .agg(
            F.sum(
                F.col("sg").cast("decimal(19,0)")
                * F.expr(
                    "CAST(floor(ln((CAST(sg AS DOUBLE) * n)"
                    " / (CAST(s AS DOUBLE) * ng)) * 1e9) AS BIGINT)"
                )
            )
            .cast("decimal(38,0)")
            .alias("sb")
        )
    )
    return (
        tot.crossJoin(F.broadcast(total_t))
        .crossJoin(F.broadcast(grpq))
        .select(
            "n",
            F.col("s").alias("total_cents"),
            F.round(F.expr("CAST(st AS DOUBLE) / 1e9 / s"), 6).alias(
                "theil_total"
            ),
            F.round(F.expr("CAST(sb AS DOUBLE) / 1e9 / s"), 6).alias(
                "theil_between"
            ),
            F.round(
                F.expr(
                    "CAST(st AS DOUBLE) / 1e9 / s"
                    " - CAST(sb AS DOUBLE) / 1e9 / s"
                ),
                6,
            ).alias("theil_within"),
        )
    )


#: Right-censoring horizon for the Kaplan-Meier estimator: customers
#: whose last order falls within this many days of the dataset's end
#: are censored (their true lifetime extends past observation).
KM_CENSOR_DAYS = 30


@register(
    "orders_survival_km",
    oracle=f"""
    WITH days AS (
      SELECT o_custkey,
             epoch_us(o_orderdate) // 86400000000 AS d
      FROM orders),
    life AS (
      SELECT o_custkey, MAX(d) - MIN(d) AS dur, MAX(d) AS last_d
      FROM days GROUP BY o_custkey),
    horizon AS (SELECT MAX(d) AS max_d FROM days),
    obs AS (
      SELECT l.dur,
             CASE WHEN l.last_d > h.max_d - {KM_CENSOR_DAYS}
                  THEN 0 ELSE 1 END AS event
      FROM life l CROSS JOIN horizon h),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM obs),
    grp AS (
      SELECT dur, CAST(SUM(event) AS BIGINT) AS d_events,
             CAST(COUNT(*) - SUM(event) AS BIGINT) AS c_censored,
             CAST(COUNT(*) AS BIGINT) AS leaving
      FROM obs GROUP BY dur),
    risk AS (
      SELECT g.dur, g.d_events, g.c_censored,
             t.n - COALESCE(SUM(g.leaving) OVER (
               ORDER BY g.dur ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS n_at_risk
      FROM grp g CROSS JOIN tot t),
    terms AS (
      SELECT dur, d_events, c_censored, CAST(n_at_risk AS BIGINT)
               AS n_at_risk,
             CASE WHEN d_events > 0 AND d_events < n_at_risk
                  THEN CAST(floor(ln(CAST(n_at_risk - d_events AS DOUBLE)
                                     / n_at_risk) * 1e9) AS BIGINT)
                  WHEN d_events = 0 THEN CAST(0 AS BIGINT)
                  END AS lnterm
      FROM risk)
    SELECT CAST(dur AS BIGINT) AS duration_days, n_at_risk, d_events,
           c_censored,
           CASE WHEN SUM(CASE WHEN lnterm IS NULL THEN 1 ELSE 0 END)
                     OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) > 0
                THEN NULL
                ELSE CAST(SUM(lnterm) OVER (ORDER BY dur
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) END AS ln_surv_e9
    FROM terms WHERE d_events > 0
    """,
)
def orders_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimator over customer engagement
    lifetimes (days between first and last order) WITH right
    censoring: customers still ordering near the dataset's end are
    censored, not counted as churned — the estimator every retention
    claim should be using instead of naive lifetime histograms
    (orders_life_table is the uncensored actuarial cousin). Emitted
    per event time: the risk set, deaths, censored count, and the
    LOG survival curve ln S(t) = sum ln(1 - d_u/n_u) as an exact
    e9-quantized integer — the product-limit form stays in log space
    because per-term quantize-then-sum is order-free and exact, while
    exp() is not cross-libm bit-stable (consumers exponentiate).

    Scale shape: one fact groupBy to customer grain, one groupBy to
    the DURATION grain (calendar-day-bounded — the windows below run
    over that bounded relation, allowlisted like orders_life_table's),
    risk sets and the cumulative log-curve are prefix sums over it.
    A d == n_at_risk group is ln(0): S hits exactly 0 there, so
    ln_surv_e9 is NULL from that event time forward (a window SUM that
    merely skipped the NULL term would emit a misleading partial
    curve); the CASE is identical in both engines."""
    days = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
        .alias("d"),
    )
    # Known, measured trade (round-10 optimization pass): checkpointing
    # the customer-grain lifetimes (4 fact scans -> 1; horizon is
    # derivable as max over per-customer maxes) benched consistently
    # SLOWER at sf0.1 (0.65-1.65 s lineage vs 0.85-2.74 s checkpointed)
    # — the materialization barrier costs more than column-pruned fact
    # re-scans at this scale. On remote storage the checkpoint wins;
    # it is a two-line change.
    life = days.groupBy("o_custkey").agg(
        (F.max("d") - F.min("d")).alias("dur"),
        F.max("d").alias("last_d"),
    )
    horizon = days.agg(F.max("d").alias("max_d"))
    obs = life.crossJoin(F.broadcast(horizon)).select(
        "dur",
        F.when(
            F.col("last_d") > F.col("max_d") - KM_CENSOR_DAYS, 0
        )
        .otherwise(1)
        .alias("event"),
    )
    tot = obs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    grp = obs.groupBy("dur").agg(
        F.sum("event").cast("bigint").alias("d_events"),
        (F.count(F.lit(1)) - F.sum("event"))
        .cast("bigint")
        .alias("c_censored"),
        F.count(F.lit(1)).cast("bigint").alias("leaving"),
    )
    w_prev = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = grp.crossJoin(F.broadcast(tot)).withColumn(
        "n_at_risk",
        (
            F.col("n")
            - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0))
        ).cast("bigint"),
    )
    terms = risk.withColumn(
        "lnterm",
        F.expr(
            "CASE WHEN d_events > 0 AND d_events < n_at_risk"
            " THEN CAST(floor(ln(CAST(n_at_risk - d_events AS DOUBLE)"
            " / n_at_risk) * 1e9) AS BIGINT)"
            " WHEN d_events = 0 THEN CAST(0 AS BIGINT) END"
        ),
    )
    w_run = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # Once a group absorbs the whole risk set (d == n), S(t) is exactly
    # 0 and ln S is undefined from there on: NULL from that event time
    # FORWARD, not just at it (window SUM would silently skip the NULL
    # term and emit a misleading partial curve).
    hit_zero = F.sum(
        F.when(F.col("lnterm").isNull(), 1).otherwise(0)
    ).over(w_run)
    return (
        terms.withColumn(
            "ln_surv_e9",
            F.when(
                hit_zero > 0, F.lit(None).cast("bigint")
            ).otherwise(F.sum("lnterm").over(w_run).cast("bigint")),
        )
        .filter(F.col("d_events") > 0)
        .select(
            F.col("dur").cast("bigint").alias("duration_days"),
            "n_at_risk",
            "d_events",
            "c_censored",
            "ln_surv_e9",
        )
    )


#: PSI cohort bins (fixed-width over order value, overflow in the top
#: bin) and the industry drift-alert threshold.
PSI_BIN_CENTS = 5_000_000
PSI_BINS = 10
PSI_ALERT = 0.2


@register(
    "dq_psi_drift",
    oracle=f"""
    WITH v AS (
      SELECT least({PSI_BINS - 1},
                   CAST(round(o_totalprice * 100) AS BIGINT)
                     // {PSI_BIN_CENTS}) AS bin,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS a
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
    g AS (
      SELECT bin, CAST(SUM(a) + 1 AS BIGINT) AS ca,
             CAST(COUNT(*) - SUM(a) + 1 AS BIGINT) AS cb
      FROM v GROUP BY bin),
    tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
             CAST(COUNT(*) AS BIGINT) AS n_bins
      FROM g),
    terms AS (
      SELECT CAST(SUM(CAST(g.ca * t.nb - g.cb * t.na AS DECIMAL(19,0))
               * CAST(floor(ln(CAST(g.ca AS DOUBLE) * t.nb
                               / (CAST(g.cb AS DOUBLE) * t.na)) * 1e9)
                      AS BIGINT)) AS DECIMAL(38,0)) AS s,
             CAST(MIN(t.na) AS BIGINT) AS na,
             CAST(MIN(t.nb) AS BIGINT) AS nb,
             CAST(MIN(t.n_bins) AS BIGINT) AS n_bins
      FROM g CROSS JOIN tot t)
    SELECT na - n_bins AS n_a, nb - n_bins AS n_b, n_bins,
           round(CAST(s AS DOUBLE) / 1e9
                 / (CAST(na AS DOUBLE) * nb), 6) AS psi,
           (round(CAST(s AS DOUBLE) / 1e9
                  / (CAST(na AS DOUBLE) * nb), 6) > {PSI_ALERT}) AS drifted
    FROM terms
    """,
)
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the urgent and low-priority
    order-value distributions — THE model-monitoring drift metric
    (alert at PSI > 0.2), completing the drift toolkit's third lens on
    the same cohort pair: dq_histogram_drift (per-bin L1-style flags),
    dq_ks_two_sample (max ECDF gap), dq_mann_whitney (rank shift), and
    now the information-theoretic aggregate PSI = sum (p_a - p_b)
    ln(p_a / p_b).

    Exactness: fixed-width bins with +1 Laplace smoothing on BOTH
    cohorts (the standard zero-bin guard, applied identically in both
    engines); each bin's ln of the exact smoothed-count cross-ratio is
    e9-quantized and weighted by the exact integer (ca*nb - cb*na), so
    the only float ops are one identical ln tree per bin and one final
    division. Sums carry DECIMAL(38,0) headroom.

    Scale shape: one map-side-combinable groupBy into <= 10 bins; all
    downstream relations are bin-sized."""
    pooled = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(
            F.least(
                F.lit(PSI_BINS - 1),
                F.expr(
                    "CAST(round(o_totalprice * 100) AS BIGINT)"
                    f" div {PSI_BIN_CENTS}"
                ),
            ).alias("bin"),
            (F.col("o_orderpriority") == "1-URGENT")
            .cast("bigint")
            .alias("a"),
        )
    )
    g = pooled.groupBy("bin").agg(
        (F.sum("a") + 1).cast("bigint").alias("ca"),
        (F.count(F.lit(1)) - F.sum("a") + 1).cast("bigint").alias("cb"),
    )
    tot = g.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
    )
    terms = g.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.expr("CAST(ca * nb - cb * na AS DECIMAL(19,0))")
            * F.expr(
                "CAST(floor(ln(CAST(ca AS DOUBLE) * nb"
                " / (CAST(cb AS DOUBLE) * na)) * 1e9) AS BIGINT)"
            )
        )
        .cast("decimal(38,0)")
        .alias("s"),
        F.min("na").cast("bigint").alias("na"),
        F.min("nb").cast("bigint").alias("nb"),
        F.min("n_bins").cast("bigint").alias("n_bins"),
    )
    psi_expr = "CAST(s AS DOUBLE) / 1e9 / (CAST(na AS DOUBLE) * nb)"
    return terms.select(
        (F.col("na") - F.col("n_bins")).alias("n_a"),
        (F.col("nb") - F.col("n_bins")).alias("n_b"),
        "n_bins",
        F.round(F.expr(psi_expr), 6).alias("psi"),
        (F.round(F.expr(psi_expr), 6) > PSI_ALERT).alias("drifted"),
    )

#: Holt double-exponential-smoothing parameters (e6-quantized) and the
#: pinned year spine (the fixture's full order history; COALESCE makes
#: a missing year exact-zero revenue, so the recursion is well-defined
#: at every SF).
HOLT_ALPHA_E6 = 500_000  # alpha = 0.5
HOLT_BETA_E6 = 300_000   # beta  = 0.3
HOLT_YEARS = (1995, 1996, 1997, 1998, 1999, 2000, 2001)


def _holt_l_expr(yr: int) -> str:
    """The exact-integer level update, shared verbatim by both engines:
    l' = floor((a*y_yr + (1e6-a)*(l+b)) / 1e6)."""
    a = HOLT_ALPHA_E6
    return (
        f"({a} * y{yr} + {1_000_000 - a} * (l + b)) // 1000000"
    )


def _holt_oracle() -> str:
    """Generated unrolled Holt chain: each CTE carries (l, b) forward
    under stable names; the trend update inlines the level expression
    twice (identical integer ops, so no drift)."""
    B = HOLT_BETA_E6
    yr_cols = ", ".join(
        f"(SELECT COALESCE(SUM(CAST(round(o_totalprice * 100) AS BIGINT)), 0)"
        f" FROM orders WHERE year(o_orderdate) = {yr}) AS y{yr}"
        for yr in HOLT_YEARS
    )
    y1, y2 = HOLT_YEARS[0], HOLT_YEARS[1]
    ctes = [
        f"y AS MATERIALIZED (SELECT {yr_cols})",
        f"s{y2} AS (SELECT y.*, CAST(y{y2} AS BIGINT) AS l,"
        f" CAST(y{y2} - y{y1} AS BIGINT) AS b FROM y)",
    ]
    for yr in HOLT_YEARS[2:]:
        le = _holt_l_expr(yr)
        ctes.append(
            f"s{yr} AS (SELECT * REPLACE ("
            f"CAST({le} AS BIGINT) AS l, "
            f"CAST(({B} * (({le}) - l) + {1_000_000 - B} * b) // 1000000"
            f" AS BIGINT) AS b) FROM s{yr - 1})"
        )
    rows = "\n      UNION ALL\n      ".join(
        f"SELECT {yr} AS year, CAST(y{yr} AS BIGINT) AS y_cents,"
        f" l AS level_q, b AS trend_q, CAST(l + b AS BIGINT) AS fc1_q"
        f" FROM s{yr}"
        for yr in HOLT_YEARS[1:]
    )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT * FROM ({rows})
    """


@register("orders_holt_forecast", oracle=_holt_oracle())
def orders_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (level + trend) over yearly
    revenue, with the one-step-ahead forecast per year — the
    trend-aware successor to timeseries_ewma's single smoothing, and
    the capacity-planning primitive ("next year's volume?") every
    warehouse publishes.

    Exactness, the generated-oracle pattern a third time (markov,
    k-core, now Holt): the coupled recursions run as exact integer
    steps — l' = floor((a*y + (1e6-a)*(l+b))/1e6), b' =
    floor((B*(l'-l) + (1e6-B)*b)/1e6) with e6-quantized a=0.5, B=0.3,
    init l=y2, b=y2-y1 — and the DuckDB oracle's unrolled CTE chain is
    generated from the same constants, so the smoothed states
    hash-match bit-for-bit with no float smoothing ambiguity. The year
    spine is the pinned fixture history with COALESCE(0) gap-fill, so
    every SF sees the same recursion length.

    Scale shape: ONE map-side-combinable groupBy of the fact to the
    year grain (the only data-sized work); the recursion runs over a
    years-long constant-sized relation. At 100 TB with a monthly or
    daily grain you unroll more steps of the same constant-sized
    chain — the horizon is config, not code."""
    o = load(spark, sf_dir, "orders")
    yearly = (
        o.groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("y")
        )
    )
    spine = F.array(*[F.lit(y) for y in HOLT_YEARS])
    wide = (
        yearly.join(
            yearly.sparkSession.range(1).select(
                F.explode(spine).alias("yr2")
            ),
            F.col("yr") == F.col("yr2"),
            "right",
        )
        .groupBy()
        .pivot("yr2", list(HOLT_YEARS))
        .agg(F.coalesce(F.first("y"), F.lit(0)).cast("bigint"))
    )
    for yr in HOLT_YEARS:
        wide = wide.withColumnRenamed(str(yr), f"y{yr}")
    # ONE-ROW relation with one consumer per unrolled year: without the
    # checkpoint every union branch below re-ran the fact groupBy +
    # pivot from scratch (12 parquet scans / 849 plan lines measured);
    # with it the recursion folds over a single materialized row.
    wide = wide.select(
        *[F.coalesce(F.col(f"y{yr}"), F.lit(0)).cast("bigint").alias(f"y{yr}")
          for yr in HOLT_YEARS]
    ).localCheckpoint()
    y1, y2 = HOLT_YEARS[0], HOLT_YEARS[1]
    B = HOLT_BETA_E6
    state = wide.withColumn("l", F.expr(f"CAST(y{y2} AS BIGINT)")).withColumn(
        "b", F.expr(f"CAST(y{y2} - y{y1} AS BIGINT)")
    )
    rows = [
        state.select(
            F.lit(y2).alias("year"),
            F.col(f"y{y2}").alias("y_cents"),
            F.col("l").alias("level_q"),
            F.col("b").alias("trend_q"),
            (F.col("l") + F.col("b")).cast("bigint").alias("fc1_q"),
        )
    ]
    for yr in HOLT_YEARS[2:]:
        le = _holt_l_expr(yr).replace("//", "div")
        state = state.select(
            "*",
            F.expr(f"CAST({le} AS BIGINT)").alias("_l_new"),
            F.expr(
                f"CAST(({B} * (({le}) - l) + {1_000_000 - B} * b)"
                " div 1000000 AS BIGINT)"
            ).alias("_b_new"),
        ).drop("l", "b").withColumnRenamed("_l_new", "l").withColumnRenamed(
            "_b_new", "b"
        )
        rows.append(
            state.select(
                F.lit(yr).alias("year"),
                F.col(f"y{yr}").alias("y_cents"),
                F.col("l").alias("level_q"),
                F.col("b").alias("trend_q"),
                (F.col("l") + F.col("b")).cast("bigint").alias("fc1_q"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@register(
    "dq_simpson_screen",
    oracle="""
    WITH cust AS (
      SELECT o.o_custkey,
             CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS y,
             CAST(round(MIN(c.c_acctbal) * 100) AS BIGINT) AS x,
             MIN(c.c_nationkey) AS nation
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY o.o_custkey),
    grp AS (
      SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(19,0)) * y) AS DECIMAL(38,0)) AS sxy
      FROM cust GROUP BY nation),
    signs AS (
      SELECT nation,
             CASE WHEN n * sxy - sx * sy > 0 THEN 1
                  WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS s
      FROM grp),
    overall AS (
      SELECT CASE WHEN SUM(n) * SUM(sxy) - SUM(sx) * SUM(sy) > 0 THEN 1
                  WHEN SUM(n) * SUM(sxy) - SUM(sx) * SUM(sy) < 0 THEN -1
                  ELSE 0 END AS overall_sign,
             CAST(SUM(n) AS BIGINT) AS n_customers
      FROM grp)
    SELECT o.overall_sign, o.n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN g.s = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pos,
           CAST(SUM(CASE WHEN g.s = -1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_neg,
           CAST(SUM(CASE WHEN g.s <> 0 AND g.s <> o.overall_sign
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_reversed,
           (SUM(CASE WHEN g.s <> 0 AND g.s <> o.overall_sign
                     THEN 1 ELSE 0 END) * 2 > COUNT(*)) AS simpson_flag
    FROM signs g CROSS JOIN overall o
    GROUP BY o.overall_sign, o.n_customers
    """,
)
def dq_simpson_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox screen: does the SIGN of the acctbal-revenue
    association flip between the pooled population and the per-nation
    groups? The aggregation-trust audit every dashboard needs before
    quoting a pooled correlation — when a majority of groups reverse
    the pooled sign, the pooled number is a confounded artifact
    (classic Simpson), and the screen raises simpson_flag.

    Exactness: association signs come from the covariance numerator
    n*Sxy - Sx*Sy evaluated in exact DECIMAL(38,0) (no division, no
    sqrt — the SIGN needs only the numerator), per group and pooled
    (pooled moments are the exact SUMS of group moments), so the flag
    is integer-deterministic in both engines.

    Scale shape: one fact groupBy to customer grain, one
    map-side-combinable moments groupBy to the nation grain;
    everything downstream is group-domain-sized."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    cust = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("y"),
            F.round(F.min("c_acctbal") * 100).cast("bigint").alias("x"),
            F.min("c_nationkey").alias("nation"),
        )
    )
    # Nation-grain moments with two consumers (signs, overall):
    # checkpointed so the customer-grain fact chain runs once.
    grp = cust.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("sxy"),
    ).localCheckpoint()
    sign = (
        "CASE WHEN n * sxy - sx * sy > 0 THEN 1"
        " WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END"
    )
    signs = grp.select("nation", F.expr(sign).alias("s"))
    overall = grp.agg(
        F.expr(
            "CASE WHEN SUM(n) * SUM(sxy) - SUM(sx) * SUM(sy) > 0 THEN 1"
            " WHEN SUM(n) * SUM(sxy) - SUM(sx) * SUM(sy) < 0 THEN -1"
            " ELSE 0 END"
        ).alias("overall_sign"),
        F.sum("n").cast("bigint").alias("n_customers"),
    )
    return (
        signs.crossJoin(F.broadcast(overall))
        .groupBy("overall_sign", "n_customers")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(F.when(F.col("s") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_pos"),
            F.sum(F.when(F.col("s") == -1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_neg"),
            F.sum(
                F.when(
                    (F.col("s") != 0)
                    & (F.col("s") != F.col("overall_sign")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_reversed"),
            (
                F.sum(
                    F.when(
                        (F.col("s") != 0)
                        & (F.col("s") != F.col("overall_sign")),
                        1,
                    ).otherwise(0)
                )
                * 2
                > F.count(F.lit(1))
            ).alias("simpson_flag"),
        )
        .select(
            "overall_sign",
            "n_customers",
            "n_groups",
            "n_pos",
            "n_neg",
            "n_reversed",
            "simpson_flag",
        )
    )


@register(
    "events_changepoint_binary",
    oracle="""
    WITH daily AS (
      SELECT epoch_us(ts) // 86400000000 AS d,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1),
    pre AS (
      SELECT d, cnt,
             CAST(SUM(cnt) OVER (ORDER BY d) AS BIGINT) AS s1,
             CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS n1
      FROM daily),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM daily),
    cand AS (
      SELECT p.d, p.n1, t.n - p.n1 AS n2, p.s1, t.s - p.s1 AS s2,
             p.s1 * (t.n - p.n1) - (t.s - p.s1) * p.n1 AS num,
             p.n1 * (t.n - p.n1) * t.n AS den
      FROM pre p, tot t
      WHERE p.n1 < t.n),
    scored AS (
      SELECT d, n1, n2, s1, s2,
             CAST((num * num // den) * 1000000
                  + ((num * num % den) * 1000000) // den AS BIGINT)
                 AS gain_e6
      FROM cand)
    SELECT CAST(d AS BIGINT) AS split_day, n1 AS n_left, n2 AS n_right,
           CAST(s1 * 1000000 // n1 AS BIGINT) AS mean_left_e6,
           CAST(s2 * 1000000 // n2 AS BIGINT) AS mean_right_e6,
           gain_e6
    FROM scored
    ORDER BY gain_e6 DESC, split_day
    LIMIT 1
    """,
)
def events_changepoint_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single change-point detection on the daily event-volume series
    (the first split of binary segmentation / CUSUM's offline twin):
    the day boundary tau maximizing the between-segment SSE reduction
    gain(tau) = (S1*n2 - S2*n1)^2 / (n1*n2*n) — the exact-arithmetic
    form of n1*n2/n * (mean1 - mean2)^2, evaluated for every prefix
    and reported for the argmax with segment means.

    Exactness: counts and prefix sums are integers; the gain quantizes
    to e6 units via the two-term floor expansion (q*1e6 + (r*1e6)//den).
    THREE in-plan assert_true guards (folded into kept columns, the
    dq_ks_two_sample discipline) cover every intermediate: |num| <= 3e9
    so num*num stays under int64; q = num*num div den <= int64_max//1e6
    so q*1e6 stays under int64 (|num|<=3e9 alone does NOT imply this —
    with den in the hundreds, num^2/den can pass 9.2e12); and
    den <= int64_max//1e6 so the remainder term (r < den) * 1e6 stays
    under int64. Any breach raises loudly instead of wrapping.

    Scale shape: ONE map-side-combinable groupBy collapses the corpus
    to the calendar-day series; the window prefix sums and the argmax
    run over that day-grain relation (allowlisted bounded global
    window, like orders_backlog_sweepline), and the report is
    TakeOrdered-1. At 100 TB only the day rollup touches data."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wr = Window.orderBy("d")
    pre = daily.select(
        "d",
        F.sum("cnt").over(w).cast("bigint").alias("s1"),
        F.row_number().over(wr).cast("bigint").alias("n1"),
    )
    tot = daily.agg(
        F.sum("cnt").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    cand = (
        pre.crossJoin(F.broadcast(tot))
        .filter(F.col("n1") < F.col("n"))
        .select(
            "d",
            "n1",
            (F.col("n") - F.col("n1")).alias("n2"),
            "s1",
            (F.col("s") - F.col("s1")).alias("s2"),
            (
                F.col("s1") * (F.col("n") - F.col("n1"))
                - (F.col("s") - F.col("s1")) * F.col("n1")
            ).alias("num"),
            (F.col("n1") * (F.col("n") - F.col("n1")) * F.col("n")).alias("den"),
        )
    )
    num_guard = F.assert_true(
        F.abs(F.col("num")) <= F.lit(3_000_000_000).cast("bigint"),
        F.lit(
            "events_changepoint_binary: |S1*n2 - S2*n1| > 3e9 — num^2 "
            "would overflow int64; rescale counts (e.g. per-1k units) "
            "before the gain expansion"
        ),
    )
    qd = cand.select(
        "d",
        "n1",
        "n2",
        "s1",
        "s2",
        "den",
        F.when(num_guard.isNull(), F.expr("num * num div den"))
        .cast("bigint")
        .alias("q"),
        F.expr("num * num % den").cast("bigint").alias("rem"),
    )
    e6_cap = F.lit(9_223_372_036_854_775_807 // 1_000_000).cast("bigint")
    q_guard = F.assert_true(
        (F.col("q") <= e6_cap) & (F.col("den") <= e6_cap),
        F.lit(
            "events_changepoint_binary: num^2 div den (or den itself) "
            "> int64_max/1e6 — the e6 quantization would overflow "
            "int64; rescale counts before the gain expansion"
        ),
    )
    scored = qd.select(
        "d",
        "n1",
        "n2",
        "s1",
        "s2",
        F.when(
            q_guard.isNull(),
            F.col("q") * F.lit(1_000_000).cast("bigint")
            + F.expr("(rem * 1000000) div den"),
        )
        .cast("bigint")
        .alias("gain_e6"),
    )
    return (
        scored.orderBy(F.desc("gain_e6"), F.asc("d"))
        .limit(1)
        .select(
            F.col("d").cast("bigint").alias("split_day"),
            F.col("n1").alias("n_left"),
            F.col("n2").alias("n_right"),
            F.expr("s1 * 1000000 div n1").cast("bigint").alias("mean_left_e6"),
            F.expr("s2 * 1000000 div n2").cast("bigint").alias("mean_right_e6"),
            "gain_e6",
        )
    )


#: Count-min sketch geometry: CMS_D independent md5-salted hash rows
#: of CMS_W buckets. Collision noise at sf0.1 ~ n_rows/CMS_W ~ 150;
#: the operator's contract is the sketch INVARIANT (est >= true) and
#: exact cross-engine replay, not tightness at toy scale.
CMS_D = 3
CMS_W = 1024


def cms_oracle_sql(key_sql: str, table: str) -> str:
    """The DuckDB rendering of the CMS build + top-10 point query for
    key expression ``key_sql`` over ``table`` — shared by
    agg_cms_heavy_hitters and the streaming twin so a future CMS_D /
    CMS_W change can never fork the batch and stream contracts (the
    hll_oracle_sql discipline)."""
    return f"""
    WITH exact AS MATERIALIZED (
      SELECT CAST({key_sql} AS VARCHAR) AS key,
             CAST(COUNT(*) AS BIGINT) AS true_cnt
      FROM {table} GROUP BY 1),
    buckets AS MATERIALIZED (
      SELECT d.d,
             ('0x' || substr(md5('cms' || CAST(d.d AS VARCHAR) || ':' || key),
                             1, 8))::BIGINT % {CMS_W} AS bucket,
             CAST(SUM(true_cnt) AS BIGINT) AS total
      FROM exact, (SELECT unnest(range(0, {CMS_D})) AS d) d
      GROUP BY 1, 2),
    top AS MATERIALIZED (
      SELECT key, true_cnt FROM exact
      ORDER BY true_cnt DESC, key LIMIT 10),
    est AS (
      SELECT t.key, t.true_cnt, CAST(MIN(b.total) AS BIGINT) AS est_cnt
      FROM top t, (SELECT unnest(range(0, {CMS_D})) AS d) d
      JOIN buckets b
        ON b.d = d.d
       AND b.bucket = ('0x' || substr(md5('cms' || CAST(d.d AS VARCHAR)
                                          || ':' || t.key), 1, 8))::BIGINT
                      % {CMS_W}
      GROUP BY 1, 2)
    SELECT key, true_cnt, est_cnt,
           CAST(est_cnt - true_cnt AS BIGINT) AS overest
    FROM est
    """


@register(
    "agg_cms_heavy_hitters",
    oracle=cms_oracle_sql("o_custkey", "orders"),
)
def agg_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters: CMS_D md5-salted hash rows of
    CMS_W counters absorb the per-customer order counts; the top-10
    true keys are then point-queried from the sketch (min over rows)
    and reported next to their exact counts with the guaranteed
    one-sided error (overest >= 0 ALWAYS — the CMS invariant, asserted
    in tests). This is the streaming-memory answer to 'top keys over
    an unbounded key domain' — the sketch is CMS_D*CMS_W integers no
    matter how many distinct keys exist.

    Portability: the hash is the engine-portable md5-prefix integer
    (token_hash32 discipline), bucket totals and minima are exact
    integers, so both engines build the IDENTICAL sketch.

    Scale shape: one map-side-combinable exact rollup per key (the
    standard pre-aggregation — sketch updates commute with it), then
    the sketch build is a CMS_D-way explode of the KEY-domain relation
    into (row, bucket) sums — domain-sized, not corpus-sized; the
    point-query joins a LIMIT-10 relation against the 3k-row sketch."""
    o = load(spark, sf_dir, "orders")
    exact = o.groupBy(
        F.col("o_custkey").cast("string").alias("key")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("true_cnt"))
    exact = exact.localCheckpoint()

    # The d rows are emitted MAP-SIDE via one explode instead of a
    # CMS_D-branch union (each branch re-walked its input relation —
    # 2 x CMS_D re-walks between the sketch and the probes), and the
    # hash string 'cms{d}:{key}' is built from the d COLUMN, which is
    # byte-identical to the former per-branch literal.
    dcol = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("d")

    def bucket_col():
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("cms"),
                            F.col("d").cast("string"),
                            F.lit(":"),
                            F.col("key"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % CMS_W
        )

    sketch = (
        exact.select("key", "true_cnt", dcol)
        .select("d", bucket_col().alias("bucket"), "true_cnt")
        .groupBy("d", "bucket")
        .agg(F.sum("true_cnt").cast("bigint").alias("total"))
    )
    # 10 rows, CMS_D probe walks below — sorted once.
    top = (
        exact.orderBy(F.desc("true_cnt"), F.asc("key"))
        .limit(10)
        .localCheckpoint()
    )
    probes = top.select("key", "true_cnt", dcol).select(
        "key", "true_cnt", "d", bucket_col().alias("bucket")
    )
    est = (
        probes.join(sketch, ["d", "bucket"])
        .groupBy("key", "true_cnt")
        .agg(F.min("total").cast("bigint").alias("est_cnt"))
    )
    return est.select(
        "key",
        "true_cnt",
        "est_cnt",
        (F.col("est_cnt") - F.col("true_cnt")).cast("bigint").alias("overest"),
    )


#: Portable HyperLogLog geometry: HLL_M md5-bucketed registers over a
#: 52-bit hash remainder; the harmonic sum is kept as the EXACT
#: integer sum of 2^(50 - M_j) (empty register -> 2^50), so the
#: register state and sum are hash-identical cross-engine, and only
#: the final estimate performs one fixed-order double division.
HLL_M = 256
HLL_ALPHA_NUM = 718272.0  # alpha_256 * 1e6 = 0.7213/(1+1.079/256) * 1e6

# Linear-counting lookup for the small-range correction, generated in
# Python ONCE and embedded as the same integer literals in BOTH engines
# so no libm ln() runs at query time: LC[V] = round(m * ln(m / V)) for
# V empty registers (1-indexed).
import math as _math

HLL_LC_LUT = [
    round(HLL_M * _math.log(HLL_M / v)) for v in range(1, HLL_M)
]


def _hll_lut_sql() -> str:
    return "[" + ", ".join(str(x) for x in HLL_LC_LUT) + "]"


@register(
    "agg_hll_distinct",
    oracle=f"""
    WITH h AS MATERIALIZED (
      SELECT DISTINCT
             ('0x' || substr(md5('hll:' || CAST(o_custkey AS VARCHAR)),
                             1, 15))::BIGINT AS hv
      FROM orders),
    reg AS MATERIALIZED (
      SELECT hv % {HLL_M} AS bucket,
             CAST(MAX(CASE WHEN hv // {HLL_M} = 0 THEN 53
                      ELSE 52 - length(bin(hv // {HLL_M})) + 1 END)
                  AS BIGINT) AS mj
      FROM h GROUP BY 1),
    terms AS (
      SELECT b.bucket,
             CAST(CASE WHEN r.mj IS NULL THEN 1125899906842624
                  ELSE 2 ** greatest(50 - r.mj, 0) END AS BIGINT) AS term,
             CASE WHEN r.mj IS NULL THEN 0 ELSE 1 END AS filled
      FROM (SELECT unnest(range(0, {HLL_M})) AS bucket) b
      LEFT JOIN reg r ON r.bucket = b.bucket),
    s AS (
      SELECT CAST(SUM(term) AS BIGINT) AS sum_scaled,
             CAST(SUM(filled) AS BIGINT) AS n_filled
      FROM terms),
    ex AS (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact
           FROM orders),
    raw AS (
      SELECT s.n_filled, s.sum_scaled, ex.n_exact,
             CAST(round(CAST({int(HLL_ALPHA_NUM)} AS DOUBLE)
                        * {HLL_M} * {HLL_M}
                        * CAST(1125899906842624 AS DOUBLE)
                        / (CAST(1000000 AS DOUBLE)
                           * CAST(s.sum_scaled AS DOUBLE)), 0)
                  AS BIGINT) AS est_raw
      FROM s, ex)
    SELECT {HLL_M} AS m, n_exact, n_filled, sum_scaled,
           CAST(CASE WHEN est_raw <= {HLL_M * 5 // 2}
                      AND {HLL_M} - n_filled > 0
                THEN ({_hll_lut_sql()})[({HLL_M} - n_filled)::INT]
                ELSE est_raw END AS BIGINT) AS est
    FROM raw
    """,
)
def agg_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable HyperLogLog distinct-count estimate over
    o_custkey, reported next to the exact distinct for calibration:
    md5-derived 60-bit hashes split into HLL_M register buckets + a
    52-bit remainder whose leading-zero rank (exact integer
    bit-length, the graph_degree_stats technique) feeds max-registers;
    the harmonic denominator is the EXACT integer sum of 2^(50-M_j),
    so the entire sketch state matches bitwise across engines and the
    one double division at the end is fixed-order. Unlike Spark's
    native approx_count_distinct (whose HLL++ register layout no
    other engine reproduces), this sketch is the portable contract —
    registers could be exported, merged across partitions or engines,
    and re-estimated anywhere.

    Scale shape: one distinct-hash pass (map-side combinable), a
    register rollup bounded at HLL_M rows, and a constant-size
    estimate row. Registers merge by MAX — the commutative property
    that makes HLL the standard distributed/streaming cardinality
    sketch."""
    o = load(spark, sf_dir, "orders")
    # ONE scan serves sketch AND exact count: distinct on the NARROW
    # key first (cheaper shuffle bytes than distinct-on-md5, and the
    # md5 runs once per distinct key instead of once per row), then
    # per-bucket (max rank, key count). Registers are unchanged even
    # under an md5 collision (they aggregate by MAX — duplicate hv
    # rows are absorbed), and n_exact = sum of per-bucket distinct-key
    # counts, exactly COUNT(DISTINCT o_custkey).
    dk = o.select("o_custkey").distinct()
    h = dk.select(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("hll:"), F.col("o_custkey").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("hv")
    )
    reg = h.groupBy((F.col("hv") % HLL_M).alias("bucket")).agg(
        F.max(
            F.expr(
                f"CASE WHEN hv div {HLL_M} = 0 THEN 53 "
                f"ELSE 52 - length(bin(hv div {HLL_M})) + 1 END"
            )
        )
        .cast("bigint")
        .alias("mj"),
        F.count(F.lit(1)).cast("bigint").alias("nb"),
    )
    buckets = spark.range(HLL_M).select(F.col("id").alias("bucket"))
    terms = buckets.join(reg, "bucket", "left").select(
        F.when(F.col("mj").isNull(), F.lit(1125899906842624).cast("bigint"))
        .otherwise(
            F.expr("CAST(power(2, greatest(50 - mj, 0)) AS BIGINT)")
        )
        .alias("term"),
        F.when(F.col("mj").isNull(), F.lit(0)).otherwise(F.lit(1)).alias(
            "filled"
        ),
        F.coalesce(F.col("nb"), F.lit(0)).alias("nb"),
    )
    raw = terms.agg(
        F.sum("term").cast("bigint").alias("sum_scaled"),
        F.sum("filled").cast("bigint").alias("n_filled"),
        F.sum("nb").cast("bigint").alias("n_exact"),
    ).select(
        "n_exact",
        "n_filled",
        "sum_scaled",
        F.round(
            F.lit(HLL_ALPHA_NUM)
            * HLL_M
            * HLL_M
            * F.lit(1125899906842624.0)
            / (F.lit(1000000.0) * F.col("sum_scaled").cast("double")),
            0,
        )
        .cast("bigint")
        .alias("est_raw"),
    )
    lut = F.array(*[F.lit(x).cast("bigint") for x in HLL_LC_LUT])
    return raw.select(
        F.lit(HLL_M).cast("bigint").alias("m"),
        "n_exact",
        "n_filled",
        "sum_scaled",
        F.when(
            (F.col("est_raw") <= F.lit(HLL_M * 5 // 2))
            & (F.lit(HLL_M) - F.col("n_filled") > 0),
            F.element_at(lut, (F.lit(HLL_M) - F.col("n_filled")).cast("int")),
        )
        .otherwise(F.col("est_raw"))
        .cast("bigint")
        .alias("est"),
    )


def hll_registers(df: DataFrame, key_col: str) -> DataFrame:
    """(bucket, mj) relation for the portable HLL over df[key_col]
    (cast to string) — shared by agg_hll_distinct and the streaming
    twin so the register layout cannot fork between batch and stream.
    Duplicate keys are harmless: registers aggregate by MAX."""
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hll:"), F.col(key_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return df.select(hv.alias("hv")).select(
        (F.col("hv") % HLL_M).alias("bucket"),
        F.expr(
            f"CASE WHEN hv div {HLL_M} = 0 THEN 53 "
            f"ELSE 52 - length(bin(hv div {HLL_M})) + 1 END"
        )
        .cast("bigint")
        .alias("mj"),
    )


def hll_estimate(spark: SparkSession, reg: DataFrame) -> DataFrame:
    """Fold an aggregated register relation (bucket, mj) into the
    (n_filled, sum_scaled, est) estimate row — the exact-integer
    harmonic sum, the fixed-order double division, and the embedded
    linear-counting lookup, identical to agg_hll_distinct's tail."""
    buckets = spark.range(HLL_M).select(F.col("id").alias("bucket"))
    terms = buckets.join(reg, "bucket", "left").select(
        F.when(F.col("mj").isNull(), F.lit(1125899906842624).cast("bigint"))
        .otherwise(F.expr("CAST(power(2, greatest(50 - mj, 0)) AS BIGINT)"))
        .alias("term"),
        F.when(F.col("mj").isNull(), F.lit(0)).otherwise(F.lit(1)).alias(
            "filled"
        ),
    )
    s = terms.agg(
        F.sum("term").cast("bigint").alias("sum_scaled"),
        F.sum("filled").cast("bigint").alias("n_filled"),
    )
    raw = s.select(
        "n_filled",
        "sum_scaled",
        F.round(
            F.lit(HLL_ALPHA_NUM)
            * HLL_M
            * HLL_M
            * F.lit(1125899906842624.0)
            / (F.lit(1000000.0) * F.col("sum_scaled").cast("double")),
            0,
        )
        .cast("bigint")
        .alias("est_raw"),
    )
    lut = F.array(*[F.lit(x).cast("bigint") for x in HLL_LC_LUT])
    return raw.select(
        "n_filled",
        "sum_scaled",
        F.when(
            (F.col("est_raw") <= F.lit(HLL_M * 5 // 2))
            & (F.lit(HLL_M) - F.col("n_filled") > 0),
            F.element_at(lut, (F.lit(HLL_M) - F.col("n_filled")).cast("int")),
        )
        .otherwise(F.col("est_raw"))
        .cast("bigint")
        .alias("est"),
    )


def hll_oracle_sql(key_sql: str, table: str) -> str:
    """The DuckDB rendering of registers+estimate for key expression
    ``key_sql`` over ``table`` — shared so batch and stream oracles
    are one text."""
    return f"""
    WITH h AS MATERIALIZED (
      SELECT DISTINCT
             ('0x' || substr(md5('hll:' || CAST({key_sql} AS VARCHAR)),
                             1, 15))::BIGINT AS hv
      FROM {table}),
    reg AS MATERIALIZED (
      SELECT hv % {HLL_M} AS bucket,
             CAST(MAX(CASE WHEN hv // {HLL_M} = 0 THEN 53
                      ELSE 52 - length(bin(hv // {HLL_M})) + 1 END)
                  AS BIGINT) AS mj
      FROM h GROUP BY 1),
    terms AS (
      SELECT CAST(CASE WHEN r.mj IS NULL THEN 1125899906842624
                  ELSE 2 ** greatest(50 - r.mj, 0) END AS BIGINT) AS term,
             CASE WHEN r.mj IS NULL THEN 0 ELSE 1 END AS filled
      FROM (SELECT unnest(range(0, {HLL_M})) AS bucket) b
      LEFT JOIN reg r ON r.bucket = b.bucket),
    s AS (
      SELECT CAST(SUM(term) AS BIGINT) AS sum_scaled,
             CAST(SUM(filled) AS BIGINT) AS n_filled
      FROM terms),
    ex AS (SELECT CAST(COUNT(DISTINCT {key_sql}) AS BIGINT) AS n_exact
           FROM {table}),
    raw AS (
      SELECT s.n_filled, s.sum_scaled, ex.n_exact,
             CAST(round(CAST({int(HLL_ALPHA_NUM)} AS DOUBLE)
                        * {HLL_M} * {HLL_M}
                        * CAST(1125899906842624 AS DOUBLE)
                        / (CAST(1000000 AS DOUBLE)
                           * CAST(s.sum_scaled AS DOUBLE)), 0)
                  AS BIGINT) AS est_raw
      FROM s, ex)
    SELECT {HLL_M} AS m, n_exact, n_filled, sum_scaled,
           CAST(CASE WHEN est_raw <= {HLL_M * 5 // 2}
                      AND {HLL_M} - n_filled > 0
                THEN ({_hll_lut_sql()})[({HLL_M} - n_filled)::INT]
                ELSE est_raw END AS BIGINT) AS est
    FROM raw
    """


@register(
    "orders_return_rate_wilson",
    oracle="""
    WITH base AS (
      SELECT n.n_name,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1),
    sc AS (
      SELECT n_name, n, k,
             CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p
      FROM base),
    wil AS (
      SELECT n_name, n, k,
             CAST(k * 1000000 // n AS BIGINT) AS rate_e6,
             CAST(round(
               ((p + 3.8416 / (2.0 * CAST(n AS DOUBLE))
                 - 1.96 * sqrt((p * (1.0 - p)
                                + 3.8416 / (4.0 * CAST(n AS DOUBLE)))
                               / CAST(n AS DOUBLE)))
                / (1.0 + 3.8416 / CAST(n AS DOUBLE))) * 1000000, 0)
               AS BIGINT) AS wilson_lb_e6
      FROM sc)
    SELECT n_name, n, k, rate_e6, wilson_lb_e6,
           CAST(ROW_NUMBER() OVER (ORDER BY wilson_lb_e6 DESC, n_name)
                AS BIGINT) AS rk
    FROM wil
    """,
)
def orders_return_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation return-rate ranking by the Wilson score lower bound
    (z=1.96): the uncertainty-aware ranking that stops a nation with
    3 returns out of 5 lineitems outranking one with 300 of 1000 —
    the same correction behind 'sort by best rating'. Rates in exact
    e6 integer units; the Wilson bound composes p-hat, the z^2/2n
    continuity term, and the score-interval sqrt in ONE fixed
    left-to-right double expression replicated verbatim in the oracle
    (sqrt is IEEE-correctly-rounded in both engines, so the e6
    rounding agrees bitwise — the cosine_from_scaled discipline).

    Scale shape: lineitem-orders shuffles on orderkey (both data-
    sized); customer scales linearly with SF (150k x SF rows), so it
    carries NO broadcast hint — AQE broadcasts it at bench SFs and
    falls back to a shuffle join at the 100 TB operating point where a
    forced customer broadcast would OOM the driver. Only nation (25
    rows at every SF) is hint-broadcast. Then one nation-grain rollup
    and a 25-row report rank."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum((F.col("l_returnflag") == "R").cast("int"))
            .cast("bigint")
            .alias("k"),
        )
    )
    p = F.col("k").cast("double") / F.col("n").cast("double")
    nd = F.col("n").cast("double")
    wilson = F.round(
        (
            (
                p
                + F.lit(3.8416) / (F.lit(2.0) * nd)
                - F.lit(1.96)
                * F.sqrt(
                    (p * (F.lit(1.0) - p) + F.lit(3.8416) / (F.lit(4.0) * nd))
                    / nd
                )
            )
            / (F.lit(1.0) + F.lit(3.8416) / nd)
        )
        * 1000000,
        0,
    ).cast("bigint")
    wil = base.select(
        "n_name",
        "n",
        "k",
        F.expr("k * 1000000 div n").cast("bigint").alias("rate_e6"),
        wilson.alias("wilson_lb_e6"),
    )
    w = Window.orderBy(F.desc("wilson_lb_e6"), F.asc("n_name"))
    return wil.withColumn("rk", F.row_number().over(w).cast("bigint"))


# --- portable Bloom filter: the OR-merge sketch ------------------------------
#
# Completes the distributed-sketch merge-algebra triptych: CMS merges
# by ADDITION (counts), HLL by MAX (register ranks), Bloom by OR (bit
# sets) — the three shapes every mergeable summary falls into. The
# bitmap is BLOOM_WORDS int64 words (BLOOM_WORDS*64 bits); BLOOM_K
# md5-salted hashes per key; membership probes are pure bit tests.
# Everything is exact integer arithmetic (md5-prefix ints, shiftleft,
# bit_or, bit_count), so both engines build the IDENTICAL bitmap and
# the sweep hash-checks the sketch bit for bit.
BLOOM_WORDS = 64
BLOOM_K = 3


def bloom_oracle_sql(key_sql: str, table: str) -> str:
    """DuckDB rendering of bitmap build + 20 membership probes for key
    expression ``key_sql`` over ``table`` — shared by the batch and
    streaming twins (the cms/hll_oracle_sql discipline). Probes: the
    10 smallest true keys plus 10 'absent:{i}' keys that can never
    occur; claimed = all BLOOM_K bits set, truth from an exact semi
    check; n_set_bits cross-joined as the fill witness."""
    bits = BLOOM_WORDS * 63
    h = (
        "('0x' || substr(md5('bloom' || CAST(j.j AS VARCHAR) || ':' || key),"
        f" 1, 8))::BIGINT % {bits}"
    )
    return f"""
    WITH keys AS MATERIALIZED (
      SELECT DISTINCT CAST({key_sql} AS VARCHAR) AS key FROM {table}),
    cells AS (
      SELECT ({h}) // 63 AS word, ({h}) % 63 AS bitpos
      FROM keys, (SELECT unnest(range(0, {BLOOM_K})) AS j) j),
    bmp AS MATERIALIZED (
      SELECT word, CAST(bit_or(1::BIGINT << CAST(bitpos AS INT)) AS BIGINT)
                 AS bits
      FROM cells GROUP BY word),
    fill AS (
      SELECT CAST(SUM(bit_count(bits)) AS BIGINT) AS n_set_bits FROM bmp),
    probes AS (
      SELECT key, TRUE AS true_member
      FROM (SELECT key FROM keys ORDER BY key LIMIT 10)
      UNION ALL
      SELECT 'absent:' || CAST(unnest(range(0, 10)) AS VARCHAR), FALSE),
    ptest AS (
      SELECT p.key, p.true_member,
             COUNT(*) FILTER (
               WHERE b.bits IS NOT NULL
                 AND (b.bits & (1::BIGINT << CAST(({h}) % 63 AS INT))) <> 0
             ) = {BLOOM_K} AS claimed_member
      FROM probes p
      CROSS JOIN (SELECT unnest(range(0, {BLOOM_K})) AS j) j
      LEFT JOIN bmp b ON b.word = ({h}) // 63
      GROUP BY p.key, p.true_member)
    SELECT t.key, t.claimed_member, t.true_member, f.n_set_bits
    FROM ptest t, fill f
    """


@register(
    "agg_bloom_membership",
    oracle=bloom_oracle_sql("o_custkey", "orders"),
)
def agg_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom-filter membership: the per-customer key set is
    absorbed into a BLOOM_WORDS x 63-usable-bit bitmap (BLOOM_K md5-salted
    hashes per key), then 20 probes — the 10 smallest true keys and
    10 impossible 'absent:{i}' keys — are answered from the BITMAP
    ALONE and reported next to exact truth. The Bloom one-sided
    guarantee (claimed is always true for true members; false
    positives possible, false negatives never) is asserted in tests.
    n_set_bits is the fill witness both engines must agree on.

    Scale shape: one distinct pass, a BLOOM_K-way explode, and a
    map-side-combinable bit_or rollup to a BOUNDED bitmap (the sketch
    property); probes are a 20-row broadcast against the bitmap."""
    bits = BLOOM_WORDS * 63
    keys = (
        load(spark, sf_dir, "orders")
        .select(F.col("o_custkey").cast("string").alias("key"))
        .distinct()
    )

    def hpos(j, key):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"bloom{j}:"), key)), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % bits
        )

    cells = keys.select(
        F.explode(
            F.array(*[hpos(j, F.col("key")) for j in range(BLOOM_K)])
        ).alias("pos")
    ).select(
        F.expr("pos div 63").alias("word"),
        F.expr("pos % 63").cast("int").alias("bitpos"),
    )
    bmp = cells.groupBy("word").agg(
        F.bit_or(F.expr("shiftleft(cast(1 as bigint), bitpos)"))
        .cast("bigint")
        .alias("bits")
    ).localCheckpoint()
    fill = bmp.agg(
        F.sum(F.bit_count("bits")).cast("bigint").alias("n_set_bits")
    )
    present = keys.orderBy("key").limit(10).select(
        "key", F.lit(True).alias("true_member")
    )
    absent = spark.range(0, 10).select(
        F.concat(F.lit("absent:"), F.col("id").cast("string")).alias("key"),
        F.lit(False).alias("true_member"),
    )
    probes = present.unionByName(absent)
    pr = probes.select(
        "key",
        "true_member",
        F.explode(
            F.array(*[hpos(j, F.col("key")) for j in range(BLOOM_K)])
        ).alias("pos"),
    ).select(
        "key",
        "true_member",
        F.expr("pos div 63").alias("word"),
        F.expr("pos % 63").cast("int").alias("bitpos"),
    )
    tested = (
        pr.join(bmp, "word", "left")
        .select(
            "key",
            "true_member",
            (
                F.col("bits").isNotNull()
                & (
                    F.col("bits").bitwiseAND(
                        F.expr("shiftleft(cast(1 as bigint), bitpos)")
                    )
                    != 0
                )
            ).cast("int").alias("hit"),
        )
        .groupBy("key", "true_member")
        .agg((F.sum("hit") == BLOOM_K).alias("claimed_member"))
    )
    return tested.crossJoin(F.broadcast(fill)).select(
        "key", "claimed_member", "true_member", "n_set_bits"
    )


#: First-significant-digit Benford expectations, scaled 1e6 (rounded
#: floor(log10(1 + 1/d) * 1e6) adjusted to sum EXACTLY to 1_000_000 —
#: they do naturally: 301030+176091+124939+96910+79181+66947+57992+
#: 51153+45757 = 1_000_000), shared verbatim by both engines as CASE
#: literals so no engine ever evaluates a log10.
BENFORD_E6 = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}
#: Alert when |observed - expected| / expected exceeds 15% (1e6-scaled).
BENFORD_ALERT_E6 = 150_000

_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {e}" for d, e in BENFORD_E6.items()
)


@register(
    "dq_benford_screen",
    oracle=f"""
    WITH obs AS (
      SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                 AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM orders GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM obs),
    spine AS (
      SELECT CAST(range AS BIGINT) AS digit,
             CAST(CASE range {_BENFORD_CASE} END AS BIGINT) AS benford_e6
      FROM range(1, 10)),
    j AS (
      SELECT s.digit, s.benford_e6,
             CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs, t.n_total,
             t.n_total * s.benford_e6 AS expected_e6,
             CAST(COALESCE(o.n_obs, 0) AS BIGINT) * 1000000
               - t.n_total * s.benford_e6 AS dev_e6
      FROM spine s LEFT JOIN obs o ON o.digit = s.digit CROSS JOIN tot t)
    SELECT digit, n_obs, n_total, benford_e6, expected_e6, dev_e6,
           (abs(dev_e6) // n_total) * 1000000 // benford_e6
             AS rel_abs_dev_e6,
           ((abs(dev_e6) // n_total) * 1000000 // benford_e6)
             > {BENFORD_ALERT_E6} AS flagged
    FROM j
    """,
)
def dq_benford_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit screen over order totals — the
    classic fabricated-data / corruption detector every audit pipeline
    runs on monetary columns (Nigrini's digit-frequency test): compare
    each leading digit's observed share against Benford's law
    P(d) = log10(1 + 1/d) and flag digits whose relative deviation
    exceeds 15%. The expectations are FIXED 1e6-scaled integer literals
    shared by both engines (they sum to exactly 1_000_000), so the
    whole screen is integer arithmetic end to end: expected_e6 =
    n_total * benford_e6, dev_e6 = n_obs * 1e6 - expected_e6 (signed
    witness), and rel_abs_dev_e6 = (|dev_e6| div n_total) * 1e6 div
    benford_e6 — the per-row share deviation in e6 units, quantized by
    dividing out n_total FIRST so the intermediate is bounded by 1e12
    regardless of corpus size (every division is on non-negative ints,
    so DuckDB's floor-// and Spark's truncating-div agree). The
    9-digit spine LEFT-joins the census so a digit with zero
    observations still reports (its deviation is -expected, maximally
    flagged). TPC-H order totals are NOT Benford-distributed (bounded
    product mix), so the fixture exercises the alert path — the screen
    demonstrably fires.

    Int64 headroom: the widest value is |dev_e6| <= n_total * 1e6,
    exact to n_total ~ 9.2e12 rows — four orders of magnitude past a
    100 TB orders table; the rel step's intermediates are bounded by
    1e12 independent of n_total.

    Scale shape: one map-side-combinable groupBy into <= 9 digit
    buckets; the spine join and the 1-row total broadcast are
    constant-size. Nothing downstream of the first agg is data-sized.
    """
    orders = load(spark, sf_dir, "orders").select(
        F.expr(
            "CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)"
            " AS STRING), 1, 1) AS BIGINT)"
        ).alias("digit")
    )
    obs = orders.groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs")
    )
    tot = obs.agg(F.sum("n_obs").cast("bigint").alias("n_total"))
    spine = spark.range(1, 10).select(
        F.col("id").cast("bigint").alias("digit"),
        F.expr(f"CAST(CASE id {_BENFORD_CASE} END AS BIGINT)").alias(
            "benford_e6"
        ),
    )
    j = (
        spine.join(obs.withColumnRenamed("digit", "odigit"),
                   F.col("digit") == F.col("odigit"), "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).cast("bigint").alias("n_obs"),
            "n_total",
            "benford_e6",
            (F.col("n_total") * F.col("benford_e6")).alias("expected_e6"),
            (
                F.coalesce("n_obs", F.lit(0)).cast("bigint") * 1000000
                - F.col("n_total") * F.col("benford_e6")
            ).alias("dev_e6"),
        )
    )
    rel = F.expr("(abs(dev_e6) div n_total) * 1000000 div benford_e6")
    return j.select(
        "digit", "n_obs", "n_total", "benford_e6", "expected_e6",
        "dev_e6",
        rel.alias("rel_abs_dev_e6"),
        (rel > BENFORD_ALERT_E6).alias("flagged"),
    )
