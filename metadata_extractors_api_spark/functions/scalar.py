"""Scalar-function query surface (SURVEY.md §2.B.8).

All expressions are JVM-side built-ins (whole-stage codegen; no Python
in the hot path). Cross-engine gotchas handled here:

- DuckDB regexp_replace needs the 'g' flag to match Spark's replace-all;
- DuckDB list indexing is 1-based (`l[1]`), Spark's element_at(l, 1) too;
- year()/datediff() return BIGINT in DuckDB, INT in Spark -> cast both;
- date outputs emitted as ISO strings (pandas has no stable date dtype).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metadata_extractors_api_spark.catalog import load
from metadata_extractors_api_spark.functions.template import template_expr
from metadata_extractors_api_spark.registry import register

# Canonical command-templating fixture (shape of the reference's usage
# rows, tests/test_mpr.py:84,101-109). Inlined as literals on the Spark
# side and as a VALUES CTE in the oracle so both engines see identical
# input without needing a registered view.
TEMPLATE_FIXTURE = [
    (1, "parse --type=example {{ input_path }}", "cli", "example", "example.txt", None, "example.json"),
    (2, "extract({{ input_type }}, {{ input_path }})", "python", "biologic-mpr", "/data/gcpl.mpr", None, None),
    (3, "convert {{ input_path }} -o {{ output_path }}", "cli", "csv", "/data/a.csv", "json", "/data/a.json"),
    (4, "extract({{ input_path }}, type={{ input_type }})", "python", "mpr", "/data/b.mpr", "netcdf", "/data/b.nc"),
    (5, "noop {{ output_type }}", "cli", "t", "/p", None, None),
]

TEMPLATE_FIXTURE_SQL = """
    (VALUES
      (1, 'parse --type=example {{ input_path }}', 'cli', 'example', 'example.txt', NULL, 'example.json'),
      (2, 'extract({{ input_type }}, {{ input_path }})', 'python', 'biologic-mpr', '/data/gcpl.mpr', NULL, NULL),
      (3, 'convert {{ input_path }} -o {{ output_path }}', 'cli', 'csv', '/data/a.csv', 'json', '/data/a.json'),
      (4, 'extract({{ input_path }}, type={{ input_type }})', 'python', 'mpr', '/data/b.mpr', 'netcdf', '/data/b.nc'),
      (5, 'noop {{ output_type }}', 'cli', 't', '/p', NULL, NULL)
    ) AS t(cmd_id, command, method, input_type, input_path, output_type, output_path)
"""


@register(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           lower(p_brand) AS lbrand,
           upper(substr(p_type, 1, 6)) AS utype6,
           regexp_replace(p_name, ' ', '_', 'g') AS name_snake,
           str_split(p_type, ' ')[1] AS type_head,
           CAST(length(p_name) AS INT) AS name_len,
           trim(concat('  ', p_brand, '  ')) AS trimmed,
           printf('%s-%d', p_brand, p_size) AS brand_size
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String built-ins (origin: A8 templating / A10 parsing string ops)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_brand").alias("lbrand"),
        F.upper(F.substring("p_type", 1, 6)).alias("utype6"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.split("p_type", " ").getItem(0).alias("type_head"),
        F.length("p_name").cast("int").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("trimmed"),
        F.format_string("%s-%d", "p_brand", "p_size").alias("brand_size"),
    )


@register(
    "fn_template",
    oracle=f"""
    WITH fixture AS (SELECT * FROM {TEMPLATE_FIXTURE_SQL}),
    rendered AS (
      SELECT cmd_id, method,
        CASE WHEN output_path IS NULL THEN s3 ELSE replace(s3, '{{{{ output_path }}}}',
             CASE WHEN method = 'python' THEN '''' || output_path || '''' ELSE output_path END) END AS rendered
      FROM (
        SELECT *,
          CASE WHEN output_type IS NULL THEN s2 ELSE replace(s2, '{{{{ output_type }}}}',
               CASE WHEN method = 'python' THEN '''' || output_type || '''' ELSE output_type END) END AS s3
        FROM (
          SELECT *,
            CASE WHEN input_path IS NULL THEN s1 ELSE replace(s1, '{{{{ input_path }}}}',
                 CASE WHEN method = 'python' THEN '''' || input_path || '''' ELSE input_path END) END AS s2
          FROM (
            SELECT *,
              CASE WHEN input_type IS NULL THEN command ELSE replace(command, '{{{{ input_type }}}}',
                   CASE WHEN method = 'python' THEN '''' || input_type || '''' ELSE input_type END) END AS s1
            FROM fixture) a) b) c)
    SELECT cmd_id, rendered FROM rendered
    """,
)
def fn_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{{ field }} substitution as a column expression: the set-oriented
    form of the reference's apply_template_args (A8, __init__.py:401-441),
    incl. python-mode quoting and NULL-skip semantics."""
    df = spark.createDataFrame(
        TEMPLATE_FIXTURE,
        "cmd_id INT, command STRING, method STRING, input_type STRING, "
        "input_path STRING, output_type STRING, output_path STRING",
    )
    rendered = template_expr(
        F.col("command"),
        F.col("method"),
        {
            "input_type": F.col("input_type"),
            "input_path": F.col("input_path"),
            "output_type": F.col("output_type"),
            "output_path": F.col("output_path"),
        },
    )
    return df.select("cmd_id", rendered.alias("rendered"))


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mon,
           o_orderdate + INTERVAL 30 DAY AS plus30,
           CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time built-ins (origin: timestamped extraction runs)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mon"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("plus30"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_quantity - 25) AS qty_dev,
           round(ln(l_quantity), 6) AS ln_qty,
           round(sqrt(l_extendedprice), 6) AS sqrt_price,
           round(power(1 + l_discount, 2), 6) AS disc_sq,
           CAST(l_orderkey % 7 AS BIGINT) AS okey_mod,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math built-ins (origin: numeric channels of extraction outputs).
    Transcendentals rounded to 6 dp: both engines' libm results agree to
    well below that at these magnitudes."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.round(F.log(F.col("l_quantity")), 6).alias("ln_qty"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.pow(F.lit(1) + F.col("l_discount"), 2), 6).alias("disc_sq"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("okey_mod"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
    )


@register(
    "fn_array",
    oracle="""
    WITH toks AS (SELECT doc_id, str_split(text, ' ') AS tokens FROM documents)
    SELECT doc_id,
           CAST(len(tokens) AS INT) AS n_tokens,
           list_contains(tokens, 'spark') AS has_spark,
           array_to_string(list_sort(tokens)[1:3], ',') AS first3_sorted,
           CAST(len(list_filter(tokens, t -> length(t) > 4)) AS INT) AS n_long
    FROM toks
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order functions (origin: the nested
    registered_extractors / supported_filetypes lists, A4/A6)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("tokens"))
    return toks.select(
        "doc_id",
        F.size("tokens").cast("int").alias("n_tokens"),
        F.array_contains("tokens", "spark").alias("has_spark"),
        F.array_join(F.slice(F.sort_array("tokens"), 1, 3), ",").alias("first3_sorted"),
        F.size(F.filter("tokens", lambda t: F.length(t) > 4))
        .cast("int")
        .alias("n_long"),
    )


@register(
    "fn_map_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           array_to_string(list_sort(json_keys(props)), ',') AS key_list
    FROM events
    """,
)
def fn_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON -> map/struct functions (origin: registry JSON payloads,
    __init__.py:104,123)."""
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return ev.select(
        "event_id",
        m.getItem("k").alias("k_val"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("key_list"),
    )


@register(
    "fn_case_null",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS tier,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg_or_default,
           (c_acctbal IS NULL) AS bal_missing
    FROM customer
    """,
)
def fn_case_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif (origin: A7's preferred-mode
    fallback and A9's default-output derivation are exactly
    coalesce(preferred, fallback))."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("tier"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("DEFAULT")).alias(
            "seg_or_default"
        ),
        F.col("c_acctbal").isNull().alias("bal_missing"),
    )


@register(
    "win_time_tumbling_batch",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(14,2))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def win_time_tumbling_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming tumbling-window aggregation: same
    window() operator, sql-checkable via DuckDB time_bucket (both are
    1970-epoch aligned; verified)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(14,2)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


@register(
    "fn_variant_json",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_sum,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_min,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS k_max
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type: parse the semi-structured props column
    ONCE into the binary variant encoding and extract typed fields
    with try_variant_get -- the open-schema path that replaces
    per-query JSON string re-parsing (and is the engine-native answer
    to schema drift: unknown fields stay queryable without migration).
    At scale the parse happens in the scan projection, and aggregates
    run over extracted longs, not strings. Oracle extracts the same
    field relationally via DuckDB's JSON operators."""
    ev = load(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(k).cast("bigint").alias("k_sum"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min(k).cast("bigint").alias("k_min"),
            F.max(k).cast("bigint").alias("k_max"),
        )
        .orderBy("event_type")
    )


@register(
    "fn_collation_ci",
    oracle="""
    WITH names AS (
      SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_name) ELSE p_name END
                 AS name
      FROM part)
    SELECT CAST(COUNT(DISTINCT name) AS BIGINT) AS n_case_sensitive,
           CAST(COUNT(DISTINCT lower(name)) AS BIGINT) AS n_case_insensitive
    FROM names
    """,
)
def fn_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: case-insensitive comparison as a COLUMN
    PROPERTY (collate(..., 'UTF8_LCASE')) instead of lower()-wrapping
    every expression. The fixture synthesizes mixed case
    deterministically (even part keys uppercased), then counts
    distinct names under binary vs case-insensitive collation; the
    oracle models the collation with lower(). At scale collation-aware
    grouping avoids materializing a second normalized column and keeps
    the comparison in codegen."""
    p = load(spark, sf_dir, "part")
    names = p.select(
        F.when(
            F.col("p_partkey") % 2 == 0, F.upper("p_name")
        )
        .otherwise(F.col("p_name"))
        .alias("name")
    )
    return names.agg(
        F.countDistinct("name").cast("bigint").alias("n_case_sensitive"),
        F.countDistinct(F.collate("name", "UTF8_LCASE"))
        .cast("bigint")
        .alias("n_case_insensitive"),
    )
