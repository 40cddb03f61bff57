"""Scale-technique operators: the partitioning/bucketing/salting
patterns that keep the engine's plans viable at 100 TB, each exposed as
a runnable query so they are tested, not just described.

- Bucketed co-located join: both sides pre-bucketed on the join key ->
  SortMergeJoin with ZERO exchange (the bucketing carries the
  partitioning contract across queries).
- Salted join: a deliberately skewed key is split into key x salt
  sub-keys, restoring parallelism; the dim side replicates per salt.
  (AQE's skew-join split handles moderate skew automatically; salting is
  the explicit form for pathological keys.)
- Partitioned sink + partition-pruned scan: writes the fact table
  partitioned by a low-cardinality column, then reads one partition --
  the scan must touch only that directory.
- Multi-format sinks: parquet/json/csv round-trips.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metadata_extractors_api_spark.catalog import load
from metadata_extractors_api_spark.operators.relational import dsum, money
from metadata_extractors_api_spark.registry import register


@register(
    "join_bucketed",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(l.l_quantity AS DECIMAL(14,2))), 2) AS DOUBLE)
               AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact-fact join via bucketing: both tables are written
    bucketed on the join key, so the join runs with no exchange on
    either side -- at 100 TB this converts the biggest shuffle in the
    workload into a local merge per bucket. (Bucket metadata lives in
    the session catalog; tables are created once per warehouse.)"""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    # Bucketed tables need the session catalog (bucket spec lives in
    # table metadata). Clear any stale table AND its leftover warehouse
    # directory: a fresh session does not know the table but the managed
    # location can survive from a previous process.
    tag = "".join(c for c in sf_dir if c.isalnum())[-8:]
    lt, ot = f"li_b_{tag}", f"o_b_{tag}"
    for tbl, df, key in ((lt, li, "l_orderkey"), (ot, o, "o_orderkey")):
        if not spark.catalog.tableExists(tbl):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
            loc = os.path.join(wh.removeprefix("file:"), tbl)
            if os.path.exists(loc):
                import shutil

                shutil.rmtree(loc, ignore_errors=True)
            df.write.bucketBy(8, key).sortBy(key).mode("overwrite").saveAsTable(tbl)
    lb, ob = spark.table(lt), spark.table(ot)
    return (
        lb.join(ob, lb.l_orderkey == ob.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), dsum(money("l_quantity"), "sum_qty"))
    )


@register(
    "join_salted",
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))), 2) AS DOUBLE)
               AS total
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit skew salting: the fact side's join key is extended with
    a random-free salt (hash-derived, deterministic), the dim side is
    replicated once per salt value, and the join runs on (key, salt) --
    splitting any hot key across SALT partitions. Results are identical
    to the unsalted join (the oracle runs the plain join)."""
    SALT = 8
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    cn = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "n_name"
    )
    salted_fact = o.withColumn(
        "salt", (F.xxhash64("o_orderkey") % SALT + SALT) % SALT
    )
    salted_dim = cn.crossJoin(
        F.broadcast(
            spark.range(SALT).select(F.col("id").cast("bigint").alias("salt"))
        )
    )
    joined = salted_fact.join(
        salted_dim,
        (salted_fact.o_custkey == salted_dim.c_custkey)
        & (salted_fact.salt == salted_dim.salt),
    )
    return joined.groupBy("n_name").agg(
        F.count("*").alias("n_orders"), dsum(money("o_totalprice"), "total")
    )


@register(
    "sink_partitioned",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    WHERE l_returnflag = 'R'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned write + partition-pruned read: the fact table lands
    partitioned by l_returnflag; the subsequent scan filters one
    partition value, so only that directory is listed/read
    (PartitionFilters in the plan). Partition column values survive the
    round-trip as directory keys."""
    # mkdtemp per call (like every other sink query): a fixed shared
    # path lets two concurrent sessions race overwrite-vs-read.
    out = os.path.join(tempfile.mkdtemp(prefix="mdx_part_sink_"), "t")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_quantity", "l_returnflag"
    )
    li.write.partitionBy("l_returnflag").mode("overwrite").parquet(out)
    back = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    return back.groupBy("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


@register(
    "sink_formats",
    oracle="""
    SELECT 'parquet' AS format, COUNT(*) AS n_rows FROM region
    UNION ALL SELECT 'json', COUNT(*) FROM region
    UNION ALL SELECT 'csv', COUNT(*) FROM region
    """,
)
def sink_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-format sink/source round-trip (parquet, json, csv with
    explicit schema on re-read): one summary row per format; each count
    must equal the source row count (oracle) -- no format drops rows.
    The result is a UNION of per-format aggregate plans over the
    re-read files (one distributed DataFrame, no driver-side counts;
    only the writes are eager, as any sink is)."""
    src = load(spark, sf_dir, "region")
    base = tempfile.mkdtemp(prefix="mdx_fmt_")
    out = None
    for fmt in ("parquet", "json", "csv"):
        path = os.path.join(base, fmt)
        w = src.write.mode("overwrite").format(fmt)
        if fmt == "csv":
            w = w.option("header", "true")
        w.save(path)
        r = spark.read.format(fmt)
        if fmt == "csv":
            r = r.option("header", "true").schema("r_regionkey INT, r_name STRING")
        elif fmt == "json":
            r = r.schema("r_regionkey INT, r_name STRING")
        branch = r.load(path).agg(F.count("*").alias("n_rows")).select(
            F.lit(fmt).alias("format"), "n_rows"
        )
        out = branch if out is None else out.unionByName(branch)
    return out


@register(
    "sink_compaction",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(('0x' || substr(md5(
             CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus || '|'
             || CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
           ), 1, 8))::BIGINT) AS BIGINT) AS checksum,
           -- file counts are the CONTRACT under test, not derivable
           -- from the table: round-robin repartition(n) over non-empty
           -- input must yield exactly n parquet files, before and
           -- after compaction (64 fragmented -> 4 compacted).
           CAST(64 AS INT) AS files_before,
           CAST(4 AS INT) AS files_after
    FROM orders
    """,
)
def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: rewrite a fragmented dataset (64 shards)
    into size-targeted files (4), proving no row was lost or mutated.
    THE table-maintenance job at 100 TB -- streaming ingest and
    fine-grained partitioning leave millions of KB-sized files whose
    per-file open/footer overhead dominates scans; periodic compaction
    restores maxPartitionBytes-sized scan units. In production the
    target count is ceil(input_bytes / target_file_size) from a
    metadata-only listing (or spark.sql.files.maxRecordsPerFile);
    pinned here so the file-count contract is assertable.

    The audit is fully distributed: row checksum is the same
    order-independent md5-sum primitive as table_checksum, and file
    counts come from COUNT(DISTINCT _metadata.file_path) on each
    dataset -- the hidden metadata column keeps the check inside the
    scan instead of a driver-side directory listing."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    d = tempfile.mkdtemp(prefix="mdx_compact_")
    frag_path = os.path.join(d, "fragmented")
    comp_path = os.path.join(d, "compacted")
    o.repartition(64).write.mode("overwrite").parquet(frag_path)
    frag = spark.read.parquet(frag_path)
    frag.repartition(4).write.mode("overwrite").parquet(comp_path)
    comp = spark.read.parquet(comp_path)

    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"),
    )
    rowhash = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("bigint")
    audit = comp.agg(
        F.count("*").alias("n_rows"),
        F.sum(rowhash).cast("bigint").alias("checksum"),
    )
    files_before = frag.select(F.col("_metadata.file_path").alias("fp")).agg(
        F.count_distinct("fp").cast("int").alias("files_before")
    )
    files_after = comp.select(F.col("_metadata.file_path").alias("fp")).agg(
        F.count_distinct("fp").cast("int").alias("files_after")
    )
    return audit.crossJoin(files_before).crossJoin(files_after)
