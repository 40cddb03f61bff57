"""Table catalog over the driver's parquet fixtures (TESTDATA.md).

One parquet per table per scale dir. Reads are plain
``spark.read.parquet`` so Catalyst gets predicate pushdown + column
pruning for free; at cluster scale these would be partitioned/bucketed
tables behind the same names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at any realistic scale.
BROADCAST_DIMS = {"region", "nation", "supplier", "part", "customer"}


def load(
    spark: SparkSession, sf_dir: str, name: str, parallelize: bool = False
) -> DataFrame:
    """Load one fixture table as a DataFrame.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark 4
    rejects by default: read it as raw nanos (legacy conf, runtime-
    settable) and floor-convert to a microsecond TimestampType -- the
    same truncation DuckDB applies when it hands ns values to µs
    consumers, so oracle comparisons stay exact at µs granularity.
    """
    if name == "events":
        from pyspark.sql import functions as F

        # The legacy conf only matters while spark.read.parquet infers
        # the footer schema (ts arrives as raw nanos long); restore the
        # previous value right after so the session-global setting
        # doesn't leak into later reads of OTHER ns-timestamp files
        # (verified: the planned scan keeps its baked schema and reads
        # identical values after the restore).
        prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            else:
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if parallelize:
        df = _ensure_parallel(spark, df)
    return df


def _ensure_parallel(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Spread a compute-heavy pipeline across all cores when the scan
    under-parallelizes.

    A parquet row group is Spark's minimum split unit; the driver's
    fixtures are single-row-group files, so every scan is ONE task no
    matter how many cores exist. Callers with expensive per-row work
    opt in to a round-robin repartition -- a narrow, cheap shuffle that
    restores parallelism. On a real cluster (many files / row groups)
    the scan is already parallel and this is a no-op, so the same plan
    serves both environments.
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views (for engine.sql())."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


# (session, sf_dir) pairs whose stats tables are already analyzed.
_STATS_MEMO: set[tuple[int, str]] = set()

#: relational tables worth CBO stats (events needs the legacy ns read
#: path and the doc/embedding tables join on nothing).
STATS_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
]


def create_stats_tables(spark: SparkSession, sf_dir: str, db: str = "mdx_stats") -> str:
    """Register the fixture parquet as catalog tables and ANALYZE them
    (table + all-column statistics), feeding Spark's cost-based
    optimizer. The session catalog is in-memory, so this is
    session-scoped state, not an on-disk metastore. On a cluster this
    is the scheduled `ANALYZE TABLE ... COMPUTE STATISTICS` job that
    keeps CBO join-reordering and broadcast decisions honest as tables
    grow. Returns the database name; memoized per (session, sf_dir)."""
    key = (id(spark), sf_dir)
    if key in _STATS_MEMO:
        return db
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    for t in STATS_TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {db}.{t}")
        spark.sql(
            f"CREATE TABLE {db}.{t} USING PARQUET LOCATION '{sf_dir}/{t}.parquet'"
        )
        spark.sql(f"ANALYZE TABLE {db}.{t} COMPUTE STATISTICS")
        spark.sql(f"ANALYZE TABLE {db}.{t} COMPUTE STATISTICS FOR ALL COLUMNS")
    _STATS_MEMO.add(key)
    return db
