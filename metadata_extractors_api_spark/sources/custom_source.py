"""Custom Python DataSource (Spark 4 API): the registry as a pluggable
``spark.read.format("mdx_registry")`` source.

This is the modern Spark form of the reference's REST ingestion
(GET /extractors, __init__.py:116-123): instead of driver-side requests
glued to dict parsing, a DataSourceReader yields typed rows inside the
scan itself -- partition-parallel, schema-first, and usable from SQL.
Here the reader serves the local fixture (the registry is archived);
swapping in real HTTP calls per partition is the production path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metadata_extractors_api_spark.registry import register
from metadata_extractors_api_spark.sources import registry as reg

try:  # Spark >= 4.0
    from pyspark.sql.datasource import DataSource, DataSourceReader

    HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover - older Spark
    HAVE_DATASOURCE_API = False
    DataSource = object  # type: ignore
    DataSourceReader = object  # type: ignore


REGISTRY_SOURCE_SCHEMA = (
    "id string, n_supported int, n_usage int, first_package string"
)


if HAVE_DATASOURCE_API:

    class RegistryDataSource(DataSource):
        """format('mdx_registry'): extractor summaries as a scan."""

        @classmethod
        def name(cls) -> str:
            return "mdx_registry"

        def schema(self) -> str:
            return REGISTRY_SOURCE_SCHEMA

        def reader(self, schema):
            return RegistryReader()

    class RegistryReader(DataSourceReader):
        # Snapshot the fixture into a CLASS ATTRIBUTE of plain tuples:
        # the reader pickles by value, and referencing the registry
        # MODULE from read() would drag its session-bound DataFrame memo
        # into the pickle (SparkContext is not serializable). A
        # production source would issue HTTP GETs here, one shard per
        # partition.
        ROWS = [
            (eid, len(supported), len(usage),
             installation[0][3][0] if installation else None)
            for eid, supported, usage, installation in reg.EXTRACTORS
        ]

        def read(self, partition):
            yield from self.ROWS


@register(
    "scan_custom_source",
    oracle=f"""
    WITH extractors AS (SELECT * FROM {reg.extractors_values_sql()})
    SELECT id,
           CAST(len(supported_filetypes) AS INT) AS n_supported,
           CAST(len(usage) AS INT) AS n_usage,
           installation[1].packages[1] AS first_package
    FROM extractors
    """,
)
def scan_custom_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the registry through the custom Python DataSource and check
    it against the same fixture literals rendered as SQL -- proving the
    pluggable-source path delivers identical typed content."""
    if not HAVE_DATASOURCE_API:  # pragma: no cover - older Spark
        # graceful degradation: same result via the fixture DataFrame
        ex = reg.extractors_df(spark)
        return ex.select(
            "id",
            F.size("supported_filetypes").cast("int").alias("n_supported"),
            F.size("usage").cast("int").alias("n_usage"),
            F.try_element_at(
                F.try_element_at(F.col("installation"), F.lit(1)).getField("packages"),
                F.lit(1),
            ).alias("first_package"),
        )
    try:
        spark.dataSource.register(RegistryDataSource)
    except Exception:
        pass  # already registered in this session
    return spark.read.format("mdx_registry").load()
