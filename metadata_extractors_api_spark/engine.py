"""Session-level API: the port of the reference's three entry points
(SURVEY.md §3): extract() -> Engine.extract_batch (set-oriented),
plus Engine.sql / Engine.query / Engine.stream surfaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from metadata_extractors_api_spark import catalog
from metadata_extractors_api_spark.registry import QUERIES
from metadata_extractors_api_spark.session import get_spark


class Engine:
    """Thin facade over a SparkSession + the query registry."""

    def __init__(self, spark: SparkSession | None = None, sf_dir: str | None = None):
        self.spark = spark or get_spark()
        self.sf_dir = sf_dir
        if sf_dir:
            catalog.register_views(self.spark, sf_dir)

    def sql(self, text: str) -> DataFrame:
        """ANSI SQL passthrough over the registered fixture views."""
        return self.spark.sql(text)

    def query(self, name: str, sf_dir: str | None = None) -> DataFrame:
        """Run a registered operator query by name."""
        d = sf_dir or self.sf_dir
        if d is None:
            raise ValueError("sf_dir required (no default registered)")
        return QUERIES[name](self.spark, d)

    def table(self, name: str, sf_dir: str | None = None) -> DataFrame:
        d = sf_dir or self.sf_dir
        if d is None:
            raise ValueError("sf_dir required")
        return catalog.load(self.spark, d, name)

    def extract_batch(self, files_df: DataFrame, registry_df=None, **kw) -> DataFrame:
        """Set-oriented port of the reference's extract() pipeline
        (A3-A9 composed as one DataFrame program). See plans.extract_batch."""
        from metadata_extractors_api_spark.plans.extract_batch import extract_batch

        return extract_batch(self.spark, files_df, registry_df, **kw)
