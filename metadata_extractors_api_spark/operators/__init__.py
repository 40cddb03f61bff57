"""Operator modules. Importing this package populates the query registry."""

from metadata_extractors_api_spark.operators import relational  # noqa: F401
