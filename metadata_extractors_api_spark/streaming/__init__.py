"""Structured Streaming surface (SURVEY.md §2.B.9)."""

from metadata_extractors_api_spark.streaming import windows  # noqa: F401
from metadata_extractors_api_spark.streaming import tws  # noqa: F401
from metadata_extractors_api_spark.streaming import incremental  # noqa: F401
from metadata_extractors_api_spark.streaming import state_reader  # noqa: F401
