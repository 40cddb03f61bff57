"""Data sources: registry fixtures (the reference's REST registry as
local, deterministic DataFrames) per FIXTURES.md §2."""

from metadata_extractors_api_spark.sources.registry import (
    extractors_df,
    files_df,
    filetypes_df,
)

__all__ = ["extractors_df", "files_df", "filetypes_df"]

from metadata_extractors_api_spark.sources import binary_files  # noqa: E402,F401
from metadata_extractors_api_spark.sources import registry_json  # noqa: E402,F401
from metadata_extractors_api_spark.sources import custom_source  # noqa: E402,F401
from metadata_extractors_api_spark.sources import stream_source  # noqa: E402,F401
from metadata_extractors_api_spark.sources import custom_sink  # noqa: E402,F401
from metadata_extractors_api_spark.sources import xml_source  # noqa: E402,F401
