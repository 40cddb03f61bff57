"""PySpark-native analytics engine with the capabilities of
marda-alliance/metadata_extractors_api, re-founded on DataFrames.

The reference (/root/reference/marda_extractors_api/__init__.py) is a
one-file-at-a-time metadata-extraction orchestrator; this engine exposes
each of its capabilities -- registry lookup, extractor matching, command
templating, extraction execution -- as set-oriented, Catalyst-optimized
DataFrame programs, plus the full relational / streaming / LLM-pipeline
operator surface catalogued in SURVEY.md §2.B.

Public surface:
    from metadata_extractors_api_spark import Engine, QUERIES, ORACLE
"""

from __future__ import annotations

from metadata_extractors_api_spark.registry import ORACLE, QUERIES

# Importing operator packages populates QUERIES/ORACLE.
from metadata_extractors_api_spark import operators  # noqa: E402,F401
from metadata_extractors_api_spark.engine import Engine  # noqa: E402

__all__ = ["Engine", "QUERIES", "ORACLE"]
