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


def _register_pickle_by_value() -> None:
    """Serialize this package's functions BY VALUE into UDF closures.

    The driver (and any real cluster) runs Python workers that do not
    have this repo on their import path; cloudpickle's default
    by-reference serialization of module-level helpers would make every
    worker try ``import metadata_extractors_api_spark`` and die. By-value
    registration ships the code inside the pickled closure instead --
    the same mechanism spark-submit users rely on when they cannot
    distribute an egg/wheel to executors.
    """
    import sys

    try:
        from pyspark import cloudpickle
    except ImportError:  # pragma: no cover - cloudpickle moved
        try:
            from pyspark.serializers import cloudpickle  # type: ignore
        except ImportError:
            return
    if not hasattr(cloudpickle, "register_pickle_by_value"):
        return
    for name, mod in list(sys.modules.items()):
        if name.startswith(__name__) and mod is not None:
            try:
                cloudpickle.register_pickle_by_value(mod)
            except Exception:
                pass


_register_pickle_by_value()

__all__ = ["Engine", "QUERIES", "ORACLE"]
