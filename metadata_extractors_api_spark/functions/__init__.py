"""Scalar-function surface (SURVEY.md §2.B.8) and reference-fidelity
string logic (command templating A8, call-string parsing A10)."""

from metadata_extractors_api_spark.functions import scalar  # noqa: F401
from metadata_extractors_api_spark.functions.callparse import prepare_python_call
from metadata_extractors_api_spark.functions.template import apply_template_args

__all__ = ["apply_template_args", "prepare_python_call"]
