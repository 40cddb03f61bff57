"""Operator modules. Importing this package populates the query registry."""

from metadata_extractors_api_spark.operators import analytics  # noqa: F401
from metadata_extractors_api_spark.operators import corpus  # noqa: F401
from metadata_extractors_api_spark.operators import extended  # noqa: F401
from metadata_extractors_api_spark.operators import extras  # noqa: F401
from metadata_extractors_api_spark.operators import llm  # noqa: F401
from metadata_extractors_api_spark.operators import pipeline  # noqa: F401
from metadata_extractors_api_spark.operators import quality  # noqa: F401
from metadata_extractors_api_spark.operators import relational  # noqa: F401
from metadata_extractors_api_spark.operators import robustness  # noqa: F401
from metadata_extractors_api_spark.operators import scale  # noqa: F401
from metadata_extractors_api_spark.operators import spatial  # noqa: F401
from metadata_extractors_api_spark.operators import stats  # noqa: F401
from metadata_extractors_api_spark.operators import training  # noqa: F401
from metadata_extractors_api_spark.operators import udf  # noqa: F401
from metadata_extractors_api_spark.operators import udtf_ops  # noqa: F401
from metadata_extractors_api_spark.operators import workload  # noqa: F401
from metadata_extractors_api_spark import functions  # noqa: F401
from metadata_extractors_api_spark import streaming  # noqa: F401
from metadata_extractors_api_spark.plans import extract_batch  # noqa: F401
from metadata_extractors_api_spark.plans import detect_filetype  # noqa: F401
