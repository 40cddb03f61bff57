"""Registry ingestion from raw JSON (SURVEY.md §1.3): the reference
keeps registry payloads as parsed-but-untyped dicts
(__init__.py:104,123); this engine permits inferred/raw JSON only at the
ingestion boundary and immediately casts into declared StructTypes --
shape mismatches fail at analysis time instead of as KeyError at
runtime.

The fixture rows are raw JSON strings in the exact shape of
``GET /extractors/{id}`` responses (tests/test_mpr.py:77-95).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metadata_extractors_api_spark.registry import register
from metadata_extractors_api_spark.sources.registry import EXTRACTORS, EXTRACTORS_SCHEMA


def _entry_json(eid, supported, usage, installation) -> str:
    """Render one registry fixture row as its REST-payload JSON."""
    return json.dumps(
        {
            "id": eid,
            "supported_filetypes": [
                {"id": sid, "template": tpl} for sid, tpl in supported
            ],
            "usage": [
                {"method": m, "setup": s, "command": c} for m, s, c in usage
            ],
            "installation": [
                {
                    "method": m,
                    "requires_python": rp,
                    "requirements": rq,
                    "packages": pk,
                }
                for m, rp, rq, pk in installation
            ],
        },
        sort_keys=True,
    )


RAW_ENTRIES = [(_entry_json(*row),) for row in EXTRACTORS]


def _raw_values_sql() -> str:
    rows = ", ".join(
        "('" + payload.replace("'", "''") + "')" for (payload,) in RAW_ENTRIES
    )
    return f"(VALUES {rows}) AS raw(payload)"


@register(
    "scan_registry_json",
    oracle=f"""
    WITH raw AS (SELECT * FROM {_raw_values_sql()})
    SELECT json_extract_string(payload, '$.id') AS id,
           CAST(json_array_length(payload, '$.supported_filetypes') AS INT)
               AS n_supported,
           json_extract_string(payload, '$.usage[0].method') AS first_method,
           json_extract_string(payload, '$.installation[0].packages[0]')
               AS first_package
    FROM raw
    """,
)
def scan_registry_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw registry JSON -> declared StructType at the ingestion boundary
    (from_json with the full nested schema), then typed field access --
    the schema-first replacement for the reference's dict indexing."""
    raw = spark.createDataFrame(RAW_ENTRIES, "payload STRING")
    parsed = raw.select(
        F.from_json("payload", EXTRACTORS_SCHEMA).alias("e")
    )
    return parsed.select(
        F.col("e.id").alias("id"),
        F.size("e.supported_filetypes").cast("int").alias("n_supported"),
        F.col("e.usage").getItem(0).getField("method").alias("first_method"),
        F.col("e.installation")
        .getItem(0)
        .getField("packages")
        .getItem(0)
        .alias("first_package"),
    )
