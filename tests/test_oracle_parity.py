"""Oracle-differential tests (SURVEY.md §5.2 item 2): every sql-class
query must hash-match DuckDB exactly at sf0.001 — the same check the
driver runs at sf0.01."""

from __future__ import annotations

import pytest

import metadata_extractors_api_spark as mdx
from tools.compare import compare_one


def all_query_names() -> list[str]:
    return sorted(mdx.QUERIES)


@pytest.mark.parametrize("name", all_query_names())
def test_query_matches_oracle(spark, oracle_con, sf_dir, name):
    ok, msg = compare_one(spark, oracle_con, name, sf_dir)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.queries()) >= set(e.oracle_sql())
