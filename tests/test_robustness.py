"""Robustness-operator semantics: quarantine counts, schema-evolution
NULL-fill, checksum sensitivity."""

from __future__ import annotations

import metadata_extractors_api_spark as mdx


def test_csv_permissive_quarantines_exactly_the_bad_rows(spark, sf_dir):
    row = mdx.QUERIES["scan_csv_permissive"](spark, sf_dir).collect()[0]
    assert row["total"] == 4
    assert row["quarantined"] == 2  # the two malformed rows, job alive


def test_schema_evolution_null_fills_old_generation(spark, sf_dir):
    rows = {r["gen"]: r for r in mdx.QUERIES["scan_schema_evolution"](spark, sf_dir).collect()}
    assert rows[1]["n"] == 5 and rows[1]["n_with_new_col"] == 0
    assert rows[2]["n"] == 5 and rows[2]["n_with_new_col"] == 5


def test_checksum_is_stable_and_sensitive(spark, sf_dir):
    a = mdx.QUERIES["table_checksum"](spark, sf_dir).collect()[0]
    b = mdx.QUERIES["table_checksum"](spark, sf_dir).collect()[0]
    assert (a["checksum"], a["n_rows"]) == (b["checksum"], b["n_rows"])
    # sensitivity: checksum over a mutated table differs
    from pyspark.sql import functions as F

    from metadata_extractors_api_spark.catalog import load

    o = load(spark, sf_dir, "orders").withColumn(
        "o_totalprice", F.col("o_totalprice") + 0.01
    )
    o.createOrReplaceTempView("orders_mut")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"),
    )
    rowhash = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("bigint")
    mut = o.agg(F.sum(rowhash).cast("bigint").alias("checksum")).collect()[0]
    assert mut["checksum"] != a["checksum"]


def test_jsonl_salvages_partial_rows(spark, sf_dir):
    """A type-mismatched field must not discard the row's other fields
    (name survives when id fails), and malformed JSON must null the
    whole row with the raw line quarantined."""
    rows = mdx.QUERIES["scan_jsonl_corrupt"](spark, sf_dir).collect()
    by_name = {r["name"]: r for r in rows}
    assert by_name["gamma"]["id"] is None
    assert by_name["gamma"]["corrupt_raw"] is not None
    assert by_name["alpha"]["id"] == 1 and by_name["alpha"]["corrupt_raw"] is None
    n_corrupt = sum(r["corrupt_raw"] is not None for r in rows)
    assert n_corrupt == 3 and len(rows) == 6


def test_binary_files_bytes_survive_the_scan(spark, sf_dir):
    """binaryFile rows must carry the exact on-disk bytes (digest
    matches hashlib over the generator), the glob decoy must be pruned,
    and the zero-length file must be skipped (documented semantics)."""
    import hashlib

    from metadata_extractors_api_spark.sources.binary_files import (
        _BIN_FILES,
        _payload,
    )

    rows = {r["fname"]: r for r in mdx.QUERIES["scan_binary_files"](spark, sf_dir).collect()}
    assert "ignore.txt" not in rows
    assert "scan_000.bin" not in rows  # empty file yields no split
    expected = {
        name: (size, hashlib.md5(_payload(i, size)).hexdigest())
        for i, (name, size) in enumerate(_BIN_FILES)
        if size > 0
    }
    assert set(rows) == set(expected)
    for name, (size, digest) in expected.items():
        assert rows[name]["n_bytes"] == size
        assert rows[name]["digest"] == digest


def test_compaction_preserves_the_table_checksum(spark, sf_dir):
    """Compaction must be a pure physical rewrite: its post-compaction
    checksum/row count equal table_checksum's answer on the source
    table, and the file-count contract holds exactly."""
    row = mdx.QUERIES["sink_compaction"](spark, sf_dir).collect()[0]
    ref = mdx.QUERIES["table_checksum"](spark, sf_dir).collect()[0]
    assert row["n_rows"] == ref["n_rows"]
    assert row["checksum"] == ref["checksum"]
    assert row["files_before"] == 64 and row["files_after"] == 4


def test_parquet_footer_stats_match_duckdb_metadata(spark, sf_dir):
    """Value differential for the rows-only scan_parquet_footer_stats:
    the pyarrow footer read must agree field-for-field with DuckDB's
    independent parquet_metadata() implementation of the spec."""
    import duckdb

    got = sorted(
        tuple(r)
        for r in mdx.QUERIES["scan_parquet_footer_stats"](
            spark, sf_dir
        ).collect()
    )
    con = duckdb.connect()
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            SELECT CAST(row_group_id AS BIGINT),
                   path_in_schema,
                   CAST(any_value(row_group_num_rows) AS BIGINT),
                   CAST(any_value(total_compressed_size) AS BIGINT),
                   CAST(any_value(total_uncompressed_size) AS BIGINT)
            FROM parquet_metadata('{sf_dir}/lineitem.parquet')
            GROUP BY row_group_id, path_in_schema
            """
        ).fetchall()
    )
    assert got == want and len(got) >= 11
