"""Offline-snapshot registry fetch (VERDICT r7 "What's missing" #1):
the full two-endpoint fetch protocol exercised against fixture payloads
through an injected opener — zero network, per SURVEY §5.2 — and the
resulting snapshot driven through the REAL dispatch pipeline, which
must match the fixture-direct dispatch row for row."""

from __future__ import annotations

import os
import urllib.error

import pytest

from pyspark.sql import functions as F

from metadata_extractors_api_spark.plans.extract_batch import extract_batch
from metadata_extractors_api_spark.sources import registry as reg
from metadata_extractors_api_spark.sources.registry_fetch import (
    fetch_registry_snapshot,
    load_snapshot,
)
from metadata_extractors_api_spark.sources.registry_json import _entry_json


def _fixture_opener(base: str):
    """url -> bytes server replaying the reference's REST shapes from
    the registry fixtures."""
    import json

    ft_payload = {
        ft_id: {"data": {"description": desc, "registered_extractors": exs}}
        for ft_id, desc, exs in reg.FILETYPES
    }
    ex_payload = {
        row[0]: {"data": json.loads(_entry_json(*row))} for row in reg.EXTRACTORS
    }

    def opener(url: str) -> bytes:
        assert url.startswith(base + "/"), url
        kind, _, name = url[len(base) + 1 :].partition("/")
        table = {"filetypes": ft_payload, "extractors": ex_payload}[kind]
        if name not in table:
            raise urllib.error.HTTPError(url, 404, "Not Found", None, None)
        return json.dumps(table[name]).encode("utf-8")

    return opener


BASE = "https://registry.invalid/api/v0.3.0"


def test_snapshot_dispatch_matches_fixture_direct(spark, tmp_path):
    snap = fetch_registry_snapshot(
        ["biologic-mpr", "example-csv"],
        str(tmp_path / "snap"),
        base_url=BASE,
        opener=_fixture_opener(BASE),
    )
    ft, ex = load_snapshot(spark, snap)
    got = (
        extract_batch(spark, reg.files_df(spark), (ft, ex))
        .filter(F.col("extractor_id").isNotNull())
        .orderBy("file_id")
        .collect()
    )
    want = (
        extract_batch(spark, reg.files_df(spark))
        .filter(F.col("extractor_id").isNotNull())
        .orderBy("file_id")
        .collect()
    )
    assert got == want
    assert len(got) > 0


def test_fetch_error_messages_match_reference_shapes(tmp_path):
    opener = _fixture_opener(BASE)
    with pytest.raises(RuntimeError, match=r"Could not find file type 'nope'"):
        fetch_registry_snapshot(
            ["nope"], str(tmp_path / "s1"), base_url=BASE, opener=opener
        )
    # orphan-type exists but has no registered extractors
    with pytest.raises(RuntimeError, match=r"No extractors found for file type"):
        fetch_registry_snapshot(
            ["orphan-type"], str(tmp_path / "s2"), base_url=BASE, opener=opener
        )
    # a filetype listing an extractor the /extractors endpoint 404s on
    def broken(url: str) -> bytes:
        if "/extractors/" in url:
            raise urllib.error.HTTPError(url, 404, "Not Found", None, None)
        return opener(url)

    with pytest.raises(RuntimeError, match=r"Could not find extractor 'yadg'"):
        fetch_registry_snapshot(
            ["biologic-mpr"], str(tmp_path / "s3"), base_url=BASE, opener=broken
        )


def test_failed_fetch_leaves_no_partial_snapshot(tmp_path):
    out = str(tmp_path / "snap")
    calls = {"n": 0}
    good = _fixture_opener(BASE)

    def flaky(url: str) -> bytes:
        calls["n"] += 1
        if calls["n"] >= 3:  # fail mid-walk, after some successes
            raise urllib.error.HTTPError(url, 500, "boom", None, None)
        return good(url)

    with pytest.raises(RuntimeError):
        fetch_registry_snapshot(
            ["biologic-mpr", "example-csv"],
            out,
            base_url=BASE,
            opener=flaky,
        )
    assert not os.path.exists(out), "partial snapshot must not exist"
