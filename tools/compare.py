"""Self-check harness replicating the driver's DuckDB-oracle comparison:
row-count + schema (column names) + order-insensitive value comparison.

Usage:
    python tools/compare.py [--sf /root/testdata/sf0.01] [names...]

Exit code 0 iff every checked query matches exactly.
"""

from __future__ import annotations

import argparse
import datetime as dt
import math
import os
import sys

import duckdb

# Runnable from any cwd: the package lives one level above this file.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def canon_cell(v) -> str:
    """Canonical string for a single cell, representation-independent."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(v)
    if isinstance(v, bool):
        return "t" if v else "f"
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return canon_cell(v.item())
        if isinstance(v, np.ndarray):
            return canon_cell(list(v))
    except ImportError:
        pass
    return str(v)


def canon_rows(pdf) -> list[tuple[str, ...]]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(canon_cell(row[c]) for c in cols)
        for _, row in pdf[cols].iterrows()
    ]
    return sorted(rows)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    from metadata_extractors_api_spark.catalog import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def compare_one(spark, con, name: str, sf_dir: str) -> tuple[bool, str]:
    from metadata_extractors_api_spark import ORACLE, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    spdf = sdf.toPandas()
    if name not in ORACLE:
        return True, f"rows-only ({len(spdf)} rows)"
    opdf = con.execute(ORACLE[name]).df()
    s_cols, o_cols = sorted(spdf.columns), sorted(opdf.columns)
    if s_cols != o_cols:
        return False, f"SCHEMA spark={s_cols} oracle={o_cols}"
    if len(spdf) != len(opdf):
        return False, f"ROWCOUNT spark={len(spdf)} oracle={len(opdf)}"
    srows, orows = canon_rows(spdf), canon_rows(opdf)
    if srows != orows:
        diffs = [(a, b) for a, b in zip(srows, orows) if a != b]
        return False, f"VALUES {len(diffs)} differing rows; first: {diffs[0]}"
    return True, f"match ({len(spdf)} rows, {len(s_cols)} cols)"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--out",
        help=(
            "Write the sweep as a committed artifact. The file is written to "
            "OUT.tmp and atomically renamed to OUT only after the sweep "
            "finishes, and ONLY if it covered the FULL registry — a partial "
            "or mid-run sweep can never become an artifact (the round-6 "
            "snapshot-truncation gate; see VERDICT.md r6 'What's wrong' #1)."
        ),
    )
    args = ap.parse_args()

    from metadata_extractors_api_spark import QUERIES
    from metadata_extractors_api_spark.session import get_spark

    spark = get_spark(shuffle_partitions=8)
    con = duckdb_conn(args.sf)
    names = args.names or sorted(QUERIES)
    out_lines: list[str] = []
    failed = []
    for name in names:
        try:
            ok, msg = compare_one(spark, con, name, args.sf)
        except Exception as e:  # keep sweeping; report at end
            ok, msg = False, f"ERROR {type(e).__name__}: {str(e)[:300]}"
        status = "OK  " if ok else "FAIL"
        line = f"{status} {name}: {msg}"
        print(line, flush=True)
        out_lines.append(line)
        if not ok:
            failed.append(name)
    footer = f"{len(names) - len(failed)}/{len(names)} passed (registry={len(QUERIES)})"
    print(f"\n{footer}")
    if failed:
        print("failed:", " ".join(failed))
    if args.out:
        if set(names) != set(QUERIES):
            print(
                f"REFUSING --out {args.out}: sweep covered {len(names)} of "
                f"{len(QUERIES)} registered queries; artifacts must be full-registry."
            )
            return 1
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            f.write("\n".join(out_lines) + "\n\n" + footer + "\n")
        os.replace(tmp, args.out)
        print(f"wrote {args.out}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
