"""One-decade scale stress (BENCH.md 'One-decade scale stress' table).

Tiles sf0.1 10x into a scratch directory — key domains shifted per
copy so entity counts scale like TPC-H sf (10x customers / suppliers /
users / docs), document token space remapped per copy (suffix _i) so
the dedup workload scales in VOLUME rather than acquiring adversarial
10-way duplicate families — then times the given queries at both
scales in ONE session (warm run + timed run per scale).

Usage:
    PYTHONPATH=. python tools/stress_sf1.py [--dest /tmp/sf1] [names...]

Default names = the BENCH.md decade-table set. Wall times print as one
JSON line; shuffle-byte metrics need a UI-enabled session (see
BENCH.md notes) and are omitted here to keep the tool dependency-free.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

DEFAULT = [
    "graph_kcore",
    "events_markov_attribution",
    "dedup_jaccard_prefix",
    "dedup_containment",
    "dedup_sorted_neighborhood",
    "graph_hits",
    "dedup_cluster_medoid",
    "text_keyphrase_textrank",
    "tokenizer_bpe_train",
]

COPIES = 10
OFF = 100_000_000  # per-copy key offset, far above any sf0.1 id


def build_sf1(spark, src: str, dst: str) -> None:
    from pyspark.sql import functions as F

    def tiled(table, idcols, textmap=False):
        out_path = f"{dst}/{table}.parquet"
        if os.path.exists(out_path):
            return
        d = spark.read.parquet(f"{src}/{table}.parquet")
        outs = []
        for i in range(COPIES):
            c = d
            for col in idcols:
                c = c.withColumn(col, F.col(col) + F.lit(i * OFF))
            if textmap:
                c = c.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split("text", " "),
                            lambda x, i=i: F.concat(x, F.lit(f"_{i}")),
                        ),
                        " ",
                    ),
                )
            outs.append(c)
        u = outs[0]
        for o in outs[1:]:
            u = u.unionByName(o)
        u.repartition(32).write.mode("overwrite").parquet(out_path)

    tiled("orders", ["o_orderkey", "o_custkey"])
    tiled("lineitem", ["l_orderkey", "l_suppkey", "l_partkey"])
    tiled("events", ["event_id", "user_id"])
    tiled("documents", ["doc_id"], textmap=True)
    # embeddings tile with duplicated vectors across copies: the
    # semantic-dedup decade then exercises the SEM_CLUSTER_CAP
    # quarantine contract (K fixed while N grows 10x — every cluster
    # exceeds the cap, by design; SemDeDup's prescription is to scale
    # K with N, which restores the pairwise phase)
    tiled("embeddings", ["vec_id"])
    # entity dims scale with SF; nation is the fixed 25-row dimension
    tiled("customer", ["c_custkey"])
    tiled("supplier", ["s_suppkey"])
    for fixed in ("nation", "region"):
        out_path = f"{dst}/{fixed}.parquet"
        if not os.path.exists(out_path):
            spark.read.parquet(f"{src}/{fixed}.parquet").write.mode(
                "overwrite"
            ).parquet(out_path)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--dest", default="/tmp/sf1")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    names = args.names or DEFAULT

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from metadata_extractors_api_spark import QUERIES
    from metadata_extractors_api_spark.session import get_spark

    spark = get_spark(app_name="mdx-sf1-stress")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.dest, exist_ok=True)
    build_sf1(spark, args.src, args.dest)

    def run(name, sf):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def check_semantic_decade(sf):
        """Adaptive-K contract at the decade: K = ceil(N/SEM_TARGET)
        keeps clusters bounded, so the pairwise phase EXECUTES (not a
        quarantine census) and no surviving cluster exceeds the cap."""
        from pyspark.sql import functions as F

        from metadata_extractors_api_spark.operators.pipeline import (
            SEM_CLUSTER_CAP,
        )

        r = (
            QUERIES["dedup_semantic_cluster"](spark, sf)
            .groupBy("action")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.max("n_members").alias("max_members"),
            )
            .collect()
        )
        by = {row["action"]: row for row in r}
        n_q = by["quarantine"]["n"] if "quarantine" in by else 0
        n_tot = sum(row["n"] for row in r)
        assert n_q < n_tot, "decade run degenerated to a quarantine census"
        max_kept = max(
            (by[a]["max_members"] for a in ("keep", "prune") if a in by),
            default=0,
        )
        assert max_kept <= SEM_CLUSTER_CAP
        print(
            f"semantic decade: quarantine {n_q}/{n_tot} rows, "
            f"max surviving cluster {max_kept} <= cap {SEM_CLUSTER_CAP}",
            file=sys.stderr,
            flush=True,
        )

    out = {}
    for name in names:
        run(name, args.src)
        a = run(name, args.src)
        run(name, args.dest)
        c = run(name, args.dest)
        out[name] = {
            "sf0.1_s": round(a, 2),
            "sf1_s": round(c, 2),
            "ratio": round(c / a, 2),
        }
        if name == "dedup_semantic_cluster":
            check_semantic_decade(args.dest)
        print(name, out[name], file=sys.stderr, flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
