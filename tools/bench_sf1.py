"""sf1 core-scaling tier (BENCH.md 'sf1 core-scaling' table, round 11).

The 8-vs-32-core ratios of the sf0.1 bench are non-diagnostic: per-query
medians there are 0.1-3 s, dominated by job-scheduling and state-store
fixed overhead, so nearly every ratio reads ~1 regardless of how the
operator actually scales. This tool times the slowest headliners at sf1
(the tiled-decade fixture from tools/stress_sf1.build_sf1 — 10x sf0.1
with shifted key domains) at the env-specified core count, where compute
is large enough that a ratio ~1 means a genuinely serial path.

Usage (run once per core count, compare the two JSON lines):

    PYTHONPATH=. SPARK_GRAFT_CPUS=32 python tools/bench_sf1.py
    PYTHONPATH=. SPARK_GRAFT_CPUS=8  python tools/bench_sf1.py

Prints ONE JSON line {"cpus": N, "sf": "1(tiled)", "queries": {...},
"spread": {...}} — warm-up + median of 3 noop-sink runs per query, the
bench.py methodology at a smaller sample count (sf1 runs are long).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

#: The 20 slowest headliners of BENCH_r10 (driver medians at sf0.1) —
#: the tier where core-scaling data is worth the wall-clock.
TOP20 = [
    "graph_hits",
    "stream_markov_transition",
    "stream_scd2_build",
    "tokenizer_unigram_em_train",
    "dedup_semantic_boundary_audit",
    "tokenizer_unigram_prune",
    "dedup_cluster_medoid",
    "graph_kcore",
    "dedup_semantic_apply",
    "dedup_semantic_cluster",
    "stream_shard_router",
    "stream_hll_distinct",
    "tokenizer_viterbi_segment",
    "dedup_jaccard_prefix",
    "stream_ohlc_bars",
    "dedup_semantic_multiprobe_audit",
    "dedup_semantic_recall_audit",
    "stream_cms_heavy_hitters",
    "tokenizer_wordpiece_encode",
    "tokenizer_unigram_em_step",
]

RUNS = 3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=None)
    ap.add_argument("--dest", default="/tmp/sf1")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    names = args.names or TOP20

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from metadata_extractors_api_spark import QUERIES
    from metadata_extractors_api_spark.session import get_spark
    from tools.stress_sf1 import build_sf1

    spark = get_spark(app_name="mdx-sf1-corescale")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.dest, exist_ok=True)
    build_sf1(spark, args.src, args.dest)

    def run(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, args.dest).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    results: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"sf1:{name}")
        run(name)  # warm-up
        samples = [run(name) for _ in range(RUNS)]
        results[name] = round(statistics.median(samples), 4)
        spread[name] = [round(min(samples), 4), round(max(samples), 4)]

    print(
        json.dumps(
            {
                "metric": "sf1_corescale",
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
                "sf": "1(tiled)",
                "runs": RUNS,
                "warmup": 1,
                "load1_at_start": round(os.getloadavg()[0], 2),
                "queries": results,
                "spread": spread,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
