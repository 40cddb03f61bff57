"""Runnable tour of the engine (python examples.py [sf_dir]).

Walks the main user journeys: SQL over the catalog, registered
operators, the extraction-dispatch pipeline, LLM data-pipeline ops, and
a streaming window -- printing small samples of each.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from metadata_extractors_api_spark import Engine, QUERIES  # noqa: E402
from metadata_extractors_api_spark.sources import files_df  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    eng = Engine(sf_dir=sf_dir)
    eng.spark.sparkContext.setLogLevel("ERROR")

    print("== SQL over the catalog ==")
    eng.sql(
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1"
    ).show()

    print("== Registered operator: TPC-H Q1 flagship ==")
    eng.query("agg_groupby").show(3)

    print("== The reference pipeline, set-oriented: extract_batch ==")
    eng.extract_batch(files_df(eng.spark)).select(
        "file_id", "extractor_id", "method", "rendered"
    ).show(truncate=False)

    print("== LLM ops: near-duplicate detection + similarity search ==")
    eng.query("dedup_minhash").show(3)
    eng.query("sim_topk").show(5)

    print("== Streaming: tumbling window over the event stream ==")
    eng.query("stream_tumbling").orderBy("window_start").show(3)

    print("== File-type detection (README.md:94): unlabeled files -> types ==")
    eng.query("extract_detect_filetype").orderBy("fname").show(truncate=False)

    print("== Registry testing mode (README.md:92-93): per-extractor sweep ==")
    eng.query("extract_test_sweep").orderBy("extractor_id").show()

    print("== Streaming-state observability: checkpoint state as a table ==")
    eng.query("stream_state_reader").orderBy("event_type").show()

    print("== REAL pixel path: decode -> resample -> channel stats ==")
    eng.query("multimodal_resize").orderBy("doc_id").show(3)

    print("== Paragraph-level dedup census (the CCNet shape) ==")
    eng.query("dedup_paragraphs").orderBy(
        "dup_frac_e6", ascending=False
    ).show(3)

    print("== Matryoshka truncation audit: 16-dim vs full retrieval ==")
    eng.query("embedding_matryoshka_audit").orderBy("qid").show()

    print("== IVF tuning curve: recall@5 vs candidate cost per nprobe ==")
    eng.query("sim_ann_recall_curve").orderBy("nprobe").show()

    print("== Markov removal-effect attribution (exact integer chain) ==")
    eng.query("events_markov_attribution").orderBy("channel").show()

    print("== Statistical gates: rank test + categorical independence ==")
    eng.query("dq_mann_whitney").show()
    eng.query("dq_chi2_independence").show()

    print("== Tokenizer planning: BPE compression + vocab coverage ==")
    eng.query("tokenizer_bpe_encode").orderBy("doc_id").show(3)
    eng.query("text_vocab_coverage_curve").orderBy("rank_k").show()

    print("== Winnowing fingerprints (MOSS) for substring near-copies ==")
    eng.query("text_winnowing_fingerprint").orderBy("doc_id", "fp").show(5)

    print("== Decode dead-letter routing through the real PPM parser ==")
    eng.query("multimodal_decode_errors").filter(
        "status <> 'ok'"
    ).orderBy("doc_id").show(5)

    print("== FFD sequence packing (512-token bins, per shard) ==")
    eng.query("pack_bin_ffd").orderBy("shard", "bin_id", "doc_id").show(5)

    print(f"done: see SURVEY.md §8 for the full {len(QUERIES)}-query inventory")


if __name__ == "__main__":
    main()
