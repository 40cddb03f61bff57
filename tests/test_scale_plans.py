"""Physical-plan assertions for the scale-technique operators: these
check the PLAN SHAPE, not just results -- the property that actually
transfers to a 1000-executor cluster."""

from __future__ import annotations

import metadata_extractors_api_spark as mdx


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    # At fixture scale Spark rightly broadcasts one side; disable
    # broadcast to surface the cluster-scale shape: a SortMergeJoin fed
    # directly by bucketed scans with NO exchange on either join key.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(mdx.QUERIES["join_bucketed"](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert plan.count("Bucketed: true") == 2
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan


def test_partitioned_scan_prunes(spark, sf_dir):
    df = mdx.QUERIES["sink_partitioned"](spark, sf_dir)
    plan = _plan(df)
    assert "PartitionFilters" in plan
    assert "l_returnflag" in plan.split("PartitionFilters")[1][:200]


def test_broadcast_join_in_multiway(spark, sf_dir):
    plan = _plan(mdx.QUERIES["join_multiway"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4


def test_limit_topk_uses_heap(spark, sf_dir):
    plan = _plan(mdx.QUERIES["limit_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_scan_parquet_prunes_columns(spark, sf_dir):
    plan = _plan(mdx.QUERIES["scan_parquet"](spark, sf_dir))
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" not in read_schema  # unprojected col absent


def test_cache_reuse_plan(spark, sf_dir):
    df = mdx.QUERIES["cache_reuse"](spark, sf_dir)
    plan = _plan(df)
    assert plan.count("InMemoryTableScan") >= 2  # both branches read cache
    rows = {r["l_returnflag"]: r["n"] for r in df.collect()}
    assert rows["ALL"] == sum(v for k, v in rows.items() if k != "ALL")


def test_filter_pred_pushdown(spark, sf_dir):
    plan = _plan(mdx.QUERIES["filter_pred"](spark, sf_dir))
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    # plan toString truncates long filter lists; assert on the prefix
    assert "IsNotNull(l_discount" in pushed
    assert "GreaterThanOrEqual(l_quantity" in pushed


def test_ann_probes_are_partition_pruned(spark, sf_dir):
    """Both ANN probes must read their materialized index with a static
    PartitionFilters IN-list — the plan that stays a pruned scan at any
    corpus size — and never a full-scan + post-filter."""
    for name, part_col in (("sim_ann_lsh", "bucket"), ("sim_ann_ivf", "cluster")):
        plan = _plan(mdx.QUERIES[name](spark, sf_dir))
        assert "PartitionFilters" in plan, name
        tail = plan.split("PartitionFilters")[1][:300]
        assert part_col in tail, (name, tail)
