"""Tests for operators/quality.py: the scalable global-rank primitive,
the Gini identity, and the integrity/coverage audits."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

import metadata_extractors_api_spark as mdx
from metadata_extractors_api_spark.operators.quality import _global_rank


def test_global_rank_matches_single_window(spark, sf_dir):
    # The range-repartitioned two-phase rank must equal ROW_NUMBER over
    # a global order, for every row.
    from metadata_extractors_api_spark.catalog import load

    cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    )
    two_phase = _global_rank(cust, "v", "o_custkey").select("o_custkey", "i", "n")
    single = cust.select(
        "o_custkey",
        F.row_number().over(Window.orderBy("v", "o_custkey")).alias("i"),
    )
    joined = two_phase.join(single.withColumnRenamed("i", "i_ref"), "o_custkey")
    assert joined.filter(F.col("i") != F.col("i_ref")).count() == 0
    n = cust.count()
    assert two_phase.select(F.max("n")).first()[0] == n
    assert two_phase.select(F.countDistinct("i")).first()[0] == n


def test_global_rank_plan_has_parallel_windows(spark, sf_dir):
    # The data-sized window must be partitioned by _pid (parallel); a
    # plan that sorts everything into one partition would show a
    # partition-less data-sized Window.
    from metadata_extractors_api_spark.catalog import load

    cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    )
    plan = (
        _global_rank(cust, "v", "o_custkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower()
    assert "partitionBy=[_pid" in plan.replace(" ", "").replace(
        "partitionspec", "partitionBy"
    ) or "_pid" in plan


def test_revenue_gini_bounds(spark, sf_dir):
    row = mdx.QUERIES["revenue_gini"](spark, sf_dir).first()
    assert row["n_cust"] > 0
    assert 0.0 <= row["gini"] < 1.0


def test_dq_referential_integrity_clean_fixture(spark, sf_dir):
    rows = {
        r["relation"]: r
        for r in mdx.QUERIES["dq_referential_integrity"](spark, sf_dir).collect()
    }
    assert set(rows) == {
        "lineitem->orders",
        "lineitem->part",
        "lineitem->supplier",
        "orders->customer",
    }
    # The generated fixtures are referentially clean; a nonzero orphan
    # count would mean the anti-join condition is wrong.
    for r in rows.values():
        assert r["orphans"] == 0
        assert r["fk_rows"] > 0


def test_quantile_bins_are_balanced(spark, sf_dir):
    rows = mdx.QUERIES["feature_quantile_bin"](spark, sf_dir).collect()
    assert [r["bin"] for r in rows] == list(range(10))
    total = sum(r["n"] for r in rows)
    for r in rows:
        assert r["n"] >= total // 20  # every decile within 2x of uniform
        assert r["lo"] <= r["hi"]


def test_oov_rate_with_full_vocab_is_zero(spark, sf_dir):
    # At sf0.001 the corpus vocabulary is small; whatever the bucket
    # distribution, rates must be valid and token totals must add up.
    rows = mdx.QUERIES["text_oov_rate"](spark, sf_dir).collect()
    assert all(0.0 <= r["oov_bucket"] <= 1.0 for r in rows)
    assert sum(r["n_docs"] for r in rows) > 0


def test_rolling_median_order_statistics_invariants(spark, sf_dir):
    # med7 and p90_7 are order statistics of the SAME frame, so
    # med7 <= p90_7 everywhere, and both must be actual elements
    # drawn from the partition's value domain (discrete quantile,
    # no interpolation): every med7 value appears as some row value.
    df = mdx.QUERIES["win_rolling_median"](spark, sf_dir)
    assert df.filter(F.col("med7") > F.col("p90_7")).count() == 0
    vals = df.select(F.col("value").alias("v")).distinct()
    orphans = (
        df.select(F.col("med7").alias("v"))
        .distinct()
        .join(vals, "v", "left_anti")
        .count()
    )
    assert orphans == 0


def test_repeat_interval_gaps_nonnegative(spark, sf_dir):
    rows = mdx.QUERIES["orders_repeat_interval"](spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r["gap_days"] >= 0 for r in rows)


def test_ivm_merge_equals_full_recompute(spark, sf_dir):
    # merge(state(snapshot), state(delta)) must equal state(all) --
    # compared against a direct full aggregate, not just the oracle.
    from metadata_extractors_api_spark.catalog import load

    merged = {
        r["o_orderpriority"]: (r["n"], r["total_cents"])
        for r in mdx.QUERIES["ivm_merge_agg"](spark, sf_dir).collect()
    }
    full = {
        r["o_orderpriority"]: (r["n"], r["total_cents"])
        for r in load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("total_cents"),
        )
        .collect()
    }
    assert merged == full


def test_markov_transition_rows_sum_to_one(spark, sf_dir):
    rows = mdx.QUERIES["events_markov_transition"](spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], 0.0)
        by_src[r["src"]] += r["p"]
    for src, total in by_src.items():
        assert abs(total - 1.0) < 1e-4, (src, total)


def test_new_plus_returning_equals_actives(spark, sf_dir):
    from metadata_extractors_api_spark.catalog import load

    rows = mdx.QUERIES["events_new_vs_returning"](spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events")
    actives = {
        r["month"]: r["mau"]
        for r in ev.groupBy(F.date_format("ts", "yyyy-MM").alias("month"))
        .agg(F.countDistinct("user_id").alias("mau"))
        .collect()
    }
    for r in rows:
        assert r["new_users"] + r["returning_users"] == actives[r["month"]]
    # every user is new exactly once
    total_new = sum(r["new_users"] for r in rows)
    assert total_new == ev.select("user_id").distinct().count()


def test_global_cumsum_matches_single_window(spark, sf_dir):
    from metadata_extractors_api_spark.catalog import load
    from metadata_extractors_api_spark.operators.quality import _global_cumsum

    li = (
        load(spark, sf_dir, "lineitem")
        .select(
            F.concat_ws("-", "l_orderkey", "l_linenumber").alias("k"),
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("v"),
            F.col("l_quantity").cast("bigint").alias("w"),
        )
    )
    # join on (v, k): k alone repeats in the fixture (l_linenumber is
    # not a per-order counter), but (v, k) is unique, which is also
    # what makes the cumsum's sort order total.
    two = _global_cumsum(li, "v", "k", "w").select("k", "v", "cw", "tw")
    ref_w = Window.orderBy("v", "k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref = li.select("k", "v", F.sum("w").over(ref_w).alias("cw_ref"))
    joined = two.join(ref, ["k", "v"])
    assert joined.filter(F.col("cw") != F.col("cw_ref")).count() == 0
    total = li.agg(F.sum("w")).first()[0]
    assert two.select(F.max("tw")).first()[0] == total


def test_uniqueness_audit_keys_hold_on_fixtures(spark, sf_dir):
    rows = {r["key_name"]: r
            for r in mdx.QUERIES["dq_uniqueness_audit"](spark, sf_dir).collect()}
    from metadata_extractors_api_spark.catalog import load
    assert rows["orders.o_orderkey"]["n_rows"] == load(spark, sf_dir, "orders").count()
    # Truly-unique PKs audit clean...
    for k in ("orders.o_orderkey", "documents.doc_id", "events.event_id",
              "customer.c_custkey"):
        assert rows[k]["max_rows_per_key"] == 1
        assert rows[k]["n_keys"] == rows[k]["n_rows"]
    # ...and the audit DETECTS the fixture's real duplication: the
    # synthetic generator reuses line numbers, so lineitem's textbook
    # composite key is NOT unique here — exactly the silent
    # row-multiplier this audit exists to surface.
    li = rows["lineitem.(l_orderkey,l_linenumber)"]
    assert li["max_rows_per_key"] > 1
    assert li["n_keys"] < li["n_rows"]


def test_backlog_sweepline_conserves_orders(spark, sf_dir):
    out = mdx.QUERIES["orders_backlog_sweepline"](spark, sf_dir).cache()
    # Every order opens and closes: net changes sum to zero, the curve
    # ends at zero, and never goes negative.
    assert out.agg(F.sum("net_change")).first()[0] == 0
    assert out.orderBy(F.desc("day")).first()["open_at_eod"] == 0
    assert out.filter(F.col("open_at_eod") < 0).count() == 0


def test_null_safe_join_pairs_nulls(spark, sf_dir):
    from metadata_extractors_api_spark.catalog import load
    out = {r["match_class"]: r["n_pairs"]
           for r in mdx.QUERIES["join_null_safe_classes"](spark, sf_dir).collect()}
    o = load(spark, sf_dir, "orders")
    na = o.filter((F.col("o_orderkey") % 3 == 0)
                  & (F.col("o_orderkey") % 97 == 0)).count()
    nb = o.filter((F.col("o_orderkey") % 3 == 1)
                  & (F.col("o_orderkey") % 89 == 0)).count()
    assert out.get("null-null", 0) == na * nb
    assert out.get("val-val", 0) > 0


def test_trailing7d_dominates_daily_actives(spark, sf_dir):
    from metadata_extractors_api_spark.catalog import load
    out = mdx.QUERIES["events_active_users_trailing7d"](spark, sf_dir)
    ev = load(spark, sf_dir, "events")
    daily = ev.select(
        F.floor(F.col("ts").cast("long") / 86400).cast("bigint").alias("report_day"),
        "user_id",
    ).groupBy("report_day").agg(F.countDistinct("user_id").alias("d1"))
    j = out.join(daily, "report_day")
    assert j.filter(F.col("active_users_7d") < F.col("d1")).count() == 0


def test_fulfillment_lag_is_plausible(spark, sf_dir):
    from metadata_extractors_api_spark.catalog import load
    rows = mdx.QUERIES["orders_fulfillment_lag"](spark, sf_dir).collect()
    li_n = load(spark, sf_dir, "lineitem").count()
    assert sum(r["n_lines"] for r in rows) == li_n  # every line has an order
    for r in rows:
        assert r["min_days"] <= r["max_days"]
        assert r["n_lines"] * r["min_days"] <= r["total_days"] <= r["n_lines"] * r["max_days"]


def test_ab_assignment_is_stable_and_balanced(spark, sf_dir):
    from metadata_extractors_api_spark.catalog import load
    out = {r["arm"]: r for r in mdx.QUERIES["events_ab_test_lift"](spark, sf_dir).collect()}
    n_users = load(spark, sf_dir, "events").select("user_id").distinct().count()
    assert set(out) == {"control", "treatment"}
    assert out["control"]["n_users"] + out["treatment"]["n_users"] == n_users
    # md5 parity splits within 20% of even on any non-trivial population.
    ratio = out["control"]["n_users"] / n_users
    assert 0.3 < ratio < 0.7
    for r in out.values():
        assert 0 <= r["n_converted"] <= r["n_users"]
        assert r["conv_rate_e6"] == r["n_converted"] * 1_000_000 // r["n_users"]
