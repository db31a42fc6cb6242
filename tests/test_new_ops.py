"""Semantic invariants for the round-3 extension operators — properties
the DuckDB hash parity implies but does not STATE (reconciliation,
disjointness, popcount consistency). Each is the one-line contract a
user of the operator relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from dateng_data_lakes_apache_spark_spark.catalog import table
from dateng_data_lakes_apache_spark_spark.registry import get_queries

QS = get_queries()


def test_penny_allocation_reconciles_every_order(spark, sf_dir):
    alloc = QS["q_penny_allocation"](spark, sf_dir)
    per_order = alloc.groupBy("l_orderkey").agg(
        F.sum("alloc_cents").alias("s")
    )
    orders = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("t"),
    )
    bad = per_order.join(orders, "l_orderkey").where(F.col("s") != F.col("t"))
    assert bad.count() == 0  # every order's cents reconcile exactly


def test_interval_coalesce_spans_are_disjoint(spark, sf_dir):
    spans = QS["q_interval_coalesce"](spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("start_us")
    overl = spans.select(
        "user_id",
        "start_us",
        F.lag("end_us").over(w).alias("prev_end"),
    ).where(F.col("prev_end").isNotNull() & (F.col("start_us") <= F.col("prev_end")))
    assert overl.count() == 0  # maximal spans never overlap or touch


def test_activity_bitmap_popcount_consistent(spark, sf_dir):
    bm = QS["q_activity_bitmap"](spark, sf_dir)
    bad = bm.where(
        (F.bit_count("day_mask") != F.col("n_active_days"))
        | (F.col("longest_streak") > F.col("n_active_days"))
        | (F.col("longest_streak") < 1)
    )
    assert bad.count() == 0


def test_bootstrap_ci_ordered_and_bracketing(spark, sf_dir):
    ci = QS["q_bootstrap_ci"](spark, sf_dir).collect()
    assert len(ci) > 0
    for r in ci:
        assert r.ci_lo <= r.ci_hi
        assert r.n_replicates == 50


def test_content_filter_rates_in_range(spark, sf_dir):
    cf = QS["q_content_filter"](spark, sf_dir)
    bad = cf.where(
        (F.col("drop_rate") < 0) | (F.col("drop_rate") > 1)
        | (F.col("n_dropped") > F.col("n_docs"))
    )
    assert bad.count() == 0


def test_record_linkage_separates_truth(spark, sf_dir):
    rows = QS["q_record_linkage"](spark, sf_dir).collect()
    by_verdict: dict[str, list] = {}
    for r in rows:
        by_verdict.setdefault(r.verdict, []).append(r)
    # every true match carries full agreement or one disagreement, and
    # the all-agree pattern must be classified 'match'
    full_agree = [r for r in rows if r.agree_name and r.agree_bal]
    assert full_agree and all(r.verdict == "match" for r in full_agree)
    # the model's false negatives are EXACTLY the doubly-perturbed
    # records (name mangled AND balance shifted -> both fields disagree,
    # indistinguishable from non-matches by construction): custkeys
    # divisible by lcm(14, 21) = 42 within the %7 dirty subset
    nm_true = sum(r.n_true_matches for r in by_verdict.get("non_match", []))
    expected_fn = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 42 == 0)
        .count()
    )
    assert nm_true == expected_fn


def test_asof_nearest_tolerance_and_direction(spark, sf_dir):
    rows = QS["q_join_asof_nearest"](spark, sf_dir).collect()
    assert rows
    matched = [r for r in rows if r.nearest_purchase_id is not None]
    assert matched  # the window must produce real matches
    for r in matched:
        assert 0 <= r.delta_us <= 3600 * 1_000_000
        assert r.direction in ("back", "fwd")
    for r in rows:
        if r.nearest_purchase_id is None:
            assert r.direction is None and r.delta_us is None


def test_quantile_normalize_marginal_is_reference(spark, sf_dir):
    out = QS["q_quantile_normalize"](spark, sf_dir)
    ref_vals = {
        r.value
        for r in table(spark, sf_dir, "events")
        .where(F.col("event_type") == "view")
        .select("value")
        .collect()
    }
    got = out.select("normalized_value").distinct().collect()
    assert got and all(r.normalized_value in ref_vals for r in got)
    # row count preserved: every source row gets exactly one mapping
    n_src = (
        table(spark, sf_dir, "events").where(F.col("event_type") == "error").count()
    )
    assert out.count() == n_src


def test_impute_missing_counts(spark, sf_dir):
    rows = QS["q_impute_missing"](spark, sf_dir).collect()
    c = table(spark, sf_dir, "customer")
    expected = (
        c.where(F.col("c_custkey") % 13 == 0)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("k"))
        .collect()
    )
    exp = {r.c_mktsegment: r.k for r in expected}
    assert {r.c_mktsegment: r.n_imputed for r in rows} == exp


def test_woe_iv_total_consistent(spark, sf_dir):
    rows = QS["q_woe_binning"](spark, sf_dir).collect()
    assert rows
    totals = {r.iv_total for r in rows}
    assert len(totals) == 1  # every band reports the same feature IV
    iv = totals.pop()
    assert iv >= 0  # IV is a sum of (p-q)ln(p/q) >= 0 terms
    assert abs(sum(r.iv_contrib for r in rows) - iv) < 1e-2  # 4dp rounding slack


def test_benford_rejects_synthetic_prices(spark, sf_dir):
    rows = QS["q_benford_audit"](spark, sf_dir).collect()
    assert len(rows) == 9
    assert all(r.benford_ok is False for r in rows)  # uniform prices fail
    assert abs(sum(r.observed for r in rows) - 1.0) < 1e-3


def test_substring_removal_plan_spans_valid(spark, sf_dir):
    rows = QS["q_substring_removal_plan"](spark, sf_dir).collect()
    assert rows  # planted near-dups guarantee cross-doc repeats
    for r in rows:
        assert r.start_word >= 1
        assert r.end_word >= r.start_word + 7  # at least one 8-word shingle
        assert r.n_shingles >= 1
