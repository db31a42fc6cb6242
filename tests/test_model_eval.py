"""Model-eval family: metric identities the oracle sweep can't see."""

from __future__ import annotations

from dateng_data_lakes_apache_spark_spark.registry import get_queries

from .conftest import SF_SMALL

QS = get_queries()


def test_confusion_totals_balance(spark):
    """Sum of per-class truth counts == sum of predicted counts ==
    corpus size, and tp <= min(n_true, n_pred) per class."""
    rows = QS["q_eval_confusion"](spark, SF_SMALL).collect()
    assert sum(r["n_true"] for r in rows) == sum(r["n_pred"] for r in rows)
    for r in rows:
        assert r["n_tp"] <= min(r["n_true"], r["n_pred"])
        assert 0.0 <= r["precision_"] <= 1.0 and 0.0 <= r["recall_"] <= 1.0


def test_calibration_bins_monotone_scores(spark):
    """Bin mean scores are strictly increasing across deciles, and the
    observed rate tracks the score direction overall (calibrated-ish
    scorer by construction)."""
    rows = sorted(
        QS["q_eval_calibration"](spark, SF_SMALL).collect(), key=lambda r: r["bin"]
    )
    means = [r["mean_score"] for r in rows]
    assert means == sorted(means)
    assert rows[-1]["observed_rate"] > rows[0]["observed_rate"]


def test_kappa_between_chance_and_perfect(spark):
    """~90% agreement by construction => kappa well above 0, below 1;
    and the po/pe/kappa identity holds."""
    r = QS["q_eval_kappa"](spark, SF_SMALL).first()
    assert 0.5 < r["kappa"] < 1.0
    assert abs((r["po"] - r["pe"]) / (1.0 - r["pe"]) - r["kappa"]) < 1e-12


def test_auc_matches_bruteforce_pairwise(spark):
    """Histogram AUC == brute-force Mann-Whitney over all (pos, neg)
    pairs (ties count half) on the small corpus."""
    from dateng_data_lakes_apache_spark_spark.operators.model_eval import _spark4
    from dateng_data_lakes_apache_spark_spark.catalog import table
    from pyspark.sql import functions as F

    h1, h9 = _spark4("doc_id", 1), _spark4("doc_id", 9)
    rows = (
        table(spark, SF_SMALL, "documents")
        .select(
            (F.expr(h1) % 1000).alias("s"),
            F.when(F.expr(h9) % 1000 < F.expr(h1) % 1000, 1).otherwise(0).alias("y"),
        )
        .collect()
    )
    pos = [r["s"] for r in rows if r["y"] == 1]
    neg = [r["s"] for r in rows if r["y"] == 0]
    num = sum(
        1.0 if p > n_ else (0.5 if p == n_ else 0.0) for p in pos for n_ in neg
    )
    brute = num / (len(pos) * len(neg))
    got = QS["q_eval_auc"](spark, SF_SMALL).first()["auc"]
    assert abs(got - brute) < 1e-12


def test_kaplan_meier_curve_properties(spark):
    """Survival is non-increasing from <=1; censoring makes KM sit at
    or above the naive all-observed ECDF survival (censored mass is
    never counted as death)."""
    rows = sorted(
        QS["q_kaplan_meier"](spark, SF_SMALL).collect(), key=lambda r: r["gap_10min"]
    )
    surv = [r["survival"] for r in rows]
    assert surv[0] <= 1.0 + 1e-9
    assert all(a >= b - 1e-9 for a, b in zip(surv, surv[1:]))
    n = sum(r["deaths"] + r["censored"] for r in rows)
    # naive ECDF survival treating everything as a death
    remaining = n
    for r in rows:
        remaining -= r["deaths"] + r["censored"]
        naive = remaining / n
        assert r["survival"] >= naive - 1e-9


def test_phi_tail_approximation_accuracy(spark):
    """The shared-text A&S normal tail is within 7.5e-8 of erfc/2."""
    import math

    from dateng_data_lakes_apache_spark_spark.operators.stats import _phi_tail_sql
    from pyspark.sql import functions as F

    rows = (
        spark.range(0, 50)
        .select((F.col("id") / 10.0).alias("z"))
        .withColumn("tail", F.expr(_phi_tail_sql("z")))
        .collect()
    )
    for r in rows:
        exact = 0.5 * math.erfc(r["z"] / math.sqrt(2.0))
        assert abs(r["tail"] - exact) < 7.5e-8


def test_bh_step_up_selects_on_constructed_effect(spark):
    """With one planted strong effect among nulls, BH must reject the
    planted segment (and the step-up cutoff logic must fire)."""
    from pyspark.sql import Window, functions as F

    # p-values: one tiny, rest uniform-ish above alpha/m thresholds
    pvals = [(0, 0.0001), (1, 0.40), (2, 0.55), (3, 0.70), (4, 0.90)]
    df = spark.createDataFrame(pvals, "seg int, p double")
    w = Window.orderBy("p", "seg")
    ranked = df.withColumn("rnk", F.row_number().over(w)).withColumn(
        "m", F.count(F.lit(1)).over(Window.partitionBy())
    )
    cutoff = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("p") <= F.col("rnk") * 0.10 / F.col("m"), F.col("rnk"))),
            F.lit(0),
        ).alias("k_star")
    ).first()["k_star"]
    assert cutoff == 1
    rejected = {
        r["seg"]
        for r in ranked.where(F.col("rnk") <= cutoff).collect()
    }
    assert rejected == {0}


def test_fdr_bh_no_false_discoveries_on_null_data(spark):
    """The testdata has uniform priority shares — BH must reject
    nothing (the whole point of the correction under 25 null tests)."""
    out = QS["q_fdr_bh"](spark, SF_SMALL).collect()
    assert len(out) == 25
    assert not any(r["bh_reject"] for r in out)
