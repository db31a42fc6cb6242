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
