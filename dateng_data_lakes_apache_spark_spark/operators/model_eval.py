"""Model-evaluation operators: confusion-matrix metrics, calibration
bins, inter-annotator agreement, ROC-AUC, regression error, and
ranking quality (NDCG/MRR) — the measurement half of a training-data
pipeline (every classifier/labeler/ranker feeding a corpus needs these
reports).

Predictions/scores are derived deterministically from md5 of the doc id
(the engine's cross-engine hash: ``conv`` on Spark, hex-digit instr
arithmetic on DuckDB — the q_split_train_test pattern), simulating a
noisy labeler against the ``lang`` column as ground truth. The
derivation is part of the query contract; every ratio is a single
BIGINT/BIGINT → DOUBLE division, so both engines agree bit-for-bit.

Scale design: each metric is ONE hash aggregation over a narrow
projection (truth, prediction) — map-side combined, shuffle bounded by
|classes|² or |bins|, never by the corpus. At 100 TB these reports ride
a corpus scan for free.

Reference scope: the reference ETL (etl.py:91-226) has no evaluation
operators; beyond-contract lake surface (SURVEY §2.4 extension wave).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..common import md5_hex4_duck as _duck4
from ..common import md5_hex4_spark as _spark4
from ..registry import query

_LANGS = "'de','en','es','fr','zh'"


def _pred_sql(h4) -> str:
    """Noisy labeler: ~10% of docs get a uniformly-chosen other class."""
    flip = f"({h4('doc_id', 1)} % 10 = 0)"
    other = f"[{_LANGS}][CAST({h4('doc_id', 5)} % 5 AS INT) + 1]"
    return f"(CASE WHEN {flip} THEN {other} ELSE lang END)"


# DuckDB list indexing is [..][i]; Spark's is array(..)[i-1] — build per
# dialect from the same recipe.
_PRED_DUCK = _pred_sql(_duck4)
_PRED_SPARK = (
    f"(CASE WHEN ({_spark4('doc_id', 1)} % 10 = 0)"
    f" THEN array({_LANGS})[CAST({_spark4('doc_id', 5)} % 5 AS INT)]"
    f" ELSE lang END)"
)


@query(
    "q_eval_confusion",
    oracle=f"""
    WITH scored AS (SELECT lang AS truth, {_PRED_DUCK} AS pred FROM documents),
    tp AS (
      SELECT truth AS class, COUNT(*) AS n_tp FROM scored
      WHERE truth = pred GROUP BY truth
    ),
    t AS (SELECT truth AS class, COUNT(*) AS n_true FROM scored GROUP BY truth),
    p AS (SELECT pred AS class, COUNT(*) AS n_pred FROM scored GROUP BY pred)
    SELECT t.class,
           CAST(t.n_true AS BIGINT) AS n_true,
           CAST(COALESCE(p.n_pred, 0) AS BIGINT) AS n_pred,
           CAST(COALESCE(tp.n_tp, 0) AS BIGINT) AS n_tp,
           CAST(COALESCE(tp.n_tp, 0) AS DOUBLE) / p.n_pred AS precision_,
           CAST(COALESCE(tp.n_tp, 0) AS DOUBLE) / t.n_true AS recall_
    FROM t LEFT JOIN p ON t.class = p.class LEFT JOIN tp ON t.class = tp.class
    ORDER BY t.class
    """,
)
def q_eval_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall of a simulated noisy labeler against
    the lang ground truth.

    Three tiny hash aggs over one (truth, pred) projection, joined on
    the |classes|-row class table — the corpus is scanned once and the
    shuffle carries class counts only. Ratios are single BIGINT→DOUBLE
    divisions (no float accumulation to diverge on).
    """
    scored = table(spark, sf_dir, "documents").select(
        F.col("lang").alias("truth"), F.expr(_PRED_SPARK).alias("pred")
    )
    tp = (
        scored.where(F.col("truth") == F.col("pred"))
        .groupBy(F.col("truth").alias("class"))
        .agg(F.count(F.lit(1)).alias("n_tp"))
    )
    t = scored.groupBy(F.col("truth").alias("class")).agg(
        F.count(F.lit(1)).alias("n_true")
    )
    p = scored.groupBy(F.col("pred").alias("class")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    return (
        t.join(p, "class", "left")
        .join(tp, "class", "left")
        .select(
            "class",
            "n_true",
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("n_tp", F.lit(0)).alias("n_tp"),
            (F.coalesce("n_tp", F.lit(0)).cast("double") / F.col("n_pred")).alias(
                "precision_"
            ),
            (F.coalesce("n_tp", F.lit(0)).cast("double") / F.col("n_true")).alias(
                "recall_"
            ),
        )
        .orderBy("class")
    )


@query(
    "q_eval_calibration",
    oracle=f"""
    WITH scored AS (
      SELECT {_duck4('doc_id', 1)} % 1000 AS s1000,
             CASE WHEN {_duck4('doc_id', 9)} % 1000 < {_duck4('doc_id', 1)} % 1000
                  THEN 1 ELSE 0 END AS y
      FROM documents
    )
    SELECT CAST((s1000 - s1000 % 100) / 100 AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(s1000) AS DOUBLE) / (1000.0 * COUNT(*)) AS mean_score,
           CAST(SUM(y) AS DOUBLE) / COUNT(*) AS observed_rate,
           abs(CAST(SUM(s1000) AS DOUBLE) / (1000.0 * COUNT(*))
               - CAST(SUM(y) AS DOUBLE) / COUNT(*)) AS gap
    FROM scored
    GROUP BY 1
    ORDER BY bin
    """,
)
def q_eval_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram: decile bins of predicted score vs observed
    positive rate, with the per-bin calibration gap.

    Scores stay INTEGER micro-units (s/1000) until the final division,
    so bin sums are exact bigints and the two divisions per bin are the
    only float ops — one hash agg, |bins| output rows.
    """
    h1 = _spark4("doc_id", 1)
    h9 = _spark4("doc_id", 9)
    scored = table(spark, sf_dir, "documents").select(
        (F.expr(h1) % 1000).alias("s1000"),
        F.when(F.expr(h9) % 1000 < F.expr(h1) % 1000, 1).otherwise(0).alias("y"),
    )
    grouped = scored.groupBy(
        F.expr("CAST(s1000 div 100 AS INT)").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("s1000").alias("ss"),
        F.sum("y").alias("sy"),
    )
    mean_score = F.col("ss").cast("double") / (F.lit(1000.0) * F.col("n"))
    observed = F.col("sy").cast("double") / F.col("n")
    return grouped.select(
        "bin",
        "n",
        mean_score.alias("mean_score"),
        observed.alias("observed_rate"),
        F.abs(mean_score - observed).alias("gap"),
    ).orderBy("bin")


@query(
    "q_eval_kappa",
    oracle=f"""
    WITH marks AS (
      SELECT lang AS a1, {_PRED_DUCK} AS a2 FROM documents
    ),
    agree AS (SELECT COUNT(*) AS n, SUM(CASE WHEN a1 = a2 THEN 1 ELSE 0 END) AS n_agree FROM marks),
    m1 AS (SELECT a1 AS class, COUNT(*) AS c1 FROM marks GROUP BY a1),
    m2 AS (SELECT a2 AS class, COUNT(*) AS c2 FROM marks GROUP BY a2),
    chance AS (
      SELECT SUM(CAST(COALESCE(c1, 0) AS BIGINT) * CAST(COALESCE(c2, 0) AS BIGINT)) AS pe_num
      FROM m1 FULL OUTER JOIN m2 ON m1.class = m2.class
    )
    SELECT CAST(n AS BIGINT) AS n_items,
           CAST(n_agree AS BIGINT) AS n_agree,
           CAST(n_agree AS DOUBLE) / n AS po,
           CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n) AS pe,
           (CAST(n_agree AS DOUBLE) / n - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n))
             / (1.0 - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * n)) AS kappa
    FROM agree, chance
    """,
)
def q_eval_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the ground-truth labels and the simulated
    annotator: observed agreement corrected for chance.

    All counts stay integer until three final divisions (po, pe, kappa)
    over the same operands in the same expression tree — IEEE-identical
    across engines. Two class-marginal aggs + one corpus agg; the
    |classes|-row marginal join computes the chance term.
    """
    marks = table(spark, sf_dir, "documents").select(
        F.col("lang").alias("a1"), F.expr(_PRED_SPARK).alias("a2")
    )
    agree = marks.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("a1") == F.col("a2"), 1).otherwise(0)).alias("n_agree"),
    )
    m1 = marks.groupBy(F.col("a1").alias("class")).agg(F.count(F.lit(1)).alias("c1"))
    m2 = marks.groupBy(F.col("a2").alias("class")).agg(F.count(F.lit(1)).alias("c2"))
    chance = (
        m1.join(m2, "class", "full_outer")
        .select(
            (
                F.coalesce("c1", F.lit(0)).cast("bigint")
                * F.coalesce("c2", F.lit(0)).cast("bigint")
            ).alias("prod")
        )
        .agg(F.sum("prod").alias("pe_num"))
    )
    n = F.col("n").cast("double")
    po = F.col("n_agree").cast("double") / F.col("n")
    pe = F.col("pe_num").cast("double") / (n * F.col("n"))
    return agree.crossJoin(F.broadcast(chance)).select(
        F.col("n").cast("bigint").alias("n_items"),
        F.col("n_agree").cast("bigint").alias("n_agree"),
        po.alias("po"),
        pe.alias("pe"),
        ((po - pe) / (F.lit(1.0) - pe)).alias("kappa"),
    )


@query(
    "q_eval_auc",
    oracle=f"""
    WITH scored AS (
      SELECT {_duck4('doc_id', 1)} % 1000 AS s,
             CASE WHEN {_duck4('doc_id', 9)} % 1000 < {_duck4('doc_id', 1)} % 1000
                  THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    hist AS (
      SELECT s, SUM(y) AS pos_at, COUNT(*) - SUM(y) AS neg_at
      FROM scored GROUP BY s
    ),
    cum AS (
      SELECT s, pos_at, neg_at,
             COALESCE(SUM(neg_at) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
      FROM hist
    )
    SELECT CAST(SUM(pos_at) AS BIGINT) AS n_pos,
           CAST(SUM(neg_at) AS BIGINT) AS n_neg,
           CAST(SUM(pos_at * (2 * neg_below + neg_at)) AS DOUBLE)
             / (2.0 * SUM(pos_at) * SUM(neg_at)) AS auc
    FROM cum
    """,
)
def q_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-aware ROC-AUC (Mann-Whitney with the ties/2 correction)
    — WITHOUT ranking the corpus.

    The trick that survives 100 TB: scores are discrete (integer
    milli-units), so one hash agg collapses the corpus to a <=1000-row
    (score, pos, neg) histogram, and AUC = sum pos_at*(2*neg_below +
    neg_at) / (2*P*N) computes from a window over THAT — the global
    sort touches 1000 rows, never the data (the q_ntile_global
    metadata-scale-ordering rule). Everything is integer until the one
    final division, so the DuckDB twin hash-matches exactly.
    """
    from pyspark.sql import Window

    h1, h9 = _spark4("doc_id", 1), _spark4("doc_id", 9)
    scored = table(spark, sf_dir, "documents").select(
        (F.expr(h1) % 1000).alias("s"),
        F.when(F.expr(h9) % 1000 < F.expr(h1) % 1000, 1).otherwise(0).alias("y"),
    )
    hist = scored.groupBy("s").agg(
        F.sum("y").alias("pos_at"),
        (F.count(F.lit(1)) - F.sum("y")).alias("neg_at"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.withColumn(
        "neg_below", F.coalesce(F.sum("neg_at").over(w), F.lit(0))
    )
    return cum.agg(
        F.sum("pos_at").cast("bigint").alias("n_pos"),
        F.sum("neg_at").cast("bigint").alias("n_neg"),
        (
            F.sum(F.col("pos_at") * (2 * F.col("neg_below") + F.col("neg_at"))).cast(
                "double"
            )
            / (F.lit(2.0) * F.sum("pos_at") * F.sum("neg_at"))
        ).alias("auc"),
    )


@query(
    "q_eval_regression",
    oracle=f"""
    WITH scored AS (
      SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
             CAST(floor(value * 100 + 0.5) AS BIGINT)
               + ({_duck4('event_id', 1)} % 201 - 100) AS p
      FROM events
      WHERE value IS NOT NULL AND isfinite(value)
    ),
    sums AS (
      SELECT COUNT(*) AS n,
             SUM(abs(p - v)) AS sae,
             SUM((p - v) * (p - v)) AS sse,
             SUM(v) AS sv,
             SUM(v * v) AS svv
      FROM scored
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(sae AS DOUBLE) / (100.0 * n) AS mae,
           sqrt(CAST(sse AS DOUBLE) / n) / 100.0 AS rmse,
           1.0 - CAST(sse AS DOUBLE)
                 / (CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * sv / n) AS r2
    FROM sums
    """,
)
def q_eval_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression eval (MAE / RMSE / R²) of a simulated predictor
    (truth ± uniform cent noise) — every sum is INTEGER cents, so the
    single-pass aggregate is exact and order-independent; doubles
    appear only in the four final expressions.

    One map-side-combined aggregation over a two-column projection —
    the same ride-the-scan shape as the rest of the eval family.
    """
    from ..common import finite

    v = "CAST(floor(value * 100 + 0.5) AS BIGINT)"
    p = f"({v} + ({_spark4('event_id', 1)} % 201 - 100))"
    # finite(value): an untruthed row can't be scored — and a NaN cents
    # cast is silent garbage in Spark, a throw in DuckDB (nonfinite
    # sweep find, r10). NULLs were already dropped by the cast+SUM path
    # on both sides; the explicit filter makes n count scored rows only.
    scored = (
        table(spark, sf_dir, "events")
        .where(finite(F.col("value")))
        .select(F.expr(v).alias("v"), F.expr(p).alias("p"))
    )
    sums = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.abs(F.col("p") - F.col("v"))).alias("sae"),
        F.sum((F.col("p") - F.col("v")) * (F.col("p") - F.col("v"))).alias("sse"),
        F.sum("v").alias("sv"),
        F.sum(F.col("v") * F.col("v")).alias("svv"),
    )
    n = F.col("n")
    return sums.select(
        n.cast("bigint").alias("n"),
        (F.col("sae").cast("double") / (F.lit(100.0) * n)).alias("mae"),
        (F.sqrt(F.col("sse").cast("double") / n) / F.lit(100.0)).alias("rmse"),
        (
            F.lit(1.0)
            - F.col("sse").cast("double")
            / (F.col("svv").cast("double") - F.col("sv").cast("double") * F.col("sv") / n)
        ).alias("r2"),
    )


# 8 hex digits (32-bit) pair scores — fewer rank ties than the 4-digit
# class hash; ties that remain break by doc_id in both engines.
def _duck8(expr: str) -> str:
    h = f"md5({expr})"
    return ("(" + " + ".join(
        f"(instr('0123456789abcdef', substr({h}, {1 + i}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)) + ")")


_PAIR = "concat(CAST(q.q_id AS STRING), ':', CAST(doc_id AS STRING))"
_N_QUERIES = 20


@query(
    "q_eval_ndcg",
    oracle=f"""
    WITH q AS (SELECT unnest(range(0, {_N_QUERIES})) AS q_id),
    scored AS (
      SELECT q.q_id, d.doc_id,
             {_duck8(_PAIR)} AS score,
             CASE WHEN d.doc_id % {_N_QUERIES} = q.q_id THEN 1 ELSE 0 END AS rel
      FROM q, documents d
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY score DESC, doc_id) AS rnk
      FROM scored
    ),
    per_q AS (
      SELECT q_id,
             SUM(rel) AS n_rel,
             MIN(CASE WHEN rel = 1 THEN rnk END) AS first_rel,
             SUM(CASE WHEN rnk <= 10 AND rel = 1
                      THEN 1.0 / log2(rnk + 1.0) ELSE 0.0 END) AS dcg10
      FROM ranked GROUP BY q_id
    ),
    ideal AS (
      SELECT unnest(range(1, 11)) AS i
    )
    SELECT p.q_id,
           CAST(p.n_rel AS BIGINT) AS n_rel,
           CAST(p.first_rel AS BIGINT) AS first_rel_rank,
           round(1.0 / p.first_rel, 6) AS rr,
           round(p.dcg10 / (SELECT SUM(1.0 / log2(i + 1.0)) FROM ideal
                            WHERE i <= least(p.n_rel, 10)), 6) AS ndcg10
    FROM per_q p
    ORDER BY p.q_id
    """,
)
def q_eval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality eval: NDCG@10 and reciprocal rank per simulated
    retrieval query (binary relevance; hash scores stand in for a
    ranker).

    Scoring joins a {_N_QUERIES}-row broadcast query dim against the
    corpus — the scale shape of batch retrieval eval (per-query
    candidate lists; any real ranker output slots into `scored`). The
    per-query ranking is one window partitioned by q_id, and the @10
    cut uses the rank filter Catalyst turns into WindowGroupLimit-style
    early pruning. log2 outputs round to 6 dp (libm-vs-JVM ulp
    discipline, see geospatial.py).
    """
    q = spark.range(_N_QUERIES).select(F.col("id").cast("int").alias("q_id"))
    d = table(spark, sf_dir, "documents").select("doc_id")
    pair = "concat(CAST(q_id AS STRING), ':', CAST(doc_id AS STRING))"
    scored = d.crossJoin(F.broadcast(q)).select(
        "q_id",
        "doc_id",
        F.expr(
            f"CAST(conv(substring(md5({pair}), 1, 8), 16, 10) AS BIGINT)"
        ).alias("score"),
        F.when(F.col("doc_id") % _N_QUERIES == F.col("q_id"), 1)
        .otherwise(0)
        .alias("rel"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("score"), "doc_id")
    ranked = scored.withColumn("rnk", F.row_number().over(w))
    per_q = ranked.groupBy("q_id").agg(
        F.sum("rel").alias("n_rel"),
        F.min(F.when(F.col("rel") == 1, F.col("rnk"))).alias("first_rel"),
        F.sum(
            F.when(
                (F.col("rnk") <= 10) & (F.col("rel") == 1),
                F.lit(1.0) / F.log2(F.col("rnk") + F.lit(1.0)),
            ).otherwise(0.0)
        ).alias("dcg10"),
    )
    ideal = spark.range(1, 11).select(
        F.col("id").alias("i"), (F.lit(1.0) / F.log2(F.col("id") + F.lit(1.0))).alias("g")
    )
    # Conditional aggregation (not a filtering join) so a query with
    # n_rel = 0 survives with NULL idcg10/ndcg10/rr — matching the
    # oracle, whose scalar-subquery SUM over an empty set is NULL.
    per_q = (
        per_q.crossJoin(F.broadcast(ideal))
        .groupBy("q_id", "n_rel", "first_rel", "dcg10")
        .agg(
            F.sum(
                F.when(
                    F.col("i") <= F.least(F.col("n_rel"), F.lit(10)), F.col("g")
                )
            ).alias("idcg10")
        )
    )
    return per_q.select(
        "q_id",
        F.col("n_rel").cast("bigint").alias("n_rel"),
        F.col("first_rel").cast("bigint").alias("first_rel_rank"),
        F.round(F.lit(1.0) / F.col("first_rel"), 6).alias("rr"),
        F.round(F.col("dcg10") / F.col("idcg10"), 6).alias("ndcg10"),
    ).orderBy("q_id")


@query(
    "q_eval_pr_curve",
    oracle=f"""
    WITH scored AS (
      SELECT {_duck4('doc_id', 1)} % 1000 AS s,
             CASE WHEN {_duck4('doc_id', 9)} % 1000 < {_duck4('doc_id', 1)} % 1000
                  THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    hist AS (
      SELECT s, SUM(y) AS pos_at, COUNT(*) AS tot_at
      FROM scored GROUP BY s
    ),
    tot AS (SELECT SUM(pos_at) AS npos FROM hist),
    cum AS (
      SELECT s,
             SUM(pos_at) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
             SUM(tot_at) OVER (ORDER BY s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tot
      FROM hist
    )
    SELECT CAST(s AS INT) AS score_cut,
           CAST(cum_pos AS BIGINT) AS n_pos_at_cut,
           CAST(cum_tot AS BIGINT) AS n_at_cut,
           CAST(cum_pos AS DOUBLE) / cum_tot AS precision_at,
           CAST(cum_pos AS DOUBLE) / npos AS recall_at,
           2.0 * cum_pos / (cum_tot + npos) AS f1_at
    FROM cum, tot
    WHERE npos > 0
    """,
)
def q_eval_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full precision/recall/F1 curve at every distinct score threshold
    — q_eval_auc's operating-point companion (AUC says HOW GOOD, the
    curve says WHERE TO CUT).

    Same scale trick as the AUC: one hash agg collapses the corpus to
    the <=1000-row score histogram; cumulative counts over THAT give
    every operating point. Every output is a single integer/integer
    division (F1 folds to 2·TP/(pred_pos + real_pos), one division —
    not the 2PR/(P+R) float composition), so the curve hash-matches
    bit-for-bit with no rounding. Zero-positive corpora emit an empty
    curve on both sides rather than NULL-filled rows.
    """
    from pyspark.sql import Window

    h1, h9 = _spark4("doc_id", 1), _spark4("doc_id", 9)
    scored = table(spark, sf_dir, "documents").select(
        (F.expr(h1) % 1000).alias("s"),
        F.when(F.expr(h9) % 1000 < F.expr(h1) % 1000, 1).otherwise(0).alias("y"),
    )
    hist = scored.groupBy("s").agg(
        F.sum("y").alias("pos_at"), F.count(F.lit(1)).alias("tot_at")
    )
    tot = hist.agg(F.sum("pos_at").alias("npos"))
    w = Window.orderBy(F.col("s").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "s",
        F.sum("pos_at").over(w).alias("cum_pos"),
        F.sum("tot_at").over(w).alias("cum_tot"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .where(F.col("npos") > 0)
        .select(
            F.col("s").cast("int").alias("score_cut"),
            F.col("cum_pos").cast("bigint").alias("n_pos_at_cut"),
            F.col("cum_tot").cast("bigint").alias("n_at_cut"),
            (F.col("cum_pos").cast("double") / F.col("cum_tot")).alias(
                "precision_at"
            ),
            (F.col("cum_pos").cast("double") / F.col("npos")).alias("recall_at"),
            (F.lit(2.0) * F.col("cum_pos") / (F.col("cum_tot") + F.col("npos"))).alias(
                "f1_at"
            ),
        )
    )


@query(
    "q_eval_bleu",
    oracle="""
    WITH d AS (
      SELECT source, doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS ct,
             LEAD(list_filter(string_split(text, ' '), x -> x <> ''))
               OVER (PARTITION BY source ORDER BY doc_id) AS rt
      FROM documents
    ),
    p AS (
      SELECT * FROM d WHERE ct IS NOT NULL AND rt IS NOT NULL
    ),
    cg AS (
      SELECT source, doc_id, n, g, COUNT(*) AS c FROM (
        SELECT source, doc_id, 1 AS n, unnest(ct) AS g FROM p
        UNION ALL
        SELECT source, doc_id, 2 AS n,
               unnest(list_transform(range(1, len(ct)), i -> ct[i] || ' ' || ct[i+1]))
                 AS g
        FROM p WHERE len(ct) >= 2
      ) GROUP BY ALL
    ),
    rg AS (
      SELECT source, doc_id, n, g, COUNT(*) AS c FROM (
        SELECT source, doc_id, 1 AS n, unnest(rt) AS g FROM p
        UNION ALL
        SELECT source, doc_id, 2 AS n,
               unnest(list_transform(range(1, len(rt)), i -> rt[i] || ' ' || rt[i+1]))
                 AS g
        FROM p WHERE len(rt) >= 2
      ) GROUP BY ALL
    ),
    cl AS (
      SELECT cg.source, cg.n,
             SUM(LEAST(cg.c, COALESCE(rg.c, 0))) AS clip,
             SUM(cg.c) AS tot
      FROM cg LEFT JOIN rg
        ON rg.source = cg.source AND rg.doc_id = cg.doc_id
       AND rg.n = cg.n AND rg.g = cg.g
      GROUP BY 1, 2
    ),
    lens AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(len(ct)) AS BIGINT) AS cand_tokens,
             CAST(SUM(len(rt)) AS BIGINT) AS ref_tokens
      FROM p GROUP BY source
    )
    SELECT l.source, l.n_pairs, l.cand_tokens, l.ref_tokens,
           CAST(c1.clip AS DOUBLE) / c1.tot AS p1,
           CAST(c2.clip AS DOUBLE) / c2.tot AS p2,
           CASE WHEN c1.tot IS NULL OR c2.tot IS NULL OR l.ref_tokens = 0
                THEN NULL
                ELSE LEAST(1.0, CAST(l.cand_tokens AS DOUBLE) / l.ref_tokens)
                     * sqrt((CAST(c1.clip AS DOUBLE) / c1.tot)
                            * (CAST(c2.clip AS DOUBLE) / c2.tot))
           END AS bleu2
    FROM lens l
    LEFT JOIN cl c1 ON c1.source = l.source AND c1.n = 1
    LEFT JOIN cl c2 ON c2.source = l.source AND c2.n = 2
    """,
)
def q_eval_bleu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level BLEU-2 between each document and its successor in
    the same source — the n-gram-overlap eval metric as a lake query
    (here measuring intra-source self-similarity; any (candidate,
    reference) pair table slots into ``pairs``).

    Corpus-level means counts aggregate BEFORE dividing (the Papineni
    convention): clipped/total n-gram counts and candidate/reference
    lengths are all integer sums per source, then p1, p2, the linear
    brevity factor min(1, c/r), and bleu2 = bp·sqrt(p1·p2) are one
    fixed double expression — no per-pair float averaging, so the
    metric hash-matches exactly (sqrt and IEEE division are correctly
    rounded on both engines; the geometric mean uses sqrt, NOT
    exp/ln, whose libm rounding differs). Brevity is the linear ratio
    (documented contract), not the exp(1-r/c) penalty, for the same
    libm reason.

    Scale: the gram fan-out collapses map-side into per-(pair, gram)
    partials; the clipped join carries the gram vocabulary, the
    per-source report is k rows. Pairs with a NULL side are dropped
    after the LEAD (a NULL-text doc still consumes its slot in the
    pairing — the hostile-catalog convention).
    """
    from pyspark.sql import Window

    toks = F.filter(F.split("text", " "), lambda t: t != "")
    w = Window.partitionBy("source").orderBy("doc_id")
    # pairs is NOT persisted (r11 A/B): each of its consumers prunes a
    # different slice (cg needs only ct, rg only rt, lens only sizes),
    # and materializing the full two-token-array table measured SLOWER
    # (2.7 → 3.5 s at 8 cores) than re-deriving the pruned subtrees in
    # parallel — column pruning through the cache is what a persist
    # gives up here.
    pairs = (
        table(spark, sf_dir, "documents")
        .select("source", "doc_id", toks.alias("ct"))
        .select("source", "doc_id", "ct", F.lead("ct").over(w).alias("rt"))
        .where(F.col("ct").isNotNull() & F.col("rt").isNotNull())
    )

    def gram_counts(col_name: str) -> DataFrame:
        col = F.col(col_name)
        uni = pairs.select(
            "source",
            "doc_id",
            F.lit(1).alias("n"),
            F.explode(col).alias("g"),
        )
        bi = (
            pairs.where(F.size(col) >= 2)
            .select(
                "source",
                "doc_id",
                F.lit(2).alias("n"),
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size(col) - 2),
                        lambda i: F.concat_ws(
                            " ",
                            F.element_at(col, i + 1),
                            F.element_at(col, i + 2),
                        ),
                    )
                ).alias("g"),
            )
        )
        return uni.unionAll(bi).groupBy("source", "doc_id", "n", "g").agg(
            F.count(F.lit(1)).alias("c")
        )

    cg, rg = gram_counts("ct"), gram_counts("rt")
    # cl is NOT persisted (r11 interleaved A/B): the n=1/n=2 consumers
    # do re-run the clipped-join tree, but pinning it with track()
    # measured 2.10 → 2.33 s at sf0.1/32 cores — the duplicated subtrees
    # overlap on idle cores while the cache adds a serial
    # materialization job. Same verdict as the `pairs` A/B below.
    cl = (
        cg.join(
            rg.withColumnRenamed("c", "c_ref"),
            ["source", "doc_id", "n", "g"],
            "left",
        )
        .groupBy("source", "n")
        .agg(
            F.sum(F.least(F.col("c"), F.coalesce(F.col("c_ref"), F.lit(0)))).alias(
                "clip"
            ),
            F.sum("c").alias("tot"),
        )
    )
    lens = pairs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.size("ct")).cast("bigint").alias("cand_tokens"),
        F.sum(F.size("rt")).cast("bigint").alias("ref_tokens"),
    )
    c1 = cl.where(F.col("n") == 1).select(
        "source", F.col("clip").alias("clip1"), F.col("tot").alias("tot1")
    )
    c2 = cl.where(F.col("n") == 2).select(
        "source", F.col("clip").alias("clip2"), F.col("tot").alias("tot2")
    )
    out = lens.join(c1, "source", "left").join(c2, "source", "left")
    p1 = F.col("clip1").cast("double") / F.col("tot1")
    p2 = F.col("clip2").cast("double") / F.col("tot2")
    bp = F.least(
        F.lit(1.0), F.col("cand_tokens").cast("double") / F.col("ref_tokens")
    )
    return out.select(
        "source",
        "n_pairs",
        "cand_tokens",
        "ref_tokens",
        p1.alias("p1"),
        p2.alias("p2"),
        F.when(
            F.col("tot1").isNull()
            | F.col("tot2").isNull()
            | (F.col("ref_tokens") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(bp * F.sqrt(p1 * p2))
        .alias("bleu2"),
    )
