"""Statistical aggregates & grouping-set extensions.

Variance/stddev/correlation are computed from exact decimal power sums
(Σx, Σx², Σxy) recombined in double with the textbook formulas — the
only way two engines agree bit-for-bit on second-moment statistics
(their built-in one-pass algorithms differ in accumulation order).
The inputs are 2-decimal money values, so squares/products have ≤4
decimals and DECIMAL(30,8) accumulation is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..caching import track
from ..catalog import table
from ..common import DEC, md5_hex4_duck, o_dsum, o_ts_str, spread, ts_str
from ..registry import query


def _dec_sum(col):
    return F.sum(col.cast(DEC)).cast("double")


@query(
    "q_agg_stats",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           round((CAST(COUNT(*) AS DOUBLE) * {o_dsum('l_quantity * l_quantity')}
                  - {o_dsum('l_quantity')} * {o_dsum('l_quantity')})
                 / (CAST(COUNT(*) AS DOUBLE) * (COUNT(*) - 1)), 4) AS var_qty,
           round(sqrt((CAST(COUNT(*) AS DOUBLE) * {o_dsum('l_quantity * l_quantity')}
                  - {o_dsum('l_quantity')} * {o_dsum('l_quantity')})
                 / (CAST(COUNT(*) AS DOUBLE) * (COUNT(*) - 1))), 4) AS stddev_qty,
           round((CAST(COUNT(*) AS DOUBLE) * {o_dsum('l_quantity * l_extendedprice')}
                  - {o_dsum('l_quantity')} * {o_dsum('l_extendedprice')})
                 / sqrt((CAST(COUNT(*) AS DOUBLE) * {o_dsum('l_quantity * l_quantity')}
                         - {o_dsum('l_quantity')} * {o_dsum('l_quantity')})
                        * (CAST(COUNT(*) AS DOUBLE) * {o_dsum('l_extendedprice * l_extendedprice')}
                           - {o_dsum('l_extendedprice')} * {o_dsum('l_extendedprice')})), 4)
             AS corr_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance / stddev / Pearson correlation per return flag,
    from exact decimal power sums (one aggregation pass, 5 decimal sums)."""
    li = table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        _dec_sum(q).alias("sq"),
        _dec_sum(p).alias("sp"),
        _dec_sum(q * q).alias("sqq"),
        _dec_sum(p * p).alias("spp"),
        _dec_sum(q * p).alias("sqp"),
    )
    n = F.col("n").cast("double")
    var_q = (n * F.col("sqq") - F.col("sq") * F.col("sq")) / (n * (F.col("n") - 1))
    var_p = (n * F.col("spp") - F.col("sp") * F.col("sp")) / (n * (F.col("n") - 1))
    cov_num = n * F.col("sqp") - F.col("sq") * F.col("sp")
    corr = cov_num / F.sqrt(
        (n * F.col("sqq") - F.col("sq") * F.col("sq"))
        * (n * F.col("spp") - F.col("sp") * F.col("sp"))
    )
    return agg.select(
        "l_returnflag",
        "n",
        F.round(var_q, 4).alias("var_qty"),
        F.round(F.sqrt(var_q), 4).alias("stddev_qty"),
        F.round(corr, 4).alias("corr_qty_price"),
    )


@query(
    "q_agg_minmax_by",
    oracle="""
    SELECT o_custkey,
           arg_min(o_orderpriority, o_orderkey) AS first_priority,
           arg_max(o_orderpriority, o_orderkey) AS last_priority,
           CAST(MIN(o_orderkey) AS BIGINT) AS first_orderkey,
           CAST(MAX(o_orderkey) AS BIGINT) AS last_orderkey
    FROM orders
    GROUP BY o_custkey
    """,
)
def q_agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (argmin/argmax) keyed on the UNIQUE o_orderkey —
    unique ordering keys are what make argmin deterministic at all."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.min_by("o_orderpriority", "o_orderkey").alias("first_priority"),
        F.max_by("o_orderpriority", "o_orderkey").alias("last_priority"),
        F.min("o_orderkey").cast("bigint").alias("first_orderkey"),
        F.max("o_orderkey").cast("bigint").alias("last_orderkey"),
    )


@query(
    "q_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {o_dsum('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    HAVING COUNT(*) > 0  -- empty-input () row: Spark emits none
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube): status totals,
    priority totals, grand total — via the SQL surface, the idiomatic
    Spark route for arbitrary set lists."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS sum_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "q_time_rollup",
    oracle=f"""
    SELECT {o_ts_str("date_trunc('day', ts)")} AS day,
           {o_ts_str("date_trunc('hour', ts)")} AS hour,
           COUNT(*) AS n_events,
           {o_dsum('value')} AS sum_value
    FROM events
    GROUP BY ROLLUP (1, 2)
    HAVING COUNT(*) > 0  -- empty-input grand-total row: Spark emits none
    """,
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-hierarchy rollup: hour → day → total in one
    pass (ROLLUP over two truncation granularities). The continuous-
    aggregate pattern for event tables at scale."""
    e = table(spark, sf_dir, "events")
    return (
        e.select(
            ts_str(F.date_trunc("day", F.col("ts"))).alias("day"),
            ts_str(F.date_trunc("hour", F.col("ts"))).alias("hour"),
            "value",
        )
        .rollup("day", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
    )


@query(
    "q_agg_histogram",
    # Non-finite values carry the engine-wide finite contract: a NaN/Inf
    # bucket is meaningless, Spark's double→bigint cast silently fakes
    # one (NaN→0, +Inf→Long.MAX) and DuckDB's THROWS — exclude
    # explicitly on BOTH sides (nonfinite sweep find, r10). NULLs keep
    # their own bucket (floor(NULL) = NULL) as before.
    oracle=f"""
    SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           {o_dsum('value')} AS sum_value
    FROM events
    WHERE value IS NULL OR isfinite(value)
    GROUP BY 1
    """,
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram as floor-bucket groupBy — the distributed
    histogram primitive: map-side partial aggregation collapses each
    partition to (bucket, count, sum) before the shuffle, so the shuffle
    carries buckets, not rows, at any scale."""
    from ..common import finite

    e = table(spark, sf_dir, "events").where(
        F.col("value").isNull() | finite(F.col("value"))
    )
    return e.groupBy(
        F.floor(F.col("value") / 50.0).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        _dec_sum(F.col("value")).alias("sum_value"),
    )


@query(
    "q_outlier_iqr",
    # Quartiles are EXACT ORDER STATISTICS (row_number-picked elements,
    # ties broken by event_id), not interpolated quantiles: linear
    # interpolation composes float ops differently across engines
    # (a+(b-a)f vs (1-f)a+fb) and an ulp on the fence flips boundary
    # rows. Element picks + identical fence arithmetic are engine-exact.
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
      WHERE value IS NOT NULL  -- order stats skip NULLs on both engines
    ),
    q AS (
      SELECT event_type,
             MAX(CASE WHEN rn = CAST(CEIL(0.25 * n) AS BIGINT) THEN value END) AS q1,
             MAX(CASE WHEN rn = CAST(CEIL(0.75 * n) AS BIGINT) THEN value END) AS q3
      FROM ranked GROUP BY event_type
    )
    SELECT r.event_type, q.q1, q.q3,
           CAST(COUNT(*) FILTER (
             r.value < q.q1 - 1.5 * (q.q3 - q.q1)
             OR r.value > q.q3 + 1.5 * (q.q3 - q.q1)
           ) AS BIGINT) AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM ranked r JOIN q ON r.event_type = q.event_type
    GROUP BY r.event_type, q.q1, q.q3
    """,
)
def q_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier detection per group: values beyond
    quartile ± 1.5×IQR — the data-cleaning screen run before any
    aggregate is trusted (and before outliers poison a training set).

    Quartiles are exact order statistics picked by row_number with a
    full tiebreak, so both engines select the SAME element and the
    fence arithmetic (two IEEE ops on identical doubles) is exact —
    see the oracle comment for why interpolated quantiles can't give a
    cross-engine-stable fence. The per-group sort is one shuffle on
    event_type (5 keys here; at 100 TB swap the exact rank for
    approx_percentile fences — the fence CONSUMER is unchanged).
    """
    # NULL values are excluded BEFORE ranking: Spark sorts NULL first
    # and DuckDB last, so a ranked NULL lands in opposite quartile
    # slots (hostile sweep find); order statistics skip NULLs anyway.
    ev = (
        table(spark, sf_dir, "events")
        .select("event_type", "event_id", "value")
        .where(F.col("value").isNotNull())
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    q = ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.ceil(0.25 * F.col("n")).cast("bigint"), F.col("value"))
        ).alias("q1"),
        F.max(
            F.when(F.col("rn") == F.ceil(0.75 * F.col("n")).cast("bigint"), F.col("value"))
        ).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo = F.col("q1") - 1.5 * iqr
    hi = F.col("q3") + 1.5 * iqr
    return (
        ranked.join(q, "event_type")
        .groupBy("event_type", "q1", "q3")
        .agg(
            F.count_if((F.col("value") < lo) | (F.col("value") > hi)).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .select("event_type", "q1", "q3", "n_outliers", "n_total")
    )


@query(
    "q_histogram_2d",
    # finite contract on the binned measure (see q_agg_histogram):
    # NULL keeps its bin, NaN/Inf rows are excluded on both sides.
    oracle="""
    SELECT CAST(hour(ts) AS INT) AS hour_bin,
           CAST(FLOOR(value / 100.0) AS BIGINT) AS value_bin,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    WHERE value IS NULL OR isfinite(value)
    GROUP BY hour_bin, value_bin
    """,
)
def q_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D histogram (hour-of-day × value band): the heat-map binning
    primitive behind density plots and drift dashboards. One hash agg on
    the composed bin key — map-side partial aggregation collapses every
    partition to its occupied cells, so the shuffle carries at most
    24×bands rows per task regardless of input volume. Both bin
    functions are exact integer derivations (hour extraction, floor
    division), so the cell assignment is engine-identical.
    """
    from ..common import finite

    e = table(spark, sf_dir, "events").where(
        F.col("value").isNull() | finite(F.col("value"))
    )
    return e.groupBy(
        F.hour("ts").cast("int").alias("hour_bin"),
        F.floor(F.col("value") / 100.0).cast("bigint").alias("value_bin"),
    ).agg(F.count(F.lit(1)).alias("n"))


def _o_corr(x: str, y: str) -> str:
    """DuckDB Pearson r from decimal-exact moment sums, rounded to 6."""
    n = "CAST(COUNT(*) AS DOUBLE)"
    sx = f"CAST(SUM(CAST({x} AS DECIMAL(30,8))) AS DOUBLE)"
    sy = f"CAST(SUM(CAST({y} AS DECIMAL(30,8))) AS DOUBLE)"
    sxx = f"CAST(SUM(CAST({x} * {x} AS DECIMAL(30,8))) AS DOUBLE)"
    syy = f"CAST(SUM(CAST({y} * {y} AS DECIMAL(30,8))) AS DOUBLE)"
    sxy = f"CAST(SUM(CAST({x} * {y} AS DECIMAL(30,8))) AS DOUBLE)"
    # n < 2 OR zero variance: the co-moment residue is pure rounding
    # noise and can land a hair NEGATIVE, where DuckDB's SQRT raises
    # while Spark yields NaN — correlation of fewer than two points or
    # of a CONSTANT series is NULL (undefined) by SQL convention, on
    # both sides (one-row + all-tied catalog sweep finds)
    vx = f"({n} * {sxx} - {sx} * {sx})"
    vy = f"({n} * {syy} - {sy} * {sy})"
    return (
        f"CASE WHEN COUNT(*) < 2 OR {vx} <= 0 OR {vy} <= 0 THEN NULL ELSE "
        f"ROUND(({n} * {sxy} - {sx} * {sy}) / "
        f"(SQRT({vx}) * SQRT({vy})), 6) END"
    )


@query(
    "q_corr_profile",
    # corr() builtins disagree across engines (different one-pass update
    # formulas, different summation orders). Here every moment (Σx, Σx²,
    # Σxy) accumulates as decimal of IEEE-identical per-row products, so
    # both engines compute r from the SAME six doubles with the same
    # expression tree — exact to the final rounding.
    oracle=f"""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           {_o_corr('l_quantity', 'l_extendedprice')} AS corr_qty_price,
           {_o_corr('l_extendedprice', 'l_discount')} AS corr_price_disc,
           {_o_corr('l_quantity', 'l_tax')} AS corr_qty_tax
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_corr_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation profile between fact measures, per group —
    the feature-redundancy screen run before modeling, in ONE
    aggregation pass (all six moment sums per pair share the same
    partial-agg shuffle; no per-pair re-scan).

    Engine-exactness: built-in corr() is NOT cross-engine-stable (one-
    pass co-moment updates differ), so r is assembled from decimal-
    accumulated moment sums — each per-row product is one IEEE multiply,
    identical everywhere; the final expression is the same tree of ~10
    double ops on identical inputs. The n·Sxy − Sx·Sy formulation loses
    precision when means dwarf variances (catastrophic cancellation);
    acceptable here and rounded to 6, with Welford-style co-moments the
    escape hatch when it isn't.
    """
    l = table(spark, sf_dir, "lineitem")  # noqa: E741

    def moments(x: str, y: str, tag: str):
        dec = lambda c: c.cast("decimal(30,8)")  # noqa: E731
        return [
            F.sum(dec(F.col(x))).cast("double").alias(f"sx_{tag}"),
            F.sum(dec(F.col(y))).cast("double").alias(f"sy_{tag}"),
            F.sum(dec(F.col(x) * F.col(x))).cast("double").alias(f"sxx_{tag}"),
            F.sum(dec(F.col(y) * F.col(y))).cast("double").alias(f"syy_{tag}"),
            F.sum(dec(F.col(x) * F.col(y))).cast("double").alias(f"sxy_{tag}"),
        ]

    pairs = {
        "qp": ("l_quantity", "l_extendedprice"),
        "pd": ("l_extendedprice", "l_discount"),
        "qt": ("l_quantity", "l_tax"),
    }
    aggs = [F.count(F.lit(1)).alias("n")]
    for tag, (x, y) in pairs.items():
        aggs.extend(moments(x, y, tag))
    base = l.groupBy("l_returnflag").agg(*aggs)

    def r(tag: str):
        n = F.col("n").cast("double")
        sx, sy = F.col(f"sx_{tag}"), F.col(f"sy_{tag}")
        sxx, syy, sxy = F.col(f"sxx_{tag}"), F.col(f"syy_{tag}"), F.col(f"sxy_{tag}")
        # corr of < 2 points or of a CONSTANT series is NULL (see
        # _o_corr — the zero-variance residue can round a hair negative
        # and sqrt(-eps) would leak NaN into the profile)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        return F.when(
            (F.col("n") >= 2) & (vx > 0) & (vy > 0),
            F.round((n * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy)), 6),
        ).otherwise(F.lit(None))

    return base.select(
        "l_returnflag",
        "n",
        r("qp").alias("corr_qty_price"),
        r("pd").alias("corr_price_disc"),
        r("qt").alias("corr_qty_tax"),
    )


@query(
    "q_mad_outlier",
    oracle="""
    WITH li AS (
      SELECT l_returnflag, l_extendedprice
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    med AS (
      SELECT l_returnflag,
             quantile_disc(CAST(l_extendedprice AS DOUBLE), 0.5) AS med
      FROM li GROUP BY l_returnflag
    ),
    mad AS (
      SELECT l.l_returnflag,
             quantile_disc(abs(CAST(l.l_extendedprice AS DOUBLE) - m.med), 0.5) AS mad
      FROM li l JOIN med m ON l.l_returnflag = m.l_returnflag
      GROUP BY l.l_returnflag
    )
    SELECT m.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(m.med, 4) AS med,
           round(d.mad, 4) AS mad,
           CAST(SUM(CASE WHEN abs(CAST(l.l_extendedprice AS DOUBLE) - m.med)
                              > 4.4478 * d.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM li l
    JOIN med m ON l.l_returnflag = m.l_returnflag
    JOIN mad d ON l.l_returnflag = d.l_returnflag
    GROUP BY m.l_returnflag, m.med, d.mad
    """,
)
def q_mad_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen via Median Absolute Deviation: flag values
    with |x − median| > 3·1.4826·MAD (the 4.4478 constant is written
    literally on both sides so no engine re-derives it). MAD tolerates
    the heavy tails that wreck stddev-based z-scores and complements
    the Tukey-fence screen (q_outlier_iqr) with a tighter breakdown
    point (50% vs 25%).

    Both medians are DISCRETE order statistics (element at rank
    ceil(n/2) — the q_outlier_iqr / q_percentile_disc discipline:
    element picks, never interpolation; for a robustness screen the
    lower-median convention is immaterial and buys exactness + speed).
    Formulation: two ranked-window picks (value, then |value − med|)
    + one counting pass with the scalars broadcast back — replacing the
    percentile() aggregate whose single buffer per group serializes on
    |group| values (measured 4.8 → ~2.6 s at sf0.1; at 100 TB the
    windows ride spillable sorts and the GK sketch substitutes for the
    first two passes where ±ε suffices).
    """
    li = (
        table(spark, sf_dir, "lineitem")
        # order statistics skip NULLs (per-category hostile sweep find:
        # Spark ranks NULLs FIRST, quantile_disc skips them)
        .where(F.col("l_extendedprice").isNotNull())
        .select(
            "l_returnflag",
            F.col("l_extendedprice").cast("double").alias("v"),
            "l_orderkey",
            "l_linenumber",
        )
    )

    def disc_median(frame, col):
        w = Window.partitionBy("l_returnflag").orderBy(
            col, "l_orderkey", "l_linenumber"
        )
        wc = Window.partitionBy("l_returnflag")
        ranked = frame.select(
            "l_returnflag",
            F.col(col).alias("x"),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n"),
        )
        return ranked.groupBy("l_returnflag").agg(
            F.min(
                F.when(F.col("rn") == F.ceil(F.col("n") / 2), F.col("x"))
            ).alias(f"med_{col}")
        )

    # Both per-group scalar tables are |groups| rows, but each one's
    # BUILD is a full ranked-window pass over the data. Unpersisted, the
    # med subtree re-ran THREE times (its own build, under mad's dev,
    # under flagged's dev — plan audit r11: 4 lineitem scans, 3 window
    # sorts) because broadcast exchanges never hit the reuse rule.
    # track() pins each pass to exactly one run (guide §1.2 "don't
    # recompute", §5 caching: reused AND expensive); the cached payload
    # is metadata-scale, so this is 100 TB-safe. Interleaved A/B at
    # sf0.1: WALL-neutral locally (1.63 vs 1.71 s at 32 cores, 1.74 vs
    # 1.77 at 8 — the 3-partition window passes overlapped on idle
    # cores), kept for the 3×→1× CPU-work cut, which is what a busy
    # cluster or narrower host actually pays
    # (plans/r11/q_mad_outlier_{before,after}.txt: the med subtree
    # appears once as an InMemoryRelation instead of three inlined
    # window passes).
    med = track(disc_median(li, "v").withColumnRenamed("med_v", "med"))
    dev = li.join(F.broadcast(med), "l_returnflag").withColumn(
        "d", F.abs(F.col("v") - F.col("med"))
    )
    mad = track(disc_median(dev, "d").withColumnRenamed("med_d", "mad"))
    flagged = dev.join(F.broadcast(mad), "l_returnflag")
    return (
        flagged.groupBy("l_returnflag", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("d") > 4.4478 * F.col("mad"), 1).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
        .select(
            "l_returnflag",
            "n",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            "n_outliers",
        )
    )


@query(
    "q_regression_slope",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           round((CAST(COUNT(*) AS DOUBLE) * {o_dsum('l_quantity * l_extendedprice')}
                  - {o_dsum('l_quantity')} * {o_dsum('l_extendedprice')})
                 / (CAST(COUNT(*) AS DOUBLE) * {o_dsum('l_quantity * l_quantity')}
                    - {o_dsum('l_quantity')} * {o_dsum('l_quantity')}), 4) AS slope,
           round(({o_dsum('l_extendedprice')}
                  - ((CAST(COUNT(*) AS DOUBLE) * {o_dsum('l_quantity * l_extendedprice')}
                      - {o_dsum('l_quantity')} * {o_dsum('l_extendedprice')})
                     / (CAST(COUNT(*) AS DOUBLE) * {o_dsum('l_quantity * l_quantity')}
                        - {o_dsum('l_quantity')} * {o_dsum('l_quantity')}))
                    * {o_dsum('l_quantity')}) / CAST(COUNT(*) AS DOUBLE), 4)
             AS intercept,
           round(pow(CAST(COUNT(*) AS DOUBLE) * {o_dsum('l_quantity * l_extendedprice')}
                     - {o_dsum('l_quantity')} * {o_dsum('l_extendedprice')}, 2)
                 / ((CAST(COUNT(*) AS DOUBLE) * {o_dsum('l_quantity * l_quantity')}
                     - {o_dsum('l_quantity')} * {o_dsum('l_quantity')})
                    * (CAST(COUNT(*) AS DOUBLE) * {o_dsum('l_extendedprice * l_extendedprice')}
                       - {o_dsum('l_extendedprice')} * {o_dsum('l_extendedprice')})), 4)
             AS r2
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_regression_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS regression (price ~ quantity): slope, intercept, R²
    from the same exact decimal power sums as q_agg_stats — one
    aggregation pass, textbook normal-equation recombination in double.
    Completes the stats family (moments → correlation → regression);
    engines agree because every operand is a decimal→double cast and
    the recombination is the same IEEE expression tree on both sides
    (native regr_slope/regr_r2 one-pass kernels accumulate in
    engine-specific order and are exactly what this formulation avoids).

    spread() (r11): the 5 decimal power sums are the whole cost and ran
    on the single-task one-row-group scan — 2.5 → 1.1 s at sf0.1 with
    the conditional repartition (no-op on a properly-filed lake).
    """
    li = spread(table(spark, sf_dir, "lineitem"), spark)
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        _dec_sum(q).alias("sq"),
        _dec_sum(p).alias("sp"),
        _dec_sum(q * q).alias("sqq"),
        _dec_sum(p * p).alias("spp"),
        _dec_sum(q * p).alias("sqp"),
    )
    n = F.col("n").cast("double")
    sxy = n * F.col("sqp") - F.col("sq") * F.col("sp")
    sxx = n * F.col("sqq") - F.col("sq") * F.col("sq")
    syy = n * F.col("spp") - F.col("sp") * F.col("sp")
    slope = sxy / sxx
    intercept = (F.col("sp") - slope * F.col("sq")) / n
    r2 = F.pow(sxy, 2) / (sxx * syy)
    return agg.select(
        "l_returnflag",
        "n",
        F.round(slope, 4).alias("slope"),
        F.round(intercept, 4).alias("intercept"),
        F.round(r2, 4).alias("r2"),
    )


@query(
    "q_percentile_disc",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(quantile_disc(CAST(l_extendedprice AS DOUBLE), 0.25), 4) AS p25_disc,
           round(quantile_disc(CAST(l_extendedprice AS DOUBLE), 0.50), 4) AS p50_disc,
           round(quantile_disc(CAST(l_extendedprice AS DOUBLE), 0.99), 4) AS p99_disc
    FROM lineitem
    WHERE l_extendedprice IS NOT NULL
    GROUP BY l_returnflag
    """,
)
def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_DISC semantics — the quantile is an actual member of
    the data set (first value whose cume_dist ≥ p, i.e. the element at
    rank ceil(p·n)), vs q_agg_percentile_exact's PERCENTILE_CONT
    interpolation. The distinction matters whenever the quantile must
    be a real observed value (a real document length, a real price)
    rather than a synthetic midpoint; both engines agree exactly
    because no arithmetic is invented — only rank selection.

    Formulation: ranked-window element picks (row_number + per-group
    count, filter to the three target ranks), NOT the percentile_disc
    aggregate — the aggregate buffers every group value in one
    ObjectHashAggregate buffer (single-threaded per group, OOM-bound at
    scale), while the window rides Tungsten's spillable sort. Measured
    3.1 → 1.1 s warm at sf0.1; same plan discipline as q_outlier_iqr.
    NULL prices are excluded before ranking (order statistics skip
    NULLs; Spark would rank them FIRST, quantile_disc skips them —
    per-category hostile sweep find).
    """
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_extendedprice").isNotNull()
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        "v", "l_orderkey", "l_linenumber"
    )
    wc = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        F.col("l_extendedprice").cast("double").alias("v"),
        "l_orderkey",
        "l_linenumber",
    ).select(
        "l_returnflag",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )

    def pick(p: float):
        return F.min(F.when(F.col("rn") == F.ceil(F.lit(p) * F.col("n")), F.col("v")))

    return ranked.groupBy("l_returnflag").agg(
        F.max("n").cast("bigint").alias("n"),
        F.round(pick(0.25), 4).alias("p25_disc"),
        F.round(pick(0.50), 4).alias("p50_disc"),
        F.round(pick(0.99), 4).alias("p99_disc"),
    )


@query(
    "q_winsorize",
    oracle=f"""
    WITH li AS (
      SELECT l_returnflag, l_extendedprice
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    cuts AS (
      SELECT l_returnflag,
             quantile_disc(CAST(l_extendedprice AS DOUBLE), 0.05) AS lo,
             quantile_disc(CAST(l_extendedprice AS DOUBLE), 0.95) AS hi
      FROM li GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN l.l_extendedprice < c.lo THEN 1
                         WHEN l.l_extendedprice > c.hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clamped,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,2))) AS DOUBLE)
             / COUNT(*) AS raw_mean,
           CAST(SUM(CAST(CASE WHEN l.l_extendedprice < c.lo THEN c.lo
                              WHEN l.l_extendedprice > c.hi THEN c.hi
                              ELSE l.l_extendedprice END AS DECIMAL(30,2)))
                AS DOUBLE) / COUNT(*) AS winsor_mean
    FROM li l JOIN cuts c ON l.l_returnflag = c.l_returnflag
    GROUP BY l.l_returnflag
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per group: values clamped to the exact [p05, p95]
    band before averaging — the robust-estimation alternative to
    DROPPING outliers (q_outlier_iqr / q_mad_outlier flag them; this
    keeps the rows, bounds their influence — the standard treatment for
    heavy-tailed revenue metrics).

    The [p05, p95] cut points are DISCRETE order statistics (elements
    at ranks ceil(.05n) / ceil(.95n) — the element-pick discipline of
    q_percentile_disc/q_mad_outlier): clamped rows inherit REAL
    observed prices (2-decimal values, decimal-cast exact) instead of
    interpolated midpoints, and the ranked-window formulation replaces
    the per-group percentile buffer (measured 4.0 → ~2.3 s at sf0.1).
    One window pass for both cuts, then one clamp + decimal-sum pass
    with the cuts joined back as broadcast scalars.
    """
    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_extendedprice").isNotNull())
        .select(
            "l_returnflag",
            F.col("l_extendedprice").cast("double").alias("v"),
            "l_orderkey",
            "l_linenumber",
        )
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        "v", "l_orderkey", "l_linenumber"
    )
    wc = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    cuts = ranked.groupBy("l_returnflag").agg(
        F.min(
            F.when(F.col("rn") == F.ceil(F.lit(0.05) * F.col("n")), F.col("v"))
        ).alias("lo"),
        F.min(
            F.when(F.col("rn") == F.ceil(F.lit(0.95) * F.col("n")), F.col("v"))
        ).alias("hi"),
    )
    j = li.join(F.broadcast(cuts), "l_returnflag")
    clamped = (
        F.when(F.col("v") < F.col("lo"), F.col("lo"))
        .when(F.col("v") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("v"))
    )
    # Scale-2 decimals: with DISC cuts every clamped value is an exact
    # 2-decimal price, so DECIMAL(30,2) loses nothing AND keeps the
    # int128-scaled sum under 2^53 — DuckDB's decimal->double cast is
    # only correctly rounded in that range (probed: a scale-8 sum here
    # diverged from Java's BigDecimal.doubleValue by 2 ulp).
    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when((F.col("v") < F.col("lo")) | (F.col("v") > F.col("hi")), 1).otherwise(0)
        ).cast("bigint").alias("n_clamped"),
        (F.sum(F.col("v").cast("decimal(30,2)")).cast("double") / F.count(F.lit(1))).alias("raw_mean"),
        (F.sum(clamped.cast("decimal(30,2)")).cast("double") / F.count(F.lit(1))).alias("winsor_mean"),
    )


# Decile boundaries for q_ecdf_normalize (interior cut points).
_ECDF_PS = [i / 10 for i in range(1, 10)]


@query(
    "q_ecdf_normalize",
    # finite contract on value (nonfinite sweep find, r10): a NaN/Inf
    # observation poisons the interpolated cut points AND the `<=`
    # bucket rule orders NaN differently across engines (Spark sorts
    # NaN above +Inf; DuckDB's comparison is FALSE) — exclude
    # non-finite rows from both phases on both sides. NULLs were
    # already consistent (percentile skips them, decile 0 bucket).
    oracle=f"""
    WITH fin AS (
      SELECT * FROM events WHERE value IS NULL OR isfinite(value)
    ),
    bounds AS (
      SELECT quantile_cont(value, {_ECDF_PS!r}) AS bs FROM fin
    )
    SELECT event_type,
           CAST(len(list_filter(b.bs, x -> x <= e.value)) AS INT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(MIN(e.value), 4) AS min_v,
           round(MAX(e.value), 4) AS max_v
    FROM fin e CROSS JOIN bounds b
    GROUP BY 1, 2
    """,
)
def q_ecdf_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-CDF normalization: map every event value to its GLOBAL
    decile (count of reference cut points ≤ value), then report the
    per-(event_type, decile) occupancy — the quantile-normalization
    primitive feature pipelines use to put heavy-tailed signals on a
    uniform scale, and the drift view that shows which event types sit
    in which global deciles.

    Two-phase broadcast-scalar shape: pass 1 reduces the data to NINE
    doubles (exact interpolated percentiles — at 100 TB swap in the GK
    sketch, same nine numbers); the cut-point array then rides into a
    map-side higher-order filter/size per row (a 9-element scan beats a
    range-join for fixed, tiny boundary sets), and the rollup shuffles
    only (type, decile) pairs. Cross-engine: Spark percentile() and
    DuckDB quantile_cont() interpolate identically (this query's own
    hash parity is the standing proof), and the bucket rule compares
    identical doubles with the same <= on both sides.
    """
    from ..common import finite

    e = table(spark, sf_dir, "events").where(
        F.col("value").isNull() | finite(F.col("value"))
    )
    bounds = e.agg(
        F.percentile("value", F.array(*[F.lit(p) for p in _ECDF_PS])).alias("bs")
    )
    return (
        e.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.size(F.filter("bs", lambda x: x <= F.col("value"))).alias("decile"),
            "value",
        )
        .groupBy("event_type", "decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 4).alias("min_v"),
            F.round(F.max("value"), 4).alias("max_v"),
        )
    )


@query(
    "q_cusum_changepoint",
    # value finite contract (nonfinite sweep find, r10): one NaN would
    # poison a whole day's decimal sum — Spark's double→decimal cast
    # silently NULLs it while DuckDB's THROWS. Non-finite rows are
    # excluded at source on both sides; NULL values stay counted in n
    # (SUM already skips them), matching the hostile-catalog pin.
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(value AS DECIMAL(30,8))) AS s
      FROM events
      WHERE ts IS NOT NULL AND (value IS NULL OR isfinite(value))
      GROUP BY 1
    ),
    tot AS (
      SELECT SUM(n) AS tn, SUM(s) AS tsum FROM daily
    ),
    dev AS (
      SELECT d.day, d.n,
             CAST(d.s AS DOUBLE) / d.n AS daily_mean,
             CAST(CAST(d.s AS DOUBLE) / d.n
                  - CAST(t.tsum AS DOUBLE) / t.tn AS DECIMAL(20,8)) AS dv
      FROM daily d CROSS JOIN tot t
    ),
    cus AS (
      SELECT day, n, daily_mean,
             SUM(dv) OVER (ORDER BY day) AS cusum
      FROM dev
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           n,
           round(daily_mean, 4) AS daily_mean,
           round(CAST(cusum AS DOUBLE), 4) AS cusum,
           abs(cusum) = (SELECT MAX(abs(cusum)) FROM cus) AS is_changepoint
    FROM cus
    """,
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point screen over the daily mean of ``events.value``:
    the running sum of (daily mean − global mean) peaks in magnitude at
    the most likely level-shift day (Page 1954) — the first-line monitor
    for "did this metric's level move, and when" on an ingest stream.

    Scale shape: the corpus reduces to one DECIMAL-exact (n, Σv) row
    per day (map-side combinable), so the CUSUM window runs over a
    METADATA-scale table (≤ days rows) — design rule 6's reduce-then-
    window pattern; the data-sized pass is one aggregation. Cross-
    engine determinism: per-day deviations are single IEEE divisions of
    exact decimal sums, then re-cast to DECIMAL(20,8) BEFORE the
    running sum — decimal addition is associative, so the cumulative
    sum cannot drift with engine summation order; the peak test
    compares exact decimals.
    """
    from ..common import finite

    # ts IS NOT NULL (both sides): a NULL day bucket would sort NULLS
    # FIRST in Spark's cumulative window vs NULLS LAST in DuckDB,
    # shifting the whole CUSUM walk (nullts catalog find).
    e = table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull()
        & (F.col("value").isNull() | finite(F.col("value")))
    )
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(30,8)")).alias("s"),
    )
    tot = daily.agg(
        F.sum("n").alias("tn"), F.sum("s").alias("tsum")
    )
    dev = daily.crossJoin(F.broadcast(tot)).select(
        "day",
        "n",
        (F.col("s").cast("double") / F.col("n")).alias("daily_mean"),
        (
            F.col("s").cast("double") / F.col("n")
            - F.col("tsum").cast("double") / F.col("tn")
        ).cast("decimal(20,8)").alias("dv"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cus = dev.select(
        "day", "n", "daily_mean", F.sum("dv").over(w).alias("cusum")
    )
    peak = cus.agg(F.max(F.abs(F.col("cusum"))).alias("mx"))
    return cus.crossJoin(F.broadcast(peak)).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        F.round("daily_mean", 4).alias("daily_mean"),
        F.round(F.col("cusum").cast("double"), 4).alias("cusum"),
        (F.abs(F.col("cusum")) == F.col("mx")).alias("is_changepoint"),
    )


_TE_SMOOTH = 10  # pseudo-observations of the global mean (empirical Bayes)


@query(
    "q_target_encode",
    oracle=f"""
    WITH cat AS (
      SELECT c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS n_cat,
             SUM(CAST(c_acctbal AS DECIMAL(30,8))) AS s_cat
      FROM customer GROUP BY 1
    ),
    gtot AS (
      SELECT SUM(n_cat) AS n_tot, SUM(s_cat) AS s_tot FROM cat
    )
    SELECT c.c_custkey,
           c.c_mktsegment,
           round((CAST(t.s_cat - CAST(c.c_acctbal AS DECIMAL(30,8)) AS DOUBLE)
                  + {_TE_SMOOTH}.0 * (CAST(g.s_tot AS DOUBLE) / g.n_tot))
                 / (t.n_cat - 1 + {_TE_SMOOTH}), 4) AS segment_te
    FROM customer c
    JOIN cat t ON c.c_mktsegment = t.c_mktsegment
    CROSS JOIN gtot g
    """,
)
def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding with empirical-Bayes smoothing —
    the categorical-feature encoder gradient-boosting pipelines ship:
    each row's category becomes the mean target of the OTHER rows in
    its category, shrunk toward the global mean by m=10 pseudo-counts
    (Micci-Barreca 2001). LOO + shrinkage is what prevents the target
    leakage and rare-category overfit a naive group-mean join causes.

    Shape: one aggregate to |categories| rows, one to a global scalar,
    both BROADCAST back onto the row scan — encoding is then a pure
    map-side expression (no second shuffle, no window), which is the
    whole trick at 100 TB: the encoder table is metadata-sized state.
    Determinism: category and global sums are DECIMAL-exact; each
    output is a fixed two-division IEEE tree over those exact values,
    so both engines emit bit-identical encodings.
    """
    c = table(spark, sf_dir, "customer")
    cat = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cat"),
        F.sum(F.col("c_acctbal").cast("decimal(30,8)")).alias("s_cat"),
    )
    glob = cat.agg(
        F.sum("n_cat").alias("n_tot"), F.sum("s_cat").alias("s_tot")
    )
    enc = (
        (F.col("s_cat") - F.col("c_acctbal").cast("decimal(30,8)")).cast("double")
        + float(_TE_SMOOTH) * (F.col("s_tot").cast("double") / F.col("n_tot"))
    ) / (F.col("n_cat") - 1 + _TE_SMOOTH)
    return (
        c.join(F.broadcast(cat), "c_mktsegment")
        .crossJoin(F.broadcast(glob))
        .select(
            "c_custkey",
            "c_mktsegment",
            F.round(enc, 4).alias("segment_te"),
        )
    )


_BOOT_B = 50  # bootstrap replicates
# Poisson(1) inverse-CDF cutoffs (weights 0..4, tail clamped to 5),
# precomputed so neither engine runs exp/factorial in the row path.
_POIS_CDF = (0.367879441, 0.735758882, 0.919698603, 0.981011843, 0.996340153)


def _pois_weight(u):
    """Poisson(1) draw from a uniform column via baked CDF cutoffs."""
    w = F.when(u < _POIS_CDF[0], 0)
    for k in range(1, 5):
        w = w.when(u < _POIS_CDF[k], k)
    return w.otherwise(5)


def _o_pois_weight(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    return f"CASE {branches} ELSE 5 END"


_O_U32 = (
    "(CAST("
    + " + ".join(
        f"(instr('0123456789abcdef', substr({{h}},{i + 1},1))-1)*{16 ** (7 - i)}"
        for i in range(8)
    )
    + " AS DOUBLE) + 0.5) / 4294967296.0"
)


@query(
    "q_bootstrap_ci",
    oracle=f"""
    WITH reps AS (
      SELECT e.event_type, b.b,
             {_o_pois_weight(_O_U32.format(h="md5(e.event_id || ':' || b.b)"))}
               AS w,
             CAST(e.value AS DECIMAL(30,8)) AS v
      FROM events e CROSS JOIN (SELECT unnest(range({_BOOT_B})) AS b) b
      WHERE e.value IS NULL OR isfinite(e.value)
    ),
    means AS (
      SELECT event_type, b,
             CAST(SUM(w * v) AS DOUBLE) / SUM(w) AS mean_b
      FROM reps GROUP BY event_type, b HAVING SUM(w) > 0
    ),
    ranked AS (
      SELECT event_type, mean_b,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY mean_b, b) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS nb
      FROM means
    )
    SELECT event_type,
           CAST(MAX(nb) AS BIGINT) AS n_replicates,
           round(MIN(CASE WHEN rn = 2 THEN mean_b END), 4) AS ci_lo,
           round(MIN(CASE WHEN rn = nb - 1 THEN mean_b END), 4) AS ci_hi
    FROM ranked
    GROUP BY event_type
    """,
)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for the per-type mean of
    ``events.value`` — uncertainty quantification as a lake query. The
    classic resample-with-replacement bootstrap needs the row count up
    front and a global shuffle per replicate; the POISSON bootstrap
    (Chamandy et al. 2012 — the web-scale formulation) instead gives
    every row an independent Poisson(1) weight per replicate, making
    all B replicates one MAP + one aggregation over B×|groups| cells —
    the only formulation that runs in a single pass at 100 TB.

    Determinism: the per-(row, replicate) uniform is md5 integer
    arithmetic; the Poisson inverse-CDF cutoffs are baked literals
    (no exp in the row path); replicate means divide DECIMAL-exact
    weighted sums once. The CI picks exact ORDER STATISTICS of the B
    replicate means (2nd and (B−1)th — the q_outlier_iqr discipline:
    element picks, never interpolation) via a window over B rows per
    group. B=50 trades CI resolution for bench cost; scale it with
    budget, not with data size.
    """
    from ..common import finite

    # The B-fold explode amplifies each input partition 50x; spread()
    # fixes the single-row-group scan's one-task plan before the 5M md5
    # evaluations (conditional — a well-partitioned lake scan keeps its
    # partitioning; downstream aggregate is placement-independent).
    # Non-finite values are excluded up front (finite contract,
    # nonfinite sweep find r10): Spark's decimal cast silently NULLs a
    # NaN but its Poisson weight would still inflate the denominator,
    # while DuckDB's cast throws — both wrong, one loudly.
    e = spread(
        table(spark, sf_dir, "events").where(
            F.col("value").isNull() | finite(F.col("value"))
        ),
        spark,
    )
    reps = e.select(
        "event_type",
        F.explode(F.array(*[F.lit(b) for b in range(_BOOT_B)])).alias("b"),
        F.col("value").cast("decimal(30,8)").alias("v"),
        F.col("event_id"),
    )
    u = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", "event_id", "b")), 1, 8), 16, 10
        ).cast("double")
        + 0.5
    ) / 4294967296.0
    means = (
        reps.select("event_type", "b", _pois_weight(u).alias("w"), "v")
        .groupBy("event_type", "b")
        .agg(
            (F.sum(F.col("w") * F.col("v")).cast("double") / F.sum("w")).alias(
                "mean_b"
            ),
            F.sum("w").alias("sw"),
        )
        .where(F.col("sw") > 0)
    )
    w = Window.partitionBy("event_type").orderBy("mean_b", "b")
    ranked = means.select(
        "event_type",
        "mean_b",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("nb"),
    )
    return ranked.groupBy("event_type").agg(
        F.max("nb").cast("bigint").alias("n_replicates"),
        F.round(F.min(F.when(F.col("rn") == 2, F.col("mean_b"))), 4).alias("ci_lo"),
        F.round(
            F.min(F.when(F.col("rn") == F.col("nb") - 1, F.col("mean_b"))), 4
        ).alias("ci_hi"),
    )


@query(
    "q_penny_allocation",
    oracle="""
    WITH li AS (
      -- the testdata carries duplicate (orderkey, linenumber) rows;
      -- allocation targets must be unique, so quantities pre-aggregate
      SELECT l_orderkey, l_linenumber, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    tot AS (
      SELECT l.l_orderkey,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS t_cents,
             SUM(l.qty) AS q_sum
      FROM li l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2
    ),
    base AS (
      SELECT l.l_orderkey, l.l_linenumber,
             (t.t_cents * l.qty) // t.q_sum AS base_cents,
             (t.t_cents * l.qty) % t.q_sum AS rem,
             t.t_cents
      FROM li l JOIN tot t ON l.l_orderkey = t.l_orderkey
    ),
    short AS (
      SELECT l_orderkey, t_cents - SUM(base_cents) AS leftover
      FROM base GROUP BY l_orderkey, t_cents
    ),
    ranked AS (
      SELECT b.l_orderkey, b.l_linenumber, b.base_cents, s.leftover,
             row_number() OVER (PARTITION BY b.l_orderkey
                                ORDER BY b.rem DESC, b.l_linenumber) AS rk
      FROM base b JOIN short s ON b.l_orderkey = s.l_orderkey
    )
    SELECT l_orderkey, l_linenumber,
           CAST(base_cents + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_cents
    FROM ranked
    """,
)
def q_penny_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder ("penny") allocation: each order's total, in
    integer cents, is prorated across its line items by quantity share
    so that the per-order allocations RECONCILE EXACTLY — floor every
    share, then hand the leftover cents to the largest fractional
    remainders (ties to the lower line number). This is the financial
    allocation primitive naive `total * ratio` rounding gets wrong
    (per-order sums drift by ±n/2 cents, and audits notice); the same
    shape prorates budgets, token quotas, and sampling allocations.

    Pure INTEGER arithmetic end to end — products bounded by
    cents × quantity ≈ 2.5e9 (bigint-safe), remainders exact, so both
    engines agree bit-for-bit with no decimal/float anywhere. Shape:
    one join to bring order totals, one per-order aggregate for the
    floor-sum, one remainder-rank window over ≤7-row groups — all
    hash-partitioned on orderkey, no global order.
    """
    # One hash-partitioning on l_orderkey serves EVERYTHING: the
    # explicit repartition's HashPartitioning(l_orderkey) satisfies the
    # (l_orderkey, l_linenumber) groupBy's clustering requirement AND
    # both per-order window passes, and the order totals arrive by
    # broadcast — so the whole allocation runs on ONE shuffle of the
    # fact rows. The per-order aggregates that used to be join-backed
    # subtrees (q_sum, leftover) are window sums over the SAME
    # partitioning: q_sum = SUM(qty) OVER (PARTITION BY order), leftover
    # = t_cents − SUM(base_cents) OVER (PARTITION BY order) — identical
    # integers by definition. The old agg+join spelling re-derived the
    # lineitem dedup once per consumer (plan audit r11: 6 lineitem
    # scans, 12 exchanges → now 1 scan, 2 exchanges incl. the
    # broadcast; plans/r11/q_penny_allocation_{before,after}.txt).
    # Measured 2.32 → ~0.6 s at sf0.1; at 100 TB this is the difference
    # between one fact shuffle and three.
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_linenumber")  # dedup PK collisions in testdata
        .agg(F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty"))
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("t_cents"),
    )
    w_order = Window.partitionBy("l_orderkey")
    # No forced broadcast (ADVICE r11, medium): orders is SF-proportional,
    # so a pinned F.broadcast would hit Spark's 8 GB broadcast cap at the
    # 100 TB scale this comment serves — the same rule graph.py's r4
    # advisory pinned for growing inputs. AQE still broadcasts the 2-column
    # projection at every local SF (plan verified: BroadcastHashJoin
    # unchanged at sf0.1/sf0.01); on a real lake it degrades gracefully to
    # a shuffle join of the projection instead of failing outright.
    joined = li.join(
        o, li.l_orderkey == o.o_orderkey
    ).select("l_orderkey", "l_linenumber", "qty", "t_cents")
    base = joined.select(
        "l_orderkey",
        "l_linenumber",
        "t_cents",
        F.sum("qty").over(w_order).alias("q_sum"),
        "qty",
    ).select(
        "l_orderkey",
        "l_linenumber",
        "t_cents",
        F.expr("(t_cents * qty) div q_sum").alias("base_cents"),
        ((F.col("t_cents") * F.col("qty")) % F.col("q_sum")).alias("rem"),
    )
    w_rank = Window.partitionBy("l_orderkey").orderBy(
        F.col("rem").desc(), F.col("l_linenumber")
    )
    w_all = w_rank.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = base.select(
        "l_orderkey",
        "l_linenumber",
        "base_cents",
        (F.col("t_cents") - F.sum("base_cents").over(w_all)).alias("leftover"),
        F.row_number().over(w_rank).alias("rk"),
    )
    return ranked.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("base_cents")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        ).cast("bigint").alias("alloc_cents"),
    )


@query(
    "q_quantile_normalize",
    oracle="""
    WITH src AS (
      SELECT event_id, value,
             row_number() OVER (ORDER BY value, event_id) AS rn
      FROM events WHERE event_type = 'error' AND value IS NOT NULL
    ),
    ref AS (
      SELECT value AS ref_value,
             row_number() OVER (ORDER BY value, event_id) AS rr
      FROM events WHERE event_type = 'view' AND value IS NOT NULL
    ),
    sizes AS (
      SELECT (SELECT COUNT(*) FROM src) AS n, (SELECT COUNT(*) FROM ref) AS m
    )
    SELECT s.event_id, s.value AS orig_value, r.ref_value AS normalized_value
    FROM src s CROSS JOIN sizes z
    JOIN ref r ON r.rr = (s.rn * z.m + z.n - 1) // z.n
    """,
)
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization between two distributions: each 'error'
    value is replaced by the 'view' value at the SAME relative rank —
    the microarray-era normalization that calibrates scores across
    models, datasets, or annotators by forcing identical marginals
    (Bolstad et al. 2003). q_ecdf_normalize maps values to decile IDs;
    this maps them onto a full reference DISTRIBUTION.

    Integer-exact end to end: ranks come from total-order rankings, the
    target rank is the ceiling division (rn·m + n − 1) div n in pure
    bigints (no float ever touches the mapping), and the lookup is a
    hash equi-join on the integer rank. Scale-safe ranking: both
    subsets rank via the ``global_row_number`` range-partition +
    per-partition-offset construction (one range shuffle each, no
    single-task window over data — the q_ntile_global data path); the
    mapping join is metadata-light (rank ints + one double column).
    """
    from .windows import global_row_number

    e = table(spark, sf_dir, "events")
    # Order statistics skip NULLs (the q_outlier_iqr convention) — and
    # the engines disagree on where unfiltered NULLs would rank (Spark
    # ASC = NULLS FIRST, DuckDB default = NULLS LAST), so the filter is
    # also what keeps the two rankings comparable.
    src_rows = e.where(
        (F.col("event_type") == "error") & F.col("value").isNotNull()
    )
    ref_rows = e.where(
        (F.col("event_type") == "view") & F.col("value").isNotNull()
    )
    order = [F.col("value").asc(), F.col("event_id").asc()]
    src = global_row_number(src_rows.select("event_id", "value"), order, "rn")
    ref = global_row_number(
        ref_rows.select("event_id", F.col("value").alias("ref_value")),
        [F.col("ref_value").asc(), F.col("event_id").asc()],
        "rr",
    ).select("ref_value", "rr")
    # sizes from the raw filters (no window in the count subtrees)
    sizes = src_rows.agg(F.count(F.lit(1)).alias("n")).crossJoin(
        ref_rows.agg(F.count(F.lit(1)).alias("m"))
    )
    target = src.crossJoin(F.broadcast(sizes)).select(
        "event_id",
        F.col("value").alias("orig_value"),
        F.expr("(rn * m + n - 1) div n").alias("rr"),
    )
    return target.join(ref, "rr").select(
        "event_id", "orig_value", F.col("ref_value").alias("normalized_value")
    )


@query(
    "q_impute_missing",
    oracle="""
    WITH holed AS (
      SELECT c_custkey, c_mktsegment,
             CASE WHEN c_custkey % 13 = 0 THEN NULL
                  ELSE CAST(c_acctbal AS DOUBLE) END AS v
      FROM customer
    ),
    med AS (
      SELECT c_mktsegment, quantile_disc(v, 0.5) AS seg_median
      FROM holed WHERE v IS NOT NULL GROUP BY c_mktsegment
    )
    SELECT h.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN h.v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_imputed,
           round(m.seg_median, 4) AS seg_median,
           round(CAST(SUM(CAST(COALESCE(h.v, m.seg_median) AS DECIMAL(30,2)))
                      AS DOUBLE) / COUNT(*), 4) AS imputed_mean
    FROM holed h JOIN med m ON h.c_mktsegment = m.c_mktsegment
    GROUP BY h.c_mktsegment, m.seg_median
    """,
)
def q_impute_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-median missing-value imputation — the feature-prep step
    between profiling (q_dq_profile counts the nulls) and modeling
    (q_target_encode consumes complete columns): nulls are filled with
    their segment's DISCRETE median (a real observed balance, the
    element-pick discipline), and the report shows per segment how many
    cells were imputed and the resulting mean. Missingness is injected
    deterministically (every 13th customer — the q_dedup_normalized
    variant discipline) since the testdata ships complete.

    Shape: one ranked-window median over the non-null subset per
    segment (q_percentile_disc formulation), broadcast back onto the
    row scan for the COALESCE — one shuffle for the window, map-side
    fill, decimal-exact mean (DECIMAL(30,2): balances are 2-decimal, so
    the int128 stays under 2^53 where both engines' decimal→double
    casts round identically).
    """
    c = table(spark, sf_dir, "customer")
    holed = c.select(
        "c_custkey",
        "c_mktsegment",
        F.when(F.col("c_custkey") % 13 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("c_acctbal").cast("double"))
        .alias("v"),
    )
    nn = holed.where(F.col("v").isNotNull())
    w = Window.partitionBy("c_mktsegment").orderBy("v", "c_custkey")
    wc = Window.partitionBy("c_mktsegment")
    ranked = nn.select(
        "c_mktsegment",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    med = ranked.groupBy("c_mktsegment").agg(
        F.min(
            F.when(F.col("rn") == F.ceil(F.col("n") / 2), F.col("v"))
        ).alias("seg_median")
    )
    filled = holed.join(F.broadcast(med), "c_mktsegment")
    return (
        filled.groupBy("c_mktsegment", "seg_median")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_imputed"),
            F.round(
                F.sum(
                    F.coalesce(F.col("v"), F.col("seg_median")).cast("decimal(30,2)")
                ).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("imputed_mean"),
        )
        .select(
            "c_mktsegment",
            "n",
            "n_imputed",
            F.round("seg_median", 4).alias("seg_median"),
            "imputed_mean",
        )
    )


@query(
    "q_woe_binning",
    oracle="""
    WITH lab AS (
      SELECT c.c_custkey,
             CAST(floor(c.c_acctbal / 2000) AS INT) AS band,
             CASE WHEN COUNT(o.o_orderkey) >= 12 THEN 1 ELSE 0 END AS y
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    bins AS (
      SELECT band,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS n_pos,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg
      FROM lab GROUP BY band
    ),
    tot AS (
      SELECT SUM(n_pos) AS gp, SUM(n_neg) AS gn, COUNT(*) AS k FROM bins
    ),
    scored AS (
      SELECT b.band, b.n, b.n_pos, b.n_neg,
             ln(((b.n_pos + 0.5) / (t.gp + 0.5 * t.k))
                / ((b.n_neg + 0.5) / (t.gn + 0.5 * t.k))) AS woe,
             (((b.n_pos + 0.5) / (t.gp + 0.5 * t.k))
              - ((b.n_neg + 0.5) / (t.gn + 0.5 * t.k)))
             * ln(((b.n_pos + 0.5) / (t.gp + 0.5 * t.k))
                  / ((b.n_neg + 0.5) / (t.gn + 0.5 * t.k))) AS ivc
      FROM bins b CROSS JOIN tot t
    )
    SELECT band, n, n_pos, n_neg,
           round(woe, 4) AS woe,
           round(ivc, 4) AS iv_contrib,
           round(CAST(SUM(CAST(ivc AS DECIMAL(20,8))) OVER () AS DOUBLE), 4)
             AS iv_total
    FROM scored
    """,
)
def q_woe_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence binning with information value — the
    credit-scoring feature transform (Siddiqi 2006) that turns a
    numeric column into supervised log-odds scores: per balance band,
    WoE = ln(share of positives / share of negatives) with 0.5 Laplace
    smoothing, plus each band's IV contribution and the feature's
    total IV (the keep/drop screen: IV < 0.02 = useless predictor —
    which this synthetic label correctly scores as, the audit working
    as designed). Completes the supervised-feature trio: target
    encoding (mean target), WoE (log odds), imputation (completeness).

    Label derivation is one counting join (customer ⟕ orders); bins are
    a floor-division map; scoring is arithmetic over the |bins|-row
    table with the same literal-smoothed IEEE tree on both engines
    (ln-parity at ROUND(·,4) per the q_text_entropy precedent); the
    total IV decimal-accumulates over bins like q_benford_audit's
    chi-square so summation order cannot drift.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    lab = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(
            "c_custkey",
            F.floor(F.col("c_acctbal") / 2000).cast("int").alias("band"),
        )
        .agg(
            F.when(F.count("o_orderkey") >= 12, 1).otherwise(0).alias("y")
        )
    )
    bins = lab.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("bigint").alias("n_neg"),
    )
    tot = bins.agg(
        F.sum("n_pos").alias("gp"),
        F.sum("n_neg").alias("gn"),
        F.count(F.lit(1)).alias("k"),
    )
    ps = (F.col("n_pos") + 0.5) / (F.col("gp") + 0.5 * F.col("k"))
    ns = (F.col("n_neg") + 0.5) / (F.col("gn") + 0.5 * F.col("k"))
    woe = F.log(ps / ns)
    scored = bins.crossJoin(F.broadcast(tot)).select(
        "band",
        "n",
        "n_pos",
        "n_neg",
        woe.alias("woe"),
        ((ps - ns) * woe).alias("ivc"),
    )
    w_all = Window.partitionBy()
    return scored.select(
        "band",
        "n",
        "n_pos",
        "n_neg",
        F.round("woe", 4).alias("woe"),
        F.round("ivc", 4).alias("iv_contrib"),
        F.round(
            F.sum(F.col("ivc").cast("decimal(20,8)")).over(w_all).cast("double"), 4
        ).alias("iv_total"),
    )


# Critical value for the segment×nation table: df = (5-1)(25-1) = 96,
# alpha = 0.05 (chi-square upper quantile, precomputed literal).
_CHI2_CRIT_DF96 = 119.871


@query(
    "q_chi2_independence",
    oracle=f"""
    WITH cells AS (
      SELECT c_mktsegment AS seg, CAST(c_nationkey AS INT) AS nat,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM customer GROUP BY 1, 2
    ),
    margins AS (
      SELECT seg, SUM(n) AS rs FROM cells GROUP BY seg
    ),
    cols AS (
      SELECT nat, SUM(n) AS cs FROM cells GROUP BY nat
    ),
    tot AS (SELECT SUM(n) AS nt FROM cells),
    scored AS (
      SELECT c.seg, c.nat, c.n,
             CAST(m.rs AS DOUBLE) * c2.cs / t.nt AS expected,
             (c.n - CAST(m.rs AS DOUBLE) * c2.cs / t.nt)
               * (c.n - CAST(m.rs AS DOUBLE) * c2.cs / t.nt)
               / (CAST(m.rs AS DOUBLE) * c2.cs / t.nt) AS chi2_part
      FROM cells c
      JOIN margins m ON c.seg = m.seg
      JOIN cols c2 ON c.nat = c2.nat
      CROSS JOIN tot t
    )
    SELECT seg,
           CAST(SUM(n) AS BIGINT) AS n_customers,
           round(CAST(SUM(CAST(chi2_part AS DECIMAL(20,8))) AS DOUBLE), 4)
             AS seg_chi2,
           round(CAST((SELECT SUM(CAST(chi2_part AS DECIMAL(20,8))) FROM scored)
                      AS DOUBLE), 4) AS chi2_total,
           CAST((SELECT SUM(CAST(chi2_part AS DECIMAL(20,8))) FROM scored)
                AS DOUBLE) <= {_CHI2_CRIT_DF96} AS independent
    FROM scored
    GROUP BY seg
    """,
)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square INDEPENDENCE test on the segment × nation contingency
    table — completing the statistical-test family (q_ab_test =
    two-proportion z, q_benford_audit = goodness-of-fit; this answers
    "are two categorical columns associated", the screen run before
    trusting a categorical feature split or stratification scheme).
    Expected cell counts are row-margin × column-margin / N; per-segment
    chi-square contributions and the global verdict against the df=96
    literal critical value ship in every row.

    Shape: one groupBy to the |seg|×|nation| cell table, two margin
    aggregates joined back (125 rows — broadcast territory), the
    decimal-accumulated total (q_benford_audit discipline) so the
    125-term sum cannot drift with engine summation order. Every
    expected count is the same three-int IEEE tree on both engines.
    """
    c = table(spark, sf_dir, "customer")
    cells = c.groupBy(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").cast("int").alias("nat"),
    ).agg(F.count(F.lit(1)).alias("n"))
    margins = cells.groupBy("seg").agg(F.sum("n").alias("rs"))
    cols = cells.groupBy("nat").agg(F.sum("n").alias("cs"))
    tot = cells.agg(F.sum("n").alias("nt"))
    expected = F.col("rs").cast("double") * F.col("cs") / F.col("nt")
    scored = (
        cells.join(F.broadcast(margins), "seg")
        .join(F.broadcast(cols), "nat")
        .crossJoin(F.broadcast(tot))
        .select(
            "seg",
            "nat",
            "n",
            ((F.col("n") - expected) * (F.col("n") - expected) / expected).alias(
                "chi2_part"
            ),
        )
    )
    w_all = Window.partitionBy()
    total_chi2 = (
        F.sum(F.col("chi2_part").cast("decimal(20,8)")).over(w_all).cast("double")
    )
    per_seg = scored.select(
        "seg",
        "n",
        "chi2_part",
        total_chi2.alias("t_chi2"),
    )
    return per_seg.groupBy("seg", "t_chi2").agg(
        F.sum("n").cast("bigint").alias("n_customers"),
        F.round(
            F.sum(F.col("chi2_part").cast("decimal(20,8)")).cast("double"), 4
        ).alias("seg_chi2"),
    ).select(
        "seg",
        "n_customers",
        "seg_chi2",
        F.round("t_chi2", 4).alias("chi2_total"),
        (F.col("t_chi2") <= _CHI2_CRIT_DF96).alias("independent"),
    )


# --- deterministic mode ------------------------------------------------


@query(
    "q_mode_agg",
    oracle="""
    WITH counts AS (
      SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
      FROM lineitem GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY l_returnflag ORDER BY cnt DESC, l_quantity DESC) AS rn
      FROM counts
    )
    SELECT l_returnflag, l_quantity AS mode_qty, CAST(cnt AS BIGINT) AS n_occurrences
    FROM ranked WHERE rn = 1
    ORDER BY l_returnflag
    """,
)
def q_mode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with a DETERMINISTIC tie rule (largest value wins).

    Built-in ``mode()`` is free to return any modal value on ties —
    useless under an exact-parity contract — so the argmax runs as
    max(struct(cnt, value)): two partial-aggregatable hash aggs, no
    window, shuffle bounded by |group x distinct value| then |group|.
    """
    li = table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    best = counts.groupBy("l_returnflag").agg(
        F.max(F.struct("cnt", "l_quantity")).alias("b")
    )
    return best.select(
        "l_returnflag",
        F.col("b.l_quantity").alias("mode_qty"),
        F.col("b.cnt").alias("n_occurrences"),
    ).orderBy("l_returnflag")


# --- weighted median ---------------------------------------------------


@query(
    "q_weighted_median",
    oracle="""
    WITH g AS (
      SELECT l_returnflag AS rf, l_quantity AS qty,
             SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    c AS (
      SELECT rf, qty,
             SUM(w) OVER (PARTITION BY rf ORDER BY qty) AS cum,
             SUM(w) OVER (PARTITION BY rf) AS tot
      FROM g
    )
    SELECT rf AS l_returnflag, MIN(qty) AS wmedian_qty
    FROM c WHERE 2 * cum >= tot
    GROUP BY rf ORDER BY rf
    """,
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-weighted median quantity per return flag: the smallest qty
    whose cumulative weight reaches half the group total.

    Weights pre-aggregate per (group, value) — the window then runs over
    |distinct values| rows, not the data — and accumulate as
    DECIMAL(30,8), so the 2*cum >= tot cut is exact in both engines
    (a double cumsum would make the boundary row engine-dependent).
    """
    li = table(spark, sf_dir, "lineitem")
    g = li.groupBy(
        F.col("l_returnflag").alias("rf"), F.col("l_quantity").alias("qty")
    ).agg(F.sum(F.col("l_extendedprice").cast(DEC)).alias("w"))
    w_cum = Window.partitionBy("rf").orderBy("qty").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_tot = Window.partitionBy("rf")
    c = g.select(
        "rf",
        "qty",
        F.sum("w").over(w_cum).alias("cum"),
        F.sum("w").over(w_tot).alias("tot"),
    )
    return (
        c.where(F.lit(2) * F.col("cum") >= F.col("tot"))
        .groupBy(F.col("rf").alias("l_returnflag"))
        .agg(F.min("qty").alias("wmedian_qty"))
        .orderBy("l_returnflag")
    )


# --- Kaplan-Meier survival ---------------------------------------------


@query(
    "q_kaplan_meier",
    oracle="""
    WITH raw_gaps AS (
      SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    ),
    gaps AS (
      -- greatest(gap, 0): a negative inter-event gap (ts not monotone
      -- in event_id) would divide differently cross-engine (Spark div
      -- truncates toward zero, DuckDB // floors); clamping keeps the
      -- bucket arithmetic on nonneg ints where both agree
      SELECT (greatest(gap, 0) // 600000000) AS dur, 1 AS observed
      FROM raw_gaps WHERE gap IS NOT NULL
    ),
    open_gaps AS (
      SELECT (((SELECT MAX(epoch_us(ts)) FROM events WHERE ts IS NOT NULL)
                  - MAX(epoch_us(ts)))
                  // 600000000) AS dur,
             0 AS observed
      FROM events WHERE ts IS NOT NULL GROUP BY user_id
    ),
    obs AS (
      SELECT dur, observed FROM gaps WHERE dur IS NOT NULL
      UNION ALL SELECT dur, observed FROM open_gaps
    ),
    at_dur AS (
      SELECT dur, SUM(observed) AS deaths, COUNT(*) - SUM(observed) AS censored
      FROM obs GROUP BY dur
    ),
    risk AS (
      SELECT dur, deaths, censored,
             (SELECT COUNT(*) FROM obs)
               - COALESCE(SUM(deaths + censored) OVER (ORDER BY dur
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS at_risk
      FROM at_dur
    )
    SELECT CAST(dur AS BIGINT) AS gap_10min,
           CAST(at_risk AS BIGINT) AS at_risk,
           CAST(deaths AS BIGINT) AS deaths,
           CAST(censored AS BIGINT) AS censored,
           CASE WHEN MAX(CASE WHEN deaths = at_risk THEN 1 ELSE 0 END)
                     OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) = 1
                THEN 0.0
                ELSE round(exp(SUM(ln(CASE WHEN deaths < at_risk
                                          THEN (at_risk - deaths) * 1.0 / at_risk
                                          ELSE 1.0 END))
                           OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING)), 6)
           END AS survival
    FROM risk
    ORDER BY gap_10min
    """,
)
def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival of inter-event gaps (renewal analysis):
    how long until a user acts again, with RIGHT-CENSORING — the open
    gap from each user's last event to the stream's end is a censored
    observation, not a death (the estimator's whole point; a naive gap
    ECDF would bias short).

    Durations are exact integer 10-minute buckets from microsecond
    arithmetic, clamped nonneg with greatest(gap, 0) before the div —
    truncating (Spark) vs flooring (DuckDB) division only agree on
    nonneg ints, so an out-of-order timestamp can't diverge engines. Scale split: the data-sized passes are one lag window and
    one per-user aggregate; the life table is bounded by the time range
    (≤ ~4.3k buckets/month), and the KM product runs as a window over
    THAT (product via exp-sum-ln, same expression tree both engines,
    6-dp rounded; zero-death rows contribute ln(1) = 0 exactly).
    at_risk decrements by deaths AND censored — the KM bookkeeping —
    via one cumulative window.
    """
    from pyspark.sql import Window

    # ts IS NOT NULL on BOTH sides (r8 advice): a NULL ts would make
    # Spark's greatest(NULL, 0L) emit a dur=0 death where the oracle's
    # gap IS NOT NULL drops it, and an all-NULL-ts user would yield a
    # NULL dur whose window ordering differs cross-engine (Spark NULLS
    # FIRST vs DuckDB NULLS LAST). Filtering pins both.
    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select("user_id", "event_id", F.unix_micros("ts").alias("us"))
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    gaps = (
        ev.withColumn("prev_us", F.lag("us").over(w))
        .where(F.col("prev_us").isNotNull())
        .select(
            F.expr(
                "CAST(greatest(us - prev_us, 0L) div 600000000 AS BIGINT)"
            ).alias("dur"),
            F.lit(1).alias("observed"),
        )
    )
    gmax = ev.agg(F.max("us").alias("gmax"))
    open_gaps = (
        ev.groupBy("user_id")
        .agg(F.max("us").alias("last_us"))
        .crossJoin(F.broadcast(gmax))
        .select(
            F.expr("CAST((gmax - last_us) div 600000000 AS BIGINT)").alias("dur"),
            F.lit(0).alias("observed"),
        )
    )
    obs = gaps.unionByName(open_gaps)
    n_total = obs.agg(F.count(F.lit(1)).alias("n_total"))
    at_dur = obs.groupBy("dur").agg(
        F.sum("observed").alias("deaths"),
        (F.count(F.lit(1)) - F.sum("observed")).alias("censored"),
    )
    # NOTE for auditors: the unpartitioned Windows below fire Spark's
    # `WindowExec: No Partition Defined` warning. That is expected and
    # safe HERE: they run on the post-aggregation censored life table
    # (bounded by the time range (~4.3k 10-min buckets/month) — metadata-scale, never the fact
    # table), which is exactly the bounded-frame case the scale-funnel
    # lint (plans/lint.py) exempts.
    w_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    w_run = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    risk = at_dur.crossJoin(F.broadcast(n_total)).withColumn(
        "at_risk",
        F.col("n_total")
        - F.coalesce(F.sum(F.col("deaths") + F.col("censored")).over(w_prev), F.lit(0)),
    )
    # The last death bucket has deaths == at_risk: the curve hits an
    # exact 0 there (ln(0) would error in DuckDB / NULL in Spark), so a
    # cumulative "zeroed" flag short-circuits it in both engines.
    zeroed = F.max(
        F.when(F.col("deaths") == F.col("at_risk"), 1).otherwise(0)
    ).over(w_run)
    term = F.when(
        F.col("deaths") < F.col("at_risk"),
        (F.col("at_risk") - F.col("deaths")) * F.lit(1.0) / F.col("at_risk"),
    ).otherwise(F.lit(1.0))
    return risk.select(
        F.col("dur").cast("bigint").alias("gap_10min"),
        F.col("at_risk").cast("bigint").alias("at_risk"),
        F.col("deaths").cast("bigint").alias("deaths"),
        F.col("censored").cast("bigint").alias("censored"),
        F.when(zeroed == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.sum(F.log(term)).over(w_run)), 6))
        .alias("survival"),
    ).orderBy("gap_10min")


# --- Gini concentration (banded Lorenz) --------------------------------

# 10-dollar revenue bands: the Lorenz curve computes over a table
# bounded by the VALUE RANGE (~60k bands at TPC-H magnitudes), not the
# customer count — same bounded-table trick as the AUC histogram and
# the Kaplan-Meier life table.
_GINI_BAND = 100000  # cents per band


@query(
    "q_gini_revenue",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey,
             SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey
    ),
    bands AS (
      SELECT cents // {_GINI_BAND} AS band,
             COUNT(*) AS f, SUM(cents) AS s
      FROM per_cust GROUP BY 1
    ),
    lorenz AS (
      SELECT band, f, s,
             COALESCE(SUM(s) OVER (ORDER BY band
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s_below
      FROM bands
    )
    SELECT CAST(SUM(f) AS BIGINT) AS n_customers,
           CAST(SUM(s) AS BIGINT) AS total_cents,
           round(1.0 - CAST(SUM(f * (2 * s_below + s)) AS DOUBLE)
                       / (CAST(SUM(f) AS DOUBLE) * SUM(s)), 6) AS gini
    FROM lorenz
    """,
)
def q_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration, from a
    banded Lorenz curve.

    The data-sized passes are one per-customer aggregate and one band
    histogram (both map-side combined); the Lorenz accumulation windows
    the BAND table, bounded by the value range. Within-band mass is
    treated as uniform (the estimator's resolution is the band width;
    the oracle bins identically, so parity is exact on the shared
    definition). All sums are integer cents; the coefficient is one
    double division, rounded 6 dp. This is how inequality/concentration
    metrics run at 100 TB: never a global sort of entities, always a
    bounded value-histogram.
    """
    from pyspark.sql import Window

    cents = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
    per_cust = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.expr(cents)).alias("cents"))
    )
    bands = per_cust.groupBy(
        F.expr(f"cents div {_GINI_BAND}").alias("band")
    ).agg(F.count(F.lit(1)).alias("f"), F.sum("cents").alias("s"))
    # NOTE for auditors: the unpartitioned Windows below fire Spark's
    # `WindowExec: No Partition Defined` warning. That is expected and
    # safe HERE: they run on the post-aggregation banded Lorenz table
    # (bounded by the fixed band count — metadata-scale, never the fact
    # table), which is exactly the bounded-frame case the scale-funnel
    # lint (plans/lint.py) exempts.
    w_prev = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    lorenz = bands.withColumn(
        "s_below", F.coalesce(F.sum("s").over(w_prev), F.lit(0))
    )
    return lorenz.agg(
        F.sum("f").cast("bigint").alias("n_customers"),
        F.sum("s").cast("bigint").alias("total_cents"),
        F.round(
            F.lit(1.0)
            - F.sum(F.col("f") * (2 * F.col("s_below") + F.col("s"))).cast("double")
            / (F.sum("f").cast("double") * F.sum("s")),
            6,
        ).alias("gini"),
    )


# --- multiple-testing correction (Benjamini-Hochberg) ------------------


def _phi_tail_sql(z: str) -> str:
    """P(Z > z) for z >= 0 — Abramowitz & Stegun 26.2.17 rational
    approximation (|error| < 7.5e-8), built from *, +, exp only so the
    one text evaluates identically in Spark SQL and DuckDB."""
    t = f"(1.0 / (1.0 + 0.2316419 * ({z})))"
    poly = (
        f"({t} * (0.319381530 + {t} * (-0.356563782 + {t} * (1.781477937"
        f" + {t} * (-1.821255978 + {t} * 1.330274429)))))"
    )
    pdf = f"(0.3989422804014327 * exp(-0.5 * ({z}) * ({z})))"
    return f"({pdf} * {poly})"


_BH_ALPHA = 0.10


@query(
    "q_fdr_bh",
    oracle=f"""
    WITH per_nation AS (
      SELECT c.c_nationkey AS nation,
             COUNT(*) AS n,
             SUM(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS k
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey
    ),
    overall AS (
      SELECT CAST(SUM(k) AS DOUBLE) / SUM(n) AS p0 FROM per_nation
    ),
    tests AS (
      SELECT nation, n, k,
             abs((CAST(k AS DOUBLE) / n - p0)
                 / sqrt(p0 * (1.0 - p0) / n)) AS az
      FROM per_nation, overall
    ),
    pvals AS (
      SELECT nation, n, k, az,
             2.0 * {_phi_tail_sql('az')} AS p
      FROM tests
    ),
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY p, nation) AS rnk,
             COUNT(*) OVER () AS m
      FROM pvals
    ),
    cutoff AS (
      SELECT COALESCE(MAX(CASE WHEN p <= rnk * {_BH_ALPHA} / m
                               THEN rnk END), 0) AS k_star
      FROM ranked
    )
    SELECT CAST(nation AS INT) AS nation,
           CAST(n AS BIGINT) AS n_orders,
           CAST(k AS BIGINT) AS n_urgent,
           round(az, 6) AS abs_z,
           round(p, 8) AS p_value,
           rnk <= k_star AS bh_reject
    FROM ranked, cutoff
    ORDER BY nation
    """,
)
def q_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR correction over 25 simultaneous two-sided
    z-tests (per-nation urgent-order share vs the global share): the
    multiple-testing discipline a metrics platform needs once it runs
    one test per segment.

    Data-sized work is one join + hash agg; the z/p computation, the
    p-value ranking, and the BH step-up cutoff (largest k with p_(k) <=
    k·α/m) all run on the |segments| table. The normal tail uses a
    shared-text A&S rational approximation (exp/mul/add only — DuckDB
    has no erf), so both engines produce bit-identical p-values; the
    step-up comparison is then exact, not rounding-dependent.
    """
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    per_nation = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("k"),
        )
    )
    glob = per_nation.agg(
        (F.sum("k").cast("double") / F.sum("n")).alias("p0")
    )
    tests = per_nation.crossJoin(F.broadcast(glob)).withColumn(
        "az",
        F.abs(
            (F.col("k").cast("double") / F.col("n") - F.col("p0"))
            / F.sqrt(F.col("p0") * (1.0 - F.col("p0")) / F.col("n"))
        ),
    )
    pvals = tests.withColumn("p", F.expr(f"2.0 * {_phi_tail_sql('az')}"))
    w_rank = Window.orderBy("p", "nation")
    w_all = Window.partitionBy()
    ranked = pvals.withColumn("rnk", F.row_number().over(w_rank)).withColumn(
        "m", F.count(F.lit(1)).over(w_all)
    )
    cutoff = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p") <= F.col("rnk") * _BH_ALPHA / F.col("m"), F.col("rnk")
                )
            ),
            F.lit(0),
        ).alias("k_star")
    )
    return (
        ranked.crossJoin(F.broadcast(cutoff))
        .select(
            F.col("nation").cast("int").alias("nation"),
            F.col("n").cast("bigint").alias("n_orders"),
            F.col("k").cast("bigint").alias("n_urgent"),
            F.round("az", 6).alias("abs_z"),
            F.round("p", 8).alias("p_value"),
            (F.col("rnk") <= F.col("k_star")).alias("bh_reject"),
        )
        .orderBy("nation")
    )


# --- experiment sizing (minimum detectable effect) ---------------------

# z_{alpha/2} for alpha=0.05 and z_beta for 80% power — standard
# constants, written as literals so both engines see identical doubles.
_Z_ALPHA2 = "1.959963984540054"
_Z_BETA = "0.8416212335729143"


@query(
    "q_ab_power",
    oracle=f"""
    WITH per_nation AS (
      SELECT c.c_nationkey AS nation,
             COUNT(*) AS n,
             SUM(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS k
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey
    )
    SELECT CAST(nation AS INT) AS nation,
           CAST(n AS BIGINT) AS n_orders,
           round(CAST(k AS DOUBLE) / n, 6) AS base_rate,
           round(({_Z_ALPHA2} + {_Z_BETA})
                 * sqrt(2.0 * (CAST(k AS DOUBLE) / n)
                        * (1.0 - CAST(k AS DOUBLE) / n) / (n / 2.0)), 6)
             AS mde_abs
    FROM per_nation
    ORDER BY nation
    """,
)
def q_ab_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment sizing per segment: the minimum detectable absolute
    effect (two-sided α=0.05, 80% power, 50/50 split of the segment's
    current traffic) for each nation's urgent-order rate — the
    pre-registration companion to q_fdr_bh's post-hoc correction.

    One join + hash agg is the data pass; MDE = (z_{{α/2}}+z_β)·
    sqrt(2p(1-p)/(n/2)) evaluates per segment row with literal z
    constants, so the expression tree (and therefore every double) is
    identical in both engines before the 6-dp round.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    per_nation = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("k"),
        )
    )
    p = F.col("k").cast("double") / F.col("n")
    return per_nation.select(
        F.col("nation").cast("int").alias("nation"),
        F.col("n").cast("bigint").alias("n_orders"),
        F.round(p, 6).alias("base_rate"),
        F.round(
            (F.lit(float(_Z_ALPHA2)) + F.lit(float(_Z_BETA)))
            * F.sqrt(F.lit(2.0) * p * (F.lit(1.0) - p) / (F.col("n") / F.lit(2.0))),
            6,
        ).alias("mde_abs"),
    ).orderBy("nation")


@query(
    "q_hhi_concentration",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_nationkey AS nationkey,
             SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, o.o_custkey
    )
    SELECT nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           round(CAST(SUM(CAST(cents AS HUGEINT) * cents) AS DOUBLE)
                 / (CAST(SUM(cents) AS DOUBLE) * SUM(cents)), 9) AS hhi,
           round(1.0 / COUNT(*), 9) AS hhi_floor
    FROM per_cust
    GROUP BY nationkey
    ORDER BY nationkey
    """,
)
def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of revenue per nation: Σ of
    squared customer revenue shares — 1/n (perfect competition, emitted
    as hhi_floor) up to 1.0 (monopsony). The Gini's (q_gini_revenue)
    antitrust-flavored sibling; together they bound "how dependent is
    this market on few buyers".

    Exactness: revenue accumulates as integer CENTS; Σ cents² runs in
    DECIMAL(38,0)/HUGEINT (a customer at ~1e8 cents squared is 1e16 —
    an int64 Σ would overflow, the q_table_diff lesson). The final
    ratio is computed double-side and rounded to 9 dp: the wide-int →
    double cast drifts ≤2 ulp above 2^53 (documented DuckDB landmine),
    which is 1e-16 relative — seven orders below the rounding grid.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    cents = F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
    per_cust = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"), "o_custkey")
        .agg(F.sum(cents).alias("cents"))
    )
    sq = (F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("sq")
    return (
        per_cust.select("nationkey", "cents", sq)
        .groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("sq").alias("sum_sq"),
            F.sum("cents").alias("sum_c"),
        )
        .select(
            "nationkey",
            F.col("n_customers").cast("bigint").alias("n_customers"),
            F.round(
                F.col("sum_sq").cast("double")
                / (F.col("sum_c").cast("double") * F.col("sum_c")),
                9,
            ).alias("hhi"),
            F.round(F.lit(1.0) / F.col("n_customers"), 9).alias("hhi_floor"),
        )
        .orderBy("nationkey")
    )


@query(
    "q_gap_percentiles",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY event_type, user_id ORDER BY ts, event_id
             ) AS gap_us
      FROM events
    ),
    clean AS (SELECT event_type, gap_us FROM gaps WHERE gap_us IS NOT NULL)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(quantile_cont(gap_us, 0.5) / 60000000.0 AS DOUBLE)
             AS p50_minutes,
           CAST(quantile_cont(gap_us, 0.95) / 60000000.0 AS DOUBLE)
             AS p95_minutes
    FROM clean
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event cadence per stream: p50/p95 of the gap between a
    user's consecutive events of each type — the latency-SLO shape
    ("median purchase rhythm is X minutes, tail is Y") and the
    empirical input to session-timeout tuning (q_stream_session's
    30-minute gap is exactly a choice on this distribution's tail).

    Gaps are exact integer microseconds from one lag window; the exact
    percentiles interpolate on those integers ((a+b)/2 of ints — the
    cross-engine-identical case, per q_rolling_median), and the ONE
    division by 60e6 into minutes is the same double op both engines.
    At 100 TB the window partitions by (type, user) — full parallelism
    — and the percentile buffers per-type gap arrays; the scale path
    swaps in approx_percentile (q_agg_approx_quantile) when a type's
    gap count outgrows one task.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    gaps = (
        e.select(
            "event_type",
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias(
                "gap_us"
            ),
        )
        .where(F.col("gap_us").isNotNull())
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            (F.percentile("gap_us", F.lit(0.5)) / F.lit(60_000_000.0))
            .cast("double")
            .alias("p50_minutes"),
            (F.percentile("gap_us", F.lit(0.95)) / F.lit(60_000_000.0))
            .cast("double")
            .alias("p95_minutes"),
        )
        .select(
            "event_type",
            F.col("n_gaps").cast("bigint").alias("n_gaps"),
            "p50_minutes",
            "p95_minutes",
        )
        .orderBy("event_type")
    )


@query(
    "q_ks_test",
    oracle="""
    WITH s AS (
      SELECT value,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS na,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS nb
      FROM events
      WHERE event_type IN ('error', 'view') AND value IS NOT NULL
      GROUP BY value
    ),
    tot AS (SELECT SUM(na) AS n, SUM(nb) AS m FROM s),
    c AS (
      SELECT SUM(na) OVER (ORDER BY value) AS cum_a,
             SUM(nb) OVER (ORDER BY value) AS cum_b
      FROM s
    )
    SELECT CAST(t.n AS BIGINT) AS n,
           CAST(t.m AS BIGINT) AS m,
           floor(MAX(ABS(CAST(cum_a AS DOUBLE) / t.n
                         - CAST(cum_b AS DOUBLE) / t.m)) * 1e6 + 0.5) / 1e6
             AS ks_d,
           floor(MAX(ABS(CAST(cum_a AS DOUBLE) / t.n
                         - CAST(cum_b AS DOUBLE) / t.m))
                 * sqrt(CAST(t.n AS DOUBLE) * t.m / (t.n + t.m)) * 1e6 + 0.5)
             / 1e6 AS ks_scaled
    FROM c CROSS JOIN tot t
    WHERE t.n > 0 AND t.m > 0
    GROUP BY t.n, t.m
    """,
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the 'error' and
    'view' value distributions: D = max over observed values of
    |F_error(v) − F_view(v)| — the standard distribution-shift test a
    training pipeline runs between data snapshots (q_drift_psi's
    binned cousin, but bin-free and exact).

    Scale-safe construction: one hash aggregate collapses rows to
    DISTINCT values (per-value counts of each sample — map-side
    combine), then :func:`global_running_sum` produces the exact joint
    ECDF numerators with ONE range shuffle and a metadata-scale offset
    window — no single-task window ever sees data. Ties across samples
    are handled exactly because D is evaluated per distinct value
    (post-tie cumulative), the textbook convention. NULL values are
    excluded on both sides (the order-statistics convention). The
    division, |diff|, max, and sqrt are identical IEEE ops on both
    engines, so det_round(…, 6) hash-matches.
    """
    from ..common import det_round
    from .windows import global_running_sum

    e = table(spark, sf_dir, "events")
    s = (
        e.where(
            F.col("event_type").isin("error", "view")
            & F.col("value").isNotNull()
        )
        .groupBy("value")
        .agg(
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("na"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("nb"),
        )
    )
    cum = global_running_sum(
        s,
        [F.col("value").asc()],
        {"cum_a": F.col("na"), "cum_b": F.col("nb")},
    )
    tot = s.agg(
        F.sum("na").alias("n"), F.sum("nb").alias("m")
    ).where((F.col("n") > 0) & (F.col("m") > 0))
    diff = F.abs(
        F.col("cum_a").cast("double") / F.col("n")
        - F.col("cum_b").cast("double") / F.col("m")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n", "m")
        .agg(
            F.max(diff).alias("d_raw"),
            F.max(
                diff
                * F.sqrt(F.col("n").cast("double") * F.col("m") / (F.col("n") + F.col("m")))
            ).alias("s_raw"),
        )
        .select(
            F.col("n").cast("bigint").alias("n"),
            F.col("m").cast("bigint").alias("m"),
            det_round(F.col("d_raw"), 6).alias("ks_d"),
            det_round(F.col("s_raw"), 6).alias("ks_scaled"),
        )
    )


@query(
    "q_spearman_corr",
    oracle=f"""
    WITH r AS (
      SELECT l_returnflag,
             RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
               + (COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1) / 2.0
               AS rx,
             RANK() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
               + (COUNT(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1) / 2.0
               AS ry
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CASE WHEN (CAST(COUNT(*) AS DOUBLE) * {o_dsum('rx * rx')}
                      - {o_dsum('rx')} * {o_dsum('rx')}) <= 0
                  OR (CAST(COUNT(*) AS DOUBLE) * {o_dsum('ry * ry')}
                      - {o_dsum('ry')} * {o_dsum('ry')}) <= 0
                THEN NULL
                ELSE floor((CAST(COUNT(*) AS DOUBLE) * {o_dsum('rx * ry')}
                            - {o_dsum('rx')} * {o_dsum('ry')})
                           / sqrt((CAST(COUNT(*) AS DOUBLE) * {o_dsum('rx * rx')}
                                   - {o_dsum('rx')} * {o_dsum('rx')})
                                  * (CAST(COUNT(*) AS DOUBLE) * {o_dsum('ry * ry')}
                                     - {o_dsum('ry')} * {o_dsum('ry')}))
                           * 1e6 + 0.5) / 1e6
           END AS spearman_rho
    FROM r
    GROUP BY l_returnflag
    """,
)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and price per return
    flag — the robust (monotone, outlier-insensitive) complement of
    q_agg_stats' Pearson r: rank both variables with AVERAGE ranks for
    ties (rank() + (tie_count−1)/2, the textbook convention both
    engines express identically), then Pearson on the ranks via the
    exact decimal power-sum recombination (module docstring). Ranks are
    half-integers ≤ 2n, so DECIMAL(30,8) sums are exact and the double
    recombination is bit-identical across engines. Zero-variance groups
    (all values tied) yield NULL on both sides — the documented
    hair-negative-variance guard. NULL inputs are excluded (order
    statistics skip NULLs). Windows are partitioned by the group key;
    at 100 TB the per-group rankings ride spillable sorts, and the
    global_row_number range-partition path substitutes if a single
    group dominates.
    """
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity").isNotNull() & F.col("l_extendedprice").isNotNull()
    )
    from ..common import det_round

    # Tie counts ride the SAME window spec as the rank: a RANGE frame of
    # (currentRow, currentRow) counts exactly the ORDER-BY peers — the
    # rows tied on the value — so each variable needs ONE sort instead
    # of a rank sort plus a separate partitionBy(group, value) count
    # window. Plan audit r11: the old spelling planned 4 Sort + 4 Window
    # operators over the full table after the one exchange; this one
    # plans 2 (plans/r11/q_spearman_corr_{before,after}.txt). Peer count
    # == COUNT(*) OVER (PARTITION BY group, value) by definition, so rx/
    # ry are bit-identical.
    wq = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rangeBetween(Window.currentRow, Window.currentRow)
    )
    wp = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rangeBetween(Window.currentRow, Window.currentRow)
    )
    rx = (
        F.rank().over(Window.partitionBy("l_returnflag").orderBy("l_quantity"))
        + (F.count(F.lit(1)).over(wq) - 1) / 2.0
    )
    ry = (
        F.rank().over(
            Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
        )
        + (F.count(F.lit(1)).over(wp) - 1) / 2.0
    )
    r = li.select("l_returnflag", rx.alias("rx"), ry.alias("ry"))
    n = F.count(F.lit(1)).cast("double")
    sxy = _dec_sum(F.col("rx") * F.col("ry"))
    sx, sy = _dec_sum(F.col("rx")), _dec_sum(F.col("ry"))
    sxx, syy = _dec_sum(F.col("rx") * F.col("rx")), _dec_sum(F.col("ry") * F.col("ry"))
    varx, vary = n * sxx - sx * sx, n * syy - sy * sy
    return (
        r.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.when(
                (varx <= 0) | (vary <= 0), F.lit(None).cast("double")
            )
            .otherwise(
                det_round((n * sxy - sx * sy) / F.sqrt(varx * vary), 6)
            )
            .alias("spearman_rho"),
        )
    )


@query(
    "q_mann_whitney",
    oracle="""
    WITH g AS (
      SELECT value,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS na,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS nb
      FROM events
      WHERE event_type IN ('error', 'view') AND value IS NOT NULL
      GROUP BY value
    ),
    c AS (
      SELECT na, nb, na + nb AS t,
             SUM(na + nb) OVER (ORDER BY value) AS cum_t
      FROM g
    ),
    agg AS (
      SELECT SUM(na) AS n1, SUM(nb) AS n2,
             CAST(SUM(CAST(na AS DECIMAL(30,8))
                      * (CAST(cum_t - t AS DOUBLE) + (t + 1) / 2.0)) AS DOUBLE)
               AS r1,
             CAST(SUM(CAST(t AS DECIMAL(30,8)) * t * t - t) AS DOUBLE) AS tie3
      FROM c
    )
    SELECT CAST(n1 AS BIGINT) AS n1,
           CAST(n2 AS BIGINT) AS n2,
           r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0 AS u1,
           CASE WHEN CAST(n1 AS DOUBLE) * n2 / 12.0
                     * ((n1 + n2 + 1)
                        - tie3
                          / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))) <= 0
                THEN NULL
                ELSE floor((r1 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2.0
                            - CAST(n1 AS DOUBLE) * n2 / 2.0)
                           / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                                  * ((n1 + n2 + 1)
                                     - tie3
                                       / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1))))
                           * 1e6 + 0.5) / 1e6
           END AS z
    FROM agg
    WHERE n1 > 0 AND n2 > 0 AND n1 + n2 > 1
    """,
)
def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between the 'error' and
    'view' value samples with the exact tie-corrected normal
    approximation — the non-parametric "did the distribution move"
    test that needs no variance assumptions (KS's rank-sum sibling;
    together they are the standard drift-test pair).

    Same scale shape as q_ks_test: hash-aggregate to distinct values
    (per-value sample counts), ONE range shuffle for the cumulative
    rank offsets via :func:`global_running_sum`, then a single global
    aggregate. The average rank of a tied value is closed-form in the
    cumulative count (cum_before + (t+1)/2), so no per-row ranking
    exists anywhere — the whole test runs on the distinct-value frame.
    R1 is accumulated in DECIMAL(30,8) (average ranks are
    half-integers, so this is exact); the tie-correction sum Σ(t³−t)
    likewise. z is NULL when the variance is zero (all values tied) —
    the documented guard; NULL values excluded on both sides.
    """
    from ..common import det_round
    from .windows import global_running_sum

    e = table(spark, sf_dir, "events")
    g = (
        e.where(
            F.col("event_type").isin("error", "view")
            & F.col("value").isNotNull()
        )
        .groupBy("value")
        .agg(
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("na"),
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("nb"),
        )
    )
    c = global_running_sum(
        g.withColumn("t", F.col("na") + F.col("nb")),
        [F.col("value").asc()],
        {"cum_t": F.col("na") + F.col("nb")},
    )
    avg_rank = (F.col("cum_t") - F.col("t")).cast("double") + (F.col("t") + 1) / 2.0
    agg = c.agg(
        F.sum("na").alias("n1"),
        F.sum("nb").alias("n2"),
        F.sum(F.col("na").cast(DEC) * avg_rank).cast("double").alias("r1"),
        F.sum(F.col("t").cast(DEC) * F.col("t") * F.col("t") - F.col("t"))
        .cast("double")
        .alias("tie3"),
    ).where((F.col("n1") > 0) & (F.col("n2") > 0) & (F.col("n1") + F.col("n2") > 1))
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    nn = F.col("n1") + F.col("n2")
    u1 = F.col("r1") - n1d * (F.col("n1") + 1) / 2.0
    # tie3 is ALREADY the textbook correction numerator Σ(t³ − t); the
    # first draft subtracted N again (double-counting Σt = N) and the
    # property test's pure-Python reference caught the transcription
    # bug mirrored in BOTH engines — exactly what the DuckDB twin,
    # which shares the formula, structurally cannot catch.
    var = (
        n1d * F.col("n2") / 12.0
        * ((nn + 1) - F.col("tie3") / (nn.cast("double") * (nn - 1)))
    )
    return agg.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        u1.alias("u1"),
        F.when(var <= 0, F.lit(None).cast("double"))
        .otherwise(det_round((u1 - n1d * F.col("n2") / 2.0) / F.sqrt(var), 6))
        .alias("z"),
    )


@query(
    "q_autocorr",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders
      GROUP BY 1
    ),
    pairs AS (
      SELECT 1 AS lag_days, a.c AS x, b.c AS y
      FROM daily a JOIN daily b ON b.day = a.day + INTERVAL 1 DAY
      UNION ALL
      SELECT 7, a.c, b.c
      FROM daily a JOIN daily b ON b.day = a.day + INTERVAL 7 DAY
    )
    SELECT lag_days,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CASE WHEN (CAST(COUNT(*) AS DOUBLE)
                        * CAST(SUM(CAST(x AS DECIMAL(30,8)) * x) AS DOUBLE)
                      - CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE)
                        * CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE)) <= 0
                  OR (CAST(COUNT(*) AS DOUBLE)
                        * CAST(SUM(CAST(y AS DECIMAL(30,8)) * y) AS DOUBLE)
                      - CAST(SUM(CAST(y AS DECIMAL(30,8))) AS DOUBLE)
                        * CAST(SUM(CAST(y AS DECIMAL(30,8))) AS DOUBLE)) <= 0
                THEN NULL
                ELSE floor((CAST(COUNT(*) AS DOUBLE)
                              * CAST(SUM(CAST(x AS DECIMAL(30,8)) * y) AS DOUBLE)
                            - CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE)
                              * CAST(SUM(CAST(y AS DECIMAL(30,8))) AS DOUBLE))
                           / sqrt((CAST(COUNT(*) AS DOUBLE)
                                     * CAST(SUM(CAST(x AS DECIMAL(30,8)) * x) AS DOUBLE)
                                   - CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE)
                                     * CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE))
                                  * (CAST(COUNT(*) AS DOUBLE)
                                       * CAST(SUM(CAST(y AS DECIMAL(30,8)) * y) AS DOUBLE)
                                     - CAST(SUM(CAST(y AS DECIMAL(30,8))) AS DOUBLE)
                                       * CAST(SUM(CAST(y AS DECIMAL(30,8))) AS DOUBLE)))
                           * 1e6 + 0.5) / 1e6
           END AS autocorr
    FROM pairs
    GROUP BY lag_days
    """,
)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-7 autocorrelation of the daily order-count series —
    the seasonality screen (lag-7 ≫ lag-1 means weekly cycling) run
    before trusting any day-over-day trend metric.

    Pairs come from a calendar SELF-JOIN on day+lag, not a row-offset
    window — gap days simply produce no pair, so the statistic is
    well-defined on sparse calendars and identical however the series
    is partitioned. The data-sized pass is one hash aggregate to the
    daily table (bounded by distinct days); everything after runs on
    that metadata-scale frame. Counts are integers, so the DECIMAL
    power sums are exact and the double recombination (the module's
    Pearson discipline) is bit-identical across engines; zero-variance
    series → NULL (the documented guard).
    """
    from ..common import det_round

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    pairs = None
    for k in (1, 7):
        a = daily.select(F.col("day").alias("d0"), F.col("c").alias("x"))
        b = daily.select(F.col("day").alias("d1"), F.col("c").alias("y"))
        p = a.join(b, F.col("d1") == F.date_add(F.col("d0"), k)).select(
            F.lit(k).alias("lag_days"), "x", "y"
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    n = F.count(F.lit(1)).cast("double")
    sx, sy = _dec_sum(F.col("x")), _dec_sum(F.col("y"))
    sxx = _dec_sum(F.col("x") * F.col("x"))
    syy = _dec_sum(F.col("y") * F.col("y"))
    sxy = _dec_sum(F.col("x") * F.col("y"))
    varx, vary = n * sxx - sx * sx, n * syy - sy * sy
    return pairs.groupBy("lag_days").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.when((varx <= 0) | (vary <= 0), F.lit(None).cast("double"))
        .otherwise(det_round((n * sxy - sx * sy) / F.sqrt(varx * vary), 6))
        .alias("autocorr"),
    )


#: df = (|segments|−1)(|nations|−1) = 4·24 = 96 for the testdata shape;
#: Cramér's V needs only min(r,k)−1, computed from the LIVE table below.
@query(
    "q_cramers_v",
    oracle="""
    WITH cells AS (
      SELECT c_mktsegment AS seg, CAST(c_nationkey AS INT) AS nat,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM customer GROUP BY 1, 2
    ),
    margins AS (SELECT seg, SUM(n) AS rs FROM cells GROUP BY seg),
    cols AS (SELECT nat, SUM(n) AS cs FROM cells GROUP BY nat),
    tot AS (SELECT SUM(n) AS nt FROM cells),
    dims AS (
      SELECT (SELECT COUNT(DISTINCT seg) FROM cells) AS r,
             (SELECT COUNT(DISTINCT nat) FROM cells) AS k
    ),
    scored AS (
      SELECT c.n,
             (c.n - CAST(m.rs AS DOUBLE) * c2.cs / t.nt)
               * (c.n - CAST(m.rs AS DOUBLE) * c2.cs / t.nt)
               / (CAST(m.rs AS DOUBLE) * c2.cs / t.nt) AS chi2_part
      FROM cells c
      JOIN margins m ON c.seg = m.seg
      JOIN cols c2 ON c.nat = c2.nat
      CROSS JOIN tot t
    )
    SELECT CAST(t.nt AS BIGINT) AS n,
           CAST(d.r AS INT) AS n_rows_dim,
           CAST(d.k AS INT) AS n_cols_dim,
           round(CAST(SUM(CAST(chi2_part AS DECIMAL(20,8))) AS DOUBLE), 4)
             AS chi2,
           CASE WHEN least(d.r, d.k) <= 1 THEN NULL
                ELSE floor(sqrt(CAST(SUM(CAST(chi2_part AS DECIMAL(20,8)))
                                     AS DOUBLE)
                                / (t.nt * (least(d.r, d.k) - 1)))
                           * 1e6 + 0.5) / 1e6
           END AS cramers_v
    FROM scored CROSS JOIN tot t CROSS JOIN dims d
    GROUP BY t.nt, d.r, d.k
    """,
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V — the [0,1]-normalized effect size of the chi-square
    association (q_chi2_independence answers "is segment × nation
    associated?"; this answers "HOW MUCH", comparable across tables of
    different shapes): V = sqrt(χ² / (N·(min(r,k)−1))).

    Same contingency machinery as q_chi2_independence (one hash
    aggregate to the |seg|×|nat| cell table, broadcast margins,
    decimal-accumulated χ² so the cell-sum order cannot drift), plus
    the live r/k dimensions so the normalization is data-derived, not
    baked. Degenerate 1×k tables (min dim 1) → NULL V on both sides.
    """
    from ..common import det_round

    c = table(spark, sf_dir, "customer")
    cells = c.groupBy(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").cast("int").alias("nat"),
    ).agg(F.count(F.lit(1)).alias("n"))
    # NOT persisted: q_chi2_independence's identical cells subplan would
    # pick up the cached InMemoryRelation via plan-equality substitution
    # and trip the SinglePartition funnel lint (persisted scans anchor
    # it); ReusedExchange already shares the one real aggregation.
    margins = cells.groupBy("seg").agg(F.sum("n").alias("rs"))
    cols = cells.groupBy("nat").agg(F.sum("n").alias("cs"))
    tot = cells.agg(F.sum("n").alias("nt"))
    dims = cells.agg(
        F.countDistinct("seg").alias("r"), F.countDistinct("nat").alias("k")
    )
    expected = F.col("rs").cast("double") * F.col("cs") / F.col("nt")
    scored = (
        cells.join(F.broadcast(margins), "seg")
        .join(F.broadcast(cols), "nat")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            ((F.col("n") - expected) * (F.col("n") - expected) / expected)
            .cast("decimal(20,8)")
            .alias("chi2_part"),
        )
    )
    chi2 = F.sum("chi2_part").cast("double")
    mind = F.least(F.col("r"), F.col("k"))
    return (
        scored.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(dims))
        .groupBy("nt", "r", "k")
        .agg(
            F.round(chi2, 4).alias("chi2"),
            F.when(mind <= 1, F.lit(None).cast("double"))
            .otherwise(
                det_round(
                    F.sqrt(chi2 / (F.col("nt") * (mind - 1))), 6
                )
            )
            .alias("cramers_v"),
        )
        .select(
            F.col("nt").cast("bigint").alias("n"),
            F.col("r").cast("int").alias("n_rows_dim"),
            F.col("k").cast("int").alias("n_cols_dim"),
            "chi2",
            "cramers_v",
        )
    )


@query(
    "q_anova_f",
    oracle="""
    WITH g AS (
      SELECT o_orderpriority AS grp,
             CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
               / 100.0 AS s_g,
             CAST(SUM(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS HUGEINT)
                      * CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
               / 10000.0 AS ss_g
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL
      GROUP BY o_orderpriority
    )
    SELECT CAST(COUNT(*) AS INT) AS k,
           CAST(SUM(n_g) AS BIGINT) AS n,
           floor((list_aggregate(list(s_g * s_g / n_g ORDER BY grp), 'sum')
                  - list_aggregate(list(s_g ORDER BY grp), 'sum')
                    * list_aggregate(list(s_g ORDER BY grp), 'sum') / SUM(n_g))
                 * 1e4 + 0.5) / 1e4
             AS ss_between,
           floor((list_aggregate(list(ss_g ORDER BY grp), 'sum')
                  - list_aggregate(list(s_g * s_g / n_g ORDER BY grp), 'sum'))
                 * 1e4 + 0.5) / 1e4
             AS ss_within,
           CASE WHEN COUNT(*) <= 1 OR SUM(n_g) <= COUNT(*)
                  OR (list_aggregate(list(ss_g ORDER BY grp), 'sum')
                      - list_aggregate(list(s_g * s_g / n_g ORDER BY grp), 'sum'))
                     <= 1e-9 * (abs(list_aggregate(list(ss_g ORDER BY grp), 'sum'))
                                + abs(list_aggregate(list(s_g * s_g / n_g ORDER BY grp), 'sum'))
                                + 1e-300)
                THEN NULL
                ELSE floor(((list_aggregate(list(s_g * s_g / n_g ORDER BY grp), 'sum')
                             - list_aggregate(list(s_g ORDER BY grp), 'sum')
                               * list_aggregate(list(s_g ORDER BY grp), 'sum') / SUM(n_g))
                            / (COUNT(*) - 1))
                           / ((list_aggregate(list(ss_g ORDER BY grp), 'sum')
                               - list_aggregate(list(s_g * s_g / n_g ORDER BY grp), 'sum'))
                              / (SUM(n_g) - COUNT(*)))
                           * 1e6 + 0.5) / 1e6
           END AS f_stat
    FROM g
    """,
)
def q_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-statistic of order value across the 5 order
    priorities — "is mean spend priority-dependent?".

    Scale shape: ONE map-side-combined hash aggregation collapses the
    fact table to k=|priorities| rows of power sums (n_g, Σx, Σx²);
    SSB/SSW recombine from those. Determinism is INTEGER CENTS end to
    end (the q_clamped_balance half-up conversion): Σcents is a
    bigint, Σcents² accumulates in decimal(38,0)/HUGEINT — the
    decimal(30,8) cast of a large double square is NOT cross-engine
    safe (Spark rounds the exact binary expansion, DuckDB the shortest
    repr; they differ once the double's ulp exceeds 1e-8, found by the
    skew-catalog sweep on this very query). Every cross-row float sum
    — the k-row Σ_g terms — runs as a strict grp-ordered in-order fold
    (the similarity.py LSH trick), so SSB/SSW/F hash-match
    bit-for-bit. Degenerate guards: k<=1, n<=k, or zero within-group
    variance -> NULL F on both sides.
    """
    from ..common import det_round

    # NULL grp is filtered on BOTH sides: sort_array places a NULL-grp
    # struct first while DuckDB's list(... ORDER BY grp) is NULLS LAST,
    # so a NULL priority group would flip the float fold order (r8
    # advice). Dropping it pins the traversal identically.
    o = table(spark, sf_dir, "orders").where(
        F.col("o_totalprice").isNotNull()
        & F.col("o_orderpriority").isNotNull()
    )
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    g = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        (F.sum(cents).cast("double") / F.lit(100.0)).alias("s_g"),
        (
            F.sum(cents.cast("decimal(38,0)") * cents).cast("double")
            / F.lit(10000.0)
        ).alias("ss_g"),
    )
    # In-order folds of the k per-group double terms (bit-identical to
    # DuckDB's list_aggregate over the same grp-ordered lists).
    def fold(term):
        lst = F.sort_array(
            F.collect_list(F.struct(F.col("grp"), term.alias("t")))
        )
        # Empty input -> NULL, matching DuckDB's list_aggregate(NULL)
        # (collect_list gives [] here, whose fold would be the 0.0 init).
        return F.when(
            F.size(lst) > 0,
            F.aggregate(lst, F.lit(0.0), lambda acc, x: acc + x["t"]),
        )

    agg = g.agg(
        F.count(F.lit(1)).cast("int").alias("k"),
        F.sum("n_g").cast("bigint").alias("n"),
        fold(F.col("s_g") * F.col("s_g") / F.col("n_g")).alias("t_fold"),
        fold(F.col("s_g")).alias("s_all"),
        fold(F.col("ss_g")).alias("ss_all"),
    )
    ssb = F.col("t_fold") - F.col("s_all") * F.col("s_all") / F.col("n")
    ssw = F.col("ss_all") - F.col("t_fold")
    f_stat = (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k")))
    # Zero within-variance guard must be RELATIVE (the q_ols_multi ulp
    # lesson, re-found here by the 200-example audit): exactly-zero SSW
    # leaves a ~1ulp float residue in ss_all − t_fold, and `<= 0` lets
    # F explode. Both engines evaluate the identical expression.
    ssw_bad = ssw <= F.lit(1e-9) * (
        F.abs(F.col("ss_all")) + F.abs(F.col("t_fold")) + F.lit(1e-300)
    )
    return agg.select(
        "k",
        "n",
        det_round(ssb, 4).alias("ss_between"),
        det_round(ssw, 4).alias("ss_within"),
        F.when(
            (F.col("k") <= 1) | (F.col("n") <= F.col("k")) | ssw_bad,
            F.lit(None).cast("double"),
        )
        .otherwise(det_round(f_stat, 6))
        .alias("f_stat"),
    )


#: Shared monthly series for the rank/robust trend operators: per
#: (ship-year, ship-month) exact decimal totals. Decimal sums compare
#: exactly across engines, so every pairwise <//=/> below is bit-safe.
_MONTHLY_SQL = f"""
      SELECT CAST(EXTRACT(year FROM l_shipdate) AS INT) AS yr,
             CAST(EXTRACT(month FROM l_shipdate) AS INT) AS mo,
             {o_dsum('l_quantity')} AS qty,
             {o_dsum('l_extendedprice')} AS rev
      FROM lineitem
      WHERE l_shipdate IS NOT NULL
      GROUP BY 1, 2
"""


def _monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(F.col("l_shipdate").isNotNull())
    return li.groupBy(
        F.year("l_shipdate").cast("int").alias("yr"),
        F.month("l_shipdate").cast("int").alias("mo"),
    ).agg(
        _dec_sum(F.col("l_quantity")).alias("qty"),
        _dec_sum(F.col("l_extendedprice")).alias("rev"),
    )


@query(
    "q_kendall_tau",
    oracle=f"""
    WITH m AS ({_MONTHLY_SQL}),
    p AS (
      SELECT a.yr,
             CASE WHEN (a.qty < b.qty AND a.rev < b.rev)
                    OR (a.qty > b.qty AND a.rev > b.rev) THEN 1 ELSE 0 END AS conc,
             CASE WHEN (a.qty < b.qty AND a.rev > b.rev)
                    OR (a.qty > b.qty AND a.rev < b.rev) THEN 1 ELSE 0 END AS disc,
             CASE WHEN a.qty = b.qty THEN 1 ELSE 0 END AS tie_x,
             CASE WHEN a.rev = b.rev THEN 1 ELSE 0 END AS tie_y
      FROM m a JOIN m b ON a.yr = b.yr AND a.mo < b.mo
    )
    SELECT yr,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(conc) AS BIGINT) AS concordant,
           CAST(SUM(disc) AS BIGINT) AS discordant,
           CASE WHEN (COUNT(*) - SUM(tie_x)) <= 0 OR (COUNT(*) - SUM(tie_y)) <= 0
                THEN NULL
                ELSE floor((SUM(conc) - SUM(disc))
                           / sqrt(CAST((COUNT(*) - SUM(tie_x)) AS DOUBLE)
                                  * (COUNT(*) - SUM(tie_y)))
                           * 1e6 + 0.5) / 1e6
           END AS tau_b
    FROM p
    GROUP BY yr
    """,
)
def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between monthly quantity and
    revenue, per ship-year — the O(n²)-pairs statistic made scale-safe
    by computing it on the AGGREGATED series, never the fact table.

    Scale shape: one hash aggregation collapses lineitem to <=12 rows
    per year of exact decimal totals; the pairwise self-join is then
    <=66 pairs per year (bounded by the calendar, not the data), and
    every concordance test compares exact decimals. tau-b's tie terms
    use pair counts directly (n1 = pairs tied in x, n2 = pairs tied in
    y — the Σt(t-1)/2 identity), all-integer until the one final
    division. Zero-variance years (all months tied) -> NULL on both
    sides.
    """
    from ..common import det_round

    # NOT persisted (r11 interleaved A/B): the broadcast side does
    # re-run the lineitem scan+agg (broadcast subtrees defeat exchange
    # reuse), but pinning the 84-row monthly frame with track() measured
    # equal-to-slower at BOTH 32 and 8 cores (1.00 vs 1.03 / 0.92 vs
    # 0.98 medians) — the cache-materialization job costs as much as the
    # duplicated scan, which otherwise overlaps on idle cores.
    m = _monthly(spark, sf_dir)
    a, b = m.alias("a"), m.alias("b")
    pairs = a.join(
        F.broadcast(b),
        (F.col("a.yr") == F.col("b.yr")) & (F.col("a.mo") < F.col("b.mo")),
    ).select(
        F.col("a.yr").alias("yr"),
        F.when(
            ((F.col("a.qty") < F.col("b.qty")) & (F.col("a.rev") < F.col("b.rev")))
            | ((F.col("a.qty") > F.col("b.qty")) & (F.col("a.rev") > F.col("b.rev"))),
            1,
        )
        .otherwise(0)
        .alias("conc"),
        F.when(
            ((F.col("a.qty") < F.col("b.qty")) & (F.col("a.rev") > F.col("b.rev")))
            | ((F.col("a.qty") > F.col("b.qty")) & (F.col("a.rev") < F.col("b.rev"))),
            1,
        )
        .otherwise(0)
        .alias("disc"),
        F.when(F.col("a.qty") == F.col("b.qty"), 1).otherwise(0).alias("tie_x"),
        F.when(F.col("a.rev") == F.col("b.rev"), 1).otherwise(0).alias("tie_y"),
    )
    n0 = F.count(F.lit(1))
    eff_x = (n0 - F.sum("tie_x")).cast("double")
    eff_y = (n0 - F.sum("tie_y")).cast("double")
    return pairs.groupBy("yr").agg(
        n0.cast("bigint").alias("n_pairs"),
        F.sum("conc").cast("bigint").alias("concordant"),
        F.sum("disc").cast("bigint").alias("discordant"),
        F.when((eff_x <= 0) | (eff_y <= 0), F.lit(None).cast("double"))
        .otherwise(
            det_round(
                (F.sum("conc") - F.sum("disc")) / F.sqrt(eff_x * eff_y), 6
            )
        )
        .alias("tau_b"),
    )


@query(
    "q_theil_sen",
    oracle=f"""
    WITH m AS ({_MONTHLY_SQL}),
    s AS (
      SELECT a.yr,
             (b.rev - a.rev) / (b.mo - a.mo) AS slope,
             ROW_NUMBER() OVER (PARTITION BY a.yr
               ORDER BY (b.rev - a.rev) / (b.mo - a.mo), a.mo, b.mo) AS rn,
             COUNT(*) OVER (PARTITION BY a.yr) AS np
      FROM m a JOIN m b ON a.yr = b.yr AND a.mo < b.mo
    )
    SELECT yr,
           CAST(MAX(np) AS BIGINT) AS n_pairs,
           floor(AVG(slope) * 1e6 + 0.5) / 1e6 AS ts_slope
    FROM s
    WHERE rn IN ((np + 1) // 2, (np + 2) // 2)
    GROUP BY yr
    """,
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend: median of all pairwise slopes of monthly
    revenue vs month index, per ship-year (breakdown point 29% — one
    wild month cannot bend it, unlike q_regression_slope's OLS).

    Scale shape: same aggregated-series trick as q_kendall_tau — the
    quadratic pair enumeration runs over <=12 points per year (<=66
    slopes), never the corpus. Each slope is an exact-decimal
    difference / small-int division (deterministic double); the median
    is pinned to explicit rank arithmetic (row_number by (slope, mo,
    mo) + the two-middle average) rather than either engine's builtin
    median so even-count interpolation is identical by construction.
    The AVG crossing rows averages <=2 deterministic doubles.
    """
    from ..common import det_round

    # NOT persisted — same interleaved A/B verdict as q_kendall_tau
    # (track() measured 0.9 → 1.15 s at both 32 and 8 cores).
    m = _monthly(spark, sf_dir)
    a, b = m.alias("a"), m.alias("b")
    slope = (F.col("b.rev") - F.col("a.rev")) / (F.col("b.mo") - F.col("a.mo"))
    pairs = a.join(
        F.broadcast(b),
        (F.col("a.yr") == F.col("b.yr")) & (F.col("a.mo") < F.col("b.mo")),
    ).select(
        F.col("a.yr").alias("yr"),
        slope.alias("slope"),
        F.col("a.mo").alias("mo1"),
        F.col("b.mo").alias("mo2"),
    )
    w = Window.partitionBy("yr").orderBy("slope", "mo1", "mo2")
    ranked = pairs.select(
        "yr",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("yr")).alias("np"),
    )
    mid = ranked.where(
        (F.col("rn") == F.floor((F.col("np") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("np") + 2) / 2))
    )
    return mid.groupBy("yr").agg(
        F.max("np").cast("bigint").alias("n_pairs"),
        det_round(F.avg("slope"), 6).alias("ts_slope"),
    )


@query(
    "q_welch_ttest",
    oracle=f"""
    WITH g AS (
      SELECT o_orderstatus AS grp,
             CAST(COUNT(*) AS BIGINT) AS n,
             {o_dsum('o_totalprice')} AS s,
             {o_dsum('o_totalprice * o_totalprice')} AS ss
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_orderstatus IN ('O', 'F')
      GROUP BY o_orderstatus
    ),
    w AS (
      SELECT
        MAX(CASE WHEN grp = 'O' THEN n END) AS n1,
        MAX(CASE WHEN grp = 'F' THEN n END) AS n2,
        MAX(CASE WHEN grp = 'O' THEN s END) AS s1,
        MAX(CASE WHEN grp = 'F' THEN s END) AS s2,
        MAX(CASE WHEN grp = 'O' THEN ss END) AS ss1,
        MAX(CASE WHEN grp = 'F' THEN ss END) AS ss2
      FROM g
    ),
    v AS (
      SELECT n1, n2,
             s1 / n1 - s2 / n2 AS mean_diff,
             (n1 * ss1 - s1 * s1) / (CAST(n1 AS DOUBLE) * n1 * (n1 - 1)) AS se1,
             (n2 * ss2 - s2 * s2) / (CAST(n2 AS DOUBLE) * n2 * (n2 - 1)) AS se2
      FROM w
      WHERE n1 IS NOT NULL AND n2 IS NOT NULL
    )
    SELECT n1, n2,
           floor(mean_diff * 1e4 + 0.5) / 1e4 AS mean_diff,
           CASE WHEN n1 < 2 OR n2 < 2 OR (se1 + se2) <= 0 THEN NULL
                ELSE floor(mean_diff / sqrt(se1 + se2) * 1e6 + 0.5) / 1e6
           END AS t_stat,
           CASE WHEN n1 < 2 OR n2 < 2 OR (se1 + se2) <= 0 THEN NULL
                ELSE floor((se1 + se2) * (se1 + se2)
                           / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1))
                           * 1e4 + 0.5) / 1e4
           END AS welch_df
    FROM v
    """,
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between open ('O') and fulfilled
    ('F') order values, with the Welch-Satterthwaite degrees of
    freedom — the workhorse two-sample mean test (q_ab_test's
    continuous-outcome sibling; that one tests proportions).

    Same exact-power-sum discipline as q_agg_stats: one hash agg to
    two rows of (n, Σx, Σx²) decimals, then mean/variance/t/df
    recombine in ONE fixed double expression tree written identically
    in both engines (se_i = (nΣx² − (Σx)²)/(n²(n−1)) is the standard
    error squared built from exact inputs). Guards: a missing group
    emits an empty frame; n<2 or zero pooled variance → NULL t/df.
    """
    from ..common import det_round

    o = table(spark, sf_dir, "orders").where(
        F.col("o_totalprice").isNotNull()
        & F.col("o_orderstatus").isin("O", "F")
    )
    v = F.col("o_totalprice")
    g = o.groupBy(F.col("o_orderstatus").alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        _dec_sum(v).alias("s"),
        _dec_sum(v * v).alias("ss"),
    )
    pick = lambda grp, c: F.max(F.when(F.col("grp") == grp, F.col(c)))
    w = g.agg(
        pick("O", "n").alias("n1"),
        pick("F", "n").alias("n2"),
        pick("O", "s").alias("s1"),
        pick("F", "s").alias("s2"),
        pick("O", "ss").alias("ss1"),
        pick("F", "ss").alias("ss2"),
    ).where(F.col("n1").isNotNull() & F.col("n2").isNotNull())
    n1, n2 = F.col("n1"), F.col("n2")
    mean_diff = F.col("s1") / n1 - F.col("s2") / n2
    se1 = (n1 * F.col("ss1") - F.col("s1") * F.col("s1")) / (
        n1.cast("double") * n1 * (n1 - 1)
    )
    se2 = (n2 * F.col("ss2") - F.col("s2") * F.col("s2")) / (
        n2.cast("double") * n2 * (n2 - 1)
    )
    bad = (n1 < 2) | (n2 < 2) | ((se1 + se2) <= 0)
    return w.select(
        "n1",
        "n2",
        det_round(mean_diff, 4).alias("mean_diff"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(det_round(mean_diff / F.sqrt(se1 + se2), 6))
        .alias("t_stat"),
        F.when(bad, F.lit(None).cast("double"))
        .otherwise(
            det_round(
                (se1 + se2)
                * (se1 + se2)
                / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)),
                4,
            )
        )
        .alias("welch_df"),
    )


@query(
    "q_pacf",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders
      GROUP BY 1
    ),
    pairs AS (
      SELECT 1 AS lag_days, a.c AS x, b.c AS y
      FROM daily a JOIN daily b ON b.day = a.day + INTERVAL 1 DAY
      UNION ALL
      SELECT 2, a.c, b.c
      FROM daily a JOIN daily b ON b.day = a.day + INTERVAL 2 DAY
    ),
    rho AS (
      SELECT lag_days,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CASE WHEN (CAST(COUNT(*) AS DOUBLE)
                          * CAST(SUM(CAST(x AS DECIMAL(30,8)) * x) AS DOUBLE)
                        - CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE)
                          * CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE)) <= 0
                    OR (CAST(COUNT(*) AS DOUBLE)
                          * CAST(SUM(CAST(y AS DECIMAL(30,8)) * y) AS DOUBLE)
                        - CAST(SUM(CAST(y AS DECIMAL(30,8))) AS DOUBLE)
                          * CAST(SUM(CAST(y AS DECIMAL(30,8))) AS DOUBLE)) <= 0
                  THEN NULL
                  ELSE floor((CAST(COUNT(*) AS DOUBLE)
                                * CAST(SUM(CAST(x AS DECIMAL(30,8)) * y) AS DOUBLE)
                              - CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE)
                                * CAST(SUM(CAST(y AS DECIMAL(30,8))) AS DOUBLE))
                             / sqrt((CAST(COUNT(*) AS DOUBLE)
                                       * CAST(SUM(CAST(x AS DECIMAL(30,8)) * x) AS DOUBLE)
                                     - CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE)
                                       * CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE))
                                    * (CAST(COUNT(*) AS DOUBLE)
                                         * CAST(SUM(CAST(y AS DECIMAL(30,8)) * y) AS DOUBLE)
                                       - CAST(SUM(CAST(y AS DECIMAL(30,8))) AS DOUBLE)
                                         * CAST(SUM(CAST(y AS DECIMAL(30,8))) AS DOUBLE)))
                             * 1e6 + 0.5) / 1e6
             END AS rho
      FROM pairs
      GROUP BY lag_days
    ),
    piv AS (
      SELECT
        MAX(CASE WHEN lag_days = 1 THEN n_pairs END) AS n1,
        MAX(CASE WHEN lag_days = 2 THEN n_pairs END) AS n2,
        MAX(CASE WHEN lag_days = 1 THEN rho END) AS r1,
        MAX(CASE WHEN lag_days = 2 THEN rho END) AS r2
      FROM rho
    )
    SELECT n1, n2, r1, r2,
           CASE WHEN r1 IS NULL OR r2 IS NULL OR (1.0 - r1 * r1) <= 0 THEN NULL
                ELSE floor((r2 - r1 * r1) / (1.0 - r1 * r1) * 1e6 + 0.5) / 1e6
           END AS pacf_2
    FROM piv
    """,
)
def q_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-2 PARTIAL autocorrelation of the daily order-count series via
    Durbin-Levinson: φ₂₂ = (r₂ − r₁²)/(1 − r₁²) — "is there direct
    two-day-back signal once the one-day carryover is removed?", the
    AR-order diagnostic q_autocorr can't answer (its raw r₂ conflates
    both paths).

    Estimator contract: r₁/r₂ are the pairwise-complete calendar-join
    correlations (q_autocorr's gap-safe construction, 6-dp rounded),
    and φ₂₂ recombines the ROUNDED r's in one fixed expression — so
    the composition is deterministic by construction. |r₁| = 1 (the
    degenerate denominator) and zero-variance lags → NULL.
    """
    from ..common import det_round

    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    pairs = None
    for k in (1, 2):
        a = daily.select(F.col("day").alias("d0"), F.col("c").alias("x"))
        b = daily.select(F.col("day").alias("d1"), F.col("c").alias("y"))
        p = a.join(b, F.col("d1") == F.date_add(F.col("d0"), k)).select(
            F.lit(k).alias("lag_days"), "x", "y"
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    n = F.count(F.lit(1)).cast("double")
    sx, sy = _dec_sum(F.col("x")), _dec_sum(F.col("y"))
    sxx = _dec_sum(F.col("x") * F.col("x"))
    syy = _dec_sum(F.col("y") * F.col("y"))
    sxy = _dec_sum(F.col("x") * F.col("y"))
    varx, vary = n * sxx - sx * sx, n * syy - sy * sy
    rho = pairs.groupBy("lag_days").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.when((varx <= 0) | (vary <= 0), F.lit(None).cast("double"))
        .otherwise(det_round((n * sxy - sx * sy) / F.sqrt(varx * vary), 6))
        .alias("rho"),
    )
    pick = lambda k, c: F.max(F.when(F.col("lag_days") == k, F.col(c)))
    piv = rho.agg(
        pick(1, "n_pairs").alias("n1"),
        pick(2, "n_pairs").alias("n2"),
        pick(1, "rho").alias("r1"),
        pick(2, "rho").alias("r2"),
    )
    r1, r2 = F.col("r1"), F.col("r2")
    return piv.select(
        "n1",
        "n2",
        "r1",
        "r2",
        F.when(
            r1.isNull() | r2.isNull() | ((F.lit(1.0) - r1 * r1) <= 0),
            F.lit(None).cast("double"),
        )
        .otherwise(det_round((r2 - r1 * r1) / (F.lit(1.0) - r1 * r1), 6))
        .alias("pacf_2"),
    )


# Dialect-neutral Cramer's-rule fragments for the 3-parameter normal
# equations (shared VERBATIM by the Spark selectExpr and the DuckDB
# twin — one recipe, zero transcription drift). Column names are the
# exact decimal moments of (1, x1, x2, y).
_OLS_DET = (
    "(nn*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2))"
)
_OLS_DET0 = (
    "(sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y))"
)
_OLS_DET1 = (
    "(nn*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2))"
)
_OLS_DET2 = (
    "(nn*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2))"
)
# Relative singularity guard: an EXACTLY singular system leaves det a
# ~1ulp float residue (the moments are exact, the 3x3 expansion is
# not), so `det = 0` misses it and Cramer emits garbage. Compare |det|
# against the expansion's own term magnitudes instead — 1e-9 relative
# sits 7 decades above the ulp floor and 7 below any usably-conditioned
# system. Both engines evaluate the identical expression on identical
# doubles, so the verdict is bit-identical. (Found by the hypothesis
# Fraction reference on a single-point input.)
_OLS_MAG = (
    "(abs(nn*s11*s22) + abs(nn*s12*s12) + abs(s1*s1*s22)"
    " + abs(s1*s12*s2) + abs(s2*s1*s12) + abs(s2*s11*s2) + 1e-300)"
)
_OLS_BAD = f"(abs({_OLS_DET}) <= 1e-9 * {_OLS_MAG})"
_OLS_SST = "(syy - sy*sy/nn)"
_OLS_SST_BAD = f"({_OLS_SST} <= 1e-9 * (abs(syy) + abs(sy*sy/nn) + 1e-300))"
# One string PER OUTPUT COLUMN (not one blob split on ",\n" — that
# split was reformat-fragile, r8 advice): the Spark side selectExpr's
# the list directly and the oracle joins it, so both engines evaluate
# the identical per-column expression by construction.
_OLS_SELECT_COLS = [
    "CAST(nn AS BIGINT) AS n",
    f"""CASE WHEN {_OLS_BAD} THEN NULL
       ELSE floor({_OLS_DET0}/{_OLS_DET} * 1e6 + 0.5) / 1e6 END AS beta0""",
    f"""CASE WHEN {_OLS_BAD} THEN NULL
       ELSE floor({_OLS_DET1}/{_OLS_DET} * 1e6 + 0.5) / 1e6 END AS beta_qty""",
    f"""CASE WHEN {_OLS_BAD} THEN NULL
       ELSE floor({_OLS_DET2}/{_OLS_DET} * 1e6 + 0.5) / 1e6 END AS beta_disc""",
    f"""CASE WHEN {_OLS_BAD} OR {_OLS_SST_BAD} THEN NULL
       ELSE floor((1.0 - (syy - ({_OLS_DET0}/{_OLS_DET})*sy
                              - ({_OLS_DET1}/{_OLS_DET})*s1y
                              - ({_OLS_DET2}/{_OLS_DET})*s2y)
                         / {_OLS_SST}) * 1e6 + 0.5) / 1e6 END AS r2""",
]
_OLS_SELECT = ",\n  ".join(_OLS_SELECT_COLS)


@query(
    "q_ols_multi",
    oracle=f"""
    WITH cents AS (
      SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qc,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS dc,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
        AND l_extendedprice IS NOT NULL
    ),
    m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS nn,
             CAST(SUM(qc) AS DOUBLE) / 1e2 AS s1,
             CAST(SUM(dc) AS DOUBLE) / 1e2 AS s2,
             CAST(SUM(pc) AS DOUBLE) / 1e2 AS sy,
             CAST(SUM(CAST(qc AS HUGEINT) * qc) AS DOUBLE) / 1e4 AS s11,
             CAST(SUM(CAST(qc AS HUGEINT) * dc) AS DOUBLE) / 1e4 AS s12,
             CAST(SUM(CAST(dc AS HUGEINT) * dc) AS DOUBLE) / 1e4 AS s22,
             CAST(SUM(CAST(qc AS HUGEINT) * pc) AS DOUBLE) / 1e4 AS s1y,
             CAST(SUM(CAST(dc AS HUGEINT) * pc) AS DOUBLE) / 1e4 AS s2y,
             CAST(SUM(CAST(pc AS HUGEINT) * pc) AS DOUBLE) / 1e4 AS syy
      FROM cents
    )
    SELECT {_OLS_SELECT}
    FROM m
    WHERE nn > 0
    """,
)
def q_ols_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS with intercept (price ~ quantity + discount) via
    the normal equations and Cramer's rule — closed-form multivariate
    regression as ONE aggregation pass, q_regression_slope's
    multi-feature generalization.

    The 10 moments (n, Σx₁, Σx₂, Σy and the 6 cross-products) are
    INTEGER-CENTS exact — bigint sums and decimal(38,0)/HUGEINT
    product sums (the ANOVA lesson: a decimal(30,8) cast of large
    double products is neither cross-engine-safe nor cheap; bigint
    multiply-accumulate is both, and measured 3.2 s → ~0.8 s at sf0.1
    by skipping ten double→decimal string conversions per row). β and
    R² = 1 − SSE/SST (SSE = Σy² − β'X'y) recombine driver-free in a
    single projection whose arithmetic is ONE shared fragment string
    evaluated verbatim by both engines (selectExpr here, the twin SQL
    there) — transcription drift is structurally impossible.
    Numerically singular systems (relative |det| guard — the
    hypothesis-found ulp-residue trap) and zero-variance y → NULL.
    At 100 TB this is the map-side-combined scan-and-done shape: no
    iteration, no shuffle beyond one accumulator row.
    """
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity").isNotNull()
        & F.col("l_discount").isNotNull()
        & F.col("l_extendedprice").isNotNull()
    )
    c100 = lambda c: F.floor(F.col(c) * 100 + F.lit(0.5)).cast("bigint")
    cents = li.select(
        c100("l_quantity").alias("qc"),
        c100("l_discount").alias("dc"),
        c100("l_extendedprice").alias("pc"),
    )
    big = lambda a, b: F.sum(F.col(a).cast("decimal(38,0)") * F.col(b)).cast(
        "double"
    ) / F.lit(1e4)
    m = cents.agg(
        F.count(F.lit(1)).cast("double").alias("nn"),
        (F.sum("qc").cast("double") / F.lit(1e2)).alias("s1"),
        (F.sum("dc").cast("double") / F.lit(1e2)).alias("s2"),
        (F.sum("pc").cast("double") / F.lit(1e2)).alias("sy"),
        big("qc", "qc").alias("s11"),
        big("qc", "dc").alias("s12"),
        big("dc", "dc").alias("s22"),
        big("qc", "pc").alias("s1y"),
        big("dc", "pc").alias("s2y"),
        big("pc", "pc").alias("syy"),
    ).where(F.col("nn") > 0)
    return m.selectExpr(*_OLS_SELECT_COLS)


@query(
    "q_mutual_information",
    oracle="""
    WITH cells AS (
      SELECT event_type AS x,
             (datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 3) % 7 AS y,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2
    ),
    mx AS (SELECT x, SUM(n) AS nx FROM cells GROUP BY x),
    my AS (SELECT y, SUM(n) AS ny FROM cells GROUP BY y),
    tot AS (SELECT SUM(n) AS nt FROM cells),
    mi AS (
      SELECT CAST(SUM(CAST((CAST(c.n AS DOUBLE) / nt)
                           * ln(CAST(nt AS DOUBLE) * c.n / (nx * CAST(ny AS DOUBLE)))
                           AS DECIMAL(20,8))) AS DOUBLE) AS mi_raw
      FROM cells c JOIN mx ON mx.x = c.x JOIN my ON my.y = c.y, tot
    ),
    hx AS (
      SELECT CAST(SUM(CAST(-(CAST(nx AS DOUBLE) / nt)
                           * ln(CAST(nx AS DOUBLE) / nt)
                           AS DECIMAL(20,8))) AS DOUBLE) AS hx_raw,
             CAST(COUNT(*) AS INT) AS kx
      FROM mx, tot
    ),
    hy AS (
      SELECT CAST(SUM(CAST(-(CAST(ny AS DOUBLE) / nt)
                           * ln(CAST(ny AS DOUBLE) / nt)
                           AS DECIMAL(20,8))) AS DOUBLE) AS hy_raw,
             CAST(COUNT(*) AS INT) AS ky
      FROM my, tot
    )
    SELECT CAST(nt AS BIGINT) AS n, kx AS n_x_classes, ky AS n_y_classes,
           floor(mi_raw * 1e6 + 0.5) / 1e6 AS mi_nats,
           floor(hx_raw * 1e6 + 0.5) / 1e6 AS h_x,
           floor(hy_raw * 1e6 + 0.5) / 1e6 AS h_y,
           CASE WHEN hx_raw <= 0 OR hy_raw <= 0 THEN NULL
                ELSE floor(mi_raw / sqrt(hx_raw * hy_raw) * 1e6 + 0.5) / 1e6
           END AS nmi
    FROM tot, mi, hx, hy
    """,
)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between event type and weekday, with
    both marginal entropies and the sqrt-normalized NMI — the
    dependence measure that catches what Cramér's V misses on ordered
    or skewed categoricals, and the feature-selection staple.

    Same contingency machinery as q_chi2_independence: one hash agg to
    the |types|×7 cell table, broadcast margins, and per-cell terms
    cast to DECIMAL(20,8) before summing so the cell-order float
    accumulation cannot drift (the chi2 discipline). ln() is the one
    libm call — per-term decimal rounding plus the 6-dp output
    discipline absorbs its cross-engine ulp (the q_eval_ndcg log2
    precedent). Degenerate single-class margins → H = 0 → NULL NMI
    on both sides. Weekday from integer epoch-day arithmetic
    (convention-free).
    """
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    cells = ev.groupBy(
        F.col("event_type").alias("x"),
        (
            (F.datediff(F.to_date("ts"), F.lit("1970-01-01")) + 3) % 7
        ).alias("y"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    mx = cells.groupBy("x").agg(F.sum("n").alias("nx"))
    my = cells.groupBy("y").agg(F.sum("n").alias("ny"))
    tot = cells.agg(F.sum("n").alias("nt"))
    term = (
        (F.col("n").cast("double") / F.col("nt"))
        * F.log(
            F.col("nt").cast("double") * F.col("n") / (F.col("nx") * F.col("ny").cast("double"))
        )
    ).cast("decimal(20,8)")
    mi = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
        .agg(F.sum(term).cast("double").alias("mi_raw"))
    )
    hterm = lambda c: (
        -(F.col(c).cast("double") / F.col("nt"))
        * F.log(F.col(c).cast("double") / F.col("nt"))
    ).cast("decimal(20,8)")
    hx = mx.crossJoin(F.broadcast(tot)).agg(
        F.sum(hterm("nx")).cast("double").alias("hx_raw"),
        F.count(F.lit(1)).cast("int").alias("kx"),
    )
    hy = my.crossJoin(F.broadcast(tot)).agg(
        F.sum(hterm("ny")).cast("double").alias("hy_raw"),
        F.count(F.lit(1)).cast("int").alias("ky"),
    )
    from ..common import det_round

    out = (
        tot.crossJoin(F.broadcast(mi))
        .crossJoin(F.broadcast(hx))
        .crossJoin(F.broadcast(hy))
    )
    return out.select(
        F.col("nt").cast("bigint").alias("n"),
        F.col("kx").alias("n_x_classes"),
        F.col("ky").alias("n_y_classes"),
        det_round(F.col("mi_raw"), 6).alias("mi_nats"),
        det_round(F.col("hx_raw"), 6).alias("h_x"),
        det_round(F.col("hy_raw"), 6).alias("h_y"),
        F.when(
            (F.col("hx_raw") <= 0) | (F.col("hy_raw") <= 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            det_round(F.col("mi_raw") / F.sqrt(F.col("hx_raw") * F.col("hy_raw")), 6)
        )
        .alias("nmi"),
    )


@query(
    "q_diff_in_diff",
    oracle=f"""
    WITH scored AS (
      SELECT {md5_hex4_duck('user_id', 1)} % 2 AS treat,
             CASE WHEN EXTRACT(day FROM ts) >= 16 THEN 1 ELSE 0 END AS post,
             value
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
        AND user_id IS NOT NULL AND ts IS NOT NULL
    ),
    cells AS (
      SELECT treat, post,
             CAST(COUNT(*) AS BIGINT) AS n,
             {o_dsum('value')} AS s,
             {o_dsum('value * value')} AS ss
      FROM scored GROUP BY treat, post
    ),
    piv AS (
      SELECT
        MAX(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n11,
        MAX(CASE WHEN treat = 1 AND post = 0 THEN n END) AS n10,
        MAX(CASE WHEN treat = 0 AND post = 1 THEN n END) AS n01,
        MAX(CASE WHEN treat = 0 AND post = 0 THEN n END) AS n00,
        MAX(CASE WHEN treat = 1 AND post = 1 THEN s END) AS s11,
        MAX(CASE WHEN treat = 1 AND post = 0 THEN s END) AS s10,
        MAX(CASE WHEN treat = 0 AND post = 1 THEN s END) AS s01,
        MAX(CASE WHEN treat = 0 AND post = 0 THEN s END) AS s00,
        MAX(CASE WHEN treat = 1 AND post = 1 THEN ss END) AS ss11,
        MAX(CASE WHEN treat = 1 AND post = 0 THEN ss END) AS ss10,
        MAX(CASE WHEN treat = 0 AND post = 1 THEN ss END) AS ss01,
        MAX(CASE WHEN treat = 0 AND post = 0 THEN ss END) AS ss00
      FROM cells
    )
    SELECT n11, n10, n01, n00,
           floor(((s11/n11 - s10/n10) - (s01/n01 - s00/n00)) * 1e6 + 0.5) / 1e6
             AS did_estimate,
           CASE WHEN n11 < 2 OR n10 < 2 OR n01 < 2 OR n00 < 2 THEN NULL
                ELSE floor(sqrt(
                    (n11*ss11 - s11*s11) / (CAST(n11 AS DOUBLE)*n11*(n11-1))
                  + (n10*ss10 - s10*s10) / (CAST(n10 AS DOUBLE)*n10*(n10-1))
                  + (n01*ss01 - s01*s01) / (CAST(n01 AS DOUBLE)*n01*(n01-1))
                  + (n00*ss00 - s00*s00) / (CAST(n00 AS DOUBLE)*n00*(n00-1))
                  ) * 1e6 + 0.5) / 1e6
           END AS std_error
    FROM piv
    WHERE n11 IS NOT NULL AND n10 IS NOT NULL
      AND n01 IS NOT NULL AND n00 IS NOT NULL
    """,
)
def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate of the treatment effect on
    purchase value: a deterministic md5 user split crosses a mid-month
    pre/post cut, and DiD = (ȳ_t,post − ȳ_t,pre) − (ȳ_c,post − ȳ_c,pre)
    — the quasi-experimental workhorse, with the four-cell pooled
    standard error sqrt(Σ varᵢ/nᵢ) (q_welch_ttest's recombination
    generalized to 2×2).

    One hash agg to four cells of exact decimal power sums, a
    conditional-MAX pivot to one row, and a single fixed double
    expression for estimate and SE — identical tree both engines.
    Values are ~1e2 doubles, so the decimal(30,8) cast is inside its
    safe magnitude band (the ANOVA cents lesson does not bite).
    Guards: any empty cell → empty frame; any cell with n<2 → NULL SE.
    """
    from ..common import det_round, md5_hex4_spark

    ev = table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase")
        & F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
    )
    scored = ev.select(
        (F.expr(md5_hex4_spark("user_id", 1)) % 2).alias("treat"),
        F.when(F.dayofmonth("ts") >= 16, 1).otherwise(0).alias("post"),
        "value",
    )
    v = F.col("value")
    cells = scored.groupBy("treat", "post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        _dec_sum(v).alias("s"),
        _dec_sum(v * v).alias("ss"),
    )
    pick = lambda t, p, c: F.max(
        F.when((F.col("treat") == t) & (F.col("post") == p), F.col(c))
    )
    names = {(1, 1): "11", (1, 0): "10", (0, 1): "01", (0, 0): "00"}
    piv = cells.agg(
        *[pick(t, p, "n").alias(f"n{sfx}") for (t, p), sfx in names.items()],
        *[pick(t, p, "s").alias(f"s{sfx}") for (t, p), sfx in names.items()],
        *[pick(t, p, "ss").alias(f"ss{sfx}") for (t, p), sfx in names.items()],
    ).where(
        F.col("n11").isNotNull()
        & F.col("n10").isNotNull()
        & F.col("n01").isNotNull()
        & F.col("n00").isNotNull()
    )
    mean = lambda sfx: F.col(f"s{sfx}") / F.col(f"n{sfx}")
    se_term = lambda sfx: (
        F.col(f"n{sfx}") * F.col(f"ss{sfx}") - F.col(f"s{sfx}") * F.col(f"s{sfx}")
    ) / (
        F.col(f"n{sfx}").cast("double")
        * F.col(f"n{sfx}")
        * (F.col(f"n{sfx}") - 1)
    )
    small = (
        (F.col("n11") < 2)
        | (F.col("n10") < 2)
        | (F.col("n01") < 2)
        | (F.col("n00") < 2)
    )
    return piv.select(
        "n11",
        "n10",
        "n01",
        "n00",
        det_round(
            (mean("11") - mean("10")) - (mean("01") - mean("00")), 6
        ).alias("did_estimate"),
        F.when(small, F.lit(None).cast("double"))
        .otherwise(
            det_round(
                F.sqrt(
                    se_term("11") + se_term("10") + se_term("01") + se_term("00")
                ),
                6,
            )
        )
        .alias("std_error"),
    )


@query(
    "q_sprt_abtest",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(EXTRACT(day FROM ts) AS INT) AS d,
             {md5_hex4_duck('user_id', 1)} % 2 AS arm,
             CAST(COUNT(*) AS BIGINT) AS trials,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS hits
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY 1, 2
    ),
    piv AS (
      SELECT d,
             COALESCE(MAX(CASE WHEN arm = 1 THEN hits END), 0) AS h1,
             COALESCE(MAX(CASE WHEN arm = 1 THEN trials END), 0) AS t1,
             COALESCE(MAX(CASE WHEN arm = 0 THEN hits END), 0) AS h0,
             COALESCE(MAX(CASE WHEN arm = 0 THEN trials END), 0) AS t0
      FROM daily GROUP BY d
    ),
    llr AS (
      SELECT d,
             SUM(CAST(h1 * ln(0.22 / 0.18) + (t1 - h1) * ln(0.78 / 0.82)
                      AS DECIMAL(20,8)))
               OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS llr_c
      FROM piv
    )
    SELECT CAST(d AS INT) AS day,
           floor(CAST(llr_c AS DOUBLE) * 1e6 + 0.5) / 1e6 AS llr,
           CASE WHEN CAST(llr_c AS DOUBLE) >= ln(19.0) THEN 'accept_h1'
                WHEN CAST(llr_c AS DOUBLE) <= -ln(19.0) THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM llr
    """,
)
def q_sprt_abtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential probability ratio test over the experiment's daily
    ledger: the treatment arm's cumulative log-likelihood ratio for
    H1: p=0.22 vs H0: p=0.18 purchase rate, with Wald's ±ln(19)
    boundaries (α≈β≈0.05) — the always-valid monitor that replaces
    peeking at a fixed-horizon z-test (q_ab_test's sequential sibling).

    Scale shape: one hash agg to the (day, arm) ledger; the LLR walk
    is a window cumsum over the CALENDAR-BOUNDED pivoted series with
    each day's increment cast to DECIMAL(20,8) before the running sum
    (exact accumulation — no float-order drift), and ln() only ever
    applied to the four CONSTANT likelihood ratios. The md5 arm split
    matches q_diff_in_diff's assignment.
    """
    from ..common import det_round, md5_hex4_spark

    ev = table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    daily = ev.groupBy(
        F.dayofmonth("ts").cast("int").alias("d"),
        (F.expr(md5_hex4_spark("user_id", 1)) % 2).alias("arm"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("trials"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("hits"),
    )
    pick = lambda a, c: F.coalesce(
        F.max(F.when(F.col("arm") == a, F.col(c))), F.lit(0)
    )
    piv = daily.groupBy("d").agg(
        pick(1, "hits").alias("h1"),
        pick(1, "trials").alias("t1"),
        pick(0, "hits").alias("h0"),
        pick(0, "trials").alias("t0"),
    )
    import math

    inc = (
        F.col("h1") * F.lit(math.log(0.22 / 0.18))
        + (F.col("t1") - F.col("h1")) * F.lit(math.log(0.78 / 0.82))
    ).cast("decimal(20,8)")
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    llr_c = F.sum(inc).over(w).cast("double")
    bound = math.log(19.0)
    walk = piv.select(F.col("d").cast("int").alias("day"), llr_c.alias("llr_c"))
    return walk.select(
        "day",
        det_round(F.col("llr_c"), 6).alias("llr"),
        F.when(F.col("llr_c") >= bound, "accept_h1")
        .when(F.col("llr_c") <= -bound, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    )


@query(
    "q_contribution",
    oracle="""
    WITH leaf AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             SUM(CAST(o.o_totalprice AS DECIMAL(30,8))) AS rev
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE o.o_totalprice IS NOT NULL
      GROUP BY 1, 2
    ),
    reg AS (SELECT region, SUM(rev) AS reg_rev FROM leaf GROUP BY region),
    tot AS (SELECT SUM(rev) AS all_rev FROM leaf)
    SELECT l.region, l.nation,
           CAST(l.rev AS DOUBLE) AS revenue,
           floor(CAST(l.rev AS DOUBLE) / CAST(g.reg_rev AS DOUBLE) * 1e6 + 0.5)
             / 1e6 AS share_of_region,
           floor(CAST(g.reg_rev AS DOUBLE) / CAST(t.all_rev AS DOUBLE) * 1e6 + 0.5)
             / 1e6 AS region_share_of_total
    FROM leaf l JOIN reg g ON g.region = l.region CROSS JOIN tot t
    WHERE t.all_rev > 0 AND g.reg_rev > 0
    """,
)
def q_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical contribution analysis: each nation's share of its
    region's revenue and each region's share of the total — the
    'what drives the number' drill-down every metrics review starts
    with (q_rollup gives the level totals; this gives the RATIOS
    between levels, which rollup rows cannot express).

    One star-join aggregation to the leaf (region, nation) table
    (dims broadcast), then two metadata-scale re-aggregations;
    shares are exact-decimal / exact-decimal single divisions,
    6-dp floor-rounded. Zero-revenue parents are excluded (a share
    of nothing is undefined on both sides).
    """
    from ..common import det_round

    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice").isNotNull())
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    leaf = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("rev"))
    )
    reg = leaf.groupBy("region").agg(F.sum("rev").alias("reg_rev"))
    tot = leaf.agg(F.sum("rev").alias("all_rev"))
    return (
        leaf.join(F.broadcast(reg), "region")
        .crossJoin(F.broadcast(tot))
        .where((F.col("all_rev") > 0) & (F.col("reg_rev") > 0))
        .select(
            "region",
            "nation",
            F.col("rev").cast("double").alias("revenue"),
            det_round(
                F.col("rev").cast("double") / F.col("reg_rev").cast("double"), 6
            ).alias("share_of_region"),
            det_round(
                F.col("reg_rev").cast("double") / F.col("all_rev").cast("double"),
                6,
            ).alias("region_share_of_total"),
        )
    )


@query(
    "q_cuped",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             {md5_hex4_duck('user_id', 1)} % 2 AS arm,
             SUM(CASE WHEN EXTRACT(day FROM ts) < 16
                      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
               AS pre_c,
             SUM(CASE WHEN EXTRACT(day FROM ts) >= 16
                      THEN CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE 0 END)
               AS post_c
      FROM events
      WHERE event_type = 'purchase'
        AND value IS NOT NULL AND isfinite(value)
        AND user_id IS NOT NULL AND ts IS NOT NULL
      GROUP BY user_id
    ),
    gl AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(pre_c) AS DOUBLE) / 1e2 AS sp,
             CAST(SUM(post_c) AS DOUBLE) / 1e2 AS sq,
             CAST(SUM(CAST(pre_c AS HUGEINT) * pre_c) AS DOUBLE) / 1e4 AS spp,
             CAST(SUM(CAST(pre_c AS HUGEINT) * post_c) AS DOUBLE) / 1e4 AS spq
      FROM per_user
    ),
    theta AS (
      SELECT n, sp / n AS mu_pre,
             CASE WHEN (n * spp - sp * sp) <= 0 THEN 0.0
                  ELSE (n * spq - sp * sq) / (n * spp - sp * sp) END AS th
      FROM gl
    ),
    arms AS (
      SELECT arm,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(pre_c) AS DOUBLE) / 1e2 AS asp,
             CAST(SUM(post_c) AS DOUBLE) / 1e2 AS asq,
             CAST(SUM(CAST(post_c AS HUGEINT) * post_c) AS DOUBLE) / 1e4 AS asqq,
             CAST(SUM(CAST(pre_c AS HUGEINT) * post_c) AS DOUBLE) / 1e4 AS aspq,
             CAST(SUM(CAST(pre_c AS HUGEINT) * pre_c) AS DOUBLE) / 1e4 AS aspp
      FROM per_user GROUP BY arm
    )
    SELECT CAST(a.arm AS INT) AS arm, a.n_users,
           floor(a.asq / a.n_users * 1e6 + 0.5) / 1e6 AS mean_post,
           floor((a.asq / a.n_users
                  - t.th * (a.asp / a.n_users - t.mu_pre)) * 1e6 + 0.5) / 1e6
             AS mean_adjusted,
           CASE WHEN a.n_users < 2
                  OR (a.n_users * a.asqq - a.asq * a.asq) <= 0 THEN NULL
                ELSE floor((
                    (a.asqq - 2 * t.th * (a.aspq - t.mu_pre * a.asq)
                     + t.th * t.th * (a.aspp - 2 * t.mu_pre * a.asp
                                      + a.n_users * t.mu_pre * t.mu_pre)
                     - a.n_users * (a.asq / a.n_users
                                    - t.th * (a.asp / a.n_users - t.mu_pre))
                                 * (a.asq / a.n_users
                                    - t.th * (a.asp / a.n_users - t.mu_pre)))
                    / (a.asqq - a.asq * a.asq / a.n_users)
                  ) * 1e6 + 0.5) / 1e6
           END AS var_ratio
    FROM arms a, theta t
    """,
)
def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction for the purchase-value experiment:
    adjusted post-period metric Y' = Y − θ(X − μ_X) with the pooled
    θ = cov(X,Y)/var(X) from the pre-period covariate — the standard
    trick that shrinks A/B confidence intervals using pre-experiment
    behavior (Deng et al. 2013), here reported per arm as raw vs
    adjusted means plus the achieved variance ratio var(Y')/var(Y).

    One hash agg to per-user (pre, post) integer-cents totals, then
    ONE more pass of exact cents power sums globally (θ, μ) and per
    arm; everything downstream — adjusted means, Σ(Y')² expanded as
    Σ Y² − 2θ Σ(X−μ)Y + θ² Σ(X−μ)² — recombines in fixed expression
    trees from those exact sums (no per-user float math at all).
    Guards: zero pre-period variance → θ = 0 (CUPED degrades to the
    raw metric, the documented convention); n<2 or zero post variance
    → NULL ratio. Same md5 arm split as q_diff_in_diff / q_sprt_abtest.
    """
    from ..common import det_round, finite, md5_hex4_spark

    # finite(value) covers non-NULL too: a NaN would survive floor()
    # into Spark's silent bigint-0 vs DuckDB's cast throw (nonfinite
    # sweep find, r10).
    ev = table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase")
        & finite(F.col("value"))
        & F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.dayofmonth("ts") < 16, cents).otherwise(0)).alias("pre_c"),
        F.sum(F.when(F.dayofmonth("ts") >= 16, cents).otherwise(0)).alias(
            "post_c"
        ),
    ).select(
        (F.expr(md5_hex4_spark("user_id", 1)) % 2).alias("arm"),
        "pre_c",
        "post_c",
    )
    dec0 = lambda c: F.col(c).cast("decimal(38,0)")
    glob = per_user.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.sum("pre_c").cast("double") / F.lit(1e2)).alias("sp"),
        (F.sum("post_c").cast("double") / F.lit(1e2)).alias("sq"),
        (F.sum(dec0("pre_c") * F.col("pre_c")).cast("double") / F.lit(1e4)).alias(
            "spp"
        ),
        (F.sum(dec0("pre_c") * F.col("post_c")).cast("double") / F.lit(1e4)).alias(
            "spq"
        ),
    )
    theta = glob.select(
        "n",
        (F.col("sp") / F.col("n")).alias("mu_pre"),
        F.when(
            (F.col("n") * F.col("spp") - F.col("sp") * F.col("sp")) <= 0,
            F.lit(0.0),
        )
        .otherwise(
            (F.col("n") * F.col("spq") - F.col("sp") * F.col("sq"))
            / (F.col("n") * F.col("spp") - F.col("sp") * F.col("sp"))
        )
        .alias("th"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        (F.sum("pre_c").cast("double") / F.lit(1e2)).alias("asp"),
        (F.sum("post_c").cast("double") / F.lit(1e2)).alias("asq"),
        (F.sum(dec0("post_c") * F.col("post_c")).cast("double") / F.lit(1e4)).alias(
            "asqq"
        ),
        (F.sum(dec0("pre_c") * F.col("post_c")).cast("double") / F.lit(1e4)).alias(
            "aspq"
        ),
        (F.sum(dec0("pre_c") * F.col("pre_c")).cast("double") / F.lit(1e4)).alias(
            "aspp"
        ),
    )
    j = arms.crossJoin(F.broadcast(theta))
    nu = F.col("n_users")
    mean_post = F.col("asq") / nu
    mean_adj = mean_post - F.col("th") * (F.col("asp") / nu - F.col("mu_pre"))
    ss_adj = (
        F.col("asqq")
        - 2 * F.col("th") * (F.col("aspq") - F.col("mu_pre") * F.col("asq"))
        + F.col("th")
        * F.col("th")
        * (
            F.col("aspp")
            - 2 * F.col("mu_pre") * F.col("asp")
            + nu * F.col("mu_pre") * F.col("mu_pre")
        )
        - nu * mean_adj * mean_adj
    )
    ss_raw = F.col("asqq") - F.col("asq") * F.col("asq") / nu
    return j.select(
        F.col("arm").cast("int").alias("arm"),
        "n_users",
        det_round(mean_post, 6).alias("mean_post"),
        det_round(mean_adj, 6).alias("mean_adjusted"),
        F.when(
            (nu < 2) | ((nu * F.col("asqq") - F.col("asq") * F.col("asq")) <= 0),
            F.lit(None).cast("double"),
        )
        .otherwise(det_round(ss_adj / ss_raw, 6))
        .alias("var_ratio"),
    )


@query(
    "q_nelson_aalen",
    oracle="""
    WITH raw_gaps AS (
      SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    ),
    gaps AS (
      SELECT (greatest(gap, 0) // 600000000) AS dur, 1 AS observed
      FROM raw_gaps WHERE gap IS NOT NULL
    ),
    open_gaps AS (
      SELECT (((SELECT MAX(epoch_us(ts)) FROM events WHERE ts IS NOT NULL)
                  - MAX(epoch_us(ts)))
                  // 600000000) AS dur,
             0 AS observed
      FROM events WHERE ts IS NOT NULL GROUP BY user_id
    ),
    obs AS (
      SELECT dur, observed FROM gaps WHERE dur IS NOT NULL
      UNION ALL SELECT dur, observed FROM open_gaps
    ),
    at_dur AS (
      SELECT dur, SUM(observed) AS deaths, COUNT(*) - SUM(observed) AS censored
      FROM obs GROUP BY dur
    ),
    risk AS (
      SELECT dur, deaths, censored,
             (SELECT COUNT(*) FROM obs)
               - COALESCE(SUM(deaths + censored) OVER (ORDER BY dur
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS at_risk
      FROM at_dur
    )
    SELECT CAST(dur AS BIGINT) AS gap_10min,
           CAST(at_risk AS BIGINT) AS at_risk,
           CAST(deaths AS BIGINT) AS deaths,
           floor(CAST(SUM(CAST(CAST(deaths AS DOUBLE) / at_risk AS DECIMAL(20,8)))
                        OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 * 1e6 + 0.5) / 1e6 AS cum_hazard,
           floor(exp(-CAST(SUM(CAST(CAST(deaths AS DOUBLE) / at_risk AS DECIMAL(20,8)))
                             OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS na_survival
    FROM risk
    ORDER BY gap_10min
    """,
)
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard of the inter-event renewal process
    (and its exp(−H) survival transform) — q_kaplan_meier's
    additive-increment sibling on the SAME censored life table: KM
    multiplies survival factors, NA sums hazard increments d/n, which
    is the better-behaved estimator near the tail (never collapses to
    an exact 0 at a saturated bucket) and the input to Cox-model
    diagnostics.

    Identical data-scale shape to KM: one lag window + one per-user
    aggregate build the censored observations, the life table is
    bounded by the time range, and the hazard accumulates over THAT —
    with each d/n increment cast to DECIMAL(20,8) before the running
    sum, so the cumulative walk is exact (the SPRT discipline,
    stricter than KM's exp-sum-ln tree). exp() follows the established
    6-dp libm-rounding discipline.
    """
    from pyspark.sql import Window

    # ts IS NOT NULL on BOTH sides (r8 advice): a NULL ts would make
    # Spark's greatest(NULL, 0L) emit a dur=0 death where the oracle's
    # gap IS NOT NULL drops it, and an all-NULL-ts user would yield a
    # NULL dur whose window ordering differs cross-engine (Spark NULLS
    # FIRST vs DuckDB NULLS LAST). Filtering pins both.
    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select("user_id", "event_id", F.unix_micros("ts").alias("us"))
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    gaps = (
        ev.withColumn("prev_us", F.lag("us").over(w))
        .where(F.col("prev_us").isNotNull())
        .select(
            F.expr(
                "CAST(greatest(us - prev_us, 0L) div 600000000 AS BIGINT)"
            ).alias("dur"),
            F.lit(1).alias("observed"),
        )
    )
    gmax = ev.agg(F.max("us").alias("gmax"))
    open_gaps = (
        ev.groupBy("user_id")
        .agg(F.max("us").alias("last_us"))
        .crossJoin(F.broadcast(gmax))
        .select(
            F.expr("CAST((gmax - last_us) div 600000000 AS BIGINT)").alias("dur"),
            F.lit(0).alias("observed"),
        )
    )
    obs = gaps.unionByName(open_gaps)
    n_total = obs.agg(F.count(F.lit(1)).alias("n_total"))
    at_dur = obs.groupBy("dur").agg(
        F.sum("observed").alias("deaths"),
        (F.count(F.lit(1)) - F.sum("observed")).alias("censored"),
    )
    # NOTE for auditors: the unpartitioned Windows below fire Spark's
    # `WindowExec: No Partition Defined` warning. That is expected and
    # safe HERE: they run on the post-aggregation censored life table
    # (bounded by the time range (~4.3k 10-min buckets/month) — metadata-scale, never the fact
    # table), which is exactly the bounded-frame case the scale-funnel
    # lint (plans/lint.py) exempts.
    w_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    w_run = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    risk = at_dur.crossJoin(F.broadcast(n_total)).withColumn(
        "at_risk",
        F.col("n_total")
        - F.coalesce(
            F.sum(F.col("deaths") + F.col("censored")).over(w_prev), F.lit(0)
        ),
    )
    inc = (F.col("deaths").cast("double") / F.col("at_risk")).cast(
        "decimal(20,8)"
    )
    hazard = F.sum(inc).over(w_run).cast("double")
    from ..common import det_round

    return risk.select(
        F.col("dur").cast("bigint").alias("gap_10min"),
        F.col("at_risk").cast("bigint").alias("at_risk"),
        F.col("deaths").cast("bigint").alias("deaths"),
        det_round(hazard, 6).alias("cum_hazard"),
        det_round(F.exp(-hazard), 6).alias("na_survival"),
    ).orderBy("gap_10min")
