"""Event-stream product analytics: funnel, retention cohorts, OHLC resample.

The reference's log pipeline stops at fact-table construction
(etl.py:164-226 builds songplays and writes it). These operators are the
queries a product team runs ON that fact table — ordered-step conversion
funnels, signup-cohort retention, and time-bucket OHLC resampling — each
expressed as one or two hash aggregations so they hold at 100 TB:

- funnel: K tiny per-user aggregates chained by equi-joins on user_id
  (K = funnel depth, fixed). No window over the full event stream.
- retention: two hash aggs (first-signup per user, distinct user-days)
  joined on user_id; the cohort matrix is the tiny output.
- OHLC: ONE aggregation pass with min_by/max_by carrying a total-order
  key — no per-bucket sort, full map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..caching import track
from ..catalog import table
from ..common import DEC, date_str, det_round, dsum, o_date_str, o_det_round, o_dsum
from ..common import finite as _finite
from ..registry import query

# The funnel's ordered stages. Strict ts ordering between stages: a
# user's click only counts if it happens AFTER their first view, their
# purchase only after that first qualifying click — the "did the journey
# happen in order" semantics that a naive per-stage COUNT(DISTINCT) gets
# wrong (it would count a purchase that preceded the first view).
_FUNNEL_STAGES = ("view", "click", "purchase")


@query(
    "q_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT CAST(1 AS INT) AS stage_idx, 'view' AS stage,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_users
    UNION ALL
    SELECT 2, 'click', (SELECT CAST(COUNT(*) AS BIGINT) FROM c)
    UNION ALL
    SELECT 3, 'purchase', (SELECT CAST(COUNT(*) AS BIGINT) FROM p)
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: users who
    completed each stage strictly after the previous one.

    Stage k is a per-user MIN(ts) hash agg over one event type,
    equi-joined on user_id to stage k-1 and filtered to ts > prior
    stage's ts — each round shuffles only (user, ts) pairs of ONE event
    type, and the chain is as deep as the funnel, never as deep as the
    data. First-touch semantics: the qualifying click is the EARLIEST
    click after the first view (window-free; at 100 TB the alternative
    full-stream sessionized window is the thing to avoid).
    """
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    stage_users: list[DataFrame] = []
    prior: DataFrame | None = None  # (user_id, t_prev)
    for stage in _FUNNEL_STAGES:
        cur = ev.where(F.col("event_type") == stage)
        if prior is not None:
            cur = cur.join(prior, "user_id").where(F.col("ts") > F.col("t_prev"))
        # persist each stage's (user, ts) table: the final union references
        # stage k from every stage > k, and without the cache the plan
        # re-expands to K(K+1)/2 event scans for a depth-K funnel. The
        # cached tables are user-bounded (tiny). Callers/bench own caches.
        reached = track(cur.groupBy("user_id").agg(F.min("ts").alias("t_prev")))
        stage_users.append(reached)
        prior = reached

    out = None
    for i, (stage, reached) in enumerate(zip(_FUNNEL_STAGES, stage_users), start=1):
        row = reached.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).cast("int").alias("stage_idx"),
            F.lit(stage).alias("stage"),
            "n_users",
        )
        out = row if out is None else out.unionByName(row)
    return out


@query(
    "q_retention_cohort",
    oracle=f"""
    WITH first_signup AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT {o_date_str("date_trunc('week', f.d0)")} AS cohort_week,
           CAST(datediff('day', f.d0, a.d) // 7 AS INT) AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM activity a JOIN first_signup f ON a.user_id = f.user_id
    WHERE a.d >= f.d0
    GROUP BY date_trunc('week', f.d0), week_offset
    """,
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup-cohort retention matrix: for each signup week, how many of
    its users were active 0, 1, 2, … weeks later.

    Two hash aggregations — first-signup date per user and distinct
    (user, active-day) pairs — joined on user_id; the cohort × offset
    matrix is the output and is tiny regardless of input scale. The
    distinct on (user, day) collapses the event stream BEFORE the join,
    so the join input is bounded by users × days, not by raw events.
    """
    ev = table(spark, sf_dir, "events")
    first_signup = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("d0"))
    )
    activity = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    return (
        activity.join(first_signup, "user_id")
        .where(F.col("d") >= F.col("d0"))
        .groupBy(
            date_str(F.date_trunc("week", F.col("d0")).cast("date")).alias("cohort_week"),
            (F.datediff(F.col("d"), F.col("d0")) / 7)
            .cast("int")
            .alias("week_offset"),  # datediff ≥ 0 here, so cast == floor
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


# Total-order key for open/close tie-breaks: zero-padded micros ++ padded
# event_id, lexicographically comparable in BOTH engines (DuckDB arg_min
# has no composite/struct key overload, so the composite is a string).
_OHLC_KEY = "%020d%010d"


@query(
    "q_resample_ohlc",
    oracle=f"""
    SELECT {o_date_str('CAST(ts AS DATE)')} AS day,
           arg_min(value, printf('%020d%010d', epoch_us(ts), event_id)) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, printf('%020d%010d', epoch_us(ts), event_id)) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_trades,
           {o_dsum('value')} AS volume
    FROM events
    WHERE event_type = 'purchase' AND value IS NOT NULL
      AND ts IS NOT NULL
    GROUP BY CAST(ts AS DATE)
    """,
)
def q_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucket OHLC resampling of purchase values per day — the
    classic downsample shape (metrics, tick data, training-loss curves).

    ONE aggregation pass: open/close are min_by/max_by over a
    total-order (ts, event_id) key — no per-bucket sort, no window over
    the raw stream, full map-side partial aggregation. The composite
    key is a zero-padded string because the DuckDB oracle's arg_min
    lacks a struct-key overload; zero-padding makes lexicographic ==
    numeric order. Volume accumulates as decimal (engine-exact).
    NULL-value rows are excluded (a trade without a value is not a
    trade; also Spark min_by RETURNS a NULL value while DuckDB arg_min
    SKIPS it — per-category hostile sweep find).
    """
    # ts IS NOT NULL (both sides): a NULL ts would form a NULL day
    # bucket whose arg_min/min_by key is NULL — DuckDB's arg_min SKIPS
    # NULL keys while Spark's min_by returns NULL (nullts catalog).
    ev = table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase")
        & F.col("value").isNotNull()
        & F.col("ts").isNotNull()
    )
    key = F.format_string(_OHLC_KEY, F.unix_micros("ts"), F.col("event_id"))
    return ev.groupBy(date_str(F.to_date("ts")).alias("day")).agg(
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
        F.count(F.lit(1)).alias("n_trades"),
        dsum(F.col("value")).alias("volume"),
    )


@query(
    "q_frequent_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    )
    SELECT a.p AS part_a, b.p AS part_b,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
    GROUP BY a.p, b.p
    HAVING COUNT(*) >= 2
    ORDER BY support DESC, part_a, part_b
    LIMIT 20
    """,
)
def q_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket frequent item pairs: parts co-purchased in the same
    order, ranked by support (the A-Priori k=2 pass — the workhorse of
    affinity / "bought together" analytics).

    Scale shape: pair generation is a SELF-EQUI-JOIN on the basket key,
    so the blow-up is Σ per-basket items² — bounded by basket size
    (~items-per-order², never corpus²). The pair count then hash-aggs
    with map-side combine, and the support threshold keeps the output
    sparse. Top-20 with full tiebreaks plans as TakeOrderedAndProject.
    """
    # r12: pair generation via the shared per-basket HOF pass — no
    # self-join, so the r11 "persist vs parallel recompute" dilemma this
    # comment used to document is gone (one consumer chain, one distinct
    # pass, one groupBy(o) exchange; see graph.basket_pair_counts).
    from .graph import basket_pair_counts

    items = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    return (
        basket_pair_counts(items)
        .where(F.col("n_pair") >= 2)
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            F.col("n_pair").alias("support"),
        )
        .orderBy(F.col("support").desc(), "part_a", "part_b")
        .limit(20)
    )


@query(
    "q_sequence_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events WHERE ts IS NOT NULL
    ),
    t AS (
      SELECT event_type AS src, next_type AS dst, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY src, dst
    )
    SELECT src, dst, CAST(n AS BIGINT) AS n_transitions,
           ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY src), 4) AS p
    FROM t
    """,
)
def q_sequence_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current type) — the behavioral-model
    prep (next-action prediction, anomalous-flow detection) and the
    sequence-statistics pass an LLM-agent trace pipeline runs on action
    logs.

    One shuffle on user_id for the LEAD window (full (ts, event_id)
    tiebreak so the successor is engine-deterministic), then a hash agg
    on the (src, dst) pairs — 25 cells here, K² cells generally, so the
    output never scales with the data. The probability is one bigint÷
    bigint IEEE division of identical values on both engines, rounded
    only for display stability.
    """
    # ts IS NOT NULL on BOTH sides: the LEAD window orders by (ts,
    # event_id) and a NULL ts sorts NULLS FIRST in Spark vs NULLS LAST
    # in DuckDB, which would reorder that user's sequence (r8 advice).
    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select("user_id", "event_type", "ts", "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    t = seq.groupBy(
        F.col("event_type").alias("src"), F.col("next_type").alias("dst")
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    wsrc = Window.partitionBy("src")
    return t.select(
        "src",
        "dst",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double") / F.sum("n_transitions").over(wsrc), 4
        ).alias("p"),
    )


@query(
    "q_time_weighted_avg",
    # Weights are whole-SECOND gaps (exact integer division of the µs
    # gap) and values round to DECIMAL(18,4): the weighted sum's
    # unscaled integer then stays below 2^53, so BOTH engines' decimal→
    # double casts are exact. (µs weights were tried and diverge:
    # DuckDB casts decimal via (double)unscaled / (double)10^scale —
    # two roundings once unscaled exceeds 2^53 — while Spark's
    # BigDecimal cast rounds once; sub-ulp TWA differences followed.)
    # Sub-second gaps weigh 0 and drop out of both sums consistently.
    oracle="""
    WITH seq AS (
      SELECT user_id, value, epoch_us(ts) AS us,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_us
      FROM events
      WHERE event_type = 'purchase' AND (value IS NULL OR isfinite(value))
    ),
    g AS (
      SELECT user_id, value, (next_us - us) // 1000000 AS gap_s
      FROM seq WHERE next_us IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(gap_s) AS BIGINT) AS span_s,
           CAST(SUM(CAST(value AS DECIMAL(18,4)) * gap_s) AS DOUBLE)
                / CAST(SUM(gap_s) AS DOUBLE) AS twa
    FROM g
    GROUP BY user_id
    HAVING SUM(gap_s) > 0
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user: each purchase value weighted by
    how long it remained the latest observation — the aggregation that
    is CORRECT for irregularly sampled series (sensor states, account
    balances, position marks), where the plain AVG over-weights bursts.

    One LEAD window (full tiebreak) to get each observation's holding
    interval, then a hash agg: Σ value×gap_s / Σ gap_s with whole-second
    integer gaps and decimal products — engine-exact up to the one
    final IEEE division (see the oracle comment for the 2^53 cast
    analysis that forces second, not microsecond, weights).
    """
    from pyspark.sql import Window

    from ..common import finite

    # finite-or-NULL values only (r9 nonfinite catalog): NaN/Inf would
    # error DuckDB's DECIMAL(18,4) cast and silently NULL in Spark's.
    ev = table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase")
        & (F.col("value").isNull() | finite(F.col("value")))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("us"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    ).where(F.col("next_us").isNotNull())
    gap_s = F.expr("(next_us - us) div 1000000")
    return (
        seq.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum(gap_s).alias("span_s"),
            # cast each exact decimal/integer sum to double FIRST, then
            # divide once (decimal÷decimal result scale truncates)
            (
                F.sum(F.col("value").cast("decimal(18,4)") * gap_s).cast("double")
                / F.sum(gap_s).cast("double")
            ).alias("twa"),
        )
        .where(F.col("span_s") > 0)
    )


@query(
    "q_rolling_active_users",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud)
    SELECT {day} AS day,
           CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS wau
    FROM days JOIN ud ON ud.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
    GROUP BY days.d
    """.format(day="strftime(days.d, '%Y-%m-%d')"),
)
def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU) per day — the windowed
    COUNT(DISTINCT) that a plain window frame cannot express (distinct
    doesn't decompose over sliding frames), solved the scalable way:
    collapse events to distinct (user, day) FIRST, then expand each
    observation into the ≤7 window anchors it serves via a bounded
    range join, then count distinct per anchor.

    The expansion factor is exactly the window length — cost is
    users×days×7, independent of raw event volume, and every join is an
    equi-ish range join on the tiny distinct table. (The alternative —
    approx via HLL sketch merge — is q_sketch_hll_merge's territory;
    this is the exact path.)
    """
    ev = table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    days = ud.select("d").distinct().select(F.col("d").alias("anchor"))
    return (
        days.join(
            ud,
            (F.col("d") >= F.date_sub(F.col("anchor"), 6))
            & (F.col("d") <= F.col("anchor")),
        )
        .groupBy(date_str(F.col("anchor")).alias("day"))
        .agg(F.count_distinct("user_id").alias("wau"))
    )


@query(
    "q_rfm_segments",
    oracle=f"""
    WITH rfm AS (
      SELECT user_id,
             datediff('day', MAX(CAST(ts AS DATE)), DATE '2024-02-01') AS recency_days,
             COUNT(*) AS frequency,
             {o_dsum('value')} AS monetary
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    )
    SELECT CASE WHEN recency_days <= 3 THEN 'active'
                WHEN recency_days <= 10 THEN 'cooling' ELSE 'dormant' END
             AS recency_band,
           CASE WHEN frequency >= 15 THEN 'frequent' ELSE 'occasional' END
             AS frequency_band,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           {o_dsum('monetary')} AS total_value
    FROM rfm
    GROUP BY recency_band, frequency_band
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary): the
    composed marketing-analytics shape — per-user aggregate, then
    banding, then segment rollup. Bands use FIXED thresholds, not
    quantiles, deliberately: threshold bands are one map-side CASE
    (and engine-exact); quantile bands need a global rank and are
    q_ntile_global's pattern if wanted.

    Two chained hash aggs (user-level then segment-level), monetary
    decimal-exact through both; the anchor date is fixed so recency is
    reproducible.
    """
    ev = table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    rfm = ev.groupBy("user_id").agg(
        F.datediff(F.lit("2024-02-01").cast("date"), F.max(F.to_date("ts"))).alias(
            "recency_days"
        ),
        F.count(F.lit(1)).alias("frequency"),
        dsum(F.col("value")).alias("monetary"),
    )
    recency_band = (
        F.when(F.col("recency_days") <= 3, "active")
        .when(F.col("recency_days") <= 10, "cooling")
        .otherwise("dormant")
    )
    frequency_band = F.when(F.col("frequency") >= 15, "frequent").otherwise("occasional")
    return (
        rfm.groupBy(
            recency_band.alias("recency_band"), frequency_band.alias("frequency_band")
        )
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            dsum(F.col("monetary")).alias("total_value"),
        )
    )


@query(
    "q_period_growth",
    oracle=f"""
    WITH m AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             COUNT(*) AS n_orders,
             {o_dsum('o_totalprice')} AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, n_orders, revenue,
           round((revenue - LAG(revenue) OVER (ORDER BY month))
                 / LAG(revenue) OVER (ORDER BY month) * 100, 4) AS growth_pct
    FROM m
    """,
)
def q_period_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: the period-comparison staple of
    every BI workload (MoM/YoY), as aggregate → offset window → ratio.

    Scale shape: the heavy lift is ONE hash aggregation of the fact
    table down to months; the LAG window then runs over the month table
    — bounded by calendar length, i.e. metadata-sized — so the
    single-partition global-order window is safe by construction (the
    same pre-aggregate-then-window contract as q_ntile_global, stated
    there for data-sized inputs). Growth ratios divide decimal-exact
    monthly sums cast to double: two IEEE ops on identical operands on
    both engines.
    """
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("revenue"),
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        "n_orders",
        "revenue",
        F.round((F.col("revenue") - prev) / prev * 100, 4).alias("growth_pct"),
    )


@query(
    "q_attribution",
    oracle=f"""
    WITH v AS (
      SELECT user_id, ts AS v_ts,
             arg_max(CAST(json_extract_string((CASE WHEN json_valid(props) THEN props END), '$.k') AS INT) % 5, event_id)
               AS channel
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    ),
    ft AS (SELECT user_id, arg_min(channel, v_ts) AS channel FROM v GROUP BY user_id),
    p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
    f AS (
      SELECT COALESCE(ft.channel, -1) AS channel,
             COUNT(*) AS n_first, {o_dsum('p.value')} AS rev_first
      FROM p LEFT JOIN ft ON p.user_id = ft.user_id GROUP BY 1
    ),
    l AS (
      SELECT COALESCE(v.channel, -1) AS channel,
             COUNT(*) AS n_last, {o_dsum('p.value')} AS rev_last
      FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.v_ts <= p.ts
      GROUP BY 1
    )
    SELECT COALESCE(f.channel, l.channel) AS channel,
           CAST(COALESCE(f.n_first, 0) AS BIGINT) AS n_first,
           COALESCE(f.rev_first, 0.0) AS rev_first,
           CAST(COALESCE(l.n_last, 0) AS BIGINT) AS n_last,
           COALESCE(l.rev_last, 0.0) AS rev_last
    FROM f FULL OUTER JOIN l ON f.channel = l.channel
    """,
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution: purchase revenue credited per acquisition
    channel under BOTH first-touch (the user's earliest view, a per-user
    aggregate + equi-join) and last-touch (the latest view at-or-before
    each purchase — the as-of join, :func:`..asof_pivot_sql.asof_join`)
    models, side by side per channel. Channel is derived from the view
    event's props (k mod 5); purchases with no attributable view land
    in channel −1 so revenue is conserved across models (Σ rev_first =
    Σ rev_last = total purchase value — asserted in tests).

    Scale shape: channel extraction and dedup are map + one hash agg;
    first-touch is a per-user min; last-touch is the single-shuffle
    union+carry-forward as-of; final fan-in is a channel-sized full
    outer join. Views are deduplicated per (user, ts) with an event_id
    tiebreak BEFORE the as-of join — as-of ties at equal timestamps are
    otherwise matched arbitrarily on both engines.
    """
    from .asof_pivot_sql import asof_join

    ev = table(spark, sf_dir, "events")
    channel = (
        F.get_json_object("props", "$.k").cast("int") % 5
    )
    v = (
        ev.where(F.col("event_type") == "view")
        .select("user_id", F.col("ts").alias("v_ts"), channel.alias("ch"), "event_id")
        .groupBy("user_id", "v_ts")
        .agg(F.max_by("ch", "event_id").alias("channel"))
    )
    ft = v.groupBy("user_id").agg(F.min_by("channel", "v_ts").alias("channel"))
    p = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    f = (
        p.join(ft, "user_id", "left")
        .groupBy(F.coalesce("channel", F.lit(-1)).alias("channel"))
        .agg(F.count(F.lit(1)).alias("n_first"), dsum(F.col("value")).alias("rev_first"))
    )
    lt = asof_join(p, v, on="user_id", left_ts="ts", right_ts="v_ts", right_cols=["channel"])
    l = (  # noqa: E741
        lt.groupBy(F.coalesce("asof_channel", F.lit(-1)).alias("channel"))
        .agg(F.count(F.lit(1)).alias("n_last"), dsum(F.col("value")).alias("rev_last"))
    )
    fa, la = f.alias("f"), l.alias("l")
    return fa.join(la, F.col("f.channel") == F.col("l.channel"), "full_outer").select(
        F.coalesce(F.col("f.channel"), F.col("l.channel")).alias("channel"),
        F.coalesce(F.col("n_first"), F.lit(0)).cast("bigint").alias("n_first"),
        F.coalesce(F.col("rev_first"), F.lit(0.0)).alias("rev_first"),
        F.coalesce(F.col("n_last"), F.lit(0)).cast("bigint").alias("n_last"),
        F.coalesce(F.col("rev_last"), F.lit(0.0)).alias("rev_last"),
    )


_EWMA_ALPHA = 0.3
_EWMA_TAPS = 8  # truncated kernel length


def _ewma_weights() -> list[float]:
    """Truncated, renormalized EWMA kernel: w_i ∝ α(1−α)^i, i=0..T−1.
    Computed once in Python and baked as literals, so both engines
    evaluate the SAME doubles — no pow() in either engine's row path."""
    raw = [_EWMA_ALPHA * (1 - _EWMA_ALPHA) ** i for i in range(_EWMA_TAPS)]
    s = sum(raw)
    return [w / s for w in raw]


def _ewma_oracle() -> str:
    ws = _ewma_weights()
    lag_cols = ",\n             ".join(
        f"LAG(value, {i}) OVER w AS v{i}" for i in range(1, _EWMA_TAPS)
    )
    num = " + ".join(
        f"COALESCE(v{i} * {w!r}, 0)" if i else f"value * {w!r}"
        for i, w in enumerate(ws)
    )
    den = " + ".join(
        f"(CASE WHEN v{i} IS NULL THEN 0 ELSE {w!r} END)" if i else f"{w!r}"
        for i, w in enumerate(ws)
    )
    return f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
             {lag_cols}
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, round(({num}) / ({den}), 4) AS ewma
    FROM ordered
    """


@query("q_window_ewma", oracle=_ewma_oracle())
def q_window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user — the smoothing
    primitive behind anomaly baselines and trend dashboards — as a
    TRUNCATED 8-tap FIR kernel over offset windows.

    True recursive EWMA (w_t = αx + (1−α)w_{t−1}) is a sequential
    dependency no engine-parallel window can express; the standard
    distributed answer truncates the (geometrically-vanishing) tail —
    after 8 taps of α=0.3 the dropped mass is (1−α)^8 ≈ 5.8% — and
    renormalizes over the taps actually present (series heads average
    their shorter prefix instead of decaying toward zero). The kernel
    weights are computed ONCE in Python and baked as identical literals
    into both engines' expressions, and each output is a fixed
    expression tree over ≤8 lags: one Exchange + one Sort, no pow() in
    the row path, bit-identical cross-engine.
    """
    weights = _ewma_weights()
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.col("value")] + [
        F.lag("value", i).over(w) for i in range(1, _EWMA_TAPS)
    ]
    num = F.lit(0.0)
    den = F.lit(0.0)
    for i, (lv, wt) in enumerate(zip(lags, weights)):
        num = num + F.coalesce(lv * F.lit(wt), F.lit(0.0))
        den = den + F.when(lv.isNull(), 0.0).otherwise(F.lit(wt))
    # ts IS NOT NULL (both sides): an untimed observation has no place
    # in the smoothing order — Spark would sort it NULLS FIRST, DuckDB
    # NULLS LAST, shifting every tap after it (nullts catalog find).
    ev = table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    # A NULL current value means NO observation at this point → NULL
    # smoothed output (the oracle's bare `value * w0` term encodes the
    # same rule); NULL LAGS are merely absent taps and renormalize
    # away. Per-category hostile sweep find.
    return ev.select(
        "user_id",
        "event_id",
        F.when(F.col("value").isNull(), F.lit(None).cast("double"))
        .otherwise(F.round(num / den, 4))
        .alias("ewma"),
    )


@query(
    "q_rolling_zscore",
    oracle="""
    WITH w8 AS (
      SELECT user_id, event_id, value,
             CAST(SUM(CAST(value AS DECIMAL(30,8)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING) AS DOUBLE) AS s,
             CAST(SUM(CAST(value AS DECIMAL(30,8)) * CAST(value AS DECIMAL(30,8)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING) AS DOUBLE) AS s2,
             COUNT(value)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING) AS n
      FROM events
      WHERE value IS NULL OR isfinite(value)
    )
    SELECT user_id, event_id,
           round((value - s / n)
                 / sqrt((s2 - s * s / n) / (n - 1)), 4) AS zscore,
           abs((value - s / n) / sqrt((s2 - s * s / n) / (n - 1))) > 3.0
             AS is_anomaly
    FROM w8
    WHERE n >= 4 AND (s2 - s * s / n) / (n - 1) > 1e-12
    """,
)
def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly screen: each event's value scored against
    the mean/std of the user's PREVIOUS up-to-8 events (the trailing
    baseline never includes the point being judged — using an inclusive
    frame is the classic self-masking bug where the outlier inflates
    its own baseline). Warm-up rows (fewer than 4 priors) and
    degenerate flat baselines are excluded rather than scored against
    noise.

    Exactness across engines: the frame sums accumulate DECIMAL(30,8)
    (value and value² both ≤4 decimals), recombined in double with the
    same expression tree on both sides — the identical discipline as
    q_agg_stats, applied per window frame. One Exchange + one Sort;
    frame cost is O(1) per row (running sums, not per-row rescans).
    """
    from ..common import finite

    # finite-or-NULL only (r9 nonfinite catalog): a NaN/Inf baseline
    # observation would be silently NULLed out of Spark's decimal frame
    # sums but error in DuckDB — quarantined before scoring.
    ev = table(spark, sf_dir, "events").where(
        F.col("value").isNull() | finite(F.col("value"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-8, -1)
    )
    v_dec = F.col("value").cast("decimal(30,8)")
    s = F.sum(v_dec).over(w).cast("double")
    s2 = F.sum(v_dec * v_dec).over(w).cast("double")
    n = F.count("value").over(w)
    scored = ev.select(
        "user_id", "event_id", "value",
        s.alias("s"), s2.alias("s2"), n.alias("n"),
    )
    var = (F.col("s2") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    z = (F.col("value") - F.col("s") / F.col("n")) / F.sqrt(var)
    return (
        scored.where((F.col("n") >= 4) & (var > 1e-12))
        .select(
            "user_id", "event_id",
            F.round(z, 4).alias("zscore"),
            (F.abs(z) > 3.0).alias("is_anomaly"),
        )
    )


@query(
    "q_ltv_curve",
    oracle=f"""
    WITH first_seen AS (
      SELECT user_id, MIN(ts) AS t0 FROM events
      WHERE ts IS NOT NULL GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, e.value,
             CAST(date_diff('day', f.t0, e.ts) AS BIGINT) // 7 AS week_off
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase' AND e.ts IS NOT NULL
        AND (e.value IS NULL OR isfinite(e.value))
    ),
    weekly AS (
      SELECT week_off, SUM(CAST(value AS DECIMAL(30,8))) AS wrev,
             COUNT(*) AS n_purch
      FROM p GROUP BY week_off
    ),
    users AS (SELECT COUNT(*) AS n_users FROM first_seen)
    SELECT week_off, CAST(n_purch AS BIGINT) AS n_purchases,
           CAST(SUM(wrev) OVER (ORDER BY week_off) AS DOUBLE) AS cum_revenue,
           round(CAST(SUM(wrev) OVER (ORDER BY week_off) AS DOUBLE) / u.n_users, 4)
             AS ltv_per_user
    FROM weekly, users u
    """,
)
def q_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifetime-value curve: cumulative purchase revenue per user-week
    since first activity, normalized per acquired user — the retention
    economics companion to q_retention_cohort (that one counts activity;
    this one prices it).

    Shape: first-seen is one hash agg; week offsets are integer
    date_diff // 7; the cumulative window runs over the WEEKLY rollup —
    a calendar-bounded, metadata-scale table (design rule 6) — with
    decimal week-sums so the running total is summation-order exact.
    """
    # ts IS NOT NULL (both sides): an untimed purchase has no week
    # offset — its NULL week_off group would sort NULLS FIRST in the
    # cumulative window here vs NULLS LAST in DuckDB (nullts catalog).
    ev = table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    first_seen = ev.groupBy("user_id").agg(F.min("ts").alias("t0"))
    p = (
        # non-finite purchase values excluded (r9 nonfinite catalog)
        ev.where(
            (F.col("event_type") == "purchase")
            & (F.col("value").isNull() | _finite(F.col("value")))
        )
        .join(first_seen, "user_id")
        .select(
            (F.datediff(F.col("ts"), F.col("t0")).cast("bigint") / 7)
            .cast("bigint")
            .alias("week_off"),
            F.col("value").cast("decimal(30,8)").alias("v"),
        )
    )
    weekly = p.groupBy("week_off").agg(
        F.sum("v").alias("wrev"), F.count(F.lit(1)).alias("n_purchases")
    )
    n_users = first_seen.agg(F.count(F.lit(1)).alias("n_users"))
    w = Window.orderBy("week_off").rowsBetween(Window.unboundedPreceding, 0)
    return (
        weekly.crossJoin(F.broadcast(n_users))
        .select(
            "week_off",
            "n_purchases",
            F.sum("wrev").over(w).cast("double").alias("cum_revenue"),
            F.round(
                F.sum("wrev").over(w).cast("double") / F.col("n_users"), 4
            ).alias("ltv_per_user"),
        )
    )


@query(
    "q_funnel_windowed",
    oracle=f"""
    WITH v AS (
      SELECT user_id, MIN(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS c_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click'
        AND e.ts > v.v_ts AND e.ts <= v.v_ts + INTERVAL 1 DAY
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > c.c_ts AND e.ts <= c.c_ts + INTERVAL 1 DAY
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click_1d,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase_1d
    """,
)
def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel WITH a time constraint: click within 1 day of
    the first view, purchase within 1 day of that click — how funnels
    are actually measured (q_funnel's unconstrained ordering counts a
    purchase a month later as converted; product analytics don't). The
    1-day window is sized to this corpus's event density so every
    funnel stage carries real attrition at sf0.01 (150 → 60 → 25), not
    a vacuous zero.

    Same scale shape as q_funnel — K tiny per-user aggregates chained
    by equi-joins on user_id, the interval bound riding each join as a
    residual predicate — so adding the business constraint costs no new
    shuffle structure. Timestamps are integer-µs under the hood; the
    1-hour bound is exact arithmetic on both engines.
    """
    ev = table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(
            (F.col("ts") > F.col("v_ts"))
            & (F.col("ts") <= F.col("v_ts") + F.expr("INTERVAL 1 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(
            (F.col("ts") > F.col("c_ts"))
            & (F.col("ts") <= F.col("c_ts") + F.expr("INTERVAL 1 DAY"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_click_1d"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchase_1d"))
    return nv.crossJoin(F.broadcast(nc)).crossJoin(F.broadcast(np_))


_BACKTEST_SPLIT = "2024-01-16"  # train < split <= test (30-day window)


@query(
    "q_forecast_backtest",
    oracle=f"""
    WITH train AS (
      SELECT event_type, EXTRACT(hour FROM ts) AS hour,
             CAST(COUNT(*) AS BIGINT) AS n_train,
             SUM(CAST(value AS DECIMAL(30,8))) AS s_train
      FROM events WHERE CAST(ts AS DATE) < DATE '{_BACKTEST_SPLIT}'
        AND (value IS NULL OR isfinite(value))
      GROUP BY 1, 2
    ),
    test AS (
      SELECT event_type, EXTRACT(hour FROM ts) AS hour,
             CAST(COUNT(*) AS BIGINT) AS n_test,
             SUM(CAST(value AS DECIMAL(30,8))) AS s_test
      FROM events WHERE CAST(ts AS DATE) >= DATE '{_BACKTEST_SPLIT}'
        AND (value IS NULL OR isfinite(value))
      GROUP BY 1, 2
    )
    SELECT t.event_type,
           CAST(t.hour AS INT) AS hour,
           t.n_train, e.n_test,
           {o_det_round('CAST(t.s_train AS DOUBLE) / t.n_train', 4)} AS pred,
           {o_det_round('CAST(e.s_test AS DOUBLE) / e.n_test', 4)} AS actual,
           {o_det_round('abs(CAST(e.s_test AS DOUBLE) / e.n_test'
                        ' - CAST(t.s_train AS DOUBLE) / t.n_train)', 4)} AS abs_err,
           {o_det_round('abs(CAST(e.s_test AS DOUBLE) / e.n_test'
                        ' - CAST(t.s_train AS DOUBLE) / t.n_train)'
                        ' / (CAST(e.s_test AS DOUBLE) / e.n_test)', 4)} AS ape
    FROM train t JOIN test e
      ON t.event_type = e.event_type AND t.hour = e.hour
    """,
)
def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline forecast BACKTEST: the hour-of-day profile
    learned on the first half of the window predicts the second half,
    and the per-(event_type, hour) error table is the deliverable — the
    standard sanity baseline every forecasting effort must beat, run
    entirely as a lake query (temporal train/test split, profile fit,
    out-of-sample evaluation).

    Two filtered aggregations over the same scan (train and test
    profiles, both map-side combinable) joined on the tiny
    (type × 24-hour) profile key — no window, no per-row division:
    every reported number derives from one IEEE division of
    DECIMAL-exact sums, so both engines produce bit-identical errors.
    At 100 TB the profile tables stay |types|×24 regardless of data
    size; the split predicate prunes on the partition column when
    events are date-partitioned.
    """
    from ..common import finite

    # finite-or-NULL only (r9 nonfinite catalog): decimal-cast
    # divergence on NaN/Inf — corrupt observations are quarantined.
    e = table(spark, sf_dir, "events").where(
        F.col("value").isNull() | finite(F.col("value"))
    )
    split = F.lit(_BACKTEST_SPLIT).cast("date")
    base = e.select(
        "event_type",
        F.hour("ts").alias("hour"),
        F.col("value").cast("decimal(30,8)").alias("v"),
        (F.col("ts").cast("date") < split).alias("in_train"),
    )
    train = (
        base.where("in_train")
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).alias("n_train"), F.sum("v").alias("s_train"))
    )
    test = (
        base.where(~F.col("in_train"))
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).alias("n_test"), F.sum("v").alias("s_test"))
    )
    pred = F.col("s_train").cast("double") / F.col("n_train")
    actual = F.col("s_test").cast("double") / F.col("n_test")
    # det_round: an APE quotient landed a hair from a .xxxx5 boundary
    # at sf0.001 and the engines' native round() split HALF_UP vs
    # half-away-in-doubles — the floor form is tie-deterministic
    return train.join(test, ["event_type", "hour"]).select(
        "event_type",
        F.col("hour").cast("int").alias("hour"),
        "n_train",
        "n_test",
        det_round(pred, 4).alias("pred"),
        det_round(actual, 4).alias("actual"),
        det_round(F.abs(actual - pred), 4).alias("abs_err"),
        det_round(F.abs(actual - pred) / actual, 4).alias("ape"),
    )


@query(
    "q_activity_bitmap",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, EXTRACT(day FROM ts) AS d FROM events
    ),
    mask AS (
      SELECT user_id,
             CAST(bit_or(1::BIGINT << CAST(d - 1 AS INT)) AS BIGINT) AS day_mask,
             CAST(COUNT(*) AS BIGINT) AS n_active_days
      FROM days GROUP BY user_id
    ),
    islands AS (
      SELECT user_id, d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
      FROM days
    ),
    streak AS (
      SELECT user_id, CAST(MAX(run) AS BIGINT) AS longest_streak
      FROM (SELECT user_id, grp, COUNT(*) AS run FROM islands GROUP BY user_id, grp)
      GROUP BY user_id
    )
    SELECT m.user_id, m.day_mask, m.n_active_days, s.longest_streak
    FROM mask m JOIN streak s ON m.user_id = s.user_id
    """,
)
def q_activity_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity BITMAP over the month: bit i of one bigint =
    active on day i+1 — the roaring-bitmap-style encoding that turns
    retention/overlap questions into bitwise ANDs over fixed-size
    state (audience intersection at 100 TB is then a bit_and of two
    64-bit masks per user, not a join of day-level rows). Alongside:
    n_active_days straight from bit_count, and the longest consecutive
    streak via the classic gaps-and-islands formulation — two
    independent derivations whose CONSISTENCY (popcount ≥ streak, both
    from the same distinct-day set) doubles as a self-check.

    Shape: one distinct on (user, day) — the only data-sized shuffle —
    then a bit_or aggregate (map-side combinable into one long per
    user) and an islands window over ≤31 rows per user. The bitmap is
    the artifact you persist; the oracle re-derives both columns
    independently in DuckDB.
    """
    e = table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.dayofmonth("ts").alias("d")
    ).distinct()
    mask = days.groupBy("user_id").agg(
        F.bit_or(F.expr("shiftleft(1L, CAST(d - 1 AS INT))")).alias("day_mask"),
        F.count(F.lit(1)).alias("n_active_days"),
    )
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.select(
        "user_id", (F.col("d") - F.row_number().over(w)).alias("grp")
    )
    streak = (
        islands.groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("run"))
        .groupBy("user_id")
        .agg(F.max("run").cast("bigint").alias("longest_streak"))
    )
    return mask.join(streak, "user_id").select(
        "user_id", "day_mask", "n_active_days", "longest_streak"
    )


@query(
    "q_path_analysis",
    oracle="""
    WITH paths AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS path
      FROM events GROUP BY 1, 2
    )
    SELECT substr(path, 1, 3) AS prefix3,
           CAST(COUNT(*) AS BIGINT) AS n_paths,
           round(CAST(SUM(length(path)) AS DOUBLE) / COUNT(*), 4) AS avg_len,
           CAST(MAX(length(path)) AS BIGINT) AS max_len
    FROM paths
    GROUP BY 1
    """,
)
def q_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path analysis: each (user, day) becomes an ORDERED
    event-type string ("vcp…" = view, click, purchase…), rolled up by
    opening 3-step prefix — the "how do journeys start, and how long do
    they run" report that complements q_sequence_transitions' one-step
    Markov view with actual multi-step trajectories.

    Determinism is the whole trick: collect_list alone has no order
    contract under parallel merge, so the path is built by sorting an
    array of (ts, event_id, char) STRUCTS after collection — total
    order per path, bit-identical across partitionings and engines
    (the oracle states the same order via string_agg ... ORDER BY).
    Shape: one shuffle on (user, day) with per-group state bounded by
    events/user/day; the prefix rollup shuffles ≤|types|³ keys. At
    100 TB day-bounded paths keep group state small — unbounded
    lifetime paths would instead go through the sessionizer first.
    """
    e = table(spark, sf_dir, "events")
    seq = (
        e.select(
            "user_id",
            F.col("ts").cast("date").alias("day"),
            F.struct(
                F.col("ts").alias("t"),
                F.col("event_id").alias("eid"),
                F.substring("event_type", 1, 1).alias("c"),
            ).alias("s"),
        )
        .groupBy("user_id", "day")
        .agg(F.sort_array(F.collect_list("s")).alias("seq"))
        .select(
            F.concat_ws(
                "", F.transform("seq", lambda s: s.getField("c"))
            ).alias("path")
        )
    )
    return (
        seq.groupBy(F.substring("path", 1, 3).alias("prefix3"))
        .agg(
            F.count(F.lit(1)).alias("n_paths"),
            F.round(
                F.sum(F.length("path")).cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_len"),
            F.max(F.length("path")).cast("bigint").alias("max_len"),
        )
    )


@query(
    "q_lateness_audit",
    oracle="""
    WITH arr AS (
      SELECT user_id, ts, event_id,
             event_id + CASE WHEN event_id % 13 = 0 THEN 997 ELSE 0 END
               AS arrival_seq
      FROM events
    ),
    hwm AS (
      SELECT user_id, ts,
             MAX(ts) OVER (PARTITION BY user_id
                           ORDER BY arrival_seq, event_id
                           ROWS UNBOUNDED PRECEDING) AS high_water
      FROM arr
    ),
    late AS (
      SELECT epoch_us(high_water) - epoch_us(ts) AS lateness_us FROM hwm
    )
    SELECT CASE WHEN lateness_us = 0 THEN '0_in_order'
                WHEN lateness_us < 60000000 THEN '1_under_1m'
                WHEN lateness_us < 600000000 THEN '2_under_10m'
                WHEN lateness_us < 3600000000 THEN '3_under_1h'
                ELSE '4_over_1h' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(lateness_us) AS BIGINT) AS max_lateness_us
    FROM late
    GROUP BY 1
    """,
)
def q_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness audit — the measurement that SIZES a watermark:
    per user-stream, each event's lateness is the gap between the
    high-water-mark event time already seen (in arrival order) and its
    own event time; the bucketed distribution (in-order / <1m / <10m /
    <1h / worse) is what you read before choosing withWatermark's delay
    (too small drops the tail, too large holds state — SURVEY's
    streaming queries all assume a delay someone justified; this query
    is the justification).

    The synthetic events arrive perfectly ordered, so a deterministic
    delay is INJECTED (every 13th event arrives 997 sequence positions
    late — same injected-variant discipline as q_dedup_normalized) to
    make the audit's buckets non-vacuous; on real data arrival_seq is
    the ingest offset and the CASE disappears. Shape: one window per
    user-stream (running MAX with a (arrival, id) total-order
    tiebreak), then a 5-bucket rollup — integer microsecond arithmetic
    end to end, no floats anywhere.
    """
    e = table(spark, sf_dir, "events")
    arr = e.select(
        "user_id",
        "ts",
        "event_id",
        (
            F.col("event_id")
            + F.when(F.col("event_id") % 13 == 0, 997).otherwise(0)
        ).alias("arrival_seq"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("arrival_seq", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    late = arr.select(
        (
            F.unix_micros(F.max("ts").over(w)) - F.unix_micros("ts")
        ).alias("lateness_us")
    )
    bucket = (
        F.when(F.col("lateness_us") == 0, "0_in_order")
        .when(F.col("lateness_us") < 60_000_000, "1_under_1m")
        .when(F.col("lateness_us") < 600_000_000, "2_under_10m")
        .when(F.col("lateness_us") < 3_600_000_000, "3_under_1h")
        .otherwise("4_over_1h")
    )
    return late.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.max("lateness_us").cast("bigint").alias("max_lateness_us"),
    )


@query(
    "q_interval_coalesce",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS s_us,
             epoch_us(ts) + CAST(round(value * 60000000) AS BIGINT) AS e_us
      FROM events
      WHERE event_type = 'view' AND isfinite(value)
    ),
    flagged AS (
      SELECT user_id, s_us, e_us,
             CASE WHEN s_us > MAX(e_us) OVER (
                    PARTITION BY user_id ORDER BY s_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s_us, e_us,
             SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY s_us, e_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM flagged
    )
    SELECT user_id, CAST(island AS BIGINT) AS island,
           CAST(MIN(s_us) AS BIGINT) AS start_us,
           CAST(MAX(e_us) AS BIGINT) AS end_us,
           CAST(COUNT(*) AS BIGINT) AS n_merged
    FROM islands
    GROUP BY user_id, island
    """,
)
def q_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing (temporal-union): per user, overlapping or
    touching validity intervals merge into maximal disjoint spans — the
    temporal-data primitive behind "total covered time", entitlement
    windows, and meeting-room union, and the OVERLAP-based sibling of
    q_sessionize's gap-based islands (a session ends after silence; a
    span ends when coverage actually stops). Intervals here are view
    events extended by their value in minutes, in exact integer
    microseconds.

    Classic two-window formulation: a new span starts where the
    interval's start exceeds the running MAX of all previous ends
    (UNBOUNDED..1 PRECEDING — an interval swallowed by a long
    predecessor must not split the span); the island id is the running
    sum of those flags; spans reduce by one groupBy. Both windows
    partition by user and ride one shuffle; integer microsecond
    arithmetic keeps every comparison engine-exact. The first row per
    user flags 0 (empty preceding MAX is NULL, the > is false), so
    island ids start at 0 on both engines.
    """
    from ..common import finite

    # FINITE durations only (r9 nonfinite catalog): round(NaN)→bigint
    # is 0 in Spark but an error in DuckDB, and a NaN-duration interval
    # has no defined end. NULL durations also drop (an interval needs a
    # length) — finite() is already NULL-rejecting.
    e = table(spark, sf_dir, "events").where(
        (F.col("event_type") == "view") & finite(F.col("value"))
    )
    iv = e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s_us"),
        (
            F.unix_micros("ts")
            + F.round(F.col("value") * 60_000_000).cast("bigint")
        ).alias("e_us"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "s_us",
        "e_us",
        F.when(F.col("s_us") > F.max("e_us").over(w_prev), 1)
        .otherwise(0)
        .alias("new_island"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "e_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.select(
        "user_id",
        "s_us",
        "e_us",
        F.sum("new_island").over(w_run).alias("island"),
    )
    return islands.groupBy("user_id", F.col("island").cast("bigint").alias("island")).agg(
        F.min("s_us").cast("bigint").alias("start_us"),
        F.max("e_us").cast("bigint").alias("end_us"),
        F.count(F.lit(1)).alias("n_merged"),
    )


_BOT_MAX_EVENTS = 80  # total-volume bot threshold for the composed pipeline
_SESS_GAP_US = 1800 * 1_000_000


@query(
    "q_events_pipeline",
    oracle=f"""
    WITH vol AS (
      SELECT user_id, COUNT(*) AS c FROM events
      WHERE ts IS NOT NULL GROUP BY user_id
    ),
    keep AS (SELECT user_id FROM vol WHERE c <= {_BOT_MAX_EVENTS}),
    e AS (
      SELECT ev.user_id, ev.event_id, ev.event_type, epoch_us(ev.ts) AS us,
             CAST(ev.ts AS DATE) AS d
      FROM events ev JOIN keep k ON ev.user_id = k.user_id
      WHERE ev.ts IS NOT NULL
    ),
    cohort AS (
      SELECT user_id,
             strftime(date_trunc('week', MIN(d)), '%Y-%m-%d') AS cohort_week
      FROM e GROUP BY user_id
    ),
    flagged AS (
      SELECT user_id, us, event_type,
             CASE WHEN LAG(us) OVER w IS NULL
                       OR us - LAG(us) OVER w > {_SESS_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    sess AS (
      SELECT user_id, us, event_type,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, is_new DESC
                               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    ),
    sstats AS (
      SELECT user_id, session_seq,
             COUNT(*) AS n_events,
             MAX(us) - MIN(us) AS duration_us,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS has_purchase
      FROM sess GROUP BY user_id, session_seq
    )
    SELECT c.cohort_week,
           CAST(COUNT(DISTINCT s.user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           round(CAST(SUM(s.n_events) AS DOUBLE) / COUNT(*), 4)
             AS avg_events_per_session,
           round(CAST(SUM(s.duration_us) AS DOUBLE) / COUNT(*) / 60000000.0, 4)
             AS avg_session_minutes,
           round(CAST(SUM(s.has_purchase) AS DOUBLE) / COUNT(*), 4)
             AS purchase_session_rate
    FROM sstats s JOIN cohort c ON s.user_id = c.user_id
    GROUP BY c.cohort_week
    """,
)
def q_events_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed EVENTS flagship — q_corpus_pipeline's sibling for
    clickstream data, the end-to-end run a product-analytics user ships
    as ONE declarative plan: bot filter (total-volume cap) →
    sessionization (30-min gaps) → per-session stats → signup-cohort
    attribution → per-cohort-week report (users, sessions,
    events/session, session minutes, purchase-session rate).

    Composing the registered standalone stages in one plan lets
    Catalyst optimize ACROSS them: the bot semi-join pushes below the
    session windows, the cohort aggregate reuses the user_id
    partitioning the sessionizer already shuffled to, and the final
    rollup is metadata-sized. Integer-microsecond gap arithmetic and
    int-ratio divisions keep every reported number engine-exact (the
    q_sessionize determinism analysis applies stage-for-stage).
    """
    # ts IS NOT NULL (both sides): untimed events can't sessionize or
    # cohort — NULL us sort position differs cross-engine (nullts).
    ev = table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    vol = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    keep = vol.where(F.col("c") <= _BOT_MAX_EVENTS).select("user_id")
    e = ev.join(keep, "user_id").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.col("ts").cast("date").alias("d"),
    )
    cohort = e.groupBy("user_id").agg(
        F.date_format(F.date_trunc("week", F.min("d")).cast("date"), "yyyy-MM-dd").alias(
            "cohort_week"
        )
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = e.select(
        "user_id",
        "us",
        "event_type",
        F.when(
            F.lag("us").over(w).isNull()
            | (F.col("us") - F.lag("us").over(w) > _SESS_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    w2 = (
        Window.partitionBy("user_id")
        .orderBy(F.col("us").asc(), F.col("is_new").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = flagged.select(
        "user_id",
        "us",
        "event_type",
        F.sum("is_new").over(w2).alias("session_seq"),
    )
    sstats = sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("us") - F.min("us")).alias("duration_us"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("has_purchase"),
    )
    return (
        sstats.join(cohort, "user_id")
        .groupBy("cohort_week")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(
                F.sum("n_events").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_events_per_session"),
            F.round(
                F.sum("duration_us").cast("double") / F.count(F.lit(1)) / 60_000_000.0,
                4,
            ).alias("avg_session_minutes"),
            F.round(
                F.sum("has_purchase").cast("double") / F.count(F.lit(1)), 4
            ).alias("purchase_session_rate"),
        )
    )


# --- clamped running balance (non-associative stateful scan) -----------

# delta in integer CENTS: floor(v*100 + 0.5) is the one double→int
# conversion Spark and DuckDB define identically (bare CAST truncates in
# Spark, rounds in DuckDB). 5000 cents of drain per event makes deltas
# mixed-sign (values average ~4963 cents).
_BAL_DELTA = "CAST(floor(value * 100 + 0.5) AS BIGINT) - 5000"


@query(
    "q_clamped_balance",
    oracle=f"""
    WITH RECURSIVE ev AS (
      SELECT user_id, {_BAL_DELTA} AS delta,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      FROM events
      WHERE isfinite(value)  -- same no-signal drop as the kernel
    ),
    walk AS (
      SELECT user_id, 1 AS rn,
             GREATEST(delta, 0) AS bal,
             CASE WHEN delta < 0 THEN 1 ELSE 0 END AS clamps,
             GREATEST(delta, 0) AS maxbal
      FROM ev WHERE rn = 1
      UNION ALL
      SELECT w.user_id, w.rn + 1,
             GREATEST(w.bal + e.delta, 0),
             w.clamps + CASE WHEN w.bal + e.delta < 0 THEN 1 ELSE 0 END,
             GREATEST(w.maxbal, GREATEST(w.bal + e.delta, 0))
      FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.rn = w.rn + 1
    )
    SELECT w.user_id,
           CAST(bal AS BIGINT) AS final_cents,
           CAST(maxbal AS BIGINT) AS max_cents,
           CAST(clamps AS BIGINT) AS n_clamps
    FROM walk w
    JOIN (SELECT user_id, MAX(rn) AS mx FROM ev GROUP BY user_id) last
      ON last.user_id = w.user_id AND last.mx = w.rn
    ORDER BY w.user_id
    """,
)
def q_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-clamped running balance per user — the canonical
    NON-associative scan (b_i = max(0, b_{i-1} + delta_i)): no window
    frame or aggregate expresses it, the textbook case for a custom
    stateful kernel.

    Spark side: ONE hash shuffle on user_id (the same exchange
    groupBy().applyInPandas would plan), but the kernel runs per
    PARTITION via mapInPandas, not per group — with ~100-event users
    the per-group Arrow/pandas crossing dominates an applyInPandas
    formulation (measured 8.4 s → ~1 s at sf0.1; ~50 groups amortize
    each Python call here). Inside the kernel the scan is CLOSED-FORM
    vectorized across ALL groups at once — b = S - min(0,
    running_min(S)) over per-group cumsums (the reflection identity) —
    zero Python-level row iteration. Integer cents end-to-end: the
    kernel is exact, which is what lets a recursive-CTE oracle
    hash-match it.

    At 100 TB: per-user history is the unit of work (bounded here at
    ~100 events; real ledgers partition by (user, epoch) to bound it),
    partitions process independently, Arrow moves the batches.
    """
    import numpy as np
    import pandas as pd

    ev = (
        table(spark, sf_dir, "events")
        # A NULL or NON-FINITE value row carries no balance information:
        # drop it before the kernel (NaN would poison the int64 cumsums
        # — Spark's floor(NaN)→bigint is a fake 0-cent delta, r9
        # nonfinite catalog find). finite() rejects NULL too.
        .where(_finite(F.col("value")))
        .select("user_id", "event_id", F.expr(_BAL_DELTA).alias("delta"))
    )

    def kernel(batches):
        # One pandas frame per partition: the iterator spans the whole
        # partition, and repartition(user_id) guarantees group locality.
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs).sort_values(["user_id", "event_id"])
        uid = pdf["user_id"].to_numpy()
        d = pdf["delta"].astype("int64")
        s = d.groupby(uid).cumsum()
        floor_ = np.minimum(s.groupby(uid).cummin().to_numpy(), 0)
        b = s.to_numpy() - floor_  # reflection identity, all groups at once
        prev = pd.Series(b).groupby(uid).shift(1, fill_value=0).to_numpy()
        clamp_flag = pd.Series((prev + d.to_numpy() < 0).astype("int64"))
        grouped_b = pd.Series(b).groupby(uid)
        yield pd.DataFrame(
            {
                "user_id": grouped_b.max().index.astype("int64"),
                "final_cents": grouped_b.last().to_numpy(),
                "max_cents": grouped_b.max().to_numpy(),
                "n_clamps": clamp_flag.groupby(uid).sum().to_numpy(),
            }
        )

    out_schema = (
        "user_id bigint, final_cents bigint, max_cents bigint, n_clamps bigint"
    )
    return (
        ev.repartition(F.col("user_id"))
        .mapInPandas(kernel, schema=out_schema)
        .orderBy("user_id")
    )


# --- fixed-point EWMA (sequential recurrence) --------------------------

_EWMA_X = "CAST(floor(value * 100 + 0.5) AS BIGINT)"  # cents, engine-identical


@query(
    "q_ewma_smooth",
    oracle=f"""
    WITH RECURSIVE ev AS (
      SELECT user_id, {_EWMA_X} AS x,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      FROM events
      WHERE isfinite(value)  -- same no-signal drop as the kernel
    ),
    walk AS (
      SELECT user_id, 1 AS rn, x AS ew, x AS mx FROM ev WHERE rn = 1
      UNION ALL
      SELECT w.user_id, w.rn + 1,
             (9 * w.ew + e.x) // 10,
             GREATEST(w.mx, (9 * w.ew + e.x) // 10)
      FROM walk w JOIN ev e ON e.user_id = w.user_id AND e.rn = w.rn + 1
    )
    SELECT w.user_id,
           CAST(w.rn AS BIGINT) AS n_events,
           CAST(ew AS BIGINT) AS final_ewma_cents,
           CAST(mx AS BIGINT) AS max_ewma_cents
    FROM walk w
    JOIN (SELECT user_id, MAX(rn) AS mx_rn FROM ev GROUP BY user_id) last
      ON last.user_id = w.user_id AND last.mx_rn = w.rn
    ORDER BY w.user_id
    """,
)
def q_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point EWMA (α=0.1) per user event stream: ew_i =
    (9·ew_{i-1} + x_i) div 10 over integer cents.

    Float EWMA can never exact-match across engines (each step rounds
    differently); the truncating integer recurrence is bit-deterministic
    and stays within half a cent of the real thing — the same
    fixed-point discipline as q_pagerank. The recurrence truncates at
    EVERY step, so unlike q_clamped_balance there is no vectorizable
    closed form: the per-user loop is the irreducible core. It runs
    inside a per-PARTITION mapInPandas kernel (one hash shuffle on
    user_id — the exchange applyInPandas would plan anyway — but ~50
    groups amortize each Python/Arrow crossing; measured 7.8 s → ~1 s
    at sf0.1 vs the per-group applyInPandas formulation).
    """
    import pandas as pd

    ev = (
        table(spark, sf_dir, "events")
        # NULL/non-finite observations carry no signal: drop them before
        # the kernel (same discipline and rationale as q_clamped_balance).
        .where(_finite(F.col("value")))
        .select("user_id", "event_id", F.expr(_EWMA_X).alias("x"))
    )

    def kernel(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs).sort_values(["user_id", "event_id"])
        out = {"user_id": [], "n_events": [], "final_ewma_cents": [], "max_ewma_cents": []}
        for uid, grp in pdf.groupby("user_id", sort=True):
            xs = grp["x"].tolist()
            ew = xs[0]
            mx = ew
            for x in xs[1:]:
                ew = (9 * ew + x) // 10
                if ew > mx:
                    mx = ew
            out["user_id"].append(int(uid))
            out["n_events"].append(len(xs))
            out["final_ewma_cents"].append(int(ew))
            out["max_ewma_cents"].append(int(mx))
        yield pd.DataFrame(out)

    schema = (
        "user_id bigint, n_events bigint, final_ewma_cents bigint,"
        " max_ewma_cents bigint"
    )
    return (
        ev.repartition(F.col("user_id"))
        .mapInPandas(kernel, schema=schema)
        .orderBy("user_id")
    )


# --- day-of-week seasonality index -------------------------------------

# Monday=0 weekday from epoch days: 1970-01-01 was a Thursday, so
# wd = (epoch_day + 3) % 7 — pure integer arithmetic, no engine
# dayofweek() convention mismatch (Spark: 1=Sunday; DuckDB: 0=Sunday).
_EPOCH_DAY_DUCK = "datediff('day', DATE '1970-01-01', CAST(ts AS DATE))"


@query(
    "q_seasonality_dow",
    oracle=f"""
    WITH daily AS (
      SELECT {_EPOCH_DAY_DUCK} AS d,
             ({_EPOCH_DAY_DUCK} + 3) % 7 AS dow,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST(SUM(n) AS DOUBLE) / COUNT(*) AS grand_mean FROM daily
    )
    SELECT CAST(dow AS INT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(n) AS BIGINT) AS n_events,
           round((CAST(SUM(n) AS DOUBLE) / COUNT(*)) / grand_mean, 6)
             AS seasonal_index
    FROM daily, tot
    GROUP BY dow, grand_mean
    ORDER BY dow
    """,
)
def q_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index of event volume: mean daily count per
    weekday over the grand daily mean (1.0 = no weekly seasonality) —
    the multiplicative-decomposition component a forecasting pipeline
    extracts first.

    The weekday derives from integer epoch-day arithmetic, sidestepping
    the engines' incompatible dayofweek() conventions. Data-sized work
    is one (day, count) aggregation; the index computes over the
    ≤|days| table with integer sums and two final divisions.
    """
    ev = table(spark, sf_dir, "events")
    daily = (
        ev.select(F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("dow", (F.col("d") + 3) % 7)
    )
    tot = daily.agg(
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("grand_mean")
    )
    return (
        daily.crossJoin(F.broadcast(tot))
        .groupBy("dow", "grand_mean")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("n").cast("bigint").alias("n_events"),
        )
        .select(
            F.col("dow").cast("int").alias("dow"),
            "n_days",
            "n_events",
            F.round(
                (F.col("n_events").cast("double") / F.col("n_days"))
                / F.col("grand_mean"),
                6,
            ).alias("seasonal_index"),
        )
        .orderBy("dow")
    )


@query(
    "q_user_growth",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id
    ),
    daily AS (
      SELECT first_day AS day, COUNT(*) AS new_users
      FROM firsts GROUP BY first_day
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(
               (SELECT CAST(MIN(ts) AS DATE) FROM events),
               (SELECT CAST(MAX(ts) AS DATE) FROM events),
               INTERVAL 1 DAY)) AS DATE) AS day
    )
    SELECT strftime(s.day, '%Y-%m-%d') AS day,
           CAST(COALESCE(d.new_users, 0) AS BIGINT) AS new_users,
           CAST(SUM(COALESCE(d.new_users, 0)) OVER (
             ORDER BY s.day ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS cumulative_users
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    """,
)
def q_user_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-base growth curve: per calendar day, how many users had
    their FIRST event that day and the cumulative total — the topmost
    chart on any product dashboard, and the denominator feed for
    retention/LTV normalization.

    Scale split: the corpus-sized pass is one MIN-per-user aggregate
    (map-side partial); everything downstream — daily counts, the
    generated date spine, the running sum — runs on day-bounded tables,
    so the single-partition cumulative window is over O(days) rows, not
    events (the same bounded-window discipline as q_date_spine and the
    Kaplan-Meier life table).
    """
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    daily = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    rng = e.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    spine = rng.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    nu = F.coalesce("new_users", F.lit(0))
    return spine.join(daily, "day", "left").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        nu.cast("bigint").alias("new_users"),
        F.sum(nu).over(w).cast("bigint").alias("cumulative_users"),
    )


@query(
    "q_new_vs_returning",
    oracle="""
    WITH per_day AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    firsts AS (
      SELECT user_id, MIN(day) AS first_day FROM per_day GROUP BY user_id
    )
    SELECT strftime(p.day, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS active_users,
           CAST(COUNT(*) FILTER (WHERE p.day = f.first_day) AS BIGINT) AS new_users,
           CAST(COUNT(*) FILTER (WHERE p.day > f.first_day) AS BIGINT)
             AS returning_users
    FROM per_day p JOIN firsts f USING (user_id)
    GROUP BY p.day
    ORDER BY day
    """,
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily actives split into NEW vs RETURNING — the second chart on
    every product dashboard (q_user_growth's companion): stickiness is
    returning/active, acquisition health is the new-user line, and
    new + returning = active is the built-in audit the oracle's hash
    match certifies row by row.

    Shape: one (user, day) distinct collapse (map-side partial), one
    MIN-per-user over THAT (already day-granular, far smaller than
    events), broadcast-or-shuffle join back, day-bounded aggregate. No
    window at all — first_day comparison beats a running MIN window
    because it shuffles the (user, day) table once instead of sorting
    per user.
    """
    e = table(spark, sf_dir, "events")
    per_day = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    firsts = per_day.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        per_day.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("active_users"),
            F.count_if(F.col("day") == F.col("first_day")).alias("new_users"),
            F.count_if(F.col("day") > F.col("first_day")).alias("returning_users"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("active_users").cast("bigint").alias("active_users"),
            F.col("new_users").cast("bigint").alias("new_users"),
            F.col("returning_users").cast("bigint").alias("returning_users"),
        )
        .orderBy("day")
    )


@query(
    "q_session_bounce",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    ),
    per_session AS (
      SELECT user_id, session_id,
             CAST(MIN(ts) AS DATE) AS day,
             COUNT(*) AS n_events
      FROM sess GROUP BY user_id, session_id
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) FILTER (WHERE n_events = 1) AS BIGINT) AS n_bounces,
           round(CAST(COUNT(*) FILTER (WHERE n_events = 1) AS DOUBLE)
                 / COUNT(*), 6) AS bounce_rate
    FROM per_session
    GROUP BY day
    ORDER BY day
    """,
)
def q_session_bounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of sessions (30-min inactivity gap)
    containing exactly ONE event — the engagement red flag every web
    dashboard tracks beside actives. Sessions attribute to the day they
    START (a midnight-straddling session counts once).

    Reuses the gap-and-islands sessionization (lag + running sum, one
    user shuffle); sessions then reduce to a day-bounded aggregate. The
    rate is ONE double division + 6-dp round over exact integer counts
    — engine-identical.
    """
    # ts IS NOT NULL (both sides): untimed events can't sessionize —
    # their NULL sort position differs cross-engine (nullts catalog).
    e = table(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                >= 1_800_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    # event_id tie-break matches the lag window above: with duplicate
    # (user_id, ts) rows a ts-only ROWS frame is order-nondeterministic
    # (ADVICE r4) — the running sum must replay the exact lag order.
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = marked.select(
        "user_id", "ts", F.sum("new_session").over(w_run).alias("session_id")
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").cast("date").alias("day"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bounces = F.count_if(F.col("n_events") == 1)
    return (
        per_session.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            bounces.alias("n_bounces"),
            F.round(
                bounces.cast("double") / F.count(F.lit(1)), 6
            ).alias("bounce_rate"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n_sessions").cast("bigint").alias("n_sessions"),
            F.col("n_bounces").cast("bigint").alias("n_bounces"),
            "bounce_rate",
        )
        .orderBy("day")
    )


@query(
    "q_time_to_first_purchase",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(epoch_us(ts)) AS first_us,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               AS first_buy_us
      FROM events GROUP BY user_id
    ),
    conv AS (
      SELECT (first_buy_us - first_us) // 3600000000 AS hours_to_buy
      FROM firsts WHERE first_buy_us IS NOT NULL
    )
    SELECT CAST(hours_to_buy AS BIGINT) AS hours_to_buy,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM conv
    GROUP BY hours_to_buy
    ORDER BY hours_to_buy
    """,
)
def q_time_to_first_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activation latency distribution: per converting user, whole
    hours between their FIRST event ever and their FIRST purchase,
    histogrammed — the onboarding-funnel speed metric growth teams
    optimize ("how long until value?"). Hour 0 = converted within the
    first hour; users who never purchase are excluded (their latency is
    right-censored — q_kaplan_meier is the estimator that uses them).

    One conditional MIN-pair aggregate per user (map-side partial; no
    window, no join), then an hour-bounded histogram. Integer
    microsecond floor-division keeps every bucket engine-exact.
    """
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("first_us"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("first_buy_us"),
    )
    return (
        firsts.where(F.col("first_buy_us").isNotNull())
        .select(
            F.expr(
                "CAST((first_buy_us - first_us) div 3600000000 AS BIGINT)"
            ).alias("hours_to_buy")
        )
        .groupBy("hours_to_buy")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("hours_to_buy")
    )


@query(
    "q_repeat_purchase",
    oracle="""
    WITH buyers AS (
      SELECT user_id, COUNT(*) AS n_buys
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_buyers,
           CAST(COUNT(*) FILTER (WHERE n_buys >= 2) AS BIGINT)
             AS n_repeat,
           CAST(SUM(n_buys) AS BIGINT) AS n_purchases,
           round(CAST(COUNT(*) FILTER (WHERE n_buys >= 2) AS DOUBLE)
                 / COUNT(*), 6) AS repeat_rate,
           round(CAST(SUM(n_buys) AS DOUBLE) / COUNT(*), 6)
             AS purchases_per_buyer
    FROM buyers
    """,
)
def q_repeat_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase economics in one row: how many buyers come back
    (repeat_rate — THE retention number unit economics hang on) and
    purchase frequency per buyer. Two stacked aggregates — per-user
    purchase counts (map-side partial over the filtered scan), then one
    global reduce; ratios are single double divisions + 6-dp round over
    exact counts.
    """
    e = table(spark, sf_dir, "events")
    buyers = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_buys"))
    )
    repeat = F.count_if(F.col("n_buys") >= 2)
    return buyers.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buyers"),
        repeat.cast("bigint").alias("n_repeat"),
        F.sum("n_buys").cast("bigint").alias("n_purchases"),
        F.round(repeat.cast("double") / F.count(F.lit(1)), 6).alias("repeat_rate"),
        F.round(
            F.sum("n_buys").cast("double") / F.count(F.lit(1)), 6
        ).alias("purchases_per_buyer"),
    )


@query(
    "q_hour_heatmap",
    oracle="""
    SELECT CAST(isodow(ts) AS INT) AS dow,
           CAST(hour(ts) AS INT) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1, 2
    ORDER BY dow, hour
    """,
)
def q_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity heatmap (events + distinct users per
    cell) — the capacity-planning and send-time-optimization staple;
    q_seasonality_dow's finer-grained sibling. ISO day numbering
    (Mon=1..Sun=7) on both engines: Spark's dayofweek is Sun=1, so the
    engine derives ISO via (dayofweek+5)%7+1 — the convention mismatch
    this oracle pins down. One map-side-combined aggregate bounded by
    the 168-cell grid.
    """
    e = table(spark, sf_dir, "events")
    iso_dow = ((F.dayofweek("ts") + 5) % 7 + 1).cast("int")
    return (
        e.groupBy(iso_dow.alias("dow"), F.hour("ts").cast("int").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy("dow", "hour")
    )


@query(
    "q_max_drawdown",
    oracle=f"""
    WITH run AS (
      SELECT user_id, event_id,
             SUM({_BAL_DELTA}) OVER (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
      FROM events
      WHERE isfinite(value)
    ),
    walk AS (
      SELECT user_id, running,
             MAX(running) OVER (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM run
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(peak) AS BIGINT) AS peak_cents,
           CAST(MAX(peak - running) AS BIGINT) AS max_drawdown_cents
    FROM walk
    GROUP BY user_id
    """,
)
def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user ledger: peak-to-trough drop of the
    running balance — q_clamped_balance's WINDOW-EXPRESSIBLE sibling
    (drawdown is a running max over a running sum, associative at every
    step, so no custom kernel is needed; the clamp in q_clamped_balance
    is what forces one there).

    Integer cents end-to-end (the _BAL_DELTA half-up conversion both
    engines define identically), so running/peak/drawdown are exact and
    the oracle hash-matches with no rounding anywhere. One shuffle on
    user_id; both window passes share the same sort. At 100 TB per-user
    history is the bounded unit of work, same as the balance kernel.
    """
    # finite only (r9 nonfinite catalog): Spark's floor(NaN)→bigint is
    # a fake 0-cent delta; finite() rejects NULL too (no-signal drop).
    ev = (
        table(spark, sf_dir, "events")
        .where(_finite(F.col("value")))
        .select("user_id", "event_id", F.expr(_BAL_DELTA).alias("delta"))
    )
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    walk = ev.select(
        "user_id",
        "event_id",
        F.sum("delta").over(w).alias("running"),
    ).select(
        "user_id",
        "running",
        F.max("running").over(w).alias("peak"),
    )
    return walk.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max("peak").cast("bigint").alias("peak_cents"),
        F.max(F.col("peak") - F.col("running")).cast("bigint").alias(
            "max_drawdown_cents"
        ),
    )


@query(
    "q_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
             SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS rev
      FROM orders
      WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
      GROUP BY 1
    ),
    trended AS (
      SELECT d, (d + 3) % 7 AS dow, rev,
             SUM(rev) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS trend_sum,
             COUNT(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS wcnt
      FROM daily
    )
    SELECT CAST(dow AS INT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           floor(CAST(SUM(rev) AS DOUBLE) / COUNT(*) * 1e4 + 0.5) / 1e4
             AS mean_daily_rev,
           floor((CAST(SUM(rev) AS DOUBLE) / COUNT(*)
                  - CAST(SUM(trend_sum) AS DOUBLE) / (7.0 * COUNT(*)))
                 * 1e4 + 0.5) / 1e4
             AS seasonal_additive
    FROM trended
    WHERE wcnt = 7
    GROUP BY dow
    """,
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of daily revenue:
    centered 7-row moving-average trend, per-weekday additive seasonal
    component avg(value - trend) over the interior days (full 7-day
    windows only) — q_seasonality_dow's detrended sibling (that one is
    multiplicative on raw counts; a drifting level leaks into its
    index, not into this one).

    Determinism: the daily series keeps EXACT decimal sums through the
    window (the trend window sums decimals, never doubles), and the
    per-dow seasonal recombines as avg(rev) - avg(trend_sum)/7 — two
    decimal-exact sums and one fixed double expression, so no
    row-order float accumulation exists anywhere. Scale: one hash agg
    collapses the fact table to the calendar-bounded daily series; the
    global trend window orders ~|days| rows (metadata-scale, the
    q_ntile_global rule), partition-safe behind the aggregate.
    """
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").isNotNull() & F.col("o_totalprice").isNotNull()
    )
    daily = (
        o.select(
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias("d"),
            F.col("o_totalprice"),
        )
        .groupBy("d")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("rev"))
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    trended = daily.select(
        ((F.col("d") + 3) % 7).alias("dow"),
        "rev",
        F.sum("rev").over(w7).alias("trend_sum"),
        F.count(F.lit(1)).over(w7).alias("wcnt"),
    ).where(F.col("wcnt") == 7)
    n = F.count(F.lit(1))
    return trended.groupBy(F.col("dow").cast("int").alias("dow")).agg(
        n.cast("bigint").alias("n_days"),
        det_round(F.sum("rev").cast("double") / n, 4).alias("mean_daily_rev"),
        det_round(
            F.sum("rev").cast("double") / n
            - F.sum("trend_sum").cast("double") / (F.lit(7.0) * n),
            4,
        ).alias("seasonal_additive"),
    )


#: Holt smoothing constants — part of the query contract; both engines
#: parse the identical double literals, and every recursion step is the
#: same fixed IEEE expression tree, so the walks agree bit-for-bit.
_HOLT_ALPHA, _HOLT_BETA = 0.2, 0.1


@query(
    "q_holt_linear",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT event_type,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn,
             CAST(n AS DOUBLE) AS y
      FROM (
        SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS n
        FROM events
        WHERE ts IS NOT NULL AND event_type IS NOT NULL
        GROUP BY 1, 2
      )
    ),
    sizes AS (
      SELECT event_type, MAX(rn) AS n_days FROM daily GROUP BY event_type
    ),
    walk AS (
      SELECT d1.event_type, 1 AS rn, d1.y AS l, d2.y - d1.y AS b
      FROM daily d1 JOIN daily d2
        ON d2.event_type = d1.event_type AND d1.rn = 1 AND d2.rn = 2
      UNION ALL
      SELECT w.event_type, w.rn + 1,
             {_HOLT_ALPHA} * d.y + {1 - _HOLT_ALPHA} * (w.l + w.b),
             {_HOLT_BETA} * (({_HOLT_ALPHA} * d.y + {1 - _HOLT_ALPHA} * (w.l + w.b)) - w.l)
               + {1 - _HOLT_BETA} * w.b
      FROM walk w JOIN daily d
        ON d.event_type = w.event_type AND d.rn = w.rn + 1
    )
    SELECT w.event_type,
           CAST(s.n_days AS BIGINT) AS n_days,
           floor(w.l * 1e6 + 0.5) / 1e6 AS level,
           floor(w.b * 1e6 + 0.5) / 1e6 AS trend,
           floor((w.l + w.b) * 1e6 + 0.5) / 1e6 AS forecast_1
    FROM walk w
    JOIN sizes s ON s.event_type = w.event_type AND s.n_days = w.rn
    """,
)
def q_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + trend) of the daily
    event-count series per event type, returning the final state and
    the one-step-ahead forecast — the canonical COUPLED non-associative
    recursion (l_t depends on b_{t-1} and vice versa): no window frame
    expresses it, so like q_clamped_balance it runs as a custom Python
    kernel, and the DuckDB twin re-derives it with a recursive CTE —
    a fully INDEPENDENT oracle, not a staged pin.

    Initialization contract: l_1 = y_1, b_1 = y_2 − y_1 (series with
    <2 points are dropped); α=0.2, β=0.1 are double literals both
    engines parse identically, and each step is the same fixed IEEE
    expression tree, so the two walks agree bit-for-bit (6-dp rounding
    is belt-and-braces, not load-bearing).

    Scale: the DATA-scale pass is the (event_type, day) hash agg; the
    kernel walks the CALENDAR-BOUNDED aggregated series per group via
    applyInPandas (groups = event types; a real deployment keys the
    series table by (metric, grain) — per-group state never exceeds
    |days|). Unlike q_clamped_balance's per-user mapInPandas (50
    groups × 100 rows, crossing-dominated), here groups are few and
    long, exactly where applyInPandas is the right shape.
    """
    import pandas as pd

    ev = table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d")
        y = pdf["y"].to_numpy()
        if len(y) < 2:
            return pd.DataFrame(
                columns=["event_type", "n_days", "level", "trend", "forecast_1"]
            ).astype(
                {
                    "event_type": "object",
                    "n_days": "int64",
                    "level": "float64",
                    "trend": "float64",
                    "forecast_1": "float64",
                }
            )
        lvl, trd = y[0], y[1] - y[0]
        for t in range(1, len(y)):
            new_l = _HOLT_ALPHA * y[t] + (1 - _HOLT_ALPHA) * (lvl + trd)
            trd = _HOLT_BETA * (new_l - lvl) + (1 - _HOLT_BETA) * trd
            lvl = new_l
        import math

        r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_days": [len(y)],
                "level": [r6(lvl)],
                "trend": [r6(trd)],
                "forecast_1": [r6(lvl + trd)],
            }
        )

    return daily.groupBy("event_type").applyInPandas(
        holt,
        "event_type string, n_days bigint, level double, trend double,"
        " forecast_1 double",
    )


@query(
    "q_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    islands AS (
      SELECT user_id, d,
             d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
      FROM days
    ),
    streaks AS (
      SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
      FROM islands GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS longest_streak
    FROM streaks
    GROUP BY user_id
    """,
)
def q_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user — the classic
    gaps-and-islands rewrite (island key = day − row_number over the
    user's day sequence): engagement/retention's favorite feature and
    the canonical proof that "consecutive runs" need no self-join or
    iteration.

    One distinct-projection hash agg bounds the data to (user, day);
    the island window partitions by user (spillable, no funnel), and
    everything is integer arithmetic — exact oracle, no rounding.
    NULL users/timestamps carry no streak information and are dropped
    (the hostile-catalog convention).
    """
    ev = table(spark, sf_dir, "events").where(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    days = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.select(
        "user_id", "d", (F.col("d") - F.row_number().over(w)).alias("grp")
    )
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("len").cast("bigint").alias("n_active_days"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.max("len").cast("bigint").alias("longest_streak"),
    )


@query(
    "q_top_movers",
    oracle="""
    WITH monthly AS (
      SELECT l_suppkey,
             CAST(EXTRACT(year FROM l_shipdate) * 100
                  + EXTRACT(month FROM l_shipdate) AS INT) AS ym,
             SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS rev
      FROM lineitem
      WHERE l_shipdate IS NOT NULL AND l_extendedprice IS NOT NULL
      GROUP BY 1, 2
    ),
    deltas AS (
      SELECT l_suppkey, ym, rev,
             LAG(rev) OVER (PARTITION BY l_suppkey ORDER BY ym) AS prev
      FROM monthly
    )
    SELECT l_suppkey, ym,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(prev AS DOUBLE) AS prev_revenue,
           CAST(rev - prev AS DOUBLE) AS delta,
           floor(CAST(rev - prev AS DOUBLE) / CAST(prev AS DOUBLE) * 1e6 + 0.5)
             / 1e6 AS pct_change
    FROM deltas
    WHERE prev IS NOT NULL AND prev > 0
    ORDER BY abs(CAST(rev - prev AS DOUBLE)) DESC, l_suppkey, ym
    LIMIT 10
    """,
)
def q_top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 month-over-month revenue movers across suppliers — the
    'what changed most?' report every metrics stack runs first
    (q_period_growth's per-entity refinement: that one tracks the
    global series, this one ranks entities by |Δ|).

    The data-scale pass is one (supplier, month) decimal aggregation;
    the lag window partitions by supplier over the calendar-bounded
    monthly frame, and the final cut is TakeOrderedAndProject on
    (|Δ| DESC, supplier, month) — a total order, so the top-10 is
    deterministic. Δ is an exact decimal difference; only pct_change
    divides (6-dp floor-rounded). Zero/absent prior months are
    excluded (a mover needs a base).
    """
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").isNotNull() & F.col("l_extendedprice").isNotNull()
    )
    monthly = li.groupBy(
        "l_suppkey",
        (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
        .cast("int")
        .alias("ym"),
    ).agg(F.sum(F.col("l_extendedprice").cast(DEC)).alias("rev"))
    w = Window.partitionBy("l_suppkey").orderBy("ym")
    deltas = monthly.select(
        "l_suppkey", "ym", "rev", F.lag("rev").over(w).alias("prev")
    ).where(F.col("prev").isNotNull() & (F.col("prev") > 0))
    delta = (F.col("rev") - F.col("prev")).cast("double")
    return (
        deltas.select(
            "l_suppkey",
            "ym",
            F.col("rev").cast("double").alias("revenue"),
            F.col("prev").cast("double").alias("prev_revenue"),
            delta.alias("delta"),
            det_round(delta / F.col("prev").cast("double"), 6).alias(
                "pct_change"
            ),
        )
        .orderBy(F.abs(F.col("delta")).desc(), "l_suppkey", "ym")
        .limit(10)
    )


@query(
    "q_user_entropy",
    oracle="""
    WITH cells AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT user_id, SUM(n) AS ntot, COUNT(*) AS k FROM cells GROUP BY user_id
    ),
    ent AS (
      SELECT c.user_id,
             CAST(SUM(CAST(-(CAST(c.n AS DOUBLE) / t.ntot)
                           * ln(CAST(c.n AS DOUBLE) / t.ntot)
                           AS DECIMAL(20,8))) AS DOUBLE) AS h_raw
      FROM cells c JOIN tot t ON t.user_id = c.user_id
      GROUP BY c.user_id
    )
    SELECT t.user_id,
           CAST(t.ntot AS BIGINT) AS n_events,
           CAST(t.k AS INT) AS n_types,
           floor(e.h_raw * 1e6 + 0.5) / 1e6 AS entropy_nats,
           CASE WHEN t.k <= 1 THEN NULL
                ELSE floor(e.h_raw / ln(CAST(t.k AS DOUBLE)) * 1e6 + 0.5) / 1e6
           END AS norm_entropy
    FROM tot t JOIN ent e ON e.user_id = t.user_id
    """,
)
def q_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral entropy over event types (and the
    log-k-normalized evenness in [0,1]) — the diversity feature
    engagement models and bot detectors both reach for (a user who
    only ever fires one event type scores 0; a uniform mixer scores 1).

    One hash agg to (user, type) cells, a broadcast-size per-user
    margin join, and the chi2 discipline for the entropy sum: each
    -p·ln(p) term casts to DECIMAL(20,8) before summing so the
    cell-order float accumulation cannot drift; ln() follows the
    established 6-dp libm-rounding discipline. Single-type users get
    entropy 0 and NULL evenness (ln(1)=0 denominator) on both sides.
    """
    ev = table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    cells = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = cells.groupBy("user_id").agg(
        F.sum("n").alias("ntot"), F.count(F.lit(1)).alias("k")
    )
    p = F.col("n").cast("double") / F.col("ntot")
    ent = (
        cells.join(tot, "user_id")
        .groupBy("user_id")
        .agg(
            F.sum((-p * F.log(p)).cast("decimal(20,8)"))
            .cast("double")
            .alias("h_raw")
        )
    )
    return tot.join(ent, "user_id").select(
        "user_id",
        F.col("ntot").cast("bigint").alias("n_events"),
        F.col("k").cast("int").alias("n_types"),
        det_round(F.col("h_raw"), 6).alias("entropy_nats"),
        F.when(F.col("k") <= 1, F.lit(None).cast("double"))
        .otherwise(
            det_round(F.col("h_raw") / F.log(F.col("k").cast("double")), 6)
        )
        .alias("norm_entropy"),
    )


@query(
    "q_funnel_latency",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    deltas AS (
      SELECT 1 AS step_idx, 'view->click' AS step,
             epoch_ms(c.t2) - epoch_ms(v.t1) AS ms
      FROM c JOIN v ON v.user_id = c.user_id
      UNION ALL
      SELECT 2, 'click->purchase', epoch_ms(p.t3) - epoch_ms(c.t2)
      FROM p JOIN c ON c.user_id = p.user_id
    )
    SELECT CAST(step_idx AS INT) AS step_idx, step,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           floor(CAST(SUM(CAST(ms AS HUGEINT)) AS DOUBLE) / COUNT(*) / 1000.0
                 * 1e3 + 0.5) / 1e3 AS avg_seconds,
           CAST(MIN(ms) AS DOUBLE) / 1000.0 AS min_seconds,
           CAST(MAX(ms) AS DOUBLE) / 1000.0 AS max_seconds,
           CASE WHEN COUNT(*) < 2 THEN NULL
                ELSE floor(sqrt((CAST(COUNT(*) AS DOUBLE)
                                   * CAST(SUM(CAST(ms AS HUGEINT) * ms) AS DOUBLE)
                                 - CAST(SUM(CAST(ms AS HUGEINT)) AS DOUBLE)
                                   * CAST(SUM(CAST(ms AS HUGEINT)) AS DOUBLE))
                                / (CAST(COUNT(*) AS DOUBLE) * (COUNT(*) - 1)))
                           / 1000.0 * 1e3 + 0.5) / 1e3
           END AS stddev_seconds
    FROM deltas
    GROUP BY 1, 2
    """,
)
def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step-to-step latency of the view → click → purchase funnel:
    how long converting users take between stages (mean, range, and
    spread per transition) — the time dimension q_funnel's pure counts
    drop, and the metric that finds WHERE a funnel leaks speed.

    Reuses q_funnel's first-touch stage construction (per-user MIN(ts)
    chained joins — one narrow shuffle per stage). Latencies are exact
    integer epoch-milliseconds; the power sums accumulate through
    HUGEINT/decimal(38,0) (millisecond squares overflow DECIMAL(30,8)'s
    safe band — the ANOVA cents lesson), and mean/stddev recombine in
    one fixed expression, 3-dp floor-rounded seconds. Transitions with
    a single converter → NULL stddev on both sides.
    """
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c.select("user_id", "t2"), "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    d1 = c.join(v, "user_id").select(
        F.lit(1).alias("step_idx"),
        F.lit("view->click").alias("step"),
        (F.unix_millis("t2") - F.unix_millis("t1")).alias("ms"),
    )
    d2 = p.join(c, "user_id").select(
        F.lit(2).alias("step_idx"),
        F.lit("click->purchase").alias("step"),
        (F.unix_millis("t3") - F.unix_millis("t2")).alias("ms"),
    )
    deltas = d1.unionByName(d2)
    n = F.count(F.lit(1))
    s = F.sum(F.col("ms").cast("decimal(38,0)")).cast("double")
    ss = F.sum(F.col("ms").cast("decimal(38,0)") * F.col("ms")).cast("double")
    var = (n.cast("double") * ss - s * s) / (n.cast("double") * (n - 1))
    return deltas.groupBy(
        F.col("step_idx").cast("int").alias("step_idx"), "step"
    ).agg(
        n.cast("bigint").alias("n_users"),
        det_round(s / n / F.lit(1000.0), 3).alias("avg_seconds"),
        (F.min("ms").cast("double") / 1000.0).alias("min_seconds"),
        (F.max("ms").cast("double") / 1000.0).alias("max_seconds"),
        F.when(n < 2, F.lit(None).cast("double"))
        .otherwise(det_round(F.sqrt(var) / F.lit(1000.0), 3))
        .alias("stddev_seconds"),
    )


#: Fixed iteration count for the stationary-distribution walk — part of
#: the query contract (both engines unroll exactly these steps).
_MARKOV_ITERS = 20


def _markov_step_sql(t: int) -> str:
    """One unrolled v·P step + renormalization as MATERIALIZED CTEs
    (DuckDB inlines CTEs by default — the q_pca_power lesson)."""
    return f"""v{t}u AS MATERIALIZED (
      SELECT p.dst AS state,
             list_aggregate(list(v.pv * p.p ORDER BY p.src), 'sum') AS pv
      FROM v{t - 1} v JOIN p ON p.src = v.state
      GROUP BY p.dst
    ),
    v{t} AS MATERIALIZED (
      SELECT state,
             pv / (SELECT list_aggregate(list(pv ORDER BY state), 'sum')
                   FROM v{t}u) AS pv
      FROM v{t}u
    )"""


@query(
    "q_markov_stationary",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        AND ts IS NOT NULL
    ),
    t AS (
      SELECT event_type AS src, next_type AS dst, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (SELECT src, CAST(SUM(n) AS BIGINT) AS n_out FROM t GROUP BY src),
    p AS (
      SELECT t.src, t.dst, CAST(t.n AS DOUBLE) / tot.n_out AS p
      FROM t JOIN tot ON tot.src = t.src
      WHERE t.dst IN (SELECT src FROM tot)
    ),
    k AS (SELECT CAST(COUNT(*) AS DOUBLE) AS kk FROM tot),
    v0 AS MATERIALIZED (SELECT src AS state, 1.0 / kk AS pv FROM tot, k),
    {", ".join(_markov_step_sql(t) for t in range(1, _MARKOV_ITERS + 1))}
    SELECT tot.src AS state,
           tot.n_out,
           floor(COALESCE(vf.pv, 0.0) * 1e6 + 0.5) / 1e6 AS stationary_p
    FROM tot LEFT JOIN v{_MARKOV_ITERS} vf ON vf.state = tot.src
    """,
)
def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-behavior Markov chain: where
    does a random surfer of the event-type transition graph spend its
    time — the long-run engagement mix, q_sequence_transitions' fixed
    point (and PageRank's dense little sibling: same power iteration,
    row-stochastic instead of damped).

    Contract: states are the types WITH outgoing transitions; v starts
    uniform, takes {_MARKOV_ITERS} v·P steps restricted to those states
    (mass to dangling types drops) with renormalization each step.
    The data-scale work is the one LEAD shuffle + (src, dst) hash agg;
    the chain itself is |event-taxonomy|² cells — metadata-scale by
    construction — so the iteration runs driver-side on the collected
    cells (the q_pca_power split), while the DuckDB twin unrolls the
    same steps over MATERIALIZED CTEs. Determinism: p-cells are exact
    integer divisions; every cross-state sum folds in src/state order
    on both sides (list_aggregate ↔ sorted Python fold), so the walk
    is bit-identical; 6-dp rounding only at the output.
    """
    import math

    # ts IS NOT NULL pins the LEAD sequence order cross-engine (Spark
    # NULLS FIRST vs DuckDB NULLS LAST on the ts sort key — r8 advice).
    ev = table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
    ).select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    t = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    cells = t.collect()  # |taxonomy|^2 cells — metadata-scale
    schema = "state string, n_out bigint, stationary_p double"
    if not cells:
        return spark.createDataFrame([], schema)
    n_out: dict[str, int] = {}
    for r in cells:
        n_out[r["src"]] = n_out.get(r["src"], 0) + r["n"]
    states = sorted(n_out)
    p = {
        (r["src"], r["dst"]): r["n"] / n_out[r["src"]]
        for r in cells
        if r["dst"] in n_out
    }
    v = {s: 1.0 / float(len(states)) for s in states}
    for _ in range(_MARKOV_ITERS):
        nxt: dict[str, float] = {}
        for dst in states:
            acc, present = 0.0, False
            for src in states:  # ascending src — the oracle's fold order
                if (src, dst) in p and src in v:
                    acc = acc + v[src] * p[(src, dst)]
                    present = True
            if present:
                nxt[dst] = acc
        nrm = 0.0
        for s in sorted(nxt):  # ascending state — the oracle's fold order
            nrm = nrm + nxt[s]
        if not nrm > 0:
            v = {}
            break
        v = {s: x / nrm for s, x in nxt.items()}
    r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6
    return spark.createDataFrame(
        [(s, n_out[s], r6(v.get(s, 0.0))) for s in states], schema
    )
