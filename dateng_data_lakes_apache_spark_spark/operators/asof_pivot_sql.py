"""As-of join, pivot, and the SQL surface (reference Q1 generalized).

The as-of join is the canonical "operator Spark lacks" (SURVEY task
brief): implemented as a composition of union + window — one shuffle,
no range explosion — rather than any per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table, register_views
from ..common import dsum, o_dsum, o_ts_str, ts_str
from ..registry import query


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Generic as-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` key.

    Distributed strategy: tag and union both inputs, then one window
    (partition by key, order by time) carries the most recent right-side
    values forward via last(ignorenulls) — a single hash shuffle on the
    key, linear state, no time-range self-join. This is the standard
    scale-out as-of algorithm (a sort-merge within key partitions);
    at 100 TB the shuffle is the same one any per-key sessionization pays.
    """
    reserved = {"_side", "_ts"}
    if reserved & (set(left.columns) | set(right.columns)):
        raise ValueError("asof_join: inputs must not carry _side/_ts columns")
    shared = (set(left.columns) & set(right.columns)) - {on}
    if shared:
        # the union would silently merge both sides' values into one column
        raise ValueError(
            f"asof_join: non-key columns {sorted(shared)} exist on both sides; "
            "rename or drop them on one side first"
        )
    lt = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rt = right.withColumn("_side", F.lit(0)).withColumn("_ts", F.col(right_ts))
    cols = set(lt.columns) | set(rt.columns)
    for c in cols:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None))
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None))
    unioned = lt.select(*sorted(cols)).unionByName(rt.select(*sorted(cols)))
    # right rows sort before left rows at equal timestamps → "<=" semantics
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"_asof_{c}")
            for c in right_cols
        ],
    )
    out = carried.where(F.col("_side") == 1).select(
        *left.columns, *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in right_cols]
    )
    return out


@query(
    "q_join_asof",
    oracle=f"""
    SELECT p.event_id,
           p.user_id,
           {o_ts_str('p.ts')} AS purchase_ts,
           c.event_id AS asof_click_id,
           {o_ts_str('c.ts')} AS asof_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent click
    at-or-before it (DuckDB's native ASOF JOIN is the oracle)."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="click_ts",
        right_cols=["click_id", "click_ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        ts_str(F.col("ts")).alias("purchase_ts"),
        F.col("asof_click_id").alias("asof_click_id"),
        ts_str(F.col("asof_click_ts")).alias("asof_click_ts"),
    )


@query(
    "q_pivot",
    oracle="""
    SELECT n_name,
           COUNT(*) FILTER (c_mktsegment = 'AUTOMOBILE') AS seg_automobile,
           COUNT(*) FILTER (c_mktsegment = 'BUILDING')   AS seg_building,
           COUNT(*) FILTER (c_mktsegment = 'FURNITURE')  AS seg_furniture,
           COUNT(*) FILTER (c_mktsegment = 'HOUSEHOLD')  AS seg_household,
           COUNT(*) FILTER (c_mktsegment = 'MACHINERY')  AS seg_machinery
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n_name
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): customer counts per nation × market segment.

    Explicit pivot values keep it one pass (no extra distinct-values job)
    — mandatory at scale where the values scan would be a full pass.
    """
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    pivoted = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .pivot("c_mktsegment", segs)
        .count()
    )
    out = pivoted.select(
        "n_name", *[F.coalesce(F.col(s), F.lit(0)).alias(f"seg_{s.lower()}") for s in segs]
    )
    return out


@query(
    "q_sql_surface",
    oracle="""
    SELECT n.n_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY n.n_name
    """,
)
def q_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry surface (reference Q1, ETL_from_Notebook.py:255-278):
    temp views + spark.sql produce the same Catalyst plan space as the
    DataFrame API — this query IS the proof, oracle-checked."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY n.n_name
        """
    )


@query(
    "q_unpivot",
    oracle=f"""
    WITH agg AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS DOUBLE) AS n_orders,
             {o_dsum('o_totalprice')} AS sum_price,
             CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, 'n_orders'  AS metric, n_orders  AS value FROM agg
    UNION ALL
    SELECT o_orderpriority, 'sum_price' AS metric, sum_price AS value FROM agg
    UNION ALL
    SELECT o_orderpriority, 'max_price' AS metric, max_price AS value FROM agg
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long): melt per-priority measures into
    (key, metric, value) rows — the inverse of q_pivot and the standard
    prep step for metric stores and long-format plotting/export.

    Spark's native unpivot is an Expand node — each input row emits one
    row per measure in the same task, no shuffle, no join; the only
    shuffle in this plan is the upstream aggregate's. Measures unify to
    double (unpivot requires one value type), matching the oracle's
    explicit casts.
    """
    o = table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("sum_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
    )
    return agg.unpivot(
        ids=["o_orderpriority"],
        values=["n_orders", "sum_price", "max_price"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "q_join_asof_tolerance",
    oracle=f"""
    SELECT p.event_id,
           p.user_id,
           {o_ts_str('p.ts')} AS purchase_ts,
           CASE WHEN c.ts >= p.ts - INTERVAL 1 DAY THEN c.event_id END
             AS click_id_fresh,
           CASE WHEN c.ts >= p.ts - INTERVAL 1 DAY THEN {o_ts_str('c.ts')} END
             AS click_ts_fresh
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a STALENESS TOLERANCE (pandas merge_asof's
    ``tolerance``, QuestDB/kdb asof semantics): the latest click
    at-or-before each purchase counts only if it is at most 1 day old —
    older matches are nulled, because "the last click, even if it was
    two years ago" silently attributes ancient context (the same bug
    windowed funnels exist to avoid, applied to the as-of operator).

    Implementation: the tolerance is a POST-FILTER on the carried
    match, not a join-condition change — the union+carry-forward
    window (:func:`asof_join`) is untouched, so the one-shuffle scale
    shape survives; nulling stale matches is a map-side CASE.
    """
    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="click_ts",
        right_cols=["click_id", "click_ts"],
    )
    fresh = F.col("asof_click_ts") >= F.col("ts") - F.expr("INTERVAL 1 DAY")
    return joined.select(
        "event_id",
        "user_id",
        ts_str(F.col("ts")).alias("purchase_ts"),
        F.when(fresh, F.col("asof_click_id")).alias("click_id_fresh"),
        F.when(fresh, ts_str(F.col("asof_click_ts"))).alias("click_ts_fresh"),
    )


_NEAREST_TOL_US = 3600 * 1_000_000  # ±1 h matching window


@query(
    "q_join_asof_nearest",
    oracle=f"""
    WITH tagged AS (
      SELECT user_id, epoch_us(ts) AS _ts, 1 AS _side, event_id AS _id
      FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT user_id, epoch_us(ts), 0, event_id
      FROM events WHERE event_type = 'purchase'
    ),
    carried AS (
      SELECT user_id, _ts, _side, _id,
             last_value(CASE WHEN _side = 0 THEN _id END IGNORE NULLS)
               OVER wb AS back_id,
             last_value(CASE WHEN _side = 0 THEN _ts END IGNORE NULLS)
               OVER wb AS back_us,
             first_value(CASE WHEN _side = 0 THEN _id END IGNORE NULLS)
               OVER wf AS fwd_id,
             first_value(CASE WHEN _side = 0 THEN _ts END IGNORE NULLS)
               OVER wf AS fwd_us
      FROM tagged
      WINDOW
        wb AS (PARTITION BY user_id ORDER BY _ts ASC, _side ASC, _id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wf AS (PARTITION BY user_id ORDER BY _ts ASC, _side DESC, _id ASC
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    scored AS (
      SELECT user_id, _id AS error_id, _ts AS err_us,
             CASE WHEN back_us IS NOT NULL
                   AND _ts - back_us <= {_NEAREST_TOL_US}
                  THEN back_id END AS bid,
             CASE WHEN back_us IS NOT NULL
                   AND _ts - back_us <= {_NEAREST_TOL_US}
                  THEN _ts - back_us END AS bdelta,
             CASE WHEN fwd_us IS NOT NULL
                   AND fwd_us - _ts <= {_NEAREST_TOL_US}
                  THEN fwd_id END AS fid,
             CASE WHEN fwd_us IS NOT NULL
                   AND fwd_us - _ts <= {_NEAREST_TOL_US}
                  THEN fwd_us - _ts END AS fdelta
      FROM carried WHERE _side = 1
    )
    SELECT user_id, error_id, err_us,
           CASE WHEN bid IS NOT NULL AND (fid IS NULL OR bdelta <= fdelta)
                THEN bid ELSE fid END AS nearest_purchase_id,
           CASE WHEN bid IS NOT NULL AND (fid IS NULL OR bdelta <= fdelta)
                THEN bdelta ELSE fdelta END AS delta_us,
           CASE WHEN bid IS NULL AND fid IS NULL THEN NULL
                WHEN bid IS NOT NULL AND (fid IS NULL OR bdelta <= fdelta)
                THEN 'back' ELSE 'fwd' END AS direction
    FROM scored
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-event join — the bidirectional completion of the as-of
    family (q_join_asof = latest-before, q_join_asof_tolerance = staleness
    -gated; this matches each error event to the CLOSEST purchase in
    either direction within ±1 h, ties to the earlier side). This is
    "what was the user buying around the failure" — the diagnostic join
    monitoring and attribution both need, and one neither ASOF
    direction alone answers.

    Same one-shuffle interleaved-stream strategy as :func:`asof_join`,
    run in both directions inside one window pass pair: tag and union
    the streams, carry the latest purchase forward (frame unbounded
    ..current, purchases sorting before errors at ties for <=
    semantics) AND the next purchase backward (current..unbounded,
    errors sorting first at ties for >=), then pick the smaller
    integer-microsecond delta. No time-range self-join, no per-row
    probe: linear window state on one user_id hash partition, the exact
    cost profile of sessionization. Total (ts, side, id) ordering makes
    every pick engine-exact.
    """
    ev = table(spark, sf_dir, "events")
    err = ev.where(F.col("event_type") == "error").select(
        "user_id",
        F.unix_micros("ts").alias("_nts"),
        F.lit(1).alias("_nside"),
        F.col("event_id").alias("_nid"),
    )
    pur = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("_nts"),
        F.lit(0).alias("_nside"),
        F.col("event_id").alias("_nid"),
    )
    tagged = err.unionByName(pur)
    wb = (
        Window.partitionBy("user_id")
        .orderBy(F.col("_nts").asc(), F.col("_nside").asc(), F.col("_nid").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("_nts").asc(), F.col("_nside").desc(), F.col("_nid").asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    is_pur = F.col("_nside") == 0
    carried = tagged.select(
        "user_id",
        "_nts",
        "_nside",
        "_nid",
        F.last(F.when(is_pur, F.col("_nid")), ignorenulls=True).over(wb).alias("back_id"),
        F.last(F.when(is_pur, F.col("_nts")), ignorenulls=True).over(wb).alias("back_us"),
        F.first(F.when(is_pur, F.col("_nid")), ignorenulls=True).over(wf).alias("fwd_id"),
        F.first(F.when(is_pur, F.col("_nts")), ignorenulls=True).over(wf).alias("fwd_us"),
    )
    s = carried.where(F.col("_nside") == 1)
    b_ok = F.col("back_us").isNotNull() & (
        F.col("_nts") - F.col("back_us") <= _NEAREST_TOL_US
    )
    f_ok = F.col("fwd_us").isNotNull() & (
        F.col("fwd_us") - F.col("_nts") <= _NEAREST_TOL_US
    )
    scored = s.select(
        "user_id",
        F.col("_nid").alias("error_id"),
        F.col("_nts").alias("err_us"),
        F.when(b_ok, F.col("back_id")).alias("bid"),
        F.when(b_ok, F.col("_nts") - F.col("back_us")).alias("bdelta"),
        F.when(f_ok, F.col("fwd_id")).alias("fid"),
        F.when(f_ok, F.col("fwd_us") - F.col("_nts")).alias("fdelta"),
    )
    pick_back = F.col("bid").isNotNull() & (
        F.col("fid").isNull() | (F.col("bdelta") <= F.col("fdelta"))
    )
    return scored.select(
        "user_id",
        "error_id",
        "err_us",
        F.when(pick_back, F.col("bid")).otherwise(F.col("fid")).alias(
            "nearest_purchase_id"
        ),
        F.when(pick_back, F.col("bdelta")).otherwise(F.col("fdelta")).alias("delta_us"),
        F.when(F.col("bid").isNull() & F.col("fid").isNull(), F.lit(None).cast("string"))
        .when(pick_back, "back")
        .otherwise("fwd")
        .alias("direction"),
    )
