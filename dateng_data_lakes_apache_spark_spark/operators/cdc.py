"""Change-data-capture operators: snapshot diff and SCD type-2 builds.

The reference's lake is overwrite-only (``mode("overwrite")`` on every
write, etl.py:112-226) — change management is "replace the table".
These operators supply the two primitives an incremental lake needs
instead: computing WHAT changed between two snapshots (the input to any
merge/upsert, see q_merge_upsert), and recording attribute history as
effective-dated SCD2 rows.

Scale posture: the diff is ONE full-outer equi-join on the key (the
minimal possible data movement for a snapshot comparison — both sides
shuffle once by key; AQE handles skew), classification is a codegen'd
CASE over the joined row, and unchanged rows are dropped before any
downstream stage sees them. The SCD2 build is two windows over the SAME
(user_id) partitioning and (ts, event_id) ordering — one shuffle, one
sort, both window passes reuse them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..common import dsum, o_dsum, o_ts_str, ts_str
from ..registry import query

# Deterministic synthetic snapshot pair derived from `orders`: the "old"
# snapshot is missing keys ≡0 (mod 10) (rows later inserted), the "new"
# one is missing keys ≡0 (mod 7) (rows deleted since), and keys ≡0
# (mod 5) had their price restated (+10.0 — one exact IEEE add, so both
# engines agree bitwise).
_OLD_PRED = "o_orderkey % 10 <> 0"
_NEW_PRED = "o_orderkey % 7 <> 0"
_RESTATE = "CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 10.0 ELSE o_totalprice END"


@query(
    "q_snapshot_diff",
    oracle=f"""
    WITH old AS (
      SELECT o_orderkey, o_totalprice AS old_price FROM orders WHERE {_OLD_PRED}
    ), new AS (
      SELECT o_orderkey, {_RESTATE} AS new_price FROM orders WHERE {_NEW_PRED}
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                WHEN n.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           o.old_price, n.new_price
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.old_price <> n.new_price
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two table snapshots: classify every key as
    insert / delete / update, dropping unchanged rows.

    This is the read side of MERGE (q_merge_upsert applies changes;
    this computes them). One full-outer shuffle join on the key —
    neither snapshot is assumed broadcastable — then a codegen'd CASE;
    the unchanged-row filter sits directly on the join output, so only
    actual changes flow downstream. Snapshots are deterministic
    modulo-carvings of `orders` (see module constants), making the
    result oracle-exact without staged files.
    """
    o = table(spark, sf_dir, "orders")
    # Existence must be judged by the JOIN KEY, never by a payload
    # column's NULLness — a legitimately NULL price on an existing row
    # otherwise misclassifies as insert/delete (per-category hostile
    # sweep find). Keep each side's key so full-outer existence is
    # first-class, exactly like the oracle's o.o_orderkey IS NULL.
    old = o.where(F.expr(_OLD_PRED)).select(
        F.col("o_orderkey").alias("ok_old"),
        F.col("o_totalprice").alias("old_price"),
    )
    new = o.where(F.expr(_NEW_PRED)).select(
        F.col("o_orderkey").alias("ok_new"),
        F.expr(_RESTATE).alias("new_price"),
    )
    j = old.join(new, F.col("ok_old") == F.col("ok_new"), "full_outer")
    change = (
        F.when(F.col("ok_old").isNull(), "insert")
        .when(F.col("ok_new").isNull(), "delete")
        .otherwise("update")
    )
    return (
        j.select(
            F.coalesce("ok_old", "ok_new").alias("o_orderkey"),
            change.alias("change_type"),
            "old_price",
            "new_price",
        )
        .where(
            F.col("ok_old").isNull()
            | F.col("ok_new").isNull()
            | (F.col("old_price") != F.col("new_price"))
        )
    )


@query(
    "q_scd2_build",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             LAG(event_type) OVER w AS prev
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changes AS (
      SELECT user_id, event_id, ts, event_type FROM ordered
      WHERE prev IS NULL OR event_type <> prev
    )
    SELECT user_id,
           event_type AS state,
           {o_ts_str('ts')} AS effective_from,
           {o_ts_str('LEAD(ts) OVER w2')} AS effective_to,
           CASE WHEN LEAD(ts) OVER w2 IS NULL THEN 1 ELSE 0 END AS is_current
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a type-2 slowly-changing dimension from an event stream:
    per user, one effective-dated row per run of equal states, closed by
    the next change's timestamp (open + is_current for the latest).

    Change detection is a lag() against the previous event; interval
    closing is a lead() over the surviving change rows. Both windows
    share the (user_id) partitioning and (ts, event_id) total order —
    Catalyst plans one Exchange and one Sort and runs both window passes
    over them, so the whole history rebuild costs a single shuffle
    regardless of corpus size. (Incremental maintenance at 100 TB:
    partition the events by ingest date and rebuild only users seen in
    the new partition — the same plan over a pruned scan.)
    """
    # ts IS NOT NULL on BOTH sides: an effective-dated row needs a
    # date, and a NULL ts would sort NULLS FIRST here vs NULLS LAST in
    # the oracle (nullts catalog find).
    ev = (
        table(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select("user_id", "event_id", "ts", "event_type")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("prev").isNull() | (F.col("event_type") != F.col("prev")))
        .drop("prev")
    )
    nxt = F.lead("ts").over(w)
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        ts_str(F.col("ts")).alias("effective_from"),
        ts_str(nxt).alias("effective_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"),
    )


@query(
    "q_scd2_lookup",
    oracle=f"""
    WITH activity AS (
      SELECT user_id, event_id, ts, event_type,
             LAG(event_type) OVER w AS prev
      FROM events WHERE event_type <> 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
      SELECT user_id, ts, event_type FROM (
        SELECT user_id, event_id, ts, event_type, prev FROM activity
      ) WHERE prev IS NULL OR event_type <> prev
    ),
    dim AS (
      SELECT user_id, event_type AS state, ts AS from_ts,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS to_ts
      FROM changes
    ),
    p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
    SELECT COALESCE(d.state, 'none') AS state_at_purchase,
           COUNT(*) AS n_purchases,
           {o_dsum('p.value')} AS revenue
    FROM p
    LEFT JOIN dim d
      ON p.user_id = d.user_id
     AND d.from_ts <= p.ts
     AND (p.ts < d.to_ts OR d.to_ts IS NULL)
    GROUP BY 1
    """,
)
def q_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join against a type-2 dimension — the
    read side that makes SCD2 worth building (q_scd2_build is the write
    side): each purchase fact is enriched with the state that was
    CURRENT AT ITS TIMESTAMP, not the state of today. The dimension
    here is the user's activity state (last non-purchase event type),
    effective-dated by the same lag/lead construction as q_scd2_build;
    purchases before any activity land in 'none' via the left join.

    Join shape: equi-join on user_id with the interval predicate as a
    residual filter — a hash join whose per-key fan-out is the user's
    version count (bounded by change frequency, not history length).
    At 100 TB the dim is also effective-date–partitioned so a
    time-bounded fact scan prunes dim versions too. Boundary semantics
    are half-open [from, to): a purchase at the exact change instant
    belongs to the NEW state on both engines.
    """
    ev = table(spark, sf_dir, "events")
    act = ev.where(F.col("event_type") != "purchase").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        act.withColumn("prev", F.lag("event_type").over(w))
        .where(F.col("prev").isNull() | (F.col("event_type") != F.col("prev")))
        .drop("prev", "event_id")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts")
    dim = changes.select(
        F.col("user_id").alias("d_user_id"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("from_ts"),
        F.lead("ts").over(w2).alias("to_ts"),
    )
    p = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    joined = p.join(
        dim,
        (p.user_id == dim.d_user_id)
        & (dim.from_ts <= p.ts)
        & ((p.ts < dim.to_ts) | dim.to_ts.isNull()),
        "left",
    )
    return joined.groupBy(
        F.coalesce(F.col("state"), F.lit("none")).alias("state_at_purchase")
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        dsum(F.col("value")).alias("revenue"),
    )


# --- incremental view maintenance (retraction merge) -------------------


@query(
    "q_ivm_merge",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(COALESCE(floor(o_totalprice * 100 + 0.5), 0) AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST(SUM(CAST(COALESCE(floor(o_totalprice * 100 + 0.5), 0) AS BIGINT)) AS DOUBLE)
             / COUNT(*) AS avg_cents
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_ivm_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance: maintain a grouped aggregate under
    a CDC batch of inserts, deletes, and updates WITHOUT rescanning the
    base — and let the oracle prove it, because the DuckDB twin is the
    FULL RECOMPUTE over the current table. Green parity = the merge
    algebra is exactly right.

    Construction: "yesterday's" snapshot is the current table minus the
    rows a CDC batch will insert (o_orderkey % 97 = 5), plus stale
    versions of the rows it will update (% 97 = 9, price off by 10.00).
    The CDC batch carries signed deltas: +1 inserts, -1 retractions of
    the stale versions, +1 corrected versions. The maintained state is
    (count, sum) per group — both are ABELIAN-GROUP (invertible)
    aggregates, so the merge is one |groups|-row outer join of partial
    states: new = old + delta, never a base rescan; avg derives from
    the merged pair. (MAX/MIN are deliberately absent: they are only
    semigroups — a retraction can delete the extreme — and honest IVM
    for them needs auxiliary candidate state, a different operator.)
    At 100 TB this is the nightly-ETL pattern: partial-state tables
    persist; only deltas shuffle.
    """
    # NULL price contributes 0 cents (explicit, both sides): a NULL
    # inside a partial sum is indistinguishable from a missing partial
    # in the merge algebra, so the NULL is resolved at the SOURCE
    cents = "CAST(COALESCE(floor(o_totalprice * 100 + 0.5), 0) AS BIGINT)"
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.expr(cents).alias("cents")
    )
    is_ins = F.col("o_orderkey") % 97 == 5
    is_upd = F.col("o_orderkey") % 97 == 9

    # Yesterday's snapshot: no future inserts; updated rows carry the
    # stale price (true price + 1000 cents).
    base = o.where(~is_ins).select(
        "o_orderpriority",
        F.when(is_upd, F.col("cents") + 1000).otherwise(F.col("cents")).alias("cents"),
    )
    # CDC batch with signed multiplicities.
    delta = (
        o.where(is_ins).select("o_orderpriority", "cents", F.lit(1).alias("mult"))
        .unionByName(
            o.where(is_upd).select(
                "o_orderpriority",
                (F.col("cents") + 1000).alias("cents"),
                F.lit(-1).alias("mult"),
            )
        )
        .unionByName(
            o.where(is_upd).select("o_orderpriority", "cents", F.lit(1).alias("mult"))
        )
    )

    old_state = base.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
    )
    delta_state = delta.groupBy("o_orderpriority").agg(
        F.sum("mult").alias("dn"),
        F.sum(F.col("mult") * F.col("cents")).alias("ds"),
    )
    merged = old_state.join(delta_state, "o_orderpriority", "full_outer").select(
        "o_orderpriority",
        (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n_orders"),
        (F.coalesce("s", F.lit(0)) + F.coalesce("ds", F.lit(0))).alias("total_cents"),
    )
    return merged.select(
        "o_orderpriority",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("total_cents").cast("bigint").alias("total_cents"),
        (F.col("total_cents").cast("double") / F.col("n_orders")).alias("avg_cents"),
    ).orderBy("o_orderpriority")


# --- temporal feature backfill (feature-store shape) -------------------

_CUTOFFS = "DATE '1996-01-01', DATE '1998-01-01', DATE '2000-01-01'"


@query(
    "q_feature_backfill",
    oracle=f"""
    WITH cutoffs AS (SELECT unnest([{_CUTOFFS}]) AS cutoff),
    feats AS (
      SELECT c.cutoff, o.o_custkey,
             COUNT(*) AS n_orders,
             SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_cents,
             MAX(CAST(o_orderdate AS DATE)) AS last_order
      FROM cutoffs c JOIN orders o ON CAST(o.o_orderdate AS DATE) < c.cutoff
      GROUP BY c.cutoff, o.o_custkey
    )
    SELECT strftime(cutoff, '%Y-%m-%d') AS cutoff,
           CAST(COUNT(*) AS BIGINT) AS n_active_customers,
           CAST(SUM(n_orders) AS BIGINT) AS total_orders,
           CAST(SUM(rev_cents) AS BIGINT) AS total_rev_cents,
           CAST(SUM(CASE WHEN cutoff - last_order <= 180 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_recent_customers
    FROM feats
    GROUP BY cutoff
    ORDER BY cutoff
    """,
)
def q_feature_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-store backfill: per-entity features (order count, revenue
    to date, recency flag) recomputed AS OF several historical cutoffs
    in one job — the time-travel matrix model-training pipelines ask
    the lake for.

    The cutoff dim is tiny → the temporal containment join is a
    broadcast fan-out (each fact lands in ≤ |cutoffs| feature rows —
    bounded, never quadratic), then one hash agg per (cutoff, entity):
    leakage-safe by construction (strict < cutoff), every cutoff
    computed from the same scan. The per-cutoff rollup keeps the
    driver-visible output compact; the (cutoff, entity) frame is the
    real deliverable and is exercised by the same plan.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("od"),
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    cutoffs = spark.sql(f"SELECT explode(array({_CUTOFFS})) AS cutoff")
    feats = (
        o.join(F.broadcast(cutoffs), o.od < cutoffs.cutoff)
        .groupBy("cutoff", "o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("rev_cents"),
            F.max("od").alias("last_order"),
        )
    )
    return (
        feats.groupBy("cutoff")
        .agg(
            F.count(F.lit(1)).alias("n_active_customers"),
            F.sum("n_orders").cast("bigint").alias("total_orders"),
            F.sum("rev_cents").cast("bigint").alias("total_rev_cents"),
            F.sum(
                F.when(F.datediff("cutoff", "last_order") <= 180, 1).otherwise(0)
            ).cast("bigint").alias("n_recent_customers"),
        )
        .select(
            F.date_format("cutoff", "yyyy-MM-dd").alias("cutoff"),
            "n_active_customers",
            "total_orders",
            "total_rev_cents",
            "n_recent_customers",
        )
        .orderBy("cutoff")
    )
