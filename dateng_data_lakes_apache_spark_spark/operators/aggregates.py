"""Aggregation operators: global / grouped / distinct / approx / rollup / cube / having.

The reference has NO aggregation at all (SURVEY §2.2) — this module is
pure extension surface. Every double aggregate uses decimal accumulation
(common.dsum/davg) so Spark and the DuckDB oracle agree bit-for-bit
regardless of partition summation order.

Scale posture: all of these are hash aggregations with map-side partial
aggregation (Spark's HashAggregate pairs), so the shuffle carries one
row per (partition, group), not per input row. Group cardinalities here
(returnflag×linestatus=6, custkey=1.5k·SF) keep reducer state tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..common import davg, dsum, o_davg, o_dsum, spread
from ..registry import query
from ..staging import run_staged, staged_builder, staged_oracle


@query(
    "q_agg_global",
    oracle=f"""
    SELECT {o_dsum('l_quantity')} AS sum_qty,
           {o_davg('l_extendedprice')} AS avg_price,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(*) AS n_rows,
           COUNT(l_quantity) AS n_qty
    FROM lineitem
    """,
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-group) aggregation: SUM/AVG/MIN/MAX/COUNT in one pass."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        dsum(F.col("l_quantity")).alias("sum_qty"),
        davg(F.col("l_extendedprice")).alias("avg_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_quantity").alias("n_qty"),
    )


@query(
    "q_agg_groupby",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           {o_dsum('l_quantity')} AS sum_qty,
           {o_dsum('l_extendedprice')} AS sum_base_price,
           {o_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {o_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {o_davg('l_quantity')} AS avg_qty,
           {o_davg('l_extendedprice')} AS avg_price,
           {o_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped grouped aggregation (the engine's flagship query).

    6 groups regardless of scale → partial aggregation collapses the
    shuffle to ~6 rows per map task; the scan (with shipdate pushdown)
    dominates, which is exactly the profile you want at 100 TB.

    spread() (r11): the local single-row-group file plans a one-task
    scan, serializing the 8 decimal partial aggregations on one core —
    measured 1.9 → 1.0 s at sf0.1 with the conditional round-robin
    repartition. On a properly-filed lake the gate makes it a no-op.
    """
    li = spread(table(spark, sf_dir, "lineitem"), spark)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(DISTINCT l_returnflag) AS n_flags,
           COUNT(*) AS n_rows
    FROM lineitem
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts. Spark expands multiple COUNT(DISTINCT x)
    into a single Expand + two-phase aggregate — one shuffle, not three."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_returnflag").alias("n_flags"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q_agg_approx_distinct",
    # Staged-expectation oracle (VERDICT r4 item 1): HLL++ registers are
    # max-merged — order-independent — so the estimate is a pure function
    # of data+rsd; the query pins it to parquet and DuckDB hash-matches
    # the staged bytes (see staging.py for exactly what this certifies).
    oracle=staged_oracle("q_agg_approx_distinct", "*"),
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — THE cardinality tool at 100 TB
    (fixed-size sketch vs a shuffle of every distinct key). Deterministic
    for a given dataset+rsd (register merge is a max — partition-order
    independent, probe-verified in tests/test_staged_expectations.py);
    the exact-vs-approx error bound is asserted in
    tests/test_aggregates.py."""
    return run_staged(spark, sf_dir, "q_agg_approx_distinct")


@staged_builder("q_agg_approx_distinct")
def approx_distinct_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-staging pipeline frame for :func:`q_agg_approx_distinct`
    (guards and bench target this — see staging.STAGED_BUILDERS)."""
    o = table(spark, sf_dir, "orders")
    return o.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_custkeys"),
        F.approx_count_distinct("o_orderkey", rsd=0.02).alias("approx_orderkeys"),
    )


@query(
    "q_rollup",
    oracle="""
    SELECT r.r_name, n.n_name, COUNT(*) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    -- Spark emits NO rows from rollup/cube on empty input (the SQL
    -- standard emits the () grand-total row); only that degenerate row
    -- can ever have COUNT 0, so the guard mirrors the engine exactly.
    HAVING COUNT(*) > 0
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets: per-nation, per-region subtotal, grand total."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "q_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {o_dsum('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    HAVING COUNT(*) > 0  -- empty-input grand-total row: see q_rollup
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over status × priority."""
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("sum_price"),
    )


@query(
    "q_having",
    oracle=f"""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           {o_dsum('o_totalprice')} AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) > 4000000
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING): big-spender customers."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_spend"),
        )
        .where(F.col("total_spend") > 4000000)
    )


@query(
    "q_sort_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: ORDER BY + LIMIT with a deterministic tiebreak.

    Spark plans this as TakeOrderedAndProject — each task keeps a k-row
    heap and the driver merges; no global sort ever materializes. That is
    the only acceptable top-k at 100 TB.
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q_agg_conditional",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) FILTER (l_discount > 0.05) AS n_discounted,
           COUNT(*) FILTER (l_quantity >= 25) AS n_bulk,
           {o_dsum('CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END')}
             AS discounted_revenue
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (COUNT FILTER / CASE-gated SUM) — the
    one-pass alternative to self-joining per condition: every predicate
    is a column expression inside the same partial aggregate."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.count_if(F.col("l_quantity") >= 25).alias("n_bulk"),
        dsum(
            F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice")).otherwise(0.0)
        ).alias("discounted_revenue"),
    )


@query(
    "q_agg_array_collect",
    oracle="""
    SELECT l_returnflag,
           COALESCE(array_to_string(list_sort(list(DISTINCT l_linestatus)), ','), '')
             AS statuses,  -- all-NULL group: Spark collect_set -> [] -> ''
           COUNT(DISTINCT l_linestatus) AS n_statuses
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_array_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: collect_set + sort for a deterministic result.
    collect_list/set ordering is partition-order dependent — sorting the
    collected array is what makes array aggregates reproducible (and
    oracle-comparable) in a distributed engine.  The driver-facing output
    serializes the array with array_join: pandas renders Spark arrays as
    Python lists but DuckDB lists as numpy arrays, so a raw array column
    would hash-diverge even when the values are identical."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias(
            "statuses"
        ),
        F.countDistinct("l_linestatus").alias("n_statuses"),
    )


@query(
    "q_agg_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25), 4) AS p25,
           round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.50), 4) AS p50,
           round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.90), 4) AS p90,
           round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.99), 4) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group (PERCENTILE_CONT
    semantics) — the verification-stage twin of q_agg_approx_quantile.

    Spark's exact `percentile` buffers each group's values before
    sorting, so its memory is O(group size): correct for bounded groups
    (3 return flags here) or the final verify pass of a sampled subset,
    but NOT the 100 TB default — that is q_agg_approx_quantile's
    GK-sketch job (mergeable, bounded memory), with this operator as
    the exactness check on a bounded slice. Both engines implement the
    same lo + (hi-lo)*frac interpolation on IEEE doubles (probe-verified
    bit-identical); round(4) guards the remaining ulp risk.
    """
    li = table(spark, sf_dir, "lineitem")
    v = F.col("l_extendedprice").cast("double")
    # ONE percentile call with an array of fractions: the group's values
    # buffer and sort once, not once per requested percentile (measured
    # 3.5 s -> ~1 s at sf0.1 vs four separate percentile() aggregates)
    pcts = F.percentile(
        v, F.array(F.lit(0.25), F.lit(0.50), F.lit(0.90), F.lit(0.99))
    )
    return (
        li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), pcts.alias("ps"))
        .select(
            "l_returnflag",
            "n",
            F.round(F.col("ps")[0], 4).alias("p25"),
            F.round(F.col("ps")[1], 4).alias("p50"),
            F.round(F.col("ps")[2], 4).alias("p90"),
            F.round(F.col("ps")[3], 4).alias("p99"),
        )
    )


@query(
    "q_agg_mode",
    oracle="""
    WITH counts AS (
      SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
      FROM orders GROUP BY o_orderpriority, o_orderstatus
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                   ORDER BY n DESC, o_orderstatus) AS rk
      FROM counts
    )
    SELECT o_orderpriority,
           o_orderstatus AS modal_status,
           n AS modal_count
    FROM ranked WHERE rk = 1
    """,
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (most frequent value) with a DETERMINISTIC
    tie-break on the value itself — built as count + top-1 window rather
    than the engine's mode() aggregate, whose tie behavior is
    unspecified in both Spark and DuckDB (an arbitrary tied winner is a
    reproducibility bug in a training pipeline, not a nicety).

    Scale shape: the first aggregate collapses to |priority × status|
    rows via map-side combine; the window then ranks those few rows —
    Spark plans WindowGroupLimit, so nothing bigger than the distinct
    group combinations ever sorts.
    """
    o = table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    rk = F.row_number().over(
        Window.partitionBy("o_orderpriority").orderBy(
            F.col("n").desc(), F.col("o_orderstatus")
        )
    )
    return (
        counts.withColumn("rk", rk)
        .where(F.col("rk") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("modal_status"),
            F.col("n").alias("modal_count"),
        )
    )


@query(
    "q_agg_boolean",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_quantity > 0) AS all_positive_qty,
           bool_or(l_discount > 0.09) AS any_deep_discount,
           COUNT(*) FILTER (WHERE l_tax = 0) AS n_tax_free,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate pack: bool_and / bool_or / count_if per group —
    the data-quality assertion aggregates (is EVERY row valid? does ANY
    row violate?) in one scan with map-side partial aggregation.

    All three reduce to tiny associative state (one bool / one long per
    group), so a 100 TB scan ships three words per group per partition —
    the cheapest full-table validation shape there is.
    """
    l = table(spark, sf_dir, "lineitem")  # noqa: E741
    return l.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.count_if(F.col("l_tax") == 0).alias("n_tax_free"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "q_incremental_agg",
    # The oracle recomputes from scratch over ALL events; the Spark side
    # merges two independently-aggregated partial states — equality IS
    # the merge-algebra proof.
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    WHERE value IS NULL OR isfinite(value)
    GROUP BY event_type
    """,
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: yesterday's materialized
    partial state merged with today's delta instead of recomputing from
    scratch — the lakehouse pattern that turns a daily 100 TB re-scan
    into a scan of the new partition only.

    Both halves aggregate to the SAME partial-state schema (count,
    decimal sum, min, max — all associative), then merge by a second
    groupBy over the union: counts and sums add, min/max fold. The
    oracle recomputes over the full table, so a hash match proves the
    merge algebra is lossless. (AVG intentionally absent from state —
    it is derived sum/count at read time; storing it would break
    mergeability.)
    """
    from ..common import finite

    # finite-or-NULL only (r9 nonfinite catalog): a NaN/Inf observation
    # would be silently NULLed by Spark's decimal cast but error in
    # DuckDB — quarantined explicitly before the materialized state.
    e = table(spark, sf_dir, "events").where(
        F.col("value").isNull() | finite(F.col("value"))
    )
    cutoff = "2024-01-25"

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,8)")).alias("sum_dec"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )

    # The split must be EXHAUSTIVE: `ts < cutoff` / `ts >= cutoff` are
    # both NULL for a NULL ts, which would silently drop untimed rows
    # from BOTH halves while the full-recompute oracle keeps them — a
    # real incremental-pipeline data-loss bug (found by the nullts
    # degenerate catalog). NULL-ts rows ride with the delta.
    is_old = F.col("ts") < cutoff
    old_state = partial(e.where(is_old))                    # stored snapshot
    delta = partial(e.where(~F.coalesce(is_old, F.lit(False))))  # new + untimed
    return (
        old_state.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_dec").cast("double").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


@query(
    "q_agg_salted",
    # Salting changes the physical shuffle layout, never the logical
    # result — the oracle is the PLAIN group-by: a lost or duplicated
    # salt bucket breaks the hash match (same discipline as q_join_salted).
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {o_dsum('value')} AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for hot grouping keys: phase 1
    aggregates by (key, salt) — splitting each hot key's rows across 32
    reducers — phase 2 merges the 32 partial states per key.

    events has 5 event_type values: at 100 TB a plain groupBy funnels
    ~20 TB through each of 5 reducers regardless of cluster size, and
    AQE cannot split a single key. Salting caps any reducer at
    hot-key-volume/32. The state is the associative (count, decimal
    sum) pair, so the merge is exact — phase 2's input is 5×32 tiny
    rows. (Map-side partial aggregation already does this implicitly
    when upstream partitioning is random; explicit salting is the
    guarantee that survives pre-partitioned-by-key inputs, where the
    combiner stops helping.)
    """
    e = table(spark, sf_dir, "events")
    salted = (
        e.groupBy(
            "event_type",
            F.pmod(F.xxhash64("event_id"), F.lit(32)).alias("salt"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_part"),
            F.sum(F.col("value").cast("decimal(30,8)")).alias("sum_dec"),
        )
    )
    return salted.groupBy("event_type").agg(
        F.sum("n_part").alias("n_events"),
        F.sum("sum_dec").cast("double").alias("sum_value"),
    )


@query(
    "q_agg_string_concat",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           string_agg(s.s_name, ',' ORDER BY s.s_name) AS supplier_csv
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY nation
    """,
)
def q_agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (GROUP_CONCAT/string_agg): the
    roster-per-group shape every report export needs. Spark has no
    ordered string_agg; the engine expresses it as
    concat_ws(array_sort(collect_list())) — the sort happens INSIDE
    each group's collected array (group-bounded memory), not as a
    global orderBy, and the DuckDB ORDER BY-qualified string_agg twin
    hash-matches, proving the ordering semantics. Groups here are
    dim-bounded (suppliers per nation); an unbounded-group rollout caps
    or top-ks the array first (q_cap_per_source pattern).
    """
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.concat_ws(",", F.array_sort(F.collect_list("s_name"))).alias(
                "supplier_csv"
            ),
        )
        .orderBy("nation")
    )
