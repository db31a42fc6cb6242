"""Composed star-join analytics: multi-table decision-support queries.

The reference computes exactly one composed query — the songplays fact
build (filter → 2-key join → project, etl.py:194-226). These queries
exercise the same composition grammar at decision-support depth
(TPC-H Q3/Q5/Q10 shapes over the driver's star schema): selective dims,
fact-fact equi-joins, post-join aggregation, bounded top-k output.

Scale posture: every filter sits below its join so pushdown reaches the
parquet scan; the big-big joins (orders⋈lineitem, customer⋈orders) are
declared as plain equi-joins for Catalyst/AQE to plan as shuffle joins
with partial aggregation; only the genuinely tiny dims (region, nation)
are explicitly broadcast — customer/supplier grow linearly with the lake
and must never be pinned to a broadcast. Top-k outputs carry total-order
tiebreaks and plan as TakeOrderedAndProject (never a global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..common import date_str, dsum, o_date_str, o_dsum
from ..registry import query

def _revenue() -> "F.Column":
    # Built lazily: Column construction needs an active SparkContext,
    # which doesn't exist at module-import (registration) time.
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_O_REVENUE = "l_extendedprice * (1 - l_discount)"


@query(
    "q_starjoin_pricing",
    oracle=f"""
    SELECT l_orderkey,
           {o_dsum(_O_REVENUE)} AS revenue,
           {o_date_str('o_orderdate')} AS o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-07-01'
      AND l_shipdate > TIMESTAMP '1998-07-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_starjoin_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority revenue (TPC-H Q3 shape): unshipped revenue of
    BUILDING-segment orders placed before the cutoff.

    Both fact joins shuffle on their natural keys; the segment filter
    prunes customer to ~1/5 before its join and both date predicates
    push into the parquet scans. Revenue accumulates as decimal
    (engine-exact), and the top-10 is TakeOrderedAndProject.
    """
    c = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < "1998-07-01")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    l = (  # noqa: E741 — TPC-H's conventional lineitem alias
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > "1998-07-01")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_revenue()).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            date_str(F.col("o_orderdate")).alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q_starjoin_region",
    oracle=f"""
    SELECT n_name, {o_dsum(_O_REVENUE)} AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q_starjoin_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume per nation (TPC-H Q5 shape): revenue from
    lineitems whose customer and supplier share a nation, one region,
    one order year.

    Six tables: lineitem⋈orders⋈customer are the linear-growth side
    (shuffle equi-joins, AQE-planned); supplier joins on BOTH l_suppkey
    and the customer-nation equality — the second predicate is what
    makes "local supplier" an equi-condition, not a post-filter; nation
    and region are O(25)/O(5) rows and pinned broadcast. The final sort
    is over ≤25 aggregated rows.
    """
    o = (
        table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    l = (  # noqa: E741
        table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
        )
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA").select("r_regionkey")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_revenue()).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "q_starjoin_returns",
    oracle=f"""
    SELECT c_custkey, c_name, {o_dsum(_O_REVENUE)} AS revenue, c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_starjoin_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): top-20 customers by
    revenue lost to returns in one quarter.

    The quarter predicate prunes orders before the fact join; the
    returnflag filter pushes into the lineitem scan (dictionary-encoded
    column — near-free skip). Nation broadcasts; customer joins by hash.
    Top-20 with c_custkey tiebreak → TakeOrderedAndProject.
    """
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    o = (
        table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    l = (  # noqa: E741
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_revenue()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q_starjoin_bigorders",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey,
           {o_date_str('o_orderdate')} AS o_orderdate,
           o_totalprice,
           {o_dsum('l_quantity')} AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 180
    )
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q_starjoin_bigorders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18 shape): orders whose total line
    quantity exceeds a threshold, joined back to customer detail.

    The aggregate subquery reduces lineitem to one row per qualifying
    orderkey BEFORE any wide join — at 100 TB the HAVING prunes ~99% of
    orders, so the semi-join probe side is tiny and AQE typically
    converts the IN-join to broadcast at runtime. The second lineitem
    aggregation only runs over the surviving orders. Top-20 plans as
    TakeOrderedAndProject.
    """
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")  # noqa: E741
    big = (
        l.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty_all"))
        .where(F.col("sum_qty_all") > 180)
        .select("l_orderkey")
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(l, F.col("o_orderkey") == l.l_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            date_str(F.col("o_orderdate")).alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "q_starjoin_promo",
    oracle=f"""
    SELECT 100.0 * {o_dsum(f"CASE WHEN p_type LIKE 'PROMO%' THEN {_O_REVENUE} ELSE 0 END")}
           / {o_dsum(_O_REVENUE)} AS promo_pct,
           {o_dsum(f"CASE WHEN p_type LIKE 'PROMO%' THEN {_O_REVENUE} ELSE 0 END")} AS promo_revenue,
           {o_dsum(_O_REVENUE)} AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def q_starjoin_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share (TPC-H Q14 shape): one month of shipped
    revenue split by whether the part is a PROMO type — the
    conditional-aggregate-ratio pattern.

    The ship-date range prunes lineitem at the scan (~1/80 of rows);
    part joins by hash on p_partkey (linear-growth dim — never pinned
    broadcast; AQE may still choose it at small SF). Numerator and
    denominator accumulate as exact decimals, so the final IEEE double
    division is bit-identical across engines.
    """
    l = (  # noqa: E741
        table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo_rev = F.when(F.col("p_type").like("PROMO%"), _revenue()).otherwise(F.lit(0.0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            dsum(promo_rev).alias("promo_revenue"),
            dsum(_revenue()).alias("total_revenue"),
        )
        .select(
            (F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")).alias(
                "promo_pct"
            ),
            "promo_revenue",
            "total_revenue",
        )
    )


@query(
    "q_starjoin_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_starjoin_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority slip check (TPC-H Q4 shape): orders in one quarter
    with at least one line shipped more than 60 days after order date,
    counted per priority class.

    The correlated EXISTS is declared as a LEFT SEMI join whose
    condition carries both the equi-key and the date inequality — the
    semi join dedups lineitem matches without materializing them, and
    the quarter filter prunes orders at the scan. Five output groups →
    partial agg collapses map-side.
    """
    o = (
        table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")  # noqa: E741
    slipped = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        slipped.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_starjoin_disjunct",
    oracle=f"""
    SELECT {o_dsum(_O_REVENUE)} AS revenue, COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_starjoin_disjunct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive-predicate revenue (TPC-H Q19 shape): OR of three
    (brand, size, quantity) conjunct groups across the join boundary.

    The part-only half of each disjunct (brand AND size) is factored out
    and applied BELOW the join — Catalyst cannot split a cross-table OR
    by itself, so the query hands it the pushable union explicitly,
    pruning part to three brands before the hash join. The full
    three-way OR then re-checks the joined rows (cheap: already
    ~1/25 of part survives).
    """
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    l = table(spark, sf_dir, "lineitem").select(  # noqa: E741
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part_pruned = p.where(
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 25))
    )
    q = F.col("l_quantity")
    full = (
        ((F.col("p_brand") == "Brand#12") & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & q.between(20, 30))
    )
    return (
        l.join(part_pruned, l.l_partkey == F.col("p_partkey"))
        .where(full)
        .agg(dsum(_revenue()).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


@query(
    "q_skyline",
    oracle="""
    WITH p AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS pc, l_quantity AS q
      FROM lineitem
    ),
    w AS (
      SELECT pc, q,
             MAX(q) OVER (ORDER BY pc
                          RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wmax,
             MAX(q) OVER (PARTITION BY pc) AS smax
      FROM p
    )
    SELECT pc AS price_cents, q AS quantity, COUNT(*) AS n_items
    FROM w
    WHERE (wmax IS NULL OR wmax < q) AND smax <= q
    GROUP BY pc, q
    """,
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): line items not dominated on
    (price ↓, quantity ↑) — no other item is both no-more-expensive and
    no-less-bulky with one strict. The classic multi-criteria shortlist
    query (Börzsönyi et al., ICDE 2001).

    For two dimensions the frontier is a running-max sweep, NOT a
    pairwise dominance join: sort by price, a row survives iff its
    quantity beats the max quantity over all strictly-cheaper rows (and
    no same-price row is strictly bulkier). The naive global RANGE
    window is a single-task sort at scale, so the sweep decomposes like
    q_gap_detect: within-band running max (window partitioned by a
    price band = price_cents div 1e5) combined with a prefix max over
    the per-band maxima (a table ~1e5× smaller — metadata-scale
    window). The oracle states the single-window form; the hash match
    proves the decomposition. Prices scale to integer cents so RANGE
    "strictly cheaper" is exact (`1 PRECEDING` on a whole-unit axis).
    """
    p = table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("pc"),
        F.col("l_quantity").alias("q"),
    )
    return (
        skyline_2d(p, band=100_000)
        .groupBy(F.col("pc").alias("price_cents"), F.col("q").alias("quantity"))
        .agg(F.count(F.lit(1)).alias("n_items"))
    )


def skyline_2d(points: DataFrame, band: int) -> DataFrame:
    """Core banded skyline sweep over (pc: long ascending-better,
    q: descending-better): returns the non-dominated rows of ``points``
    (columns pc, q preserved; duplicates kept). See q_skyline for the
    decomposition argument; extracted so property tests can drive it on
    arbitrary frames against a brute-force dominance reference."""
    p = points.withColumn("b", F.expr(f"pc div {band}"))
    in_w = (
        Window.partitionBy("b")
        .orderBy("pc")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    same_w = Window.partitionBy("pc")
    banded = p.select(
        "pc", "q", "b",
        F.max("q").over(in_w).alias("wmax"),
        F.max("q").over(same_w).alias("smax"),
    )
    band_max = p.groupBy("b").agg(F.max("q").alias("bmax"))
    prefix_w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    band_prefix = band_max.select(
        "b", F.max("bmax").over(prefix_w).alias("pmax")
    )
    joined = banded.join(band_prefix, "b", "left")
    best_cheaper = F.greatest(
        F.coalesce(F.col("wmax"), F.lit(float("-inf"))),
        F.coalesce(F.col("pmax"), F.lit(float("-inf"))),
    )
    return joined.where(
        (best_cheaper < F.col("q")) & (F.col("smax") <= F.col("q"))
    ).select("pc", "q")
