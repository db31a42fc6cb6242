"""Deep decision-support shapes: the rest of the TPC-H query grammar.

``analytics.py`` covers Q3/Q4/Q5/Q10/Q14/Q18/Q19; this module completes
the family — self-joined dims (Q7/Q8), derived-dimension profit (Q9),
conditional two-class counts (Q12), outer-join distributions (Q13),
scalar-max selection (Q15), NOT-IN anti joins (Q16), correlated scalar
thresholds (Q17), double-correlated EXISTS/NOT-EXISTS (Q21), and
anti-join + scalar-average gating (Q22), plus partsupp-derived Q2/Q11
shapes. The reference (etl.py:194-226) composes one join; these pin the
full composition grammar a decision-support user expects.

Schema adaptations (the driver's star schema lacks partsupp,
l_commitdate/l_receiptdate/l_shipmode, c_phone/comment columns):
- "supply cost" derives from lineitem as min(l_extendedprice /
  l_quantity) per (part, supplier) — a deterministic per-row double.
- "late" = l_shipdate > o_orderdate + N days (receipt-vs-commit
  stand-in).
- Q22's country code stand-in is c_nationkey mod 5 (with a 1998+
  recency window on the anti join — "never ordered" is empty on this
  dense testdata); Q13's comment filter stand-in is an o_orderpriority
  exclusion; Q16's supplier blocklist stand-in is s_suppkey mod 13.

Scale posture (same rules as analytics.py): every single-table predicate
sits below its join; nation/region broadcast, linear-growth dims never
pinned; correlated subqueries are hand-decorrelated to aggregate-then-
equi-join so nothing plans as a per-row nested loop; scalar subqueries
become 1-row broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..caching import track
from ..catalog import table
from ..common import DEC, davg, dsum, o_davg, o_dsum
from ..registry import query


def _revenue() -> "F.Column":
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_O_REVENUE = "l_extendedprice * (1 - l_discount)"


@query(
    "q_starjoin_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {o_dsum('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             {_O_REVENUE} AS volume
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('NATION_1', 'NATION_2')
        AND n2.n_name IN ('NATION_1', 'NATION_2')
        AND n1.n_name <> n2.n_name
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_starjoin_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-nation shipping volume (TPC-H Q7 shape): revenue flowing
    between a nation pair, split by direction and ship year.

    The nation dim appears TWICE (supplier side and customer side) —
    both copies are filtered to the two target nations BEFORE their
    broadcast joins, so each join prunes its fact side to ~2/25
    immediately; the cross-side inequality (supp ≠ cust) is the only
    residual predicate. Facts join on natural keys (shuffle, AQE), and
    the two-year ship window pushes into the lineitem scan.
    """
    pair = ("NATION_1", "NATION_2")
    l = (  # noqa: E741
        table(spark, sf_dir, "lineitem")
        .where((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01"))
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation")
    n1 = n.where(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.where(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(_revenue()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q_starjoin_mktshare",
    oracle=f"""
    SELECT o_year,
           {o_dsum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END")}
             / {o_dsum('volume')} AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             {_O_REVENUE} AS volume,
             n1.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      JOIN region   ON n2.n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
        AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
    ) all_sales
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q_starjoin_mktshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): NATION_3's share of
    ECONOMY-part revenue sold into EUROPE-region customers, per year.

    Eight tables. The selective dims (part type = 1/6, region = 1/5)
    filter below their joins; the supplier-side nation join keeps ALL
    nations (the share's denominator needs them) while the customer-side
    nation chain ends at the region filter. Share = conditional decimal
    sum / total decimal sum → bit-identical IEEE division.
    """
    l = table(spark, sf_dir, "lineitem").select(  # noqa: E741
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = (
        table(spark, sf_dir, "orders")
        .where((F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region"))
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE").select("r_regionkey")
    vol = _revenue()
    nat_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == r.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((dsum(nat_vol) / dsum(vol)).alias("mkt_share"))
        .orderBy("o_year")
    )


# Stand-in supply cost (schema has no partsupp): 5% of the part's retail
# price per unit. Deterministic, part-dependent, and forces the part join
# into the profit expression exactly where ps_supplycost would sit.
_O_COST = "l_quantity * p_retailprice * 0.05"


@query(
    "q_starjoin_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           {o_dsum(f'{_O_REVENUE} - {_O_COST}')} AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year
    ORDER BY n_name, o_year DESC
    """,
)
def q_starjoin_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-line profit (TPC-H Q9 shape): per supplier-nation,
    per order-year profit on parts whose name contains a token.

    The LIKE filter prunes part before the hash join (substring match
    can't push to parquet, but it runs pre-join on the small dim); the
    profit expression spans lineitem and part columns, so it's computed
    post-join and accumulated as exact decimal. No date filter — this is
    the full-history scan shape, the widest agg in the family.
    """
    l = table(spark, sf_dir, "lineitem").select(  # noqa: E741
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = _revenue() - F.col("l_quantity") * F.col("p_retailprice") * F.lit(0.05)
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(profit).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@query(
    "q_starjoin_latecheck",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def q_starjoin_latecheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-shipment priority check (TPC-H Q12 shape): lines shipped
    more than 60 days after ordering, counted by line status ×
    urgent/non-urgent priority class in one conditional-aggregate pass.

    The ship-year predicate pushes to the lineitem scan; the cross-table
    lateness inequality evaluates post-join (it can't prune either scan
    alone). Both CASE branches aggregate in the same partial-agg pass —
    one shuffle of two counters per status, never two query runs.
    """
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    l = (  # noqa: E741
        table(spark, sf_dir, "lineitem")
        .where((F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01"))
        .select("l_orderkey", "l_shipdate", "l_linestatus")
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q_starjoin_custdist",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust
    GROUP BY c_count
    """,
)
def q_starjoin_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-count distribution over customers (TPC-H Q13 shape): how
    many customers placed 0, 1, 2, … qualifying orders — the LEFT join
    is load-bearing (zero-order customers must appear in the 0 bucket,
    which an inner join silently drops).

    Two chained hash aggs: per-customer count after the outer join
    (shuffle on custkey — the join and the first agg share it), then the
    tiny count-of-counts. The priority exclusion stands in for Q13's
    comment regex (schema has no comment column) and sits in the JOIN
    condition, not a WHERE — pushing it to WHERE would turn the outer
    join inner.
    """
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q_starjoin_topsupp",
    # Q15's view is one quarter of shipped revenue per supplier; the
    # scalar MAX pick must use the DECIMAL revenue (double equality on
    # independently-summed floats would be engine-dependent).
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8)))
               AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate < TIMESTAMP '1998-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_rev AS DOUBLE) AS total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def q_starjoin_topsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier by quarterly revenue (TPC-H Q15 shape): the scalar
    "= (SELECT MAX(...))" selection, decorrelated as a 1-row aggregate
    broadcast-joined back onto the revenue table — never a second scan
    of lineitem and never a single-task global window.

    The max comparison happens on the DECIMAL revenue: two engines
    summing doubles in different orders can disagree in the last ulp,
    and a scalar-max filter turns that ulp into a different ROW — the
    decimal accumulation makes the pick exact. Ties (several suppliers
    at the max) all emit, exactly as in TPC-H.
    """
    l = (  # noqa: E741
        table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-04-01")
        )
        .select("l_suppkey", _revenue().alias("rev"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("rev").cast("decimal(30,8)")).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_rev == mx.mx)
        .join(s, rev.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_rev"))
    )


@query(
    "q_starjoin_smallqty",
    oracle=f"""
    WITH pa AS (
      SELECT l_partkey, {o_davg('l_quantity')} AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST({o_dsum('l.l_extendedprice')} / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
      AND l.l_quantity < 0.2 * pa.avg_qty
    """,
)
def q_starjoin_smallqty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): the correlated
    "quantity < 0.2 × this part's average" subquery, hand-decorrelated
    into a per-part aggregate equi-joined back to lineitem — the plan
    shape that keeps a per-row nested-loop subquery out of a 100 TB
    fact table.

    The per-part average is decimal-sum/count (davg) so the 0.2×
    threshold is identical across engines; the brand filter prunes the
    part side before its join and reaches the scan.
    """
    l = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pa = l.groupBy("l_partkey").agg(davg(F.col("l_quantity")).alias("avg_qty"))
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .select("p_partkey")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(pa, "l_partkey")
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((dsum(F.col("l_extendedprice")) / 7.0).cast("double").alias("avg_yearly"))
    )


@query(
    "q_starjoin_waiting",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
      SELECT 1 FROM late l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
    )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def q_starjoin_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape): late lines
    on finished multi-supplier orders where this supplier was the ONLY
    late one — the double-correlated EXISTS / NOT-EXISTS, expressed as
    a semi join (some other supplier participated) chained with an anti
    join (no other supplier was late).

    Both correlations become hash joins on l_orderkey with the supplier
    inequality as a residual condition; "late" (ship > order + 60 days,
    the schema's receipt/commit stand-in) is computed once and reused by
    both the driving set and the anti side. Top-10 with name tiebreak is
    TakeOrderedAndProject.
    """
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    l = table(spark, sf_dir, "lineitem").select(  # noqa: E741
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    late = track(late)  # drives the main set AND the anti side; session owns caches
    l2 = l.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    only_late = (
        late.join(
            l2,
            (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        only_late.join(s, only_late.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@query(
    "q_starjoin_globalsales",
    oracle=f"""
    WITH pool AS (
      SELECT c_custkey, c_acctbal, CAST(c_nationkey % 5 AS INT) AS cntry
      FROM customer
      WHERE c_nationkey % 5 IN (0, 1, 2)
    ),
    threshold AS (
      SELECT {o_davg('c_acctbal')} AS avg_bal FROM pool WHERE c_acctbal > 0
    )
    SELECT p.cntry,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           {o_dsum('p.c_acctbal')} AS totacctbal
    FROM pool p, threshold t
    WHERE p.c_acctbal > t.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = p.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1998-01-01'
      )
    GROUP BY p.cntry
    """,
)
def q_starjoin_globalsales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dormant high-balance prospects (TPC-H Q22 shape): customers in
    selected country bands with above-average balances and no RECENT
    orders — scalar-average gating plus an anti join. (TPC-H's "never
    ordered" predicate is empty on this dense testdata — every customer
    has orders — so the anti side is the 1998+ window, which keeps the
    driver's green row non-vacuous at every SF.)

    The scalar average is a 1-row aggregate broadcast onto the pool (no
    per-row subquery); the NOT EXISTS is a left-anti hash join on
    custkey against date-pruned orders, which only ships the custkey
    column. The country band (nationkey mod 5) stands in for Q22's
    phone-prefix country code. Decimal accumulation keeps the threshold
    and the sums engine-exact.
    """
    pool = (
        table(spark, sf_dir, "customer")
        .where((F.col("c_nationkey") % 5).isin(0, 1, 2))
        .select(
            "c_custkey",
            "c_acctbal",
            (F.col("c_nationkey") % 5).cast("int").alias("cntry"),
        )
    )
    thr = pool.where(F.col("c_acctbal") > 0).agg(
        davg(F.col("c_acctbal")).alias("avg_bal")
    )
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "1998-01-01")
        .select("o_custkey")
    )
    return (
        pool.join(F.broadcast(thr), F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, pool.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntry")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


@query(
    "q_starjoin_mincost",
    # unit cost = l_extendedprice / l_quantity is one IEEE division on
    # doubles — bit-identical across engines; MIN over exact values is
    # exact, so the (part, min-cost) equality join is deterministic.
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem WHERE l_quantity > 0
      GROUP BY l_partkey, l_suppkey
    ),
    best AS (
      SELECT l_partkey, MIN(unit_cost) AS min_cost FROM cost GROUP BY l_partkey
    )
    SELECT c.l_partkey AS p_partkey, c.l_suppkey AS s_suppkey,
           s.s_name, n.n_name AS nation, c.unit_cost AS min_cost
    FROM cost c
    JOIN best b ON c.l_partkey = b.l_partkey AND c.unit_cost = b.min_cost
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
    ORDER BY min_cost, p_partkey, s_suppkey
    LIMIT 20
    """,
)
def q_starjoin_mincost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest supplier per part (TPC-H Q2 shape, partsupp derived from
    lineitem): the correlated "cost = (SELECT MIN(cost) ... same part)"
    subquery, decorrelated into a per-part minimum joined back on
    (part, cost) equality — ties (several suppliers at the minimum) all
    survive, exactly like Q2.

    The supply cost derives from lineitem (min unit price per
    part-supplier pair) since the driver's schema has no partsupp; the
    region filter walks supplier→nation⋈region with both dims broadcast.
    """
    l = (  # noqa: E741
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") > 0)
        .select(
            "l_partkey",
            "l_suppkey",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("uc"),
        )
    )
    cost = l.groupBy("l_partkey", "l_suppkey").agg(F.min("uc").alias("unit_cost"))
    best = cost.groupBy(F.col("l_partkey").alias("bp")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        cost.join(
            best,
            (cost.l_partkey == F.col("bp")) & (cost.unit_cost == F.col("min_cost")),
        )
        .join(s, cost.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("s_suppkey"),
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("unit_cost").alias("min_cost"),
        )
        .orderBy("min_cost", "p_partkey", "s_suppkey")
        .limit(20)
    )


@query(
    "q_starjoin_stockshare",
    oracle=f"""
    WITH supp_in AS (
      SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_nationkey % 5 = 0
    ),
    val AS (
      SELECT l.l_partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(30,8))) AS pv_dec
      FROM lineitem l JOIN supp_in s ON l.l_suppkey = s.s_suppkey
      GROUP BY l.l_partkey
    ),
    total AS (SELECT SUM(pv_dec) AS tv_dec FROM val)
    SELECT v.l_partkey AS p_partkey, CAST(v.pv_dec AS DOUBLE) AS part_value
    FROM val v, total t
    WHERE CAST(v.pv_dec AS DOUBLE) > CAST(t.tv_dec AS DOUBLE) * 0.001
    ORDER BY part_value DESC, p_partkey
    LIMIT 20
    """,
)
def q_starjoin_stockshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disproportionate-value parts (TPC-H Q11 shape): parts whose
    shipped value from one nation band exceeds 0.1% of that band's total
    — a per-key aggregate gated by a scalar fraction of the SAME
    aggregate's grand total.

    The grand total re-aggregates the per-part table (tiny), never the
    fact table twice, and joins back as a broadcast scalar. Both the
    per-part values AND the grand total accumulate as DECIMAL(30,8) —
    summing the per-part doubles would make the total summation-order-
    dependent and the 0.001 gate could flip a borderline row between
    engines (ADVICE r2). Each side of the comparison is a single
    decimal→double cast (+ one IEEE multiply), the same deterministic
    path every other oracled aggregate rides; doubles only appear in
    the final projection.
    """
    # The nation band is a real semi-join against the dim, not a
    # `s_nationkey % 5` shortcut: the shortcut silently assumes FK
    # integrity and keeps suppliers whose nation row doesn't exist
    # (hostile sweep find). The dim is 25 rows — broadcast, free.
    nat = (
        table(spark, sf_dir, "nation")
        .where(F.col("n_nationkey") % 5 == 0)
        .select("n_nationkey")
    )
    supp_in = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nat),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "semi",
        )
        .select("s_suppkey")
    )
    l = table(spark, sf_dir, "lineitem").select(  # noqa: E741
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    val = (
        l.join(supp_in, l.l_suppkey == supp_in.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(30,8)")).alias("pv_dec"))
    )
    total = val.agg(F.sum("pv_dec").alias("tv_dec"))
    return (
        val.join(
            F.broadcast(total),
            F.col("pv_dec").cast("double") > F.col("tv_dec").cast("double") * 0.001,
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("pv_dec").cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
        .limit(20)
    )


@query(
    "q_starjoin_suppcnt",
    oracle="""
    SELECT p.p_type,
           CAST(p.p_size % 5 AS INT) AS size_band,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_suppkey % 13 = 0
      )
    GROUP BY p.p_type, size_band
    """,
)
def q_starjoin_suppcnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier diversity per part segment (TPC-H Q16 shape): distinct
    suppliers able to supply each (type, size-band), excluding one brand
    and a "complaints" supplier blocklist — the NOT-IN anti join over a
    subquery, composed with COUNT(DISTINCT).

    The blocklist (suppkey mod 13, standing in for Q16's comment LIKE)
    is an anti join that only ships suppkeys; the distinct count
    shuffles (type, band, suppkey) once with partial dedup map-side.
    """
    p = (
        table(spark, sf_dir, "part")
        .where(F.col("p_brand") != "Brand#5")
        .select("p_partkey", "p_type", (F.col("p_size") % 5).cast("int").alias("size_band"))
    )
    blocked = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") % 13 == 0)
        .select("s_suppkey")
    )
    l = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")  # noqa: E741
    return (
        l.join(blocked, l.l_suppkey == blocked.s_suppkey, "left_anti")
        .join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_type", "size_band")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_abc_pareto",
    oracle="""
    WITH rev AS (
      SELECT c.c_nationkey AS nationkey, o.o_custkey,
             SUM(CAST(o.o_totalprice AS DECIMAL(30,8))) AS r
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT nationkey, o_custkey, r,
             SUM(r) OVER (PARTITION BY nationkey ORDER BY r DESC, o_custkey
                          ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(r) OVER (PARTITION BY nationkey) AS tot
      FROM rev
    ),
    classed AS (
      SELECT nationkey, r,
             CASE WHEN cum * 2 <= tot THEN 'A'
                  WHEN cum * 5 <= tot * 4 THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked
    )
    SELECT nationkey, abc,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(r) AS DOUBLE) AS class_revenue
    FROM classed
    GROUP BY nationkey, abc
    ORDER BY nationkey, abc
    """,
)
def q_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/Pareto classification: within each nation, customers ranked
    by revenue; the head covering the first half of revenue is class A,
    up to 80% is B, the long tail is C — the inventory/CRM
    prioritization analysis ("which 20% of customers are 80% of
    revenue").

    The class boundaries are INTEGER-exact: cumulative and total
    revenue accumulate as DECIMAL(30,8) and the 50%/80% cuts compare
    via cross-multiplication (cum*2 <= tot, cum*5 <= tot*4) — no float
    share ever computed, so the boundary row can't diverge cross-engine
    the way round(cum/tot, k) would. One customer-revenue aggregate,
    one per-nation window over the CUSTOMER table (orders already
    collapsed), one day-bounded final aggregate.
    """
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"), "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("r"))
    )
    w_cum = (
        Window.partitionBy("nationkey")
        .orderBy(F.desc("r"), "o_custkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy("nationkey")
    ranked = rev.select(
        "nationkey",
        "r",
        F.sum("r").over(w_cum).alias("cum"),
        F.sum("r").over(w_tot).alias("tot"),
    )
    abc = (
        F.when(F.col("cum") * 2 <= F.col("tot"), "A")
        .when(F.col("cum") * 5 <= F.col("tot") * 4, "B")
        .otherwise("C")
    )
    return (
        ranked.select("nationkey", "r", abc.alias("abc"))
        .groupBy("nationkey", "abc")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("r").cast("double").alias("class_revenue"),
        )
        .orderBy("nationkey", "abc")
    )


@query(
    "q_catalog_coverage",
    oracle="""
    WITH ordered_parts AS (
      SELECT DISTINCT l_partkey FROM lineitem
    )
    SELECT p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(COUNT(op.l_partkey) AS BIGINT) AS n_ordered,
           CAST(COUNT(*) - COUNT(op.l_partkey) AS BIGINT) AS n_dead,
           round(CAST(COUNT(op.l_partkey) AS DOUBLE) / COUNT(*), 6)
             AS coverage
    FROM part p LEFT JOIN ordered_parts op ON op.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
)
def q_catalog_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog coverage / dead-stock audit: per brand, how many parts
    have EVER been ordered vs never — the assortment-health check
    purchasing runs before delisting ("n_dead" is the candidate cull
    list's size). The LEFT join + COUNT(col) formulation counts
    matches and misses in ONE pass — no separate anti-join scan — and
    the distinct-ordered-parts build collapses lineitem to |parts|
    keys map-side before the join.
    """
    p = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem")
    ordered = li.select("l_partkey").distinct()
    hit = F.count("l_partkey")
    return (
        p.join(ordered, p.p_partkey == ordered.l_partkey, "left")
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            hit.alias("n_ordered"),
            (F.count(F.lit(1)) - hit).alias("n_dead"),
            F.round(hit.cast("double") / F.count(F.lit(1)), 6).alias("coverage"),
        )
        .select(
            "p_brand",
            F.col("n_parts").cast("bigint").alias("n_parts"),
            F.col("n_ordered").cast("bigint").alias("n_ordered"),
            F.col("n_dead").cast("bigint").alias("n_dead"),
            "coverage",
        )
        .orderBy("p_brand")
    )


@query(
    "q_order_aging",
    oracle="""
    WITH mx AS (SELECT MAX(o_orderdate) AS asof_ts FROM orders),
    aged AS (
      SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                 CAST(asof_ts AS DATE)) <= 30 THEN '0-30'
                  WHEN date_diff('day', CAST(o_orderdate AS DATE),
                                 CAST(asof_ts AS DATE)) <= 90 THEN '31-90'
                  ELSE '91+' END AS age_bucket,
             o_totalprice
      FROM orders, mx WHERE o_orderstatus = 'O'
    )
    SELECT age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_open,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
             AS open_value
    FROM aged
    GROUP BY age_bucket
    ORDER BY age_bucket
    """,
)
def q_order_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order aging report: outstanding ('O') orders bucketed by
    days since placement as of the dataset's newest order date — the
    receivables/backlog triage every ops dashboard carries (the 91+
    bucket is the escalation queue).

    One scan with the as-of date broadcast from a 1-row aggregate;
    integer day arithmetic buckets exactly, value sums accumulate as
    DECIMAL(30,8). The same shape ages anything with a status + date
    (tickets, shipments, invoices).
    """
    o = table(spark, sf_dir, "orders")
    asof = o.agg(F.max("o_orderdate").alias("asof_ts"))
    age = F.datediff(F.to_date("asof_ts"), F.to_date("o_orderdate"))
    bucket = (
        F.when(age <= 30, "0-30").when(age <= 90, "31-90").otherwise("91+")
    )
    return (
        o.where(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(asof))
        .select(bucket.alias("age_bucket"), "o_totalprice")
        .groupBy("age_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_open"),
            dsum(F.col("o_totalprice")).alias("open_value"),
        )
        .orderBy("age_bucket")
    )
