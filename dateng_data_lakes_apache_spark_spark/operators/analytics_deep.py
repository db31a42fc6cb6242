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
- Q22's country code stand-in is c_mktsegment; Q13's comment filter
  stand-in is an o_orderpriority exclusion.

Scale posture (same rules as analytics.py): every single-table predicate
sits below its join; nation/region broadcast, linear-growth dims never
pinned; correlated subqueries are hand-decorrelated to aggregate-then-
equi-join so nothing plans as a per-row nested loop; scalar subqueries
become 1-row broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..common import davg, dsum, o_davg, o_dsum
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
