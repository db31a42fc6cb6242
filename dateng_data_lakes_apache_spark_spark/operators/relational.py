"""Scan / filter / projection / conditional operators.

Mirrors the reference's S1-S5 scans, P1/P2 projections, F1 filter and
D1-D3 derivations (SURVEY §2.1; etl.py:106,116,149,153,156,166-172)
over the engine catalog tables. All scans are parquet + Catalyst, so
predicate pushdown and column pruning reach the file scan for free —
verified in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query


@query(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + column projection (reference P1, etl.py:116).

    Column pruning: the parquet ReadSchema carries only these 4 of
    lineitem's 11 columns — at 100 TB that is the difference between
    reading ~36% and 100% of the table bytes.
    """
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )


@query(
    "q_filter_eq",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def q_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality filter (reference F1: page='NextSong', etl.py:153).

    The predicate is pushed to the parquet scan (PushedFilters:
    EqualTo(event_type,purchase)) → row-group dictionary pruning.
    """
    return (
        table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "event_type", "value")
    )


@query(
    "q_filter_range",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.08
    """,
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range + conjunctive filter; min/max row-group pruning on l_shipdate."""
    li = table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.02, 0.08)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@query(
    "q_filter_in_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#7', 'Brand#13')
      AND p_type LIKE '%AND%'
      AND p_name IS NOT NULL
    """,
)
def q_filter_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + LIKE + null predicate in one conjunction."""
    p = table(spark, sf_dir, "part")
    return p.where(
        F.col("p_brand").isin("Brand#1", "Brand#7", "Brand#13")
        & F.col("p_type").like("%AND%")
        & F.col("p_name").isNotNull()
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


@query(
    "q_project_rename_cast",
    oracle="""
    SELECT l_orderkey AS order_id,
           l_linenumber AS line_no,
           CAST(l_quantity AS BIGINT) AS qty_int,
           CAST(l_extendedprice AS VARCHAR) AS price_str,
           CAST(CAST(l_tax AS DECIMAL(10,2)) AS DOUBLE) AS tax_round_trip
    FROM lineitem
    """,
)
def q_project_rename_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + alias renames + casts (reference P2, etl.py:166-172
    camelCase→snake_case renames)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("line_no"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        F.col("l_extendedprice").cast("string").alias("price_str"),
        # decimal cast exercised, then back to double: engines' client layers
        # disagree on decimal value rendering, doubles compare exactly
        F.col("l_tax").cast("decimal(10,2)").cast("double").alias("tax_round_trip"),
    )


@query(
    "q_null_funcs",
    oracle="""
    SELECT c.c_custkey,
           coalesce(o.o_totalprice, 0.0) AS price_or_zero,
           ifnull(o.o_orderpriority, 'NONE') AS priority_or_none,
           nullif(c.c_mktsegment, 'BUILDING') AS seg_nullified,
           CAST(o.o_orderkey IS NULL AS BOOLEAN) AS has_no_order,
           coalesce(o.o_orderstatus, c.c_mktsegment, '?') AS first_non_null
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalars (coalesce/ifnull/nullif/IS NULL) exercised
    on real nulls produced by an outer join."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.coalesce(F.col("o_totalprice"), F.lit(0.0)).alias("price_or_zero"),
        F.ifnull(F.col("o_orderpriority"), F.lit("NONE")).alias("priority_or_none"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_nullified"),
        F.col("o_orderkey").isNull().alias("has_no_order"),
        F.coalesce("o_orderstatus", "c_mktsegment", F.lit("?")).alias("first_non_null"),
    )


@query(
    "q_case_when",
    oracle="""
    SELECT o_orderkey,
           o_totalprice,
           CASE WHEN o_totalprice >= 400000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small' END AS price_band,
           CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS is_open
    FROM orders
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expressions (CASE WHEN / multi-branch)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_totalprice") >= 400000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "O", 1).otherwise(0).alias("is_open"),
    )


@query(
    "q_merge_upsert",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey,
             round(o_totalprice * 1.1, 2) AS new_price,
             'REPRICED' AS new_status
      FROM orders WHERE o_orderkey % 100 = 0
    )
    SELECT o.o_orderkey,
           o.o_custkey,
           COALESCE(u.new_price, o.o_totalprice) AS o_totalprice,
           COALESCE(u.new_status, o.o_orderstatus) AS o_orderstatus,
           CASE WHEN u.o_orderkey IS NOT NULL THEN 1 ELSE 0 END AS was_updated
    FROM orders o LEFT JOIN updates u ON o.o_orderkey = u.o_orderkey
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE / upsert as a snapshot rewrite: target LEFT JOIN updates,
    COALESCE per column — matched rows take the update, unmatched pass
    through. This is the lakehouse UPSERT primitive when the table
    format has no transactional MERGE: one hash join on the key (updates
    side broadcast when small), one full snapshot write, atomic via
    directory swap. Inserts are the same plan with a full outer join.
    """
    o = table(spark, sf_dir, "orders")
    updates = (
        o.where(F.col("o_orderkey") % 100 == 0)
        .select(
            F.col("o_orderkey").alias("u_key"),
            F.round(F.col("o_totalprice") * 1.1, 2).alias("new_price"),
            F.lit("REPRICED").alias("new_status"),
        )
    )
    merged = o.join(F.broadcast(updates), o.o_orderkey == updates.u_key, "left")
    return merged.select(
        "o_orderkey",
        "o_custkey",
        F.coalesce("new_price", "o_totalprice").alias("o_totalprice"),
        F.coalesce("new_status", "o_orderstatus").alias("o_orderstatus"),
        F.when(F.col("u_key").isNotNull(), 1).otherwise(0).alias("was_updated"),
    )


@query(
    "q_melt_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, val
    FROM (
      SELECT l_orderkey, l_linenumber,
             l_quantity, l_extendedprice, l_discount, l_tax
      FROM lineitem WHERE l_orderkey < 2000
    )
    UNPIVOT (val FOR measure IN (l_quantity, l_extendedprice, l_discount, l_tax))
    """,
)
def q_melt_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (melt/UNPIVOT): the four lineitem measures
    become (measure, val) rows keyed by line — the canonical feed for
    generic per-metric pipelines (profiling, drift monitors, metric
    stores) that must not hard-code column lists downstream.

    ``DataFrame.unpivot`` plans as a Generate (expand) projection —
    map-only, zero shuffle, 4× row fan-out strictly in the executor —
    the same scale shape as explode. NULL measures are dropped
    EXPLICITLY: Spark's unpivot keeps them while SQL UNPIVOT (DuckDB
    included) excludes them by default (hostile sweep find) — the
    SQL convention is the tidy-data one, so the filter makes the
    cross-engine semantics explicit instead of accidental.
    """
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 2000)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    ).where(F.col("val").isNotNull())
