"""Data-quality audit operators: column profiling and constraint checks.

A lake pipeline that feeds model training needs machine-checkable data
contracts, not eyeballed ``df.show()`` (the reference's only QA —
etl.py:107,157). These operators emit the audit artifacts themselves as
DataFrames, so quality gates compose with the rest of the engine and
run distributed.

Scale posture: the profile is ONE pass over the table (a single wide
aggregate, unpivoted driver-side-free via ``stack``); exact distinct
counts use Spark's Expand-based multi-distinct — the scale escape hatch
is ``approx_count_distinct`` (see q_agg_approx_distinct), swapped by
flag where ±2% suffices. Constraint checks are aggregates and one
anti-join; nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..common import o_dsum
from ..registry import query

# (column, render-SQL) — render casts min/max to a canonical string per
# type so one stack() output column can carry them all: decimals keep 2
# digits (exact for the data's 2-decimal prices), timestamps use the
# engine's canonical 'yyyy-MM-dd HH:mm:ss'.
_PROFILE_COLS: tuple[tuple[str, str], ...] = (
    ("o_orderkey", "CAST({v} AS STRING)"),
    ("o_custkey", "CAST({v} AS STRING)"),
    ("o_orderstatus", "CAST({v} AS STRING)"),
    ("o_totalprice", "CAST(CAST({v} AS DECIMAL(18,2)) AS STRING)"),
    ("o_orderdate", "date_format({v}, 'yyyy-MM-dd HH:mm:ss')"),
    ("o_orderpriority", "CAST({v} AS STRING)"),
)

_DUCK_RENDER = {
    "o_totalprice": "CAST(CAST({v} AS DECIMAL(18,2)) AS VARCHAR)",
    "o_orderdate": "strftime({v}, '%Y-%m-%d %H:%M:%S')",
}


def _profile_oracle() -> str:
    parts = []
    for col, _ in _PROFILE_COLS:
        render = _DUCK_RENDER.get(col, "CAST({v} AS VARCHAR)")
        parts.append(
            f"""
            SELECT '{col}' AS col_name,
                   COUNT(*) AS row_count,
                   COUNT({col}) AS non_null_count,
                   COUNT(DISTINCT {col}) AS distinct_count,
                   {render.format(v=f'MIN({col})')} AS min_value,
                   {render.format(v=f'MAX({col})')} AS max_value
            FROM orders"""
        )
    return " UNION ALL ".join(parts)


@query("q_dq_profile", oracle=_profile_oracle())
def q_dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profile of ``orders``: per column, the row
    count, non-null count, exact distinct count, and canonical-string
    min/max.

    All 6×4 statistics come from ONE wide aggregate (one scan, one
    reduce); the wide row is then unpivoted to (column, stats) rows with
    ``stack`` — a Generate node over a 1-row DataFrame, no shuffle and
    no driver loop. Exact multi-distinct plans as a 6-way Expand: the
    deliberate oracle-exact choice; at petabyte row counts swap in
    approx_count_distinct (HLL, one pass, no Expand).
    """
    o = table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("row_count")]
    for col, render in _PROFILE_COLS:
        aggs += [
            F.count(col).alias(f"nn_{col}"),
            F.countDistinct(col).alias(f"nd_{col}"),
            F.expr(render.format(v=f"MIN({col})")).alias(f"mn_{col}"),
            F.expr(render.format(v=f"MAX({col})")).alias(f"mx_{col}"),
        ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{col}', nn_{col}, nd_{col}, mn_{col}, mx_{col}" for col, _ in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_args}) "
            "AS (col_name, non_null_count, distinct_count, min_value, max_value)"
        ),
        "row_count",
    ).select(
        "col_name", "row_count", "non_null_count", "distinct_count", "min_value", "max_value"
    )


@query(
    "q_dq_constraints",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM orders) AS row_count,
      (SELECT COUNT(*) FROM (
         SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
      )) AS dup_orderkeys,
      (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS null_custkeys,
      (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0) AS price_violations,
      (SELECT COUNT(*) FROM orders
        WHERE o_orderstatus NOT IN ('F', 'O', 'P')) AS status_violations,
      (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      ) AS fk_orphan_lineitems
    """,
)
def q_dq_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint audit in one row: primary-key duplicates, null keys,
    range violations, enum violations, and foreign-key orphans
    (lineitems referencing no order).

    Null/range/enum counts share one conditional-sum pass over orders;
    PK duplicates are a groupBy-HAVING on the key (map-side partial
    count, ~8 B/key shuffle); FK orphans are a left-anti join on the
    join key — the same shuffle an equi-join would pay, never a
    collected key set. The three 1-row results cross-join by broadcast.
    """
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").select("l_orderkey")  # noqa: E741
    # count(when(cond, 1)) not sum(when(...)): SUM over an EMPTY audit
    # target is NULL, turning "no violations" into unknown — a
    # conditional COUNT is 0 there, matching the oracle's scalar counts
    # (empty-catalog sweep find).
    passes = o.agg(
        F.count(F.lit(1)).alias("row_count"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_custkeys"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("price_violations"),
        F.count(
            F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1)
        ).alias("status_violations"),
    )
    dups = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .agg(F.count(F.lit(1)).alias("dup_orderkeys"))
    )
    orphans = l.join(
        o.select("o_orderkey"), l.l_orderkey == F.col("o_orderkey"), "left_anti"
    ).agg(F.count(F.lit(1)).alias("fk_orphan_lineitems"))
    return (
        passes.crossJoin(F.broadcast(dups))
        .crossJoin(F.broadcast(orphans))
        .select(
            "row_count",
            "dup_orderkeys",
            "null_custkeys",
            "price_violations",
            "status_violations",
            "fk_orphan_lineitems",
        )
    )


@query(
    "q_gap_detect",
    oracle="""
    WITH k AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
    g AS (SELECT k, LAG(k) OVER (ORDER BY k) AS pk FROM k)
    SELECT pk + 1 AS gap_start,
           k - 1 AS gap_end,
           CAST(k - pk - 1 AS BIGINT) AS gap_len
    FROM g WHERE k - pk > 1
    """,
)
def q_gap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-ID range detection: gaps in lineitem's l_orderkey
    coverage — the completeness audit run on any ingested ID space
    ("did the CDC feed drop a range?"). Here the gaps are real:
    orderkeys with zero line items (the testdata's orders outnumber
    lineitem's distinct orderkeys), so the driver's green row checks
    actual gap ranges, not an empty ≡ empty result.

    The naive form is LAG over ALL keys globally ordered — a
    single-task sort at scale. This version decomposes into:
    (1) within-bucket gaps: window partitioned by bucket = key div 1024
        (bounded partitions, full parallelism);
    (2) boundary gaps: per-bucket (min, max) aggregate — a table 1024×
        smaller than the key space — then LAG over buckets pairs each
        bucket's min with the previous PRESENT bucket's max, which also
        captures entirely-missing buckets.
    Every consecutive key pair either shares a bucket (case 1) or
    straddles buckets (case 2), so the union equals the naive LAG
    result — the oracle states the naive form and the hash match proves
    the decomposition. The bucket-level window orders ~|keys|/1024 rows
    (metadata-scale); at 100 TB push one more 1024× level if needed.
    """
    keys = table(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k"))
    return id_gaps(keys, bucket_w=1024)


def id_gaps(keys: DataFrame, bucket_w: int) -> DataFrame:
    """Core bucketed gap sweep over a column ``k``: returns
    (gap_start, gap_end, gap_len) for every maximal missing range of
    the distinct key set. See q_gap_detect for the decomposition
    argument; extracted so property tests can drive it on arbitrary
    key sets against the naive LAG reference."""
    keys = keys.distinct().withColumn("b", F.expr(f"k div {bucket_w}"))
    in_w = Window.partitionBy("b").orderBy("k")
    within = (
        keys.withColumn("pk", F.lag("k").over(in_w))
        .where(F.col("k") - F.col("pk") > 1)
        .select("k", "pk")
    )
    bounds = keys.groupBy("b").agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
    b_w = Window.orderBy("b")
    boundary = (
        bounds.withColumn("pk", F.lag("hi").over(b_w))
        .where(F.col("lo") - F.col("pk") > 1)
        .select(F.col("lo").alias("k"), "pk")
    )
    return within.unionByName(boundary).select(
        (F.col("pk") + 1).alias("gap_start"),
        (F.col("k") - 1).alias("gap_end"),
        (F.col("k") - F.col("pk") - 1).cast("bigint").alias("gap_len"),
    )


@query(
    "q_observe_metrics",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           CAST(COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END) AS BIGINT)
             AS n_null_price,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
           {o_dsum('o_totalprice')} AS sum_price
    FROM orders
    """,
)
def q_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via ``df.observe``: data-quality metrics
    (row count, null count, key range, checksum-style total) accumulate
    ON THE SAME PASS as the observed job — zero extra scans, which is
    the entire point at 100 TB (a separate audit query would double the
    I/O bill; the reference's only QA was df.show, SURVEY §5.1).

    The observed job here is a representative downstream write (noop
    aggregation over the same rows); the returned DataFrame carries the
    harvested metrics, and the oracle recomputes them relationally —
    proving the observation channel reports exactly what a full audit
    query would.
    """
    from pyspark.sql import Observation

    o = table(spark, sf_dir, "orders")
    obs = Observation("orders_audit")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null_price"),
        F.min("o_orderkey").cast("bigint").alias("min_key"),
        F.max("o_orderkey").cast("bigint").alias("max_key"),
        # decimal accumulation, then ONE cast to double inside the
        # observation: the exact total correctly rounded (identical to
        # float(Decimal) driver-side), and — unlike a DecimalType metric
        # — a NULL double survives Observation.get (PySpark's toPyRow
        # crashes on a null decimal in the observed row, probed on an
        # empty input).
        F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
        .cast("double")
        .alias("sum_price_dec"),
    )
    # the observed job: any action over the observed frame populates obs
    observed.groupBy("o_orderstatus").count().write.format("noop").mode(
        "overwrite"
    ).save()
    try:
        m = obs.get
    except Exception:
        # A zero-file source collapses to a LocalRelation, the observe
        # node never executes, no ObservedMetrics event fires, and
        # Observation.get crashes converting the missing row (probed on
        # an empty catalog). The audit of a job that processed nothing
        # is the empty audit — but ONLY then: a genuine runtime failure
        # in the observed job must not be masked as a clean empty result
        # (ADVICE r6), so re-raise unless the source is provably empty.
        if not o.isEmpty():
            raise
        m = {
            "n_rows": 0,
            "n_null_price": 0,
            "min_key": None,
            "max_key": None,
            "sum_price_dec": None,
        }
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["n_null_price"],
                m["min_key"],
                m["max_key"],
                m["sum_price_dec"],
            )
        ],
        "n_rows bigint, n_null_price bigint, min_key bigint, max_key bigint, sum_price double",
    )


@query(
    "q_skew_report",
    oracle="""
    WITH kc AS (
      SELECT o_custkey AS key, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(MAX(cnt) AS BIGINT) AS max_key_rows,
           round(quantile_cont(CAST(cnt AS DOUBLE), 0.5), 4) AS p50_key_rows,
           round(quantile_cont(CAST(cnt AS DOUBLE), 0.99), 4) AS p99_key_rows,
           round(CAST(MAX(cnt) AS DOUBLE) * COUNT(*) / SUM(cnt), 4)
             AS imbalance_factor,
           round(CAST(SUM(cnt * cnt) AS DOUBLE)
                 / (CAST(SUM(cnt) AS DOUBLE) * SUM(cnt) / COUNT(*)), 4)
             AS sum_sq_ratio
    FROM kc
    """,
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnostic — the report you run BEFORE choosing
    between a plain shuffle, AQE skew-split, or salting (q_join_salted /
    q_agg_salted are the treatments; this is the diagnosis):
    per-key-count distribution summary for orders.o_custkey, including
    the imbalance factor (max key ÷ mean key — the straggler multiplier
    a plain hash shuffle would suffer) and the Σcnt²/(n·mean) ratio
    (>1 means a self-join on this key does more work than uniform keys
    would — the same Σ deg² economics as q_graph_degree).

    Two aggregations: data → per-key counts (map-side combine), then
    the KEY-COUNT table (bounded by key cardinality) → one summary row.
    Exact percentiles buffer the key-count table only — at 100 TB swap
    in the GK sketch (q_agg_approx_quantile) for the same report shape.
    """
    kc = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    c = F.col("cnt").cast("double")
    return kc.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_key_rows"),
        F.round(F.percentile(c, F.lit(0.5)), 4).alias("p50_key_rows"),
        F.round(F.percentile(c, F.lit(0.99)), 4).alias("p99_key_rows"),
        F.round(
            F.max("cnt").cast("double") * F.count(F.lit(1)) / F.sum("cnt"), 4
        ).alias("imbalance_factor"),
        F.round(
            F.sum(F.col("cnt") * F.col("cnt")).cast("double")
            / (F.sum("cnt").cast("double") * F.sum("cnt") / F.count(F.lit(1))),
            4,
        ).alias("sum_sq_ratio"),
    )


@query(
    "q_drift_psi",
    oracle="""
    WITH banded AS (
      SELECT CASE WHEN day(ts) < 16 THEN 0 ELSE 1 END AS half,
             least(CAST(floor(value / 50) AS INT), 9) AS band
      FROM events
      WHERE value IS NULL OR isfinite(value)
    ),
    counts AS (
      SELECT band,
             SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS a,
             SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS b
      FROM banded GROUP BY band
    ),
    tot AS (SELECT SUM(a) AS ta, SUM(b) AS tb FROM counts)
    SELECT CAST(10 AS INT) AS n_bands,
           round(SUM(
             (CAST(c.a + 1 AS DOUBLE) / (t.ta + 10)
              - CAST(c.b + 1 AS DOUBLE) / (t.tb + 10))
             * LN((CAST(c.a + 1 AS DOUBLE) / (t.ta + 10))
                  / (CAST(c.b + 1 AS DOUBLE) / (t.tb + 10)))
           ), 4) AS psi
    FROM counts c, tot t
    """,
)
def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the event month — the ML-monitoring drift metric (PSI < 0.1 stable,
    > 0.25 retrain): value distribution banded into 10 fixed-width
    buckets, PSI = Σ (pₐ−p_b)·ln(pₐ/p_b) with add-one smoothing so
    empty bands never divide by zero, deterministically on both
    engines (the smoothed proportions are ratios of identical ints).

    One pass to banded counts (the band table is 10 rows — everything
    after the first aggregate is metadata-scale); ln() appears only in
    the final 10-row reduction and the result is rounded before
    reporting, the same libm discipline as q_text_entropy.
    """
    from ..common import finite

    # finite-or-NULL only (r9 nonfinite catalog): floor(NaN)→int is 0
    # in Spark but an error in DuckDB — a drift monitor must quarantine
    # corrupt observations, not bucket them.
    ev = table(spark, sf_dir, "events").where(
        F.col("value").isNull() | finite(F.col("value"))
    )
    banded = ev.select(
        F.when(F.dayofmonth("ts") < 16, 0).otherwise(1).alias("half"),
        F.least(F.floor(F.col("value") / 50).cast("int"), F.lit(9)).alias("band"),
    )
    counts = banded.groupBy("band").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("b"),
    )
    tot = counts.agg(F.sum("a").alias("ta"), F.sum("b").alias("tb"))
    j = counts.crossJoin(F.broadcast(tot))
    pa = (F.col("a") + 1).cast("double") / (F.col("ta") + 10)
    pb = (F.col("b") + 1).cast("double") / (F.col("tb") + 10)
    return j.agg(
        F.lit(10).cast("int").alias("n_bands"),
        F.round(F.sum((pa - pb) * F.log(pa / pb)), 4).alias("psi"),
    )


@query(
    "q_ab_test",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS grp,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 15
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT grp, COUNT(*) AS n, SUM(converted) AS k
      FROM u GROUP BY grp
    ),
    wide AS (
      SELECT MAX(CASE WHEN grp = 0 THEN n END) AS n0,
             MAX(CASE WHEN grp = 0 THEN k END) AS k0,
             MAX(CASE WHEN grp = 1 THEN n END) AS n1,
             MAX(CASE WHEN grp = 1 THEN k END) AS k1
      FROM g
    )
    SELECT CAST(n0 AS BIGINT) AS n_control, CAST(k0 AS BIGINT) AS conv_control,
           CAST(n1 AS BIGINT) AS n_treat, CAST(k1 AS BIGINT) AS conv_treat,
           round(CAST(k1 AS DOUBLE) / n1 - CAST(k0 AS DOUBLE) / n0, 4) AS lift,
           round((CAST(k1 AS DOUBLE) / n1 - CAST(k0 AS DOUBLE) / n0)
                 / sqrt((CAST(k0 + k1 AS DOUBLE) / (n0 + n1))
                        * (1 - CAST(k0 + k1 AS DOUBLE) / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1)), 4) AS z_score
    FROM wide
    """,
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test between experiment arms (user_id parity
    stands in for assignment): per-user conversion — defined as ≥ 15
    purchases ("power buyer"), a threshold sized so BOTH arms carry
    real variance on this corpus (every synthetic user purchases at
    least once, which would degenerate the pooled variance to zero) —
    and the pooled-variance z statistic, the significance readout every
    product experiment ends with.

    Per-user conversion is one hash agg; the arm table is 2 rows;
    everything after is scalar arithmetic over identical integer counts
    on both engines, so the z-score is bit-deterministic. At 100 TB the
    only data-sized stage is the per-user MAX — map-side combinable and
    assignment-key partitioned.
    """
    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.when(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) >= 15, 1
        ).otherwise(0).alias("converted")
    ).select((F.col("user_id") % 2).cast("int").alias("grp"), "converted")
    g = u.groupBy("grp").agg(F.count(F.lit(1)).alias("n"), F.sum("converted").alias("k"))
    wide = g.agg(
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("grp") == 0, F.col("k"))).alias("k0"),
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == 1, F.col("k"))).alias("k1"),
    )
    r0 = F.col("k0").cast("double") / F.col("n0")
    r1 = F.col("k1").cast("double") / F.col("n1")
    pool = (F.col("k0") + F.col("k1")).cast("double") / (F.col("n0") + F.col("n1"))
    z = (r1 - r0) / F.sqrt(
        pool * (1 - pool) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
    )
    return wide.select(
        F.col("n0").cast("bigint").alias("n_control"),
        F.col("k0").cast("bigint").alias("conv_control"),
        F.col("n1").cast("bigint").alias("n_treat"),
        F.col("k1").cast("bigint").alias("conv_treat"),
        F.round(r1 - r0, 4).alias("lift"),
        F.round(z, 4).alias("z_score"),
    )


_K_ANON = 5


@query(
    "q_kanonymity",
    oracle=f"""
    SELECT CAST(c_nationkey AS INT) AS c_nationkey,
           c_mktsegment,
           CAST(floor(c_acctbal / 2000) AS INT) AS bal_band,
           CAST(COUNT(*) AS BIGINT) AS k
    FROM customer
    GROUP BY 1, 2, 3
    HAVING COUNT(*) < {_K_ANON}
    """,
)
def q_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (nation,
    market segment, account-balance band): every equivalence class with
    fewer than k=5 members is a re-identification risk — the
    privacy gate a training-data release runs AFTER direct-identifier
    removal (q_pii_redact strips direct PII; this catches the indirect
    combination attack, Sweeney 2002). Returned rows are the classes to
    suppress or generalize before release.

    One groupBy on the quasi-identifier tuple + HAVING — the same
    map-side-combinable aggregate shape as any distinct-count audit, so
    the cost at 100 TB is one shuffle of class keys. The balance band
    uses floor division (negative balances land in negative bands on
    both engines); k is scale-dependent by design — the at-risk set
    shrinks as real data grows, which is exactly what the audit reports.
    """
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy(
            F.col("c_nationkey").cast("int").alias("c_nationkey"),
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 2000).cast("int").alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).alias("k"))
        .where(F.col("k") < _K_ANON)
    )


_DP_EPS = 1.0  # Laplace scale b = sensitivity/epsilon = 1/eps for counts


@query(
    "q_dp_noisy_count",
    oracle=f"""
    WITH cnt AS (
      SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS true_n
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1
    ),
    unif AS (
      SELECT n_name, true_n,
             (CAST((instr('0123456789abcdef', substr(md5(n_name),1,1))-1)*268435456
                 + (instr('0123456789abcdef', substr(md5(n_name),2,1))-1)*16777216
                 + (instr('0123456789abcdef', substr(md5(n_name),3,1))-1)*1048576
                 + (instr('0123456789abcdef', substr(md5(n_name),4,1))-1)*65536
                 + (instr('0123456789abcdef', substr(md5(n_name),5,1))-1)*4096
                 + (instr('0123456789abcdef', substr(md5(n_name),6,1))-1)*256
                 + (instr('0123456789abcdef', substr(md5(n_name),7,1))-1)*16
                 + (instr('0123456789abcdef', substr(md5(n_name),8,1))-1) AS DOUBLE)
              + 0.5) / 4294967296.0 AS u
      FROM cnt
    )
    SELECT n_name, true_n,
           round(true_n
                 + (1.0 / {_DP_EPS}) * (CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
                   * ln(1.0 - 2.0 * abs(u - 0.5)), 4) AS noisy_n
    FROM unif
    """,
)
def q_dp_noisy_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private release mechanism for counts: per-nation
    customer counts + Laplace(1/ε) noise via inverse-CDF sampling —
    completing the privacy family (q_pii_redact strips direct
    identifiers, q_kanonymity audits indirect ones, q_gdpr_erase
    deletes on request; this is the aggregate-release side). The
    uniform draw is a DETERMINISTIC md5 hash of the group key — which
    makes the mechanism testable/oracle-able and the pipeline
    reproducible, and is exactly the seeded-noise compromise a nightly
    released dashboard ships (true ε-DP swaps the hash for a secret
    per-release seed; every other line is unchanged).

    Shape: one groupBy to |nations| rows; noise is a map-side
    expression over the tiny aggregate. True counts appear alongside
    (it is a mechanism demo, not a release). Cross-engine: the uniform
    is exact integer arithmetic; sign/ln compose the same IEEE tree,
    and ln-parity at ROUND(·,4) is already proven by q_text_entropy.
    """
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    cnt = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    u = (
        F.conv(F.substring(F.md5("n_name"), 1, 8), 16, 10).cast("double") + 0.5
    ) / 4294967296.0
    noise = (1.0 / _DP_EPS) * F.when(u < 0.5, 1.0).otherwise(-1.0) * F.log(
        1.0 - 2.0 * F.abs(u - 0.5)
    )
    return cnt.select(
        "n_name",
        "true_n",
        F.round(F.col("true_n") + noise, 4).alias("noisy_n"),
    )


import math as _math

# Benford's-law expected first-digit probabilities, baked as literals
# (log10(1 + 1/d)) so neither engine runs log in the query.
_BENFORD_P = {d: round(_math.log10(1 + 1 / d), 6) for d in range(1, 10)}
_CHI2_CRIT_DF8 = 15.507  # alpha = 0.05, df = 8


@query(
    "q_benford_audit",
    oracle=f"""
    WITH fd AS (
      SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit,
             COUNT(*) AS n
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS nt FROM fd),
    expected(digit, p) AS (VALUES {", ".join(f"({d}, {p})" for d, p in _BENFORD_P.items())}),
    scored AS (
      SELECT e.digit,
             CAST(COALESCE(f.n, 0) AS BIGINT) AS n,
             round(CAST(COALESCE(f.n, 0) AS DOUBLE) / t.nt, 6) AS observed,
             e.p AS expected,
             (CAST(COALESCE(f.n, 0) AS DOUBLE) - t.nt * e.p)
               * (CAST(COALESCE(f.n, 0) AS DOUBLE) - t.nt * e.p)
               / (t.nt * e.p) AS chi2_part
      FROM expected e LEFT JOIN fd f ON e.digit = f.digit
      CROSS JOIN tot t
    )
    SELECT digit, n, observed, expected,
           round(chi2_part, 4) AS chi2_part,
           round(CAST(SUM(CAST(chi2_part AS DECIMAL(20,6))) OVER () AS DOUBLE), 4)
             AS chi2_total,
           CAST(SUM(CAST(chi2_part AS DECIMAL(20,6))) OVER () AS DOUBLE)
             <= {_CHI2_CRIT_DF8} AS benford_ok
    FROM scored
    """,
)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of ``l_extendedprice`` — the
    forensic-accounting screen for fabricated or synthetic numbers
    (naturally-grown monetary amounts follow P(d) = log10(1 + 1/d);
    uniform/invented figures do not). Per digit: observed count and
    share, the Benford expectation (literal constants), the chi-square
    contribution, and the global chi-square verdict against the df=8
    critical value. On this synthetic testdata the audit correctly
    REJECTS Benford — which is exactly the kind of signal the screen
    exists to raise.

    One groupBy over 9 digit keys (map-side combinable) + a broadcast
    total; first digits come from integer string prefixes of
    floor(price) — floor on both sides because DuckDB's double→bigint
    CAST rounds while Spark's truncates. The chi-square is a fixed IEEE
    tree over integer counts and literal probabilities; the window SUM
    runs over 9 rows.
    """
    li = table(spark, sf_dir, "lineitem")
    fd = (
        li.select(
            F.substring(
                F.floor("l_extendedprice").cast("bigint").cast("string"), 1, 1
            ).cast("int").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    expected = spark.createDataFrame(
        [(d, p) for d, p in _BENFORD_P.items()], "digit int, p double"
    )
    tot = fd.agg(F.sum("n").alias("nt"))
    scored = (
        expected.join(fd, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
            F.round(
                F.coalesce("n", F.lit(0)).cast("double") / F.col("nt"), 6
            ).alias("observed"),
            F.col("p").alias("expected"),
            (
                (F.coalesce("n", F.lit(0)).cast("double") - F.col("nt") * F.col("p"))
                * (F.coalesce("n", F.lit(0)).cast("double") - F.col("nt") * F.col("p"))
                / (F.col("nt") * F.col("p"))
            ).alias("chi2_part"),
        )
    )
    w_all = Window.partitionBy()
    return scored.select(
        "digit",
        "n",
        "observed",
        "expected",
        F.round("chi2_part", 4).alias("chi2_part"),
        # decimal-cast before the 9-row total: double summation order is
        # engine-specific; decimal addition is associative and exact
        F.round(
            F.sum(F.col("chi2_part").cast("decimal(20,6)")).over(w_all).cast("double"), 4
        ).alias("chi2_total"),
        (
            F.sum(F.col("chi2_part").cast("decimal(20,6)")).over(w_all).cast("double")
            <= _CHI2_CRIT_DF8
        ).alias("benford_ok"),
    )


# --- anti-entropy block diff ------------------------------------------

# Commutative 48-bit row checksum: md5 over the canonical row string,
# first 12 hex digits as an integer, SUMmed per block. Sums are
# order-independent (integer addition), so two engines / partitionings
# / shards agree bit-for-bit. 2^48 × rows-per-block stays far under
# int64. The canonical string uses integer CENTS via explicit
# floor(x*100 + 0.5): a bare CAST(double AS BIGINT) truncates in Spark
# but ROUNDS in DuckDB, and string-formatting a DOUBLE is not a
# cross-engine canonical form either — floor is the one conversion both
# engines define identically.
_ROW_CANON = (
    "concat(CAST(o_orderkey AS STRING), '|',"
    " CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS STRING))"
)
_N_DIFF_BLOCKS = 256


def _hex12_to_int_sql(hexpr: str) -> str:
    """DuckDB-dialect first-12-hex-digits → BIGINT (no base-conv builtin
    there; same instr-arithmetic pattern as q_split_train_test)."""
    terms = [
        f"(instr('0123456789abcdef', substr({hexpr}, {i + 1}, 1)) - 1) * {16 ** (11 - i)}"
        for i in range(12)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


# v1 simulates drift against v0=orders with pure key arithmetic (shared
# text): ~0.1% of rows get a price bump, ~0.1% are deleted.
_V1_SQL = """
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 997 = 7 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 997 <> 13
"""


@query(
    "q_table_diff",
    oracle=f"""
    WITH v0 AS (SELECT o_orderkey, o_totalprice FROM orders),
    v1 AS ({_V1_SQL}),
    c0 AS (
      SELECT o_orderkey % {_N_DIFF_BLOCKS} AS block_id,
             CAST(COUNT(*) AS BIGINT) AS n_rows_v0,
             CAST(SUM({_hex12_to_int_sql(f"md5({_ROW_CANON})")})
                  % 281474976710656 AS BIGINT) AS sum_v0
      FROM v0 GROUP BY 1
    ),
    c1 AS (
      SELECT o_orderkey % {_N_DIFF_BLOCKS} AS block_id,
             CAST(COUNT(*) AS BIGINT) AS n_rows_v1,
             CAST(SUM({_hex12_to_int_sql(f"md5({_ROW_CANON})")})
                  % 281474976710656 AS BIGINT) AS sum_v1
      FROM v1 GROUP BY 1
    )
    SELECT COALESCE(c0.block_id, c1.block_id) AS block_id,
           COALESCE(n_rows_v0, 0) AS n_rows_v0,
           COALESCE(n_rows_v1, 0) AS n_rows_v1,
           CAST(COALESCE(sum_v0, 0) AS BIGINT) AS sum_v0,
           CAST(COALESCE(sum_v1, 0) AS BIGINT) AS sum_v1
    FROM c0 FULL OUTER JOIN c1 ON c0.block_id = c1.block_id
    WHERE COALESCE(sum_v0, -1) <> COALESCE(sum_v1, -1)
       OR COALESCE(n_rows_v0, 0) <> COALESCE(n_rows_v1, 0)
    ORDER BY block_id
    """,
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy diff between two table versions: which key-blocks
    changed, without comparing a single row pair.

    Each side reduces to ≤{N} (block, count, checksum) rows — a
    map-side-combined hash agg over a narrow projection — and the diff
    is a {N}-row full-outer join. At 100 TB this is the cheap first
    pass of replica reconciliation / CDC validation: row-level work
    happens only inside blocks this query flags (and block granularity
    is a knob: o_orderkey % N here, file/partition ids in a real lake).
    The commutative SUM-of-md5 checksum (wide sum reduced mod 2^48 so
    it stays in int64 at any block size) is what makes the block
    signature independent of partitioning, shard order, and engine.
    """.replace("{N}", str(_N_DIFF_BLOCKS))
    v0 = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    v1 = (
        table(spark, sf_dir, "orders")
        .where(F.expr("o_orderkey % 997 <> 13"))
        .select(
            "o_orderkey",
            F.expr(
                "CASE WHEN o_orderkey % 997 = 7 THEN o_totalprice + 1.0"
                " ELSE o_totalprice END"
            ).alias("o_totalprice"),
        )
    )

    def block_sums(df: DataFrame, n_col: str, s_col: str) -> DataFrame:
        rowhash = F.conv(F.substring(F.md5(F.expr(_ROW_CANON)), 1, 12), 16, 10).cast(
            "long"
        )
        # Sum in DECIMAL(38,0) then reduce modulo 2^48: each row hash is
        # 48-bit, so an int64 SUM would overflow at ~32k rows/block
        # (Spark would wrap or ANSI-error; DuckDB promotes to HUGEINT).
        # Wide-sum-then-mod keeps the block signature in-range and
        # engine-identical at any scale.
        return (
            df.select(
                (F.col("o_orderkey") % _N_DIFF_BLOCKS).alias("block_id"),
                rowhash.cast("decimal(38,0)").alias("rh"),
            )
            .groupBy("block_id")
            .agg(
                F.count(F.lit(1)).alias(n_col),
                (F.sum("rh") % F.lit(281474976710656).cast("decimal(38,0)"))
                .cast("long")
                .alias(s_col),
            )
        )

    c0 = block_sums(v0, "n_rows_v0", "sum_v0")
    c1 = block_sums(v1, "n_rows_v1", "sum_v1")
    joined = c0.join(c1, "block_id", "full_outer").select(
        "block_id",
        F.coalesce("n_rows_v0", F.lit(0)).alias("n_rows_v0"),
        F.coalesce("n_rows_v1", F.lit(0)).alias("n_rows_v1"),
        F.coalesce("sum_v0", F.lit(0)).alias("sum_v0"),
        F.coalesce("sum_v1", F.lit(0)).alias("sum_v1"),
    )
    return joined.where(
        (F.col("sum_v0") != F.col("sum_v1"))
        | (F.col("n_rows_v0") != F.col("n_rows_v1"))
    ).orderBy("block_id")


@query(
    "q_dq_freshness",
    oracle="""
    WITH g AS (SELECT MAX(ts) AS gmax FROM events),
    per AS (
      SELECT event_type, MAX(ts) AS last_ts, COUNT(*) AS n_events
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           strftime(last_ts, '%Y-%m-%d %H:%M:%S') AS last_event,
           CAST((epoch_us(gmax) - epoch_us(last_ts)) // 60000000 AS BIGINT)
             AS minutes_behind,
           CAST(n_events AS BIGINT) AS n_events,
           (epoch_us(gmax) - epoch_us(last_ts)) // 60000000 >= 360 AS stale
    FROM per, g
    ORDER BY event_type
    """,
)
def q_dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-freshness audit: per event stream, when did data last
    arrive and how far behind the newest data in the lake is it — the
    first dashboard every ingestion pipeline gets, and the check a
    6-hour SLA alert keys off (``stale``).

    One grouped MAX/COUNT (map-side partial — the scan never shuffles
    rows, only per-type maxima) plus a broadcast of the 1-row global
    max. At 100 TB this is metadata-cheap, and on a real lake the MAX
    comes straight from parquet footer statistics the scan already
    reads. Integer minute arithmetic on epoch microseconds — exact in
    both engines.
    """
    ev = table(spark, sf_dir, "events")
    g = ev.agg(F.max("ts").alias("gmax"))
    per = ev.groupBy("event_type").agg(
        F.max("ts").alias("last_ts"), F.count(F.lit(1)).alias("n_events")
    )
    behind = F.expr(
        "CAST((unix_micros(gmax) - unix_micros(last_ts)) div 60000000 AS BIGINT)"
    )
    return (
        per.crossJoin(F.broadcast(g))
        .select(
            "event_type",
            F.date_format("last_ts", "yyyy-MM-dd HH:mm:ss").alias("last_event"),
            behind.alias("minutes_behind"),
            F.col("n_events").cast("bigint").alias("n_events"),
            (behind >= 360).alias("stale"),
        )
        .orderBy("event_type")
    )
