"""Join operators: inner/outer/semi/anti, broadcast, and a scale-safe range join.

The reference's only join is J1, a 2-key inner equi-join
(etl.py:199-200: title=song AND artist_name=artist). The engine
generalizes to the full join family. Scale notes per query docstring;
the range join deliberately avoids the O(n·m) nested-loop plan Spark
picks for pure inequality conditions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..common import dsum, o_dsum, spread
from ..registry import query


@query(
    "q_join_inner_2key",
    oracle="""
    SELECT c.c_custkey, c.c_name, s.s_suppkey, s.s_name
    FROM customer c
    JOIN supplier s
      ON c.c_nationkey = s.s_nationkey
     AND (c.c_acctbal > 5000) = (s.s_acctbal > 5000)
    """,
)
def q_join_inner_2key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join on two keys (mirrors reference J1, etl.py:199-200).

    Second key is a derived boolean so both keys participate in the hash —
    same shape as the reference's (title, artist_name) composite. The
    supplier side is far under the broadcast threshold → BroadcastHashJoin,
    no shuffle of the large side.
    """
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    c2 = c.withColumn("rich", F.col("c_acctbal") > 5000)
    s2 = s.withColumn("rich", F.col("s_acctbal") > 5000)
    return (
        c2.join(s2, [c2.c_nationkey == s2.s_nationkey, c2.rich == s2.rich], "inner")
        .select("c_custkey", "c_name", "s_suppkey", "s_name")
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join — unmatched customers keep NULL order columns."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join: customers having a big order. Semi joins only ship
    the join key of the probe side — no row multiplication, and the build
    side deduplicates keys before the hash table."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join: customers with no orders at all."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_join_broadcast",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name, r.r_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with explicit broadcast hints on both dims.

    nation (25 rows) and region (5 rows) stay tiny at every scale factor,
    so broadcasting removes both shuffles: the plan is a single scan of
    customer with two in-memory hash probes. This is the canonical 100 TB
    star-join shape (dynamic partition pruning kicks in when the fact side
    is partitioned by the dim key).
    """
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


# Range-join bucket width. 5 minutes in seconds.
_BUCKET_S = 300


@query(
    "q_join_theta_range",
    oracle="""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS lag_seconds
    FROM events p
    JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase'
     AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 5 MINUTE
     AND c.ts <= p.ts
    """,
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join: click events within 5 minutes before each purchase.

    A naive inequality join compiles to BroadcastNestedLoopJoin — O(n·m),
    dead at scale. Instead we bucket time into 5-minute epochs, explode the
    purchase side over the two buckets its window can overlap, and run an
    *equi*-join on (user_id, bucket) followed by the exact range filter.
    Each click has exactly one bucket, so no duplicate pairs are produced.
    This is the standard distributed band-join: shuffle is hash(user,
    bucket) — fully parallel, no nested loop, survives 100×.
    """
    ev = table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
        (F.unix_timestamp("ts") / _BUCKET_S).cast("long").alias("bucket"),
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
            (F.unix_timestamp("ts") / _BUCKET_S).cast("long").alias("p_bucket"),
        )
        # a 5-minute look-back window spans at most 2 adjacent buckets
        .withColumn("bucket", F.explode(F.array(F.col("p_bucket") - 1, F.col("p_bucket"))))
        .drop("p_bucket")
    )
    joined = purchases.join(clicks, ["user_id", "bucket"], "inner").where(
        (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {_BUCKET_S} SECOND"))
        & (F.col("c_ts") <= F.col("p_ts"))
    )
    return joined.select(
        "purchase_id",
        "click_id",
        "user_id",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")).alias("lag_seconds"),
    )


# Salt fan-out for the skew-resistant join. 8 buckets splits a hot key's
# rows across 8 reducers; size to the observed skew ratio in production.
_N_SALTS = 8


@query(
    "q_join_salted",
    # Salting changes the physical shuffle, never the logical result —
    # the oracle is the PLAIN join: any salting bug (dropped salt bucket,
    # duplicated dim row) breaks the hash match.
    oracle=f"""
    SELECT n.n_name AS nation,
           COUNT(*) AS n_events,
           {o_dsum('e.value')} AS sum_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant fact⋈dim join via key salting.

    A hot key (one user producing a large share of events) funnels its
    entire shuffle partition through one reducer. Salting splits it:
    the fact side gets a deterministic salt in [0, S) (hash of the
    unique event_id — no RNG, so re-runs and retries agree), the dim
    side is replicated ×S via a crossJoin with the salt range, and the
    join key becomes (key, salt) — the hot key's rows now spread over S
    reducers. S multiplies only the SMALL side (here 1.5k customers ×8),
    the classic trade. AQE's skew-join handles moderate skew at runtime;
    explicit salting is the deterministic fallback for pathological keys
    and is exercised here as a first-class operator with the plain join
    as its correctness oracle.
    """
    ev = table(spark, sf_dir, "events").withColumn(
        "_salt", F.pmod(F.xxhash64("event_id"), F.lit(_N_SALTS)).cast("int")
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    salts = spark.range(_N_SALTS).select(F.col("id").cast("int").alias("_salt"))
    cust_x = cust.crossJoin(salts)  # dim ×S: small side pays the fan-out
    n = table(spark, sf_dir, "nation")
    joined = ev.join(
        cust_x,
        (ev.user_id == cust_x.c_custkey) & (ev["_salt"] == cust_x["_salt"]),
    ).join(F.broadcast(n), cust_x.c_nationkey == n.n_nationkey)
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value")).alias("sum_value"),
    )


@query(
    "q_join_full_outer",
    oracle="""
    SELECT n.n_nationkey, n.n_name,
           s.s_suppkey, s.s_name
    FROM nation n
    FULL OUTER JOIN supplier s ON n.n_nationkey = s.s_nationkey
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join — rows survive from BOTH sides: nations with no
    supplier keep NULL supplier columns, and (if present) orphan
    suppliers keep NULL nation columns.

    Scale note: full outer cannot broadcast either side (both sides'
    unmatched rows must surface), so Spark plans a shuffle sort-merge
    join on the key — the correct and only scalable physical choice;
    with AQE, skewed keys split at runtime.
    """
    n = table(spark, sf_dir, "nation")
    s = table(spark, sf_dir, "supplier")
    return n.join(s, n.n_nationkey == s.s_nationkey, "full_outer").select(
        "n_nationkey", "n_name", "s_suppkey", "s_name"
    )


@query(
    "q_join_interval_overlap",
    oracle="""
    WITH iv AS (
      SELECT o_orderkey AS k,
             datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS start_day,
             datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               + o_orderkey % 20 + 1 AS end_day
      FROM orders WHERE o_orderkey % 16 = 0
    )
    SELECT a.k AS key_a, b.k AS key_b,
           CAST(LEAST(a.end_day, b.end_day)
                - GREATEST(a.start_day, b.start_day) + 1 AS INT)
             AS overlap_days
    FROM iv a JOIN iv b
      ON a.k < b.k
     AND a.start_day <= b.end_day
     AND b.start_day <= a.end_day
    """,
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join (the time-overlap / genomics-range
    primitive) — WITHOUT a nested-loop: each interval explodes into the
    fixed-width day-chunks it touches, candidates equi-join on chunk id,
    then the exact overlap predicate filters and dropDuplicates removes
    multi-chunk double-hits.

    At 100 TB the chunk join's cost is Σ per-chunk occupancy² — tunable
    via chunk width against the interval-length distribution — while the
    naive theta join is a broadcast-nested-loop over everything
    (plan-asserted absent in tests/test_plans.py). Intervals are integer
    epoch-days end to end, so overlap arithmetic is engine-exact.
    """
    chunk_w = 32
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 16 == 0)
    start = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
    iv = o.select(
        F.col("o_orderkey").alias("k"),
        start.alias("start_day"),
        (start + F.col("o_orderkey") % 20 + 1).alias("end_day"),
    )
    chunked = iv.select(
        "k",
        "start_day",
        "end_day",
        F.explode(
            F.sequence(
                F.floor(F.col("start_day") / chunk_w),
                F.floor(F.col("end_day") / chunk_w),
            )
        ).alias("chunk"),
    )
    a, b = chunked.alias("a"), chunked.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.k") < F.col("b.k"))
            & (F.col("a.start_day") <= F.col("b.end_day"))
            & (F.col("b.start_day") <= F.col("a.end_day")),
        )
        .select(
            F.col("a.k").alias("key_a"),
            F.col("b.k").alias("key_b"),
            (
                F.least(F.col("a.end_day"), F.col("b.end_day"))
                - F.greatest(F.col("a.start_day"), F.col("b.start_day"))
                + 1
            )
            .cast("int")
            .alias("overlap_days"),
        )
        .dropDuplicates(["key_a", "key_b"])
    )
    return pairs


@query(
    "q_join_null_safe",
    oracle="""
    WITH keyed AS (
      SELECT event_id,
             NULLIF(CAST(json_extract_string((CASE WHEN json_valid(props) THEN props END), '$.k') AS INT) % 7, 3) AS k_mod
      FROM events
    ), grp AS (
      SELECT k_mod, COUNT(*) AS group_n FROM keyed GROUP BY k_mod
    )
    SELECT k.event_id, k.k_mod, g.group_n
    FROM keyed k JOIN grp g ON k.k_mod IS NOT DISTINCT FROM g.k_mod
    """,
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): every event
    annotated with its derived-key group size, where the key is NULL for
    one residue class — and the NULL group must join to ITSELF, not drop.

    A plain equi-join silently loses every NULL-keyed row (NULL = NULL
    is unknown); ``eqNullSafe`` treats NULL as a first-class key value,
    which Spark still executes as a hash join — NULL hashes like any
    other key, so no fallback to nested-loop and the same shuffle-by-key
    scale posture as q_join_inner_2key. The skew caveat is real at
    100 TB: if NULL is a heavy key (common in practice), it is exactly
    the salting case of q_join_salted.
    """
    keyed = table(spark, sf_dir, "events").select(
        "event_id",
        F.nullif(
            F.get_json_object("props", "$.k").cast("int") % 7, F.lit(3)
        ).alias("k_mod"),
    )
    grp = keyed.groupBy("k_mod").agg(F.count(F.lit(1)).alias("group_n"))
    k, g = keyed.alias("k"), grp.alias("g")
    return k.join(g, F.col("k.k_mod").eqNullSafe(F.col("g.k_mod"))).select(
        F.col("k.event_id"), F.col("k.k_mod"), F.col("g.group_n")
    )


@query(
    "q_join_hinted",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS sum_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_join_hinted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planner-control surface: the same orders⋈customer join pinned to
    SHUFFLE_HASH via a join hint (plan-asserted in tests/test_plans.py).

    Hints are how a 100 TB operator overrides a wrong cost-based choice
    without rewriting the query: here customer is far too big to
    broadcast at scale but small enough per-partition to hash-build —
    SHUFFLE_HASH skips the sort-merge's two sorts, trading executor
    memory for CPU. The result is hint-invariant (same rows as the
    unhinted join), which is exactly what the oracle checks.
    """
    o = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = table(spark, sf_dir, "customer").hint("shuffle_hash").select(
        "c_custkey", "c_mktsegment"
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,8)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@query(
    "q_join_bloom",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           {o_dsum('l_extendedprice')} AS sum_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    """,
)
def q_join_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning — the row-level sibling of
    dynamic partition pruning (q_join_dpp): a selective dim-side filter
    that can't prune the fact statically gets turned into a
    bloom_filter_agg on the dim and a might_contain predicate pushed
    into the fact scan, discarding ~80% of fact rows BEFORE the join
    shuffle instead of after it.

    Spark injects this automatically (spark.sql.optimizer.runtime.
    bloomFilter.enabled is on by default) once the fact scan exceeds
    the 10 GiB application-side threshold and the filtered dim is too
    big to broadcast — i.e. exactly the 100 TB regime; at test scale
    the plan legitimately simplifies to a broadcast join. The
    injection is demonstrated with production thresholds lowered in
    tests/test_plans.py::test_bloom_filter_injection; this oracle
    proves the query's result is plan-invariant.
    """
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice")).alias("sum_price"),
        )
    )


@query(
    "q_join_skew_aqe",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           {o_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM (SELECT CASE WHEN l_orderkey % 20 < 19 THEN 0
                      ELSE l_orderkey END AS k,
                 l_returnflag, l_extendedprice, l_discount
          FROM lineitem) f
    JOIN range(0, 15001) t(k2) ON f.k = t.k2
    GROUP BY l_returnflag
    """,
)
def q_join_skew_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE skew-join: the AUTOMATIC answer to the hot-key problem that
    q_join_salted solves by hand. 95% of fact rows collapse onto one
    derived key; at scale the matching shuffle partition dwarfs the
    median and AQE's OptimizeSkewedJoin splits it into advisory-sized
    chunks at map-output granularity, duplicating the dim partition per
    chunk — no salting code, no key-space changes.

    Preconditions learned the hard way (and encoded in
    tests/test_plans.py::test_aqe_splits_skewed_join):
    - the hot partition must span MULTIPLE map outputs (chunks are made
      of whole map blocks) — a single-file local scan has one mapper,
      so ``spread()`` stands in for the many-mapper scan a real lake
      provides;
    - the dim side must reach the join as a PLAIN shuffle (a distinct/
      aggregate between shuffle and join defeats the rule's
      Sort→ShuffleQueryStage pattern), hence the generated key
      dictionary here;
    - splitting must not break downstream distribution: grouping by a
      NON-join key keeps the rule applicable without
      forceOptimizeSkewedJoin.
    At production thresholds (256 MB) this query's sf0.01 shuffle is
    legitimately not skew-split; the plan test lowers them to local
    scale and asserts SortMergeJoin(skew=true). The oracle proves the
    result is split-invariant.
    """
    fact = spread(table(spark, sf_dir, "lineitem"), spark).select(
        F.when(F.col("l_orderkey") % 20 < 19, F.lit(0))
        .otherwise(F.col("l_orderkey"))
        .alias("k"),
        "l_returnflag",
        "l_extendedprice",
        "l_discount",
    )
    dim = spark.range(0, 15001).select(F.col("id").alias("k2"))
    return (
        fact.join(dim, fact.k == F.col("k2"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )
