"""Geospatial operators: grid aggregation, bounding-box search,
grid-blocked radius joins, nearest-neighbor-within-radius, trajectory
length, Morton (Z-order) cell encoding, a composed hotspot/exposure
pipeline, and grid-DBSCAN density clustering.

The testdata carries no coordinate columns, so every query derives
deterministic lat/lon from integer keys with pure BIGINT arithmetic
(multiply / modulo / divide-by-10^6) that Spark and DuckDB evaluate
identically — the derivation is part of the query contract, not a
fixture side-channel.

Cross-engine float discipline: the haversine formula is generated ONCE
as a SQL text (valid in both dialects) and executed via ``F.expr`` on
the Spark side and verbatim in the DuckDB oracle, so both engines parse
the same expression tree over the same double inputs. Distances round
to 2 decimals (km); per-segment path terms round to 6 dp then sum as
DECIMAL — either way libm-vs-java.lang.Math ulp drift (~1e-13
relative) sits orders of magnitude below the rounding grid.

Scale design (100 TB):
- grid/Morton aggregation: map-side projection + partial hash agg; the
  shuffle carries one row per occupied cell, bounded by the grid, not
  the data.
- radius join / nearest hub: NEVER a cross join. Points map to coarse
  grid cells sized >= the search radius; the small side explodes to its
  3x3 neighbor cells (longitude wraps mod 36) and the candidate set is
  a broadcast equi-join on the cell key. With two large sides the same
  plan becomes a shuffle equi-join on cell — O(sum over cells of
  |A_cell| * |B_cell 3x3|), the standard spatial-bucketing bound. The
  DuckDB oracle intentionally runs the NAIVE all-pairs filter, proving
  the blocked plan loses no pairs.
- trajectory: one shuffle on user_id for the lag window; per-segment
  distances round to 6 dp and accumulate as DECIMAL(30,8), so the
  per-user sum is associative and engine-independent.

Reference scope note: the reference ETL (etl.py:91-226) has no spatial
operators; this family is part of the beyond-contract lake surface
(SURVEY §2.4 extension wave).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import track
from ..catalog import table
from ..common import md5_hex4_duck as _duck4
from ..common import md5_hex4_spark as _spark4
from ..registry import query

# --- shared SQL-text builders (both dialects parse these verbatim) -----

# lat in [-60, 60): keeps cos(lat) >= 0.5 so a 10-degree longitude cell
# always spans >= 450 km of great-circle distance — the blocking guarantee.
_LAT_MOD = 120_000_000
_LON_MOD = 360_000_000


def _lat_sql(key: str, mult: int = 40503) -> str:
    # CAST AS DOUBLE up front: Spark parses the 1000000.0 literal as
    # DECIMAL and would otherwise carry exact-decimal lat/lon (DuckDB
    # promotes to DOUBLE), leaking a Decimal column type into results.
    # The quotient is an exact 6-dp value <= 1.2e8/1e6, so the one
    # correctly-rounded double division is identical in both engines.
    return f"CAST(((({key}) * {mult}) % {_LAT_MOD}) / 1000000.0 AS DOUBLE) - 60.0"


def _lon_sql(key: str, mult: int = 65537) -> str:
    return f"CAST(((({key}) * {mult}) % {_LON_MOD}) / 1000000.0 AS DOUBLE) - 180.0"


def haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Great-circle distance in km — one text, two engines.

    2R·asin(sqrt(sin²(Δφ/2) + cosφ1·cosφ2·sin²(Δλ/2))); the π/180
    factor is a literal so neither engine substitutes its own pi().
    """
    rad = "0.017453292519943295"  # pi / 180
    sin_dlat = f"sin((({lat2}) - ({lat1})) * {rad} / 2)"
    sin_dlon = f"sin((({lon2}) - ({lon1})) * {rad} / 2)"
    h = (
        f"({sin_dlat} * {sin_dlat}"
        f" + cos(({lat1}) * {rad}) * cos(({lat2}) * {rad})"
        f" * {sin_dlon} * {sin_dlon})"
    )
    return f"(2.0 * 6371.0 * asin(sqrt({h})))"


def _morton_sql(qlat: str, qlon: str, bits: int = 8) -> str:
    """Interleave two ``bits``-wide non-negative ints into a Z-order key.

    Bit i is tested with pure integer modulo (``x % 2^(i+1) >= 2^i``) —
    no shift operators, so the one expression text parses identically in
    Spark SQL and DuckDB.
    """
    terms = []
    for i in range(bits):
        lo, hi = 1 << i, 1 << (i + 1)
        terms.append(
            f"(CASE WHEN ({qlon}) % {hi} >= {lo} THEN {1 << (2 * i)} ELSE 0 END)"
        )
        terms.append(
            f"(CASE WHEN ({qlat}) % {hi} >= {lo} THEN {1 << (2 * i + 1)} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


_CUST_LAT = _lat_sql("c_custkey")
_CUST_LON = _lon_sql("c_custkey")
_SUPP_LAT = _lat_sql("s_suppkey", 71993)
_SUPP_LON = _lon_sql("s_suppkey", 91193)
_EV_LAT = _lat_sql("event_id", 48271)
_EV_LON = _lon_sql("event_id", 69621)

_RADIUS_KM = 450.0  # < 10-degree cell at |lat| <= 60 (450/55.6 = 8.1 deg)
_CELL_DEG = 10
_N_LON_CELLS = 360 // _CELL_DEG  # 36, so neighbor cells wrap mod 36


# --- 1. grid density aggregation ---------------------------------------


@query(
    "q_geo_grid_agg",
    oracle=f"""
    SELECT CAST(floor(({_CUST_LAT} + 60.0) / 10.0) AS INT) AS cell_lat,
           CAST(floor(({_CUST_LON} + 180.0) / 10.0) AS INT) AS cell_lon,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,8))) AS DOUBLE) AS sum_bal
    FROM customer
    GROUP BY 1, 2
    ORDER BY cell_lat, cell_lon
    """,
)
def q_geo_grid_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point density + balance mass per 10-degree grid cell.

    Map-side derive + partial hash agg; the shuffle is bounded by the
    12x36 grid no matter the input size.
    """
    c = table(spark, sf_dir, "customer")
    return (
        c.select(
            F.expr(f"CAST(floor(({_CUST_LAT} + 60.0) / 10.0) AS INT)").alias("cell_lat"),
            F.expr(f"CAST(floor(({_CUST_LON} + 180.0) / 10.0) AS INT)").alias("cell_lon"),
            F.col("c_acctbal"),
        )
        .groupBy("cell_lat", "cell_lon")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.col("c_acctbal").cast("decimal(30,8)")).cast("double").alias("sum_bal"),
        )
        .orderBy("cell_lat", "cell_lon")
    )


# --- 2. bounding-box filter + top-k by distance ------------------------

_BBOX = "({lat}) BETWEEN -30.0 AND 30.0 AND ({lon}) BETWEEN -60.0 AND 60.0"
_CENTER_DIST = haversine_sql("0.0", "0.0", _CUST_LAT, _CUST_LON)


@query(
    "q_geo_bbox_topk",
    oracle=f"""
    SELECT c_custkey, c_name,
           round({_CUST_LAT}, 6) AS lat,
           round({_CUST_LON}, 6) AS lon,
           round({_CENTER_DIST}, 2) AS dist_km
    FROM customer
    WHERE {_BBOX.format(lat=_CUST_LAT, lon=_CUST_LON)}
    ORDER BY round({_CENTER_DIST}, 2), c_custkey
    LIMIT 100
    """,
)
def q_geo_bbox_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 customers inside a lat/lon box nearest to the box center.

    Box test + distance are codegen'd column arithmetic; the top-k plans
    as TakeOrderedAndProject (per-partition heaps, no global sort).
    Ties on the 2-dp distance break by key for cross-engine determinism.
    """
    c = table(spark, sf_dir, "customer")
    return (
        c.where(F.expr(_BBOX.format(lat=_CUST_LAT, lon=_CUST_LON)))
        .select(
            "c_custkey",
            "c_name",
            F.expr(f"round({_CUST_LAT}, 6)").alias("lat"),
            F.expr(f"round({_CUST_LON}, 6)").alias("lon"),
            F.expr(f"round({_CENTER_DIST}, 2)").alias("dist_km"),
        )
        .orderBy("dist_km", "c_custkey")
        .limit(100)
    )


# --- 3. grid-blocked radius join ---------------------------------------

_PAIR_DIST = haversine_sql("c_lat", "c_lon", "s_lat", "s_lon")


def _points(spark: SparkSession, sf_dir: str):
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr(_CUST_LAT).alias("c_lat"),
        F.expr(_CUST_LON).alias("c_lon"),
    )
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.expr(_SUPP_LAT).alias("s_lat"),
        F.expr(_SUPP_LON).alias("s_lon"),
    )
    return c, s


def _blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(customer, supplier, dist_km) pairs within the radius — candidate
    generation is a cell-key equi-join, exact filter afterward."""
    c, s = _points(spark, sf_dir)
    cell = "CAST(floor(({lat} + 60.0) / %d) AS BIGINT) * 64 + CAST(floor(({lon} + 180.0) / %d) AS BIGINT)" % (
        _CELL_DEG,
        _CELL_DEG,
    )
    c_cells = c.withColumn("cell", F.expr(cell.format(lat="c_lat", lon="c_lon")))
    # Small side explodes to its 3x3 neighborhood; longitude wraps mod 36.
    offs = spark.range(9).select(
        (F.col("id") / 3).cast("long").alias("dr"), (F.col("id") % 3).alias("dc")
    )
    s_cells = (
        s.crossJoin(F.broadcast(offs))
        .withColumn("r", F.expr(f"CAST(floor((s_lat + 60.0) / {_CELL_DEG}) AS BIGINT) + dr - 1"))
        .withColumn(
            "cell",
            F.expr(
                f"r * 64 + (CAST(floor((s_lon + 180.0) / {_CELL_DEG}) AS BIGINT)"
                f" + dc - 1 + {_N_LON_CELLS}) % {_N_LON_CELLS}"
            ),
        )
        .select("s_suppkey", "s_lat", "s_lon", "cell")
    )
    return (
        c_cells.join(F.broadcast(s_cells), "cell")
        .withColumn("dist_km", F.expr(f"round({_PAIR_DIST}, 2)"))
        .where(F.col("dist_km") <= _RADIUS_KM)
    )


@query(
    "q_geo_radius_join",
    oracle=f"""
    WITH c AS (SELECT c_custkey, {_CUST_LAT} AS c_lat, {_CUST_LON} AS c_lon FROM customer),
         s AS (SELECT s_suppkey, {_SUPP_LAT} AS s_lat, {_SUPP_LON} AS s_lon FROM supplier)
    SELECT s_suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           round(MIN(round({_PAIR_DIST}, 2)), 2) AS min_dist_km
    FROM c JOIN s ON round({_PAIR_DIST}, 2) <= {_RADIUS_KM}
    GROUP BY s_suppkey
    ORDER BY s_suppkey
    """,
)
def q_geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers within 450 km of each supplier: count + nearest distance.

    Spark runs the grid-blocked candidate join; the oracle runs the
    naive all-pairs distance filter — green parity proves the blocking
    is lossless (cell span 10 deg >= 8.1-deg worst-case radius arc at
    |lat| <= 60).
    """
    return (
        _blocked_pairs(spark, sf_dir)
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("dist_km"), 2).alias("min_dist_km"),
        )
        .orderBy("s_suppkey")
    )


# --- 4. nearest hub within radius --------------------------------------


@query(
    "q_geo_nearest_hub",
    oracle=f"""
    WITH c AS (SELECT c_custkey, {_CUST_LAT} AS c_lat, {_CUST_LON} AS c_lon FROM customer),
         s AS (SELECT s_suppkey, {_SUPP_LAT} AS s_lat, {_SUPP_LON} AS s_lon FROM supplier),
         pairs AS (
           SELECT c_custkey, s_suppkey, round({_PAIR_DIST}, 2) AS dist_km
           FROM c JOIN s ON round({_PAIR_DIST}, 2) <= {_RADIUS_KM}
         ),
         ranked AS (
           SELECT *, ROW_NUMBER() OVER (
             PARTITION BY c_custkey ORDER BY dist_km, s_suppkey) AS rn
           FROM pairs
         )
    SELECT c_custkey, s_suppkey AS nearest_suppkey, dist_km
    FROM ranked WHERE rn = 1
    ORDER BY c_custkey
    """,
)
def q_geo_nearest_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest supplier within 450 km per customer (ties break by key).

    min(struct(dist, key)) instead of a row_number window: the argmin is
    a partial-aggregatable hash agg — map-side combine shrinks the
    shuffle to one row per customer, where a window would shuffle every
    candidate pair.
    """
    best = (
        _blocked_pairs(spark, sf_dir)
        .groupBy("c_custkey")
        .agg(F.min(F.struct("dist_km", "s_suppkey")).alias("best"))
    )
    return best.select(
        "c_custkey",
        F.col("best.s_suppkey").alias("nearest_suppkey"),
        F.col("best.dist_km").alias("dist_km"),
    ).orderBy("c_custkey")


# --- 5. per-user trajectory length -------------------------------------


@query(
    "q_geo_trajectory",
    oracle=f"""
    WITH pts AS (
      SELECT user_id, event_id, {_EV_LAT} AS lat, {_EV_LON} AS lon
      FROM events
    ),
    segs AS (
      SELECT user_id,
             round({haversine_sql(
                 "lag(lat) OVER w", "lag(lon) OVER w", "lat", "lon")}, 6) AS seg_km
      FROM pts
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    )
    SELECT user_id,
           CAST(COUNT(seg_km) AS BIGINT) AS n_segments,
           CAST(SUM(CAST(seg_km AS DECIMAL(30,8))) AS DOUBLE) AS path_km
    FROM segs
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_geo_trajectory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total great-circle path length per user over their event sequence.

    One shuffle (user_id) feeds both the lag window and the final agg —
    the window's output partitioning is reused, so the groupBy adds no
    second exchange. Segments round to 6 dp then sum as DECIMAL(30,8):
    associative, so partition order can't change the answer.
    """
    from pyspark.sql import Window

    pts = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr(_EV_LAT).alias("lat"),
        F.expr(_EV_LON).alias("lon"),
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    segs = (
        pts.withColumn("p_lat", F.lag("lat").over(w))
        .withColumn("p_lon", F.lag("lon").over(w))
        .select(
            "user_id",
            F.expr(f"round({haversine_sql('p_lat', 'p_lon', 'lat', 'lon')}, 6)").alias(
                "seg_km"
            ),
        )
    )
    return (
        segs.groupBy("user_id")
        .agg(
            F.count("seg_km").alias("n_segments"),
            # No final 2-dp round: the 6-dp decimal sum can land exactly
            # on a .xx5 tie, where Spark (HALF_UP) and DuckDB (HALF_EVEN)
            # round apart. The exact-decimal → double cast is tie-free.
            F.sum(F.col("seg_km").cast("decimal(30,8)")).cast("double").alias("path_km"),
        )
        .orderBy("user_id")
    )


# --- 6. Morton / Z-order cells -----------------------------------------

_QLAT = f"CAST(floor(({_CUST_LAT} + 60.0) / 120.0 * 256) AS BIGINT)"
_QLON = f"CAST(floor(({_CUST_LON} + 180.0) / 360.0 * 256) AS BIGINT)"
_MORTON = _morton_sql(_QLAT, _QLON)


@query(
    "q_geo_morton_cells",
    oracle=f"""
    SELECT CAST({_MORTON} AS BIGINT) AS morton,
           CAST(COUNT(*) AS BIGINT) AS n_points
    FROM customer
    GROUP BY 1
    ORDER BY n_points DESC, morton
    LIMIT 50
    """,
)
def q_geo_morton_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 densest Morton (Z-order) cells at 8 bits per dimension.

    The interleave is 16 integer-modulo CASE terms generated from one
    builder — no shift operators, so Spark and DuckDB execute the same
    expression text. Z-order keys are what the engine's Z-order layout
    writer (sources/roundtrip.py) sorts by; this query exposes the
    encoding itself as a queryable operator.
    """
    c = table(spark, sf_dir, "customer")
    return (
        c.select(F.expr(f"CAST({_MORTON} AS BIGINT)").alias("morton"))
        .groupBy("morton")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .orderBy(F.desc("n_points"), "morton")
        .limit(50)
    )


# --- composed geo flagship ---------------------------------------------

_EV_CELL = (
    f"CAST(floor(({_EV_LAT} + 60.0) / 10.0) AS BIGINT) * 64"
    f" + CAST(floor(({_EV_LON} + 180.0) / 10.0) AS BIGINT)"
)
_N_HOTSPOTS = 20


@query(
    "q_geo_pipeline",
    oracle=f"""
    WITH pts AS (
      SELECT user_id, event_id, {_EV_LAT} AS lat, {_EV_LON} AS lon,
             {_EV_CELL} AS cell
      FROM events
    ),
    hot AS (
      SELECT cell FROM (
        SELECT cell, COUNT(*) AS n,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, cell) AS rn
        FROM pts GROUP BY cell
      ) WHERE rn <= {_N_HOTSPOTS}
    ),
    segs AS (
      SELECT user_id,
             round({haversine_sql(
                 "lag(lat) OVER w", "lag(lon) OVER w", "lat", "lon")}, 6) AS seg_km
      FROM pts
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    ),
    per_user AS (
      SELECT p.user_id,
             CAST(COUNT(*) AS BIGINT) AS n_points,
             CAST(SUM(CASE WHEN h.cell IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hot
      FROM pts p LEFT JOIN hot h ON p.cell = h.cell
      GROUP BY p.user_id
    ),
    paths AS (
      SELECT user_id,
             CAST(SUM(CAST(seg_km AS DECIMAL(30,8))) AS DOUBLE) AS path_km
      FROM segs GROUP BY user_id
    )
    SELECT u.user_id, u.n_points, u.n_hot,
           CAST(u.n_hot AS DOUBLE) / u.n_points AS hot_share,
           p.path_km
    FROM per_user u JOIN paths p ON u.user_id = p.user_id
    ORDER BY u.user_id
    """,
)
def q_geo_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed geo flagship: event positions → global hotspot cells
    (top-{_N_HOTSPOTS} densest) → per-user hotspot exposure + total
    travel distance, in one plan.

    Composition shape: the point projection feeds THREE consumers
    (hotspot agg, exposure join, trajectory window) — persist() keeps
    the derived positions from being recomputed per branch. The hotspot
    table is {_N_HOTSPOTS} rows → broadcast; the trajectory branch's
    user_id shuffle is shared by its window and aggregation (the plan
    property pinned for q_geo_trajectory); the final join is
    user-keyed. One corpus scan, two shuffles of point-scale data,
    everything else metadata-scale.
    """
    pts = (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.expr(_EV_LAT).alias("lat"),
            F.expr(_EV_LON).alias("lon"),
            F.expr(_EV_CELL).alias("cell"),
        )
    )
    pts = track(pts)
    hot = (
        pts.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "cell")
        .limit(_N_HOTSPOTS)
        .select("cell")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("event_id")
    paths = (
        pts.withColumn("p_lat", F.lag("lat").over(w))
        .withColumn("p_lon", F.lag("lon").over(w))
        .select(
            "user_id",
            F.expr(f"round({haversine_sql('p_lat', 'p_lon', 'lat', 'lon')}, 6)").alias(
                "seg_km"
            ),
        )
        .groupBy("user_id")
        .agg(
            F.sum(F.col("seg_km").cast("decimal(30,8)")).cast("double").alias("path_km")
        )
    )
    per_user = (
        pts.join(F.broadcast(hot.withColumnRenamed("cell", "h_cell")),
                 F.col("cell") == F.col("h_cell"), "left")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(F.when(F.col("h_cell").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_hot"),
        )
    )
    return (
        per_user.join(paths, "user_id")
        .select(
            "user_id",
            "n_points",
            "n_hot",
            (F.col("n_hot").cast("double") / F.col("n_points")).alias("hot_share"),
            "path_km",
        )
        .orderBy("user_id")
    )


# --- grid-DBSCAN clustering --------------------------------------------

# Density fixture with real clumping: each USER is a cluster center
# (md5-derived cell), each event jitters +-1 cell around its user's
# center — so hot cells form multi-cell blobs, the structure DBSCAN
# exists to find. md5 is the one cross-engine hash (helpers in
# common.py: conv() on Spark, hex-digit instr arithmetic on DuckDB).

def _cell_rc(h4) -> tuple[str, str]:
    ucr = f"({h4('user_id', 1)} % 12)"
    ucc = f"({h4('user_id', 5)} % 36)"
    dr = f"({h4('event_id', 1)} % 3 - 1)"
    dc = f"({h4('event_id', 5)} % 3 - 1)"
    return (
        f"greatest(least({ucr} + {dr}, 11), 0)",
        f"(({ucc} + {dc} + 36) % 36)",
    )


_DUCK_R, _DUCK_C = _cell_rc(_duck4)
_SPARK_R, _SPARK_C = _cell_rc(_spark4)
_N_CELLS = 12 * 36
_THR = "ceil(t / 432.0 + 2 * sqrt(t / 432.0))"  # mean + 2 sigma


@query(
    "q_geo_cluster",
    oracle=f"""
    WITH cells AS (
      SELECT {_DUCK_R} AS r, {_DUCK_C} AS c,
             {_DUCK_R} * 64 + {_DUCK_C} AS cell,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2, 3
    ),
    tot AS (SELECT SUM(n) AS t FROM cells),
    hot AS (
      SELECT r, c, cell, n FROM cells, tot WHERE n >= {_THR}
    ),
    pairs AS (
      SELECT a.cell AS u, b.cell AS v
      FROM hot a JOIN hot b
        ON abs(a.r - b.r) <= 1
       AND least(abs(a.c - b.c), 36 - abs(a.c - b.c)) <= 1
       AND a.cell < b.cell
    ),
    edges AS (SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs),
    labels AS (
      -- fixpoint min-label propagation: states are (node, label) pairs,
      -- finite (<= 432^2), so UNION dedup terminates with no depth
      -- guard — correct at any component eccentricity (serpentine
      -- components included)
      SELECT node, MIN(label) AS label FROM (
        WITH RECURSIVE cc AS (
          SELECT u AS node, u AS label FROM (SELECT DISTINCT u FROM edges)
          UNION
          SELECT e.v AS node, c.label
          FROM cc c JOIN edges e ON e.u = c.node
          WHERE c.label < e.v
        )
        SELECT node, label FROM cc
      ) GROUP BY node
    )
    SELECT CAST(COALESCE(l.label, h.cell) AS BIGINT) AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(h.n) AS BIGINT) AS n_points
    FROM hot h LEFT JOIN labels l ON l.node = h.cell
    GROUP BY 1
    ORDER BY cluster_id
    """,
)
def q_geo_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-DBSCAN: dense cells (mean + 2 sigma of grid density) merged
    into clusters by 8-neighbor adjacency (longitude wraps) —
    density-based spatial clustering with the data pass reduced to ONE
    grid aggregation.

    Scale split: the corpus-sized work is the 432-cell histogram
    (map-side partial agg). Everything after runs on the CELL table,
    which is bounded by the grid (<= 432 rows) — i.e. metadata-scale —
    so component resolution is a driver-side union-find over the
    collected hot-cell adjacency (same bounded-driver-state discipline
    as BPE's vocab merges, llm_pipeline.py): exact, O(cells * alpha),
    no iterative joins. This is how DBSCAN survives 100 TB — cluster
    the density grid, not the points; only the grid resolution, never
    the data, bounds the clustering cost. The density threshold is
    self-tuning (mean + 2 sigma), and the DuckDB twin expresses the
    same components as a fixpoint (UNION-deduplicated) recursive CTE.
    """
    ev = table(spark, sf_dir, "events")
    cells = (
        ev.select(F.expr(_SPARK_R).alias("r"), F.expr(_SPARK_C).alias("c"))
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("cell", F.col("r") * 64 + F.col("c"))
    )
    tot = cells.agg(F.sum("n").alias("t"))
    hot = (
        cells.crossJoin(F.broadcast(tot))
        .where(F.col("n") >= F.expr(_THR))
        .select("r", "c", "cell", "n")
    )
    # Metadata-scale from here: <= 432 hot cells.
    rows = hot.collect()
    parent = {r["cell"]: r["cell"] for r in rows}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    by_rc = {(r["r"], r["c"]): r["cell"] for r in rows}
    for r in rows:
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                nb = by_rc.get((r["r"] + dr, (r["c"] + dc + 36) % 36))
                if nb is not None:
                    ra, rb = find(r["cell"]), find(nb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    agg: dict[int, list[int]] = {}
    for r in rows:
        lbl = find(r["cell"])
        cur = agg.setdefault(lbl, [0, 0])
        cur[0] += 1
        cur[1] += int(r["n"])
    out = [(int(k), v[0], v[1]) for k, v in sorted(agg.items())]
    return spark.createDataFrame(
        out, "cluster_id bigint, n_cells bigint, n_points bigint"
    ).orderBy("cluster_id")
