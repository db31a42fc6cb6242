"""Geospatial family: blocking losslessness, encoding correctness, and
plan shape (the oracle parity sweep in test_oracle_parity.py covers
value equality; these pin the properties parity can't see)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dateng_data_lakes_apache_spark_spark.operators.geospatial import (
    _RADIUS_KM,
    _blocked_pairs,
    _morton_sql,
    _points,
    haversine_sql,
)
from dateng_data_lakes_apache_spark_spark.plans.explain import formatted_plan
from dateng_data_lakes_apache_spark_spark.registry import get_queries

from .conftest import SF_SMALL

QS = get_queries()


def test_haversine_known_distance(spark):
    # 1 degree of longitude at the equator = 111.19 km (2*pi*6371/360).
    df = spark.range(1).select(
        F.expr(haversine_sql("0.0", "0.0", "0.0", "1.0")).alias("d")
    )
    assert abs(df.first()["d"] - 111.195) < 0.01


def test_haversine_antimeridian_wrap(spark):
    # 179.9E to 179.9W is 0.2 degrees apart across the antimeridian,
    # not 359.8 degrees: the sin(dlon/2) form needs no wrap handling.
    df = spark.range(1).select(
        F.expr(haversine_sql("0.0", "179.9", "0.0", "-179.9")).alias("d")
    )
    assert abs(df.first()["d"] - 0.2 * 111.195) < 0.01


def test_blocked_radius_join_is_lossless(spark):
    """The 3x3-neighbor grid join finds exactly the naive all-pairs set."""
    c, s = _points(spark, SF_SMALL)
    naive = (
        c.crossJoin(s)
        .withColumn(
            "dist_km",
            F.expr(f"round({haversine_sql('c_lat', 'c_lon', 's_lat', 's_lon')}, 2)"),
        )
        .where(F.col("dist_km") <= _RADIUS_KM)
        .select("c_custkey", "s_suppkey")
    )
    blocked = _blocked_pairs(spark, SF_SMALL).select("c_custkey", "s_suppkey")
    assert naive.exceptAll(blocked).count() == 0
    assert blocked.exceptAll(naive).count() == 0


def test_radius_join_plan_is_blocked_not_cartesian(spark):
    plan = formatted_plan(QS["q_geo_radius_join"](spark, SF_SMALL))
    # Candidate generation must be a hash join on the cell key; the only
    # nested-loop allowed is the 9-row neighbor-offset broadcast.
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_morton_interleave_matches_python(spark):
    """The generated modulo-CASE expression is a true bit interleave."""

    def py_morton(qlat: int, qlon: int) -> int:
        out = 0
        for i in range(8):
            out |= ((qlon >> i) & 1) << (2 * i)
            out |= ((qlat >> i) & 1) << (2 * i + 1)
        return out

    rows = (
        spark.range(257)
        .select(
            (F.col("id") % 256).alias("qlat"),
            ((F.col("id") * 37) % 256).alias("qlon"),
        )
        .withColumn("m", F.expr(_morton_sql("qlat", "qlon")))
        .collect()
    )
    for r in rows:
        assert r["m"] == py_morton(r["qlat"], r["qlon"])


def test_grid_cells_bounded(spark):
    """Derived lat stays in [-60, 60) so the 10-deg grid is 12x36 — the
    radius-blocking guarantee (cos(lat) >= 0.5) and the shuffle bound."""
    out = QS["q_geo_grid_agg"](spark, SF_SMALL).collect()
    assert all(0 <= r["cell_lat"] <= 11 and 0 <= r["cell_lon"] <= 35 for r in out)


def test_trajectory_segments_count(spark):
    """n_segments per user = events - 1 (lag drops the first point)."""
    traj = {r["user_id"]: r["n_segments"] for r in QS["q_geo_trajectory"](spark, SF_SMALL).collect()}
    counts = {
        r["user_id"]: r["n"]
        for r in spark.read.parquet(f"{SF_SMALL}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for uid, n in counts.items():
        assert traj[uid] == n - 1


def test_geo_pipeline_exposure_invariants(spark):
    """hot_share in [0,1], n_hot <= n_points, and summed exposure equals
    the hotspot cells' total point count."""
    from dateng_data_lakes_apache_spark_spark.operators.geospatial import _N_HOTSPOTS

    rows = QS["q_geo_pipeline"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_hot"] <= r["n_points"]
        assert 0.0 <= r["hot_share"] <= 1.0
    # total in-hotspot points across users == sum of the top-N cells
    from dateng_data_lakes_apache_spark_spark.catalog import table
    from dateng_data_lakes_apache_spark_spark.operators.geospatial import _EV_CELL

    cells = (
        table(spark, SF_SMALL, "events")
        .selectExpr(f"{_EV_CELL} AS cell")
        .groupBy("cell")
        .count()
        .orderBy(F.desc("count"), "cell")
        .limit(_N_HOTSPOTS)
        .collect()
    )
    assert sum(r["n_hot"] for r in rows) == sum(c["count"] for c in cells)


def test_geo_cluster_partition_and_maximality(spark):
    """Clusters partition the hot-cell set, and no two distinct
    clusters contain adjacent cells (DBSCAN maximality)."""
    from dateng_data_lakes_apache_spark_spark.operators.geospatial import (
        _SPARK_C,
        _SPARK_R,
        _THR,
    )
    from dateng_data_lakes_apache_spark_spark.catalog import table

    out = QS["q_geo_cluster"](spark, SF_SMALL).collect()
    cells = (
        table(spark, SF_SMALL, "events")
        .selectExpr(f"{_SPARK_R} AS r", f"{_SPARK_C} AS c")
        .groupBy("r", "c")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    )
    tot = sum(r["n"] for r in cells)
    import math

    thr = math.ceil(tot / 432.0 + 2 * math.sqrt(tot / 432.0))
    hot = {(r["r"], r["c"]): r["r"] * 64 + r["c"] for r in cells if r["n"] >= thr}
    assert sum(r["n_cells"] for r in out) == len(hot)

    # rebuild cluster membership by union-find to check adjacency split
    label = {}
    def neighbors(rc):
        r, c = rc
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                if (dr, dc) != (0, 0) and (r + dr, (c + dc + 36) % 36) in hot:
                    yield (r + dr, (c + dc + 36) % 36)
    # BFS components
    seen = set()
    comps = []
    for rc in hot:
        if rc in seen:
            continue
        comp, stack = set(), [rc]
        while stack:
            x = stack.pop()
            if x in seen:
                continue
            seen.add(x)
            comp.add(x)
            stack.extend(neighbors(x))
        comps.append(comp)
    assert len(comps) == len(out)
    expected = sorted(
        (min(hot[rc] for rc in comp), len(comp)) for comp in comps
    )
    got = sorted((r["cluster_id"], r["n_cells"]) for r in out)
    assert expected == got
