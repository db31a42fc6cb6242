"""Directory-of-parquet-tables catalog.

The reference's "catalog" is implicit: paths hard-coded per table and
temp views registered ad hoc (ETL_from_Notebook.py:255-256). Here the
catalog is explicit: a scale-factor directory holds one parquet
file/dir per table; ``table()`` reads one, ``register_views()`` exposes
all of them to the SQL surface so DataFrame and SQL queries share one
plan space (SURVEY §3.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def normalize_nanos_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """TIMESTAMP(NANOS) parquet columns arrive as long (nanosAsLong conf);
    convert to TimestampType by flooring to micros. Floor (not truncate-
    toward-zero) so pre-1970 timestamps — negative nanos — round down,
    matching DuckDB's ns→us conversion on both sides of the epoch.
    Integer arithmetic is mandatory: nanosecond epochs (~1.7e18) exceed
    double's exact-integer range."""
    if isinstance(df.schema[col].dataType, LongType):
        # floor-div for longs: shift negatives so `div` truncation == floor
        df = df.withColumn(
            col,
            F.timestamp_micros(
                F.expr(f"(CASE WHEN {col} >= 0 THEN {col} ELSE {col} - 999 END) div 1000")
            ),
        )
    return df


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table. Parquet is self-describing — no forced
    schema (the reference forced one redundantly, SURVEY §4.3-Q8)."""
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = normalize_nanos_ts(df)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL surface."""
    for name in TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            table(spark, sf_dir, name).createOrReplaceTempView(name)
