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
from pyspark.sql.types import LongType, TimestampNTZType

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
    """Normalize a TIMESTAMP(NANOS) parquet column to session-zoned
    TimestampType, across Spark versions:

    - ``nanosAsLong`` honored (this runtime, and Spark ≤4.0): arrives as
      long nanos → TRUNCATE toward zero to micros. Truncation, not floor:
      DuckDB's ns→us cast truncates (probed on DuckDB 1.0.0: −1 ns → 0 µs,
      −1001 ns → −1 µs, −1500000123 ns → −1500000 µs), and the DuckDB
      oracle is the parity contract — a floor here diverges on every
      pre-1970 timestamp with a sub-µs remainder (tests/test_catalog.py).
      Integer arithmetic is mandatory: nanosecond epochs (~1.7e18) exceed
      double's exact-integer range.
    - Spark ≥4.1 (legacy conf inert): arrives as TIMESTAMP_NTZ already
      floored to micros → cast to TimestampType. The session timezone is
      pinned to UTC (session.SEMANTIC_RUNTIME_CONF), so the cast
      reinterprets the wall-clock value as UTC — byte-identical to the
      long-nanos path.

    Watermarks (``withWatermark``) require TimestampType, so every events
    consumer — batch and streaming — goes through this normalization."""
    if isinstance(df.schema[col].dataType, TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    if isinstance(df.schema[col].dataType, LongType):
        # `div` on longs truncates toward zero == DuckDB's ns→us cast.
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
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
