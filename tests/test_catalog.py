"""Catalog normalization semantics: nanos→micros must TRUNCATE toward
zero — that is DuckDB's ns→us cast behavior (probed: −1 ns → 0 µs,
−1001 ns → −1 µs), and the DuckDB oracle is the parity contract.
VERDICT r2 item 6 asked for floor; the probe shows floor would diverge
from the oracle on every pre-epoch sub-µs remainder, so truncation is
the correct semantics. Divergence only bites on negative nanos, which
the shipped testdata never exercises — hence this closed-form fixture.

The fixture is a REAL TIMESTAMP(NANOS) parquet file (pyarrow), so the
expected values are DuckDB's own read of that file — the exact oracle
path the driver uses — and both normalize branches are exercised:
the Spark-4.1 TimestampNTZ read and the ≤4.0 nanosAsLong long branch.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from dateng_data_lakes_apache_spark_spark.catalog import normalize_nanos_ts

NANOS = [
    -1,  # 1969-12-31T23:59:59.999999999 → floor −1 µs (trunc would say 0)
    -999,
    -1_000,
    -1_500_000_123,
    0,
    1,
    1_722_470_400_123_456_789,  # a 2024 instant with ns remainder
]


def _expected(tmpdir: str) -> list:
    path = f"{tmpdir}/nanos.parquet"
    pq.write_table(
        pa.table({"ts": pa.array(NANOS, type=pa.timestamp("ns"))}),
        path,
        use_deprecated_int96_timestamps=False,
        coerce_timestamps=None,
    )
    want = [r[0] for r in duckdb.connect().execute(
        f"SELECT CAST(ts AS TIMESTAMP) FROM '{path}' ORDER BY ts"
    ).fetchall()]
    return path, want


def test_nanos_long_branch_floors_pre_epoch(spark, tmp_path):
    _, want = _expected(str(tmp_path))
    df = spark.createDataFrame([(n,) for n in sorted(NANOS)], "ts long")
    got = [r.ts for r in normalize_nanos_ts(df).collect()]
    assert got == want


def test_nanos_parquet_read_matches_duckdb(spark, tmp_path):
    path, want = _expected(str(tmp_path))
    df = spark.read.parquet(path)
    got = sorted(r.ts for r in normalize_nanos_ts(df).collect())
    assert got == want


def test_configure_s3a_sets_hadoop_conf(spark):
    """S6 surface (reference etl.py:33-36 / Test_S3_Access.py:12-24):
    the S3A connector config must land in the JVM Hadoop conf via
    PUBLIC keys — credentials only when given, tuning keys always."""
    from dateng_data_lakes_apache_spark_spark.session import configure_s3a

    configure_s3a(spark, access_key="AK", secret_key="SK", endpoint="s3.example.com")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.access.key") == "AK"
    assert hconf.get("fs.s3a.secret.key") == "SK"
    assert hconf.get("fs.s3a.endpoint") == "s3.example.com"
    assert hconf.get("fs.s3a.fast.upload") == "true"
    assert int(hconf.get("fs.s3a.connection.maximum")) >= 1
