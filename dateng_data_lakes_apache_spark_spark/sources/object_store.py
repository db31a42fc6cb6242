"""Object-store lake transport: S3-compatible upload/download of sink
artifacts, plus detection of the JVM-side s3a connector.

The reference's entire deployment story is "read JSON from S3, write
parquet to S3" (reference etl.py:33-36, 44, 64; Test_S3_Access.py:12-24
round-trips a CSV through a bucket). The JVM half of that contract is
:func:`..session.configure_s3a` — Hadoop conf for the ``s3a://``
filesystem. This module covers the REST half: moving a parquet
directory between the local filesystem and any boto3-compatible
endpoint (AWS, MinIO, moto), which is what the connector does under the
hood and what remains testable when the ``hadoop-aws`` jar is absent
from the runtime (it ships separately from Spark).

At 100 TB none of this is a data path — executors stream s3a:// splits
directly; these helpers move SINK ARTIFACTS (bounded query outputs,
staged fixtures, manifests) and deliberately walk files sequentially.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import SparkSession


def s3a_connector_available(spark: SparkSession) -> bool:
    """True iff the JVM can load the s3a filesystem (hadoop-aws jar
    present) — gates true ``s3a://`` reads in tests and tools."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.hadoop.fs.s3a.S3AFileSystem"
        )
        return True
    except Exception:
        return False


def upload_dir(client: Any, local_dir: str, bucket: str, prefix: str) -> int:
    """Upload every file under ``local_dir`` to s3://bucket/prefix/...,
    preserving relative paths. Returns the number of objects written."""
    n = 0
    for root, _dirs, files in os.walk(local_dir):
        for name in files:
            full = os.path.join(root, name)
            rel = os.path.relpath(full, local_dir)
            key = f"{prefix}/{rel}".replace(os.sep, "/")
            client.upload_file(full, bucket, key)
            n += 1
    return n


def download_dir(client: Any, bucket: str, prefix: str, local_dir: str) -> int:
    """Download every object under s3://bucket/prefix/ into ``local_dir``,
    recreating relative paths. Returns the number of objects read."""
    n = 0
    paginator = client.get_paginator("list_objects_v2")
    for page in paginator.paginate(Bucket=bucket, Prefix=prefix + "/"):
        for obj in page.get("Contents", []):
            rel = obj["Key"][len(prefix) + 1 :]
            dest = os.path.join(local_dir, rel.replace("/", os.sep))
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            client.download_file(bucket, obj["Key"], dest)
            n += 1
    return n
