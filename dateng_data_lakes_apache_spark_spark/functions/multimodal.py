"""Multimodal column handling: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the raw bytes as a
``binary`` column next to typed metadata (mime, width, …); run decode /
feature-extraction as Arrow-batched ``mapInPandas`` so each Python
worker processes whole record batches. The container has no image/audio
codecs, so the decode kernel is a clearly-marked deterministic stub —
the Spark-side plumbing (schema, batching, partitioning) is real and
is what these queries exercise.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import table
from ..registry import query

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("payload_len", IntegerType()),
    ]
)


def attach_fake_payload(documents: DataFrame) -> DataFrame:
    """Stage a documents DF as a multimodal table: the UTF-8 bytes of
    ``text`` stand in for an image payload (deterministic fake)."""
    return documents.select(
        "doc_id",
        F.lit("image/fake").alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("payload_len"),
    )


def decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB decode kernel. A real deployment would do e.g.
    ``PIL.Image.open(io.BytesIO(payload)).size`` here; codecs are not in
    this container, so derive deterministic fake (width, height) from the
    payload bytes. Raises on None to mimic decoder strictness."""
    if payload is None:
        raise NotImplementedError("no payload — real decoder would fail here")
    return (64 + payload[0] % 64, 64 + payload[-1] % 64) if payload else (64, 64)


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload_len", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("head_byte", IntegerType()),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas processes whole Arrow batches per Python call — the only
    acceptable shape for Python media kernels at scale (row-at-a-time UDFs
    would cross the JVM↔Python boundary per record).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(decode_image_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload_len": pdf["payload_len"].astype("int32"),
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "head_byte": pdf["payload"].map(lambda b: b[0] if len(b) else -1).astype("int32"),
                }
            )

    return media.mapInPandas(kernel, schema=_FEATURE_SCHEMA)


@query(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           'image/fake' AS mime,
           CAST(octet_length(encode(text)) AS INT) AS payload_len,
           md5(text) AS payload_md5
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing, JVM side: payload staging, byte length,
    content hash. Proves binary columns flow through scan→project→hash."""
    media = attach_fake_payload(table(spark, sf_dir, "documents"))
    return media.select(
        "doc_id",
        "mime",
        F.col("payload_len").cast("int").alias("payload_len"),
        F.md5(F.col("payload")).alias("payload_md5"),
    )


@query("q_multimodal_decode")  # rows-only: the decode kernel is a Python stub
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal decode path: binary payload → mapInPandas
    stub decoder → typed features → aggregate. Deterministic output."""
    media = attach_fake_payload(table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return (
        feats.groupBy("width")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("payload_len").cast("bigint").alias("total_bytes"),
        )
        .orderBy("width")
    )
