"""Schema-applied lake readers (generalize reference S1-S5).

The reference hard-codes four read shapes (schema'd JSON song/log scans,
parquet read-back, CSV smoke read — etl.py:106,149,195; Test_S3_Access.py:53).
Here each format is one function with the engine's defaults: explicit
schema for row formats (skips Spark's inference pass — one full data
scan saved per read), self-described parquet, and path-list support
(the reference's S3-listing multi-path read, ETL_from_Notebook.py:131-142).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_json(
    spark: SparkSession,
    path: str | Sequence[str],
    schema: StructType,
    multi_line: bool = False,
) -> DataFrame:
    """NDJSON/JSON reader. ``multi_line=False`` is the NDJSON default —
    the reference inverted it and silently dropped data (SURVEY §4.3-Q1)."""
    paths = [path] if isinstance(path, str) else list(path)
    return spark.read.schema(schema).option("multiLine", multi_line).json(paths)


#: NULL sentinel for the engine's CSV dialect. Spark's default writes
#: BOTH NULL and '' as an empty field, so a CSV roundtrip silently
#: merges them (hostile sweep find). With an explicit nullValue, NULL
#: serializes as \\N and '' as "" — lossless on the read-back and
#: readable by DuckDB/Postgres with nullstr='\\N' (the COPY convention).
CSV_NULL = "\\N"


def read_csv(
    spark: SparkSession,
    path: str | Sequence[str],
    schema: StructType | None = None,
    header: bool = True,
    sep: str = ",",
    null_value: str | None = CSV_NULL,
    multi_line: bool = False,
) -> DataFrame:
    """CSV reader (reference S5 / the commented-out K3 sink's format).

    ``null_value`` defaults to the ENGINE dialect's ``\\N`` sentinel —
    the right reader for anything ``write_csv`` produced (NULL vs ''
    stays lossless). For third-party CSVs where a literal two-character
    ``\\N`` field must stay a string, pass ``null_value=None`` to get
    Spark's stock empty-string-as-NULL dialect (ADVICE r7).

    ``multi_line=True`` parses RFC-4180 quoted fields that span lines
    (what ``write_csv`` emits for newline-bearing text — r10 longtext
    find: without it such a record SHATTERS into malformed rows).
    The cost is real and the reason it is not the default: multiLine
    CSV is not line-splittable, so each file parses as one task — at
    100 TB keep newline-bearing text in parquet/JSONL, or accept
    file-level parallelism on the CSV ingest hop."""
    paths = [path] if isinstance(path, str) else list(path)
    reader = spark.read.option("header", header).option("sep", sep)
    if null_value is not None:
        reader = reader.option("nullValue", null_value)
    if multi_line:
        reader = reader.option("multiLine", True)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(paths)


def read_parquet(
    spark: SparkSession,
    path: str | Sequence[str],
    empty_schema: StructType | None = None,
) -> DataFrame:
    """Parquet reader — self-describing, never schema-forced (§4.3-Q8).

    ``empty_schema`` is a FALLBACK only: a dataset with zero data files
    (a partitioned write of an empty frame leaves just _SUCCESS) has
    nothing to infer from, and callers staging their own output can
    supply the schema they wrote so the query degrades to an empty
    frame instead of UNABLE_TO_INFER_SCHEMA. The non-empty path is
    untouched — inference stays authoritative when files exist."""
    from pyspark.errors import AnalysisException

    paths = [path] if isinstance(path, str) else list(path)
    try:
        return spark.read.parquet(*paths)
    except AnalysisException as exc:
        # Only the no-data-files case degrades; path errors etc. stay loud.
        if empty_schema is None or "UNABLE_TO_INFER_SCHEMA" not in str(exc):
            raise
        return spark.createDataFrame([], empty_schema)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = 1_000_000,
) -> None:
    """Partitioned parquet sink (reference K1/K2) with small-file control:
    maxRecordsPerFile caps file size so dynamic partition writes don't
    emit thousands of tiny files per task at high parallelism."""
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, sep: str = ",", header: bool = True, mode: str = "overwrite") -> None:
    """CSV sink (reference K3, ETL_from_Notebook.py:120-122 — commented
    out there, first-class here). NULL-vs-'' lossless via ``CSV_NULL``.

    Whitespace trimming is OFF: Spark's CSV writer defaults
    ``ignoreLeading/TrailingWhiteSpace`` to true and silently REWRITES
    values on the way out ('  \\n word  ' landed as 'word' — r10
    longtext find). A sink must be byte-faithful; trimming is a
    parse-time policy for dirty third-party input, never a write-time
    default."""
    (
        df.write.mode(mode)
        .option("header", header)
        .option("sep", sep)
        .option("nullValue", CSV_NULL)
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(path)
    )


def avro_available(spark: SparkSession) -> bool:
    """True iff the spark-avro connector is on the classpath.

    Avro ships as an EXTERNAL Spark module (org.apache.spark:spark-avro),
    not in the core distribution — the same deployment story as
    hadoop-aws (see sources/object_store.py). Read/write paths gate on
    this so a jar-less runtime degrades with a clear signal instead of
    a ClassNotFoundException mid-pipeline.
    """
    # NB: core spark-sql bundles SOME avro classes (AvroFileFormat,
    # SchemaConverters) even without the module, so probe the V2 source
    # class that only the external spark-avro jar provides.
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.v2.avro.AvroDataSourceV2"
        )
        return True
    except Exception:
        return False


def read_avro(spark: SparkSession, path: str | Sequence[str]) -> DataFrame:
    """Avro reader (self-described schema, like parquet)."""
    if not avro_available(spark):
        raise RuntimeError(
            "spark-avro connector not on the classpath; deploy "
            "org.apache.spark:spark-avro_2.13 matching the Spark version"
        )
    paths = [path] if isinstance(path, str) else list(path)
    return spark.read.format("avro").load(paths)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Avro sink (row format — the lake's streaming-interchange format)."""
    if not avro_available(df.sparkSession):
        raise RuntimeError(
            "spark-avro connector not on the classpath; deploy "
            "org.apache.spark:spark-avro_2.13 matching the Spark version"
        )
    df.write.format("avro").mode(mode).save(path)
