"""UDF surface: vectorized scalar pandas_udf and grouped applyInPandas.

The reference has no UDFs (SURVEY §2.2). Rules of the engine:
- scalar Python logic → ``pandas_udf`` (Arrow batches, numpy kernels);
- grouped custom logic → ``applyInPandas`` (one pandas frame per group);
- never row-at-a-time ``F.udf`` in a hot path (10-100× slower).
Both registered queries use deterministic kernels so the driver's
rows-only checks are stable across runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import table
from ..registry import query


@pandas_udf(DoubleType())
def sigmoid_scaled(v: pd.Series) -> pd.Series:
    """Vectorized numpy kernel: sigmoid of a z-score-ish rescale."""
    x = (v.to_numpy(dtype="float64") - 250.0) / 100.0
    return pd.Series(np.round(1.0 / (1.0 + np.exp(-x)), 6))


@query(
    "q_udf_scalar",
    # The kernel is deterministic closed-form math, so the Python UDF has
    # an exact SQL twin: both engines evaluate the same double expression.
    oracle="""
    SELECT event_id, value,
           round(1.0 / (1.0 + exp(-((value - 250.0) / 100.0))), 6) AS value_sigmoid
    FROM events
    """,
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf over events.value (Arrow-batched, numpy inside)."""
    e = table(spark, sf_dir, "events")
    # No final orderBy: the driver's rows-only check is order-insensitive;
    # a full-table range sort would be pure shuffle cost at scale.
    return e.select(
        "event_id",
        "value",
        sigmoid_scaled(F.col("value")).alias("value_sigmoid"),
    )


_GROUP_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n", LongType()),
        StructField("median_value", DoubleType()),
        StructField("p90_value", DoubleType()),
        StructField("mad_value", DoubleType()),
    ]
)


def _group_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """Robust stats (median / p90 / MAD) — not built into Spark SQL's
    exact aggregate set, the canonical applyInPandas use case."""
    v = np.sort(pdf["value"].to_numpy(dtype="float64"))
    med = float(np.median(v))
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n": [len(v)],
            "median_value": [round(med, 6)],
            "p90_value": [round(float(np.percentile(v, 90)), 6)],
            "mad_value": [round(float(np.median(np.abs(v - med))), 6)],
        }
    )


@query(
    "q_udaf_grouped",
    # Robust stats are order statistics (no float accumulation), so the
    # numpy kernel has an exact DuckDB twin: median == quantile_cont(0.5),
    # np.percentile(90) == quantile_cont(0.9) (same linear interpolation),
    # MAD == median of absolute deviations.
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n,
           round(median(e.value), 6) AS median_value,
           round(quantile_cont(e.value, 0.9), 6) AS p90_value,
           round(median(abs(e.value - m.med)), 6) AS mad_value
    FROM events e JOIN med m ON e.event_type = m.event_type
    GROUP BY e.event_type
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped custom aggregation via applyInPandas, one shuffle on the
    group key. Groups here are event types (5) — each group's frame fits
    a worker; for high-cardinality keys this pattern holds because state
    is per-group, not per-partition."""
    e = table(spark, sf_dir, "events")
    return (
        e.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandas(_group_stats, schema=_GROUP_SCHEMA)
        .orderBy("event_type")
    )


@query(
    "q_udtf_segments",
    oracle="""
    WITH words AS (
      SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents WHERE doc_id % 10 = 0
    ), starts AS (
      SELECT doc_id, ws, len(ws) AS n,
             unnest(range(0, greatest(len(ws), 1), 20)) AS start
      FROM words
    )
    SELECT doc_id, CAST(start / 20 AS INT) AS seg_idx,
           CAST(least(20, n - start) AS INT) AS seg_tokens,
           array_to_string(list_slice(ws, start + 1, start + 20), ' ') AS seg_text
    FROM starts WHERE start < n
    """,
)
def q_udtf_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 user-defined TABLE function): one→many row
    expansion written as a Python class, applied per row with LATERAL —
    a 20-token segmenter over a doc subset, oracle-matched exactly.

    This registers the API surface, with its cost stated plainly: UDTFs
    run row-at-a-time Python (no Arrow batching in the non-vectorized
    form), so the HOF chunker (q_chunk_documents — same semantics, pure
    column expressions) is the 100 TB path; the UDTF slot is for logic
    that genuinely cannot be expressed as expressions (external parsers,
    stateful per-row generators). The doc_id filter keeps the Python
    row count bounded in the harness.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="seg_idx int, seg_tokens int, seg_text string")
    class Segments:
        def eval(self, text: str):
            words = [w for w in (text or "").split(" ") if w]
            for i in range(0, max(len(words), 1), 20):
                seg = words[i : i + 20]
                if seg:
                    yield (i // 20, len(seg), " ".join(seg))

    spark.udtf.register("segments", Segments)
    table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0).select(
        "doc_id", "text"
    ).createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        "SELECT doc_id, s.seg_idx, s.seg_tokens, s.seg_text "
        "FROM docs_for_udtf, LATERAL segments(text) s"
    )
