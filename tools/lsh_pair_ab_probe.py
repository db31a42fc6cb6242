"""Interleaved A/B: pair-dedup placement for the LSH pair frames (r12).

Variants per query (q_dedup_embedding_lsh, q_knn_graph):
  lib    (library shape, KEPT): bucket self-join -> dropDuplicates
         (vec_a, vec_b) carrying both embedding arrays -> cosine once
         per distinct pair.
  scored (the q_dedup_minhash verify-before-dedup shape): cosine
         (+ threshold) per candidate OCCURRENCE -> narrow projection ->
         dropDuplicates.
  idjoin (variant C): dropDuplicates on narrow (vec_a, vec_b) ids ->
         re-join embeddings twice -> cosine once per distinct pair.

RESULT (32c, sf0.1, median of 3 interleaved rounds, warmup dropped —
the reason both alternatives were REVERTED): candidate pairs collide in
~9 LSH tables on average, so `scored` multiplies the 64-dim triple
cosine fold by the dup factor: dedup_lsh 6.2 -> 53.8 s, knn 13.3 ->
54.1 s. `idjoin` trades the wide dedup exchange for two joins and loses
or stays flat: dedup_lsh 7.9 -> 10.1 s, knn 11.0 -> 10.8 s. The wide
dedup wins locally because map-side partial aggregation collapses most
duplicate candidates before the shuffle. Row sets verified identical
across all three shapes.

Protocol: one session (bench.py env contract), row-set equality asserted
first, then N interleaved noop rounds (lib, scored, idjoin per round)
with round 0 dropped (drift-cancelling, the r11/r12 protocol). Prints
one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from dateng_data_lakes_apache_spark_spark.caching import track
from dateng_data_lakes_apache_spark_spark.operators.similarity import (
    _dot,
    _emb,
    _norm,
    embedding_lsh_frame,
    knn_graph_frame,
    lsh_bucket_table,
)
from dateng_data_lakes_apache_spark_spark.session import get_spark

ROUNDS = 4


def _bucketed(spark, sf_dir):
    e = _emb(spark, sf_dir, unit=True)
    return track(
        lsh_bucket_table(e).select("vec_id", "embedding", "table_id", "bucket")
    )


def _cos(ea, eb):
    return _dot(ea, eb) / (_norm(ea) * _norm(eb))


def scored_embedding_lsh(spark, sf_dir):
    """REJECTED: verify-before-dedup — cosine per candidate occurrence."""
    bucketed = _bucketed(spark, sf_dir)
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cos = _cos(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .where(cos >= 0.35)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 4).alias("cosine"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )


def scored_knn_graph(spark, sf_dir):
    """REJECTED: score-before-dedup — cosine per candidate occurrence."""
    bucketed = _bucketed(spark, sf_dir)
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cos = _cos(F.col("a.embedding"), F.col("b.embedding"))
    scored = (
        a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cos, 4).alias("cosine"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    rn = F.row_number().over(
        Window.partitionBy("vec_a").orderBy(F.col("cosine").desc(), F.col("vec_b"))
    )
    return (
        scored.withColumn("rank", rn)
        .where(F.col("rank") <= 5)
        .select("vec_a", "vec_b", "cosine", "rank")
    )


def _idjoin_pairs(spark, sf_dir, anti: bool):
    """REJECTED variant C: dedup narrow ids, re-join embeddings."""
    bucketed = _bucketed(spark, sf_dir)
    a, b = bucketed.alias("a"), bucketed.alias("b")
    cond = (
        (F.col("a.vec_id") != F.col("b.vec_id"))
        if anti
        else (F.col("a.vec_id") < F.col("b.vec_id"))
    )
    ids = (
        a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & cond,
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    ea = bucketed.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a")
    ).dropDuplicates(["vec_a"])
    eb = bucketed.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b")
    ).dropDuplicates(["vec_b"])
    return ids.join(ea, "vec_a").join(eb, "vec_b")


def idjoin_embedding_lsh(spark, sf_dir):
    p = _idjoin_pairs(spark, sf_dir, anti=False)
    cos = _cos(F.col("emb_a"), F.col("emb_b"))
    return p.where(cos >= 0.35).select(
        "vec_a", "vec_b", F.round(cos, 4).alias("cosine")
    )


def idjoin_knn_graph(spark, sf_dir):
    p = _idjoin_pairs(spark, sf_dir, anti=True)
    cos = _cos(F.col("emb_a"), F.col("emb_b"))
    scored = p.select("vec_a", "vec_b", F.round(cos, 4).alias("cosine"))
    rn = F.row_number().over(
        Window.partitionBy("vec_a").orderBy(F.col("cosine").desc(), F.col("vec_b"))
    )
    return (
        scored.withColumn("rank", rn)
        .where(F.col("rank") <= 5)
        .select("vec_a", "vec_b", "cosine", "rank")
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def rows(df):
    return sorted(map(repr, df.collect()))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="lsh_pair_ab")
    spark.sparkContext.setLogLevel("ERROR")

    cases = {
        "q_dedup_embedding_lsh": (
            embedding_lsh_frame,
            scored_embedding_lsh,
            idjoin_embedding_lsh,
        ),
        "q_knn_graph": (knn_graph_frame, scored_knn_graph, idjoin_knn_graph),
    }

    out = {"cpus": os.environ.get("SPARK_GRAFT_CPUS"), "sf_dir": sf_dir, "cases": {}}
    for name, variants in cases.items():
        lib_rows = rows(variants[0](spark, sf_dir))
        for v in variants[1:]:
            assert rows(v(spark, sf_dir)) == lib_rows, f"{name}: ROW MISMATCH"
        samples: list[list[float]] = [[], [], []]
        for r in range(ROUNDS):
            for i, v in enumerate(variants):
                t0 = time.perf_counter()
                noop(v(spark, sf_dir))
                dt = time.perf_counter() - t0
                if r > 0:  # round 0 = warmup (codegen all shapes)
                    samples[i].append(dt)
        out["cases"][name] = {
            "rows_equal": True,
            "lib_s": round(statistics.median(samples[0]), 3),
            "scored_s": round(statistics.median(samples[1]), 3),
            "idjoin_s": round(statistics.median(samples[2]), 3),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
