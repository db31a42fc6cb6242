"""Semantic tests for the LLM corpus-prep family — properties the
driver's rows-only check can't see (split integrity across dedup
clusters)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dateng_data_lakes_apache_spark_spark.registry import get_queries

QS = get_queries()


def test_split_by_cluster_never_straddles(spark, sf_dir):
    # the leakage guarantee: every dedup cluster lands in exactly ONE
    # split — no near-dup pair can cross the train/test boundary
    out = QS["q_split_by_cluster"](spark, sf_dir)
    leaked = (
        out.groupBy("keeper_doc_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    assert leaked == 0
    # and it actually groups: at least one multi-doc cluster exists in
    # the fixture corpus (planted near-dups), so the guarantee is not
    # vacuously over singletons
    multi = (
        out.groupBy("keeper_doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert multi > 0
    # all three splits are populated
    assert out.select("split").distinct().count() == 3


def test_bpe_train_classic_example(spark):
    from dateng_data_lakes_apache_spark_spark.operators.llm_pipeline import bpe_train

    docs = spark.createDataFrame([(0, "ab ab ab"), (1, "abc")], ["doc_id", "text"])
    merges = [tuple(r) for r in bpe_train(docs, n_merges=3).collect()]
    # (a,b) count 4 wins; then (ab,</w>) count 3; then the (ab,c)/(c,</w>)
    # tie at 1 breaks lexicographically on the left symbol.
    assert merges == [
        (0, "a", "b", "ab", 4),
        (1, "ab", "</w>", "ab</w>", 3),
        (2, "ab", "c", "abc", 1),
    ]


def test_bpe_merge_is_sequential_greedy(spark):
    # "a a a a" within one word: greedy left-to-right non-overlapping
    # pairing must produce TWO merged tokens, not one (the boundary
    # separators are asserted, not consumed, by the merge regex).
    from dateng_data_lakes_apache_spark_spark.operators.llm_pipeline import bpe_train

    docs = spark.createDataFrame([(0, "aaaa aaaa")], ["doc_id", "text"])
    merges = [tuple(r) for r in bpe_train(docs, n_merges=2).collect()]
    # round 1: pairs in [a,a,a,a,</w>] → (a,a) ×3·2docs=6 beats (a,</w>) ×2
    assert merges[0] == (0, "a", "a", "aa", 6)
    # round 2 state must be [aa,aa,</w>] (sequential greedy), so (aa,aa)
    # count 2 and (aa,</w>) count 2 tie → lexicographic: "aa"+"</w>" loses
    # to "aa"+"aa"? No: left equal, right "</w>" < "aa" → (aa,</w>) wins.
    assert merges[1] == (1, "aa", "</w>", "aa</w>", 2)


def test_bpe_apply_encodes_with_learned_merges(spark):
    from dateng_data_lakes_apache_spark_spark.operators.llm_pipeline import (
        bpe_apply,
        bpe_train,
    )

    docs = spark.createDataFrame([(0, "ab ab ab"), (1, "abc")], ["doc_id", "text"])
    merges = [(r["left"], r["right"]) for r in bpe_train(docs, n_merges=3).collect()]
    rows = {r.doc_id: r for r in bpe_apply(docs, merges).collect()}
    # "ab" → [a,b,</w>] → (a,b) → [ab,</w>] → (ab,</w>) → ["ab</w>"]: 1 token
    assert (rows[0].n_ws_tokens, rows[0].n_bpe_tokens) == (3, 3)
    # "abc" → [a,b,c,</w>] → [ab,c,</w>] → (ab,c) → [abc,</w>]: 2 tokens
    assert (rows[1].n_ws_tokens, rows[1].n_bpe_tokens) == (1, 2)
