"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The core training-data-pipeline family. Design rules for 100 TB:
- never self-join the full corpus — candidate generation goes through
  hash buckets (LSH bands / simhash prefixes) so the join key space is
  bounded and the shuffle is hash-partitioned, not cross-product;
- all hashing is xxhash64 (JVM built-in, seedable, deterministic) via
  higher-order functions — zero Python in the row path;
- survivors are chosen by deterministic min(doc_id), not "first seen".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

# MinHash configuration: 16 permutations → 4 bands × 4 rows.
_N_HASHES = 16
_N_BANDS = 4
_ROWS_PER_BAND = _N_HASHES // _N_BANDS


@query(
    "q_dedup_exact",
    oracle="""
    SELECT md5(text) AS text_md5,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup as hash-groupBy with deterministic keeper selection.

    Grouping on md5(text) rather than raw text keeps shuffle rows at
    ~32 bytes/key instead of shipping full documents — at 100 TB the
    difference between a metadata-sized and a corpus-sized shuffle.
    (dropDuplicates() would keep an arbitrary row; min(doc_id) is stable.)
    """
    d = table(spark, sf_dir, "documents")
    return d.groupBy(F.md5(F.col("text")).alias("text_md5")).agg(
        F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def _word_shingles(text_col, k: int = 3):
    """k-word shingle array from a text column (JVM higher-order fns)."""
    words = F.filter(F.split(text_col, " "), lambda w: w != "")
    n = F.greatest(F.size(words) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: F.concat_ws(" ", F.slice(words, i, k)))
    )


def _min_hash_for_seed(shingles_col, seed: int):
    # NB: the seed must be bound via closure, not a lambda default — pyspark
    # counts lambda params to pick the (x) vs (x, i) HOF form, so a default
    # arg would silently turn the seed into the element index.
    return F.array_min(F.transform(shingles_col, lambda sh: F.xxhash64(sh, F.lit(seed))))


def minhash_signature(shingles_col, n_hashes: int = _N_HASHES):
    """MinHash signature: per seed s, min over shingles of xxhash64(shingle, s).

    xxhash64's seed argument gives us n independent hash families without
    any Python; the transform/array_min pipeline is whole-stage-codegen'd.
    """
    return F.array(*[_min_hash_for_seed(shingles_col, s) for s in range(n_hashes)])


@query("q_dedup_minhash")  # rows-only: banded-LSH pipeline is not DuckDB-SQL-expressible
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs via MinHash + banded LSH, then exact
    signature-similarity verification.

    Pipeline: 3-word shingles → 16-perm MinHash signature → 4 bands of 4
    rows → explode to (band_id, band_hash) keys → self-join *on the band
    key only* → verify estimated Jaccard ≥ 0.5. The corpus is never
    cross-joined: candidate generation cost is O(Σ bucket²) and bucket
    sizes are bounded by collision probability, not corpus size.
    Deterministic (hash-only), checked rows-only by the driver; semantics
    are unit-tested with planted near-duplicates in tests/test_dedup.py.
    """
    # The testdata ships one row group per file → a bare scan runs on one
    # task. Hashing dominates here, so a round-robin repartition (a few MB
    # of shuffle) buys full-core parallelism for the signature computation.
    # On a real lake with properly-sized files this line is a no-op cost.
    d = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    # Materialize shingles in their own projection: the 16 per-seed min-hash
    # expressions then reference one computed array instead of re-deriving
    # split→filter→shingle→distinct 16× (Catalyst does not CSE inside
    # higher-order functions; this projection is a ~20× speedup at sf0.1).
    shingled = d.select("doc_id", _word_shingles(F.col("text")).alias("shingles"))
    sig = shingled.select(
        "doc_id", minhash_signature(F.col("shingles")).alias("sig")
    )
    bands = sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_N_BANDS - 1)),
                lambda b: F.struct(
                    b.alias("band_id"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * _ROWS_PER_BAND + 1, _ROWS_PER_BAND),
                                lambda x: x.cast("string"),
                            ),
                        )
                    ).alias("band_hash"),
                ),
            )
        ).alias("band"),
    ).select("doc_id", "sig", "band.band_id", "band.band_hash")
    # Self-join would recompute the whole shingle→signature pipeline for
    # each side; persist the (small) signature+band table instead. At lake
    # scale this materialization is a parquet write of the signature index.
    bands = bands.persist()
    left = bands.alias("l")
    right = bands.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.sig").alias("sig_a"),
            F.col("r.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est_jaccard = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda a, b: a == b),
                lambda eq: eq,
            )
        ).cast("double")
        / _N_HASHES
    )
    return (
        pairs.select("doc_a", "doc_b", F.round(est_jaccard, 4).alias("est_jaccard"))
        .where(F.col("est_jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    )


@query("q_dedup_simhash")  # rows-only: bit-twiddling pipeline not cleanly SQL-expressible
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document + 4×16-bit block keys for Hamming-
    neighbor candidate generation (Charikar 2002 / Manku et al. 2007).

    simhash bit b = sign of Σ_words (±1 by bit b of xxhash64(word)).
    Computed entirely with aggregate/transform over the word array —
    one pass, no explode, no shuffle until the (tiny) projection.
    By the pigeonhole principle, any pair within Hamming distance 3
    shares at least one of the 4 16-bit blocks, so block keys are the
    LSH bucket keys for near-dup search at scale.
    """
    d = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism  # single-row-group source, see q_dedup_minhash
    )
    words = F.filter(F.split("text", " "), lambda w: w != "")
    hashes = F.transform(words, lambda w: F.xxhash64(w))

    # For each bit, balance = Σ (bit set ? 1 : -1); simhash bit = balance > 0.
    # Bit positions are Python ints (shiftright needs a literal shift), bound
    # via closure — see _min_hash_for_seed for why not lambda defaults.
    def bit_balance(b: int):
        return F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    # Compose the 64-bit fingerprint MSB-first: acc*2 + bit (the *2 is the
    # shift; bit 63 lands in the sign position by two's-complement wraparound).
    simhash = F.lit(0).cast("long")
    for b in range(63, -1, -1):
        simhash = simhash * F.lit(2).cast("long") + F.when(bit_balance(b) > 0, 1).otherwise(0)
    out = d.select("doc_id", simhash.alias("simhash"))
    for i in range(4):
        out = out.withColumn(
            f"block{i}",
            F.shiftright(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF)).cast("int"),
        )
    return out.orderBy("doc_id")


@query(
    "q_dedup_ngram_jaccard",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(list_filter(string_split(text,' '), w -> w <> '')) - 2, 1) + 1),
               i -> array_to_string(list_filter(string_split(text,' '), w -> w <> '')[i:i+2], ' ')
             )) AS shingles
      FROM documents
      WHERE doc_id < 60
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.shingles, b.shingles))), 4) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.2
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-word-shingle Jaccard similarity on a bounded doc subset.

    The exact pairwise form is intentionally restricted (doc_id < 60 →
    ≤ 1.8k pairs) — it is the *verification* stage of near-dup pipelines;
    candidate *generation* at scale is q_dedup_minhash's banded LSH.
    """
    d = table(spark, sf_dir, "documents").where(F.col("doc_id") < 60)
    sh = d.select("doc_id", _word_shingles(F.col("text"), k=3).alias("shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles"))).cast("double")
    union = F.size(F.array_union(F.col("a.shingles"), F.col("b.shingles")))
    jac = inter / union
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 4).alias("jaccard"),
        )
        .where(jac >= 0.2)
    )
