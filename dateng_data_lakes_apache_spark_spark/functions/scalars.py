"""Scalar function packs: string, date, math, JSON, array.

All JVM built-ins (pyspark.sql.functions) — whole-stage-codegen'd, no
Python in the row path. Extends the reference's tiny scalar surface
(D1-D3: from_unixtime, date parts, division — etl.py:156,180-186).

Cross-engine notes baked into the oracles:
- day-of-week: Spark ``weekday()`` (Mon=0) + 1 == DuckDB ``isodow`` (Mon=1);
- ``ceil``/``floor`` return LONG in Spark, DOUBLE in DuckDB → cast both;
- transcendentals (ln/pow/sqrt) rounded to 4 dp — libm vs JVM can differ
  in the last ulp;
- JSON extraction: ``get_json_object`` vs ``json_extract_string``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..common import det_round, o_det_round, o_finite, o_ts_str, ts_str
from ..registry import query


@query(
    "q_string_funcs",
    oracle=r"""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           substring(p_name, 1, 4) AS name_prefix,
           concat_ws('|', p_brand, p_type) AS brand_type,
           CAST(length(p_name) AS INT) AS name_len,
           trim(p_name) AS name_trim,
           regexp_extract(p_brand, '(\d+)', 1) AS brand_num,
           replace(p_type, 'ANDARD', '*') AS type_repl,
           lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded
    FROM part
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar pack over part."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("int").alias("name_len"),
        F.trim("p_name").alias("name_trim"),
        F.regexp_extract("p_brand", r"(\d+)", 1).alias("brand_num"),
        F.replace(F.col("p_type"), F.lit("ANDARD"), F.lit("*")).alias("type_repl"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
    )


@query(
    "q_date_funcs",
    oracle=f"""
    SELECT event_id,
           {o_ts_str('ts')} AS ts_str,
           CAST(year(ts) AS INT) AS y,
           CAST(month(ts) AS INT) AS m,
           CAST(day(ts) AS INT) AS d,
           CAST(hour(ts) AS INT) AS h,
           CAST(isodow(ts) AS INT) AS iso_dow,
           CAST(weekofyear(ts) AS INT) AS woy,
           {o_ts_str("date_trunc('day', ts)")} AS day_start,
           {o_ts_str("date_trunc('hour', ts)")} AS hour_start,
           CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT)
             AS days_since_epoch_start
    FROM events
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar pack over events (mirrors reference D1/D2,
    etl.py:156,180-186, with the to_timestamp fix of SURVEY §4.3-Q2)."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        ts_str(F.col("ts")).alias("ts_str"),
        F.year("ts").cast("int").alias("y"),
        F.month("ts").cast("int").alias("m"),
        F.dayofmonth("ts").cast("int").alias("d"),
        F.hour("ts").cast("int").alias("h"),
        (F.weekday("ts") + 1).cast("int").alias("iso_dow"),
        F.weekofyear("ts").cast("int").alias("woy"),
        ts_str(F.date_trunc("day", F.col("ts"))).alias("day_start"),
        ts_str(F.date_trunc("hour", F.col("ts"))).alias("hour_start"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch_start"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT event_id,
           value,
           round(value / 3.0, 4) AS value_div3,
           abs(value - 100) AS dist_from_100,
           CAST(ceil(value) AS BIGINT) AS value_ceil,
           CAST(floor(value) AS BIGINT) AS value_floor,
           round(sqrt(value), 4) AS value_sqrt,
           round(ln(value + 1), 4) AS value_ln,
           round(pow(value, 2), 4) AS value_sq,
           CAST(user_id % 7 AS BIGINT) AS user_mod7,
           CAST(greatest(value, 100.0) AS DOUBLE) AS val_hi,
           CAST(least(value, 100.0) AS DOUBLE) AS val_lo
    FROM events
    WHERE value IS NULL OR isfinite(value)
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar pack over events.value."""
    # Non-finite rows excluded on BOTH sides (nonfinite catalog, r9):
    # ceil/floor→bigint of NaN is 0/Long.MAX in Spark but an error in
    # DuckDB — neither is a usable semantic, so the pack is defined
    # over finite (or NULL-propagating) inputs.
    from ..common import finite

    e = table(spark, sf_dir, "events").where(
        F.col("value").isNull() | finite(F.col("value"))
    )
    v = F.col("value")
    return e.select(
        "event_id",
        v.alias("value"),
        F.round(v / 3.0, 4).alias("value_div3"),
        F.abs(v - 100).alias("dist_from_100"),
        F.ceil(v).cast("bigint").alias("value_ceil"),
        F.floor(v).cast("bigint").alias("value_floor"),
        F.round(F.sqrt(v), 4).alias("value_sqrt"),
        F.round(F.log(v + 1), 4).alias("value_ln"),
        F.round(F.pow(v, 2), 4).alias("value_sq"),
        (F.col("user_id") % 7).cast("bigint").alias("user_mod7"),
        F.greatest(v, F.lit(100.0)).cast("double").alias("val_hi"),
        F.least(v, F.lit(100.0)).cast("double").alias("val_lo"),
    )


@query(
    "q_json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string((CASE WHEN json_valid(props) THEN props END), '$.k') AS k_str,
           CAST(json_extract_string((CASE WHEN json_valid(props) THEN props END), '$.k') AS INT) AS k_int,
           CASE WHEN CAST(json_extract_string((CASE WHEN json_valid(props) THEN props END), '$.k') AS INT) >= 50
                THEN 'high' ELSE 'low' END AS k_band
    FROM events
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the events.props JSON-string column.

    At scale, repeated get_json_object on the same column should become
    a single from_json(schema) parse — both forms stay JVM-side.
    """
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
        F.when(k.cast("int") >= 50, "high").otherwise("low").alias("k_band"),
    )


@query(
    "q_array_funcs",
    oracle=f"""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           CASE WHEN {o_finite('embedding[1]')} THEN
             {o_det_round('CAST(embedding[1] AS DOUBLE)', 4)} END AS first_val,
           CASE WHEN {o_finite('CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)'
                               ' + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE)')} THEN
             {o_det_round('CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)'
                          ' + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE)', 4)}
           END AS head4_sum,
           CAST(CASE WHEN {o_finite('embedding[1]')}
                     THEN embedding[1] > 0 END AS BOOLEAN) AS first_positive
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar pack over embeddings.embedding (array<float>).

    Element access + arithmetic stays JVM-side; float→double casts are
    exact so the explicit 4-term sum is engine-identical. Rounding is
    det_round: a tiny-negative head4_sum rounded through the engines'
    native round() diverges as -0.0 vs 0.0 (sf0.001 sweep find).
    Degenerate arrays (r11 badvec) are REPORTED, not filtered — this is
    the array-function showcase, not a geometric operator: nsize keeps
    a NULL array's dim NULL (Spark's legacy size() fabricates -1), and
    the value outputs apply the engine-wide finite contract (det_round
    floors through a BIGINT on Spark but stays DOUBLE in DuckDB, so a
    NaN/Inf input fabricates 0 on one engine and NaN on the other —
    the same class the r10 nonfinite sweep pinned for scalars).
    """
    em = table(spark, sf_dir, "embeddings")
    from ..common import finite, nsize

    def el(i: int):
        return F.element_at("embedding", i).cast("double")

    head4 = el(1) + el(2) + el(3) + el(4)
    return em.select(
        "vec_id",
        nsize(F.col("embedding")).cast("int").alias("dim"),
        F.when(finite(el(1)), det_round(el(1), 4)).alias("first_val"),
        F.when(finite(head4), det_round(head4, 4)).alias("head4_sum"),
        F.when(finite(el(1)), F.element_at("embedding", 1) > 0).alias(
            "first_positive"
        ),
    )


@query(
    "q_regex_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowels,
           CAST(regexp_matches(p_brand, '^Brand#[0-9]+$') AS BOOLEAN)
             AS brand_wellformed,
           CAST(length(regexp_replace(p_type, '[^A-Z]', '', 'g')) AS INT)
             AS n_caps
    FROM part
    """,
)
def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar pack: extract / replace-all / match-test / class
    counting. Patterns are restricted to the syntax subset where Java
    regex (Spark) and RE2 (DuckDB) agree — character classes, anchors,
    capture groups; no backreferences or lookaround, which RE2 rejects.
    Spark's regexp_replace is replace-ALL by default; DuckDB needs the
    explicit 'g' flag — a classic cross-engine parity trap the oracle
    pins down. All JVM-codegen, scan-speed, map-only.
    """
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", r"[aeiou]", "").alias("name_novowels"),
        F.col("p_brand").rlike(r"^Brand#[0-9]+$").alias("brand_wellformed"),
        F.length(F.regexp_replace("p_type", r"[^A-Z]", ""))
        .cast("int")
        .alias("n_caps"),
    )


@query(
    "q_array_setops",
    oracle="""
    WITH t AS (
      -- NULL name/type = the EMPTY word set (explicit on both sides:
      -- set algebra over NULL otherwise NULL-propagates differently
      -- per engine — hostile sweep find)
      SELECT p_partkey,
             list_sort(list_distinct(COALESCE(string_split(lower(p_name), ' '), []))) AS a,
             list_sort(list_distinct(COALESCE(string_split(lower(p_type), ' '), []))) AS b
      FROM part
    )
    SELECT p_partkey,
           -- DuckDB's array_to_string returns NULL for an EMPTY list
           -- (Spark's array_join returns '') — coalesce closes the gap
           COALESCE(array_to_string(list_sort(list_intersect(a, b)), ','), '')
             AS common,
           COALESCE(array_to_string(
             list_sort(list_distinct(list_concat(a, b))), ','), '') AS united,
           COALESCE(array_to_string(
             list_sort(list_filter(a, x -> NOT list_contains(b, x))), ','), '')
             AS a_only,
           CAST(len(list_intersect(a, b)) AS INT) AS n_common
    FROM t
    """,
)
def q_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra: intersect / union / except over per-row word
    sets. Inputs are deduplicated and sorted FIRST so the operations are
    true set semantics — Spark's array_intersect and DuckDB's
    list_intersect disagree on duplicate handling and result order, and
    normalizing the inputs (then sorting the outputs) removes both
    divergences. Outputs serialize via array_join (scalar columns only
    cross the driver hash). Everything is JVM expression work, map-only,
    scan-speed.
    """
    p = table(spark, sf_dir, "part")
    empty = F.array().cast("array<string>")
    a = F.array_sort(F.array_distinct(F.coalesce(F.split(F.lower("p_name"), " "), empty)))
    b = F.array_sort(F.array_distinct(F.coalesce(F.split(F.lower("p_type"), " "), empty)))
    t = p.select("p_partkey", a.alias("a"), b.alias("b"))
    return t.select(
        "p_partkey",
        F.array_join(F.array_sort(F.array_intersect("a", "b")), ",").alias("common"),
        F.array_join(F.array_sort(F.array_union("a", "b")), ",").alias("united"),
        F.array_join(F.array_sort(F.array_except("a", "b")), ",").alias("a_only"),
        F.size(F.array_intersect("a", "b")).cast("int").alias("n_common"),
    )


@query(
    "q_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string((CASE WHEN json_valid(props) THEN props END), '$.k') AS INT) AS k,
           CAST(json_extract_string((CASE WHEN json_valid(props) THEN props END), '$.k') AS INT) IS NOT NULL AS parsed_ok,
           CASE WHEN props IS NULL OR props = ''
                THEN NULL  -- Spark: from_json of NULL/'' -> NULL struct -> NULL
                WHEN CAST(json_extract_string((CASE WHEN json_valid(props) THEN props END), '$.k') AS INT) IS NULL
                THEN '{}'  -- malformed text / missing k: PERMISSIVE struct-of-nulls, to_json omits null fields
                ELSE concat('{"k":', CAST(CAST(json_extract_string((CASE WHEN json_valid(props) THEN props END), '$.k') AS INT) AS VARCHAR), '}')
           END AS rebuilt
    FROM events
    """,
)
def q_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-applied JSON parsing: ONE from_json(schema) per row into a
    typed struct, fields accessed natively, then re-serialized with
    to_json — the structured counterpart to q_json_funcs' per-path
    get_json_object (which re-parses the string for every path).

    At 100 TB the difference compounds per extracted field: from_json
    parses once into an UnsafeRow struct (columnar-friendly, codegen
    field access), while N get_json_object calls are N text scans of
    the same payload. The to_json rebuild also pins the writer surface
    (struct → canonical JSON text) against the oracle's string
    construction.
    """
    e = table(spark, sf_dir, "events")
    return (
        e.select("event_id", F.from_json("props", "k int").alias("parsed"))
        .select(
            "event_id",
            F.col("parsed.k").alias("k"),
            F.col("parsed.k").isNotNull().alias("parsed_ok"),
            F.to_json("parsed").alias("rebuilt"),
        )
    )


# --- business-day arithmetic ------------------------------------------

# Closed-form weekday count: g(n) = number of weekdays among epoch days
# [0, n). 1970-01-01 is a Thursday, so day k's Monday-based weekday is
# (k+3) % 7 and g(n) = h(n+3) - 3 with h(m) = 5*(m div 7) + min(m mod
# 7, 5). Business days in (a, b] = g(b+1) - g(a+1) — O(1) arithmetic
# per row, no calendar dim, no join; property-tested against a
# datetime loop in tests/test_web_network.py.
def _g_spark(day_col: str) -> str:
    m = f"({day_col} + 4)"  # n + 3 with n = day + 1
    return f"(5 * ({m} div 7) + least({m} % 7, 5) - 3)"


def _g_duck(day_col: str) -> str:
    m = f"({day_col} + 4)"
    return f"(5 * ({m} // 7) + least({m} % 7, 5) - 3)"


@query(
    "q_business_days",
    oracle=f"""
    WITH spans AS (
      SELECT o_orderpriority,
             datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS a,
             datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS b
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM({_g_duck('b')} - {_g_duck('a')}) AS BIGINT) AS total_busdays,
           CAST(SUM({_g_duck('b')} - {_g_duck('a')}) AS DOUBLE) / COUNT(*)
             AS avg_busdays
    FROM spans WHERE b >= a
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average business days (weekends excluded) from order to line
    shipment, per order priority.

    The weekday count is a CLOSED FORM over epoch-day numbers — O(1)
    codegen'd arithmetic per row, no calendar dimension, no range join
    — so at 100 TB it rides the fact scan for free. (Holiday calendars
    would add a pre-aggregated cumulative-holiday lookup dim; the
    weekend term stays closed-form.) Integer day sums make the average
    exact: BIGINT total / COUNT, one double division at the end.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias("a"),
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.datediff(F.to_date("l_shipdate"), F.lit("1970-01-01")).alias("b"),
    )
    busdays = F.expr(f"{_g_spark('b')} - {_g_spark('a')}")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("b") >= F.col("a"))
        .select("o_orderpriority", busdays.alias("bd"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("bd").cast("bigint").alias("total_busdays"),
            (F.sum("bd").cast("double") / F.count(F.lit(1))).alias("avg_busdays"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_bitwise_funcs",
    oracle="""
    SELECT o_orderpriority,
           CAST(bit_and(o_orderkey % 4096) AS BIGINT) AS key_and,
           CAST(bit_or(o_orderkey % 4096) AS BIGINT) AS key_or,
           CAST(bit_xor(o_orderkey % 4096) AS BIGINT) AS key_xor,
           CAST(bit_xor(o_orderkey) AS BIGINT) AS full_xor
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate surface: AND/OR/XOR folds per group — the
    primitives under Bloom builds (q_bloom_membership's packed-word
    bit_or), permission-mask intersection, and XOR set-fingerprints
    (full_xor is an order-independent group checksum: any single
    changed key flips it, the cheap sibling of q_table_diff's
    SUM-of-md5). All three are commutative+associative, so they
    map-side combine and the shuffle carries one long per group."""
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 4096
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.bit_and(k).cast("bigint").alias("key_and"),
            F.bit_or(k).cast("bigint").alias("key_or"),
            F.bit_xor(k).cast("bigint").alias("key_xor"),
            F.bit_xor("o_orderkey").cast("bigint").alias("full_xor"),
        )
        .orderBy("o_orderpriority")
    )
