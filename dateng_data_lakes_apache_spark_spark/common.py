"""Cross-engine determinism helpers shared by all query builders.

Floating-point aggregation order differs between Spark (partition-order
dependent) and any oracle engine, so double SUM/AVG are computed by
accumulating DECIMAL(18,4) — exact, associative, engine-independent —
then cast back to double. Timestamps are emitted as formatted strings
so the value-hash never sees engine-specific timestamp encodings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale 8: the data's derived doubles have ≤6 true decimal digits (prices ×
# discounts × taxes are 2-decimal factors), so an 8-decimal cast is EXACT —
# no rounding ever happens, hence no HALF_UP (Spark) vs HALF_EVEN (DuckDB)
# tie-breaking divergence. A 4-decimal cast hit those ties ~1/1000 rows.
DEC = "decimal(30,8)"


def finite(col: Column) -> Column:
    """True iff the (numeric) value is non-NULL and finite.

    The decimal-exact aggregates are DEFINED over finite observations:
    a corrupt feed's NaN/±Inf must be excluded EXPLICITLY on both
    engines, because the implicit behaviors diverge catastrophically —
    Spark's non-ANSI double→decimal cast silently NULLs non-finite
    (dropping it from sums) while DuckDB's cast THROWS; worse, Spark's
    double→bigint cast turns NaN into 0 and +Inf into Long.MAX (a fake
    zero-cent / max-cent observation — silent corruption). Found by the
    r9 ``nonfinite`` degenerate catalog."""
    d = col.cast("double")
    return d.isNotNull() & ~F.isnan(d) & (F.abs(d) != float("inf"))


def o_finite(expr: str) -> str:
    """DuckDB twin of :func:`finite`."""
    return f"isfinite(CAST({expr} AS DOUBLE))"


def vec_ok(col: Column, dim: int | None = None) -> Column:
    """Vector validity contract: True iff ``col`` is a usable embedding.

    A vector participates in geometric operators only if it is non-NULL,
    non-empty, every element is non-NULL and finite, and (when ``dim``
    is given) it has exactly the declared dimension. Found by the r11
    ``badvec`` degenerate catalog: without the contract, a NULL element
    makes DuckDB's list_inner_product THROW while Spark's zip_with
    silently propagates NULL; a NaN/Inf element poisons dot products,
    LSH sign buckets and centroid training on both engines; a
    wrong-length vector is NULL-padded by Spark's zip_with but is a
    hard error in DuckDB — three different failure modes for the same
    corrupt row. A real 100 TB corpus WILL contain such vectors
    (truncated writes, failed embedding jobs), so the rule is explicit
    and identical on both engines, like :func:`finite` for scalars.
    ``dim`` comes from the embedding model's card — production pipelines
    always know it; at scale, validate at ingest and persist the flag
    instead of re-evaluating per query. Zero-norm vectors PASS (they
    are legitimate for norms/centroids/scalers); cosine consumers must
    additionally exclude them (norm > 0) — division by a zero norm is
    the remaining poisoning path.
    """
    ok = col.isNotNull() & (F.size(col) > 0) & F.forall(col, finite)
    if dim is not None:
        ok = ok & (F.size(col) == dim)
    return ok


def o_vec_ok(expr: str, dim: int | None = None) -> str:
    """DuckDB twin of :func:`vec_ok` (len / list_transform /
    list_aggregate 'bool_and'; coalesce guards the NULL-list fold)."""
    ok = (
        f"({expr} IS NOT NULL AND len({expr}) > 0 AND "
        f"coalesce(list_aggregate(list_transform({expr}, "
        f"x -> x IS NOT NULL AND isfinite(CAST(x AS DOUBLE))), "
        f"'bool_and'), FALSE))"
    )
    if dim is not None:
        ok = f"({ok} AND len({expr}) = {dim})"
    return ok


#: Hive partition directory names embed the partition VALUE; most
#: filesystems cap a single path segment at 255 BYTES, so an unbounded
#: string partition key is a latent write failure (found by the r10
#: ``longtext`` catalog: a 10k-char value aborted every partitioned
#: sink). Values whose worst-case ESCAPED on-disk length is at or under
#: this bound pass through verbatim — the margin below 255 absorbs the
#: ``column=`` prefix.
PARTITION_VALUE_MAX_BYTES = 128

#: Characters hive %-escapes in partition directory names — each raw
#: byte becomes 3 on-disk bytes (``%XX``). Gating on RAW bytes alone is
#: not enough (ADVICE r10): a 128-byte value of mostly colons/newlines
#: expands ~3x on disk and still blows the 255-byte path-segment cap,
#: so :func:`bound_part` gates on the worst-case escaped length. The
#: set mirrors Spark ``ExternalCatalogUtils.charToEscape`` (= Hive
#: ``FileUtils``): ASCII control chars, DEL, and ``"#%'*/:=?\{[]^`` —
#: multi-byte UTF-8 passes through unescaped. Same regex runs in Java
#: regex (Spark) and RE2 (DuckDB).
PART_ESC_RE = "[\\x00-\\x1f\\x7f\"#%'*/:=?\\\\{\\[\\]^]"


def _part_esc_len(col: Column) -> Column:
    """Worst-case hive-escaped byte length of a partition value: raw
    UTF-8 bytes + 2 extra per escape-required char (1 byte → ``%XX``)."""
    return F.octet_length(col) + 2 * (
        F.length(col) - F.length(F.regexp_replace(col, PART_ESC_RE, ""))
    )


def bound_part(col: Column) -> Column:
    """Bound a string partition value for hive directory layout.

    Values whose worst-case escaped length (raw UTF-8 bytes + 2 per
    hive-escaped char, see :data:`PART_ESC_RE`) is ≤
    :data:`PARTITION_VALUE_MAX_BYTES` are verbatim (the normal case —
    real partition keys are dates/categories); longer values become
    ``first-24-chars + '#' + md5(value)`` (≤ 72 escaped / 96 raw prefix
    bytes even for all-escaped or 4-byte code points, + 33 ASCII —
    unique per raw value, deterministic, engine-reproducible). Byte
    gate, char prefix: the gate must be byte-accurate for the
    filesystem limit, while a CHARACTER prefix slice is identical in
    both engines and can never split a code point. This is an INGEST
    rule, not a read-path transform: apply it to the partition column
    when STAGING a partitioned table, the same way a production lake
    bounds its partition keys. NULL stays NULL (and hive collapses
    NULL/'' to the default partition regardless — see the
    q_dynamic_overwrite oracle note). md5 (not xxhash64): the oracle
    twin needs the identical suffix, and DuckDB has md5 built in."""
    return F.when(
        _part_esc_len(col) <= PARTITION_VALUE_MAX_BYTES, col
    ).otherwise(F.concat(F.substring(col, 1, 24), F.lit("#"), F.md5(col)))


def o_bound_part(expr: str) -> str:
    """DuckDB twin of :func:`bound_part` (strlen = byte length;
    length = char length; regexp_replace 'g' = Spark's replace-all)."""
    esc = PART_ESC_RE.replace("'", "''")
    elen = (
        f"(strlen({expr}) + 2*(length({expr}) "
        f"- length(regexp_replace({expr}, '{esc}', '', 'g'))))"
    )
    return (
        f"CASE WHEN {elen} <= {PARTITION_VALUE_MAX_BYTES} THEN {expr} "
        f"ELSE substr({expr}, 1, 24) || '#' || md5({expr}) END"
    )


def dsum(col: Column) -> Column:
    """Deterministic double sum over FINITE observations: exact decimal
    accumulation → double (see :func:`finite` for the exclusion rule)."""
    return F.sum(F.when(finite(col), col).cast(DEC)).cast("double")


def davg(col: Column) -> Column:
    """Deterministic double avg over FINITE observations."""
    return F.sum(F.when(finite(col), col).cast(DEC)).cast("double") / F.count(
        F.when(finite(col), col)
    )


def o_dsum(expr: str) -> str:
    """DuckDB twin of :func:`dsum`."""
    return (
        f"CAST(SUM(CASE WHEN {o_finite(expr)} "
        f"THEN CAST({expr} AS DECIMAL(30,8)) END) AS DOUBLE)"
    )


def o_davg(expr: str) -> str:
    """DuckDB twin of :func:`davg`."""
    return (
        f"CAST(SUM(CASE WHEN {o_finite(expr)} "
        f"THEN CAST({expr} AS DECIMAL(30,8)) END) AS DOUBLE)"
        f" / COUNT(CASE WHEN {o_finite(expr)} THEN 1 END)"
    )


def nsize(col: Column) -> Column:
    """Null-safe ``size()``: a NULL array (split/regexp of NULL text)
    counts as NULL, not the legacy Spark ``-1`` — a fake -1 token/match
    count leaking into dirty-corpus audits is exactly the wrong-value
    class the hostile-catalog sweep exists to catch, and SQL engines
    (the oracles included) return NULL here."""
    return F.when(col.isNull(), F.lit(None)).otherwise(F.size(col))


def det_round(col: Column, n: int) -> Column:
    """Tie-deterministic double rounding: ``floor(x·10ⁿ + 0.5) / 10ⁿ``.

    ``round()`` on a double is the one place the engines' decimal
    tie-breaking can diverge (Spark routes through BigDecimal HALF_UP
    on the full decimal expansion; DuckDB rounds ``x·10ⁿ`` half away
    from zero in doubles) — found by the degenerate/sf sweeps on
    quotients that land a hair's width from a .xxxx5 boundary. The
    floor form is one IEEE multiply, add, floor, divide on BOTH
    engines, so the result is bit-identical everywhere, and it never
    emits ``-0.0`` (the other cross-engine repr trap). Semantics:
    round-half-toward-+∞. Only for |x·10ⁿ| < 2⁶³ (Spark's floor yields
    a bigint) — fine for every rounded metric in this engine.
    """
    f = float(10**n)
    return F.floor(col * F.lit(f) + F.lit(0.5)) / F.lit(f)


def o_det_round(expr: str, n: int) -> str:
    """DuckDB twin of :func:`det_round`."""
    f = float(10**n)
    return f"floor(({expr}) * {f} + 0.5) / {f}"


def spread(df, spark):
    """Round-robin repartition ONLY when the scan under-parallelizes.

    The local testdata ships one row group per file, so a bare parquet scan
    plans a single task; compute-heavy column pipelines (minhash, simhash,
    fingerprints) then run on one core. On a real lake with properly-sized
    files the scan already matches cluster parallelism and an unconditional
    ``repartition()`` would be a pure-cost extra full shuffle — so gate it
    on the planned partition count instead of applying it blindly.
    """
    target = spark.sparkContext.defaultParallelism
    # Serious under-parallelism only: a scan already within 2× of core count
    # keeps its partitioning (the shuffle would cost more than it buys).
    if df.rdd.getNumPartitions() >= max(1, target // 2):
        return df
    return df.repartition(target)


def ts_str(col: Column) -> Column:
    """Timestamp → canonical string (UTC session tz is pinned)."""
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def o_ts_str(expr: str) -> str:
    """DuckDB twin of :func:`ts_str`."""
    return f"strftime({expr}, '%Y-%m-%d %H:%M:%S')"


def date_str(col: Column) -> Column:
    return F.date_format(col, "yyyy-MM-dd")


def o_date_str(expr: str) -> str:
    return f"strftime({expr}, '%Y-%m-%d')"


def md5_hex4_spark(expr: str, off: int) -> str:
    """Spark-dialect: 4 md5 hex digits at 1-based ``off`` as a BIGINT —
    the cross-engine deterministic hash (conv() does the base
    conversion JVM-side)."""
    return (
        f"CAST(conv(substring(md5(CAST({expr} AS STRING)), {off}, 4), 16, 10)"
        " AS BIGINT)"
    )


def md5_hex4_duck(expr: str, off: int) -> str:
    """DuckDB twin of :func:`md5_hex4_spark` — no base-conv builtin
    there, so hex digits convert via instr arithmetic (the
    q_split_train_test oracle pattern)."""
    h = f"md5(CAST({expr} AS STRING))"
    return ("(" + " + ".join(
        f"(instr('0123456789abcdef', substr({h}, {off + i}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)) + ")")
