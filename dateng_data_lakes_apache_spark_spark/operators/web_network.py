"""Web/network log operators: longest-prefix-match IP routing joins and
URL parsing — the lake-side half of a clickstream/CDN pipeline.

Like the geospatial family, the testdata has no IP/URL columns, so both
are derived deterministically from integer keys with shared SQL text
(pure BIGINT arithmetic / concat), making the derivation part of the
query contract and identical across Spark and the DuckDB oracle.

Scale design (100 TB of flow logs):
- LPM join: NEVER a theta/range join. The route table splits by prefix
  length; each length becomes one equi-join on the masked prefix
  (mask = subtract-modulo, no engine-specific shift ops), and
  longest-prefix-wins is a partial-aggregatable max(struct(plen, ...))
  per flow — map-side combine collapses the shuffle to one row per IP.
  Route tables are small (≲1M routes) → broadcast both probes.
- URL parse: pure codegen'd regexp/string expressions, no UDF.

Reference scope: the reference ETL (etl.py:91-226) has no network
operators; beyond-contract lake surface (SURVEY §2.4 extension wave).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

# --- shared derivations ------------------------------------------------

# IPv4 as BIGINT in [0, 2^32): Knuth-hash the event id.
_IP = "((event_id * 2654435761) % 4294967296)"

# Masked prefixes via subtract-modulo (valid in both dialects; `div` is
# Spark-only and `//` DuckDB-only). /8 block = top octet, /16 = top two.
_IP_P8 = f"CAST(({_IP} - {_IP} % 16777216) / 16777216 AS BIGINT)"
_IP_P16 = f"CAST(({_IP} - {_IP} % 65536) / 65536 AS BIGINT)"

# Route table from nation: every nation owns one /8 and one /16. The
# multipliers are odd (units mod 256), so prefixes are collision-free
# for nationkey < 256 and the route table is a function.
_R_P8 = "((n_nationkey * 7) % 256)"
_R_P16 = "(((n_nationkey * 13) % 256) * 256 + (n_nationkey * 29) % 256)"


@query(
    "q_lpm_route_join",
    oracle=f"""
    WITH flows AS (
      SELECT event_id, {_IP_P8} AS p8, {_IP_P16} AS p16 FROM events
    ),
    r8 AS (SELECT n_nationkey AS owner, {_R_P8} AS pfx FROM nation),
    r16 AS (SELECT n_nationkey AS owner, {_R_P16} AS pfx FROM nation),
    hits AS (
      SELECT f.event_id, r.owner, 8 AS plen FROM flows f JOIN r8 r ON f.p8 = r.pfx
      UNION ALL
      SELECT f.event_id, r.owner, 16 AS plen FROM flows f JOIN r16 r ON f.p16 = r.pfx
    ),
    best AS (
      SELECT event_id, owner, plen,
             ROW_NUMBER() OVER (PARTITION BY event_id
                                ORDER BY plen DESC, owner DESC) AS rn
      FROM hits
    )
    SELECT CAST(owner AS INT) AS owner_nation,
           CAST(plen AS INT) AS prefix_len,
           CAST(COUNT(*) AS BIGINT) AS n_flows
    FROM best WHERE rn = 1
    GROUP BY 1, 2
    ORDER BY owner_nation, prefix_len
    """,
)
def q_lpm_route_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix-match routing: flows land on the most specific
    route (each nation announces one /8 and one /16), counted per owner
    and matched prefix length.

    Per prefix length one broadcast equi-join on the masked prefix; LPM
    resolves as max(struct(plen, owner)) — a hash agg with map-side
    combine, never a per-IP window. Adding lengths (/12, /24, ...) adds
    joins, not complexity class.
    """
    flows = table(spark, sf_dir, "events").select(
        "event_id",
        F.expr(_IP_P8).alias("p8"),
        F.expr(_IP_P16).alias("p16"),
    )
    nat = table(spark, sf_dir, "nation")
    r8 = nat.select(F.col("n_nationkey").alias("owner"), F.expr(_R_P8).alias("pfx"))
    r16 = nat.select(F.col("n_nationkey").alias("owner"), F.expr(_R_P16).alias("pfx"))
    hits = (
        flows.join(F.broadcast(r8), flows.p8 == r8.pfx)
        .select("event_id", "owner", F.lit(8).alias("plen"))
        .unionByName(
            flows.join(F.broadcast(r16), flows.p16 == r16.pfx).select(
                "event_id", "owner", F.lit(16).alias("plen")
            )
        )
    )
    best = hits.groupBy("event_id").agg(F.max(F.struct("plen", "owner")).alias("b"))
    return (
        best.select(
            F.col("b.owner").cast("int").alias("owner_nation"),
            F.col("b.plen").cast("int").alias("prefix_len"),
        )
        .groupBy("owner_nation", "prefix_len")
        .agg(F.count(F.lit(1)).alias("n_flows"))
        .orderBy("owner_nation", "prefix_len")
    )


# --- URL parsing -------------------------------------------------------

# `||` instead of concat(): DuckDB's concat SKIPS NULL args while
# Spark's propagates them, so a NULL source/lang synthesized different
# URLs per engine (hostile sweep find). `||` NULL-propagates in BOTH —
# a doc with no source/lang has no URL, and the NULL parse group
# carries it visibly.
_URL = (
    "'https://' || source || '.example.com/' || lang || '/p' ||"
    " CAST(doc_id % 97 AS STRING) || '?id=' || CAST(doc_id AS STRING) ||"
    " '&ref=' || lang"
)


@query(
    "q_url_parse",
    oracle=f"""
    WITH urls AS (SELECT doc_id, {_URL} AS url FROM documents),
    parsed AS (
      SELECT doc_id,
             regexp_extract(url, '^https://([^/]+)/', 1) AS host,
             regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
             CAST(regexp_extract(url, '[?&]id=([0-9]+)', 1) AS BIGINT) AS id_param
      FROM urls
    )
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT path) AS BIGINT) AS n_paths,
           CAST(SUM(CASE WHEN id_param = doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_id_roundtrip
    FROM parsed
    GROUP BY host
    ORDER BY host
    """,
)
def q_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize URLs, then parse host / path / query-param back out
    with regexp expressions and aggregate per host.

    The regexes are anchored, shared-text, and codegen'd (no UDF);
    ``n_id_roundtrip`` proves parse inverts synth on every row. The
    patterns avoid lookarounds so Java regex and RE2 agree.
    """
    docs = table(spark, sf_dir, "documents")
    parsed = docs.select(
        "doc_id",
        F.expr(f"regexp_extract({_URL}, '^https://([^/]+)/', 1)").alias("host"),
        F.expr(f"regexp_extract({_URL}, '^https://[^/]+(/[^?]*)', 1)").alias("path"),
        F.expr(f"CAST(regexp_extract({_URL}, '[?&]id=([0-9]+)', 1) AS BIGINT)").alias(
            "id_param"
        ),
    )
    return (
        parsed.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("path").alias("n_paths"),
            F.sum(
                F.when(F.col("id_param") == F.col("doc_id"), 1).otherwise(0)
            ).cast("bigint").alias("n_id_roundtrip"),
        )
        .orderBy("host")
    )


# --- URL canonicalization dedup ----------------------------------------

# Crawl variant synth: the page identity is (source, lang, doc_id % 500)
# but each fetch carries a volatile tracking param — the thing URL
# canonicalization exists to strip.
# `||` for the same NULL-propagation parity as _URL above.
_CRAWL_URL = (
    "'https://' || source || '.example.com/' || lang || '/p' ||"
    " CAST(doc_id % 500 AS STRING) || '?sid=' || CAST(doc_id AS STRING)"
)
_CANON = f"regexp_replace({_CRAWL_URL}, '[?&]sid=[0-9]+', '')"


@query(
    "q_url_dedup",
    oracle=f"""
    WITH canon AS (
      SELECT doc_id, {_CANON} AS curl,
             regexp_extract({_CANON}, '^https://([^/]+)/', 1) AS host
      FROM documents
    ),
    keep AS (
      SELECT host, curl, MIN(doc_id) AS keeper, COUNT(*) AS n_fetches
      FROM canon GROUP BY host, curl
    )
    SELECT host,
           CAST(COUNT(*) AS BIGINT) AS n_pages,
           CAST(SUM(n_fetches) AS BIGINT) AS n_fetches,
           CAST(SUM(n_fetches) - COUNT(*) AS BIGINT) AS n_dropped,
           CAST(MIN(keeper) AS BIGINT) AS first_keeper
    FROM keep
    GROUP BY host
    ORDER BY host
    """,
)
def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl dedup by canonical URL: strip volatile tracking params,
    group fetch variants to one page, keep the first-seen doc.

    The canonical key is a pure string expression (regexp_replace —
    codegen, no UDF), so dedup is one hash agg on the canonical URL
    with map-side combine, then a per-host rollup: the standard first
    stage of crawl ingestion at 100 TB (before any content hashing),
    where stripping session/tracking params routinely drops 30-60% of
    fetches. min(doc_id) is the deterministic keeper rule shared with
    the content-dedup ladder (operators/dedup.py).
    """
    docs = table(spark, sf_dir, "documents")
    canon = docs.select(
        "doc_id",
        F.expr(_CANON).alias("curl"),
        F.expr(f"regexp_extract({_CANON}, '^https://([^/]+)/', 1)").alias("host"),
    )
    keep = canon.groupBy("host", "curl").agg(
        F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n_fetches")
    )
    return (
        keep.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("n_fetches").cast("bigint").alias("n_fetches"),
            (F.sum("n_fetches") - F.count(F.lit(1))).cast("bigint").alias("n_dropped"),
            F.min("keeper").alias("first_keeper"),
        )
        .orderBy("host")
    )
