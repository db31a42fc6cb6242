"""Iterative graph operators over DataFrame joins.

PageRank here complements connected components (operators/dedup.py):
together they cover the two iterative-join shapes a lake engine needs —
label propagation to a fixpoint, and damped score diffusion for a fixed
round count.

Determinism discipline: ranks are FIXED-POINT integers (×1e12 longs),
so per-node contribution sums are associative integer adds — the result
is bit-identical regardless of partition order, where double summation
would drift ulps between runs and cluster sizes. Division uses floor
(integer) semantics on both the degree split and the damping factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..caching import local_checkpoint, release_superseded, track
from ..catalog import table
from ..registry import query

_SCALE = 10**12
_DAMP_NUM, _DAMP_DEN = 85, 100  # damping 0.85 as exact integer ratio


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    ckpt_every: int = 3,
    edge_pre_partition: bool = False,
    check_contract: bool = False,
    dst_closed: bool = False,
) -> DataFrame:
    """Damped PageRank over a directed edge list (src, dst), returning
    (node, rank_scaled) with rank_scaled a ×1e12 fixed-point long.

    Scale shape per iteration: one equi-join of the rank table onto the
    edge list (both hash-partitioned on src — a co-partitioned join once
    AQE aligns them) and one groupBy(dst) integer sum with map-side
    combine. O(iters) shuffles of |E| rows; rank state is |V| longs.
    The edge list is persisted once with its out-degrees precomputed —
    at 100 TB that is the graph index you'd materialize anyway.

    Lineage control: the rank table is checkpointed every ``ckpt_every``
    rounds. Without it the 5-round chain re-plans the full tree per
    round — measured 19.7 s at sf0.1 on Spark 4.1, vs 9.2 s with
    ckpt_every=2 + the node table persisted (bit-identical ranks; the
    re-planning, not the data, was the cost). With the r9 fused |V|
    state the sweet spot moved to ckpt_every=3 — one eager cut for 5
    rounds (a localCheckpoint is itself a blocking action; the A/B:
    ck=2 ~7.6 s vs ck=3 ~6.8 s at sf0.1, identical ranks). ``localCheckpoint`` uses
    executor-local storage — right for a bounded-iteration batch job;
    on a shared/preemptible cluster use ``spark.sparkContext.
    setCheckpointDir`` + ``.checkpoint()`` for a fault-tolerant cut at
    the price of a distributed write per cut.

    Nodes must all have out-degree ≥ 1 (callers stage undirected graphs
    as both edge directions), which sidesteps dangling-mass
    redistribution. Since r9 the node set is derived from the distinct
    SRC keys, so a directed graph with sink nodes would silently drop
    the sinks from the output and discard their incoming mass — pass
    ``check_contract=True`` (one anti-join count, |E|-scale, before the
    iterations start) to fail loudly on such misuse instead; the
    registered q_pagerank stages both directions by construction and
    skips the check on the hot path (ADVICE r9).

    ``dst_closed=True`` (r12, VERDICT r11 item 4) declares that the DST
    key set equals the node set — true for any both-directions-staged
    graph, where every node has in-edges. That closure lets each round's
    new state come straight out of the ``groupBy(dst)`` aggregation
    (the edge index carries the destination's out-degree, a bucket
    constant per dst, so rank AND next-round contribution derive in the
    same aggregate): the per-round |V| left-join onto the node table —
    and its broadcast build — disappear, 5 joins and 5 broadcast builds
    over 5 rounds. Interleaved A/B at sf0.1, bit-identical ranks:
    7.75 → 5.36 s at 32 cores, 8.23 → 5.89 s at 8. On a non-closed
    graph this variant would silently drop in-degree-0 nodes after
    round 1, so it is opt-in and ``check_contract=True`` additionally
    verifies closure (src keys never appearing as dst) before iterating.
    Cache lifecycle: callers own the persisted tables (bench clears
    between queries).
    """
    if check_contract:
        n_sinks = (
            edges.select(F.col("dst").alias("node"))
            .join(edges.select(F.col("src").alias("node")), "node", "left_anti")
            .limit(1)
            .count()
        )
        if n_sinks:
            raise ValueError(
                "pagerank contract violation: edge list has sink nodes "
                "(dst values never appearing as src). Stage undirected "
                "graphs as both edge directions, or add self-loops / "
                "dangling-mass handling before calling pagerank."
            )
        if dst_closed:
            n_sources = (
                edges.select(F.col("src").alias("node"))
                .join(edges.select(F.col("dst").alias("node")), "node", "left_anti")
                .limit(1)
                .count()
            )
            if n_sources:
                raise ValueError(
                    "pagerank dst_closed violation: edge list has "
                    "in-degree-0 nodes (src values never appearing as "
                    "dst); the dst-derived state would drop them. Stage "
                    "both edge directions or call with dst_closed=False."
                )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # The edge list MUST be persisted: it anchors every iteration, and
    # without it AQE's broadcast of each round's (small) contribution
    # table re-derives the whole unpersisted chain on the driver —
    # measured to OOM the broadcast build at sf0.1. Since r9 the degree
    # lives only on the |V|-sized per_src table (the division moved off
    # the edge scale), so the cached index is the bare (src, dst) pairs
    # — narrower cache, no build-time |E| join.
    indexed = edges
    if dst_closed:
        # The closure variant's round aggregate needs the DESTINATION's
        # out-degree next to each edge (one |E|⋈|V| join at index-build
        # time, cached once) — dst_deg is constant within a dst group, so
        # the round's groupBy(dst) carries it via max() for free.
        indexed = edges.join(
            deg.select(F.col("src").alias("dst"), F.col("out_deg").alias("dst_deg")),
            "dst",
        )
    if edge_pre_partition:
        # r4 task #7 experiment, measured at sf0.1 local[32] (BASELINE.md
        # r6): NO structural difference — with or without the explicit
        # repartition, every round plans the SAME BroadcastHashJoin of
        # the small rank table onto the cached edge index (there is no
        # edge-side exchange to elide) over the same 64 cached
        # partitions, and ranks are bit-identical. Wall-clock deltas
        # between the variants sat inside the noise band once run order
        # and page-cache warmth were controlled, so the default stays
        # False (no free shuffle at build time). Kept as an option
        # because on a real cluster with |V| too big to broadcast the
        # rounds degrade to SMJ, where pinning hashpartitioning(src) on
        # the persisted index IS the standard co-location play.
        indexed = indexed.repartition("src")
    indexed = track(indexed)
    # Every node appears as a SRC: callers stage undirected graphs as
    # both edge directions (the out-degree ≥ 1 contract below), so the
    # node set IS deg's key set. Cache the |V|-sized (node, out_deg)
    # table ONCE — it anchors the per-round division AND every round's
    # left join AND the init ranks; an uncached variant recomputed the
    # |E|-scale degree aggregation every iteration (r9 measure: ~13 s
    # vs ~8 s at sf0.1). This also replaces the old union+distinct
    # node-set shuffle pair.
    node_deg = deg.select(F.col("src").alias("node"), "out_deg")
    if not dst_closed:
        # Per-round consumer (the left join) — cache it. In dst_closed
        # mode it only seeds the round-0 state (one consumer): a persist
        # would be a pure materialization cost (the r11 cache lesson).
        node_deg = track(node_deg)
    base = _SCALE * (_DAMP_DEN - _DAMP_NUM) // _DAMP_DEN  # (1-d) mass
    # Fused |V|-scale state (VERDICT r8 item 2): each round's state row
    # is (node, rank_scaled, contrib = rank div out_deg). Carrying the
    # PRE-DIVIDED contribution means (a) the division happens once per
    # NODE, never per edge — the edge-scale pass only relays a ready
    # long and the groupBy(dst) partial-aggregates it map-side within
    # the cached edge partitions before the shuffle — and (b) the rank
    # update and the next round's division fuse into the ONE left join
    # onto the cached node_deg table (a separate ranks⋈deg join per
    # round measured +1.5 s over 5 rounds at sf0.1). `div` is true
    # integer division on longs — a double `/` then cast can round UP
    # across an integer boundary at ~1e15+ magnitudes, silently
    # breaking bit-determinism.
    state = node_deg.select(
        "node",
        F.lit(_SCALE).cast("long").alias("rank_scaled"),
        F.expr(f"CAST({_SCALE} AS LONG) div out_deg").alias("contrib"),
    )
    prev_ckpt = None
    for it in range(iters):
        if dst_closed:
            # One aggregate IS the new state: every node is a dst (the
            # declared closure), in_mass is therefore never NULL, and
            # rank + next contribution both derive from (in_mass,
            # dst_deg) inside the same groupBy — no |V| join, no
            # broadcast build, one shuffle per round. Integers identical
            # to the join form by definition (same in_mass, same div).
            state = (
                indexed.join(state, indexed.src == state.node)
                .groupBy("dst")
                .agg(
                    F.sum("contrib").alias("in_mass"),
                    F.max("dst_deg").alias("out_deg"),
                )
                .select(
                    F.col("dst").alias("node"),
                    (
                        F.lit(base)
                        + F.expr(f"(in_mass * {_DAMP_NUM}) div {_DAMP_DEN}")
                    ).cast("long").alias("rank_scaled"),
                    F.expr(
                        f"(CAST({base} AS LONG) + "
                        f"(in_mass * {_DAMP_NUM}) div {_DAMP_DEN})"
                        " div out_deg"
                    ).alias("contrib"),
                )
            )
        else:
            contribs = (
                indexed.join(state, indexed.src == state.node)
                .groupBy("dst")
                .agg(F.sum("contrib").alias("in_mass"))
            )
            new_rank = (
                F.lit(base)
                + F.expr(f"(coalesce(in_mass, 0L) * {_DAMP_NUM}) div {_DAMP_DEN}")
            ).cast("long")
            state = (
                node_deg.join(contribs, node_deg.node == contribs.dst, "left")
                .select(
                    "node",
                    new_rank.alias("rank_scaled"),
                    F.expr(
                        f"(CAST({base} AS LONG) + "
                        f"(coalesce(in_mass, 0L) * {_DAMP_NUM}) div {_DAMP_DEN})"
                        " div out_deg"
                    ).alias("contrib"),
                )
            )
        if ckpt_every and (it + 1) % ckpt_every == 0 and it + 1 < iters:
            state = local_checkpoint(state)
            # The new checkpoint is materialized (eager) — the previous
            # round's blocks have no remaining reader (ADVICE r4).
            if prev_ckpt is not None:
                release_superseded(prev_ckpt)
            prev_ckpt = state
    return state.select("node", "rank_scaled")


def _pagerank_oracle(iters: int = 5) -> str:
    """DuckDB twin of :func:`q_pagerank`: the fixed iteration count makes
    the diffusion SQL-expressible by unrolling each round as a CTE (no
    recursive-term aggregation restrictions to fight). Exact-integer
    parity: rank ``//`` out_deg is floor division on positive BIGINTs ==
    Spark's ``div``; DuckDB's SUM(BIGINT) widens to HUGEINT, which is
    exact, and the result is cast back to BIGINT before comparison.
    """
    base = _SCALE * (_DAMP_DEN - _DAMP_NUM) // _DAMP_DEN
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(f"""
    r{i} AS (
      SELECT n.node,
             CAST({base} + (COALESCE(s.in_mass, 0) * {_DAMP_NUM}) // {_DAMP_DEN}
                  AS BIGINT) AS rank_scaled
      FROM nodes n
      LEFT JOIN (
        SELECT e.dst AS node, SUM(r.rank_scaled // d.out_deg) AS in_mass
        FROM edges e
        JOIN deg d ON d.src = e.src
        JOIN r{i - 1} r ON r.node = e.src
        GROUP BY e.dst
      ) s ON s.node = n.node
    )""")
    return f"""
    WITH fwd AS (
      SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem
    ),
    edges AS (SELECT src, dst FROM fwd UNION ALL SELECT dst AS src, src AS dst FROM fwd),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS out_deg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    r0 AS (SELECT node, CAST({_SCALE} AS BIGINT) AS rank_scaled FROM nodes),{",".join(rounds)}
    SELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
           CAST(node // 2 AS BIGINT) AS entity_key,
           rank_scaled
    FROM r{iters}
    ORDER BY rank_scaled DESC, kind, entity_key
    LIMIT 20
    """


@query("q_pagerank", oracle=_pagerank_oracle())
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bipartite part↔supplier graph implied by
    lineitem (edges both directions, so every node has out-degree ≥ 1):
    which parts/suppliers sit at the densest supply intersections.

    Top-20 by rank with deterministic tiebreaks; fixed 5 iterations.
    Fixed-point integer ranks make the result bit-deterministic, which
    is what lets the DuckDB twin (:func:`_pagerank_oracle`, unrolled
    rounds) hash-match exactly. Semantics (conservation, star-graph
    ordering, determinism) are unit-asserted in tests/test_graph.py on
    closed-form graphs.
    """
    li = table(spark, sf_dir, "lineitem")
    # Both directions in ONE distinct pass: explode each lineitem row
    # into its two directed edges, then distinct once. The old
    # fwd.distinct() UNION reverse(fwd) shape planned the 600k-row
    # distinct exchange in BOTH union arms during the cache build (r9
    # A/B: explode ~6.8 s vs union ~8.2 s total at sf0.1, identical
    # edge set — the arms are disjoint by key parity, so set semantics
    # are unchanged and the oracle's fwd/rev formulation still matches).
    p2, s2 = (F.col("l_partkey") * 2), (F.col("l_suppkey") * 2 + 1)
    edges = (
        li.select(
            F.explode(
                F.array(
                    F.struct(p2.alias("src"), s2.alias("dst")),
                    F.struct(s2.alias("src"), p2.alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )
    # dst_closed: both directions are staged, so every node is a dst —
    # the closure that lets each round's state come out of the groupBy
    # directly (see pagerank docstring; −31% at sf0.1, identical ranks).
    ranks = pagerank(edges, iters=5, dst_closed=True)
    return (
        ranks.select(
            F.when(F.col("node") % 2 == 0, "part").otherwise("supplier").alias("kind"),
            (F.col("node") / 2).cast("bigint").alias("entity_key"),
            "rank_scaled",
        )
        .orderBy(F.col("rank_scaled").desc(), F.col("kind"), F.col("entity_key"))
        .limit(20)
    )


def basket_pair_counts(
    items: DataFrame, key: str = "o", item: str = "p"
) -> DataFrame:
    """(pa, pb, n_pair): within-basket co-occurrence counts of DISTINCT
    item pairs, pa < pb — the shared pair-generation pass behind the
    co-purchase graph (triangle/degree/clustering edges), q_basket_lift
    and q_frequent_pairs.

    r12 shape (guide §2.3 "aggregate before you shuffle" /
    §2.4 "remove shuffles outright"): collect each basket ONCE
    (``collect_list`` bounded by basket size — the same Σ basket² premise
    the old items⋈items self-join priced), sort it, and explode the i<j
    combinations with higher-order functions. The sorted array gives
    pa < pb and distinct inputs give the identical pair multiset as the
    self-join, but ONE groupBy(key) exchange replaces the join's two
    hash exchanges + sort-merge, and the pair fan-out happens inside
    codegen with map-side partial aggregation collapsing it before the
    (pa, pb) shuffle. Interleaved A/B at sf0.1: 2.00 → 1.41 s for the
    bare pair pass, identical rows. The per-group array is ≤ max basket
    size — the quantity every consumer already documents as the scale
    bound; a corpus whose baskets don't fit in a task's memory was
    already quadratically doomed in the join shape.
    """
    baskets = items.groupBy(key).agg(
        F.array_sort(F.collect_list(item)).alias("ps")
    )
    return (
        baskets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ps"),
                        lambda x, i: F.transform(
                            F.slice(F.col("ps"), i + 2, F.size(F.col("ps"))),
                            lambda y: F.struct(x.alias("pa"), y.alias("pb")),
                        ),
                    )
                )
            ).alias("pr")
        )
        .select("pr.pa", "pr.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact triangle count over an undirected edge list given as
    canonical pairs (a < b), via the oriented two-join:

    wedges  = edges(a,b) ⋈ edges(b,c)  on  e1.b = e2.a   → (a,b,c), a<b<c
    closed  = wedges ⋈ edges           on  (a,c)          → triangles

    Orienting every edge low→high makes each triangle countable exactly
    once (as its single a<b<c rotation) and — the scale property —
    bounds the wedge join by Σ out-degree², where out-degree under this
    orientation is ≤ the node's true degree and concentrated on LOW-id
    nodes, the standard mitigation for power-law hubs (a hub's wedges
    split across its lower-id neighbors). Both joins are plain
    equi-joins; no node ever sees the whole graph.
    """
    e1 = edges.select(F.col("a").alias("w_a"), F.col("b").alias("w_b"))
    e2 = edges.select(F.col("a").alias("x_a"), F.col("b").alias("x_b"))
    wedges = e1.join(e2, F.col("w_b") == F.col("x_a")).select(
        F.col("w_a").alias("a"), F.col("w_b").alias("b"), F.col("x_b").alias("c")
    )
    closing = edges.select(F.col("a").alias("t_a"), F.col("b").alias("t_c"))
    tris = wedges.join(
        closing, (F.col("a") == F.col("t_a")) & (F.col("c") == F.col("t_c"))
    )
    return tris.agg(F.count(F.lit(1)).alias("n_triangles"))


@query(
    "q_triangle_count",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    edges AS (
      SELECT a.p AS a, b.p AS b
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
      HAVING COUNT(*) >= 2
    )
    SELECT CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*)
                 FROM edges e1
                 JOIN edges e2 ON e1.b = e2.a
                 JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b) AS BIGINT)
             AS n_triangles
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the co-purchase graph: parts are nodes, an
    edge joins parts co-bought in ≥ 2 distinct orders (the support
    threshold that keeps a transaction-derived graph sparse — without
    it, co-occurrence graphs densify toward complete and Σ deg² blows
    up; the threshold is the knob a 100 TB run tunes first).

    The edge list derives exactly like q_frequent_pairs' candidates
    (per-basket pair generation, bounded by basket size — see
    basket_pair_counts), is persisted once, and is reused by all three
    legs of the oriented wedge join.
    """
    items = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    edges = (
        basket_pair_counts(items)
        .where(F.col("n_pair") >= 2)
        .select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    )
    edges = track(edges)  # anchors all three legs; session owns the cache
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return n_edges.crossJoin(triangle_count(edges))


@query(
    "q_graph_degree",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    edges AS (
      SELECT a.p AS a, b.p AS b
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
      HAVING COUNT(*) >= 2
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM (SELECT a AS node FROM edges UNION ALL SELECT b FROM edges)
      GROUP BY node
    )
    SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg
    GROUP BY degree
    """,
)
def q_graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph (same
    support-thresholded edge derivation as q_triangle_count): how many
    nodes have 1, 2, 3, … neighbors — the first diagnostic run on ANY
    derived graph, because the Σ degree² it summarizes is exactly what
    prices every downstream wedge join, and a power-law tail here is
    the early warning to re-threshold before attempting triangles or
    label propagation at scale.

    Two chained hash aggs over the doubled edge list; output is bounded
    by max degree, independent of graph size.
    """
    items = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    edges = (
        basket_pair_counts(items)
        .where(F.col("n_pair") >= 2)
        .select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    )
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


def bfs_distances(
    edges: DataFrame, source: int, max_hops: int
) -> DataFrame:
    """Breadth-first shortest-path distances from ``source`` over a
    directed edge list (src, dst): (node, dist) for every node within
    ``max_hops``.

    Frontier expansion: each round joins ONLY the newly-reached
    frontier (not the full visited set) onto the edge list and
    anti-joins out already-visited nodes — per-round cost is
    |frontier's edges|, and the visited table grows monotonically, so
    total work is O(edges within the ball), the textbook distributed
    BFS. The edge list is persisted once (same rule as pagerank's
    degree index: without it AQE's broadcast build re-derives the whole
    distinct-edge chain per round, which OOM'd the driver at sf0.1);
    rounds localCheckpoint so the plan stays O(1).

    SINGLE-ACTION CONTRACT (ADVICE r11): the returned frame is a LAZY
    union at the final hop — its last frontier join/anti-join re-executes
    on every action the caller runs, and the last two rounds' checkpoint
    blocks stay pinned until the session releases caches. Run exactly one
    materializing action (the registered q_graph_bfs writes once) or
    persist/collect the result yourself before running several; calling
    ``release_caches`` before that action would strand the lazy tail
    without its lineage-free checkpoint backing.
    """
    edges = track(edges.select("src", "dst"))
    dist = edges.sparkSession.createDataFrame(
        [(source, 0)], "node long, dist int"
    )
    frontier = dist
    for hop in range(1, max_hops + 1):
        # No forced broadcast here (ADVICE r4): the visited set grows
        # toward |V| within the ball, so a pinned F.broadcast would
        # eventually exceed the driver/broadcast limit on large graphs.
        # Both sides come out of a localCheckpoint with accurate sizes,
        # so AQE broadcasts while the frontier/visited set is genuinely
        # small and switches to a shuffle join once it isn't.
        nxt = (
            edges.join(frontier.select(F.col("node").alias("src")), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new = nxt.join(dist.select("node"), "node", "left_anti").select(
            "node", F.lit(hop).cast("int").alias("dist")
        )
        if hop == max_hops:
            # Final hop (r11): nothing reads the hop-``max_hops`` frontier,
            # so the eager checkpoint would be a pure blocking
            # materialization job — return the lazy union instead (its
            # lineage is ONE join off the previous checkpoint + cached
            # edges, so the caller's single action pays no re-derivation).
            # The previous round's blocks stay live until the session
            # releases them (they now back the returned frame).
            return dist.unionByName(new)
        prev = dist
        dist = local_checkpoint(dist.unionByName(new), eager=True)
        # eager checkpoint above materialized the union — the previous
        # round's blocks are now reader-free (ADVICE r4).
        release_superseded(prev)
        # read the new frontier back out of the CHECKPOINTED table —
        # carrying `new` forward would re-derive its whole join chain
        # next round (the checkpoint exists precisely to cut that).
        frontier = dist.where(F.col("dist") == hop)
    return dist


@query(
    "q_graph_bfs",
    oracle="""
    WITH RECURSIVE fwd AS (
      SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem
    ),
    edges AS (
      SELECT src, dst FROM fwd UNION ALL SELECT dst AS src, src AS dst FROM fwd
    ),
    bfs AS (
      SELECT CAST(2 AS BIGINT) AS node, 0 AS dist
      UNION
      SELECT e.dst AS node, b.dist + 1
      FROM bfs b JOIN edges e ON e.src = b.node
      WHERE b.dist < 4
    )
    SELECT CASE WHEN node % 2 = 0 THEN 'part' ELSE 'supplier' END AS kind,
           CAST(node // 2 AS BIGINT) AS entity_key,
           CAST(MIN(dist) AS INT) AS dist
    FROM bfs
    GROUP BY node
    ORDER BY dist, kind, entity_key
    """,
)
def q_graph_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest-path hop distances (BFS) from part #1 over the
    part↔supplier supply graph, bounded at 4 hops — "everything within
    N procurement steps", the blast-radius query of supply-chain and
    lineage analysis.

    Completes the iterative-graph trio (PageRank diffusion, connected-
    components fixpoint, BFS frontier expansion). Exact integer
    distances make the DuckDB twin a plain recursive CTE whose UNION
    dedup bounds the state space at |V|×hops — the same
    oracle-the-iteration discipline as q_pagerank's unrolled rounds and
    q_dedup_resolve's min-label fixpoint.
    """
    li = table(spark, sf_dir, "lineitem")
    fwd = li.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    ).distinct()
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    dist = bfs_distances(edges, source=2, max_hops=4)
    return dist.select(
        F.when(F.col("node") % 2 == 0, "part").otherwise("supplier").alias("kind"),
        (F.col("node") / 2).cast("bigint").alias("entity_key"),
        F.col("dist").cast("int").alias("dist"),
    ).orderBy("dist", "kind", "entity_key")


@query(
    "q_basket_lift",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    n_baskets AS (SELECT COUNT(DISTINCT o) AS nb FROM items),
    item_n AS (SELECT p, COUNT(*) AS n FROM items GROUP BY p),
    pairs AS (
      SELECT a.p AS pa, b.p AS pb, COUNT(*) AS n_pair
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
      HAVING COUNT(*) >= 2
    )
    SELECT pa, pb,
           CAST(n_pair AS BIGINT) AS n_pair,
           CAST(ia.n AS BIGINT) AS n_a,
           CAST(ib.n AS BIGINT) AS n_b,
           round(CAST(n_pair AS DOUBLE) * nb / (ia.n * ib.n), 6) AS lift
    FROM pairs
    JOIN item_n ia ON ia.p = pa
    JOIN item_n ib ON ib.p = pb
    CROSS JOIN n_baskets
    ORDER BY n_pair DESC, pa, pb
    LIMIT 50
    """,
)
def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association strength: for the most co-purchased
    part pairs, the LIFT — observed co-occurrence over the rate
    independence would predict (lift > 1 = genuine affinity, the number
    a recommender thresholds on; raw pair counts alone just rank
    popular items).

    Same bounded candidate generation as q_frequent_pairs (per-basket
    pair explosion — cost Σ basket², never corpus²; see
    basket_pair_counts); the lift
    arithmetic stays on exact integers until ONE double division +
    6-dp round, so both engines agree bit-for-bit. Top-50 plans as
    TakeOrderedAndProject.
    """
    li = table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    items = track(items)  # feeds basket counts, item counts, and pair gen
    nb = items.select("o").distinct().agg(F.count(F.lit(1)).alias("nb"))
    item_n = items.groupBy("p").agg(F.count(F.lit(1)).alias("n"))
    pairs = basket_pair_counts(items).where(F.col("n_pair") >= 2)
    na = item_n.select(F.col("p").alias("pa"), F.col("n").alias("n_a"))
    nbr = item_n.select(F.col("p").alias("pb"), F.col("n").alias("n_b"))
    return (
        pairs.join(na, "pa")
        .join(nbr, "pb")
        .crossJoin(F.broadcast(nb))
        .select(
            "pa",
            "pb",
            F.col("n_pair").cast("bigint").alias("n_pair"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(
                F.col("n_pair").cast("double") * F.col("nb") / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("n_pair"), "pa", "pb")
        .limit(50)
    )


@query(
    "q_local_clustering",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    edges AS (
      SELECT a.p AS a, b.p AS b
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
      HAVING COUNT(*) >= 2
    ),
    deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
      FROM (SELECT a AS node FROM edges UNION ALL SELECT b FROM edges)
      GROUP BY node
    ),
    tris AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM edges e1
      JOIN edges e2 ON e1.b = e2.a
      JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    credit AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
        SELECT x AS node FROM tris
        UNION ALL SELECT y FROM tris
        UNION ALL SELECT z FROM tris
      ) GROUP BY node
    )
    SELECT d.node, d.degree,
           COALESCE(c.n_tri, 0) AS n_triangles,
           CASE WHEN d.degree < 2 THEN NULL
                ELSE 2.0 * COALESCE(c.n_tri, 0) / (d.degree * (d.degree - 1))
           END AS lcc
    FROM deg d LEFT JOIN credit c ON c.node = d.node
    """,
)
def q_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient over the co-purchase graph
    (same support-thresholded edge derivation as q_triangle_count):
    lcc(v) = 2·tri(v) / deg(v)(deg(v)−1) — "how clique-like is each
    part's neighborhood", the node-level refinement of the global
    triangle count and the standard feature for community/anomaly
    scoring on derived graphs.

    The oriented wedge join enumerates each triangle once (x<y<z) and
    credits all three corners via a 3-way UNION — no per-node
    neighborhood materialization, so the cost stays the Σ deg² wedge
    bound the support threshold already prices, and the one extra
    aggregation is bounded by 3·|triangles|. All-integer until the one
    division (exact); degree-<2 nodes → NULL lcc on both engines.
    """
    items = (
        table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    edges = (
        basket_pair_counts(items)
        .where(F.col("n_pair") >= 2)
        .select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    )
    edges = track(edges)  # shared by the degree pass and all 3 wedge legs
    deg = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tris = e1.join(e2, F.col("e1.b") == F.col("e2.a")).join(
        e3,
        (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
    ).select(
        F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z")
    )
    credit = (
        tris.select(F.col("x").alias("node"))
        .unionAll(tris.select(F.col("y").alias("node")))
        .unionAll(tris.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tri"))
    )
    joined = deg.join(credit, "node", "left")
    n_tri = F.coalesce(F.col("n_tri"), F.lit(0))
    return joined.select(
        "node",
        "degree",
        n_tri.cast("bigint").alias("n_triangles"),
        F.when(F.col("degree") < 2, F.lit(None).cast("double"))
        .otherwise(
            F.lit(2.0) * n_tri / (F.col("degree") * (F.col("degree") - 1))
        )
        .alias("lcc"),
    )
