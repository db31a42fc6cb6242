"""PageRank semantics on closed-form graphs — conservation, ordering,
and bit-determinism of the fixed-point integer formulation."""

from __future__ import annotations

from dateng_data_lakes_apache_spark_spark.operators.graph import _SCALE, pagerank
from dateng_data_lakes_apache_spark_spark.registry import get_queries

QS = get_queries()


def _edges(spark, pairs):
    both = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(both, "src long, dst long")


def test_pagerank_symmetric_cycle(spark):
    # 2-cycle: perfectly symmetric, so both nodes keep exactly rank 1.0
    ranks = {r.node: r.rank_scaled for r in pagerank(_edges(spark, [(1, 2)])).collect()}
    assert ranks[1] == ranks[2]
    assert abs(ranks[1] - _SCALE) <= 1  # floor-division slack only


def test_pagerank_star_center_dominates(spark):
    # star: the hub receives all leaf mass, leaves split the hub's
    ranks = {
        r.node: r.rank_scaled
        for r in pagerank(_edges(spark, [(0, i) for i in range(1, 6)])).collect()
    }
    assert all(ranks[0] > ranks[i] for i in range(1, 6))
    leaf = {ranks[i] for i in range(1, 6)}
    assert len(leaf) == 1  # symmetric leaves rank identically


def test_pagerank_sink_contract_fails_loudly(spark):
    # directed graph with a sink (3 never appears as src): with
    # check_contract=True the call must raise instead of silently
    # dropping node 3 and its incoming mass (ADVICE r9)
    import pytest

    directed = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    with pytest.raises(ValueError, match="sink nodes"):
        pagerank(directed, check_contract=True)
    # and a both-directions staging of the same pairs passes the check
    ranks = pagerank(_edges(spark, [(1, 2), (2, 3)]), check_contract=True).collect()
    assert {r.node for r in ranks} == {1, 2, 3}


def test_pagerank_mass_conservation(spark):
    # undirected graph, no dangling nodes: total mass stays n*SCALE
    # (floor divisions may shave ≤ a few units per node per iteration)
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)])
    total = sum(r.rank_scaled for r in pagerank(edges, iters=5).collect())
    assert abs(total - 4 * _SCALE) < 1000


def test_pagerank_deterministic_across_runs(spark):
    edges = _edges(spark, [(1, 2), (2, 3), (3, 1), (1, 4), (4, 2)])
    a = sorted((r.node, r.rank_scaled) for r in pagerank(edges).collect())
    b = sorted(
        (r.node, r.rank_scaled)
        for r in pagerank(edges.repartition(7)).collect()
    )
    assert a == b  # partitioning must not change a single bit


def test_q_pagerank_runs(spark, sf_dir):
    rows = QS["q_pagerank"](spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(r.kind in ("part", "supplier") for r in rows)
    ranks = [r.rank_scaled for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_bfs_chain_distances(spark):
    """Closed form: a 0-1-2-3 chain (undirected) from source 0 gives
    dist == node index; node 9 is unreachable within the hop bound."""
    from dateng_data_lakes_apache_spark_spark.operators.graph import bfs_distances

    fwd = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (8, 9)], "src long, dst long"
    )
    edges = fwd.union(fwd.selectExpr("dst AS src", "src AS dst"))
    got = {r.node: r.dist for r in bfs_distances(edges, source=0, max_hops=4).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_hop_bound_cuts_frontier(spark):
    from dateng_data_lakes_apache_spark_spark.operators.graph import bfs_distances

    fwd = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )
    got = {r.node: r.dist for r in bfs_distances(fwd, source=0, max_hops=2).collect()}
    assert got == {0: 0, 1: 1, 2: 2}  # nodes 3..6 beyond the bound


def test_pagerank_dst_closed_matches_general_path(spark):
    """The r12 dst_closed variant (state derived from the groupBy(dst)
    aggregate, no per-round node join) must be bit-identical to the
    general path on symmetric graphs — asymmetric star + a chain."""
    for pairs in ([(0, i) for i in range(1, 6)], [(1, 2), (2, 3), (3, 4)]):
        e = _edges(spark, pairs)
        general = {r.node: r.rank_scaled for r in pagerank(e).collect()}
        closed = {r.node: r.rank_scaled for r in pagerank(e, dst_closed=True).collect()}
        assert closed == general


def test_pagerank_dst_closed_contract_fails_loudly(spark):
    """dst_closed on a graph with an in-degree-0 node must raise under
    check_contract (the dst-derived state would silently drop it)."""
    import pytest

    # 3 -> 1 gives node 3 out-degree 1 but in-degree 0; 1<->2 keeps the
    # sink contract satisfied so only the closure check can catch it.
    directed = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 1)], "src long, dst long"
    )
    with pytest.raises(ValueError, match="dst_closed"):
        pagerank(directed, check_contract=True, dst_closed=True)
    # the general path accepts the same graph (every node has out-deg >= 1)
    assert pagerank(directed, check_contract=True).count() == 3
